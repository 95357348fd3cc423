package graft

import org.apache.spark.sql.functions._
import graft.ext.{Redirects, Warc}

/** Redirect-chain resolution (q158): walk goldens over an injected
  * fetch table (every outcome arm), the bounded-hop refusal for loops,
  * synthesis arithmetic pins, and corpus-level coverage — every chain
  * class the synthesis plants fires on the registered query. */
class RedirectsSpec extends SparkSpecBase {

  private def resolve(rows: Seq[(String, Int, Option[String])],
      maxHops: Int = Redirects.MaxHops)
      : Map[String, (String, Option[Int], Int, String)] = {
    import spark.implicits._
    Redirects.resolveOf(
        rows.toDF("url", "http_status", "location"), maxHops)
      .collect().map { r =>
        r.getAs[String]("origin") -> ((r.getAs[String]("final_url"),
          Option(r.getAs[Any]("final_status"))
            .map(_.asInstanceOf[Int]),
          r.getAs[Int]("n_hops"), r.getAs[String]("outcome")))
      }.toMap
  }

  test("walk goldens: 1-hop, multi-hop, landing on 404 still resolves, " +
      "302/307 also followed, non-redirects seed nothing") {
    val got = resolve(Seq(
      ("a", 301, Some("b")), ("b", 200, None),          // 1 hop
      ("c", 302, Some("d")), ("d", 307, Some("e")), ("e", 200, None),
      ("f", 301, Some("g")), ("g", 404, None),          // resolved to 404
      ("h", 200, None)))                                // not a seed
    assert(got.size == 4 && !got.contains("h"))
    assert(got("a") == (("b", Some(200), 1, "resolved")))
    assert(got("c") == (("e", Some(200), 2, "resolved")))
    assert(got("d") == (("e", Some(200), 1, "resolved")))
    assert(got("f") == (("g", Some(404), 1, "resolved")))
  }

  test("dangling: unfetched Location keeps its URL with null status; " +
      "a redirect with no Location header is dangling at hop 0") {
    val got = resolve(Seq(
      ("a", 301, Some("nowhere")),
      ("b", 301, None)))
    assert(got("a") == (("nowhere", None, 0, "dangling")))
    assert(got("b") == (("b", Some(301), 0, "dangling")))
  }

  test("cap refusal: self-loops and 2-cycles never resolve and are " +
      "emitted as cap_exceeded with the hop budget spent — never " +
      "dropped, never mislabeled") {
    val got = resolve(Seq(
      ("s", 301, Some("s")),                        // self-loop
      ("x", 301, Some("y")), ("y", 301, Some("x")), // 2-cycle
      ("t", 301, Some("u")), ("u", 200, None)))     // control
    assert(got("s") == (("s", Some(301), Redirects.MaxHops, "cap_exceeded")))
    assert(got("x")._4 == "cap_exceeded" && got("y")._4 == "cap_exceeded")
    assert(got("x")._3 == Redirects.MaxHops)
    assert(got("t") == (("u", Some(200), 1, "resolved")))
    // a capped chain reports the status LAST OBSERVED on it, never a
    // fabricated 301: a 307 self-loop stays 307
    val g7 = resolve(Seq(("p", 307, Some("p"))))
    assert(g7("p") == (("p", Some(307), Redirects.MaxHops, "cap_exceeded")))
  }

  test("a target fetched WITHOUT an HTTP status (transport failure) " +
      "is dangling — the verdict filters are exhaustive, no chain " +
      "silently vanishes") {
    import spark.implicits._
    val rows = Seq(
      ("a", Some(301), Some("b")), ("b", None, None), // failed fetch of b
      ("c", Some(301), Some("d")), ("d", Some(200), None))
    val got = graft.ext.Redirects.resolveOf(
        rows.toDF("url", "http_status", "location")).collect()
      .map(r => r.getAs[String]("origin") ->
        ((r.getAs[String]("final_url"),
          Option(r.getAs[Any]("final_status")),
          r.getAs[String]("outcome")))).toMap
    assert(got.keySet == Set("a", "c"), s"a chain vanished: $got")
    assert(got("a") == (("b", None, "dangling")))
    assert(got("c") == (("d", Some(200), "resolved")))
  }

  test("a chain exactly at the hop budget resolves; one past it is " +
      "refused (the boundary is hops FOLLOWED, not URLs seen)") {
    // chain of k redirects then a 200: resolving needs k hops
    def chain(k: Int): Seq[(String, Int, Option[String])] =
      (0 until k).map(i => (s"n$i", 301, Some(s"n${i + 1}"))) :+
        ((s"n$k", 200, Option.empty[String]))
    val atCap = resolve(chain(Redirects.MaxHops))
    assert(atCap("n0") ==
      ((s"n${Redirects.MaxHops}", Some(200), Redirects.MaxHops, "resolved")))
    val past = resolve(chain(Redirects.MaxHops + 1))
    assert(past("n0")._4 == "cap_exceeded")
  }

  test("synthesis pins: redirect targets by id arithmetic — self-loop " +
      "at 97 mod 100, +10 hops at 7/17 mod 30, else +3 to a 200 doc") {
    assert(Warc.redirectTargetOf(97L) == 97L)
    assert(Warc.redirectTargetOf(397L) == 397L)
    assert(Warc.redirectTargetOf(7L) == 17L)   // 7 -> 17 -> 27 -> 30
    assert(Warc.redirectTargetOf(17L) == 27L)
    assert(Warc.redirectTargetOf(27L) == 30L)
    assert(Warc.redirectTargetOf(47L) == 57L)  // 47 % 30 == 17
    // +3 targets are always 200 responses, never conversion records
    for (id <- Seq(57L, 87L, 117L)) {
      val t = Warc.redirectTargetOf(id)
      assert(t % 10 == 0 && t % 5 != 4)
    }
  }

  test("corpus coverage at sf0.001: every planted chain class fires — " +
      "1/2/3-hop resolution, self-loop refusal, and chains that FEED " +
      "a self-loop also hit the cap; dangling lives in the injected " +
      "goldens (every synthesized target is in-corpus at 500 docs)") {
    val rows = graft.ext.Redirects.redirectChains(spark, sf0001)
      .collect().map(r => r.getAs[String]("origin") ->
        ((r.getAs[String]("final_url"), r.getAs[String]("outcome"),
          r.getAs[Int]("n_hops"), r.getAs[String]("final_domain"))))
      .toMap
    assert(rows.size == 50) // one seed per doc_id ≡ 7 (mod 10)
    val byId = rows.map { case (o, v) =>
      "item(\\d+)".r.findFirstMatchIn(o).get.group(1).toLong -> v
    }
    // 7 -> 17 -> 27 -> 30 (3 hops), 17 -> 27 -> 30 (2), 27 -> 30 (1)
    assert(byId(7L)._2 == "resolved" && byId(7L)._3 == 3)
    assert(byId(17L)._2 == "resolved" && byId(17L)._3 == 2)
    assert(byId(27L)._2 == "resolved" && byId(27L)._3 == 1)
    assert(byId(7L)._1.contains("item30"))
    // planted self-loops refuse at the cap with their own URL
    for (id <- Seq(97L, 497L)) {
      assert(byId(id)._2 == "cap_exceeded" &&
        byId(id)._3 == Redirects.MaxHops)
      assert(byId(id)._1.contains(s"item$id"))
    }
    // 487 -> 497 (self-loop): entering a cycle mid-chain also refuses
    assert(byId(487L)._2 == "cap_exceeded")
    assert(rows.values.count(_._2 == "dangling") == 0)
    // resolved rows carry the TARGET's registrable domain (the
    // admission budget fold); refused rows carry none
    assert(byId(27L)._4 != null)
    assert(byId(97L)._4 == null)
  }

  test("parser surfaces the Location header: q153's inventory carries " +
      "it for every 301 and nothing else") {
    val recs = Warc.warcRecords(spark, sf0001)
    val with301 = recs.filter(col("http_status") === 301)
      .filter(col("http_location").isNull).count()
    val withoutLoc = recs.filter(col("http_status") =!= 301 ||
        col("http_status").isNull)
      .filter(col("http_location").isNotNull).count()
    assert(with301 == 0 && withoutLoc == 0)
  }
}
