package graft

import org.apache.spark.sql.functions._
import graft.ext.UrlCurate

/** URL canonicalization (q129) and per-domain caps (q130): rule-by-rule
  * canonicalization goldens, the public-suffix algorithm's four match
  * classes (exact, multi-label, wildcard, exception), blocklisting, cap
  * semantics, and plan shape. */
class UrlCurateSpec extends SparkSpecBase {

  private def canon(url: String): (String, String) = {
    import spark.implicits._
    val r = UrlCurate.canonicalizeOf(
      Seq((1L, url)).toDF("doc_id", "url")).head()
    (r.getAs[String]("host"), r.getAs[String]("canon_url"))
  }

  test("canonicalization goldens: case, default ports, fragment, " +
      "trailing slash, tracking params, param sort, scheme-less") {
    assert(canon("HTTPS://WWW.Example.COM/a/")
      == (("www.example.com", "https://www.example.com/a")))
    assert(canon("https://ex.com:443/x") == (("ex.com", "https://ex.com/x")))
    assert(canon("HTTP://ex.com:80/x") == (("ex.com", "http://ex.com/x")))
    assert(canon("http://ex.com:8080/x")
      == (("ex.com", "http://ex.com:8080/x")))
    assert(canon("https://ex.com/x#frag") == (("ex.com", "https://ex.com/x")))
    assert(canon("https://ex.com") == (("ex.com", "https://ex.com/")))
    assert(canon("https://ex.com/p?utm_source=a&z=1&b=2&fbclid=x&gclid=y")
      == (("ex.com", "https://ex.com/p?b=2&z=1")))
    assert(canon("https://ex.com/p?utm_campaign=c&ref=r")
      == (("ex.com", "https://ex.com/p")))
    assert(canon("  https://ex.com/x  ") == (("ex.com", "https://ex.com/x")))
    // no scheme: pass through trimmed, host null
    assert(canon("not a url") == ((null, "not a url")))
  }

  test("public-suffix matching: exact, multi-label, wildcard, " +
      "exception, host-is-suffix, and the default rule") {
    import spark.implicits._
    val hosts = Seq(
      "www.example.com",    // exact 1-label suffix
      "a.b.example.co.uk",  // exact 2-label suffix, deep host
      "example.co.uk",      // exact 2-label suffix, minimal
      "co.uk",              // host IS a public suffix -> null
      "user.github.io",     // private-section suffix: github.io
      "x.any.ck",           // wildcard *.ck -> any.ck is the suffix
      "any.ck",             // host IS a (wildcard) public suffix -> null
      "www.ck",             // exception !www.ck -> registrable itself
      "deep.www.ck",        // suffix ck (via exception), registrable www.ck
      "host.unknowntld")    // no rule -> default *: last label
    val got = UrlCurate.registrableDomainOf(
        hosts.toDF("host"))
      .select(col("host"), col("registrable_domain")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("www.example.com") == "example.com")
    assert(got("a.b.example.co.uk") == "example.co.uk")
    assert(got("example.co.uk") == "example.co.uk")
    assert(got("co.uk") == null)
    assert(got("user.github.io") == "user.github.io")
    assert(got("x.any.ck") == "x.any.ck")
    assert(got("any.ck") == null)
    assert(got("www.ck") == "www.ck")
    assert(got("deep.www.ck") == "www.ck")
    assert(got("host.unknowntld") == "host.unknowntld")
  }

  test("blocklist flags exactly the listed registrable domains; " +
      "domainCapOf keeps the lowest doc_ids, drops blocked, groups " +
      "suffix-only hosts by host") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a.com", "a.com", false), (2L, "w.a.com", "a.com", false),
      (3L, "x.a.com", "a.com", false), (4L, "y.a.com", "a.com", false),
      (10L, "bad.org", "bad.org", true), (11L, "w.bad.org", "bad.org", true),
      (20L, "co.uk", null, false), (21L, "co.uk", null, false))
      .toDF("doc_id", "host", "registrable_domain", "blocked")
    val kept = UrlCurate.domainCapOf(rows, cap = 2)
      .select(col("doc_id"), col("domain")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == Set((1L, "a.com"), (2L, "a.com"),
      (20L, "co.uk"), (21L, "co.uk")))
    // blocklistOf over derived domains
    val blk = UrlCurate.blocklistOf(
        Seq(("h1", "site8.com"), ("h2", "site9.com"), ("h3", null))
          .toDF("host", "registrable_domain"))
      .select(col("host"), col("blocked")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(blk == Map("h1" -> true, "h2" -> false, "h3" -> false))
  }

  test("q130 cap binds on the synthesized corpus and every kept group " +
      "is the domain's lowest doc_ids") {
    import spark.implicits._
    val full = UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
      UrlCurate.canonicalizeOf(UrlCurate.synthesizeUrlsOf(
        Tables(spark, sf0001, "documents")))))
    val kept = UrlCurate.domainCapOf(full)
      .select(col("domain"), col("doc_id")).as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = full.filter(!col("blocked"))
      .select(coalesce(col("registrable_domain"), col("host")).as("d"),
        col("doc_id")).as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(kept.nonEmpty)
    assert(all.exists(_._2.size > UrlCurate.DomainCap),
      "cap never binds at this scale — synthesis too diverse")
    kept.foreach { case (d, ids) =>
      val expect = all(d).toSeq.sorted.take(UrlCurate.DomainCap).toSet
      assert(ids == expect, s"domain $d kept $ids, expected $expect")
    }
    // blocked domains contribute nothing
    assert(!kept.keySet.exists(UrlCurate.Blocklist.contains))
  }

  test("canonicalization is idempotent: every canonical URL of the " +
      "synthesized corpus is its own fixed point") {
    import spark.implicits._
    val once = UrlCurate.canonicalizeOf(UrlCurate.synthesizeUrlsOf(
      Tables(spark, sf0001, "documents")))
      .select(col("doc_id"), col("canon_url"))
    val twice = UrlCurate.canonicalizeOf(
        once.withColumnRenamed("canon_url", "url"))
      .select(col("doc_id"), col("url"), col("canon_url"))
      .as[(Long, String, String)].collect()
    assert(twice.nonEmpty)
    twice.foreach { case (id, u, c) =>
      assert(u == c, s"doc $id: canon($u) re-canonicalized to $c")
    }
  }

  test("PSL matcher agrees with an independent reference " +
      "implementation on 2000 generated hosts") {
    import spark.implicits._
    // independent re-statement of the published algorithm: try every
    // rule against the host's label tail, exceptions shed a label,
    // longest match wins, default * otherwise
    def reference(host: String): String = {
      val ls = host.split('.')
      val n = ls.length
      def tailMatches(rule: Array[String]): Boolean =
        rule.length <= n && rule.zip(ls.takeRight(rule.length))
          .forall { case (r, l) => r == "*" || r == l }
      val exc = UrlCurate.PslException.map(_.split('.'))
        .filter(tailMatches).map(_.length - 1).sorted.lastOption
      val norm = (UrlCurate.PslExact ++ UrlCurate.PslWild)
        .map(_.split('.')).filter(tailMatches).map(_.length)
        .sorted.lastOption
      val ps = exc.getOrElse(norm.getOrElse(1))
      if (n > ps) ls.takeRight(ps + 1).mkString(".") else null
    }
    val rnd = new scala.util.Random(20260814L)
    val labels = Seq("www", "a", "news", "x9", "site", "any", "ck",
      "com", "co", "uk", "github", "io", "de", "au", "example")
    val hosts = (1 to 2000).map { _ =>
      (1 to (1 + rnd.nextInt(5))).map(_ => labels(rnd.nextInt(labels.size)))
        .mkString(".")
    }.distinct
    val got = UrlCurate.registrableDomainOf(hosts.toDF("host"))
      .select(col("host"), col("registrable_domain")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { h =>
      assert(got(h) == reference(h),
        s"host $h: expression ${got(h)}, reference ${reference(h)}")
    }
  }

  test("plan shape: canonicalize + PSL + blocklist is one narrow map " +
      "(zero exchanges); the cap adds exactly one hash exchange") {
    val narrow = UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
      UrlCurate.canonicalizeOf(UrlCurate.synthesizeUrlsOf(
        Tables(spark, sf0001, "documents")))))
    val p = narrow.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(800))
    val capped = UrlCurate.domainCapOf(narrow)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(capped).length == 1, capped.take(1200))
    assert(!capped.toLowerCase.contains("rangepartitioning"),
      capped.take(1200))
    // registered forms: exactly the one deterministic output sort
    Seq(UrlCurate.urlCurate(spark, sf0001),
        UrlCurate.domainCaps(spark, sf0001)).foreach { q =>
      val rp = q.queryExecution.executedPlan.toString
      assert("rangepartitioning".r.findAllIn(rp.toLowerCase).length == 1,
        rp.take(1200))
    }
  }

  test("q151 domain quantiles: every sf0.01 domain fits inside k, so " +
      "the sketch IS the exact discrete quantile — verified doc-by-doc " +
      "on one domain") {
    import spark.implicits._
    val rows = UrlCurate.domainQuantiles(spark, sf001).collect()
    assert(rows.length > 20)
    rows.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Int]("m"),
      s"${r.getAs[String]("grp")}: group exceeds k at sf0.01?"))
    val target = rows.head
    val dom = target.getAs[String]("grp")
    val ids = UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
        UrlCurate.canonicalizeOf(UrlCurate.synthesizeUrlsOf(
          Tables(spark, sf001, "documents")))))
      .filter(!col("blocked") && col("host").isNotNull)
      .filter(coalesce(col("registrable_domain"), col("host")) === dom)
      .select("doc_id").as[Long].collect().toSet
    val toks = Tables(spark, sf001, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(size(split(col("text"), " ")).cast("long"))
      .as[Long].collect().sorted
    def pick(num: Int, den: Int): Long =
      toks((num * toks.length + den - 1) / den - 1)
    assert(target.getAs[Long]("p25_est") == pick(1, 4))
    assert(target.getAs[Long]("p50_est") == pick(1, 2))
    assert(target.getAs[Long]("p75_est") == pick(3, 4))
    assert(target.getAs[Long]("p95_est") == pick(19, 20))
  }

  test("q144 domain scorecard: per-domain stats agree with a per-doc " +
      "recomputation; single scan, no self-join, one hash exchange") {
    import spark.implicits._
    val df = UrlCurate.domainScorecard(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "scorecard must not self-join documents")
    assert("hashpartitioning".r.findAllIn(p.toLowerCase).length == 1,
      p.take(1200))
    val rows = df.collect()
    assert(rows.length > 20)
    // recompute one domain's stats doc-by-doc from the raw tables
    val target = rows.head
    val dom = target.getAs[String]("domain")
    val ids = UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
        UrlCurate.canonicalizeOf(UrlCurate.synthesizeUrlsOf(
          Tables(spark, sf001, "documents")))))
      .filter(!col("blocked") && col("host").isNotNull)
      .filter(coalesce(col("registrable_domain"), col("host")) === dom)
      .select("doc_id").as[Long].collect().toSet
    val docs = Tables(spark, sf001, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(docs.length.toLong == target.getAs[Long]("n_docs"))
    val toks = docs.map(_._2.split(" ", -1).length.toLong).sum
    assert(toks == target.getAs[Long]("sum_tokens"))
    val stops = docs.map(_._2.split(" ", -1)
      .count(Seq("the", "a", "of", "and", "to", "in", "is").contains)).sum
    assert(target.getAs[Double]("stop_ratio") ==
      math.floor(stops.toDouble / toks * 1e4 + 0.5) / 1e4)
    // sanity: ratios in natural-text bands
    rows.foreach { r =>
      assert(r.getAs[Double]("stop_ratio") > 0.0 &&
        r.getAs[Double]("stop_ratio") < 0.8)
      assert(r.getAs[Double]("uniq_ratio") > 0.2 &&
        r.getAs[Double]("uniq_ratio") <= 1.0)
    }
  }
}
