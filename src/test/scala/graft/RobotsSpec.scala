package graft

import org.apache.spark.sql.functions._
import graft.ext.Robots

/** Robots-exclusion policy filtering (q139): RFC 9309 matching goldens
  * (wildcard, `$` anchor, longest-match, allow-on-tie, default allow),
  * group selection, plan shape (broadcast join, sort-free `Of` form),
  * and corpus-level coverage — every rule class fires on the registered
  * query's synthesized URLs. */
class RobotsSpec extends SparkSpecBase {

  private def verdicts(urls: Seq[(Long, String, String)],
      rules: Seq[(String, String, Boolean, String)],
      agent: String = "graftbot"): Map[Long, (Boolean, Option[Long])] = {
    import spark.implicits._
    Robots.robotsFilterOf(
        urls.toDF("doc_id", "domain", "path"),
        rules.toDF("domain", "agent", "allow", "pattern"), agent)
      .collect().map { r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Boolean]("allowed"),
          Option(r.getAs[Any]("matched_len"))
            .map(_.asInstanceOf[Long])))
      }.toMap
  }

  test("matching goldens: prefix, * wildcard, $ anchor, longest-match " +
      "precedence, allow wins length ties, no-match defaults allowed") {
    val rules = Seq(
      ("d.com", "*", false, "/private/"),
      ("d.com", "*", true, "/private/pub*"),
      ("d.com", "*", false, "/exact$"),
      ("d.com", "*", false, "/a*z"),
      // equal length (6), opposite directives, both match "/tt"
      ("d.com", "*", false, "/t*"),
      ("d.com", "*", true, "*/tt"))
    val got = verdicts(Seq(
      (1L, "d.com", "/private/x"),      // blanket disallow
      (2L, "d.com", "/private/pub1"),   // longer allow re-opens
      (3L, "d.com", "/exact"),          // $ anchored: exact hit
      (4L, "d.com", "/exact/sub"),      // $ anchored: no match -> allowed
      (5L, "d.com", "/a-middle-z"),     // * spans arbitrary run
      (6L, "d.com", "/tt"),             // length tie -> allow wins
      (7L, "d.com", "/elsewhere"),      // no rule matches
      (8L, "other.net", "/private/x")), // no rules for domain
      rules)
    assert(got(1L) == ((false, Some(9L))))
    assert(got(2L) == ((true, Some(13L))))
    assert(got(3L) == ((false, Some(7L))))
    assert(got(4L) == ((true, None)))
    assert(got(5L) == ((false, Some(4L))))
    assert(got(6L) == ((true, Some(4L))))
    assert(got(7L) == ((true, None)))
    assert(got(8L) == ((true, None)))
  }

  test("LIKE metacharacters in patterns and paths stay LITERAL: '_' " +
      "matches only '_', '%' only '%' — RFC 9309 has no single-char " +
      "wildcard, only '*'") {
    val rules = Seq(
      ("d.com", "*", false, "/a_b"),     // '_' must not act as LIKE '_'
      ("e.com", "*", false, "/p%q"),     // '%' must not act as LIKE '%'
      ("f.com", "*", false, "/x_*z$"))   // escape composes with * and $
    val got = verdicts(Seq(
      (1L, "d.com", "/a_b/page"),  // literal underscore: blocked
      (2L, "d.com", "/aXb/page"),  // would match under unescaped LIKE
      (3L, "e.com", "/p%q"),       // literal percent: blocked
      (4L, "e.com", "/pWIDEq"),    // would match under unescaped LIKE
      (5L, "f.com", "/x_yyz"),     // _ literal, * spans, $ anchors
      (6L, "f.com", "/xAyyz")),    // _ is not a wildcard here either
      rules)
    assert(got(1L) == ((false, Some(4L))))
    assert(got(2L) == ((true, None)))
    assert(got(3L) == ((false, Some(4L))))
    assert(got(4L) == ((true, None)))
    assert(got(5L) == ((false, Some(6L))))
    assert(got(6L) == ((true, None)))
  }

  test("an empty Disallow is RFC 9309's allow-all no-op, not a " +
      "match-everything rule — even as a domain's only rule, and even " +
      "when its group is what selects") {
    val got = verdicts(
      Seq((1L, "d.com", "/anything"), (2L, "e.com", "/x")),
      Seq(
        ("d.com", "graftbot", false, ""),   // no-op, but selects the group
        ("d.com", "*", false, "/"),         // must be IGNORED (selection)
        ("e.com", "*", false, "")))         // only rule: allow all
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((true, None)))
  }

  test("group selection: a specific-agent group REPLACES the * group " +
      "(never merged), and * applies only where no specific group exists") {
    val rules = Seq(
      ("d.com", "*", false, "/docs/page"),    // longer: would win if merged
      ("d.com", "graftbot", true, "/docs/"),
      ("e.com", "*", false, "/docs/"),
      ("f.com", "graftbot", false, "/docs/"))
    val got = verdicts(Seq(
      (1L, "d.com", "/docs/page1"),  // graftbot group only: allowed
      (2L, "e.com", "/docs/page1"),  // * group applies: blocked
      (3L, "f.com", "/docs/page1")), // graftbot-only group: blocked
      rules)
    assert(got(1L) == ((true, Some(6L))))
    assert(got(2L) == ((false, Some(6L))))
    assert(got(3L) == ((false, Some(6L))))
    // a different agent sees the * groups (and default-allow on f.com)
    val other = verdicts(Seq(
      (1L, "d.com", "/docs/page1"), (3L, "f.com", "/docs/page1")),
      rules, agent = "otherbot")
    assert(other(1L)._1 == false)
    assert(other(3L) == ((true, None)))
  }

  test("plan shape: rules join is broadcast and robotsFilterOf is " +
      "sort-free (no rangepartitioning)") {
    val df = Robots.robotsFilterOf(
      graft.ext.UrlCurate.blocklistOf(graft.ext.UrlCurate
          .registrableDomainOf(graft.ext.UrlCurate.canonicalizeOf(
            graft.ext.UrlCurate.synthesizeUrlsOf(
              Tables(spark, sf0001, "documents")))))
        .filter(!col("blocked") && col("host").isNotNull)
        .withColumn("domain",
          coalesce(col("registrable_domain"), col("host")))
        .withColumn("path",
          regexp_replace(col("canon_url"), "^[a-z]+://[^/]*", ""))
        .select(col("doc_id"), col("domain"), col("path")),
      Robots.rulesDf(spark))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "robotsFilterOf must stay sort-free")
  }

  test("q150 crawl admission: cap binds AFTER policy — disallowed URLs " +
      "never consume a domain's budget; at most cap per domain, lowest " +
      "allowed doc_ids win") {
    import spark.implicits._
    val adm = Robots.crawlAdmission(spark, sf001)
      .select("domain", "doc_id", "cap_rank")
      .as[(String, Long, Int)].collect()
    val byDomain = adm.groupBy(_._1)
    assert(byDomain.values.forall(_.length <= graft.ext.UrlCurate.DomainCap))
    assert(byDomain.values.exists(_.length ==
      graft.ext.UrlCurate.DomainCap), "cap never binds")
    // reference: allowed set from q139, capped per domain by doc_id
    val verdicts = Robots.robotsFilter(spark, sf001)
      .select("domain", "doc_id", "allowed")
      .as[(String, Long, Boolean)].collect()
    for ((dom, rows) <- byDomain) {
      val expect = verdicts.filter(v => v._1 == dom && v._3)
        .map(_._2).sorted.take(graft.ext.UrlCurate.DomainCap).toSeq
      assert(rows.sortBy(_._3).map(_._2).toSeq == expect, s"domain $dom")
    }
    // policy-before-cap is observable: some domain's admitted set skips
    // over a blocked lower doc_id
    val skipped = byDomain.exists { case (dom, rows) =>
      verdicts.exists(v => v._1 == dom && !v._3 &&
        v._2 < rows.map(_._2).max)
    }
    assert(skipped, "no blocked URL below an admitted one — the " +
      "policy-then-cap order is untested by this corpus")
  }

  test("q152 frontier report: counts reconcile with q139 verdicts and " +
      "q150 admissions; cap_bound marks exactly the capped domains") {
    import spark.implicits._
    val report = Robots.frontierReport(spark, sf001).collect()
      .map(r => r.getAs[String]("domain") -> r).toMap
    val verdicts = Robots.robotsFilter(spark, sf001)
      .select("domain", "allowed").as[(String, Boolean)].collect()
      .groupBy(_._1)
    val admitted = Robots.crawlAdmission(spark, sf001)
      .select("domain").as[String].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(report.keySet == verdicts.keySet)
    for ((dom, r) <- report) {
      val vs = verdicts(dom)
      assert(r.getAs[Long]("n_urls") == vs.length)
      assert(r.getAs[Long]("n_allowed") == vs.count(_._2))
      assert(r.getAs[Long]("n_robots_blocked") == vs.count(!_._2))
      assert(r.getAs[Long]("n_admitted") ==
        admitted.getOrElse(dom, 0).toLong)
      assert(r.getAs[Boolean]("cap_bound") ==
        (vs.count(_._2) > graft.ext.UrlCurate.DomainCap))
    }
    assert(report.values.exists(_.getAs[Boolean]("cap_bound")))
    assert(report.values.exists(r => r.getAs[Long]("n_robots_blocked") > 0))
  }

  test("registered q139: every rule class fires on the synthesized " +
      "corpus — wildcard disallow, longer allow, blanket+$-anchored " +
      "re-open, group selection, graftbot-only block, default allow") {
    import spark.implicits._
    val rows = Robots.robotsFilter(spark, sf001)
      .select(col("domain"), col("allowed"), col("matched_len"))
      .as[(String, Boolean, Option[Long])].collect()
    def n(d: String, allowed: Boolean, len: Option[Long]): Int =
      rows.count(r => r._1 == d && r._2 == allowed && r._3 == len)
    // site0.com: wildcard disallow (len 14) dominates, item6* (16) re-opens
    assert(n("site0.com", false, Some(14L)) > 0)
    assert(n("site0.com", true, Some(16L)) > 0)
    // site1.co.uk: blanket (10) blocks, item1* (16) + anchored (21) re-open
    assert(n("site1.co.uk", false, Some(10L)) > 0)
    assert(n("site1.co.uk", true, Some(16L)) > 0)
    assert(n("site1.co.uk", true, Some(21L)) == 1)
    // site2.github.io: graftbot group selected ('*' item-disallow ignored),
    // graftbot item8* (16) blocks its subset
    assert(n("site2.github.io", true, Some(10L)) > 0)
    assert(n("site2.github.io", false, Some(16L)) > 0)
    assert(n("site2.github.io", false, Some(14L)) == 0)
    // site4.com.au: allow wins the 16/16 tie; anchored disallow hits one
    assert(n("site4.com.au", true, Some(16L)) > 0)
    assert(n("site4.com.au", false, Some(21L)) == 1)
    // site5.co.uk: graftbot-only group
    assert(n("site5.co.uk", false, Some(16L)) > 0)
    // untouched domains default to allowed with no match
    assert(n("site9.de", true, None) > 0)
    assert(!rows.exists(r => r._1 == "site9.de" && !r._2))
  }
}
