package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Robots-exclusion (crawl-policy) filtering — the gate RFC 9309 puts in
  * front of every web pipeline, completing the crawl front end: URL
  * curation (q129/q130) → ROBOTS POLICY (q139) → extraction (q123) →
  * link graph (q124).
  *
  * Semantics are the published Robots Exclusion Protocol (RFC 9309 §2,
  * the rules Googlebot documents publicly):
  *   - rules are grouped by user-agent; if ANY group names the crawling
  *     agent, that group applies and the `*` group is ignored entirely
  *     (group SELECTION, not merging);
  *   - a rule's path pattern matches from the beginning of the URL's
  *     path+query; `*` matches any run of characters and a trailing `$`
  *     anchors the match to the end;
  *   - among matching rules the MOST SPECIFIC (longest pattern) wins,
  *     and on an exact length tie the least restrictive (allow) wins;
  *   - a URL with no matching rule — or a host with no rules at all —
  *     is allowed.
  *
  * Spark-first shape: the rules frame is an INPUT (in production it is
  * the parsed per-host robots.txt corpus, keyed however the fetcher
  * stored it — here the registered query keys by registrable domain as
  * a domain-policy table). URLs join rules on the domain key with the
  * pattern match as a residual LIKE predicate, then ONE hash aggregate
  * per URL picks the winner via an integer score — `2·len(pattern) +
  * (allow ? 1 : 0)` — whose max encodes both the longest-match rule and
  * the allow-on-tie rule, so the whole verdict is a single max() with
  * map-side partial aggregation. With a config-sized rule set the join
  * is broadcast (plan-asserted in RobotsSpec); with a crawl-scale rule
  * corpus the same plan degrades gracefully to a hash join on the
  * domain key. No sort anywhere; the registered q139's ORDER BY is
  * oracle determinism only.
  *
  * Pattern→LIKE translation is exact for ALL REP patterns: `*` → `%`,
  * trailing `$` dropped (anchored = no trailing `%`), and every LIKE
  * metacharacter in the pattern (`%`, `_`, the escape `\`) is
  * backslash-escaped first, so a literal underscore in a robots path
  * pattern matches only an underscore — RFC 9309 patterns have no
  * single-char wildcard. The DuckDB oracle replays the translation
  * (with an explicit `ESCAPE '\'` — DuckDB's LIKE has no default
  * escape), the score, and the group selection string-for-string.
  */
object Robots {

  /** The crawling agent the registered query filters for. */
  val Agent = "graftbot"

  /** Config-as-data policy table for q139 — (domain, agent, allow,
    * pattern), exercising every REP rule class over the synthesized
    * URL corpus (see [[UrlCurate.synthesizeUrlsOf]]; doc ids on each
    * domain are fixed residues mod 30, noted per rule):
    *   - site0.com (ids ≡ 0 mod 30, query `?a=1&b=2`): wildcard
    *     disallow spanning path+query, re-opened by a LONGER allow;
    *   - site1.co.uk (ids ≡ 13 mod 30, query `?z=9`): blanket
    *     directory disallow, partially re-opened by a prefix allow and
    *     one `$`-anchored exact-URL allow;
    *   - site2.github.io (ids ≡ 26 mod 30): a `*` group that would
    *     block every /articles/item URL plus a graftbot group that
    *     allows them — proves group SELECTION (the `*` group's longer
    *     disallow must be ignored, not merged) — and a graftbot
    *     disallow blocking the item8… subset;
    *   - site4.com.au (ids ≡ 22 mod 30): equal-length allow/disallow
    *     tie on item2… URLs (allow wins) and a `$`-anchored disallow of
    *     exactly one URL including its query string;
    *   - site5.co.uk (ids ≡ 25 mod 30): a graftbot-ONLY group (no `*`
    *     group to fall back to);
    *   - every other domain: no rules → default allowed.
    */
  val Rules: Seq[(String, String, Boolean, String)] = Seq(
    ("site0.com", "*", false, "/articles/*0?*"),
    ("site0.com", "*", true, "/articles/item6*"),
    ("site1.co.uk", "*", false, "/articles/"),
    ("site1.co.uk", "*", true, "/articles/item1*"),
    ("site1.co.uk", "*", true, "/articles/item43?z=9$"),
    ("site2.github.io", "*", false, "/articles/item"),
    ("site2.github.io", "graftbot", true, "/articles/"),
    ("site2.github.io", "graftbot", false, "/articles/item8*"),
    ("site4.com.au", "*", false, "/articles/item2*"),
    ("site4.com.au", "*", true, "/articles/item*2"),
    ("site4.com.au", "*", false, "/articles/item52?z=9$"),
    ("site5.co.uk", "graftbot", false, "/articles/item8*"))

  /** The q139 policy table as a DataFrame (config-as-data, the
    * blocklist idiom). */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Rules.toDF("domain", "agent", "allow", "pattern")
  }

  /** RFC 9309 group selection: keep the `agent` group where one exists
    * for the domain, else the `*` group. Empty-pattern rules are
    * dropped HERE, not at match time — RFC 9309 §2.2.2 defines an
    * empty `Disallow:` as "allow all" (a no-op rule), whereas a naive
    * LIKE translation of "" would match every path at the lowest
    * specificity and block everything on a domain whose only rule is
    * the empty disallow. Two passes over the (small) rules frame; the
    * existence probe is a broadcast semi-structure. NOTE: group
    * existence is decided BEFORE the empty-rule drop (a group
    * consisting solely of the no-op rule still selects). */
  def applicableRulesOf(rules: DataFrame, agent: String): DataFrame = {
    val specific = rules.filter(col("agent") === agent)
      .select(col("domain").as("_specific_domain")).distinct()
    rules.join(broadcast(specific),
        col("domain") === col("_specific_domain"), "left")
      .filter(col("agent") === agent ||
        (col("agent") === "*" && col("_specific_domain").isNull))
      .filter(length(col("pattern")) > 0)
      .drop("_specific_domain")
  }

  /** Verdict for every row of `urls` (`domain`, `path` columns, any
    * others carried through): appends `allowed` and `matched_len` (the
    * winning pattern's length, null when no rule matched). One
    * broadcast-or-hash join on the domain key with the REP pattern
    * match as a residual LIKE, then one max() aggregate per URL —
    * longest-match and allow-on-tie both live in the integer score
    * `2·len + allow`.
    */
  def robotsFilterOf(urls: DataFrame, rules: DataFrame,
      agent: String = Agent): DataFrame = {
    // backslash-escape LIKE metachars BEFORE '*'→'%' so pattern
    // literals '%'/'_' stay literal (Spark LIKE's default escape is \)
    def likeOf(c: Column): Column =
      replace(replace(replace(replace(c,
        lit("\\"), lit("\\\\")),
        lit("%"), lit("\\%")),
        lit("_"), lit("\\_")),
        lit("*"), lit("%"))
    val app = applicableRulesOf(rules, agent)
      .withColumn("_like_pat",
        when(col("pattern").endsWith("$"),
          likeOf(expr("substring(pattern, 1, length(pattern) - 1)")))
        .otherwise(concat(likeOf(col("pattern")), lit("%"))))
      .withColumn("_score",
        length(col("pattern")) * 2 + col("allow").cast("int"))
      .select(col("domain").as("_rule_domain"), col("_like_pat"),
        col("_score"))
    val carried = urls.columns.map(col).toSeq
    urls.join(broadcast(app),
        col("domain") === col("_rule_domain") &&
          expr("path LIKE _like_pat"), "left")
      .groupBy(carried: _*)
      .agg(max(col("_score")).as("_best"))
      .withColumn("allowed", coalesce(col("_best") % 2 === 1, lit(true)))
      .withColumn("matched_len", expr("_best div 2"))
      .drop("_best")
  }

  /** (doc_id, url) → curated (doc_id, domain, path): the q129
    * canonicalization → PSL → blocklist chain reduced to the robots
    * join key and match subject. Narrow; shared by the batch q139 and
    * the streaming crawl-policy stage. */
  def curatedUrlsOf(urls: DataFrame): DataFrame =
    UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
        UrlCurate.canonicalizeOf(urls)))
      .filter(!col("blocked") && col("host").isNotNull)
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
      .withColumn("path",
        regexp_replace(col("canon_url"), "^[a-z]+://[^/]*", ""))
      .select(col("doc_id"), col("domain"), col("path"))

  /** The full policy verdict over a raw (doc_id, url) frame with the
    * [[Rules]] table — the streaming stage's transform. */
  def policyOf(urls: DataFrame): DataFrame =
    robotsFilterOf(curatedUrlsOf(urls), rulesDf(urls.sparkSession))
      .select(col("doc_id"), col("domain"), col("path"), col("allowed"),
        col("matched_len"))

  /** q139: the curated URL corpus (q129's synthesis → canonicalization
    * → PSL → blocklist chain) filtered through the [[Rules]] policy
    * table for [[Agent]]. ORDER BY = oracle determinism only. */
  def robotsFilter(spark: SparkSession, dir: String): DataFrame =
    policyOf(UrlCurate.synthesizeUrlsOf(Tables(spark, dir, "documents")))
      .orderBy(col("doc_id"))

  private def rulesValues: String = Rules.map { case (d, a, al, p) =>
    s"('$d', '$a', ${if (al) "TRUE" else "FALSE"}, '$p')"
  }.mkString(",\n         ")

  /** Shared oracle chain ending in `m` (doc_id, domain, path, best) —
    * the scored verdict table the q139 oracle reads directly and the
    * q150 admission oracle caps. `private[ext]` like
    * [[UrlCurate.curateCte]]. */
  /** A single backslash for the oracle templates: the s-interpolator
    * processes escape sequences even in triple quotes, so `\` literals
    * must arrive via interpolation. */
  private val B = "\\"

  private[ext] def robotsCte: String =
    s"""${UrlCurate.curateCte},
       urls AS (SELECT doc_id,
           coalesce(registrable_domain, host) AS domain,
           regexp_replace(canon_url, '^[a-z]+://[^/]*', '') AS path
         FROM blk WHERE NOT blocked AND host IS NOT NULL),
       rules(domain, agent, allow, pattern) AS (VALUES
         $rulesValues),
       spec AS (SELECT DISTINCT domain AS sd FROM rules
         WHERE agent = 'graftbot'),
       esc AS (SELECT *, replace(replace(replace(
             CASE WHEN r.pattern LIKE '%$$'
                  THEN substr(r.pattern, 1, length(r.pattern) - 1)
                  ELSE r.pattern END,
             '$B', '$B$B'), '%', '$B%'), '_', '${B}_') AS esc_pat
         FROM rules r),
       app AS (SELECT r.domain AS rule_domain,
           CASE WHEN r.pattern LIKE '%$$'
                THEN replace(r.esc_pat, '*', '%')
                ELSE replace(r.esc_pat, '*', '%') || '%' END AS like_pat,
           length(r.pattern) * 2 +
             CASE WHEN r.allow THEN 1 ELSE 0 END AS score
         FROM esc r LEFT JOIN spec s ON s.sd = r.domain
         WHERE (r.agent = 'graftbot'
            OR (r.agent = '*' AND s.sd IS NULL))
           AND length(r.pattern) > 0),
       m AS (SELECT u.doc_id, u.domain, u.path,
           max(a.score) AS best
         FROM urls u LEFT JOIN app a ON a.rule_domain = u.domain
           AND u.path LIKE a.like_pat ESCAPE '$B'
         GROUP BY 1, 2, 3)"""

  /** Oracle for q139 [[robotsFilter]] — replays the URL chain (the
    * shared q129 CTE), the VALUES policy table, group selection, the
    * LIKE translation, and the integer score. */
  lazy val robotsFilterOracle: String =
    s"""WITH $robotsCte
       SELECT doc_id, domain, path,
         coalesce(best % 2 = 1, TRUE) AS allowed,
         best // 2 AS matched_len
       FROM m ORDER BY doc_id"""

  /** q150: the frontier ADMISSION gate end to end — canonicalize → PSL
    * → blocklist → robots verdict → per-domain cap over the ALLOWED
    * URLs only (q130's anti-domination window applied after policy, the
    * order a real frontier applies them: a domain's disallowed URLs
    * must not consume its crawl budget). ONE broadcast join + one
    * verdict aggregate + one domain-keyed window. ORDER BY = oracle
    * determinism only. */
  def crawlAdmission(spark: SparkSession, dir: String,
      cap: Int = UrlCurate.DomainCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    policyOf(UrlCurate.synthesizeUrlsOf(
        graft.Tables.spreadScan(spark, dir, "documents")))
      .filter(col("allowed"))
      .withColumn("cap_rank", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("doc_id"))))
      .filter(col("cap_rank") <= cap)
      .select(col("doc_id"), col("domain"), col("path"), col("cap_rank"))
      .orderBy(col("domain"), col("doc_id"))
  }

  /** q152: per-domain frontier report — the observability rollup of
    * the whole admission chain: URLs seen, robots-allowed, robots-
    * blocked, and admitted-under-cap counts per domain, plus the
    * binding state (whether the cap actually cut). The run-ledger view
    * a crawl operator reads after every frontier pass. One aggregate
    * over the already-computed verdicts + one over the admission — the
    * same plans as q139/q150 feeding two slim counts. ORDER BY =
    * oracle determinism only. */
  def frontierReport(spark: SparkSession, dir: String,
      cap: Int = UrlCurate.DomainCap): DataFrame = {
    val verdicts = policyOf(UrlCurate.synthesizeUrlsOf(
      graft.Tables.spreadScan(spark, dir, "documents")))
    val perDomain = verdicts.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        sum(col("allowed").cast("long")).as("n_allowed"),
        sum((!col("allowed")).cast("long")).as("n_robots_blocked"))
    perDomain
      .withColumn("n_admitted", least(col("n_allowed"), lit(cap.toLong)))
      .withColumn("cap_bound", col("n_allowed") > cap)
      .orderBy(col("domain"))
  }

  /** Oracle for q152 [[frontierReport]]. */
  lazy val frontierReportOracle: String =
    s"""WITH $robotsCte,
       v AS (SELECT domain,
           coalesce(best % 2 = 1, TRUE) AS allowed FROM m),
       g AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_allowed,
           CAST(sum(CASE WHEN allowed THEN 0 ELSE 1 END) AS BIGINT)
             AS n_robots_blocked
         FROM v GROUP BY domain)
       SELECT domain, n_urls, n_allowed, n_robots_blocked,
         least(n_allowed, ${UrlCurate.DomainCap}) AS n_admitted,
         n_allowed > ${UrlCurate.DomainCap} AS cap_bound
       FROM g ORDER BY domain"""

  /** Oracle for q150 [[crawlAdmission]]. */
  lazy val crawlAdmissionOracle: String =
    s"""WITH $robotsCte,
       adm AS (SELECT doc_id, domain, path,
           CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id)
             AS INT) AS cap_rank
         FROM m WHERE coalesce(best % 2 = 1, TRUE))
       SELECT doc_id, domain, path, cap_rank FROM adm
       WHERE cap_rank <= ${UrlCurate.DomainCap}
       ORDER BY domain, doc_id"""
}
