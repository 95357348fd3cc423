package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** URL/domain-level curation — the FIRST gate of RefinedWeb/FineWeb-
  * shaped web pipelines (Penedo et al. 2023), upstream of extraction
  * (q123) and the link graph (q124): canonicalize every URL, derive its
  * registrable domain with the public-suffix algorithm
  * (publicsuffix.org/list/ — the published Mozilla PSL matching rules),
  * drop blocklisted domains, and cap documents per registrable domain
  * so no single site dominates the corpus.
  *
  * Everything before the cap is a NARROW map: canonicalization is pure
  * string expressions, and public-suffix matching folds each host's
  * label-suffix candidates against the rule set INLINED as array
  * literals — the PSL is configuration, not data, so no join and no
  * shuffle at any corpus size. The cap is one hash-partitioned window
  * (registrable domain → row_number), the only exchange in the
  * pipeline.
  *
  * Canonicalization contract (deterministic, engine-portable — the
  * DuckDB oracle replays it string-for-string):
  *   - scheme and host lowercased; fragment dropped;
  *   - default ports stripped (http:80, https:443), others kept;
  *   - ONE trailing slash dropped from the path; empty path becomes "/";
  *   - tracking parameters removed (`utm_*` prefix, fbclid, gclid,
  *     ref), remaining `k=v` pairs sorted lexicographically;
  *   - URLs without a `://` scheme pass through trimmed, host null
  *     (canonicalization is defined over absolute URLs).
  */
object UrlCurate {

  /** Query parameters dropped by canonicalization (exact names; the
    * `utm_` prefix is handled separately). */
  val TrackingParams = Seq("fbclid", "gclid", "ref")

  /** Public-suffix rules, publicsuffix.org syntax: exact suffixes,
    * one `*.` wildcard, one `!` exception — a representative subset
    * inlined as config-as-data (the full published list drops in the
    * same way). `github.io` stands in for the PSL private section. */
  val PslExact = Seq("com", "org", "net", "de", "uk", "co.uk", "ac.uk",
    "au", "com.au", "io", "github.io", "jp", "co.jp")
  val PslWild = Seq("*.ck")
  val PslException = Seq("www.ck")

  /** Per-domain document cap for the registered q130. */
  val DomainCap = 5

  /** Registered q129/q130 blocklist (registrable domains). */
  val Blocklist = Seq("site8.com", "site7.co.uk", "site3.de")

  private def lits(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /** Canonicalize `url` into (scheme, host, canon_url) columns appended
    * to the frame. Pure narrow expressions, fully codegen'd. */
  def canonicalizeOf(urls: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = trim(col(urlCol))
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = substring_index(afterScheme, "#", 1)
    val authority = regexp_extract(noFrag, "^([^/?]*)", 1)
    val pathq = substr(noFrag, length(authority) + 1, length(noFrag))
    val path = substring_index(pathq, "?", 1)
    val qstr = when(instr(pathq, "?") > 0,
      substr(pathq, instr(pathq, "?") + 1, length(pathq))).otherwise("")
    val host = lower(substring_index(authority, ":", 1))
    val port = when(instr(authority, ":") > 0,
      substring_index(authority, ":", -1)).otherwise("")
    val portPart = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), "")
      .otherwise(concat(lit(":"), port))
    val path1 = regexp_replace(path, "/$", "")
    val pathNorm = when(path1 === "", "/").otherwise(path1)
    val params = array_sort(filter(split(qstr, "&"), p => {
      val name = substring_index(p, "=", 1)
      p =!= "" && !name.startsWith("utm_") &&
        !name.isin(TrackingParams.map(x => x: Any): _*)
    }))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise("")
    urls
      .withColumn("scheme", when(scheme =!= "", scheme))
      .withColumn("host", when(scheme =!= "", host))
      .withColumn("canon_url", when(scheme === "", u)
        .otherwise(concat(scheme, lit("://"), host, portPart, pathNorm,
          queryPart)))
  }

  /** Append `registrable_domain` from `host` by the public-suffix
    * algorithm — exception > any match > none, longer suffixes over
    * shorter, default `*` rule when nothing matches, null when the host
    * IS a public suffix. One compact codegen'd expression
    * ([[graft.functions.PublicSuffixDomain]]) with the rules hashed
    * once per plan: the same algorithm as a column fold over inlined
    * literals generated thousands of Java lines and cost seconds of
    * Janino compilation per cold query. */
  def registrableDomainOf(df: DataFrame,
      exact: Seq[String] = PslExact, wild: Seq[String] = PslWild,
      exception: Seq[String] = PslException): DataFrame =
    df.withColumn("registrable_domain",
      graft.functions.PublicSuffix.registrable_domain(
        col("host"), exact, wild, exception))

  /** Append `blocked` from the (inlined) registrable-domain blocklist. */
  def blocklistOf(df: DataFrame,
      blocklist: Seq[String] = Blocklist): DataFrame =
    df.withColumn("blocked",
      coalesce(array_contains(lits(blocklist), col("registrable_domain")),
        lit(false)))

  /** Keep at most `cap` documents per registrable domain (lowest doc_id
    * wins — deterministic), blocked domains dropped entirely; hosts
    * without a registrable domain count as their own group. The one
    * shuffle of the pipeline: a hash-partitioned window on the domain
    * key. */
  def domainCapOf(df: DataFrame, cap: Int = DomainCap): DataFrame =
    df.filter(!col("blocked") && col("host").isNotNull)
      // materialize the domain column FIRST: partitioning the window on
      // the raw coalesce(...) expression would re-inline the whole
      // canonicalization/PSL tree into the exchange key
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("doc_id"))))
      .filter(col("_rk") <= cap)
      .drop("_rk")

  /** Deterministic URL synthesis for the registered queries (the corpus
    * has no URL column — the q123 idiom): scheme/sub/case/port/path/
    * tracking-param/fragment variants all driven by doc_id arithmetic so
    * every canonicalization rule is exercised and the oracle re-derives
    * the same strings. */
  def synthesizeUrlsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), synthUrlExpr.as("url"))

  /** The synthesized-URL expression over `doc_id` — shared so consumers
    * that need other columns of the same scan (q144 carries `text`)
    * attach it without a self-join. */
  private[ext] def synthUrlExpr: Column = {
    val id = col("doc_id")
    val coreNum = (id * 7) % 10
    val core = when(id % 7 === 0, concat(lit("SITE"), coreNum))
      .otherwise(concat(lit("site"), coreNum))
    val suffix = element_at(
      lits(Seq("com", "co.uk", "github.io", "de", "com.au", "ck")),
      ((id % 6) + 1).cast("int"))
    val sub = when(id % 3 === 0, "www.").when(id % 3 === 1, "news.")
      .otherwise("")
    val scheme = when(id % 2 === 0, "https").otherwise("HTTP")
    val port = when(id % 5 === 0, when(id % 2 === 0, ":443").otherwise(":80"))
      .when(id % 5 === 1, ":8080").otherwise("")
    val path = concat(lit("/articles/item"), id,
      when(id % 4 === 0, "/").otherwise(""))
    val query = when(id % 3 === 0, "?utm_source=feed&b=2&a=1")
      .when(id % 3 === 1, "?z=9&fbclid=abc").otherwise("")
    val frag = when(id % 6 === 0, "#top").otherwise("")
    concat(scheme, lit("://"), sub, core, lit("."), suffix,
      port, path, query, frag)
  }

  /** Scalar twin of [[synthUrlExpr]] for synthesis paths that build
    * whole byte blobs JVM-side (the WARC writer assembles records in a
    * `mapGroups`, where a Column cannot reach). Rule-for-rule identical;
    * WarcSpec pins expression ≡ scalar over the corpus. */
  private[graft] def synthUrlScala(id: Long): String = {
    val core = (if (id % 7 == 0) "SITE" else "site") + ((id * 7) % 10)
    val suffix = Seq("com", "co.uk", "github.io", "de", "com.au",
      "ck")((id % 6).toInt)
    val sub = if (id % 3 == 0) "www." else if (id % 3 == 1) "news." else ""
    val scheme = if (id % 2 == 0) "https" else "HTTP"
    val port =
      if (id % 5 == 0) { if (id % 2 == 0) ":443" else ":80" }
      else if (id % 5 == 1) ":8080" else ""
    val path = s"/articles/item$id" + (if (id % 4 == 0) "/" else "")
    val query =
      if (id % 3 == 0) "?utm_source=feed&b=2&a=1"
      else if (id % 3 == 1) "?z=9&fbclid=abc" else ""
    val frag = if (id % 6 == 0) "#top" else ""
    s"$scheme://$sub$core.$suffix$port$path$query$frag"
  }

  /** q129: synthesize, canonicalize, derive the registrable domain,
    * apply the blocklist. Narrow until the output ORDER BY (oracle
    * determinism only). */
  def urlCurate(spark: SparkSession, dir: String): DataFrame =
    blocklistOf(registrableDomainOf(canonicalizeOf(
        synthesizeUrlsOf(Tables(spark, dir, "documents")))))
      .select(col("doc_id"), col("url"), col("canon_url"), col("host"),
        col("registrable_domain"), col("blocked"))
      .orderBy(col("doc_id"))

  /** q130: the capped corpus — which documents survive the per-domain
    * cap after blocklisting. ORDER BY = oracle determinism only. */
  def domainCaps(spark: SparkSession, dir: String): DataFrame =
    domainCapOf(blocklistOf(registrableDomainOf(canonicalizeOf(
        synthesizeUrlsOf(Tables(spark, dir, "documents"))))))
      .select(col("doc_id"), col("domain"))
      .orderBy(col("domain"), col("doc_id"))

  /** q144: per-domain quality scorecard — the aggregation FineWeb/
    * RefinedWeb-shaped pipelines run between URL curation (q129/q130)
    * and document-level filtering: spam and SEO farms are domain-level
    * phenomena, so token/vocabulary/stopword statistics are rolled up
    * per registrable domain and thresholds are then corpus policy
    * (this operator ships the exact statistics, not a verdict).
    *
    * All ratios divide two EXACT integer sums once and round to 4
    * decimals (the q28 idiom), so the whole scorecard is hash-oracled.
    * Plan: domain key and text metrics both derive from the same
    * documents scan — one scan, one hash aggregate, no join, sort-free
    * but for the output ORDER BY (oracle determinism only). */
  def domainScorecard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val withDomain = blocklistOf(registrableDomainOf(canonicalizeOf(
        docs.select(col("doc_id"), col("text"), synthUrlExpr.as("url")))))
      .filter(!col("blocked") && col("host").isNotNull)
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
    val w = split(col("text"), " ")
    val stopArr = array(TextAnalysis.stopwordList.map(lit): _*)
    def q4(x: String): String = graft.functions.DetLn.fix4Sql(x)
    withDomain
      .select(col("domain"), col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("chars"),
        size(w).cast("long").as("toks"),
        size(array_distinct(w)).cast("long").as("uniq"),
        size(filter(w, t => array_contains(stopArr, t))).cast("long")
          .as("stops"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("sum_tokens"),
        sum(col("chars")).as("_chars"),
        sum(col("uniq")).as("_uniq"),
        sum(col("stops")).as("_stops"))
      .select(col("domain"), col("n_docs"), col("sum_tokens"),
        expr(q4("CAST(sum_tokens AS DOUBLE) / n_docs")).as("avg_tokens"),
        expr(q4("CAST(_chars AS DOUBLE) / sum_tokens"))
          .as("avg_token_chars"),
        expr(q4("CAST(_uniq AS DOUBLE) / sum_tokens")).as("uniq_ratio"),
        expr(q4("CAST(_stops AS DOUBLE) / sum_tokens")).as("stop_ratio"))
      .orderBy(col("domain"))
  }

  /** Oracle for q144 [[domainScorecard]] — the shared URL chain joined
    * back to the text, the same exact integer sums, and the same
    * deterministic 4-decimal quantization of each ratio. */
  // lazy: curateCte is declared below (initialization order)
  lazy val domainScorecardOracle: String = {
    def q4(x: String): String = graft.functions.DetLn.fix4Sql(x)
    val stops = TextAnalysis.stopwordList.map("'" + _ + "'").mkString(",")
    s"""WITH $curateCte,
       m AS (SELECT coalesce(b.registrable_domain, b.host) AS domain,
           CAST(length(replace(t.text, ' ', '')) AS BIGINT) AS chars,
           CAST(len(string_split(t.text, ' ')) AS BIGINT) AS toks,
           CAST(len(list_distinct(string_split(t.text, ' '))) AS BIGINT)
             AS uniq,
           CAST(len(list_filter(string_split(t.text, ' '),
             x -> list_contains([$stops], x))) AS BIGINT) AS stops
         FROM blk b JOIN documents t ON t.doc_id = b.doc_id
         WHERE NOT b.blocked AND b.host IS NOT NULL),
       g AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS sum_tokens,
           CAST(sum(chars) AS BIGINT) AS sum_chars,
           CAST(sum(uniq) AS BIGINT) AS sum_uniq,
           CAST(sum(stops) AS BIGINT) AS sum_stops
         FROM m GROUP BY domain)
       SELECT domain, n_docs, sum_tokens,
         ${q4("CAST(sum_tokens AS DOUBLE) / n_docs")} AS avg_tokens,
         ${q4("CAST(sum_chars AS DOUBLE) / sum_tokens")}
           AS avg_token_chars,
         ${q4("CAST(sum_uniq AS DOUBLE) / sum_tokens")} AS uniq_ratio,
         ${q4("CAST(sum_stops AS DOUBLE) / sum_tokens")} AS stop_ratio
       FROM g ORDER BY domain"""
  }

  /** q151: per-domain token-length quantile sketch — the q141
    * [[graft.functions.HashSample]] machinery on the crawl grouping:
    * "what is the p95 document length on this domain" is the
    * length-profile gate next to q144's mean-based scorecard (means
    * hide bimodal length farms; the quartiles don't). Same single
    * documents scan as q144 (domain key + token count, no self-join),
    * one O(k)-state aggregate, k=64. Groups smaller than k degrade to
    * the EXACT discrete quantiles; either way the DuckDB oracle
    * replays the draw and the ceil-rank picks. ORDER BY = oracle
    * determinism only. */
  def domainQuantiles(spark: SparkSession, dir: String,
      k: Int = 64): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val base = blocklistOf(registrableDomainOf(canonicalizeOf(
        docs.select(col("doc_id"), col("text"), synthUrlExpr.as("url")))))
      .filter(!col("blocked") && col("host").isNotNull)
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
      .select(col("domain"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    Quantiles.sketchQuantilesOf(base, "domain",
        expr(graft.functions.DetMix.mixSql("doc_id", Quantiles.Seed)),
        "toks", "doc_id", k)
      .orderBy(col("grp"))
  }

  /** Oracle for q151 [[domainQuantiles]]. */
  lazy val domainQuantilesOracle: String =
    s"""WITH $curateCte,
       base AS (SELECT coalesce(b.registrable_domain, b.host) AS domain,
           b.doc_id,
           CAST(len(string_split(t.text, ' ')) AS BIGINT) AS toks,
           ${graft.functions.DetMix.mixSql("b.doc_id",
             Quantiles.Seed)} AS h
         FROM blk b JOIN documents t ON t.doc_id = b.doc_id
         WHERE NOT b.blocked AND b.host IS NOT NULL),
       cnt AS (SELECT domain, CAST(count(*) AS BIGINT) AS n
         FROM base GROUP BY domain),
       sel AS (SELECT domain, toks FROM (SELECT domain, toks,
             row_number() OVER (PARTITION BY domain ORDER BY h, doc_id)
               AS hr
           FROM base) WHERE hr <= 64),
       r AS (SELECT domain, toks,
           row_number() OVER (PARTITION BY domain ORDER BY toks) AS rn,
           count(*) OVER (PARTITION BY domain) AS m
         FROM sel),
       e AS (SELECT domain, CAST(max(m) AS INT) AS m,
           ${Quantiles.pickSql("rn", "m", "toks", "_est")}
         FROM r GROUP BY domain)
       SELECT cnt.domain AS grp, cnt.n, e.m,
           e.p25_est, e.p50_est, e.p75_est, e.p95_est
       FROM cnt JOIN e ON e.domain = cnt.domain ORDER BY grp"""

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString(", ")

  /** The URL-synthesis CTE alone (the `u` table of [[curateCte]]) —
    * `private[ext]` so oracles that need the synthesized URLs without
    * the canonicalization chain (the WARC family's `WARC-Target-URI`)
    * replay exactly the corpus [[synthUrlExpr]] builds. */
  /** The synthesized-URL SQL expression over ANY id expression —
    * parameterized so oracles can compute the URL of an id that has no
    * documents row (q158's dangling redirect targets). Twin of
    * [[synthUrlExpr]]/[[synthUrlScala]] rule for rule. */
  private[ext] def urlExprSql(id: String): String =
    s"""CASE WHEN ($id) % 2 = 0 THEN 'https' ELSE 'HTTP' END || '://' ||
         CASE WHEN ($id) % 3 = 0 THEN 'www.'
              WHEN ($id) % 3 = 1 THEN 'news.' ELSE '' END ||
         CASE WHEN ($id) % 7 = 0 THEN 'SITE' ELSE 'site' END ||
           CAST((($id) * 7) % 10 AS VARCHAR) || '.' ||
         list_extract(['com','co.uk','github.io','de','com.au','ck'],
           CAST(($id) % 6 + 1 AS INT)) ||
         CASE WHEN ($id) % 5 = 0 THEN
                CASE WHEN ($id) % 2 = 0 THEN ':443' ELSE ':80' END
              WHEN ($id) % 5 = 1 THEN ':8080' ELSE '' END ||
         '/articles/item' || CAST(($id) AS VARCHAR) ||
         CASE WHEN ($id) % 4 = 0 THEN '/' ELSE '' END ||
         CASE WHEN ($id) % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
              WHEN ($id) % 3 = 1 THEN '?z=9&fbclid=abc' ELSE '' END ||
         CASE WHEN ($id) % 6 = 0 THEN '#top' ELSE '' END"""

  private[ext] val urlCte: String =
    s"""u AS (SELECT doc_id, ${urlExprSql("doc_id")} AS url
       FROM documents)"""

  /** Shared oracle chain: synthesis → canonicalization → PSL →
    * blocklist, replayed analytically (every rule string-for-string).
    * `private[ext]` so the robots-policy oracle (q139) replays the same
    * URL corpus it filters. */
  private[ext] val curateCte: String =
    s"""$urlCte,
       p0 AS (SELECT doc_id, url,
           lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             AS scheme,
           split_part(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://',
             ''), '#', 1) AS nofrag
         FROM u),
       p1 AS (SELECT doc_id, url, scheme, nofrag,
           regexp_extract(nofrag, '^([^/?]*)', 1) AS auth
         FROM p0),
       p2 AS (SELECT doc_id, url, scheme,
           lower(split_part(auth, ':', 1)) AS host,
           split_part(auth, ':', 2) AS port,
           substr(nofrag, length(auth) + 1) AS pathq
         FROM p1),
       p3 AS (SELECT doc_id, url, scheme, host,
           CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                  OR (scheme = 'http' AND port = '80') THEN ''
                ELSE ':' || port END AS portpart,
           regexp_replace(split_part(pathq, '?', 1), '/$$', '') AS path1,
           CASE WHEN strpos(pathq, '?') > 0
                THEN substr(pathq, strpos(pathq, '?') + 1) ELSE '' END
             AS qstr
         FROM p2),
       p4 AS (SELECT doc_id, url, scheme, host, portpart,
           CASE WHEN path1 = '' THEN '/' ELSE path1 END AS pathnorm,
           list_sort(list_filter(string_split(qstr, '&'),
             p -> p <> '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
               AND split_part(p, '=', 1) NOT IN
                 (${sqlList(TrackingParams)}))) AS params
         FROM p3),
       c AS (SELECT doc_id, url, host,
           scheme || '://' || host || portpart || pathnorm ||
           CASE WHEN len(params) > 0
                THEN '?' || array_to_string(params, '&') ELSE '' END
             AS canon_url
         FROM p4),
       lab AS (SELECT doc_id, string_split(host, '.') AS ls FROM c),
       cand AS (SELECT doc_id, ls, len(ls) AS n,
           unnest(generate_series(1, least(len(ls), 6))) AS i
         FROM lab),
       sc AS (SELECT doc_id, n, i,
           array_to_string(ls[n-i+1:n], '.') AS ex,
           CASE WHEN i = 1 THEN '*'
                ELSE '*.' || array_to_string(ls[n-i+2:n], '.') END AS wc
         FROM cand),
       best AS (SELECT doc_id, any_value(n) AS n,
           coalesce(max(CASE
             WHEN ex IN (${sqlList(PslException)}) THEN 200 + i - 1
             WHEN ex IN (${sqlList(PslExact)})
               OR wc IN (${sqlList(PslWild)}) THEN 100 + i END) % 100, 1)
             AS ps
         FROM sc GROUP BY doc_id),
       reg AS (SELECT c.doc_id, c.url, c.canon_url, c.host,
           CASE WHEN best.n > best.ps
                THEN array_to_string(
                  (string_split(c.host, '.'))[best.n - best.ps:best.n], '.')
                END AS registrable_domain
         FROM c JOIN best ON best.doc_id = c.doc_id),
       blk AS (SELECT *, coalesce(registrable_domain IN
             (${sqlList(Blocklist)}), FALSE) AS blocked
         FROM reg)"""

  /** Oracle for q129 [[urlCurate]]. */
  val urlCurateOracle: String =
    s"""WITH $curateCte
       SELECT doc_id, url, canon_url, host, registrable_domain, blocked
       FROM blk ORDER BY doc_id"""

  /** Oracle for q130 [[domainCaps]]. */
  val domainCapsOracle: String =
    s"""WITH $curateCte,
       capd AS (SELECT doc_id,
           coalesce(registrable_domain, host) AS domain,
           row_number() OVER (PARTITION BY coalesce(registrable_domain,
             host) ORDER BY doc_id) AS rk
         FROM blk WHERE NOT blocked)
       SELECT doc_id, domain FROM capd WHERE rk <= $DomainCap
       ORDER BY domain, doc_id"""
}
