package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The crawl front composed end to end — extraction (q123), link graph
  * (q124), PageRank (q105's integer ranks), and an exact-dedup +
  * quality verdict (q60's posture) as ONE pipeline over the same
  * markup, the way a production web-corpus run strings the operators
  * together. The `...Of` forms make the composition plain DataFrames;
  * the block parse ([[graft.functions.HtmlBlocks]]) runs ONCE —
  * `extractContentOf`'s output is checkpointed and every downstream
  * consumer (token gate, dup keeper, final join) reads the
  * materialization, never re-parses (spec-asserted).
  *
  * Verdict semantics (all replayed by the DuckDB oracle):
  *   - `n_tokens_main`: tokens of the extracted main text;
  *   - `rank_micro`: 2 integer-PageRank rounds over the resolved link
  *     edges ([[Boilerplate.linkEdgesOf]]); isolated documents rank 0;
  *   - `is_dup`: the document's extracted text equals a LOWER doc_id's
  *     extraction (exact post-extraction dedup — the cheap pass before
  *     near-dup; grouped on md5 so the shuffle ships 16-byte keys, not
  *     text). Empty extractions are not dups of each other — they fail
  *     the quality gate instead;
  *   - `keep`: not a dup, has content blocks, ≥ 20 main-text tokens.
  */
object CrawlPipeline {

  /** PageRank rounds in the composed pipeline (unrolled in the oracle). */
  val PrIterations = 2

  /** Minimum main-text tokens for the quality gate. */
  val MinTokens = 20

  /** The composed pipeline over any (doc_id, html) frame. */
  def crawlPipelineOf(html: DataFrame): DataFrame = {
    // ONE block parse, materialized: three consumers follow
    val ext = Boilerplate.extractContentOf(html)
      .select(col("doc_id"), col("n_content"), col("main_text"))
      .localCheckpoint(eager = false)
    val ranks = graft.ops.PageRank
      .pageRankOf(Boilerplate.linkEdgesOf(html), PrIterations)
      .select(col("node").as("doc_id"), col("rank_micro"))
    val keeper = ext.filter(col("main_text") =!= "")
      .groupBy(md5(col("main_text")).as("_k"))
      .agg(min(col("doc_id")).as("_keep_id"))
    ext
      .join(keeper.withColumnRenamed("_k", "_mk"),
        md5(col("main_text")) === col("_mk"), "left")
      .join(ranks, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_content"),
        size(filter(split(col("main_text"), " "), t => t =!= lit("")))
          .cast("long").as("n_tokens_main"),
        coalesce(col("rank_micro"), lit(0L)).as("rank_micro"),
        (col("_keep_id").isNotNull && col("doc_id") =!= col("_keep_id"))
          .as("is_dup"))
      .withColumn("keep",
        !col("is_dup") && col("n_content") >= 1 &&
          col("n_tokens_main") >= MinTokens)
  }

  /** q132: the composed pipeline over the q124 linked synthesis. ORDER
    * BY = oracle determinism only. */
  def crawlPipeline(spark: SparkSession, dir: String): DataFrame =
    crawlPipelineOf(Boilerplate.synthesizeLinkedHtmlOf(
        Tables(spark, dir, "documents").select(col("doc_id"), col("text"))))
      .orderBy(col("doc_id"))

  /** Oracle: the q123 content classification, the q124 edge resolution,
    * two unrolled integer-PageRank rounds (the q105 idiom), and the
    * dup/quality verdict — every stage re-derived analytically from the
    * source text. */
  val crawlPipelineOracle: String =
    s"""WITH w AS (SELECT doc_id,
             list_filter(string_split(text,' '), x -> x <> '') AS ws
           FROM documents),
       p AS (SELECT doc_id, i,
               array_to_string(
                 ws[((i-1)*${Boilerplate.ParaTokens}+1):least(
                   i*${Boilerplate.ParaTokens}, len(ws))], ' ') AS ptext,
               least(i*${Boilerplate.ParaTokens}, len(ws))
                 - (i-1)*${Boilerplate.ParaTokens} AS nw,
               ((doc_id + i) % 5 = 0) AS farm
             FROM w, unnest(generate_series(1,
               CAST(ceil(len(ws)/${Boilerplate.ParaTokens}.0) AS BIGINT)))
               AS t(i)),
       cls AS (SELECT doc_id, i, ptext, nw,
                 CASE WHEN farm THEN 'link'
                      WHEN nw < 5 THEN 'short'
                      ELSE 'content' END AS k
               FROM p),
       ext AS (SELECT d.doc_id,
                 CAST(coalesce(count(*) FILTER (WHERE k = 'content'), 0)
                   AS BIGINT) AS n_content,
                 CAST(coalesce(sum(nw) FILTER (WHERE k = 'content'), 0)
                   AS BIGINT) AS n_tokens_main,
                 coalesce(string_agg(ptext, ' ' ORDER BY i)
                   FILTER (WHERE k = 'content'), '') AS main_text
               FROM documents d LEFT JOIN cls ON cls.doc_id = d.doc_id
               GROUP BY d.doc_id),
       j AS (SELECT unnest(generate_series(1, 3)) AS j),
       cand AS (SELECT d.doc_id AS a,
                  (d.doc_id * 131 + j.j * 97) % 1000 AS b
                FROM documents d CROSS JOIN j),
       e0 AS (SELECT a, b FROM cand
              WHERE b IN (SELECT doc_id FROM documents)),
       e AS (SELECT a AS src, b AS dst FROM e0
             UNION ALL SELECT b, a FROM e0),
       od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       n AS (SELECT count(*) AS n FROM od),
       r0 AS (SELECT src AS node, 1000000000000 // n.n AS rank
              FROM od, n),
       r1 AS (SELECT e.dst AS node,
                1000000000000 * 15 // (100 * any_value(n.n)) +
                85 * sum(r0.rank // od.outdeg) // 100 AS rank
              FROM e JOIN r0 ON r0.node = e.src
                JOIN od ON od.src = e.src, n
              GROUP BY 1),
       r2 AS (SELECT e.dst AS node,
                1000000000000 * 15 // (100 * any_value(n.n)) +
                85 * sum(r1.rank // od.outdeg) // 100 AS rank
              FROM e JOIN r1 ON r1.node = e.src
                JOIN od ON od.src = e.src, n
              GROUP BY 1),
       keeper AS (SELECT main_text, min(doc_id) AS keep_id
                  FROM ext WHERE main_text <> '' GROUP BY 1)
       SELECT ext.doc_id, ext.n_content, ext.n_tokens_main,
         CAST(coalesce(r2.rank, 0) AS BIGINT) AS rank_micro,
         coalesce(ext.main_text <> '' AND ext.doc_id <> keeper.keep_id,
           FALSE) AS is_dup,
         coalesce(NOT (ext.main_text <> '' AND ext.doc_id <>
             keeper.keep_id), TRUE)
           AND ext.n_content >= 1 AND ext.n_tokens_main >= $MinTokens
           AS keep
       FROM ext
         LEFT JOIN keeper ON keeper.main_text = ext.main_text
         LEFT JOIN r2 ON r2.node = ext.doc_id
       ORDER BY ext.doc_id"""
}
