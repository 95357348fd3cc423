package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DetMix

/** Training-shard layout — the DELIVERY end of the pipeline: after
  * curation (dedup → quality → decontamination) and packing (q55), a
  * training corpus ships as N equal-ish shard files a data loader can
  * open independently (the WebDataset/Megatron shard convention), plus
  * a MANIFEST recording per-shard counts and content fingerprints so a
  * consumer can verify a shard without rereading the corpus.
  *
  * Assignment is `DetMix(doc_id) mod n` — deterministic, uniform (the
  * mixer is the repo's engine-portable draw), and independent of input
  * partitioning, so the same corpus always ships the same shards and
  * the DuckDB oracle replays the whole manifest: n_docs, token sums,
  * doc_id range, and an order-independent content fingerprint
  * (Σ DetMix(doc_id, seed+1), exact integer arithmetic; documented
  * bound: sums stay below 2⁶³ for < ~4·10⁹ docs per shard — at larger
  * scale raise n_shards, never the other way).
  *
  * Scale: ONE hash aggregate on shard_id for the manifest; the writer
  * repartitions by the shard column so every shard lands in exactly
  * one task → exactly one file per shard directory, written in the
  * same pass (no post-hoc compaction). Manifest is written AFTER the
  * data commits, so a consumer that sees the manifest sees the files.
  */
object Shards {

  /** Shard fanout for the registered q143. */
  val NShards = 8

  /** DetMix seed for assignment; seed+1 fingerprints content. */
  val Seed = 143L

  /** Append (n_tokens, shard_id, fp) to a documents frame — input
    * columns carried through, so writers keep `text` on the SAME scan
    * (no self-join). Narrow. */
  def shardAssignOf(docs: DataFrame, nShards: Int = NShards,
      seed: Long = Seed): DataFrame =
    docs
      .withColumn("n_tokens",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("shard_id",
        (expr(DetMix.mixSql("doc_id", seed)) % nShards).cast("int"))
      .withColumn("fp", expr(DetMix.mixSql("doc_id", seed + 1)))

  /** Per-shard manifest of an assigned frame: doc/token counts, doc_id
    * range, and the order-independent content fingerprint. One hash
    * aggregate. */
  def manifestOf(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(col("fp")).as("checksum"))

  /** q143: the shard manifest of the documents corpus. ORDER BY =
    * oracle determinism only. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    manifestOf(shardAssignOf(Tables(spark, dir, "documents")))
      .orderBy(col("shard_id"))

  /** Fixed training-sequence length for the registered q171 layout. */
  val SeqLen = 1024L

  /** Concat-and-chunk token layout — q171's Of-form: the GPT-style
    * delivery step AFTER shard assignment, where each shard's
    * documents are concatenated in a deterministic shuffled order and
    * cut into fixed `seqLen`-token training sequences. Per shard:
    * docs, token total, sequence count (= ceil(tokens / seqLen)), how
    * many documents STRADDLE a sequence boundary (their tokens split
    * across two training examples — the cost of packing without
    * padding every doc), and the pad tokens the final partial
    * sequence carries.
    *
    * Order within a shard is `DetMix(doc_id, seed+2)` with a doc_id
    * tiebreak — the deterministic training-order permutation (seed
    * and seed+1 are taken by assignment and fingerprint), so the
    * layout is reproducible and the oracle replays the cumulative-sum
    * arithmetic exactly. All outputs are exact integers; divisions
    * are `div` on non-negative BIGINTs (floor semantics in both
    * engines).
    *
    * Scale: ONE window pass partitioned by shard — per-shard
    * sequential layout is exactly what the shard writer does, and
    * production fanouts (WebDataset: thousands of shards) give the
    * window its parallelism; nothing else shuffles. */
  def tokenLayoutOf(assigned: DataFrame, seqLen: Long = SeqLen,
      seed: Long = Seed): DataFrame =
    withLayoutOffsets(assigned, seed)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(
          expr(s"(_start div $seqLen) <> ((_end - 1) div $seqLen)"), 1L)
          .otherwise(0L)).as("n_boundary_docs"))
      .withColumn("n_seqs",
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen"))
      .withColumn("pad_tokens", expr(s"n_seqs * $seqLen - n_tokens"))

  /** The deterministic layout prelude shared by [[tokenLayoutOf]] and
    * [[sequenceIndexOf]] — ONE definition of what "the layout" is:
    * the DetMix(doc_id, seed+2) order draw, the (order, doc_id)
    * tiebreak, and the per-shard cumulative [_start, _end) token
    * spans. Zero-token documents occupy no span in the concatenated
    * stream and are EXCLUDED here (both consumers would otherwise
    * corrupt on them: a boundary-aligned empty doc would count as
    * straddling in the layout and explode to a descending phantom
    * range in the index, where the DuckDB twin's generate_series
    * yields nothing — an engine divergence). The registered paths
    * never produce one (the admission gate requires ≥ 20 tokens);
    * arbitrary caller frames get the documented well-defined
    * semantics instead of corruption. */
  private def withLayoutOffsets(assigned: DataFrame,
      seed: Long): DataFrame = {
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("_ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assigned
      .filter(col("n_tokens") > 0)
      .withColumn("_ord", expr(DetMix.mixSql("doc_id", seed + 2)))
      .withColumn("_end", sum(col("n_tokens")).over(w))
      .withColumn("_start", col("_end") - col("n_tokens"))
  }

  /** Per-SEQUENCE loader index — q172's Of-form, one level finer than
    * [[tokenLayoutOf]]: for every fixed `seqLen`-token training
    * sequence a shard yields, which documents fill it. Per (shard,
    * sequence): contributing doc count, the first and last document in
    * LAYOUT order (min_by/max_by on the exact start offset — offsets
    * are strictly increasing within a shard, so the pick is
    * deterministic), and the filled token count (= seqLen everywhere
    * except each shard's tail). This is the sample-level index a
    * WebDataset/Megatron-style loader seeks by: sequence k of shard s
    * starts in doc `first_doc` at a computable offset.
    *
    * Derivation: the same one-window cumulative sum as the layout,
    * then each doc explodes to the sequences its [start, end) span
    * overlaps — narrow, and bounded: a doc adds at most
    * ceil(len/seqLen)+1 rows. The rollup is one hash aggregate. */
  def sequenceIndexOf(assigned: DataFrame, seqLen: Long = SeqLen,
      seed: Long = Seed): DataFrame =
    withLayoutOffsets(assigned, seed)
      .select(col("shard_id"), col("doc_id"), col("_start"), col("_end"),
        explode(expr(
          s"sequence(_start div $seqLen, (_end - 1) div $seqLen)"))
          .as("seq_id"))
      .groupBy(col("shard_id"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        min_by(col("doc_id"), col("_start")).as("first_doc"),
        max_by(col("doc_id"), col("_start")).as("last_doc"),
        sum(least(col("_end"), (col("seq_id") + 1) * seqLen) -
          greatest(col("_start"), col("seq_id") * seqLen))
          .as("n_tokens"))

  /** Write the corpus as one parquet file per shard under
    * `outDir/data/shard_id=K/`, then the manifest under
    * `outDir/manifest/` — AFTER the data, so manifest-present implies
    * data-present. Repartitioning BY the shard column puts each
    * shard's rows in exactly one task, hence exactly one file per
    * shard directory, one pass, no compaction. Returns the manifest. */
  def writeShards(docs: DataFrame, outDir: String,
      nShards: Int = NShards, seed: Long = Seed): DataFrame = {
    shardAssignOf(docs, nShards, seed)
      .repartition(nShards, col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$outDir/data")
    val m = manifestOf(shardAssignOf(docs, nShards, seed))
    m.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    m
  }

  /** The release quality gate shared by q145/q162/q163: appends exact
    * integer token and stopword counts over `text` and the `admitted`
    * verdict (≥ 20 tokens, ≥ 2% stopword share — no float enters the
    * filter). ONE definition so the threshold can never silently
    * diverge between the curated-corpus and crawl-front paths. */
  private[ext] def withQualityGate(df: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val stopArr = array(TextAnalysis.stopwordList.map(lit): _*)
    df.withColumn("_toks", size(w).cast("long"))
      .withColumn("_stops",
        size(filter(w, t => array_contains(stopArr, t))).cast("long"))
      .withColumn("admitted", col("_toks") >= 20 &&
        col("_stops") * 100 >= col("_toks") * 2)
  }

  /** q145: the composed RELEASE pipeline — exact dedup (q21's keep-first
    * digest groupBy) → quality gate (pure-integer thresholds: ≥ 20
    * tokens and a ≥ 2% stopword share, so no float ever enters the
    * filter) → shard manifest of the survivors. The delivery shape
    * every training-data release runs, as ONE oracled query: three slim
    * shuffles (32-byte digest groupBy, doc_id semi join, shard_id
    * aggregate), each carrying ids/digests/longs — never text.
    * ORDER BY = oracle determinism only. */
  def releaseManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val gated = withQualityGate(docs.join(keepers, Seq("doc_id"), "left_semi"))
      .filter(col("admitted"))
      .select(col("doc_id"), col("text"))
    manifestOf(shardAssignOf(gated)).orderBy(col("shard_id"))
  }

  /** Oracle for q145 [[releaseManifest]] — dedup, the integer gate, and
    * the manifest arithmetic replayed end to end. */
  lazy val releaseManifestOracle: String = {
    val stops = graft.ext.TextAnalysis.stopwordList
      .map("'" + _ + "'").mkString(",")
    s"""WITH k AS (SELECT min(doc_id) AS doc_id FROM documents
           GROUP BY md5(text)),
       g AS (SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks,
           CAST(len(list_filter(string_split(d.text, ' '),
             x -> list_contains([$stops], x))) AS BIGINT) AS stops
         FROM documents d JOIN k USING (doc_id)),
       f AS (SELECT doc_id, toks FROM g
         WHERE toks >= 20 AND stops * 100 >= toks * 2),
       a AS (SELECT doc_id, toks AS n_tokens,
           CAST(${DetMix.mixSql("doc_id", Seed)} % $NShards AS INT)
             AS shard_id,
           ${DetMix.mixSql("doc_id", Seed + 1)} AS fp
         FROM f)
       SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
         CAST(sum(fp) AS BIGINT) AS checksum
       FROM a GROUP BY shard_id ORDER BY shard_id"""
  }

  /** q146: forget-impact manifest — the GDPR erasure pass (ops/Forget)
    * projected onto the delivery layout: which shards contain
    * to-be-forgotten documents (ONLY those need a rewrite — the
    * affected-partition-only ethos), and the exact post-forget manifest.
    * Because q143's checksum is an order-independent SUM, erasure is
    * arithmetic: post = pre − Σ(forgotten), never a recomputation of
    * the surviving corpus — spec-pinned both ways. One conditional
    * aggregate over the same single scan as q143.
    *
    * The registered query synthesizes the forget set as doc_id ≡ 0
    * (mod 97) — request-sized, like a real erasure batch. */
  def forgetImpactOf(assigned: DataFrame, forget: org.apache.spark.sql.Column): DataFrame =
    assigned
      .withColumn("_f", forget)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs_before"),
        sum(when(col("_f"), 1L).otherwise(0L)).as("n_forgotten"),
        sum(when(!col("_f"), col("n_tokens"))).as("n_tokens_after"),
        min(when(!col("_f"), col("doc_id"))).as("min_doc_id_after"),
        max(when(!col("_f"), col("doc_id"))).as("max_doc_id_after"),
        sum(when(!col("_f"), col("fp"))).as("checksum_after"))
      .withColumn("n_docs_after",
        col("n_docs_before") - col("n_forgotten"))
      .withColumn("needs_rewrite", col("n_forgotten") > 0)

  def forgetImpact(spark: SparkSession, dir: String): DataFrame =
    forgetImpactOf(shardAssignOf(Tables(spark, dir, "documents")),
        col("doc_id") % 97 === 0)
      .select(col("shard_id"), col("n_docs_before"), col("n_forgotten"),
        col("n_docs_after"), col("n_tokens_after"),
        col("min_doc_id_after"), col("max_doc_id_after"),
        col("checksum_after"), col("needs_rewrite"))
      .orderBy(col("shard_id"))

  /** Oracle for q146 [[forgetImpact]]. */
  val forgetImpactOracle: String =
    s"""WITH a AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(${DetMix.mixSql("doc_id", Seed)} % $NShards AS INT)
             AS shard_id,
           ${DetMix.mixSql("doc_id", Seed + 1)} AS fp,
           doc_id % 97 = 0 AS f
         FROM documents)
       SELECT shard_id,
         CAST(count(*) AS BIGINT) AS n_docs_before,
         CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
           AS n_forgotten,
         CAST(count(*) - sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_after,
         CAST(sum(CASE WHEN NOT f THEN n_tokens END) AS BIGINT)
           AS n_tokens_after,
         min(CASE WHEN NOT f THEN doc_id END) AS min_doc_id_after,
         max(CASE WHEN NOT f THEN doc_id END) AS max_doc_id_after,
         CAST(sum(CASE WHEN NOT f THEN fp END) AS BIGINT)
           AS checksum_after,
         sum(CASE WHEN f THEN 1 ELSE 0 END) > 0 AS needs_rewrite
       FROM a GROUP BY shard_id ORDER BY shard_id"""

  /** Diff two release manifests WITHOUT rereading either corpus — the
    * dataset-versioning primitive (what a consumer runs between
    * releases, and what a publisher ships as a changelog): per shard,
    * `added` / `removed` / `changed` / `unchanged` plus exact count,
    * token, and checksum deltas. Because q143's checksum is an
    * order-independent SUM, `d_checksum` equals Σ fp(added docs) −
    * Σ fp(removed docs) — so a consumer can verify a claimed delta
    * against just the changed documents (spec-pinned). Manifests are
    * shard-count-sized: the full-outer join is trivially broadcastable
    * at any corpus size. */
  def manifestDiffOf(pre: DataFrame, post: DataFrame): DataFrame = {
    val p = pre.select(col("shard_id"),
      col("n_docs").as("n_docs_pre"), col("n_tokens").as("n_tokens_pre"),
      col("checksum").as("checksum_pre"))
    val q = post.select(col("shard_id"),
      col("n_docs").as("n_docs_post"), col("n_tokens").as("n_tokens_post"),
      col("checksum").as("checksum_post"))
    p.join(q, Seq("shard_id"), "full_outer")
      .withColumn("status",
        when(col("n_docs_pre").isNull, "added")
          .when(col("n_docs_post").isNull, "removed")
          .when(col("n_docs_pre") === col("n_docs_post") &&
            col("n_tokens_pre") === col("n_tokens_post") &&
            col("checksum_pre") === col("checksum_post"), "unchanged")
          .otherwise("changed"))
      .select(col("shard_id"), col("status"),
        coalesce(col("n_docs_pre"), lit(0L)).as("n_docs_pre"),
        coalesce(col("n_docs_post"), lit(0L)).as("n_docs_post"),
        (coalesce(col("n_docs_post"), lit(0L)) -
          coalesce(col("n_docs_pre"), lit(0L))).as("d_docs"),
        (coalesce(col("n_tokens_post"), lit(0L)) -
          coalesce(col("n_tokens_pre"), lit(0L))).as("d_tokens"),
        (coalesce(col("checksum_post"), lit(0L)) -
          coalesce(col("checksum_pre"), lit(0L))).as("d_checksum"))
  }

  /** q157: the changelog between two deterministic release snapshots
    * of the corpus — the PRE release shipped before the late batch
    * (doc_id ≡ 13 mod 89) arrived; the POST release includes it but
    * honors an erasure batch (doc_id ≡ 0 mod 97, q146's shape). Same
    * sharding both sides, so the diff isolates content movement.
    * ORDER BY = oracle determinism only. */
  def manifestDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val pre = manifestOf(shardAssignOf(
      docs.filter(!(col("doc_id") % 89 === 13))))
    val post = manifestOf(shardAssignOf(
      docs.filter(!(col("doc_id") % 97 === 0))))
    manifestDiffOf(pre, post).orderBy(col("shard_id"))
  }

  /** Oracle for q157 [[manifestDiff]] — both snapshots' manifests
    * replayed from the assignment arithmetic, full-outer joined. */
  val manifestDiffOracle: String = {
    def m(name: String, pred: String) =
      s"""$name AS (SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(fp) AS BIGINT) AS checksum
         FROM a WHERE $pred GROUP BY shard_id)"""
    s"""WITH a AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(${DetMix.mixSql("doc_id", Seed)} % $NShards AS INT)
             AS shard_id,
           ${DetMix.mixSql("doc_id", Seed + 1)} AS fp
         FROM documents),
       ${m("pre", "doc_id % 89 <> 13")},
       ${m("post", "doc_id % 97 <> 0")}
       SELECT coalesce(pre.shard_id, post.shard_id) AS shard_id,
         CASE WHEN pre.shard_id IS NULL THEN 'added'
              WHEN post.shard_id IS NULL THEN 'removed'
              WHEN pre.n_docs = post.n_docs
                AND pre.n_tokens = post.n_tokens
                AND pre.checksum = post.checksum THEN 'unchanged'
              ELSE 'changed' END AS status,
         coalesce(pre.n_docs, 0) AS n_docs_pre,
         coalesce(post.n_docs, 0) AS n_docs_post,
         coalesce(post.n_docs, 0) - coalesce(pre.n_docs, 0) AS d_docs,
         coalesce(post.n_tokens, 0) - coalesce(pre.n_tokens, 0)
           AS d_tokens,
         coalesce(post.checksum, 0) - coalesce(pre.checksum, 0)
           AS d_checksum
       FROM pre FULL OUTER JOIN post ON post.shard_id = pre.shard_id
       ORDER BY shard_id"""
  }

  /** Oracle for q143 [[shardManifest]] — replays assignment, counts,
    * range, and fingerprint sum (all exact integer arithmetic). */
  val shardManifestOracle: String =
    s"""WITH a AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(${DetMix.mixSql("doc_id", Seed)} % $NShards AS INT)
             AS shard_id,
           ${DetMix.mixSql("doc_id", Seed + 1)} AS fp
         FROM documents)
       SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
         CAST(sum(fp) AS BIGINT) AS checksum
       FROM a GROUP BY shard_id ORDER BY shard_id"""
}
