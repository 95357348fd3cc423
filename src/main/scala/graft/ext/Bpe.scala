package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BpeOps

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — train a merge
  * table on the corpus, then tokenize documents with it. This replaces
  * the regex token-count PROXY (q29) with the real thing: the vocabulary
  * an LM trainer would actually fit, and the token counts a budget
  * planner actually needs.
  *
  * Why this trains at 100 TB when the textbook algorithm looks
  * hopelessly sequential: BPE statistics live on the WORD VOCABULARY,
  * not the corpus. One corpus-sized aggregate produces (word, count) —
  * vocabulary-sized, Zipf-capped, a few GB at web scale — and every one
  * of the N merge iterations then runs on that vocabulary table only:
  * explode adjacent symbol pairs (weighted by word count), pick the max,
  * rewrite symbols with one codegen'd [[BpeOps.merge_pair]] projection.
  * The corpus is touched exactly once, the driver holds only the chosen
  * merges (bounded by `merges`), and per-iteration cost shrinks as
  * symbols fuse. Encoding is a narrow map with a precompiled rank table
  * shipped by reference ([[BpeOps.bpe_encode]]) — no shuffle at all.
  *
  * Determinism: pair selection breaks count ties lexicographically, so
  * the merge table is a pure function of the corpus — reruns and
  * different partitionings give byte-identical vocabularies.
  */
object Bpe {

  val EndMark = "</w>"

  /** Train `merges` BPE merge steps on the corpus's whitespace words.
    * Returns the rank-ordered merge list.
    *
    * Two-tier execution, same algorithm and bit-identical output: the
    * corpus-sized work (word counting) is always distributed; the merge
    * iterations then run in-driver when the vocabulary fits
    * (`driverThreshold` rows — the collect is vocabulary-sized, the
    * same bounded-driver-state call the IVF/PQ trainers make for their
    * seed sets) and distributed otherwise (a web-scale vocabulary is a
    * few GB — too big to collect, trivially big enough to amortize N
    * vocabulary-sized Spark jobs). */
  def train(docs: DataFrame, merges: Int = 16, minPairCount: Long = 2L,
      driverThreshold: Long = 100000L): Seq[(String, String, Long)] = {
    val vocab0 = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(concat(split(col("w"), ""), array(lit(EndMark))).as("syms"),
        col("n"))
      // vocabulary-sized from here on: shrink the partition count so the
      // N per-iteration jobs don't pay corpus-scale task-launch overhead
      // (at a real corpus' few-GB vocabulary, size this to the cluster)
      .repartition(4)
      .localCheckpoint()
    if (vocab0.count() <= driverThreshold) {
      val rows = vocab0.collect().map(r =>
        (r.getSeq[String](0).toArray, r.getLong(1)))
      trainLocal(rows, merges, minPairCount)
    } else trainDistributed(vocab0, merges, minPairCount)
  }

  /** In-driver merge loop for a collected vocabulary — identical
    * selection rule (count desc, then lexicographic pair). */
  private def trainLocal(vocab0: Array[(Array[String], Long)], merges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    var vocab = vocab0
    val chosen = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.foreach { case (p, c) =>
        if (best == null || c > best._2 ||
          (c == best._2 && Ordering[(String, String)].lt(p, best._1)))
          best = (p, c)
      }
      if (best == null || best._2 < minPairCount) exhausted = true
      else {
        val ((l, rr), c) = best
        chosen += ((l, rr, c))
        vocab = vocab.map { case (syms, n) =>
          if (!hasPair(syms, l, rr)) (syms, n)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
                out += (l + rr); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        r += 1
      }
    }
    chosen.result()
  }

  private def hasPair(syms: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Distributed merge loop — the 100 TB-vocabulary path. */
  private def trainDistributed(vocab0: DataFrame, merges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    var vocab = vocab0
    val chosen = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      // adjacent pairs: (syms[i], syms[i+1]) weighted by word count;
      // fully-merged single-symbol words contribute no pairs (and would
      // make sequence(1, 0) walk backwards into element_at(syms, 0))
      val pairs = vocab.filter(size(col("syms")) > 1).select(col("n"),
        expr("transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))")
          .as("ps"))
        .select(col("n"), explode(col("ps")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (pairs.isEmpty || pairs(0).getLong(2) < minPairCount) exhausted = true
      else {
        val (l, rr, c) =
          (pairs(0).getString(0), pairs(0).getString(1), pairs(0).getLong(2))
        chosen += ((l, rr, c))
        vocab = vocab.select(
          BpeOps.merge_pair(col("syms"), l, rr).as("syms"), col("n"))
        // cut the growing per-iteration lineage periodically (cheap:
        // vocabulary-sized); without this, plan depth grows linearly in
        // merge count and analysis time dominates
        if ((r + 1) % 8 == 0) vocab = vocab.localCheckpoint()
        r += 1
      }
    }
    chosen.result()
  }

  /** Trained-merges memo: training is a deterministic driver-side loop
    * over the vocabulary, and q83's encode is a MODEL READ — a
    * production tokenizer trains once and every encode pass reuses the
    * artifact ([[graft.SessionMemo]]). q82, whose registered OUTPUT is
    * the model itself, keeps training fresh — a query never memoizes
    * its own result. */
  private def trainFor(spark: SparkSession, dir: String,
      merges: Int): Seq[(String, String, Long)] =
    graft.SessionMemo(spark, s"bpe-train:$dir:$merges") {
      train(Tables(spark, dir, "documents"), merges)
    }

  /** q82: the merge table as a DataFrame — rank-ordered subword merges
    * with their training-time pair counts. */
  def mergeTable(spark: SparkSession, dir: String,
      merges: Int = 16): DataFrame = {
    val learned = train(Tables(spark, dir, "documents"), merges)
    spark.createDataFrame(learned.zipWithIndex.map {
      case ((l, r, c), i) => (i, l, r, c)
    }).toDF("rank", "left", "right", "pair_count")
      .orderBy(col("rank"))
  }

  /** q83: tokenize every document with the trained merges — subword
    * token counts plus the compression ratio vs whitespace words (the
    * fertility statistic tokenizer evaluations report). */
  def encodeCorpus(spark: SparkSession, dir: String,
      merges: Int = 16): DataFrame =
    // sort = driver-output determinism only; the Of form is sort-free
    encodeWith(Tables(spark, dir, "documents"),
      trainFor(spark, dir, merges).map { case (l, r, _) => (l, r) })
      .orderBy(col("doc_id"))

  def encodeCorpusOf(docs: DataFrame, merges: Int): DataFrame =
    encodeWith(docs, train(docs, merges).map { case (l, r, _) => (l, r) })

  private def encodeWith(docs: DataFrame,
      ranks: Seq[(String, String)]): DataFrame =
    docs
      .select(col("doc_id"),
        BpeOps.bpe_encode(col("text"), ranks, EndMark).as("toks"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .select(col("doc_id"), col("n_words"),
        size(col("toks")).cast("long").as("n_bpe_tokens"))
}
