package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity.Vec

/** Persisted product-quantization index lifecycle — the PQ twin of
  * [[IvfIndex]], and the part that makes [[Similarity.annPq]]'s design
  * claim real: at 100 TB "the corpus lives in executor memory as
  * codes" only if the codes OUTLIVE the job that computed them.
  *
  *   - [[train]] → per-subspace codebooks (m · ksub · dsub doubles —
  *     a few hundred KB, driver-held, broadcast);
  *   - [[save]]/[[load]] → codebooks as a (subspace, code, centroid)
  *     parquet table;
  *   - [[encode]] → the codes table (vec_id, code array<tinyint-ish>,
  *     rnorm), m bytes of payload per vector vs dim·4 raw — APPENDED
  *     per ingest batch, no re-train (stale codebooks degrade recall,
  *     not correctness);
  *   - [[probe]] → asymmetric-distance scan over the codes table +
  *     exact re-rank of the shortlist against raw vectors.
  *
  * Deterministic throughout (rank-based seeds, fixed iterations, no
  * RNG). [[Similarity.annPq]] (q69) composes the phases in one call;
  * PqIndexSpec proves the probe-from-parquet path identical. */
object PqIndex {

  private[ext] def nearestSub(cb: Array[Array[Double]], v: Array[Float],
      off: Int): Int = {
    val sub = cb(0).length
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      var d = 0.0
      var i = 0
      while (i < sub) {
        val diff = v(off + i) - cb(c)(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** DetMix integer codebooks in embedding micro-units — q177's index
    * definition ([[IvfIndex.detCentroids]]' recipe per subspace):
    * entry (s, c, i) = `DetMix((s·ksub + c)·sub + i + 1, seed)
    * % 1200001 − 600000`. Against micro-quantized vectors the real
    * [[nearestSub]] accumulates ≤ (1.2·10⁶)²·sub ≈ 10¹³ < 2⁵³ per
    * subspace — exact doubles, DuckDB-replayable in BIGINT. */
  private[ext] def detCodebooks(m: Int, ksub: Int, sub: Int,
      seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(m)(s => Array.tabulate(ksub)(c =>
      Array.tabulate(sub)(i =>
        (graft.functions.DetMix.mixLong(
            (s.toLong * ksub + c) * sub + i + 1, seed)
          % 1200001L - 600000L).toDouble)))

  /** Deterministic distributed Lloyd over all m subspaces in one corpus
    * pass per iteration (per-partition (sum, count) accumulators,
    * merged associatively; bounded driver state). */
  def train(ds: Dataset[Vec], m: Int, ksub: Int,
      lloydIters: Int = 3): Array[Array[Array[Double]]] = {
    val spark = ds.sparkSession
    val seeds = ds.orderBy(col("vec_id")).limit(ksub).collect()
    require(seeds.nonEmpty, "cannot train a PQ index on an empty corpus")
    val dim = seeds.head.embedding.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val kk = math.min(ksub, seeds.length)
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => Array.tabulate(kk)(c =>
        Array.tabulate(sub)(i => seeds(c).embedding(s * sub + i).toDouble)))
    var it = 0
    while (it < lloydIters) {
      val bc = spark.sparkContext.broadcast(codebooks)
      val sums = ds.mapPartitions { vs =>
        val cbs = bc.value
        val acc = Array.fill(m, kk)(new Array[Double](sub))
        val cnt = Array.fill(m)(new Array[Long](kk))
        vs.foreach { v =>
          var s = 0
          while (s < m) {
            val c = nearestSub(cbs(s), v.embedding, s * sub)
            cnt(s)(c) += 1
            var i = 0
            while (i < sub) { acc(s)(c)(i) += v.embedding(s * sub + i); i += 1 }
            s += 1
          }
        }
        Iterator.single((acc, cnt))
      }(org.apache.spark.sql.Encoders.kryo[
        (Array[Array[Array[Double]]], Array[Array[Long]])])
        .reduce { (a, b) =>
          var s = 0
          while (s < m) {
            var c = 0
            while (c < kk) {
              var i = 0
              while (i < sub) { a._1(s)(c)(i) += b._1(s)(c)(i); i += 1 }
              a._2(s)(c) += b._2(s)(c)
              c += 1
            }
            s += 1
          }
          a
        }
      codebooks = Array.tabulate(m) { s =>
        Array.tabulate(kk) { c =>
          if (sums._2(s)(c) == 0) codebooks(s)(c) // empty cluster: keep
          else sums._1(s)(c).map(_ / sums._2(s)(c))
        }
      }
      it += 1
    }
    codebooks
  }

  /** Persist codebooks as (subspace, code, centroid array<double>). */
  def save(spark: SparkSession, path: String,
      codebooks: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, i) => (s, i, c) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load codebooks (bounded collect: m·ksub rows). */
  def load(spark: SparkSession, path: String): Array[Array[Array[Double]]] =
    spark.read.parquet(path)
      .orderBy(col("subspace"), col("code"))
      .collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))

  /** Encode vectors → (vec_id, code array<int>, rnorm). Run per ingest
    * batch and APPEND — the codes table is the scan representation. */
  def encode(ds: Dataset[Vec],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import ds.sparkSession.implicits._
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val bc = ds.sparkSession.sparkContext.broadcast(codebooks)
    ds.map { v =>
      val cbs = bc.value
      val code = new Array[Int](m)
      var normSq = 0.0
      var s = 0
      while (s < m) {
        val c = nearestSub(cbs(s), v.embedding, s * sub)
        code(s) = c
        var i = 0
        while (i < sub) { val x = cbs(s)(c)(i); normSq += x * x; i += 1 }
        s += 1
      }
      (v.vec_id, code.toSeq, math.sqrt(normSq))
    }.toDF("vec_id", "code", "rnorm")
  }

  /** Per-query ADC table: `table(s)(c)` = dot product of the query's
    * subspace-s slice with codebook entry c — the m·ksub lookups that
    * replace a full-dimension dot per corpus vector. On micro-unit
    * integer-valued inputs every product and sum stays below 2⁵³, so
    * the table is exact integer arithmetic (the q180 gate's claim). */
  private[graft] def adcTable(emb: Array[Float],
      codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val sub = codebooks(0)(0).length
    Array.tabulate(codebooks.length) { s =>
      Array.tabulate(codebooks(s).length) { c =>
        var d = 0.0
        var i = 0
        while (i < sub) {
          d += emb(s * sub + i) * codebooks(s)(c)(i); i += 1
        }
        d
      }
    }
  }

  /** A corpus vector's ADC score: m table lookups, one per subspace. */
  private[graft] def adcOf(t: Array[Array[Double]],
      code: Seq[Int]): Double = {
    var d = 0.0
    var s = 0
    while (s < t.length) { d += t(s)(code(s)); s += 1 }
    d
  }

  /** Asymmetric-distance probe over an encoded corpus: per query an
    * (m × ksub) table of subspace dot products is precomputed once and
    * broadcast; a corpus vector's approximate cosine is m table
    * lookups. A `shortlist`-element bounded heap per query (TopK
    * aggregate, map-side partials) feeds the exact re-rank against
    * `corpus` raw vectors — full-precision work O(queries·shortlist).
    * `queries` is a driver-held array: ADC tables are per-query
    * broadcast state, so the query set must be bounded (it is the
    * interactive side of ANN). */
  def probe(queries: Array[Vec], codes: DataFrame,
      codebooks: Array[Array[Array[Double]]], corpus: Dataset[Vec],
      k: Int = 5, shortlist: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val tables: Map[Long, (Array[Array[Double]], Double)] = queries.map { q =>
      q.vec_id -> (adcTable(q.embedding, codebooks),
        Similarity.norm(q.embedding))
    }.toMap
    val bcT = spark.sparkContext.broadcast(tables)
    import graft.functions.TopK.top_k_by_score
    val scored = codes.select(col("vec_id"), col("code"), col("rnorm"))
      .as[(Long, Seq[Int], Double)]
      .flatMap { case (vid, code, rnorm) =>
        bcT.value.iterator.collect { case (qid, (t, qnorm)) if qid != vid =>
          val d = adcOf(t, code)
          (qid, vid, if (rnorm > 0 && qnorm > 0) d / (rnorm * qnorm) else 0.0)
        }
      }.toDF("q_id", "neighbor_id", "approx_cos")
    val short = scored.groupBy(col("q_id"))
      .agg(top_k_by_score(col("approx_cos"), col("neighbor_id"), shortlist)
        .as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.id").as("neighbor_id"))
    Similarity.scorePairs(short, corpus, "q_id", "neighbor_id")
      .groupBy(col("q_id"))
      .agg(top_k_by_score(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("q_id"), inline(col("top")))
      .withColumnRenamed("id", "neighbor_id")
      .orderBy(col("q_id"), col("rank"))
  }
}
