package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity.Vec

/** Persisted IVF (inverted-file) ANN index lifecycle — the production
  * shape of [[Similarity.annIvf]], which trains, indexes and probes in
  * one call (right for a registered query, wasteful for a living
  * corpus). Here the three phases are separate artifacts:
  *
  *   - [[train]] → centroids (driver array, nLists · dim doubles);
  *   - [[save]]/[[load]] → centroids as a parquet table, so training
  *     happens once and probes run in later sessions/jobs;
  *   - [[assign]] → postings (vec_id, list_id), a parquet-friendly
  *     DataFrame appended per ingest batch — indexing N new vectors
  *     costs O(N · nLists) distance evaluations, never a re-train;
  *   - [[probe]] → top-k per query against an assigned corpus.
  *
  * At 100 TB: centroids are tiny and broadcast; postings carry two
  * longs per vector; the only corpus-sized work is the in-list exact
  * scoring, bounded by nProbe/nLists of the corpus per query. Stale
  * centroids after heavy drift degrade recall, not correctness —
  * re-train and re-assign offline, swap the postings table.
  * Deterministic throughout (rank-based seeds, fixed iterations, no
  * RNG); [[Similarity.annIvf]] (q42) delegates here, and
  * SimilaritySpec gates recall vs brute force. */
object IvfIndex {

  /** Nearest-centroid id by L2 (ties → lowest id, stable). */
  private[ext] def nearestList(cs: Array[Array[Double]],
      v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val diff = v(i) - cs(c)(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** DetMix integer centroids in embedding micro-units — the q176
    * cross-engine gate's index definition: every coordinate is
    * `DetMix(l·dim + i + 1, seed) % 1200001 − 600000` ∈ [−6·10⁵,
    * 6·10⁵], the same magnitude as a micro-quantized embedding
    * coordinate, and exactly representable in a double. Against
    * micro-quantized vectors the [[nearestList]] L2² accumulates
    * products ≤ (1.2·10⁶)²·64 ≈ 10¹⁴ < 2⁵³ — every double operation
    * is EXACT integer arithmetic, so the REAL assignment code path
    * is replayable by a DuckDB BIGINT oracle bit for bit. */
  private[graft] def detCentroids(nLists: Int, dim: Int,
      seed: Long): Array[Array[Double]] =
    Array.tabulate(nLists)(l => Array.tabulate(dim)(i =>
      (graft.functions.DetMix.mixLong(l.toLong * dim + i + 1, seed)
        % 1200001L - 600000L).toDouble))

  /** Merge two per-partition Lloyd partials ((sums, counts)) in place —
    * shared by [[train]] and [[trainExact]] so the two variants cannot
    * drift; runs once per partition pair on the driver reduce, never in
    * the per-row hot loop, so the generic `add` costs nothing that
    * matters. */
  private def mergePartials[T](a: (Array[Array[T]], Array[Long]),
      b: (Array[Array[T]], Array[Long]),
      add: (T, T) => T): (Array[Array[T]], Array[Long]) = {
    var c = 0
    while (c < a._1.length) {
      var i = 0
      while (i < a._1(c).length) {
        a._1(c)(i) = add(a._1(c)(i), b._1(c)(i)); i += 1
      }
      a._2(c) += b._2(c)
      c += 1
    }
    a
  }

  /** Deterministic distributed Lloyd: centroids seeded from the first
    * nLists vectors by vec_id rank (bounded driver pull), refined with
    * a fixed number of assign+mean passes (each one mapPartitions →
    * a single (nLists · dim) partial per partition, reduced on the
    * driver — bounded state, corpus never collected). */
  def train(ds: Dataset[Vec], nLists: Int,
      lloydIters: Int = 3): Array[Array[Double]] = {
    val spark = ds.sparkSession
    val seeds = ds.orderBy(col("vec_id")).limit(nLists).collect()
    require(seeds.nonEmpty, "cannot train an IVF index on an empty corpus")
    val dim = seeds.head.embedding.length
    var centroids: Array[Array[Double]] =
      seeds.map(_.embedding.map(_.toDouble))
    var it = 0
    while (it < lloydIters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val sums = ds.mapPartitions { vs =>
        val cs = bc.value
        val acc = Array.fill(nLists)(new Array[Double](dim))
        val cnt = new Array[Long](nLists)
        vs.foreach { v =>
          val c = nearestList(cs, v.embedding)
          cnt(c) += 1
          var i = 0
          while (i < dim) { acc(c)(i) += v.embedding(i); i += 1 }
        }
        Iterator.single((acc, cnt))
      }(org.apache.spark.sql.Encoders.kryo[(Array[Array[Double]], Array[Long])])
        .reduce(mergePartials[Double](_, _, _ + _))
      centroids = Array.tabulate(nLists) { c =>
        if (sums._2(c) == 0) centroids(c)
        else sums._1(c).map(_ / sums._2(c))
      }
      it += 1
    }
    centroids
  }

  /** Deterministic-by-construction Lloyd over a micro-quantized corpus
    * (q179's engine path): the float [[train]] above is
    * unordered-sum nondeterministic — two runs over different
    * partitionings of the SAME data can produce different centroids,
    * because float addition is not associative. On integer-valued
    * embeddings (micro-units, the q176 quantization) the same loop
    * becomes order-independent exactly: per-partition partials
    * accumulate in Long (associative + commutative), the centroid
    * update is truncating Long division (matching the oracle's `//`),
    * and assignment reuses the REAL [[nearestList]] code path, whose
    * double arithmetic is exact below 2⁵³ on micro-unit inputs. The
    * result is bit-identical across cluster topologies, retries, and
    * engines — the reproducibility a 100 TB re-train actually needs
    * (a recall-equivalent but bit-different index invalidates every
    * cached posting diff downstream).
    *
    * Centroids start from [[detCentroids]] (no corpus pull at all);
    * an empty list keeps its previous centroid, exactly as [[train]]
    * does. Returns the final centroids (still integer-valued doubles)
    * and the list sizes of the LAST assignment pass — together the
    * whole training transcript a verifier needs.
    *
    * Scale: per iteration one broadcast (nLists · dim doubles), one
    * narrow mapPartitions emitting a single (nLists · dim) Long
    * partial per partition, one driver reduce of those partials —
    * the corpus never shuffles and is never collected. */
  def trainExact(ds: Dataset[Vec], nLists: Int, dim: Int,
      iters: Int, seed: Long): (Array[Array[Double]], Array[Long]) = {
    require(!ds.isEmpty,
      "cannot train an IVF index on an empty corpus")
    val spark = ds.sparkSession
    var centroids: Array[Array[Double]] = detCentroids(nLists, dim, seed)
    var counts = new Array[Long](nLists)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val (sums, cnt) = ds.mapPartitions { vs =>
        val cs = bc.value
        val acc = Array.fill(nLists)(new Array[Long](dim))
        val n = new Array[Long](nLists)
        vs.foreach { v =>
          val c = nearestList(cs, v.embedding)
          n(c) += 1
          var i = 0
          // integral floats by the quantization contract: toLong exact
          while (i < dim) { acc(c)(i) += v.embedding(i).toLong; i += 1 }
        }
        Iterator.single((acc, n))
      }(org.apache.spark.sql.Encoders.kryo[(Array[Array[Long]], Array[Long])])
        .reduce(mergePartials[Long](_, _, _ + _))
      // the reduce is an action, so this round's broadcast is spent —
      // release it instead of accumulating one per iteration
      bc.destroy()
      centroids = Array.tabulate(nLists) { c =>
        if (cnt(c) == 0) centroids(c)
        // Long `/` truncates toward zero — the oracle's `//` does too
        else sums(c).map(s => (s / cnt(c)).toDouble)
      }
      counts = cnt
      it += 1
    }
    (centroids, counts)
  }

  /** Persist centroids as a (list_id, centroid array<double>) parquet
    * table — the whole index definition, a few KB. */
  def save(spark: SparkSession, path: String,
      centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("list_id", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load centroids (bounded collect: nLists rows). */
  def load(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path)
      .orderBy(col("list_id"))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Assign each vector to its nearest list → postings (vec_id,
    * list_id). Run once per ingest batch and APPEND — this is the
    * incremental path: new vectors never trigger a re-train. */
  def assign(ds: Dataset[Vec],
      centroids: Array[Array[Double]]): DataFrame = {
    import ds.sparkSession.implicits._
    val bc = ds.sparkSession.sparkContext.broadcast(centroids)
    ds.map(v => (v.vec_id, nearestList(bc.value, v.embedding)))
      .toDF("vec_id", "list_id")
  }

  /** Multiprobe assignment: each vector's `p` NEAREST lists by L2²
    * (ties → lowest id, the [[nearestList]] tiebreak), one posting row
    * per probe → (vec_id, list_id). `p = 1` coincides with [[assign]].
    * This is the query-side half of [[probe]] factored out, because it
    * is also the EVAL-side assignment of the semantic-decontamination
    * gate (q190): a benchmark member posted to its P nearest lists
    * catches boundary-straddling corpus neighbors the single-list
    * filter misses, at P× a benchmark-sized artifact — the corpus side
    * never multiprobes. Distributed (broadcast centroids, one narrow
    * flatMap); never collects. */
  def assignTopP(ds: Dataset[Vec], centroids: Array[Array[Double]],
      p: Int): DataFrame = {
    import ds.sparkSession.implicits._
    val nLists = centroids.length
    val bc = ds.sparkSession.sparkContext.broadcast(centroids)
    ds.flatMap { v =>
      val cs = bc.value
      val dists = Array.tabulate(nLists) { c =>
        var d = 0.0
        var i = 0
        while (i < v.embedding.length) {
          val diff = v.embedding(i) - cs(c)(i); d += diff * diff; i += 1
        }
        (c, d)
      }
      dists.sortBy(x => (x._2, x._1)).take(p)
        .map { case (c, _) => (v.vec_id, c) }
    }.toDF("vec_id", "list_id")
  }

  /** Top-k per query over an assigned corpus: probe the nProbe nearest
    * lists, exact cosine only within them, rank per query. `corpus`
    * resolves candidate ids to raw vectors (in production the postings
    * live in parquet while vectors stay wherever they are — the join
    * ships ids until scoring). */
  def probe(queries: Dataset[Vec], corpus: Dataset[Vec],
      postings: DataFrame, centroids: Array[Array[Double]],
      nProbe: Int = 4, k: Int = 5): DataFrame = {
    import queries.sparkSession.implicits._
    val probes = assignTopP(queries, centroids, nProbe)
      .toDF("q_id", "list_id")
    val candidates = probes
      .join(postings.toDF("neighbor_id", "list_id"), "list_id")
      .filter(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"))
      .distinct()
    val scored = Similarity.scorePairs(candidates, corpus,
      "q_id", "neighbor_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Index-health drift monitor (q182's engine path): per list, the
    * population and exact integer statistics of the assigned vectors'
    * L2² distance to their centroid — sum, truncating mean, and max in
    * micro-units². Rising per-list means/maxima against a baseline
    * snapshot are THE re-train signal the class doc waves at ("stale
    * centroids after heavy drift degrade recall"): drift shows up as
    * distance inflation long before recall measurably decays, and this
    * costs one narrow pass + one nLists-row aggregate, vs a recall
    * probe's full candidate scoring. Assignment is the REAL
    * [[nearestList]]; on micro-quantized inputs every d2 is an exact
    * integer, so the whole scorecard is DuckDB-replayable. The d2 sum
    * aggregates in DECIMAL(38,0): Long would overflow past ~10⁵
    * max-magnitude vectors per list, well inside 100 TB populations.
    * Empty lists don't appear (nothing assigned, nothing to drift). */
  def driftOf(ds: Dataset[Vec],
      centroids: Array[Array[Double]]): DataFrame = {
    import ds.sparkSession.implicits._
    val bc = ds.sparkSession.sparkContext.broadcast(centroids)
    ds.map { v =>
      val cs = bc.value
      val c = nearestList(cs, v.embedding)
      var d = 0.0
      var i = 0
      while (i < v.embedding.length) {
        val diff = v.embedding(i) - cs(c)(i); d += diff * diff; i += 1
      }
      (c, d.toLong) // exact integral double by the quantization contract
    }.toDF("list_id", "d2")
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("d2").cast("decimal(38,0)")).as("_s"),
        max(col("d2")).as("max_d2"))
      .withColumn("avg_d2", expr("CAST(_s div n AS BIGINT)"))
      .select(col("list_id"), col("n"), col("avg_d2"), col("max_d2"))
  }

  /** Erasure impact on the postings table (the ANN side of the q146
    * shard-forget scorecard): per list, how many postings a forget set
    * removes and the order-independent DetMix id checksums before and
    * after — enough for a verifier to confirm the erasure against just
    * the forgotten ids (checksum_before − checksum_after =
    * Σ fp(forgotten)), without rereading vectors. Because postings are
    * (vec_id, list_id) pairs, GDPR erasure is an anti-join rewrite of
    * the postings alone: centroids hold no per-vector data and the
    * raw vectors live with the corpus, so no re-train and no
    * re-assign of survivors is ever needed. One hash aggregate over
    * the postings; never touches embeddings. */
  def forgetImpactOf(postings: DataFrame,
      forget: org.apache.spark.sql.Column, fpSeed: Long): DataFrame =
    postings
      // a NULL predicate row must count as kept AND keep its fp in
      // checksum_after — without the coalesce it was counted as kept
      // but dropped from the checksum, breaking the verifier algebra
      .withColumn("_f", coalesce(forget, lit(false)))
      .withColumn("_fp",
        expr(graft.functions.DetMix.mixSql("vec_id", fpSeed)))
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("_f"), 1L).otherwise(0L)).as("n_forgotten"),
        // aggregate in DECIMAL(38,0), then narrow: a Long sum of
        // 31-bit fps silently wraps past ~2^32 postings per list while
        // the oracle's HUGEINT→BIGINT cast raises — a scale-dependent
        // engine/oracle divergence. The decimal sum + ANSI bigint cast
        // raises on BOTH sides at the same bound (driftOf precedent).
        sum(col("_fp").cast("decimal(38,0)")).cast("bigint")
          .as("checksum_before"),
        sum(when(!col("_f"), col("_fp")).cast("decimal(38,0)"))
          .cast("bigint").as("checksum_after"))
      .withColumn("n_after", col("n_before") - col("n_forgotten"))
      .withColumn("needs_rewrite", col("n_forgotten") > 0)
      .select(col("list_id"), col("n_before"), col("n_forgotten"),
        col("n_after"), col("checksum_before"), col("checksum_after"),
        col("needs_rewrite"))
}
