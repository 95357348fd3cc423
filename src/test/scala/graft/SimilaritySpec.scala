package graft

import graft.ext.Similarity

class SimilaritySpec extends SparkSpecBase {

  test("brute-force kNN is deterministic and self-excluding") {
    val knn = Similarity.knnBruteForce(spark, sf0001, nQueries = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(knn.length == 8 * 5)
    assert(knn.forall { case (q, _, n) => q != n })
    // ranks are 1..5 per query
    assert(knn.groupBy(_._1).values.forall(_.map(_._2).sorted.sameElements(1 to 5)))
  }

  test("kNN bounded-heap top-k equals a driver-side recompute, window-free") {
    val vs = Tables(spark, sf0001, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val want = vs.filter(_._1 < 16).flatMap { case (q, qe) =>
      vs.filter(_._1 != q).map { case (n, ne) => (n, cos(qe, ne)) }
        .sortBy(x => (-x._2, x._1)).take(5).zipWithIndex
        .map { case ((n, _), i) => (q, i + 1, n) }
    }.toSet
    val df = ext.Similarity.knnBruteForce(spark, sf0001, nQueries = 16, k = 5)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    // scale contract: the top-k is a bounded-heap aggregate with map-side
    // partials, not a row_number window over all scored rows
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("top_k_by_score"), plan.take(800))
    assert(plan.contains("partial_top_k_by_score"), plan.take(800))
  }

  test("multiprobe LSH ANN reaches usable recall@1 on random vectors") {
    val brute = Similarity.knnBruteForce(spark, sf0001, nQueries = 500, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ann = Similarity.annLsh(spark, sf0001, nBits = 6, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // recall@1 over queries that produced any candidate. Random 64-dim
    // vectors are LSH's worst case (top-1 cosine ~0.5 ⇒ p_agree ~ 2/3);
    // one 6-bit table + 1-bit multiprobe gives ~0.35 analytically, and
    // 4 independent tables lift it to ~1-(1-0.35)^4 ≈ 0.8.
    val hits = ann.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / ann.size
    assert(ann.size > 450, s"too few buckets produced candidates: ${ann.size}")
    assert(recall > 0.5, s"recall@1 $recall below the multi-table floor")
  }

  test("IVF ANN beats LSH recall on this corpus and stays deterministic") {
    val brute = Similarity.knnBruteForce(spark, sf0001, nQueries = 500, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivf = Similarity.annIvf(spark, sf0001, nLists = 16, nProbe = 4, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / ivf.size
    assert(ivf.size > 450)
    assert(recall > 0.5, s"IVF recall@1 $recall suspiciously low")
    val again = Similarity.annIvf(spark, sf0001, nLists = 16, nProbe = 4, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ivf == again)
  }

  test("PQ ANN reaches usable recall@5 against brute force, deterministic") {
    val brute = Similarity.knnBruteForce(spark, sf0001, nQueries = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val pq = Similarity.annPq(spark, sf0001, nQueries = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    assert(pq.size == 64)
    val overlap = pq.map { case (q, ns) =>
      (ns intersect brute.getOrElse(q, Set.empty)).size }.sum
    val recall = overlap.toDouble / (64 * 5)
    assert(recall > 0.4, s"PQ recall@5 $recall suspiciously low")
    val again = Similarity.annPq(spark, sf0001, nQueries = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val first = Similarity.annPq(spark, sf0001, nQueries = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == first)
  }

  test("near-dup pairs ordered a<b with cosine above threshold") {
    val rows = Similarity.neardupPairs(spark, sf0001, tau = 0.4).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.4))
  }

  test("LSH near-dup scale path: subset of exact pairs with usable recall") {
    val exact = Similarity.neardupPairs(spark, sf0001, tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.neardupPairsLsh(spark, sf0001, tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall > 0.5, s"recall $recall too low (exact=${exact.size})")
  }

  test("cosine_similarity expression: bit-identical to the reference " +
      "loop, zero-norm -> 0.0, ragged lengths throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.CosineSimilarity.cosine_similarity
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vs = (0 until 50).map { r =>
      (Array.tabulate(16)(i => ((r * 31 + i * 7) % 13 - 6).toFloat),
        Array.tabulate(16)(i => ((r * 17 + i * 5) % 11 - 5).toFloat))
    }
    val got = vs.toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    vs.map { case (a, b) => ref(a, b) }.zip(got).foreach { case (w, g) =>
      assert(w == g, s"expected $w got $g") // bit-identical, no epsilon
    }
    val zero = Seq((Array.fill(4)(0f), Array.fill(4)(1f))).toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b"))).head().getDouble(0)
    assert(zero == 0.0)
    val e = intercept[Exception] {
      Seq((Array(1f, 2f), Array(1f))).toDF("a", "b")
        .select(cosine_similarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause.getMessage.contains("length mismatch"))
  }

  test("block-partitioned exact pairs are identical regardless of block size") {
    val oneBlock = Similarity.neardupPairs(spark, sf0001, tau = 0.4,
      blockSize = 1 << 20).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val manyBlocks = Similarity.neardupPairs(spark, sf0001, tau = 0.4,
      blockSize = 64).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(oneBlock == manyBlocks)
    assert(oneBlock.nonEmpty)
  }

  test("semDedup drop set equals a local replay of the within-cluster rule") {
    import graft.ext.IvfIndex
    val tau = 0.4
    val got = Similarity.semDedup(spark, sf001, nClusters = 8, tau = tau)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // local reference: same deterministic clustering, exact cosine, drop
    // any vector with a >= tau neighbor of lower id in the same cluster
    val ds = spark.read.parquet(s"$sf001/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as(org.apache.spark.sql.Encoders.product[Similarity.Vec])
    val centroids = IvfIndex.train(ds, 8)
    val vs = ds.collect().sortBy(_.vec_id)
    // replay of IvfIndex.nearestList (private[ext]): L2, ties → lowest id
    def nearest(v: Array[Float]): Int =
      centroids.indices.minBy { c =>
        var d = 0.0; var i = 0
        while (i < v.length) {
          val diff = v(i) - centroids(c)(i); d += diff * diff; i += 1
        }
        (d, c)
      }
    val cluster = vs.map(v => v.vec_id -> nearest(v.embedding)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val wantDropped = (for {
      i <- vs.indices; j <- (i + 1) until vs.length
      if cluster(vs(i).vec_id) == cluster(vs(j).vec_id)
      if cos(vs(i).embedding, vs(j).embedding) >= tau
    } yield vs(j).vec_id).toSet
    assert(got.size == vs.length) // verdict for every vector
    assert(got.filter(_._2 == "drop").keySet == wantDropped)
    assert(wantDropped.nonEmpty, "corpus should contain semantic dups")
  }

  test("q190 semantic decontamination equals a local BigInt replay of " +
      "the IVF-bucketed integer cosine gate; eval side broadcasts") {
    import graft.ext.IvfIndex
    val df = Similarity.semanticDecontaminate(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // local replay from the raw parquet: micro-quantize, assign with
    // the REAL detCentroids/assign pair, then the exact integer rule
    val vs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as(org.apache.spark.sql.Encoders.product[Similarity.Vec])
      .collect().sortBy(_.vec_id)
    val quant = vs.map(v => v.vec_id ->
      v.embedding.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
      .toMap
    val cents = IvfIndex.detCentroids(16, 64, 11L)
    def d2Of(q: Array[Long], c: Int): Double = {
      var d = 0.0; var i = 0
      while (i < q.length) {
        val diff = q(i) - cents(c)(i); d += diff * diff; i += 1
      }
      d
    }
    def nearest(q: Array[Long]): Int =
      cents.indices.minBy(c => (d2Of(q, c), c))
    // corpus side: single assignment; eval side: the P nearest lists
    // (multiprobe), same (d2, list) tiebreak
    val listOf = quant.map { case (id, q) => id -> nearest(q) }
    val probesOf = quant.map { case (id, q) =>
      id -> cents.indices.sortBy(c => (d2Of(q, c), c))
        .take(Similarity.SemDecProbes).toSet
    }
    def dotL(a: Array[Long], b: Array[Long]): BigInt =
      a.indices.foldLeft(BigInt(0))((s, i) => s + BigInt(a(i)) * b(i))
    val evalIds = quant.keys.filter(_ % 50 == 0).toSeq.sorted
    val want = (for {
      c <- quant.keys.toSeq if c % 50 != 0
      e <- evalIds if probesOf(e).contains(listOf(c))
      d = dotL(quant(c), quant(e))
      if d > 0 && 25 * d * d >= 4 * dotL(quant(c), quant(c)) *
        dotL(quant(e), quant(e))
    } yield ((c, s"bench${(e / 50) % 3}"), 1L))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain semantic leakage")
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"), "eval side must broadcast")
  }

  test("q199 recall audit: bucketed pairs are a subset of exact " +
      "pairs, counts match a local BigInt all-pairs replay, and the " +
      "audit reports the filter's real misses") {
    import graft.ext.IvfIndex
    val vs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as(org.apache.spark.sql.Encoders.product[Similarity.Vec])
      .collect().sortBy(_.vec_id)
    val quant = vs.map(v => v.vec_id ->
      v.embedding.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
      .toMap
    def dotL(a: Array[Long], b: Array[Long]): BigInt =
      a.indices.foldLeft(BigInt(0))((s, i) => s + BigInt(a(i)) * b(i))
    val evalIds = quant.keys.filter(_ % 50 == 0).toSeq
    def benchOf(e: Long) = s"bench${(e / 50) % 3}"
    val wantExact = (for {
      c <- quant.keys.toSeq if c % 50 != 0
      e <- evalIds
      d = dotL(quant(c), quant(e))
      if d > 0 && 25 * d * d >= 4 * dotL(quant(c), quant(c)) *
        dotL(quant(e), quant(e))
    } yield benchOf(e)).groupBy(identity).map { case (b, xs) =>
      b -> xs.length.toLong
    }
    val got = Similarity.semanticRecallAudit(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got.foreach { case (b, (ex, bk, ppm)) =>
      assert(ex == wantExact.getOrElse(b, 0L), s"$b exact")
      assert(bk <= ex, s"$b bucketed must be a subset of exact")
      assert(ppm == (if (ex == 0) 1000000L else bk * 1000000L / ex))
    }
    // the audit is non-vacuous: real pairs exist on the fixture
    assert(got.values.map(_._1).sum > 0)
    // the P knob does what it claims: P = 1 (round-14's single-list
    // filter) finds strictly fewer pairs than the default multiprobe,
    // and the multiprobe recall is a superset by construction
    val p1 = Similarity.semanticFlagsOfP(spark, sf0001, 1)
      .agg(org.apache.spark.sql.functions.sum("n_sem")).collect()(0)
      .getLong(0)
    val pDefault = got.values.map(_._2).sum
    assert(p1 < pDefault,
      s"multiprobe (P=${Similarity.SemDecProbes}, $pDefault pairs) " +
        s"must beat single-list (P=1, $p1 pairs) on this fixture")
  }

  test("q191 verdict composes q54 and q190 without loss: flags, " +
      "counts, and verdict labels agree with the parts") {
    val sem = Similarity.semanticDecontaminate(spark, sf0001)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).sum }
    val ng = graft.ext.Curate.decontaminate(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.contaminationVerdict(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).toSet == sem.keySet ++ ng.keySet)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == ng.getOrElse(id, 0L))
      assert(r.getLong(2) == sem.getOrElse(id, 0L))
      val wantVerdict =
        if (ng.contains(id) && sem.contains(id)) "both"
        else if (ng.contains(id)) "ngram" else "semantic"
      assert(r.getString(3) == wantVerdict)
    }
  }

  test("srpCodes: Hamming distance tracks cosine (Charikar property)") {
    // planted structure (the sf fixtures are near-orthogonal): 40 base
    // directions, each with a jittered twin at cos ~ 0.97
    val rnd = new scala.util.Random(99)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // per-component jitter 0.03 -> noise NORM 0.03*sqrt(64) = 0.24 ->
    // cos ~ 1/sqrt(1+0.24^2) ~ 0.972 (e.g. 0.15 would already be cos .65)
    val bases = Array.fill(40)(unit(Array.fill(64)(rnd.nextGaussian().toFloat)))
    val twins = bases.map(b => unit(b.map(x =>
      x + 0.03f * rnd.nextGaussian().toFloat)))
    val rows = (bases ++ twins).zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(i.toLong, v.toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
    val codes = Similarity.srpCodesOf(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val twinDist = (0 until 40).map(i => ham(codes(i), codes(i + 40L)).toDouble)
    val crossDist = for (i <- 0 until 40; j <- 0 until 40 if i != j)
      yield ham(codes(i), codes(j + 40L)).toDouble
    val (mt, mx) = (twinDist.sum / twinDist.size,
      crossDist.sum / crossDist.size)
    // E[hamming]/16 = acos(cos)/pi: ~0.08 for twins, ~0.5 for random
    assert(mt < 3.0 && mx > 5.5, s"twin=$mt cross=$mx")
  }
}
