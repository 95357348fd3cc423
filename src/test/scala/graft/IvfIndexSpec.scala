package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}

class IvfIndexSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus() =
    Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).as[Similarity.Vec]

  test("save/load round-trips centroids exactly") {
    val ds = corpus().localCheckpoint()
    val trained = IvfIndex.train(ds, nLists = 8, lloydIters = 2)
    val path = Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.save(spark, path, trained)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.length == trained.length)
    trained.zip(loaded).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("persisted-index probe equals the one-call annIvf query") {
    val ds = corpus().localCheckpoint()
    val centroids = IvfIndex.train(ds, nLists = 16, lloydIters = 3)
    val path = Files.createTempDirectory("graft-ivf2").toString
    IvfIndex.save(spark, path + "/idx", centroids)
    IvfIndex.assign(ds, centroids)
      .write.parquet(path + "/postings")
    // a later "session": everything reloaded from parquet
    val postings = spark.read.parquet(path + "/postings")
    val viaIndex = IvfIndex.probe(ds, ds, postings,
        IvfIndex.load(spark, path + "/idx"), nProbe = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    val oneCall = Similarity.annIvf(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    assert(viaIndex == oneCall)
  }

  test("incremental assign: a new batch appends postings without " +
      "re-training, and probes see it") {
    val all = corpus().localCheckpoint()
    val old = all.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val batch = all.filter(col("vec_id") % 2 =!= 0).localCheckpoint()
    val centroids = IvfIndex.train(old, nLists = 8, lloydIters = 2)
    val path = Files.createTempDirectory("graft-ivf3").toString + "/postings"
    IvfIndex.assign(old, centroids).write.parquet(path)
    // ingest: assign ONLY the new batch, append
    IvfIndex.assign(batch, centroids).write.mode("append").parquet(path)
    val postings = spark.read.parquet(path)
    assert(postings.count() == all.count())
    assert(postings.select("vec_id").distinct().count() == all.count())
    // a probe over the merged postings can return new-batch neighbors
    val got = IvfIndex.probe(all, all, postings, centroids, 4, 5)
    assert(got.filter(col("neighbor_id") % 2 =!= 0).count() > 0)
  }

  private def quantCorpus() =
    corpus().map(v => Similarity.Vec(v.vec_id,
      v.embedding.map(x => math.floor(x.toDouble * 1e6 + 0.5).toFloat)))

  test("trainExact is partitioning-invariant bit for bit " +
      "(float train is not guaranteed to be)") {
    val ds = quantCorpus().localCheckpoint()
    val (c1, n1) = IvfIndex.trainExact(ds.repartition(1), nLists = 8,
      dim = 64, iters = 3, seed = 17L)
    val (c7, n7) = IvfIndex.trainExact(ds.repartition(7), nLists = 8,
      dim = 64, iters = 3, seed = 17L)
    assert(n1.toList == n7.toList)
    c1.zip(c7).foreach { case (a, b) => assert(a.sameElements(b)) }
    // and it learned something: at least one centroid moved off init
    val init = IvfIndex.detCentroids(8, 64, 17L)
    assert(c1.zip(init).exists { case (a, b) => !a.sameElements(b) })
  }

  test("trainExact: an empty list keeps its init centroid and reports " +
      "size 0") {
    import spark.implicits._
    // two identical-ish vectors, four lists: at most two lists populated
    val tiny = Seq(
      Similarity.Vec(1L, Array.fill(4)(100f)),
      Similarity.Vec(2L, Array.fill(4)(101f))).toDS()
    val (cs, ns) = IvfIndex.trainExact(tiny, nLists = 4, dim = 4,
      iters = 2, seed = 5L)
    val init = IvfIndex.detCentroids(4, 4, 5L)
    assert(ns.count(_ == 0) >= 2)
    ns.zipWithIndex.filter(_._1 == 0).foreach { case (_, l) =>
      assert(cs(l).sameElements(init(l)))
    }
    assert(ns.sum == 2)
  }

  test("trainExact centroid update truncates toward zero, matching the " +
      "oracle's integer division") {
    import spark.implicits._
    val tiny = Seq(
      Similarity.Vec(1L, Array(-3f)),
      Similarity.Vec(2L, Array(-4f))).toDS()
    // one list: both vectors assigned to it; mean = -3.5 → trunc = -3
    val (cs, _) = IvfIndex.trainExact(tiny, nLists = 1, dim = 1,
      iters = 1, seed = 5L)
    assert(cs(0)(0) == -3.0)
  }

  test("forgetImpactOf treats a NULL forget verdict as kept — counts " +
      "AND checksum agree") {
    import spark.implicits._
    // vec 1 forgotten, vec 2 kept, vec 3 NULL verdict (must act kept)
    val postings = Seq((1L, 0), (2L, 0), (3L, 0))
      .toDF("vec_id", "list_id")
    val verdicts = Seq((1L, true), (2L, false))
      .toDF("vec_id", "_v") // vec 3 absent → NULL after left join
    val joined = postings.join(verdicts, Seq("vec_id"), "left")
    val r = IvfIndex.forgetImpactOf(joined, col("_v"), fpSeed = 19L)
      .head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getLong(3) == 2L)
    val fpOf = (id: Long) => graft.functions.DetMix.mixLong(id, 19L)
    assert(r.getLong(4) == fpOf(1L) + fpOf(2L) + fpOf(3L))
    // NULL row's fp stays in checksum_after: the verifier algebra holds
    assert(r.getLong(5) == fpOf(2L) + fpOf(3L))
    assert(r.getLong(4) - r.getLong(5) == fpOf(1L))
  }

  test("trainExact refuses an empty corpus with a clear message") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      IvfIndex.trainExact(spark.emptyDataset[Similarity.Vec],
        nLists = 4, dim = 8, iters = 1, seed = 5L)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("forgetImpactOf checksum algebra: before − after = Σ fp(forgotten)") {
    val ds = quantCorpus().localCheckpoint()
    val centroids = IvfIndex.detCentroids(16, 64, 11L)
    val postings = IvfIndex.assign(ds, centroids).localCheckpoint()
    val impact = IvfIndex.forgetImpactOf(postings,
      col("vec_id") % 13 === 0, fpSeed = 19L).collect()
    val fpOfForgotten = postings
      .filter(col("vec_id") % 13 === 0)
      .select(col("list_id"),
        expr(graft.functions.DetMix.mixSql("vec_id", 19L)).as("fp"))
      .groupBy(col("list_id")).agg(sum(col("fp")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    impact.foreach { r =>
      val list = r.getInt(0)
      val before = r.getLong(4)
      val after = if (r.isNullAt(5)) 0L else r.getLong(5)
      assert(before - after == fpOfForgotten.getOrElse(list, 0L))
      assert(r.getBoolean(6) == (r.getLong(2) > 0))
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }
}
