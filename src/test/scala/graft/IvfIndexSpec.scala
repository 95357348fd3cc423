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
}
