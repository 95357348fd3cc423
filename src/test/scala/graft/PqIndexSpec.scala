package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.{PqIndex, Similarity}

class PqIndexSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus() =
    Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).as[Similarity.Vec]

  test("codebook save/load round-trips exactly") {
    val ds = corpus().localCheckpoint()
    val cb = PqIndex.train(ds, m = 8, ksub = 16, lloydIters = 2)
    val path = Files.createTempDirectory("graft-pq").toString + "/cb"
    PqIndex.save(spark, path, cb)
    val loaded = PqIndex.load(spark, path)
    assert(loaded.length == cb.length)
    cb.zip(loaded).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("probe over persisted codes equals the one-call annPq query") {
    val ds = corpus().localCheckpoint()
    val cb = PqIndex.train(ds, m = 8, ksub = 32, lloydIters = 3)
    val path = Files.createTempDirectory("graft-pq2").toString
    PqIndex.save(spark, path + "/cb", cb)
    PqIndex.encode(ds, cb).write.parquet(path + "/codes")
    // a later "session": codebooks and codes reloaded from parquet
    val queries = ds.filter(_.vec_id < 16).collect().sortBy(_.vec_id)
    val viaIndex = PqIndex.probe(queries,
        spark.read.parquet(path + "/codes"),
        PqIndex.load(spark, path + "/cb"), ds, k = 5, shortlist = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    val oneCall = Similarity.annPq(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    assert(viaIndex == oneCall)
  }

  test("incremental encode: new batch appends codes, probes see it, " +
      "payload is m ints per vector") {
    val all = corpus().localCheckpoint()
    val old = all.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val batch = all.filter(col("vec_id") % 2 =!= 0).localCheckpoint()
    val cb = PqIndex.train(old, m = 8, ksub = 16, lloydIters = 2)
    val path = Files.createTempDirectory("graft-pq3").toString + "/codes"
    PqIndex.encode(old, cb).write.parquet(path)
    PqIndex.encode(batch, cb).write.mode("append").parquet(path)
    val codes = spark.read.parquet(path)
    assert(codes.count() == all.count())
    assert(codes.select(size(col("code"))).distinct().head().getInt(0) == 8)
    val queries = all.filter(_.vec_id < 8).collect().sortBy(_.vec_id)
    val got = PqIndex.probe(queries, codes, cb, all, k = 5)
    assert(got.filter(col("neighbor_id") % 2 =!= 0).count() > 0)
  }

  test("adcTable + adcOf equal the dot product against the decoded " +
      "(reconstructed) vector") {
    val ds = corpus().localCheckpoint()
    val cb = PqIndex.train(ds, m = 8, ksub = 16, lloydIters = 2)
    val sub = cb(0)(0).length
    val vecs = ds.filter(_.vec_id < 6).collect().sortBy(_.vec_id)
    val codes = PqIndex.encode(ds.filter(_.vec_id < 6), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for (q <- vecs; r <- vecs if q.vec_id != r.vec_id) {
      val t = PqIndex.adcTable(q.embedding, cb)
      val viaTable = PqIndex.adcOf(t, codes(r.vec_id))
      val recon = codes(r.vec_id).zipWithIndex.flatMap {
        case (c, s) => cb(s)(c)
      }.toArray
      val direct = q.embedding.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(viaTable - direct) < 1e-6,
        s"q=${q.vec_id} r=${r.vec_id}: $viaTable vs $direct")
    }
  }
}
