package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.ext.Shards

/** Shard layout (q143): assignment balance and determinism, exactly
  * one file per shard directory, manifest == what the files actually
  * contain when read back, and the one-exchange manifest plan. */
class ShardsSpec extends SparkSpecBase {

  test("assignment is uniform-ish and partition-invariant") {
    val docs = Tables(spark, sf001, "documents")
    val a = Shards.shardAssignOf(docs)
    val sizes = a.groupBy("shard_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until Shards.NShards).toSet)
    val (mn, mx) = (sizes.values.min, sizes.values.max)
    assert(mx <= 2 * mn, s"shard skew: $sizes")
    val b = Shards.shardAssignOf(docs.repartition(17))
      .orderBy("doc_id").collect().toSeq
    assert(a.orderBy("doc_id").collect().toSeq == b)
  }

  test("writeShards: one file per shard dir; manifest matches a full " +
      "read-back of every shard's rows (counts, tokens, checksum)") {
    val out = Files.createTempDirectory("graft_shards").toString
    val docs = Tables(spark, sf0001, "documents")
    val manifest = Shards.writeShards(docs, out)
      .collect().map(r => r.getInt(0) -> r).toMap
    for (sid <- 0 until Shards.NShards) {
      val dir = Paths.get(s"$out/data/shard_id=$sid")
      assert(Files.exists(dir), s"missing shard dir $sid")
      val files = Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(files.length == 1,
        s"shard $sid must be exactly one file, got ${files.length}")
      val back = spark.read.parquet(s"$out/data/shard_id=$sid")
      val m = manifest(sid)
      assert(back.count() == m.getAs[Long]("n_docs"))
      // recompute tokens + fingerprint from the shipped rows themselves
      val re = Shards.shardAssignOf(back.select("doc_id", "text"))
        .agg(sum("n_tokens"), sum("fp"), min("doc_id"), max("doc_id"))
        .head()
      assert(re.getLong(0) == m.getAs[Long]("n_tokens"))
      assert(re.getLong(1) == m.getAs[Long]("checksum"))
      assert(re.getLong(2) == m.getAs[Long]("min_doc_id"))
      assert(re.getLong(3) == m.getAs[Long]("max_doc_id"))
    }
    // the persisted manifest equals the returned one
    val persisted = spark.read.parquet(s"$out/manifest")
      .orderBy("shard_id").collect().toSeq
    assert(persisted.map(_.getAs[Int]("shard_id")) ==
      (0 until Shards.NShards))
  }

  test("plan shape: manifest is one hash exchange, sort-free") {
    val df = Shards.manifestOf(
      Shards.shardAssignOf(Tables(spark, sf0001, "documents")))
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, p.take(1000))
    assert(!p.toLowerCase.contains("rangepartitioning"))
  }
}
