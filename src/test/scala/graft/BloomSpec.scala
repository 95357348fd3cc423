package graft

import org.apache.spark.sql.functions._

import graft.ext.Curate
import graft.functions.{Bloom, BloomHash}

class BloomSpec extends SparkSpecBase {

  test("bloom filter has no false negatives and bounded false positives") {
    import spark.implicits._
    val n = 20000
    val keys = (1L to n).map(_ * 0x9e3779b97f4a7c15L) // well-spread inputs
    val bits = Bloom.bitsFor(n, 0.01)
    val hashes = Bloom.hashesFor(bits, n)
    val filter = keys.toDF("h").repartition(8)
      .agg(Bloom.bloom_build(col("h"), bits, hashes))
      .head().getAs[Array[Byte]](0)
    // every inserted key probes true (bloom errors are one-sided)
    assert(keys.forall(BloomHash.mightContain(filter, _)))
    // absent keys false-positive near the designed rate (≤ 3× slack)
    val absent = (1L to n).map(k => (k + 7 * n) * 0x9e3779b97f4a7c15L)
    val fp = absent.count(BloomHash.mightContain(filter, _))
    assert(fp.toDouble / n < 0.03, s"fp rate ${fp.toDouble / n}")
  }

  test("bloom build is partitioning-invariant (merge = OR)") {
    import spark.implicits._
    val keys = (1L to 5000L).toDF("h")
    def build(parts: Int): Seq[Byte] =
      keys.repartition(parts)
        .agg(Bloom.bloom_build(col("h"), 1 << 16, 7))
        .head().getAs[Array[Byte]](0).toSeq
    assert(build(1) == build(13))
  }

  test("might_contain agrees between codegen'd and interpreted paths") {
    import spark.implicits._
    val keys = (1L to 1000L).toDF("h")
    val filter = keys.agg(Bloom.bloom_build(col("h"), 1 << 14, 5))
      .head().getAs[Array[Byte]](0)
    val probes = (500L to 1500L).toDF("h")
    val viaSql = probes
      .select(col("h"), Bloom.might_contain(lit(filter), col("h")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (500L to 1500L).foreach { k =>
      assert(viaSql(k) == BloomHash.mightContain(filter, k), s"key $k")
    }
    // and the first 1000 keys are all present
    assert((500L to 1000L).forall(viaSql(_)))
  }

  test("q79 bloom-pruned decontamination equals the exact q54 result") {
    val exact = Curate.decontaminate(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val bloom = Curate.decontaminateBloom(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    assert(bloom == exact)
    // even with a deliberately high-FP (tiny) filter the verify join
    // restores exactness — the prune is structural, not statistical
    val tiny = Curate.decontaminateBloom(spark, sf001, fpp = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    assert(tiny == exact)
  }
}
