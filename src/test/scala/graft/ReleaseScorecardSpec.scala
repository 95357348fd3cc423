package graft

import org.apache.spark.sql.functions._

import graft.ext.Warc
import graft.functions.DetMix

/** q168 model-gated release scorecard: per-shard doc/token totals
  * reconcile cell-for-cell with the q166 manifest (same clean set,
  * same assignment), the model verdicts agree doc-for-doc with the
  * registered q160 margins re-bucketed by the DetMix JVM twin, and
  * the gate is non-trivial on the live corpus (the model keeps some
  * released documents and rejects others). */
class ReleaseScorecardSpec extends SparkSpecBase {

  test("q168 totals reconcile with the q166 manifest and the gate " +
      "is non-trivial") {
    val sc = Warc.releaseScorecard(spark, sf0001).collect()
    val man = Warc.crawlRelease(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sc.map(_.getInt(0)).toSet == man.keySet)
    sc.foreach { r =>
      val (nDocs, nToks) = man(r.getInt(0))
      assert(r.getLong(1) == nDocs && r.getLong(3) == nToks)
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) <= r.getLong(3))
    }
    val keptSum = sc.map(_.getLong(2)).sum
    assert(keptSum > 0 && keptSum < sc.map(_.getLong(1)).sum,
      "expected the model to keep some and reject some")
  }

  test("per-shard model verdicts equal the registered q160 margins " +
      "re-bucketed with the DetMix JVM twin") {
    val margins = graft.ext.TextAnalysis
      .nbQualityClassifier(spark, sf0001)
      .select(col("doc_id"), col("margin_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the clean ids per shard, straight from the q168 path's inputs:
    // rebuild clean via the spec-level pure path used in CrawlReleaseSpec
    val sc = Warc.releaseScorecard(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val adm = Warc.crawlAdmittedOf(Warc.synthesizeWarcBlobsOf(
        Tables(spark, sf0001, "documents"))).localCheckpoint()
    val pairs = graft.ext.Dedup.ngramJaccardPairsOf(
        graft.ext.Dedup.shingleHashDfOf(
          Tables(spark, sf0001, "documents")), 0.8)
      .select(col("a"), col("b"))
    val kept = Warc.crawlKeptOf(adm, pairs)
      .filter(col("doc_id") % 50 =!= 0).select("doc_id", "text")
    val bench = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val cont = graft.ext.Curate.decontaminateOf(kept.unionByName(bench))
      .select("doc_id")
    val cleanIds = kept.join(cont, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = cleanIds
      .filter(id => margins(id) >= 0)
      .groupBy(id => (DetMix.mixLong(id, ext.Shards.Seed) %
        ext.Shards.NShards).toInt)
      .view.mapValues(_.length.toLong).toMap
    assert(sc.filter(_._2 > 0) == expected)
  }
}
