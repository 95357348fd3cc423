package graft

import org.apache.spark.sql.functions._
import graft.ext.{AudioHash, ImageHash, MediaCodecs, Multimodal}

/** Perceptual audio fingerprinting (q134) and banded Hamming audio
  * near-dup (q135): golden fingerprints on hand-built signals, noise
  * tolerance, planted twin recall, and plan shape. */
class AudioHashSpec extends SparkSpecBase {

  test("fingerprintOne golden: monotone rising frame energy sets every " +
      "non-wrap gradient bit; constant energy sets none; short clips " +
      "are skipped") {
    // 64 samples, 2 per frame; |s16| grows with the frame index ->
    // every frame is quieter than its successor except the wrap (31->0)
    val rising = Array.tabulate(64)(i => (i / 2 + 1) * 100 / 32768.0)
    val Some(fp) = AudioHash.fingerprintOne(rising)
    assert(fp == (0 until 31).map(1L << _).sum)
    // constant signal: all equal, strict < never fires
    assert(AudioHash.fingerprintOne(Array.fill(64)(0.25)).contains(0L))
    // shorter than the 32-frame grid: no stable fingerprint
    assert(AudioHash.fingerprintOne(Array.fill(31)(0.5)).isEmpty)
  }

  test("sparse single-step sample noise moves the fingerprint by at " +
      "most the pair radius on every synthesized corpus clip") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    var checked = 0
    docs.foreach { case (id, text) =>
      if (math.floorMod(id, 6L) == 3) {
        val src =
          if (text.isEmpty) Array[Byte](42) else text.getBytes("UTF-8")
        def fp(b: Array[Byte]) = MediaCodecs
          .decodeWav(Multimodal.synthesizeMedia(id, b))
          .flatMap(a => AudioHash.fingerprintOne(a.samples))
        val (a, b) = (fp(src), fp(ImageHash.perturb(src)))
        assert(a.isDefined && b.isDefined)
        val d = java.lang.Long.bitCount(a.get ^ b.get)
        assert(d <= AudioHash.DefaultMaxHamming, s"doc $id moved $d bits")
        checked += 1
      }
    }
    assert(checked > 5)
  }

  test("q135 finds every planted perturbed twin as a pair with its " +
      "original") {
    import spark.implicits._
    val pairs = AudioHash.audioNearDup(spark, sf0001)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val planted = Tables(spark, sf0001, "documents")
      .select(col("doc_id")).as[Long].collect()
      .filter(_ % 30 == 15)
      .map(id => (id, id + ImageHash.PerturbId)).toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${planted -- pairs}")
  }

  test("plan shape: fingerprinting is a narrow decode map; the pair " +
      "join is banded, no cartesian, sort-free Of form") {
    val fpPlan = AudioHash.fingerprintsOf(
        Multimodal.mediaPayloads(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(!fpPlan.contains("Exchange"), fpPlan.take(800))
    val pairPlan = AudioHash.audioNearDupPairsOf(AudioHash.fingerprintsOf(
        Multimodal.mediaPayloads(spark, sf0001)))
      .queryExecution.executedPlan.toString
    assert(!pairPlan.contains("Cartesian"), pairPlan.take(800))
    assert(!pairPlan.toLowerCase.contains("rangepartitioning"),
      pairPlan.take(800))
  }
}
