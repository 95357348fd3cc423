package graft

import org.apache.spark.sql.functions._
import graft.ext.{ImageHash, MediaCodecs, Multimodal}

/** Perceptual image hashing (q127) and banded-Hamming image near-dup
  * (q128): golden hashes on hand-built gradients, the
  * resolution-invariance property that makes the hash perceptual,
  * tolerance to sparse pixel noise and to a real JPEG re-encode, planted
  * twin recall, and plan shape. */
class ImageHashSpec extends SparkSpecBase {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int) = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) px(y * w + x) = f(x, y).toByte
    MediaCodecs.ImagePixels("pgm", w, h, 1, px)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("dhashOne golden: an 8x4 horizontal ramp sets exactly the " +
      "non-wrapping horizontal gradient bits") {
    // cell (gx, gy) == pixel (x, y); brightness strictly increases with
    // x -> every cell is darker than its right neighbor EXCEPT the wrap
    // column gx=7 (brighter than gx=0); rows are constant -> vv has only
    // the wrap structure of equal cells (no bit: equal is not <)
    val Some((hh, vv)) = ImageHash.dhashOne(gray(8, 4)((x, _) => x * 10))
    val expectH = (0 until 4).map { gy =>
      (0 until 7).map(gx => 1L << (gy * 8 + gx)).sum
    }.sum
    assert(hh == expectH)
    assert(vv == 0L)
    // vertical ramp: transpose property
    val Some((hh2, vv2)) = ImageHash.dhashOne(gray(8, 4)((_, y) => y * 10))
    assert(hh2 == 0L)
    val expectV = (0 until 3).map { gy =>
      (0 until 8).map(gx => 1L << (gy * 8 + gx)).sum
    }.sum
    assert(vv2 == expectV)
  }

  test("dhash is resolution-invariant: the same gradient at 8x4, 16x8, " +
      "and 64x32 hashes identically (the perceptual property)") {
    def ramp(w: Int, h: Int) = gray(w, h)((x, y) => (x * 8 / w) * 9 + y)
    val h1 = ImageHash.dhashOne(ramp(8, 4)).get
    val h2 = ImageHash.dhashOne(ramp(16, 8)).get
    val h3 = ImageHash.dhashOne(ramp(64, 32)).get
    assert(h1 == h2 && h2 == h3)
    // ...and images smaller than the grid are skipped, not mis-hashed
    assert(ImageHash.dhashOne(gray(7, 4)((x, y) => x + y)).isEmpty)
    assert(ImageHash.dhashOne(gray(8, 3)((x, y) => x + y)).isEmpty)
  }

  test("sparse single-step pixel noise moves the hash by at most the " +
      "pair radius on every synthesized corpus image") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    var checked = 0
    docs.foreach { case (id, text) =>
      val m = math.floorMod(id, 6L)
      if (m != 3 && m != 5) {
        val src =
          if (text.isEmpty) Array[Byte](42) else text.getBytes("UTF-8")
        val a = MediaCodecs.decodeImage(Multimodal.synthesizeMedia(id, src))
          .flatMap(ImageHash.dhashOne)
        val b = MediaCodecs.decodeImage(
            Multimodal.synthesizeMedia(id, ImageHash.perturb(src)))
          .flatMap(ImageHash.dhashOne)
        assert(a.isDefined && b.isDefined)
        assert(hamming(a.get, b.get) <= ImageHash.DefaultMaxHamming,
          s"doc $id moved ${hamming(a.get, b.get)} bits")
        checked += 1
      }
    }
    assert(checked > 50)
  }

  test("a real JPEG re-encode of a smooth raster stays within a small " +
      "Hamming distance (what perceptual hashing exists for)") {
    val src = gray(64, 32)((x, y) => 40 + x * 2 + y)
    val rgb = MediaCodecs.ImagePixels("ppm", 64, 32, 3,
      Array.tabulate(64 * 32 * 3)(i => src.pixels(i / 3)))
    val base = ImageHash.dhashOne(rgb).get
    val jpeg = MediaCodecs.decodeImage(MediaCodecs.encodeJpeg(rgb)).get
    assert(jpeg.format == "jpeg")
    val re = ImageHash.dhashOne(jpeg).get
    assert(hamming(base, re) <= 8,
      s"jpeg re-encode moved ${hamming(base, re)} bits")
  }

  test("q128 finds every planted perturbed twin as a pair with its " +
      "original") {
    import spark.implicits._
    val pairs = ImageHash.imageNearDup(spark, sf0001)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val planted = Tables(spark, sf0001, "documents")
      .select(col("doc_id")).as[Long].collect()
      .filter(id => id % 10 == 0 &&
        math.floorMod(id, 6L) != 3 && math.floorMod(id, 6L) != 5)
      .map(id => (id, id + ImageHash.PerturbId)).toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${planted -- pairs}")
  }

  test("q133 clusters: every planted twin lands in its original's " +
      "component with the original as representative") {
    import spark.implicits._
    val clusters = ImageHash.imageClusters(spark, sf0001)
      .select(col("doc_id"), col("cluster_id"), col("n_members"))
      .as[(Long, Long, Long)].collect()
    val byId = clusters.map(c => c._1 -> c).toMap
    val planted = Tables(spark, sf0001, "documents")
      .select(col("doc_id")).as[Long].collect()
      .filter(id => id % 10 == 0 &&
        math.floorMod(id, 6L) != 3 && math.floorMod(id, 6L) != 5)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val twin = id + ImageHash.PerturbId
      assert(byId.contains(id) && byId.contains(twin),
        s"pairled images $id/$twin missing from clusters")
      assert(byId(id)._2 == byId(twin)._2,
        s"twin $twin not in $id's component")
      assert(byId(id)._2 <= id, "representative must be the min id")
      assert(byId(id)._3 >= 2)
    }
  }

  test("plan shape: hashing is a narrow decode map; the pair join is " +
      "banded (no cartesian) and the Of form is sort-free") {
    val hashPlan = ImageHash.dhashOf(Multimodal.mediaPayloads(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(!hashPlan.contains("Exchange"), hashPlan.take(800))
    val pairPlan = ImageHash.imageNearDupPairsOf(
        ImageHash.dhashOf(Multimodal.mediaPayloads(spark, sf0001)))
      .queryExecution.executedPlan.toString
    assert(!pairPlan.contains("Cartesian"), pairPlan.take(800))
    assert(!pairPlan.toLowerCase.contains("rangepartitioning"),
      pairPlan.take(800))
    // registered q128: exactly the one deterministic output sort
    val reg = ImageHash.imageNearDup(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(reg.toLowerCase).length == 1,
      reg.take(800))
  }
}
