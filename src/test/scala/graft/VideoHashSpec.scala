package graft

import org.apache.spark.sql.functions._
import graft.ext.{ImageHash, MediaCodecs, VideoHash}

/** The video modality (q136-q138): the animated-GIF codec round trip
  * (own LZW encoder vs the JDK's independent decoder) across dictionary
  * growth, reset, and degenerate rasters; synthesized-corpus pixel
  * fidelity; real frame-sampling semantics; planted twin recall of the
  * temporal near-dup; and plan shape. */
class VideoHashSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(20260814L)

  private def roundTrip(w: Int, h: Int, frames: Seq[Array[Byte]]): Unit = {
    val gif = MediaCodecs.encodeGif(w, h, frames)
    val got = MediaCodecs.decodeGifFrames(gif)
    assert(got.isDefined, s"decode refused ($w x $h, ${frames.length} frames)")
    val g = got.get
    assert(g.width == w && g.height == h)
    assert(g.frames.length == frames.length,
      s"frame count ${g.frames.length} vs ${frames.length}")
    frames.indices.foreach { f =>
      assert(java.util.Arrays.equals(g.frames(f), frames(f).toArray),
        s"frame $f pixels diverged at ($w x $h)")
    }
  }

  test("GIF LZW round trip is bit-exact through the JDK's independent " +
      "decoder: corpus shapes, 12-bit width growth, and the 4095 " +
      "dictionary reset") {
    // corpus-shaped tiny frames
    roundTrip(8, 6, (0 until 3).map { _ =>
      val px = new Array[Byte](8 * 6); rnd.nextBytes(px); px
    })
    roundTrip(16, 12, (0 until 5).map { _ =>
      val px = new Array[Byte](16 * 12); rnd.nextBytes(px); px
    })
    // random 64x64 pushes the code width past 10 bits
    roundTrip(64, 64, (0 until 2).map { _ =>
      val px = new Array[Byte](64 * 64); rnd.nextBytes(px); px
    })
    // random 200x150 (30k px) crosses slot 4095 -> clear-code reset path
    roundTrip(200, 150, Seq({
      val px = new Array[Byte](200 * 150); rnd.nextBytes(px); px
    }))
  }

  test("GIF LZW round trip: degenerate rasters (constant, 1x1, long " +
      "two-value runs) and real compression on runs") {
    roundTrip(50, 40, Seq(Array.fill[Byte](50 * 40)(7)))
    roundTrip(1, 1, Seq(Array[Byte](255.toByte)))
    val runs = Array.tabulate[Byte](300 * 200)(i => ((i / 997) % 2).toByte)
    roundTrip(300, 200, Seq(runs))
    // the entropy coder must actually compress a run-dominated frame --
    // a stored/uncompressed-trick stream would be ~9/8 of raw size
    val gif = MediaCodecs.encodeGif(300, 200, Seq(runs))
    assert(gif.length < runs.length / 10,
      s"runs frame barely compressed: ${gif.length} of ${runs.length}")
  }

  test("decodeGifFrames refuses non-GIF and truncated payloads instead " +
      "of crashing") {
    assert(MediaCodecs.decodeGifFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.decodeGifFrames(
      MediaCodecs.encodePnm(MediaCodecs.ImagePixels("pgm", 4, 4, 1,
        new Array[Byte](16)))).isEmpty)
    val gif = MediaCodecs.encodeGif(8, 6, Seq(new Array[Byte](48)))
    assert(MediaCodecs.decodeGifFrames(gif.take(40)).isEmpty)
  }

  test("every synthesized corpus video decodes to the formula geometry, " +
      "frame count, and exact frame pixels") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(docs.length > 50)
    docs.foreach { case (id, text) =>
      val src =
        if (text.isEmpty) Array[Byte](42) else text.getBytes("UTF-8")
      val len = src.length
      val g = MediaCodecs.decodeGifFrames(
        VideoHash.synthesizeVideo(id, text.getBytes("UTF-8"))).get
      assert(g.width == 8 + len % 9 && g.height == 6 + len % 7)
      assert(g.frames.length == 2 + len % 4)
      g.frames.indices.foreach { f =>
        var p = 0
        while (p < g.frames(f).length) {
          val want = src((p + f * VideoHash.FrameShift) % len)
          assert(g.frames(f)(p) == want,
            s"doc $id frame $f pixel $p: ${g.frames(f)(p)} vs $want")
          p += 1
        }
      }
    }
  }

  test("q137 samples exactly every 2nd frame and takes n_frames from " +
      "the decoded container") {
    import spark.implicits._
    val fp = VideoHash.videoFingerprint(spark, sf0001)
      .select(col("doc_id"), col("frame_idx"), col("n_frames"))
      .as[(Long, Int, Int)].collect()
    assert(fp.nonEmpty)
    assert(fp.forall(_._2 % VideoHash.SampleEvery == 0))
    fp.groupBy(_._1).foreach { case (id, rows) =>
      val nf = rows.head._3
      assert(nf >= 2 && nf <= 5, s"doc $id n_frames $nf")
      val want = (0 until nf by VideoHash.SampleEvery).toSet
      assert(rows.map(_._2).toSet == want,
        s"doc $id sampled ${rows.map(_._2).toSet} of $nf frames")
    }
  }

  test("q138 finds every planted perturbed twin with full common-frame " +
      "coverage") {
    import spark.implicits._
    val pairs = VideoHash.videoNearDup(spark, sf0001)
      .select(col("a"), col("b"), col("n_common"))
      .as[(Long, Long, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val planted = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .filter(_._1 % 10 == 0)
    assert(planted.nonEmpty)
    planted.foreach { case (id, text) =>
      val len = math.max(1, text.getBytes("UTF-8").length)
      val sampled = (0 until (2 + len % 4) by VideoHash.SampleEvery).length
      val key = (id, id + VideoHash.PerturbId)
      assert(byPair.contains(key), s"planted twin pair $key missing")
      assert(byPair(key) == sampled,
        s"pair $key covers ${byPair(key)} of $sampled sampled frames")
    }
  }

  test("plan shape: synthesize+demux+hash is one narrow map; the pair " +
      "join is banded (no cartesian) and the Of form is sort-free") {
    val fpPlan = VideoHash.fingerprintsOf(
        VideoHash.videoPayloads(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(!fpPlan.contains("Exchange"), fpPlan.take(800))
    val pairPlan = VideoHash.videoNearDupPairsOf(
        VideoHash.fingerprintsOf(VideoHash.videoPayloads(spark, sf0001)))
      .queryExecution.executedPlan.toString
    assert(!pairPlan.contains("Cartesian"), pairPlan.take(800))
    assert(!pairPlan.toLowerCase.contains("rangepartitioning"),
      pairPlan.take(800))
    val reg = VideoHash.videoNearDup(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(reg.toLowerCase).length == 1,
      reg.take(800))
  }
}
