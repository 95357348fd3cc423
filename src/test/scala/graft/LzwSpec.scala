package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.{MediaCodecs, TextAnalysis}
import graft.functions.Lzw

/** LZW compression-ratio signal (q142): the counter must agree byte-
  * for-byte with the GIF encoder's actual stream (the codec the video
  * family round-trips through the JDK's independent decoder), the
  * ratio must rank repetitive below natural below noise, and the plan
  * must stay a zero-shuffle narrow map. */
class LzwSpec extends SparkSpecBase {

  private def count(s: String): Int = Lzw.bytes(UTF8String.fromString(s))
  private def encoded(s: String): Int =
    MediaCodecs.gifLzwEncode(s.getBytes("UTF-8")).length

  test("lzw_bytes == gifLzwEncode stream length: singletons, runs, " +
      "width-boundary crossings, and multi-KB dictionary resets") {
    val cases = Seq(
      "a",
      "ab",
      "aaaa",
      "a" * 300,                       // first width growth (9 -> 10)
      "ab" * 2000,                     // long two-symbol cycle
      ('a' to 'z').mkString * 40,
      "the quick brown fox jumps over the lazy dog. " * 50,
      // high-entropy-ish: every (a,b) pair distinct early on
      (0 until 5000).map(i => ((i * 37) % 94 + 33).toChar).mkString,
      // force the 4095-slot reset: long unique-pair stream
      (0 until 30000).map(i => ((i * i + i / 7) % 94 + 33).toChar).mkString,
      "héllo wörld ünïcode " * 100)    // multi-byte UTF-8
    for (s <- cases)
      assert(count(s) == encoded(s),
        s"len=${s.length}: counted ${count(s)} vs stream ${encoded(s)}")
    assert(count("") == 0)
  }

  test("ratio orders regimes: repeated template < natural prose < " +
      "random noise; doubling a document lowers its ratio") {
    def ratio(s: String): Double =
      count(s).toDouble / s.getBytes("UTF-8").length
    val template = "Click here to subscribe to our newsletter today! " * 30
    val prose = "In the autumn of that year the rains came early and " +
      "the river rose through the poplars while carts moved slowly " +
      "on the white road toward the mountains beyond the plain. " * 8
    val noise = (0 until 1500)
      .map(i => (((i * 2654435761L) >>> 7) % 94 + 33).toChar).mkString
    assert(ratio(template) < ratio(prose), "template must compress harder")
    assert(ratio(prose) < ratio(noise), "noise must resist compression")
    assert(ratio(prose * 2) < ratio(prose), "self-repeat must compress")
  }

  test("q142 on the corpus: flags fire, bands are sane, plan is a " +
      "zero-shuffle narrow map") {
    val df = TextAnalysis.compressionRatioOf(
      Tables(spark, sf001, "documents"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "compressionRatioOf must not shuffle")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getAs[Long]("ratio_ppm"))
    assert(ratios.forall(r => r > 300000L && r < 1300000L))
    // ratio_ppm is the exact integer form of lzw/bytes (the oracle's
    // hashable column)
    rows.foreach { r =>
      assert(r.getAs[Long]("ratio_ppm") ==
        r.getAs[Int]("lzw_bytes").toLong * 1000000L /
          r.getAs[Int]("n_bytes"))
    }
    assert(rows.exists(_.getAs[Boolean]("templated")),
      "templated threshold never fires at sf0.01")
    assert(rows.exists(_.getAs[Boolean]("high_entropy")),
      "high_entropy threshold never fires at sf0.01")
    assert(rows.count(_.getAs[Boolean]("templated")).toDouble
      / rows.length < 0.25, "templated must stay a minority flag")
  }
}
