package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Value-level gates for the banded interval join (ops/RangeJoin.scala)
  * beyond the q93 oracle row: half-open boundary semantics, intervals
  * spanning band boundaries, overlapping intervals, degenerate
  * intervals, and the no-nested-loop plan guarantee. */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private val intervals = Seq(
    (1L, 100L, 200L),  // within one band (band=10)... spans 100..199
    (2L, 95L, 105L),   // spans a band boundary
    (3L, 150L, 160L),  // overlaps interval 1
    (4L, 300L, 300L),  // empty [300, 300) -> matches nothing
    (5L, 400L, 390L)   // inverted -> matches nothing
  ).toDF("iid", "lo", "hi")

  private val points = Seq(
    (10L, 100L), // = interval 1 lo (inclusive) and inside 2
    (11L, 199L), // last second of interval 1
    (12L, 200L), // = interval 1 hi (exclusive) -> out
    (13L, 104L), // inside 1 and 2
    (14L, 155L), // inside 1 and 3
    (15L, 300L), // empty interval -> out
    (16L, 94L)   // just below 2 -> out
  ).toDF("pid", "s")

  private def pairs(bandSeconds: Long): Set[(Long, Long)] =
    RangeJoin.bandedIntervalJoin(points, "s", intervals, "lo", "hi",
        bandSeconds)
      .select("iid", "pid").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 10L), (1L, 11L), (1L, 13L), (1L, 14L),
    (2L, 10L), (2L, 13L),
    (3L, 14L))

  test("half-open [lo, hi) semantics with band-spanning intervals") {
    assert(pairs(50L) == expected)
  }

  test("result is band-width invariant (narrow and wide bands agree)") {
    assert(pairs(7L) == expected)     // many bands per interval
    assert(pairs(10000L) == expected) // everything in one band
  }

  test("plan is an equi-join on the band — no nested loop, no cartesian") {
    val plan = RangeJoin.bandedIntervalJoin(points, "s", intervals,
      "lo", "hi", 50L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must band into an equi-join, got:\n$plan")
  }

  test("each point joins its band exactly once (no duplicate pairs from fanout)") {
    val got = RangeJoin.bandedIntervalJoin(points, "s", intervals,
        "lo", "hi", 3L)
      .groupBy("iid", "pid").count().filter(col("count") > 1).count()
    assert(got == 0, "interval-side band fanout must not duplicate matches")
  }

  private val lefts = Seq(
    (1L, 100L, 200L),
    (2L, 250L, 260L)
  ).toDF("lid", "lf", "lt")

  private val rights = Seq(
    (10L, 150L, 400L),  // overlaps 1 (and spans many bands) and 2
    (11L, 190L, 210L),  // overlaps 1 across the 200-band edge
    (12L, 200L, 250L),  // touches 1's exclusive end and 2's start: neither
    (13L, 90L, 100L),   // touches 1's inclusive start from below: no
    (14L, 99L, 101L)    // genuine 1-second overlap with 1
  ).toDF("rid", "rf", "rt")

  private def overlaps(bandSeconds: Long): Set[(Long, Long)] =
    RangeJoin.bandedOverlapJoin(lefts, "lf", "lt", rights, "rf", "rt",
        bandSeconds)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

  private val expectedOverlaps = Set(
    (1L, 10L), (1L, 11L), (1L, 14L), (2L, 10L))

  test("overlap join: half-open semantics, end-touching pairs excluded") {
    assert(overlaps(50L) == expectedOverlaps)
  }

  test("a runaway interval fails loud instead of exploding the band fanout") {
    val corrupt = Seq((1L, 0L, 100L), (2L, 0L, Long.MaxValue / 4))
      .toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.bandedIntervalJoin(points, "s", corrupt, "lo", "hi", 10L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("bands")),
      s"expected the band-guard raise_error, got: $ex")
  }

  test("suggestBandSeconds picks the median length, immune to monster rows") {
    val iv = (Seq.fill(50)((1L, 0L, 100L)) ++ Seq.fill(50)((2L, 0L, 120L)) ++
      Seq((3L, 0L, 100000000L))).toDF("iid", "lo", "hi")
    val b = RangeJoin.suggestBandSeconds(iv, "lo", "hi")
    assert(b >= 100L && b <= 120L, s"median-length band expected, got $b")
  }

  test("overlap join emits multi-band pairs exactly once, any band width") {
    for (b <- Seq(3L, 7L, 64L, 100000L)) {
      val got = RangeJoin.bandedOverlapJoin(lefts, "lf", "lt", rights,
          "rf", "rt", b)
        .groupBy("lid", "rid").count()
      assert(got.filter(col("count") > 1).count() == 0,
        s"band width $b produced duplicate pairs")
      assert(overlaps(b) == expectedOverlaps, s"band width $b wrong set")
    }
  }
}
