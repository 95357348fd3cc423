package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.RankBands

/** RankBands: the exact two-phase ntile replacement must be
  * bit-identical to the window form on every group shape — skewed
  * sizes, heavy score ties, groups smaller than k — and the rewritten
  * q170/q174 plans must carry no per-language ntile sort. */
class RankBandsSpec extends SparkSpecBase {

  private def fixture(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("g", "score", "id")
  }

  /** Deterministic varied corpus: group sizes 1..40, scores with heavy
    * ties (mod 7 collapses most values), negative scores (the
    * logprob domain), ids unique per group. */
  private def varied: Seq[(String, Long, Long)] =
    (0 until 8).flatMap { gi =>
      val n = Seq(1, 2, 3, 5, 7, 13, 29, 40)(gi)
      (0 until n).map { i =>
        (s"g$gi", -((i * 31 + gi * 17) % 7).toLong * 100, i.toLong)
      }
    }

  private def ntileExpected(rows: Seq[(String, Long, Long)], k: Int) = {
    val df = fixture(rows)
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("nt", ntile(k).over(w))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3))
      .toMap
  }

  private def bandsGot(rows: Seq[(String, Long, Long)], k: Int,
      coarse: Long) = {
    RankBands.ntileOf(fixture(rows), k, "g", "score", "id", "nt",
        coarse = coarse)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3))
      .toMap
  }

  test("ntileOf equals ntile(k) on skewed groups with heavy ties, " +
      "across k and bucket widths") {
    for (k <- Seq(2, 3, 5); coarse <- Seq(1L, 50L, 1000000L)) {
      val got = bandsGot(varied, k, coarse)
      val exp = ntileExpected(varied, k)
      assert(got == exp, s"k=$k coarse=$coarse")
    }
  }

  test("groups smaller than k follow ntile's deal (row i -> band i)") {
    val rows = Seq(("a", 5L, 1L), ("a", 9L, 2L), ("b", 1L, 1L))
    val got = bandsGot(rows, 3, 10L)
    // a: score desc -> id2 (9) band 1, id1 (5) band 2; b: single row band 1
    assert(got == Map(("a", 2L) -> 1, ("a", 1L) -> 2, ("b", 1L) -> 1))
  }

  test("k=1 short-circuits to a single band") {
    val got = bandsGot(Seq(("a", 5L, 1L), ("b", 3L, 2L)), 1, 10L)
    assert(got.values.toSet == Set(1))
  }

  test("all-equal scores split purely by the id tiebreak") {
    val rows = (1L to 9L).map(i => ("a", 0L, i))
    val got = bandsGot(rows, 3, 1000L)
    assert(got == ntileExpected(rows, 3))
    assert((1L to 3L).forall(got("a", _) == 1))
    assert((7L to 9L).forall(got("a", _) == 3))
  }

  test("contract refusals: NULL groups (k = 1 AND k >= 2) and " +
      "mistyped columns fail loudly, not silently") {
    import spark.implicits._
    val withNull = Seq((Option("a"), 5L, 1L), (Option.empty[String], 3L, 2L))
      .toDF("g", "score", "id")
    for (k <- Seq(1, 3)) {
      val e = intercept[IllegalArgumentException] {
        RankBands.ntileOf(withNull, k, "g", "score", "id", "nt").collect()
      }
      assert(e.getMessage.contains("NULL"), s"k=$k: ${e.getMessage}")
    }
    val intScore = Seq(("a", 5, 1L)).toDF("g", "score", "id")
    val e2 = intercept[IllegalArgumentException] {
      RankBands.ntileOf(intScore, 3, "g", "score", "id", "nt")
    }
    assert(e2.getMessage.contains("BIGINT"))
    val intGroup = Seq((7, 5L, 1L)).toDF("g", "score", "id")
    val e3 = intercept[IllegalArgumentException] {
      RankBands.ntileOf(intGroup, 3, "g", "score", "id", "nt")
    }
    assert(e3.getMessage.contains("STRING"))
  }

  test("histCap guard: a score domain too fine for `coarse` fails " +
      "loudly instead of collecting an unbounded histogram") {
    // 50 distinct buckets at coarse=1 (scores 0..-49); histCap=10 must
    // refuse, and the message must name the remedy
    val rows = (0 until 50).map(i => ("a", -i.toLong, i.toLong))
    val e = intercept[IllegalArgumentException] {
      RankBands.ntileOf(fixture(rows), 3, "g", "score", "id", "nt",
        coarse = 1L, histCap = 10).collect()
    }
    assert(e.getMessage.contains("histCap"))
    assert(e.getMessage.contains("coarse"))
    // same data passes untouched once coarse absorbs the domain
    val got = RankBands.ntileOf(fixture(rows), 3, "g", "score", "id",
        "nt", coarse = 1L, histCap = 50)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3))
      .toMap
    assert(got == ntileExpected(rows, 3))
  }

  test("q170/q174 final plans carry no ntile window (the per-language " +
      "single-reducer sort is gone); the remaining window brackets " +
      "only the boundary buckets") {
    // parquet source, not a LocalRelation (constant-folding gotcha);
    // RankBands' phase-1/2 collects run at construction, so the
    // executed plan below is the assignment + rollup — the part that
    // scales with the corpus.
    val p170 = graft.ext.Warc.ccnetBuckets(spark, sf0001)
      .queryExecution.executedPlan.toString.toLowerCase
    val p174 = graft.ext.Warc.ccnetLangBuckets(spark, sf0001)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!p170.contains("ntile") && !p174.contains("ntile"))
    assert(!p170.contains("windowspecdefinition") &&
      !p174.contains("windowspecdefinition"),
      "corpus-scaling side must hold no window at all")
  }
}
