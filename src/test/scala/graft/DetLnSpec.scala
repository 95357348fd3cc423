package graft

import org.apache.spark.sql.functions._
import graft.functions.DetLn

/** Cross-engine determinism evidence for [[graft.functions.DetLn]]: the
  * golden doubles below were produced by an INDEPENDENT DuckDB run of
  * the same SQL fragments (tools/check_oracle.py's engine), captured at
  * full round-trip precision. Several differ from `Math.log` in the
  * last ulp (e.g. lnFix(2) = 0.6931471805599455 vs Math.log(2) =
  * 0.6931471805599453) — Spark matching the DuckDB bits exactly is the
  * point: the formula is engine-invariant where libm `ln` is not. */
class DetLnSpec extends SparkSpecBase {

  // (x, DuckDB-produced lnFix(x), bits must match exactly)
  private val goldens: Seq[(Long, Double)] = Seq(
    1L -> 0.0,
    2L -> 0.6931471805599455,
    3L -> 1.09861228866811,
    7L -> 1.9459101490553135,
    9L -> 2.1972245773362173,
    10L -> 2.302585092994046,
    11L -> 2.3978952727983707,
    99L -> 4.595119850134586,
    100L -> 4.605170185988092,
    12345L -> 9.42100640177928,
    5000000L -> 15.424948470398377,
    999999937L -> 20.72326577394641,
    Long.MaxValue -> 43.66827237527656)

  test("lnFix matches DuckDB bit-for-bit across the BIGINT range") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(goldens.map(g => org.apache.spark.sql.Row(g._1)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
    val got = DetLn.withLnFix(df, "lnv", "v")
      .select(col("v"), col("lnv")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((x, want) <- goldens) {
      val g = got(x)
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(want),
        s"lnFix($x): spark=$g duckdb=$want (bit mismatch)")
    }
  }

  test("lnFix tracks true ln to well under the 1e-6 quantum") {
    for ((x, want) <- goldens if x > 1)
      assert(math.abs(want - math.log(x.toDouble)) < 1e-13)
  }

  test("constant-folded (literal) lnFix equals the column form") {
    // scalar denominators are inlined as literals on the Spark side and
    // folded by Catalyst; the fold must agree with runtime evaluation
    val t = DetLn.tSql(s"(${DetLn.rSql(DetLn.mSql("5000000"))})")
    val lit5m = spark.range(1).select(
      expr(DetLn.lnSql(s"($t)", s"(($t) * ($t))", DetLn.eSql("5000000")))
        .as("l")).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(lit5m) ==
      java.lang.Double.doubleToLongBits(15.424948470398377))
  }
}
