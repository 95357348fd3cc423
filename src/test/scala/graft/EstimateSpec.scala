package graft

import org.apache.spark.sql.functions._
import graft.ops.Estimate

/** Gates for the join-size tools (ops/Estimate.scala): the count-based
  * computation must EQUAL the materialized join's count; the correlated
  * sampler must be deterministic, exact at fraction 1, and within a
  * reasonable band at realistic fractions on the TPC-H join. */
class EstimateSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("exactEquiJoinRows equals the materialized join count; null keys excluded") {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val real = li.join(o, "l_orderkey").count()
    assert(Estimate.exactEquiJoinRows(li, o, "l_orderkey") == real)
    // null keys on either side must not contribute
    val withNulls = Seq(Some(1L), None, Some(1L)).toDF("k")
    val other = Seq(Some(1L), None).toDF("k")
    assert(Estimate.exactEquiJoinRows(withNulls, other, "k") == 2L)
    // disjoint keys -> 0, not a null sum
    val disjoint = Seq(Some(99L)).toDF("k")
    assert(Estimate.exactEquiJoinRows(withNulls, disjoint, "k") == 0L)
  }

  test("sampled estimate: deterministic, exact at fraction 1, bounded error at 0.2") {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val real = Estimate.exactEquiJoinRows(li, o, "l_orderkey")
    assert(Estimate.estimateEquiJoinRows(li, o, "l_orderkey", 1.0) == real)
    val e1 = Estimate.estimateEquiJoinRows(li, o, "l_orderkey", 0.2)
    val e2 = Estimate.estimateEquiJoinRows(li, o, "l_orderkey", 0.2)
    assert(e1 == e2, "hash-based sampling must be run-deterministic")
    // ~1500 sampled keys of a near-uniform per-key multiplicity: the
    // estimator should land well within ±30% (it is unbiased; spread
    // at this key count is a few percent)
    assert(math.abs(e1 - real).toDouble / real < 0.3,
      s"estimate $e1 vs real $real drifted past 30%")
  }

  test("skew-aware estimate nails a whale-dominated join where plain sampling can miss it") {
    import spark.implicits._
    // one whale key carries ~99% of the join product; 200 tail keys
    val leftRows = Seq.tabulate(2000)(i => 0L) ++       // whale: 2000 rows
      Seq.tabulate(200)(i => (i % 200 + 1).toLong)      // tail: 1 row each
    val rightRows = Seq.tabulate(500)(i => 0L) ++
      Seq.tabulate(400)(i => (i % 200 + 1).toLong)
    val l = leftRows.toDF("k")
    val r = rightRows.toDF("k")
    val real = Estimate.exactEquiJoinRows(l, r, "k") // 2000*500 + 200*2
    assert(real == 2000L * 500 + 200 * 2)
    val aware = Estimate.estimateEquiJoinRowsSkewAware(l, r, "k",
      fraction = 0.1, hotK = 4)
    // whale counted exactly; only the 400-row tail product is sampled,
    // so the estimate cannot be off by more than the tail's total
    assert(math.abs(aware - real) <= 400,
      s"skew-aware $aware vs real $real")
  }
}
