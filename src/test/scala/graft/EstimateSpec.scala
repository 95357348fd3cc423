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
}
