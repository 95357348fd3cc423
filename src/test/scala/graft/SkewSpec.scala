package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpecBase {

  test("salted join is semantically identical to the plain equi-join") {
    val li = Tables(spark, sf0001, "lineitem")
    val o = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("l_orderkey").count()
      .orderBy("l_orderkey").collect()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", factor = 8)
      .groupBy("l_orderkey").count()
      .orderBy("l_orderkey").collect()
    assert(plain.sameElements(salted))
  }

  test("keySkewProfile: counts, integer shares, tie-break determinism, top-k plan") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++
      Seq.fill(3)("also-warm") ++ Seq("cold")).toDF("k")
    val got = Skew.keySkewProfile(df, "k", 3)
      .select("k", "cnt", "share_bp", "total_rows")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    // 13 rows: hot 6 (4615 bp), the two 3-count keys tie -> key order
    assert(got == List(("hot", 6L, 4615L, 13L),
      ("also-warm", 3L, 2307L, 13L), ("warm", 3L, 2307L, 13L)))
    // top-k must be TakeOrdered (k rows per partition), not a global sort
    val plan = Skew.keySkewProfile(df, "k", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"),
      s"expected TakeOrderedAndProject, got:\n$plan")
  }

  test("salted two-phase sum equals the direct aggregation") {
    val li = Tables(spark, sf0001, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("s"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", factor = 8)
      .select(col("l_returnflag"), round(col("sum_l_quantity"), 4).as("s"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(direct.sameElements(salted))
  }
}
