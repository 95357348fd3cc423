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
