package graft

class QueriesSpec extends SparkSpecBase {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q35 two-phase percentile equals the naive window form, and only " +
      "windows the bracketed buckets") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, sf0001, "lineitem")
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = Window.partitionBy(col("l_returnflag"))
    val want = li.select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("rn") === ceil(col("n") * 0.5), col("l_extendedprice")))
          .as("p50"),
        max(when(col("rn") === ceil(col("n") * 0.95), col("l_extendedprice")))
          .as("p95"),
        max(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSet
    val df = queries.Analytics.q35Percentile(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
    // scale contract: every Window sorts only bracketed-bucket survivors —
    // its input must be the join against the target-bucket table, so no
    // full-stratum sort exists anywhere in the plan (logical plan checked
    // structurally; AQE query stages hide physical subtrees from collect)
    import org.apache.spark.sql.catalyst.plans.logical
    val windows = df.queryExecution.optimizedPlan.collect {
      case x: logical.Window => x }
    assert(windows.nonEmpty)
    windows.foreach { x =>
      assert(x.child.collect { case j: logical.Join => j }.nonEmpty,
        "Window input is not bucket-filtered:\n" + x.treeString.take(800))
    }
    val ps = df.queryExecution.executedPlan.toString
    assert(ps.contains("BroadcastHashJoin"), ps.take(800))
  }

  test("q65 bounded-heap group top-k equals the window form, with no " +
      "Window or full sort in the plan") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, sf0001, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = o.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val df = queries.Analytics.q65GroupTopK(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    // scale contract: the heap aggregate replaces the per-group sort —
    // no Window anywhere, and the aggregate has a map-side partial
    val ps = df.queryExecution.executedPlan.toString
    assert(!ps.contains("Window"), ps.take(800))
    assert(ps.contains("ObjectHashAggregate"), ps.take(800))
    assert(ps.contains("partial_top_k_by_score"), ps.take(800))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a stable schema") {
      val df = fn(spark, sf0001)
      val n = df.count()
      // empty is legal for selective predicates, but schema must be sane
      assert(df.columns.nonEmpty && df.columns.distinct.length == df.columns.length)
      // deterministic: running twice gives identical results
      val again = fn(spark, sf0001).collect()
      assert(df.collect().sameElements(again), s"$name not deterministic")
      assert(n >= 0)
    }
  }
}
