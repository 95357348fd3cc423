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

  test("q74 resample: dense grid, gap days carry 0 events and the last " +
      "observed max forward") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: events on day 1 and day 4 (gap 2-3); user 2: one day only
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", 5.0),
      (1L, "2024-03-01 11:00:00", 7.0),
      (1L, "2024-03-04 09:00:00", 2.0),
      (2L, "2024-03-02 08:00:00", 9.0)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("value"))
    val got = queries.Analytics.q74ResampleOf(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(got == List(
      (1L, "2024-03-01", 2L, 7.0),  // two events, day max 7
      (1L, "2024-03-02", 0L, 7.0),  // gap: filled, carries 7 forward
      (1L, "2024-03-03", 0L, 7.0),
      (1L, "2024-03-04", 1L, 2.0),  // fresh observation resets the fill
      (2L, "2024-03-02", 1L, 9.0))) // single-day user: 1-row grid
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
