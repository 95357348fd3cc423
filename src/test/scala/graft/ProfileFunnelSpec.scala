package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Profile
import graft.queries.Analytics

/** Value-level gates for the round-6 analytics operators, beyond the
  * DuckDB oracles (which run on tables without nulls or edge timings). */
class ProfileFunnelSpec extends SparkSpecBase {

  test("burst dedup keeps gap-starts only (rolling 600s rule)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // same rule as q100, on a hand-checked stream: gaps of 601 open
    // bursts, chained 600-gaps extend one burst even past 600 total
    val e = Seq(
      (1L, "c", 10L, 1000L), (1L, "c", 11L, 1500L),  // same burst
      (1L, "c", 12L, 2101L),                         // gap 601 -> new burst
      (1L, "c", 13L, 2701L), (1L, "c", 14L, 3301L),  // rolling: both kept? gaps=600 -> extend
      (2L, "c", 20L, 1000L)                          // other stream
    ).toDF("user_id", "event_type", "event_id", "epoch_s")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("epoch_s"), col("event_id"))
    val gap = col("epoch_s") - lag(col("epoch_s"), 1).over(w)
    val kept = e.withColumn("kept",
        when(gap.isNull || gap > 600, lit(1)).otherwise(lit(0)))
      .filter(col("kept") === 1).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L, 20L))
  }

  test("approx profile: same schema, no Expand, distincts within HLL error") {
    import org.apache.spark.sql.functions.col
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val exact = graft.ops.Profile.profile(orders)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val approxDf = graft.ops.Profile.profile(orders, approxDistinct = true)
    val approx = approxDf
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(2L, (n * 0.05).toLong),
        s"column $c: approx ${approx(c)} vs exact $n")
    }
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "approx mode must not replay the scan per distinct column")
  }

  test("association rules: hand-checked support, confidence and lift") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 baskets: x,y together in 6; x alone in 2; y alone in 1; z in 1
    val baskets =
      (1 to 6).flatMap(o => Seq((o.toLong, 10L), (o.toLong, 20L))) ++
        Seq((7L, 10L), (8L, 10L), (9L, 20L), (10L, 30L))
    val os = baskets.toDF("l_orderkey", "l_suppkey")
    // same pipeline as q108, min-support 1 for the fixture
    val n = 10.0
    val singles = os.groupBy("l_suppkey").agg(count(lit(1)).as("c1"))
    val pairs = os.select(col("l_orderkey"), col("l_suppkey").as("a"))
      .join(os.select(col("l_orderkey"), col("l_suppkey").as("b")),
        "l_orderkey")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s"))
    val got = pairs
      .join(singles.select(col("l_suppkey").as("a"), col("c1").as("ca")), "a")
      .join(singles.select(col("l_suppkey").as("b"), col("c1").as("cb")), "b")
      .select(col("a"), col("b"), col("s"),
        round(col("s").cast("double") / col("ca"), 6).as("conf"),
        round(col("s").cast("double") * n / (col("ca") * col("cb")), 6)
          .as("lift"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // support(x,y)=6; conf(x->y)=6/8=0.75; lift=6*10/(8*7)=1.071429
    assert(got((10L, 20L)) == ((6L, 0.75, 1.071429)))
    // asymmetry: conf(y->x)=6/7
    assert(got((20L, 10L)) == ((6L, 0.857143, 1.071429)))
  }

  test("profile counts nulls/distincts and renders min/max per type") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(1.25)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "s", "d")
    val rows = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    assert(rows("id") == ((0L, 4L, "1", "4")))
    assert(rows("s") == ((1L, 2L, "a", "b")))
    // doubles render through DECIMAL(18,2)
    assert(rows("d") == ((1L, 2L, "1.25", "2.50")))
  }

  test("funnel honors step order and the 1-day conversion window") {
    import spark.implicits._
    def ts(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    val events = Seq(
      // user 1: full conversion inside windows
      (1L, "view", ts(1, 0)), (1L, "click", ts(1, 5)),
      (1L, "purchase", ts(1, 9)),
      // user 2: click BEFORE first view — not a conversion
      (2L, "click", ts(1, 0)), (2L, "view", ts(1, 5)),
      (2L, "purchase", ts(1, 9)),
      // user 3: click more than 1 day after view — window expired
      (3L, "view", ts(1, 0)), (3L, "click", ts(3, 0)),
      // user 4: view+click, purchase window expired
      (4L, "view", ts(1, 0)), (4L, "click", ts(1, 1)),
      (4L, "purchase", ts(4, 0))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.q85FunnelOf(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("integer z-test equals the float z-score rule on random counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 20 users x 30 days of skewed counts, expanded to one row per event
    val daily = for {
      u <- 1 to 20; d <- 1 to 30
      cnt = 1 + rnd.nextInt(5) + (if (rnd.nextInt(20) == 0) 25 else 0)
    } yield (u.toLong, d, cnt)
    val events = daily.flatMap { case (u, d, cnt) =>
      (1 to cnt).map(i =>
        (u, Timestamp.valueOf(f"2024-03-$d%02d 00:${i % 60}%02d:00")))
    }.toDF("user_id", "ts")
    val got = Analytics.q86AnomalyOf(events, z = 2, minDays = 5).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // float reference: sample stddev, strict > comparison
    // (.toSeq first: flatMap on the Map would collapse to one row per user)
    val want = daily.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val cs = rows.map(_._3.toDouble)
      val n = cs.length
      val mean = cs.sum / n
      val sd = math.sqrt(cs.map(c => (c - mean) * (c - mean)).sum / (n - 1))
      rows.filter(r => r._3 - mean > 2 * sd)
        .map(r => (u, f"2024-03-${r._2}%02d"))
    }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("profile drift reports exact deltas and min/max change flags") {
    import spark.implicits._
    val before = Seq((1L, Option("a")), (2L, Option("b")),
      (3L, Option.empty[String])).toDF("k", "v")
    // re-delivery: row 3 dropped (one fewer null), new max key appears
    val after = Seq((1L, Option("a")), (2L, Option("b")),
      (9L, Option("b"))).toDF("k", "v")
    val got = Profile.drift(before, after).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("null_delta"), r.getAs[Long]("distinct_delta"),
          r.getAs[Boolean]("min_changed"), r.getAs[Boolean]("max_changed"))))
      .toMap
    assert(got("k") == ((0L, 0L, false, true)))  // max 3 -> 9
    assert(got("v") == ((-1L, 0L, false, false))) // null dropped
  }

  test("driftWhere equals drift(df, df.filter(pred)) in one scan") {
    import spark.implicits._
    val df = Seq((1L, Option("a"), 5.0), (2L, Option("b"), 50.0),
      (3L, Option.empty[String], 500.0), (4L, Option("a"), 5000.0))
      .toDF("k", "v", "x")
    val pred = col("x") > 100.0
    val fused = Profile.driftWhere(df, pred).collect().map(_.toString)
    val twoPass = Profile.drift(df, df.filter(pred)).collect()
      .map(_.toString)
    assert(fused.toSeq == twoPass.toSeq)
  }
}
