package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsOfJoin, AsOfJoinExecApi}

class AsOfJoinSpec extends SparkSpecBase {

  private def purchases = Tables(spark, sf0001, "events")
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), col("ts"))
  private def signups = Tables(spark, sf0001, "events")
    .filter(col("event_type") === "signup")
    .select(col("event_id").as("signup_id"), col("user_id"), col("ts"))

  test("custom AsOfJoinExec matches the composed union+window as-of join") {
    val composed = AsOfJoin.asofJoin(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_signup_id"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val exec = AsOfJoinExecApi.asofJoinExec(
      purchases, signups, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_signup_id"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(exec.nonEmpty)
    assert(composed.sameElements(exec))
  }

  test("physical plan is the custom exec with sort-merge shape (no Window)") {
    val df = AsOfJoinExecApi.asofJoinExec(
      purchases, signups, Seq("user_id"), "ts", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500))
    assert(!plan.contains("Window"), "unexpected window in custom exec plan")
  }

  test("NULL keys never match in either variant (SQL join semantics)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val l = Seq((1L, Option(7L), ts(10)), (2L, None: Option[Long], ts(10)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((100L, Option(7L), ts(5)), (200L, None: Option[Long], ts(5)))
      .toDF("signup_id", "user_id", "ts")
    def matches(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "asof_signup_id").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    val composed = matches(
      AsOfJoin.asofJoin(l, r, Seq("user_id"), "ts", "ts"))
    val exec = matches(
      AsOfJoinExecApi.asofJoinExec(l, r, Seq("user_id"), "ts", "ts"))
    assert(composed == Map(1L -> 100L, 2L -> -1L), s"composed: $composed")
    assert(exec == Map(1L -> 100L, 2L -> -1L), s"exec: $exec")
  }

  test("NULL timestamps: both variants agree (null left ts no match; null right ts discarded)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val l = Seq(
      (1L, 7L, Option(ts(10))),
      (2L, 7L, None: Option[Timestamp]), // null left ts: must match nothing
      (3L, 8L, Option(ts(10))))
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (100L, 7L, Option(ts(5))),
      (200L, 7L, None: Option[Timestamp]), // null right ts: never a match
      (300L, 8L, None: Option[Timestamp]))
      .toDF("signup_id", "user_id", "ts")
    def matches(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "asof_signup_id").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    val expected = Map(1L -> 100L, 2L -> -1L, 3L -> -1L)
    val composed = matches(
      AsOfJoin.asofJoin(l, r, Seq("user_id"), "ts", "ts"))
    val exec = matches(
      AsOfJoinExecApi.asofJoinExec(l, r, Seq("user_id"), "ts", "ts"))
    assert(composed == expected, s"composed: $composed")
    assert(exec == expected, s"exec: $exec")
  }

  test("tolerance bounds the look-back in the composed variant") {
    val bounded = AsOfJoin.asofJoin(purchases, signups, Seq("user_id"),
      "ts", "ts", tolerance = Some(60L))
    val loose = AsOfJoin.asofJoin(purchases, signups, Seq("user_id"),
      "ts", "ts", tolerance = None)
    val nBounded = bounded.filter(col("asof_signup_id").isNotNull).count()
    val nLoose = loose.filter(col("asof_signup_id").isNotNull).count()
    assert(nBounded <= nLoose)
  }
}
