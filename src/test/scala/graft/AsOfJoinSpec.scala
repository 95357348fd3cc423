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
