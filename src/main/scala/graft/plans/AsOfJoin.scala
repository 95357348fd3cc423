package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of join — the temporal operator Spark's Scala API lacks (it exists
  * only in the pandas-on-Spark layer): for each left row, attach the
  * latest right row with `right.ts <= left.ts`, matched on equi-keys,
  * optionally within a tolerance.
  *
  * Implementation is composition-level (preference (a) of the custom-
  * operator ladder): tag both sides, UNION, and run one
  * `last(_, ignoreNulls)` window per key ordered by (ts, side) — right
  * rows sort before left rows at equal timestamps, giving `<=`
  * semantics. Cost: a single hash-partition shuffle on the key + a
  * per-key sort — the same shape as a sort-merge join, with no range
  * explosion; this scales to fact-sized both sides (state is one
  * carried struct per partition-sort position, not a buffered range).
  */
object AsOfJoin {

  /** @param tolerance max allowed (leftTs - rightTs) in seconds; None =
    *                  unbounded look-back. */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftStruct = left.schema.fields
      .foldLeft(new StructType())((s, f) => s.add(f))
    val rightStruct = right.schema.fields
      .foldLeft(new StructType())((s, f) => s.add(f))

    val l = left
      .withColumn("_l", struct(left.columns.map(col): _*))
      .select(on.map(col) ++ Seq(col(leftTs).as("_ts"), col("_l"),
        lit(null).cast(rightStruct).as("_r"), lit(1).as("_side")): _*)
    // SQL join semantics: NULL keys never match — drop null-keyed right
    // rows so a null-keyed left partition contains no right rows at all.
    // Same for NULL right timestamps (`r.ts <= l.ts` is never true under
    // three-valued logic): without the filter they sort NULLS FIRST into
    // the window and a null-ts left row would "match" them. A null-ts
    // left row then sorts before every surviving right row and matches
    // nothing — agreeing with [[AsOfJoinExec]] and DuckDB ASOF.
    val r = on.foldLeft(right.filter(col(rightTs).isNotNull))(
        (d, k) => d.filter(col(k).isNotNull))
      .withColumn("_r", struct(right.columns.map(col): _*))
      .select(on.map(col) ++ Seq(col(rightTs).as("_ts"),
        lit(null).cast(leftStruct).as("_l"), col("_r"),
        lit(0).as("_side")): _*)

    val unioned = l.unionByName(r)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .withColumn("_asof_ts", last(
        when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("_asof",
        when(col("_asof_ts").isNotNull &&
          unix_timestamp(col("_ts")) - unix_timestamp(col("_asof_ts")) <= tol,
          col("_asof")))
      case None => matched
    }

    val leftCols = left.columns.map(c => col("_l").getField(c).as(c))
    val rightCols = right.columns.map(c =>
      col("_asof").getField(c).as(s"asof_$c"))
    bounded.select(leftCols ++ rightCols: _*)
  }

  /** Query surface: for each purchase event, the user's most recent
    * signup at-or-before it (epoch-second outputs, ns-safe). */
  def q41AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"), col("user_id"), col("ts"))
    asofJoin(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(
        col("event_id"),
        col("user_id"),
        unix_timestamp(col("ts")).as("purchase_epoch"),
        col("asof_signup_event_id").as("signup_event_id"),
        unix_timestamp(col("asof_ts")).as("signup_epoch"))
      .orderBy(col("event_id"))
  }

  /** Same query through the custom LogicalPlan/Strategy/Exec path
    * ([[AsOfJoinExecApi.asofJoinExec]]) — oracled independently. */
  def q46AsofExec(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"), col("user_id"), col("ts"))
    AsOfJoinExecApi.asofJoinExec(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(
        col("event_id"),
        col("user_id"),
        unix_timestamp(col("ts")).as("purchase_epoch"),
        col("asof_signup_event_id").as("signup_event_id"),
        unix_timestamp(col("asof_ts")).as("signup_epoch"))
      .orderBy(col("event_id"))
  }

  val q41Oracle: String =
    """SELECT l.event_id, l.user_id,
       CAST(floor(epoch(l.ts)) AS BIGINT) AS purchase_epoch,
       r.event_id AS signup_event_id,
       CAST(floor(epoch(r.ts)) AS BIGINT) AS signup_epoch
       FROM (SELECT * FROM events WHERE event_type = 'purchase') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
         ON l.user_id = r.user_id AND r.ts <= l.ts
       ORDER BY l.event_id"""
}
