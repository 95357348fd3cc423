package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampType}

/** Data-profiling pass (Deequ-style): per-column null count, exact
  * distinct count, and min/max, computed for every column of a table in
  * ONE aggregate job and returned as one row per column — the profile
  * report a pipeline runs before trusting a new source, generalizing the
  * reference's schema set-difference checks (F1/F2, cf. reference
  * verify_schema) from "are the columns there" to "what is in them".
  *
  * Scale: a single groupBy().agg() over the table — partial aggregation
  * everywhere, output is column-count-sized. The exact distinct counts
  * make Spark plan one Expand (one stream per distinct column), so the
  * scan is replayed k ways; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (HLL++, one stream, mergeable) — the report
  * shape is unchanged. Min/max export as strings so heterogeneous column
  * types fit one report schema; doubles go through DECIMAL(18,2) and
  * timestamps through a fixed format so the rendering is engine-portable.
  */
object Profile {

  private def fmt(c: Column, dt: DataType): Column = dt match {
    case DoubleType => c.cast("decimal(18,2)").cast("string")
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Profile every column of `df`: (column_name, null_count,
    * distinct_count, min_value, max_value), ordered by column name.
    * `approxDistinct = true` is the corpus-scale mode the Scale note
    * describes: `approx_count_distinct` (HLL++, rsd 1%) replaces the
    * exact count, collapsing the k-way Expand into one stream — the
    * report schema is identical, the counts are ±rsd (equivalence
    * gated in ProfileFunnelSpec). */
  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: fields.toSeq.flatMap {
      f =>
        val c = col(f.name)
        val nd = if (approxDistinct) approx_count_distinct(c, 0.01)
          else countDistinct(c)
        Seq(count(c).as(s"nn_${f.name}"),
          nd.as(s"nd_${f.name}"),
          fmt(min(c), f.dataType).as(s"mn_${f.name}"),
          fmt(max(c), f.dataType).as(s"mx_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        (col("_n") - col(s"nn_${f.name}")).as("null_count"),
        col(s"nd_${f.name}").as("distinct_count"),
        col(s"mn_${f.name}").as("min_value"),
        col(s"mx_${f.name}").as("max_value"))
    }
    row.select(explode(array(entries.toSeq: _*)).as("e"))
      .select(col("e.*"))
      .orderBy(col("column_name"))
  }

  /** DuckDB oracle for profiling the `orders` table — one UNION ALL arm
    * per column, mirroring [[fmt]]'s type-specific rendering. */
  val ordersProfileOracle: String = {
    def arm(name: String, mn: String, mx: String) =
      s"""SELECT '$name' AS column_name,
          CAST(count(*) - count($name) AS BIGINT) AS null_count,
          CAST(count(DISTINCT $name) AS BIGINT) AS distinct_count,
          $mn AS min_value, $mx AS max_value FROM orders"""
    def plain(name: String) =
      arm(name, s"CAST(min($name) AS VARCHAR)", s"CAST(max($name) AS VARCHAR)")
    def dbl(name: String) =
      arm(name, s"CAST(CAST(min($name) AS DECIMAL(18,2)) AS VARCHAR)",
        s"CAST(CAST(max($name) AS DECIMAL(18,2)) AS VARCHAR)")
    def ts(name: String) =
      arm(name, s"strftime(min($name), '%Y-%m-%d %H:%M:%S')",
        s"strftime(max($name), '%Y-%m-%d %H:%M:%S')")
    Seq(plain("o_orderkey"), plain("o_custkey"), plain("o_orderstatus"),
      dbl("o_totalprice"), ts("o_orderdate"), plain("o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
