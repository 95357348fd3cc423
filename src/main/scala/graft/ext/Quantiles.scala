package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{DetMix, HashSample}

/** Per-group quantiles, exact and sketched — the order-statistic member
  * of the sketch family (Misra–Gries q76, KMV q67, HLL q116, Count–Min
  * q117): data profiling, length-bucket boundaries for batching, and
  * outlier thresholds all start with "the p95 of this column per group".
  *
  * Two operators with one contract, the q31/q70 twin idiom inverted —
  * BOTH are DuckDB-oracled because both are integer-rank DISCRETE
  * quantiles (they pick an existing value; no interpolation arithmetic
  * to drift between engines):
  *
  *   - [[exactQuantiles]] (q140): rank = ⌈q·n⌉ via pure integer
  *     arithmetic ((num·n + den − 1) div den) over a per-group sort.
  *     Exact, but the sort is a full shuffle of every row — the thing
  *     that does NOT survive 100 TB.
  *   - [[sketchQuantiles]] (q141): the same ranks over a
  *     [[graft.functions.HashSample]] uniform k-sample — ONE pass, O(k)
  *     state per group per partition, map-side mergeable, no sort of
  *     the data (only the k-array is sorted). DKW gives rank error
  *     O(√(ln(1/δ)/k)); k=256 holds every estimate within a few
  *     percentile points (spec-gated against the exact answer, and
  *     EXACTLY equal wherever the group fits inside k).
  *
  * The sample is deterministic — the draw is [[DetMix]] of the row's
  * unique key — so the oracle replays selection (`row_number() OVER
  * (ORDER BY h, key) <= k`) and rank arithmetic verbatim.
  */
object Quantiles {

  /** Sample size for the registered q141. */
  val K = 256

  /** DetMix seed for the q141 draw. */
  val Seed = 41L

  private val QuantileSpec = Seq(("p25", 1, 4), ("p50", 1, 2),
    ("p75", 3, 4), ("p95", 19, 20))

  /** Exact discrete per-group quantiles of `v` (any orderable numeric)
    * keyed by unique row id `k`: one window sort per group, then the
    * value at integer rank ⌈q·n⌉ for each requested (num, den). */
  def exactQuantilesOf(df: DataFrame, grp: String, v: String,
      key: String): DataFrame = {
    val ranked = df
      .withColumn("_rn",
        row_number().over(Window.partitionBy(grp).orderBy(col(v), col(key))))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(grp)))
    val picks = QuantileSpec.map { case (name, num, den) =>
      max(when(col("_rn") ===
        expr(s"(_n * $num + ${den - 1}) div $den"), col(v))).as(name)
    }
    ranked.groupBy(col(grp).as("grp"))
      .agg(max(col("_n")).as("n"), picks: _*)
  }

  /** q140: exact quarter + p95 order totals per order priority. The
    * per-group sort IS the point of comparison with q141 — exact twin,
    * does not scale. ORDER BY = oracle determinism only. */
  def exactQuantiles(spark: SparkSession, dir: String): DataFrame =
    exactQuantilesOf(
      Tables(spark, dir, "orders").select(
        col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      "o_orderpriority", "o_totalprice", "o_orderkey")
      .orderBy(col("grp"))

  /** Sketched discrete per-group quantiles: one [[HashSample]] pass,
    * ranks computed over the sorted k-sample. `hash` must be a
    * deterministic per-row draw; `key` a unique row id. */
  def sketchQuantilesOf(df: DataFrame, grp: String, hash: Column,
      v: String, key: String, k: Int = K): DataFrame = {
    // _m = 0 guard: a group whose every value/hash/key is null yields an
    // EMPTY sample array, and element_at(arr, 0) is a runtime error in
    // Spark ("array index starts at 1") — degrade to null estimates
    val picks = QuantileSpec.map { case (name, num, den) =>
      when(col("_m") > 0, element_at(col("_sample"),
        expr(s"CAST((_m * $num + ${den - 1}) div $den AS INT)")))
        .as(s"${name}_est")
    }
    df.groupBy(col(grp).as("grp"))
      .agg(count(lit(1)).as("n"),
        array_sort(HashSample.hash_sample(hash, col(key), col(v), k))
          .as("_sample"))
      .withColumn("_m", size(col("_sample")))
      .select(col("grp") +: col("n") +: col("_m").as("m") +: picks: _*)
  }

  /** q141: the same statistic as q140 from the bounded sketch — the
    * 100 TB path. ORDER BY = oracle determinism only. */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame =
    sketchQuantilesOf(
      Tables(spark, dir, "orders").select(
        col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      "o_orderpriority",
      expr(DetMix.mixSql("o_orderkey", Seed)),
      "o_totalprice", "o_orderkey")
      .orderBy(col("grp"))

  /** Shared by the q141 and q151 oracles. */
  private[ext] def pickSql(rn: String, n: String, v: String,
      suffix: String): String =
    QuantileSpec.map { case (name, num, den) =>
      s"max(CASE WHEN $rn = ($n * $num + ${den - 1}) // $den THEN $v END) AS $name$suffix"
    }.mkString(",\n           ")

  /** Oracle for q140 [[exactQuantiles]]. */
  val exactQuantilesOracle: String =
    s"""WITH r AS (SELECT o_orderpriority AS grp, o_totalprice AS v,
           row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
         FROM orders)
       SELECT grp, CAST(max(n) AS BIGINT) AS n,
           ${pickSql("rn", "n", "v", "")}
       FROM r GROUP BY grp ORDER BY grp"""

  /** Oracle for q141 [[sketchQuantiles]] — replays the DetMix draw, the
    * k-smallest selection, and the rank arithmetic. */
  val sketchQuantilesOracle: String =
    s"""WITH b AS (SELECT o_orderpriority AS grp, o_totalprice AS v,
           o_orderkey AS k,
           ${DetMix.mixSql("o_orderkey", Seed)} AS h
         FROM orders),
       cnt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
         FROM b GROUP BY grp),
       sel AS (SELECT grp, v FROM (SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY h, k) AS hr
           FROM b) WHERE hr <= $K),
       r AS (SELECT grp, v,
           row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY grp) AS m
         FROM sel),
       e AS (SELECT grp, CAST(max(m) AS INT) AS m,
           ${pickSql("rn", "m", "v", "_est")}
         FROM r GROUP BY grp)
       SELECT cnt.grp AS grp, cnt.n, e.m,
           e.p25_est, e.p50_est, e.p75_est, e.p95_est
       FROM cnt JOIN e ON e.grp = cnt.grp ORDER BY grp"""
}
