package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.schema.Metadata

/** Enrichment operators (SURVEY.md §2 E1/G1/G2/D5, H4/J3).
  *
  * The reference mutates fact rows post-hoc in 50-key transaction batches
  * (database_manager.py:200-241) because PostgreSQL row-locks the fact
  * table. Spark needs neither the mutation nor the batching: the dim side
  * is one row per simulation (KB–MB scale even when the fact side is
  * 100 TB), so enrichment is a broadcast hash join — zero shuffle of the
  * fact table — applied either at write time (preferred) or as a backfill
  * over the null-key slice.
  */
object Enrich {

  /** G1/G2 — high-water mark with first-run NULL → 0 (the reference
    * crashes on an empty fact table, SURVEY.md §3.3). */
  def highWaterMark(df: DataFrame, keyCol: String): Long =
    df.agg(coalesce(max(col(keyCol)).cast("long"), lit(0L)))
      .head().getLong(0)

  /** Hard cap for the dim-only global-window paths: a dimension table
    * (one row per simulation) is orders of magnitude below this; a fact
    * table is orders of magnitude above. */
  val DimRowCap: Long = 1000000L

  /** Misuse guard for the single-partition row_number paths: fail fast
    * when the input is not dimension-sized, BEFORE shipping it into a
    * global window. Bounded probe — `limit(cap+1).count()` stops reading
    * once cap+1 rows are found, so the check costs O(cap) even when the
    * caller mistakenly feeds a 100 TB fact table. */
  private[graft] def requireDimSized(df: DataFrame, cap: Long,
      what: String): Unit = {
    // Long-safe probe bound: a cap at/above Int.MaxValue clamps (limit
    // takes an Int) — the guard then only fires past ~2^31 rows, which
    // is already far beyond any dim contract
    val n = df.limit(math.min(cap + 1, Int.MaxValue.toLong).toInt).count()
    require(n <= cap,
      s"$what is a dim-only operator (global single-partition window) " +
        s"and its input exceeds $cap rows; number fact-scale data with " +
        "monotonically_increasing_id or a partitioned window instead")
  }

  /** H4/J3 — dim surrogate numbering: PG-sequence semantics as row_number
    * over (date_run, simulation_id), offset by the existing high-water
    * mark so re-runs continue the sequence. Single-partition window by
    * design — the dim table is one row per simulation, never fact-scale —
    * and [[requireDimSized]] enforces that contract (throws above
    * `maxDimRows` rather than silently serializing a fact table through
    * one partition). */
  def numberDim(newDim: Dataset[Metadata], startFrom: Long,
      maxDimRows: Long = DimRowCap): DataFrame = {
    requireDimSized(newDim.toDF(), maxDimRows, "numberDim")
    val w = Window.orderBy(col("date_run"), col("simulation_id"))
    newDim.toDF()
      .withColumn("simulation_num",
        (row_number().over(w) + startFrom).cast("int"))
  }

  /** E1/D5 — the enrichment join: assign dim's simulation_num to fact rows
    * whose key is still null. Broadcast hash join on the tiny dim side;
    * the D5 null-guard keeps already-enriched rows untouched (idempotent:
    * enrich∘enrich ≡ enrich). */
  def enrichFact(fact: DataFrame, dim: DataFrame): DataFrame = {
    val dimKeys = dim.select(
      col("simulation_id").as("_dim_sid"),
      col("simulation_num").as("_dim_num"))
    fact
      .join(broadcast(dimKeys), fact("simulation_id") === col("_dim_sid"), "left")
      .withColumn("simulation_num",
        when(col("simulation_num").isNull, col("_dim_num"))
          .otherwise(col("simulation_num")))
      .drop("_dim_sid", "_dim_num")
  }
}
