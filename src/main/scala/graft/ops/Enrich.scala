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

  /** H4/J3 — dim surrogate numbering: PG-sequence semantics as row_number
    * over (date_run, simulation_id), offset by the existing high-water
    * mark so re-runs continue the sequence. Single-partition window by
    * design — the dim table is one row per simulation, never fact-scale. */
  def numberDim(newDim: Dataset[Metadata], startFrom: Long): DataFrame = {
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
