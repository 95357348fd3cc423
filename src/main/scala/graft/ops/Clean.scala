package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Clean-stage operators (SURVEY.md §2 C1/C2/F1/F2, A1): bulk rename, index
  * artifact drop, presence-only schema validation.
  *
  * Unlike the reference — which reads each CSV three times (clean,
  * validate, COPY; file_manager.py:47, database_manager.py:46-47, 89) and
  * round-trips through text between stages — the whole clean stage here is
  * one distributed scan with the validation done against the DataFrame
  * schema (a driver-side metadata check, zero data read).
  */
object Clean {

  /** C1 — bulk column rename; unmapped columns pass through
    * (file_manager.py:53). */
  def rename(df: DataFrame): DataFrame =
    df.withColumnsRenamed(Schemas.columnMap)

  /** C2 — drop the pandas index artifact if present; no-op otherwise
    * (guarded semantics of file_manager.py:61-62). */
  def dropIndexArtifact(df: DataFrame): DataFrame =
    df.drop(Schemas.indexArtifactCol)

  /** F1/F2 — presence-only required-column check, the set-difference test
    * of file_manager.py:55-58 / database_manager.py:47-54. Returns the
    * missing column names (empty = valid). Pure schema arithmetic: no job
    * is launched. */
  def missingColumns(df: DataFrame,
      required: Seq[String] = Schemas.requiredCols): Seq[String] =
    required.filterNot(df.columns.toSet)

  /** Strict variant — raises like the reference's ValueError
    * (file_manager.py:58) when required columns are absent. */
  def validated(df: DataFrame,
      required: Seq[String] = Schemas.requiredCols): DataFrame = {
    val missing = missingColumns(df, required)
    require(missing.isEmpty,
      s"schema validation failed; missing columns: ${missing.mkString(", ")}")
    df
  }

  /** A1 + C5 — read raw incoming CSVs and recover `simulation_id`/`day`
    * from the path, replacing the reference's positional filename slicing
    * (main.py:23) with a regex over input_file_name. One scan for any
    * number of files — the reference's own "combine CSVs into one large
    * COPY" wish (README.md:29) is Spark's default behavior.
    *
    * Columns bind BY HEADER NAME: a user-supplied schema on the CSV
    * reader binds positionally (ignoring headers), which would silently
    * column-shift files lacking the optional index artifact and make the
    * required-column check unreachable. So: read as strings under the
    * header names, then cast the known columns — still a single scan,
    * still no inference. */
  def readIncomingCsvs(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .csv(paths: _*)
    val typed = Schemas.rawCsvSchema.fields.foldLeft(raw) { (df, f) =>
      if (df.columns.contains(f.name))
        df.withColumn(f.name, col(f.name).cast(f.dataType))
      else df
    }
    typed
      .withColumn("_file", input_file_name())
      .withColumn("file_simulation_id",
        regexp_extract(col("_file"), "rxndata_([0-9a-fA-F-]{36})\\.csv", 1))
      .withColumn("day",
        regexp_extract(col("_file"), "/([^/]+)/[^/]+\\.csv$", 1))
      .drop("_file")
  }

  /** Full clean stage: rename → validate → drop artifact. */
  def clean(df: DataFrame): DataFrame =
    dropIndexArtifact(validated(rename(df)))

  /** B1 — cleaned-CSV write for literal `processed/` parity (header kept,
    * no index column, like df.to_csv(index=False) at file_manager.py:63).
    * The batch pipeline itself skips this text hop and writes Parquet
    * bronze — this exists for reference-compatible output only. */
  def writeProcessedCsv(df: DataFrame, dest: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(dest)
}
