package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC corpus source/sink — the second columnar interchange format next
  * to parquet (reference-domain warehouses commonly hand over ORC from
  * Hive/Trino estates; Spark's reader is built in, no extra jars).
  *
  * Same scale posture as the parquet paths: explicit schema on read (no
  * inference pass), predicate pushdown and column pruning reach the ORC
  * stripe level exactly as they do parquet row groups (OrcIOSpec pins
  * both in the plan), zstd splittable compression, and optional hive
  * partitioning so partition pruning eliminates directories before any
  * stripe is opened.
  */
object OrcIO {

  /** Write `df` as ORC; `partitionBy` columns become hive-style
    * directories (the unit of partition pruning on read). */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      compression: String = "zstd"): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }

  /** Read an ORC dataset with an explicit contract schema (pass
    * partition columns too — Spark resolves them from the directory
    * names). `schema = None` falls back to footer-based inference,
    * acceptable only for ad-hoc exploration. */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r.orc(path))(s => r.schema(s).orc(path))
  }
}
