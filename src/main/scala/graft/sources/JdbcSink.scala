package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** B2/B3 literal-parity sink (SURVEY.md §2 B2/B3): the reference's whole
  * purpose is loading a relational database — server-side `COPY` into
  * `fact_sim` (database_manager.py:88-94) and per-row INSERT into
  * `dim_rxn` (database_manager.py:119-130). The engine's primary
  * warehouse is Parquet; this JDBC path is the drop-in parity sink for
  * deployments that still terminate in an RDBMS.
  *
  * Tested against embedded Derby — the container has no PostgreSQL
  * server; the Spark write path is identical modulo URL/driver, and a
  * production deployment swaps in `jdbc:postgresql://...` untouched.
  *
  * Scale posture: Spark's JDBC sink writes partition-parallel (one
  * connection per task); `numPartitions` caps concurrent connections so
  * a 1000-executor cluster cannot open 1000 sessions against one
  * database, and `batchsize` batches the INSERTs (the Spark analogue of
  * the reference's single-connection COPY throughput knob).
  */
object JdbcSink {

  case class Target(
      url: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      numPartitions: Int = 8,
      batchSize: Int = 10000,
      varcharLen: Int = 256)

  /** Append `df` into `table`, creating the table on first write (the
    * reference's `create table if not exists` + COPY collapse into one
    * idempotent append). String columns are created as bounded VARCHAR —
    * matching the reference's varchar(128)/varchar(16) DDL
    * (create_tables.sql:22,28,45) — because some dialects (Derby) would
    * otherwise map StringType to CLOB, which cannot be compared or
    * indexed. */
  def append(df: DataFrame, t: Target, table: String): Unit = {
    val varcharOverrides = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType =>
        s"${f.name} VARCHAR(${t.varcharLen})"
    }.mkString(", ")
    val w = df.write.format("jdbc")
      .option("url", t.url)
      .option("driver", t.driver)
      .option("dbtable", table)
      .option("numPartitions", t.numPartitions)
      .option("batchsize", t.batchSize)
    (if (varcharOverrides.nonEmpty)
       w.option("createTableColumnTypes", varcharOverrides)
     else w)
      .mode("append")
      .save()
  }

  def read(spark: SparkSession, t: Target, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", t.url)
      .option("driver", t.driver)
      .option("dbtable", table)
      .load()
}
