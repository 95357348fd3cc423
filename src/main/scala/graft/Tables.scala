package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loader for the driver's test tables (TESTDATA.md).
  *
  * Explicit-path reads; schema comes from the Parquet footer (already
  * typed), so column pruning and predicate pushdown reach the scan
  * unimpeded.
  *
  * The `events` table carries TIMESTAMP(NANOS) — a Parquet logical type
  * Spark's vectorized reader rejects outright. We read it via
  * `spark.sql.legacy.parquet.nanosAsLong` (epoch-nanos as LongType) and
  * truncate to microseconds with integer division, which matches Spark's
  * own ns→µs semantics (floor) and keeps full precision — dividing by 1e9
  * in double would already lose microseconds at 2024-epoch magnitudes.
  */
object Tables {

  /** Resolved-relation cache. `spark.read.parquet` costs ~80-100 ms per
    * call on this box (file listing + footer schema read + relation
    * resolution), and the bench executes 157 queries × 3 runs × 1-3
    * table reads each — re-reading an immutable footer thousands of
    * times was ~0.1-0.25 s of pure fixed overhead per query. The test
    * tables are static, so the resolved DataFrame (schema + file index)
    * is safely reusable for the lifetime of its session; keying by the
    * session reference keeps test suites with their own sessions from
    * ever seeing a stopped session's plan. */
  private val cache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // SessionMemo's sweep, mirrored: entries of stopped sessions only
    // pin dead plan state — drop them whenever the cache is touched, so
    // a long-lived JVM cycling sessions (the test runner) cannot
    // accumulate them
    cache.keysIterator.filter(_._1.sparkContext.isStopped)
      .foreach(cache.remove)
    cache.getOrElseUpdate((spark, dir, name), load(spark, dir, name))
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // `ts div 1000` (integer division) — a double divide would round
        // the ~1.7e18 ns value (ulp 256 ns) and mis-truncate ~1.6% of
        // rows by 1 µs, flipping epoch seconds at boundaries
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        // parquet timestamp[us] WITHOUT timezone reads as TIMESTAMP_NTZ
        // in Spark 4 — normalize to TIMESTAMP here so every consumer
        // (unix_micros, streaming watermarks) sees one type; under the
        // UTC session the cast is a bit-identical relabel that matches
        // DuckDB's epoch functions
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
