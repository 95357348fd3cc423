package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall times at
  * SPARK_GRAFT_SF_DIR. A short warmup (flagship query) runs first so JVM
  * JIT + session initialization don't land in the first measured query;
  * queries run in name order for stable output.
  *
  * Each query is materialized through the `noop` sink, not `count()`:
  * under a count Catalyst prunes every column and drops sorts, so
  * per-row transform queries would benchmark little more than a scan.
  * The noop write evaluates the full plan the oracle checks and discards
  * rows at the sink. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    try exec(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
