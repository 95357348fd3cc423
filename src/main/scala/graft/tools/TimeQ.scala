package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one registered query in isolation (dev tool):
  * `sbt "runMain graft.tools.TimeQ q104_triangles /root/testdata/sf0.1 3"`
  * — separates the query's own cost from sbt/Spark startup, which the
  * VerifySubset wall clock conflates. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_TIMEQ_NOOP=1 materializes through the noop sink like
    // Bench does — count() lets Catalyst prune the output expressions
    // (an aggregate-and-explode query can measure near-zero under
    // count while its full evaluation costs seconds)
    val noop = sys.env.get("SPARK_GRAFT_TIMEQ_NOOP").contains("1")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val n = if (noop) {
        df.write.mode("overwrite").format("noop").save(); -1L
      } else df.count()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
