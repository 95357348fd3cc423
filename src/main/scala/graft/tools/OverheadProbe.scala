package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes the per-query fixed overhead the bench pays 157×3 times:
  * (a) `spark.read.parquet` relation creation (file listing + footer
  * schema read), (b) plan analysis+optimization, (c) noop execution of
  * a minimal plan. Dev tool for the bench-budget work; see NOTES. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String, n: Int)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/op over $n")
    }
    t("read.parquet(documents) relation", 20) {
      spark.read.parquet(s"$dir/documents.parquet")
    }
    t("Tables(documents)", 20) {
      graft.Tables(spark, dir, "documents")
    }
    val df = graft.Tables(spark, dir, "documents")
    t("reused-relation noop write (select doc_id)", 20) {
      df.select("doc_id").write.mode("overwrite").format("noop").save()
    }
    t("fresh-relation noop write (select doc_id)", 20) {
      graft.Tables(spark, dir, "documents").select("doc_id")
        .write.mode("overwrite").format("noop").save()
    }
    t("fresh-relation noop write region (1-row table)", 20) {
      graft.Tables(spark, dir, "region")
        .write.mode("overwrite").format("noop").save()
    }
    t("fresh groupBy count noop (documents)", 10) {
      graft.Tables(spark, dir, "documents").groupBy("lang").count()
        .write.mode("overwrite").format("noop").save()
    }
    val cached = graft.Tables(spark, dir, "documents")
    t("reused groupBy count noop (documents)", 10) {
      cached.groupBy("lang").count()
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
