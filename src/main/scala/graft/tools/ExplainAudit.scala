package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for key queries so the shuffle /
  * pushdown / codegen posture can be audited (dev tool). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_revenue_by_segment", "q03_enrich_leftjoin",
      "q10_topk", "q13_semi_join", "q21_dedup_exact",
      "q73_merge_upsert", "q74_resample", "q76_heavy_hitters")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
