package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of one registered query — the
  * plan-audit loop: `sbt "runMain graft.tools.ExplainQ q64_unigram_logprob"`.
  * Second arg overrides the sf dir (default sf0.001 for fast analysis). */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val name = positional(0)
    val dir =
      if (positional.length > 1) positional(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (args.contains("--exec")) {
      // materialize, then print the FINAL adaptive plan — AQE stage reuse
      // (deduped identical exchanges) is only visible post-execution
      df.collect()
      println("== Executed (final adaptive) plan ==")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
