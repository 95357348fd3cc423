package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query shuffle/spill audit (dev tool): runs each named query and
  * reports actual shuffle write, shuffle read, and spill bytes from
  * stage metrics — the empirical check behind every "shuffles carry X,
  * not Y" docstring claim. Usage:
  * `sbt "runMain graft.tools.ShuffleAudit q104_triangles q60_curation_pipeline"`
  * (no args = a default heavy set). */
object ShuffleAudit {

  private class MetricsListener extends SparkListener {
    val write = new AtomicLong
    val read = new AtomicLong
    val spill = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { write.set(0); read.set(0); spill.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q23_ngram_jaccard", "q48_dedup_clusters",
      "q53_dedup_resolution", "q60_curation_pipeline", "q64_unigram_logprob",
      "q87_profile", "q92_scd2", "q93_interval_join", "q94_fuzzy_join",
      "q96_cdc_apply", "q103_split_leakage", "q104_triangles",
      "q105_pagerank")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)
    println(f"${"query"}%-24s ${"shufW(MB)"}%10s ${"shufR(MB)"}%10s ${"spill(MB)"}%10s ${"sec"}%7s")
    // materialize through the noop sink, NOT count(): under a count
    // Catalyst prunes unused columns and eliminates cardinality-neutral
    // left joins, so a query whose cost lives in a pruned branch (q169:
    // three broadcast left joins + the lnFix tail) would audit as
    // zero-shuffle while the real plan the oracle checks does shuffle —
    // the same reasoning Bench documents for its sink choice
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      exec(graft.SparkEntry.queries(n)(spark, dir)) // warm + JIT
      // listener bus is async and private; a short settle beats racing it
      Thread.sleep(1000)
      l.reset()
      val t0 = System.nanoTime()
      exec(graft.SparkEntry.queries(n)(spark, dir))
      Thread.sleep(1000)
      val sec = (System.nanoTime() - t0) / 1e9 - 1.0
      def mb(v: Long): Double = v / 1e6
      println(f"$n%-24s ${mb(l.write.get)}%10.1f ${mb(l.read.get)}%10.1f " +
        f"${mb(l.spill.get)}%10.1f $sec%7.2f")
    }
    spark.stop()
  }
}
