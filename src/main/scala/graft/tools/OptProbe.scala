package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-16 measurement harness (dev tool, guide §1): decomposes each
  * registered query's WARM wall time into scheduler-visible parts —
  * jobs launched, stages run, tasks run, summed executor run time,
  * summed GC time, shuffle bytes — so "slow because it computes" and
  * "slow because it schedules 40 tiny stages" read differently from
  * the numbers alone. Usage:
  * `sbt "runMain graft.tools.OptProbe q187_label_prop q107_bigram_logprob"`
  * (no args = every query, sorted by name; SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS as in Bench). Each query runs once untimed (JIT +
  * codegen + memoized artifacts warm, exactly the state the bench's
  * median-of-3 reports) and then `runs` timed noop materializations. */
object OptProbe {

  private class Agg extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val runMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      tasks.incrementAndGet()
    def reset(): Unit = Seq(jobs, stages, tasks, runMs, gcMs, shufR, shufW)
      .foreach(_.set(0))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val l = new Agg
    spark.sparkContext.addSparkListener(l)
    def noop(n: String): Unit =
      graft.SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    println(f"${"query"}%-26s ${"s/run"}%7s ${"jobs"}%5s ${"stage"}%5s ${"tasks"}%6s ${"runS"}%7s ${"gcS"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    names.foreach { n =>
      try {
        noop(n) // warm: codegen cache, session memos, JIT
        // let the (async) listener bus drain the warm run's events
        Thread.sleep(300)
        l.reset()
        val t0 = System.nanoTime()
        (1 to runs).foreach(_ => noop(n))
        val wall = (System.nanoTime() - t0) / 1e9 / runs
        Thread.sleep(300)
        println(f"$n%-26s $wall%7.3f ${l.jobs.get / runs}%5d ${l.stages.get / runs}%5d ${l.tasks.get / runs}%6d ${l.runMs.get / 1e3 / runs}%7.2f ${l.gcMs.get / 1e3 / runs}%6.2f ${l.shufR.get / 1e6 / runs}%7.1f ${l.shufW.get / 1e6 / runs}%7.1f")
      } catch { case e: Throwable =>
        println(f"$n%-26s FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
