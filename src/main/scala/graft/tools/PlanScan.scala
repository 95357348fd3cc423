package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-surface plan scan (dev tool): analyzes EVERY registered query's
  * executed plan and reports scale anti-patterns — SortAggregate
  * (HashAggregate demotion: a per-partition sort of the input) and
  * global windows (WindowExec with an empty partition spec: all rows
  * to ONE reducer). The r14 SortAggregate purge was a manual sweep;
  * this makes it a one-command re-check so a regression cannot land
  * silently. Known deliberate sites are listed (with their NOTES
  * adjudication) so the output is an exception report, not a wall. */
object PlanScan {
  /** Adjudicated, deliberate SortAggregate sites (NOTES r14
    * "SortAggregate purge"): string-typed aggregation passes where a
    * packed-decimal key cannot apply. */
  private val KnownSortAgg = Set(
    "q87_profile", "q111_profile_drift", "q96_cdc_apply")

  /** Adjudicated, deliberate global-window sites — both run over
    * frames whose cardinality is bounded by construction, never by
    * the corpus: q06 numbers a DIMENSION under an explicit fact-size
    * guard (SURVEY H4/J3); q59's cumulative runs over the per-SOURCE
    * aggregate (a handful of rows, documented at the site). */
  private val KnownGlobalWin = Set(
    "q06_dim_numbering", "q59_temperature_mixture")

  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var nSort = 0
    var nWin = 0
    var nErr = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        val sortAgg = qe.executedPlan.toString.contains("SortAggregate")
        // precise global-window check on the optimized LOGICAL plan
        // (no AQE wrapper games): a Window with an empty partition
        // spec sends every row to one reducer
        val globalWin = qe.optimizedPlan.collectFirst {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.nonEmpty
        if (sortAgg && !KnownSortAgg(n)) {
          nSort += 1
          println(s"SORTAGG $n")
        }
        if (globalWin && !KnownGlobalWin(n)) {
          nWin += 1
          println(s"GLOBALWIN $n")
        }
      } catch {
        case e: Throwable =>
          nErr += 1
          println(s"ERR $n: ${e.toString.take(160)}")
      }
    }
    println(s"[planscan] unexpected SortAggregate: $nSort, " +
      s"unexpected global windows: $nWin, errors: $nErr " +
      s"(known deliberate: ${KnownSortAgg.size} SortAggregate, " +
      s"${KnownGlobalWin.size} global windows)")
    spark.stop()
    // machine-visible gate: a script/CI wrapper must see findings fail
    if (nSort + nWin + nErr > 0) sys.exit(1)
  }
}
