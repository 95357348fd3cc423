package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-plan evidence (dev tool): the registered iterative queries
  * (q187 LPA, q105 PageRank) truncate lineage at every round's
  * localCheckpoint, so their `explain` output shows only the FINAL
  * stage — the per-round join/aggregate plan the round-16 optimization
  * changed is invisible in plans/r16/q187_label_prop_*.txt. This tool
  * rebuilds ONE round's vote/contribution frame through the exact same
  * public ops the operators use (co-purchase edges → adj/labels →
  * vote count + argmax; directedOut → rank join) WITHOUT the
  * checkpoint, and dumps its formatted plan, so the Exchange count and
  * join strategy per round are judgeable artifacts. */
object PlanDumpRounds {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
    Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Files.writeString(outDir.resolve(s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"[plandump-rounds] wrote $name")
    }
    val edges = graft.ops.Triangles.coPurchaseEdgesFor(spark, dir)
    // --- one LPA round, post-optimization shape (no checkpoint) ---
    val adj = edges.select(col("a").as("n"), col("b").as("m"))
      .unionAll(edges.select(col("b").as("n"), col("a").as("m")))
      .repartition(col("m"))
    val labels = adj.select(col("n").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val votes = adj
      .join(labels.select(col("node").as("m"), col("lbl"))
        .hint("shuffle_hash"), Seq("m"))
      .select(col("n"), col("lbl"))
      .unionAll(labels.select(col("node").as("n"), col("lbl")))
      .repartition(col("n"))
      .groupBy(col("n"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    dump("lpa_round_after", graft.ops.LabelProp.argmaxLabel(votes))
    // the pre-optimization round shape, for the plan diff
    val votesBefore = adj
      .join(labels.select(col("node").as("m"), col("lbl")), Seq("m"))
      .select(col("n"), col("lbl"))
      .unionAll(labels.select(col("node").as("n"), col("lbl")))
      .groupBy(col("n"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    dump("lpa_round_before", graft.ops.LabelProp.argmaxLabel(votesBefore))
    // --- one PageRank iteration, post-optimization shape ---
    val directed = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
    val outdeg = directed.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val directedOut = directed.join(outdeg, "src")
    val ranks = outdeg.select(col("src").as("node"),
      lit(1000000L).as("rank"))
    val contribs = directedOut
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
    dump("pagerank_iter_after", contribs)
    // the pre-optimization iteration shape (outdeg joined per round)
    val contribsBefore = directed
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(outdeg, "src")
      .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
    dump("pagerank_iter_before", contribsBefore)
    // --- round-17 evidence ------------------------------------------
    // PageRank STEADY-STATE iteration (iteration ≥ 2): in the real loop
    // directedOut is a materialized checkpoint carrying hash(src)
    // partitioning, and ranks is the PREVIOUS iteration's aggregate
    // output — `pagerank_iter_after` above dumps iteration 1, where the
    // lazy checkpoint build still inlines both the outdeg fold and the
    // contribution join (the round-16 verdict's evidence gap).
    // localCheckpoint(eager = false) reproduces the checkpointed-leaf
    // plan shape without running a job at dump time (explain never
    // executes); the LogicalRDD leaf stands in exactly as in the real
    // loop.
    val directedOutCp = directed.join(outdeg, "src")
      .localCheckpoint(eager = false)
    val ranksPrev = directedOutCp
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      .groupBy(col("node")).agg(sum(col("contrib")).as("rank"))
      .localCheckpoint(eager = false)
    val steady = directedOutCp
      .join(ranksPrev.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
    dump("pagerank_iter_steady", steady)
    // LPA LATE-round shape (round ≥ 2): labels is the previous round's
    // argmax output (a checkpointed leaf in the real loop), not the
    // identity seed round 1 reads — the shape the round-16 verdict
    // asked the q187 evidence to show.
    val lblPrev = graft.ops.LabelProp.argmaxLabel(
      adj.join(labels.select(col("node").as("m"), col("lbl"))
          .hint("shuffle_hash"), Seq("m"))
        .select(col("n"), col("lbl"))
        .unionAll(labels.select(col("node").as("n"), col("lbl")))
        .repartition(col("n"))
        .groupBy(col("n"), col("lbl"))
        .agg(count(lit(1)).as("c"))).localCheckpoint(eager = false)
    val votesLate = adj
      .join(lblPrev.select(col("node").as("m"), col("lbl"))
        .hint("shuffle_hash"), Seq("m"))
      .select(col("n"), col("lbl"))
      .unionAll(lblPrev.select(col("node").as("n"), col("lbl")))
      .repartition(col("n"))
      .groupBy(col("n"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    dump("lpa_round_late", graft.ops.LabelProp.argmaxLabel(votesLate))
    // the round-17 combine EXPERIMENT shape for late rounds (two
    // exchanges of combined rows instead of one of raw votes)
    val votesLateCombine = adj
      .join(lblPrev.select(col("node").as("m"), col("lbl"))
        .hint("shuffle_hash"), Seq("m"))
      .select(col("n"), col("lbl"))
      .unionAll(lblPrev.select(col("node").as("n"), col("lbl")))
      .groupBy(col("n"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    dump("lpa_round_late_combine",
      graft.ops.LabelProp.argmaxLabel(votesLateCombine))
    // CC star round, STEADY-STATE shape (round 2 over round 1's output,
    // whose checkpoint in the real loop carries round 1's dedup
    // partitioning): fused (round-17, 3 exchanges) vs unfused
    // (round-16, 4 exchanges). The edge seed is the co-purchase graph —
    // same scale family as the q48/q60/q133 pair graphs, derived
    // through public ops exactly as the header documents.
    val ccEdges = edges.select(col("a").as("u"), col("b").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    val ccR1Fused = graft.ext.Curate.ccRound(ccEdges, fused = true)
      .localCheckpoint(eager = false)
    dump("cc_round_after", graft.ext.Curate.ccRound(ccR1Fused, fused = true))
    val ccR1Old = graft.ext.Curate.ccRound(ccEdges, fused = false)
      .localCheckpoint(eager = false)
    dump("cc_round_before", graft.ext.Curate.ccRound(ccR1Old, fused = false))
    spark.stop()
  }
}
