package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke: synthesizes ~10x sf0.1 inputs in /tmp (keys shifted per
  * replica so join fanout and group cardinality scale realistically) and
  * times the heaviest operator families at 1x vs 10x. Evidence for the
  * linear-scaling claim — run manually, prints a small table. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale10"
    val replicas = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, keyCols: Seq[String], shift: Long): Unit = {
      val src = graft.Tables(spark, base, table)
      val reps = (0 until replicas).map { r =>
        keyCols.foldLeft(src)((d, k) =>
          d.withColumn(k, col(k) + lit(r * shift)))
      }
      reps.reduce(_ unionAll _).write.mode("overwrite")
        .parquet(s"$big/$table.parquet")
    }
    val t0 = System.nanoTime()
    // shift every key participating in a join consistently per replica,
    // or the "10x" join would fan out 10x-per-side (100x work) and the
    // ratios would measure the synthesis artifact, not the engine
    replicate("lineitem", Seq("l_orderkey"), 10000000L)
    replicate("orders", Seq("o_orderkey", "o_custkey"), 10000000L)
    replicate("customer", Seq("c_custkey"), 10000000L)
    replicate("documents", Seq("doc_id"), 10000000L)
    replicate("embeddings", Seq("vec_id"), 10000000L)
    println(f"[scale] synthesis ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time(name: String, dir: String)(q: (SparkSession, String) => DataFrame): Double = {
      val t = System.nanoTime()
      q(spark, dir).count()
      (System.nanoTime() - t) / 1e9
    }
    val cases: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q01_pricing_summary" -> graft.queries.Relational.q01PricingSummary,
      "q02_revenue_by_segment" -> graft.queries.Relational.q02RevenueBySegment,
      "q21_dedup_exact" -> (graft.ext.Dedup.exact(_, _)),
      "q22_minhash_pairs" -> (graft.ext.Dedup.minhashPairs(_, _)),
      "q23_ngram_jaccard" -> (graft.ext.Dedup.ngramJaccardPairs(_, _)),
      "q24_simhash_pairs" -> (graft.ext.Dedup.simhashPairs(_, _)),
      "q47_neardup_lsh" -> ((s: SparkSession, d: String) =>
        graft.ext.Similarity.neardupPairsLsh(s, d)),
      "q30_lang_id" -> (graft.ext.TextAnalysis.langId(_, _)),
      "q48_dedup_clusters" -> (graft.ext.Curate.dedupClusters(_, _)),
      "q49_stratified_sample" -> ((s: SparkSession, d: String) =>
        graft.ext.Curate.stratifiedSample(s, d)),
      "q50_repetition" -> (graft.ext.Curate.repetition(_, _)),
      "q54_decontaminate" -> ((s: SparkSession, d: String) =>
        graft.ext.Curate.decontaminate(s, d)),
      "q55_pack_chunks" -> ((s: SparkSession, d: String) =>
        graft.ext.Curate.packChunks(s, d)),
      "q35_percentile" -> graft.queries.Analytics.q35Percentile,
      "q26_knn_bruteforce" -> ((s: SparkSession, d: String) =>
        graft.ext.Similarity.knnBruteForce(s, d)),
      "q51_mixture_sample" -> ((s: SparkSession, d: String) =>
        graft.ext.Curate.mixtureSample(s, d))
    )
    println(f"${"query"}%-24s ${"1x(s)"}%8s ${"10x(s)"}%8s ${"ratio"}%6s")
    cases.foreach { case (name, q) =>
      time(name, base)(q) // warm
      val a = time(name, base)(q)
      val b = time(name, big)(q)
      println(f"$name%-24s $a%8.2f $b%8.2f ${b / a}%6.1f")
    }
    spark.stop()
  }
}
