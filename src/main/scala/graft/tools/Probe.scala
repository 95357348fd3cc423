package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warmup
    graft.Tables(spark, dir, "documents").count()
    val sh = graft.ext.Dedup
      .shingleHashDfOf(graft.Tables(spark, dir, "documents"))
      .withColumn("n", size(col("hs")))
    time("sh localCheckpoint") { sh.localCheckpoint().count() }
    val shc = sh.localCheckpoint()
    val tau = 0.8
    val freq = shc.select(explode(col("hs")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ordered = shc
      .select(col("doc_id"), col("n"), explode(col("hs")).as("h"))
      .join(freq, "h")
      .groupBy(col("doc_id"), col("n"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("h")))),
        x => x.getField("h")).as("hs"))
    time("df-ordered rebuild") { ordered.count() }
    val ord = ordered.localCheckpoint()
    val prefixLen = (col("n") - ceil(col("n") * tau) + 1).cast("int")
    val prefix = ord.select(col("doc_id"), col("n"),
      explode(slice(col("hs"), lit(1), prefixLen)).as("p"))
    val candidates = prefix.as("x").join(prefix.as("y"),
        col("x.p") === col("y.p") && col("x.doc_id") < col("y.doc_id") &&
          col("x.n") >= col("y.n") * tau && col("y.n") >= col("x.n") * tau)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    time("candidates (df-ordered)") { candidates.count() }
    time("full ngramJaccardPairs x1") {
      graft.ext.Dedup.ngramJaccardPairs(spark, dir).count()
    }
    time("full ngramJaccardPairs x2") {
      graft.ext.Dedup.ngramJaccardPairs(spark, dir).count()
    }
    time("full dedupClusters (q48)") {
      graft.ext.Curate.dedupClusters(spark, dir).count()
    }
    spark.stop()
  }
}
