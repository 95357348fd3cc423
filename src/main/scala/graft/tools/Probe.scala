package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warmup
    graft.Tables(spark, dir, "documents").count()
    time("shingles explode count") {
      graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(graft.ext.Dedup.shingles(col("text"))).as("s"))
        .count()
    }
    time("shingles + xxhash count") {
      graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(graft.ext.Dedup.shingles(col("text"))).as("s"))
        .select(xxhash64(col("s")).as("h")).filter(col("h") =!= 0).count()
    }
    time("minhash signatures") {
      graft.ext.Dedup.minhashSignatures(spark, dir).count()
    }
    time("simhash sketches") {
      graft.ext.Dedup.simhash(spark, dir).count()
    }
    time("minhash pairs full") {
      graft.ext.Dedup.minhashPairs(spark, dir).count()
    }
    spark.stop()
  }
}
