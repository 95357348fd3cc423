package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling for the BPE trainer (not part of the driver contract). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")
    docs.count() // warm
    var t0 = System.nanoTime()
    val vocabSize = docs.selectExpr("explode(split(text, ' ')) AS w")
      .where("w <> ''").groupBy("w").count().count()
    println(f"vocab build+count ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"$vocabSize words")
    t0 = System.nanoTime()
    val m = graft.ext.Bpe.train(docs, merges = 16)
    println(f"train(16) ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"${m.size} merges")
    t0 = System.nanoTime()
    val n = graft.ext.Bpe.encodeCorpusOf(docs, 16).count()
    println(f"encodeCorpus ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    spark.stop()
  }
}
