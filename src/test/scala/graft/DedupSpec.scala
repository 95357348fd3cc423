package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

class DedupSpec extends SparkSpecBase {

  private lazy val exactPairs =
    Dedup.ngramJaccardPairs(spark, sf0001, tau = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH recovers every exact jaccard>=0.8 pair (recall 1.0 here)") {
    val mh = Dedup.minhashPairs(spark, sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty)
    assert(exactPairs.subsetOf(mh),
      s"missed: ${exactPairs -- mh}")
  }

  test("simhash hamming<=3 pairs are true near-dups (precision 1.0 here)") {
    val sh = Dedup.simhashPairs(spark, sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    assert(sh.subsetOf(exactPairs), s"false positives: ${sh -- exactPairs}")
  }

  test("exact dedup groups identical texts only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", 5L), (2L, "a b c", 5L), (3L, "x y z", 5L)
    ).toDF("doc_id", "text", "n_chars")
    docs.createOrReplaceTempView("tmp_docs")
    val grouped = docs.groupBy(md5(col("text").cast("binary")))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(grouped == Set((1L, 2L), (3L, 1L)))
  }

  test("incrementalNew drops seen digests and within-batch duplicates") {
    import spark.implicits._
    val seen = Seq("old text one", "old text two")
      .toDF("text").select(sha2(col("text"), 256).as("digest"))
    val batch = Seq(
      (10L, "old text one"),  // already ingested -> dropped
      (11L, "fresh text"),    // new -> kept
      (12L, "fresh text"),    // within-batch dup -> dropped (11 wins)
      (13L, "another fresh")  // new -> kept
    ).toDF("doc_id", "text")
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    val got = Dedup.incrementalNew(batch, seen)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L, 13L))
  }

  test("shingles: short docs yield empty array, k-grams are distinct") {
    import spark.implicits._
    val df = Seq("a b", "a b c d", "a b a b a b c d").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got(0) == Nil)
    assert(got(1) == List("a b c", "b c d"))
    // distinct: repeated "a b a" collapses
    assert(got(2).distinct == got(2))
  }
}
