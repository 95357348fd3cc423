package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Curate, Dedup, Warc}

/** q166 crawl release: the WET session memo changes no crawl query's
  * result (registered ≡ pure-from-blobs for q162/q163/q165), the
  * release manifest is rebuilt cell-for-cell from the source table
  * over an independently derived clean set (source independence, the
  * q163 idiom), the release is a subset of the q165 survivors, and
  * the two exclusion rules — benchmark members and contaminated
  * documents — are fixture-proven. */
class CrawlReleaseSpec extends SparkSpecBase {
  import spark.implicits._

  private def blobs: DataFrame =
    Warc.synthesizeWarcBlobsOf(Tables(spark, sf0001, "documents"))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("the WET session memo is result-invariant: registered " +
      "q162/q163/q165 equal their pure-from-blobs forms") {
    assert(rows(Warc.crawlCorpus(spark, sf0001)) ==
      rows(Warc.crawlCorpusOf(blobs)))
    assert(rows(Warc.crawlShards(spark, sf0001)) ==
      rows(ext.Shards.manifestOf(ext.Shards.shardAssignOf(
        Warc.crawlAdmittedOf(blobs).select("doc_id", "text")))))
    assert(rows(Warc.crawlDedup(spark, sf0001)) ==
      rows(Warc.crawlDedupOf(Warc.crawlAdmittedOf(blobs),
        Dedup.ngramJaccardPairsOf(
          Dedup.shingleHashDfOf(Tables(spark, sf0001, "documents")), 0.8)
          .select(col("a"), col("b")))))
  }

  test("q166 manifest rebuilds cell-for-cell from the source table " +
      "over an independently derived clean set, and is a strict " +
      "subset of the q165 survivors (contamination is non-trivial)") {
    val reg = Warc.crawlRelease(spark, sf0001)
    // independent path: pure-from-blobs admission, from-scratch pairs,
    // explicit survivor/decontamination recomputation
    val adm = Warc.crawlAdmittedOf(blobs).localCheckpoint()
    val pairs = Dedup.ngramJaccardPairsOf(
        Dedup.shingleHashDfOf(Tables(spark, sf0001, "documents")), 0.8)
      .select(col("a"), col("b")).localCheckpoint()
    val kept = Warc.crawlKeptOf(adm, pairs)
      .filter(col("doc_id") % 50 =!= 0).select("doc_id", "text")
      .localCheckpoint()
    val bench = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") % 50 === 0).select("doc_id", "text")
    val cont = Curate.decontaminateOf(kept.unionByName(bench))
      .select("doc_id")
    val cleanIds = kept.join(cont, Seq("doc_id"), "left_anti")
      .select("doc_id")
    val rebuilt = ext.Shards.manifestOf(ext.Shards.shardAssignOf(
        Tables(spark, sf0001, "documents")
          .join(cleanIds, Seq("doc_id"), "left_semi")
          .select("doc_id", "text")))
      .orderBy(col("shard_id"))
    assert(rows(reg) == rows(rebuilt))
    // release ⊆ survivors, strictly: the corpus has real contamination
    val released = reg.agg(sum("n_docs")).head().getLong(0)
    val survivors = Warc.crawlDedup(spark, sf0001)
      .agg(sum("n_kept")).head().getLong(0)
    assert(released > 0 && released < survivors)
    assert(cont.count() > 0, "expected contaminated survivors at sf0.001")
  }

  private def admFixture(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "domain", "text")
      .withColumn("_toks", size(split(col("text"), " ")).cast("long"))

  private val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")

  test("benchmark members and contaminated documents are excluded " +
      "from the release; clean survivors ship") {
    val benchText = "alpha beta gamma delta epsilon zeta"
    val adm = admFixture(
      // a benchmark member that made it through admission
      (50L, "a.com", "own words not shared with anything"),
      // shares the 5-gram 'alpha beta gamma delta epsilon' with bench
      (7L, "b.com", "alpha beta gamma delta epsilon other words"),
      // clean
      (8L, "c.com", "completely different content entirely here"))
    val bench = Seq((50L, benchText)).toDF("doc_id", "text")
    val out = Warc.crawlReleaseOf(adm, noPairs, bench).collect()
    // only doc 8 ships: 50 is a benchmark member, 7 is contaminated
    assert(out.map(_.getLong(1)).sum == 1L)
    assert(out.forall(r => r.getLong(3) == 8L && r.getLong(4) == 8L))
  }

  test("a near-dup non-representative never reaches decontamination " +
      "or the manifest") {
    val adm = admFixture(
      (1L, "a.com", "shared words run one two three"),
      (2L, "b.com", "shared words run one two three four"))
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val out = Warc.crawlReleaseOf(adm, pairs,
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()
    assert(out.map(_.getLong(1)).sum == 1L)
    assert(out.forall(r => r.getLong(3) == 1L && r.getLong(4) == 1L))
  }
}
