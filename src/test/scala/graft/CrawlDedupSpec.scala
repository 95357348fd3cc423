package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Curate, Dedup, Warc}

/** q165 crawl-front dedup accounting: reconciliation with q162's
  * admission counts, the index-restriction identity (filtering the
  * full-corpus pair index to keeper endpoints ≡ deriving pairs from
  * the keepers alone — the pairwise-Jaccard exactness claim), exact
  * keep-min drop behavior and cross-domain attribution on fixtures
  * (the real corpus has no exact duplicates), near-dup representative
  * selection through exact-duplicate collapse, and the per-domain
  * ordering invariants. */
class CrawlDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def admitted(dir: String): DataFrame =
    Warc.crawlAdmittedOf(Warc.synthesizeWarcBlobsOf(
      Tables(spark, dir, "documents")))

  private def asMap(df: DataFrame): Map[String, (Long, Long, Long, Long)] =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("q165 n_admitted reconciles with q162 per domain, and the " +
      "dedup stages drop real near-dup pairs on the live corpus") {
    val ded = asMap(Warc.crawlDedup(spark, sf0001))
    val corpus = Warc.crawlCorpus(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ded.keySet == corpus.keySet)
    ded.foreach { case (dom, (nAdm, _, _, _)) =>
      assert(nAdm == corpus(dom), s"n_admitted mismatch for $dom")
    }
    // no exact duplicates in the corpus: the exact stage passes through
    assert(ded.values.forall { case (a, e, _, _) => e == a })
    // the near-dup stage is non-trivial: representatives drop members
    val dropped = ded.values.map { case (_, e, k, _) => e - k }.sum
    assert(dropped > 0, "expected real near-dup drops at sf0.001")
    ded.values.foreach { case (a, e, k, _) =>
      assert(k <= e && e <= a)
    }
  }

  test("index-restriction identity: the full-corpus pair index " +
      "restricted to keepers gives the same accounting as pairs " +
      "derived from the keepers alone") {
    val adm = admitted(sf0001).localCheckpoint()
    val fullIndex = Dedup.ngramJaccardPairsOf(
        Dedup.shingleHashDfOf(Tables(spark, sf0001, "documents")), 0.8)
      .select(col("a"), col("b")).localCheckpoint()
    // keepers = exact-dedup survivors of the admitted set (the corpus
    // has no exact dups, so keepers == admitted ids — asserted in the
    // live-corpus test above); derive pairs from their texts only
    val keeperDocs = Tables(spark, sf0001, "documents")
      .join(adm.select("doc_id"), Seq("doc_id"), "left_semi")
    val scratchPairs = Dedup.ngramJaccardPairsOf(
        Dedup.shingleHashDfOf(keeperDocs), 0.8)
      .select(col("a"), col("b")).localCheckpoint()
    val viaIndex = asMap(Warc.crawlDedupOf(adm, fullIndex))
    val viaScratch = asMap(Warc.crawlDedupOf(adm, scratchPairs))
    assert(viaIndex == viaScratch)
    assert(viaIndex.nonEmpty)
  }

  private def admFixture(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "domain", "text")
      .withColumn("_toks",
        size(split(col("text"), " ")).cast("long"))

  private val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")

  test("exact keep-min: duplicates collapse to the smallest id and " +
      "the keeper's domain gets the content") {
    val adm = admFixture(
      (1L, "a.com", "same words here"),
      (2L, "b.com", "same words here"),
      (3L, "b.com", "other words entirely"))
    val out = asMap(Warc.crawlDedupOf(adm, noPairs))
    assert(out("a.com") == ((1L, 1L, 1L, 3L)))
    // b.com fetched two, but one was a's content: only doc 3 is unique
    assert(out("b.com") == ((2L, 1L, 1L, 3L)))
  }

  test("near-dup representative selection through exact-duplicate " +
      "collapse: a consistent index carries every copy's edges") {
    // 1 and 2 share a text; 3 is a near-dup of that text; 4 of 3.
    // A TRUE Jaccard pair set over the super-corpus therefore holds
    // (1,3), (2,3), (3,4) — identical texts, identical edges.
    val adm = admFixture(
      (1L, "a.com", "alpha beta gamma"),
      (2L, "b.com", "alpha beta gamma"),
      (3L, "c.com", "alpha beta gamma delta"),
      (4L, "d.com", "alpha beta gamma delta epsilon"))
    val pairs = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = asMap(Warc.crawlDedupOf(adm, pairs))
    // keepers {1,3,4}; restricted edges (1,3),(3,4) -> one component,
    // representative 1: only a.com ships content
    assert(out("a.com") == ((1L, 1L, 1L, 3L)))
    assert(out("b.com") == ((1L, 0L, 0L, 0L)))
    assert(out("c.com") == ((1L, 1L, 0L, 0L)))
    assert(out("d.com") == ((1L, 1L, 0L, 0L)))
  }

  test("docs in no pair are kept; registered output is one row per " +
      "domain ordered by domain") {
    val adm = admFixture(
      (5L, "e.com", "lone words one"),
      (6L, "f.com", "lone words two"))
    val out = asMap(Warc.crawlDedupOf(adm, noPairs))
    assert(out("e.com") == ((1L, 1L, 1L, 3L)))
    assert(out("f.com") == ((1L, 1L, 1L, 3L)))
    val reg = Warc.crawlDedup(spark, sf0001)
    val doms = reg.select("domain").collect().map(_.getString(0)).toSeq
    assert(doms == doms.sorted && doms.distinct == doms)
  }
}
