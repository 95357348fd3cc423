package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis, Warc}

/** q167 per-language survivor accounting: the rollup reconciles with
  * q165's totals and with a per-document recomputation through the
  * pure forms, and the label-agreement arithmetic is pinned against
  * langIdOf's own per-row output (right label counted, wrong label
  * not). */
class CrawlLanguagesSpec extends SparkSpecBase {
  import spark.implicits._

  test("q167 totals reconcile with q165 and with a per-doc " +
      "recomputation through the pure forms") {
    val out = Warc.crawlLanguages(spark, sf0001).collect()
    val ded = Warc.crawlDedup(spark, sf0001).collect()
    assert(out.map(_.getLong(1)).sum == ded.map(_.getLong(3)).sum)
    assert(out.map(_.getLong(2)).sum == ded.map(_.getLong(4)).sum)
    assert(out.forall(r => r.getLong(3) <= r.getLong(1)))
    assert(out.length > 1, "expected more than one predicted language")
    // independent path: pure-from-blobs admission + from-scratch pairs
    val adm = Warc.crawlAdmittedOf(Warc.synthesizeWarcBlobsOf(
        Tables(spark, sf0001, "documents"))).localCheckpoint()
    val pairs = Dedup.ngramJaccardPairsOf(
        Dedup.shingleHashDfOf(Tables(spark, sf0001, "documents")), 0.8)
      .select(col("a"), col("b"))
    val rebuilt = Warc.crawlLanguagesOf(
        Warc.crawlKeptOf(adm, pairs), Tables(spark, sf0001, "documents"))
      .orderBy(col("pred_lang")).collect()
    assert(out.map(_.toString).toSeq == rebuilt.map(_.toString).toSeq)
  }

  test("label agreement counts exactly the rows where the prediction " +
      "matches the supplied label") {
    val kept = Seq(
        (1L, "x.com", "the quick brown fox jumps over the lazy dog and runs"),
        (2L, "y.com", "the rain in spain stays mainly on the plain today"))
      .toDF("doc_id", "domain", "text")
      .withColumn("_toks", size(split(col("text"), " ")).cast("long"))
    // derive the actual predictions, then label doc 1 correctly and
    // doc 2 wrongly — the rollup must count exactly one agreement
    val preds = TextAnalysis.langIdOf(
        kept.select(col("doc_id"), col("text")).withColumn("lang", lit("")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val labels = Seq((1L, preds(1L)), (2L, "zz"))
      .toDF("doc_id", "lang")
    val out = Warc.crawlLanguagesOf(kept, labels).collect()
    assert(out.map(_.getLong(1)).sum == 2L)
    assert(out.map(_.getLong(3)).sum == 1L)
    assert(out.map(_.getLong(2)).sum == 21L)
  }
}
