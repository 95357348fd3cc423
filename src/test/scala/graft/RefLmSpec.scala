package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curate, Dedup, TextAnalysis, Warc}
import graft.functions.DetLn

/** Reference-trained bigram LM (q169) and the CCNet head/middle/tail
  * split (q170): hand-checked training counts, all three smoothing
  * branches pinned against DetLn's own literal DAG, refuse-on-empty
  * training, session-memo sharing, reconciliation with q167's
  * per-language totals, pure-form invariance, and the broadcast-only
  * scoring plan. */
class RefLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def tagged(rows: (Long, String, Boolean, String)*) =
    rows.toDF("doc_id", "split", "is_ref", "text")

  // the model's sufficient statistics from a hand-countable corpus:
  // reference train = "a b a" + "a b c" → uni a:3 b:2 c:1 (N=6, V=3,
  // m=10); bigrams (a,b):2 (b,a):1 (b,c):1
  private lazy val model = TextAnalysis.refLmTrainOf(tagged(
    (1L, "train", true, "a b a"),
    (2L, "train", true, "a b c"),
    (3L, "train", false, "z z z"),
    (4L, "val", true, "a a a a")))

  /** The expected micro-nat score of one integer ratio, computed by the
    * SAME DetLn DAG production runs — the spec pins the BRANCH
    * arithmetic (num, den), not a reimplementation of lnFix. */
  private def lpMicro(num: Long, den: Long): Long =
    DetLn.withLnFix(DetLn.withLnFix(spark.range(1).toDF("i"),
        "ln_a", num.toString), "ln_b", den.toString)
      .select(expr(DetLn.microSql("ln_a - ln_b")))
      .head().getLong(0)

  test("training counts only the reference train split: unigrams, " +
      "bigrams, and the add-one denominator are hand-checked") {
    assert(model.m == 10L)
    val uni = model.uni.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val big = model.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 2L, ("b", "a") -> 1L,
      ("b", "c") -> 1L))
  }

  test("all three smoothing branches score finite and exact: seen " +
      "bigram, unseen prev, fully-OOV transition") {
    val docs = Seq(
      (10L, "a b"), // seen bigram:      7·2·10 + 3·(2+1)·3 / 10·3·10
      (11L, "q b"), // unseen prev:      3·(2+1) / 10·10
      (12L, "q q"), // fully OOV:        3·(0+1) / 10·10
      (13L, "a q")  // seen prev, OOV w: 7·0·10 + 3·(0+1)·3 / 10·3·10
    ).toDF("doc_id", "text")
    val out = TextAnalysis.refPerplexityOf(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(10L) == (1L, lpMicro(167L, 300L)))
    assert(out(11L) == (1L, lpMicro(9L, 100L)))
    assert(out(12L) == (1L, lpMicro(3L, 100L)))
    assert(out(13L) == (1L, lpMicro(9L, 300L)))
    // reference-like text must outscore OOV soup (the gate's point)
    assert(out(10L)._2 > out(12L)._2)
  }

  test("docs below two tokens are out of scope; an empty reference " +
      "train split refuses instead of scoring everything zero") {
    val out = TextAnalysis.refPerplexityOf(
      Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text"), model)
    assert(out.count() == 0)
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.refLmTrainOf(tagged((1L, "val", true, "a b")))
    }
    assert(ex.getMessage.contains("reference LM training split"))
  }

  test("the session memo hands q169 and q170 the SAME trained " +
      "artifact") {
    val a = TextAnalysis.refLmModelFor(spark, sf0001)
    val b = TextAnalysis.refLmModelFor(spark, sf0001)
    assert(a eq b)
  }

  test("q170 reconciles with q167 per language, terciles are " +
      "balanced, and the registered form equals a pure-form rebuild") {
    val out = Warc.ccnetBuckets(spark, sf0001).collect()
    val langs = Warc.crawlLanguages(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLang = out.groupBy(_.getString(0))
    assert(byLang.keySet == langs.keySet)
    for ((lang, rows) <- byLang) {
      assert(rows.map(_.getLong(2)).sum == langs(lang)._1,
        s"$lang doc total")
      assert(rows.map(_.getLong(3)).sum == langs(lang)._2,
        s"$lang token total")
      // ntile(3): bucket sizes differ by at most one, all three
      // buckets present once the language has three docs
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang tercile skew: $sizes")
      if (langs(lang)._1 >= 3)
        assert(rows.map(_.getString(1)).toSet ==
          Set("head", "middle", "tail"))
    }
    // independent path: pure-from-blobs admission, from-scratch pairs,
    // and a model trained from the spec's OWN tagged-frame definition
    // (pinning the reference/split contract against drift)
    val docs = Tables(spark, sf0001, "documents")
    val adm = Warc.crawlAdmittedOf(Warc.synthesizeWarcBlobsOf(docs))
      .localCheckpoint()
    val pairs = Dedup.ngramJaccardPairsOf(
        Dedup.shingleHashDfOf(docs), 0.8)
      .select(col("a"), col("b"))
    val freshModel = TextAnalysis.refLmTrainOf(
      Curate.splitAssign(
          docs.select(col("doc_id"), col("text"), col("source")),
          "doc_id", "graft", Curate.SplitFractions)
        .withColumn("is_ref", col("source").isin("src0", "src1")))
    val rebuilt = Warc.ccnetBucketsOf(Warc.crawlKeptOf(adm, pairs),
        docs, freshModel)
      .orderBy(col("pred_lang"), col("bucket")).collect()
    assert(out.map(_.toString).toSeq == rebuilt.map(_.toString).toSeq)
  }

  test("per-language models: the same surface word counts separately " +
      "per language, and scoring routes by PREDICTED language") {
    // "die" is a common article in de and a rare verb in en — the
    // reason CCNet trains per-language models at all
    val m = TextAnalysis.langLmTrainOf(
      tagged(
        (1L, "train", true, "die katze die maus die"),
        (2L, "train", true, "die hard fans cheer loudly"),
        (3L, "val", true, "die die die")),
      Seq((1L, "de"), (2L, "en"), (3L, "de")).toDF("doc_id", "lang"))
    val uni = m.uni.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(uni(("de", "die")) == 3L && uni(("en", "die")) == 1L)
    val scal = m.scal.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // de: N=5 V=3 -> m=9; en: N=5 V=5 -> m=11
    assert(scal == Map("de" -> 9L, "en" -> 11L))
    // one text, two routings: (die, katze) is a seen de bigram
    // (c2=1, cp=3, cw=1 under de) but fully unseen under en
    // (cp=1, cw=0, c2=0)
    val out = TextAnalysis.langPerplexityOf(
      Seq((10L, "die katze", "de"), (11L, "die katze", "en"))
        .toDF("doc_id", "text", "pred_lang"), m)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(10L) == lpMicro(7L * 1 * 9 + 3L * (1 + 1) * 3, 10L * 3 * 9))
    assert(out(11L) == lpMicro(7L * 0 * 11 + 3L * (0 + 1) * 1, 10L * 1 * 11))
    // a predicted language the reference cannot model is refused
    val none = TextAnalysis.langPerplexityOf(
      Seq((12L, "die katze", "xx")).toDF("doc_id", "text", "pred_lang"), m)
    assert(none.count() == 0)
  }

  test("a single-language reference collapses to the q169 single " +
      "model: identical scores") {
    val rows = Seq(
      (1L, "train", true, "a b a"),
      (2L, "train", true, "a b c"),
      (3L, "train", false, "z z z"))
    val labels = rows.map(r => (r._1, "en")).toDF("doc_id", "lang")
    val lm = TextAnalysis.langLmTrainOf(tagged(rows: _*), labels)
    val docs = Seq((10L, "a b"), (11L, "q b"), (12L, "c a b q"))
      .toDF("doc_id", "text")
    val single = TextAnalysis.refPerplexityOf(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val perLang = TextAnalysis.langPerplexityOf(
        docs.withColumn("pred_lang", lit("en")), lm)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(single == perLang)
  }

  test("q173 reconciles with q167: exactly the survivors whose " +
      "predicted language the reference models, each scored once") {
    val out = Warc.langPerplexity(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val modeled = TextAnalysis.langLmModelFor(spark, sf0001)
      .scal.collect().map(_.getString(0)).toSet
    val perLang = Warc.crawlLanguages(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy(_.getString(1)).map { case (l, rs) =>
      l -> rs.length.toLong
    }
    // every scored language is reference-modeled, and its doc count
    // equals q167's survivor count for that language (survivors all
    // clear the >= 20-token gate, so none drop for lack of a
    // transition)
    assert(got.keySet.subsetOf(modeled))
    for ((l, n) <- got) assert(n == perLang(l), s"$l count")
    assert(got.keySet == perLang.keySet.intersect(modeled))
  }

  test("q174 equals an independent Scala tercile walk over q173's " +
      "per-doc scores, with token mass reconciled against the " +
      "survivor flags") {
    val ppl = Warc.langPerplexity(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    val keptToks = Warc.crawlLanguages(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // independent walk: per language, sort (score desc, doc_id) and
    // deal ntile(3) buckets (first n mod 3 buckets one larger)
    var expected = Map.empty[(String, String), (Long, Long)]
    val docToks = Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((lang, rs) <- ppl.groupBy(_._2)) {
      val ordered = rs.sortBy(r => (-r._3, r._1))
      val n = ordered.length
      val base = n / 3; val extra = n % 3
      var i = 0
      for ((b, name) <- Seq(1 -> "head", 2 -> "middle", 3 -> "tail")) {
        val sz = base + (if (b <= extra) 1 else 0)
        val slice = ordered.slice(i, i + sz); i += sz
        if (slice.nonEmpty)
          expected += (lang, name) ->
            (slice.length.toLong, slice.map(r => docToks(r._1)).sum)
      }
    }
    val got = Warc.ccnetLangBuckets(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // languages the reference models carry ALL their q167 survivor
    // token mass into buckets (nothing lost but the refused languages)
    for ((lang, _) <- ppl.groupBy(_._2))
      assert(got.filter(_._1._1 == lang).values.map(_._2).sum ==
        keptToks(lang), s"$lang token mass")
  }

  test("q175 routes every survivor exactly once: 'lang' rows equal " +
      "q173 verbatim, 'mixed' rows equal q169's scores for those " +
      "docs, and coverage equals the q167 survivor total") {
    val out = Warc.routedPerplexity(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val total = Warc.crawlLanguages(spark, sf0001).collect()
      .map(_.getLong(1)).sum
    assert(out.length.toLong == total)
    val (langRows, mixedRows) =
      out.partition(_.getString(5) == "lang")
    assert(mixedRows.nonEmpty, "fixture must exercise the fallback")
    val q173rows = Warc.langPerplexity(spark, sf0001).collect()
      .map(r => r.toSeq).toSet
    assert(langRows.map(_.toSeq.dropRight(1)).toSet == q173rows)
    val q169scores = TextAnalysis.refPerplexity(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (r <- mixedRows)
      assert(q169scores(r.getLong(0)) == (r.getLong(2), r.getLong(3)),
        s"doc ${r.getLong(0)} mixed score")
  }

  test("plan shape: scoring joins the model by BROADCAST only — " +
      "three broadcast joins, zero sort-merge joins") {
    val df = TextAnalysis.refPerplexityOf(
      Tables(spark, sf0001, "documents"),
      TextAnalysis.refLmModelFor(spark, sf0001))
    val plan = df.queryExecution.executedPlan.toString()
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
    assert(bhj == 3, s"expected 3 broadcast joins, got $bhj:\n$plan")
    assert(smj == 0, s"crawl-sized side must never sort-shuffle:\n$plan")
  }
}
