package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.Fingerprint64

class TextSpec extends SparkSpecBase {

  test("fingerprint64 expression matches the reference Scala implementation") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "the quick brown fox")
    val got = texts.toDF("text")
      .select(Fingerprint64.fingerprint64(col("text")))
      .collect().map(_.getLong(0))
    val want = texts.map(t => Fingerprint64.hashBytes(t.getBytes("UTF-8")))
    assert(got.toSeq == want)
  }

  test("fingerprint64 survives codegen and interpreted paths identically") {
    import spark.implicits._
    val df = Seq.fill(100)("codegen probe text").toDF("text")
    // wholestage on (default) — large enough to codegen
    val a = df.select(Fingerprint64.fingerprint64(col("text"))).distinct().collect()
    assert(a.length == 1)
    assert(a(0).getLong(0) ==
      Fingerprint64.hashBytes("codegen probe text".getBytes("UTF-8")))
  }

  test("fingerprint64 rejects non-string input at analysis time") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(Fingerprint64.fingerprint64(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("fingerprint64"))
  }

  test("quality metrics: stop_ratio and token counts are consistent") {
    val q = TextAnalysis.quality(spark, sf0001)
    val bad = q.filter(
      col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
        col("n_uniq_tokens") > col("n_tokens")).count()
    assert(bad == 0)
  }

  test("langId emits a prediction and bounded confidence for every doc") {
    val l = TextAnalysis.langId(spark, sf0001)
    assert(l.count() == 500)
    assert(l.filter(col("conf_micro") < 0 ||
      col("conf_micro") > 1000000).count() == 0)
    assert(l.filter(col("pred_lang").isNull).count() == 0)
  }

  test("nfc_normalize composes decomposed forms and flags changed docs") {
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc_normalize
    val composed = "café"            // é as one codepoint
    val decomposed = "café"         // e + combining acute
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), nfc_normalize(col("text")).as("n"),
        (nfc_normalize(col("text")) =!= col("text")).as("chg"))
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got(1L) == ((composed, true)))  // decomposed -> composed
    assert(got(2L) == ((composed, false)))
    assert(got(3L) == (("plain ascii", false)))
    // digest dedup now sees the two spellings as one document
    assert(got(1L)._1 == got(2L)._1)
  }

  test("unigram logprob scores common-vocabulary docs above rare-token soup") {
    val lp = TextAnalysis.unigramLogprob(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(lp.nonEmpty)
    // bounds: every per-token ln p is in (ln(1/total), 0); the mean too
    assert(lp.values.forall { case (_, s) => s < 0.0 })
    // hand-computed check on a crafted corpus: p(common)=4/6, each rare
    // token 1/6; both docs share the same shape so both get the same
    // score, equal to the hand arithmetic with the same rounding ladder
    import spark.implicits._
    val tiny = Seq((1L, "common common rare1"), (2L, "common common rare2"))
      .toDF("doc_id", "text")
    def r(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val expected =
      r((r(math.log(4 / 6.0), 6) * 2 + r(math.log(1 / 6.0), 6)).toDouble / 3, 4)
        .toDouble
    val got = TextAnalysis.unigramLogprobOf(tiny)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(got == Map(1L -> expected, 2L -> expected))
  }

  test("scrub redacts urls, emails and ips with correct counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "visit https://example.com/a?b=1 or mail bob@example.org now"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 rebooted"),
      (3L, "no pii here at all"),
      // the URL embeds an email-shaped and ip-shaped substring — must be
      // redacted as ONE url, not partially rewritten by later passes
      (4L, "see http://u@example.com/10.0.0.1 ok")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scrubOf(df).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (("visit <URL> or mail <EMAIL> now", 1L, 1L, 0L)))
    assert(got(2L) == (("server at <IP> and <IP> rebooted", 0L, 0L, 2L)))
    assert(got(3L) == (("no pii here at all", 0L, 0L, 0L)))
    assert(got(4L) == (("see <URL> ok", 1L, 1L, 1L)))
  }

  test("whitespace normalization class is the 5-char cross-engine set " +
      "(vertical tab deliberately NOT collapsed — RE2's \\s excludes it)") {
    import spark.implicits._
    val got = Seq("a\u000Bb c\td\ne\rf\fg  h").toDF("text")
      .select(regexp_replace(col("text"), TextAnalysis.WsClass, " "))
      .head().getString(0)
    // tab/newline/cr/ff/runs collapse; U+000B passes through untouched,
    // exactly as DuckDB's RE2 would — a Java \s here would diverge
    assert(got == "a\u000Bb c d e f g h")
  }

  test("Misra-Gries retains every token above n/(k+1), counts are lower " +
      "bounds, and the q76 recount equals the exact top-k") {
    import spark.implicits._
    import graft.functions.MisraGries.misra_gries
    // Zipf-ish stream: token_i appears 2000/i times, i=1..40; n≈8550.
    // With k=16 the retention bar is n/17 ≈ 503 -> tokens 1..3 MUST
    // survive the sketch (freq 2000, 1000, 666)
    val stream = (1 to 40).flatMap(i =>
      Seq.fill(2000 / i)(f"tok$i%02d"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    // shuffle deterministically so heavy tokens interleave, and spread
    // over 8 partitions so the MERGE path is exercised
    val df = new scala.util.Random(7).shuffle(stream).toDF("token")
      .repartition(8)
    val mg = df.agg(misra_gries(col("token"), 16)).head()
      .getMap[String, Long](0)
    assert(mg.size <= 16)
    val bar = n / 17
    exact.filter(_._2 > bar).keys.foreach { t =>
      assert(mg.contains(t), s"$t (freq ${exact(t)}) above bar $bar lost")
    }
    mg.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t sketch count $c exceeds true ${exact(t)}")
      assert(exact(t) - c <= bar + 1,
        s"$t undercount ${exact(t) - c} beyond guarantee $bar")
    }
    // candidates-then-recount = exact top-k on the documents corpus
    val got = TextAnalysis.heavyHitters(spark, sf0001, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val want = TextAnalysis.vocab(spark, sf0001, topK = 10)
      .select("token", "n_occurrences")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == want)
  }

  test("KMV sketch is exact below k and within theory error when full") {
    import spark.implicits._
    // below k: "x y z x y z" has 3 distinct 3-gram shingles
    // (x y z / y z x / z x y), k=16 -> est_micro IS the exact count
    val tiny = Seq((1L, "aa", "x y z x y z")).toDF("doc_id", "lang", "text")
    val exact = TextAnalysis.distinctEstimateOf(tiny, k = 16).head()
    // columns: lang, n_exact, n_sk, u_k, sk_md5, est_micro
    assert(exact.getLong(1) == 3L && exact.getLong(2) == 3L &&
      exact.getLong(5) == 3000000L)
    // full sketch at sf0.001: KMV std error is ~1/sqrt(k-2) = 6.3% at
    // k=256; gate each stratum at 4 sigma
    val rows = TextAnalysis.distinctEstimate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val relErr =
        math.abs(r.getLong(5) / 1e6 - r.getLong(1)) / r.getLong(1).toDouble
      assert(relErr < 0.25, s"lang ${r.getString(0)}: rel_err $relErr")
    }
    // at least one stratum must actually exercise the full-sketch path
    assert(rows.exists(_.getLong(1) > 256), rows.map(_.getLong(1)).toSeq)
  }

  test("langId identifies real-language sentences not in the seed corpora") {
    import spark.implicits._
    val fixtures = Seq(
      (1L, "en", "the weather was cold and the children walked to the " +
        "house with their mother in the evening"),
      (2L, "de", "der Hund und die Katze sind nicht im Haus weil das " +
        "Wetter heute sehr schön ist und die Kinder draußen spielen"),
      (3L, "es", "el perro y el gato están en la casa porque los niños " +
        "no quieren jugar en el jardín con sus amigos"),
      (4L, "fr", "le chien et le chat sont dans la maison parce que les " +
        "enfants ne veulent pas jouer dans le jardin avec leurs amis"),
      (5L, "it", "il cane e il gatto sono nella casa perché i bambini " +
        "non vogliono giocare in giardino con i loro amici"),
      (6L, "zh", "这是一个用中文写的句子，孩子们今天不想在花园里玩耍"),
      (7L, "und", "zzz qqq xxx kkk vvv www")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.langIdOf(fixtures).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "it", 6L -> "zh", 7L -> "und")
    assert(got == want)
  }

  test("dsirWeights favors target-language documents and counts tokens " +
      "like q64") {
    val docs = Tables(spark, sf001, "documents")
    val w = TextAnalysis.dsirWeights(spark, sf001)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    // every document scored exactly once
    assert(w.length == docs.count())
    // importance weights separate the target domain: the mean log-ratio
    // of English documents beats the mean of every other language
    val byLang = w.groupBy(_._4).map { case (l, rows) =>
      l -> rows.map(_._3).sum / rows.size
    }
    val en = byLang("en")
    byLang.filter(_._1 != "en").foreach { case (l, avg) =>
      assert(en > avg, s"en $en should beat $l $avg")
    }
    // token accounting identical to the q64 unigram pipeline
    val n64 = TextAnalysis.unigramLogprob(spark, sf001)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    w.foreach { case (id, n, _, _) => assert(n == n64(id)) }
  }

  test("bigram logprob sees word order where unigram cannot") {
    import spark.implicits._
    // a corpus dominated by one phrase pattern, then two probe docs
    // with IDENTICAL unigram content: in-order vs reversed word order
    val phrase = "the quick brown fox jumps"
    val corpus = (1L to 20L).map(i => (i, phrase)) ++ Seq(
      (100L, "the quick brown fox jumps"),           // fluent probe
      (101L, "jumps fox brown quick the"))           // scrambled probe
    val got = TextAnalysis.bigramLogprobOf(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(100L)._1 == 4L && got(101L)._1 == 4L)
    assert(got(100L)._2 > got(101L)._2 + 1.0,
      s"fluent ${got(100L)} must clearly outscore scrambled ${got(101L)}")
    // unigram is blind to the difference by construction
    val uni = TextAnalysis.unigramLogprobOf(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(100L) == uni(101L))
    // single-token docs have no transitions and drop from the output
    val single = TextAnalysis.bigramLogprobOf(
      Seq((1L, "hello")).toDF("doc_id", "text"))
    assert(single.count() == 0)
  }

  test("hashed linear classifier: margins are exact weight sums, OOV " +
      "features score zero, and the weights table is swappable") {
    import spark.implicits._
    import graft.functions.ShingleHashes.shingle_hashes_md5
    val docs = Seq(
      (1L, "a b c d"),   // features [a b c], [b c d]
      (2L, "a b c e"),   // shares [a b c] with doc 1
      (3L, "x y z w")    // all features unique to doc 3
    ).toDF("doc_id", "text")
    // hand-built weights: +7 for the shared feature, everything else OOV
    val shared = Seq("a b c").toDF("s")
      .select(explode(shingle_hashes_md5(col("s"), 3)).as("h"),
        lit(7L).as("wt"))
    val got = TextAnalysis.hashedLinearScoreOf(docs, shared)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((2L, 7L, true)))   // one in-vocab + one OOV
    assert(got(2L) == ((2L, 7L, true)))
    assert(got(3L) == ((2L, 0L, true)))   // all OOV -> margin 0
    // a different weights table flips the verdict without touching docs
    val negative = shared.select(col("h"), lit(-7L).as("wt"))
    val neg = TextAnalysis.hashedLinearScoreOf(docs, negative)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!neg(1L) && !neg(2L) && neg(3L))
  }

  test("token entropy: exact values on crafted docs, monotone in " +
      "diversity, and a driver-side recompute agrees on real data") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "a a a a a a"),          // one token -> H = 0
      (2L, "a b c d"),              // uniform over 4 -> H = ln 4
      (3L, "a a a b"),              // skewed -> between 0 and ln 4
      (4L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropyOf(crafted).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
    assert(got(1L)._1 == 0.0 && got(1L)._2 == "low")
    assert(got(2L)._1 == BigDecimal(math.log(4))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(3L)._1 > 0.0 && got(3L)._1 < got(2L)._1)
    assert(got(4L)._1 == 0.0)
    // real data: independent high-precision recompute within the micro
    // quantization error (each c·ln c term quantizes to ±5e-7 nat, so
    // the per-doc average stays within ~1e-4 after the 4dp round)
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap
    val entropies = TextAnalysis.tokenEntropyOf(
        Tables(spark, sf0001, "documents")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((id, text) <- docs.take(50)) {
      val toks = text.split(" ")
      val n = toks.length.toDouble
      val h = math.log(n) - toks.groupBy(identity).values
        .map(g => g.size * math.log(g.size)).sum / n
      assert(math.abs(entropies(id) - h) < 2e-4,
        s"doc $id: got ${entropies(id)}, want ~$h")
    }
  }

  test("reusable Of forms plan no global range sort (r10 sweep)") {
    val docs = Tables(spark, sf0001, "documents")
    val weights = docs.limit(1).select(
      explode(graft.functions.ShingleHashes.shingle_hashes_md5(
        col("text"), 3)).as("h"), lit(1L).as("wt"))
    val cases = Seq(
      "langIdOf" -> TextAnalysis.langIdOf(docs),
      "scrubOf" -> TextAnalysis.scrubOf(docs),
      "unigramLogprobOf" -> TextAnalysis.unigramLogprobOf(docs),
      "bigramLogprobOf" -> TextAnalysis.bigramLogprobOf(docs),
      "dsirWeightsOf" ->
        TextAnalysis.dsirWeightsOf(docs, col("lang") === "en"),
      "distinctEstimateOf" -> TextAnalysis.distinctEstimateOf(docs),
      "tokenEntropyOf" -> TextAnalysis.tokenEntropyOf(docs),
      "hashedLinearScoreOf" ->
        TextAnalysis.hashedLinearScoreOf(docs, weights))
    for ((name, df) <- cases) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("rangepartitioning"),
        s"$name plans a global range sort:\n${p.take(900)}")
    }
  }

  test("q122 vocabulary join broadcasts (executable form of the r9 " +
      "manual ExplainAudit check)") {
    val df = TextAnalysis.hashedClassifier(spark, sf0001)
    df.collect() // let AQE finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(900))
  }
}
