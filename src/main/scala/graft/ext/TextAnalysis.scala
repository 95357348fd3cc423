package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fingerprint64.fingerprint64

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics, quality scoring, language ID, and
  * document fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs), so each
  * operator is a narrow map over the corpus — embarrassingly parallel at
  * 100 TB, no shuffle at all until an aggregation is requested.
  */
object TextAnalysis {

  /** Whitespace tokenization. The corpus is single-space separated; a
    * BPE-ish fallback regex tokenizer is [[regexTokens]]. */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenizer: words, numbers, or single punctuation marks —
    * the classic BPE pre-tokenization shape. */
  def regexTokens(text: Column): Column =
    // drop the empty leading element regexp splits can produce
    filter(split(text, "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document quality metrics (length / vocabulary / stopword
    * signals) — SQL-expressible, oracled. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val w = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    d.select(
        col("doc_id"),
        length(col("text")).as("text_len"),
        size(w).as("n_tokens"),
        size(array_distinct(w)).as("n_uniq_tokens"),
        round(
          size(filter(w, t => array_contains(stopArr, t)))
            .cast("double") / size(w), 4).as("stop_ratio"),
        round(
          length(regexp_replace(col("text"), " ", ""))
            .cast("double") / size(w), 4).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[quality]]. */
  val qualityOracle: String =
    s"""SELECT doc_id, length(text) AS text_len,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
       round(len(list_filter(string_split(text, ' '),
         t -> list_contains([${stopwords.map("'" + _ + "'").mkString(",")}], t)))
         * 1.0 / len(string_split(text, ' ')), 4) AS stop_ratio,
       round(length(replace(text, ' ', ''))
         * 1.0 / len(string_split(text, ' ')), 4) AS avg_token_len
       FROM documents ORDER BY doc_id"""

  /** Seed corpora for the char-trigram language profiles: Article 1 of
    * the Universal Declaration of Human Rights (public domain, the
    * standard multilingual seed text) plus each language's highest-
    * frequency function words — function words dominate character-trigram
    * statistics, which is exactly why trigram profiles discriminate
    * (Cavnar & Trenkle, "N-Gram-Based Text Categorization", 1994). */
  private val seedTexts: Seq[(String, String)] = Seq(
    "en" -> ("All human beings are born free and equal in dignity and " +
      "rights. They are endowed with reason and conscience and should " +
      "act towards one another in a spirit of brotherhood. " +
      "the of and to in is was that for it with as his on be at by had"),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten " +
      "geboren. Sie sind mit Vernunft und Gewissen begabt und sollen " +
      "einander im Geist der Brüderlichkeit begegnen. " +
      "der die und in den von zu das mit sich des auf für ist im nicht ein"),
    "es" -> ("Todos los seres humanos nacen libres e iguales en dignidad " +
      "y derechos y, dotados como están de razón y conciencia, deben " +
      "comportarse fraternalmente los unos con los otros. " +
      "de la que el en y a los del se las por un para con no una su al"),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en dignité " +
      "et en droits. Ils sont doués de raison et de conscience et " +
      "doivent agir les uns envers les autres dans un esprit de " +
      "fraternité. " +
      "de la le et les des en un du une que est pour qui dans par sur au"),
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in dignità " +
      "e diritti. Essi sono dotati di ragione e di coscienza e devono " +
      "agire gli uni verso gli altri in spirito di fratellanza. " +
      "di e il la che a in un per è una sono le dei nel con si da come"))

  /** Shared normalization for profile building and doc scoring: lowercase,
    * non-letters → space, collapse runs, pad with one space each side so
    * word-boundary trigrams exist. Must match [[normChars]]. */
  private def normString(s: String): String =
    " " + s.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim + " "

  private def trigramsOfString(s: String): Seq[String] = {
    val t = normString(s)
    (0 to t.length - 3).map(i => t.substring(i, i + 3))
  }

  /** Ranked-trigram profiles: top-K trigrams of each seed corpus, rank
    * mapped to a linear weight in (0,1] (Cavnar-Trenkle's out-of-place
    * measure recast as a weighted-overlap score so it evaluates as one
    * codegen'd fold per language — no join, no shuffle). */
  private val profileK = 300
  private[ext] val trigramProfiles: Map[String, Map[String, Double]] =
    seedTexts.toMap.map { case (lang, txt) =>
      val ranked = trigramsOfString(txt)
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(profileK)
      val k = ranked.size
      lang -> ranked.zipWithIndex.map { case ((t, _), i) =>
        t -> (k - i).toDouble / k }.toMap
    }

  /** Column twin of [[normString]]. */
  private def normChars(text: Column): Column =
    concat(lit(" "),
      trim(regexp_replace(lower(text), "[^\\p{L}]+", " ")), lit(" "))

  /** Language-ID via char-trigram profile scoring plus a Unicode-script
    * gate: documents whose CJK-codepoint share exceeds 0.2 are Chinese
    * regardless of trigram evidence (Latin trigram profiles are
    * meaningless over Han text); otherwise predicted = argmax of
    * per-language mean trigram weight, 'und' when the best score is
    * below a floor. Deterministic; not oracle-expressible (argmax +
    * tie-break), so the driver records a rows-only check and the
    * value-level gate is TextSpec's crafted multilingual fixtures.
    *
    * Scale: the profiles are literal maps baked into the plan (~300
    * entries/lang), scoring is one `aggregate` fold per language inside
    * whole-stage codegen — a pure narrow map, no shuffle, no UDF. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdOf(Tables(spark, dir, "documents"))

  def langIdOf(d: DataFrame): DataFrame = {
    val langs = trigramProfiles.keys.toSeq.sorted
    val n = col("text")
    val cjkRatio = (length(n) - length(regexp_replace(n, "[\\u4e00-\\u9fff]", "")))
      .cast("double") / greatest(length(n), lit(1))
    val tg = col("_tg")
    val scores = langs.map { l =>
      val m = typedLit(trigramProfiles(l))
      l -> (aggregate(tg, lit(0.0),
        (acc, t) => acc + coalesce(element_at(m, t), lit(0.0)))
        / greatest(size(tg), lit(1)))
    }
    // bind the normalized string to its own column first — HOF lambdas
    // re-evaluate outer expressions per element (O(len²) regexp otherwise)
    val withTg = d.withColumn("_norm", normChars(n)).withColumn("_tg",
      transform(sequence(lit(1), greatest(length(col("_norm")) - 2, lit(0))),
        i => col("_norm").substr(i, lit(3))))
    val scored = withTg.select(
      (col("doc_id") +: col("lang").as("labeled_lang") +:
        cjkRatio.as("_cjk") +:
        scores.map { case (l, s) => s.as(s"score_$l") }): _*)
    val best = langs.foldLeft((lit("und"), lit(0.02))) {
      case ((bestLang, bestScore), l) =>
        val s = col(s"score_$l")
        (when(s > bestScore, lit(l)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }
    scored
      .select(col("doc_id"), col("labeled_lang"),
        when(col("_cjk") > 0.2, lit("zh")).otherwise(best._1).as("pred_lang"),
        round(when(col("_cjk") > 0.2, col("_cjk"))
          .otherwise(least(best._2, lit(1.0))), 4).as("confidence"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints via the custom codegen'd rolling-hash
    * expression — content identity for exact dedup and caching layers.
    * Rows-only check (the hash constant choice is engine-specific). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    d.select(col("doc_id"),
        fingerprint64(col("text")).as("fingerprint"),
        fingerprint64(lower(regexp_replace(col("text"), "\\s+", " ")))
          .as("normalized_fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Token counts with both tokenizers — oracled on the whitespace one. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    d.select(col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(regexTokens(col("text"))).as("n_re_tokens"))
      .orderBy(col("doc_id"))
  }

  val tokenCountsOracle: String =
    """SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(list_filter(string_split_regex(text, '[^\p{L}\p{N}]+'),
         t -> length(t) > 0)) AS n_re_tokens
       FROM documents ORDER BY doc_id"""
}
