package graft.functions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language char-trigram scores as one custom Catalyst expression:
  * a single normalization pass over the text, then one hash-map lookup
  * per trigram position accumulating all languages' weights at once.
  * Output: array<double> of mean trigram weight per language, in
  * [[LangProfiles.langs]] order.
  *
  * This replaces a compositional `aggregate(trigrams, ..., element_at(
  * mapLiteral, t))` fold: Catalyst's map-literal lookup is a LINEAR scan
  * of the 300-entry profile, per trigram, per language — measured 30.6 s
  * for 5 000 documents at sf0.1 (≈6 ms/doc). One shared HashMap keyed by
  * trigram with a weight vector per entry makes scoring O(trigrams), not
  * O(trigrams × profile × languages). Codegen delegates to a static
  * helper so the expression stays inside whole-stage codegen spans.
  */
case class TrigramLangScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_lang_scores requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "trigram_lang_scores"

  override protected def nullSafeEval(input: Any): Any =
    LangProfiles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangProfiles.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TrigramLangScores = copy(child = newChild)
}

/** Ranked char-trigram language profiles (Cavnar & Trenkle, "N-Gram-Based
  * Text Categorization", 1994: rank-weighted trigram overlap). Seed
  * corpora: Article 1 of the Universal Declaration of Human Rights
  * (public domain, the standard multilingual seed text) plus each
  * language's highest-frequency function words — function words dominate
  * character-trigram statistics, which is why trigram profiles
  * discriminate. */
object LangProfiles {

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

  /** Language codes in score-array order (sorted for determinism). */
  val langs: Seq[String] = seedTexts.map(_._1).sorted

  private val nonLetter = Pattern.compile("[^\\p{L}]+")

  /** Shared normalization for profile building and scoring: lowercase,
    * non-letters → space, collapse runs, pad with one space each side so
    * word-boundary trigrams exist. */
  private def normalize(s: String): String =
    " " + nonLetter.matcher(s.toLowerCase(Locale.ROOT))
      .replaceAll(" ").trim + " "

  private def trigramsOf(s: String): Seq[String] = {
    val t = normalize(s)
    (0 to t.length - 3).map(i => t.substring(i, i + 3))
  }

  private val profileK = 300

  private val rankedByLang: Map[String, Seq[(String, Int)]] =
    seedTexts.toMap.map { case (lang, txt) =>
      val ranked = trigramsOf(txt)
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(profileK)
      val k = ranked.size
      lang -> ranked.zipWithIndex.map { case ((t, _), i) => t -> (k - i) }
    }

  /** Integer rank weights (Cavnar-Trenkle rank k−i, no division): the
    * engine-portable form — scores derived from these by integer
    * arithmetic are bit-identical in any engine, which is what lets
    * q30 sit under a SQL oracle with the profiles as a VALUES CTE. */
  val profilesInt: Map[String, Map[String, Int]] =
    rankedByLang.map { case (l, s) => l -> s.toMap }

  /** Per-language ranked profiles: top-K trigrams of the seed corpus,
    * rank mapped to a linear weight in (0,1]. Exposed for tests. */
  val profiles: Map[String, Map[String, Double]] =
    rankedByLang.map { case (l, s) =>
      val k = s.size
      l -> s.map { case (t, w) => t -> w.toDouble / k }.toMap
    }

  /** DuckDB VALUES rows `('lang', 'trigram', weight)` over every
    * profile entry — the oracle-side twin of [[profilesInt]]. */
  def profilesSqlValues: String =
    rankedByLang.toSeq.sortBy(_._1).flatMap { case (lang, entries) =>
      entries.map { case (tg, w) =>
        s"('$lang', '${tg.replace("'", "''")}', $w)"
      }
    }.mkString(",\n         ")

  /** DuckDB VALUES rows `('lang', k)` — per-language profile sizes. */
  def profileSizesSqlValues: String =
    langs.map(l => s"('$l', ${profilesInt(l).size})").mkString(", ")

  /** Integer twin of [[lookup]]: trigram → rank-weight vector. */
  private val lookupInt: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    for ((lang, prof) <- profilesInt; (tg, w) <- prof) {
      val arr = m.computeIfAbsent(tg, _ => new Array[Long](langs.length))
      arr(langs.indexOf(lang)) = w.toLong
    }
    m
  }

  /** Integer weight sums per language over the text's trigrams, plus
    * the trigram position count as the LAST element — the sufficient
    * statistics q30 derives its integer scores from; called from
    * generated code. */
  def computeSums(text: UTF8String): ArrayData = {
    val s = normalize(text.toString)
    val nL = langs.length
    val out = new Array[Long](nL + 1)
    var total = 0L
    var i = 0
    val last = s.length - 3
    while (i <= last) {
      val w = lookupInt.get(s.substring(i, i + 3))
      if (w != null) {
        var j = 0
        while (j < nL) { out(j) += w(j); j += 1 }
      }
      total += 1
      i += 1
    }
    out(nL) = total
    new GenericArrayData(out)
  }

  /** One lookup table over all languages: trigram → weight vector in
    * [[langs]] order (0.0 where the trigram is not in that profile). */
  private val lookup: java.util.HashMap[String, Array[Double]] = {
    val m = new java.util.HashMap[String, Array[Double]]()
    for ((lang, prof) <- profiles; (tg, w) <- prof) {
      val arr = m.computeIfAbsent(tg, _ => new Array[Double](langs.length))
      arr(langs.indexOf(lang)) = w
    }
    m
  }

  /** Mean profile weight per language over the text's trigrams; called
    * from generated code. */
  def compute(text: UTF8String): ArrayData = {
    val s = normalize(text.toString)
    val nL = langs.length
    val sums = new Array[Double](nL)
    var total = 0
    var i = 0
    val last = s.length - 3
    while (i <= last) {
      val w = lookup.get(s.substring(i, i + 3))
      if (w != null) {
        var j = 0
        while (j < nL) { sums(j) += w(j); j += 1 }
      }
      total += 1
      i += 1
    }
    val denom = math.max(total, 1).toDouble
    val out = new Array[Double](nL)
    var j = 0
    while (j < nL) { out(j) = sums(j) / denom; j += 1 }
    new GenericArrayData(out)
  }

  /** Column API: `trigram_lang_scores($"text")`. */
  def trigram_lang_scores(c: Column): Column =
    ColumnBridge.column(TrigramLangScores(ColumnBridge.expression(c)))

  /** Column API: `trigram_lang_score_sums($"text")` — integer sums +
    * trigram count (see [[computeSums]]). */
  def trigram_lang_score_sums(c: Column): Column =
    ColumnBridge.column(TrigramLangScoreSums(ColumnBridge.expression(c)))
}

/** Integer-sum twin of [[TrigramLangScores]]: array<long> of per-language
  * rank-weight sums in [[LangProfiles.langs]] order, with the trigram
  * position count appended — no division anywhere, so downstream scoring
  * is exact integer arithmetic an oracle engine reproduces. */
case class TrigramLangScoreSums(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_lang_score_sums requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_lang_score_sums"

  override protected def nullSafeEval(input: Any): Any =
    LangProfiles.computeSums(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangProfiles.computeSums($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TrigramLangScoreSums = copy(child = newChild)
}
