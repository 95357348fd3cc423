package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Outlink (href) extraction — the second markup primitive next to
  * [[HtmlBlocks]]: one linear scan collecting every `<a>` element's
  * href attribute value, in document order, duplicates preserved (the
  * caller decides whether a repeated link counts once or twice). The
  * link-graph build step of a crawl pipeline: extract → resolve →
  * edge list → degree/rank ([[graft.ext.Boilerplate.linkGraphOf]],
  * [[graft.ops.PageRank]]).
  *
  * Attribute parsing rules (never throws; same soup posture as
  * HtmlBlocks): attribute name matched case-insensitively and only
  * inside `<a ...>` open tags; `href="v"`, `href='v'`, and unquoted
  * `href=v` (terminated by whitespace or `>`) all accepted; a missing
  * or empty href contributes nothing; `<a>` inside script/style or
  * comments is NOT scanned (those regions are skipped whole); entities
  * are not decoded (same contract as HtmlBlocks).
  */
case class HtmlLinks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_links requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_links"

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlLinks.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlLinks = copy(child = newChild)
}

object HtmlLinks {

  /** Extract the href value from the inside of an `<a ...>` tag body
    * (the text between `<` and `>`, leading "a" included). Returns null
    * when absent/empty.
    *
    * Parses attributes LEFT-TO-RIGHT at name positions, consuming each
    * quoted value whole — a substring scan for "href" would accept the
    * word occurring inside another attribute's value (e.g.
    * `<a title="see href = bad" href="/x">`) and return garbage.
    * Duplicate hrefs: the first occurrence wins (browser behavior);
    * a valueless bare `href` counts as that first occurrence and
    * contributes nothing. */
  /** [[hrefOf]] exposed to [[HtmlAnchors]] so both expressions share
    * one attribute-parsing contract. */
  private[functions] def hrefShared(tagBody: String): String =
    hrefOf(tagBody)

  private def hrefOf(tagBody: String): String = {
    val n = tagBody.length
    var i = 0
    // skip the tag name itself so "href" as a (bogus) tag can't match
    while (i < n && Character.isLetterOrDigit(tagBody.charAt(i))) i += 1
    while (i < n) {
      // inter-attribute filler: whitespace and self-closing slashes
      while (i < n && (Character.isWhitespace(tagBody.charAt(i)) ||
        tagBody.charAt(i) == '/')) i += 1
      if (i >= n) return null
      val nameStart = i
      while (i < n && !Character.isWhitespace(tagBody.charAt(i)) &&
        tagBody.charAt(i) != '=') i += 1
      val name = tagBody.substring(nameStart, i).toLowerCase
      while (i < n && Character.isWhitespace(tagBody.charAt(i))) i += 1
      if (i < n && tagBody.charAt(i) == '=') {
        i += 1
        while (i < n && Character.isWhitespace(tagBody.charAt(i))) i += 1
        if (i >= n) return null
        val q = tagBody.charAt(i)
        val (start, endIdx, next) =
          if (q == '"' || q == '\'') {
            val e = tagBody.indexOf(q, i + 1)
            if (e < 0) (i + 1, n, n) else (i + 1, e, e + 1)
          } else {
            var e = i
            while (e < n && !Character.isWhitespace(tagBody.charAt(e))) e += 1
            (i, e, e)
          }
        if (name == "href") {
          val v = tagBody.substring(start, endIdx)
          return if (v.isEmpty) null else v
        }
        i = next // the quoted value is consumed whole, never re-scanned
      } else if (name == "href") {
        return null // bare href with no value — first occurrence wins
      }
    }
    null
  }

  /** Called from generated code. */
  def compute(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = ArrayBuffer.empty[Any]
    var skipUntil: String = null
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') i += 1
      else if (skipUntil == null && s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (skipUntil == null && i + 1 < n && s.charAt(i + 1) == '!') {
        val e = s.indexOf('>', i)
        i = if (e < 0) n else e + 1
      } else {
        val e = s.indexOf('>', i)
        if (e < 0) i = n
        else {
          val inner = s.substring(i + 1, e)
          val closing = inner.startsWith("/")
          val body = if (closing) inner.substring(1) else inner
          var k = 0
          while (k < body.length && Character.isLetterOrDigit(body.charAt(k)))
            k += 1
          val tag = body.substring(0, k).toLowerCase
          if (tag.isEmpty) i += 1 // literal '<', same rule as HtmlBlocks
          else {
            if (skipUntil != null) {
              if (closing && tag == skipUntil) skipUntil = null
            } else if (tag == "script" || tag == "style") {
              if (!closing && !inner.trim.endsWith("/")) skipUntil = tag
            } else if (tag == "a" && !closing) {
              val href = hrefOf(inner)
              if (href != null) out += UTF8String.fromString(href)
            }
            i = e + 1
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: `html_links($"html")`. */
  def html_links(c: Column): Column =
    ColumnBridge.column(HtmlLinks(ColumnBridge.expression(c)))
}
