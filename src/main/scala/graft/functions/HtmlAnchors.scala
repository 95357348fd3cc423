package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** (href, anchor-text) pair extraction — the third markup primitive
  * next to [[HtmlBlocks]] and [[HtmlLinks]]: one linear scan emitting,
  * for every `<a>` element with a non-empty href, the link target AND
  * the VISIBLE text between the open tag and its close. Anchor text is
  * the classic relevance signal of web IR (it describes the TARGET
  * page, not the source — the signal behind anchor-text pretraining
  * corpora and link-based retrieval labels), which `html_links` alone
  * throws away.
  *
  * Text rules (same soup posture as the siblings; never throws):
  *   - nested markup inside the anchor contributes its text
  *     (`<a>Hello <b>World</b></a>` → "Hello World"); comments and
  *     script/style regions inside contribute nothing;
  *   - whitespace runs collapse to one space, leading/trailing
  *     trimmed; an anchor with no visible text yields "";
  *   - a new `<a>` implicitly closes an open one (browser behavior —
  *     nested anchors are invalid HTML); EOF closes an open anchor;
  *   - href parsing is [[HtmlLinks]]'s attribute walk (quoted values
  *     consumed whole, first `href` wins, entities not decoded).
  */
case class HtmlAnchors(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_anchors requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(HtmlAnchors.pairType,
    containsNull = false)
  override def prettyName: String = "html_anchors"

  override protected def nullSafeEval(input: Any): Any =
    HtmlAnchors.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlAnchors.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlAnchors = copy(child = newChild)
}

object HtmlAnchors {

  val pairType: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false)))

  /** Collapse whitespace runs to single spaces and trim. */
  private def collapse(sb: StringBuilder): String = {
    val out = new StringBuilder(sb.length)
    var pendingSpace = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (Character.isWhitespace(c)) { if (out.nonEmpty) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Called from generated code. Mirrors [[HtmlLinks.compute]]'s tag
    * walk, adding anchor-text accumulation between `<a>` and its
    * close. */
  def compute(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = ArrayBuffer.empty[Any]
    var skipUntil: String = null
    var openHref: String = null
    val text = new StringBuilder
    def closeAnchor(): Unit = {
      if (openHref != null) {
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromString(openHref),
          UTF8String.fromString(collapse(text))))
        openHref = null
      }
      text.setLength(0)
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') {
        if (skipUntil == null && openHref != null) text.append(c)
        i += 1
      } else if (skipUntil == null && s.startsWith("<!--", i)) {
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
          if (tag.isEmpty) {
            // literal '<': visible text, same rule as the siblings
            if (skipUntil == null && openHref != null) text.append(c)
            i += 1
          } else {
            if (skipUntil != null) {
              if (closing && tag == skipUntil) skipUntil = null
            } else if (tag == "script" || tag == "style") {
              if (!closing && !inner.trim.endsWith("/")) skipUntil = tag
            } else if (tag == "a") {
              closeAnchor() // closes on </a> AND on a nested <a>
              if (!closing) openHref = HtmlAnchors.hrefOf(inner)
            }
            i = e + 1
          }
        }
      }
    }
    closeAnchor() // EOF closes an open anchor
    new GenericArrayData(out.toArray)
  }

  /** [[HtmlLinks]]'s attribute walk, shared verbatim. */
  private def hrefOf(tagBody: String): String = HtmlLinks.hrefShared(tagBody)

  /** Column API: `html_anchors($"html")`. */
  def html_anchors(c: Column): Column =
    ColumnBridge.column(HtmlAnchors(ColumnBridge.expression(c)))
}
