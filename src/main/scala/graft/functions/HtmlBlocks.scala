package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-scan HTML block segmentation for the boilerplate-extraction
  * operator ([[graft.ext.Boilerplate]]) — the markup-aware primitive a
  * web-corpus pipeline runs before dedup/quality (jusText, Pomikálek
  * 2011; trafilatura, Barbaresi 2021: classify BLOCK-level segments,
  * then keep the content blocks). Spark has no HTML functions, and an
  * external parser library is neither available here nor necessary:
  * block segmentation + per-block link/text accounting is one linear
  * scan, implemented as a codegen'd expression so it runs inside
  * whole-stage codegen on the corpus scan.
  *
  * Returns `array<struct<tag, text, n_chars, link_chars, n_words>>` —
  * one row per closed block-level element, in document order:
  *   - `tag`: lowercased element name (p, div, nav, footer, title, …);
  *   - `text`: the block's visible text, whitespace-normalized (runs
  *     collapsed to one space, trimmed); nested INLINE markup (<a>,
  *     <b>, <span>, …) is stripped into the enclosing block;
  *   - `n_chars`: count of non-whitespace visible chars (whitespace-
  *     independent so the density ratio is layout-invariant);
  *   - `link_chars`: the subset of `n_chars` inside <a> elements — the
  *     numerator of jusText's link-density signal;
  *   - `n_words`: whitespace-delimited token count.
  *
  * Parsing rules (never throws — a web crawl is mostly tag soup):
  * nested block elements attribute text to the INNERMOST open block and
  * emit children before parents; text outside any block element (the
  * html/head/body wrappers) is ignored; `<script>`/`<style>` content is
  * skipped entirely; comments and doctypes are skipped; void elements
  * (br, hr, img, …) and explicit `<x/>` self-closes never open a block;
  * unclosed blocks close at end of input; a stray close tag with no
  * matching open is ignored; a `<` not followed by a tag name is
  * literal text; attributes are ignored; entities are NOT decoded
  * (documented — decoding is a separate normalization pass, cf.
  * [[NfcNormalize]]).
  */
case class HtmlBlocks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_blocks requires a string argument, got ${child.dataType}")

  override def dataType: DataType = HtmlBlocks.schema
  override def prettyName: String = "html_blocks"

  override protected def nullSafeEval(input: Any): Any =
    HtmlBlocks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlBlocks.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlBlocks = copy(child = newChild)
}

object HtmlBlocks {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false))),
    containsNull = false)

  /** Block-level elements that open a segment. The jusText block set:
    * structural containers plus headings, list/table cells, and title
    * (chrome by tag, but still a block so the classifier can see it). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "nav", "footer", "header", "aside", "article", "section",
    "main", "title", "li", "ul", "ol", "table", "tr", "td", "th",
    "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6")

  private final class Block(val tag: String) {
    val text = new java.lang.StringBuilder(64)
    var nChars = 0
    var linkChars = 0
    var nWords = 0
    private var pendingSpace = false
    def appendVisible(ch: Char, inLink: Boolean): Unit = {
      if (Character.isWhitespace(ch)) {
        if (text.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) { text.append(' '); pendingSpace = false }
        if (text.length() == 0 || text.charAt(text.length() - 1) == ' ')
          nWords += 1
        text.append(ch)
        nChars += 1
        if (inLink) linkChars += 1
      }
    }
  }

  /** Called from generated code. */
  def compute(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = ArrayBuffer.empty[InternalRow]
    val stack = ArrayBuffer.empty[Block]
    var linkDepth = 0
    var skipUntil: String = null // non-null while inside <script>/<style>
    var i = 0

    def emit(b: Block): Unit =
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(b.tag), UTF8String.fromString(b.text.toString),
        b.nChars, b.linkChars, b.nWords))

    def closeBlock(tag: String): Unit = {
      // close the innermost matching open block, emitting everything
      // popped on the way (mis-nested children close with their parent);
      // no matching open = stray close tag, ignored
      var idx = stack.length - 1
      while (idx >= 0 && stack(idx).tag != tag) idx -= 1
      if (idx >= 0) {
        var j = stack.length - 1
        while (j >= idx) { emit(stack(j)); stack.remove(j); j -= 1 }
      }
    }

    def visible(c: Char): Unit =
      if (skipUntil == null && stack.nonEmpty)
        stack.last.appendVisible(c, linkDepth > 0)

    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') {
        visible(c)
        i += 1
      } else if (skipUntil == null && s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (skipUntil == null && i + 1 < n && s.charAt(i + 1) == '!') {
        val e = s.indexOf('>', i) // doctype and friends
        i = if (e < 0) n else e + 1
      } else {
        val e = s.indexOf('>', i)
        if (e < 0) { i = n } // unterminated trailing tag: drop the rest
        else {
          val inner = s.substring(i + 1, e)
          val closing = inner.startsWith("/")
          val body = if (closing) inner.substring(1) else inner
          // the tag name must start IMMEDIATELY after '<' or '</' —
          // "< b", "<>", "</ x": literal text, per the HTML spec
          var k = 0
          while (k < body.length && Character.isLetterOrDigit(body.charAt(k)))
            k += 1
          val tag = body.substring(0, k).toLowerCase
          if (tag.isEmpty) {
            visible('<')
            i += 1
          } else {
            val selfClose = inner.trim.endsWith("/")
            if (skipUntil != null) {
              if (closing && tag == skipUntil) skipUntil = null
            } else if (tag == "script" || tag == "style") {
              if (!closing && !selfClose) skipUntil = tag
            } else if (tag == "a") {
              if (closing) { if (linkDepth > 0) linkDepth -= 1 }
              else if (!selfClose) linkDepth += 1
            } else if (BlockTags.contains(tag)) {
              if (closing) closeBlock(tag)
              else if (!selfClose) stack += new Block(tag)
            } // void / unknown / inline tags: stripped
            i = e + 1
          }
        }
      }
    }
    var j = stack.length - 1 // unclosed blocks close at EOF, innermost first
    while (j >= 0) { emit(stack(j)); j -= 1 }
    new GenericArrayData(out.toArray)
  }

  /** Column API: `html_blocks($"html")`. */
  def html_blocks(c: Column): Column =
    ColumnBridge.column(HtmlBlocks(ColumnBridge.expression(c)))
}
