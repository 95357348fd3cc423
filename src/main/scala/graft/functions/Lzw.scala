package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LZW compressed size of a document's UTF-8 bytes — the
  * compression-ratio quality signal of published training-data
  * pipelines (Dolma's gzip ratio, RedPajama-v2's `rps_doc_*` entropy
  * signals): machine-generated, templated, or highly repetitive text
  * compresses far below the ~0.5–0.7 ratio of natural prose, and a
  * near-1.0 ratio flags high-entropy noise (base64 blobs, minified
  * data). Unlike the n-gram repetition ratios (q50), the LZW dictionary
  * sees REPEATS AT ANY DISTANCE within its window — boilerplate
  * paragraphs hundreds of bytes apart still compress.
  *
  * The stream convention is exactly the GIF89a appendix algorithm our
  * video codec writes (MediaCodecs.gifLzwEncode — 8-bit symbols,
  * variable width from 9 bits, LSB-first packing, clear-code reset at
  * slot 4095, leading clear + trailing EOI, final partial byte padded):
  * [[LzwBytes]] COUNTS that stream without materializing it, and
  * LzwSpec pins `lzw_bytes(s) == gifLzwEncode(s.bytes).length` on
  * fuzzed inputs crossing every width boundary and the dictionary
  * reset. One narrow codegen'd map, zero shuffle, O(doc) time and
  * O(dict) = 4096 entries of memory per row.
  *
  * LZW is inherently sequential (each code depends on the dictionary
  * built by every previous byte), so q142 is rows-only the way BPE
  * (q82/q83) is — its exact integer twin is the byte-stream equality
  * pinned in LzwSpec, and the RATIO thresholds are corpus statistics,
  * not oracle material.
  */
object Lzw {

  /** Exact byte length of the GIF-convention LZW stream of `s`'s UTF-8
    * bytes; 0 for the empty string (a real stream would be 3 framing
    * bytes — clear+EOI — but an empty document has no ratio anyway).
    * Called from generated code. */
  def bytes(s: UTF8String): Int = {
    val data = s.getBytes
    if (data.length == 0) return 0
    val eoi = 257
    var outBytes = 0
    var nbits = 0
    var width = 9
    var maxCode1 = 1 << width
    var next = eoi + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    // counting twin of gifLzwEncode's write(): the code VALUE never
    // affects the length, only the current width does
    def write(): Unit = {
      nbits += width
      while (nbits >= 8) { outBytes += 1; nbits -= 8 }
      if (next >= maxCode1 && width < 12) { width += 1; maxCode1 = 1 << width }
    }
    write() // clear
    var prefix = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i) & 0xff
      val key = Integer.valueOf((prefix << 8) | c)
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        write()                 // prefix
        if (next >= 4095) {
          write()               // clear
          dict.clear()
          next = eoi + 1
          width = 9
          maxCode1 = 1 << width
        } else {
          dict.put(key, Integer.valueOf(next))
          next += 1
        }
        prefix = c
      }
      i += 1
    }
    write()   // prefix
    write()   // eoi
    if (nbits > 0) outBytes += 1
    outBytes
  }

  def lzw_bytes(c: Column): Column =
    ColumnBridge.column(LzwBytes(ColumnBridge.expression(c)))
}

case class LzwBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lzw_bytes requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lzw_bytes"
  override protected def nullSafeEval(input: Any): Any =
    Lzw.bytes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Lzw.bytes($c)")
  override protected def withNewChildInternal(
      newChild: Expression): LzwBytes = copy(child = newChild)
}
