package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-gram shingle *hashes* of a whitespace-tokenized text,
  * as one custom Catalyst expression: a single pass over the UTF-8 bytes
  * hashing each token (polynomial byte hash), combining k consecutive
  * token hashes (order-sensitive splitmix chain), then sort+dedupe.
  * Output: sorted array<bigint> of the distinct shingle hashes.
  *
  * This replaces the compositional
  * `array_distinct(transform(sequence(...), i -> array_join(slice(split(
  * text), i, k))))` pipeline, which allocates every token string, every
  * shingle string, and re-evaluates the token array inside the lambda —
  * at 100 TB the difference is one byte scan per document vs O(shingles)
  * string materializations. Codegen delegates to a static helper, so the
  * expression stays inside whole-stage codegen spans.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Portable twin of [[ShingleHashes]]: the per-shingle hash is the first
  * 60 bits of md5 of the shingle STRING — `('0x' || substr(md5(sh), 1,
  * 15))::BIGINT` in DuckDB, `conv(substring(md5(sh), 1, 15), 16, 10)` in
  * any ANSI engine — so every sketch built on it (MinHash, SimHash, KMV)
  * is reproducible outside Spark and can sit under a SQL oracle.
  *
  * Still a single byte-scan: because tokens are split on a single space
  * and k-grams re-join with a single space, each shingle's UTF-8 bytes
  * are EXACTLY a contiguous range of the source text's bytes — md5 runs
  * over [tokenStart(s), tokenEnd(s+k-1)) with no token or shingle string
  * ever materialized. 60 bits (not 64) because a 15-hex-digit parse
  * stays inside signed-BIGINT range in every engine; collision odds only
  * move from n²/2⁶⁵ to n²/2⁶¹. ~2-3× the polynomial hash's cost per
  * byte (md5 block arithmetic) — use [[ShingleHashes]] where
  * cross-engine reproducibility isn't needed. */
case class ShingleHashesMd5(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_md5 requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_md5"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.computeMd5(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.computeMd5($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesMd5 =
    copy(child = newChild)
}

/** Positional variant of [[ShingleHashes]]: hash of EVERY overlapping
  * k-gram window in token order — index i (0-based) is the window
  * starting at token i+1 — no sort, no dedupe. The input to
  * position-aware dedup (q120's exact-substring repeat spans), where
  * "where does this window sit in the document" is the payload and the
  * set-shaped output of [[ShingleHashes]] would destroy it. Same single
  * byte-scan, same order-sensitive chain hash, same codegen shape. */
case class ShingleHashesPos(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_pos requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_pos"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.computePos(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.computePos($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)
}

object ShingleHashes {

  /** Column API: `shingle_hashes($"text", 3)`. */
  def shingle_hashes(c: Column, k: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), k))

  /** Column API: `shingle_hashes_pos($"text", 10)` — position-ordered
    * window hashes (see [[ShingleHashesPos]]). */
  def shingle_hashes_pos(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashesPos(ColumnBridge.expression(c), k))

  /** Column API: `shingle_hashes_md5($"text", 3)` — portable md5-60bit
    * shingle hashes (see [[ShingleHashesMd5]]). */
  def shingle_hashes_md5(c: Column, k: Int = 3): Column =
    ColumnBridge.column(ShingleHashesMd5(ColumnBridge.expression(c), k))

  private final val TokenSeed = 0x27d4eb2f165667c5L
  private final val TokenPrime = 1000003L

  /** Position-ordered window hashes (no sort/dedupe); called from
    * generated code (see [[ShingleHashesPos]]). */
  def computePos(text: UTF8String, k: Int): ArrayData =
    new GenericArrayData(rawHashes(text, k))

  /** Single-pass shingle hashing; called from generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val out = rawHashes(text, k)
    val nSh = out.length
    if (nSh == 0) return new GenericArrayData(out)
    // sort + dedupe (deterministic sorted set)
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < nSh) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Steps 1-2 shared by [[compute]] and [[computePos]]: token hashes,
    * then the order-sensitive k-window chain hash, in position order. */
  private def rawHashes(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    // 1. hash each whitespace-delimited token
    var tokens = new Array[Long](math.max(8, n / 4))
    var nTok = 0
    var h = TokenSeed
    var i = 0
    while (i <= n) {
      val isSep = i == n || bytes(i) == ' '.toByte
      if (isSep) {
        // empty tokens count: split(" ") semantics keep them, and the
        // string pipeline hashed them too — keep parity with k-grams of
        // the raw split
        if (nTok == tokens.length) {
          val t2 = new Array[Long](tokens.length * 2)
          System.arraycopy(tokens, 0, t2, 0, tokens.length)
          tokens = t2
        }
        tokens(nTok) = h
        nTok += 1
        h = TokenSeed
      } else {
        h = h * TokenPrime + (bytes(i) & 0xff)
      }
      i += 1
    }
    if (nTok < k) return Array.empty[Long]
    // 2. combine k consecutive token hashes, order-sensitively
    val nSh = nTok - k + 1
    val out = new Array[Long](nSh)
    var s = 0
    while (s < nSh) {
      var c = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < k) {
        c = Sketches.splitmix(c ^ tokens(s + j))
        j += 1
      }
      out(s) = c
      s += 1
    }
    out
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Single-pass portable shingle hashing (md5-60bit, see
    * [[ShingleHashesMd5]]); called from generated code. */
  def computeMd5(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // 1. token boundaries: starts(i) inclusive, ends(i) exclusive.
    //    Split on the single space byte — 0x20 never occurs inside a
    //    multi-byte UTF-8 sequence, so byte-scan splitting is safe.
    var starts = new Array[Int](math.max(8, n / 4))
    var ends = new Array[Int](starts.length)
    var nTok = 0
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, starts.length * 2)
          ends = java.util.Arrays.copyOf(ends, ends.length * 2)
        }
        starts(nTok) = tokStart
        ends(nTok) = i
        nTok += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (nTok < k) return new GenericArrayData(Array.empty[Long])
    // 2. md5 over each shingle's contiguous byte range; first 15 hex
    //    digits = (first 8 digest bytes, big-endian) >>> 4
    val md = md5Local.get()
    val nSh = nTok - k + 1
    val out = new Array[Long](nSh)
    var s = 0
    while (s < nSh) {
      val from = starts(s)
      val until = ends(s + k - 1)
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(s) = h >>> 4
      s += 1
    }
    // 3. sort + dedupe (deterministic sorted set)
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < nSh) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}
