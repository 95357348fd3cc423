package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter build + probe for semi-join pruning (Bloom 1970; the
  * same sidecar-filter idea Spark's own runtime row-level filtering
  * uses for shuffle joins, exposed here as a first-class, persistable
  * artifact).
  *
  * Why it exists alongside a broadcast-hash semi join: the filter is
  * FIXED SIZE regardless of the key set's cardinality (nBits/8 bytes —
  * a 10⁹-key set at 1% FP is ~1.2 GB as an exact hash set but ~1.2 KB
  * per million keys as a bloom), it serializes to a single binary cell
  * (ship it in a literal, store it next to the corpus, reuse it across
  * jobs and batches), and probing is a codegen'd bit test — no join at
  * all on the pruned side. False positives only, never false
  * negatives: prune-then-verify keeps exact semantics while the
  * verification join sees orders of magnitude fewer rows (q79 runs the
  * q54 decontamination this way against the same DuckDB oracle).
  *
  * Layout of the binary value (self-describing so the probe needs no
  * out-of-band parameters): int32 numHashes, int64 numBits, then
  * numBits/64 big-endian words.
  */
object Bloom {

  /** Aggregate: build a bloom filter over a 64-bit feature-hash column.
    * One fixed-size word array per group; merge is bitwise OR, so
    * partial aggregation runs map-side and the shuffle carries one
    * filter per partition, not the keys. */
  def bloom_build(keyHash: Column, numBits: Long, numHashes: Int): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(keyHash), numBits, numHashes)
        .toAggregateExpression())

  /** Probe: true iff the key MAY be in the set the filter was built
    * over (definitely-absent keys return false). Codegen'd bit test. */
  def might_contain(filter: Column, keyHash: Column): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(filter),
        ColumnBridge.expression(keyHash)))

  /** Sizing helper: bits for a target false-positive rate at n keys
    * (standard m = -n·ln(p)/ln(2)², rounded up to a word multiple). */
  def bitsFor(expectedKeys: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val m = math.ceil(-expectedKeys * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    ((m max 64L) + 63L) / 64L * 64L
  }

  /** Optimal probe count for a bits-per-key ratio (k = m/n · ln 2). */
  def hashesFor(numBits: Long, expectedKeys: Long): Int =
    math.max(1, math.round(numBits.toDouble / math.max(1L, expectedKeys)
      * math.log(2)).toInt)
}

/** Double hashing shared by build and probe (Kirsch-Mitzenmacher 2006:
  * g_i = h1 + i·h2 preserves the asymptotic FP rate of i independent
  * hashes). h1/h2 derive from the 64-bit key via the Murmur3 finalizer;
  * h2 is forced odd so the probe stride never degenerates. The probe
  * expression's generated code calls this object through a codegen
  * reference, so build and probe can never drift apart. */
object BloomHash extends Serializable {

  def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  /** Bit index of probe i for the key, in [0, numBits). */
  def bitIndex(key: Long, i: Int, numBits: Long): Long = {
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x9e3779b97f4a7c15L) | 1L
    java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
  }

  /** Probe a serialized filter (header-described) for a key. */
  def mightContain(filter: Array[Byte], key: Long): Boolean = {
    val bb = ByteBuffer.wrap(filter)
    val numHashes = bb.getInt(0)
    val numBits = bb.getLong(4)
    var i = 0
    while (i < numHashes) {
      val idx = bitIndex(key, i, numBits)
      val word = bb.getLong(12 + 8 * (idx >>> 6).toInt)
      if ((word & (1L << (idx & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}

/** Buffer = the filter's word array; update sets numHashes bits, merge
  * ORs word-wise. Serialized form (words only — the header is added at
  * eval) is the fixed nBits/8 bytes whatever the group size. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom_build requires numBits >= 64 and a multiple of 64, got $numBits")
  require(numBits / 64 <= Int.MaxValue / 8, "bloom_build filter too large")
  require(numHashes >= 1 && numHashes <= 32,
    s"bloom_build requires 1 <= numHashes <= 32, got $numHashes")

  private def numWords: Int = (numBits / 64).toInt

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a bigint feature hash, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val idx = BloomHash.bitIndex(key, i, numBits)
        buf((idx >>> 6).toInt) |= 1L << (idx & 63L).toInt
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(12 + 8 * buf.length)
    bb.putInt(numHashes)
    bb.putLong(numBits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `might_contain(filter binary, key bigint)` — codegen'd probe. The
  * filter operand is usually a Literal (the built filter shipped into
  * the plan), which codegen materializes once as a referenced object;
  * the per-row work is numHashes bit tests. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "might_contain requires (binary filter, bigint key), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain"

  override protected def nullSafeEval(f: Any, k: Any): Any =
    BloomHash.mightContain(f.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hashRef = ctx.addReferenceObj("bloomHash", BloomHash,
      BloomHash.getClass.getName)
    nullSafeCodeGen(ctx, ev, (f, k) =>
      s"${ev.value} = $hashRef.mightContain($f, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
