package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst aggregates for dedup sketches.
  *
  * Both consume ONE pre-computed 64-bit feature hash per row (e.g.
  * `xxhash64(shingle)`) and maintain the whole sketch in a single mutable
  * buffer — one aggregate evaluation per row instead of the k=64 separate
  * `min()`/`sum()` expression columns the compositional form needs. At
  * 100 TB that is the difference between one buffer update and 64
  * expression evaluations per (doc, shingle) row, with identical shuffle
  * shape (partial sketches merge associatively map-side).
  */
object Sketches {

  /** splitmix64 — deterministic per-index constants for the k hash
    * permutations; no RNG state. */
  private[functions] def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column API: MinHash signature of the grouped feature hashes. */
  def minhash_sketch(featureHash: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(featureHash), k)
        .toAggregateExpression())

  /** Column API: 64-bit SimHash of the grouped feature hashes. */
  def simhash_sketch(featureHash: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(featureHash))
        .toAggregateExpression())
}

/** MinHash: buffer holds the running minimum of π_i(h) over the group
  * for k seeded hash functions π_i(h) = [[DetMix.mixLong]](h, S + i)
  * (S = [[MinHashAgg.SeedBase]]). DetMix rather than the classic
  * odd-multiplier `A_i·h + B_i mod 2⁶⁴` permutation because wraparound
  * multiplication is NOT portable SQL (DuckDB errors on BIGINT
  * overflow); with DetMix the identical signature is one
  * `min(mixSqlSeedExpr("h", "S + j"))` per j in any engine, which is
  * what puts the MinHash/LSH family under the DuckDB oracle. Negative
  * inputs are masked to non-negative (`h & Long.MaxValue`) — a no-op
  * for the md5-60bit feature hashes the dedup pipeline feeds.
  * Result: array<long> signature. */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch requires a bigint feature hash, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & Long.MaxValue
      var i = 0
      while (i < k) {
        val p = DetMix.mixLong(h, MinHashAgg.SeedBase + i)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Seed offset for the k permutation streams: π_i uses DetMix seed
    * `SeedBase + i`. Shared verbatim by the oracle SQL
    * (`mixSqlSeedExpr("h", "7000 + j")`). */
  val SeedBase = 7000L
}

/** SimHash: buffer holds 64 signed bit counts; each feature hash votes ±1
  * per bit position; the sketch is the sign vector packed into a long. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sketch requires a bigint feature hash, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
