package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic bounded-k uniform row sample per group — the sampling
  * backbone of the quantile sketch (q141) and the row-level sibling of
  * [[Kmv]] (which samples DISTINCT hashes; this samples ROWS).
  *
  * Keeps the k rows whose (hash, key) pair is smallest, where `hash` is
  * a deterministic per-row draw (a [[DetMix]] of the row's unique key)
  * and `key` breaks hash collisions totally — so the kept MULTISET is a
  * uniform random sample of the group that any engine reproduces exactly
  * (the DuckDB oracle replays it as `row_number() OVER (ORDER BY h, key)
  * <= k`). Bounded O(k) buffer per group per partition, merged map-side
  * (merge = k smallest of the union), one pass, no sort: the scale path
  * where an exact per-group order statistic would need a full sort of
  * 100 TB. Sample-quantile rank error is the classic O(1/√k)
  * (Dvoretzky–Kiefer–Wolfowitz bound on the empirical CDF).
  */
object HashSample {

  /** Column API: array of the group's `value`s on the k rows with the
    * smallest (hash, key), emitted in (hash, key) order — i.e. already
    * a uniformly-shuffled sample; `array_sort` it for order statistics.
    * `value` may be BIGINT or DOUBLE; the result element type follows. */
  def hash_sample(hash: Column, key: Column, value: Column,
      k: Int): Column =
    ColumnBridge.column(
      HashSampleAgg(ColumnBridge.expression(hash),
        ColumnBridge.expression(key), ColumnBridge.expression(value), k)
        .toAggregateExpression())
}

/** Buffer = bounded TreeSet of (hash, key, value-bits), ordered by
  * (hash, key) — key is unique per row, so ties cannot collapse two
  * rows and the multiset is exact. Doubles ride as raw bits (the order
  * never touches them); `eval` restores the declared value type. */
case class HashSampleAgg(
    hash: Expression,
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Long, Long)]]
  with TernaryLike[Expression] {

  require(k > 0, "hash_sample requires k > 0")

  override def first: Expression = hash
  override def second: Expression = key
  override def third: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hash_sample hash must be bigint, got ${hash.dataType}")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hash_sample key must be bigint, got ${key.dataType}")
    else if (value.dataType != LongType && value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"hash_sample value must be bigint or double, got ${value.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(value.dataType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hash_sample"

  private def isDouble: Boolean = value.dataType == DoubleType

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Long, Long)] =
    mutable.TreeSet.empty[(Long, Long, Long)]

  private def offer(buf: mutable.TreeSet[(Long, Long, Long)],
      row: (Long, Long, Long)): Unit = {
    if (buf.size < k) buf.add(row)
    else if (implicitly[Ordering[(Long, Long, Long)]].lt(row, buf.last)) {
      if (buf.add(row)) buf.remove(buf.last)
    }
  }

  override def update(buf: mutable.TreeSet[(Long, Long, Long)],
      input: InternalRow): mutable.TreeSet[(Long, Long, Long)] = {
    val h = hash.eval(input)
    val ky = key.eval(input)
    val v = value.eval(input)
    if (h != null && ky != null && v != null) {
      val bits = if (isDouble)
        java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])
      else v.asInstanceOf[Long]
      offer(buf, (h.asInstanceOf[Long], ky.asInstanceOf[Long], bits))
    }
    buf
  }

  override def merge(a: mutable.TreeSet[(Long, Long, Long)],
      b: mutable.TreeSet[(Long, Long, Long)])
      : mutable.TreeSet[(Long, Long, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[(Long, Long, Long)]): Any = {
    val out: Array[Any] =
      if (isDouble)
        buf.toArray.map(t =>
          java.lang.Double.longBitsToDouble(t._3): Any)
      else buf.toArray.map(t => t._3: Any)
    new GenericArrayData(out)
  }

  override def serialize(
      buf: mutable.TreeSet[(Long, Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { t => bb.putLong(t._1); bb.putLong(t._2); bb.putLong(t._3) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.TreeSet[(Long, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.add((bb.getLong(), bb.getLong(), bb.getLong())); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HashSampleAgg =
    copy(hash = newFirst, key = newSecond, value = newThird)
}
