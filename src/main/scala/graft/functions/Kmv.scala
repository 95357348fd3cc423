package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002,
  * Beyer et al. SIGMOD 2007).
  *
  * Keeps the k smallest DISTINCT 64-bit feature hashes of the group in a
  * bounded buffer. Because a uniform hash's k-th smallest value in [0,1)
  * sits near k/n, the unbiased estimate is (k−1)/u₍k₎ — one bounded
  * O(k)-byte buffer per group at any corpus size, fully mergeable
  * map-side (merge = k smallest of the union), and — unlike HLL —
  * deterministic AND composable: the sketch VALUES are the sample, so
  * two groups' sketches also estimate union/Jaccard, which is why this
  * exists alongside `approx_count_distinct` (q40).
  *
  * Exactness below k: with fewer than k distinct hashes the sketch IS
  * the distinct set, and [[Kmv.kmv_estimate]] returns its exact size.
  */
object Kmv {

  /** Column API: sorted (unsigned ascending) array of the ≤ k smallest
    * distinct feature hashes of the group. */
  def kmv_sketch(featureHash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(featureHash), k)
        .toAggregateExpression())

  /** Unsigned long → double in [0, 2⁶⁴). */
  private def unsignedD(c: Column): Column =
    when(c >= 0, c.cast("double"))
      .otherwise(c.cast("double") + lit(math.pow(2.0, 64)))

  /** Distinct-count estimate from a [[kmv_sketch]] array: exact size
    * when the sketch is not full, else (k−1)·2⁶⁴ / u₍k₎ where u₍k₎ is
    * the largest kept hash (unsigned). */
  def kmv_estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 64)) /
        unsignedD(element_at(sketch, k)))
}

/** Buffer = bounded ordered set of the k smallest distinct hashes, in
  * UNSIGNED order (hashes model U(0,1) draws; signed order would put
  * negative longs first and break the k-th-minimum statistic). */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k > 1, "kmv_sketch requires k > 1")

  private val unsigned: Ordering[Long] = new Ordering[Long] {
    override def compare(x: Long, y: Long): Int =
      java.lang.Long.compareUnsigned(x, y)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint feature hash, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty(unsigned)

  private def offer(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf.add(h)
    else if (unsigned.compare(h, buf.last) < 0) {
      if (buf.add(h)) buf.remove(buf.last)
    }
  }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long],
      b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
