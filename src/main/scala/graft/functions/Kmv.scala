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

  /** Column API: sorted ascending array of the ≤ k smallest distinct
    * feature hashes of the group — stored SIGN-FLIPPED (h ⊕ 2⁶³), so
    * the natural signed order Spark's array functions use coincides
    * with the unsigned order the k-minimum statistic needs. Sketches
    * therefore compose with plain `array_union`/`array_sort`/`slice`/
    * `array_intersect`: k smallest of A∪B = `slice(array_sort(
    * array_union(a, b)), 1, k)` — see [[kmv_union_jaccard]]. */
  def kmv_sketch(featureHash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(featureHash), k)
        .toAggregateExpression())

  /** Flipped value → hash-as-uniform-draw in [0, 2⁶⁴) as double. */
  private def drawD(c: Column): Column =
    c.cast("double") + lit(math.pow(2.0, 63))

  /** Distinct-count estimate from a [[kmv_sketch]] array: exact size
    * when the sketch is not full, else (k−1)·2⁶⁴ / u₍k₎ where u₍k₎ is
    * the largest kept hash (as a uniform draw). */
  def kmv_estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 64)) /
        drawD(element_at(sketch, k)))

  /** Jaccard estimate between two [[kmv_sketch]] arrays (Beyer et al.:
    * K(A∪B) is itself the KMV sample of the union; the fraction of it
    * lying in both A's and B's sketches estimates |A∩B|/|A∪B|). Pure
    * array functions — valid BECAUSE of the flipped storage order. */
  def kmv_union_jaccard(a: Column, b: Column, k: Int): Column = {
    val unionK = slice(array_sort(array_union(a, b)), 1, k)
    size(array_intersect(array_intersect(unionK, a), b)).cast("double") /
      least(lit(k), size(unionK)).cast("double")
  }
}

/** Buffer = bounded ordered set of the k smallest distinct hashes.
  * Hashes model U(0,1) draws, so the statistic needs UNSIGNED order;
  * values are stored sign-flipped (h ⊕ 2⁶³), under which natural signed
  * order IS unsigned hash order — both for this buffer and for any
  * downstream array function over the evaluated sketch. Only `update`
  * flips; merge/eval operate in the flipped domain throughout. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k > 1, "kmv_sketch requires k > 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint feature hash, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], flipped: Long): Unit = {
    if (buf.size < k) buf.add(flipped)
    else if (flipped < buf.last) {
      if (buf.add(flipped)) buf.remove(buf.last)
    }
  }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long] ^ Long.MinValue)
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
