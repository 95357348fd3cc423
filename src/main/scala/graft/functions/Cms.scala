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

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
  * frequency sibling of [[Hll]] (distinct) and [[MisraGries]] (top-k
  * candidates): `depth` counter rows of `width` cells; every item
  * increments one cell per row (hash per row); a point estimate is the
  * MIN over its cells, always ≥ the true count and over by at most
  * εN (ε = e/width) with probability 1 − e^−depth. The buffer is a
  * fixed depth×width Long array, merged by ELEMENTWISE SUM — partials
  * combine map-side like any sum, so the shuffle ships one array per
  * partition regardless of corpus size.
  *
  * Unlike HLL there is no float anywhere in the estimate — counters are
  * integer sums and the point query is a 4-way `least` — so the whole
  * sketch is exactly oracled (q117): a DuckDB CTE rebuilds every counter
  * from the same [[DetMix]] row hashes and must match cell for cell.
  * Row r hashes with seed `seedBase + r` (independent-enough hash rows,
  * the standard per-row-seed construction). */
object Cms {

  /** Column API: depth×width counters (row-major array<bigint>) over a
    * non-negative BIGINT item column (hashed internally per row). */
  def cms_counters(item: Column, depth: Int, width: Int,
      seedBase: Long): Column =
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(item), depth, width, seedBase)
        .toAggregateExpression())

  /** SQL (both dialects): the row-r cell index of item expression `x`,
    * 0-based within the flattened row-major counter array. */
  def cellSql(x: String, r: Int, width: Int, seedBase: Long): String =
    s"(${DetMix.mixSql(x, seedBase + r)} % $width + ${r.toLong * width})"
}

/** Buffer = row-major Array[Long](depth·width); merge = elementwise sum. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seedBase: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 8, s"cms depth out of range: $depth")
  require(width >= 16 && (width & (width - 1)) == 0,
    s"cms width must be a power of two >= 16, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_counters requires a bigint item, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cms_counters"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        val idx = r * width + (DetMix.mixLong(x, seedBase + r) % width).toInt
        buf(idx) += 1
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}
