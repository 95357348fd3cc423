package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k selection as a Catalyst aggregate.
  *
  * The compositional top-k (`row_number()` window over the scored rows,
  * then `rank <= k`) shuffles and sorts EVERY scored row — for kNN that
  * is n·nQueries rows of which only nQueries·k survive. This aggregate
  * keeps a k-element bounded heap per group instead: partial aggregation
  * runs map-side (each partition contributes at most k candidates per
  * group), merges are associative, and the shuffle carries only the
  * k-element buffers. Same output contract as the window form, one
  * bounded buffer per group instead of a global sort.
  */
object TopK {

  /** Column API: the k best (score desc, ties id asc) `(rank, id)` pairs
    * of the group, as `array<struct<rank:int, id:bigint>>` ordered best
    * first. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScoreAgg(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k)
        .toAggregateExpression())
}

/** Heap entries ordered so the priority-queue head is the WORST kept
  * element (lowest score, ties highest id) — the one candidate a better
  * arrival evicts in O(log k). */
case class TopKByScoreAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "top_k_by_score requires k > 0")

  /** compare(x, y) > 0 iff x is worse than y (head = max = worst). */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val byScore = java.lang.Double.compare(y._1, x._1)
        if (byScore != 0) byScore else java.lang.Long.compare(x._2, y._2)
      }
    }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score requires (double score, bigint id), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(buf.head, e) > 0) {
      buf.dequeue()
      buf.enqueue(e)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      offer(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val bestFirst = buf.clone().dequeueAll.reverse // dequeue order is worst-first
    new GenericArrayData(bestFirst.zipWithIndex.map { case ((_, id), i) =>
      new GenericInternalRow(Array[Any](i + 1, id))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(left = newLeft, right = newRight)
}
