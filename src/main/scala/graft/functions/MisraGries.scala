package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a Catalyst aggregate.
  *
  * The frequency-estimation counterpart of [[Kmv]]: a k-counter buffer
  * over a token stream that provably retains EVERY element whose true
  * frequency exceeds n/(k+1), with per-element undercounts of at most
  * n/(k+1). Partial summaries merge associatively (count sum, then a
  * (k+1)-th-largest decrement), so the shuffle carries k (token, count)
  * pairs per partition — bounded memory at ANY vocabulary size, where
  * an exact `groupBy(token).count()` hash aggregate grows (and spills)
  * with the distinct-token count. The production top-k pattern built on
  * it is candidates-then-recount: sketch to find the ≤ k candidates,
  * one broadcast-semijoin recount pass for exact counts
  * ([[graft.ext.TextAnalysis.heavyHitters]], oracled as q76 because the
  * recount makes the final output exact, not approximate).
  *
  * Reference: Misra & Gries, "Finding repeated elements" (1982);
  * merge step per Agarwal et al., "Mergeable summaries" (2012).
  */
object MisraGries {
  /** Column API: map<token, lower_bound_count> summary of the grouped
    * string column, at most k entries. */
  def misra_gries(token: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(token), k)
        .toAggregateExpression())
}

case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "misra_gries requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string token, got ${child.dataType}")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf(t) = c + 1
        case None if buf.size < k => buf(t) = 1L
        case None =>
          // classic MG decrement-all on a miss at capacity: amortized
          // O(1) per input (each decrement pays back an earlier +1)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf(key) = c - 1
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0 —
      // the count-sum stays a lower bound with the same n/(k+1) error
      val counts = a.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else a(key) = c - cut
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new ArrayBasedMapData(
      new GenericArrayData(
        entries.map(e => UTF8String.fromString(e._1)).toSeq),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val parts = buf.toArray.map { case (t, c) =>
      (t.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + parts.map(p => 4 + p._1.length + 8).sum)
    bb.putInt(parts.length)
    parts.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf(new String(arr, StandardCharsets.UTF_8)) = bb.getLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
