package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
  * AofA 2007) — the production counterpart of [[Kmv]]: where KMV keeps k
  * sample hashes (composable into union/Jaccard), HLL keeps a FIXED
  * 2ᵖ-byte register file whose size never depends on k or the stream, is
  * mergeable by elementwise max (so map-side partial aggregation ships
  * ≤ 2ᵖ bytes per group per partition at any corpus size), and estimates
  * with ~1.04/√2ᵖ relative error.
  *
  * Engine-portable by construction, so the estimate itself is ORACLED
  * (q116) rather than rows-only: the input is pre-hashed with
  * [[DetMix]] (pure 64-bit integer SQL both engines can run), the
  * register update is integer arithmetic a DuckDB CTE reproduces
  * exactly ([[Hll.rhoCaseSql]] is the SQL twin of the JVM
  * `numberOfLeadingZeros` path), and the final estimate is a single
  * shared-text double expression ([[Hll.estMicroSql]]) floor-quantized
  * to micro-units — the [[DetLn]] discipline applied to a sketch. The
  * classic small-range linear-counting correction needs `ln` and is
  * deliberately NOT applied here; the oracled output exposes
  * `zero_regs` so a consumer (or [[DetLn.withLnFix]]) can apply it.
  *
  * Hash domain: DetMix emits ~31 uniform bits; p bucket bits leave
  * w = 31 − p suffix bits, so registers cap at w + 1 — plenty until
  * ~2²⁶ distinct per group, and the raw-estimate regime this exposes.
  */
object Hll {

  /** Suffix width for bucket-bit count `p` over DetMix's 31-bit hashes. */
  def suffixBits(p: Int): Int = 31 - p

  /** Column API: array<tinyint> of 2ᵖ HLL registers over a pre-mixed
    * BIGINT hash column (use `expr(DetMix.mixSql(...))`). */
  def hll_registers(mixedHash: Column, p: Int): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(mixedHash), p).toAggregateExpression())

  /** SQL (both dialects): ρ = leading-zero count of the w-bit suffix
    * `rest` plus 1, as a comparison ladder — the integer-exact twin of
    * the JVM `Long.numberOfLeadingZeros` update in [[HllAgg]]. */
  def rhoCaseSql(rest: String, p: Int): String = {
    val w = suffixBits(p)
    val whens = (w to 1 by -1).map { b => // b = bit length of rest
      s"WHEN $rest >= ${1L << (b - 1)} THEN ${w - b + 1}"
    }.mkString(" ")
    s"(CASE $whens ELSE ${w + 1} END)"
  }

  /** SQL (shared text, both engines): raw HLL estimate in micro-units
    * from `n` = Σⱼ 2^(maxρ−Mⱼ) (an exact BIGINT; maxρ = w + 1). The
    * α·m² constant and the 2^maxρ scale are double literals, the whole
    * thing one correctly-rounded multiply/divide chain, so both engines
    * produce the identical BIGINT — see [[DetLn]] for why that holds. */
  def estMicroSql(n: String, p: Int): String = {
    val m = 1 << p
    val scale = s"${(1L << (suffixBits(p) + 1)).toDouble.toLong}e0"
    s"CAST(floor((7213e-4 / (1e0 + 1079e-3 / ${m}e0)) * ${m}e0 * ${m}e0" +
      s" * $scale / CAST($n AS DOUBLE) * 1e6 + 5e-1) AS BIGINT)"
  }
}

/** Buffer = 2ᵖ byte registers; update keys on the LOW p bits (bucket)
  * and ranks the remaining w = 31−p bits; merge = elementwise max. */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_registers requires 4 <= p <= 16, got $p")

  private val m = 1 << p
  private val w = Hll.suffixBits(p)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers requires a bigint (DetMix-hashed), got ${child.dataType}")

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % m).toInt
      val rest = h / m // w-bit suffix
      // bit length of rest via nlz; rho = w - bitlen + 1 (rest=0 -> w+1)
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(rest)
      val rho = (w - bitlen + 1).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}
