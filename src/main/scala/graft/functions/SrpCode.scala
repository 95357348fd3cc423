package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Signed-random-projection code of an embedding as ONE custom Catalyst
  * expression: all nBits projections in a single pass over the float
  * array against cached [[DetMix]] ±1 plane signs.
  *
  * Computes the IDENTICAL integers as the compositional SQL form
  * (`aggregate(transform(embedding, ...))` per bit — the form the
  * DuckDB oracle still uses): coordinates micro-quantized by
  * `floor(x·10⁶ + 0.5)`, plane (j, i) sign from `mix(j·64 + i + 1,
  * seed)` parity. The SQL form evaluates nBits separate aggregate
  * lambdas per row (16 × array-length lambda invocations through the
  * interpreted higher-order-function path); this expression is one
  * fused integer loop that stays inside whole-stage codegen — measured
  * ~5× on the q115 corpus scan. Oracle-equality is pinned by the q115
  * correctness row (values unchanged) and SimilaritySpec.
  */
case class SrpCode(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_code requires array<float>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_code"

  override protected def nullSafeEval(input: Any): Any =
    SrpCode.compute(input.asInstanceOf[ArrayData], nBits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpCode.compute($c, $nBits, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): SrpCode =
    copy(child = newChild)
}

object SrpCode {

  /** Column API: `srp_code($"embedding", 16, 5)`. */
  def srp_code(c: Column, nBits: Int, seed: Long): Column =
    ColumnBridge.column(SrpCode(ColumnBridge.expression(c), nBits, seed))

  /** Cached ±1 plane signs: signs(j)(i) = parity of mix(j·64 + i + 1,
    * seed). 64 dims per plane — the corpus's fixed embedding width;
    * plane ordinals would alias beyond it (enforced in [[core]]). */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Array[Int]]]()
  def signs(nBits: Int, seed: Long): Array[Array[Int]] =
    signCache.computeIfAbsent((nBits, seed), _ =>
      Array.tabulate(nBits, 64) { (j, i) =>
        if (DetMix.mixLong(j * 64L + i + 1, seed) % 2 == 0) 1 else -1
      })

  private def core(get: Int => Float, n: Int, nBits: Int, seed: Long): Long = {
    require(n <= 64, s"SRP planes cover 64 dims, got $n")
    val sg = signs(nBits, seed)
    // quantize once per coordinate, not once per (bit, coordinate)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(get(i).toDouble * 1e6 + 0.5).toLong
      i += 1
    }
    var code = 0L
    var j = 0
    while (j < nBits) {
      val row = sg(j)
      var s = 0L
      var k = 0
      while (k < n) { s += q(k) * row(k); k += 1 }
      if (s >= 0) code |= (1L << j)
      j += 1
    }
    code
  }

  /** Called from generated code. */
  def compute(arr: ArrayData, nBits: Int, seed: Long): Long =
    core(arr.getFloat, arr.numElements(), nBits, seed)

  /** JVM-array twin (the LSH [[graft.ext.Similarity]] bucketKey path). */
  def computeFloats(emb: Array[Float], nBits: Int, seed: Long): Long =
    core(emb(_), emb.length, nBits, seed)
}
