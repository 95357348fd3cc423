package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact BIGINT dot product of two long-array vectors as a native
  * codegen'd Catalyst `Expression` — the integer scoring kernel of the
  * q178 SemDeDup gate (and any micro-quantized similarity test):
  * [[CosineSimilarity]]'s shape with Long accumulation, so the
  * per-pair hot loop stays inside Tungsten instead of the interpreted
  * `aggregate(zip_with(...))` higher-order chain it replaces (which
  * allocated a lambda frame per element per row).
  *
  * Callers own the overflow budget: micro-quantized embedding
  * coordinates are ≤ ~10⁶, so per-element products are ≤ 10¹² and a
  * 64-dim sum ≤ 10¹⁴ ≪ 2⁶³. Mismatched lengths throw — ragged
  * embeddings are corrupt data, not a zero score. */
case class IntDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "int_dot requires two array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"int_dot: length mismatch $n vs ${y.numElements()}")
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "int_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  /** Column-API entry point: `int_dot($"a", $"b")`. */
  def int_dot(a: Column, b: Column): Column =
    ColumnBridge.column(IntDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
