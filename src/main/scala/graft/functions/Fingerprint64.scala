package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling-hash document fingerprint — a native Catalyst
  * `Expression` with whole-stage codegen, so fingerprinting a 100 TB corpus
  * stays inside the generated loop (no UDF serialization boundary, no
  * boxing per row).
  *
  * h = fold(bytes, SEED)(h, b => h * PRIME + b), in Long arithmetic with
  * natural mod-2^64 overflow. Deterministic across JVMs and partitionings.
  *
  * This is the engine-native replacement for content identity the
  * reference derives from filenames (main.py:23,36); as a content hash it
  * also serves exact dedup at scale.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = ${Fingerprint64.Seed}L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = $h * ${Fingerprint64.Prime}L + (long)($b[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  val Seed: Long = 1125899906842597L
  val Prime: Long = 1000003L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = h * Prime + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** Column-API entry point: `fingerprint64($"text")`. */
  def fingerprint64(c: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(c)))
}
