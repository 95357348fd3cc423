package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn mod-10 checksum (ISO/IEC 7812, the public card/IMEI check
  * digit) as codegen'd expressions — the validation step that turns a
  * "16 digits in a row" PII candidate into a confirmed payment-card
  * match. Digit-pattern PII scrubbing without the checksum either
  * over-redacts (order ids, timestamps) or under-redacts; production
  * pipelines (e.g. the BigCode/StarCoder PII pass) validate before
  * redacting. Separators (space, dash) are ignored during the scan, so
  * candidates can be validated in their display form.
  *
  * [[LuhnValid]]: true iff the string holds 12–19 digits (the ISO/IEC
  * 7812 length band) and the doubled-digit sum is ≡ 0 (mod 10).
  * [[LuhnCheckDigit]]: the digit that makes `base || digit` Luhn-valid
  * (used by the q125 synthesis to plant known-valid and known-invalid
  * candidates); -1 when the base holds no digits or any non-digit
  * beyond separators.
  */
object Luhn {

  /** Sum over digits right-to-left with every second digit doubled
    * (digits 9+ fold back by -9); `shift` offsets the parity — 0
    * validates a full number, 1 computes the pre-check-digit sum.
    * Returns -1 on any non-digit non-separator, or when the digit
    * count is outside [minDigits, 19]. Called from generated code. */
  def sum(s: UTF8String, shift: Int, minDigits: Int): Int = {
    val str = s.toString
    var total = 0
    var pos = 0 // 0-based from the RIGHT over digits only
    var i = str.length - 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        val d = c - '0'
        val v = if ((pos + shift) % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t }
          else d
        total += v
        pos += 1
      } else if (c != ' ' && c != '-') return -1
      i -= 1
    }
    if (pos < minDigits || pos > 19) -1 else total
  }

  /** Called from generated code. */
  def valid(s: UTF8String): Boolean = {
    val t = sum(s, 0, 12)
    t >= 0 && t % 10 == 0
  }

  /** Called from generated code. */
  def checkDigit(s: UTF8String): Int = {
    val t = sum(s, 1, 1)
    if (t < 0) -1 else (10 - t % 10) % 10
  }

  def luhn_valid(c: Column): Column =
    ColumnBridge.column(LuhnValid(ColumnBridge.expression(c)))

  def luhn_check_digit(c: Column): Column =
    ColumnBridge.column(LuhnCheckDigit(ColumnBridge.expression(c)))
}

case class LuhnValid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luhn_valid requires a string argument, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_valid"
  override protected def nullSafeEval(input: Any): Any =
    Luhn.valid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Luhn.valid($c);")
  override protected def withNewChildInternal(
      newChild: Expression): LuhnValid = copy(child = newChild)
}

case class LuhnCheckDigit(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luhn_check_digit requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "luhn_check_digit"
  override protected def nullSafeEval(input: Any): Any =
    Luhn.checkDigit(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Luhn.checkDigit($c);")
  override protected def withNewChildInternal(
      newChild: Expression): LuhnCheckDigit = copy(child = newChild)
}
