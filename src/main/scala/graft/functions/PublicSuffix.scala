package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain extraction as ONE compact codegen'd expression —
  * the publicsuffix.org matching algorithm (exact / `*.` wildcard / `!`
  * exception rules, longest match wins, exceptions shed their leftmost
  * label, unmatched hosts fall to the default `*` rule) with the rule
  * set compiled into hash sets once per plan.
  *
  * Why an Expression and not a column fold: the same algorithm written
  * as `transform(sequence(...))` over inlined array literals expands to
  * thousands of generated-Java lines per query (6 candidates × rule
  * arrays × slice/join machinery) — Janino compilation alone cost
  * seconds per cold run. One static method call keeps the generated
  * code a few lines and the whole URL pipeline inside one small
  * whole-stage-codegen span.
  *
  * Returns NULL when the host IS a public suffix (no registrable
  * domain exists) or the input is null.
  */
case class PublicSuffixDomain(child: Expression, exact: Seq[String],
    wild: Seq[String], exception: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"registrable_domain requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registrable_domain"

  @transient private lazy val matcher =
    new PublicSuffix.Matcher(exact, wild, exception)

  override protected def nullSafeEval(input: Any): Any =
    matcher.registrable(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("psMatcher", matcher,
      classOf[PublicSuffix.Matcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $m.registrable($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PublicSuffixDomain = copy(child = newChild)
}

object PublicSuffix {

  /** Rule sets pre-hashed; one instance is embedded per plan via
    * addReferenceObj and shared by every row. */
  final class Matcher(exact: Seq[String], wild: Seq[String],
      exception: Seq[String]) extends Serializable {
    private val exactSet = exact.toSet
    // "*.ck" matches any single label before the stored tail "ck";
    // a bare "*" rule would be the (implicit) default and needs no set
    private val wildTails = wild.map(_.stripPrefix("*.")).toSet
    private val excSet = exception.toSet

    /** Registrable domain of `host`, or null when the host IS a public
      * suffix. The scoring mirrors the published algorithm: exception
      * beats any match, longer suffixes beat shorter, no match falls to
      * the default one-label rule. */
    def registrable(host: UTF8String): UTF8String = {
      if (host == null) return null
      val s = host.toString
      val labels = s.split('.')
      val n = labels.length
      // ps = label count of the winning public suffix
      var ps = 1
      var excPs = -1
      val maxI = math.min(n, 6)
      var i = 1
      var suffix = labels(n - 1)
      while (i <= maxI) {
        if (excSet.contains(suffix)) excPs = i - 1
        else if (exactSet.contains(suffix)) { if (i > ps) ps = i }
        // wildcard "*.tail": the candidate's last i labels are
        // (anything).(tail of i-1 labels)
        if (i >= 2) {
          val tail = suffix.substring(labels(n - i).length + 1)
          if (wildTails.contains(tail) && i > ps) ps = i
        }
        i += 1
        if (i <= maxI) suffix = labels(n - i) + "." + suffix
      }
      if (excPs >= 0) ps = excPs
      if (n > ps) {
        var start = 0
        var k = 0
        while (k < n - ps - 1) { start += labels(k).length + 1; k += 1 }
        UTF8String.fromString(s.substring(start))
      } else null
    }
  }

  /** Column API: `registrable_domain($"host", exact, wild, exception)`. */
  def registrable_domain(c: Column, exact: Seq[String], wild: Seq[String],
      exception: Seq[String]): Column =
    ColumnBridge.column(
      PublicSuffixDomain(ColumnBridge.expression(c), exact, wild, exception))
}
