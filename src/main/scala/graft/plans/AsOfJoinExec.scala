package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The custom-operator ladder's rung (c): a whole-operator as-of join as
  * LogicalPlan + SparkStrategy + physical SparkPlan, alongside the
  * composition-level [[AsOfJoin.asofJoin]].
  *
  * Physical semantics: both sides hash-clustered on the equi-keys and
  * sorted by (keys, ts); each partition runs a streaming merge keeping
  * ONE carried right row (the latest with `r.ts <= l.ts` for the current
  * key). Versus the union+window composition this buffers O(1) rows per
  * partition instead of carrying a right-row struct through a window
  * frame, and emits exactly the sort-merge-join plan shape (two
  * exchanges + two sorts, no Expand/Window).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      // bind against the NULLABLE output schema: using the raw child
      // attributes would mark right columns non-nullable and codegen
      // would read garbage from the null-extended row's slots
      val outProj = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltsRow = lTsProj(l)
        if (lk.anyNull || ltsRow.isNullAt(0)) {
          // SQL join semantics: NULL keys never match; a NULL left
          // timestamp matches nothing either (the composed union+window
          // variant orders nulls first, before any right row) — without
          // this check getLong(0) reads the null slot as epoch 0 and the
          // two advertised-equivalent implementations diverge
          outProj(joined(l, nullRight))
        } else {
          val lts = ltsRow.getLong(0)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            if (rk.anyNull) {
              rBuf.next() // null right keys can never match: discard
            } else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                rBuf.next() // right key below current left key: discard
              } else if (cmp > 0) {
                advancing = false
              } else {
                val rts = rTsProj(rBuf.head)
                if (rts.isNullAt(0)) {
                  rBuf.next() // null right ts never matches (sorted first)
                } else if (rts.getLong(0) <= lts) {
                  val r = rBuf.next()
                  lastMatch = r.copy()
                  lastMatchKey = lk.copy()
                } else {
                  advancing = false
                }
              }
            }
          }
          val rRow =
            if (lastMatchKey != null && lastMatchKey.equals(lk)) lastMatch
            else nullRight
          outProj(joined(l, rRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExecApi {

  /** DataFrame surface over the custom operator. Right-side columns come
    * back renamed `asof_*`; the planner strategy is registered lazily on
    * the session's experimental extraStrategies (idempotent). */
  def asofJoinExec(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // Both sides often share lineage (self-joins on the same scan), which
    // would put identical exprIds on both children — the analyzer's
    // DeduplicateRelations cannot tell which occurrences in OUR node's key
    // expressions belong to which side. Re-alias the right side under
    // fresh, distinct names: new exprIds, and non-redundant aliases the
    // optimizer won't strip.
    val rightFresh = right.select(
      right.columns.map(c => col(c).as(s"__r_$c")): _*)
    val lPlan = ColumnBridge.analyzedPlan(left)
    val rPlan = ColumnBridge.analyzedPlan(rightFresh)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val node = AsOfJoinNode(lPlan, rPlan,
      on.map(attr(lPlan, _)), on.map(n => attr(rPlan, s"__r_$n")),
      attr(lPlan, leftTs), attr(rPlan, s"__r_$rightTs"))
    ColumnBridge.ofRows(spark, node)
      .toDF(left.columns ++ right.columns.map("asof_" + _): _*)
  }
}
