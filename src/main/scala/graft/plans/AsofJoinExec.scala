package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/**
 * AS-OF JOIN as a first-class operator: logical node + planner strategy +
 * sort-merge physical operator (the prompt-tier-(c) extension shape —
 * Spark has no native as-of join; composing it from window functions costs
 * an extra shuffle + full materialization of the union).
 *
 * Semantics: left-outer — every left row joins the LAST right row of the
 * same key whose time is ≤ the left time (ties included), or nulls.
 * Grouping is null-safe like `groupBy`; among right rows with identical
 * (key, time) the winner follows sort order, so keep the right side unique
 * per (key, time) for deterministic output (pre-aggregate, as q295 does).
 *
 * Scale story: `requiredChildDistribution` declares hash-clustering on the
 * join keys and `requiredChildOrdering` (key, time) — Catalyst's
 * EnsureRequirements then plans AT MOST one exchange+sort per side, and
 * NONE when the input is already bucketed/sorted (the zero-exchange
 * bucketed path X36 proved for the compositional as-of join). Execution is
 * a single forward merge pass per partition: O(|L|+|R|), no buffering
 * beyond one candidate row, no per-key state — the plan you want for
 * "enrich 100 TB of events with the most recent dimension version".
 */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // consumers (collect, exchanges) expect UnsafeRow output; bind against
      // the nullability-adjusted output so null-filled right columns survive
      val allOut = lOut ++ rOut.map(_.withNullability(true))
      val outProj = UnsafeProjection.create(allOut, allOut)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var lastMatch: InternalRow = null
        private var lastKey: UnsafeRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          var scanning = rCur != null
          while (scanning) {
            val c = keyOrd.compare(rKeyProj(rCur), lk)
            if (c < 0) {
              // right key behind the current left key — skip forward
              rCur = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0 &&
                timeOrd.compare(rTimeProj(rCur), lTimeProj(l)) <= 0) {
              // same key, time within bound: latest-so-far candidate
              lastMatch = rCur.copy()
              lastKey = lk.copy()
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              scanning = false // right side is ahead; stop for this left row
            }
            if (rCur == null) scanning = false
          }
          val ok = lastMatch != null && lastKey != null &&
            keyOrd.compare(lastKey, lk) == 0
          outProj(joined(l, if (ok) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing builder for the custom as-of join operator. */
object AsofJoinOp {
  /** Join every left row to the last right row with equal keys and
    * rightTime ≤ leftTime (left outer). Key/time columns are resolved by
    * name against each side; use distinct right-side column names (alias
    * in a select) so the combined output is unambiguous. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    GraftPlans.ensureInjected(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name).mkString(",")}"))
    GraftSqlShim.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime)))
  }
}
