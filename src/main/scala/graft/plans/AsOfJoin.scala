package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the full custom-operator tier (SURVEY §3c):
  * logical node + planner strategy + physical exec, registered through
  * `graft.core.GraftExtensions`.
  *
  * Semantics: for each left row, attach the single right row with equal
  * keys and the greatest right time ≤ the left time (DuckDB
  * `ASOF LEFT JOIN … ON l.k = r.k AND l.t >= r.t`; the reference's
  * event-attribution shape, reference README §4's joined models in
  * spirit). Left-outer: unmatched left rows carry nulls.
  *
  * Why a physical operator: the composable faces — union+window
  * ([[graft.operators.Extras.asofJoin]]) or a range join — either drag
  * both tables through one window sort or expand candidate pairs. The
  * native exec instead declares SMJ-style requirements (children
  * co-partitioned on keys via `ClusteredDistribution`, each sorted by
  * (keys, time) — Catalyst's EnsureRequirements inserts the minimal
  * exchanges/sorts) and then streams BOTH sides once per partition,
  * O(|L|+|R|), holding ONE buffered right row. At 100 TB: two key
  * shuffles, zero candidate blow-up, state = one row.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join exec. Requirements do the heavy lifting:
  * Catalyst co-partitions the children on the join keys and sorts each
  * by (keys, time); `doExecute` zips partitions and merges. The right
  * cursor never rewinds — left keys arrive ascending, so right rows
  * behind the current left key are dead, and a right row with time
  * beyond the current left time is exactly the first row a LATER left
  * row may still need.
  *
  * Equal-time right duplicates: which of several equal-(key,time) right
  * rows wins is sort-tie-dependent; project only time-determined right
  * columns (or pre-dedup the right side) where that matters.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be bigint (µs since epoch)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // one output row per left row, partitioned as the left child
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyGen = UnsafeProjection.create(lKeyExprs, leftOut)
        val rKeyGen = UnsafeProjection.create(rKeyExprs, rightOut)
        val lTimeEval = BindReferences.bindReference(lTimeExpr, leftOut)
        val rTimeEval = BindReferences.bindReference(rTimeExpr, rightOut)
        val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
        val nullRight = new GenericInternalRow(rightOut.size)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          // lookahead right row: valid until the next rIter.next() call
          private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
          private var lastMatch: InternalRow = null // copied; current left key's best
          private var groupKey: InternalRow = null // copied key owning lastMatch

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyGen(l)
            if (groupKey == null || keyOrd.compare(lKey, groupKey) != 0) {
              lastMatch = null
              groupKey = lKey.copy()
            }
            val lt = lTimeEval.eval(l)
            if (lt == null) {
              // null time sorts first in its group; matches nothing
              joined(l, nullRight)
            } else {
              val lTime = lt.asInstanceOf[Long]
              var advancing = true
              while (advancing && rHead != null) {
                val c = keyOrd.compare(rKeyGen(rHead), lKey)
                if (c < 0) {
                  rHead = if (rIter.hasNext) rIter.next() else null
                } else if (c == 0) {
                  val rt = rTimeEval.eval(rHead)
                  if (rt == null || rt.asInstanceOf[Long] <= lTime) {
                    if (rt != null) lastMatch = rHead.copy()
                    rHead = if (rIter.hasNext) rIter.next() else null
                  } else advancing = false
                } else advancing = false
              }
              joined(l, if (lastMatch != null) lastMatch else nullRight)
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame face. The two inputs must have disjoint attribute sets
  * (alias the right side's columns when both derive from one source —
  * an `.as(name)` mints fresh attributes).
  */
object AsOf {

  def joinAsOf(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "as-of join needs matching non-empty key lists")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join sides share attributes — alias the right side's columns")
    GraftBridge.ofRows(left.sparkSession, AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(GraftBridge.expression),
      rightKeys.map(GraftBridge.expression),
      GraftBridge.expression(leftTime),
      GraftBridge.expression(rightTime)))
  }
}
