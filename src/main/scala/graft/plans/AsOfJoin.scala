package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native as-of join (SURVEY §7.3 path (c): custom LogicalPlan +
  * SparkStrategy + SparkPlan).
  *
  * For each left row, attach the LAST right row with the same key whose
  * `rightOn` ≤ the left row's `leftOn` (left-outer: unmatched lefts get
  * nulls). This is the "latest state as of event time" lookup the
  * reference approximates with its Redis per-entity watermark reads
  * (utils/utils.py:1080-1095) and the standard feature-lookup join of
  * training pipelines.
  *
  * Spark SQL has no as-of join; the window-function encoding (union +
  * last_value + filter) shuffles BOTH relations into one sort. This
  * operator instead demands co-clustering on the key and a per-child
  * (key, time) sort — the exact physical contract of a sort-merge join —
  * and streams a single forward merge per partition: O(n+m), no buffered
  * hash table, spill-free.
  *
  * Ties on `rightOn` resolve to the row latest in the right child's
  * (key, time, tiebreak…) sort order, so results are deterministic when
  * a tiebreak ordering is supplied.
  */
final case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                              leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                              leftOn: Expression, rightOn: Expression,
                              tiebreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lo, ro, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, tb) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                              leftOn: Expression, rightOn: Expression,
                              tiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Co-cluster on the key, sort each side by (key, time[, tiebreak]):
  // the engine inserts the exchanges/sorts, AQE and reuse included.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftOn).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ (rightOn +: tiebreak))
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lOn = leftOn
    val rOn = rightOn
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lOnProj = UnsafeProjection.create(Seq(lOn), lOut)
      val rOnProj = UnsafeProjection.create(Seq(rOn), rOut)
      val keyTypes = lKeys.map(_.dataType)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val onOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lOn.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against nullability-relaxed right attrs so the generated
      // getters null-check (unmatched lefts carry an all-null right row)
      val out = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadOn: InternalRow = _
        private var matchRow: InternalRow = _   // last right ≤ current left
        private var matchKey: InternalRow = _
        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
            rHeadOn = rOnProj(rHead).copy()
          } else { rHead = null; rHeadKey = null; rHeadOn = null }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lOnVal = lOnProj(lRow)
          // consume right rows that are still "≤" this left position
          while (rHead != null && {
            val kc = keyOrd.compare(rHeadKey, lKey)
            kc < 0 || (kc == 0 && onOrd.compare(rHeadOn, lOnVal) <= 0)
          }) {
            if (keyOrd.compare(rHeadKey, lKey) == 0) {
              matchRow = rHead.copy()
              matchKey = rHeadKey
            }
            advanceRight()
          }
          val rMatch =
            if (matchRow != null && matchKey != null &&
              keyOrd.compare(matchKey, lKey) == 0) matchRow
            else nullRight
          out(joined(lRow, rMatch))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

/** User-facing API. */
object AsOf {

  /** Ensure the strategy is planned in this session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** leftDf as-of-join rightDf: latest right row per key with
    * rightOn ≤ leftOn. `tiebreak` makes equal-timestamp picks
    * deterministic. */
  def join(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
           leftKeys: Seq[Column], rightKeys: Seq[Column],
           leftOn: Column, rightOn: Column,
           tiebreak: Seq[Column] = Nil): DataFrame = {
    install(spark)
    Bridge.ofRows(spark, AsOfJoinNode(
      Bridge.logicalPlan(leftDf), Bridge.logicalPlan(rightDf),
      leftKeys.map(Bridge.expression), rightKeys.map(Bridge.expression),
      Bridge.expression(leftOn), Bridge.expression(rightOn),
      tiebreak.map(Bridge.expression)))
  }
}
