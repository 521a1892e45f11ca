package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/**
 * The full custom-operator path ((c) in the engine design): a dedicated
 * logical node, planner strategy, and sort-merge physical operator for the
 * as-of join — the alternative to the union+window composition in
 * [[graft.operators.AsOfJoin]].
 *
 * Physical shape: both sides hash-partitioned on the key
 * (`ClusteredDistribution`, so `EnsureRequirements` co-partitions them) and
 * sorted by (key, time); each partition pair is merged in one pass — for
 * every left row, the retained right row is the last one with
 * `rightTime <= leftTime` for the same key. Left join semantics: unmatched
 * left rows get nulls. Cost at scale: one shuffle + sort per side, O(n+m)
 * merge, no buffering beyond a single right row per key.
 *
 * Constraints: key expressions must have the same data type on both sides;
 * time columns must be long-backed (timestamp / timestamp_ntz / bigint).
 * Null times have no as-of meaning: null-time right rows never match and
 * null-time left rows emit unmatched (both handled inside the merge).
 */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // times are compared as raw longs — identical long-backed types on both
  // sides is a hard requirement (a DateType days-int against a timestamp's
  // micros would compare silently wrong otherwise)
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type, got ${leftTime.dataType} vs ${rightTime.dataType}")
  require(Seq(leftTime.dataType).forall(t =>
    t == org.apache.spark.sql.types.LongType ||
    t == org.apache.spark.sql.types.TimestampType ||
    t == org.apache.spark.sql.types.TimestampNTZType),
    s"as-of time columns must be long-backed (bigint/timestamp/timestamp_ntz), got ${leftTime.dataType}")
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key columns must share a type, got ${leftKey.dataType} vs ${rightKey.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // children arrive hash-partitioned on the key and sorted by (key, time);
  // forward that so downstream operators don't re-shuffle/re-sort
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lk.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // SparkPlan output contract: rows crossing operator boundaries must be
      // UnsafeRow (collect()/shuffle cast to it) — project like SMJ does
      val outputProj = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)

      val it = new Iterator[InternalRow] {
        // one-row lookahead into the right side
        private var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null
        // last right row (copied) whose (key, time) has been passed
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          // a null time on either side has no as-of meaning: a null-time left
          // row emits unmatched (same as SQL `null <= t` ⇒ NULL), a null-time
          // right row is skipped (they sort nulls-first, so skipping cannot
          // hide a real match)
          val lTimeNull = lTimeRow.isNullAt(0)
          val lTimeVal = if (lTimeNull) 0L else lTimeRow.getLong(0)
          // drop any retained match from an earlier key
          if (matchedKey != null && keyOrdering.compare(matchedKey, lKey) != 0) {
            matched = null; matchedKey = null
          }
          // advance the right side through every row with key < lKey, or
          // key == lKey and time <= lTime; the last equal-key row wins
          var advancing = !lTimeNull
          while (advancing && rHead != null) {
            val rKey = rKeyProj(rHead)
            val cmp = keyOrdering.compare(rKey, lKey)
            if (cmp < 0) {
              rHead = if (rIt.hasNext) rIt.next() else null
            } else if (cmp == 0) {
              val rTimeRow = rTimeProj(rHead)
              if (rTimeRow.isNullAt(0)) {
                rHead = if (rIt.hasNext) rIt.next() else null
              } else if (rTimeRow.getLong(0) <= lTimeVal) {
                matched = rHead.copy()
                matchedKey = rKey.copy()
                rHead = if (rIt.hasNext) rIt.next() else null
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
          if (!lTimeNull && matched != null) joined(l, matched) else joined(l, nullRight)
        }
      }
      it.map(outputProj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
