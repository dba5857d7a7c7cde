package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator — the SURVEY.md §7.2
  * case (c): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered via `SparkSessionExtensions` (config path) or at runtime
  * on an existing session (`AsofJoinSupport.ensureRegistered`).
  *
  * Semantics (pandas `merge_asof` direction="backward", left outer):
  * every left row is paired with the LAST right row of the same key
  * whose time is <= the left row's time — ties on time broken by the
  * trailing `rightTiebreak` sort keys (last wins). Left rows with no
  * qualifying right row keep null right columns.
  *
  * Physical shape: one hash exchange per side on the key (the same
  * exchange an equi-join needs — `ClusteredDistribution` with a pinned
  * partition count so the two sides stay zip-compatible under AQE),
  * in-partition sort by (key, time[, tiebreak]), then a single forward
  * merge pass holding ONE buffered row of state. No range explosion,
  * no per-key buffering of the right side — at 100 TB this scales like
  * a sort-merge join, not like an inequality join.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryNode {

  // the interpreted orderings and hash co-partitioning below both assume
  // identical key/time types on the two sides — fail at construction,
  // not as a ClassCastException inside an executor task
  require(leftKey.dataType == rightKey.dataType,
    s"asofJoin: key types differ — ${leftKey.dataType.sql} vs ${rightKey.dataType.sql}")
  require(leftTime.dataType == rightTime.dataType,
    s"asofJoin: time types differ — ${leftTime.dataType.sql} vs ${rightTime.dataType.sql}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]; a no-op on every other node. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Pin the partition count on both sides: zipPartitions needs equal
  // counts, and AQE must not coalesce the two shuffles differently.
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n) ::
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  // The merge pass preserves the left child's (key, time) order.
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyB = BindReferences.bindReference(leftKey, left.output)
      val lTimeB = BindReferences.bindReference(leftTime, left.output)
      val rKeyB = BindReferences.bindReference(rightKey, right.output)
      val rTimeB = BindReferences.bindReference(rightTime, right.output)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      // Single-row merge state: the current right cursor plus the last
      // right row seen that could still match (its key + a private copy
      // — iterator rows are reused by the upstream sorter).
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var bufRow: InternalRow = null
      var bufKey: Any = null

      def advanceRight(): Unit =
        rRow = if (rIter.hasNext) rIter.next() else null

      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (lk == null || lt == null) {
          // Null key/time never matches; left rows with nulls sort first
          // within the partition so the cursor has not moved past data.
          toUnsafe(joined(l, nullRight))
        } else {
          // Consume right rows up to and including (lk, lt); the last
          // one consumed with key == lk is the as-of match.
          var advancing = true
          while (advancing && rRow != null) {
            val rk = rKeyB.eval(rRow)
            if (rk == null) advanceRight() // null keys sort first; skip
            else {
              val ck = keyOrd.compare(rk, lk)
              if (ck < 0) advanceRight() // earlier key group: skip past
              else if (ck > 0) advancing = false
              else {
                val rt = rTimeB.eval(rRow)
                if (rt == null) advanceRight() // null time sorts first; skip
                else if (timeOrd.compare(rt, lt) <= 0) {
                  // re-evaluate the key against the COPY: `rk` may be a
                  // reference (UTF8String, array) into the sorter's
                  // reused read buffer, which the next advance overwrites
                  // once the sort has spilled
                  bufRow = rRow.copy(); bufKey = rKeyB.eval(bufRow)
                  advanceRight()
                } else advancing = false
              }
            }
          }
          val matched = bufRow != null && keyOrd.compare(bufKey, lk) == 0
          toUnsafe(joined(l, if (matched) bufRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
