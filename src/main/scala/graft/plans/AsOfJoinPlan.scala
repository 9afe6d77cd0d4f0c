package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join — SURVEY §2.2 C11's escalation
  * path, the extension tier below composed operators: a dedicated
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` (registered through
  * `SparkSessionExtensions` or `spark.experimental.extraStrategies`).
  *
  * Semantics: for every left row, append the right row with
  * `rightKey == leftKey` and `rightTime <= leftTime` that is MAXIMAL
  * under (rightTime, right columns in output order) — i.e. the latest
  * matching right row, deterministic ties — or nulls when no right row
  * qualifies (left-outer). One output row per left row.
  *
  * Why a custom operator: the composed formulation (equi-join on the
  * key with a `<=` range predicate, then per-left-row `max(struct)`)
  * materialises every (left, matching-right) pair before the argmax —
  * fan-out = orders-per-customer, quadratic in per-key history length.
  * This exec co-partitions both sides on the key, sorts within
  * partitions by (key, time[, payload]) — Spark inserts the exchanges
  * and sorts from `requiredChildDistribution`/`requiredChildOrdering`,
  * exactly like SortMergeJoin — and then a single forward merge walk
  * emits each left row's answer in O(|left| + |right|) with TWO rows
  * of state (the current right head and the best-so-far candidate):
  * because the right side is sorted ascending, the lexicographic max
  * of any qualifying prefix is simply its LAST row, so "argmax by
  * (time, payload)" degenerates to "last row seen with time <= t".
  * No fan-out, no aggregation, no per-key buffering of history.
  *
  * Restrictions (documented, checked at construction): single
  * equi-key, both key and time expressions must evaluate to numeric /
  * timestamp values (compared as Long via Number.longValue — covers
  * integral, date and timestamp types); a null key or time on either
  * side never matches (SQL predicate semantics).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward", toleranceUs: Long = -1L) extends BinaryNode {
  require(direction == "backward" || direction == "forward",
    s"as-of direction must be backward|forward, got $direction")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String, toleranceUs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges and aligns partition counts, as for SortMergeJoin)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // left: (key, time); right: (key, time, payload...) — the payload
  // columns make "last qualifying row" the deterministic argmax
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      right.output.map(a => SortOrder(a, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyExpr = BindReferences.bindReference(leftKey, left.output)
    val lTimeExpr = BindReferences.bindReference(leftTime, left.output)
    val rKeyExpr = BindReferences.bindReference(rightKey, right.output)
    val rTimeExpr = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      def evalLong(e: Expression, row: InternalRow): java.lang.Long =
        e.eval(row) match {
          case null => null
          case n: java.lang.Number => n.longValue()
          case other => throw new IllegalStateException(
            s"as-of join key/time must be numeric-comparable, got ${other.getClass}")
        }
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIt.buffered
      val forward = direction == "forward"
      // backward: best-so-far right row for candKey (copied — iterator
      // rows are reused); forward: the answer is the un-consumed head
      var cand: InternalRow = null
      var candKey = 0L
      var candTime = 0L
      lIt.map { lrow =>
        val lkBoxed = evalLong(lKeyExpr, lrow)
        val ltBoxed = evalLong(lTimeExpr, lrow)
        if (lkBoxed == null || ltBoxed == null) joined(lrow, nullRight)
        else {
          val lk = lkBoxed.longValue()
          val lt = ltBoxed.longValue()
          if (forward) {
            // consume rows strictly behind (key, lt); the first
            // surviving same-key row IS the answer (right sorted
            // (key, time, payload) asc -> earliest time, then smallest
            // payload on time ties). Not consumed: a later left row
            // with the same time needs it too.
            var advance = true
            while (advance && rBuf.hasNext) {
              val rkBoxed = evalLong(rKeyExpr, rBuf.head)
              if (rkBoxed == null) { rBuf.next() }
              else {
                val rk = rkBoxed.longValue()
                if (rk < lk) { rBuf.next() }
                else if (rk == lk) {
                  val rtBoxed = evalLong(rTimeExpr, rBuf.head)
                  if (rtBoxed == null) { rBuf.next() }
                  else if (rtBoxed.longValue() < lt) { rBuf.next() }
                  else advance = false
                } else advance = false
              }
            }
            val ok = rBuf.hasNext && {
              val rkBoxed = evalLong(rKeyExpr, rBuf.head)
              rkBoxed != null && rkBoxed.longValue() == lk && {
                val rt = evalLong(rTimeExpr, rBuf.head).longValue()
                toleranceUs < 0L || rt - lt <= toleranceUs
              }
            }
            if (ok) joined(lrow, rBuf.head) else joined(lrow, nullRight)
          } else {
            // backward: consume rows that are (a) behind this key, or
            // (b) on this key with time <= lt; (b) rows become the
            // candidate. Left is sorted by (key, time) — never rewinds.
            var advance = true
            while (advance && rBuf.hasNext) {
              val rkBoxed = evalLong(rKeyExpr, rBuf.head)
              if (rkBoxed == null) { rBuf.next() } // null key never matches
              else {
                val rk = rkBoxed.longValue()
                if (rk < lk) { rBuf.next() }
                else if (rk == lk) {
                  val rtBoxed = evalLong(rTimeExpr, rBuf.head)
                  if (rtBoxed == null) { rBuf.next() } // null time never matches
                  else if (rtBoxed.longValue() <= lt) {
                    candTime = rtBoxed.longValue()
                    cand = rBuf.next().copy(); candKey = rk
                  } else advance = false
                } else advance = false
              }
            }
            if (cand != null && candKey == lk &&
                (toleranceUs < 0L || lt - candTime <= toleranceUs))
              joined(lrow, cand)
            else joined(lrow, nullRight)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: `AsOfJoin` → `AsOfJoinExec`. Registered by
  * [[graft.GraftExtensions]] (SQL deployments) or appended to
  * `spark.experimental.extraStrategies` by the DataFrame API. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, dir, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
