package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

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
  * equi-key of an orderable ATOMIC type — integral / date / timestamp
  * (compared as Long) or binary-collated STRING (compared as
  * UTF8String, matching Spark's default sort order) — with matching
  * kinds on both sides; time expressions must be numeric/timestamp.
  * Multi-column keys are rejected here, not at runtime: pass a single
  * packed expression (e.g. `concat_ws` / `struct` is NOT accepted —
  * concatenate with a separator or run one join per key) so the
  * sort-order/equality contract stays a single atomic comparison. A
  * null key or time on either side never matches (SQL predicate
  * semantics, pandas merge_asof's `by` behaves the same).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward", toleranceUs: Long = -1L) extends BinaryNode {
  require(direction == "backward" || direction == "forward",
    s"as-of direction must be backward|forward, got $direction")
  require(AsOfJoin.keyKind(leftKey.dataType).isDefined,
    AsOfJoin.unsupportedKeyMsg("left key", leftKey.dataType))
  require(AsOfJoin.keyKind(rightKey.dataType).isDefined,
    AsOfJoin.unsupportedKeyMsg("right key", rightKey.dataType))
  require(AsOfJoin.keyKind(leftKey.dataType) == AsOfJoin.keyKind(rightKey.dataType),
    s"as-of join key kinds must match: left ${leftKey.dataType} vs right ${rightKey.dataType}")
  require(AsOfJoin.keyKind(leftTime.dataType).contains("long") &&
      AsOfJoin.keyKind(rightTime.dataType).contains("long"),
    s"as-of join time must be a numeric/date/timestamp type, got ${leftTime.dataType}/${rightTime.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** The two orderable key classes the merge walk supports: "long"
    * (integral / date / timestamp, compared via Number.longValue) and
    * "string" (default binary collation only — a collated sort order
    * would disagree with UTF8String.compareTo and silently break the
    * walk, so non-binary collations are rejected). None = unsupported
    * (notably structs: no multi-column keys). */
  private[plans] def keyKind(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => Some("long")
    case s: StringType if s == StringType => Some("string")
    case _ => None
  }

  private[plans] def unsupportedKeyMsg(side: String, dt: DataType): String =
    s"as-of join $side type $dt is not supported: use a single integral/date/timestamp " +
      "or binary-collation string key (multi-column keys: concatenate into one string " +
      "with an unambiguous separator, or run one join per key)"
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
    // construction validated the kinds match; strings compare via
    // UTF8String.compareTo (binary — identical to the SortOrder the
    // walk runs under), everything else as Long
    val stringKey = AsOfJoin.keyKind(leftKey.dataType).contains("string")
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      def evalLong(e: Expression, row: InternalRow): java.lang.Long =
        e.eval(row) match {
          case null => null
          case n: java.lang.Number => n.longValue()
          case other => throw new IllegalStateException(
            s"as-of join time must be numeric-comparable, got ${other.getClass}")
        }
      def evalKey(e: Expression, row: InternalRow): Any = e.eval(row)
      def cmpKey(a: Any, b: Any): Int =
        if (stringKey) a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
        else java.lang.Long.compare(
          a.asInstanceOf[java.lang.Number].longValue(),
          b.asInstanceOf[java.lang.Number].longValue())
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIt.buffered
      val forward = direction == "forward"
      // backward: best-so-far right row for candKey (copied — iterator
      // rows are reused; candKey is re-evaluated from the COPY because
      // a UTF8String evaluated from the head row aliases the reused
      // buffer); forward: the answer is the un-consumed head
      var cand: InternalRow = null
      var candKey: Any = null
      var candTime = 0L
      lIt.map { lrow =>
        val lk = evalKey(lKeyExpr, lrow)
        val ltBoxed = evalLong(lTimeExpr, lrow)
        if (lk == null || ltBoxed == null) joined(lrow, nullRight)
        else {
          val lt = ltBoxed.longValue()
          if (forward) {
            // consume rows strictly behind (key, lt); the first
            // surviving same-key row IS the answer (right sorted
            // (key, time, payload) asc -> earliest time, then smallest
            // payload on time ties). Not consumed: a later left row
            // with the same time needs it too.
            var advance = true
            while (advance && rBuf.hasNext) {
              val rk = evalKey(rKeyExpr, rBuf.head)
              if (rk == null) { rBuf.next() }
              else {
                val c = cmpKey(rk, lk)
                if (c < 0) { rBuf.next() }
                else if (c == 0) {
                  val rtBoxed = evalLong(rTimeExpr, rBuf.head)
                  if (rtBoxed == null) { rBuf.next() }
                  else if (rtBoxed.longValue() < lt) { rBuf.next() }
                  else advance = false
                } else advance = false
              }
            }
            val ok = rBuf.hasNext && {
              val rk = evalKey(rKeyExpr, rBuf.head)
              rk != null && cmpKey(rk, lk) == 0 && {
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
              val rk = evalKey(rKeyExpr, rBuf.head)
              if (rk == null) { rBuf.next() } // null key never matches
              else {
                val c = cmpKey(rk, lk)
                if (c < 0) { rBuf.next() }
                else if (c == 0) {
                  val rtBoxed = evalLong(rTimeExpr, rBuf.head)
                  if (rtBoxed == null) { rBuf.next() } // null time never matches
                  else if (rtBoxed.longValue() <= lt) {
                    candTime = rtBoxed.longValue()
                    cand = rBuf.next().copy()
                    candKey = evalKey(rKeyExpr, cand)
                  } else advance = false
                } else advance = false
              }
            }
            if (cand != null && cmpKey(candKey, lk) == 0 &&
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
