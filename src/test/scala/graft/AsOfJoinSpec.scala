package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The custom as-of join SparkPlan (C11 escalation path): physical
  * plan shape, equality with the composed formulation, and the edge
  * regimes the merge walk must survive. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinNative plans through AsOfJoinExec with no join fan-out") {
    val events = Tables.load(spark, sf, "events")
    val orders = Tables.load(spark, sf, "orders")
    val df = Relational.asofJoinNative(events, orders)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000)) // exec prints without the Exec suffix
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the native path must not fall back to a join + aggregate")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      "the native path needs no argmax aggregation")
  }

  test("asofJoinNative equals the composed join + max(struct) formulation") {
    val events = Tables.load(spark, sf, "events")
    val orders = Tables.load(spark, sf, "orders")
    val composed = Relational.asofJoin(events, orders)
    val native = Relational.asofJoinNative(events, orders)
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("merge walk survives unmatched keys, null times, and shared-key batches") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100L), // key with orders before+after
      (2L, ts("2024-01-01 00:00:00"), 100L), // before every order of key
      (3L, ts("2024-01-10 00:00:00"), 200L), // key with no orders at all
      (4L, ts("2024-01-10 00:00:00"), 300L), // key whose only order is later
      (5L, ts("2024-01-10 00:00:00"), 400L), // exact-tie timestamp match
      (6L, ts("2024-01-20 00:00:00"), 100L)  // later event, same key as 1
    ).toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (11L, 100L, ts("2024-01-05 00:00:00"), 10.0),
      (12L, 100L, ts("2024-01-08 00:00:00"), 20.0), // latest <= event 1
      (13L, 100L, ts("2024-01-15 00:00:00"), 30.0), // latest <= event 6
      (14L, 300L, ts("2024-02-01 00:00:00"), 40.0), // after event 4
      (15L, 400L, ts("2024-01-10 00:00:00"), 50.0), // equal ts: inclusive
      (16L, 400L, ts("2024-01-10 00:00:00"), 60.0), // equal ts AND date: higher key wins
      (17L, 500L, ts("2024-01-01 00:00:00"), 70.0)  // key with no events
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.asofJoinNative(events, orders)
      .select("event_id", "asof_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L) == Some(12L))
    assert(out(2L) == None)
    assert(out(3L) == None)
    assert(out(4L) == None)
    assert(out(5L) == Some(16L)) // (date, orderkey) argmax: 16 over 15
    assert(out(6L) == Some(13L))
    // same answers as the composed formulation on this adversarial set
    val composed = Relational.asofJoin(events, orders)
    val native = Relational.asofJoinNative(events, orders)
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("forward direction picks the earliest at-or-after row; head is shared across ties") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100L), // order exists after
      (2L, ts("2024-01-10 00:00:00"), 100L), // SAME time: must share the answer
      (3L, ts("2024-01-16 00:00:00"), 100L), // after every order -> null
      (4L, ts("2024-01-05 00:00:00"), 200L)  // exact match + tie on time
    ).toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (11L, 100L, ts("2024-01-08 00:00:00"), 10.0), // before: not eligible
      (12L, 100L, ts("2024-01-12 00:00:00"), 20.0), // earliest >= events 1,2
      (13L, 100L, ts("2024-01-15 00:00:00"), 30.0),
      (14L, 200L, ts("2024-01-05 00:00:00"), 40.0), // tie: smaller key wins
      (15L, 200L, ts("2024-01-05 00:00:00"), 50.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.asofJoinForward(events, orders)
      .select("event_id", "asof_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L) == Some(12L))
    assert(out(2L) == Some(12L)) // equal-time left rows both see the head
    assert(out(3L) == None)
    assert(out(4L) == Some(14L)) // forward ties break to the SMALLEST key
  }

  test("tolerance nulls out matches older than the window") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-03-01 00:00:00"), 100L), // order 45 days old -> out of window
      (2L, ts("2024-01-20 00:00:00"), 100L)  // 4 days old -> in window
    ).toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (11L, 100L, ts("2024-01-16 00:00:00"), 10.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.asofJoinTolerance(events, orders) // 30-day window
      .select("event_id", "asof_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L) == None)
    assert(out(2L) == Some(11L))
  }
}
