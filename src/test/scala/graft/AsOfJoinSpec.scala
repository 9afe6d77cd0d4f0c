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

  test("string keys walk in Spark's binary string order, not numeric order") {
    def ts(s: String) = Timestamp.valueOf(s)
    // custkeys 2, 10, 100 -> keys u2, u10, u100: lexicographic order
    // (u10 < u100 < u2) disagrees with numeric, so a walk that compared
    // numerically (or trusted numeric sort) would mis-merge these keys
    val events = Seq(
      (1L, ts("2024-01-10 00:00:00"), 2L),
      (2L, ts("2024-01-10 00:00:00"), 10L),
      (3L, ts("2024-01-10 00:00:00"), 100L),
      (4L, ts("2024-01-10 00:00:00"), 5L) // no orders -> null
    ).toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (11L, 2L, ts("2024-01-05 00:00:00"), 10.0),
      (12L, 10L, ts("2024-01-06 00:00:00"), 20.0),
      (13L, 100L, ts("2024-01-07 00:00:00"), 30.0),
      (14L, 2L, ts("2024-01-08 00:00:00"), 40.0) // later order for key u2
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.asofJoinStringKey(events, orders)
      .select("event_id", "asof_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L) == Some(14L))
    assert(out(2L) == Some(12L))
    assert(out(3L) == Some(13L))
    assert(out(4L) == None)
    // and it plans through the custom exec, same as the numeric path
    val plan = Relational.asofJoinStringKey(events, orders)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin") && !plan.contains("SortMergeJoin"))
  }

  test("string-key result equals the numeric-key result on real tables") {
    val events = Tables.load(spark, sf, "events")
    val orders = Tables.load(spark, sf, "orders")
    // 'u' || k = 'u' || k' iff k = k', so the matched pairs are
    // identical — only the walk's comparisons changed
    val numeric = Relational.asofJoinNative(events, orders)
    val stringk = Relational.asofJoinStringKey(events, orders)
    assert(numeric.exceptAll(stringk).isEmpty && stringk.exceptAll(numeric).isEmpty)
  }

  test("unsupported key shapes are rejected at construction, not at runtime") {
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-10 00:00:00"), 1L, "a"))
      .toDF("event_id", "ts", "k1", "k2")
    val lp = l.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    // struct key (the multi-column-key temptation) -> clean reject
    val lStruct = l.select(col("event_id"), col("ts"),
      struct(col("k1"), col("k2")).as("sk")).queryExecution.analyzed
    val eStruct = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin(lStruct, lStruct,
        a(lStruct, "sk"), a(lStruct, "sk"), a(lStruct, "ts"), a(lStruct, "ts"))
    }
    assert(eStruct.getMessage.contains("multi-column"))
    // mismatched kinds (string vs long) -> clean reject
    val eMix = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin(lp, lp,
        a(lp, "k2"), a(lp, "k1"), a(lp, "ts"), a(lp, "ts"))
    }
    assert(eMix.getMessage.contains("must match"))
    // fractional key -> clean reject (no silent longValue truncation)
    val lDbl = l.select(col("event_id"), col("ts"),
      col("k1").cast("double").as("dk")).queryExecution.analyzed
    val eDbl = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin(lDbl, lDbl,
        a(lDbl, "dk"), a(lDbl, "dk"), a(lDbl, "ts"), a(lDbl, "ts"))
    }
    assert(eDbl.getMessage.contains("not supported"))
    // string TIME axis -> clean reject (tolerance arithmetic is on longs)
    val eTime = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin(lp, lp,
        a(lp, "k1"), a(lp, "k1"), a(lp, "k2"), a(lp, "k2"))
    }
    assert(eTime.getMessage.contains("time"))
  }

  test("null string keys never match and never join") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-10 00:00:00"), Some("a")),
      (2L, ts("2024-01-10 00:00:00"), None: Option[String])
    ).toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (11L, Some("a"), ts("2024-01-05 00:00:00"), 10.0),
      (12L, None: Option[String], ts("2024-01-06 00:00:00"), 20.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.asofJoinStringKey(
      events.withColumn("user_id", col("user_id")),
      orders.withColumn("o_custkey", col("o_custkey")))
    val m = out.select("event_id", "asof_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(m(1L) == Some(11L), s"non-null key must match: $m")
    assert(m(2L) == None, "null left key must produce a null right side")
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
