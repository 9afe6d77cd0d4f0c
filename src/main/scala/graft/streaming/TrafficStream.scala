package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.traffic.Traffic

/** Structured Streaming surface (SURVEY §2.1 R8-R12).
  *
  * The reference runs ONE pipeline definition in batch or streaming
  * (`TrafficMaxLaneFlow.java:374-396`); here that parity is by
  * construction — [[maxLaneFlowStream]] applies the very same
  * `Traffic.maxFlowSliding` plan to a watermarked `readStream`.
  *
  * Pub/Sub is not reachable in this environment; the injector
  * (`PubsubFileInjector.java:41-91`) is re-expressed against Spark's
  * streaming Dataset boundary so any line-oriented source
  * (file/socket/kafka/memory) plugs in unchanged.
  */
object TrafficStream {

  /** Typed record for the streaming feed (AvroCoder analogue, R11). */
  case class SensorEvent(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  private[streaming] case class SessState(start: Timestamp, end: Timestamp, n: Long)

  /** A closed session emitted by [[sessionizeStream]]. */
  case class Session(user_id: Long, n_events: Long, start_ts: Timestamp, end_ts: Timestamp)

  /** R8/R12: the flagship pipeline on a stream — watermark + sliding
    * window + argmax combiner. Append mode emits each (window,
    * station) exactly once, when the watermark passes the window end.
    * State per key is one struct (the running max), not a buffer —
    * the same partial-aggregation shape as batch, so executor state
    * stays O(open windows × stations) at any scale. */
  def maxLaneFlowStream(events: DataFrame, delay: String = "2 hours",
      dur: String = "60 minutes", slide: String = "15 minutes"): DataFrame =
    Traffic.maxFlowSliding(events.withWatermark("ts", delay), dur, slide)

  /** R9: injector filter on a line stream (drop empties + `Timestamp`
    * headers) — `PubsubFileInjector.FilterHeaderAndEmpties` verbatim,
    * as a Column predicate so it fuses into the source scan.
    *
    * Kafka would be the canonical Pub/Sub analogue
    * (`spark.readStream.format("kafka").load()
    * .selectExpr("CAST(value AS STRING)")` plugs into this same
    * `Dataset[String]` boundary unchanged), but the
    * `spark-sql-kafka-0-10` / `kafka-clients` jars are NOT present in
    * /opt/spark/jars and the environment has no artifact egress, so the
    * adapter cannot link here; file/memory readStream stand in. The
    * reference's publish-time `timestamp` attribute
    * (`PubsubFileInjector.java:84-87`) maps to the Kafka record
    * timestamp — with a line source we re-derive event time by parsing
    * the payload instead (same place the reference's batch mode gets
    * it). */
  def injectLines(lines: Dataset[String]): Dataset[String] = {
    import lines.sparkSession.implicits._
    lines.toDF("line")
      .where(length(col("line")) > 0 && !col("line").startsWith("Timestamp"))
      .select(col("line")).as[String]
  }

  /** R10: sink the stream to parquet via foreachBatch — idempotent by
    * (epoch-partitioned) overwrite, the BigQuery-sink analogue. */
  def sinkToParquet(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/epoch=$epoch")
      }

  /** Stream-static enrichment: join the event stream to a static
    * dimension (broadcast — the static side is planned per micro-batch
    * and never shuffles the stream). The BigQuery-joined-lookup
    * analogue for the reference's sink stage. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      events(streamKey) === dim(dimKey), "left")

  /** Stream-stream interval join: correlate two event streams per key
    * within a time bound (here: a later event of stream B following a
    * stream-A event by at most `withinMinutes`). Both sides carry
    * watermarks so the join state is bounded — Spark evicts buffered
    * rows once the other side's watermark passes the interval. */
  def correlateStreams(a: DataFrame, b: DataFrame, withinMinutes: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val left = a.withWatermark("ts", "1 hour")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("event_type").as("a_type"), col("ts").as("a_ts"))
    val right = b.withWatermark("ts", "1 hour")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("event_type").as("b_type"), col("ts").as("b_ts"))
    left.join(right,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("a_id") =!= col("b_id"))
  }

  /** LEFT OUTER variant of [[correlateStreams]]: an A-event with no
    * B-match inside the interval still emits — with null B columns —
    * once the watermark proves no matching B can arrive (Spark holds
    * the unmatched left row in state until the right watermark passes
    * a_ts + interval, then finalizes the null-extension; the time
    * bound on BOTH columns is what makes the outer join's state and
    * emission decidable at all). The funnel/attribution shape: "every
    * impression, with its click if one came". */
  def correlateStreamsLeftOuter(a: DataFrame, b: DataFrame,
      withinMinutes: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val left = a.withWatermark("ts", "1 hour")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("event_type").as("a_type"), col("ts").as("a_ts"))
    val right = b.withWatermark("ts", "1 hour")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("event_type").as("b_type"), col("ts").as("b_ts"))
    left.join(right,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("a_id") =!= col("b_id"),
      "left_outer")
  }

  /** Streaming exact-dedup: drop replayed records by id within the
    * watermark horizon — the streaming twin of `Dedup.exact`, and the
    * guard a Pub/Sub-style at-least-once injector needs (the reference
    * injector explicitly documents possible duplicate publishes,
    * `PubsubFileInjector.java:37-40`). State is bounded by the
    * watermark: ids older than the delay are evicted. */
  def dedupStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** A closed, forward-filled minute emitted by [[gapFillStream]]. */
  case class FilledMinute(station_id: Long, minute: Timestamp,
      flow: Option[Double], filled: Long)

  private[streaming] case class HourState(sums: Map[Int, Double])

  /** Streaming twin of `Relational.gapFill` (C22): per (station, hour)
    * the state is the sparse minute->flow sum map (≤ 60 entries — same
    * bounded-state shape as the batch map); when the watermark passes
    * the hour the group times out and emits all 60 minutes forward-
    * filled. Late events within the delay merge into the open hour;
    * the emission is exactly-once per (station, hour). */
  def gapFillStream(events: Dataset[SensorEvent],
      delay: String = "30 minutes"): Dataset[FilledMinute] = {
    import events.sparkSession.implicits._
    val HourMs = 3600000L
    events.withWatermark("ts", delay)
      .groupByKey(e => (e.user_id, e.ts.getTime - Math.floorMod(e.ts.getTime, HourMs)))
      .flatMapGroupsWithState[HourState, FilledMinute](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((station, hourMs), evs, state) =>
          if (state.hasTimedOut) {
            val sums = state.get.sums
            state.remove()
            var cur: Option[Double] = None
            (0 until 60).iterator.map { k =>
              sums.get(k).foreach(v => cur = Some(v))
              FilledMinute(station, new Timestamp(hourMs + k * 60000L), cur,
                if (sums.contains(k)) 0L else 1L)
            }
          } else {
            val sums = evs.foldLeft(state.getOption.map(_.sums).getOrElse(Map.empty[Int, Double])) {
              (acc, e) =>
                val k = ((e.ts.getTime - hourMs) / 60000L).toInt
                acc.updated(k, acc.getOrElse(k, 0.0) + e.value)
            }
            state.update(HourState(sums))
            state.setTimeoutTimestamp(hourMs + HourMs) // fire when the hour closes
            Iterator.empty
          }
      }
  }

  /** A closed (window, station) maximum from [[maxFlowSlidingDequeStream]] —
    * the same columns the batch ordered-scan emits. */
  case class WindowMax(station_id: Long, window_start: Timestamp, lane: String,
      max_flow: Double, event_id: Long, recorded_ts: Timestamp)

  private[streaming] case class BucketRec(value: Double, tsMs: Long,
      event_id: Long, lane: String)
  private[streaming] case class DequeTwinState(buckets: Map[Long, BucketRec],
      lastEmitted: Long)

  /** Streaming twin of the batch 60/1 ordered-scan flagship
    * (`Traffic.maxFlowSlidingScan` — the R5 note's "batch-only" path,
    * closed here): flatMapGroupsWithState keyed by station, state =
    * ONE argmax record per populated slide bucket plus the last
    * emitted window start. Each event folds into exactly one bucket
    * entry, so per-station state is O(populated buckets in the open
    * horizon) — the declarative `window()` plan stores ~dur/slide
    * copies of every event's aggregate in the state store (each event
    * belongs to 60 windows at 60/1), a 60× state reduction with
    * identical append-mode semantics: a (window, station) maximum is
    * emitted exactly once, when the event-time watermark passes the
    * window end; windows with no events emit nothing; late rows below
    * the watermark are dropped by Spark before the operator, exactly
    * as the windowed-aggregation plan drops them.
    *
    * The argmax total order is the batch walk's (value, ts, event_id,
    * lane) — SlidingScan.recGreater — so closed outputs are
    * row-identical to `maxFlowSlidingScan` on the same inputs
    * (parity-spec-pinned). Retention: bucket b is dropped once the
    * watermark closes the LAST window containing it (start b, end
    * (b + D)·slide); when every bucket is emitted and dropped the
    * key's state is removed entirely — a later event above the
    * watermark can only open not-yet-closed windows, so re-emission
    * is impossible by construction. */
  def maxFlowSlidingDequeStream(events: Dataset[SensorEvent], durSlides: Int = 60,
      slideSeconds: Long = 60L, delay: String = "2 hours"): Dataset[WindowMax] = {
    import events.sparkSession.implicits._
    val bucketMs = slideSeconds * 1000L
    val d = durSlides
    def greater(a: BucketRec, b: BucketRec): Boolean =
      if (a.value != b.value) a.value > b.value
      else if (a.tsMs != b.tsMs) a.tsMs > b.tsMs
      else if (a.event_id != b.event_id) a.event_id > b.event_id
      else a.lane > b.lane
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DequeTwinState, WindowMax](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (station: Long, evs: Iterator[SensorEvent], state: GroupState[DequeTwinState]) =>
          val st0 = state.getOption.getOrElse(DequeTwinState(Map.empty, Long.MinValue))
          val merged = evs.foldLeft(st0.buckets) { (acc, e) =>
            val b = Math.floorDiv(e.ts.getTime, bucketMs)
            val r = BucketRec(e.value, e.ts.getTime, e.event_id, e.event_type)
            acc.get(b) match {
              case Some(old) => if (greater(r, old)) acc.updated(b, r) else acc
              case None => acc.updated(b, r)
            }
          }
          val wmMs = state.getCurrentWatermarkMs()
          val out = scala.collection.mutable.ArrayBuffer.empty[WindowMax]
          var last = st0.lastEmitted
          if (merged.nonEmpty) {
            val sorted = merged.toArray.sortBy(_._1)
            val n = sorted.length
            var w = sorted.head._1 - (d - 1)
            if (last != Long.MinValue && last + 1 > w) w = last + 1
            var p = 0
            var done = false
            while (!done && (w + d) * bucketMs <= wmMs) {
              while (p < n && sorted(p)._1 < w) p += 1
              if (p == n) done = true
              else if (sorted(p)._1 > w + d - 1) w = sorted(p)._1 - (d - 1)
              else {
                // argmax over populated buckets in [w, w + d - 1]
                var q = p
                var best = sorted(q)._2
                q += 1
                while (q < n && sorted(q)._1 <= w + d - 1) {
                  if (greater(sorted(q)._2, best)) best = sorted(q)._2
                  q += 1
                }
                out += WindowMax(station, new Timestamp(w * bucketMs), best.lane,
                  best.value, best.event_id, new Timestamp(best.tsMs))
                last = w
                w += 1
              }
            }
          }
          // drop buckets whose last containing window has closed
          val kept = merged.filter { case (b, _) => (b + d) * bucketMs > wmMs }
          if (kept.isEmpty) state.remove()
          else {
            state.update(DequeTwinState(kept, last))
            // wake when the earliest un-emitted valid window closes
            val starts = kept.keys.toArray.sorted
            var ww = starts.head - (d - 1)
            if (last != Long.MinValue && last + 1 > ww) ww = last + 1
            var p = 0
            while (p < starts.length && starts(p) < ww) p += 1
            if (p < starts.length) {
              if (starts(p) > ww + d - 1) ww = starts(p) - (d - 1)
              state.setTimeoutTimestamp((ww + d) * bucketMs)
            }
          }
          out.iterator
      }
  }

  /** R20 (r10): the ENGINE-NATIVE streaming sessionization —
    * `session_window` aggregation under a watermark, the built-in
    * operator Spark merges-on-overlap and times out for us. This is
    * the same physical operator family as tumbling/sliding window
    * aggs (state = one running (start, end, count, sum) struct per
    * open session — never an event buffer), where [[sessionizeStream]]
    * below is the CUSTOM-state formulation of identical semantics via
    * flatMapGroupsWithState. Both exist deliberately: the native path
    * is what a user should reach for first (it inherits partial
    * aggregation, state-store compaction and AQE-free streaming plans
    * wholesale), the custom path is the template for semantics the
    * native operator can't express. Batch/stream parity is the spec's
    * contract: this IS `Relational.sessionWindow` applied to a
    * watermarked stream — one definition, two execution modes. */
  def sessionWindowStream(events: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    graft.operators.Relational.sessionWindow(
      events.withWatermark("ts", delay))

  /** Custom stateful operator: gap-based sessionization with
    * flatMapGroupsWithState + event-time timeout. State per user is a
    * single (start, end, n) struct; sessions close either when a
    * later event exceeds the gap or when the watermark times the
    * session out. The batch twin is `Relational.sessionize`. */
  def sessionizeStream(events: Dataset[SensorEvent], gapMinutes: Int = 30,
      delay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SensorEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.n, s.start, s.end))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
                  cur = Some(s.copy(end = e.ts, n = s.n + 1))
                case Some(s) =>
                  closed += Session(uid, s.n, s.start, s.end)
                  cur = Some(SessState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** A completed funnel conversion from [[funnelStream]]. */
  case class FunnelConversion(user_id: Long, t1: Timestamp, t2: Timestamp,
      t3: Timestamp)

  private[streaming] case class FunnelState(
      pending: Vector[(Long, Long, String)], // (tsMs, event_id, type) above the watermark
      t1: Option[Long], t2: Option[Long], t3: Option[Long])

  /** Streaming twin of the batch funnel (C30), restricted to the
    * append-expressible part: a conversion row is emitted EXACTLY ONCE
    * when a user's view → click → purchase chain completes, each stage
    * strictly after the previous and within the 1-hour stage window.
    * An event is folded into the chain only once the watermark passes
    * it (no earlier event can then arrive, so "first qualifying" is
    * final); ripe events are processed in (ts, event_id) order, which
    * makes the first qualifying event the batch plan's MIN. Users who
    * never complete emit nothing — the batch rows with reached < 3
    * have no append-mode analogue (their stage times stay forever
    * revisable upward in event time, and final-state queries belong to
    * the batch side; parity is spec-pinned against the batch operator's
    * reached = 3 rows). State per user: the not-yet-ripe events plus
    * three optional stage times. GC contract (spec-pinned): a converted
    * user's state collapses to a pending-free tombstone that survives —
    * re-armed on every later touch — until one stage window after the
    * user's activity clears the watermark, so a second chain inside
    * that horizon can never re-emit; a non-converted user's state is
    * removed as soon as the watermark proves the chain can no longer
    * complete (the next stage's 1-hour window is fully below the
    * watermark and nothing is pending — t1 is the global first view,
    * so nothing can revive it). The one caveat this horizon buys:
    * a brand-new chain separated from ALL of the user's prior activity
    * by more than the GC horizon is treated as a fresh user. */
  def funnelStream(events: Dataset[SensorEvent],
      delay: String = "10 minutes"): Dataset[FunnelConversion] = {
    import events.sparkSession.implicits._
    val stageMs = 3600000L
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelConversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SensorEvent], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Vector.empty, None, None, None))
          if (st.t3.isDefined) {
            // already converted: the tombstone absorbs everything. GC
            // only on timeout; any other invocation must RE-ARM the
            // timeout (Spark clears it on every call that doesn't set
            // one), else an active converted user's state leaks forever.
            if (state.hasTimedOut) state.remove()
            else state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + stageMs + 1)
            Iterator.empty
          } else {
            val wmMs = state.getCurrentWatermarkMs()
            val all = st.pending ++
              evs.map(e => (e.ts.getTime, e.event_id, e.event_type))
            val (ripe, rest) = all.partition(_._1 < wmMs)
            var (t1, t2, t3) = (st.t1, st.t2, st.t3)
            ripe.sortBy(t => (t._1, t._2)).foreach { case (ts, _, tpe) =>
              if (t3.isEmpty) tpe match {
                case "view" if t1.isEmpty => t1 = Some(ts)
                case "click" if t2.isEmpty && t1.exists(a => ts > a && ts <= a + stageMs) =>
                  t2 = Some(ts)
                case "purchase" if t1.isDefined && t2.exists(b => ts > b && ts <= b + stageMs) =>
                  t3 = Some(ts)
                case _ =>
              }
            }
            val out =
              if (t3.isDefined)
                Iterator.single(FunnelConversion(uid, new Timestamp(t1.get),
                  new Timestamp(t2.get), new Timestamp(t3.get)))
              else Iterator.empty
            if (t3.isDefined) {
              // conversion tombstone — NEVER remove here: a post-
              // conversion chain must find the tombstone, not empty
              // state, or the EXACTLY-ONCE contract breaks
              state.update(FunnelState(Vector.empty, t1, t2, t3))
              state.setTimeoutTimestamp(wmMs + stageMs + 1)
            } else {
              // the chain is dead once the next stage's window is fully
              // below the watermark with nothing pending to revive it
              // (deadline None = no view yet, dead iff nothing pending)
              val deadline = t2.orElse(t1).map(_ + stageMs)
              val dead = rest.isEmpty && deadline.forall(d => wmMs > d)
              if (dead) state.remove()
              else {
                state.update(FunnelState(rest, t1, t2, t3))
                val next =
                  if (rest.nonEmpty) math.max(rest.map(_._1).min, wmMs + 1)
                  else math.max(deadline.get + 1, wmMs + 1) // wake at expiry, then drop
                state.setTimeoutTimestamp(next)
              }
            }
            out
          }
      }
  }

  /** A finalized per-event anomaly flag from [[anomalyStream]] — the
    * same columns the batch `Relational.anomalyFlags` emits. */
  case class AnomalyFlag(user_id: Long, event_id: Long, cents: Long,
      win_n: Long, is_anomaly: Long)

  private[streaming] case class AnomalyState(
      pending: Vector[(Long, Long, Long)], // (tsMs, event_id, cents) awaiting the watermark
      history: Vector[(Long, Long)])       // (tsMs, cents) emitted, retained one window span

  /** Streaming twin of the batch 3σ anomaly test (C28): keyed by user,
    * an event's flag is FINALIZED only when the watermark passes its
    * timestamp — no earlier event can still arrive (Spark drops
    * below-watermark rows before the operator), so the trailing 7-day
    * window is complete and the emitted flag equals the batch RANGE-
    * frame computation on the same data (parity-spec-pinned, including
    * equal-timestamp peers: batch RANGE frames include peers, so ripe
    * events are processed per timestamp GROUP and see each other).
    * State per user = the not-yet-ripe pending events plus one window
    * span of emitted history; history older than watermark − 7 d can
    * never enter a future frame (future events sit at or above the
    * watermark) and is evicted each call, and an idle user's state is
    * garbage-collected by an event-time timeout one window span after
    * the watermark — state is bounded by rate × span, never unbounded.
    * Same integer-only decision arithmetic as the batch operator
    * (cents from the DECIMAL(18,2) HALF_UP cast, cross-multiplied
    * z-test, no float anywhere near the flag). Millisecond event-time
    * precision (the streaming feed's Timestamp.getTime granularity).
    */
  def anomalyStream(events: Dataset[SensorEvent],
      delay: String = "10 minutes"): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    val winMs = 7L * 86400000L
    val sig2 = 9L
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomalyState, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SensorEvent], state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(Vector.empty, Vector.empty))
          val wmMs = state.getCurrentWatermarkMs()
          val all = st.pending ++
            evs.map(e => (e.ts.getTime, e.event_id, cents(e.value)))
          val (ripe, rest) = all.partition(_._1 < wmMs)
          var hist = st.history
          val out = Vector.newBuilder[AnomalyFlag]
          // process ripe events in (ts, event_id) order, one timestamp
          // GROUP at a time so peers share a frame (batch RANGE parity)
          ripe.sortBy(t => (t._1, t._2)).groupBy(_._1).toSeq.sortBy(_._1)
            .foreach { case (t, group) =>
              hist = hist.filter(_._1 >= t - winMs) // monotone in t
              val frame = hist.map(_._2) ++ group.map(_._3)
              val n = frame.size.toLong
              val s = frame.sum
              val q = frame.map(c => c * c).sum
              group.foreach { case (_, eid, c) =>
                val flag = if ((n * c - s) * (n * c - s) > sig2 * (n * q - s * s)) 1L else 0L
                out += AnomalyFlag(uid, eid, c, n, flag)
              }
              hist = hist ++ group.map(g => (g._1, g._3))
            }
          hist = hist.filter(_._1 >= wmMs - winMs)
          if (rest.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(AnomalyState(rest, hist))
            val next =
              if (rest.nonEmpty) math.max(rest.map(_._1).min, wmMs + 1)
              else wmMs + winMs + 1 // GC: history is useless once wm moves a span
            state.setTimeoutTimestamp(next)
          }
          out.result().iterator
      }
  }
}
