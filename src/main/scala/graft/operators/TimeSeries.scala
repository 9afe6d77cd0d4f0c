package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequentially-recursive time-series operators (SURVEY §2.2 C21) —
  * the family whose recurrence cannot be expressed as a SQL window
  * frame (each output depends on the PREVIOUS OUTPUT, not a frame of
  * inputs), so the ordered per-key scan is the design, not a
  * shortcut: repartition on the key, sort within partitions by
  * (key, time), fold with O(1) state — the same pattern as
  * [[graft.traffic.SlidingScan]] and [[Packing]].
  */
object TimeSeries {

  /** Per-user EWMA (α = 1/4) over event values ordered by
    * (ts, event_id): s₀ = x₀, sₜ = (xₜ + 3·sₜ₋₁) ÷ 4.
    *
    * Computed in FIXED-POINT micro-units (x scaled ×10⁶, truncating
    * integer division each step) rather than doubles: a float fold of
    * thousands of steps is bit-reproducible only if both engines emit
    * the exact same instruction shapes — DuckDB's evaluator may
    * contract a·x + b·s into an FMA while the JVM never does, and the
    * one-ulp drift lands on round() boundaries (observed at sf0.01
    * row 780). Integer arithmetic has no such freedom: every engine
    * computes the identical BIGINT, the oracle compares exactly, and
    * the quantization (1e-6 of the value scale) is far below any
    * consumer's noise floor. Division truncates toward zero — JVM
    * Long `/` and DuckDB `//` agree on that for all signs (DuckDB
    * `-7 // 2 = -3`, measured; floorDiv would drift on negative
    * trends). */
  def ewma(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 1000000L, 0).cast("long").as("x"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var user = Long.MinValue
        var s = 0L
        it.map { case (u, ts, id, x) =>
          s = if (u != user) { user = u; x } else (x + 3L * s) / 4L
          (id, u, ts, s)
        }
      }
      .toDF("event_id", "user_id", "ts_us", "ewma_micros")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("ewma_micros"))
  }

  /** Per-user Holt double exponential smoothing (level + trend),
    * α = 1/4, β = 1/8, in the same µ-unit fixed point as [[ewma]]:
    *   ℓ₀ = x₀, b₀ = 0;
    *   ℓₜ = (xₜ + 3·(ℓₜ₋₁ + bₜ₋₁)) ÷ 4
    *   bₜ = (ℓₜ − ℓₜ₋₁ + 7·bₜ₋₁) ÷ 8
    * Forecast = ℓ + b, the one-step-ahead prediction a drift monitor
    * alerts on. Same one-exchange ordered-scan plan; three longs of
    * state. */
  def holt(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 1000000L, 0).cast("long").as("x"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var user = Long.MinValue
        var level = 0L
        var trend = 0L
        it.map { case (u, ts, id, x) =>
          if (u != user) { user = u; level = x; trend = 0L }
          else {
            val prev = level
            level = (x + 3L * (level + trend)) / 4L
            trend = (level - prev + 7L * trend) / 8L
          }
          (id, u, ts, level, trend, level + trend)
        }
      }
      .toDF("event_id", "user_id", "ts_us", "level_micros", "trend_micros", "forecast_micros")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        col("level_micros"), col("trend_micros"), col("forecast_micros"))
  }

  val holtSql: String =
    """WITH RECURSIVE src AS (
  SELECT event_id, user_id, ts, round(value * 1000000)::BIGINT AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
fold AS (
  SELECT event_id, user_id, ts, rn, x AS l, 0::BIGINT AS b FROM src WHERE rn = 1
  UNION ALL
  SELECT t.event_id, t.user_id, t.ts, t.rn,
         (t.x + 3 * (f.l + f.b)) // 4,
         ((t.x + 3 * (f.l + f.b)) // 4 - f.l + 7 * f.b) // 8
  FROM fold f JOIN src t ON t.user_id = f.user_id AND t.rn = f.rn + 1)
SELECT event_id, user_id, ts, l AS level_micros, b AS trend_micros,
       l + b AS forecast_micros
FROM fold"""

  /** Recursive-CTE mirror: one step per row per user, identical fold
    * order (ts, event_id) and identical BIGINT truncating-div recurrence. */
  val ewmaSql: String =
    """WITH RECURSIVE src AS (
  SELECT event_id, user_id, ts, round(value * 1000000)::BIGINT AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
fold AS (
  SELECT event_id, user_id, ts, rn, x AS s FROM src WHERE rn = 1
  UNION ALL
  SELECT t.event_id, t.user_id, t.ts, t.rn, (t.x + 3 * f.s) // 4
  FROM fold f JOIN src t ON t.user_id = f.user_id AND t.rn = f.rn + 1)
SELECT event_id, user_id, ts, s AS ewma_micros FROM fold"""

  // ---- C66 (r8): additive seasonal decomposition (weekly) ----
  // The windowed member of the family (EWMA/Holt are the recursive
  // ones): split each type's DAILY series into trend + weekly seasonal
  // + residual — the classic STL-lite every metrics pipeline runs
  // before anomaly flags so a weekend dip doesn't page anyone.
  //   trend(d)    = centered 7-day moving average (RANGE -3..+3 over
  //                 the integer day key — edge days average their
  //                 available frame, mirrored exactly in the oracle)
  //   seasonal(w) = mean of (daily - trend) per weekday, re-centered
  //                 by the series mean so seasonal averages to zero
  //                 across the days of each type (the additive-model
  //                 identifiability convention, day-weighted)
  //   residual    = daily - trend - seasonal
  // Exactness: the daily level is an exact DECIMAL sum cast once to
  // double; trend/seasonal/residual are short deterministic-order
  // float reductions released at round 4 (the C19 precedent), with
  // weekday from the floored epoch-day idiom (C62). Scale: one
  // (type, day) aggregate — days(type) is calendar-bounded, so the
  // window/group passes after it are ~free at any corpus size; the
  // raw corpus is touched exactly once.
  def seasonalDecompose(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val D = 86400L * 1000000L
    val daily = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("daily"))
      .withColumn("dow", pmod(col("day") + 4, lit(7)))
    val wTrend = Window.partitionBy("event_type").orderBy("day")
      .rangeBetween(-3, 3)
    val t = daily.withColumn("trend", avg(col("daily")).over(wTrend))
      .withColumn("detr", col("daily") - col("trend"))
    val wDow = Window.partitionBy("event_type", "dow")
    val wType = Window.partitionBy("event_type")
    t.withColumn("s_raw", avg(col("detr")).over(wDow))
      .withColumn("seasonal", col("s_raw") - avg(col("s_raw")).over(wType))
      .select(col("event_type"), col("day"), col("dow"),
        round(col("daily"), 4).as("daily"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("daily") - col("trend") - col("seasonal"), 4).as("residual"))
  }

  val seasonalDecomposeSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    sum(value::DECIMAL(18,6))::DOUBLE AS daily
  FROM events GROUP BY 1, 2),
d2 AS (SELECT *, ((day + 4) % 7 + 7) % 7 AS dow FROM daily),
tr AS (SELECT *,
    avg(daily) OVER (PARTITION BY event_type ORDER BY day
      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
  FROM d2),
se AS (SELECT *, daily - trend AS detr,
    avg(daily - trend) OVER (PARTITION BY event_type, dow) AS s_raw
  FROM tr)
SELECT event_type, day, dow,
  round(daily, 4) AS daily, round(trend, 4) AS trend,
  round(s_raw - avg(s_raw) OVER (PARTITION BY event_type), 4) AS seasonal,
  round(daily - trend - (s_raw - avg(s_raw) OVER (PARTITION BY event_type)), 4) AS residual
FROM se"""
  }

  // ---- C104 (r10): autocorrelation function — lag structure audit ----
  // The diagnostic every forecasting choice upstream of C21/C66/C91
  // rests on: WHICH lags carry signal (a day-7 spike says weekly
  // seasonality — C66/C91's premise; slow decay says trend — C40/C72's
  // premise). ACF at lags 1..7 of the daily event-count series per
  // type, EXACT integer arithmetic: with n days and total S, the
  // mean-centered products multiply out to Σ(n·c_d − S)(n·c_{d+ℓ} − S)
  // over the n² common denominator — numerator and denominator are
  // exact DECIMAL(38,0)s (cast BEFORE the product: n·c leaves BIGINT
  // range squared at 1e9-event days) and r_ℓ is one final division,
  // round 6. Pair terms use observed day pairs (d, d+ℓ both present);
  // the denominator sums over all days — the standard ACF estimator.
  // Plan: one corpus-touching daily aggregate, then a declared 7-row
  // grid fan-out and a self-equi-join of the CALENDAR-BOUNDED daily
  // frame on (type, day+ℓ) — post-aggregate volume, never raw events.
  /** Shared C104/C109 core: per-type mean-centered daily deviations
    * e_d = n·c_d − S (exact DECIMAL over the n² common denominator)
    * plus the per-type denominator Σe². */
  private def dailyDeviations(events: DataFrame): (DataFrame, DataFrame) = {
    val D = 86400L * 1000000L
    val d38 = "decimal(38,0)"
    val daily = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"))
    val dev = daily.join(tot, "event_type")
      .select(col("event_type"), col("day"), col("n_days"),
        (col("n_days").cast(d38) * col("c") - col("s")).as("e"))
    val den = dev.groupBy(col("event_type"), col("n_days"))
      .agg(sum(col("e") * col("e")).as("den"))
    (dev, den)
  }

  def acf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val (dev, den) = dailyDeviations(events)
    val grid = (1L to 7L).toDF("lag")
    val num = dev.select(col("event_type"), col("day"), col("e"))
      .crossJoin(broadcast(grid))
      .withColumn("day2", col("day") + col("lag"))
      .join(dev.select(col("event_type"), col("day").as("day2"), col("e").as("e2")),
        Seq("event_type", "day2"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("e") * col("e2")).as("acf_num"))
    num.join(den, "event_type")
      .select(col("event_type"), col("lag"), col("n_days"), col("n_pairs"),
        // Released as BIGINT: bounded by (n_days·max_daily)² · n_days
        // ≈ 2.8e13 at sf0.01 — int64-safe at any driver check scale;
        // the DECIMAL(38,0) arithmetic above stays internal.
        col("acf_num").cast("long").as("acf_num"),
        col("den").cast("long").as("den"),
        round(col("acf_num").cast("double") /
          nullif(col("den"), lit(0).cast(d38)).cast("double"), 6).as("acf"))
  }

  val acfSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, count(*)::BIGINT AS n_days, sum(c)::BIGINT AS s
  FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, t.n_days,
    (t.n_days::HUGEINT * d.c - t.s) AS e
  FROM daily d JOIN tot t USING (event_type)),
den AS (SELECT event_type, n_days, sum(e * e)::DECIMAL(38,0) AS den
  FROM dev GROUP BY 1, 2),
grid AS (SELECT unnest(generate_series(1, 7))::BIGINT AS lag),
num AS (
  SELECT a.event_type, g.lag, count(*)::BIGINT AS n_pairs,
    sum(a.e * b.e)::DECIMAL(38,0) AS acf_num
  FROM dev a CROSS JOIN grid g
  JOIN dev b ON b.event_type = a.event_type AND b.day = a.day + g.lag
  GROUP BY 1, 2)
SELECT n.event_type, n.lag, d.n_days, n.n_pairs,
  n.acf_num::BIGINT AS acf_num, d.den::BIGINT AS den,
  round(n.acf_num::DOUBLE / nullif(d.den, 0)::DOUBLE, 6) AS acf
FROM num n JOIN den d USING (event_type)"""
  }

  // ---- C109 (r10): cross-correlation — which series LEADS which ----
  // C104 finds structure WITHIN a series; the operational question is
  // BETWEEN them: do views at day d predict purchases at day d+ℓ (the
  // positive-lag peak says a leads b by ℓ — the signal behind
  // marketing-mix lag models and alerting precursors)? CCF over the
  // SAME exact deviation frame as C104 (shared core): per ordered
  // type pair (a ≠ b) and lag 0..7, num = Σ e_a(d)·e_b(d+ℓ) exact
  // DECIMAL(38,0); normalization √(den_a·den_b) and the division are
  // the only float ops, written in identical order on both engines.
  // Plan: the pair×lag fan-out runs entirely on the calendar-bounded
  // daily deviation frame (alphabet²·8 result rows); the corpus is
  // touched once by the shared daily aggregate.
  def ccf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (dev, den) = dailyDeviations(events)
    val grid = (0L to 7L).toDF("lag")
    val a = dev.select(col("event_type").as("type_a"), col("day"), col("e").as("ea"))
    val b = dev.select(col("event_type").as("type_b"), col("day").as("day2"),
      col("e").as("eb"))
    val num = a.crossJoin(broadcast(grid))
      .withColumn("day2", col("day") + col("lag"))
      .join(b, "day2")
      .where(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ea") * col("eb")).as("ccf_num"))
    num
      .join(den.select(col("event_type").as("type_a"), col("den").as("den_a")), "type_a")
      .join(den.select(col("event_type").as("type_b"), col("den").as("den_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("lag"), col("n_pairs"),
        // Released as BIGINT (same bound argument as acf_num).
        col("ccf_num").cast("long").as("ccf_num"),
        round(col("ccf_num").cast("double") /
          nullif(sqrt(col("den_a").cast("double") * col("den_b").cast("double")),
            lit(0.0)), 6).as("ccf"))
  }

  val ccfSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, count(*)::BIGINT AS n_days, sum(c)::BIGINT AS s
  FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, t.n_days,
    (t.n_days::HUGEINT * d.c - t.s) AS e
  FROM daily d JOIN tot t USING (event_type)),
den AS (SELECT event_type, sum(e * e)::DECIMAL(38,0) AS den
  FROM dev GROUP BY 1),
grid AS (SELECT unnest(generate_series(0, 7))::BIGINT AS lag),
num AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, g.lag,
    count(*)::BIGINT AS n_pairs, sum(a.e * b.e)::DECIMAL(38,0) AS ccf_num
  FROM dev a CROSS JOIN grid g
  JOIN dev b ON b.day = a.day + g.lag AND b.event_type <> a.event_type
  GROUP BY 1, 2, 3)
SELECT n.type_a, n.type_b, n.lag, n.n_pairs, n.ccf_num::BIGINT AS ccf_num,
  round(n.ccf_num::DOUBLE /
    nullif(sqrt(da.den::DOUBLE * db.den::DOUBLE), 0.0), 6) AS ccf
FROM num n JOIN den da ON da.event_type = n.type_a
JOIN den db ON db.event_type = n.type_b"""
  }

  // ---- C69 (r8): CUSUM change-point detection — integer-exact ----
  // The sequential monitoring classic (Page 1954): an upward level
  // shift smaller than any single day's noise still accumulates —
  // s_t = max(0, s_{t-1} + (x_t − μ − k)) grows linearly once the
  // mean moves by > k, and s_t > h flags the change; 3σ-style per-day
  // tests (C28) structurally cannot see it. Self-calibrating with the
  // fit-on-prefix discipline (L102/C65): μ = prefix mean and
  // d = prefix mean absolute deviation over each type's first
  // `CusumFitDays` days, k = d/2, h = 4d — ALL in truncating integer
  // micro-arithmetic (sum div n; both engines truncate — measured),
  // so the whole operator is bit-exact with zero float ops. The
  // recursion runs on the POST-AGGREGATE calendar-bounded daily frame
  // (the corpus is touched once, by the daily sum); per-type fold is
  // the EWMA ordered-scan pattern, one long of state. Oracle: daily
  // CTE + prefix-fit + recursive-CTE fold.
  private val CusumFitDays = 14L

  // ---- C72 (r8): Theil-Sen robust trend — median of pairwise slopes ----
  // C40's OLS slope moves arbitrarily far under ONE corrupted point
  // (breakdown 0); Theil-Sen (median of all pairwise slopes) has
  // breakdown 29% and is the standard robust trend for noisy metric
  // series. The O(n²) pair enumeration would be disqualifying on raw
  // events — so it runs on the POST-AGGREGATE daily frame (the
  // C66/C69 pattern): the corpus is touched once by the daily sum,
  // and per type the frame is calendar-bounded (30 days → 435 pairs;
  // even 10 years → ~6.7M pairs per type, a per-key flatMap, not a
  // shuffle). Exactness: each pairwise slope is the round-6 double of
  // an exact integer ratio (Δmicros div Δdays happens as ONE double
  // division), and the median over those round-6 doubles is the exact
  // interpolated C13 percentile — deterministic on both engines.
  def theilSen(events: DataFrame): DataFrame = {
    val D = 86400L * 1000000L
    val daily = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L).cast("long").as("x"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        round((col("b.x") - col("a.x")).cast("double") /
          ((col("b.day") - col("a.day")) * 1000000L).cast("double"), 6).as("slope"))
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5D)"), 6).as("slope_per_day"))
  }

  val theilSenSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    (sum(value::DECIMAL(18,6)) * 1000000)::BIGINT AS x
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
    round((b.x - a.x)::DOUBLE / ((b.day - a.day) * 1000000)::DOUBLE, 6) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day)
SELECT event_type, count(*)::BIGINT AS n_pairs,
       round(quantile_cont(slope, 0.5), 6) AS slope_per_day
FROM pairs GROUP BY event_type"""
  }

  def cusum(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val D = 86400L * 1000000L
    val daily = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
        .cast("long").as("x"))
      .withColumn("d0", min(col("day")).over(Window.partitionBy("event_type")))
    val mu = daily.where(col("day") < col("d0") + CusumFitDays)
      .groupBy(col("event_type"))
      .agg(expr("sum(x) div count(1)").as("mu"))
    val fit = daily.join(broadcast(mu), "event_type")
      .where(col("day") < col("d0") + CusumFitDays)
      .groupBy(col("event_type"), col("mu"))
      .agg(expr("sum(abs(x - mu)) div count(1)").as("dev"))
      .select(col("event_type"), col("mu"),
        expr("dev div 2").as("k"), (col("dev") * 4).as("h"))
    daily.join(broadcast(fit), "event_type")
      .select(col("event_type"), col("day"), col("x"),
        col("mu"), col("k"), col("h"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("day"))
      .as[(String, Long, Long, Long, Long, Long)]
      .mapPartitions { it =>
        var key = ""
        var s = 0L
        it.map { case (t, day, x, mu0, k, h) =>
          if (t != key) { key = t; s = 0L }
          s = math.max(0L, s + (x - mu0 - k))
          (t, day, x, s, if (s > h) 1L else 0L)
        }
      }
      .toDF("event_type", "day", "x_micros", "cusum_micros", "flag")
  }

  val cusumSql: String = {
    val D = 86400L * 1000000L
    s"""WITH RECURSIVE daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    (sum(value::DECIMAL(18,6)) * 1000000)::BIGINT AS x
  FROM events GROUP BY 1, 2),
d0 AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
mu AS (
  SELECT daily.event_type, sum(x) // count(*) AS mu
  FROM daily JOIN d0 USING (event_type)
  WHERE day < d0 + $CusumFitDays GROUP BY 1),
fit AS (
  SELECT daily.event_type, mu,
    (sum(abs(x - mu)) // count(*)) // 2 AS k,
    (sum(abs(x - mu)) // count(*)) * 4 AS h
  FROM daily JOIN d0 USING (event_type) JOIN mu USING (event_type)
  WHERE day < d0 + $CusumFitDays GROUP BY 1, 2),
src AS (
  SELECT daily.event_type, day, x, mu, k, h,
    row_number() OVER (PARTITION BY daily.event_type ORDER BY day) AS rn
  FROM daily JOIN fit USING (event_type)),
fold AS (
  SELECT event_type, day, x, mu, k, h, rn,
    greatest(0, x - mu - k)::BIGINT AS s
  FROM src WHERE rn = 1
  UNION ALL
  SELECT t.event_type, t.day, t.x, t.mu, t.k, t.h, t.rn,
    greatest(0, f.s + (t.x - t.mu - t.k))::BIGINT
  FROM fold f JOIN src t ON t.event_type = f.event_type AND t.rn = f.rn + 1)
SELECT event_type, day, x AS x_micros, s AS cusum_micros,
       (s > h)::BIGINT AS flag
FROM fold"""
  }

  // ---- C91 (r9): Holt-Winters triple smoothing (additive, weekly) ----
  // Completes the smoothing family: EWMA (C18) tracks level, Holt
  // (C21) adds trend, Holt-Winters adds SEASONALITY — the forecast a
  // weekly-cycled ops metric actually needs (C66 decomposes offline;
  // this is the online recursive twin). Additive form with a 7-slot
  // rotating season, all in the repo's µ-unit truncating fixed point
  // (α=1/4, β=1/8, γ=1/16 as shift-friendly dyadics):
  //   ℓₜ = (xₜ − s₁ + 3·(ℓ + b)) ÷ 4
  //   bₜ = (ℓₜ − ℓ + 7·b) ÷ 8
  //   sₜ = (xₜ − ℓₜ + 15·s₁) ÷ 16    (s₁ = slot from 7 steps ago)
  //   fitted (one-step-ahead, BEFORE seeing xₜ) = ℓ + b + s₁
  // Cold start is declared: row 1 sets ℓ = x, b = 0, all slots 0 —
  // both engines replay the identical fold, so iteration n is
  // bit-exact. Runs on the post-aggregate calendar-bounded daily
  // frame (the C66/C69 pattern): corpus touched once by the daily
  // sum; per-type fold is the EWMA ordered scan with nine longs of
  // state; oracle carries the seven slots as recursive-CTE columns.
  def holtWinters(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val D = 86400L * 1000000L
    events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
        .cast("long").as("x"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("day"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var key = ""
        var l = 0L
        var b = 0L
        val s = new Array[Long](7)
        var rn = 0
        it.map { case (t, day, x) =>
          if (t != key) {
            key = t; l = 0L; b = 0L; java.util.Arrays.fill(s, 0L); rn = 0
          }
          rn += 1
          if (rn == 1) {
            l = x; b = 0L
            (t, day, x, l, b, 0L, x)
          } else {
            val s1 = s(0)
            val fitted = l + b + s1
            val lp = (x - s1 + 3L * (l + b)) / 4L
            val bp = (lp - l + 7L * b) / 8L
            val snew = (x - lp + 15L * s1) / 16L
            var i = 0
            while (i < 6) { s(i) = s(i + 1); i += 1 }
            s(6) = snew
            l = lp; b = bp
            (t, day, x, l, b, snew, fitted)
          }
        }
      }
      .toDF("event_type", "day", "x_micros", "level_micros", "trend_micros",
        "season_micros", "fitted_micros")
  }

  val holtWintersSql: String = {
    val D = 86400L * 1000000L
    val lExpr = "(t.x - f.s1 + 3 * (f.l + f.b)) // 4"
    s"""WITH RECURSIVE daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    (sum(value::DECIMAL(18,6)) * 1000000)::BIGINT AS x
  FROM events GROUP BY 1, 2),
src AS (
  SELECT event_type, day, x,
    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily),
fold AS (
  SELECT event_type, day, x, rn, x AS l, 0::BIGINT AS b,
    0::BIGINT AS s1, 0::BIGINT AS s2, 0::BIGINT AS s3, 0::BIGINT AS s4,
    0::BIGINT AS s5, 0::BIGINT AS s6, 0::BIGINT AS s7,
    0::BIGINT AS season, x AS fitted
  FROM src WHERE rn = 1
  UNION ALL
  SELECT t.event_type, t.day, t.x, t.rn,
    ($lExpr)::BIGINT,
    (($lExpr - f.l + 7 * f.b) // 8)::BIGINT,
    f.s2, f.s3, f.s4, f.s5, f.s6, f.s7,
    ((t.x - $lExpr + 15 * f.s1) // 16)::BIGINT,
    ((t.x - $lExpr + 15 * f.s1) // 16)::BIGINT,
    (f.l + f.b + f.s1)::BIGINT
  FROM fold f JOIN src t ON t.event_type = f.event_type AND t.rn = f.rn + 1)
SELECT event_type, day, x AS x_micros, l AS level_micros, b AS trend_micros,
  season AS season_micros, fitted AS fitted_micros
FROM fold"""
  }

  // ---- C119 (r10): forecast backtest — seasonal-naive vs persistence ----
  // The model-selection readout C66/C91 presume: BEFORE fitting a
  // seasonal model, measure what the two trivial forecasters cost on a
  // rolling-origin backtest — persistence (tomorrow = today) and
  // seasonal-naive (tomorrow = same weekday last week). Seasonal
  // beating persistence IS the evidence of weekly structure (C104's
  // day-7 spike, stated as forecast error). Dense calendar per type
  // (zero-filled via a bounded sequence explode — absent days are real
  // zeros, not missing pairs), both lags from ONE type-keyed window
  // pass, evaluation restricted to days where both forecasts exist.
  // All-integer error sums (counts in, |diffs| out); the two MAEs are
  // single rounded divisions.
  def forecastBacktest(events: DataFrame): DataFrame = {
    val D = 86400L * 1000000L
    val daily = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val span = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dense = span
      .select(col("event_type"), col("d0"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    dense
      .withColumn("f1", lag(col("c"), 1).over(w))
      .withColumn("f7", lag(col("c"), 7).over(w))
      .where(col("day") >= col("d0") + 7)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("c") - col("f1"))).as("mae1_num"),
        sum(abs(col("c") - col("f7"))).as("mae7_num"),
        sum(col("c") - col("f7")).as("bias7"))
      .select(col("event_type"), col("n_days"), col("mae1_num"),
        col("mae7_num"), col("bias7"),
        round(col("mae1_num").cast("double") / col("n_days").cast("double"), 6)
          .as("mae_persistence"),
        round(col("mae7_num").cast("double") / col("n_days").cast("double"), 6)
          .as("mae_seasonal"))
  }

  val forecastBacktestSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
dense AS (
  SELECT g.event_type, g.d0, g.day, coalesce(d.c, 0)::BIGINT AS c
  FROM (SELECT event_type, d0, unnest(generate_series(d0, d1))::BIGINT AS day
        FROM span) g
  LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day),
lagged AS (
  SELECT event_type, d0, day, c,
    lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1,
    lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS f7
  FROM dense)
SELECT event_type, count(*)::BIGINT AS n_days,
  sum(abs(c - f1))::BIGINT AS mae1_num,
  sum(abs(c - f7))::BIGINT AS mae7_num,
  sum(c - f7)::BIGINT AS bias7,
  round(sum(abs(c - f1))::BIGINT::DOUBLE / count(*)::DOUBLE, 6) AS mae_persistence,
  round(sum(abs(c - f7))::BIGINT::DOUBLE / count(*)::DOUBLE, 6) AS mae_seasonal
FROM lagged WHERE day >= d0 + 7 GROUP BY event_type"""
  }

  // ---- C130 (r10): seasonal index — ratio-to-moving-average ----
  // The classical decomposition C66's STL-lite sits beside: each day's
  // count as a ratio to its CENTERED 7-day moving average, averaged by
  // day-of-week (C66's pmod(day+4, 7) convention) — the multiplicative
  // seasonal index table ops teams still publish. ENTIRELY integer:
  // the ratio is the cross-multiplied exact ppm c·7·10^6 div s7 (the
  // MA division never happens in float), the per-dow index an integer
  // mean of ppms; edge days without a full 7-day window are excluded
  // by the count guard, zero-MA days by s7 > 0 — same WHERE both
  // engines. Dense calendar via the C119 bounded grid.
  def seasonalIndex(events: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val D = 86400L * 1000000L
    val daily = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${D}L)) div ${D}L").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val span = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dense = span
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w7 = W.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    dense
      .withColumn("s7", sum(col("c")).over(w7))
      .withColumn("k7", count(lit(1)).over(w7))
      .where(col("k7") === 7 && col("s7") > 0)
      .select(col("event_type"), pmod(col("day") + 4, lit(7)).as("dow"),
        expr("(c * 7000000) div s7").as("ratio_ppm"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("ratio_ppm")).as("ratio_sum_ppm"))
      .withColumn("index_ppm", expr("ratio_sum_ppm div n_days"))
  }

  val seasonalIndexSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
dense AS (
  SELECT g.event_type, g.day, coalesce(d.c, 0)::BIGINT AS c
  FROM (SELECT event_type, unnest(generate_series(d0, d1))::BIGINT AS day
        FROM span) g
  LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day),
ma AS (
  SELECT event_type, day, c,
    (sum(c) OVER w)::BIGINT AS s7, (count(*) OVER w)::BIGINT AS k7
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY day
    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
ratios AS (
  SELECT event_type, (((day + 4) % 7) + 7) % 7 AS dow,
    (c * 7000000) // s7 AS ratio_ppm
  FROM ma WHERE k7 = 7 AND s7 > 0)
SELECT event_type, dow::BIGINT AS dow, count(*)::BIGINT AS n_days,
  sum(ratio_ppm)::BIGINT AS ratio_sum_ppm,
  (sum(ratio_ppm) // count(*))::BIGINT AS index_ppm
FROM ratios GROUP BY 1, 2"""
  }

  // ---- C150 (r10): single-changepoint localization (AMOC) ----
  // C29's CUSUM FLAGS that a level shift happened (online, with a
  // fitted threshold); this LOCATES the single most likely break —
  // the at-most-one-changepoint reading every incident review starts
  // from: for each lane, the day boundary whose left/right split
  // maximizes the between-segment separation
  // gain(k) = (S_L·n_R − S_R·n_L)² / (n_L·n_R·n) over daily revenue
  // cents (the standard AMOC objective — equivalent to the maximal
  // SSE reduction for a mean shift). ENTIRELY integer: prefix
  // sums/counts from one ordered window, the gain a DECLARED 1e-3
  // fixed-point quotient of exact DECIMAL(38,0) products (C147/C149
  // truncating-division discipline), argmax under a (gain DESC, day
  // ASC) total order per lane — no float ever compared. The released
  // surface is all exact: split day, both segment sums/counts, and
  // the scaled gain. Lanes with a single observed day have no
  // interior boundary and are (by contract) absent. Plan: one daily
  // rollup, then two windows sharing one (priority, day) exchange;
  // per-lane frames are calendar-bounded.
  def changepoint(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders.select(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"),
        (graft.functions.Portable.dec(col("o_totalprice")) * 100)
          .cast("long").as("cents"))
      .groupBy(col("priority"), col("day"))
      .agg(sum(col("cents")).as("rev"))
    val W = Window.partitionBy(col("priority")).orderBy(col("day"))
    val Wall = Window.partitionBy(col("priority"))
    val pre = daily
      .withColumn("cum_n", count(lit(1)).over(W))
      .withColumn("cum_s", sum(col("rev")).over(W))
      .withColumn("n", count(lit(1)).over(Wall))
      .withColumn("s", sum(col("rev")).over(Wall))
      .where(col("cum_n") < col("n"))
      .withColumn("g", expr(
        "cast(cum_s as decimal(38,0)) * (n - cum_n)" +
          " - cast(s - cum_s as decimal(38,0)) * cum_n"))
      .withColumn("gain", graft.functions.Portable.decDiv(
        col("g") * col("g") * 1000,
        col("cum_n").cast("decimal(38,0)") * (col("n") - col("cum_n")) * col("n")))
    pre.withColumn("rk", row_number().over(
        Window.partitionBy(col("priority"))
          .orderBy(col("gain").desc, col("day").asc)))
      .where(col("rk") === 1)
      .select(col("priority"), col("day").as("change_day"),
        col("cum_n").as("n_left"), col("cum_s").as("s_left_cents"),
        (col("n") - col("cum_n")).as("n_right"),
        (col("s") - col("cum_s")).as("s_right_cents"),
        // Released at integer cents² grain (the ×1000 fixed point is
        // internal, used only for the argmax tie-break): for a, D > 0,
        // (a·1000 div D) div 1000 = a div D exactly, and g² div D at
        // sf0.01 tops out ~9.4e15 — int64-safe. `div` yields BIGINT.
        expr("gain div 1000").as("gain_cents2"))
  }

  val changepointSql: String =
    """WITH daily AS (
  SELECT o_orderpriority AS priority, o_orderdate::DATE AS day,
    sum(((o_totalprice::DECIMAL(18,2)) * 100)::BIGINT)::BIGINT AS rev
  FROM orders GROUP BY 1, 2),
pre AS (
  SELECT priority, day,
    count(*) OVER (PARTITION BY priority ORDER BY day
      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_n,
    sum(rev) OVER (PARTITION BY priority ORDER BY day
      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_s,
    count(*) OVER (PARTITION BY priority)::BIGINT AS n,
    sum(rev) OVER (PARTITION BY priority)::BIGINT AS s
  FROM daily),
gains AS (
  SELECT priority, day, cum_n, cum_s, n, s,
    (((cum_s::HUGEINT * (n - cum_n) - (s - cum_s)::HUGEINT * cum_n)
      * (cum_s::HUGEINT * (n - cum_n) - (s - cum_s)::HUGEINT * cum_n)
      * 1000) // (cum_n::HUGEINT * (n - cum_n) * n)) AS gain
  FROM pre WHERE cum_n < n),
best AS (
  SELECT *, row_number() OVER (PARTITION BY priority
    ORDER BY gain DESC, day ASC) AS rk
  FROM gains)
SELECT priority, day AS change_day, cum_n AS n_left, cum_s AS s_left_cents,
  (n - cum_n)::BIGINT AS n_right, (s - cum_s)::BIGINT AS s_right_cents,
  (gain // 1000)::BIGINT AS gain_cents2
FROM best WHERE rk = 1"""

  // ---- C153 (r10): Gumbel block maxima — return-level estimation ----
  // The extreme-value readout C144's drawdown is the empirical half
  // of: take each lane's MONTHLY maximum of daily revenue (block
  // maxima, the classical EVT frame), fit a Gumbel by method of
  // moments (β = s·√6/π, μ = m̄ − γ·β), and report the 12-block
  // return level μ + β·ln... — "the daily peak you should expect
  // once a year", the capacity/risk number ops teams plan against.
  // Exactness: block maxima and both moments ride exact cent
  // integers (Σm, Σm² as DECIMAL(38,0)); the sample variance is an
  // exact integer quotient pair (nb·Σm² − (Σm)², nb·(nb−1)); the fit
  // is ONE fixed-order float chain off those exact casts — mean,
  // s = sqrt(num/den), β, μ, rl — with √6/π, Euler's γ, and
  // −ln(−ln(11/12)) baked as shared full-precision literals (no
  // transcendental ever runs on data, the C84 discipline). Lanes
  // with one block NULL the fit via nullif. Plan: daily rollup →
  // monthly-max rollup → per-lane aggregate, each a strict
  // reduction; everything after the first exchange is
  // calendar-bounded.
  // ---- C157 (r10): Ljung–Box portmanteau test — residual whiteness ----
  // C66/C105 fit and diagnose one lag at a time; Ljung–Box asks the
  // forecaster's gate question about ALL of them at once: are the
  // first m autocorrelations JOINTLY zero (is the daily series white
  // noise / is anything left to model)? Q = n(n+2)·Σ r_k²/(n−k),
  // rejected against the χ²(m) 5% critical value. Exactness: built on
  // C105's exact integer deviation frame — each r_k is a DECLARED
  // 1e-6 fixed-point decDiv quotient (|num| ≤ den by Cauchy–Schwarz,
  // so rq ≤ 10⁶ exactly), each r²/(n−k) term another decDiv, the
  // weighted sum an exact DECIMAL; Q is ONE float division by the
  // fixed 10¹⁸ scale, round 6; the reject flag compares against a
  // shared χ² literal — no transcendental, no float comparison on
  // data. A constant series (den = 0) NULLs Q via nullif. Plan: the
  // C105 shape — one daily rollup, the 7-lag self-join on the
  // POST-AGGREGATE calendar-bounded daily frame, alphabet-bounded
  // aggregates after.
  private val LbLags = 7
  private val LbChi2Crit5 = "14.067140" // χ²(7) at 5%

  def ljungBox(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val (dev, den) = dailyDeviations(events)
    val grid = (1L to LbLags.toLong).toDF("lag")
    val num = dev.select(col("event_type"), col("day"), col("e"))
      .crossJoin(broadcast(grid))
      .withColumn("day2", col("day") + col("lag"))
      .join(dev.select(col("event_type"), col("day").as("day2"),
        col("e").as("e2")), Seq("event_type", "day2"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("e") * col("e2")).as("acf_num"))
    val terms = num.join(den, "event_type")
      .withColumn("rq", graft.functions.Portable.decDiv(
        abs(col("acf_num")).cast(d38) * 1000000L,
        nullif(col("den"), lit(0).cast(d38))))
      .withColumn("term", graft.functions.Portable.decDiv(
        col("rq") * col("rq") * 1000000L,
        (col("n_days") - col("lag")).cast(d38)))
    terms.groupBy(col("event_type"), col("n_days"))
      .agg(count(lit(1)).as("m_used"), sum(col("term")).as("lb_sum"))
      .select(col("event_type"), col("n_days"), col("m_used"),
        // Released as BIGINT: each term ≤ 1e18/(n−k) and m ≤ 7, so
        // lb_sum ≤ 7e18 < 2⁶³; the decimal arithmetic stays internal.
        col("lb_sum").cast("long").as("lb_sum"),
        round((col("n_days").cast(d38) * (col("n_days") + 2) * col("lb_sum"))
          .cast("double") / 1e18, 6).as("q"),
        ((col("n_days").cast(d38) * (col("n_days") + 2) * col("lb_sum"))
          .cast("double") / 1e18 > lit(LbChi2Crit5).cast("double"))
          .cast("long").as("reject_5pct"))
  }

  val ljungBoxSql: String = {
    val D = 86400L * 1000000L
    s"""WITH daily AS (
  SELECT event_type,
    (epoch_us(ts) - ((epoch_us(ts) % $D) + $D) % $D) // $D AS day,
    count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, count(*)::BIGINT AS n_days, sum(c)::BIGINT AS s
  FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, t.n_days,
    (t.n_days::HUGEINT * d.c - t.s) AS e
  FROM daily d JOIN tot t USING (event_type)),
den AS (SELECT event_type, n_days, sum(e * e)::HUGEINT AS den
  FROM dev GROUP BY 1, 2),
grid AS (SELECT unnest(generate_series(1, $LbLags))::BIGINT AS lag),
num AS (
  SELECT a.event_type, g.lag, sum(a.e * b.e)::HUGEINT AS acf_num
  FROM dev a CROSS JOIN grid g
  JOIN dev b ON b.event_type = a.event_type AND b.day = a.day + g.lag
  GROUP BY 1, 2),
terms AS (
  SELECT n.event_type, d.n_days,
    (((abs(n.acf_num) * 1000000) // nullif(d.den, 0))
      * ((abs(n.acf_num) * 1000000) // nullif(d.den, 0)) * 1000000)
      // (d.n_days - n.lag)::HUGEINT AS term
  FROM num n JOIN den d USING (event_type))
SELECT event_type, n_days, count(*)::BIGINT AS m_used,
  sum(term)::BIGINT AS lb_sum,
  round((n_days::HUGEINT * (n_days + 2) * sum(term))::DOUBLE / 1e18, 6) AS q,
  ((n_days::HUGEINT * (n_days + 2) * sum(term))::DOUBLE / 1e18
    > $LbChi2Crit5)::BIGINT AS reject_5pct
FROM terms GROUP BY event_type, n_days"""
  }

  private val GumbelSqrt6OverPi = "0.779696801233676"
  private val GumbelGamma = "0.577215664901533"
  private val GumbelRl12 = "2.441716467239515" // -ln(-ln(11/12))

  def gumbelReturnLevels(orders: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = orders.select(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"),
        date_trunc("month", col("o_orderdate")).as("month"),
        (graft.functions.Portable.dec(col("o_totalprice")) * 100)
          .cast("long").as("cents"))
      .groupBy(col("priority"), col("month"), col("day"))
      .agg(sum(col("cents")).as("rev"))
    val blocks = daily.groupBy(col("priority"), col("month"))
      .agg(max(col("rev")).as("m"))
    val fit = blocks.groupBy(col("priority"))
      .agg(count(lit(1)).as("nb"), max(col("m")).as("max_cents"),
        sum(col("m")).as("sm"),
        sum(col("m").cast(d38) * col("m")).as("sm2"))
    val mean = col("sm").cast("double") / col("nb").cast("double")
    val s = sqrt(
      (col("nb").cast(d38) * col("sm2") - col("sm").cast(d38) * col("sm"))
        .cast("double") /
        nullif(col("nb").cast(d38) * (col("nb") - 1), lit(0).cast(d38))
          .cast("double"))
    val beta = s * lit(GumbelSqrt6OverPi).cast("double")
    val mu = mean - lit(GumbelGamma).cast("double") * beta
    fit.select(col("priority"), col("nb").as("n_blocks"), col("max_cents"),
      round(mean, 6).as("mean_max_cents"),
      round(beta, 6).as("beta_cents"),
      round(mu, 6).as("mu_cents"),
      round(mu + beta * lit(GumbelRl12).cast("double"), 6).as("rl12_cents"))
  }

  val gumbelReturnLevelsSql: String =
    s"""WITH daily AS (
  SELECT o_orderpriority AS priority, o_orderdate::DATE AS day,
    date_trunc('month', o_orderdate) AS month,
    sum(((o_totalprice::DECIMAL(18,2)) * 100)::BIGINT)::BIGINT AS rev
  FROM orders GROUP BY 1, 2, 3),
blocks AS (
  SELECT priority, month, max(rev)::BIGINT AS m FROM daily GROUP BY 1, 2),
fit AS (
  SELECT priority, count(*)::BIGINT AS nb, max(m)::BIGINT AS max_cents,
    sum(m)::BIGINT AS sm, sum(m::HUGEINT * m)::HUGEINT AS sm2
  FROM blocks GROUP BY 1)
SELECT priority, nb AS n_blocks, max_cents,
  round(sm::DOUBLE / nb::DOUBLE, 6) AS mean_max_cents,
  round(sqrt((nb::HUGEINT * sm2 - sm::HUGEINT * sm)::DOUBLE
      / nullif(nb::HUGEINT * (nb - 1), 0)::DOUBLE)
    * $GumbelSqrt6OverPi, 6) AS beta_cents,
  round(sm::DOUBLE / nb::DOUBLE - $GumbelGamma
    * (sqrt((nb::HUGEINT * sm2 - sm::HUGEINT * sm)::DOUBLE
        / nullif(nb::HUGEINT * (nb - 1), 0)::DOUBLE)
      * $GumbelSqrt6OverPi), 6) AS mu_cents,
  round((sm::DOUBLE / nb::DOUBLE - $GumbelGamma
    * (sqrt((nb::HUGEINT * sm2 - sm::HUGEINT * sm)::DOUBLE
        / nullif(nb::HUGEINT * (nb - 1), 0)::DOUBLE)
      * $GumbelSqrt6OverPi))
    + (sqrt((nb::HUGEINT * sm2 - sm::HUGEINT * sm)::DOUBLE
        / nullif(nb::HUGEINT * (nb - 1), 0)::DOUBLE)
      * $GumbelSqrt6OverPi) * $GumbelRl12, 6) AS rl12_cents
FROM fit"""
}
