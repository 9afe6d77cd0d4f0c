package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** The distributed TimeSeries folds vs naive in-memory references on
  * a randomized multi-user feed — exercises per-partition state resets
  * (several users hash into one partition), tie ordering, and the
  * fixed-point arithmetic. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(29)
  private lazy val rows: Seq[(Long, Timestamp, Long, Double)] =
    (0 until 400).map { i =>
      (i.toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(7).toLong, rnd.nextInt(10000) / 100.0)
    }
  private lazy val events = rows.toDF("event_id", "ts", "user_id", "value")

  private def scaled(v: Double): Long = math.round(v * 1000000L)

  test("ewma equals a naive per-user sequential fold") {
    val got = TimeSeries.ewma(events)
      .select("event_id", "ewma_micros").as[(Long, Long)].collect().toMap
    rows.groupBy(_._3).foreach { case (_, rs) =>
      var s = 0L
      rs.sortBy(r => (r._2.getTime, r._1)).zipWithIndex.foreach { case (r, i) =>
        val x = scaled(r._4)
        s = if (i == 0) x else (x + 3L * s) / 4L
        assert(got(r._1) == s, s"event ${r._1}")
      }
    }
  }

  test("holt equals a naive per-user sequential fold, negative trends included") {
    val got = TimeSeries.holt(events)
      .select("event_id", "level_micros", "trend_micros", "forecast_micros")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    var sawNegativeTrend = false
    rows.groupBy(_._3).foreach { case (_, rs) =>
      var l = 0L; var b = 0L
      rs.sortBy(r => (r._2.getTime, r._1)).zipWithIndex.foreach { case (r, i) =>
        val x = scaled(r._4)
        if (i == 0) { l = x; b = 0L }
        else {
          val prev = l
          l = (x + 3L * (l + b)) / 4L
          b = (l - prev + 7L * b) / 8L
        }
        if (b < 0) sawNegativeTrend = true
        assert(got(r._1) == ((l, b, l + b)), s"event ${r._1}")
      }
    }
    // the truncation-vs-floor division divergence only shows on
    // negative numerators — make sure the feed actually exercised it
    assert(sawNegativeTrend, "random feed produced no negative trend — widen the value range")
  }

  test("holtWinters equals a naive sequential fold with a rotating 7-slot season (C91)") {
    // type-keyed daily series via user_id as the type surrogate is not
    // possible (operator keys on event_type) — feed a multi-type frame
    val tRows = (0 until 300).map { i =>
      (i.toLong, new Timestamp(1700000000000L + rnd.nextInt(40) * 86400000L),
        s"t${i % 3}", rnd.nextInt(10000) / 100.0)
    }
    val df = tRows.toDF("event_id", "ts", "event_type", "value")
    val got = TimeSeries.holtWinters(df)
      .select("event_type", "day", "x_micros", "level_micros", "trend_micros",
        "season_micros", "fitted_micros")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap
    // reference: exact daily sums then the sequential fold
    val daily = tRows.groupBy(r => (r._3, r._2.getTime / 86400000L))
      .view.mapValues(rs => rs.map(r => BigDecimal(r._4).setScale(6)).sum)
      .toSeq.map { case ((t, day), v) => (t, day, (v * 1000000L).toLongExact) }
    daily.groupBy(_._1).foreach { case (t, rs) =>
      var l = 0L; var b = 0L; val s = Array.fill(7)(0L)
      rs.sortBy(_._2).zipWithIndex.foreach { case ((_, day, x), i) =>
        val expectRow = if (i == 0) { l = x; b = 0L; (x, l, b, 0L, x) }
        else {
          val s1 = s(0)
          val fitted = l + b + s1
          val lp = (x - s1 + 3L * (l + b)) / 4L
          val bp = (lp - l + 7L * b) / 8L
          val snew = (x - lp + 15L * s1) / 16L
          for (k <- 0 until 6) s(k) = s(k + 1)
          s(6) = snew
          l = lp; b = bp
          (x, l, b, snew, fitted)
        }
        assert(got((t, day)) == expectRow, s"($t, $day)")
      }
    }
    // a perfectly weekly signal converges: the fitted one-step-ahead
    // error shrinks once the season slots warm up
    val weekly = (0 until 70).map { d =>
      (1000L + d, new Timestamp(1700000000000L + d * 86400000L), "w",
        100.0 + 50.0 * (d % 7))
    }.toDF("event_id", "ts", "event_type", "value")
    val fit = TimeSeries.holtWinters(weekly)
      .select("day", "x_micros", "fitted_micros")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val early = fit.slice(1, 15).map(r => math.abs(r._2 - r._3)).max
    val late = fit.takeRight(14).map(r => math.abs(r._2 - r._3)).max
    assert(late < early, s"seasonal fit did not improve: early $early late $late")
  }

  test("acf: constant series NULLs out, planted alternation replays the exact ratio (C104)") {
    import graft.operators.TimeSeries
    def ev(counts: Seq[Long]) = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(j =>
        (d.toLong * 1000 + j, new Timestamp((86400000L * d) + j * 1000), "t"))
    }.toDF("event_id", "ts", "event_type")
    // constant daily counts: every deviation is 0 -> den = 0 -> acf NULL
    val const = TimeSeries.acf(ev(Seq.fill(10)(5L)))
    assert(const.count() == 7L * 1)
    assert(const.where(col("acf").isNotNull).count() == 0, "constant series must NULL acf")
    // planted series: replay num/den exactly from first principles
    val counts = Seq(10L, 2L, 9L, 3L, 8L, 4L, 7L, 5L, 6L, 1L)
    val got = TimeSeries.acf(ev(counts))
      .select(col("lag"), col("n_days"), col("n_pairs"),
        col("acf_num").cast("double"), col("den").cast("double"), col("acf"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val n = counts.length.toLong; val sum0 = counts.sum
    val e = counts.map(c => n * c - sum0)
    val den = e.map(x => (x * x).toDouble).sum
    (1 to 7).foreach { l =>
      val pairs = (0 until counts.length - l).map(d => (e(d) * e(d + l)).toDouble)
      val r = got(l.toLong)
      assert(r._2 == n && r._3 == counts.length - l, s"lag $l bookkeeping")
      assert(r._4 == pairs.sum, s"lag $l num ${r._4} != ${pairs.sum}")
      assert(r._5 == den, s"lag $l den")
      assert(r._6 == math.rint(pairs.sum / den * 1e6) / 1e6, s"lag $l acf")
    }
    // alternating sanity: lag-1 strongly negative, lag-2 positive
    assert(got(1L)._6 < -0.5 && got(2L)._6 > 0.3, s"${got(1L)._6} / ${got(2L)._6}")
  }

  test("ccf: a series shifted by two days reads ccf = 1 at lag 2 (C109)") {
    import graft.operators.TimeSeries
    def ev(t: String, counts: Seq[Long], dayOff: Long) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0L until c).map(j =>
          (t.hashCode.toLong * 100000 + (d + dayOff) * 1000 + j,
            new Timestamp(86400000L * (d + dayOff) + j * 1000), t))
      }
    val counts = Seq(5L, 1L, 4L, 2L, 3L)
    val df = (ev("a", counts, 0) ++ ev("b", counts, 2))
      .toDF("event_id", "ts", "event_type")
    val got = TimeSeries.ccf(df)
      .select("type_a", "type_b", "lag", "n_pairs", "ccf")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    // b IS a shifted +2: every a-day pairs, deviations identical ->
    // exact correlation 1 at lag 2 (den_a = den_b = num)
    assert(got(("a", "b", 2L)) == ((5L, 1.0)), s"${got(("a", "b", 2L))}")
    // the reverse direction at lag 2 overlaps on one day only
    // (b spans days 2..6, a spans 0..4 — b's day 2 meets a's day 4)
    assert(got(("b", "a", 2L))._1 == 1L)
    // corpus: |ccf| bounded by 1 + rounding slack, both directions present
    val corpus = TimeSeries.ccf(events.withColumn("event_type",
        concat(lit("t"), col("user_id") % 3)))
      .select("ccf").as[Double].collect()
    assert(corpus.nonEmpty)
    corpus.foreach(c => assert(math.abs(c) <= 1.000001, s"ccf $c out of range"))
  }

  test("forecastBacktest: weekly-periodic series zeroes the seasonal MAE; holes are real zeros (C119)") {
    val D = 86400L * 1000L // one day of millis
    // counts per day, period 7, with day 9 a HOLE (zero events): the
    // dense grid must treat it as c = 0, not skip the row
    val pattern = Seq(1, 2, 3, 1, 1, 1, 1)
    val counts: Map[Int, Int] =
      (0 until 21).map(d => d -> (if (d == 9) 0 else pattern(d % 7))).toMap
    val ev = counts.toSeq.flatMap { case (d, c) =>
      (0 until c).map(j =>
        ((d * 100 + j).toLong, new Timestamp(d * D), "t", 1.0))
    }.toDF("event_id", "ts", "event_type", "value")
    val got = TimeSeries.forecastBacktest(ev)
      .select("n_days", "mae1_num", "mae7_num", "bias7", "mae_seasonal")
      .as[(Long, Long, Long, Long, Double)].head()
    // replay: eval days 7..20; seasonal errors only where the hole breaks
    // the period (day 9 actual 0 vs forecast 3; day 16 actual 3 vs 0)
    val dense = (0 until 21).map(counts)
    val eval = 7 until 21
    assert(got._1 == eval.length.toLong)
    assert(got._2 == eval.map(d => math.abs(dense(d) - dense(d - 1))).sum.toLong)
    assert(got._3 == 6L, s"seasonal num ${got._3}: expected |0-3| + |3-0|")
    assert(got._4 == 0L, "hole pushes bias both ways symmetrically")
    assert(got._5 == math.rint(6.0 / eval.length * 1e6) / 1e6)
    // pure periodic series (no hole): seasonal MAE is exactly 0 while
    // persistence stays positive — the weekly-structure verdict
    val pure = (0 until 21).flatMap(d => (0 until pattern(d % 7)).map(j =>
      ((d * 100 + j).toLong, new Timestamp(d * D), "t", 1.0)))
      .toDF("event_id", "ts", "event_type", "value")
    val p = TimeSeries.forecastBacktest(pure)
      .select("mae7_num", "mae1_num").as[(Long, Long)].head()
    assert(p._1 == 0L && p._2 > 0L)
    // corpus smoke: metrics finite, n_days = span - 7 per type
    val corpus = TimeSeries.forecastBacktest(
      Tables.load(spark, sf, "events"))
      .select("n_days", "mae_seasonal", "mae_persistence")
      .as[(Long, Double, Double)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (n, m7, m1) =>
      assert(n > 0 && m7 >= 0 && m1 >= 0 && !m7.isNaN && !m1.isNaN)
    }
  }

  test("seasonalIndex: a planted weekly spike reads exact cross-multiplied indices (C130)") {
    val D = 86400L * 1000L
    // 21 days, one event/day except every day ≡ 5 (mod 7) gets 3:
    // every full 7-day window sums to 9, so ratios are exact ninths
    val ev = (0 until 21).flatMap { d =>
      val c = if (d % 7 == 5) 3 else 1
      (0 until c).map(j => ((d * 10 + j).toLong, new Timestamp(d * D), "t", 1.0))
    }.toDF("event_id", "ts", "event_type", "value")
    val got = TimeSeries.seasonalIndex(ev)
      .select("dow", "n_days", "ratio_sum_ppm", "index_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 7)
    // day d has dow (d+4) % 7; the spike lives on days ≡ 5 -> dow 2
    got.foreach { case (dow, nDays, _, idx) =>
      val expected = if (dow == 2L) 3L * 7000000L / 9L else 7000000L / 9L
      assert(idx == expected, s"dow $dow index $idx vs $expected")
      assert(nDays >= 2, s"dow $dow has $nDays full-window days")
    }
    // corpus: indices bracket 1e6 and each type's day counts tile the
    // full-window span
    val corpus = TimeSeries.seasonalIndex(Tables.load(spark, sf, "events"))
      .select("event_type", "dow", "index_ppm")
      .as[(String, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).toSet.size == rows.length, "one row per dow")
      assert(rows.exists(_._3 >= 1000000L) && rows.exists(_._3 <= 1000000L),
        "indices must bracket the center")
    }
  }

  test("changepoint: planted level shift localized exactly; flat lane reads 0 gain (C150)") {
    def d(i: Int) = Timestamp.valueOf(f"2024-01-$i%02d 00:00:00")
    // lane X: 4 days at $1.00 then 4 at $5.00 -> split after day 4,
    // gain = (400·4 − 2000·4)² / (4·4·8) = 320000 (integer cents²)
    val shift = (1 to 4).map(i => ("X", 1.00, d(i))) ++
      (5 to 8).map(i => ("X", 5.00, d(i)))
    // lane F: constant -> every split gain 0, earliest-day tiebreak
    val flat = (1 to 5).map(i => ("F", 2.00, d(i)))
    val got = TimeSeries.changepoint((shift ++ flat)
      .toDF("o_orderpriority", "o_totalprice", "o_orderdate"))
      .select(col("priority"), col("change_day").cast("string"),
        col("n_left"), col("s_left_cents"), col("n_right"),
        col("s_right_cents"), col("gain_cents2").cast("string"))
      .as[(String, String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("X") == (("X", "2024-01-04", 4L, 400L, 4L, 2000L, "320000")),
      s"X ${got("X")}")
    assert(got("F") == (("F", "2024-01-01", 1L, 200L, 4L, 800L, "0")),
      s"F ${got("F")}")
    // corpus replay: the emitted split is the exact BigInt argmax of
    // the AMOC objective over each lane's daily series
    val daily = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("p"), to_date(col("o_orderdate")).as("day"),
        (graft.functions.Portable.dec(col("o_totalprice")) * 100).cast("long").as("c"))
      .groupBy("p", "day").agg(sum(col("c")).as("rev"))
      .as[(String, java.sql.Date, Long)].collect()
    val corpus = TimeSeries.changepoint(Tables.load(spark, sf, "orders"))
      .select(col("priority"), col("change_day").cast("string"),
        col("gain_cents2").cast("string"))
      .as[(String, String, String)].collect().map(r => r._1 -> r).toMap
    daily.groupBy(_._1).foreach { case (p, rs) =>
      val ser = rs.map(r => (r._2.toString, BigInt(r._3))).sortBy(_._1)
      val n = BigInt(ser.length); val s = ser.map(_._2).sum
      if (ser.length > 1) {
        // argmax on the internal ×1000 fixed-point gain; the released
        // value is the integer-cents² quotient of the winning split
        val bestTie = ser.indices.dropRight(1).map { i =>
          val pref = ser.take(i + 1)
          val nl = BigInt(pref.length); val sl = pref.map(_._2).sum
          val g = sl * (n - nl) - (s - sl) * nl
          (g * g * 1000 / (nl * (n - nl) * n), pref.last._1)
        }.sortBy { case (gain, day) => (-gain, day) }.head
        val (eg, ed) = (BigInt(corpus(p)._3), corpus(p)._2)
        assert(ed == bestTie._2 && eg == bestTie._1 / 1000,
          s"$p: got ($ed, $eg) want $bestTie")
      }
    }
  }

  test("gumbelReturnLevels: moments replay from exact integers; one block NULLs the fit (C153)") {
    def d(s: String) = Timestamp.valueOf(s"2024-$s 00:00:00")
    // lane X: Jan maxima 300, Feb 500 -> mean 400, s = sqrt(20000)
    val rows = Seq(("X", 1.00, d("01-01")), ("X", 3.00, d("01-02")),
      ("X", 2.00, d("02-01")), ("X", 5.00, d("02-02")),
      ("Y", 7.00, d("03-15")))
      .toDF("o_orderpriority", "o_totalprice", "o_orderdate")
    val got = TimeSeries.gumbelReturnLevels(rows)
      .select("priority", "n_blocks", "max_cents", "mean_max_cents",
        "beta_cents", "mu_cents", "rl12_cents")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().map(r => r._1 -> r).toMap
    val x = got("X")
    assert(x._2 == 2L && x._3 == 500L && x._4 == 400.0, s"X $x")
    // replay the operator's exact float chain
    val s = math.sqrt((2.0 * 340000L - 800L.toDouble * 800L) / 2.0)
    val beta = s * 0.779696801233676
    val mu = 400.0 - 0.577215664901533 * beta
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(x._5.contains(r6(beta)) && x._6.contains(r6(mu)) &&
      x._7.contains(r6(mu + beta * 2.441716467239515)), s"X fit $x")
    // a single-block lane cannot estimate spread: NULL, never NaN
    val y = got("Y")
    assert(y._2 == 1L && y._5.isEmpty && y._6.isEmpty && y._7.isEmpty, s"Y $y")
    // corpus: mean <= max, beta >= 0, rl12 >= mu
    val corpus = TimeSeries.gumbelReturnLevels(
      Tables.load(spark, sf, "orders"))
      .select("n_blocks", "max_cents", "mean_max_cents", "beta_cents",
        "mu_cents", "rl12_cents")
      .as[(Long, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (nb, mx, mean, b, mu0, rl) =>
      assert(mean <= mx + 1e-6, s"mean $mean > max $mx")
      assert((nb == 1) == b.isEmpty, s"nb $nb beta $b")
      b.foreach(bv => assert(bv >= 0.0))
      (mu0, rl) match {
        case (Some(m0), Some(r0)) => assert(r0 >= m0 - 1e-6, s"rl $r0 < mu $m0")
        case _ => ()
      }
    }
  }

  test("ljungBox: alternating series rejects, constant series NULLs, corpus replays exactly (C157)") {
    def mk(ty: String, dayCounts: Seq[Int]): Seq[(Long, Timestamp, String)] =
      dayCounts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map { i =>
          (d.toLong * 100 + i,
            new Timestamp(1700000000000L + d * 86400000L + i * 1000L), ty)
        }
      }
    // P: strong alternation -> large |r1| -> Q past chi2(7) 5%
    // K: constant daily counts -> zero variance -> Q NULL, not NaN
    val rows = mk("P", Seq.fill(10)(Seq(10, 1)).flatten) ++
      mk("K", Seq.fill(20)(3))
    val df = rows.toDF("event_id", "ts", "event_type")
    val got = TimeSeries.ljungBox(df)
      .select(col("event_type"), col("n_days"), col("m_used"),
        col("lb_sum").cast("string"), col("q"), col("reject_5pct"))
      .as[(String, Long, Long, String, Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("P")._2 == 20L && got("P")._5.exists(_ > 14.06714) &&
      got("P")._6.contains(1L), s"P ${got("P")}")
    assert(got("K")._5.isEmpty, s"constant lane must NULL Q: ${got("K")}")
    // corpus replay: lb_sum and Q from a BigInt recomputation of the
    // exact deviation/lag frames
    val daily = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
          .as("day"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    val corpus = TimeSeries.ljungBox(Tables.load(spark, sf, "events"))
      .select(col("event_type"), col("lb_sum").cast("string"), col("q"))
      .as[(String, String, Double)].collect().map(r => r._1 -> r).toMap
    daily.groupBy(_._1).foreach { case (ty, rs) =>
      val n = BigInt(rs.length); val s = rs.map(r => BigInt(r._3)).sum
      val e = rs.map(r => r._2 -> (n * r._3 - s)).toMap
      val den = e.values.map(v => v * v).sum
      if (den > 0) {
        val lbSum = (1 to 7).map { k =>
          val num = e.collect { case (d, v) if e.contains(d + k) =>
            v * e(d + k) }.sum
          val rq = (num.abs * 1000000) / den
          (rq * rq * 1000000) / (n - k)
        }.sum
        val q = ((n * (n + 2) * lbSum).toDouble / 1e18 * 1e6).round / 1e6.toDouble
        val g = corpus(ty)
        assert(BigInt(g._2) == lbSum, s"$ty lb_sum ${g._2} != $lbSum")
        assert(math.abs(g._3 - q) < 2e-6, s"$ty q ${g._3} vs $q")
      }
    }
  }
}
