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
}
