package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** R18 (r8): edge-triggered alerting with hysteresis — the monitoring
  * consumer of every metric stream this library computes (C28 flags,
  * C69 CUSUM, L63 heavy hitters). A naive `value > threshold` filter
  * pages on EVERY breaching reading — an alert storm; production
  * alerting emits STATE TRANSITIONS only, with a hysteresis band so a
  * metric flapping around one line doesn't re-page on each crossing:
  * raise "alert" when the value crosses ABOVE `hi` from a non-alerting
  * state, emit "recover" only when it falls BELOW `lo` (< hi), stay
  * silent anywhere in between. State per key is ONE BOOLEAN; in-batch
  * readings apply in sequence order so micro-batch boundaries are
  * invisible (the R16 contract) — the spec flaps a metric across
  * batches and counts exactly the transitions.
  */
object AlertStream {

  case class Reading(key: String, seq: Long, value: Double)

  case class Alert(key: String, seq: Long, kind: String, value: Double)

  def edgeAlerts(readings: Dataset[Reading], hi: Double, lo: Double): Dataset[Alert] = {
    require(lo < hi, s"hysteresis band requires lo < hi, got [$lo, $hi]")
    import readings.sparkSession.implicits._
    readings.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var alerting = state.getOption.getOrElse(false)
          val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
          it.toSeq.sortBy(_.seq).foreach { r =>
            if (!alerting && r.value > hi) {
              alerting = true
              out += Alert(key, r.seq, "alert", r.value)
            } else if (alerting && r.value < lo) {
              alerting = false
              out += Alert(key, r.seq, "recover", r.value)
            }
          }
          state.update(alerting)
          out.iterator
      }
  }
}
