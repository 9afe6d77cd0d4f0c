package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.TrafficStream.SensorEvent

/** R21 (r10): the Spark 4 arbitrary-state API — transformWithState +
  * StatefulProcessor — applied to the reference's R6 max-by combiner
  * (TrafficMaxLaneFlow.java:171 Combine.perKey argmax): a per-user
  * running maximum whose state lives in a typed ValueState and
  * survives micro-batches. TrafficStream's flatMapGroupsWithState
  * operators are the legacy arbitrary-state path; this is the
  * forward one — the API requires the RocksDB state store provider
  * (rejects the default HDFS-backed one), which is itself part of
  * the 100 TB story: RocksDB state spills to disk instead of keeping
  * every key on-heap.
  *
  * Determinism: the fold is commutative — max by (value, then SMALLER
  * event_id on ties) — so batch arrival order inside a micro-batch
  * cannot change the emitted state, and the final update always
  * equals the batch argmax over the same rows.
  */
object TwsStream {

  case class RunningMax(user_id: Long, max_value: Double, event_id: Long,
      n_seen: Long)

  private[streaming] case class MaxState(mx: Double, eid: Long, n: Long)

  class RunningMaxProcessor
      extends StatefulProcessor[Long, SensorEvent, RunningMax] {
    @transient private var st: ValueState[MaxState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MaxState]("mx", Encoders.product[MaxState],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SensorEvent],
        tv: TimerValues): Iterator[RunningMax] = {
      var s =
        if (st.exists()) st.get()
        else MaxState(Double.NegativeInfinity, Long.MaxValue, 0L)
      rows.foreach { e =>
        s =
          if (e.value > s.mx || (e.value == s.mx && e.event_id < s.eid))
            MaxState(e.value, e.event_id, s.n + 1)
          else s.copy(n = s.n + 1)
      }
      st.update(s)
      Iterator.single(RunningMax(key, s.mx, s.eid, s.n))
    }
  }

  /** Update-mode per-user running max on the new API; one state row
    * per key, one update row per (key, micro-batch). */
  def runningMaxStream(events: Dataset[SensorEvent]): Dataset[RunningMax] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningMaxProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
