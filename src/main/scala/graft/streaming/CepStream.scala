package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** R16 (r8): streaming CEP — the flatMapGroupsWithState twin of the
  * batch `Relational.cepPattern` (C64). Complex-event processing is
  * THE canonical stateful-streaming workload (Flink CEP /
  * MATCH_RECOGNIZE): emit every view → click → purchase chain AS THE
  * PURCHASE ARRIVES, not at the end of the day.
  *
  * State per user is three longs — the latest view time, the latest
  * click time, and the view the latest click captured — O(1)
  * regardless of stream length (no event buffering: the last-touch
  * match rule needs only the running argmax, which is why it scales
  * where a general NFA-over-history would not). Events inside a
  * micro-batch are applied in (ts, event_id) order, so batch
  * boundaries are semantically invisible: a chain whose view, click,
  * and purchase arrive in three different micro-batches emits exactly
  * the same match as the batch operator — the parity spec splits
  * chains across batches on purpose and diffs against
  * `Relational.cepPattern` row-for-row.
  */
object CepStream {

  case class CepEvent(userId: Long, eventId: Long, eventType: String, us: Long)

  /** lastViewUs / lastClickUs / clickViewUs; -1 = none yet. */
  case class CepState(lastViewUs: Long, lastClickUs: Long, clickViewUs: Long)

  case class CepMatch(userId: Long, viewUs: Long, clickUs: Long,
      purchaseUs: Long, spanUs: Long)

  def cepStream(events: Dataset[CepEvent],
      windowUs: Long = 1440L * 60L * 1000000L): Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, state) =>
          var s = state.getOption.getOrElse(CepState(-1L, -1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CepMatch]
          // in-batch order must match the batch operator's window order
          it.toSeq.sortBy(e => (e.us, e.eventId)).foreach { e =>
            e.eventType match {
              case "view" => s = s.copy(lastViewUs = e.us)
              case "click" =>
                s = s.copy(lastClickUs = e.us, clickViewUs = s.lastViewUs)
              case "purchase" =>
                if (s.clickViewUs >= 0L && e.us - s.clickViewUs <= windowUs)
                  out += CepMatch(user, s.clickViewUs, s.lastClickUs, e.us,
                    e.us - s.clickViewUs)
              case _ => ()
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
