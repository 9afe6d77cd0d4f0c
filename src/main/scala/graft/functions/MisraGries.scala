package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary state: at most `cap` counters plus
  * the total stream length seen. */
case class MGState(counters: mutable.HashMap[String, Long], var n: Long)

/** Bounded-memory heavy-hitter candidates as a mergeable typed
  * Aggregator (Misra–Gries frequent-items, the deterministic
  * counter-based cousin of count-min).
  *
  * Invariant (the classic MG bound, preserved by the mergeable-
  * summaries merge rule): for every item, trueFreq − est ≤ N/(cap+1),
  * and items absent from the summary have trueFreq ≤ N/(cap+1). So the
  * candidate set is a GUARANTEED superset of every item with frequency
  * above N/(cap+1), under ANY partitioning and merge order — that is
  * what makes a downstream exact-count filter at a coarser threshold
  * (here N/64 with cap 255) deterministic and oracle-checkable, even
  * though the intermediate counter values themselves are
  * partitioning-dependent.
  *
  * reduce: count if present; insert if room; else decrement ALL
  * counters by 1 and drop zeros (the charge spreads over cap+1 items —
  * the source of the N/(cap+1) bound). merge: pointwise sum, then if
  * over capacity subtract the (cap+1)-th largest counter value from
  * all and drop non-positives (Agarwal et al., "Mergeable summaries":
  * errors add, so the global bound still telescopes to N/(cap+1)).
  *
  * State is cap+ε strings — map-side partials keep the exchange at one
  * tiny summary per task regardless of stream size.
  */
class MisraGriesAggregator(cap: Int)
    extends Aggregator[String, MGState, (Array[String], Long)] {

  override def zero: MGState = MGState(mutable.HashMap.empty, 0L)

  override def reduce(b: MGState, t: String): MGState = {
    b.n += 1
    val cur = b.counters.getOrElse(t, -1L)
    if (cur >= 0) b.counters(t) = cur + 1
    else if (b.counters.size < cap) b.counters(t) = 1L
    else {
      // decrement-all: amortized O(1) per stream item (each decrement
      // pass removes cap+1 units of accumulated count)
      b.counters.mapValuesInPlace((_, c) => c - 1)
      b.counters.filterInPlace((_, c) => c > 0)
    }
    b
  }

  override def merge(a: MGState, b: MGState): MGState = {
    b.counters.foreach { case (t, c) => a.counters(t) = a.counters.getOrElse(t, 0L) + c }
    a.n += b.n
    if (a.counters.size > cap) {
      val cut = a.counters.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      a.counters.mapValuesInPlace((_, c) => c - cut)
      a.counters.filterInPlace((_, c) => c > 0)
    }
    a
  }

  override def finish(b: MGState): (Array[String], Long) =
    (b.counters.keysIterator.toArray.sorted, b.n)

  override def bufferEncoder: Encoder[MGState] = Encoders.kryo[MGState]
  override def outputEncoder: Encoder[(Array[String], Long)] =
    Encoders.kryo[(Array[String], Long)]
}
