package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate row for bounded top-k aggregation. */
case class ScoredId(id: Long, score: Double)

/** Bounded top-k by (score desc, id asc) as a typed Aggregator.
  *
  * The window-function route (`row_number().over(partitionBy(q)
  * .orderBy(score))`) must shuffle and SORT every scored pair; this
  * aggregator keeps a k-element buffer per group with map-side partial
  * aggregation, so the exchange carries at most k rows per (group ×
  * map task) — the difference between sorting |corpus| rows per query
  * and merging k-element buffers at 100 TB.
  *
  * Deterministic: total order (score desc, id asc), so results are
  * identical to the window formulation whatever the partitioning.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Array[ScoredId], Array[ScoredId]] {

  private def bound(arr: Array[ScoredId]): Array[ScoredId] =
    arr.sortBy(e => (-e.score, e.id)).take(k)

  override def zero: Array[ScoredId] = Array.empty

  override def reduce(buf: Array[ScoredId], e: ScoredId): Array[ScoredId] = {
    // avoid re-sorting when e can't make the cut
    if (buf.length >= k) {
      val worst = buf(buf.length - 1)
      if (e.score < worst.score || (e.score == worst.score && e.id > worst.id)) return buf
    }
    bound(buf :+ e)
  }

  override def merge(a: Array[ScoredId], b: Array[ScoredId]): Array[ScoredId] =
    bound(a ++ b)

  override def finish(buf: Array[ScoredId]): Array[ScoredId] = buf

  override def bufferEncoder: Encoder[Array[ScoredId]] = Encoders.kryo[Array[ScoredId]]
  override def outputEncoder: Encoder[Array[ScoredId]] = Encoders.kryo[Array[ScoredId]]
}
