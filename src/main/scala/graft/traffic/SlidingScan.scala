package graft.traffic

import scala.collection.mutable.ArrayBuffer

/** Partition-local sliding-window argmax over station-sorted rows
  * (the executor side of [[Traffic.maxFlowSlidingScan]]).
  *
  * Input rows: (station, bucket, value, ts_us, event_id, lane), sorted
  * by (station, bucket) within the partition. Output rows: (station,
  * window_start_bucket, value, ts_us, event_id, lane) — one per
  * (window, station) pair that contains at least one event, carrying
  * the argmax record under the same total order as
  * `max(struct(value, ts, event_id, event_type))`:
  * (value, ts_us, event_id, lane) lexicographic.
  *
  * Algorithm per station: collapse consecutive same-bucket rows to the
  * bucket argmax, then walk window starts in increasing order keeping a
  * deque of bucket indices whose records are in strictly decreasing
  * order — the head is the window maximum. A bucket is pushed once
  * (popping smaller tails) and popped once when it slides out, so the
  * walk is O(buckets + outputs). Gaps longer than the window jump
  * directly to the next populated start (no empty-window iterations).
  */
object SlidingScan {
  type Rec = (Long, Long, Double, Long, Long, String)

  /** a > b under the struct-max total order (value, ts, event_id, lane).
    * event_id is unique, so exact ties cannot reach the lane field. */
  private def greater(a: Rec, b: Rec): Boolean =
    if (a._3 != b._3) a._3 > b._3
    else if (a._4 != b._4) a._4 > b._4
    else if (a._5 != b._5) a._5 > b._5
    else a._6 > b._6

  def emit(rows: Iterator[Rec], durSlides: Int): Iterator[Rec] = {
    val in = rows.buffered
    new Iterator[Rec] {
      private var inner: Iterator[Rec] = Iterator.empty
      override def hasNext: Boolean = {
        while (!inner.hasNext && in.hasNext) inner = nextStation()
        inner.hasNext
      }
      override def next(): Rec = { hasNext; inner.next() }

      /** Consume one station's rows, return its emission iterator. */
      private def nextStation(): Iterator[Rec] = {
        val station = in.head._1
        val buckets = new ArrayBuffer[Rec]()
        while (in.hasNext && in.head._1 == station) {
          val r = in.next()
          if (buckets.nonEmpty && buckets.last._2 == r._2) {
            if (greater(r, buckets.last)) buckets(buckets.length - 1) = r
          } else buckets += r
        }
        windows(buckets, durSlides)
      }
    }
  }

  /** Emission over one station's distinct-bucket maxima (sorted). A
    * window starting at w covers buckets [w, w + D - 1]; valid starts
    * are exactly ∪ᵢ [bᵢ − (D−1), bᵢ]. */
  private def windows(bs: ArrayBuffer[Rec], d: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private val n = bs.length
      // deque of indices into bs; records strictly decreasing head→tail
      private val dq = new Array[Int](n)
      private var head = 0
      private var tail = 0 // exclusive
      private var j = 0 // next bucket index to push
      private var p = 0 // first bucket index with bucket >= w
      private var w = if (n == 0) 0L else bs(0)._2 - (d - 1)
      private var done = n == 0

      override def hasNext: Boolean = !done
      override def next(): Rec = {
        // admit buckets entering [w, w + d - 1]
        while (j < n && bs(j)._2 <= w + d - 1) {
          while (tail > head && !greater(bs(dq(tail - 1)), bs(j))) tail -= 1
          dq(tail) = j; tail += 1; j += 1
        }
        // evict buckets that slid out (< w)
        while (bs(dq(head))._2 < w) head += 1
        val m = bs(dq(head))
        val out = (m._1, w, m._3, m._4, m._5, m._6)
        // advance to the next VALID start: some bucket in [w+1, w+d]
        w += 1
        while (p < n && bs(p)._2 < w) p += 1
        if (p == n) done = true
        else if (bs(p)._2 > w + d - 1) w = bs(p)._2 - (d - 1)
        out
      }
    }
}
