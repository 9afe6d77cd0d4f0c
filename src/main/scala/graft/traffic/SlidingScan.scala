package graft.traffic

import scala.collection.mutable.ArrayBuffer

/** Partition-local sliding-window argmax over key-sorted rows
  * (the executor side of [[Traffic.maxFlowSlidingScan]] and
  * [[Traffic.maxLaneFlowE2eScan]]).
  *
  * Input rows must be sorted by (key, bucket) within the partition.
  * Output: one row per (window, key) pair that contains at least one
  * event, carrying the argmax record with its bucket replaced by the
  * window start — the same result set as the ×(dur/slide) Expand +
  * `max(struct)` plan, without materialising the fan-out or sorting
  * the expanded rows.
  *
  * Algorithm per key: collapse consecutive same-bucket rows to the
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
  private def recGreater(a: Rec, b: Rec): Boolean =
    if (a._3 != b._3) a._3 > b._3
    else if (a._4 != b._4) a._4 > b._4
    else if (a._5 != b._5) a._5 > b._5
    else a._6 > b._6

  /** The flagship (station, bucket, value, ts_us, event_id, lane) shape. */
  def emit(rows: Iterator[Rec], durSlides: Int): Iterator[Rec] =
    emitGeneric[Rec, Long](rows, durSlides)(_._1, _._2, recGreater,
      (m, w) => (m._1, w, m._3, m._4, m._5, m._6))

  /** Generic walk: `key` partitions the scan (equality only — Spark's
    * sort provides the order), `bucket` is the slide index, `greater`
    * the argmax total order, `withStart(m, w)` re-stamps the emitted
    * record with its window-start bucket. */
  def emitGeneric[T, K](rows: Iterator[T], durSlides: Int)(
      key: T => K, bucket: T => Long,
      greater: (T, T) => Boolean, withStart: (T, Long) => T): Iterator[T] = {
    val in = rows.buffered
    new Iterator[T] {
      private var inner: Iterator[T] = Iterator.empty
      override def hasNext: Boolean = {
        while (!inner.hasNext && in.hasNext) inner = nextKey()
        inner.hasNext
      }
      override def next(): T = { hasNext; inner.next() }

      /** Consume one key's rows, return its emission iterator. */
      private def nextKey(): Iterator[T] = {
        val k = key(in.head)
        val buckets = new ArrayBuffer[T]()
        while (in.hasNext && key(in.head) == k) {
          val r = in.next()
          if (buckets.nonEmpty && bucket(buckets.last) == bucket(r)) {
            if (greater(r, buckets.last)) buckets(buckets.length - 1) = r
          } else buckets += r
        }
        windows(buckets, durSlides, bucket, greater, withStart)
      }
    }
  }

  /** Emission over one key's distinct-bucket maxima (sorted). A window
    * starting at w covers buckets [w, w + D - 1]; valid starts are
    * exactly ∪ᵢ [bᵢ − (D−1), bᵢ]. */
  private def windows[T](bs: ArrayBuffer[T], d: Int, bucket: T => Long,
      greater: (T, T) => Boolean, withStart: (T, Long) => T): Iterator[T] =
    new Iterator[T] {
      private val n = bs.length
      // deque of indices into bs; records strictly decreasing head→tail
      private val dq = new Array[Int](n)
      private var head = 0
      private var tail = 0 // exclusive
      private var j = 0 // next bucket index to push
      private var p = 0 // first bucket index with bucket >= w
      private var w = if (n == 0) 0L else bucket(bs(0)) - (d - 1)
      private var done = n == 0

      override def hasNext: Boolean = !done
      override def next(): T = {
        // admit buckets entering [w, w + d - 1]
        while (j < n && bucket(bs(j)) <= w + d - 1) {
          while (tail > head && !greater(bs(dq(tail - 1)), bs(j))) tail -= 1
          dq(tail) = j; tail += 1; j += 1
        }
        // evict buckets that slid out (< w)
        while (bucket(bs(dq(head))) < w) head += 1
        val out = withStart(bs(dq(head)), w)
        // advance to the next VALID start: some bucket in [w+1, w+d]
        w += 1
        while (p < n && bucket(bs(p)) < w) p += 1
        if (p == n) done = true
        else if (bucket(bs(p)) > w + d - 1) w = bucket(bs(p)) - (d - 1)
        out
      }
    }
}
