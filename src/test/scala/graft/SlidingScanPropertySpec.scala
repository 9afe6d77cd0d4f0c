package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.traffic.SlidingScan

/** Property check (seeded, 300 trials) of the ordered-scan sliding
  * argmax against a brute-force reference: for every window start w
  * with at least one event in [w, w+D-1], emit the max record under
  * the (value, ts, event_id, lane) total order. Exercises gaps longer
  * than the window, same-bucket collapses, exact value ties (small
  * value domain), and multiple stations per iterator — the regimes the
  * deque walk's index bookkeeping must survive. */
class SlidingScanPropertySpec extends AnyFunSuite {

  private def brute(rows: Seq[SlidingScan.Rec], d: Int): Set[SlidingScan.Rec] = {
    implicit val ord: Ordering[(Double, Long, Long, String)] =
      Ordering.Tuple4(Ordering.Double.TotalOrdering, Ordering.Long, Ordering.Long, Ordering.String)
    rows.groupBy(_._1).flatMap { case (station, rs) =>
      val buckets = rs.map(_._2)
      val starts = buckets.flatMap(b => (b - (d - 1)) to b).distinct
        .filter(w => rs.exists(r => r._2 >= w && r._2 <= w + d - 1))
      starts.map { w =>
        val in = rs.filter(r => r._2 >= w && r._2 <= w + d - 1)
        val m = in.maxBy(r => (r._3, r._4, r._5, r._6))
        (station, w, m._3, m._4, m._5, m._6)
      }
    }.toSet
  }

  test("emitGeneric equals brute-force window argmax on random feeds") {
    val rnd = new Random(23)
    (1 to 300).foreach { trial =>
      val d = 1 + rnd.nextInt(6)
      val stations = 1 + rnd.nextInt(3)
      val rows = (0 until rnd.nextInt(40)).map { i =>
        (rnd.nextInt(stations).toLong,
          rnd.nextInt(20).toLong,          // buckets with collisions + gaps
          rnd.nextInt(4).toDouble,         // small domain -> value ties
          rnd.nextInt(3).toLong,           // ts ties
          i.toLong,                        // unique event id
          "lane" + (1 + rnd.nextInt(3)))
      }
      val sorted = rows.sortBy(r => (r._1, r._2))
      val got = SlidingScan.emit(sorted.iterator, d).toSet
      val want = brute(rows, d)
      assert(got == want, s"trial $trial (d=$d): got ${got.size}, want ${want.size}")
    }
  }
}
