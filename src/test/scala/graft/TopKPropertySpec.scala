package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAggregator}

/** Property-style check (seeded, 200 trials) of the claim PLANS.md makes
  * for every TopKAggregator consumer: the result is identical whatever
  * the partitioning, arrival order, or merge order — i.e. map-side
  * partials are safe at any scale. Ties (equal score AND id) are
  * exercised deliberately via small value domains. */
class TopKPropertySpec extends AnyFunSuite {

  test("TopKAggregator is independent of partitioning, arrival and merge order") {
    val agg = new TopKAggregator(5)
    val rnd = new Random(7)
    (1 to 200).foreach { trial =>
      val n = rnd.nextInt(40)
      val data = Seq.fill(n)(ScoredId(rnd.nextInt(20).toLong, rnd.nextInt(8) / 2.0))
      val expected = data.sortBy(e => (-e.score, e.id)).take(5)
      val partials = data.map(e => (rnd.nextInt(6), e)).groupBy(_._1).values.toList
        .map(es => rnd.shuffle(es.map(_._2)).foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials) match {
        case Nil => agg.zero
        case h :: t => t.foldLeft(h)(agg.merge)
      }
      assert(agg.finish(merged).toSeq == expected, s"trial $trial: $data")
    }
  }
}
