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

  test("ForwardFill equals a naive sequential fill on random sparse grids") {
    val rnd = new Random(11)
    (1 to 300).foreach { trial =>
      val slots = 1 + rnd.nextInt(80)
      val entries = Seq.fill(rnd.nextInt(slots + 1))(
        (rnd.nextInt(slots), rnd.nextInt(1000) / 10.0)).distinctBy(_._1)
      // naive reference: walk the grid carrying the last seen value
      val byKey = entries.toMap
      var cur: Option[Double] = None
      val expected = (0 until slots).map { k =>
        byKey.get(k).foreach(v => cur = Some(v))
        cur
      }
      import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
      val map = new ArrayBasedMapData(
        new GenericArrayData(entries.map(_._1).toArray[Any]),
        new GenericArrayData(entries.map(_._2).toArray[Any]))
      val out = graft.functions.ForwardFill(
        org.apache.spark.sql.catalyst.expressions.Literal(map,
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.DoubleType)), slots)
        .nullSafeEval(map).asInstanceOf[GenericArrayData]
      val got = (0 until slots).map(k =>
        if (out.isNullAt(k)) None else Some(out.getDouble(k)))
      assert(got == expected, s"trial $trial slots=$slots entries=$entries")
    }
  }

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
