package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational}

/** Randomized twins of the single-fixture exactness specs: the
  * prefix-filter join's completeness theorem and the weighted median's
  * crossing rule hold on ANY input, so seeded random corpora must
  * reproduce brute force exactly — a class of bug a hand-built fixture
  * can miss (boundary prefix lengths, tie pile-ups, skewed dfs).
  */
class ExactnessPropertySpec extends SparkSpec {
  import spark.implicits._

  test("Md5Long60 digest-direct equals the portable conv chain on any string") {
    // the r12 fast path reads 60 bits off the digest; this pins
    // bit-equality against the oracle-mirrored chain on adversarial
    // inputs: empty, whitespace, unicode (multi-byte utf8), long,
    // hex-looking, and seeded-random strings
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(97)
    val adversarial = Seq("", " ", "a", "0xdeadbeef", "ü ñ 中文 🚀",
      "x" * 10000, "\t\n", "7:já") ++
      (1 to 500).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) ++
      (1 to 100).map(_ => (1 to 5).map(_ => rnd.nextPrintableChar()).mkString)
    val df = adversarial.toDF("s")
    val bad = df.selectExpr(
        "s",
        "graft_md5long60(s) AS fast",
        "cast(conv(substring(md5(s),1,15),16,10) as bigint) AS chain")
      .where(col("fast") =!= col("chain") || col("fast").isNull)
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
    // null propagates as null, like the chain
    val n = Seq[Option[String]](None).toDF("s")
      .selectExpr("graft_md5long60(s) AS v").collect()(0)
    assert(n.isNullAt(0))
  }

  test("BoundaryBucket binary search equals the boundary-count fold on random inputs") {
    // the r12 bucket expression must agree with its defining fold
    // (#bounds strictly below the key) on ANY sorted distinct boundary
    // set and any key — including keys equal to a boundary, below all,
    // above all, and at ±extremes
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 5) {
      val bounds = (1 to (1 + rnd.nextInt(40)))
        .map(_ => math.rint(rnd.nextGaussian() * 1000) / 8)
        .distinct.sorted.toArray
      val keys = (bounds.toSeq ++ bounds.map(_ - 0.001) ++ bounds.map(_ + 0.001) ++
        Seq(-1e18, 1e18, 0.0) ++ (1 to 50).map(_ => rnd.nextGaussian() * 1200)).toDF("k")
      val arr = bounds.mkString("array(", "D,", "D)")
      val bad = keys.selectExpr(
          "k",
          s"graft_bucket(k, $arr) AS fast",
          bounds.map(b => s"(CASE WHEN k > ${b}D THEN 1 ELSE 0 END)")
            .mkString("(", " + ", ") AS fold"))
        .where(col("fast") =!= col("fold"))
        .collect()
      assert(bad.isEmpty, s"trial $trial: ${bad.take(5).mkString("; ")}")
    }
  }

  test("prefix-filter join equals brute force on random corpora (L45 property)") {
    val rnd = new scala.util.Random(271)
    for (trial <- 1 to 3) {
      // small vocab -> heavy shingle overlap -> pairs near the tau
      // boundary; variable lengths exercise the ceil arithmetic
      val vocab = Vector.tabulate(12)(i => s"w$i")
      val docs = (0 until 40).map { id =>
        val n = 6 + rnd.nextInt(10)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "), "s")
      }.toDF("doc_id", "text", "source")
      def shingles(t: String): Set[String] =
        t.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      val sets = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
      val expected = (for {
        x <- sets.keys; y <- sets.keys if x < y
        inter = (sets(x) & sets(y)).size.toDouble
        j = inter / (sets(x).size + sets(y).size - inter) if j >= 0.5
      } yield (x, y)).toSet
      val got = Dedup.prefixJoin(docs).select("x", "y")
        .as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"trial $trial: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("weighted median crossing matches a reference fold on random groups (C33 property)") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val rows = (0 until 300).map { i =>
        (s"g${i % 4}", math.rint(rnd.nextDouble() * 1000) / 10, 1L + rnd.nextInt(9))
      }
      val df = rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      val got = Relational.weightedMedian(df).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val sorted = rs.map(t => (t._2, t._3)).sortBy(_._1)
        val tot = sorted.map(_._2).sum
        var cum = 0L
        val med = sorted.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
        assert(got(g) == ((med, tot)), s"trial $trial group $g: ${got(g)} vs ($med, $tot)")
      }
    }
  }
}
