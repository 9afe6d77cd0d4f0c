package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Relational, Stats}

/** Round-8 estimation operators: bootstrap CI, temporal join, CDC
  * compaction, join-size estimation, skyline.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.load(spark, sf, "events")
  private lazy val orders = Tables.load(spark, sf, "orders")
  private lazy val lineitem = Tables.load(spark, sf, "lineitem")
  private lazy val customer = Tables.load(spark, sf, "customer")

  test("bootstrap weights are Poisson(1)-distributed integers in [0, 8] (C56)") {
    val n = 20000
    // same draw the operator makes: 28-bit slice sl of md5("boot<g>:<id>")
    val w = spark.range(n / 4).toDF("id")
      .select(col("id"), explode(array((0 to 3).map(lit): _*)).as("sl"))
      .select(Stats.bootWeight(
        expr("cast(conv(substring(md5(concat('boot0:', cast(id as string))), sl * 7 + 1, 7), 16, 10) as long)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(w.keys.max <= 8 && w.keys.min >= 0)
    val mean = w.map { case (k, c) => k * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.03, s"weight mean $mean drifted from 1")
    val p0 = w.getOrElse(0L, 0L).toDouble / n
    assert(math.abs(p0 - math.exp(-1.0)) < 0.02, s"P(w=0)=$p0 vs 1/e")
  }

  test("bootstrapCi brackets the point mean and is partitioning-invariant (C56)") {
    val r = Stats.bootstrapCi(events)
    val rows = r.select("event_type", "mean", "n_reps", "ci_lo", "ci_hi")
      .as[(String, Double, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, mean, nReps, lo, hi) =>
      assert(nReps == Stats.BootB, s"$t: lost replicates ($nReps)")
      assert(lo <= mean && mean <= hi, s"$t: CI [$lo,$hi] misses mean $mean")
      assert(hi > lo, s"$t: degenerate CI")
    }
    val again = Stats.bootstrapCi(events.repartition(7)).collect().toSet
    assert(again == r.collect().toSet, "bootstrap depends on partitioning")
  }

  test("temporalJoin intersections exactly tile the timeline per key (C53)") {
    val span = 4102444800000000L - 788918400000000L // [1995, 2100)
    val perKey = Relational.temporalJoin(customer)
      .groupBy(col("key")).agg(sum(col("dur_us")).as("covered"), count(lit(1)).as("pairs"))
      .as[(Long, Long, Long)].collect()
    assert(perKey.length == customer.count())
    perKey.foreach { case (k, covered, pairs) =>
      assert(covered == span, s"key $k: intersections cover $covered != $span")
      assert(pairs >= 1 && pairs <= 12, s"key $k: pair fan-out $pairs out of bounds")
    }
    // every (segment, tier) pair meets at most once
    val dup = Relational.temporalJoin(customer)
      .groupBy("key", "segment", "tier").count().where(col("count") > 1).count()
    assert(dup == 0, "a version pair intersected twice")
  }

  test("cdcCompact applies tombstones, late re-inserts, and ignores arrival order (C57)") {
    val r = Relational.cdcCompact(orders).cache()
    val nKeys = orders.count()
    val del = orders.where(col("o_orderkey") % 5 === 0).count()
    val res = orders.where(col("o_orderkey") % 15 === 0).count()
    // mid snapshot precedes the delete wave: every key alive
    assert(r.where(col("snap") === "mid").count() == nKeys)
    // final: deletes applied, re-inserts resurrected
    assert(r.where(col("snap") === "final").count() == nKeys - del + res)
    val finals = r.where(col("snap") === "final")
    assert(finals.where(col("key") % 15 === 0 && col("op") =!= "R").count() == 0)
    assert(finals.where(col("key") % 5 === 0 && col("key") % 15 =!= 0).count() == 0)
    // updates won over inserts where no later op exists
    assert(finals.where(col("key") % 3 === 0 && col("key") % 5 =!= 0 && col("op") =!= "U").count() == 0)
    // argmax is commutative: partitioning/arrival order cannot matter
    val shuffled = Relational.cdcCompact(orders.repartition(11)).collect().toSet
    assert(shuffled == r.collect().toSet)
    r.unpersist()
  }

  test("coalesceIntervals yields disjoint maximal spans with exact union length (C58)") {
    val r = Relational.coalesceIntervals(orders)
      .select("key", "from_us", "to_us", "n_merged")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.nonEmpty && r.exists(_._4 > 1), "derivation produced no overlaps to merge")
    // disjoint and non-touching per key (touching spans must merge)
    r.groupBy(_._1).foreach { case (k, spans) =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1, s"key $k: spans touch/overlap ($e1, $s2)")
        case _ =>
      }
    }
    // union length equals an independent per-key sweep over raw intervals
    val raw = orders.select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("s"), col("o_orderkey"))
      .withColumn("e", col("s") + (col("o_orderkey") % 30 + 1) * lit(86400000000L))
      .select("o_custkey", "s", "e").as[(Long, Long, Long)].collect()
    val expected = raw.groupBy(_._1).map { case (k, ivs) =>
      var cover = 0L; var curS = Long.MinValue; var curE = Long.MinValue
      ivs.map(i => (i._2, i._3)).sorted.foreach { case (s, e) =>
        if (s > curE) { if (curE > curS) cover += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      if (curE > curS) cover += curE - curS
      k -> cover
    }
    val got = r.groupBy(_._1).map { case (k, spans) => k -> spans.map(x => x._3 - x._2).sum }
    assert(got == expected, "union length diverged from sequential sweep")
    // idempotence: every span count re-coalesces to itself (disjointness
    // already proves it — spans can't merge further)
    assert(r.map(_._1).distinct.length.toLong == orders.select("o_custkey").distinct.count())
  }

  test("joinSizeEst is one-sided: CMS estimate >= exact join size (C54)") {
    val (est, exact, ratio) = Stats.joinSizeEst(orders, lineitem)
      .as[(Long, Long, Double)].collect().head
    assert(exact > 0)
    assert(est >= exact, s"CMS inner product $est under exact $exact — impossible")
    assert(ratio < 50.0, s"estimate $est uselessly loose vs $exact")
    info(f"join size exact=$exact est=$est ratio=$ratio%.3f")
  }

  private lazy val documents = Tables.load(spark, sf, "documents")

  test("pava pools violations exactly and conserves weight (L95)") {
    // means [0.1, 0.9, 0.3, 0.6]: bins 2-3 pool to 0.6, then 0.6 vs
    // 0.6 holds (no strict violation) -> blocks [1], [2,3], [4]
    val in = Seq((10L, 1L), (10L, 9L), (10L, 3L), (10L, 6L))
    val out = Stats.pava(in)
    assert(out == Seq((10L, 1L), (20L, 12L), (20L, 12L), (10L, 6L)))
    // full-reversal input pools to one block
    val rev = Stats.pava(Seq((1L, 1L), (1L, 0L)))
    assert(rev == Seq((2L, 1L), (2L, 1L)))
    // already isotonic input is untouched
    val iso = Seq((5L, 0L), (5L, 2L), (5L, 5L))
    assert(Stats.pava(iso) == iso)
  }

  test("calibrate output is monotone and equals the minimax closed form (L95)") {
    val r = Stats.calibrate(documents)
      .orderBy("bin").as[(Long, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    r.sliding(2).foreach {
      case Array((b1, _, _, c1), (b2, _, _, c2)) =>
        assert(c1 <= c2 + 1e-12, s"calibration not isotonic: bin $b1=$c1 > bin $b2=$c2")
      case _ =>
    }
    // minimax characterization: iso(i) = max_{k<=i} min_{j>=i} mean(k..j)
    val ns = r.map(_._2); val ps = r.map(_._3)
    r.indices.foreach { i =>
      val minimax = (0 to i).map { k =>
        (i until r.length).map { j =>
          ps.slice(k, j + 1).sum.toDouble / ns.slice(k, j + 1).sum
        }.min
      }.max
      assert(math.abs(r(i)._4 - math.rint(minimax * 1e6) / 1e6) <= 1e-6,
        s"bin ${r(i)._1}: pava ${r(i)._4} != minimax $minimax")
    }
  }

  test("geometric DP noise is integer, bounded, and centred (L96)") {
    val n = 20000
    val w = spark.range(n).toDF("id")
      .select(Curation.geomNoise(
        graft.functions.Portable.md5Long(lit("dpTest"), col("id").cast("string"))).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(w.keys.max <= 8 && w.keys.min >= -8)
    val mean = w.map { case (k, c) => k * c }.sum.toDouble / n
    assert(math.abs(mean) < 0.05, s"noise mean $mean drifted from 0")
    val p0 = w.getOrElse(0L, 0L).toDouble / n
    assert(math.abs(p0 - 1.0 / 3) < 0.02, s"P(0)=$p0 vs 1/3")
    // symmetric tails, roughly
    val pPos = w.filter(_._1 > 0).values.sum.toDouble / n
    val pNeg = w.filter(_._1 < 0).values.sum.toDouble / n
    assert(math.abs(pPos - pNeg) < 0.02, s"asymmetric noise: +$pPos vs -$pNeg")
  }

  test("dpHistogram bounds each user's contribution at the cap (L96)") {
    val r = Curation.dpHistogram(events)
    val released = r.select(sum(col("true_n"))).as[Long].collect().head
    val expected = events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .select(sum(least(col("c"), lit(4L)))).as[Long].collect().head
    assert(released == expected,
      s"bounded total $released != sum of per-user min(cap, n) $expected")
    r.as[(String, Long, Long, Long)].collect().foreach { case (t, tn, nz, rl) =>
      assert(math.abs(nz) <= 8 && rl == tn + nz, s"$t: bad noise arithmetic")
    }
    // deterministic release: same seed, any partitioning
    val again = Curation.dpHistogram(events.repartition(13)).collect().toSet
    assert(again == r.collect().toSet)
  }

  test("pseudonymize preserves linkage with no raw keys (L97)") {
    val r = Curation.pseudonymize(customer, orders).cache()
    // one token per customer with orders; grouped order counts survive
    val perKey = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect().sorted.toSeq
    val perTok = r.select("n_orders").as[Long].collect().sorted.toSeq
    assert(perTok == perKey, "order-count multiset changed under pseudonymization")
    assert(r.select("cust_token").distinct().count() == perKey.length)
    // tokens are opaque 32-hex, not echoes of the key
    assert(r.where(!col("cust_token").rlike("^[0-9a-f]{32}$")).count() == 0)
    r.unpersist()
  }

  test("goldenRecord fuses a planted chain and reconciles with manual fusion (L98)") {
    // three records whose names chain A~B~C through the 16-char block
    // (adjacent suffix distance 2, ends distance 4 — never scored as a
    // pair) must fuse into ONE golden record
    val blk = "BlockPrefix16Chr" // exactly 16 chars
    // A~B and B~C: near-name + seg + balance agree (1300); C~D: exact
    // name + balance agree despite seg disagreement (1400); A~C is
    // name-far (-100) and B~D only 800 — the closure, not the pair
    // list, must connect all four
    val planted = Seq(
      (9001L, s"$blk", "AUTOMOBILE", 100.0),
      (9002L, s"${blk}ab", "AUTOMOBILE", 150.0),
      (9003L, s"${blk}abcd", "AUTOMOBILE", 180.0),
      (9004L, s"${blk}abcd", "HOUSEHOLD", 180.0))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    val fused = Dedup.goldenRecord(planted).collect()
    assert(fused.length == 1, s"chain did not fuse: ${fused.length} clusters")
    val r = fused.head
    assert(r.getAs[Long]("cluster_id") == 9001L && r.getAs[Long]("golden_id") == 9001L)
    assert(r.getAs[Long]("n_members") == 4)
    assert(r.getAs[String]("name") == s"${blk}abcd", "longest-name rule lost")
    assert(r.getAs[String]("segment") == "AUTOMOBILE", "mode rule lost")
    assert(math.abs(r.getAs[Double]("bal_total") - 610.0) < 1e-9)
    // corpus reconciliation: fusion equals a manual per-cluster fold
    val cc = Dedup.connectedComponents(
      Dedup.recordLinkage(customer).select("x", "y"),
      customer.select(col("c_custkey").as("doc_id")))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val members = customer.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .as[(Long, String, String, Double)].collect()
      .groupBy { case (k, _, _, _) => cc(k) }
    val got = Dedup.goldenRecord(customer).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    assert(got.keySet == members.keySet)
    members.foreach { case (cid, ms) =>
      val g = got(cid)
      assert(g.getAs[Long]("n_members") == ms.length)
      assert(g.getAs[Long]("golden_id") == ms.map(_._1).min)
      assert(g.getAs[String]("name") == ms.map(_._2).maxBy(n => (n.length, n)))
      val bestSeg = ms.groupBy(_._3).map { case (s, xs) => (xs.length, s) }.max._2
      assert(g.getAs[String]("segment") == bestSeg)
    }
  }

  test("qualityReport counts exactly the planted violations (C59)") {
    val clean = Stats.qualityReport(orders, customer).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val bad = Seq(
      (null.asInstanceOf[java.lang.Long], 777001L, "O", 10.0, "1995-06-01 00:00:00", "1-URGENT"),
      (java.lang.Long.valueOf(999999999L), 777002L, "O", 10.0, "1995-06-01 00:00:00", "1-URGENT"),
      (java.lang.Long.valueOf(1L), 777003L, "X", -5.0, "2005-06-01 00:00:00", "1-URGENT"))
      .toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp_ntz")).drop("d")
    val dup = orders.limit(1) // duplicate an existing key verbatim
    val corrupted = orders.unionByName(bad.select(orders.columns.map(col): _*))
      .unionByName(dup)
    val dirty = Stats.qualityReport(corrupted, customer).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dirty("not_null:o_custkey") == clean("not_null:o_custkey") + 1)
    assert(dirty("positive:o_totalprice") == clean("positive:o_totalprice") + 1)
    assert(dirty("domain:o_orderstatus") == clean("domain:o_orderstatus") + 1)
    assert(dirty("range:o_orderdate") == clean("range:o_orderdate") + 1)
    assert(dirty("unique:o_orderkey") == clean("unique:o_orderkey") + 1)
    // the null key and the orphan both fail the parent probe
    assert(dirty("ref:o_custkey->customer") == clean("ref:o_custkey->customer") + 2)
    // clean corpus passes what it should
    assert(clean("unique:o_orderkey") == 0 && clean("ref:o_custkey->customer") == 0)
  }

  test("skyline equals brute-force dominance and keeps tied duplicates (C55)") {
    val sky = Stats.skyline(orders)
      .select("o_orderkey").as[Long].collect().toSet
    // brute force on the small sf
    val pts = orders.select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("p"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d"))
      .as[(Long, Double, Long)].collect()
    val brute = pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) => p2 >= p && d2 >= d && (p2 > p || d2 > d) }
    }.map(_._1).toSet
    assert(sky == brute, s"skyline mismatch: ${sky.size} vs brute ${brute.size}")
    assert(sky.nonEmpty)
    // no cartesian/nested-loop in the plan
    val plan = Stats.skyline(orders).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "skyline planned a quadratic join")
  }

  test("corrMatrix: planted ±1/0 correlations exact, real corpus matches corr() (C61)") {
    // qty = i, price = 2i (corr +1), disc = 100 - i (corr -1),
    // tax over (1,0,0,1) against (1,2,3,4): num = 4·5 - 10·2 = 0 exactly
    val planted = (1 to 4).map(i =>
      (i.toDouble, 2.0 * i, 100.0 - i, if (i == 1 || i == 4) 0.01 else 0.0))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = Stats.corrMatrix(planted).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("qty", "price")) == 1.0, s"perfect corr: ${got(("qty", "price"))}")
    assert(got(("qty", "disc")) == -1.0, s"anti corr: ${got(("qty", "disc"))}")
    assert(got(("qty", "tax")) == 0.0, s"zero corr: ${got(("qty", "tax"))}")
    Seq("qty", "price", "disc", "tax").foreach(f =>
      assert(got((f, f)) == 1.0, s"self-corr of $f: ${got((f, f))}"))
    // real corpus: every cell within rounding of Spark's own corr()
    // over the identical cent-scaled features
    val cents = lineitem.select(
      (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").cast("double").as("qty"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").cast("double").as("price"),
      (col("l_discount").cast("decimal(18,2)") * 100).cast("long").cast("double").as("disc"),
      (col("l_tax").cast("decimal(18,2)") * 100).cast("long").cast("double").as("tax"))
    val real = Stats.corrMatrix(lineitem).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    for { (a, b) <- real.keys if a != b } {
      val ref = cents.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(real((a, b)) - ref) < 1e-5,
        s"corr($a, $b) = ${real((a, b))} vs Spark corr $ref")
    }
  }

  test("mutualInfo: zero on planted independence, ln 2 on the diagonal (C62)") {
    import java.sql.Timestamp
    def tsOnDay(d: Long) = new Timestamp(d * 86400L * 1000L)
    // dow = (day + 4) % 7: day 3 -> 0, day 4 -> 1
    def rows(tp: String, day: Long, n: Int) =
      Seq.fill(n)((tp, tsOnDay(day)))
    // independent: P(x, y) = P(x)P(y) cell-exactly -> all terms 0
    val ind = (rows("a", 3, 10) ++ rows("a", 4, 20) ++
      rows("b", 3, 20) ++ rows("b", 4, 40)).toDF("event_type", "ts")
    Stats.mutualInfo(ind).collect().foreach { r =>
      assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0,
        s"independence should zero every term: $r")
    }
    // perfectly dependent diagonal: each cell's pmi = ln 2
    val dep = (rows("a", 3, 10) ++ rows("b", 4, 10)).toDF("event_type", "ts")
    val depRows = Stats.mutualInfo(dep).collect()
    assert(depRows.length == 2)
    depRows.foreach { r =>
      assert(math.abs(r.getDouble(6) - math.log(2.0)) < 1e-6, s"pmi: $r")
      assert(math.abs(r.getDouble(7) - 0.5 * math.log(2.0)) < 1e-6, s"mi_term: $r")
    }
    // real corpus: margins reconcile and total MI is non-negative
    val real = Stats.mutualInfo(events).collect()
    val byType = real.groupBy(_.getString(0))
    byType.foreach { case (tp, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3),
        s"rx margin drifts for $tp")
    }
    val totalMi = real.map(_.getDouble(7)).sum
    assert(totalMi >= -1e-4 * real.length, s"total MI negative: $totalMi")
    real.foreach(r => assert(r.getDouble(8) >= 0.0, s"chi2 term negative: $r"))
  }

  test("wilsonRanking: small-n flukes rank below large-n workhorses (C96)") {
    // A: 95/100 non-returned, B: 1/1, C: 40/100 — raw share says B first,
    // Wilson says A
    val li = ((1 to 100).map(i => (10L, if (i <= 95) "N" else "R")) ++
      Seq((20L, "N")) ++
      (1 to 100).map(i => (30L, if (i <= 40) "N" else "R")))
      .toDF("l_partkey", "l_returnflag")
    val got = Stats.wilsonRanking(li)
      .select("partkey", "n", "pos", "wilson_lb", "rnk")
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._5)
    assert(got.map(_._1).toSeq == Seq(10L, 30L, 20L),
      s"ranking order wrong: ${got.toSeq}")
    // formula replay for A
    val (n, pos) = (100.0, 95.0)
    val z2 = 3.8415984400000006
    val p = pos / n
    val lb = (p + z2 / (2 * n) - 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n)
    assert(got.head._4 == math.rint(lb * 1e6) / 1e6)
    // corpus: bounds are probabilities, ranking is dense 1..N
    val corpus = Stats.wilsonRanking(lineitem)
      .select("wilson_lb", "rnk").as[(Double, Long)].collect()
    assert(corpus.map(_._2).sorted.toSeq == (1L to corpus.length))
    corpus.foreach { case (lb2, _) => assert(lb2 >= 0.0 && lb2 <= 1.0) }
  }

  test("ksDistance replays the exact integer sup-distance per type (C97)") {
    def md5ks(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ks:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = events.select(col("event_type"), col("event_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val got = Stats.ksDistance(events)
      .select("event_type", "n0", "n1", "d_stat")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    raw.groupBy(_._1).foreach { case (t, rs) =>
      val arm = rs.map(r => (r._3, md5ks(r._2) % 2))
      val (a0, a1) = (arm.filter(_._2 == 0).map(_._1).sorted, arm.filter(_._2 == 1).map(_._1).sorted)
      val values = (a0 ++ a1).distinct.sorted
      val dnum = values.map { v =>
        math.abs(a0.count(_ <= v).toLong * a1.length - a1.count(_ <= v).toLong * a0.length)
      }.max
      val expect = math.rint(dnum.toDouble / (a0.length.toLong * a1.length) * 1e6) / 1e6
      val r = got(t)
      assert(r._2 == a0.length && r._3 == a1.length, s"$t arm sizes")
      assert(r._4 == expect, s"$t: d_stat ${r._4} != $expect")
    }
  }

  test("priceElasticity recovers a planted power law exactly (C98)") {
    // qty = K * price^(-2) exactly in log space -> slope -2, and the
    // quantized-decimal sums keep it -2 to the released 6 decimals
    val li = (1 to 50).map { i =>
      val price = 100.0 + i
      val qty = 1.0e8 / (price * price)
      (1000L + (i % 5), qty, price)
    }.toDF("l_partkey", "l_quantity", "l_extendedprice")
    val parts = (0 to 4).map(k => (1000L + k, "BRAND#1")).toDF("p_partkey", "p_brand")
    val got = Stats.priceElasticity(li, parts)
      .select("p_brand", "n", "elasticity").as[(String, Long, Double)].head()
    assert(got._2 == 50L)
    assert(math.abs(got._3 - -2.0) < 2e-4, s"elasticity ${got._3}")
    // corpus: runs per brand with finite outputs
    val corpus = Stats.priceElasticity(lineitem, Tables.load(spark, sf, "part"))
      .select("elasticity").as[Double].collect()
    assert(corpus.nonEmpty && corpus.forall(e => !e.isNaN && !e.isInfinite))
  }

  test("conformalIntervals: held-out coverage honors the 90% guarantee (C90)") {
    val got = Stats.conformalIntervals(events)
      .select("event_type", "n_cal", "n_test", "q90", "coverage")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val n = events.count()
    assert(got.map(r => r._2 + r._3).sum == n, "cal + test must tile the corpus")
    got.foreach { case (t, nCal, nTest, q90, cov) =>
      assert(nCal > 0 && nTest > 0, s"$t: degenerate split")
      assert(q90 > 0.0, s"$t: zero band width")
      // conformal guarantee: >= 90% held-out coverage up to finite-sample
      // noise (binomial sd ~ 0.3/sqrt(n)), and a band that wide must not
      // be vacuous either
      val slack = 3.5 * 0.3 / math.sqrt(nTest.toDouble)
      assert(cov >= 0.9 - slack, s"$t: coverage $cov below guarantee (n=$nTest)")
      assert(cov <= 1.0, s"$t: coverage $cov")
    }
    // a y = 2x noiseless relation on the calibration fit gives a zero
    // residual band that still covers every held-out point exactly
    val lin = (1 to 200).map { i =>
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 3600L)),
        "lin", i * 2.0)
    }.toDF("event_id", "ts", "event_type", "value")
    val linRes = Stats.conformalIntervals(lin)
      .select("q90", "coverage").as[(Double, Double)].head()
    assert(linRes._1 <= 1e-6 && linRes._2 == 1.0, s"noiseless line: $linRes")
  }

  test("markovTransitions: exact counts, row-stochastic, per-cell entropy terms (C93)") {
    // user 1: a -> b -> a -> b ; user 2: a -> b -> c
    def ts(i: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 60L))
    val ev = Seq(
      (1L, 1L, "a", ts(1)), (2L, 1L, "b", ts(2)), (3L, 1L, "a", ts(3)), (4L, 1L, "b", ts(4)),
      (5L, 2L, "a", ts(1)), (6L, 2L, "b", ts(2)), (7L, 2L, "c", ts(3)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Stats.markovTransitions(ev)
      .select("from_type", "to_type", "n", "row_total", "p", "h_term")
      .as[(String, String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // transitions: a->b x3, b->a x1, b->c x1
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    assert(got(("a", "b"))._3 == 3L && got(("a", "b"))._5 == 1.0)
    assert(got(("a", "b"))._6 == 0.0, "certain transition has zero entropy term")
    assert(got(("b", "a"))._3 == 1L && got(("b", "a"))._4 == 2L && got(("b", "a"))._5 == 0.5)
    val h = math.rint(-(0.5 * math.log(0.5)) * 1e6) / 1e6
    assert(got(("b", "a"))._6 == h && got(("b", "c"))._6 == h)
    // corpus: every row is a probability and each from-row sums to ~1
    val corpus = Stats.markovTransitions(events)
      .select("from_type", "p").as[(String, Double)].collect()
    corpus.groupBy(_._1).foreach { case (f, ps) =>
      val s = ps.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$f row sums to $s")
    }
  }

  test("benfordAudit classifies first digits by integer ladder, shares tile to 1 (C84)") {
    // boundary cents: 999 -> 9, 1000 -> 1, 1 -> 1 (no float log anywhere)
    val planted = Seq(9.99, 10.00, 0.01, 55.50, 55.51, 0.02, 900.00)
      .toDF("l_extendedprice")
    val got = Stats.benfordAudit(planted)
      .select("digit", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(9L -> 2L, 1L -> 2L, 5L -> 2L, 2L -> 1L), s"got $got")
    // corpus: shares tile to 1 within rounding, chi terms non-negative,
    // and the digit-1 chi term replays the formula exactly
    val rows = Stats.benfordAudit(lineitem)
      .select("digit", "n", "share", "expected", "chi_term")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to 9L))
    val total = rows.map(_._2).sum
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    rows.foreach { case (d, n, share, exp, chi) =>
      assert(chi >= 0.0)
      val replay = math.rint((share - exp) * (share - exp) / exp * total * 1e6) / 1e6
      assert(math.abs(chi - replay) < 1e-9, s"digit $d chi $chi != $replay")
    }
  }

  test("giniConcentration: equal revenues score 0, one-takes-all approaches (n-1)/n (C86)") {
    val orders2 = Seq(
      (1L, 10.00), (2L, 10.00), (3L, 10.00), (4L, 10.00), // nation 1: equal
      (11L, 0.01), (12L, 0.01), (13L, 0.01), (14L, 1000.00)) // nation 2: skewed
      .toDF("o_custkey", "o_totalprice")
    val cust2 = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1),
      (11L, 2), (12L, 2), (13L, 2), (14L, 2)).toDF("c_custkey", "c_nationkey")
    val got = Stats.giniConcentration(orders2, cust2)
      .select("nation", "n_customers", "total_cents", "gini")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1, 4L, 4000L, 0.0)))
    // nation 2 exact: x = (1,1,1,100000), sum ix = 400006, sum x = 100003
    val expect2 = math.rint((2.0 * 400006 - 5.0 * 100003) / (4.0 * 100003) * 1e6) / 1e6
    assert(got(1)._4 == expect2, s"${got(1)._4} != $expect2")
    // corpus: bounded in [0, 1)
    Stats.giniConcentration(orders, customer).select("gini").as[Double]
      .collect().foreach(g => assert(g >= 0.0 && g < 1.0))
  }

  test("spearmanCorr: monotone = 1, antitone = -1, ties use average ranks (C87)") {
    def ev(rows: Seq[(String, Long, Double)]) = rows
      .toDF("event_type", "us", "value")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"), col("value"))
    val mono = ev((1 to 50).map(i => ("up", i * 1000000L, i * 1.5)))
    assert(Stats.spearmanCorr(mono).select("spearman").as[Double].head() == 1.0)
    val anti = ev((1 to 50).map(i => ("dn", i * 1000000L, (100 - i) * 1.5)))
    assert(Stats.spearmanCorr(anti).select("spearman").as[Double].head() == -1.0)
    // tie handling: values (1, 2, 2, 3) over times (1, 2, 3, 4) —
    // doubled average ranks x2: (2, 5, 5, 8), y2: (2, 4, 6, 8);
    // expected spearman = pearson(x2, y2), replayed sequentially:
    val tied = ev(Seq(("t", 1000000L, 1.0), ("t", 2000000L, 2.0),
      ("t", 3000000L, 2.0), ("t", 4000000L, 3.0)))
    val x2 = Seq(2.0, 5.0, 5.0, 8.0); val y2 = Seq(2.0, 4.0, 6.0, 8.0)
    val n = 4.0
    val num = n * x2.zip(y2).map { case (a, b) => a * b }.sum - x2.sum * y2.sum
    val den = math.sqrt((n * x2.map(a => a * a).sum - x2.sum * x2.sum) *
      (n * y2.map(a => a * a).sum - y2.sum * y2.sum))
    val expect = math.rint(num / den * 1e6) / 1e6
    assert(Stats.spearmanCorr(tied).select("spearman").as[Double].head() == expect)
  }

  test("cupedAdjust: raw means survive, linear pre/post dependence collapses variance (C89)") {
    // 40 users, pre-window value x_u at day 1, post-window y_u = 2*x_u
    // at day 9 (midpoint splits them); arms from md5 parity
    val rows = (1 to 40).flatMap { u =>
      val x = 10.0 + (u % 7)
      Seq((u.toLong, 1L * 86400000000L, x), (u.toLong, 9L * 86400000000L, 2 * x))
    }
    val df = rows.toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val got = Stats.cupedAdjust(df)
      .select("arm", "n", "mean_y", "mean_y_adj", "var_y", "var_y_adj")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(got.map(_._1).sorted.toSeq == Seq(0L, 1L))
    got.foreach { case (arm, n, my, myAdj, vy, vyAdj) =>
      assert(n > 0)
      // y = 2x exactly -> theta = 2, adjusted variance collapses to ~0
      assert(vyAdj <= 1e-6, s"arm $arm: var_y_adj $vyAdj did not collapse (var_y $vy)")
      // the adjustment re-centers by the pooled mean, so adjusted means
      // stay within the planted mean spread
      assert(math.abs(myAdj - my) <= math.sqrt(vy) + 1e-9, s"arm $arm: $myAdj vs $my")
    }
    // corpus: two arms, variance never increases materially
    val corpus = Stats.cupedAdjust(events)
      .select("arm", "var_y", "var_y_adj").as[(Long, Double, Double)].collect()
    assert(corpus.length == 2)
    corpus.foreach { case (arm, vy, vyAdj) =>
      assert(vyAdj <= vy * 1.05 + 1e-9, s"arm $arm: CUPED increased variance $vy -> $vyAdj") }
  }

  test("mannWhitney: exact integer 2U replays per type; z pinned from the exact surface (C102)") {
    def md5mw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mw:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = events.select(col("event_type"), col("event_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val got = Stats.mannWhitney(events)
      .select(col("event_type"), col("n0"), col("n1"), col("u2"),
        col("var_int"))
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    raw.groupBy(_._1).foreach { case (t, rs) =>
      val armed = rs.map(r => (r._3, md5mw(r._2) % 2))
      val all = armed.map(_._1).sorted
      // doubled midrank of v = 2*(#strictly-below) + (#ties) + 1
      def r2(v: Long) = 2L * all.count(_ < v) + all.count(_ == v) + 1
      val arm1 = armed.filter(_._2 == 1).map(_._1)
      val n1 = arm1.length.toLong; val n0 = all.length - n1
      val u2 = arm1.map(r2).sum - n1 * (n1 + 1)
      val r = got(t)
      assert(r._2 == n0 && r._3 == n1, s"$t arm sizes ${r._2}/${r._3}")
      assert(r._4 == u2, s"$t: u2 ${r._4} != $u2")
      // exact integer-variance replay: var_int = floor of the exact
      // tie-corrected rational (BigInt — the r11 scale-safe release)
      val n = all.length.toLong
      val tie3 = all.groupBy(identity).values.map { g =>
        val c = BigInt(g.length); c * c * c - c
      }.sum
      val varInt = BigInt(n0) * n1 * (BigInt(n) * (BigInt(n) * n - 1) - tie3) /
        (BigInt(12) * n * (n - 1))
      assert(BigInt(r._5) == varInt, s"$t var_int ${r._5} != $varInt")
      // the float z is pinned HERE (all-integer hashed surface): finite,
      // and |z| modest on a null A/B split
      val z = (u2 - n0 * n1).toDouble / (2.0 * math.sqrt(r._5.toDouble))
      assert(!z.isNaN && math.abs(z) < 10, s"$t z $z")
    }
    // both-arms-one-value degenerate: every rank ties -> u2 = n0*n1
    // exactly (midranks), var carries only the tie-corrected term
    val one = Seq(("t", 1L, 5.0), ("t", 2L, 5.0), ("t", 3L, 5.0), ("t", 4L, 5.0))
      .toDF("event_type", "event_id", "value")
    val d = Stats.mannWhitney(one)
      .select(col("n0"), col("n1"), col("u2"), col("var_int"))
      .as[(Long, Long, Long, Long)].head()
    assert(d._3 == d._1 * d._2, s"all-tied u2 ${d._3}")
    assert(d._4 == 0L, "full-tie variance must vanish")
  }

  test("anovaF: planted separation recovers the sequential F exactly; degenerates NULL (C103)") {
    def ev(rows: Seq[(String, Long, Double)]) =
      rows.zipWithIndex.map { case ((t, k, v), i) =>
        (t, i.toLong, s"""{"k": $k}""", v)
      }.toDF("event_type", "event_id", "props", "value")
    // two channels, strongly separated means: 10.00 vs 30.00 cents-exact
    val sep = ev((1 to 20).map(i => ("a", (i % 2).toLong, if (i % 2 == 0) 10.0 else 30.0)))
    val g = Stats.anovaF(sep).select("k", "n").as[(Long, Long)].head()
    assert(g._1 == 2 && g._2 == 20)
    // zero within-group variance with nonzero between -> ssw = 0 -> NULL
    assert(Stats.anovaF(sep).select(col("f_stat").isNull).head().getBoolean(0),
      "perfect separation (ssw = 0) must NULL F, not overflow")
    // noisy separation: replay the fixed-order double chain sequentially
    val noisy = ev((1 to 40).map(i =>
      ("a", (i % 4).toLong, 10.0 + (i % 4) * 5.0 + (i % 3))))
    val rows = (1 to 40).map(i => ((i % 4).toLong, ((10.0 + (i % 4) * 5.0 + (i % 3)) * 100).toLong))
    val n = rows.length.toLong; val s = rows.map(_._2).sum
    val q = rows.map(r => r._2 * r._2).sum
    val terms = (0 to 3).map { k =>
      val g = rows.filter(_._1 == k); g.map(_._2).sum.toDouble / g.length * g.map(_._2).sum
    }
    val gterm = ((terms(0) + terms(1)) + terms(2)) + terms(3)
    val ssb = gterm - s.toDouble / n * s
    val ssw = q.toDouble - gterm
    val expect = math.rint((ssb * (n - 4)) / (ssw * 3) * 1e6) / 1e6
    val got = Stats.anovaF(noisy).select("k", "n", "s", "q", "f_stat")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((4L, n, s, q, expect)), s"got $got expect F=$expect")
    // one-group degenerate: k = 1 -> NULL
    val single = ev((1 to 5).map(i => ("a", 0L, i * 1.0)))
    assert(Stats.anovaF(single).select(col("f_stat").isNull).head().getBoolean(0))
    // corpus: F present, finite and nonnegative for every type
    val corpus = Stats.anovaF(events).select("f_stat").na.drop()
    assert(corpus.count() == Stats.anovaF(events).count(), "corpus F unexpectedly NULL")
    corpus.as[Double].collect().foreach(f => assert(!f.isNaN && f >= 0.0))
  }

  test("assocRules: directed confidences replay from planted baskets; lift shared with C63 (C106)") {
    // baskets: {a,b} x3, {a} x2, {b} x1 -> supp(a)=5, supp(b)=4, ab=3
    val li = (Seq.fill(3)(Seq(101L, 102L)) ++ Seq.fill(2)(Seq(101L)) :+ Seq(102L))
      .zipWithIndex.flatMap { case (items, b) => items.map(i => (b.toLong, i)) }
      .toDF("l_orderkey", "l_partkey")
    val got = Stats.assocRules(li)
      .select("antecedent", "consequent", "support", "s_ante", "conf_ppm", "lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // conf(a->b) = 3/5, conf(b->a) = 3/4; lift = 3*6/(5*4) = 0.9
    assert(got((101L, 102L)) == ((101L, 102L, 3L, 5L, 600000L, 0.9)), s"${got((101L, 102L))}")
    assert(got((102L, 101L)) == ((102L, 101L, 3L, 4L, 750000L, 0.9)), s"${got((102L, 101L))}")
    // corpus: every C63 pair appears in BOTH directions with its lift
    val fp = Stats.frequentPairs(lineitem).select("p1", "p2", "support", "lift")
      .as[(Long, Long, Long, Double)].collect()
    val ar = Stats.assocRules(lineitem)
      .select("antecedent", "consequent", "support", "lift")
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(ar.size == 2 * fp.length, "directed rule count must double the pair count")
    fp.foreach { case (p1, p2, sup, lift) =>
      assert(ar((p1, p2)) == ((sup, lift)) && ar((p2, p1)) == ((sup, lift)))
    }
  }

  test("rocAuc: separable = perfect, ties midpointed, nulls filtered, degenerate den = 0 (C101)") {
    def auc(rows: Seq[(Long, Int, Seq[Double])]) =
      Stats.rocAuc(rows.toDF("vec_id", "label", "embedding"))
        .select("class", "n_pos", "n_neg", "auc_num", "auc_den")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // dim c scores class c; class 0 separable, class 1 has a 3-way tie
    val base = Seq(
      (1L, 0, Seq(0.9, 0.5)), (2L, 0, Seq(0.8, 0.5)),
      (3L, 1, Seq(0.1, 0.5)), (4L, 1, Seq(0.2, 0.7)))
    val g = auc(base)
    assert(g(0L) == ((2L, 2L, 8L, 8L)), s"class 0 ${g(0L)}") // AUC = 1
    // pairwise replay: 2 wins + 2 half-ties of 4 pairs = 0.75 = 6/8
    assert(g(1L) == ((2L, 2L, 6L, 8L)), s"class 1 ${g(1L)}")
    // an out-of-range label (5 ≥ dim 2) null-scores EVERY row for its
    // own class (row vanishes, Spark/DuckDB NULL-order divergence never
    // reaches a rank) but stays a valid negative for in-range classes
    val g5 = auc(base :+ (5L, 5, Seq(0.05, 0.3)))
    assert(!g5.contains(5L), "null-scored class leaked into output")
    assert(g5(0L) == ((2L, 3L, 12L, 12L)), s"class 0 ${g5(0L)}")
    assert(g5(1L) == ((2L, 3L, 10L, 12L)), s"class 1 ${g5(1L)}")
    // single-class degenerate: exact (0, 0) integers, never a NaN
    val g1 = auc(Seq((1L, 0, Seq(0.4)), (2L, 0, Seq(0.6))))
    assert(g1(0L) == ((2L, 0L, 0L, 0L)), s"degenerate ${g1(0L)}")
    // corpus: the float AUC is pinned HERE (the hashed surface is
    // all-integer by the r10 de-float discipline): 0 ≤ num ≤ den
    val emb = Tables.load(spark, sf, "embeddings")
    val corpus = Stats.rocAuc(emb)
      .select("n_pos", "n_neg", "auc_num", "auc_den")
      .as[(Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (np, nn, num, den) =>
      assert(den == 2 * np * nn)
      assert(num >= 0 && num <= den, s"AUC $num/$den out of [0,1]")
      val a = num.toDouble / den
      assert(!a.isNaN && a >= 0.0 && a <= 1.0)
    }
  }

  test("welchTTest: exact moments replay per type; t and df match the fixed-order chain (C111)") {
    def md5w(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"welch:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = events.select(col("event_type"), col("event_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val got = Stats.welchTTest(events)
      .select(col("event_type"), col("n0"), col("s0"), col("vn0").cast("double"),
        col("n1"), col("s1"), col("vn1").cast("double"),
        col("t_stat"), col("welch_df"))
      .as[(String, Long, Long, Double, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    raw.groupBy(_._1).foreach { case (t, rs) =>
      val armed = rs.map(r => (md5w(r._2) % 2, r._3))
      def m(i: Long) = armed.filter(_._1 == i).map(_._2)
      val (a0, a1) = (m(0), m(1))
      if (a0.length > 1 && a1.length > 1) {
        val r = got(t)
        val (n0, n1) = (a0.length.toLong, a1.length.toLong)
        assert(r._2 == n0 && r._5 == n1, s"$t arm sizes")
        assert(r._3 == a0.sum && r._6 == a1.sum, s"$t arm sums")
        // variance numerators exact: n·Σv² − (Σv)² (BigInt replay)
        val vn0 = (BigInt(n0) * a0.map(v => BigInt(v) * v).sum - BigInt(a0.sum) * a0.sum)
        val vn1 = (BigInt(n1) * a1.map(v => BigInt(v) * v).sum - BigInt(a1.sum) * a1.sum)
        assert(r._4 == vn0.toDouble && r._7 == vn1.toDouble, s"$t var numerators")
        // the one float chain, replayed in the exact written order
        def se2(vn: BigInt, n: Long) = vn.toDouble / n.toDouble / (n - 1).toDouble / n.toDouble
        val (w0, w1) = (se2(vn0, n0), se2(vn1, n1))
        val num = a1.sum.toDouble / n1.toDouble - a0.sum.toDouble / n0.toDouble
        val tExp = math.rint(num / math.sqrt(w1 + w0) * 1e6) / 1e6
        val dfExp = math.rint((w1 + w0) * (w1 + w0) /
          (w1 * w1 / (n1 - 1).toDouble + w0 * w0 / (n0 - 1).toDouble) * 1e6) / 1e6
        assert(r._8 == tExp, s"$t t_stat ${r._8} vs $tExp")
        assert(r._9 == dfExp, s"$t df ${r._9} vs $dfExp")
        assert(r._9 >= math.min(n0, n1) - 1 - 1e-6 && r._9 <= (n0 + n1 - 2) + 1e-6,
          s"$t df ${r._9} outside Welch-Satterthwaite bounds")
      } else assert(!got.contains(t), s"$t with a degenerate arm must be excluded")
    }
    // degenerate surfaces: an arm with n <= 1 drops the row entirely;
    // both-arms-constant (zero variance) yields NULL t, not NaN/∞
    import spark.implicits._
    val tiny = Seq(("t", 1L, 5.0)).toDF("event_type", "event_id", "value")
    assert(Stats.welchTTest(tiny).count() == 0, "single-row type must be excluded")
    val ids = 1L to 40L
    val const = ids.map(i => ("t", i, 5.0)).toDF("event_type", "event_id", "value")
    val cr = Stats.welchTTest(const).select("t_stat").collect()
    assert(cr.length == 1 && cr.head.isNullAt(0), "zero-variance t must be NULL")
  }

  test("didLift: cells replay exactly from the md5 assignment; empty-cell types excluded (C125)") {
    def md5did(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"did:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val raw = events.select(col("event_type"), col("user_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"),
      expr("unix_micros(ts)").as("us"))
      .as[(String, Long, Long, Long)].collect()
    val us = raw.map(_._4)
    val mid = us.min + (us.max - us.min) / 2
    val got = Stats.didLift(events)
      .select("event_type", "n00", "s00", "n01", "s01", "n10", "s10",
        "n11", "s11", "did_cents")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    raw.groupBy(_._1).foreach { case (t, rs) =>
      def cell(a: Long, p: Long) = rs.filter(r =>
        md5did(r._2) == a && (if (r._4 < mid) 0L else 1L) == p)
      val cs = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)).map { case (a, p) =>
        val c = cell(a, p); (c.length.toLong, c.map(_._3).sum)
      }
      if (cs.forall(_._1 > 0)) {
        val r = got(t)
        assert(Seq(r._2, r._4, r._6, r._8) == cs.map(_._1), s"$t cell counts")
        assert(Seq(r._3, r._5, r._7, r._9) == cs.map(_._2), s"$t cell sums")
        val did = (cs(3)._2.toDouble / cs(3)._1 - cs(2)._2.toDouble / cs(2)._1) -
          (cs(1)._2.toDouble / cs(1)._1 - cs(0)._2.toDouble / cs(0)._1)
        assert(r._10 == math.rint(did * 1e6) / 1e6, s"$t did ${r._10} vs $did")
      } else assert(!got.contains(t), s"$t with an empty cell must be excluded")
    }
    // a type living only pre-midpoint has empty post cells -> excluded
    val t0 = new java.sql.Timestamp(1700000000000L)
    val t1 = new java.sql.Timestamp(1700000000000L + 86400000L)
    val crafted = Seq(
      ("a", 1L, 1.0, t0), ("a", 2L, 2.0, t0), ("a", 3L, 3.0, t1),
      ("a", 4L, 4.0, t1), ("a", 5L, 4.0, t1), ("a", 6L, 4.0, t1),
      ("b", 1L, 9.0, t0))
      .toDF("event_type", "user_id", "value", "ts")
    val names = Stats.didLift(crafted).select("event_type")
      .as[String].collect().toSet
    assert(!names.contains("b"), "pre-only type must drop via the cell guard")
  }

  test("hteDeciles: cells replay from the ranked per-user frame; single-arm deciles drop (C131)") {
    def md5did(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"did:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val raw = events.select(col("user_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"),
      expr("unix_micros(ts)").as("us"))
      .as[(Long, Long, Long)].collect()
    val us = raw.map(_._3)
    val mid = us.min + (us.max - us.min) / 2
    val per = raw.groupBy(_._1).map { case (u, rs) =>
      (u, md5did(u), rs.filter(_._3 < mid).map(_._2).sum,
        rs.filter(_._3 >= mid).map(_._2).sum)
    }.toSeq
    val n = per.length.toLong
    val ranked = per.sortBy(r => (-r._3, r._1)).zipWithIndex
    val cells = ranked.groupBy { case (_, i) => i.toLong * 10 / n }
      .view.mapValues { rs =>
        def arm(a: Long) = rs.map(_._1).filter(_._2 == a)
        (arm(0).length.toLong, arm(0).map(_._4).sum,
          arm(1).length.toLong, arm(1).map(_._4).sum)
      }.toMap
    val got = Stats.hteDeciles(events)
      .select("decile", "n0", "s0", "n1", "s1", "ate_cents")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    cells.foreach { case (d, (n0, s0, n1, s1)) =>
      if (n0 > 0 && n1 > 0) {
        val r = got(d)
        assert((r._2, r._3, r._4, r._5) == ((n0, s0, n1, s1)), s"decile $d cells")
        val ate = math.rint((s1.toDouble / n1 - s0.toDouble / n0) * 1e6) / 1e6
        assert(r._6 == ate, s"decile $d ate ${r._6} vs $ate")
      } else assert(!got.contains(d), s"single-arm decile $d must drop")
    }
    // fully separated arms -> every decile is single-arm -> empty output
    val byParity = (1L to 100L).groupBy(md5did)
    val t0b = new java.sql.Timestamp(1700000000000L)
    val sep = (byParity(0L).take(2).map(u => (u, 100.0, t0b)) ++
      byParity(1L).take(2).map(u => (u, 1.0, t0b))).toSeq
      .toDF("user_id", "value", "ts")
    assert(Stats.hteDeciles(sep).count() == 0)
  }

  test("markovAccuracy: held-out top-1 accuracy replays from the train argmax (C134)") {
    def md5mk(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mk:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val raw = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val trans = raw.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._4)).map(_._2)
      ordered.zip(ordered.tail).map { case (f, t2) => (md5mk(u), f, t2) }
    }
    val pred = trans.filter(_._1 == 0L).groupBy(r => (r._2, r._3))
      .view.mapValues(_.size.toLong).toSeq
      .groupBy(_._1._1).view.mapValues { cs =>
        cs.map { case ((_, to), c) => (c, to) }.max._2
      }.toMap
    val expected = trans.filter(_._1 == 1L)
      .flatMap { case (_, f, t2) => pred.get(f).map(p => (f, p, t2)) }
      .groupBy(r => (r._1, r._2))
      .view.mapValues { rs =>
        (rs.size.toLong, rs.count { case (_, p, t2) => p == t2 }.toLong)
      }.toMap
    val got = Stats.markovAccuracy(events)
      .select("from_t", "pred_t", "n_test", "n_correct", "accuracy_ppm")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { case (f, p, n, cOk, ppm) =>
      assert(expected((f, p)) == ((n, cOk)), s"$f -> $p cells")
      assert(ppm == cOk * 1000000L / n)
    }
  }

  test("fanoFactor: constant days read F = 0, bursty days flag overdispersion exactly (C137)") {
    val D = 86400L * 1000L
    def ev(rows: Seq[(String, Long, Int)]) = rows.zipWithIndex.flatMap {
      case ((t, day, c), i) => (0 until c).map(j =>
        (t, (i * 1000 + j).toLong, new java.sql.Timestamp(day * D), 1.0))
    }.toDF("event_type", "event_id", "ts", "value")
    val df = ev(Seq(("flat", 0L, 5), ("flat", 1L, 5), ("flat", 2L, 5),
      ("burst", 0L, 1), ("burst", 1L, 9)))
    val got = Stats.fanoFactor(df)
      .select("event_type", "n_days", "s", "vn", "fano", "overdispersed")
      .as[(String, Long, Long, java.math.BigDecimal, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val flat = got("flat")
    assert((flat._2, flat._3, flat._4.longValueExact, flat._5, flat._6) ==
      ((3L, 15L, 0L, 0.0, 0L)), s"flat $flat")
    val burst = got("burst")
    // vn = 2*(1+81) - 100 = 64; fano = 64 / (1*10) = 6.4
    assert((burst._2, burst._3, burst._4.longValueExact, burst._5, burst._6) ==
      ((2L, 10L, 64L, 6.4, 1L)), s"burst $burst")
    // corpus: moments replay from the daily counts; flag matches vn > (n-1)s
    val corpus = Stats.fanoFactor(events)
      .select("n_days", "s", "vn", "overdispersed")
      .as[(Long, Long, java.math.BigDecimal, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (n, s2, vn, f) =>
      val v = BigInt(vn.toBigInteger)
      assert(f == (if (v > BigInt(n - 1) * s2) 1L else 0L))
    }
  }

  test("runsTest: alternation and clumping both flag, one-sided lanes guard (C142)") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // ALT: 20 days strictly alternating 1.00 / 3.00 → R = 20 (too many)
    // CLUMP: 10 low days then 10 high → R = 2 (too few)
    // FLAT: every day identical → a = 0, den ≤ 0 guard, never flags
    val rows = (0 until 20).flatMap { i =>
      val day = d(f"2024-01-${i + 1}%02d")
      Seq(("ALT", if (i % 2 == 0) 1.0 else 3.0, day),
        ("CLUMP", if (i < 10) 1.0 else 3.0, day),
        ("FLAT", 2.0, day))
    }
    val got = Stats.runsTest(
      rows.toDF("o_orderpriority", "o_totalprice", "o_orderdate"))
      .select("priority", "n_days", "n_above", "n_below", "n_runs", "nonrandom")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("ALT") == (("ALT", 20L, 10L, 10L, 20L, 1L)), s"${got("ALT")}")
    assert(got("CLUMP") == (("CLUMP", 20L, 10L, 10L, 2L, 1L)), s"${got("CLUMP")}")
    assert(got("FLAT") == (("FLAT", 20L, 0L, 20L, 1L, 0L)), s"${got("FLAT")}")
    // corpus: runs tile [1, n]; halves tile n; flag replays the
    // integer cross-multiplied gate
    val corpus = Stats.runsTest(orders)
      .select("n_days", "n_above", "n_below", "n_runs", "nonrandom")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (n, a, b, r, f) =>
      assert(a + b == n && r >= 1 && r <= n, s"($n, $a, $b, $r)")
      val ab2 = BigInt(2) * a * b
      val num = BigInt(625) * (BigInt(n) * r - n - ab2).pow(2) * (n - 1)
      val den = BigInt(2401) * ab2 * (ab2 - n)
      assert(f == (if (ab2 > n && num > den) 1L else 0L), s"flag $f") }
  }

  test("kendallTau: perfect agreement reads +1, perfect reversal −1 (C143)") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    def mk(spec: Seq[(String, Double, Int)]) = {
      // one nation per row: `cnt` orders of `price` each
      val nation = spec.zipWithIndex.map { case ((n, _, _), i) => (i.toLong, n) }
        .toDF("n_nationkey", "n_name")
      val cust = spec.zipWithIndex.map { case (_, i) => (i.toLong * 10, i.toLong) }
        .toDF("c_custkey", "c_nationkey")
      val orders = spec.zipWithIndex.flatMap { case ((_, p, c), i) =>
        Seq.fill(c)((i.toLong * 10, p, d("2024-01-01"))) }
        .toDF("o_custkey", "o_totalprice", "o_orderdate")
      Stats.kendallTau(orders, cust, nation)
        .select("n0", "nc", "nd", "tx", "ty", "tau_b")
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
    }
    // concordant: more orders AND more revenue together
    val up = mk(Seq(("A", 1.0, 1), ("B", 2.0, 2), ("C", 3.0, 3)))
    assert(up == ((3L, 3L, 0L, 0L, 0L, 1.0)), s"up $up")
    // reversed: revenue up while order count down
    val down = mk(Seq(("A", 9.0, 1), ("B", 3.0, 2), ("C", 1.0, 3)))
    assert(down == ((3L, 0L, 3L, 0L, 0L, -1.0)), s"down $down")
    // corpus: counts tile n0 and tau lives in [−1, 1]
    val c = Stats.kendallTau(orders, customer,
      Tables.load(spark, sf, "nation"))
      .select("n0", "nc", "nd", "tx", "ty", "tau_b")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(c._1 == 300L && c._2 + c._3 <= c._1, s"corpus $c")
    assert(c._6 >= -1.0 && c._6 <= 1.0)
  }

  test("termBurstiness: clumped and spread terms separate at equal tf (L149)") {
    import graft.operators.TextAnalysis
    // 'spread' once in each of 40 docs; 'clump' 40 times in one doc
    // plus 19 single hits to clear the df floor (tf 59 over df 20)
    val docs2 = (0L until 40L).map { i =>
      val extra = if (i == 0) " " + Seq.fill(40)("clump").mkString(" ")
        else if (i < 20) " clump" else ""
      (i, "spread filler" + extra)
    }.toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(docs2)
      .select("term", "tf", "df", "max_in_doc", "burst_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("spread") == (("spread", 40L, 40L, 1L, 1000000L)))
    assert(got("clump") == (("clump", 59L, 20L, 40L, 2950000L)), s"${got("clump")}")
    // corpus: df ≤ tf, max_in_doc ≤ tf, burst ≥ 1e6 (every containing
    // doc holds ≥ 1 occurrence)
    val corpus = TextAnalysis.termBurstiness(
      Tables.load(spark, sf, "documents"))
      .select("tf", "df", "max_in_doc", "burst_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (tf, df, mx, b) =>
      assert(df <= tf && mx <= tf && b >= 1000000L, s"($tf, $df, $mx, $b)") }
  }

  test("sourceEntropy: uniform terms read ln k, constant terms read 0 (L148)") {
    import graft.operators.TextAnalysis
    // U: 4 equi-frequent terms → H = ln 4; K: a single term → H = 0
    val docs2 = (0L until 8L).map { i =>
      if (i < 4) (i, "alpha beta gamma delta", "U") else (i, "kkk kkk kkk kkk", "K")
    }.toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceEntropy(docs2)
      .select("source", "n_tokens", "vocab", "entropy_nats")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("U")._2 == 16L && got("U")._3 == 4L &&
      math.abs(got("U")._4 - math.log(4.0)) < 2e-6, s"U ${got("U")}")
    assert(got("K")._2 == 16L && got("K")._3 == 1L && got("K")._4 == 0.0,
      s"K ${got("K")}")
    // corpus: 0 ≤ H ≤ ln(vocab) for every source
    val corpus = TextAnalysis.sourceEntropy(
      Tables.load(spark, sf, "documents"))
      .select("vocab", "entropy_nats").as[(Long, Double)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (v, h) =>
      assert(h >= 0.0 && h <= math.log(v.toDouble) + 1e-6, s"($v, $h)") }
  }

  test("kruskalWallis: hand-computed H on planted groups; all-tied NULLs (C147)") {
    // A = {1.00, 2.00}, B = {3.00, 4.00}: no ties, doubled rank sums
    // 6 / 14, H = 12/(4·5)·(3²/2 + 7²/2) − 3·5 = 2.4 exactly (the
    // 1e-3 fixed-point quotients are exact here: 4500 and 24500)
    val two = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("event_type", "value")
    val r = Stats.kruskalWallis(two)
      .select("event_type", "n_g", "r2sum", "n", "tie3", "h")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("A") == (("A", 2L, 6L, 4L, 0L, 2.4)), s"A ${r("A")}")
    assert(r("B") == (("B", 2L, 14L, 4L, 0L, 2.4)), s"B ${r("B")}")
    // all-tied corpus: tie3 = N³ − N, the correction denominator
    // vanishes, H must be NULL (not NaN)
    val tied = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0))
      .toDF("event_type", "value")
    val d = Stats.kruskalWallis(tied).select("tie3", "h")
      .as[(Long, Option[Double])].head()
    assert(d._1 == 24L && d._2.isEmpty, s"all-tied $d")
    // corpus invariants: doubled midrank sums telescope to N(N+1),
    // group sizes partition N, H finite and (up to the declared 1e-3
    // floor) non-negative
    val corpus = Stats.kruskalWallis(events)
      .select("n_g", "r2sum", "n", "h")
      .as[(Long, Long, Long, Double)].collect()
    val n = corpus.head._3
    assert(corpus.map(_._1).sum == n)
    assert(corpus.map(_._2).sum == n * (n + 1), "midrank sums must telescope")
    corpus.foreach { case (_, _, _, h) =>
      assert(!h.isNaN && h >= -1e-6, s"H $h") }
  }

  test("mcnemar: planted discordant cells replay; purchase-free corpus NULLs (C148)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val rows = Seq(
      (4L, "view", ts("00:00:00")), (4L, "view", ts("01:00:00")), // anchors + n00
      (1L, "purchase", ts("00:10:00")),                           // 1 -> 0
      (5L, "purchase", ts("00:05:00")),                           // 1 -> 0
      (6L, "purchase", ts("00:01:00")), (6L, "view", ts("00:50:00")), // 1 -> 0
      (2L, "purchase", ts("00:45:00")),                           // 0 -> 1
      (7L, "purchase", ts("00:30:00")),          // exactly at mid -> 2nd half
      (3L, "purchase", ts("00:10:30")), (3L, "purchase", ts("00:59:00"))) // 1 -> 1
      .toDF("user_id", "event_type", "ts")
    val got = Stats.mcnemar(rows)
      .select("n00", "n01", "n10", "n11", "chi2", "chi2_cc")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // b = n01 = {u2, u7} = 2 (mid-boundary event lands in the second
    // half), c = n10 = {u1, u5, u6} = 3: chi2 = 1/5, corrected 0
    assert(got == ((1L, 2L, 3L, 1L, 0.2, 0.0)), s"cells $got")
    // purchase-free corpus: both discordant cells empty -> NULL, not NaN
    val none = Seq((1L, "view", ts("00:00:00")), (2L, "view", ts("01:00:00")))
      .toDF("user_id", "event_type", "ts")
    val d = Stats.mcnemar(none)
      .select(col("n00"), col("chi2").isNull, col("chi2_cc").isNull)
      .as[(Long, Boolean, Boolean)].head()
    assert(d == ((2L, true, true)), s"degenerate $d")
    // corpus: cells partition the distinct-user base; chi2 sane
    val c = Stats.mcnemar(events)
      .select("n00", "n01", "n10", "n11", "chi2")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    val users = events.select("user_id").distinct().count()
    assert(c._1 + c._2 + c._3 + c._4 == users, s"cells $c vs $users users")
    assert(c._5.isEmpty == (c._2 + c._3 == 0) && c._5.forall(_ >= 0.0),
      s"chi2 ${c._5}")
  }

  test("chiSquared: perfect association reads V = 1, independence 0; 1-column NULLs V (C149)") {
    def ord(rows: Seq[(String, String)]) =
      rows.toDF("o_orderpriority", "o_orderstatus")
    // diagonal 2x2: chi2 = n = 20, V = 1 exactly
    val assoc = ord(Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y")))
    val a = Stats.chiSquared(assoc)
      .select("n", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Double, Double)].head()
    assert(a == ((20L, 1L, 20.0, 1.0)), s"assoc $a")
    // uniform 2x2: every cell matches expectation, chi2 = 0
    val indep = ord(Seq.fill(5)(("A", "X")) ++ Seq.fill(5)(("A", "Y")) ++
      Seq.fill(5)(("B", "X")) ++ Seq.fill(5)(("B", "Y")))
    val i = Stats.chiSquared(indep).select("chi2", "cramers_v")
      .as[(Double, Double)].head()
    assert(i == ((0.0, 0.0)), s"indep $i")
    // single-column table: dof = 0, V NULL (never NaN), chi2 still 0
    val one = ord(Seq.fill(7)(("A", "X")) ++ Seq.fill(3)(("B", "X")))
    val d = Stats.chiSquared(one)
      .select(col("dof"), col("chi2"), col("cramers_v").isNull)
      .as[(Long, Double, Boolean)].head()
    assert(d == ((0L, 0.0, true)), s"degenerate $d")
    // corpus: chi2 >= 0, V in [0, 1], dof = (R-1)(C-1)
    val c = Stats.chiSquared(orders)
      .select("n", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Double, Double)].head()
    assert(c._1 == orders.count() && c._3 >= 0.0 &&
      c._4 >= 0.0 && c._4 <= 1.0, s"corpus $c")
  }

  test("decDiv: exact floor division stays exact beyond 2^63 (the Spark `div` wraparound)") {
    // 10^25 // 3: quotient has 25 digits — Spark's BIGINT `div` would
    // wrap; decDiv must match BigInt exactly
    val big = BigInt(10).pow(25)
    val want = (big / 3).toString
    val got = spark.range(1).select(graft.functions.Portable.decDiv(
      expr("cast('10000000000000000000000000' as decimal(38,0))"),
      expr("cast(3 as decimal(38,0))")).cast("string")).as[String].head()
    assert(got == want, s"$got != $want")
    // and the wraparound case that broke q_changepoint: a quotient
    // just past Long.MaxValue
    val g2 = spark.range(1).select(graft.functions.Portable.decDiv(
      expr("cast('9363917156877834518000' as decimal(38,0))"),
      expr("cast(1000 as decimal(38,0))")).cast("string")).as[String].head()
    assert(g2 == "9363917156877834518", s"past-2^63 quotient $g2")
  }

  test("cramerVonMises: exact BigInt U4 replays per type; T pinned from the exact surface (C151)") {
    def md5cvm(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cvm:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = events.select(col("event_type"), col("event_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val got = Stats.cramerVonMises(events)
      .select(col("event_type"), col("n0"), col("n1"),
        col("u4_q").cast("string"), col("u4_r").cast("string"), col("t"))
      .as[(String, Long, Long, String, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    raw.groupBy(_._1).foreach { case (ty, rs) =>
      val armed = rs.map(r => (r._3, md5cvm(r._2) % 2))
      val all = armed.map(_._1).sorted
      def r2(v: Long) = 2L * all.count(_ < v) + all.count(_ == v) + 1
      def sq(arm: Long): BigInt = armed.filter(_._2 == arm).map(_._1).sorted
        .zipWithIndex.map { case (v, ix) =>
          val d = BigInt(r2(v) - 2L * (ix + 1)); d * d
        }.sum
      val n1 = armed.count(_._2 == 1).toLong
      val n0 = all.length - n1
      val u4 = BigInt(n0) * sq(0) + BigInt(n1) * sq(1)
      val g = got(ty)
      assert(g._2 == n0 && g._3 == n1, s"$ty arms ${g._2}/${g._3}")
      // u4 ≈ 4N⁴ overflows BIGINT past N ≈ 70k/type (thrown at the
      // r12 sf1.0 smoke), so the release is the exact (quotient,
      // remainder) pair mod n² — reconstruct and compare the BigInt
      val n = all.length.toLong
      val rebuilt = BigInt(g._4) * (BigInt(n) * n) + BigInt(g._5)
      assert(rebuilt == u4, s"$ty: u4 $rebuilt != $u4")
      assert(BigInt(g._5) >= 0 && BigInt(g._5) < BigInt(n) * n,
        s"$ty: remainder ${g._5} out of [0, n²)")
      // T replayed with the operator's fixed-order float chain
      val t = u4.toDouble / (BigInt(4) * n * n0 * n1).toDouble -
        (BigInt(4) * n0 * n1 - 1).toDouble / (6.0 * n)
      assert(math.abs(g._6 - t) < 1e-6 && !g._6.isNaN, s"$ty t ${g._6} vs $t")
      // a null hash split of one distribution: T stays small
      assert(g._6 < 2.0, s"$ty null-split T ${g._6}")
    }
  }

  test("condEntropy: deterministic chain reads IG = ln 2, uniform chain IG = 0 (C152)") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    def ev(rows: Seq[(Long, Int, String)]) =
      rows.zipWithIndex.map { case ((u, m, t), i) => (u, ts(m), i.toLong, t) }
        .toDF("user_id", "ts", "event_id", "event_type")
    // strict alternation: knowing the current state pins the next one
    // -> h_cond = 0, info_gain = H(next) = ln 2 = 0.693147
    val alt = ev(Seq((1L, 1, "A"), (1L, 2, "B"), (1L, 3, "A"), (1L, 4, "B"),
      (1L, 5, "A")))
    val g1 = Stats.condEntropy(alt)
      .select("from_type", "h_given", "h_next", "h_cond", "info_gain")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(g1.length == 2)
    g1.foreach { case (f, hg, hn, hc, ig) =>
      assert(hg == 0.0 && hn == 0.693147 && hc == 0.0 && ig == 0.693147,
        s"$f ($hg, $hn, $hc, $ig)") }
    // one of each transition: the current state tells you nothing
    val unif = ev(Seq((1L, 1, "A"), (1L, 2, "A"), (1L, 3, "B"), (1L, 4, "B"),
      (2L, 1, "B"), (2L, 2, "A")))
    val g2 = Stats.condEntropy(unif)
      .select("h_next", "h_cond", "info_gain")
      .as[(Double, Double, Double)].head()
    assert(g2 == ((0.693147, 0.693147, 0.0)), s"uniform $g2")
    // corpus: empirical mutual information is non-negative (up to the
    // declared 1e-9 term quantization), conditioning never adds
    // surprise, and the from-marginals partition the transition count
    val c = Stats.condEntropy(events)
      .select("n_from", "h_given", "h_next", "h_cond", "info_gain")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(c.nonEmpty)
    val nTrans = events.count() - events.select("user_id").distinct().count()
    assert(c.map(_._1).sum == nTrans, s"${c.map(_._1).sum} vs $nTrans")
    c.foreach { case (_, hg, hn, hc, ig) =>
      assert(hg >= 0.0 && hc <= hn + 1e-6 && ig >= -1e-6 &&
        math.abs((hn - hc) - ig) < 2e-6, s"($hg, $hn, $hc, $ig)") }
  }

  test("wasserstein1: exact BigInt W1 replays per type; single-point support is absent (C158)") {
    def md5emd(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"emd:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = events.select(col("event_type"), col("event_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val got = Stats.wasserstein1(events)
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("w1_num").cast("string"), col("w1_cents"))
      .as[(String, Long, Long, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    raw.groupBy(_._1).foreach { case (ty, rs) =>
      val armed = rs.map(r => (r._3, md5emd(r._2) % 2))
      val support = armed.map(_._1).distinct.sorted
      val na = armed.count(_._2 == 0).toLong
      val nb = armed.length - na
      var (ca, cb) = (BigInt(0), BigInt(0))
      var num = BigInt(0)
      support.zip(support.tail).foreach { case (v, nx) =>
        ca += armed.count(r => r._1 == v && r._2 == 0)
        cb += armed.count(r => r._1 == v && r._2 == 1)
        num += (ca * nb - cb * na).abs * (nx - v)
      }
      val g = got(ty)
      assert(g._2 == na && g._3 == nb, s"$ty arms")
      assert(BigInt(g._4) == num, s"$ty num ${g._4} != $num")
      assert(math.abs(g._5 - num.toDouble / (BigInt(na) * nb).toDouble) < 1e-5,
        s"$ty w1 ${g._5}")
    }
    // degenerate: one support point -> no segments -> type absent
    val one = Seq(("t", 1L, 5.0), ("t", 2L, 5.0), ("t", 3L, 5.0))
      .toDF("event_type", "event_id", "value")
    assert(Stats.wasserstein1(one).count() == 0L)
  }

  test("rakeIpf: a BigInt replay of the full 3-round fit matches every cell (C159)") {
    def replay(cells: Seq[(String, String, Long)]):
        (Map[(String, String), BigInt], BigInt, BigInt) = {
      val n = BigInt(cells.map(_._3).sum)
      val r = BigInt(cells.map(_._1).distinct.length)
      val cc = BigInt(cells.map(_._2).distinct.length)
      val tr = n * 1000000 / r; val tc = n * 1000000 / cc
      var w = cells.map { case (p, s, c) => (p, s) -> BigInt(c) * 1000000 }.toMap
      for (_ <- 1 to 3) {
        val rsum = w.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
        w = w.map { case (k, v) => k -> v * tr / rsum(k._1) }
        val csum = w.groupBy(_._1._2).map { case (s, m) => s -> m.values.sum }
        w = w.map { case (k, v) => k -> v * tc / csum(k._2) }
      }
      (w, tr, tc)
    }
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val cells = df.groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("c"))
        .as[(String, String, Long)].collect().toSeq
      val (want, tr, tc) = replay(cells)
      val got = Stats.rakeIpf(df)
        .select("pr", "st", "n_obs", "w_q6", "max_row_dev_ppm",
          "max_col_dev_ppm")
        .as[(String, String, Long, Long, Long, Long)].collect()
      assert(got.length == cells.length)
      got.foreach { g =>
        assert(BigInt(g._4) == want((g._1, g._2)), s"cell $g != ${want((g._1, g._2))}") }
      // the reported deviations replay too
      val rs = want.groupBy(_._1._1).map(_._2.values.sum)
      val cs = want.groupBy(_._1._2).map(_._2.values.sum)
      val mr = rs.map(v => (v - tr).abs * 1000000 / tr).max
      val mc = cs.map(v => (v - tc).abs * 1000000 / tc).max
      assert(BigInt(got.head._5) == mr && BigInt(got.head._6) == mc,
        s"devs (${got.head._5}, ${got.head._6}) vs ($mr, $mc)")
    }
    // planted unbalanced 2x2 with an absent cell (zero-cell convention)
    val planted = (Seq.fill(2)(("A", "X")) ++ Seq(("B", "X"), ("B", "Y")))
      .toDF("o_orderpriority", "o_orderstatus")
    check(planted)
    check(orders)
  }

  test("mde: sizing chain replays from exact cent moments; single-row lane NULLs (C160)") {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // values {1.00, 1.00, 3.00, 3.00}: var = 160000/12 cents²
    val rows = Seq(("t", 1L, 1.0), ("t", 2L, 1.0), ("t", 3L, 3.0),
      ("t", 4L, 3.0), ("solo", 5L, 7.0))
      .toDF("event_type", "event_id", "value")
    val got = Stats.mde(rows)
      .select(col("event_type"), col("n"), col("sum_cents"),
        col("mean_cents"), col("sd_cents"), col("mde_abs_cents"),
        col("mde_rel_pct"))
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().map(r => r._1 -> r).toMap
    val t = got("t")
    assert(t._2 == 4L && t._3 == 800L && t._4 == 200.0, s"t $t")
    val v = (4.0 * 200000L - 800L.toDouble * 800L) / 12.0
    val mdeAbs = 2.801585218 * math.sqrt(v * 2.0 / (4L.toDouble / 2.0))
    assert(t._5.contains(r6(math.sqrt(v))) && t._6.contains(r6(mdeAbs)) &&
      t._7.contains(r6(mdeAbs / 200.0 * 100.0)), s"t chain $t")
    val solo = got("solo")
    assert(solo._2 == 1L && solo._5.isEmpty && solo._6.isEmpty, s"solo $solo")
    // corpus: MDE shrinks as n grows — spot the monotone-in-1/sqrt(n)
    // structure by checking every lane is finite and positive
    val c = Stats.mde(events)
      .select("n", "sd_cents", "mde_abs_cents")
      .as[(Long, Double, Double)].collect()
    assert(c.nonEmpty)
    c.foreach { case (n, sd, m) =>
      assert(n > 1 && sd >= 0.0 && m >= 0.0 && !m.isNaN, s"($n, $sd, $m)") }
  }

  test("effectSizes: Cliff's delta replays from the exact U surface; d from exact moments (C165)") {
    def md5mw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mw:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = events.select(col("event_type"), col("event_id"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(String, Long, Long)].collect()
    val got = Stats.effectSizes(events)
      .select("event_type", "n0", "n1", "delta_num", "cliffs_delta",
        "cohens_d")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    raw.groupBy(_._1).foreach { case (ty, rs) =>
      val armed = rs.map(r => (r._3, md5mw(r._2) % 2))
      val all = armed.map(_._1).sorted
      def rr2(v: Long) = 2L * all.count(_ < v) + all.count(_ == v) + 1
      val a1 = armed.filter(_._2 == 1).map(_._1)
      val a0 = armed.filter(_._2 == 0).map(_._1)
      val (n1, n0) = (a1.length.toLong, a0.length.toLong)
      val u2 = a1.map(rr2).sum - n1 * (n1 + 1)
      val dn = u2 - n0 * n1
      val g = got(ty)
      assert(g._2 == n0 && g._3 == n1 && g._4 == dn, s"$ty $g vs ($n0,$n1,$dn)")
      assert(g._5 == r6(dn.toDouble / (n0 * n1)), s"$ty delta ${g._5}")
      // Cohen's d via the operator's exact-moment chain
      val v1 = (n1.toDouble * a1.map(v => BigInt(v) * v).sum.toDouble -
        a1.sum.toDouble * a1.sum) / n1
      val v0 = (n0.toDouble * a0.map(v => BigInt(v) * v).sum.toDouble -
        a0.sum.toDouble * a0.sum) / n0
      val sp = math.sqrt((v1 + v0) / (n0 + n1 - 2).toDouble)
      val d = (a1.sum.toDouble / n1 - a0.sum.toDouble / n0) / sp
      assert(math.abs(g._6 - d) < 1e-5, s"$ty d ${g._6} vs $d")
      // a null hash split: both effect sizes stay small
      assert(math.abs(g._5) < 0.5 && math.abs(g._6) < 1.0, s"$ty null split $g")
    }
  }

  test("hillTail: a planted 2x jump reads alpha = 1/ln 2 exactly; ties are invariant (C166b)") {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // top-100 all 2.00, the (k+1)-th 1.00 -> every term ln 2
    val rows = (Seq.fill(100)(2.00) ++ Seq(1.00, 0.50, 0.25))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
    val got = Stats.hillTail(rows)
      .select("k", "threshold_cents", "sum_log_ratio", "hill_alpha")
      .as[(Long, Long, Double, Double)].head()
    val t9 = BigDecimal(math.log(2.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val s = (t9 * 100).toDouble
    assert(got == ((100L, 100L, r6(s), r6(100.0 / s))), s"$got")
    // corpus: k = 100, threshold positive, alpha positive (heavy or
    // light, the ratio sum over a strictly-dominating top-k is > 0)
    val c = Stats.hillTail(orders)
      .select("k", "threshold_cents", "hill_alpha")
      .as[(Long, Long, Option[Double])].head()
    assert(c._1 == 100L && c._2 > 0L && c._3.forall(_ > 0.0), s"$c")
    // r11: top-(k+1) selection is the distributed TakeOrderedAndProject
    // plan (per-partition top-k, P·(k+1)-row merge) — the only window
    // left orders the ≤101 selected rows, bounded by the declared k
    val plan = Stats.hillTail(orders).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("seqTest: cumulative z replays per look; boundary shrinks to 2.04 (C169)") {
    def md5mw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mw:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = events.select(col("event_id"), col("ts"),
      (graft.functions.Portable.dec(col("value")) * 100).cast("long").as("v"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .sortBy(r => (r._2.getTime, r._1))
    val got = Stats.seqTest(events)
      .select("look", "n_seen", "z", "obf_bound", "crossed")
      .as[(Long, Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 5L))
    assert(got.last._2 == raw.length, s"final look must see all rows")
    assert(got.sliding(2).forall(w => w(0)._2 < w(1)._2), "n_seen monotone")
    assert(got.sliding(2).forall(w => w(0)._4 > w(1)._4), "boundary shrinks")
    assert(math.abs(got.last._4 - 2.04) < 1e-9, s"final bound ${got.last._4}")
    // z replay at each look from exact cumulative moments (ntile
    // sizes: the first n % 5 looks carry the extra row)
    val n = raw.length; val base = n / 5; val extra = n % 5
    var idx = 0
    (1 to 5).foreach { k =>
      val size = base + (if (k <= extra) 1 else 0)
      idx += size
      val seen = raw.take(idx)
      val a1 = seen.filter(r => md5mw(r._1) % 2 == 1).map(_._3)
      val a0 = seen.filter(r => md5mw(r._1) % 2 == 0).map(_._3)
      def vr(xs: Seq[Long]) = {
        val nn = xs.length.toLong
        (BigInt(nn) * xs.map(x => BigInt(x) * x).sum -
          BigInt(xs.sum) * xs.sum).toDouble / (BigInt(nn) * nn * (nn - 1)).toDouble
      }
      val z = (a1.sum.toDouble / a1.length - a0.sum.toDouble / a0.length) /
        math.sqrt(vr(a1) + vr(a0))
      val g = got(k - 1)
      assert(g._2 == idx, s"look $k n ${g._2} vs $idx")
      assert(math.abs(g._3 - z) < 1e-5, s"look $k z ${g._3} vs $z")
      assert((g._5 == 1L) == (math.abs(g._3) > g._4), s"look $k flag $g")
    }
  }
}
