package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational, Similarity}

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

  test("digest-direct expressions COMPILE under CODEGEN_ONLY (no silent interpreter fallback)") {
    // r12 found wave 8's Md5Long60 codegen never compiled: the
    // companion's eval(byte[]) gets no static forwarder (the case
    // class already has Expression.eval), Janino resolved the call to
    // eval(InternalRow), and every projection fell back to interpreted
    // mode with only a WARN. CODEGEN_ONLY turns that fallback into a
    // hard failure, so this pins the fix (MODULE$ references).
    graft.functions.VectorFunctions.register(spark)
    val th = graft.operators.Stats.BootThresholds.mkString("array(", "L,", "L)")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pc_score_cg", exprs => graft.functions.PcScore(exprs.head,
        Array(0.5, -0.5), Array(1.0, 2.0), "graft_pc_score_cg"), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_km_dist_cg", exprs => graft.functions.KmDist(exprs.head,
        Array(Array(0L, 1L), Array(2L, 3L)), "graft_km_dist_cg"), "built-in")
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val r = Seq("a", "b").toDF("s").selectExpr(
        "graft_md5long60(s) AS h", s"graft_boot_w(s, $th) AS w",
        "graft_pc_score_cg(array(1.0D, 2.0D)) AS pc",
        "graft_bpe('theother') AS bpe",
        "graft_km_dist_cg(array(4L, 5L)) AS km").collect()
      assert(r.length == 2 && !r(0).isNullAt(0) && r(0).getSeq[Long](1).length == 4
        && !r(0).isNullAt(2) && r(0).getSeq[String](3).nonEmpty
        && r(0).getSeq[Long](4).length == 2)
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("BpeTable int-symbol fast path equals the generic string loop on any word/table") {
    // r13: the encode hot loop runs over interned int symbol ids when
    // the word is pure [a-z] (the only stream the queries feed it);
    // this pins fast == generic on adversarial words (non-a-z chars →
    // fallback), random learned tables (including rules with
    // unreachable sides and DUPLICATE pairs — Map semantics keep the
    // last rank), and the default table
    import graft.functions.{Bpe, BpeTable}
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(4242)
    def check(merges: IndexedSeq[(String, String)], words: Seq[String]): Unit = {
      val table = new BpeTable(merges)
      val rankOf = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
      words.foreach { w =>
        val fast = (0 until table.encode(UTF8String.fromString(w)).numElements())
          .map(i => table.encode(UTF8String.fromString(w)).getUTF8String(i).toString)
        val slow = Bpe.encodeWith(w, merges, rankOf).toSeq
        assert(fast == slow, s"word '$w' table $merges: $fast != $slow")
      }
    }
    val azWords = (1 to 300).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    val weird = Seq("", "a", "Ab", "über", "x-y", "aaaaaaa", "ththe", "thethe",
      "zzz", "中文ab")
    // default table
    check(Bpe.MergesIdx, azWords ++ weird)
    // random tables over a tiny alphabet (dense rule hits), with
    // chained outputs, a duplicate pair, and an unreachable side
    (1 to 20).foreach { _ =>
      val base = (1 to (2 + rnd.nextInt(8))).map(_ =>
        (('a' + rnd.nextInt(4)).toChar.toString, ('a' + rnd.nextInt(4)).toChar.toString))
      val chained = base.flatMap { case (a, b) =>
        Seq((a, b), (a + b, ('a' + rnd.nextInt(4)).toChar.toString)) }
      val withDup = chained ++ chained.headOption.toSeq // duplicate pair: last rank wins
      val withUnreachable = withDup :+ (("qq", "zz")) // never a reachable token
      check(withUnreachable.toIndexedSeq, azWords.take(120) ++ weird)
    }
  }

  test("bpeTrain driver replay equals the distributed recurrence") {
    // r13: the greedy merge training loop runs on the driver over the
    // capped type table (bounded model state by contract); pin
    // row-for-row equality against the retained distributed loop on a
    // corpus with pair-count ties, repeated words, and 1-char words
    val docs = Seq(
      (1L, "the then there that an and band banana bananas"),
      (2L, "in inn inning thin thing sing singing a a a i"),
      (3L, "ababab abab ab a b cabbage cab cab cab"),
      (4L, "zzz zz z xyzzy xy xy yz yz yz"),
      (5L, "the the the and and in in re re er er")
    ).toDF("doc_id", "text")
    val fast = graft.operators.TextAnalysis.bpeTrain(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val slow = graft.operators.TextAnalysis.bpeTrainDistributed(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(fast == slow, s"driver replay diverged:\n$fast\n$slow")
    // and with a tiny cap, so the cap boundary is exercised
    val fastCap = graft.operators.TextAnalysis.bpeTrain(docs, 8, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val slowCap = graft.operators.TextAnalysis.bpeTrainDistributed(docs, 8, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(fastCap == slowCap, s"capped replay diverged:\n$fastCap\n$slowCap")
  }

  test("connectedComponents local union-find equals the distributed waves on any graph") {
    // r13: below the edge budget the CC fixpoint runs as one driver
    // union-find; pin row-for-row equality against the distributed
    // label-propagation waves on adversarial graphs — chains (deep
    // diameter), cliques, stars, isolated docs, docs absent from the
    // edge list, self-loop-free random graphs, and the empty graph
    val rnd = new scala.util.Random(1319)
    def check(pairs: Seq[(Long, Long)], ids: Seq[Long], tag: String): Unit = {
      val p = pairs.toDF("x", "y")
      val d = ids.toDF("doc_id")
      val local = graft.operators.Dedup
        .connectedComponentsWithRounds(p, d, localEdgeBudget = Long.MaxValue)
      val dist = graft.operators.Dedup
        .connectedComponentsWithRounds(p, d, localEdgeBudget = 0L)
      assert(local._2 == 0, s"$tag: local path not taken")
      assert(dist._2 > 0 || pairs.isEmpty, s"$tag: distributed path not taken")
      val a = local._1.orderBy("doc_id").collect().toSeq
      val b = dist._1.orderBy("doc_id").collect().toSeq
      assert(a == b, s"$tag:\n$a\nvs\n$b")
    }
    check(Seq.empty, Seq(1L, 2L, 3L), "empty graph")
    check((1L until 60L).map(i => (i, i + 1)), (1L to 70L), "chain-60")
    check((2L to 20L).map(i => (1L, i)), (1L to 25L), "star")
    check(for (a <- 1L to 8L; b <- (a + 1) to 8L) yield (a, b), (1L to 10L), "clique")
    (1 to 5).foreach { t =>
      val n = 30 + rnd.nextInt(60)
      val pairs = (1 to n).map(_ =>
        (rnd.nextInt(40).toLong + 1, rnd.nextInt(40).toLong + 1))
        .filter { case (a, b) => a != b }
      check(pairs, (1L to 45L), s"random-$t")
    }
  }

  test("graph recurrences: local driver replay equals the distributed waves (PR/kCore/LPA/HITS/TextRank-style)") {
    // r13: the size-adaptive local path extends from CC to the other
    // integer fixed-point graph recurrences; each must replay its
    // distributed loop operation-for-operation. Random graphs with
    // parallel-structure stress: hubs, chains, cliques, multi-edges
    // (pre-aggregated where the operator demands distinct edges).
    val rnd = new scala.util.Random(2718)
    def randPairs(n: Int, vmax: Int): Seq[(Long, Long)] =
      (1 to n).map(_ => (rnd.nextInt(vmax).toLong + 1, rnd.nextInt(vmax).toLong + 1))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
    (1 to 3).foreach { t =>
      val pairs = randPairs(60 + rnd.nextInt(100), 50)
      val p = pairs.toDF("x", "y")
      // pageRank
      val prL = graft.operators.Dedup.pageRankEdges(p, localEdgeBudget = Long.MaxValue)
        .orderBy("doc_id").collect().toSeq
      val prD = graft.operators.Dedup.pageRankEdges(p, localEdgeBudget = 0L)
        .orderBy("doc_id").collect().toSeq
      assert(prL == prD, s"pageRank diverged (trial $t):\n$prL\nvs\n$prD")
      // kCore (rounds default; also a deep-peel chain below)
      val kcL = graft.operators.Dedup.kCoreEdges(p, localEdgeBudget = Long.MaxValue)
        .orderBy("v").collect().toSeq
      val kcD = graft.operators.Dedup.kCoreEdges(p, localEdgeBudget = 0L)
        .orderBy("v").collect().toSeq
      assert(kcL == kcD, s"kCore diverged (trial $t)")
      // LPA
      val lpL = graft.operators.Dedup.labelPropagationEdges(p, localEdgeBudget = Long.MaxValue)
        .orderBy("v").collect().toSeq
      val lpD = graft.operators.Dedup.labelPropagationEdges(p, localEdgeBudget = 0L)
        .orderBy("v").collect().toSeq
      assert(lpL == lpD, s"LPA diverged (trial $t)")
      // HITS over a bipartite (c, s) frame
      val bip = (1 to 120).map(_ =>
        (rnd.nextInt(20).toLong + 1, rnd.nextInt(8).toLong + 100)).distinct.toDF("c", "s")
      val hL = graft.operators.Relational.hitsEdges(bip, localEdgeBudget = Long.MaxValue)
        .orderBy("node_type", "node_id").collect().toSeq
      val hD = graft.operators.Relational.hitsEdges(bip, localEdgeBudget = 0L)
        .orderBy("node_type", "node_id").collect().toSeq
      assert(hL == hD, s"HITS diverged (trial $t)")
    }
    // chain-40: kCore peels from both ends — exercises multiple waves
    // and the early exit in both paths
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("x", "y")
    val a = graft.operators.Dedup.kCoreEdges(chain, localEdgeBudget = Long.MaxValue)
      .orderBy("v").collect().toSeq
    val b = graft.operators.Dedup.kCoreEdges(chain, localEdgeBudget = 0L)
      .orderBy("v").collect().toSeq
    assert(a == b, "kCore chain diverged")
  }

  test("BootWeights digest-direct equals the md5-hex + conv + threshold chain") {
    // the r12 bootstrap fast path reads the four 28-bit draws (and their
    // Poisson weights) straight off the digest; pin bit-equality against
    // the defining chain per slice on adversarial + random seeds
    graft.functions.VectorFunctions.register(spark)
    val th = graft.operators.Stats.BootThresholds
    val arr = th.mkString("array(", "L,", "L)")
    val rnd = new scala.util.Random(553)
    val seeds = Seq("", "boot0:1", "boot12:999983", "ü 中文", "x" * 2000) ++
      (1 to 400).map(_ => s"boot${rnd.nextInt(13)}:${rnd.nextLong()}")
    val df = seeds.toDF("s")
      .select(col("s"), explode(array((0 to 3).map(lit): _*)).as("sl"))
    val chainW = graft.operators.Stats.bootWeight(
      expr("cast(conv(substring(md5(s), sl * 7 + 1, 7), 16, 10) as long)"))
    val bad = df.select(col("s"), col("sl"),
        expr(s"element_at(graft_boot_w(s, $arr), sl + 1)").as("fast"),
        chainW.as("chain"))
      .where(col("fast") =!= col("chain") || col("fast").isNull)
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  test("GramAggregator equals the explode + decimal-sum Gram grid on random vectors") {
    // q_pca's one-pass grid: n, Σ v6, and Σ v6ᵢ·v6ⱼ must equal the
    // generator + DECIMAL(38,0)-sum chain it replaced, including the
    // 126-bit carry cells (forced here by large-magnitude elements)
    // magnitudes up to ±1000 force 126-bit carries (micros ~1e9,
    // products ~1e18, crossing 2^62 within a few rows) while staying
    // inside the documented |v6| < 2^31 product-exactness bound;
    // RAGGED lengths (3..8) pin the dim-adaptive resize path
    val dim = 8
    val rnd = new scala.util.Random(41)
    val vecs = (1 to 300).map { i =>
      val d = if (i % 7 == 0) 3 + rnd.nextInt(dim - 3) else dim
      Array.fill(d)(if (rnd.nextInt(10) == 0) (rnd.nextDouble() * 2 - 1) * 1000
        else rnd.nextGaussian())
    }
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("embedding")
    val buf = df.select(col("embedding").cast("array<double>"))
      .as[Array[Double]]
      .select((new graft.functions.GramAggregator).toColumn)
      .head()
    val v6arr = df.select(transform(col("embedding"),
      v => (round(v.cast("double"), 6).cast("decimal(18,6)") * 1000000)
        .cast("long")).as("v6"))
    val s = v6arr.select(posexplode(col("v6")).as(Seq("d", "e")))
      .groupBy(col("d")).agg(sum(col("e")).as("s")).orderBy(col("d"))
      .as[(Int, Long)].collect()
    val g = v6arr.select(posexplode(col("v6")).as(Seq("i", "vi")), col("v6"))
      .select(col("i"), col("vi"), posexplode(col("v6")).as(Seq("j", "vj")))
      .where(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("vi").cast("decimal(38,0)") * col("vj")).as("g"))
      .orderBy(col("i"), col("j"))
      .as[(Int, Int, java.math.BigDecimal)].collect()
    assert(buf(0) == vecs.size.toLong)
    assert(buf(1) == dim.toLong)
    s.foreach { case (d, v) => assert(buf(2 + d) == v, s"s($d)") }
    val base = 2 + dim
    g.zipWithIndex.foreach { case ((i, j, want), k) =>
      val got = java.math.BigInteger.valueOf(buf(base + 2 * k)).shiftLeft(62)
        .add(java.math.BigInteger.valueOf(buf(base + 2 * k + 1)))
      assert(got == want.toBigInteger, s"g($i,$j): $got vs $want")
    }
  }

  test("PcScore primitive loop equals the decimal HOF chain on random and adversarial vectors") {
    // q_top_component's projection (r12 wave 15): one loop per row must
    // reproduce `aggregate(sequence(1, n), 0::decimal(28,6), (acc, i) =>
    // (acc + round((v[i]-mu[i])*pv[i], 6)::decimal(18,6))::decimal(28,6))
    // ::double` bit-for-bit, including: decimal(18,6) cast overflow →
    // null (|term| ≥ 1e12), short vectors → null (element_at out of
    // range), null elements → null, and sums past the long carrier
    // (forced by 64 near-max terms — the BigInteger retry path)
    val rnd = new scala.util.Random(787)
    def register(name: String, mu: Array[Double], pv: Array[Double]): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => graft.functions.PcScore(exprs.head, mu, pv, name),
        "built-in")
    def chain(dim: Int, mu: Array[Double], pv: Array[Double]) =
      aggregate(sequence(lit(1), lit(dim)),
        lit(BigDecimal(0)).cast("decimal(28,6)"),
        (acc, i) => (acc + round(
          (element_at(col("v"), i) - element_at(typedLit(mu.toSeq), i)) *
            element_at(typedLit(pv.toSeq), i), 6)
          .cast("decimal(18,6)")).cast("decimal(28,6)")).cast("double")
    def asDf(vecs: Seq[Seq[java.lang.Double]]) =
      vecs.map(Tuple1(_)).toDF("v").select(col("v").cast("array<double>").as("v"))
    for ((dim, trial) <- Seq((8, 1), (64, 2))) {
      val mu = Array.fill(dim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6)
      val pv = Array.fill(dim)(math.rint((rnd.nextDouble() * 2 - 1) * 1e6) / 1e6)
      val name = s"graft_pc_score_test_$trial"
      register(name, mu, pv)
      val vecs: Seq[Seq[java.lang.Double]] =
        (1 to 200).map(_ => Seq.fill[java.lang.Double](dim)(rnd.nextGaussian())) ++
        // a null element: null term -> null acc -> null, on both paths
        Seq(Seq.fill[java.lang.Double](dim - 1)(1.0) :+ (null: java.lang.Double))
      val bad = asDf(vecs).select(col("v"),
          call_function(name, col("v")).as("fast"), chain(dim, mu, pv).as("slow"))
        .where(not(col("fast") <=> col("slow")))
        .collect()
      assert(bad.isEmpty,
        s"dim $dim: ${bad.take(3).map(r => (r.get(1), r.get(2))).mkString("; ")}")
    }
    // long-carrier overflow (64 near-max legal terms, monotone sum past
    // 2^63 micros): the BigInteger retry path must equal the decimal
    // chain, whose decimal(28,6) accumulator is nowhere near overflow
    val mu0 = Array.fill(64)(0.0); val pv1 = Array.fill(64)(1.0)
    register("graft_pc_score_test_big", mu0, pv1)
    val big = asDf(Seq(Seq.fill[java.lang.Double](64)(9.99e11)))
      .select(call_function("graft_pc_score_test_big", col("v")).as("fast"),
        chain(64, mu0, pv1).as("slow")).collect()(0)
    assert(big.getDouble(0) == big.getDouble(1), s"big: $big")
    // out-of-domain inputs (unreachable on real 64-dim embeddings,
    // where terms are unit-scale): PcScore returns null — under the
    // engine's ANSI-on default the HOF chain instead raises
    // (decimal-cast overflow / element_at out of range), so there is
    // no defined chain value to compare against
    val nulls = asDf(Seq(
        Seq.fill[java.lang.Double](64)(2.0e12), // decimal(18,6) overflow term
        Seq.fill[java.lang.Double](61)(1.0)))   // short vector
      .select(call_function("graft_pc_score_test_big", col("v")).as("fast"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)), nulls.mkString("; "))
  }

  test("SilhouetteScore one-pass equals the relational join chain on adversarial corpora (L153 parity)") {
    // q_silhouette's r12 wave-18 rewrite: the bounded-matrix expression
    // must reproduce the posexplode + broadcast-join + 3-aggregate chain
    // row-for-row, including the join-existence corners: ragged dims
    // (partial overlap between a point's dims and a class's present
    // dims), null elements (term-skip vs group-existence), null / empty
    // embeddings (absent from the old ab frame entirely), null labels
    // (ALSO absent — the old dots ⋈ xx equi-join on label never matches
    // a null key, a corner found by this spec's first run),
    // single-label corpora (bq null; aq = 0 → the greatest-0 → s = 0.0
    // branch), and singleton classes (aq = 0 exactly).
    val rnd = new scala.util.Random(1153)
    def check(rows: Seq[(Long, Option[Seq[Option[Double]]], Option[Int])],
        tag: String): Unit = {
      val df = rows.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"),
          col("label"))
      val a = Similarity.silhouette(df).orderBy("label").collect()
      val b = Similarity.silhouetteViaJoins(df).orderBy("label").collect()
      assert(a.length == b.length, s"$tag: ${a.length} vs ${b.length} rows")
      a.zip(b).foreach { case (x, y) => assert(x == y, s"$tag: $x vs $y") }
    }
    def vec(d: Int): Seq[Option[Double]] =
      Seq.fill(d)(Some(if (rnd.nextInt(12) == 0) (rnd.nextDouble() * 2 - 1) * 1000
        else rnd.nextGaussian()))
    // adversarial random corpus: 4 labels with different dim profiles
    // (label 3's vectors are all SHORTER than the others), plus nulls
    val random = (1L to 150L).map { i =>
      val lab = (i % 5) match {
        case 4 => if (i % 10 == 4) None else Some(3) // label 3 sparse + some null labels
        case k => Some(k.toInt)
      }
      val emb: Option[Seq[Option[Double]]] = (i % 17) match {
        case 0 => None                          // null embedding: absent row
        case 1 => Some(Seq.empty)               // empty: absent row
        case 2 => Some(Seq.fill(4)(None: Option[Double])) // all-null elements
        case 3 => Some(vec(6).updated(2, None)) // a null hole
        case _ =>
          val d = if (lab.contains(3)) 3 + rnd.nextInt(2) else 8
          Some(vec(d))
      }
      (i, emb, lab)
    }
    check(random, "random")
    // single label, incl. a singleton slice: aq = 0 for the lone point
    check(Seq((1L, Some(vec(5)), Some(7))), "lone point")
    check((1L to 6L).map(i => (i, Some(vec(5)), Some(7))), "single label")
    // singleton classes: every point its own label (aq = 0, bq > 0);
    // plus two identical points in different labels (aq = bq = 0 → the
    // greatest-0 branch)
    val twin = vec(5)
    check(Seq((1L, Some(twin), Some(1)), (2L, Some(twin), Some(2)),
      (3L, Some(vec(5)), Some(3))), "singleton classes")
    // empty corpus
    check(Seq.empty, "empty")
  }

  test("SilhouetteScore xx survives the long carrier (BigInteger retry, r12 advice)") {
    // component magnitude 1e6 → v6 = 1e12 micro-units → v6² = 1e24
    // overflows the long xx accumulator on the FIRST term; the r13 fix
    // retries in BigInteger (like the dot loop) instead of throwing an
    // uncaught ArithmeticException. (No parity check here: the retained
    // join chain's LongType sum(v6*v6) silently WRAPS in this regime —
    // the exact value is the oracle's HUGEINT behavior.)
    // Geometry chosen so the exact answer is known: two identical huge
    // points in label 1 (aq = 0) and one far point in label 2; the twin
    // points' bq is huge but exact, s = round((sb-0)/sb, 6) = 1.0.
    val df = Seq(
      (1L, Some(Seq(Some(1.0e6), Some(1.0e6))), Some(1)),
      (2L, Some(Seq(Some(1.0e6), Some(1.0e6))), Some(1)),
      (3L, Some(Seq(Some(-1.0e6), Some(-1.0e6))), Some(2))
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.silhouette(df).orderBy("label").collect()
    assert(got.length == 2, got.mkString("; "))
    val l1 = got(0)
    assert(l1.getLong(0) == 1L && l1.getLong(1) == 2L &&
      l1.getLong(2) == 0L && l1.getDouble(3) == 1.0, l1.toString)
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

  test("frequentPairs in-row pair generation equals brute force on random baskets (C63 property)") {
    // r12 wave 16 replaced the in-basket self-join with
    // graft_pair_combos over sorted collected baskets; the support /
    // s1 / s2 / n_baskets / lift surface must equal a Scala
    // brute-force replay on random inputs with duplicate (bid, item)
    // rows and baskets straddling the MaxBasket=64 gate
    val rnd = new scala.util.Random(641)
    val rows = (1 to 4000).map { _ =>
      val bid = rnd.nextInt(60).toLong
      // bids 0-4 are oversize (>64 distinct items); others small
      val item = if (bid < 5) rnd.nextInt(200).toLong else rnd.nextInt(12).toLong
      (bid, item)
    } ++ (0L until 5L).flatMap(b => (0L until 70L).map(i => (b, i * 3)))
    val li = rows.toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Stats.frequentPairs(li)
      .select("p1", "p2", "support", "lift", "n_dropped_baskets")
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    // brute force with the same constants (MaxBasket 64, PairMinSup 2)
    val baskets = rows.groupBy(_._1).map { case (_, rs) => rs.map(_._2).toSet }
    val (kept, dropped) = baskets.partition(_.size <= 64)
    val nB = kept.size.toLong
    val suppItem = kept.toSeq.flatten.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val suppPair = kept.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 2)
    assert(got.keySet == suppPair.keySet,
      s"pairs: missing=${(suppPair.keySet -- got.keySet).take(5)} extra=${(got.keySet -- suppPair.keySet).take(5)}")
    suppPair.foreach { case (p, sup) =>
      val lift = java.math.BigDecimal
        .valueOf((sup * nB).toDouble / (suppItem(p._1) * suppItem(p._2)).toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(got(p) == ((sup, lift, dropped.size.toLong)), s"$p: ${got(p)} vs ($sup, $lift)")
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

  test("KmDist codegen loop equals the nested HOF chain on any vector") {
    // r13: the L82/L83 distance+argmin runs as one primitive loop
    // (PcScore posture); pin [dist, cid] parity against the
    // transform/zip_with/aggregate + array_min + array_position chain
    // on adversarial vectors — null elements, wrong lengths, null
    // vectors, exact ties via duplicate centroids. (The overflow
    // regime is REJECTED in both paths — ANSI throws in the chain,
    // add/multiplyExact in the loop — asserted separately below.)
    val rnd = new scala.util.Random(8211)
    val d = 4
    val cents: IndexedSeq[Array[Long]] = IndexedSeq(
      Array(0L, 0L, 0L, 0L),
      Array(1L, 2L, 3L, 4L),
      Array(1L, 2L, 3L, 4L), // duplicate: ties must pick the FIRST
      Array(-5L, 7L, -9L, 11L))
    val name = "graft_km_dist_spec"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => graft.functions.KmDist(exprs.head, cents.toArray, name),
      "built-in")
    val vecs: Seq[Seq[java.lang.Long]] =
      Seq(null, Seq.empty[java.lang.Long], Seq[java.lang.Long](1L, 2L, 3L),
        Seq[java.lang.Long](1L, null, 3L, 4L),
        Seq[java.lang.Long](1L, 2L, 3L, 4L)) ++
        (1 to 300).map(_ => Seq.fill(d)(
          java.lang.Long.valueOf(rnd.nextInt(21).toLong - 10)))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "xi")
    val lit2 = typedLit(cents.map(_.toSeq))
    val chain = df
      .withColumn("dists", transform(lit2, c =>
        aggregate(zip_with(col("xi"), c, (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x)))
      .select(col("vec_id"), array_min(col("dists")).as("dist"),
        array_position(col("dists"), array_min(col("dists"))).as("cid"))
    val fast = df.selectExpr("vec_id", s"$name(xi) AS km")
      .selectExpr("vec_id", "element_at(km, 1) AS dist", "element_at(km, 2) AS cid")
    val a = chain.orderBy("vec_id").collect().toSeq
    val b = fast.orderBy("vec_id").collect().toSeq
    assert(a == b, s"KmDist diverged:\n${a.zip(b).filter(p => p._1 != p._2).take(5)}")
    // overflow rejects (never silently diverges): the loop throws like
    // ANSI's chain does
    intercept[ArithmeticException] {
      graft.functions.KmDist.eval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(Long.MaxValue, 0L, 0L, 1L)),
        cents.toArray)
    }
  }

  test("kmeans/kcenter local driver replay equals the distributed rounds") {
    // r13: below the vector-row budget the Lloyd update rounds and the
    // k-center greedy replay on the driver; pin row-for-row equality
    // with both paths forced on random corpora (cluster structure +
    // uniform noise, duplicate points for tie pressure)
    val rnd = new scala.util.Random(4133)
    (1 to 3).foreach { t =>
      val n = 40 + rnd.nextInt(40)
      val emb = (1L to n).map { id =>
        val c = rnd.nextInt(3)
        val base = Seq(0.0, 5.0, -5.0)(c)
        (id, Seq.fill(6)(math.rint((base + rnd.nextGaussian()) * 100) / 100))
      } ++ Seq((n + 1L, (1 to 6).map(_ => 0.42)), (n + 2L, (1 to 6).map(_ => 0.42)))
      val df = emb.toDF("vec_id", "embedding")
      val kmL = Similarity.kmeansAssign(df, localRowBudget = Long.MaxValue)
        .orderBy("vec_id").collect().toSeq
      val kmD = Similarity.kmeansAssign(df, localRowBudget = -1L)
        .orderBy("vec_id").collect().toSeq
      assert(kmL == kmD, s"kmeans diverged (trial $t):\n${kmL.take(5)}\nvs\n${kmD.take(5)}")
      val kcL = Similarity.kcenterSelect(df, localRowBudget = Long.MaxValue)
        .orderBy("rk").collect().toSeq
      val kcD = Similarity.kcenterSelect(df, localRowBudget = -1L)
        .orderBy("rk").collect().toSeq
      assert(kcL == kcD, s"kcenter diverged (trial $t):\n$kcL\nvs\n$kcD")
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
