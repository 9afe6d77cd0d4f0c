package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch expression microbench (the PLANS.md A/B harness, checked
  * in like [[ExplainMain]]): times named SQL expressions over a 10M-row
  * synthetic column, warm, median-of-3.
  *
  * Usage: runMain graft.tools.MicroBench
  */
object MicroBench {

  /** Interleaved A/B of the C56 bootstrap replicate stage: old
    * (explode + md5-hex + conv(substring) + threshold when-chain) vs
    * new (posexplode(graft_boot_w)) over an events-shaped synthetic
    * frame. Interleaving makes the RATIO valid under uniform machine
    * contention (the r12 session's host showed persistent CPU steal). */
  private def bootAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val th = graft.operators.Stats.BootThresholds
    val w = th.map(t => s"(CASE WHEN u >= ${t}L THEN 1 ELSE 0 END)").mkString(" + ")
    val arr = th.mkString("array(", "L,", "L)")
    val base = spark.range(0, 1000000L)
      .selectExpr("cast(id % 5 as string) AS event_type", "id AS event_id",
        "cast(cast(id % 997 as double) / 7 as decimal(18,6)) AS v").cache()
    base.count()
    def old() = base
      .selectExpr("event_type", "event_id", "v", "explode(sequence(0, 12)) AS g")
      .selectExpr("event_type", "v", "g",
        "md5(concat('boot', cast(g as string), ':', cast(event_id as string))) AS h",
        "explode(sequence(0, 3)) AS sl")
      .selectExpr("event_type", "v", "g * 4 + sl AS b",
        "cast(conv(substring(h, sl * 7 + 1, 7), 16, 10) as long) AS u")
      .where("b < 50").selectExpr("event_type", "b", "v", s"($w) AS w")
      .groupBy("event_type", "b").agg(sum(col("w")).as("n"), sum(expr("v * w")).as("s"))
    def neu() = base
      .selectExpr("event_type", "v",
        "explode(sequence(0, 12)) AS g", "event_id")
      .select(col("event_type"), col("v"), col("g"),
        posexplode(expr(s"graft_boot_w(concat('boot', cast(g as string), ':', " +
          s"cast(event_id as string)), $arr)")).as(Seq("sl", "w")))
      .where(col("g") * 4 + col("sl") < 50 && col("w") > 0)
      .groupBy(col("event_type"), col("g") * 4 + col("sl"))
      .agg(sum(col("w")).as("n"), sum(expr("v * w")).as("s"))
    // result parity first
    val a = old().selectExpr("sum(n) AS n", "sum(s) AS s").collect()(0)
    val b = neu().selectExpr("sum(n) AS n", "sum(s) AS s").collect()(0)
    println(s"[mb] boot parity: ${a == b} ($a vs $b)")
    val ts = (1 to 4).flatMap { _ =>
      Seq("old" -> old _, "new" -> neu _).map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] boot-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Interleaved A/B of the q_top_component score projection: old
    * (64-step decimal HOF — aggregate over sequence) vs new
    * (graft.functions.PcScore one-loop expression) over a synthetic
    * 1M × 64 embeddings-shaped frame. Interleaving makes the RATIO
    * valid under the host's persistent CPU steal. */
  private def pcAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val mu = Array.fill(64)(math.rint(rnd.nextGaussian() * 1e4) / 1e6)
    val pv = Array.fill(64)(math.rint((rnd.nextDouble() * 2 - 1) * 1e6) / 1e6)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pc_score_mb", exprs =>
        graft.functions.PcScore(exprs.head, mu, pv, "graft_pc_score_mb"),
      "built-in")
    val base = spark.range(0, 1000000L)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> sin(cast(id * i as double)))").as("v"))
      .cache()
    base.count()
    val muLit = typedLit(mu.toSeq)
    val pvLit = typedLit(pv.toSeq)
    def old() = base.select(col("vec_id"),
      aggregate(sequence(lit(1), lit(64)),
        lit(BigDecimal(0)).cast("decimal(28,6)"),
        (acc, i) => (acc + round(
          (element_at(col("v"), i) - element_at(muLit, i)) * element_at(pvLit, i), 6)
          .cast("decimal(18,6)")).cast("decimal(28,6)"))
        .cast("double").as("score"))
    def neu() = base.select(col("vec_id"),
      call_function("graft_pc_score_mb", col("v")).as("score"))
    val a = old().selectExpr("sum(score) AS s", "count(*) AS n").collect()(0)
    val b = neu().selectExpr("sum(score) AS s", "count(*) AS n").collect()(0)
    println(s"[mb] pc parity: ${a == b} ($a vs $b)")
    val ts = (1 to 4).flatMap { _ =>
      Seq("old" -> old _, "new" -> neu _).map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] pc-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Interleaved A/B of the C63/C106 pair-generation stage: old
    * (in-basket self-join on bid with a.item < b.item) vs new
    * (sort_array(collect_list) + graft_pair_combos) over a synthetic
    * lineitem-shaped frame, both from the same gated `sized` input. */
  private def pairsAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    // ~2M rows, ~330k baskets of ~6 items (TPC-H lineitem shape)
    val li = spark.range(0, 2000000L)
      .selectExpr("id div 6 AS bid",
        "cast(hash(id) % 2000 + 2000 as bigint) AS item")
    val d = li.distinct()
    val bsz = d.groupBy(col("bid")).agg(count(lit(1)).as("bsz"))
    def sized = d.join(bsz.where(col("bsz") <= 64).select(col("bid")), "bid")
    def old() = sized.as("a")
      .join(sized.as("b"),
        col("a.bid") === col("b.bid") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("p1"), col("b.item").as("p2"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
    def neu() = sized.groupBy(col("bid"))
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .select(explode(expr("graft_pair_combos(items)")).as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
    val a = old().selectExpr("count(*) AS n", "sum(support) AS s").collect()(0)
    val b = neu().selectExpr("count(*) AS n", "sum(support) AS s").collect()(0)
    println(s"[mb] pairs parity: ${a == b} ($a vs $b)")
    val ts = (1 to 6).flatMap { r =>
      // alternate which variant goes first so neither always pays the
      // fresher-JIT / colder-cache slot of its round
      val order = if (r % 2 == 1) Seq("old" -> old _, "new" -> neu _)
        else Seq("new" -> neu _, "old" -> old _)
      order.map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    // chronological per-round pairs: each pair shares machine state,
    // so the per-pair delta is valid under drifting contention
    val rounds = ts.grouped(2).toSeq
    rounds.zipWithIndex.foreach { case (p, i) =>
      val m = p.toMap
      println(f"[mb] pairs round ${i + 1}: old ${m("old")}%.2f new ${m("new")}%.2f  new/old ${m("new") / m("old")}%.2f")
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] pairs-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Interleaved A/B of the C154 HITS per-round renormalization over
    * real sf0.1 tables: single-partition window max (current — a
    * single-reducer stage per half-step at scale) vs broadcast
    * sub-aggregate max (scale-safe two-level; relies on exchange reuse
    * to avoid re-evaluating the round chain). */
  private def hitsAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.expressions.Window
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val d38 = "decimal(38,0)"
    val HitsUnit = 1000000000000L
    def decDiv(a: Column, b: Column) = graft.functions.Portable.decDiv(a, b)
    def run(renorm: (DataFrame, String) => DataFrame): DataFrame = {
      val edges = orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          "o_orderkey")
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct().localCheckpoint()
      var hub = edges.select(col("c")).distinct()
        .select(col("c"), lit(HitsUnit).as("h"))
      var auth = edges.select(col("s")).distinct()
        .select(col("s"), lit(HitsUnit).as("a"))
      for (_ <- 1 to 3) {
        val araw = edges.join(hub, "c").groupBy(col("s"))
          .agg(sum(col("h").cast(d38)).as("ar"))
        auth = renorm(araw, "ar").select(col("s"),
          decDiv(col("ar") * HitsUnit, col("m")).cast("long").as("a"))
        val hraw = edges.join(auth, "s").groupBy(col("c"))
          .agg(sum(col("a").cast(d38)).as("hr"))
        hub = renorm(hraw, "hr").select(col("c"),
          decDiv(col("hr") * HitsUnit, col("m")).cast("long").as("h"))
      }
      hub.select(lit("hub").as("node_type"), col("c").cast("long").as("node_id"),
          col("h").as("score"))
        .unionAll(auth.select(lit("authority").as("node_type"),
          col("s").cast("long").as("node_id"), col("a").as("score")))
    }
    val winNorm = (df: DataFrame, c: String) =>
      df.withColumn("m", max(col(c)).over(Window.partitionBy(lit(1))))
    val bcNorm = (df: DataFrame, c: String) =>
      df.crossJoin(broadcast(df.agg(max(col(c)).as("m"))))
    val a = run(winNorm).selectExpr("count(*) AS n", "sum(score) AS s").collect()(0)
    val b = run(bcNorm).selectExpr("count(*) AS n", "sum(score) AS s").collect()(0)
    println(s"[mb] hits parity: ${a == b} ($a vs $b)")
    val ts = (1 to 6).flatMap { r =>
      val order = if (r % 2 == 1) Seq("win" -> winNorm, "bc" -> bcNorm)
        else Seq("bc" -> bcNorm, "win" -> winNorm)
      order.map { case (tag, f) =>
        val t0 = System.nanoTime()
        run(f).write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    ts.grouped(2).zipWithIndex.foreach { case (p, i) =>
      val m = p.toMap
      println(f"[mb] hits round ${i + 1}: win ${m("win")}%.2f bc ${m("bc")}%.2f  bc/win ${m("bc") / m("win")}%.2f")
    }
    Seq("win", "bc").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] hits-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Interleaved A/B of the L153 silhouette operator: old (posexplode +
    * broadcast-join fan-out + two corpus-keyed aggregates —
    * [[graft.operators.Similarity.silhouetteViaJoins]]) vs new (bounded
    * class-matrix collect + one SilhouetteScore pass) over a synthetic
    * embeddings-shaped frame. End-to-end per evaluation (the new path's
    * bounded collects are part of its cost). */
  private def silAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val base = spark.range(0, 300000L)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> cast(sin(cast(id * i as double)) as float))")
          .as("embedding"),
        (col("id") % 10).cast("int").as("label"))
      .cache()
    base.count()
    def old() = graft.operators.Similarity.silhouetteViaJoins(base)
    def neu() = graft.operators.Similarity.silhouette(base)
    val a = old().orderBy("label").collect()
    val b = neu().orderBy("label").collect()
    println(s"[mb] sil parity: ${a.toSeq == b.toSeq}")
    val ts = (1 to 6).flatMap { r =>
      val order = if (r % 2 == 1) Seq("old" -> old _, "new" -> neu _)
        else Seq("new" -> neu _, "old" -> old _)
      order.map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    ts.grouped(2).zipWithIndex.foreach { case (p, i) =>
      val m = p.toMap
      println(f"[mb] sil round ${i + 1}: old ${m("old")}%.2f new ${m("new")}%.2f  new/old ${m("new") / m("old")}%.2f")
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] sil-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Interleaved A/B of the L33 BPE encode hot loop over the REAL
    * sf word stream (regexp_extract_all('[a-z]+') on documents — the
    * exact stream every graft_bpe query feeds): old (r12
    * CodegenFallback string/Map greedy loop, retained as
    * BpeEncodeLegacy) vs new (BpeTable int-symbol loop, codegen'd).
    * The timed shape is q_bpe_encode's metering stage. */
  private def bpeAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_legacy", exprs => graft.functions.BpeEncodeLegacy(exprs.head),
      "built-in")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = docs
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")))
      .toDF("doc_id", "wi", "word")
      // replicate 8x so the encode loop dominates the scan/explode
      .crossJoin(spark.range(0, 8).select(col("id").as("rep")))
      .cache()
    words.count()
    def shape(fn: String) = words
      .select(col("doc_id"), col("wi"), expr(s"$fn(word)").as("toks"))
      .select(col("doc_id"), col("wi"),
        size(col("toks")).cast("long").as("n_toks"),
        array_join(col("toks"), "|").as("enc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_bpe_tokens"),
        md5(max(col("enc"))).as("h"))
    def old() = shape("graft_bpe_legacy")
    def neu() = shape("graft_bpe")
    val a = old().selectExpr("sum(n_words) AS w", "sum(n_bpe_tokens) AS t",
      "count(*) AS n").collect()(0)
    val b = neu().selectExpr("sum(n_words) AS w", "sum(n_bpe_tokens) AS t",
      "count(*) AS n").collect()(0)
    println(s"[mb] bpe parity: ${a == b} ($a vs $b)")
    val ts = (1 to 6).flatMap { r =>
      val order = if (r % 2 == 1) Seq("old" -> old _, "new" -> neu _)
        else Seq("new" -> neu _, "old" -> old _)
      order.map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    ts.grouped(2).zipWithIndex.foreach { case (p, i) =>
      val m = p.toMap
      println(f"[mb] bpe round ${i + 1}: old ${m("old")}%.2f new ${m("new")}%.2f  new/old ${m("new") / m("old")}%.2f")
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] bpe-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Stage timing for q_golden_record (r13): where do the seconds go —
    * the blocked F-S pair scoring, the CC fixpoint waves, or the fuse
    * aggregates? Each stage timed via noop sink, 3 reps after a warm. */
  private def goldenProf(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[mb] golden $tag%-12s median ${ts(1)}%.2f  [${ts.head}%.2f, ${ts.last}%.2f]")
    }
    // block-size distribution (verdict #4: skew check)
    val blocks = customer.select(substring(col("c_name"), 1, 16).as("blk"))
      .groupBy("blk").count()
    val stats = blocks.selectExpr("count(*) AS n_blocks", "max(count) AS mx",
      "percentile(count, 0.5) AS med", "sum(count) AS rows").collect()(0)
    println(s"[mb] golden blocks: $stats")
    time("linkage") { graft.operators.Dedup.recordLinkage(customer) }
    time("cc") {
      graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.recordLinkage(customer).select(col("x"), col("y")),
        customer.select(col("c_custkey").as("doc_id")))
    }
    time("full") { graft.operators.Dedup.goldenRecord(customer) }
  }

  /** Stage timing for q_curation_web (r13): where do the remaining
    * seconds go — html extraction, NB, dedup, or BPE metering? */
  private def webProf(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.VectorFunctions.register(spark)
    val documents0 = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[mb] web $tag%-12s median ${ts(1)}%.2f  [${ts.head}%.2f, ${ts.last}%.2f]")
    }
    val documents = graft.operators.Scale.spreadNarrowScan(documents0, col("doc_id"))
    time("extract") {
      graft.operators.Html.extractText(graft.operators.Html.asHtml(documents))
        .select(col("doc_id"), col("extracted").as("text"))
    }
    val extracted = graft.operators.Html.extractText(graft.operators.Html.asHtml(documents))
      .select(col("doc_id"), col("extracted").as("text")).localCheckpoint()
    time("quality") { graft.operators.TextAnalysis.quality(extracted) }
    time("nbtrain") { graft.operators.TextAnalysis.nbTrain(documents) }
    time("nbclassify") {
      graft.operators.TextAnalysis.nbClassify(extracted,
        weights = Some(graft.operators.TextAnalysis.nbTrain(documents).localCheckpoint()),
        heldOutOnly = false)
    }
    time("dedup") { graft.operators.Dedup.dedupClusters(documents) }
    time("bpe-all") { graft.operators.TextAnalysis.bpeEncode(extracted) }
    time("full") { graft.operators.Curation.webPipeline(documents0) }
  }

  /** Interleaved A/B of the q_curation_web final composition: old (the
    * r12 shape — `kept` consumed lazily by BOTH the final join and the
    * BPE-metering semi-join, so the url⋈quality⋈NB⋈nearKeep subtree
    * evaluates twice) vs new ([[graft.operators.Curation.webPipeline]]
    * with the survivor frame localCheckpointed once). */
  private def webKeepAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.VectorFunctions.register(spark)
    val documents0 = spark.read.parquet(s"$sfDir/documents.parquet")
    def old() = {
      val documents = graft.operators.Scale.spreadNarrowScan(documents0, col("doc_id"))
      val pageId = col("doc_id") -
        when(col("doc_id") % 10 === 7, 1).otherwise(0)
      val urlKeep = graft.operators.Urls.canonicalFetches(
        documents, pageId, pageId % 31 === 13)
      val extracted = graft.operators.Html.extractText(
          graft.operators.Html.asHtml(documents))
        .select(col("doc_id"), col("extracted").as("text"))
        .localCheckpoint()
      val q = graft.operators.TextAnalysis.quality(extracted)
        .where(col("quality_score") >= 0.15)
        .select(col("doc_id"), col("quality_score"))
      val nb = graft.operators.TextAnalysis.nbClassify(extracted,
          weights = Some(graft.operators.TextAnalysis.nbTrain(documents).localCheckpoint()),
          heldOutOnly = false)
        .where(col("pred_keep") === 1)
        .select(col("doc_id"), col("logit").as("nb_logit"))
      val nearKeep = graft.operators.Dedup.dedupClusters(documents)
        .where(col("keep") === 1).select(col("doc_id"))
      val kept = documents.select(col("doc_id"))
        .join(urlKeep, Seq("doc_id"), "left_semi")
        .join(q, "doc_id")
        .join(nb, "doc_id")
        .join(nearKeep, Seq("doc_id"), "left_semi")
      val toks = graft.operators.TextAnalysis.bpeEncode(
          extracted.join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi"))
        .select(col("doc_id"), col("n_bpe_tokens"))
      kept.join(toks, "doc_id")
    }
    def neu() = graft.operators.Curation.webPipeline(documents0)
    val a = old().selectExpr("count(*) AS n", "sum(n_bpe_tokens) AS t",
      "sum(quality_score) AS q").collect()(0)
    val b = neu().selectExpr("count(*) AS n", "sum(n_bpe_tokens) AS t",
      "sum(quality_score) AS q").collect()(0)
    println(s"[mb] webkeep parity: ${a == b} ($a vs $b)")
    val ts = (1 to 6).flatMap { r =>
      val order = if (r % 2 == 1) Seq("old" -> old _, "new" -> neu _)
        else Seq("new" -> neu _, "old" -> old _)
      order.map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    ts.grouped(2).zipWithIndex.foreach { case (p, i) =>
      val m = p.toMap
      println(f"[mb] webkeep round ${i + 1}: old ${m("old")}%.2f new ${m("new")}%.2f  new/old ${m("new") / m("old")}%.2f")
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] webkeep-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  /** Interleaved A/B of q_join_revenue's fact-fact join strategy: AQE
    * auto-broadcasts the 150k-row orders (and the orders⋈customer
    * result) from byte estimates — a serialized driver-side build that
    * blew up to 12.3 s at 8 cores in the r12 driver run — vs explicit
    * SHUFFLE_HASH on the two fact joins (the plan any real scale takes
    * anyway, since the estimates exceed the threshold there). */
  private def jrAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.Portable.dec
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    def shape(o: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      lineitem
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    def old() = shape(orders, customer)
    def neu() = shape(orders.hint("shuffle_hash"), customer.hint("shuffle_hash"))
    val a = old().orderBy("r_name", "n_name").collect().toSeq
    val b = neu().orderBy("r_name", "n_name").collect().toSeq
    println(s"[mb] jr parity: ${a == b}")
    val ts = (1 to 6).flatMap { r =>
      val order = if (r % 2 == 1) Seq("old" -> old _, "new" -> neu _)
        else Seq("new" -> neu _, "old" -> old _)
      order.map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    ts.grouped(2).zipWithIndex.foreach { case (p, i) =>
      val m = p.toMap
      println(f"[mb] jr round ${i + 1}: old ${m("old")}%.2f new ${m("new")}%.2f  new/old ${m("new") / m("old")}%.2f")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    if (args.contains("boot")) { bootAb(spark); spark.stop(); return }
    if (args.contains("pc")) { pcAb(spark); spark.stop(); return }
    if (args.contains("pairs")) { pairsAb(spark); spark.stop(); return }
    if (args.contains("hits")) { hitsAb(spark); spark.stop(); return }
    if (args.contains("sil")) { silAb(spark); spark.stop(); return }
    if (args.contains("bpe")) { bpeAb(spark); spark.stop(); return }
    if (args.contains("golden")) { goldenProf(spark); spark.stop(); return }
    if (args.contains("web")) { webProf(spark); spark.stop(); return }
    if (args.contains("jr")) { jrAb(spark); spark.stop(); return }
    if (args.contains("webkeep")) { webKeepAb(spark); spark.stop(); return }
    val df = spark.range(0, 10000000L)
      .selectExpr("concat('7:', cast(id as string)) AS s").cache()
    df.count()
    val cases = Seq(
      "conv-chain" -> "sum(cast(conv(substring(md5(s),1,15),16,10) as bigint) % 1000000007)",
      "digest-direct" -> "sum(graft_md5long60(s) % 1000000007)")
    // warm
    val warm = cases.map { case (_, e) => df.selectExpr(s"$e AS x").collect()(0).getLong(0) }
    println(s"[mb] equal: ${warm.distinct.size == 1} (${warm.mkString(", ")})")
    cases.foreach { case (tag, e) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.selectExpr(s"$e AS x").collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[mb] $tag%-14s median ${ts(1)}%.3f s  [${ts.head}%.3f, ${ts.last}%.3f]")
    }
    spark.stop()
  }
}
