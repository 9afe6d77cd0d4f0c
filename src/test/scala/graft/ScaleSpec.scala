package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** §6 scale mechanics: salting preserves join semantics; bucketing
  * removes the join exchange. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val plain = orders.join(customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      .select("o_orderkey", "c_name")
    val salted = Scale.saltedJoin(
      orders, customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("stratified sample is deterministic and respects per-stratum fractions") {
    val docs = Tables.load(spark, sf, "documents")
    val fr = Map("en" -> 0.5, "de" -> 0.1, "es" -> 0.0, "fr" -> 1.0, "zh" -> 0.2)
    val s1 = Scale.stratifiedSample(docs, "lang", fr, seed = 42).select("doc_id", "lang")
    val s2 = Scale.stratifiedSample(docs, "lang", fr, seed = 42).select("doc_id", "lang")
    assert(s1.collect().toSet == s2.collect().toSet) // same seed, same sample
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("es")) // 0.0 fraction -> empty stratum
    assert(counts("fr") == totals("fr")) // 1.0 fraction -> full stratum
    val enRatio = counts("en").toDouble / totals("en")
    assert(enRatio > 0.2 && enRatio < 0.8, s"en ratio $enRatio far from 0.5")
  }

  test("z-order layout prunes files on BOTH dimensions; single-column sort on one") {
    // the data-skipping claim measured, not asserted: write the same
    // rows (a) z-ordered on (user, minute) and (b) sorted by minute
    // only, then count which files a point predicate on each dimension
    // could touch, from per-file min/max — exactly what a 100 TB reader
    // does with footer/manifest stats
    val events = Tables.load(spark, sf, "events")
    val dims = events.selectExpr("user_id",
      "unix_micros(ts) div 60000000 AS mn")
    val m = dims.agg(min(col("mn")), max(col("mn")), max(col("user_id"))).head
    val (mn0, mn1, uMax) = (m.getLong(0), m.getLong(1), m.getLong(2))
    // the zorder2 contract: BOTH dims pre-scaled to the full 16-bit
    // range — unequal widths would let the wider dim's high bits
    // dominate the curve and degenerate to a single-column sort
    val scaled = dims.select(
      expr(s"user_id * 65535 div $uMax").as("user_id"),
      expr(s"(mn - $mn0) * 65535 div ${mn1 - mn0}").as("mn"))
    val nFiles = 16
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Scale.zorderWrite(scaled, col("user_id"), col("mn"), nFiles, s"$dir/z")
    scaled.repartitionByRange(nFiles, col("mn")).sortWithinPartitions(col("mn"))
      .write.mode("overwrite").parquet(s"$dir/t")
    // one stats read per file: (userMin, userMax, mnMin, mnMax) — the
    // footer-stats view a manifest-driven reader prunes with
    def stats(layout: String): Array[(Long, Long, Long, Long)] = {
      val files = new java.io.File(s"$dir/$layout").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length == nFiles, s"$layout produced ${files.length} files")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("user_id")), max(col("user_id")), min(col("mn")), max(col("mn"))).head
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    // average files touched over spread probe points — a single probe
    // can sit on a curve-order boundary where z envelopes are loosest
    val probes = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(p => (p * 65535).toLong)
    def touched(st: Array[(Long, Long, Long, Long)], user: Boolean): Double =
      probes.map(v => st.count { case (ul, uh, ml, mh) =>
        if (user) ul <= v && v <= uh else ml <= v && v <= mh
      }).sum.toDouble / probes.size
    val (zs, ts) = (stats("z"), stats("t"))
    val (zU, zM) = (touched(zs, user = true), touched(zs, user = false))
    val (tU, tM) = (touched(ts, user = true), touched(ts, user = false))
    info(f"mean files touched of $nFiles — z-order: user=$zU%.1f minute=$zM%.1f; time-sorted: user=$tU%.1f minute=$tM%.1f")
    // time-sorted: its own dimension prunes hard, the other not at all
    assert(tM <= 2, s"time-sorted layout should nail a minute probe: $tM")
    assert(tU >= nFiles - 2, s"time-sorted layout cannot prune users (expected ~all): $tU")
    // z-order: BOTH dimensions prune to a strict subset of the files
    assert(zU <= nFiles / 2.0, s"z-order user pruning too weak: $zU")
    assert(zM <= nFiles / 2.0, s"z-order minute pruning too weak: $zM")
    assert(zU < tU, "z-order must beat the time-sorted layout on the user dimension")
  }

  test("compactParquet bin-packs small files to the byte target, content untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val docs = Tables.load(spark, sf, "documents")
    // simulate an over-parallel ingest: 64 files for ~500 rows
    docs.repartition(64).write.mode("overwrite").parquet(s"$dir/small")
    def files(p: String) = new java.io.File(p).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    val small = files(s"$dir/small")
    assert(small.size == 64, "fixture must start fragmented")
    val totalBytes = small.map(_.length).sum
    val target = totalBytes / 4
    val n = Scale.compactParquet(spark, s"$dir/small", s"$dir/packed", target)
    val packed = files(s"$dir/packed")
    // the file-count contract: ceil(total/target) files, actually on disk
    assert(n == math.ceil(totalBytes.toDouble / target).toInt)
    assert(packed.size == n, s"expected $n files, found ${packed.size}")
    // round-robin keeps sizes near-equal: no file more than 2x the mean
    // (per-file parquet overhead shrinks, so files land UNDER target)
    val mean = packed.map(_.length).sum.toDouble / packed.size
    assert(packed.forall(_.length < 2 * mean), "a packed file is badly skewed")
    // content is bytes-exact: same rows, nothing reordered away
    val before = docs.select(col("doc_id"), md5(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val after = spark.read.parquet(s"$dir/packed")
      .select(col("doc_id"), md5(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(after == before, "compaction altered content")
  }

  test("hive-style partition layout prunes directories at planning time") {
    // at 100 TB, date-partitioned layout turns a date predicate into a
    // directory listing instead of a data scan — assert the filter
    // lands in PartitionFilters (metadata-only) not PushedFilters
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.load(spark, sf, "events")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    events.write.partitionBy("dt").mode("overwrite").parquet(s"$dir/by_day")
    val back = spark.read.parquet(s"$dir/by_day")
    val oneDay = back.where(col("dt") === "2024-01-05")
    val scan = oneDay.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("2024-01-05")),
      s"date predicate must prune partitions: ${scan.partitionFilters}")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "pruned scan must read strictly fewer files than the table holds")
    assert(oneDay.count() ==
      events.where(col("dt") === "2024-01-05").count())
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime (C155)") {
    // the 100 TB star-join staple: the fact side is partitioned on the
    // join key, the dim filter is only known at runtime — DPP turns
    // the broadcast dim's key set into a PARTITION filter on the fact
    // scan, so unrelated partitions are never listed, let alone read
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val orders = Tables.load(spark, sf, "orders")
    orders.write.partitionBy("o_orderpriority").mode("overwrite")
      .parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // the dim must be a real scan with a live filter — a pre-filtered
    // LocalRelation has no selective predicate for DPP to harvest
    Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
      ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop"))
      .toDF("pr", "tag").write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").where(col("tag") === "keep")
    val joined = fact.join(dim, fact("o_orderpriority") === dim("pr"))
    val n = joined.count()
    assert(n == orders.where(col("o_orderpriority") === "1-URGENT").count())
    val scans = joined.queryExecution.executedPlan.toString
    assert(scans.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$scans")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Spark injects a bloom filter built from the selective (dim) side
    // into the fact-side scan of a shuffle join — at 100 TB this skips
    // fact rows before the exchange. Default thresholds target real
    // cluster sizes (10 GB fact side), so lower them to demonstrate the
    // rewrite engages under this engine's configuration.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lineitem = Tables.load(spark, sf, "lineitem")
      val orders = Tables.load(spark, sf, "orders")
        .where(col("o_totalprice") > 400000.0) // selective creation side
        .withColumnRenamed("o_orderkey", "l_orderkey")
      val joined = lineitem.join(orders, "l_orderkey").select("l_orderkey", "l_quantity")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter did not engage:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    // §6 claims AQE skew handling composes with the engine's plans —
    // prove it engages: a hot key owning ~half the fact rows lands in
    // one shuffle partition, and with the skew thresholds scaled to
    // test size AQE must split that partition into parallel sub-reads
    // (the runtime answer to skew that salting solves statically, C16).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val fact = spark.range(0, 40000)
        .select(when($"id" % 2 === 0, 7L).otherwise($"id").as("k"),
          concat(lit("p"), $"id").as("payload"))
      val dim = spark.range(0, 2000).select($"id".as("k"), ($"id" * 3).as("v"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe's plan (count() would plan a different
      // query, and AQE only finalizes the plan it actually ran)
      assert(joined.collect().length == 21000) // 20k hot + 1k distinct
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("skewed"),
        s"AQE skew split did not engage:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("closed-form ntile identity matches NTile for every small n and k") {
    // q_woe_iv / q_seq_test derive their bins from totalOrderRank +
    // ntileExpr instead of a global NTile window; this pins the
    // bucket identity (first n%k buckets hold n/k+1 rows) against the
    // engine's own NTile across every shape incl. n < k, n = k,
    // and every remainder class
    import org.apache.spark.sql.expressions.Window
    for (k <- Seq(3, 5, 10); n <- Seq(1, 2, 4, 5, 9, 10, 11, 23, 50)) {
      val df = spark.range(1, n + 1).select(col("id").as("v"))
      val want = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"))).cast("long"))
        .select("v", "b").as[(Long, Long)].collect().toMap
      val got = df.withColumn("rn", col("v")) // v IS the rank 1..n
        .withColumn("n_all", lit(n.toLong))
        .withColumn("b", graft.operators.Relational.ntileExpr("rn", "n_all", k).cast("long"))
        .select("v", "b").as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n k=$k: $got vs $want")
    }
  }

  test("global rank equals the single-reducer window and survives any input layout") {
    val orders = Tables.load(spark, sf, "orders")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = orders.select(col("o_orderkey"), col("o_totalprice"),
      row_number().over(w).cast("long").as("rk"))
    val got = graft.operators.Relational.globalRank(orders)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the rank must be a pure function of the DATA: any physical input
    // layout (different partition count → different range-sample draws
    // → different seam placement) must yield identical ranks
    val relaid = graft.operators.Relational.globalRank(orders.repartition(7))
    assert(relaid.exceptAll(want).isEmpty && want.exceptAll(relaid).isEmpty)
    // plan shape (r11 two-phase bucket rank): the corpus rides one
    // hash exchange on the deterministic bucket column + a broadcast
    // offsets join; the corpus-scale row_number window is PARTITIONED
    // by the bucket (the old global shape — windowspecdefinition
    // leading with the sort key — must not reappear; the only
    // single-partition window is the parts-row offsets prefix-sum)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_rk_b"), s"no bucket exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$plan")
    assert(!plan.contains("windowspecdefinition(o_totalprice"),
      s"global window over the corpus survived:\n$plan")
    // determinism across repeated evaluations (the r11 lesson: the
    // mid()-based build drifted when AQE re-planned instead of
    // reusing the exchange) — three evaluations, identical ranks
    val sums = (1 to 3).map(_ =>
      graft.operators.Relational.globalRank(orders)
        .agg(sum(col("rk"))).collect()(0).getLong(0))
    assert(sums.distinct.size == 1, s"rank drift across evaluations: $sums")
  }

  test("rank boundaries: bounded deterministic sample, width tracking the cluster") {
    // r12 (VERDICT r11 #1): the boundary pass must be a bounded
    // reservoir sample — not the full approxQuantile aggregation —
    // and the bucket count must scale with defaultParallelism instead
    // of a literal 32
    import graft.operators.Relational
    assert(Relational.rankParts(spark.range(1).toDF()) ==
      math.max(spark.sparkContext.defaultParallelism, 32))
    val keyed = spark.range(0, 100000).select(col("id").cast("double").as("_rk_key"))
    val b1 = Relational.rankBounds(keyed, 64)
    // ≤ parts−1 distinct ascending boundaries...
    assert(b1.length <= 63 && b1.sameElements(b1.distinct.sorted))
    // ...that actually spread across the key range (balance, loosely)
    assert(b1.length >= 32 && b1.head < 20000 && b1.last > 80000,
      s"degenerate boundary spread: n=${b1.length} head=${b1.headOption} last=${b1.lastOption}")
    // deterministic: same data, same layout → identical boundaries
    val b2 = Relational.rankBounds(keyed, 64)
    assert(b1.sameElements(b2))
    // tiny and empty inputs degrade to fewer (or zero) buckets, never throw
    assert(Relational.rankBounds(keyed.limit(3), 64).length <= 3)
    assert(Relational.rankBounds(keyed.limit(0), 64).isEmpty)
  }

  test("hive-partitioned layout: scan prunes partitions; dynamic overwrite replaces only its own") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/t"
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
    // partition pruning: the lang predicate must land in
    // PartitionFilters (directory-level skip — zero data files of
    // other languages opened), not PushedFilters (row-group skip)
    val scan = spark.read.parquet(dir).where(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"lang predicate did not become a partition filter:\n${plan.take(1500)}")
    assert(scan.count() == docs.where(col("lang") === "en").count())
    // dynamic partition overwrite: rewriting ONE language must leave
    // every other partition's files byte-identical (static overwrite
    // would truncate the whole table — the 100 TB incremental-refresh
    // hazard)
    val before = spark.read.parquet(dir).where(col("lang") =!= "en")
      .agg(sum(col("doc_id"))).head.getLong(0)
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      docs.where(col("lang") === "en")
        .withColumn("n_chars", lit(-1L))
        .write.partitionBy("lang").mode("overwrite").parquet(dir)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(dir)
    assert(after.where(col("lang") === "en").agg(min(col("n_chars"))).head.getLong(0) == -1L
      && after.where(col("lang") === "en").agg(max(col("n_chars"))).head.getLong(0) == -1L,
      "en partition not replaced")
    assert(after.where(col("lang") =!= "en").agg(sum(col("doc_id"))).head.getLong(0) == before,
      "dynamic overwrite disturbed sibling partitions")
  }

  test("schema evolution: merged read unions columns, nulls the gaps, rejects type conflicts") {
    // a long-lived ingest directory accretes batches written by
    // different pipeline versions; the reader must present one union
    // schema (old rows null-extended) without rewriting history —
    // at 100 TB a backfill-on-schema-change is not an option
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString + "/t"
    docs.select(col("doc_id"), col("text")).write.parquet(s"$dir/batch=1")
    docs.select(col("doc_id"), col("text"), col("n_chars").as("quality"))
      .write.parquet(s"$dir/batch=2") // v2 adds a column
    docs.select(col("text"), col("doc_id")) // v3 reorders — by-name, not positional
      .write.parquet(s"$dir/batch=3")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("batch", "doc_id", "quality", "text"))
    val n = docs.count()
    assert(merged.count() == 3 * n)
    // pre-schema-change rows surface as NULL, never as garbage
    assert(merged.where(col("quality").isNotNull).count() == n)
    assert(merged.where(col("batch") === 1 && col("quality").isNotNull).count() == 0)
    // by-name resolution: the reordered batch still lines up
    val a = docs.agg(sum(col("doc_id"))).head.getLong(0)
    assert(merged.where(col("batch") === 3).agg(sum(col("doc_id"))).head.getLong(0) == a)
    // an incompatible type for the SAME column must fail loudly at
    // read (silent coercion would corrupt downstream aggregates)
    docs.select(col("doc_id"), col("text"), col("lang").as("quality"))
      .write.parquet(s"$dir/batch=4")
    val conflicted = intercept[Throwable] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    assert(Option(conflicted.getMessage).exists(m =>
      m.toLowerCase.contains("merge") || m.toLowerCase.contains("incompatible")
        || m.toLowerCase.contains("failed")),
      s"type conflict surfaced wrong error: ${conflicted.getMessage}")
  }

  test("sketch-driven join planning: CMS statistics choose broadcast / salted / shuffle (C171)") {
    import graft.plans.CostModel
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val lineitem = Tables.load(spark, sf, "lineitem")

    // 1. a side under the cap → broadcast it, and the plan proves it
    val wantOc = orders
      .join(customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
    val (bj, bc) = CostModel.planJoin(orders, customer, "o_custkey", "c_custkey",
      broadcastRowCap = 10000)
    assert(bc.strategy == "broadcast", bc.toString)
    assert(bj.count() == wantOc)
    assert(bj.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // the grid's row counts are EXACT (each key's count lands once per
    // CMS row), and the inner-product output estimate is one-sided
    assert(bc.leftRows == orders.count() && bc.rightRows == customer.count())
    assert(bc.estOutRows >= wantOc, bc.toString)

    // 2. both sides past the cap, no hot key → plain shuffle join
    val wantLo = lineitem
      .join(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count()
    val (sj, sc) = CostModel.planJoin(lineitem, orders, "l_orderkey", "o_orderkey",
      broadcastRowCap = 10)
    assert(sc.strategy == "shuffle", sc.toString)
    assert(sj.count() == wantLo && sc.estOutRows >= wantLo, sc.toString)

    // 3. a hot key owning half the probe side → salted (C16 reuse),
    // result set identical to the plain join
    import spark.implicits._
    val hot = spark.range(0, 20000)
      .select(when($"id" % 2 === 0, 7L).otherwise($"id").as("k"),
        concat(lit("p"), $"id").as("pl"))
    val dim = spark.range(0, 20000).select($"id".as("kk"), ($"id" * 2).as("v"))
    val want3 = hot.join(dim.withColumnRenamed("kk", "k"), "k").count()
    val (hj, hc) = CostModel.planJoin(hot, dim, "k", "kk",
      broadcastRowCap = 100, skewShare = 0.3)
    assert(hc.strategy == "salted", hc.toString)
    // the hottest-key bound is one-sided the safe way: >= the true
    // hottest count (10000 rows of key 7)
    assert(hc.estHotLeft >= 10000L, hc.toString)
    assert(hj.count() == want3)
    assert(hj.columns.toSeq == Seq("k", "pl", "v"), hj.columns.mkString(","))
  }

  test("ANALYZE TABLE statistics feed the CBO: row counts recorded, dim side broadcast (C164)") {
    // the cost-based half of the catalog story: at 100 TB the
    // optimizer cannot SIZE a join side from file listings alone —
    // ANALYZE writes rowCount/sizeInBytes into the metastore and the
    // planner picks the broadcast side from THOSE stats
    val fact = "graft_cbo_fact"; val dim = "graft_cbo_dim"
    spark.sql(s"DROP TABLE IF EXISTS $fact")
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    Tables.load(spark, sf, "orders").write.format("parquet").saveAsTable(fact)
    Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.format("parquet").saveAsTable(dim)
    try {
      spark.sql(s"ANALYZE TABLE $fact COMPUTE STATISTICS")
      spark.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS")
      // rowCount only surfaces through plan stats under the CBO flag
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val factStats = spark.table(fact).queryExecution.optimizedPlan.stats
      val dimStats = spark.table(dim).queryExecution.optimizedPlan.stats
      assert(dimStats.rowCount.isDefined &&
        dimStats.rowCount.get.toLong ==
          Tables.load(spark, sf, "customer").count(),
        s"dim rowCount ${dimStats.rowCount}")
      assert(factStats.sizeInBytes > dimStats.sizeInBytes,
        "stats must rank the fact above the dim")
      // no hint anywhere: the planner must choose broadcast for the
      // small ANALYZEd dim on stats alone
      val joined = spark.table(fact)
        .join(spark.table(dim), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"stats-driven broadcast expected:\n${plan.take(800)}")
      assert(joined.count() == Tables.load(spark, sf, "orders").count())
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql(s"DROP TABLE IF EXISTS $fact")
      spark.sql(s"DROP TABLE IF EXISTS $dim")
    }
  }

  test("catalog-managed partitioned table: saveAsTable registers, metastore prunes, partition DML is surgical") {
    // the metastore path (vs the path-based layouts above): a table
    // users address by NAME, partition listing owned by the catalog,
    // pruning decided from catalog metadata at planning time, and
    // partition-level DML that leaves sibling partitions untouched —
    // the warehouse contract a 100 TB table needs (refreshing one day
    // must never rewrite the other thousand)
    val docs = Tables.load(spark, sf, "documents")
    val tbl = "graft_docs_catalog"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    docs.write.partitionBy("lang").format("parquet").saveAsTable(tbl)
    try {
      assert(spark.catalog.tableExists(tbl), "saveAsTable must register in the catalog")
      // catalog owns the partition list
      val parts = spark.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0)).sorted
      assert(parts.length == docs.select("lang").distinct().count(),
        s"catalog partition list wrong: ${parts.mkString(", ")}")
      // name-addressed scan prunes on the partition column at planning
      val scan = spark.table(tbl).where(col("lang") === "en")
      val plan = scan.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"metastore scan did not prune on lang:\n${plan.take(1500)}")
      assert(scan.count() == docs.where(col("lang") === "en").count())
      // pure-SQL users see the same table
      assert(spark.sql(s"SELECT count(*) AS c FROM $tbl").head.getLong(0) == docs.count())
      // partition-surgical DML: overwrite ONE partition through the
      // catalog; every other partition must be bit-identical after
      val othersBefore = spark.table(tbl).where(col("lang") =!= "en")
        .agg(sum(col("doc_id"))).head.getLong(0)
      docs.where(col("lang") === "en").createOrReplaceTempView("graft_docs_en_src")
      spark.sql(
        s"""INSERT OVERWRITE TABLE $tbl PARTITION (lang = 'en')
            SELECT doc_id, text, source, -1::BIGINT AS n_chars
            FROM graft_docs_en_src""")
      val after = spark.table(tbl)
      assert(after.where(col("lang") === "en").agg(max(col("n_chars"))).head.getLong(0) == -1L,
        "en partition not overwritten through the catalog")
      assert(after.where(col("lang") =!= "en").agg(sum(col("doc_id"))).head.getLong(0)
        == othersBefore, "partition overwrite disturbed sibling partitions")
      // catalog append lands only in its own partitions
      val enRows = after.where(col("lang") === "en").count()
      docs.where(col("lang") === "en")
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"), col("lang"))
        .write.mode("append").partitionBy("lang").format("parquet").saveAsTable(tbl)
      assert(spark.table(tbl).where(col("lang") === "en").count() == 2 * enRows)
      assert(spark.table(tbl).where(col("lang") =!= "en").agg(sum(col("doc_id")))
        .head.getLong(0) == othersBefore)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("bucketed join plans without a shuffle exchange") {
    val orders = Tables.load(spark, sf, "orders").limit(500)
    val lineitem = Tables.load(spark, sf, "lineitem").limit(500)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val joined = Scale.bucketedJoin(spark, orders, lineitem, "o_orderkey", 4,
      "graft_orders_b", "graft_lineitem_b")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }
}
