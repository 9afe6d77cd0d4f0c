package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with per-query seconds.
  *
  * Measurement integrity (VERDICT r1 items 3/10, r2 item 5):
  *  - every query is fully materialised through the `noop` datasource
  *    sink — a bare `.count()` lets Catalyst prune unreferenced
  *    projections, so map-only queries would measure row counting, not
  *    the operator;
  *  - one untimed warm pass per query absorbs classloading/JIT/codegen
  *    compilation, then 3 timed passes; the reported number is the
  *    per-query MEDIAN, with [min, max] spread emitted alongside so
  *    machine contention is distinguishable from real deltas;
  *  - the three reps run back-to-back per query in sorted order — the
  *    HOT protocol every round's ledger was measured under, kept for
  *    round-over-round comparability (an A/B this round measured the
  *    alternative, reps separated by a full suite pass: the identical
  *    queries read ~30-50% slower purely from cross-query cache/JIT
  *    eviction — see PLANS.md r12);
  *  - a CANARY measurement (a fixed constant-work aggregate) runs
  *    between every [[CanaryEvery]] queries. The r11 driver bench
  *    showed why: external machine contention during the driver's run
  *    inflated whichever queries ran first (q_anova 9.31 s driver vs
  *    0.38 s clean) and the artifact read as a query regression until
  *    forensically diffed against a clean machine. The canary does
  *    the same work every time, so its per-position timings separate
  *    "the machine was busy here" from "this query got slower" right
  *    in the emitted JSON ("canary": median + [min, max] + per-
  *    position samples; an inflated canary region means discount the
  *    queries timed inside it);
  *  - a failing rep can NEVER make the bench look faster: queries with
  *    any failed rep are reported under "errors" (first exception
  *    message) and excluded from "queries"; "value" (the total) is
  *    emitted as null whenever n_failed > 0, so a consumer comparing
  *    totals across rounds can never mistake a smaller-because-broken
  *    run for a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // At test SF the shuffles are byte-small but often CPU-dense
      // (vector dots, md5 loops); AQE's default 1 MB floor coalesces
      // them to 1-5 tasks and serializes that CPU (the r8 q_knn_graph
      // profile). 64 KB keeps local parallelism; at production SF
      // partitions dwarf either floor, so the setting is inert there.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "64k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // truncate BEFORE escaping: a cut landing inside an escape pair
    // would leave a dangling backslash that breaks the JSON line
    def jsonStr(s: String): String =
      "\"" + s.replaceAll("[\\n\\r\\t]", " ").take(200)
        .replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    // optional args restrict to named queries (local iteration); an
    // unknown name is itself an error entry, not a crash
    // sorted: Map iteration order shifts whenever queries are added,
    // which reshuffles JIT/GC warm-up state across the suite and makes
    // per-query medians incomparable across rounds (pre-r10 ledgers
    // are order-confounded — see PLANS.md r10)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // warm pass (untimed)
    names.foreach { n =>
      try run(SparkEntry.queries(n)) catch { case _: Throwable => }
    }
    val reps = 3
    // the contention canary: identical work every time (a wide
    // codegen'd aggregate, ~0.1 s hot at 32 cores), so any variation
    // in ITS timing is machine state, not query behavior
    val CanaryEvery = 10
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("sum(id * 3 + 1) AS s", "count(*) AS n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    canary() // untimed: absorb the canary's own codegen
    val canaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    val samples: Map[String, Seq[Either[String, Double]]] = names.zipWithIndex.map {
      case (n, i) =>
        if (i % CanaryEvery == 0) canaries += canary()
        n -> (1 to reps).map { _ =>
          try Right(run(SparkEntry.queries(n)))
          catch { case e: Throwable => Left(Option(e.getMessage).getOrElse(e.getClass.getName)) }
        }
    }.toMap
    canaries += canary() // one closing sample
    val canarySorted = canaries.toSeq.sorted
    val canaryJson =
      s"""{"median":${canarySorted(canarySorted.size / 2)},"min":${canarySorted.head},"max":${canarySorted.last},"samples":[${canaries.map(c => math.rint(c * 1000) / 1000).mkString(",")}]}"""
    val (ok, failed) = names.partition(n => samples(n).forall(_.isRight))
    val medians = ok.map { n =>
      val xs = samples(n).collect { case Right(v) => v }.sorted
      n -> xs(reps / 2)
    }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = ok.map { n =>
      val xs = samples(n).collect { case Right(v) => v }
      s"\"" + n + "\":[" + xs.min + "," + xs.max + "]"
    }.mkString("{", ",", "}")
    val errs = failed.map { n =>
      val msg = samples(n).collectFirst { case Left(m) => m }.getOrElse("failed")
      s"\"" + n + "\":" + jsonStr(msg)
    }.mkString("{", ",", "}")
    val total = if (failed.nonEmpty) "null" else medians.map(_._2).sum.toString
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"errors":$errs,"n_failed":${failed.size},"sf":"$sfDir","reps":$reps,"agg":"median","canary":$canaryJson}""")
    // The driver keeps only the TAIL (~2 KB) of sbt's output, and the
    // full line above is long enough that its head can be truncated
    // away (r4 verdict: BENCH_r03/r04 "parsed": null; r5: total line
    // survived but per-query medians were lost). So after the full
    // line, re-emit the medians as SHORT chunk lines of 10 queries,
    // cheapest chunks first — whatever the tail keeps, it keeps whole
    // lines covering the MOST EXPENSIVE queries (the ones regression
    // tracking needs) — and the compact machine-summary line LAST so
    // it always survives.
    val chunks = medians.sortBy(_._2).grouped(10).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      val body = c.map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
        .mkString("{", ",", "}")
      println(s"""{"metric":"chunk","i":${i + 1},"of":${chunks.size},"q":$body}""")
    }
    // Compact FINAL line carries the canary summary too (r12 verdict
    // item #2): the driver keeps only ~2 KB of tail, and without the
    // canary in the surviving line its artifact cannot self-diagnose
    // machine contention the way the full line / BENCH_local.json can.
    val canaryCompact =
      s"""{"median":${math.rint(canarySorted(canarySorted.size / 2) * 1000) / 1000},"min":${math.rint(canarySorted.head * 1000) / 1000},"max":${math.rint(canarySorted.last * 1000) / 1000}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ok.size},"n_failed":${failed.size},"sf":"$sfDir","canary":$canaryCompact}""")
    // Durability (r7 verdict item 7): the driver's tail capture can
    // truncate stdout, losing the cheap queries' medians. Persist the
    // complete line to a repo file so every query's median is
    // recoverable for next-round regression tracking. Full runs only —
    // a name-restricted local iteration must not clobber the ledger.
    if (args.isEmpty) {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"errors":$errs,"n_failed":${failed.size},"sf":"$sfDir","reps":$reps,"agg":"median","canary":$canaryJson}""" + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] ledger write failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
