package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.traffic.Traffic

/** The custom DSv2 connector (§2.4): correctness, per-file
  * parallelism, column pruning, filter pushdown, malformed-line drops,
  * and composition with the extract pipeline. */
class GraftLinesSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-lines-src").toString
    def tail = "," + Seq.fill(46)("7").mkString(",")
    Files.writeString(Paths.get(s"$d/part0.txt"),
      s"1|01/05/2024 03:04:05,42,FW2,N$tail\n" +
        "garbage line without separator\n" +
        s"2|01/05/2024 03:05:05,42,FW2,N$tail\n")
    Files.writeString(Paths.get(s"$d/part1.txt"),
      s"3|01/05/2024 03:06:05,43,FW3,S$tail\n" +
        s"notanumber|01/05/2024 03:07:05,43,FW3,S$tail\n" +
        s"4|01-05-2024 03:07:05,43,FW3,S$tail\n") // malformed ts: extract drops it
    d
  }

  test("graft-lines reads id|line payloads with one partition per file") {
    val df = spark.read.format("graft-lines").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("event_id", "line"))
    assert(df.count() == 4) // garbage + non-numeric id dropped at the reader
    assert(df.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(df.rdd.getNumPartitions == 2)
  }

  test("event_id filters push into the reader; pruning drops the line column") {
    val df = spark.read.format("graft-lines").load(dir)
    val filtered = df.where(col("event_id") > 2)
    assert(filtered.as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(3L, 4L))
    val plan = filtered.queryExecution.executedPlan.toString
    // event_id is non-nullable, so no IsNotNull is generated; the range
    // predicate is fully consumed by the scan (no residual Filter node)
    assert(plan.contains("PushedFilters=[GreaterThan(event_id,2)]"), plan.take(1500))
    assert(!plan.contains("+- Filter"), "pushed filter must leave no residual Filter node")
    val pruned = df.select("event_id").queryExecution.executedPlan.toString
    assert(pruned.contains("ReadColumns=[event_id]"), pruned.take(1500))
  }

  test("micro-batch stream tracks file offsets and never re-reads a prefix") {
    val d = Files.createTempDirectory("graft-lines-stream").toString
    def tail = "," + Seq.fill(46)("7").mkString(",")
    def writeFile(n: Int, ids: Seq[Long]): Unit =
      Files.writeString(Paths.get(f"$d/f$n%03d.txt"),
        ids.map(i => s"$i|01/05/2024 03:04:05,42,FW2,N$tail").mkString("", "\n", "\n"))
    writeFile(0, Seq(1L, 2L))
    val stream = spark.readStream.format("graft-lines").load(d)
    val q = stream.writeStream.format("memory").queryName("glines")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("glines").count() == 2)
      writeFile(1, Seq(3L))
      writeFile(2, Seq(4L, 5L))
      q.processAllAvailable()
      // new files only — the earlier prefix is not re-read (no dups)
      assert(spark.table("glines").select("event_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(q.lastProgress.sources.head.description.contains("GraftLines"))
    } finally q.stop()
  }

  test("streaming: connector -> extract -> windowed argmax runs end-to-end") {
    val d = Files.createTempDirectory("graft-lines-e2e").toString
    def tail = "," + Seq.fill(46)("7").mkString(",")
    Files.writeString(Paths.get(s"$d/a.txt"),
      s"1|01/05/2024 03:04:05,42,FW2,N$tail\n" +
        s"2|01/05/2024 03:20:05,42,FW2,N$tail\n" +
        s"3|01/05/2024 09:00:00,42,FW2,N$tail\n") // late-hour row advances the watermark
    val lanes = graft.traffic.Traffic.extractLanes(
      spark.readStream.format("graft-lines").load(d))
      .select(col("event_id"), col("recorded_ts").as("ts"),
        col("station_id").cast("long").as("user_id"),
        col("lane").as("event_type"), col("lane_flow").cast("double").as("value"))
    val out = graft.streaming.TrafficStream.maxLaneFlowStream(
      lanes, delay = "1 hour", dur = "60 minutes", slide = "15 minutes")
    val q = out.writeStream.format("memory").queryName("gl_e2e")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second pass so the watermark from batch 1 closes the early windows
      Files.writeString(Paths.get(s"$d/b.txt"),
        s"4|01/05/2024 09:30:00,42,FW2,N$tail\n")
      q.processAllAvailable()
      val rows = spark.table("gl_e2e")
      assert(rows.count() > 0, "watermark-closed windows must emit")
      assert(rows.select("station_id").distinct().as[Long].collect().toSeq == Seq(42L))
    } finally q.stop()
  }

  test("batch write commits atomically and round-trips through the reader") {
    val d = Files.createTempDirectory("graft-lines-sink").toString
    val in = Seq((1L, "alpha,1"), (2L, "beta,2"), (3L, "gamma|with|pipes"))
      .toDF("event_id", "line").repartition(2)
    in.write.format("graft-lines").mode("append").option("path", d).save()
    // visible part files + manifest, no leaked temps
    val names = new java.io.File(d).listFiles().map(_.getName).toSeq
    assert(names.exists(_.startsWith("part-b")), s"$names")
    assert(names.contains(graft.sources.GraftLinesWrite.ManifestName), s"$names")
    assert(!names.exists(_.startsWith("_tmp")), s"temps must not survive commit: $names")
    // round-trip: reader sees exactly the written rows (first '|' splits)
    val back = spark.read.format("graft-lines").load(d)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "alpha,1"), (2L, "beta,2"), (3L, "gamma|with|pipes")))
    // manifest rows audit: totals match
    val manifest = scala.io.Source.fromFile(
      new java.io.File(d, graft.sources.GraftLinesWrite.ManifestName), "UTF-8")
      .getLines().toSeq
    assert(manifest.map(_.split('\t')(2).toLong).sum == 3L, s"$manifest")
    // overwrite truncates previously committed files in the same commit
    Seq((9L, "only")).toDF("event_id", "line")
      .write.format("graft-lines").mode("overwrite").option("path", d).save()
    val after = spark.read.format("graft-lines").load(d)
      .as[(Long, String)].collect().toSeq
    assert(after == Seq((9L, "only")), s"$after")
  }

  test("a failed write aborts invisibly: no partial output reaches the reader") {
    val d = Files.createTempDirectory("graft-lines-abort").toString
    val bad = spark.range(10).select(col("id").as("event_id"),
      when(col("id") < 9, concat(lit("row"), col("id")))
        .otherwise(raise_error(lit("boom"))).as("line"))
    intercept[Exception] {
      bad.write.format("graft-lines").mode("append").option("path", d).save()
    }
    val visible = Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("part-"))
    assert(visible.isEmpty, s"aborted job must leave no visible files: ${visible.toSeq}")
    assert(spark.read.format("graft-lines").load(d).count() == 0)
  }

  test("streaming epoch commit is idempotent: a replayed epoch changes nothing") {
    val d = Files.createTempDirectory("graft-lines-epoch").toString
    // drive the sink through a real streaming query first
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q = mem.toDF().toDF("event_id", "line")
      .writeStream.format("graft-lines")
      .option("path", d)
      .option("checkpointLocation", Files.createTempDirectory("glw-ckpt").toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val committed = spark.read.format("graft-lines").load(d)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(committed == Seq((1L, "a"), (2L, "b")))
    // now replay an already-committed epoch directly against the commit
    // protocol: same epoch id -> temps dropped, nothing visible changes
    val epochs = graft.sources.GraftLinesWrite.manifestEpochs(d)
    assert(epochs.nonEmpty)
    val replayedEpoch = epochs.head.drop(1).toLong
    val sw = new graft.sources.GraftLinesStreamingWrite(d, graft.sources.GraftLinesTable.Schema)
    val w = new graft.sources.GraftLinesWriterFactory(d, graft.sources.GraftLinesTable.Schema)
      .createWriter(0, 0L, replayedEpoch)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      99L, org.apache.spark.unsafe.types.UTF8String.fromString("replayed")))
    val msg = w.commit()
    sw.commit(replayedEpoch, Array(msg))
    val after = spark.read.format("graft-lines").load(d)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after == committed, "replayed epoch must be a no-op")
    val names = new java.io.File(d).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.startsWith("_tmp")), s"replay temps must be dropped: $names")
  }

  test("exactly-once capstone: graft-lines source -> transform -> graft-lines sink across a restart") {
    // the three recovery contracts COMPOSED: committed source file
    // offsets (no re-read), the query checkpoint, and the sink's
    // epoch-fenced two-phase commit — stop the query between batches,
    // restart against the same checkpoint and sink path, and the sink
    // directory must hold every input row exactly once
    val src = Files.createTempDirectory("e1-src").toString
    val out = Files.createTempDirectory("e1-out").toString
    val ckpt = Files.createTempDirectory("e1-ckpt").toString
    def writeFile(n: Int, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(f"$src/f$n%03d.txt"),
        rows.map { case (i, l) => s"$i|$l" }.mkString("", "\n", "\n"))
    def pipeline() = spark.readStream.format("graft-lines").load(src)
      .where(!col("line").startsWith("Timestamp")) // injector filter (R2)
      .select(col("event_id"), upper(col("line")).as("line")) // starter map (R3)
    def run(): Unit = {
      val q = pipeline().writeStream.format("graft-lines")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFile(0, Seq(1L -> "alpha", 2L -> "Timestamp,header,row", 3L -> "beta"))
    run()
    writeFile(1, Seq(4L -> "gamma"))
    writeFile(2, Seq(5L -> "delta", 6L -> "Timestamp,again"))
    run()
    val rows = spark.read.format("graft-lines").load(out)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(1L -> "ALPHA", 3L -> "BETA", 4L -> "GAMMA", 5L -> "DELTA"),
      s"exactly-once violated: $rows")
    // multiple committed epochs must be visible in the manifest (the
    // restart really produced separate fenced commits)
    assert(graft.sources.GraftLinesWrite.manifestEpochs(out).size >= 2)
    val names = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.startsWith("_tmp")), s"no leaked temps: $names")
  }

  test("the connector feeds the extract pipeline end-to-end") {
    val lanes = Traffic.extractLanes(spark.read.format("graft-lines").load(dir))
    // 3 parseable readings (event 4 has the dashed timestamp) × 8 lanes
    assert(lanes.count() == 24)
    assert(lanes.select("station_id").distinct().as[String].collect().toSet ==
      Set("42", "43"))
  }
}
