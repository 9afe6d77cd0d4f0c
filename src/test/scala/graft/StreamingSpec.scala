package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TrafficStream
import graft.streaming.TrafficStream.{SensorEvent, Session}
import graft.traffic.Traffic

/** R8-R12: streaming parity, injector, stateful sessionization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("transformWithState running max matches the batch argmax across micro-batches (R21)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val b1 = Seq(
        SensorEvent(1, t("2024-01-01 00:10:00"), 7, "a", 5.0),
        SensorEvent(2, t("2024-01-01 00:20:00"), 7, "a", 9.0),
        SensorEvent(3, t("2024-01-01 00:30:00"), 8, "a", 4.0))
      val b2 = Seq(
        SensorEvent(4, t("2024-01-01 01:00:00"), 7, "a", 3.0), // below max
        SensorEvent(5, t("2024-01-01 01:10:00"), 8, "a", 8.0), // new max
        SensorEvent(6, t("2024-01-01 01:20:00"), 8, "a", 8.0)) // tie -> min id
      val stream = MemoryStream[SensorEvent]
      val q = graft.streaming.TwsStream.runningMaxStream(stream.toDS())
        .writeStream.format("memory").queryName("tws").outputMode("update")
        .start()
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      q.stop()
      // final state per user = last (largest n_seen) update row
      val fin = spark.table("tws")
        .as[(Long, Double, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._4) }
      assert(fin(7L) == ((7L, 9.0, 2L, 3L)), s"user7 ${fin(7L)}")
      assert(fin(8L) == ((8L, 8.0, 5L, 3L)), s"user8 ${fin(8L)}")
      // and the first micro-batch's update was already the running max
      val mid = spark.table("tws").as[(Long, Double, Long, Long)].collect()
        .filter(r => r._1 == 7L && r._4 == 2L)
      assert(mid.headOption.exists(_._2 == 9.0), s"mid-state $mid")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming maxLaneFlow matches the batch plan on the same data (R8)") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      SensorEvent(1, t("2024-01-01 00:10:00"), 7, "lane1", 5.0),
      SensorEvent(2, t("2024-01-01 00:20:00"), 7, "lane2", 9.0),
      SensorEvent(3, t("2024-01-01 00:40:00"), 8, "lane1", 4.0),
      SensorEvent(4, t("2024-01-01 01:05:00"), 7, "lane3", 2.0))
    val sentinel = SensorEvent(99, t("2024-02-01 00:00:00"), -1, "flush", 0.0)

    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.maxLaneFlowStream(stream.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("mlf").outputMode("append").start()
    stream.addData(data: _*)
    q.processAllAvailable()
    stream.addData(sentinel)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("mlf").where(col("station_id") =!= -1)
      .select("window_start", "station_id", "lane", "max_flow", "event_id")
      .collect().map(_.toSeq).toSet
    val expected = Traffic.maxFlowSliding(data.toDF())
      .select("window_start", "station_id", "lane", "max_flow", "event_id")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming parity holds at the reference's 60/1 window parameters (R8)") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      SensorEvent(1, t("2024-01-01 00:10:00"), 7, "lane1", 5.0),
      SensorEvent(2, t("2024-01-01 00:10:30"), 7, "lane2", 9.0),
      SensorEvent(3, t("2024-01-01 00:40:00"), 8, "lane1", 4.0))
    val sentinel = SensorEvent(99, t("2024-02-01 00:00:00"), -1, "flush", 0.0)
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.maxLaneFlowStream(stream.toDF(), delay = "0 seconds",
        dur = "60 minutes", slide = "1 minute")
      .writeStream.format("memory").queryName("mlf601").outputMode("append").start()
    stream.addData(data: _*)
    q.processAllAvailable()
    stream.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mlf601").where(col("station_id") =!= -1)
      .select("window_start", "station_id", "lane", "max_flow", "event_id")
      .collect().map(_.toSeq).toSet
    val expected = Traffic.maxFlowSliding(data.toDF(), "60 minutes", "1 minute")
      .select("window_start", "station_id", "lane", "max_flow", "event_id")
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.nonEmpty)
    // 60 windows per event; both stations' argmaxes present
    assert(got.count(_(1) == 7L) == 60 || got.count(_(1) == 7L) == 61)
  }

  test("the stateful deque twin matches the batch ordered scan at 60/1 (R5/R8)") {
    implicit val sqlCtx = spark.sqlContext
    // bucket collapse (two events in one minute), a 30-min intra-window
    // gap, a > 60-min gap (the walk's jump), and a second station;
    // batch 2 arrives later but above the watermark
    val batch1 = Seq(
      SensorEvent(1, t("2024-01-01 00:10:00"), 7, "lane1", 5.0),
      SensorEvent(2, t("2024-01-01 00:10:30"), 7, "lane2", 9.0),
      SensorEvent(3, t("2024-01-01 00:40:00"), 7, "lane1", 4.0),
      SensorEvent(5, t("2024-01-01 00:15:00"), 8, "lane1", 4.0))
    val batch2 = Seq(
      SensorEvent(4, t("2024-01-01 03:00:00"), 7, "lane9", 1.0))
    val sentinel = SensorEvent(99, t("2024-02-01 00:00:00"), -1, "flush", 0.0)
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.maxFlowSlidingDequeStream(stream.toDS(), delay = "0 seconds")
      .writeStream.format("memory").queryName("deque601").outputMode("append").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    stream.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("deque601").where(col("station_id") =!= -1)
      .collect().map(_.toSeq).toSet
    val expected = Traffic.maxFlowSlidingScan((batch1 ++ batch2).toDF())
      .select("station_id", "window_start", "lane", "max_flow", "event_id", "recorded_ts")
      .collect().map(_.toSeq).toSet
    assert(got == expected, s"deque twin diverged: missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty)
    // each event contributes ONE bucket entry to state, never 60
    // window copies — the emitted row count still spans all windows
    assert(got.size > (batch1 ++ batch2).size, "windows outnumber events at 60/1")
  }

  test("deque twin survives a checkpointed restart: no duplicate, no missing windows") {
    // driven through the graft-lines DSv2 source so BOTH recovery
    // contracts are exercised: the source resumes from its committed
    // file offset, and flatMapGroupsWithState recovers the bucket map
    // AND the last-emitted cursor (a lost cursor would re-emit closed
    // windows after restart; lost buckets would drop windows)
    val dir = java.nio.file.Files.createTempDirectory("deque-restart-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("deque-restart-ckpt").toString
    def writeFile(n: Int, evs: Seq[SensorEvent]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f"$dir/f$n%03d.txt"),
        evs.map(e => s"${e.event_id}|${e.ts.getTime},${e.user_id},${e.event_type},${e.value}")
          .mkString("", "\n", "\n"))
    def pipeline() = {
      val parsed = spark.readStream.format("graft-lines").load(dir)
        .select(col("event_id"),
          split(col("line"), ",").as("f"))
        .select(col("event_id"),
          timestamp_millis(col("f").getItem(0).cast("long")).as("ts"),
          col("f").getItem(1).cast("long").as("user_id"),
          col("f").getItem(2).as("event_type"),
          col("f").getItem(3).cast("double").as("value"))
        .as[SensorEvent]
      TrafficStream.maxFlowSlidingDequeStream(parsed, delay = "0 seconds")
    }
    // a Buffer, not a Set: duplicate emissions across the restart
    // boundary must be VISIBLE, not silently collapsed
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    def sink(batch: org.apache.spark.sql.Dataset[TrafficStream.WindowMax], epoch: Long): Unit =
      got.synchronized { got ++= batch.toDF().collect().map(_.toSeq) }

    val run1 = Seq(
      SensorEvent(1, t("2024-01-01 00:10:00"), 7, "lane1", 5.0),
      SensorEvent(2, t("2024-01-01 00:30:00"), 7, "lane2", 9.0),
      SensorEvent(3, t("2024-01-01 00:55:00"), 8, "lane1", 4.0))
    val run2 = Seq(
      SensorEvent(4, t("2024-01-01 01:10:00"), 7, "lane3", 2.0),
      SensorEvent(5, t("2024-01-01 01:20:00"), 8, "lane2", 6.0))
    val sentinel = SensorEvent(99, t("2024-02-01 00:00:00"), -1, "flush", 0.0)

    writeFile(0, run1)
    val q1 = pipeline().writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink _).start()
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = got.synchronized(got.size)

    writeFile(1, run2)
    writeFile(2, Seq(sentinel))
    val q2 = pipeline().writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink _).start()
    q2.processAllAvailable()
    q2.stop()

    val expected = Traffic.maxFlowSlidingScan((run1 ++ run2).toDF())
      .select("station_id", "window_start", "lane", "max_flow", "event_id", "recorded_ts")
      .collect().map(_.toSeq).toSet
    val gotRows = got.synchronized(got.toVector).filter(_.head != -1L)
    assert(gotRows.size == gotRows.distinct.size,
      s"duplicate emission across restart: ${gotRows.groupBy(identity).filter(_._2.size > 1).keys}")
    val gotFinal = gotRows.toSet
    assert(gotFinal == expected,
      s"restart diverged: missing=${expected -- gotFinal} extra=${gotFinal -- expected}")
    assert(afterRun1 < expected.size, "some windows must close only after the restart")
    assert(gotFinal.nonEmpty)
  }

  test("injector drops empties and Timestamp headers (R9)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = TrafficStream.injectLines(stream.toDS())
      .writeStream.format("memory").queryName("inj").outputMode("append").start()
    stream.addData("Timestamp,station,...", "", "01/01/2024 00:00:00,42,FW1,N", "data2")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("inj").as[String].collect().toSet
    assert(out == Set("01/01/2024 00:00:00,42,FW1,N", "data2"))
  }

  test("foreachBatch parquet sink writes idempotent epochs (R10)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val stream = MemoryStream[String]
    val q = TrafficStream.sinkToParquet(
      TrafficStream.injectLines(stream.toDS()).toDF(),
      s"$dir/out", s"$dir/ckpt").start()
    stream.addData("a", "b", "")
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$dir/out/epoch=0").as[String].collect().toSet
    assert(rows == Set("a", "b"))
  }

  test("native session_window stream matches the batch operator exactly (R20)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.sessionWindowStream(stream.toDS().toDF(), "1 minute")
      .writeStream.format("memory").queryName("nsess").outputMode("append").start()
    // user 7: two events 5 min apart (one session), then a 2-hour gap
    // opens a second; user 8's far-future event drives the watermark
    // past both so append mode emits them
    val evs = Seq(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "e", 1.5),
      SensorEvent(2, t("2024-01-01 00:05:00"), 7, "e", 2.25),
      SensorEvent(3, t("2024-01-01 02:00:00"), 7, "e", 4.0))
    stream.addData(evs: _*)
    q.processAllAvailable()
    stream.addData(SensorEvent(9, t("2024-01-02 00:00:00"), 8, "e", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("nsess")
      .where(col("user_id") === 7)
      .select("user_id", "start_ts", "end_ts", "n_events", "sum_value")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(_._2.getTime)
    // parity: the BATCH operator over the same rows is the contract
    val batch = graft.operators.Relational.sessionWindow(
        evs.toDF().where(col("user_id") === 7))
      .select("user_id", "start_ts", "end_ts", "n_events", "sum_value")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(_._2.getTime)
    assert(got.toSeq == batch.toSeq, s"stream $got vs batch $batch")
    assert(got.length == 2 && got(0)._4 == 2 && got(0)._5 == 3.75 &&
      got(0)._3 == t("2024-01-01 00:05:00"))
  }

  test("stateful sessionization closes sessions on gap and on timeout (R12)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.sessionizeStream(stream.toDS(), gapMinutes = 30, delay = "1 minute")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // session 1: two events 5 min apart; then a 2-hour gap in the SAME
    // batch closes it and opens session 2.
    stream.addData(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "e", 1.0),
      SensorEvent(2, t("2024-01-01 00:05:00"), 7, "e", 1.0),
      SensorEvent(3, t("2024-01-01 02:00:00"), 7, "e", 1.0))
    q.processAllAvailable()
    // advance the watermark far past session 2's timeout -> emitted via
    // EventTimeTimeout without any further event for user 7.
    stream.addData(SensorEvent(9, t("2024-01-02 00:00:00"), 8, "e", 1.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").as[Session].collect()
      .filter(_.user_id == 7).sortBy(_.start_ts.getTime)
    assert(sessions.length == 2)
    assert(sessions(0).n_events == 2 && sessions(0).end_ts == t("2024-01-01 00:05:00"))
    assert(sessions(1).n_events == 1 && sessions(1).start_ts == t("2024-01-01 02:00:00"))
  }

  test("file-based readStream drives the injector + extract pipeline (R9)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fstream").toString
    new java.io.File(s"$dir/in").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in/part1.txt"),
      "Timestamp,header,line\n\n1|" +
        (Seq("01/05/2024 03:04:05", "42", "FW2", "N", "", "", "", "123") ++
          (1 to 42).map(_ => "7")).mkString(",") + "\n")
    val lines = spark.readStream.text(s"$dir/in").as[String](org.apache.spark.sql.Encoders.STRING)
    val parsed = Traffic.extractLanes(
      TrafficStream.injectLines(lines).toDF("raw")
        .select(
          // get()/try_cast, not getItem()/cast: extractLanes' null
          // filter is pushable below this projection, so these exprs
          // can evaluate on not-yet-filtered header/blank lines (ANSI)
          expr("try_cast(get(split(raw, '\\\\|'), 0) AS BIGINT)").as("event_id"),
          expr("get(split(raw, '\\\\|'), 1)").as("line")))
    val q = parsed.writeStream.format("memory").queryName("fstream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fstream")
    assert(out.count() == 8) // 8 valid lanes from the one data line
    assert(out.where(col("station_id") === "42").count() == 8)
  }

  test("windowing follows payload event time, not arrival order (R9 timestamp-attribute semantics)") {
    // The reference's injector publishes with a `timestamp` attribute
    // (PubsubFileInjector.java:84-87) so subscribers window by EVENT
    // time. With a line source that attribute is re-derived by parsing
    // the payload — so a line arriving in a LATER batch but carrying an
    // EARLIER timestamp must land in its own (earlier) window, not the
    // arrival-time one.
    implicit val sqlCtx = spark.sqlContext
    def line(ts: String) =
      (1 to 50).map {
        case 1 => ts
        case 2 => "42"
        case 3 => "FW1"
        case 4 => "N"
        case 8 => "123"
        case n if n >= 12 && n <= 49 && (n - 12) % 5 <= 2 => "7"
        case _ => ""
      }.mkString(",")
    val stream = MemoryStream[String]
    val windowed = Traffic.extractLanes(
      TrafficStream.injectLines(stream.toDS()).toDF("raw")
        .select(lit(1L).as("event_id"), col("raw").as("line")))
      .withWatermark("recorded_ts", "2 hours")
      .groupBy(window(col("recorded_ts"), "1 hour").as("w"))
      .count()
      .select(col("w.start").as("ws"), col("count"))
    val q = windowed.writeStream.format("memory").queryName("evtime")
      .outputMode("append").start()
    stream.addData(line("01/01/2024 02:10:00"))            // arrives first
    q.processAllAvailable()
    stream.addData(line("01/01/2024 00:30:00"))            // earlier event time, later arrival
    q.processAllAvailable()
    stream.addData(line("01/01/2024 12:00:00"))            // advances watermark, flushes both
    q.processAllAvailable()
    q.stop()
    val got = spark.table("evtime").as[(Timestamp, Long)].collect().toMap
    assert(got.get(t("2024-01-01 02:00:00")).contains(8L), s"first line's window wrong: $got")
    assert(got.get(t("2024-01-01 00:00:00")).contains(8L),
      s"late-arriving earlier event not windowed by payload time: $got")
  }

  test("streaming dedup drops at-least-once replays within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.dedupStream(stream.toDF(), delay = "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    stream.addData(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "e", 1.0),
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "e", 1.0), // same-batch replay
      SensorEvent(2, t("2024-01-01 00:10:00"), 7, "e", 2.0))
    q.processAllAvailable()
    stream.addData(SensorEvent(1, t("2024-01-01 00:00:00"), 7, "e", 1.0)) // cross-batch replay
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("stream-static enrichment joins the dim without shuffling the stream") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "station-seven"), (8L, "station-eight")).toDF("sid", "name")
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.enrichStream(stream.toDF(), dim, "user_id", "sid")
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    stream.addData(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "e", 1.0),
      SensorEvent(2, t("2024-01-01 00:01:00"), 9, "e", 1.0)) // no dim match
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enrich").select("event_id", "name")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(out(1L).contains("station-seven"))
    assert(out(2L).isEmpty) // left join keeps unmatched stream rows
  }

  test("stream-stream interval join correlates events within the bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[SensorEvent]
    val buys = MemoryStream[SensorEvent]
    val joined = TrafficStream.correlateStreams(clicks.toDF(), buys.toDF(), withinMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("corr").outputMode("append").start()
    clicks.addData(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "click", 1.0),
      SensorEvent(2, t("2024-01-01 00:00:00"), 8, "click", 1.0))
    buys.addData(
      SensorEvent(11, t("2024-01-01 00:10:00"), 7, "purchase", 5.0), // within 30 min
      SensorEvent(12, t("2024-01-01 02:00:00"), 8, "purchase", 5.0)) // outside bound
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("corr").select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 11L)))
  }

  test("left-outer stream-stream join emits unmatched rows after the watermark closes the interval") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[SensorEvent]
    val buys = MemoryStream[SensorEvent]
    val joined = TrafficStream.correlateStreamsLeftOuter(
      clicks.toDF(), buys.toDF(), withinMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("lcorr")
      .outputMode("append").start()
    clicks.addData(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "click", 1.0), // will match
      SensorEvent(2, t("2024-01-01 00:00:00"), 8, "click", 1.0)) // never matches
    buys.addData(
      SensorEvent(11, t("2024-01-01 00:10:00"), 7, "purchase", 5.0))
    q.processAllAvailable()
    // before the watermark closes u8's interval, its null-extension
    // must NOT have been emitted (a match could still arrive)
    val early = spark.table("lcorr").where(col("a_id") === 2).count()
    assert(early == 0, "outer row finalized before the interval closed")
    // push both watermarks past a_ts + interval + delay
    clicks.addData(SensorEvent(98, t("2024-01-01 12:00:00"), 99, "click", 0.0))
    buys.addData(SensorEvent(99, t("2024-01-01 12:00:00"), 99, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lcorr")
      .where(col("a_id").isin(1L, 2L))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(rows == Set((1L, Some(11L)), (2L, None)),
      s"matched row joins, unmatched row null-extends: $rows")
  }

  test("typed case-class encoder round-trips the record (R11)") {
    val ds = Seq(SensorEvent(1, t("2024-01-01 00:00:00"), 7, "lane1", 5.0)).toDS()
    assert(ds.as[SensorEvent].head() == SensorEvent(1, t("2024-01-01 00:00:00"), 7, "lane1", 5.0))
  }

  test("streaming gap-fill matches the batch ForwardFill on closed hours") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      SensorEvent(1, t("2024-01-01 00:03:10"), 7, "a", 2.5),
      SensorEvent(2, t("2024-01-01 00:03:40"), 7, "a", 1.5), // same minute: sums to 4.0
      SensorEvent(3, t("2024-01-01 00:07:00"), 7, "a", 9.0),
      SensorEvent(4, t("2024-01-01 00:30:00"), 8, "a", 5.0))
    val sentinel = SensorEvent(99, t("2024-02-01 00:00:00"), -1, "flush", 0.0)
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.gapFillStream(stream.toDS())
      .writeStream.format("memory").queryName("gf").outputMode("append").start()
    stream.addData(data: _*)
    q.processAllAvailable()
    stream.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gf").where(col("station_id") =!= -1)
    assert(got.count() == 120) // two closed (station, hour) grids
    val batch = graft.operators.Relational.gapFill(data.toDF())
      .select("station_id", "minute", "flow", "filled")
      .collect().map(_.toSeq).toSet
    assert(got.select("station_id", "minute", "flow", "filled")
      .collect().map(_.toSeq).toSet == batch)
    // spot-check the fill: minutes 3..6 of station 7 carry 4.0 (2.5+1.5)
    val m4 = got.where(col("station_id") === 7 &&
      col("minute") === t("2024-01-01 00:05:00")).head()
    assert(m4.getAs[Double]("flow") == 4.0 && m4.getAs[Long]("filled") == 1L)
  }

  test("curation map stages run unchanged on a stream (quality/scrub/sample)") {
    // the curation operators are Column pipelines, so the SAME builders
    // accept a streaming DataFrame — micro-batch results must equal the
    // batch run on identical data
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the cat sat on the mat with a friend of the house", "en"),
      (2L, "mail me at a.b@example.com or see https://example.com/x", "en"),
      (3L, "der hund und die katze sind ein team", "de"),
      (4L, "el perro y la casa 123!!!", "es"))
    val stream = MemoryStream[(Long, String, String)]
    val streamed = stream.toDF().toDF("doc_id", "text", "lang")
    val out = operators.TextAnalysis.quality(streamed)
      .join(operators.TextAnalysis.piiScrub(streamed), "doc_id")
    val q = out.writeStream.format("memory").queryName("cur").outputMode("append").start()
    stream.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val batchDf = docs.toDF("doc_id", "text", "lang")
    val expected = operators.TextAnalysis.quality(batchDf)
      .join(operators.TextAnalysis.piiScrub(batchDf), "doc_id")
      .collect().map(_.toSeq).toSet
    assert(spark.table("cur").collect().map(_.toSeq).toSet == expected)
    assert(expected.nonEmpty)
    // the deterministic sampler keeps the SAME docs on stream and batch
    // (md5 threshold — no partition-seeded RNG to diverge)
    val sampleStream = MemoryStream[(Long, String, String)]
    val q2 = operators.Curation.deterministicSample(
        sampleStream.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("smp").outputMode("append").start()
    sampleStream.addData((1L to 200L).map(i => (i, "t", if (i % 3 == 0) "en" else "de")): _*)
    q2.processAllAvailable()
    q2.stop()
    val gotIds = spark.table("smp").select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = operators.Curation.deterministicSample(
        (1L to 200L).map(i => (i, "t", if (i % 3 == 0) "en" else "de")).toDF("doc_id", "text", "lang"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == batchIds && gotIds.nonEmpty && gotIds.size < 200)
  }

  test("streaming anomaly flags match the batch RANGE-frame computation (C28)") {
    // out-of-order arrival across micro-batches; equal-ts peers planted
    // (batch RANGE frames include peers, so the stream must group them);
    // a far-future sentinel closes the watermark over every real event
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, ts: String, v: Double) =
      SensorEvent(id, t(ts), uid, "x", v)
    // a trailing window INCLUDES the current event, so a lone spike
    // inflates its own variance: z² ≈ n−1, and a 3σ flag needs n ≥ 11.
    // Ten baselines + the spike cross that line (hand-checked:
    // (11·9500−19500)² = 7.22e9 > 9·(11·q−s²) = 6.50e9).
    val baselines = (1 to 8).map { i =>
      ev(i, 7, f"2024-01-0${1 + (i - 1) / 4}%d ${((i - 1) % 4) * 6}%02d:00:00", 10.0)
    } ++ Seq(
      ev(9, 7, "2024-01-03 00:00:00", 10.0),
      ev(10, 7, "2024-01-03 00:00:00", 10.0)) // equal-ts peer pair
    val real = baselines ++ Seq(
      ev(20, 7, "2024-01-04 00:00:00", 95.0), // the spike, n = 11
      ev(21, 7, "2024-01-12 00:00:00", 10.0), // window slid past everything
      ev(30, 8, "2024-01-01 00:00:00", 1.0), ev(31, 8, "2024-01-01 06:00:00", 1.0))
    val sentinel = ev(99, 999, "2024-03-01 00:00:00", 0.0)
    val stream = MemoryStream[SensorEvent]
    // delay must cover the fixture's multi-day disorder — with a short
    // delay Spark itself drops the late rows (watermark semantics, same
    // as the batch-drop contract of every other streaming operator)
    val q = TrafficStream.anomalyStream(stream.toDS(), delay = "10 days")
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    // adversarial delivery order, split across batches; the
    // watermark-pushing 01-12 event arrives last so no real event is
    // watermark-late (late-drop semantics are Spark's, tested elsewhere)
    val byId = real.map(e => e.event_id -> e).toMap
    stream.addData(byId(5), byId(1), byId(30), byId(9)); q.processAllAvailable()
    stream.addData(byId(20), byId(3), byId(2), byId(31), byId(10), byId(6)); q.processAllAvailable()
    stream.addData(byId(4), byId(7), byId(8), byId(21)); q.processAllAvailable()
    stream.addData(sentinel); q.processAllAvailable()
    q.stop()
    val got = spark.table("anom")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val expected = graft.operators.Relational.anomalyFlags(real.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected, s"stream $got\nbatch $expected")
    assert(expected.exists(_._5 == 1L), "fixture must contain a flagged anomaly")
    assert(expected.exists(t => t._5 == 0L && t._4 > 1), "and unflagged windowed events")
  }

  test("streaming funnel emits each conversion exactly once, matching batch reached=3 rows (C30)") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, ts: String, tpe: String) =
      SensorEvent(id, t(ts), uid, tpe, 0.0)
    val real = Seq(
      // u1 converts; the qualifying click is NOT the first click seen
      // (an out-of-window one precedes it)
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 12:30:00", "click"),  // > 1h after t1: no
      ev(3, 1, "2024-01-01 10:40:00", "click"),  // qualifies: t2
      ev(4, 1, "2024-01-01 11:20:00", "purchase"), // within 1h of t2
      // u2 stalls at stage 2 (purchase too late)
      ev(10, 2, "2024-01-01 10:00:00", "view"),
      ev(11, 2, "2024-01-01 10:30:00", "click"),
      ev(12, 2, "2024-01-01 13:00:00", "purchase"),
      // u3 never views
      ev(20, 3, "2024-01-01 10:00:00", "click"),
      ev(21, 3, "2024-01-01 10:10:00", "purchase"))
    val sentinel = ev(99, 999, "2024-03-01 00:00:00", "x")
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.funnelStream(stream.toDS(), delay = "10 days")
      .writeStream.format("memory").queryName("fun").outputMode("append").start()
    val byId = real.map(e => e.event_id -> e).toMap
    stream.addData(byId(3), byId(10), byId(20)); q.processAllAvailable()
    stream.addData(byId(1), byId(12), byId(2), byId(21)); q.processAllAvailable()
    stream.addData(byId(4), byId(11)); q.processAllAvailable()
    stream.addData(sentinel); q.processAllAvailable()
    // a second sentinel wave: a duplicate emission would surface here
    stream.addData(ev(100, 998, "2024-03-02 00:00:00", "x")); q.processAllAvailable()
    q.stop()
    val got = spark.table("fun").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
    val batch = graft.operators.Relational.funnel(real.toDF())
      .where(col("reached") === 3)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
    assert(got.toSet == batch.toSet, s"stream ${got.toSeq} vs batch ${batch.toSeq}")
    assert(got.length == got.toSet.size && got.nonEmpty, "exactly-once emission")
    assert(batch.map(_._1).toSet == Set(1L), "only u1 converts in the fixture")
  }

  test("funnel conversion tombstone suppresses a second post-conversion chain (C30)") {
    // the exactly-once contract's hard case: the first conversion
    // finalizes with NOTHING pending (state would be empty without a
    // tombstone), then the same user runs a complete second chain
    // inside the GC horizon — it must be absorbed, not re-emitted
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, ts: String, tpe: String) =
      SensorEvent(id, t(ts), uid, tpe, 0.0)
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.funnelStream(stream.toDS(), delay = "10 days")
      .writeStream.format("memory").queryName("funtomb").outputMode("append").start()
    // chain 1 (converts)
    stream.addData(
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:40:00", "click"),
      ev(3, 1, "2024-01-01 11:20:00", "purchase"))
    q.processAllAvailable()
    // watermark pusher ripens chain 1 -> conversion emits, rest empty
    stream.addData(ev(90, 999, "2024-01-20 00:00:00", "x")); q.processAllAvailable()
    stream.addData(ev(91, 998, "2024-01-20 00:00:00", "x")); q.processAllAvailable()
    // chain 2: complete and above the current watermark (2024-01-10)
    stream.addData(
      ev(4, 1, "2024-01-15 10:00:00", "view"),
      ev(5, 1, "2024-01-15 10:30:00", "click"),
      ev(6, 1, "2024-01-15 11:00:00", "purchase"))
    q.processAllAvailable()
    // two more pushers: ripen chain 2, then let every timeout fire
    stream.addData(ev(92, 997, "2024-02-20 00:00:00", "x")); q.processAllAvailable()
    stream.addData(ev(93, 996, "2024-03-20 00:00:00", "x")); q.processAllAvailable()
    stream.addData(ev(94, 995, "2024-04-20 00:00:00", "x")); q.processAllAvailable()
    q.stop()
    val got = spark.table("funtomb").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
    assert(got.length == 1, s"duplicate conversion emitted: ${got.toSeq}")
    assert(got.head._1 == 1L && got.head._2 == t("2024-01-01 10:00:00"),
      s"the one row must be chain 1's: ${got.head}")
  }

  test("funnel state drains: dead chains and converted tombstones are GC'd (C30)") {
    // bounded-state as a measurement, like the anomaly drain spec: once
    // the watermark proves a chain can't complete (next stage window
    // expired, nothing pending) the user's state row must disappear,
    // and a converted user's tombstone must go one horizon later
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, ts: String, tpe: String) =
      SensorEvent(id, t(ts), uid, tpe, 0.0)
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.funnelStream(stream.toDS(), delay = "1 minute")
      .writeStream.format("memory").queryName("fungc").outputMode("append").start()
    stream.addData(
      // u1 converts -> tombstone
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:30:00", "click"),
      ev(3, 1, "2024-01-01 11:00:00", "purchase"),
      // u2 stalls after click (purchase window dies at 11:30)
      ev(10, 2, "2024-01-01 10:00:00", "view"),
      ev(11, 2, "2024-01-01 10:30:00", "click"),
      // u3 never views
      ev(20, 3, "2024-01-01 10:00:00", "click"))
    q.processAllAvailable()
    // march the watermark far past every deadline, re-waking each user
    // (one batch arms the GC timeout against the new watermark, the
    // next lets it fire)
    Seq("2024-01-02", "2024-02-01", "2024-03-01", "2024-04-01", "2024-05-01")
      .zipWithIndex.foreach { case (d, i) =>
        stream.addData(ev(100 + i, 900 + i, s"$d 00:00:00", "x"))
        q.processAllAvailable()
      }
    val fin = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    val got = spark.table("fungc").collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L, "u1's single conversion")
    // at most the last pusher's own not-yet-dead row may remain
    assert(fin <= 1, s"funnel state must drain to ~0, found $fin rows")
  }

  test("anomaly stream state drains once the watermark passes the GC horizon (C28)") {
    // the bounded-state claim as a measurement: after the watermark
    // moves a full window span past a user's last event, that user's
    // state entry must be gone (event-time-timeout GC), not merely idle
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SensorEvent]
    val q = TrafficStream.anomalyStream(stream.toDS(), delay = "1 minute")
      .writeStream.format("memory").queryName("anomgc").outputMode("append").start()
    stream.addData(
      SensorEvent(1, t("2024-01-01 00:00:00"), 7, "x", 1.0),
      SensorEvent(2, t("2024-01-01 00:10:00"), 7, "x", 2.0))
    q.processAllAvailable()
    // finalize both events (watermark passes them)
    stream.addData(SensorEvent(3, t("2024-01-02 00:00:00"), 8, "x", 1.0))
    q.processAllAvailable()
    val mid = q.lastProgress.stateOperators.head.numRowsTotal
    assert(mid >= 1, s"user 7 history should still be retained: $mid")
    // push the watermark a window span + slack past EVERYTHING, twice:
    // the first batch arms each user's GC timeout relative to the new
    // watermark, the second lets it fire
    stream.addData(SensorEvent(4, t("2024-02-01 00:00:00"), 9, "x", 1.0))
    q.processAllAvailable()
    stream.addData(SensorEvent(5, t("2024-03-05 00:00:00"), 9, "x", 1.0))
    q.processAllAvailable()
    stream.addData(SensorEvent(6, t("2024-04-10 00:00:00"), 9, "x", 1.0))
    q.processAllAvailable()
    val fin = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(fin < mid + 3, s"state kept growing: $mid -> $fin")
    assert(fin <= 2, s"drained users must be GC'd, not retained: $fin rows")
  }

  test("streaming web curation matches batch stages; replays stay exactly-once (L58s)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val model = operators.TextAnalysis.nbTrain(Tables.load(spark, sf, "documents"))
      .localCheckpoint()
    val stream = MemoryStream[(Long, String)]
    val q = streaming.WebStream.curate(
        stream.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("webcur").outputMode("append").start()
    // feed in two micro-batches, then REPLAY the first half verbatim —
    // page-level dedup must keep the output exactly-once
    val (h1, h2) = docs.splitAt(docs.size / 2)
    stream.addData(h1: _*); q.processAllAvailable()
    stream.addData(h2: _*); q.processAllAvailable()
    stream.addData(h1: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("webcur")
      .select("doc_id", "canon_url", "quality_score", "nb_logit", "pred_keep")
      .collect()
    // exactly-once per page despite the replay
    val canons = got.map(_.getString(1))
    assert(canons.length == canons.distinct.length, "a page row was emitted twice")
    // batch reference: same stage predicates over whichever fetch the
    // stream kept — each kept doc's metrics must equal the batch
    // computation for THAT doc, and its canon_url must be unblocked
    val batchDocs = docs.toDF("doc_id", "text")
    val pageId = col("doc_id") - when(col("doc_id") % 10 === 7, 1).otherwise(0)
    val batchEval = batchDocs
      .withColumn("canon_url", operators.Urls.canonicalizeUrl(
        operators.Urls.urlCol(pageId, pageId % 31 === 13)))
      .withColumn("blocked", operators.Urls.isBlockedDomain(col("canon_url")))
    val ext = operators.Html.extractText(
        operators.Html.asHtml(batchDocs)).select(col("doc_id"), col("extracted").as("text"))
    val nbBatch = operators.TextAnalysis.nbClassify(ext,
        weights = Some(model), heldOutOnly = false)
      .select(col("doc_id"), col("logit"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qBatch = operators.TextAnalysis.quality(ext)
      .select(col("doc_id"), col("quality_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val canonBatch = batchEval.select("doc_id", "canon_url", "blocked")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    got.foreach { r =>
      val id = r.getLong(0)
      val (cu, blocked) = canonBatch(id)
      assert(r.getString(1) == cu && !blocked, s"doc $id url mismatch/blocked")
      assert(r.getDouble(2) == qBatch(id), s"doc $id quality drift")
      assert(r.getDouble(3) == nbBatch(id), s"doc $id logit drift (closure map vs batch join)")
      assert(r.getLong(4) == 1 && r.getDouble(3) > 0)
    }
    // the stream's survivor PAGES equal the batch chain's survivor
    // pages (dedup winner may differ; the page set may not)
    val batchPages = batchEval.where(!col("blocked")).select("doc_id", "canon_url")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter { case (id, _) => qBatch.get(id).exists(_ >= 0.15) &&
        nbBatch.get(id).exists(_ > 0) }
      .map(_._2).toSet
    // every emitted page is a batch-survivor page; a page absent from
    // the stream output means ITS winning fetch failed a later gate —
    // legal only if some fetch of that page fails a gate
    assert(canons.toSet.subsetOf(batchPages), "stream emitted a non-survivor page")
    assert(got.nonEmpty && canons.length < docs.size)
    // the model is a broadcast carrier, not a plan literal (r12): the
    // analyzed plan must not embed the vocab-sized map
    val planStr = streaming.WebStream.curate(batchDocs, model)
      .queryExecution.analyzed.toString
    assert(!planStr.contains("map(") && planStr.length < 20000,
      s"model leaked into the plan (len=${planStr.length})")
  }

  test("streaming misra-gries keeps the heavy-hitter guarantee across micro-batches (L43)") {
    // the MG state is a mergeable summary, so the SAME aggregator runs
    // as a stateful streaming aggregate (the trending-tokens shape):
    // state carries across micro-batches and the N/(cap+1) superset
    // guarantee must hold over the CONCATENATED stream, whatever the
    // batch boundaries
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val agg = new graft.functions.MisraGriesAggregator(31).toColumn
    val out = stream.toDS().groupByKey(_ => 0).agg(agg)
      .map { case (_, (cands, n)) => (cands.toSeq, n) }
    val q = out.writeStream.format("memory").queryName("mg")
      .outputMode("update").start()
    val data = (0 until 20).flatMap(i => Seq.fill(40 - i)(s"h_$i")) ++
      (0 until 600).map(i => s"noise_$i")
    val shuffled = new scala.util.Random(11).shuffle(data)
    shuffled.grouped(300).foreach { batch =>
      stream.addData(batch: _*); q.processAllAvailable()
    }
    q.stop()
    // n grows monotonically across updates: max-n row = final state
    val fin = spark.table("mg").collect()
      .map(r => (r.getSeq[String](0), r.getLong(1))).maxBy(_._2)
    assert(fin._2 == data.size.toLong)
    val cs = fin._1.toSet
    (0 until 20).map(i => s"h_$i" -> (40L - i))
      .filter(_._2 > data.size / 32).foreach { case (tk, _) =>
        assert(cs.contains(tk), s"lost heavy hitter $tk across batches")
      }
    assert(cs.size <= 31, "capacity bound")
  }

  test("streaming datasheet snapshot reconciles bit-exactly with the batch report (L91s)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
    val rows = docs.select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val stream = MemoryStream[(Long, String, String, String)]
    val q = streaming.WebStream.datasheetStream(
        stream.toDS().toDF("doc_id", "text", "lang", "source"))
      .writeStream.format("memory").queryName("dss").outputMode("update").start()
    rows.grouped(120).foreach { b => stream.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()
    // n_docs per key is monotone: the final snapshot is the max row
    val snap = spark.table("dss").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDecimal(5), r.getLong(6))))
      .groupBy(_._1).values.map(_.maxBy(_._2._1)).toMap
    // derive the batch datasheet's rows from the streamed state
    val batch = operators.Curation.datasheet(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nDocs = snap.values.map(_._1).sum
    assert(nDocs.toDouble == batch("n_docs"))
    assert(snap.values.map(_._2).sum.toDouble == batch("n_tokens"))
    assert(snap.values.map(_._3).sum.toDouble == batch("n_chars"))
    // decimal quality sums make the derived mean bit-identical
    val qSum = snap.values.map(v => BigDecimal(v._4)).sum
    val mean = BigDecimal(qSum.toDouble / nDocs)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mean == batch("mean_quality"), s"streamed mean $mean vs ${batch("mean_quality")}")
    val pass = snap.values.map(_._5).sum
    val passShare = BigDecimal(pass.toDouble / nDocs)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(passShare == batch("quality_pass_share"))
    // lang shares derive from per-key counts
    snap.keys.map(_._1).toSet.foreach { (l: String) =>
      val share = BigDecimal(
        snap.filter(_._1._1 == l).values.map(_._1).sum.toDouble / nDocs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(share == batch(s"lang_share:$l"), s"lang $l share drifts")
    }
  }

  test("bloom dedup stream: exactly-once per key across micro-batches, bounded state (L86)") {
    implicit val sqlCtx = spark.sqlContext
    // 180 distinct keys, each arriving 3 times spread ACROSS
    // micro-batches (the state-threading case exact dedup handles with
    // unbounded state); filter sized 10x distincts -> no FP drops here
    val keys = (0 until 180).map(i => s"page_$i")
    val arrivals = keys ++ keys.reverse ++ keys
    val stream = MemoryStream[String]
    val q = streaming.WebStream.bloomDedupStream(stream.toDS())
      .writeStream.format("memory").queryName("bds").outputMode("append").start()
    arrivals.grouped(100).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val emitted = spark.table("bds").collect().map(_.getString(0)).toSeq
    assert(emitted.size == emitted.distinct.size,
      "a key was emitted twice — the no-false-negative invariant broke")
    assert(emitted.toSet == keys.toSet,
      "first occurrences lost despite a filter sized far above distincts")
  }

  test("bloom dedup stream under saturation: still zero duplicates, FP drops priced (L86)") {
    implicit val sqlCtx = spark.sqlContext
    // 600 distinct keys through a deliberately tiny 256-bit filter:
    // saturation forces false positives — the declared trade. The
    // exactly-once invariant must survive; the drop count prices it.
    val keys = (0 until 600).map(i => s"doc_$i")
    val stream = MemoryStream[String]
    val q = streaming.WebStream.bloomDedupStream(stream.toDS(),
        shards = 2, mBits = 256, k = 3)
      .writeStream.format("memory").queryName("bdsat").outputMode("append").start()
    (keys ++ keys).grouped(150).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val emitted = spark.table("bdsat").collect().map(_.getString(0)).toSeq
    assert(emitted.size == emitted.distinct.size, "duplicate emitted under saturation")
    assert(emitted.toSet.subsetOf(keys.toSet))
    assert(emitted.size < keys.size,
      "a 256-bit filter over 600 keys must drop some first occurrences — FP is the trade")
    assert(emitted.size > keys.size / 10,
      s"only ${emitted.size} of ${keys.size} survived — filter behaves like always-full")
  }

  test("bucketed heavy-hitter stream: corpus estimates exact at capacity, superset of batch (L63s)") {
    // cap 255 over a 31-token vocabulary: no bucket ever evicts, so
    // the streamed estimates must EQUAL exact counts — this pins the
    // state threading (MGState round-trips through the case-class
    // state across micro-batches) with zero slack
    implicit val sqlCtx = spark.sqlContext
    val texts = Tables.load(spark, sf, "documents")
      .select("text").as[String].collect().toSeq
    val stream = MemoryStream[String]
    val q = streaming.WebStream.heavyHittersStream(stream.toDS(), buckets = 4)
      .writeStream.format("memory").queryName("hhs").outputMode("update").start()
    texts.grouped(200).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // final snapshot per bucket = max-n row (n_bucket is monotone)
    val fin = spark.table("hhs").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.map(_.maxBy(_._2)).toSeq
    val est = fin.flatMap(_._3.split(",").filter(_.nonEmpty).map { e =>
      val i = e.lastIndexOf(':'); e.take(i) -> e.drop(i + 1).toLong
    }).toMap
    val exact = texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(est == exact, "no-eviction streamed MG must be the exact counts")
    // tokens are sharded: each lives in exactly one bucket, and bucket
    // token totals partition N
    assert(fin.map(_._2).sum == exact.values.sum)
    // superset of the batch operator's final heavy-hitter set
    val batchHh = operators.TextAnalysis.heavyHitters(
      Tables.load(spark, sf, "documents"))
      .select("token").as[String].collect().toSet
    assert(batchHh.subsetOf(est.keySet))
  }

  test("bucketed heavy-hitter stream under eviction: underestimates within the per-bucket MG bound (L63s)") {
    implicit val sqlCtx = spark.sqlContext
    val cap = 4
    // skewed stream: 3 hot tokens + 40 rare — far over capacity, so
    // decrement-alls genuinely fire in every bucket
    val data = Seq.fill(300)("hot_a") ++ Seq.fill(200)("hot_b") ++
      Seq.fill(120)("hot_c") ++
      (0 until 40).flatMap(i => Seq.fill(5)(s"rare_$i"))
    val shuffled = new scala.util.Random(7).shuffle(data)
    val stream = MemoryStream[String]
    val q = streaming.WebStream.heavyHittersStream(stream.toDS(),
        buckets = 2, cap = cap)
      .writeStream.format("memory").queryName("hhe").outputMode("update").start()
    shuffled.grouped(250).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val fin = spark.table("hhe").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.map(_.maxBy(_._2)).toSeq
    val exact = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val bucketOf = (t: String) => math.floorMod(t.hashCode, 2)
    fin.foreach { case (b, nb, cands) =>
      val est = cands.split(",").filter(_.nonEmpty).map { e =>
        val i = e.lastIndexOf(':'); e.take(i) -> e.drop(i + 1).toLong
      }.toMap
      assert(est.size <= cap, "capacity bound per bucket")
      // every estimate is an underestimate within n_bucket/(cap+1)
      est.foreach { case (t, c) =>
        assert(c <= exact(t), s"$t overcounted")
        assert(exact(t) - c <= nb / (cap + 1), s"$t deficit beyond MG bound")
      }
      // guarantee: any token with freq > n_bucket/(cap+1) in THIS
      // bucket must be present (the per-bucket tightening)
      exact.filter { case (t, f) => bucketOf(t) == b && f > nb / (cap + 1) }
        .foreach { case (t, _) => assert(est.contains(t), s"guaranteed $t missing") }
    }
    // the skew makes the guarantee non-vacuous: all three hot tokens
    // must be guaranteed somewhere
    val all = fin.flatMap(_._3.split(",").filter(_.nonEmpty).map(e =>
      e.take(e.lastIndexOf(':')))).toSet
    assert(Set("hot_a", "hot_b", "hot_c").subsetOf(all))
  }
  test("streaming CEP emits the batch matches even when chains span micro-batches (R16)") {
    import graft.streaming.CepStream
    import graft.streaming.CepStream.CepEvent
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000L
    // chains split across batches ON PURPOSE:
    //   user 1: view(b1) click(b2) purchase(b3)       -> match via carried state
    //   user 2: click(b1) purchase(b2), no view       -> no match
    //   user 3: view click in b1, purchase 30h later  -> window exclusion
    //   user 1: second purchase in b3                 -> same chain again
    val b1 = Seq(CepEvent(1, 1, "view", 1 * h), CepEvent(2, 2, "click", 1 * h),
      CepEvent(3, 3, "view", 1 * h), CepEvent(3, 4, "click", 2 * h))
    val b2 = Seq(CepEvent(1, 5, "click", 2 * h), CepEvent(2, 6, "purchase", 2 * h))
    val b3 = Seq(CepEvent(1, 7, "purchase", 4 * h), CepEvent(1, 8, "purchase", 5 * h),
      CepEvent(3, 9, "purchase", 32 * h))
    val stream = MemoryStream[CepEvent]
    val q = CepStream.cepStream(stream.toDS())
      .writeStream.format("memory").queryName("cep").outputMode("append").start()
    Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("cep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 1 * h, 2 * h, 4 * h), (1L, 1 * h, 2 * h, 5 * h)), s"got $got")

    // full parity with the batch operator on the same event log
    val all = (b1 ++ b2 ++ b3)
    val asDf = all.toDF()
      .select(col("userId").as("user_id"), col("eventId").as("event_id"),
        col("eventType").as("event_type"),
        (col("us") / 1000000L).cast("timestamp").as("ts"),
        lit(0.0).as("value"), lit("").as("props"))
    val batch = graft.operators.Relational.cepPattern(asDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == batch, s"stream $got != batch $batch")
  }
  test("edge-triggered alerts: transitions only, hysteresis suppresses flapping (R18)") {
    import graft.streaming.AlertStream
    import graft.streaming.AlertStream.Reading
    implicit val sqlCtx = spark.sqlContext
    // band [lo=5, hi=10]: values flap inside the band without re-paging
    val b1 = Seq(Reading("m", 1, 2.0), Reading("m", 2, 12.0),   // -> alert@2
      Reading("m", 3, 11.0), Reading("m", 4, 7.0))              // in band: silent
    val b2 = Seq(Reading("m", 5, 6.0), Reading("m", 6, 3.0),    // -> recover@6
      Reading("m", 7, 9.0))                                     // below hi: silent
    val b3 = Seq(Reading("m", 8, 15.0),                         // -> alert@8
      Reading("n", 9, 20.0))                                    // second key -> alert@9
    val stream = MemoryStream[Reading]
    val q = AlertStream.edgeAlerts(stream.toDS(), hi = 10.0, lo = 5.0)
      .writeStream.format("memory").queryName("alerts").outputMode("append").start()
    Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("alerts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("m", 2L, "alert"), ("m", 6L, "recover"),
      ("m", 8L, "alert"), ("n", 9L, "alert")), s"got $got")
  }

  test("observe() counters reconcile in batch with no extra scan (R19)") {
    import graft.streaming.Observability
    val df = Seq(
      (1L, t("2024-01-01 00:00:00"), Some(5.0)),
      (2L, t("2024-01-01 00:01:00"), None),
      (3L, t("2024-01-01 00:02:00"), Some(-2.0)))
      .toDF("event_id", "ts", "value")
    val obs = org.apache.spark.sql.Observation(Observability.MetricsName)
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col("value").isNull.cast("long")).as("n_null_value"),
      sum((col("value") < 0).cast("long")).as("n_negative"),
      max(col("event_id")).as("max_event_id"))
    assert(observed.count() == 3)
    val m = obs.get
    assert(m("n_rows") == 3L && m("n_null_value") == 1L &&
      m("n_negative") == 1L && m("max_event_id") == 3L, s"metrics $m")
  }

  test("streaming observe() metrics surface per micro-batch; watermark drops are counted, not silently lost (R19)") {
    import graft.streaming.Observability
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val src = Observability.withIngestMetrics(
      stream.toDF().toDF("event_id", "ts", "value"))
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("obs_counts")
      .outputMode("append").start()
    // batch 1: two on-time rows establish the watermark
    stream.addData((1L, t("2024-01-01 00:05:00"), 1.0),
      (2L, t("2024-01-01 01:00:00"), 2.0))
    q.processAllAvailable()
    // batch 2: one LATE row (beyond watermark) + one on-time flusher
    stream.addData((3L, t("2024-01-01 00:01:00"), 3.0),
      (4L, t("2024-01-01 02:00:00"), 4.0))
    q.processAllAvailable()
    val progresses = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    // observe(): every ingested row is counted per micro-batch, late or not
    val observedRows = progresses.flatMap(p =>
      Option(p.observedMetrics.get(Observability.MetricsName))
        .map(_.getAs[Long]("n_rows"))).sum
    assert(observedRows == 4L, s"observed $observedRows of 4 ingested rows")
    // the late row is DROPPED by the watermark and the drop is COUNTED
    val dropped = progresses.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped == 1L, s"expected exactly 1 watermark-dropped row, got $dropped")
    // and the finalized windows never saw it: the 00:00 window closed at n = 1
    val ws = spark.table("obs_counts").select("ws", "n")
      .as[(Timestamp, Long)].collect().toMap
    assert(ws.get(t("2024-01-01 00:00:00")).contains(1L),
      s"00:00 window must close with only the on-time row, got $ws")
  }
}
