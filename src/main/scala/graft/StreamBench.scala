package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.TrafficStream

/** Streaming throughput bench for the flagship 60/1 pipeline (SURVEY
  * §8 / VERDICT r2 item 7). Prints ONE JSON line PER PLAN.
  *
  * Method: materialise the sf events as N parquet files, stream them
  * back with `maxFilesPerTrigger` so the run takes several micro-
  * batches (a one-batch run would measure batch Spark with checkpoint
  * overhead), run the watermarked 60/1 sliding argmax into the noop
  * sink, and read the per-batch numbers from the query progress:
  *  - rows_per_sec  = input rows / wall seconds (query start ->
  *    processAllAvailable returning, i.e. every input row processed);
  *  - batch_ms_*    = per-micro-batch end-to-end latency (trigger to
  *    sink commit, includes state-store maintenance);
  *  - state_rows / state_bytes = the state store's own numbers at the
  *    last batch — the surface where the two plans differ: the
  *    declarative window() plan keeps ~dur/slide aggregate copies per
  *    event-minute, the r5 deque twin keeps ONE bucket record
  *    (SURVEY R5) — this bench turns that claim into a measured
  *    ratio;
  *  - output rows only cover windows the watermark closed — append
  *    mode holds back the tail by design, and the sum skips
  *    zero-input drain batches (whose emissions land one batch apart
  *    between the two plans), so small cross-plan output_rows deltas
  *    are a tail-measurement artifact; the StreamingSpec parity test
  *    is the row-identity surface.
  *
  * Plans: `window` = declarative sliding `window()` aggregation;
  * `deque` = `maxFlowSlidingDequeStream` (flatMapGroupsWithState
  * bucket-argmax state). SPARK_GRAFT_STREAM_PLANS selects (default
  * both).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val files = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "16").toInt
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "2").toInt
    val plans = sys.env.getOrElse("SPARK_GRAFT_STREAM_PLANS", "window,deque")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    val input = s"$tmp/input"
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val n = events.count()
    events.repartition(files).write.parquet(input)

    plans.foreach { plan =>
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .parquet(input)
      val out = plan match {
        case "window" => TrafficStream.maxLaneFlowStream(stream,
          delay = "2 hours", dur = "60 minutes", slide = "1 minute")
        case "deque" => TrafficStream.maxFlowSlidingDequeStream(
          stream.as[TrafficStream.SensorEvent], durSlides = 60,
          slideSeconds = 60L, delay = "2 hours").toDF()
        // r5 stateful twins — select via SPARK_GRAFT_STREAM_PLANS
        case "anomaly" => TrafficStream.anomalyStream(
          stream.as[TrafficStream.SensorEvent], delay = "2 hours").toDF()
        case "funnel" => TrafficStream.funnelStream(
          stream.as[TrafficStream.SensorEvent], delay = "2 hours").toDF()
        case other => throw new IllegalArgumentException(s"unknown plan $other")
      }

      val t0 = System.nanoTime()
      val q = out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt-$plan")
        .start()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      q.stop()

      val batchMs = progress.map(_.durationMs.get("triggerExecution").toLong).sorted
      val outRows = progress.map(_.sink.numOutputRows).sum
      val rowsPerSec = n / secs
      val lastState = progress.lastOption.map(_.stateOperators)
        .filter(_.nonEmpty).map(_.head)
      val stateRows = lastState.map(_.numRowsTotal.toString).getOrElse("null")
      val stateBytes = lastState.map(_.memoryUsedBytes.toString).getOrElse("null")
      // raw doubles, not locale-dependent f"" interpolation (a comma
      // decimal separator would break the JSON line); an empty progress
      // array (zero input rows) yields nulls, not an exception
      val batchMedian = if (batchMs.isEmpty) "null" else batchMs(batchMs.length / 2).toString
      val batchMax = if (batchMs.isEmpty) "null" else batchMs.max.toString
      println(s"""{"metric":"stream_60_1","plan":"$plan","rows":$n,"wall_sec":$secs,""" +
        s""""rows_per_sec":$rowsPerSec,"batches":${batchMs.length},""" +
        s""""batch_ms_median":$batchMedian,"batch_ms_max":$batchMax,""" +
        s""""output_rows":$outRows,"state_rows":$stateRows,"state_bytes":$stateBytes,""" +
        s""""sf":"$sfDir","files_per_trigger":$filesPerTrigger}""")
    }
    spark.stop()
  }
}
