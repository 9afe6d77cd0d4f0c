package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.TrafficStream

/** Streaming throughput bench for the flagship 60/1 pipeline (SURVEY
  * §8 / VERDICT r2 item 7). Prints ONE JSON line.
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
  *  - output rows only cover windows the watermark closed — append
  *    mode holds back the tail by design.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val files = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "16").toInt
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    val input = s"$tmp/input"
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val n = events.count()
    events.repartition(files).write.parquet(input)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(input)
    val out = TrafficStream.maxLaneFlowStream(stream,
      delay = "2 hours", dur = "60 minutes", slide = "1 minute")

    val t0 = System.nanoTime()
    val q = out.writeStream.format("noop")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()

    val batchMs = progress.map(_.durationMs.get("triggerExecution").toLong).sorted
    val outRows = progress.map(_.sink.numOutputRows).sum
    val rowsPerSec = n / secs
    // raw doubles, not locale-dependent f"" interpolation (a comma
    // decimal separator would break the JSON line); an empty progress
    // array (zero input rows) yields nulls, not an exception
    val batchMedian = if (batchMs.isEmpty) "null" else batchMs(batchMs.length / 2).toString
    val batchMax = if (batchMs.isEmpty) "null" else batchMs.max.toString
    println(s"""{"metric":"stream_60_1","rows":$n,"wall_sec":$secs,""" +
      s""""rows_per_sec":$rowsPerSec,"batches":${batchMs.length},""" +
      s""""batch_ms_median":$batchMedian,"batch_ms_max":$batchMax,""" +
      s""""output_rows":$outRows,"sf":"$sfDir","files_per_trigger":$filesPerTrigger}""")
    spark.stop()
  }
}
