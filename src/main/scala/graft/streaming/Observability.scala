package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R19 (r10): in-flight observability — engine-collected data-quality
  * counters with ZERO extra passes.
  *
  * Production ingest reconciliation ("did every row we read reach the
  * sink, and how many were malformed?") must not cost a second scan of
  * a 100 TB input. Spark's `observe` attaches accumulator-backed
  * aggregates to the frame itself: the counters are collected DURING
  * whatever action the pipeline already runs, and surface
  *  - batch: through `Observation.get` after the action,
  *  - streaming: per micro-batch in `StreamingQueryProgress
  *    .observedMetrics`, next to the engine's own
  *    `stateOperators.numRowsDroppedByWatermark` (the late-data audit
  *    R12's semantics imply but never exposed as a metric).
  *
  * The reference's pipelines log these counters out-of-band (custom
  * aggregators in the Beam runner); `observe` is the Spark-native seam
  * — declarative, fused into the existing pass, exactly-once per
  * micro-batch. Spec: StreamingSpec drives both surfaces and asserts
  * the counters reconcile with the sink AND that a watermark-late row
  * shows up in numRowsDroppedByWatermark, not in the results.
  */
object Observability {

  val MetricsName = "graft_ingest"

  /** Attach the standard ingest counters to any events-shaped frame.
    * Works unchanged on batch frames and streaming sources — observe
    * is plan-level, not sink-level. */
  def withIngestMetrics(df: DataFrame): DataFrame =
    df.observe(MetricsName,
      count(lit(1)).as("n_rows"),
      sum(col("value").isNull.cast("long")).as("n_null_value"),
      sum((col("value") < 0).cast("long")).as("n_negative"),
      max(col("event_id")).as("max_event_id"))
}
