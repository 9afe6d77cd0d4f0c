package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.parquet` has shipped `ts` as either parquet TIMESTAMP(NANOS)
  * (early rounds) or TIMESTAMP(MICROS, isAdjustedToUTC=false → Spark
  * TIMESTAMP_NTZ). Normalize both to session-TZ TimestampType at micro
  * precision — the session runs UTC, so values match DuckDB's micro
  * TIMESTAMP bit-for-bit in both cases.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => df
        case _ => df.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
