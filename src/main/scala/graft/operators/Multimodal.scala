package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable._

/** Multimodal opaque-binary column plumbing (SURVEY §2.3 L12).
  *
  * Real pipelines carry image/audio/video as `binary` columns with a
  * typed metadata struct; decode/resize/frame-sample run as partition-
  * local functions over the bytes. The decode libraries are absent in
  * this container, so [[decodeStub]] derives deterministic fake
  * metadata from the bytes (md5-based) — the Spark-side plumbing
  * (schema, batching, partition locality) is real and tested, and the
  * md5 derivation is DuckDB-portable so the metadata query is
  * hash-checked against the oracle.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** documents -> (doc_id, blob) : the text bytes stand in for media. */
  def asBlobs(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
      col("text"))

  /** Deterministic fake metadata, expression-only (codegen'd): the
    * md5-derived width/height emulate a decoder header read. DuckDB
    * lacks md5(BLOB), so the digest/derivations use the source text —
    * byte-identical to the blob for UTF-8. */
  def metaQuery(documents: DataFrame): DataFrame =
    asBlobs(documents).select(
      col("doc_id"),
      octet_length(col("blob")).cast("long").as("n_bytes"),
      md5(col("text")).as("digest"),
      (md5Long(lit("w"), col("text")) % 1920 + 1).cast("int").as("width"),
      (md5Long(lit("h"), col("text")) % 1080 + 1).cast("int").as("height"),
      lit(3).as("channels"),
      when(col("doc_id") % 3 === 0, "png").otherwise("jpeg").as("format"))

  val metaQuerySql: String =
    s"""SELECT doc_id, octet_length(encode(text)) ::BIGINT AS n_bytes, md5(text) AS digest,
  (${md5LongSql("'w'", "text")} % 1920 + 1)::INTEGER AS width,
  (${md5LongSql("'h'", "text")} % 1080 + 1)::INTEGER AS height,
  3 AS channels,
  CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format
FROM documents"""

  /** Partition-local decode stub: where a real decoder (libjpeg etc.)
    * would run, one codec context per partition. The header fields are
    * deterministic fakes derived from the bytes; swap the marked block
    * for a real codec and the schema/batching contract stays intact. */
  def decodeStub(blobs: DataFrame): DataFrame = {
    val outSchema = StructType(blobs.schema.fields :+
      StructField("meta", metaSchema, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    blobs.mapPartitions { iter =>
      // <-- real impl: open codec context here (per partition)
      iter.map { r =>
        val blob = r.getAs[Array[Byte]]("blob")
        // <-- real impl: decode header from `blob`; deterministic fake:
        val meta = Row(blob.length % 1920 + 1, blob.length % 1080 + 1, 3, "stub")
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Oracle-checked view over [[frameSample]]: frame count plus first/
    * last frame digests (md5 of the UTF-8 text — DuckDB lacks
    * md5(BLOB)), exercising the sampling arithmetic end-to-end. */
  def framesQuery(documents: DataFrame): DataFrame = {
    val frames = frameSample(asBlobs(documents), frameBytes = 16, everyK = 2)
    frames.select(
      col("doc_id"),
      size(col("frames")).cast("long").as("n_frames"),
      md5(decode(element_at(col("frames"), 1), "UTF-8")).as("first_md5"),
      md5(decode(element_at(col("frames"), size(col("frames"))), "UTF-8")).as("last_md5"))
  }

  /** Mirrors frameSample(frameBytes=16, everyK=2): frame i (0-based)
    * is substr(text, i*32+1, 16); n = greatest(floor(bytes/32)-1,0)+1.
    * floor() is explicit — DuckDB's double->int cast rounds where
    * Spark's truncates. */
  val framesQuerySql: String =
    """WITH f AS (
  SELECT doc_id, text,
    greatest(floor(octet_length(encode(text)) / 32)::INTEGER - 1, 0) + 1 AS n_frames
  FROM documents)
SELECT doc_id, n_frames::BIGINT AS n_frames,
  md5(substr(text, 1, 16)) AS first_md5,
  md5(substr(text, (n_frames - 1) * 32 + 1, 16)) AS last_md5
FROM f"""

  /** Frame sampling stub: every k-th fixed-size "frame" of the payload
    * as a bounded array — the partition/batch shape of a real video
    * sampler (codec calls replaced by deterministic slices). */
  def frameSample(blobs: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    blobs.select(col("doc_id"),
      transform(
        sequence(lit(0), greatest(
          (octet_length(col("blob")) / (frameBytes * everyK)).cast("int") - 1, lit(0))),
        i => encode(col("text").substr(lit(1) + i * frameBytes * everyK, lit(frameBytes)), "UTF-8")
      ).as("frames"))
}
