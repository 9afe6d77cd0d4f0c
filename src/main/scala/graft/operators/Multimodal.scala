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

  // ---- Real decode path: P6 PPM (binary netpbm) ----
  // PPM is uncompressed, so a complete decoder needs no codec library —
  // this path is NOT a stub: real bytes are written by [[syntheticPpm]]
  // and re-parsed by [[decodePpm]] (magic + ASCII header + raw RGB
  // triplets), partition-locally, exactly where libjpeg would sit for
  // compressed formats. The decoded features are hash-checked against a
  // DuckDB oracle that derives the expected values from the generator
  // arithmetic — so a decoder bug (off-by-one in the header scan, sign
  // error in the byte widening) fails the gate.

  /** Deterministic P6 image for an id: w = id%8+1, h = id%5+1, pixel
    * byte j = (id*31 + j) % 256. */
  private[graft] def syntheticPpm(id: Long): Array[Byte] = {
    val w = (id % 8 + 1).toInt
    val h = (id % 5 + 1).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h * 3)(j => ((id * 31 + j) % 256).toByte)
    header ++ px
  }

  /** Parse a P6 header: magic, whitespace-separated ASCII width/height/
    * maxval. Returns (w, h, offset of the first pixel byte). Throws on
    * malformed input — decode errors must surface, not silently zero. */
  private[graft] def ppmHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      var v = 0
      while (pos < bytes.length && bytes(pos).toChar.isDigit) { v = v * 10 + (bytes(pos) - '0'); pos += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(w > 0 && h > 0 && maxval == 255, s"bad PPM header $w x $h maxval=$maxval")
    pos += 1 // single whitespace after maxval, then raw data
    require(bytes.length - pos >= w * h * 3, "truncated pixel data")
    (w, h, pos)
  }

  /** Full decode: (w, h, per-channel means). */
  private[graft] def decodePpm(bytes: Array[Byte]): (Int, Int, Double, Double, Double) = {
    val (w, h, pos) = ppmHeader(bytes)
    val sums = new Array[Long](3)
    var j = 0
    while (j < w * h * 3) { sums(j % 3) += bytes(pos + j) & 0xff; j += 1 }
    val n = (w * h).toDouble
    (w, h, sums(0) / n, sums(1) / n, sums(2) / n)
  }

  /** Nearest-neighbor resize of a P6 blob to outW×outH: source pixel
    * for output (x, y) is (⌊x·w/outW⌋, ⌊y·h/outH⌋) — the standard
    * sampling grid (works for down- AND up-scale; resizing to the
    * source dims is the identity, unit-tested). Returns the raw RGB
    * bytes of the resized image. */
  private[graft] def resizePpmNearest(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val (w, h, pos) = ppmHeader(bytes)
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sx = x * w / outW
        val src = pos + (sy * w + sx) * 3
        val dst = (y * outW + x) * 3
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** doc_id -> real PPM blob (partition-local encode, the media-ingest
    * analogue). */
  def asPpmBlobs(documents: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticPpm(id))))
  }

  /** Oracle-checked end-to-end decode: encode -> binary column ->
    * parse -> features. Map-only (two partition-local passes fused into
    * one stage), no shuffle — the shape a 100 TB media scan needs. */
  def ppmDecodeQuery(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    asPpmBlobs(documents)
      .map { case (id, blob) =>
        val (w, h, r, g, b) = decodePpm(blob)
        (id, blob.length.toLong, w, h, r, g, b)
      }
      .toDF("doc_id", "n_bytes", "width", "height", "mean_r", "mean_g", "mean_b")
      // round in the plan, not the lambda: Spark's round ≡ DuckDB's on
      // these values (established by every other oracle in the repo)
      .withColumn("mean_r", round(col("mean_r"), 6))
      .withColumn("mean_g", round(col("mean_g"), 6))
      .withColumn("mean_b", round(col("mean_b"), 6))
  }

  /** DuckDB mirror derives expectations from the generator arithmetic
    * (it never sees the bytes): header = 'P6\n' + w + ' ' + h +
    * '\n255\n', channel c mean = avg over k of (doc_id*31 + 3k + c) %
    * 256. Sums are exact in doubles (ints < 2^53), so round(.,6)
    * matches the decoder's bit-for-bit. */
  val ppmDecodeQuerySql: String = {
    def mean(c: Int) =
      s"round(list_aggregate(list_transform(generate_series(0, w*h - 1), k -> (doc_id*31 + 3*k + $c) % 256), 'avg'), 6)"
    s"""WITH d AS (SELECT doc_id, (doc_id % 8 + 1)::INTEGER AS w, (doc_id % 5 + 1)::INTEGER AS h FROM documents)
SELECT doc_id,
  (3 + length(w::VARCHAR) + 1 + length(h::VARCHAR) + 1 + 4 + w*h*3)::BIGINT AS n_bytes,
  w AS width, h AS height,
  ${mean(0)} AS mean_r, ${mean(1)} AS mean_g, ${mean(2)} AS mean_b
FROM d"""
  }

  // ---- Real resize path: nearest-neighbor on decoded P6 pixels ----
  // The resize step of a media pipeline, run on genuinely decoded
  // bytes (not a stub): every source image resizes to a fixed 2×2
  // thumbnail, and the oracle re-derives every output byte from the
  // generator arithmetic — value at output (x, y, c) is
  // (doc_id·31 + 3·(⌊y·h/2⌋·w + ⌊x·w/2⌋) + c) % 256 — through a
  // position-weighted checksum, so a wrong sampling grid (off-by-one,
  // x/y swap, channel order) fails the hash. Map-only, no shuffle.
  private val ResizeW = 2
  private val ResizeH = 2

  def resizeQuery(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    asPpmBlobs(documents)
      .map { case (id, blob) =>
        val out = resizePpmNearest(blob, ResizeW, ResizeH)
        var checksum = 0L
        var p = 0
        while (p < out.length) { checksum += (out(p) & 0xff).toLong * (p + 1); p += 1 }
        (id, ResizeW, ResizeH, checksum)
      }
      .toDF("doc_id", "out_w", "out_h", "checksum")
  }

  val resizeQuerySql: String = {
    val rowBytes = ResizeW * 3
    val v = s"(doc_id*31 + 3*(((p // $rowBytes) * h // $ResizeH) * w + (((p % $rowBytes) // 3) * w // $ResizeW)) + (p % 3)) % 256"
    s"""WITH d AS (SELECT doc_id, (doc_id % 8 + 1)::INTEGER AS w, (doc_id % 5 + 1)::INTEGER AS h FROM documents)
SELECT doc_id, $ResizeW AS out_w, $ResizeH AS out_h,
  list_aggregate(list_transform(generate_series(0, ${ResizeW * ResizeH * 3 - 1}), p ->
    ($v) * (p + 1)), 'sum')::BIGINT AS checksum
FROM d"""
  }

  // ---- Real decode path #2: WAV / 16-bit PCM (audio) ----
  // Same honesty contract as the PPM path: [[syntheticWav]] writes a
  // complete RIFF/WAVE container (fmt + data chunks, s16le samples) and
  // [[decodeWav]] is a real chunk-scanning parser — magic checks, chunk
  // walk with word alignment, PCM/bit-depth validation — not a stub.
  // Extracted features (sample count, mean amplitude, RMS, peak) are
  // hash-checked against a DuckDB oracle derived from the generator
  // arithmetic, so a parser bug (endianness, sign extension, chunk
  // offset) fails the gate. This is the audio-feature-extraction seam
  // of a training pipeline: partition-local, map-only, no shuffle.

  private val WavRate = 8000

  /** Deterministic mono 16-bit PCM WAV for an id: n = id%256 + 16
    * samples, sample k = ((id*7919 + k*2731) % 65536) - 32768. */
  private[graft] def syntheticWav(id: Long): Array[Byte] = {
    val n = (id % 256 + 16).toInt
    val dataSize = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavRate).putInt(WavRate * 2) // byte rate = rate * block align
      .putShort(2).putShort(16) // block align, bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) {
      bb.putShort((((id * 7919 + k * 2731) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /** Parse a RIFF/WAVE blob: verify magics, walk the chunk list (word-
    * aligned) to find `fmt ` and `data`, require 16-bit PCM, then fold
    * the s16le samples into (rate, channels, n, mean, rms, peak).
    * Throws on malformed input — decode errors must surface. */
  private[graft] def decodeWav(bytes: Array[Byte]): (Int, Int, Int, Double, Double, Long) = {
    require(bytes.length >= 44, "too short for a WAV header")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE container")
    var pos = 12
    var sampleRate = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(pos)
      val len = bb.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated '$id' chunk")
      if (id == "fmt ") {
        require(len >= 16, "short fmt chunk")
        require(bb.getShort(pos + 8) == 1, "not integer PCM")
        channels = bb.getShort(pos + 10)
        sampleRate = bb.getInt(pos + 12)
        require(bb.getShort(pos + 22) == 16, "not 16-bit")
      } else if (id == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    require(n > 0, "empty sample data")
    var sum = 0L; var sumSq = 0L; var peak = 0L
    var k = 0
    while (k < n) {
      val s = bb.getShort(dataOff + 2 * k).toLong
      sum += s; sumSq += s * s
      val a = math.abs(s); if (a > peak) peak = a
      k += 1
    }
    (sampleRate, channels, n, sum.toDouble / n, math.sqrt(sumSq.toDouble / n), peak)
  }

  /** Oracle-checked end-to-end audio decode: encode -> binary column ->
    * chunk-walk parse -> amplitude features. Map-only, no shuffle. */
  def wavDecodeQuery(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val blob = syntheticWav(id)
        val (rate, ch, n, mean, rms, peak) = decodeWav(blob)
        (id, blob.length.toLong, rate, ch, n.toLong, mean, rms, peak)
      })
      .toDF("doc_id", "n_bytes", "sample_rate", "channels", "n_samples",
        "mean_amp", "rms_amp", "peak_amp")
      .withColumn("mean_amp", round(col("mean_amp"), 6))
      .withColumn("rms_amp", round(col("rms_amp"), 6))
  }

  // ---- Real decode path #3: BMP (uncompressed 24-bit, bottom-up) ----
  // BMP adds the two parsing hazards PPM/WAV lack: rows are stored
  // BOTTOM-UP and padded to 4-byte boundaries. The decoder re-orders to
  // logical top-down and skips padding; a position-weighted checksum of
  // the logical TOP row proves the row order and stride arithmetic
  // (channel means alone are order-independent and would not catch a
  // flipped or mis-strided read).

  /** Deterministic 24-bit BMP: w = id%7+1, h = id%4+1; logical pixel p
    * (row-major top-down), channel c (B,G,R) holds byte
    * (id*13 + 3p + c) % 256; stored bottom-up, rows padded to 4 B. */
  private[graft] def syntheticBmp(id: Long): Array[Byte] = {
    val w = (id % 7 + 1).toInt
    val h = (id % 4 + 1).toInt
    val rowSize = ((3 * w + 3) / 4) * 4
    val dataSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // file rows run bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        var c = 0
        while (c < 3) { bb.put(((id * 13 + 3 * p + c) % 256).toByte); c += 1 }
        x += 1
      }
      var pad = 3 * w
      while (pad < rowSize) { bb.put(0.toByte); pad += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse a 24-bit uncompressed BMP: magic, header fields, bottom-up
    * padded pixel rows -> (w, h, per-channel means, position-weighted
    * checksum of the logical top row). Throws on malformed input. */
  private[graft] def decodeBmp(bytes: Array[Byte]): (Int, Int, Double, Double, Double, Long) = {
    require(bytes.length >= 54, "too short for BMP headers")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    require(bb.getInt(14) == 40, "not a BITMAPINFOHEADER")
    val w = bb.getInt(18); val h = bb.getInt(22)
    require(w > 0 && h > 0, s"bad dimensions $w x $h")
    require(bb.getShort(28) == 24, "not 24-bit")
    require(bb.getInt(30) == 0, "compressed BMP not supported")
    val rowSize = ((3 * w + 3) / 4) * 4
    require(bytes.length - dataOffset >= rowSize * h, "truncated pixel data")
    val sums = new Array[Long](3)
    var topRowSum = 0L
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y // logical row y sits at file row h-1-y
      val base = dataOffset + fileRow * rowSize
      var j = 0
      while (j < 3 * w) {
        val v = bytes(base + j) & 0xff
        sums(j % 3) += v
        if (y == 0) topRowSum += (j + 1).toLong * v
        j += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    (w, h, sums(0) / n, sums(1) / n, sums(2) / n, topRowSum)
  }

  /** Oracle-checked BMP decode: features + the row-order checksum. */
  def bmpDecodeQuery(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val blob = syntheticBmp(id)
        val (w, h, b, g, r, top) = decodeBmp(blob)
        (id, blob.length.toLong, w, h, b, g, r, top)
      })
      .toDF("doc_id", "n_bytes", "width", "height", "mean_b", "mean_g", "mean_r", "top_row_sum")
      .withColumn("mean_b", round(col("mean_b"), 6))
      .withColumn("mean_g", round(col("mean_g"), 6))
      .withColumn("mean_r", round(col("mean_r"), 6))
  }

  /** Generator-arithmetic mirror: channel-c mean = avg over p of
    * (doc_id*13 + 3p + c) % 256; top-row checksum = sum over j in
    * [0, 3w) of (j+1) * ((doc_id*13 + j) % 256) — position-weighted,
    * so a bottom-up or stride bug in the decoder fails the hash. */
  val bmpDecodeQuerySql: String = {
    def mean(c: Int) =
      s"round(list_aggregate(list_transform(generate_series(0, w*h - 1), p -> (doc_id*13 + 3*p + $c) % 256), 'avg'), 6)"
    s"""WITH d AS (SELECT doc_id, (doc_id % 7 + 1)::INTEGER AS w, (doc_id % 4 + 1)::INTEGER AS h FROM documents)
SELECT doc_id,
  (54 + ((3*w + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
  w AS width, h AS height,
  ${mean(0)} AS mean_b, ${mean(1)} AS mean_g, ${mean(2)} AS mean_r,
  list_aggregate(list_transform(generate_series(0, 3*w - 1), j -> (j + 1) * ((doc_id*13 + j) % 256)), 'sum')::BIGINT AS top_row_sum
FROM d"""
  }

  /** DuckDB mirror from the generator arithmetic: sample k of doc d =
    * ((d*7919 + k*2731) % 65536) - 32768; sums are exact in doubles
    * (|s| < 2^15, n <= 271 -> sumSq < 2^53), the /n division and sqrt
    * are the same IEEE ops, so round(.,6) matches bit-for-bit. */
  val wavDecodeQuerySql: String =
    """WITH d AS (SELECT doc_id, (doc_id % 256 + 16)::INTEGER AS n FROM documents),
s AS (SELECT doc_id, n,
  list_transform(generate_series(0, n - 1), k -> ((doc_id*7919 + k*2731) % 65536) - 32768) AS smp
FROM d)
SELECT doc_id, (44 + 2*n)::BIGINT AS n_bytes, 8000 AS sample_rate, 1 AS channels,
  n::BIGINT AS n_samples,
  round(list_aggregate(smp, 'avg'), 6) AS mean_amp,
  round(sqrt(list_aggregate(list_transform(smp, x -> x*x), 'avg')), 6) AS rms_amp,
  list_aggregate(list_transform(smp, x -> abs(x)), 'max')::BIGINT AS peak_amp
FROM s"""

  // ---- L50: audio energy fingerprint (perceptual dedup for audio) ----
  // The audio twin of L42's image dHash (the chromaprint shape without
  // FFT libs, which this container lacks): decode the PCM samples,
  // window them (16 samples/window), take the integer sum of absolute
  // amplitudes per window as its energy, and set one bit per
  // adjacent-window energy comparison. Integer-exact end to end, so
  // the oracle re-derives every fingerprint from the WAV generator
  // arithmetic — an endianness, sign-extension, or window-boundary bug
  // fails the hash. Dedup is the L42 groupBy-argmin shape: identical
  // fingerprints collapse through one narrow shuffle, never a pair
  // join. Map-only decode+hash, one (n_windows, fp) exchange.
  private val AudioWin = 16

  /** s16le samples from a validated RIFF/WAVE blob. */
  private def wavSamples(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE", "not RIFF/WAVE")
    var pos = 12
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && dataOff < 0) {
      val id = tag(pos)
      val len = bb.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated '$id' chunk")
      if (id == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1)
    }
    require(dataOff > 0, "missing data chunk")
    Array.tabulate(dataLen / 2)(i => bb.getShort(dataOff + 2 * i).toInt)
  }

  /** (n_windows, fingerprint): bit w = [energy(w+1) > energy(w)]. */
  private[graft] def audioFpBits(samples: Array[Int]): (Long, Long) = {
    val nw = samples.length / AudioWin
    val e = Array.tabulate(nw) { w =>
      var s = 0L; var i = 0
      while (i < AudioWin) { s += math.abs(samples(w * AudioWin + i).toLong); i += 1 }
      s
    }
    var bits = 0L
    var w = 0
    while (w < nw - 1) { if (e(w + 1) > e(w)) bits |= 1L << w; w += 1 }
    (nw.toLong, bits)
  }

  def audioFingerprint(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val fps = documents.select(col("doc_id")).as[Long]
      .map { id =>
        val (nw, fp) = audioFpBits(wavSamples(syntheticWav(id)))
        (id, nw, fp)
      }
      .toDF("doc_id", "n_windows", "fp")
    val reps = fps.groupBy(col("n_windows"), col("fp"))
      .agg(min(col("doc_id")).as("rep_id"))
    fps.join(reps, Seq("n_windows", "fp"))
      .select(col("doc_id"), col("n_windows"), col("fp"), col("rep_id"),
        (col("doc_id") === col("rep_id")).cast("long").as("is_canonical"))
  }

  /** Oracle from the generator arithmetic: sample k of doc d =
    * ((d·7919 + k·2731) % 65536) − 32768; window energies are exact
    * BIGINT |amp| sums; single-window clips fingerprint to 0. */
  val audioFingerprintSql: String =
    s"""WITH d AS (SELECT doc_id, (doc_id % 256 + 16)::BIGINT AS n FROM documents),
e AS (
  SELECT doc_id, w,
    list_aggregate(list_transform(generate_series(0, ${AudioWin - 1}), i ->
      abs(((doc_id*7919 + (w*$AudioWin + i)*2731) % 65536) - 32768)), 'sum') AS en
  FROM d, unnest(generate_series(0, n // $AudioWin - 1)) AS g(w)),
fps AS (
  SELECT d.doc_id, (d.n // $AudioWin)::BIGINT AS n_windows,
    coalesce(sum(CASE WHEN r.en > l.en THEN 1::BIGINT << l.w ELSE 0::BIGINT END), 0)::BIGINT AS fp
  FROM d
  LEFT JOIN e l ON l.doc_id = d.doc_id AND l.w < d.n // $AudioWin - 1
  LEFT JOIN e r ON r.doc_id = d.doc_id AND r.w = l.w + 1
  GROUP BY d.doc_id, d.n)
SELECT f.doc_id, f.n_windows, f.fp, m.rep_id, (f.doc_id = m.rep_id)::BIGINT AS is_canonical
FROM fps f JOIN (SELECT n_windows, fp, min(doc_id) AS rep_id FROM fps GROUP BY 1, 2) m
  USING (n_windows, fp)"""

  // ---- L42: image perceptual-hash (dHash) dedup ----
  // The image-dedup step of a media curation pipeline (the LAION
  // shape): byte-identical files are the easy case — re-encodes,
  // resizes and slight crops are not, and a perceptual hash catches
  // them where md5 cannot. dHash: resize to a fixed tiny grid
  // (nearest-neighbor through the SAME [[resizePpmNearest]] the resize
  // operator uses), grayscale, and set one bit per adjacent-pixel
  // brightness comparison — scale- and (for NN) byte-shift-robust.
  // 9×7 grid -> 8 comparisons × 7 rows = 56 bits, positive in a
  // BIGINT on both engines. Grayscale is the CHANNEL SUM (not /3):
  // comparing sums is order-identical to comparing means and keeps
  // the arithmetic integer-exact cross-engine.
  //
  // Two queries, two scale shapes:
  //  - exact-phash dedup: groupBy(dhash) min(doc_id) — one narrow
  //    shuffle of (doc_id, long), never a join fan-out; hamming-0
  //    groups (re-encodes) collapse here, NOT in the pair join;
  //  - near-dup pairs (1 <= hamming <= 3): 4 bands × 14 bits
  //    (pigeonhole-complete for d <= 3) with a per-bucket occupancy
  //    cap (hot buckets DROPPED, the L5 MaxDf analogue, mirrored
  //    bit-for-bit in the oracle) so a degenerate hash region can
  //    never go quadratic.
  // The oracle re-derives every dhash from the PPM generator
  // arithmetic (it never sees the bytes), so a resize-grid off-by-one,
  // an x/y swap, or a wrong bit index fails the hash gate.
  private val PhGridW = 9
  private val PhGridH = 7
  private val PhBands = 4
  private val PhBandBits = 14 // 4 × 14 = 56 bits
  private val PhMaxHamming = 3
  private val PhBucketCap = 128L

  /** 56-bit dHash of a P6 blob: NN-resize to 9×7, then bit (y*8 + x)
    * = [graysum(x+1, y) > graysum(x, y)]. */
  private[graft] def dhashBits(ppm: Array[Byte]): Long = {
    val px = resizePpmNearest(ppm, PhGridW, PhGridH)
    def graySum(k: Int): Int =
      (px(k * 3) & 0xff) + (px(k * 3 + 1) & 0xff) + (px(k * 3 + 2) & 0xff)
    var bits = 0L
    var y = 0
    while (y < PhGridH) {
      var x = 0
      while (x < PhGridW - 1) {
        if (graySum(y * PhGridW + x + 1) > graySum(y * PhGridW + x))
          bits |= 1L << (y * (PhGridW - 1) + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** (doc_id, dhash) — map-only: encode + resize + hash fused in one
    * partition-local pass, no shuffle. */
  def imagePhashes(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    asPpmBlobs(documents)
      .map { case (id, blob) => (id, dhashBits(blob)) }
      .toDF("doc_id", "dhash")
  }

  /** Exact perceptual dedup: every doc joins its hash group's
    * representative (min doc_id). One (dhash) shuffle for the group
    * argmin + one narrow join back — the L1 exact-dedup shape on the
    * perceptual key instead of the byte hash. */
  def imagePhashDedup(documents: DataFrame): DataFrame = {
    val ph = imagePhashes(documents)
    val reps = ph.groupBy(col("dhash")).agg(min(col("doc_id")).as("rep_id"))
    ph.join(reps, Seq("dhash"))
      .select(col("doc_id"), col("dhash"),
        col("rep_id"), (col("doc_id") === col("rep_id")).cast("long").as("is_canonical"))
  }

  /** Near-dup pairs at 1 <= hamming <= 3 from capped band buckets.
    * Hamming-0 pairs are deliberately excluded — identical hashes
    * dedup through the groupBy above, never through a pair join (an
    * n-doc re-encode cluster would fan out n² pair rows). */
  def imageNearDup(documents: DataFrame): DataFrame = {
    val ph = imagePhashes(documents)
    val bands = ph.select(col("doc_id"), col("dhash"),
      explode(array((0 until PhBands).map(b => struct(lit(b).as("band"),
        shiftright(col("dhash"), b * PhBandBits)
          .bitwiseAND(lit((1L << PhBandBits) - 1)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("dhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val ok = bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n")).where(col("n") <= PhBucketCap)
      .select(col("band"), col("key"))
    val capped = bands.join(ok, Seq("band", "key"))
    capped.select(col("band"), col("key"), col("doc_id").as("x"), col("dhash").as("hx"))
      .join(capped.select(col("band"), col("key"), col("doc_id").as("y"), col("dhash").as("hy")),
        Seq("band", "key"))
      .where(col("x") < col("y"))
      .select(col("x"), col("y"), col("hx"), col("hy")).distinct()
      .select(col("x"), col("y"),
        bit_count(col("hx").bitwiseXOR(col("hy"))).cast("long").as("hamming"))
      .where(col("hamming").between(1, PhMaxHamming))
  }

  /** Shared oracle CTE: dhash from the generator arithmetic. Source
    * pixel for grid (x, y) is (⌊x·w/9⌋, ⌊y·h/7⌋); its channel-c byte
    * is (doc_id·31 + 3·(sy·w + sx) + c) % 256. */
  private val phashCte: String =
    s"""WITH d AS (SELECT doc_id, (doc_id % 8 + 1)::BIGINT AS w, (doc_id % 5 + 1)::BIGINT AS h FROM documents),
g AS (
  SELECT doc_id, x, y, base % 256 + (base + 1) % 256 + (base + 2) % 256 AS gray
  FROM (SELECT doc_id, x, y, doc_id*31 + 3*((y*h // $PhGridH)*w + (x*w // $PhGridW)) AS base
        FROM d, unnest(generate_series(0, ${PhGridW - 1})) AS gx(x),
             unnest(generate_series(0, ${PhGridH - 1})) AS gy(y))),
ph AS (
  SELECT l.doc_id, sum(CASE WHEN r.gray > l.gray THEN 1::BIGINT << (l.y*${PhGridW - 1} + l.x) ELSE 0 END)::BIGINT AS dhash
  FROM g l JOIN g r ON r.doc_id = l.doc_id AND r.y = l.y AND r.x = l.x + 1
  WHERE l.x < ${PhGridW - 1}
  GROUP BY l.doc_id)"""

  val imagePhashDedupSql: String =
    s"""$phashCte
SELECT p.doc_id, p.dhash, m.rep_id, (p.doc_id = m.rep_id)::BIGINT AS is_canonical
FROM ph p JOIN (SELECT dhash, min(doc_id) AS rep_id FROM ph GROUP BY dhash) m USING (dhash)"""

  val imageNearDupSql: String =
    s"""$phashCte,
bands AS (
  SELECT doc_id, dhash, b, (dhash >> (b*$PhBandBits)) & ${(1L << PhBandBits) - 1} AS key
  FROM ph, unnest(generate_series(0, ${PhBands - 1})) AS t(b)),
ok AS (SELECT b, key FROM bands GROUP BY b, key HAVING count(*) <= $PhBucketCap),
cand AS (
  SELECT DISTINCT l.doc_id AS x, r.doc_id AS y, l.dhash AS hx, r.dhash AS hy
  FROM bands l JOIN ok USING (b, key)
  JOIN bands r ON r.b = l.b AND r.key = l.key AND l.doc_id < r.doc_id)
SELECT x, y, bit_count(xor(hx, hy))::BIGINT AS hamming FROM cand
WHERE bit_count(xor(hx, hy)) BETWEEN 1 AND $PhMaxHamming"""
}
