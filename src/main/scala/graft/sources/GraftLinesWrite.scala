package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Write side of the `graft-lines` connector (SURVEY §2.4) — the
  * BigQueryIO-sink analogue implemented against Spark's public DSv2
  * write API with a REAL two-phase commit protocol, not a toy
  * append:
  *
  *  - every task writes its split to a `_tmp-<uuid>` file (the `_`
  *    prefix makes in-flight output INVISIBLE to the read side, whose
  *    listing skips `_`/`.` files) and reports it in its commit
  *    message; a failed/speculative task's temp is deleted by
  *    `abort()` and, even if the cleanup itself dies, an orphaned
  *    temp is never readable — readers only ever see files the DRIVER
  *    renamed during commit;
  *  - `BatchWrite.commit` renames the temp files to
  *    `part-<writeId>-<partition>` in partition order and appends one
  *    line per file to a `_graft_manifest` — rename-then-manifest
  *    gives atomic visibility per file and an audit surface
  *    (file, rows) for the whole job;
  *  - `StreamingWrite.commit(epochId, ...)` is IDEMPOTENT: a replayed
  *    epoch (its id already in the manifest) deletes the new temps
  *    and changes nothing — exactly-once file output under
  *    micro-batch retries, the same contract a transactional
  *    message-bus sink implements with epoch-fenced transactions;
  *  - truncate mode (`.mode("overwrite")`) removes previously
  *    committed part files and resets the manifest inside the same
  *    driver-side commit, so overwrite is also all-or-nothing from
  *    the reader's perspective.
  *
  * Output format is the injector's `id|line` payload format — a
  * round-trip through the sink and back through [[GraftLinesSource]]
  * is byte-stable (spec-pinned).
  */
object GraftLinesWrite {
  val ManifestName = "_graft_manifest"

  private[sources] def validate(schema: StructType): Unit = {
    val ok = schema.fields.length == 2 &&
      schema.fields.exists(f => f.name == "event_id" && f.dataType == LongType) &&
      schema.fields.exists(f => f.name == "line" && f.dataType == StringType)
    require(ok, s"graft-lines writes exactly (event_id BIGINT, line STRING), got $schema")
  }

  def manifestEpochs(dir: String): Set[String] = {
    val m = new File(dir, ManifestName)
    if (!m.exists()) Set.empty
    else scala.io.Source.fromFile(m, "UTF-8").getLines()
      .map(_.split('\t')(0)).toSet
  }

  /** Rename temps to visible part files (partition order) + append
    * manifest lines tagged `tag` (a write id or an epoch id). */
  private[sources] def commitFiles(dir: String, tag: String,
      messages: Array[WriterCommitMessage], truncate: Boolean): Unit = {
    val root = new File(dir)
    if (!root.isDirectory) require(root.mkdirs() || root.isDirectory,
      s"cannot create sink directory $dir")
    if (truncate) {
      root.listFiles().filter(f => f.getName.startsWith("part-")).foreach(_.delete())
      new File(root, ManifestName).delete()
    }
    val entries = messages.collect { case m: GraftCommitMessage => m }
      .sortBy(_.partitionId)
    val lines = new StringBuilder
    entries.foreach { m =>
      val target = s"part-$tag-${m.partitionId}"
      Files.move(Paths.get(dir, m.tmpName), Paths.get(dir, target),
        StandardCopyOption.ATOMIC_MOVE)
      lines.append(s"$tag\t$target\t${m.rows}\n")
    }
    Files.write(Paths.get(dir, ManifestName),
      lines.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private[sources] def dropTemps(dir: String, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftCommitMessage => m }
      .foreach(m => new File(dir, m.tmpName).delete())
}

case class GraftCommitMessage(partitionId: Int, tmpName: String, rows: Long)
    extends WriterCommitMessage

class GraftLinesWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  GraftLinesWrite.validate(info.schema())
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new GraftLinesWriteImpl(path, info.schema(), truncateFirst)
}

class GraftLinesWriteImpl(path: String, schema: StructType, truncateFirst: Boolean)
    extends Write {
  override def toBatch: BatchWrite = new GraftLinesBatchWrite(path, schema, truncateFirst)
  override def toStreaming: StreamingWrite = new GraftLinesStreamingWrite(path, schema)
}

class GraftLinesBatchWrite(path: String, schema: StructType, truncateFirst: Boolean)
    extends BatchWrite {
  private val writeId = UUID.randomUUID().toString.take(8)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftLinesWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftLinesWrite.commitFiles(path, s"b$writeId", messages, truncateFirst)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftLinesWrite.dropTemps(path, messages)
}

/** Epoch-fenced streaming commit: replayed epochs are no-ops. */
class GraftLinesStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftLinesWriterFactory(path, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    if (GraftLinesWrite.manifestEpochs(path).contains(s"e$epochId"))
      GraftLinesWrite.dropTemps(path, messages) // replay: already committed
    else
      GraftLinesWrite.commitFiles(path, s"e$epochId", messages, truncate = false)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftLinesWrite.dropTemps(path, messages)
}

class GraftLinesWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftLinesDataWriter(path, schema, partitionId)
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftLinesDataWriter(path, schema, partitionId)
}

/** Task-side writer: `id|line` rows into an invisible temp file; the
  * commit message hands the temp to the driver for the rename. */
class GraftLinesDataWriter(dir: String, schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {
  private val idIdx = schema.fieldIndex("event_id")
  private val lineIdx = schema.fieldIndex("line")
  private val tmpName = s"_tmp-${UUID.randomUUID().toString}"
  new File(dir).mkdirs()
  private val out = Files.newBufferedWriter(
    Paths.get(dir, tmpName), StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write(record.getLong(idIdx).toString)
    out.write('|')
    out.write(record.getUTF8String(lineIdx).toString)
    out.write('\n')
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    GraftCommitMessage(partitionId, tmpName, rows)
  }
  override def abort(): Unit = {
    out.close()
    new File(dir, tmpName).delete()
  }
  override def close(): Unit = ()
}
