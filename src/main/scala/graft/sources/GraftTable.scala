package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption, StandardOpenOption}
import java.util
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Transactional snapshot-table layer over the `graft-lines` payload
  * format (SURVEY §2.4; the audit half of the BigQuery-table analogue
  * the reference's sink implies — the reference only ever appends to
  * a managed table and trusts the service for isolation; this layer
  * supplies the same guarantees over plain files, the way
  * log-structured table formats do on object stores).
  *
  * Protocol — optimistic concurrency on an atomic version log, the
  * public design of log-structured table formats (Delta/Iceberg
  * papers), re-expressed minimally:
  *
  *  - The table state is a chain of snapshot files
  *    `_snap-%08d` (v1, v2, …). Each snapshot is a FULL listing of
  *    the visible data files (`file\trows` per line) plus a header
  *    (`#op\tappend|truncate`). Readers never list the directory for
  *    data files — they resolve ONE snapshot and read exactly its
  *    listing, so a half-renamed concurrent commit is invisible and a
  *    read is repeatable against its pinned version (snapshot
  *    isolation).
  *  - Writers stage data invisibly (the `_tmp-` discipline of
  *    [[GraftLinesWrite]]), rename to visible part files, then
  *    PUBLISH by atomically creating `_snap-{N+1}` (ATOMIC_MOVE of a
  *    staged snapshot onto a name that must not exist — the move
  *    throws if a concurrent writer claimed the version first). The
  *    create IS the commit point: a crash before it leaves only
  *    unreferenced files (invisible to every reader); after it the
  *    commit is complete.
  *  - On a lost race an APPEND rebases: re-read the winner's listing,
  *    recompose (append commutes with append), publish at the next
  *    version. A TRUNCATE (overwrite) that loses its race ABORTS —
  *    overwrite serializes against every concurrent commit, the
  *    write-conflict rule log-structured formats apply to
  *    non-commuting operations.
  *  - Truncate never deletes data files — it publishes a snapshot
  *    with an empty base, so readers pinned to older versions stay
  *    correct (time travel for free: `.option("version", n)`).
  *    Physical cleanup is the explicit [[GraftTable.vacuum]], which
  *    only removes files no snapshot ≥ the retained horizon
  *    references — the vacuum/expire-snapshots split every
  *    log-structured format makes.
  *
  * Scale note: a full listing per snapshot is O(files) per commit; at
  * 100 TB the production variants log DELTAS with periodic
  * checkpoints to make commits O(changed files). The protocol
  * (atomic-create fencing, rebase-on-commute, snapshot-pinned reads)
  * is unchanged by that representation choice, which is why the
  * simpler full listing is the right local build.
  *
  * Registered as `graft-table` (DataSourceRegister). Reads support
  * the same column pruning/filter pushdown as `graft-lines` (shared
  * reader factory); writes accept the same (event_id, line) schema.
  */
object GraftTable {
  private val SnapPrefix = "_snap-"

  private def snapName(v: Long): String = f"$SnapPrefix$v%08d"

  private def snapVersion(name: String): Long =
    name.stripPrefix(SnapPrefix).toLong

  /** Latest committed version, 0 when the table is empty. */
  def latestVersion(dir: String): Long = {
    val d = new File(dir)
    if (!d.isDirectory) 0L
    else d.listFiles().iterator
      .map(_.getName).filter(_.startsWith(SnapPrefix))
      .map(snapVersion).foldLeft(0L)(math.max)
  }

  /** (op, Seq(file, rows)) of a snapshot; empty listing for v0. */
  def readSnapshot(dir: String, version: Long): (String, Seq[(String, Long)]) = {
    if (version == 0L) return ("init", Nil)
    val p = Paths.get(dir, snapName(version))
    require(Files.exists(p), s"graft-table: no snapshot v$version in $dir")
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
    val op = lines.iterator().next().stripPrefix("#op\t")
    val files = scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala
      .drop(1).filter(_.nonEmpty)
      .map { ln => val a = ln.split('\t'); (a(0), a(1).toLong) }
      .toSeq
    (op, files)
  }

  /** Atomically claim `version`: stage the snapshot content under a
    * temp name, then HARD-LINK it onto the final name. link(2) is the
    * fence — it fails atomically when the target exists. (A rename
    * would NOT fence: POSIX rename() silently REPLACES an existing
    * target, so two racers both "succeed" and one commit vanishes —
    * caught live by the concurrent-appenders spec, which lost 2 of 12
    * commits under the first, ATOMIC_MOVE-based build.) Returns false
    * — without having changed anything visible — when a concurrent
    * writer already owns the version. */
  private[graft] def tryPublish(dir: String, version: Long, op: String,
      files: Seq[(String, Long)]): Boolean = {
    val target = Paths.get(dir, snapName(version))
    if (Files.exists(target)) return false
    val body = new StringBuilder(s"#op\t$op\n")
    files.foreach { case (f, r) => body.append(s"$f\t$r\n") }
    val tmp = Paths.get(dir, s"_tmp-snap-${UUID.randomUUID()}")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** Epochs already committed to this table (streaming idempotence):
    * the op field of a streaming append carries `append@e<epoch>`. */
  private[graft] def committedEpochs(dir: String): Set[Long] =
    (1L to latestVersion(dir)).flatMap { v =>
      try {
        val op = readSnapshot(dir, v)._1
        if (op.startsWith("append@e")) Some(op.stripPrefix("append@e").toLong)
        else None
      } catch { case _: IllegalArgumentException => None } // vacuumed
    }.toSet

  /** Commit loop: rename temps once, then publish with rebase-on-race
    * (append) or single-shot fencing (truncate). `epoch` tags a
    * streaming micro-batch commit — the op records it so a REPLAYED
    * epoch can be detected and dropped (exactly-once under
    * micro-batch retries, the graft-lines manifest contract lifted
    * onto the version log). Returns the committed version. */
  private[graft] def commit(dir: String, baseVersion: Long, truncate: Boolean,
      messages: Array[WriterCommitMessage], epoch: Option[Long] = None): Long = {
    val root = new File(dir)
    if (!root.isDirectory) require(root.mkdirs() || root.isDirectory,
      s"cannot create table directory $dir")
    val writeId = UUID.randomUUID().toString.take(8)
    val entries = messages.collect { case m: GraftCommitMessage => m }
      .sortBy(_.partitionId)
    val added = entries.map { m =>
      val target = s"part-t$writeId-${m.partitionId}"
      Files.move(Paths.get(dir, m.tmpName), Paths.get(dir, target),
        StandardCopyOption.ATOMIC_MOVE)
      (target, m.rows)
    }.toSeq
    var attemptBase = baseVersion
    while (true) {
      // a replayed streaming epoch (its tag already in the log —
      // possibly committed by the attempt we are retrying) must be a
      // no-op: drop our staged-and-renamed files, change nothing
      if (epoch.exists(e => committedEpochs(dir).contains(e))) {
        added.foreach { case (f, _) => Files.deleteIfExists(Paths.get(dir, f)) }
        return latestVersion(dir)
      }
      val base = if (truncate) Nil else readSnapshot(dir, attemptBase)._2
      val op = if (truncate) "truncate"
        else epoch.map(e => s"append@e$e").getOrElse("append")
      if (tryPublish(dir, attemptBase + 1, op, base ++ added))
        return attemptBase + 1
      // lost the race: a concurrent writer owns attemptBase + 1
      val now = latestVersion(dir)
      if (truncate) {
        // overwrite does not commute with ANY concurrent commit —
        // clean up our (still unreferenced, hence invisible) files
        // and surface the conflict instead of silently dropping the
        // winner's rows
        added.foreach { case (f, _) => Files.deleteIfExists(Paths.get(dir, f)) }
        throw new java.util.ConcurrentModificationException(
          s"graft-table: overwrite of $dir based on v$attemptBase " +
            s"conflicts with committed v$now; re-run against the new state")
      }
      attemptBase = now
    }
    throw new IllegalStateException("unreachable")
  }

  /** Physical cleanup: delete data files referenced by NO snapshot
    * with version ≥ `retainFrom` (and drop the older snapshots).
    * Returns the deleted file names. Readers pinned at ≥ retainFrom
    * are unaffected — the vacuum/commit split means deletion is a
    * maintenance decision, never a side effect of a write. */
  def vacuum(dir: String, retainFrom: Long): Seq[String] = {
    val latest = latestVersion(dir)
    val keepVersions = (math.max(1L, retainFrom) to latest)
    val live = keepVersions.flatMap(v => readSnapshot(dir, v)._2.map(_._1)).toSet
    val d = new File(dir)
    if (!d.isDirectory) return Nil
    val victims = d.listFiles().filter { f =>
      (f.getName.startsWith("part-") && !live(f.getName)) ||
        (f.getName.startsWith(SnapPrefix) && snapVersion(f.getName) < retainFrom)
    }
    victims.foreach(_.delete())
    victims.map(_.getName).toSeq
  }

  /** Compaction — the OPTIMIZE maintenance op (the C45 small-files
    * discipline applied to the transactional layer): rewrite the
    * latest snapshot's listing into ≈`targetRowsPerFile`-row files
    * and publish it as op=compact. Data-identical by construction
    * (the rewrite reads the SNAPSHOT-PINNED frame); like overwrite it
    * does not commute with concurrent commits, so a lost race aborts
    * — cleanly, since the staged files are unreferenced until the
    * version fence passes. Old versions keep reading the original
    * files until [[vacuum]]. Returns the committed version. */
  def compact(spark: SparkSession, dir: String,
      targetRowsPerFile: Long = 1000000L,
      expectedVersion: Option[Long] = None): Long = {
    val base = expectedVersion.getOrElse(latestVersion(dir))
    require(base > 0, s"graft-table: nothing to compact in $dir")
    val (_, files) = readSnapshot(dir, base)
    val rows = files.map(_._2).sum
    val parts = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    val staging = new File(dir, s"_compact-${UUID.randomUUID().toString.take(8)}")
    spark.read.format("graft-table").option("version", base.toString)
      .load(dir)
      .repartition(parts.toInt)
      .write.format("graft-table").mode("append")
      .option("path", staging.getAbsolutePath).save()
    val (_, staged) = readSnapshot(staging.getAbsolutePath,
      latestVersion(staging.getAbsolutePath))
    val moved = staged.map { case (f, r) =>
      val target = s"part-c${UUID.randomUUID().toString.take(8)}-$f"
      Files.move(Paths.get(staging.getAbsolutePath, f), Paths.get(dir, target),
        StandardCopyOption.ATOMIC_MOVE)
      (target, r)
    }
    staging.listFiles().foreach(_.delete())
    staging.delete()
    if (tryPublish(dir, base + 1, "compact", moved)) base + 1
    else {
      moved.foreach { case (f, _) => Files.deleteIfExists(Paths.get(dir, f)) }
      throw new java.util.ConcurrentModificationException(
        s"graft-table: compaction of $dir based on v$base conflicts with " +
          s"committed v${latestVersion(dir)}; re-run against the new state")
    }
  }

  /** Audit surface: one row per snapshot — (version, op, n_files,
    * n_rows, n_missing) where n_missing counts referenced files absent
    * from disk (0 for every retained version of a healthy table). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val latest = latestVersion(dir)
    (1L to latest).flatMap { v =>
      try {
        val (op, files) = readSnapshot(dir, v)
        val missing = files.count { case (f, _) => !new File(dir, f).isFile }
        Some((v, op, files.size.toLong, files.map(_._2).sum, missing.toLong))
      } catch { case _: IllegalArgumentException => None } // vacuumed away
    }.toDF("version", "op", "n_files", "n_rows", "n_missing")
  }
}

class GraftTableSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-table"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLinesTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTableTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-table requires a 'path' option")))
}

class GraftTableTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_table($path)"
  override def schema(): StructType = GraftLinesTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTableScanBuilder(path,
      Option(options.get("version")).map(_.toLong),
      Option(options.get("ignoreTruncate")).exists(_.toBoolean))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftTableWriteBuilder(path, info)
}

class GraftTableScanBuilder(path: String, version: Option[Long],
    ignoreTruncate: Boolean)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = GraftLinesTable.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val delegate = new GraftLinesScanBuilder(path)
    val residual = delegate.pushFilters(filters)
    pushed = delegate.pushedFilters()
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new GraftTableScan(path, version, required, pushed, ignoreTruncate)
}

/** Snapshot-pinned scan: the version resolves ONCE, at scan
  * construction — every partition-planning call of this scan (and
  * every retry of it) reads the same file set, whatever commits land
  * meanwhile. */
class GraftTableScan(path: String, version: Option[Long],
    required: StructType, pushed: Array[Filter],
    ignoreTruncate: Boolean = false) extends Scan with Batch {
  private val pinned: Long = version.getOrElse(GraftTable.latestVersion(path))
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTable path=$path, version=$pinned, " +
      s"ReadColumns=${required.fieldNames.mkString("[", ",", "]")}, " +
      s"PushedFilters=${pushed.mkString("[", ", ", "]")}"
  override def planInputPartitions(): Array[InputPartition] =
    GraftTable.readSnapshot(path, pinned)._2
      .map { case (f, _) =>
        GraftLinesPartition(new File(path, f).getAbsolutePath): InputPartition }
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLinesReaderFactory(required, pushed)
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftTableChangeFeed(path, required, pushed, ignoreTruncate)
}

/** Changefeed over the snapshot log — the table-format streaming
  * source: the OFFSET SPACE is the committed version number, so a
  * micro-batch (vS, vE] is replayed deterministically from the
  * immutable snapshots. Per version: op=append emits the listing DIFF
  * (exactly the files that commit added); op=compact emits nothing —
  * the op tag proves the rewrite was data-identical, so unlike
  * formats that must re-emit rewritten files, compaction is invisible
  * to consumers; op=truncate fails the stream (an append-mode
  * consumer cannot represent deletion) unless `ignoreTruncate=true`
  * skips it. */
class GraftTableChangeFeed(path: String, required: StructType,
    pushed: Array[Filter], ignoreTruncate: Boolean)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class VersionOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = VersionOffset(0L)
  override def latestOffset(): Offset =
    VersionOffset(GraftTable.latestVersion(path))
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    ((s + 1) to e).flatMap { v =>
      val (op, files) = GraftTable.readSnapshot(path, v)
      op match {
        case a if a == "append" || a.startsWith("append@e") =>
          val prev = GraftTable.readSnapshot(path, v - 1)._2.map(_._1).toSet
          files.collect { case (f, _) if !prev(f) =>
            GraftLinesPartition(new File(path, f).getAbsolutePath): InputPartition }
        case "compact" => Nil
        case "truncate" if ignoreTruncate => Nil
        case other => throw new IllegalStateException(
          s"graft-table changefeed: non-append commit v$v (op=$other) cannot " +
            "stream in append mode; pass ignoreTruncate=true to skip it")
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLinesReaderFactory(required, pushed)
}

class GraftTableWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  GraftLinesWrite.validate(info.schema())
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftTableBatchWrite(path, info.schema(), truncateFirst)
    override def toStreaming: StreamingWrite =
      new GraftTableStreamingWrite(path, info.schema())
  }
}

/** Epoch-fenced streaming sink into the transactional table: each
  * micro-batch commits one snapshot version tagged `append@e<epoch>`;
  * a replayed epoch detects its own tag in the log and drops its
  * staged files — exactly-once under micro-batch retries, composing
  * with the changefeed (which treats epoch-tagged appends as plain
  * appends) so table-to-table streaming pipelines are end-to-end
  * exactly-once. */
class GraftTableStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftLinesWriterFactory(path, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftTable.commit(path, GraftTable.latestVersion(path), truncate = false,
      messages, epoch = Some(epochId))
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftLinesWrite.dropTemps(path, messages)
}

class GraftTableBatchWrite(path: String, schema: StructType, truncateFirst: Boolean)
    extends BatchWrite {
  // the optimistic-concurrency read point: captured when the write
  // starts, validated at publish time by the version fence
  private val baseVersion = GraftTable.latestVersion(path)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftLinesWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftTable.commit(path, baseVersion, truncateFirst, messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftLinesWrite.dropTemps(path, messages)
}
