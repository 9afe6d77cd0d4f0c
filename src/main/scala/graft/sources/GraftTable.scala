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
  *    `_snap-%08d` (v1, v2, …). Each snapshot carries a header
  *    (`#op\t…`, `#kind\tdelta|full`) and a listing (`file\trows` per
  *    line). An APPEND commit is a DELTA: it lists only the files that
  *    commit added — O(changed) per commit, not O(table). A TRUNCATE
  *    or COMPACT is FULL: its listing is the complete visible file
  *    set (those ops reset the base). Readers resolve a version by
  *    walking delta snapshots back to the nearest full snapshot or
  *    checkpoint — never by listing the directory for data files — so
  *    a half-renamed concurrent commit is invisible and a read is
  *    repeatable against its pinned version (snapshot isolation).
  *  - Every [[CkptEvery]]-th version additionally gets a CHECKPOINT
  *    sidecar `_ckpt-%08d` holding the full resolved listing at that
  *    version (written by the version's winner after its publish;
  *    create-if-absent, deterministic content, so a racing duplicate
  *    write is idempotent). Resolution therefore reads
  *    O(CkptEvery + 1) files however long the chain — the delta-log +
  *    periodic-checkpoint shape of the production table formats,
  *    replacing the r11 full-listing-per-commit build (which was
  *    O(files) per commit AND per read).
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
  *    log-structured format makes. Vacuum is double-fenced (r12,
  *    ADVICE r11): an AGE fence (unreferenced data files younger than
  *    `retentionMs` survive, protecting a concurrent commit's
  *    renamed-but-not-yet-published files from deletion) and a RANGE
  *    fence (`retainFrom` must name an existing version — a typo'd
  *    horizon refuses instead of wiping the table). Before deleting
  *    old snapshots it materializes a checkpoint at the horizon, so
  *    every retained version stays resolvable.
  *
  * Registered as `graft-table` (DataSourceRegister). Reads support
  * the same column pruning/filter pushdown as `graft-lines` (shared
  * reader factory); writes accept the same (event_id, line) schema.
  */
object GraftTable {
  private val SnapPrefix = "_snap-"
  private val CkptPrefix = "_ckpt-"
  private val Ckpt1Prefix = "_ckpt1-"

  /** Checkpoint cadence: resolving any version reads at most
    * CkptEvery−1 delta snapshots, then FullCkptEvery/CkptEvery−1
    * delta-WINDOW checkpoints, then one full listing — ≤ 31 file reads
    * on any chain length. r13 (verdict #8): the 16-cadence checkpoint
    * is now a DELTA-WINDOW sidecar (the union of its window's
    * additions — O(changed), the Iceberg manifest shape), so no commit
    * ever rewrites the full visible set except the FullCkptEvery-th
    * (amortized O(table)/256 per commit), and vacuum's horizon
    * materialization. */
  private[graft] val CkptEvery = 16L
  private[graft] val FullCkptEvery: Long = CkptEvery * CkptEvery

  /** Default vacuum age fence for unreferenced data files —
    * comfortably longer than a commit's rename-to-publish window, so
    * vacuum never deletes a concurrent writer's staged-and-renamed
    * files out from under its about-to-land publish. */
  val DefaultRetentionMs: Long = 10L * 60 * 1000

  private def snapName(v: Long): String = f"$SnapPrefix$v%08d"

  private def ckptName(v: Long): String = f"$CkptPrefix$v%08d"

  private def ckpt1Name(v: Long): String = f"$Ckpt1Prefix$v%08d"

  private def snapVersion(name: String): Long =
    name.stripPrefix(SnapPrefix).stripPrefix(Ckpt1Prefix)
      .stripPrefix(CkptPrefix).toLong

  /** Latest committed version, 0 when the table is empty. */
  def latestVersion(dir: String): Long = {
    val d = new File(dir)
    if (!d.isDirectory) 0L
    else d.listFiles().iterator
      .map(_.getName).filter(_.startsWith(SnapPrefix))
      .map(snapVersion).foldLeft(0L)(math.max)
  }

  private def parseListing(lines: Seq[String]): Seq[(String, Long)] =
    lines.filter(_.nonEmpty).filterNot(_.startsWith("#"))
      .map { ln => val a = ln.split('\t'); (a(0), a(1).toLong) }

  /** Raw (op, kind, listing) of one snapshot FILE — no resolution.
    * kind is `delta` (listing = files this commit added) or `full`
    * (listing = the complete visible set). */
  private def rawSnapshot(dir: String, version: Long): (String, String, Seq[(String, Long)]) = {
    val p = Paths.get(dir, snapName(version))
    require(Files.exists(p), s"graft-table: no snapshot v$version in $dir")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(p, StandardCharsets.UTF_8)).asScala.toSeq
    val op = lines.head.stripPrefix("#op\t")
    val kind = lines.collectFirst {
      case ln if ln.startsWith("#kind\t") => ln.stripPrefix("#kind\t")
    }.getOrElse("full")
    (op, kind, parseListing(lines))
  }

  /** The checkpointed full listing at `version`, if one was written. */
  private def ckptListing(dir: String, version: Long): Option[Seq[(String, Long)]] = {
    val p = Paths.get(dir, ckptName(version))
    if (!Files.exists(p)) None
    else Some(parseListing(scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(p, StandardCharsets.UTF_8)).asScala.toSeq))
  }

  /** The delta-WINDOW checkpoint at `version`, if one was written:
    * (kind, files). kind `delta` = the additions of versions
    * (version − CkptEvery, version]; kind `full` = a full base (a
    * full-kind commit landed inside the window). */
  private def ckpt1Listing(dir: String, version: Long): Option[(String, Seq[(String, Long)])] = {
    val p = Paths.get(dir, ckpt1Name(version))
    if (!Files.exists(p)) None
    else {
      val lines = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(p, StandardCharsets.UTF_8)).asScala.toSeq
      val kind = lines.collectFirst {
        case ln if ln.startsWith("#kind\t") => ln.stripPrefix("#kind\t")
      }.getOrElse("full")
      Some((kind, parseListing(lines)))
    }
  }

  /** Full visible listing at `version`: walk delta snapshots back to
    * the nearest window checkpoint, then window checkpoints back to
    * the nearest full checkpoint / full snapshot / v0 — ≤ CkptEvery−1
    * + FullCkptEvery/CkptEvery−1 + 1 file reads on any chain length. */
  private def resolveListing(dir: String, version: Long): Seq[(String, Long)] = {
    var w = version
    var deltas: List[Seq[(String, Long)]] = Nil // oldest-first via prepend
    while (w > 0) {
      ckptListing(dir, w) match {
        case Some(base) => return deltas.foldLeft(base)(_ ++ _)
        case None =>
          ckpt1Listing(dir, w) match {
            case Some(("full", base)) => return deltas.foldLeft(base)(_ ++ _)
            case Some((_, files)) =>
              // window checkpoint: covers (w − CkptEvery, w]
              deltas = files :: deltas
              w -= CkptEvery
            case None =>
              val (_, kind, files) = rawSnapshot(dir, w)
              if (kind == "full") return deltas.foldLeft(files)(_ ++ _)
              deltas = files :: deltas
              w -= 1
          }
      }
    }
    deltas.foldLeft(Seq.empty[(String, Long)])(_ ++ _)
  }

  /** (op, full visible listing) of a version; empty listing for v0.
    * Delegates resolution to [[resolveListing]] starting AT `version`
    * (not `version − 1`): after a vacuum at horizon v, v's own
    * checkpoint is what keeps a delta-v read resolvable. */
  def readSnapshot(dir: String, version: Long): (String, Seq[(String, Long)]) = {
    if (version == 0L) return ("init", Nil)
    (rawSnapshot(dir, version)._1, resolveListing(dir, version))
  }

  /** (op, kind, files ADDED by version `v`) — the changefeed's view.
    * Delta snapshots carry their additions directly; a full-kind
    * append (only producible by driving [[tryPublish]] by hand) falls
    * back to the predecessor diff. Non-append ops pass through. */
  private[graft] def rawAppendListing(dir: String, v: Long): (String, String, Seq[(String, Long)]) = {
    val (op, kind, files) = rawSnapshot(dir, v)
    val isAppend = op == "append" || op.startsWith("append@")
    if (kind == "delta" || !isAppend) (op, kind, files)
    else {
      val prev = resolveListing(dir, v - 1).map(_._1).toSet
      (op, kind, files.filterNot(f => prev(f._1)))
    }
  }

  /** Write the `_ckpt-` sidecar for `version` if absent. Content is a
    * pure function of the immutable snapshot chain, so a concurrent
    * duplicate write is idempotent (create-if-absent, losers discard).
    */
  private def writeCheckpoint(dir: String, version: Long): Unit = {
    val target = Paths.get(dir, ckptName(version))
    if (Files.exists(target)) return
    val body = new StringBuilder("#op\tckpt\n#kind\tfull\n")
    resolveListing(dir, version).foreach { case (f, r) => body.append(s"$f\t$r\n") }
    val tmp = Paths.get(dir, s"_tmp-ckpt-${UUID.randomUUID()}")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    try Files.createLink(target, tmp)
    catch { case _: FileAlreadyExistsException => () }
    finally Files.deleteIfExists(tmp)
  }

  /** Write the `_ckpt1-` delta-window sidecar for `version` if absent:
    * the union of the window's (version − CkptEvery, version] delta
    * listings — O(files added in the window), never O(table). If a
    * full-kind commit (truncate/compact) landed inside the window, the
    * sidecar is instead a FULL base resolved from it — whose listing
    * that commit just wrote, so the cost is still O(that commit). Same
    * idempotent create-if-absent discipline as [[writeCheckpoint]]. */
  private def writeDeltaCheckpoint(dir: String, version: Long): Unit = {
    val target = Paths.get(dir, ckpt1Name(version))
    if (Files.exists(target)) return
    var w = version
    var deltas: List[Seq[(String, Long)]] = Nil
    var kind = "delta"
    var base: Seq[(String, Long)] = Nil
    var done = false
    while (!done && w > version - CkptEvery && w > 0) {
      val (_, k, files) = rawSnapshot(dir, w)
      if (k == "full") { kind = "full"; base = files; done = true }
      else { deltas = files :: deltas; w -= 1 }
    }
    val listing = deltas.foldLeft(base)(_ ++ _)
    val body = new StringBuilder(s"#op\tckpt1\n#kind\t$kind\n")
    listing.foreach { case (f, r) => body.append(s"$f\t$r\n") }
    val tmp = Paths.get(dir, s"_tmp-ckpt1-${UUID.randomUUID()}")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    try Files.createLink(target, tmp)
    catch { case _: FileAlreadyExistsException => () }
    finally Files.deleteIfExists(tmp)
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
      files: Seq[(String, Long)], kind: String = "full"): Boolean = {
    val target = Paths.get(dir, snapName(version))
    if (Files.exists(target)) return false
    val body = new StringBuilder(s"#op\t$op\n#kind\t$kind\n")
    files.foreach { case (f, r) => body.append(s"$f\t$r\n") }
    val tmp = Paths.get(dir, s"_tmp-snap-${UUID.randomUUID()}")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    val won =
      try {
        Files.createLink(target, tmp)
        true
      } catch {
        case _: FileAlreadyExistsException => false
      } finally {
        Files.deleteIfExists(tmp)
      }
    // the version's winner (and only it) lays down the periodic
    // checkpoint — after the publish, so readers at `version` already
    // resolve without it and a crash here costs nothing but cadence.
    // r13 (verdict #8): the 16-cadence sidecar is a delta-WINDOW
    // checkpoint (O(changed)); only every FullCkptEvery-th version
    // materializes the full listing.
    if (won && version % FullCkptEvery == 0L) writeCheckpoint(dir, version)
    else if (won && version % CkptEvery == 0L) writeDeltaCheckpoint(dir, version)
    won
  }

  /** The op tag of a streaming micro-batch commit. Scoped to the
    * WRITER (ADVICE r11): epoch IDs restart at 0 per checkpoint
    * location, so a bare `append@e<epoch>` tag made a second streaming
    * query into the same table — or the same query restarted with a
    * fresh checkpoint — silently drop its batches as "replayed".
    * Idempotence must key on (queryId, epoch); `;` fences the queryId
    * from the epoch so no UUID character can be misparsed. */
  private[graft] def epochTag(queryId: String, epoch: Long): String =
    s"append@q=$queryId;e=$epoch"

  /** Epochs already committed to this table BY THIS WRITER (streaming
    * idempotence): versions whose op carries this queryId's tag. */
  private[graft] def committedEpochs(dir: String, queryId: String): Set[Long] = {
    val prefix = s"append@q=$queryId;e="
    (1L to latestVersion(dir)).flatMap { v =>
      try {
        val op = rawSnapshot(dir, v)._1
        if (op.startsWith(prefix)) Some(op.stripPrefix(prefix).toLong)
        else None
      } catch { case _: IllegalArgumentException => None } // vacuumed
    }.toSet
  }

  /** This writer's most recently committed epoch — the O(1)-amortized
    * replay check the streaming sink uses instead of scanning the
    * whole log per micro-batch (r12): Structured Streaming serializes
    * a query's batches, so its epochs land in the log in increasing
    * order and a replayed epoch is always ≤ the newest own tag. Scan
    * BACKWARD from the head and stop at the first own tag; on a busy
    * multi-writer table that is a handful of header reads, not
    * O(history). Worst case (this writer never committed) remains one
    * full header scan — paid once at query start. */
  private[graft] def lastEpoch(dir: String, queryId: String): Option[Long] = {
    val prefix = s"append@q=$queryId;e="
    var v = latestVersion(dir)
    while (v >= 1L) {
      try {
        val op = rawSnapshot(dir, v)._1
        if (op.startsWith(prefix)) return Some(op.stripPrefix(prefix).toLong)
      } catch { case _: IllegalArgumentException => return None } // vacuumed past
      v -= 1
    }
    None
  }

  /** Commit loop: rename temps once, then publish with rebase-on-race
    * (append) or single-shot fencing (truncate). `epoch` tags a
    * streaming micro-batch commit under `queryId`'s scope — the op
    * records it so a REPLAYED epoch of THIS writer can be detected and
    * dropped (exactly-once under micro-batch retries, the graft-lines
    * manifest contract lifted onto the version log). Appends publish
    * DELTA snapshots (the added files only), so a commit never reads
    * or rewrites the base listing and the rebase-on-race loop is a
    * pure version bump — appends commute by construction. Returns the
    * committed version. */
  private[graft] def commit(dir: String, baseVersion: Long, truncate: Boolean,
      messages: Array[WriterCommitMessage], epoch: Option[Long] = None,
      queryId: String = ""): Long = {
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
      // no-op: drop our staged-and-renamed files, change nothing.
      // Per-query epochs are monotone (batches are serialized), so
      // replay ⇔ epoch ≤ this writer's newest tag — a backward scan
      // that stops at the first own tag, not a full log read
      if (epoch.exists(e => lastEpoch(dir, queryId).exists(e <= _))) {
        added.foreach { case (f, _) => Files.deleteIfExists(Paths.get(dir, f)) }
        return latestVersion(dir)
      }
      val op = if (truncate) "truncate"
        else epoch.map(e => epochTag(queryId, e)).getOrElse("append")
      val kind = if (truncate) "full" else "delta"
      if (tryPublish(dir, attemptBase + 1, op, added, kind))
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
    * with version ≥ `retainFrom` (and drop the older snapshots and
    * checkpoints). Returns the deleted file names. Readers pinned at
    * ≥ retainFrom are unaffected — the vacuum/commit split means
    * deletion is a maintenance decision, never a side effect of a
    * write. Two fences (r12, ADVICE r11):
    *
    *  - RANGE: `retainFrom` must name an existing version — a typo'd
    *    horizon past the head refuses loudly instead of computing an
    *    empty live set and silently wiping the table;
    *  - AGE: an unreferenced `part-*` file younger than `retentionMs`
    *    survives — a concurrent commit renames its staged files to
    *    visible names BEFORE publishing its snapshot, and an unaged
    *    vacuum in that window would delete them and let the publish
    *    commit a listing of missing files. Pass `retentionMs = 0`
    *    only when no writer can be in flight.
    *
    * Readers pinned BELOW retainFrom fail loudly afterwards (their
    * snapshot is gone — `readSnapshot` refuses), never partially:
    * vacuum first materializes a checkpoint at the horizon so every
    * retained version resolves without the deleted snapshots. */
  def vacuum(dir: String, retainFrom: Long,
      retentionMs: Long = DefaultRetentionMs): Seq[String] = {
    val latest = latestVersion(dir)
    require(retainFrom >= 1L && retainFrom <= latest,
      s"graft-table: vacuum retainFrom=$retainFrom outside [1, $latest] " +
        s"of $dir — refusing to wipe the table")
    // materialize the horizon BEFORE deleting its predecessors
    writeCheckpoint(dir, retainFrom)
    // live = union of every retained version's visible set, built
    // incrementally: resolve the horizon once, then fold the deltas
    val live = scala.collection.mutable.Set.empty[String]
    var cur = resolveListing(dir, retainFrom).map(_._1)
    live ++= cur
    ((retainFrom + 1) to latest).foreach { v =>
      val (_, kind, files) = rawSnapshot(dir, v)
      if (kind == "full") cur = files.map(_._1)
      else cur = cur ++ files.map(_._1)
      live ++= cur
    }
    val d = new File(dir)
    if (!d.isDirectory) return Nil
    val cutoff = System.currentTimeMillis() - retentionMs
    val victims = d.listFiles().filter { f =>
      (f.getName.startsWith("part-") && !live(f.getName) &&
        f.lastModified() < cutoff) ||
        (f.getName.startsWith(SnapPrefix) && snapVersion(f.getName) < retainFrom) ||
        (f.getName.startsWith(Ckpt1Prefix) && snapVersion(f.getName) < retainFrom) ||
        (f.getName.startsWith(CkptPrefix) && snapVersion(f.getName) < retainFrom) ||
        // crashed writers' staging litter (_tmp-…): invisible to every
        // reader, reclaimable once past the same age fence
        (f.getName.startsWith("_tmp-") && f.lastModified() < cutoff)
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
      // appends are DELTA snapshots, so the batch for version v is
      // exactly v's own listing — no dependence on v−1 (the r11 build
      // diffed against the predecessor, which a vacuum could have
      // legitimately expired; ADVICE r11)
      val (op, added) =
        try { val (o, _, f) = GraftTable.rawAppendListing(path, v); (o, f) }
        catch {
          case _: IllegalArgumentException => throw new IllegalStateException(
            s"graft-table changefeed: version v$v of $path was vacuumed " +
              "past this stream's offset; restart the stream from a " +
              "retained version")
        }
      op match {
        case a if a == "append" || a.startsWith("append@") =>
          added.map { case (f, _) =>
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
      new GraftTableStreamingWrite(path, info.schema(), info.queryId())
  }
}

/** Epoch-fenced streaming sink into the transactional table: each
  * micro-batch commits one snapshot version tagged
  * `append@q=<queryId>;e=<epoch>`; a replayed epoch detects its own
  * tag in the log and drops its staged files — exactly-once under
  * micro-batch retries, composing with the changefeed (which treats
  * epoch-tagged appends as plain appends) so table-to-table streaming
  * pipelines are end-to-end exactly-once. The tag is scoped to the
  * WRITER's queryId (ADVICE r11): epoch numbers restart at 0 per
  * checkpoint location, so an unscoped tag made a second query into
  * the same table — or a restart with a fresh checkpoint — silently
  * drop its early batches as replays. */
class GraftTableStreamingWrite(path: String, schema: StructType, queryId: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftLinesWriterFactory(path, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftTable.commit(path, GraftTable.latestVersion(path), truncate = false,
      messages, epoch = Some(epochId), queryId = queryId)
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
