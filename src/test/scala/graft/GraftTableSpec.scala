package graft

import java.nio.file.{Files, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{GraftCommitMessage, GraftTable}

/** The transactional snapshot-table layer (§2.4): atomic-create
  * version fencing, append rebase under real concurrent writers,
  * overwrite conflict aborts, snapshot-pinned/time-travel reads
  * surviving truncate, vacuum as the only physical delete, and the
  * history audit surface. */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(s"graft-table-$tag").toString

  private def write(dir: String, rows: Seq[(Long, String)],
      mode: String = "append"): Unit =
    rows.toDF("event_id", "line").repartition(2)
      .write.format("graft-table").mode(mode).option("path", dir).save()

  private def read(dir: String, version: Option[Long] = None): Seq[(Long, String)] = {
    val r = spark.read.format("graft-table")
    version.foreach(v => r.option("version", v.toString))
    r.load(dir).as[(Long, String)].collect().sortBy(_._1).toSeq
  }

  test("append commits publish a contiguous snapshot chain and round-trip") {
    val d = newDir("chain")
    assert(read(d).isEmpty && GraftTable.latestVersion(d) == 0L)
    write(d, Seq((1L, "a"), (2L, "b")))
    write(d, Seq((3L, "c")))
    assert(GraftTable.latestVersion(d) == 2L)
    assert(read(d) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // v1 pins the first commit only — snapshot reads never list the dir
    assert(read(d, Some(1L)) == Seq((1L, "a"), (2L, "b")))
    val hist = GraftTable.history(spark, d)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(hist.map(h => (h._1, h._2, h._4, h._5)) ==
      Seq((1L, "append", 2L, 0L), (2L, "append", 3L, 0L)), s"$hist")
  }

  test("version fence: the atomic create admits exactly one writer per version") {
    val d = newDir("fence")
    new java.io.File(d).mkdirs()
    assert(GraftTable.tryPublish(d, 1L, "append", Seq(("part-x", 1L))))
    // second claim of v1 must lose without touching the committed state
    assert(!GraftTable.tryPublish(d, 1L, "append", Seq(("part-y", 9L))))
    assert(GraftTable.readSnapshot(d, 1L)._2 == Seq(("part-x", 1L)))
    // and leaves no staged litter behind
    val litter = new java.io.File(d).listFiles().map(_.getName)
      .filter(_.startsWith("_tmp"))
    assert(litter.isEmpty, litter.toSeq.toString)
  }

  test("concurrent appenders: every commit survives, versions stay contiguous") {
    val d = newDir("race")
    val writers = 4
    val perWriter = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val jobs = (0 until writers).map { w =>
      scala.concurrent.Future {
        (0 until perWriter).foreach { i =>
          val id = (w * 100 + i).toLong
          write(d, Seq((id, s"w$w-$i")))
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(jobs),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    // all 12 commits landed: the rebase loop rewrote losers onto the
    // winners' listings, never dropping a concurrent writer's rows
    assert(GraftTable.latestVersion(d) == (writers * perWriter).toLong)
    val got = read(d)
    assert(got.size == writers * perWriter, s"${got.size}")
    assert(got.map(_._1).distinct.size == writers * perWriter)
    // the final snapshot references every visible part file exactly once
    val (_, listing) = GraftTable.readSnapshot(d, GraftTable.latestVersion(d))
    assert(listing.map(_._1).distinct.size == listing.size)
    val onDisk = new java.io.File(d).listFiles().map(_.getName)
      .filter(_.startsWith("part-")).toSet
    assert(listing.map(_._1).toSet == onDisk,
      s"snapshot ${listing.size} files vs disk ${onDisk.size}")
    // every row of every intermediate version is still reconstructible
    assert(read(d, Some(1L)).size == 1)
  }

  test("overwrite serializes: a stale-based truncate aborts and leaves no trace") {
    val d = newDir("conflict")
    write(d, Seq((1L, "base")))
    val stale = GraftTable.latestVersion(d) // = 1
    write(d, Seq((2L, "winner"))) // concurrent commit -> v2
    // a truncate that read the table at v1 must NOT silently erase v2;
    // drive the commit protocol directly with a staged temp file
    val tmp = s"_tmp-${UUID.randomUUID()}"
    Files.writeString(Paths.get(d, tmp), "9|loser\n")
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.commit(d, stale, truncate = true,
        Array(GraftCommitMessage(0, tmp, 1L)))
    }
    // the loser's file was cleaned up and the committed state is intact
    assert(read(d) == Seq((1L, "base"), (2L, "winner")))
    val leaked = new java.io.File(d).listFiles().map(_.getName)
      .filter(n => n.contains("loser") || n.startsWith("_tmp"))
    assert(leaked.isEmpty, leaked.toSeq.toString)
  }

  test("truncate never deletes data: old-version reads survive; vacuum is the only physical delete") {
    val d = newDir("travel")
    write(d, Seq((1L, "old-a"), (2L, "old-b")))
    write(d, Seq((9L, "new")), mode = "overwrite")
    assert(GraftTable.latestVersion(d) == 2L)
    // latest sees only the overwrite; the pre-truncate snapshot still
    // reads byte-exact because truncate is logical
    assert(read(d) == Seq((9L, "new")))
    assert(read(d, Some(1L)) == Seq((1L, "old-a"), (2L, "old-b")))
    val hist = GraftTable.history(spark, d)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // v2 lists 2 files (the 1-row overwrite repartitioned to 2 tasks —
    // one file is empty) totalling 1 row
    assert(hist.map(h => (h._1, h._2, h._3, h._4, h._5)) ==
      Seq((1L, "append", 2L, 2L, 0L), (2L, "truncate", 2L, 1L, 0L)), s"$hist")
    // vacuum to the latest horizon: v1's files and snapshot go away
    // (retention 0: no writer is in flight in this test)...
    val deleted = GraftTable.vacuum(d, retainFrom = 2L, retentionMs = 0L)
    assert(deleted.nonEmpty, "vacuum must reclaim the truncated files")
    // ...the latest version is untouched (n_missing stays 0)...
    assert(read(d) == Seq((9L, "new")))
    val after = GraftTable.history(spark, d)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(after.map(h => (h._1, h._5)) == Seq((2L, 0L)), s"$after")
    // ...and the vacuumed version is now an explicit error, not silence
    intercept[IllegalArgumentException] { read(d, Some(1L)) }
  }

  test("compact rewrites small files data-identically; lost races abort clean") {
    val d = newDir("compact")
    val all = (1L to 12L).map(i => (i, s"row$i"))
    all.grouped(2).foreach(g => write(d, g.toSeq)) // 6 commits, 12 files
    val filesBefore = new java.io.File(d).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(filesBefore == 12 && GraftTable.latestVersion(d) == 6L)
    val v = GraftTable.compact(spark, d, targetRowsPerFile = 6L)
    assert(v == 7L)
    // data-identical at the new head; the compacted listing is small
    assert(read(d) == all)
    val (op, listing) = GraftTable.readSnapshot(d, 7L)
    assert(op == "compact" && listing.size == 2 &&
      listing.map(_._2).sum == 12L, s"$op $listing")
    // pre-compaction versions still read from the original files
    assert(read(d, Some(6L)) == all && read(d, Some(1L)).size == 2)
    // no staging litter
    assert(!new java.io.File(d).listFiles().exists(_.getName.startsWith("_compact")))
    // vacuum to the compacted head reclaims the 12 originals
    assert(GraftTable.vacuum(d, retainFrom = 7L, retentionMs = 0L)
      .count(_.startsWith("part-")) == 12)
    assert(read(d) == all)
    // a compaction based on a stale head aborts without losing the
    // concurrent commit (same serialization rule as overwrite)
    write(d, Seq((13L, "row13"))) // v8
    val staleBase = GraftTable.latestVersion(d)
    write(d, Seq((14L, "row14"))) // v9 lands before the compactor commits
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.compact(spark, d, 6L, expectedVersion = Some(staleBase))
    }
    assert(read(d).map(_._1).toSet == (1L to 14L).toSet)
  }

  test("changefeed streams appended commits once; compaction is invisible; truncate fails loud") {
    val d = newDir("feed")
    write(d, Seq((1L, "a"), (2L, "b")))
    val q = spark.readStream.format("graft-table").load(d)
      .writeStream.format("memory").queryName("gt_feed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gt_feed").count() == 2)
      write(d, Seq((3L, "c")))
      q.processAllAvailable()
      // the new commit's files only — no re-read of earlier versions
      assert(spark.table("gt_feed").select("event_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L, 3L))
      // compaction rewrites every file but emits NOTHING: the op tag
      // proves the data is identical, so consumers see no duplicates
      GraftTable.compact(spark, d, targetRowsPerFile = 100L)
      write(d, Seq((4L, "d")))
      q.processAllAvailable()
      assert(spark.table("gt_feed").select("event_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
    // a truncate commit fails the stream in append mode...
    write(d, Seq((9L, "z")), mode = "overwrite")
    val q2 = spark.readStream.format("graft-table").load(d)
      .writeStream.format("memory").queryName("gt_feed2")
      .outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination(10000)
    }
    assert(err.getMessage.contains("graft-table changefeed") ||
      Option(err.getCause).exists(_.getMessage.contains("graft-table changefeed")),
      err.getMessage.take(300))
    // ...and ignoreTruncate=true skips it, streaming only what follows
    write(d, Seq((10L, "post")))
    val q3 = spark.readStream.format("graft-table")
      .option("ignoreTruncate", "true").load(d)
      .writeStream.format("memory").queryName("gt_feed3")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      val got = spark.table("gt_feed3").select("event_id").as[Long]
        .collect().sorted.toSeq
      // append commits on both sides of the skipped truncate stream;
      // the truncate version itself contributes nothing (9 was the
      // truncate's own payload — a REWRITE, not an append)
      assert(got == Seq(1L, 2L, 3L, 4L, 10L), s"$got")
    } finally q3.stop()
  }

  test("streaming sink commits one epoch-tagged version per batch; replayed epochs are no-ops") {
    val src = newDir("sink-src")
    val dst = newDir("sink-dst")
    write(src, Seq((1L, "a"), (2L, "b")))
    val q = spark.readStream.format("graft-table").load(src)
      .writeStream.format("graft-table")
      .option("path", dst)
      .option("checkpointLocation", newDir("sink-ckpt"))
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      write(src, Seq((3L, "c")))
      q.processAllAvailable()
      assert(read(dst) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // each micro-batch is one epoch-tagged snapshot version, scoped
      // to the writing query's id (ADVICE r11)
      val ops = GraftTable.history(spark, dst)
        .select("op").as[String].collect().toSeq
      assert(ops.forall(_.startsWith("append@q=")), ops.toString)
      val qid = ops.head.stripPrefix("append@q=").takeWhile(_ != ';')
      assert(qid.nonEmpty && GraftTable.committedEpochs(dst, qid).size == ops.size)
    } finally q.stop()
    // direct replayed-epoch no-op: re-commit an already-committed
    // epoch of the SAME writer with fresh temp files — the tag in the
    // log wins, the files are dropped, nothing changes
    val ops = GraftTable.history(spark, dst).select("op").as[String].collect().toSeq
    val qid = ops.head.stripPrefix("append@q=").takeWhile(_ != ';')
    val before = read(dst)
    val vBefore = GraftTable.latestVersion(dst)
    val replayEpoch = GraftTable.committedEpochs(dst, qid).max
    val tmp = s"_tmp-${java.util.UUID.randomUUID()}"
    Files.writeString(Paths.get(dst, tmp), "99|replayed\n")
    val v = GraftTable.commit(dst, GraftTable.latestVersion(dst),
      truncate = false, Array(GraftCommitMessage(0, tmp, 1L)),
      epoch = Some(replayEpoch), queryId = qid)
    assert(v == vBefore && read(dst) == before,
      "a replayed epoch must change nothing")
    val litter = new java.io.File(dst).listFiles().map(_.getName)
      .filter(n => n.startsWith("_tmp") || n.contains("replayed"))
    assert(litter.isEmpty, litter.toSeq.toString)
  }

  test("live compact/append race: appends never lost, compaction either lands or aborts") {
    val d = newDir("mixed")
    write(d, (1L to 6L).map(i => (i, s"seed$i")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    var compactions = 0
    var aborts = 0
    val appender = scala.concurrent.Future {
      (10L to 14L).foreach(i => write(d, Seq((i, s"row$i"))))
    }
    val compactor = scala.concurrent.Future {
      (1 to 5).foreach { _ =>
        try { GraftTable.compact(spark, d, targetRowsPerFile = 100L); compactions += 1 }
        catch { case _: java.util.ConcurrentModificationException => aborts += 1 }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(appender, compactor)),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    // invariant: every append survived exactly once, whatever the
    // compactor managed to land in between
    assert(read(d).map(_._1).sorted == ((1L to 6L) ++ (10L to 14L)).sorted,
      s"rows lost or duplicated: ${read(d).map(_._1)}")
    info(s"compactions landed: $compactions, aborted on race: $aborts")
    // the final snapshot's listing matches disk exactly
    val (_, listing) = GraftTable.readSnapshot(d, GraftTable.latestVersion(d))
    val disk = new java.io.File(d).listFiles().map(_.getName)
      .filter(_.startsWith("part-")).toSet
    assert(listing.map(_._1).toSet.subsetOf(disk))
  }

  test("epoch scope: the same epoch number from a different writer lands; a restarted query with a fresh checkpoint is not dropped") {
    val d = newDir("epoch-scope")
    new java.io.File(d).mkdirs()
    def commitEpoch(qid: String, epoch: Long, payload: String): Long = {
      val tmp = s"_tmp-${UUID.randomUUID()}"
      Files.writeString(Paths.get(d, tmp), payload)
      GraftTable.commit(d, GraftTable.latestVersion(d), truncate = false,
        Array(GraftCommitMessage(0, tmp, 1L)), epoch = Some(epoch), queryId = qid)
    }
    // writer A commits its epoch 0
    assert(commitEpoch("qA", 0L, "1|a0\n") == 1L)
    // writer B's epoch 0 must LAND — the r11 build keyed idempotence
    // on the bare epoch number table-wide and silently dropped it
    assert(commitEpoch("qB", 0L, "2|b0\n") == 2L)
    assert(read(d) == Seq((1L, "a0"), (2L, "b0")))
    // while A replaying ITS epoch 0 stays a no-op
    assert(commitEpoch("qA", 0L, "3|replay\n") == 2L)
    assert(read(d) == Seq((1L, "a0"), (2L, "b0")))
    // end-to-end: a second streaming query into the same table with a
    // FRESH checkpoint (epochs restart at 0) must not lose batches
    val src = newDir("epoch-src")
    write(src, Seq((10L, "s1")))
    def streamOnce(): Unit = {
      val q = spark.readStream.format("graft-table").load(src)
        .writeStream.format("graft-table").option("path", d)
        .option("checkpointLocation", newDir("epoch-ckpt"))
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    streamOnce()
    assert(read(d).map(_._1).sorted == Seq(1L, 2L, 10L))
    write(src, Seq((11L, "s2")))
    streamOnce() // fresh checkpoint: replays src from scratch as ITS epoch 0
    // the second query's queryId differs, so its batches land; the
    // dedup against a re-streamed (10L, "s1") is the SOURCE's job
    // (fresh checkpoint = fresh offsets), so expect 10 twice and 11
    assert(read(d).map(_._1).sorted == Seq(1L, 2L, 10L, 10L, 11L),
      read(d).toString)
  }

  test("delta log + checkpoints: head resolution reads O(CkptEvery) files, not O(chain)") {
    val d = newDir("chain1k")
    new java.io.File(d).mkdirs()
    val n = 1000
    (1 to n).foreach { v =>
      assert(GraftTable.tryPublish(d, v.toLong, "append",
        Seq((f"part-f$v%04d", 1L)), kind = "delta"))
    }
    // r13 (verdict #8): FULL checkpoints only every FullCkptEvery-th
    // version; the 16-cadence sidecars are delta-WINDOW checkpoints
    val files = new java.io.File(d).listFiles().map(_.getName)
    val fulls = files.filter(_.startsWith("_ckpt-")).sorted
    val windows = files.filter(_.startsWith("_ckpt1-")).sorted
    assert(fulls.length == n / GraftTable.FullCkptEvery.toInt, fulls.mkString(","))
    assert(windows.length ==
      n / GraftTable.CkptEvery.toInt - n / GraftTable.FullCkptEvery.toInt)
    // O(changed) laydown: every window checkpoint lists exactly its
    // window's additions (CkptEvery files here — 1 per commit), NEVER
    // the full visible set; only the FullCkptEvery-th materializes it
    windows.foreach { c =>
      val entries = Files.readAllLines(Paths.get(d, c)).asScala
        .count(l => l.nonEmpty && !l.startsWith("#"))
      assert(entries == GraftTable.CkptEvery,
        s"$c lists $entries files — a window checkpoint must be O(changed)")
    }
    fulls.foreach { c =>
      val v = c.stripPrefix("_ckpt-").toInt
      val entries = Files.readAllLines(Paths.get(d, c)).asScala
        .count(l => l.nonEmpty && !l.startsWith("#"))
      assert(entries == v, s"$c must hold the full listing at v$v")
    }
    // mid-chain time travel and head both resolve the full listing
    assert(GraftTable.readSnapshot(d, 500L)._2.size == 500)
    val (_, head) = GraftTable.readSnapshot(d, n.toLong)
    assert(head.size == n && head.head == ("part-f0001", 1L) &&
      head.last == (f"part-f$n%04d", 1L))
    // PROOF of bounded reads: resolution at the head needs only the 8
    // trailing deltas (993-1000), the window checkpoints at 992 down
    // to 784, and the full checkpoint at 768. Delete everything else —
    // if resolution touched any of it, it would now throw; instead the
    // head resolves byte-identically
    (1 to 992).foreach(v => Files.delete(Paths.get(d, f"_snap-$v%08d")))
    fulls.filterNot(_ == "_ckpt-00000768").foreach(c => Files.delete(Paths.get(d, c)))
    windows.filter(_.stripPrefix("_ckpt1-").toInt < 784)
      .foreach(c => Files.delete(Paths.get(d, c)))
    assert(GraftTable.readSnapshot(d, n.toLong)._2 == head)
  }

  test("vacuum fences: range guard refuses a horizon past the head; age guard spares young files") {
    val d = newDir("vac-fence")
    write(d, Seq((1L, "a"))) // v1
    write(d, Seq((2L, "b"))) // v2
    // RANGE: a typo'd horizon refuses loudly instead of wiping the table
    intercept[IllegalArgumentException] { GraftTable.vacuum(d, retainFrom = 3L) }
    intercept[IllegalArgumentException] { GraftTable.vacuum(d, retainFrom = 0L) }
    assert(read(d) == Seq((1L, "a"), (2L, "b")))
    write(d, Seq((9L, "z")), mode = "overwrite") // v3: v1/v2 files unreferenced
    // an in-flight commit's renamed-but-unpublished file
    Files.writeString(Paths.get(d, "part-inflight-0"), "5|x\n")
    // AGE: with the default retention, young unreferenced files —
    // including the in-flight one — survive; old SNAPSHOTS still expire
    val del1 = GraftTable.vacuum(d, retainFrom = 3L)
    assert(!del1.exists(_.startsWith("part-")), del1.toString)
    assert(del1.count(_.startsWith("_snap-")) == 2, del1.toString)
    assert(Files.exists(Paths.get(d, "part-inflight-0")))
    // a pinned read below the horizon now fails loud, never half-reads
    intercept[IllegalArgumentException] { read(d, Some(1L)) }
    // the retained head is untouched
    assert(read(d) == Seq((9L, "z")))
    // a crashed writer's staging litter: age-fenced like data files
    Files.writeString(Paths.get(d, "_tmp-crashed-writer"), "x\n")
    // retention 0 (no writer in flight): unreferenced files reclaimed,
    // including the staging litter
    val del2 = GraftTable.vacuum(d, retainFrom = 3L, retentionMs = 0L)
    assert(del2.count(_.startsWith("part-")) == 5, del2.toString) // 2+2 old, 1 in-flight
    assert(del2.contains("_tmp-crashed-writer"), del2.toString)
    assert(read(d) == Seq((9L, "z")))
  }

  test("lastEpoch scans backward to the writer's newest tag; replay check is order-based") {
    val d = newDir("last-epoch")
    new java.io.File(d).mkdirs()
    def commitEpoch(qid: String, epoch: Long, payload: String): Long = {
      val tmp = s"_tmp-${UUID.randomUUID()}"
      Files.writeString(Paths.get(d, tmp), payload)
      GraftTable.commit(d, GraftTable.latestVersion(d), truncate = false,
        Array(GraftCommitMessage(0, tmp, 1L)), epoch = Some(epoch), queryId = qid)
    }
    assert(GraftTable.lastEpoch(d, "q1").isEmpty)
    commitEpoch("q1", 0L, "1|a\n")
    commitEpoch("q2", 0L, "2|b\n") // another writer interleaves
    commitEpoch("q1", 1L, "3|c\n")
    assert(GraftTable.lastEpoch(d, "q1").contains(1L))
    assert(GraftTable.lastEpoch(d, "q2").contains(0L))
    assert(GraftTable.lastEpoch(d, "q3").isEmpty)
    // replay of an OLDER epoch (not just the newest) is still a no-op:
    // per-query epochs are monotone, so epoch <= newest tag == replay
    val before = read(d)
    commitEpoch("q1", 0L, "4|stale-replay\n")
    assert(read(d) == before, "an older replayed epoch must change nothing")
    // and the next genuine epoch still lands
    commitEpoch("q1", 2L, "5|d\n")
    assert(read(d).map(_._1).sorted == Seq(1L, 2L, 3L, 5L))
  }

  test("live vacuum/append race: age-fenced vacuum never eats an in-flight commit") {
    // the ADVICE r11 window made concrete: a committing writer renames
    // staged files to visible part-* names BEFORE publishing its
    // snapshot; an unaged vacuum in that window deleted them and the
    // publish then committed a listing of missing files. With the age
    // fence, vacuum runs CONCURRENTLY with appenders and every
    // retained version must read back complete (n_missing = 0).
    val d = newDir("vac-race")
    write(d, (1L to 4L).map(i => (i, s"seed$i")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val appender = scala.concurrent.Future {
      (10L to 21L).foreach(i => write(d, Seq((i, s"row$i"))))
    }
    val vacuumer = scala.concurrent.Future {
      var n = 0
      while (!appender.isCompleted && n < 50) {
        // default retention: old snapshots may expire, but young data
        // files — including a racer's renamed-but-unpublished ones —
        // must survive
        GraftTable.vacuum(d, retainFrom = GraftTable.latestVersion(d))
        n += 1
      }
      n
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(appender.map(_ => 0), vacuumer)),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    // every append survived exactly once...
    assert(read(d).map(_._1).sorted == ((1L to 4L) ++ (10L to 21L)).sorted,
      s"rows lost or duplicated: ${read(d).map(_._1).sorted}")
    // ...and every RETAINED version reads back complete: no snapshot
    // references a vacuumed-away file
    val missing = GraftTable.history(spark, d)
      .select("version", "n_missing").as[(Long, Long)].collect()
      .filter(_._2 > 0)
    assert(missing.isEmpty, s"versions with missing files: ${missing.toSeq}")
  }

  test("changefeed past a vacuumed offset fails with a clear error, not a bare require") {
    val d = newDir("feed-vac")
    write(d, Seq((1L, "a"))) // v1
    write(d, Seq((2L, "b"))) // v2
    write(d, Seq((3L, "c"))) // v3
    GraftTable.vacuum(d, retainFrom = 3L, retentionMs = 0L) // v1, v2 expired
    // v3 itself (an append delta) still resolves via the horizon ckpt
    assert(read(d).size == 3)
    // a fresh stream must replay from v1 — which is gone: fail loud
    val q = spark.readStream.format("graft-table").load(d)
      .writeStream.format("memory").queryName("gt_feed_vac")
      .outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.awaitTermination(10000)
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("vacuumed past this stream's offset"), msg.take(300))
  }

  test("reads keep the graft-lines scan contract: pruning + pushdown through the snapshot") {
    val d = newDir("scan")
    write(d, Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val df = spark.read.format("graft-table").load(d).where(col("event_id") > 1)
    assert(df.as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(2L, 3L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[GreaterThan(event_id,1)]"), plan.take(1200))
    assert(plan.contains("version=1"), plan.take(1200))
    val pruned = spark.read.format("graft-table").load(d)
      .select("event_id").queryExecution.executedPlan.toString
    assert(pruned.contains("ReadColumns=[event_id]"), pruned.take(1200))
  }
}
