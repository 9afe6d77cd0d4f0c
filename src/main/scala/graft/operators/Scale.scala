package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics that don't change query semantics: skew salting and
  * bucketed co-located joins (SURVEY §6). Semantics-preserving, so each
  * is spec-verified against its naive twin rather than a SQL oracle.
  */
object Scale {

  /** Spread a NARROW scan across the cluster before a CPU-dense
    * map stage (r10): at local SF every table is a single parquet
    * row-group → one scan split, so per-row-expensive expression
    * chains (md5 walks, regex scrubs, BPE) serialize into one task.
    * Conditional on the scan being narrower than the cluster — at
    * real scale a 100 TB scan is thousands of splits and this is a
    * no-op, keeping the extra exchange out of the production plan.
    * Use ONLY where nothing needs to push INTO the scan (a filter
    * written after this repartition no longer reaches PushedFilters —
    * the reason this is a per-operator decision, not a Tables.load
    * default). */
  private[graft] def spreadNarrowScan(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Width estimate off LOGICAL stats, not df.rdd.getNumPartitions:
    // the .rdd call forced full physical planning + an RDD conversion
    // of the pre-repartition plan at query-BUILD time for every
    // caller (r10 advice). bytes < target·maxPartitionBytes ⇔ the
    // scan would open fewer than `target` splits, which is the same
    // local-narrow test without touching the physical planner.
    val maxPartitionBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(maxPartitionBytes) * target) df.repartition(target, key)
    else df
  }

  /** Salted inner equi-join for skewed keys: the skewed (left) side
    * gets a random-ish salt in [0, buckets); the build (right) side is
    * replicated across all salts via explode. Same result set as
    * `left.join(right, key)`, but a hot key spreads over `buckets`
    * reducers instead of one straggler.
    *
    * The salt is derived (hash of the whole left row), not random —
    * deterministic retries matter more at 100 TB than perfect balance.
    * AQE's skew-join split handles moderate skew on its own; explicit
    * salting is for the pathological keys AQE can't split (single-key
    * aggregation hotspots).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Seeded stratified sample: per-stratum fractions without a full
    * shuffle (sampleBy is a map-side Bernoulli filter per row). The
    * workhorse for building eval slices from a 100 TB corpus — e.g.
    * fixed fractions per language/source. Deterministic given the
    * seed, so pipelines are re-runnable. NB Spark semantics: strata
    * absent from `fractions` are dropped entirely (not passed
    * through), and fractions for nonexistent strata are ignored. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Bit-interleaved Z-order value of two dimensions (16 bits each →
    * one 32-bit curve position): dim A's bit i lands at position 2i,
    * dim B's at 2i+1. Rows close on the curve are close in BOTH
    * dimensions, so range-partitioning + sorting by this value gives
    * every file a tight min/max envelope in each dimension at once —
    * the multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE
    * ZORDER shape) that single-column sorting cannot provide: sorting
    * by time alone leaves every file spanning all users, so a user
    * predicate prunes nothing. Inputs must be pre-scaled to 16 bits by
    * the caller (the layout job knows its dimensions' ranges).
    * Pure column arithmetic — codegen'd, no UDF. */
  def zorder2(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit + bbit
    }.reduce(_ + _)

  /** Write `df` clustered along the Z-curve of two pre-scaled 16-bit
    * dimension columns: range-partition by the curve position (each
    * output task owns a contiguous curve segment), sort within
    * partitions, one file per task. `files` controls layout
    * granularity — at 100 TB this is the OPTIMIZE job's target file
    * count; file-level min/max stats then prune on BOTH dimensions. */
  def zorderWrite(df: DataFrame, dimA: Column, dimB: Column,
      files: Int, path: String): Unit =
    df.withColumn("_z", zorder2(dimA, dimB))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction — the OPTIMIZE / bin-packing half of the
    * layout story (zorderWrite is the clustering half). A streaming
    * ingest or over-parallel batch job leaves thousands of KB-sized
    * parquet files; every later scan then pays one task + one
    * footer-read per file, and at 100 TB the driver's file listing
    * alone becomes the bottleneck. Compaction sizes the output from
    * the ACTUAL input bytes (no row-size estimation): nFiles =
    * ceil(totalBytes / targetBytes), round-robin repartition for
    * near-equal file sizes, one file per task. Returns the computed
    * file count. Content is untouched — the spec proves bytes-exact
    * row equality and the file-count contract. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Write both sides bucketed by the join key so the subsequent join
    * needs no Exchange: the classic co-located join. Requires a
    * warehouse-backed table (bucket metadata lives in the catalog).
    * Returns the joined plan for inspection.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      left: DataFrame, right: DataFrame, key: String, buckets: Int,
      leftName: String, rightName: String): DataFrame = {
    left.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(leftName)
    right.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), key)
  }
}
