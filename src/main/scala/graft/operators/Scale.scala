package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics that don't change query semantics: skew salting and
  * bucketed co-located joins (SURVEY §6). Semantics-preserving, so each
  * is spec-verified against its naive twin rather than a SQL oracle.
  */
object Scale {

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
