package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic 10× scale-up of the driver testdata, for the sf1.0
  * headline smoke bench (VERDICT r11 next-round #5: the 100× claims
  * are plan-shape-proven but were never executed past sf0.1).
  *
  * NOT an oracle input — correctness stays gated on the driver's
  * sf0.01 tables; this exists solely to measure how the headline
  * plans SCALE. Construction:
  *
  *  - `nation`/`region` copy as-is (fixed dimensions, as in TPC-H);
  *  - every other table unions `Replicas` copies with all key columns
  *    offset by `replica · KeyStride`, so FK fan-out per replica is
  *    identical to sf0.1 (joins scale linearly, never quadratically);
  *  - `documents.text` goes through a per-replica VOCABULARY
  *    SUBSTITUTION CIPHER (word → 8-hex-char md5(replica:word);
  *    replica 0 keeps the original): an injective-per-replica word map
  *    preserves the word SEQUENCE structure exactly, so every
  *    replica's shingle sets are an isomorphic image of the
  *    original's — exact AND near dup pairs keep their exact Jaccard
  *    within the replica — while across replicas shingle overlap is
  *    zero. Verified: minhash candidate pairs scale ~linearly in the
  *    replica count. (The first build word-SHUFFLED per replica by a
  *    global key order, which put all same-replica docs into one
  *    global word order and manufactured ~5000× phantom near-dup
  *    pairs out of shared vocabulary — a data artifact that measured
  *    as a fake quadratic blowup in the dedup family.);
  *  - `customer.c_name` / `supplier.s_name` go through a per-replica
  *    CHARACTER bijection (`translate` with a seeded alphabet
  *    permutation): Levenshtein distance and prefix-block membership
  *    are invariant under a common char bijection, so the entity-
  *    resolution operators (L23 fuzzy blocking, L53 record linkage)
  *    keep their within-replica pair structure exactly, while
  *    replicas land in disjoint blocks — verbatim-copied names had
  *    made every entity a 10-way duplicate and blew the blocked
  *    verify quadratically (measured: q_fuzzy_names 22.8×,
  *    q_record_linkage 18.2× at 10× data; ~2× after the fix);
  *  - `embeddings.embedding` is cyclically rotated by the replica
  *    index (norm-preserving, direction-changing) for the same
  *    reason in cosine space.
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <outDir> [replicas]
  */
object ScaleData {
  val KeyStride = 1000000000L

  private def offset(df: DataFrame, rep: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(rep * KeyStride)))

  private def cipheredText(rep: Int): org.apache.spark.sql.Column =
    if (rep == 0) col("text")
    else array_join(
      transform(split(col("text"), "\\s+"),
        w => substring(md5(concat(lit(s"$rep:"), w)), 1, 8)),
      " ")

  private val Alphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  private def cipheredName(c: String, rep: Int): org.apache.spark.sql.Column =
    if (rep == 0) col(c)
    else {
      val perm = new scala.util.Random(0x5eed0000L + rep)
        .shuffle(Alphabet.toList).mkString
      translate(col(c), Alphabet, perm)
    }

  private def rolledVec(rep: Int): org.apache.spark.sql.Column =
    if (rep == 0) col("embedding")
    else concat(slice(col("embedding"), rep + 1, 64 - rep),
      slice(col("embedding"), 1, rep))

  def scaled(spark: SparkSession, srcDir: String, name: String,
      replicas: Int): DataFrame = {
    val base = Tables.load(spark, srcDir, name)
    def reps(f: Int => DataFrame): DataFrame =
      (0 until replicas).map(f).reduce(_ unionAll _)
    name match {
      case "nation" | "region" => base
      case "customer" => reps(i => offset(base, i, "c_custkey")
        .withColumn("c_name", cipheredName("c_name", i)))
      case "supplier" => reps(i => offset(base, i, "s_suppkey")
        .withColumn("s_name", cipheredName("s_name", i)))
      case "part" => reps(i => offset(base, i, "p_partkey"))
      case "orders" => reps(i => offset(base, i, "o_orderkey", "o_custkey"))
      case "lineitem" =>
        reps(i => offset(base, i, "l_orderkey", "l_partkey", "l_suppkey"))
      case "events" => reps(i => offset(base, i, "event_id", "user_id"))
      case "documents" =>
        reps(i => offset(base, i, "doc_id").withColumn("text", cipheredText(i)))
      case "embeddings" =>
        reps(i => offset(base, i, "vec_id").withColumn("embedding", rolledVec(i)))
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { name =>
      scaled(spark, srcDir, name, replicas)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name done")
    }
    spark.stop()
  }
}
