package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Embedding similarity family (SURVEY §2.3 L5-L7) over
  * `embeddings(vec_id, embedding float[64], label)`.
  *
  * Dot products run in double via zip_with/aggregate — left-to-right
  * summation, mirrored by DuckDB's list_dot_product; scores are rounded
  * to 6 decimals on both sides to absorb last-ulp differences.
  */
object Similarity {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Left-to-right double dot product (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def cosineSql(a: String, b: String): String =
    s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"

  // ---- L5: embedding-cosine near-duplicate pairs ----
  // Exact all-pairs at oracle scale (the correctness surface); the
  // synthetic embeddings have no >0.95 near-dups, so the demo threshold
  // is 0.45 (measured: 14 pairs at sf0.01). The 100 TB path is annLsh
  // below — same scoring, LSH-bounded candidates.
  private val NearDupTau = 0.45

  def embeddingNearDup(embeddings: DataFrame): DataFrame = {
    val a = embeddings.select(col("vec_id").as("x"), asD(col("embedding")).as("va"))
    val b = embeddings.select(col("vec_id").as("y"), asD(col("embedding")).as("vb"))
    a.crossJoin(b).where(col("x") < col("y"))
      .select(col("x"), col("y"), round(cosine(col("va"), col("vb")), 6).as("cos"))
      .where(col("cos") >= NearDupTau)
  }

  val embeddingNearDupSql: String = {
    val c = cosineSql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    s"""SELECT a.vec_id AS x, b.vec_id AS y, round($c, 6) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND round($c, 6) >= $NearDupTau"""
  }

  // ---- L6: brute-force cosine top-k ----
  // Query set (vec_id % 97 == 0) is tiny and broadcast; the corpus
  // streams past it map-side. The per-query top-k goes through a
  // row_number window — the shuffle carries only (queries × corpus
  // partitions × k) after partial ordering at 100 TB would instead use
  // a bounded-heap Aggregator; documented trade-off for round 2.
  private val TopK = 5

  def annTopK(embeddings: DataFrame): DataFrame = {
    val queries = embeddings.where(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), asD(col("embedding")).as("qv"))
    val corpus = embeddings.select(col("vec_id").as("cand_id"), asD(col("embedding")).as("cv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"), round(cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= TopK)
  }

  val annTopKSql: String = {
    val c = cosineSql("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")
    s"""SELECT q_id, cand_id, cos, rk FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, round($c, 6) AS cos,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY round($c, 6) DESC, c.vec_id ASC) AS rk
  FROM embeddings q, embeddings c
  WHERE q.vec_id % 97 = 0 AND c.vec_id <> q.vec_id)
WHERE rk <= $TopK"""
  }

  // ---- L7: LSH-bucketed ANN (the scale path; rows-check + recall test) ----
  // T hash tables × P random hyperplanes; hyperplane coefficients are
  // md5-derived uniform [-1,1] — deterministic, no fitted state. A
  // query's candidates are corpus vectors sharing its bucket in ANY
  // table; candidates are re-ranked exactly. At 100 TB the bucket join
  // replaces the cross join: cost ~ corpus × T map-side + a key join.
  // 8 tables × 4 planes: for the top-5 neighborhood of these synthetic
  // embeddings (cos ≈ 0.35-0.5, i.e. per-plane agreement ≈ 0.6-0.67)
  // the expected any-table collision is ~0.3-0.5 with ~12% of the
  // corpus as candidates — the recall/candidate trade-off the recall
  // spec pins down. Real clustered embeddings do markedly better.
  private val Tables = 8
  private val Planes = 4

  /** coefficient for (table t, plane p, dim d): uniform [-1, 1]. */
  private def coef(t: Int, p: Int, d: Column): Column =
    (md5Long(lit(s"hp:$t:$p"), d.cast("string")) % 2000001L - 1000000L) / lit(1000000.0)

  private def bucket(t: Int, v: Column): Column = {
    val signs = (0 until Planes).map { p =>
      val proj = aggregate(zip_with(v, sequence(lit(0), lit(63)),
        (x, d) => x * coef(t, p, d)), lit(0.0), _ + _)
      when(proj > 0, 1L << p).otherwise(0L)
    }
    signs.reduce(_ + _)
  }

  def annLsh(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(col("vec_id"), asD(col("embedding")).as("v"))
    val buckets = base.select(col("vec_id"), col("v"),
      explode(array((0 until Tables).map(t =>
        struct(lit(t).as("t"), bucket(t, col("v")).as("b"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.t").as("t"), col("tb.b").as("b"))
    val queries = buckets.where(col("vec_id") % 97 === 0)
      .select(col("t"), col("b"), col("vec_id").as("q_id"), col("v").as("qv"))
    val cands = buckets
      .join(broadcast(queries), Seq("t", "b"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"), col("qv"), col("v")).distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id").asc)
    cands
      .select(col("q_id"), col("cand_id"), round(cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= TopK)
  }
}
