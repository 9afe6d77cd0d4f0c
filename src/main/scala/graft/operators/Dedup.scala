package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Deduplication family (SURVEY §2.3 L1-L4). The testdata plants ~5%
  * near-duplicate documents (word-3-gram Jaccard >= 0.8 vs < 0.2 for
  * unrelated pairs — measured), so 0.5 is a robust threshold.
  *
  * Scale design: nothing here materialises n² pairs. Candidates come
  * from bounded generators — a doc-frequency-capped inverted index
  * (L2), LSH band buckets (L3), simhash band buckets (L4) — and only
  * candidates reach the exact verification join.
  */
object Dedup {

  // ---- L1: exact dedup ----
  def exact(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY md5(text)"

  // ---- shared: distinct word-3-gram shingles per doc ----
  private def shingleDf(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      explode(wordShingles(tokens(col("text")), 3)).as("s"))

  private val shingleSqlCte =
    s"sh AS (SELECT doc_id, unnest(${wordShinglesSql("string_split_regex(lower(text), '\\s+')", 3)}) AS s FROM documents)"

  /** Exact Jaccard over full shingle sets, for a candidate pair set
    * with columns (x, y). One shuffle join per side on doc_id. */
  private def exactJaccard(cands: DataFrame, sh: DataFrame, sizes: DataFrame): DataFrame = {
    val shx = sh.select(col("doc_id").as("x"), col("s"))
    val shy = sh.select(col("doc_id").as("y"), col("s"))
    cands
      .join(shx, "x").join(shy, Seq("y", "s"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("x"), col("n").as("nx")), "x")
      .join(sizes.select(col("doc_id").as("y"), col("n").as("ny")), "y")
      .select(col("x"), col("y"),
        (col("common") / (col("nx") + col("ny") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= 0.5)
  }

  private val exactJaccardSql =
    """sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.x, c.y, count(*) AS common
  FROM cands c JOIN sh a ON a.doc_id = c.x JOIN sh b ON b.doc_id = c.y AND b.s = a.s
  GROUP BY c.x, c.y)
SELECT x, y, common / (sx.n + sy.n - common) AS jaccard
FROM common JOIN sizes sx ON sx.doc_id = x JOIN sizes sy ON sy.doc_id = y
WHERE common / (sx.n + sy.n - common) >= 0.5"""

  // ---- L2: n-gram Jaccard via df-capped inverted index ----
  // Shingles occurring in more than MaxDf docs generate no candidates
  // (classic hot-key guard: a stopword shingle would otherwise create
  // |bucket|² pairs). The exact Jaccard is still computed over ALL
  // shingles of each candidate pair.
  private val MaxDf = 20

  def ngramJaccard(documents: DataFrame): DataFrame = {
    val sh = shingleDf(documents).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") <= MaxDf).select(col("s"))
    val rareSh = sh.join(rare, "s")
    val cands = rareSh.select(col("s"), col("doc_id").as("x"))
      .join(rareSh.select(col("s"), col("doc_id").as("y")), "s")
      .where(col("x") < col("y"))
      .select(col("x"), col("y")).distinct()
    exactJaccard(cands, sh, sizes)
  }

  val ngramJaccardSql: String =
    s"""WITH $shingleSqlCte,
rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $MaxDf),
cands AS (
  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
  FROM sh a JOIN rare r ON a.s = r.s JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id),
$exactJaccardSql"""

  // ---- L3: MinHash + LSH ----
  // 24 md5-seeded min-hashes per doc, computed per-row with
  // aggregate()/zip_with — NO explode, NO shuffle for signatures (at
  // 100 TB the signature stage is map-only). 6 bands × 4 rows; docs
  // sharing any band become candidates; candidates are verified with
  // exact Jaccard >= 0.5. The DuckDB oracle computes the same min-hash
  // values via unnest+group-by — different plan, identical numbers.
  private val NumHashes = 24
  private val BandRows = 4
  private val NumBands = NumHashes / BandRows

  def minhashLsh(documents: DataFrame): DataFrame = {
    val sh = shingleDf(documents).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shingles = wordShingles(tokens(col("text")), 3)
    val sig = aggregate(
      shingles,
      array_repeat(lit(Long.MaxValue), NumHashes),
      (acc, s) => zip_with(acc,
        array((0 until NumHashes).map(j => md5Long(j, s)): _*),
        (a, b) => least(a, b)))
    val withBands = documents.select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band"), slice(col("sig"), b * BandRows + 1, BandRows).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = withBands.select(col("band"), col("key"), col("doc_id").as("x"))
      .join(withBands.select(col("band"), col("key"), col("doc_id").as("y")), Seq("band", "key"))
      .where(col("x") < col("y"))
      .select(col("x"), col("y")).distinct()
    exactJaccard(cands, sh, sizes)
  }

  val minhashLshSql: String = {
    val h = md5LongSql("j", "s")
    val bandKeys = (0 until NumBands).map(b =>
      s"(SELECT doc_id, $b AS band, sig[${b * BandRows + 1}:${b * BandRows + BandRows}] AS key FROM sigs)")
      .mkString("\n  UNION ALL ")
    s"""WITH $shingleSqlCte,
hs AS (SELECT doc_id, j, min($h) AS hv
       FROM sh, unnest(generate_series(0, ${NumHashes - 1})) AS t(j) GROUP BY doc_id, j),
sigs AS (SELECT doc_id, list(hv ORDER BY j) AS sig FROM hs GROUP BY doc_id),
bands AS ($bandKeys),
cands AS (
  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
$exactJaccardSql"""
  }

  // ---- L4: SimHash ----
  // 60-bit simhash over word tokens (count-weighted), md5-portable.
  // Near-dup predicate: hamming distance <= 4. Spark generates
  // candidates from 5 bands of 12 bits — complete for d <= 4 by
  // pigeonhole — then verifies with exact bit_count(xor). The oracle
  // scans all pairs (fine at oracle scale) — identical result set.
  private val SimBits = 60
  private val SimBands = 5
  private val SimBandBits = SimBits / SimBands // 12
  private val MaxHamming = 4

  /** (doc_id, simhash) — map-side only: per row, tokens are md5-hashed
    * once each, folded into 60 per-bit counters, and assembled into one
    * long. No explode of (doc × bit), no shuffle. The Scala DSL lacks
    * column-distance shiftright, so the fold is a single SQL expr. */
  def simhashes(documents: DataFrame): DataFrame = {
    val sig = expr(
      s"""aggregate(
            transform(split(lower(text), '\\\\s+'), t -> ${sparkMd5Sql("'s'", "t")}),
            array_repeat(cast(0 as bigint), $SimBits),
            (acc, h) -> zip_with(acc,
              transform(sequence(0, ${SimBits - 1}),
                b -> cast(shiftright(h, b) & 1 as bigint)),
              (a, bit) -> a + (2 * bit - 1)),
            acc -> aggregate(
              zip_with(acc, sequence(0, ${SimBits - 1}),
                (c, b) -> if(c > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))),
              cast(0 as bigint), (s, v) -> s + v))""")
    documents.select(col("doc_id"), sig.as("simhash"))
  }

  /** Spark-SQL textual md5Long (for expr() contexts). */
  private def sparkMd5Sql(seed: String, x: String): String =
    s"cast(conv(substring(md5(concat(cast($seed as string), ':', $x)), 1, 15), 16, 10) as bigint)"

  def simhashDedup(documents: DataFrame): DataFrame = {
    val sims = simhashes(documents).cache()
    val withBands = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimBands).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * SimBandBits)
          .bitwiseAND(lit((1L << SimBandBits) - 1)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    withBands.select(col("band"), col("key"), col("doc_id").as("x"), col("simhash").as("hx"))
      .join(withBands.select(col("band"), col("key"), col("doc_id").as("y"), col("simhash").as("hy")),
        Seq("band", "key"))
      .where(col("x") < col("y"))
      .select(col("x"), col("y"),
        bit_count(col("hx").bitwiseXOR(col("hy"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= MaxHamming)
  }

  val simhashDedupSql: String = {
    val h = md5LongSql("'s'", "tok")
    s"""WITH th AS (
  SELECT doc_id, tok, $h AS h, count(*) AS w
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents)
  GROUP BY doc_id, tok),
bits AS (
  SELECT doc_id, b, CASE WHEN sum(w * (2 * ((h >> b) & 1) - 1)) > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bv
  FROM th, unnest(generate_series(0, ${SimBits - 1})) AS t(b) GROUP BY doc_id, b),
sims AS (SELECT doc_id, sum(bv * (1::BIGINT << b))::BIGINT AS simhash FROM bits GROUP BY doc_id)
SELECT a.doc_id AS x, b.doc_id AS y, bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming"""
  }
}
