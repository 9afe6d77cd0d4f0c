package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches (SURVEY §2.3 L27).
  *
  * Next-fit bin packing of whole documents into fixed token-budget
  * bins: docs are sharded, ordered by doc_id within a shard, and the
  * current bin closes whenever the next doc does not fit. No document
  * is split; a doc larger than the budget gets a bin of its own. This
  * is the standard whole-doc packing used when examples must not cross
  * attention boundaries (the alternative, concat-and-chunk, is a
  * cumulative-sum window — strictly easier).
  *
  * Scale shape: next-fit is sequentially dependent WITHIN a shard by
  * definition, so the shard is the parallelism unit — the same
  * repartition + sortWithinPartitions + mapPartitions pattern as
  * [[graft.traffic.SlidingScan]]. Shard count scales with the cluster;
  * state per shard is two longs (current bin, current fill); one
  * exchange of (shard, doc_id, tok) triples total.
  *
  * Two budget meters: [[packSequences]] uses the whitespace proxy
  * (cheap, split-only); [[packSequencesBpe]] (r6) budgets by REAL BPE
  * token counts — L33's `graft_bpe` inference riding the same select,
  * so the count a training batch actually pays is the count the bins
  * are sized by. The packing recurrence is shared; only the `tok`
  * column differs.
  */
object Packing {

  private val DefaultBudget = 256L
  private val DefaultShards = 32

  /** BPE budget — sized from the corpus (median ~250 alpha chars/doc
    * pre-merge → ~5 docs/bin), mirrored in the oracle. */
  private val BpeBudget = 1024L

  /** The shared next-fit core over (shard, doc_id, tok). */
  private def nextFit(toks: DataFrame, budget: Long): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        // several shards can hash into one partition; the sort keeps
        // each contiguous, so a shard change resets the packing state
        var shard = Int.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (s, id, tok) =>
          if (s != shard) { shard = s; bin = 0L; fill = tok }
          else if (fill + tok <= budget) fill += tok
          else { bin += 1L; fill = tok }
          (s, id, tok, bin, fill)
        }
      }
      .toDF("shard", "doc_id", "tok", "bin", "fill")
  }

  private def sharded(documents: DataFrame, tok: Column, shards: Int): DataFrame =
    documents.select(
      pmod(col("doc_id"), lit(shards)).cast("int").as("shard"),
      col("doc_id"),
      tok.cast("long").as("tok"))

  /** (shard, doc_id, tok, bin, fill): bin = next-fit bin index within
    * the shard, fill = bin occupancy AFTER placing this doc. */
  def packSequences(documents: DataFrame, budget: Long = DefaultBudget,
      shards: Int = DefaultShards): DataFrame =
    nextFit(sharded(documents, size(split(col("text"), " ")), shards), budget)

  /** Token-exact twin (r6): the SAME next-fit recurrence, budgeted by
    * the real BPE token count — Σ over [a-z]+ words of
    * len(graft_bpe(word)). The count rides the scan as one map-only
    * aggregate-of-transform (no explode, no per-word shuffle: the
    * lambda only touches its own element, so evaluation is linear),
    * then the one (shard) exchange is identical to L27. Docs with no
    * [a-z]+ word pack as tok=0. */
  def packSequencesBpe(documents: DataFrame, budget: Long = BpeBudget,
      shards: Int = DefaultShards): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    val bpeTok = expr(
      """aggregate(
        |  transform(regexp_extract_all(lower(text), '[a-z]+', 0),
        |            w -> size(graft_bpe(w))),
        |  0L, (acc, x) -> acc + x)""".stripMargin)
    nextFit(sharded(documents, bpeTok, shards), budget)
  }

  private def packCtes(toksCte: String, budget: Long): String =
    s"""pack AS (
  SELECT shard, rn, doc_id, tok, 0::BIGINT AS bin, tok AS fill FROM $toksCte WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.tok,
         CASE WHEN p.fill + t.tok <= $budget THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + t.tok <= $budget THEN p.fill + t.tok ELSE t.tok END
  FROM pack p JOIN $toksCte t ON t.shard = p.shard AND t.rn = p.rn + 1)
SELECT shard, doc_id, tok, bin, fill FROM pack"""

  /** Recursive-CTE mirror: one recursion step per doc per shard, same
    * next-fit recurrence. */
  val packSequencesSql: String =
    s"""WITH RECURSIVE toks AS (
  SELECT doc_id, (doc_id % $DefaultShards)::INT AS shard,
         len(string_split(text, ' '))::BIGINT AS tok,
         row_number() OVER (PARTITION BY doc_id % $DefaultShards ORDER BY doc_id) AS rn
  FROM documents),
${packCtes("toks", DefaultBudget)}"""

  /** BPE-twin mirror: per-doc counts from the SAME greedy-merge replay
    * as bpeEncodeSql (TextAnalysis.bpeFinCtes), then the identical
    * packing recursion. LEFT JOIN keeps wordless docs at tok 0. */
  val packSequencesBpeSql: String =
    s"""WITH RECURSIVE
${TextAnalysis.bpeFinCtes},
btoks AS (
  SELECT d.doc_id, (d.doc_id % $DefaultShards)::INT AS shard,
         coalesce(sum(f.n_toks), 0)::BIGINT AS tok,
         row_number() OVER (PARTITION BY d.doc_id % $DefaultShards ORDER BY d.doc_id) AS rn
  FROM documents d LEFT JOIN fin f USING (doc_id)
  GROUP BY d.doc_id),
${packCtes("btoks", BpeBudget)}"""

  // ---- L62 (r6): overlapping context-window chunking ----
  // The concat-free half of batch prep (RAG passage windows, long-doc
  // truncation-free training): each doc splits into windows of W=32
  // tokens at stride S=24 (overlap W-S=8), so no token is ever lost at
  // a window boundary and every chunk carries its absolute offset.
  // Scale: PURE MAP — n_chunks and every window derive from the one
  // token array already in the row (sequence + explode + slice), zero
  // shuffles, fused into the parquet scan. The 100 TB posture is
  // exactly the scan's: output rows ~= input tokens / S.
  private val ChunkW = 32L
  private val ChunkS = 24L

  def chunkDocs(documents: DataFrame): DataFrame = {
    val base = documents
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      // ceil((n-W)/S)+1 windows; sequence() counts DOWN if the bound
      // goes negative, so the n <= W case pins n_chunks to 1
      .withColumn("n_chunks", when(col("n") <= ChunkW, lit(1L))
        .otherwise(expr(s"(n - $ChunkW + $ChunkS - 1) div $ChunkS") + 1L))
    base
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * ChunkS)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        least(lit(ChunkW), col("n") - col("start_tok")).as("chunk_len"),
        array_join(slice(col("toks"), (col("start_tok") + 1).cast("int"),
          lit(ChunkW.toInt)), " ").as("chunk_text"))
  }

  val chunkDocsSql: String =
    s"""WITH base AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
c AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
  CASE WHEN len(toks) <= $ChunkW THEN 1
       ELSE (len(toks) - $ChunkW + $ChunkS - 1) // $ChunkS + 1 END::BIGINT AS n_chunks
  FROM base)
SELECT doc_id, (e - 1)::BIGINT AS chunk_id, ((e - 1) * $ChunkS)::BIGINT AS start_tok,
  least($ChunkW, n - (e - 1) * $ChunkS)::BIGINT AS chunk_len,
  array_to_string(toks[((e - 1) * $ChunkS + 1):((e - 1) * $ChunkS + $ChunkW)], ' ') AS chunk_text
FROM c, unnest(generate_series(1, n_chunks)) AS u(e)"""
}
