package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object Packing {

  private val DefaultBudget = 256L
  private val DefaultShards = 32

  /** (shard, doc_id, tok, bin, fill): bin = next-fit bin index within
    * the shard, fill = bin occupancy AFTER placing this doc. */
  def packSequences(documents: DataFrame, budget: Long = DefaultBudget,
      shards: Int = DefaultShards): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        pmod(col("doc_id"), lit(shards)).cast("int").as("shard"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
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

  /** Recursive-CTE mirror: one recursion step per doc per shard, same
    * next-fit recurrence. */
  val packSequencesSql: String =
    s"""WITH RECURSIVE toks AS (
  SELECT doc_id, (doc_id % $DefaultShards)::INT AS shard,
         len(string_split(text, ' '))::BIGINT AS tok,
         row_number() OVER (PARTITION BY doc_id % $DefaultShards ORDER BY doc_id) AS rn
  FROM documents),
pack AS (
  SELECT shard, rn, doc_id, tok, 0::BIGINT AS bin, tok AS fill FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.tok,
         CASE WHEN p.fill + t.tok <= $DefaultBudget THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + t.tok <= $DefaultBudget THEN p.fill + t.tok ELSE t.tok END
  FROM pack p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1)
SELECT shard, doc_id, tok, bin, fill FROM pack"""
}
