package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed end-to-end curation pipeline (SURVEY §2.3 L20) — the
  * LLM-data counterpart of the traffic flagship's composition: the
  * individual operators are only useful chained, and the chain is what
  * runs at 100 TB. Stages:
  *
  *   1. quality floor   — keep docs with quality_score >= 0.15
  *                        ([[TextAnalysis.quality]]; map-only);
  *   2. exact dedup     — keep the min-doc_id representative of each
  *                        md5(text) group ([[Dedup.exact]]; one
  *                        16-byte-key shuffle);
  *   3. near-dup dedup  — keep each connected component's
  *                        representative over the MinHash+LSH pair
  *                        graph ([[Dedup.dedupClusters]]);
  *   4. output shaping  — PII-scrubbed digest + BPE-ish token count
  *                        per surviving doc (map-only).
  *
  * All predicates are left-semi joins on doc_id (no row explosion, no
  * wide shuffle — survivor id sets are narrow), and the stage order
  * puts the cheap map-only filter first so the expensive pair
  * generators see only quality-passing candidates' ids at the end.
  * The DuckDB oracle composes the SAME stage CTEs, so the gate proves
  * the whole chain, not just its pieces.
  */
object Curation {

  private val QualityFloor = 0.15

  def curationPipeline(documents: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(documents)
      .where(col("quality_score") >= QualityFloor)
      .select(col("doc_id"), col("quality_score"))
    val exactKeep = Dedup.exact(documents)
      .select(col("keep_id").as("doc_id"))
    val nearKeep = Dedup.dedupClusters(documents)
      .where(col("keep") === 1).select(col("doc_id"))
    val scrub = TextAnalysis.piiScrub(documents)
    val toks = TextAnalysis.tokenCount(documents)
      .select(col("doc_id"), col("bpe_tokens"))
    documents.select(col("doc_id"))
      .join(q, "doc_id")
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearKeep, Seq("doc_id"), "left_semi")
      .join(scrub, "doc_id")
      .join(toks, "doc_id")
      .select(col("doc_id"), col("quality_score"), col("bpe_tokens"),
        (col("n_emails") + col("n_urls")).as("n_pii"), col("scrubbed_md5"))
  }

  val curationPipelineSql: String = {
    // stage CTEs reuse the member operators' oracle SQL verbatim (the
    // per-operator gates already prove each bit-identical)
    s"""WITH RECURSIVE q AS (SELECT doc_id, quality_score FROM (${TextAnalysis.qualitySql}) WHERE quality_score >= $QualityFloor),
ek AS (SELECT keep_id AS doc_id FROM (${Dedup.exactSql})),
cl AS (${Dedup.dedupClustersSql}),
nk AS (SELECT doc_id FROM cl WHERE keep = 1),
scrub AS (${TextAnalysis.piiScrubSql}),
toks AS (${TextAnalysis.tokenCountSql})
SELECT d.doc_id, q.quality_score, toks.bpe_tokens,
  (scrub.n_emails + scrub.n_urls) AS n_pii, scrub.scrubbed_md5
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN ek ON ek.doc_id = d.doc_id
JOIN nk ON nk.doc_id = d.doc_id
JOIN scrub ON scrub.doc_id = d.doc_id
JOIN toks ON toks.doc_id = d.doc_id"""
  }
}
