package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** L92 (r7): chat-transcript parsing + SFT loss-mask computation —
  * the instruction-tuning data-prep stage (SURVEY §2.3).
  *
  * Pretraining operators treat a document as one flat string; SFT
  * corpora are TURN-STRUCTURED (`<|role|>content<|end|>` markup, the
  * chat-template shape), and the training loop needs, per turn: the
  * role, the exact byte span (so the collator can slice the rendered
  * transcript without re-tokenizing), the token count, and the
  * TRAINABLE flag — loss is masked to assistant turns; user/system
  * tokens condition but never train. Malformed transcripts (role
  * repetition, missing system head) are flagged, not dropped — the
  * release gate decides.
  *
  * Everything is doc-local: parsing is a pure-column regex chain
  * (RE2-safe — content is '<'-free by the markup's own contract, so
  * `<\|([a-z]+)\|>([^<]*)<\|end\|>` needs no lookahead), byte offsets
  * come from one per-doc prefix-sum window over the ≤turns-per-doc
  * frame, and the corpus shuffles only on doc_id (the C4 contract).
  *
  * Verified the L55 way: a deterministic generator renders each
  * corpus doc into a transcript (fixed system turn, alternating
  * user/assistant turns of 12-token chunks), the parser must invert
  * it — spans substr-exact against the rendered transcript, roles
  * alternating, masks covering exactly the assistant turns — and the
  * DuckDB oracle replays generator + parser.
  */
object Chat {

  private val ChunkToks = 12
  private val SystemText = "be concise and helpful"

  /** Deterministic chat rendering of a plain-text doc. */
  private[graft] def transcriptCol: Column = {
    val toks = tokens(col("text"))
    val nChunks = ceil(size(toks).cast("double") / ChunkToks).cast("int")
    val turns = transform(sequence(lit(1), greatest(nChunks, lit(1))), i =>
      concat(
        lit("<|"),
        when(i % 2 === 1, lit("user")).otherwise(lit("assistant")),
        lit("|>"),
        concat_ws(" ", slice(toks, (i - 1) * ChunkToks + 1, lit(ChunkToks))),
        lit("<|end|>")))
    concat(lit(s"<|system|>$SystemText<|end|>"), concat_ws("", turns))
  }

  /** Parse `(doc_id, transcript)` rows into per-turn structure. */
  def parseChat(chats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pat = "<\\|([a-z]+)\\|>([^<]*)<\\|end\\|>"
    val turns = chats
      .select(col("doc_id"),
        regexp_extract_all(col("transcript"), lit(pat), lit(1)).as("roles"),
        regexp_extract_all(col("transcript"), lit(pat), lit(2)).as("contents"))
      .select(col("doc_id"), col("contents"), posexplode(col("roles")).as(Seq("i", "role")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("turn_idx"),
        col("role"), element_at(col("contents"), col("i") + 1).as("content"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("turn_idx"))
    turns
      // marker overhead: <|role|> + content + <|end|>
      .withColumn("seg_len",
        length(col("role")) + lit(4) + length(col("content")) + lit(7))
      .withColumn("start_byte",
        coalesce(sum(col("seg_len")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + length(col("role")) + lit(4) + 1)
      .withColumn("len", length(col("content")).cast("long"))
      .withColumn("n_tokens",
        when(length(col("content")) === 0, 0L)
          .otherwise(size(tokens(col("content"))).cast("long")))
      .withColumn("trainable", (col("role") === "assistant").cast("long"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("turn_ok",
        when(col("turn_idx") === 1, (col("role") === "system").cast("long"))
          .otherwise((col("prev_role") =!= col("role")).cast("long")))
      .select(col("doc_id"), col("turn_idx"), col("role"), col("start_byte"),
        col("len"), col("n_tokens"), col("trainable"), col("turn_ok"),
        md5(col("content")).as("content_md5"))
  }

  /** The demo surface: render the corpus as chat, then parse it. */
  def chatTurns(documents: DataFrame): DataFrame =
    parseChat(documents.select(col("doc_id"), transcriptCol.as("transcript")))

  /** The L118 seam: user turns with their RAW content (chatTurns
    * releases only the md5 — dedup needs the text itself). */
  private[graft] def userTurns(documents: DataFrame): DataFrame = {
    val pat = "<\\|([a-z]+)\\|>([^<]*)<\\|end\\|>"
    documents.select(col("doc_id"), transcriptCol.as("transcript"))
      .select(col("doc_id"),
        regexp_extract_all(col("transcript"), lit(pat), lit(1)).as("roles"),
        regexp_extract_all(col("transcript"), lit(pat), lit(2)).as("contents"))
      .select(col("doc_id"), col("contents"), posexplode(col("roles")).as(Seq("i", "role")))
      .where(col("role") === "user")
      .select(col("doc_id"), (col("i") + 1).cast("long").as("turn_idx"),
        element_at(col("contents"), col("i") + 1).as("content"))
  }

  /** CTE body yielding (doc_id, turn_idx, content) for user turns —
    * the SQL mirror of [[userTurns]], shared shape with chatTurnsSql's
    * r/z/t prefix. */
  private[graft] val userTurnsSql: String = {
    val toksSql = "string_split_regex(lower(text), '\\s+')"
    s"""WITH r AS (SELECT doc_id,
    '<|system|>$SystemText<|end|>' ||
    string_agg('<|' || (CASE WHEN i % 2 = 1 THEN 'user' ELSE 'assistant' END) || '|>' ||
      array_to_string(($toksSql)[((i - 1) * $ChunkToks + 1):(i * $ChunkToks)], ' ') ||
      '<|end|>', '' ORDER BY i) AS transcript
  FROM documents,
    LATERAL unnest(generate_series(1, greatest(cast(ceil(len($toksSql)::DOUBLE / $ChunkToks) AS BIGINT), 1))) AS u(i)
  GROUP BY doc_id, text),
z AS (SELECT doc_id,
    regexp_extract_all(transcript, '<\\|([a-z]+)\\|>([^<]*)<\\|end\\|>', 1) AS roles,
    regexp_extract_all(transcript, '<\\|([a-z]+)\\|>([^<]*)<\\|end\\|>', 2) AS contents
  FROM r),
t AS (SELECT doc_id, i::BIGINT AS turn_idx, roles[i] AS role, contents[i] AS content
  FROM z, LATERAL unnest(generate_series(1, len(roles))) AS u(i))
SELECT doc_id, turn_idx, content FROM t WHERE role = 'user'"""
  }

  val chatTurnsSql: String = {
    val toksSql = "string_split_regex(lower(text), '\\s+')"
    s"""WITH r AS (SELECT doc_id,
    '<|system|>$SystemText<|end|>' ||
    string_agg('<|' || (CASE WHEN i % 2 = 1 THEN 'user' ELSE 'assistant' END) || '|>' ||
      array_to_string(($toksSql)[((i - 1) * $ChunkToks + 1):(i * $ChunkToks)], ' ') ||
      '<|end|>', '' ORDER BY i) AS transcript
  FROM documents,
    LATERAL unnest(generate_series(1, greatest(cast(ceil(len($toksSql)::DOUBLE / $ChunkToks) AS BIGINT), 1))) AS u(i)
  GROUP BY doc_id, text),
z AS (SELECT doc_id,
    regexp_extract_all(transcript, '<\\|([a-z]+)\\|>([^<]*)<\\|end\\|>', 1) AS roles,
    regexp_extract_all(transcript, '<\\|([a-z]+)\\|>([^<]*)<\\|end\\|>', 2) AS contents
  FROM r),
t AS (SELECT doc_id, i::BIGINT AS turn_idx, roles[i] AS role, contents[i] AS content
  FROM z, LATERAL unnest(generate_series(1, len(roles))) AS u(i)),
o AS (SELECT doc_id, turn_idx, role, content,
    length(role) + 4 + length(content) + 7 AS seg_len,
    lag(role) OVER w AS prev_role
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY turn_idx)),
p AS (SELECT *, coalesce(sum(seg_len) OVER (PARTITION BY doc_id ORDER BY turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_len FROM o)
SELECT doc_id, turn_idx, role,
  (before_len + length(role) + 4 + 1)::BIGINT AS start_byte,
  length(content)::BIGINT AS len,
  (CASE WHEN length(content) = 0 THEN 0
        ELSE len(string_split_regex(lower(content), '\\s+')) END)::BIGINT AS n_tokens,
  (role = 'assistant')::BIGINT AS trainable,
  (CASE WHEN turn_idx = 1 THEN (role = 'system')::INT
        ELSE (prev_role <> role)::INT END)::BIGINT AS turn_ok,
  md5(content) AS content_md5
FROM p"""
  }
}
