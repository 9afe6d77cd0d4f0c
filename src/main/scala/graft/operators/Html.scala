package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction (SURVEY §2.3 L55, r6) — the missing
  * first stage of a web-crawl corpus: every curation pipeline starts
  * from markup, not clean text, and L8-L31 all assume the markup is
  * already gone.
  *
  * The operator is a pure-column chain (regexp_replace / regexp_
  * extract_all / transform — all codegen'd, map-only, zero shuffles):
  *   1. strip whole boilerplate CONTAINERS (script / style / nav /
  *      header / footer) with non-greedy dotall patterns — RE2-safe
  *      (no backreferences), so the identical patterns run in DuckDB;
  *   2. collect the content blocks (`<p>…</p>` bodies, group 1);
  *   3. entity-unescape each block (&lt; &gt; &amp; — &amp; LAST, the
  *      standard order) and concatenate.
  *
  * Verification is the Multimodal generator-arithmetic pattern: a
  * deterministic generator wraps each document's text in a full page
  * — adversarially, with `<p>` blocks INSIDE the script and nav
  * boilerplate that a naive tag-strip would leak into the output —
  * chunked into paragraphs at fixed 80-char offsets, entity-escaped.
  * Extraction must reproduce the source text BYTE-EXACTLY
  * (`roundtrip_exact`), and the oracle replays generator + extractor
  * in DuckDB so the hash compare pins both sides cross-engine.
  *
  * 100 TB posture: map-only (the chain never shuffles, never
  * collects); at scale the generator column is replaced by the real
  * crawl's html column and nothing else changes.
  */
object Html {

  private val Containers = Seq("script", "style", "nav", "header", "footer")

  private def esc(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  private def unesc(c: Column): Column =
    replace(replace(replace(c, lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")), lit("&amp;"), lit("&"))

  /** Deterministic page around each document's text: head boilerplate
    * (style + a script whose STRING BODY contains a fake `<p>` block),
    * nav with a boilerplate `<p>`, header, the content as 80-char
    * `<p>` chunks (entity-escaped), and a footer with an entity. */
  def asHtml(documents: DataFrame): DataFrame = {
    val nb = greatest(expr("(length(text) + 79) div 80"), lit(1))
    val paras = array_join(
      transform(sequence(lit(0), nb - 1),
        i => concat(lit("<p>"), esc(col("text").substr(i * 80 + 1, lit(80))), lit("</p>"))),
      "")
    documents.select(col("doc_id"), col("text"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"), lit("</title>"),
        lit("<style>body { margin: 0; } .ad { color: red }</style>"),
        lit("<script>var s = \"<p>BOILERPLATE</p>\"; if (1 < 2 && 3 > 1) { s = s + s; }</script>"),
        lit("</head><body>"),
        lit("<nav><p>Home | About | <a href=\"/contact\">Contact</a></p></nav>"),
        lit("<header><h1>Doc "), col("doc_id").cast("string"), lit("</h1></header>"),
        lit("<div class=\"content\">"), paras, lit("</div>"),
        lit("<footer><p>Copyright &amp; Terms</p></footer>"),
        lit("</body></html>")).as("html"))
  }

  /** (doc_id, extracted) from an html column — the reusable stage a
    * crawl pipeline composes in front of L9 quality / L20 curation. */
  def extractText(html: DataFrame, htmlCol: String = "html",
      keep: Seq[String] = Nil): DataFrame = {
    // tags may carry attributes (`<p class="x">`, `<script type=…>`)
    // — `(?:\s[^>]*)?` accepts them without touching `<pre>`-style
    // distinct tag names; RE2-safe, identical in DuckDB
    val stripped = Containers.foldLeft(col(htmlCol)) { (acc, t) =>
      regexp_replace(acc, s"(?s)<$t(?:\\s[^>]*)?>.*?</$t>", "")
    }
    html.select(col("doc_id") +: keep.map(col) :+
        regexp_extract(col(htmlCol), "<title>(.*?)</title>", 1).as("title") :+
        regexp_extract_all(stripped, lit("(?s)<p(?:\\s[^>]*)?>(.*?)</p>"), lit(1)).as("blocks"): _*)
      .select(col("doc_id") +: keep.map(col) :+ col("title") :+
        size(col("blocks")).cast("long").as("n_blocks") :+
        array_join(transform(col("blocks"), b => unesc(b)), "").as("extracted"): _*)
  }

  /** The oracle-checked query: generate, extract, prove the byte-exact
    * roundtrip per document. The source text rides the same map-only
    * chain (no re-join back to the corpus). */
  def htmlExtract(documents: DataFrame): DataFrame =
    extractText(asHtml(documents), keep = Seq("text"))
      .select(col("doc_id"), col("title"), col("n_blocks"),
        md5(col("extracted")).as("extracted_md5"),
        (col("extracted") === col("text")).as("roundtrip_exact"))

  val htmlExtractSql: String = {
    val escSql =
      "replace(replace(replace(substr(text, i * 80 + 1, 80), '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    val strippedSql = Containers.foldLeft("html") { (acc, t) =>
      s"regexp_replace($acc, '(?s)<$t(?:\\s[^>]*)?>.*?</$t>', '', 'g')"
    }
    s"""WITH g AS (
  SELECT doc_id, text,
    '<html><head><title>Doc ' || doc_id::VARCHAR || '</title>'
    || '<style>body { margin: 0; } .ad { color: red }</style>'
    || '<script>var s = "<p>BOILERPLATE</p>"; if (1 < 2 && 3 > 1) { s = s + s; }</script>'
    || '</head><body>'
    || '<nav><p>Home | About | <a href="/contact">Contact</a></p></nav>'
    || '<header><h1>Doc ' || doc_id::VARCHAR || '</h1></header>'
    || '<div class="content">'
    || array_to_string(list_transform(
         generate_series(0, greatest((length(text) + 79) // 80 - 1, 0)),
         i -> '<p>' || $escSql || '</p>'), '')
    || '</div>'
    || '<footer><p>Copyright &amp; Terms</p></footer>'
    || '</body></html>' AS html
  FROM documents),
x AS (
  SELECT doc_id, text,
    regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
    regexp_extract_all($strippedSql, '(?s)<p(?:\\s[^>]*)?>(.*?)</p>', 1) AS blocks
  FROM g),
e AS (
  SELECT doc_id, text, title, len(blocks)::BIGINT AS n_blocks,
    array_to_string(list_transform(blocks,
      b -> replace(replace(replace(b, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')), '') AS extracted
  FROM x)
SELECT doc_id, title, n_blocks, md5(extracted) AS extracted_md5,
  extracted = text AS roundtrip_exact
FROM e"""
  }
}
