package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** URL canonicalization + URL-level dedup (SURVEY §2.3 L57, r6) —
  * the first dedup key of every web crawl: the same page is fetched
  * under dozens of spellings (case, default ports, tracking params,
  * param order, fragments, trailing slashes) and crawl pipelines
  * canonicalize BEFORE any content dedup so refetches collapse for
  * free. L55 (HTML) strips the markup; this collapses the fetch
  * space.
  *
  * Canonical form (the standard safe subset: RFC 3986 §6 syntax-based
  * normalization plus the universal tracking-param strip):
  *   lowercase scheme+host → drop fragment → drop default port
  *   (:80 http, :443 https) → drop `www.` → strip tracking params
  *   (utm_*, fbclid, gclid) → sort surviving params bytewise → drop
  *   trailing path slash (non-root). Pure-column chain (regexp +
  *   split/filter/array_sort/array_join — codegen'd, map-only);
  *   dedup is one (canon_url) shuffle with map-side partials.
  *
  * Verification is the asHtml generator-arithmetic pattern: a
  * deterministic generator derives an ADVERSARIAL spelling per doc —
  * case/port/fragment/param-order/tracking noise selected by doc_id
  * residues — of a logical page keyed by doc_id % 17, so exactly the
  * docs sharing a residue must collapse to one canonical URL. The
  * oracle replays generator + canonicalizer in DuckDB; group sizes,
  * first-owner ids, and the canonical strings all hash-compare.
  *
  * 100 TB posture: canonicalize is map-only; the dedup shuffle keys
  * on canon_url (near-uniform); blocklists ride as a broadcast (here
  * a literal IN — swap for a broadcast join against a real blocklist
  * table and nothing else changes).
  */
object Urls {

  private val Pages = 17
  private val Blocked = Seq("spam-mill.net", "link-farm.org")

  /** Deterministic adversarial spelling of page (doc_id % 17). */
  def asUrls(documents: DataFrame): DataFrame = {
    val k = col("doc_id") % Pages
    asUrls(documents, k, k === 13)
  }

  /** Generator with an arbitrary page-identity column (which docs are
    * refetches of the same logical page) and blocklist predicate —
    * the spelling noise stays keyed to the FETCH (doc_id). */
  def asUrls(documents: DataFrame, pageId: Column, blockedWhen: Column): DataFrame =
    documents.select(col("doc_id"), urlCol(pageId, blockedWhen).as("url"))

  /** The generated spelling as a pure column (streams compose it with
    * withColumn — no join needed to keep their other columns). */
  def urlCol(pageId: Column, blockedWhen: Column): Column =
    urlCol(pageId, pageId, blockedWhen)

  /** As above with an independent host identity — many pages per host
    * (the L75 politeness regime); the default keeps host ≡ page. */
  def urlCol(pageId: Column, hostId: Column, blockedWhen: Column): Column = {
    val k = pageId
    val host = concat(
      when(col("doc_id") % 3 === 0, lit("WWW.Site")).otherwise(lit("site")),
      hostId.cast("string"),
      when(col("doc_id") % 11 === 0, lit(".EXAMPLE.com")).otherwise(lit(".example.com")),
      // blocklisted pages land on a blocklisted host entirely
      when(blockedWhen, lit(".spam-mill.net")).otherwise(lit("")))
    val port = when(col("doc_id") % 4 === 0, lit(":80")).otherwise(lit(""))
    val path = concat(lit("/articles/item"), k.cast("string"),
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")))
    val query = when(col("doc_id") % 2 === 0,
        concat(lit("?b="), k.cast("string"), lit("&utm_source=feed&a=1")))
      .otherwise(concat(lit("?a=1&fbclid=xyz"), col("doc_id").cast("string"),
        lit("&b="), k.cast("string")))
    val frag = when(col("doc_id") % 7 === 0,
      concat(lit("#sec"), col("doc_id").cast("string"))).otherwise(lit(""))
    concat(lit("http://"), host, port, path, query, frag)
  }

  /** Blocklist predicate over a canonical URL. */
  def isBlockedDomain(canon: Column): Column =
    Blocked.map(b => hostOf(canon).endsWith(b)).reduce(_ || _)

  /** The canonicalization chain over a url column. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase scheme://host[:port] only — path/query case is significant
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]*//[^/?]*)", 1)),
      regexp_replace(noFrag, "^[^/]*//[^/?]*", ""))
    // RE2 (the oracle engine) has no lookahead: strip default ports
    // with a followed-by-[/?] pass then an end-of-string pass
    val noPort = Seq(("https", "443"), ("http", "80")).foldLeft(lowered) {
      case (acc, (scheme, port)) =>
        regexp_replace(
          regexp_replace(acc, s"^($scheme://[^/?:]*):$port([/?])", "$1$2"),
          s"^($scheme://[^/?:]*):$port$$", "$1")
    }
    val noWww = regexp_replace(noPort, "^([a-z]+://)www\\.", "$1")
    val base = regexp_replace(noWww, "\\?.*$", "")
    val qs = regexp_extract(noWww, "\\?(.*)$", 1)
    val params = array_sort(filter(split(qs, "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid)=") || p === "")))
    val baseNoSlash = regexp_replace(base, "(://[^/]+/.+?)/$", "$1")
    concat(baseNoSlash,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  private def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z]+://([^/?]+)", 1)

  /** (doc_id, url, canon_url, domain, blocked, group_size, first_id,
    * is_canonical_fetch): URL-level dedup — keep the lowest doc_id
    * per canonical URL, flag blocklisted domains. */
  def urlDedup(documents: DataFrame): DataFrame = {
    val k = col("doc_id") % Pages
    urlDedup(documents, k, k === 13)
  }

  def urlDedup(documents: DataFrame, pageId: Column, blockedWhen: Column): DataFrame =
    urlDedup(documents, pageId, pageId, blockedWhen)

  def urlDedup(documents: DataFrame, pageId: Column, hostId: Column,
      blockedWhen: Column): DataFrame = {
    val canon = documents
      .select(col("doc_id"), urlCol(pageId, hostId, blockedWhen).as("url"))
      .select(col("doc_id"), col("url"), canonicalizeUrl(col("url")).as("canon_url"))
      .withColumn("domain", hostOf(col("canon_url")))
    val groups = canon.groupBy(col("canon_url"))
      .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("first_id"))
    canon.join(groups, "canon_url")
      .select(col("doc_id"), col("url"), col("canon_url"), col("domain"),
        Blocked.map(b => col("domain").endsWith(b)).reduce(_ || _)
          .cast("long").as("blocked"),
        col("group_size"), col("first_id"),
        (col("doc_id") === col("first_id")).cast("long").as("is_canonical_fetch"))
  }

  /** Oracle with the same (pageId, blockedWhen) parameters as the
    * Spark generator — pass SQL expressions over doc_id. */
  def urlDedupSqlFor(pageSql: String, blockedWhenSql: String): String =
    urlDedupSqlFor(pageSql, pageSql, blockedWhenSql)

  def urlDedupSqlFor(pageSql: String, hostSql: String, blockedWhenSql: String): String = {
    val gen = s"""'http://'
    || CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site' ELSE 'site' END
    || ($hostSql)::VARCHAR
    || CASE WHEN doc_id % 11 = 0 THEN '.EXAMPLE.com' ELSE '.example.com' END
    || CASE WHEN $blockedWhenSql THEN '.spam-mill.net' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END
    || '/articles/item' || ($pageSql)::VARCHAR
    || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 2 = 0
         THEN '?b=' || ($pageSql)::VARCHAR || '&utm_source=feed&a=1'
         ELSE '?a=1&fbclid=xyz' || doc_id::VARCHAR || '&b=' || ($pageSql)::VARCHAR END
    || CASE WHEN doc_id % 7 = 0 THEN '#sec' || doc_id::VARCHAR ELSE '' END"""
    val blockedSql = Blocked
      .map(b => s"domain LIKE '%$b'").mkString("(", " OR ", ")")
    s"""WITH u AS (SELECT doc_id, $gen AS url FROM documents),
c0 AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS s FROM u),
c1 AS (SELECT doc_id, url,
  lower(regexp_extract(s, '^([^/]*//[^/?]*)', 1)) || regexp_replace(s, '^[^/]*//[^/?]*', '') AS s
  FROM c0),
c2 AS (SELECT doc_id, url,
  regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(s,
      '^(https://[^/?:]*):443([/?])', '\\1\\2'), '^(https://[^/?:]*):443$$', '\\1'),
      '^(http://[^/?:]*):80([/?])', '\\1\\2'), '^(http://[^/?:]*):80$$', '\\1') AS s
  FROM c1),
c3 AS (SELECT doc_id, url, regexp_replace(s, '^([a-z]+://)www\\.', '\\1') AS s FROM c2),
c4 AS (SELECT doc_id, url,
  regexp_replace(regexp_replace(s, '\\?.*$$', ''), '(://[^/]+/.+?)/$$', '\\1') AS base,
  list_sort(list_filter(string_split(regexp_extract(s, '\\?(.*)$$', 1), '&'),
    p -> NOT (regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=') OR p = ''))) AS params
  FROM c3),
canon AS (SELECT doc_id, url,
  base || CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS canon_url
  FROM c4),
cd AS (SELECT doc_id, url, canon_url,
  regexp_extract(canon_url, '^[a-z]+://([^/?]+)', 1) AS domain FROM canon),
g AS (SELECT canon_url, count(*)::BIGINT AS group_size, min(doc_id) AS first_id
  FROM cd GROUP BY canon_url)
SELECT doc_id, url, canon_url, domain, $blockedSql::BIGINT AS blocked,
  group_size, first_id, (doc_id = first_id)::BIGINT AS is_canonical_fetch
FROM cd JOIN g USING (canon_url)"""
  }

  val urlDedupSql: String =
    urlDedupSqlFor(s"doc_id % $Pages", s"doc_id % $Pages = 13")

  /** Just the keep set (doc_id of each canonical, unblocked fetch) —
    * ONE canonicalization pass + one (canon_url) aggregate, no
    * join-back; what a pipeline stage composes (the full [[urlDedup]]
    * report keeps per-fetch provenance instead). */
  def canonicalFetches(documents: DataFrame, pageId: Column,
      blockedWhen: Column): DataFrame =
    asUrls(documents, pageId, blockedWhen)
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("canon_url"))
      .groupBy(col("canon_url")).agg(min(col("doc_id")).as("doc_id"))
      .where(!isBlockedDomain(col("canon_url")))
      .select(col("doc_id"))

  // ---- L75 (r6): crawl-frontier politeness scheduling ----
  // The fetch scheduler a crawler runs over its deduped frontier:
  // POLITENESS means at most `PerHostPerRound` fetches per host per
  // round, so a host's queue position — not global priority — decides
  // WHEN a URL is fetched: queue_pos = rank within the host by
  // (deterministic priority, id), fetch_round = (queue_pos−1) div R.
  // A 10^6-URL host stretches over 5·10^5 rounds while a 10-URL host
  // finishes in 5 — the long-tail/hot-host asymmetry is the point.
  // Scale shape: the frontier gate is L57's one canonicalization pass
  // + one (canon_url) aggregate; the schedule itself is ONE per-host
  // ordered scan (window partition = the host — the per-host order is
  // what a polite fetcher must materialize anyway) and a map-only
  // round projection. Priority is md5-hash demo state; a real crawler
  // swaps in host rank/recency and the shape is unchanged.
  private val PerHostPerRound = 2L
  private val FrontierHosts = 5L

  def frontierSchedule(documents: DataFrame): DataFrame = {
    val page = col("doc_id") % Pages
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("domain"))
      .orderBy(md5Long(lit("prio"), col("doc_id")), col("doc_id"))
    // hostId = page mod 5: several pages per host — the regime where
    // per-host queueing (not global priority) decides the fetch time
    urlDedup(documents, page, page % FrontierHosts, page === 13)
      .where(col("is_canonical_fetch") === 1 && col("blocked") === 0)
      .select(col("doc_id"), col("domain"))
      .withColumn("queue_pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("domain"), col("queue_pos"),
        expr(s"(queue_pos - 1) div $PerHostPerRound").as("fetch_round"))
  }

  val frontierScheduleSql: String = {
    val dd = urlDedupSqlFor(s"doc_id % $Pages",
      s"(doc_id % $Pages) % $FrontierHosts", s"doc_id % $Pages = 13")
    s"""WITH dd AS ($dd),
f AS (SELECT doc_id, domain FROM dd WHERE is_canonical_fetch = 1 AND blocked = 0),
q AS (SELECT doc_id, domain,
  row_number() OVER (PARTITION BY domain
    ORDER BY ${md5LongSql("'prio'", "doc_id")}, doc_id)::BIGINT AS queue_pos
  FROM f)
SELECT doc_id, domain, queue_pos,
  ((queue_pos - 1) // $PerHostPerRound)::BIGINT AS fetch_round
FROM q"""
  }
}
