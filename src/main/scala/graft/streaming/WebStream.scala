package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.{Curation, Html, TextAnalysis, Urls}

/** Streaming twin of the L58 web-curation capstone (SURVEY §2.3 L58s,
  * r6) — continuous crawl ingest: every stage of the batch chain that
  * is map-only in batch stays map-only on the stream, so the hot path
  * has ZERO shuffles and the only stateful operator is page-level
  * dedup.
  *
  *   - URL canonicalize + blocklist — pure columns ([[Urls.urlCol]] /
  *     [[Urls.canonicalizeUrl]]), unchanged on a stream;
  *   - page-level exactly-once — `dropDuplicates(canon_url)`: the one
  *     stateful stage (state = one row per distinct page; with an
  *     event-time column use dropDuplicatesWithinWatermark to bound
  *     it to the crawl-revisit horizon);
  *   - HTML extraction + quality floor — pure columns (L55, L9);
  *   - NB quality filter — the MODEL IS BROADCAST STATE (r12, VERDICT
  *     r11 #6): the learned vocab-sized table rides as a
  *     `Broadcast[Map[token → decimal weight]]` consumed by a scoring
  *     UDF, so the plan stays vocab-scale-independent (the r11 build
  *     embedded the map as a plan literal — bounded, but a larger
  *     vocab cap would have bloated every micro-batch's plan). A UDF
  *     is the declared exception to functions-not-UDFs here: the
  *     per-row fold needs driver-learned state, and a stream cannot
  *     take the batch explode→broadcast-join→groupBy route in append
  *     mode without inventing a watermark. Scoring accumulates
  *     scale-6 BigDecimals exactly like the batch decimal-sum logit —
  *     bit-identical (spec-pinned), NO stream aggregation, no join.
  *     This is the 100 TB stream posture: broadcast model state,
  *     map-only scoring.
  *
  * Deliberately absent: the corpus-global near-dup CC stage — graph
  * clustering over ALL documents is a batch semantics (L19); its
  * incremental counterpart is batch-vs-corpus dedup (L40) on the
  * micro-batch boundary.
  */
object WebStream {

  /** (doc_id, canon_url, quality_score, nb_logit, pred_keep) for each
    * surviving fetch. `model` is a BATCH nbTrain output (token,
    * c_pos, c_neg, w) — collected once (vocab-bounded) and shipped as
    * a broadcast variable, NOT a plan literal.
    *
    * Bit-parity contract with the batch logit (spec-pinned): the
    * batch path sums `cast(w as decimal(18,6))` exactly and rounds
    * `sum + bias` to 6 places HALF_UP. Here each weight is
    * `BigDecimal.valueOf(w).setScale(6, HALF_UP)` — the same
    * double→decimal(18,6) conversion Spark's cast performs — summed
    * exactly at scale 6, and the final round replicates Spark's
    * `round(x, 6)`. Tokenization replicates
    * [[graft.functions.Portable.tokens]] (`split(lower(text),
    * "\\s+")` with Java limit −1); tokens absent from the vocab —
    * including empties — contribute 0, as in the batch left join. */
  def curate(docs: DataFrame, model: DataFrame): DataFrame = {
    import java.math.{BigDecimal => JBig, RoundingMode}
    val rows = model.select(col("token"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val bias = rows.collectFirst { case ("<bias>", w) => w }
      .getOrElse(sys.error("model has no <bias> row"))
    val weights: Map[String, JBig] = rows.iterator
      .filter(_._1 != "<bias>")
      .map { case (t, w) => t -> JBig.valueOf(w).setScale(6, RoundingMode.HALF_UP) }
      .toMap
    val bWeights = docs.sparkSession.sparkContext.broadcast(weights)
    val ws = java.util.regex.Pattern.compile("\\s+")
    val score = udf { (text: String) =>
      val m = bWeights.value
      var acc = JBig.ZERO.setScale(6)
      val toks = ws.split(text.toLowerCase(java.util.Locale.ROOT), -1)
      var i = 0
      while (i < toks.length) {
        val w = m.getOrElse(toks(i), null)
        if (w != null) acc = acc.add(w)
        i += 1
      }
      JBig.valueOf(acc.doubleValue() + bias)
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    }
    val logit = score(col("text"))
    val pageId = col("doc_id") - when(col("doc_id") % 10 === 7, 1).otherwise(0)
    val staged = docs
      .withColumn("canon_url", Urls.canonicalizeUrl(
        Urls.urlCol(pageId, pageId % 31 === 13)))
      .where(!Urls.isBlockedDomain(col("canon_url")))
      .dropDuplicates("canon_url")
      .withColumn("html", Html.pageCol)
    Html.extractText(staged, keep = Seq("canon_url"))
      .select(col("doc_id"), col("canon_url"), col("extracted").as("text"))
      .withColumn("quality_score", TextAnalysis.qualityScoreCol)
      .where(col("quality_score") >= Curation.QualityFloor)
      .withColumn("nb_logit", logit)
      .withColumn("pred_keep", (col("nb_logit") > 0).cast("long"))
      .where(col("pred_keep") === 1)
      .drop("text")
  }

  /** Per-bucket Misra–Gries snapshot: `n_bucket` tokens seen so far by
    * this bucket, candidates as a sorted `token:est` list. `n_bucket`
    * is monotone, so the final snapshot is the max-n row per bucket. */
  case class HhSummary(bucket: Int, n_bucket: Long, candidates: String)

  /** L63s: streaming heavy hitters — the continuous twin of L43's
    * batch Misra–Gries pass (same [[graft.functions.MisraGriesAggregator]]
    * reduce logic, driven as `flatMapGroupsWithState` closure state).
    *
    * The token space shards by hash into `buckets` groups, so state is
    * `buckets × cap` counters TOTAL regardless of stream length, and
    * each token's whole count lives in exactly one bucket — the MG
    * deficit bound tightens from N/(cap+1) to n_bucket/(cap+1). Every
    * micro-batch emits the bucket's current snapshot (Update mode, no
    * timeout: the summary never expires; it IS the bounded state).
    * At scale: `buckets` is the parallelism knob; the hot path is one
    * narrow shuffle of raw tokens to their bucket owner — no
    * per-token state, no vocabulary materialization.
    */
  def heavyHittersStream(texts: Dataset[String], buckets: Int = 8,
      cap: Int = 255): Dataset[HhSummary] = {
    import texts.sparkSession.implicits._
    val agg = new graft.functions.MisraGriesAggregator(cap)
    texts
      .flatMap(_.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
      .groupByKey(t => math.floorMod(t.hashCode, buckets))
      .flatMapGroupsWithState[MgBucket, HhSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket, toks, state) =>
          val st = state.getOption.getOrElse(MgBucket(Map.empty, 0L))
          val buf = graft.functions.MGState(
            scala.collection.mutable.HashMap.from(st.counters), st.n)
          toks.foreach(agg.reduce(buf, _))
          state.update(MgBucket(buf.counters.toMap, buf.n))
          Iterator.single(HhSummary(bucket, buf.n,
            buf.counters.toSeq.sortBy(_._1)
              .map { case (t, c) => s"$t:$c" }.mkString(",")))
      }
  }

  case class MgBucket(counters: Map[String, Long], n: Long)

  /** L91s (r7): streaming dataset datasheet — the live-ingestion twin
    * of the batch release report. One update-mode aggregate keyed on
    * (lang, source) — the finest datasheet granularity — carrying the
    * MERGEABLE state the batch datasheet derives its rows from:
    * counts, token/char sums, the decimal quality sum, and the
    * pass count. State is one row per (lang × source) — alphabet-
    * bounded at any stream length — and every global row (totals,
    * shares, means) derives from the snapshot at read time, the C50
    * rule: store mergeable state, derive ratios. Deliberately absent:
    * the exact distinct-text count — the datasheet's one unbounded
    * stat; L86's bloom bounds it approximately on a stream, the
    * batch L91 owns exactness. The decimal quality sum makes the
    * streamed mean BIT-IDENTICAL to batch (spec-pinned equality).
    */
  def datasheetStream(docs: DataFrame): DataFrame = {
    val base = docs.select(
      size(graft.functions.Portable.tokens(col("text"))).cast("long").as("nt"),
      length(col("text")).cast("long").as("nc"),
      TextAnalysis.qualityScoreCol.as("q"), col("lang"), col("source"))
    base.groupBy(col("lang"), col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
      sum(col("nc")).as("n_chars"),
      sum(col("q").cast("decimal(18,6)")).as("q_sum"),
      sum((col("q") >= Curation.QualityFloor).cast("long")).as("n_pass"))
  }

  /** One surviving (first-occurrence) key and the shard that owns it. */
  case class DedupOut(key: String, shard: Int)

  case class BloomShard(bits: Array[Long])

  /** L86 (r7): streaming dedup with BOUNDED state — the 100 TB stream
    * posture for exact `dropDuplicates` (R13), whose state grows one
    * row per distinct key FOREVER on an unbounded crawl. Each shard
    * owns a fixed Bloom filter (`mBits` bits, `k` md5-seeded hashes)
    * driven as `flatMapGroupsWithState` closure state, so total state
    * is `shards × mBits / 8` bytes regardless of stream length.
    *
    * The guarantee points the safe direction for dedup: Bloom has no
    * false negatives, so a true duplicate is NEVER emitted twice —
    * the exactly-once-per-key invariant holds unconditionally. The
    * price is the false-positive rate: once the filter saturates,
    * some genuine first occurrences are dropped as "seen" — the
    * standard crawl trade (URL-seen sets in production crawlers are
    * exactly this structure). Size mBits ≈ 10× expected distincts
    * for <1% FP; shards is the parallelism knob and the hot path is
    * one narrow key shuffle.
    */
  def bloomDedupStream(keys: Dataset[String], shards: Int = 8,
      mBits: Int = 1 << 14, k: Int = 3): Dataset[DedupOut] = {
    import keys.sparkSession.implicits._
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    def hashes(key: String): Seq[Int] = (1 to k).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"bd$i:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % mBits).toInt
    }
    keys.groupByKey(kk => math.floorMod(kk.hashCode, shards))
      .flatMapGroupsWithState[BloomShard, DedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard, it, state) =>
          val bits = state.getOption.map(_.bits.clone())
            .getOrElse(new Array[Long](mBits / 64))
          val out = scala.collection.mutable.ArrayBuffer.empty[DedupOut]
          it.foreach { key =>
            val hs = hashes(key)
            val seen = hs.forall(h => (bits(h >> 6) & (1L << (h & 63))) != 0L)
            if (!seen) {
              hs.foreach(h => bits(h >> 6) |= 1L << (h & 63))
              out += DedupOut(key, shard)
            }
          }
          state.update(BloomShard(bits))
          out.iterator
      }
  }
}
