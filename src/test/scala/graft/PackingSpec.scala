package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, TextAnalysis}

/** Semantic invariants the DuckDB oracle cannot express directly:
  * packing bounds on adversarial inputs, chunk-dedup idempotence, and
  * normalization on genuinely dirty (unicode/control) text. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val documents = Tables.load(spark, sf, "documents")

  test("packSequences: fill never exceeds budget except for oversize singletons") {
    val packed = Packing.packSequences(documents, budget = 64, shards = 8).cache()
    val n = packed.count()
    assert(n == documents.count())
    // overflow rows must be alone in their bin (a doc bigger than the
    // budget gets its own bin; nothing may be packed after it)
    val over = packed.where(col("fill") > 64)
      .join(packed.groupBy(col("shard"), col("bin")).agg(count(lit(1)).as("sz")),
        Seq("shard", "bin"))
    assert(over.where(col("sz") > 1).count() == 0)
    // bins are dense per shard: 0..max with no gaps
    val gaps = packed.groupBy(col("shard"))
      .agg(countDistinct(col("bin")).as("nb"), max(col("bin")).as("mx"))
      .where(col("nb") =!= col("mx") + 1)
    assert(gaps.count() == 0)
    packed.unpersist()
  }

  test("packSequences: single oversize doc packs alone, neighbors unaffected") {
    val docs = Seq(
      (0L, Seq.fill(10)("a").mkString(" ")),   // 10 tok
      (8L, Seq.fill(100)("b").mkString(" ")),  // oversize vs budget 32
      (16L, Seq.fill(10)("c").mkString(" ")),
      (24L, Seq.fill(10)("d").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, budget = 32, shards = 1)
      .select("doc_id", "bin", "fill").as[(Long, Long, Long)].collect().sortBy(_._1)
    // next-fit by doc_id: 10 fits bin0; 100 overflows -> bin1 alone;
    // 10 can't join the oversize bin -> bin2; next 10 fits bin2
    assert(out.map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 10L), (1L, 100L), (2L, 10L), (2L, 20L)))
  }

  test("packSequencesBpe: bins budgeted by real BPE counts, wordless and oversize docs handled") {
    import graft.functions.Bpe
    // fixtures the corpus can't provide: a wordless doc (tok must be
    // 0, not a dropped row), an oversize-vs-budget doc, and texts
    // whose BPE count differs sharply from the whitespace count
    val docs = Seq(
      (0L, "the theatre, rendered 42 times!"),  // merges bite hard
      (1L, "123 456 --- !!!"),                  // no [a-z]+ word: tok 0
      (2L, Seq.fill(30)("zq").mkString(" ")),   // 60 unmergeable tokens
      (3L, "and another thing")
    ).toDF("doc_id", "text")
    val budget = 24L
    val got = Packing.packSequencesBpe(docs, budget = budget, shards = 1)
      .select("doc_id", "tok", "bin", "fill").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    // composition: tok per doc is EXACTLY Σ len(Bpe.encode(word))
    val expTok = Seq(
      "the theatre rendered times", "", Seq.fill(30)("zq").mkString(" "),
      "and another thing").map(_.split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encode(w.toLowerCase).length.toLong).sum)
    assert(got.map(_._2).toSeq == expTok, s"got ${got.toSeq} want $expTok")
    // and the next-fit replay over those counts: doc0 fits bin0,
    // doc1 (tok 0) joins it for free, doc2 (60 > 24) overflows to its
    // own bin, doc3 opens bin2
    var bin = 0L; var fill = got(0)._2; var exp = List((0L, fill))
    got.drop(1).foreach { case (_, tok, _, _) =>
      if (fill + tok <= budget) fill += tok else { bin += 1; fill = tok }
      exp = (bin, fill) :: exp
    }
    assert(got.map(r => (r._3, r._4)).toSeq == exp.reverse)
    assert(got(1)._2 == 0L, "wordless doc must pack at tok 0")
    assert(got(2)._4 > budget && got(2)._3 != got(3)._3,
      "oversize doc sits alone over budget; the next doc opens a new bin")
    // corpus-level composition: tok == bpeEncode's n_bpe_tokens for
    // every doc that has words (the twin meters EXACTLY what L33 pays)
    val meter = Packing.packSequencesBpe(documents).select("doc_id", "tok")
    val paid = TextAnalysis.bpeEncode(documents).select(col("doc_id"), col("n_bpe_tokens"))
    assert(meter.join(paid, "doc_id")
      .where(col("tok") =!= col("n_bpe_tokens")).count() == 0)
  }

  test("chunkDedup: first occurrence wins, shared and whole-doc dups drop") {
    def words(p: String) = (1 to 10).map(p + _).mkString(" ")
    val (a, b, c) = (words("a"), words("b"), words("c"))
    val docs = Seq(
      (1L, s"$a $b"), // both chunks first occurrences
      (2L, s"$a $c"), // chunk A already seen -> only C survives
      (3L, c)         // whole doc already seen -> keeps nothing
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs)
      .select("doc_id", "n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 2L, s"$a $b")))
    assert(out(1) == ((2L, 2L, 1L, c)))
    assert(out(2) == ((3L, 1L, 0L, "")))
    // corpus: a byte-identical copy doc keeps zero chunks (identical
    // chunks at identical boundaries, all first-owned by the earlier doc)
    val firstIds = documents.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("first_id"))
    val copies = documents.select(md5(col("text")).as("h"), col("doc_id"))
      .join(firstIds, "h").where(col("doc_id") =!= col("first_id"))
    val lost = copies.join(Dedup.chunkDedup(documents), "doc_id")
      .where(col("n_kept") > 0)
    assert(lost.count() == 0, "an exact-copy doc kept a chunk its original already owned")
  }

  test("lengthBatches: hierarchical rank equals the flat window; batches full and dense (L85)") {
    import org.apache.spark.sql.expressions.Window
    val got = Packing.lengthBatches(documents).cache()
    // the hierarchical two-level rank must equal the flat per-bucket
    // window the oracle uses — same batches, same aggregates
    val d = documents
      .select(col("doc_id"), size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .withColumn("bucket",
        when(col("n") <= 16, 16).when(col("n") <= 32, 32)
          .when(col("n") <= 64, 64).when(col("n") <= 128, 128)
          .when(col("n") <= 256, 256).when(col("n") <= 512, 512)
          .otherwise(1024))
      .withColumn("rk", row_number().over(Window.partitionBy("bucket").orderBy("doc_id")))
      .withColumn("batch", expr("(rk - 1) div 8"))
    val want = d.groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_toks"),
        max(col("n")).as("max_len"),
        sum(greatest(lit(0L), col("bucket") - col("n"))).as("waste"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "hierarchical rank drifts from the flat window twin")
    // every batch is full at B=8 except at most the last per bucket,
    // batch ids are dense from 0, and doc counts reconcile
    val rows = got.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSeq
    rows.groupBy(_._1).foreach { case (bucket, bs) =>
      val maxBatch = bs.map(_._2).max
      assert(bs.map(_._2).toSet == (0L to maxBatch).toSet, s"bucket $bucket has batch gaps")
      bs.foreach { case (_, batch, nd, _) =>
        if (batch < maxBatch) assert(nd == 8L, s"bucket $bucket batch $batch not full: $nd")
        else assert(nd >= 1L && nd <= 8L)
      }
    }
    // waste prices padding-to-bucket-ceiling: zero only when every doc
    // hits its ceiling; bounded by (bucket - previous threshold) * n
    val nDocs = documents.count()
    assert(rows.map(_._3).sum == nDocs, "docs lost or duplicated across batches")
    // layout must not matter: the rank derives from doc_id alone
    val relaid = Packing.lengthBatches(documents.repartition(11))
    assert(relaid.exceptAll(got).isEmpty && got.exceptAll(relaid).isEmpty)
    got.unpersist()
  }

  test("packSequences equals a naive sequential next-fit on a random corpus") {
    val rnd = new scala.util.Random(17)
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(90))("w").mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 48L
    val shards = 8
    val got = Packing.packSequences(docs, budget, shards)
      .select("doc_id", "bin", "fill").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // naive reference: per shard, fold docs in id order
    (0 until shards).foreach { s =>
      var bin = 0L; var fill = 0L; var first = true
      (0 until 300).filter(_ % shards == s).foreach { id =>
        val tok = docs.where(col("doc_id") === id).head().getString(1)
          .split(" ").length.toLong
        if (first) { fill = tok; first = false }
        else if (fill + tok <= budget) fill += tok
        else { bin += 1; fill = tok }
        assert(got(id.toLong) == ((bin, fill)), s"doc $id in shard $s")
      }
    }
  }

  test("cdcChunk realigns after an edit and tiles each doc exactly (L99)") {
    // deterministic 400-token pseudo-text; docB = docA with ONE token
    // prepended — the edit that shifts every fixed-stride window
    val words = (0 until 400).map(i => s"w${i * 7919 % 997}")
    val docA = (0L, words.mkString(" "))
    val docB = (1L, ("zzz" +: words).mkString(" "))
    val two = Seq(docA, docB).toDF("doc_id", "text")
    val chunks = Packing.cdcChunk(two).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val a = chunks.filter(_._1 == 0L).sortBy(_._2)
    val b = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(a.length >= 5, s"expected several chunks, got ${a.length}")
    // content-defined property: all but the leading chunk(s) of the
    // edited doc are md5-identical to the original's
    val shared = a.map(_._5).toSet.intersect(b.map(_._5).toSet)
    assert(shared.size >= a.length - 2,
      s"edit broke realignment: ${shared.size} of ${a.length} chunks survive")
    // fixed-stride contrast: the same edit leaves chunkDocs nothing
    val fixed = Packing.chunkDocs(two).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val fA = fixed.filter(_._1 == 0L).map(_._2).toSet
    val fB = fixed.filter(_._1 == 1L).map(_._2).toSet
    assert(fA.intersect(fB).size <= 1,
      "fixed-stride chunking unexpectedly survived the edit — contrast broken")
    // chunks tile the doc: starts chain, token counts reconcile
    for (cs <- Seq(a, b)) {
      assert(cs.head._3 == 0L)
      cs.sliding(2).foreach { case Array(p, n) =>
        assert(n._3 == p._3 + p._4, s"gap between chunks ${p._2} and ${n._2}")
      case _ => ()
      }
      assert(cs.map(_._4).sum == (if (cs == a) 400L else 401L))
    }
    // corpus: tiling + layout invariance
    val r = Packing.cdcChunk(documents).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
    val nToks = documents.select(col("doc_id"),
      size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    r.groupBy(_._1).foreach { case (d, cs) =>
      assert(cs.map(_._4).sum == nToks(d), s"doc $d chunks do not tile")
    }
    val again = Packing.cdcChunk(documents.repartition(7)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
    assert(again.toSet == r.toSet, "cdc chunks depend on partitioning")
  }

  test("cdcDedup: an edited doc version contributes only its changed chunks to the store (L101)") {
    // docB = docA with ONE token prepended — under fixed-stride
    // chunking every window shifts and B re-stores everything; under
    // CDC only B's leading (realigned) chunks are novel
    val words = (0 until 400).map(i => s"w${i * 7919 % 997}")
    val docA = (0L, words.mkString(" "))
    val docB = (1L, ("zzz" +: words).mkString(" "))
    val two = Seq(docA, docB).toDF("doc_id", "text")
    val stats = Packing.cdcDedup(two).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (aChunks, aStored, aTot, aStoredToks) = stats(0L)
    val (bChunks, bStored, bTot, bStoredToks) = stats(1L)
    // doc A arrives first: it stores every one of its chunks
    assert(aStored == aChunks && aStoredToks == aTot, s"doc A not fully stored: ${stats(0L)}")
    // doc B: only the chunks touched by the edit are novel
    assert(bChunks >= 5, s"fixture too coarse: $bChunks chunks")
    assert(bStored <= 2, s"edited doc stored $bStored of $bChunks chunks — edit not contained")
    assert(bStoredToks < bTot / 2,
      s"edited doc stored $bStoredToks of $bTot tokens — chunk store not deduplicating")
    // store accounting: stored chunks across docs = distinct chunk hashes
    val chunks = Packing.cdcChunk(two).collect().map(_.getString(4))
    assert(aStored + bStored == chunks.distinct.length,
      "per-doc stored counts do not reconcile with the distinct-chunk store")
    // corpus smoke: totals reconcile and every doc appears exactly once
    val corpus = Packing.cdcDedup(documents).collect()
    assert(corpus.map(_.getLong(0)).distinct.length == corpus.length)
    val storedToks = corpus.map(_.getLong(4)).sum
    val totToks = corpus.map(_.getLong(3)).sum
    assert(storedToks <= totToks)
  }

  test("normalizeText cleans unicode controls, case, and whitespace runs") {
    val dirty = Seq(
      (1L, "Hello\t\tWORLD  \r\n  foo"),
      (2L, "  already clean  "),
      (3L, "MiXeD\u000BCaSe")
    ).toDF("id", "s")
    val out = dirty.select(col("id"), TextAnalysis.normalizeText(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "hello world foo")
    assert(out(2L) == "already clean")
    assert(out(3L) == "mixed case")
  }
}
