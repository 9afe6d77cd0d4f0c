package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy merge-rule byte-pair encoding (SURVEY §2.3 L33) — the real
  * BPE algorithm (Sennrich et al. 2016), not the regex token-count
  * proxy of L10: start from the word's characters, repeatedly find the
  * LOWEST-RANK adjacent pair present in the token sequence and merge
  * all its leftmost-nonoverlapping occurrences, stop when no rule
  * applies. This is exactly the inference loop of every deployed BPE
  * tokenizer; the only difference from GPT-2/SentencePiece is the
  * size of the merges table.
  *
  * Tokenizer-swap seam: [[Bpe.Merges]] is the entire model. A real
  * tokenizer loads its merges.txt into this same ranked pair list —
  * broadcast with the plan as literal closure state, the TopCells
  * pattern — and nothing else changes. The table here is a small,
  * deterministic English-frequency-ordered stand-in so the DuckDB
  * oracle can carry the identical table inline.
  */
object Bpe {

  /** Ranked merge rules (rank = index, lower merges first). */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"), ("an", "d"),
    ("in", "g"), ("o", "f"), ("t", "o"), ("i", "s"), ("i", "t"),
    ("a", "l"), ("e", "d"), ("c", "o"), ("d", "e"))

  val MergesIdx: IndexedSeq[(String, String)] = Merges.toIndexedSeq

  private val rank: Map[(String, String), Int] =
    Merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Encode one word with the default table. */
  def encode(word: String): Array[String] = encodeWith(word, MergesIdx, rank)

  /** Encode one word with an ARBITRARY ranked merges table — the
    * tokenizer-swap seam made callable: a learned table (L33t's
    * bpeTrain output, or a real tokenizer's merges.txt) drops in here
    * with nothing else changing. Merge-all-occurrences is leftmost
    * non-overlapping in a single scan — the DuckDB oracle reproduces
    * it with two replace() passes over a separator-joined token string
    * (pass 1 merges every other occurrence of a consecutive run, pass
    * 2 the rest; isolated occurrences all land in pass 1), which is
    * provably the same result because a merge can never create a new
    * occurrence of its own single-token pattern. */
  def encodeWith(word: String, merges: IndexedSeq[(String, String)],
      rankOf: Map[(String, String), Int]): Array[String] = {
    var toks: Array[String] = Array.tabulate(word.length)(i => word.substring(i, i + 1))
    var continue = toks.length > 1
    while (continue) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rankOf.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (a, b) = merges(best)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        continue = toks.length > 1
      }
    }
    toks
  }
}

/** `graft_bpe(word)` → array<string> of BPE tokens. CodegenFallback:
  * the merge loop dominates; one tight JVM loop per word. The merges
  * table is constructor closure state (the TopCells pattern), so a
  * LEARNED table rides with the plan — `BpeEncode(e)` keeps the
  * default table under the fixed `graft_bpe` name. */
case class BpeEncode(child: Expression,
    merges: IndexedSeq[(String, String)] = Bpe.MergesIdx,
    funcName: String = "graft_bpe")
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val rankOf: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = funcName

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      Bpe.encodeWith(word, merges, rankOf).map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
