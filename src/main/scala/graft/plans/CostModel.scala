package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable.md5Long
import graft.operators.Scale

/** C171 (r12): sketch-driven join planning — C54's CMS
  * join-cardinality machinery actually DRIVING a physical-strategy
  * decision, the way C164's spec proves ANALYZE statistics feed the
  * CBO. The question a 100 TB join must answer before it runs: which
  * side (if any) broadcasts, is a key hot enough to need salting, or
  * is a plain shuffle join fine?
  *
  * One bounded stats job per side builds the L41/C54 count-min grid
  * (d rows × w counters) over the join key. Everything the decision
  * needs falls out of that single 4×1024-cell collect (declared,
  * constant-sized driver state — never the data):
  *
  *  - side row count: Σ_idx cell[j][idx] for any j (every key's count
  *    lands once per row);
  *  - output-size estimate: min_j Σ_idx cellA[j][idx]·cellB[j][idx] —
  *    the CMS inner product, one-sided (est ≥ exact, spec-pinned by
  *    C54's oracle);
  *  - hottest-key bound: min_j max_idx cell[j][idx] — for every key k,
  *    count(k) ≤ cell[j][h_j(k)] ≤ max_idx cell[j][·] in each row, so
  *    the min over rows upper-bounds the heaviest key. One-sided the
  *    SAFE direction for skew: a false alarm costs a salted shuffle,
  *    a miss costs a straggler.
  *
  * Decision order (the standard planner ladder):
  *  1. a side at or under `broadcastRowCap` rows → broadcast it
  *     (hash join, zero shuffle of the big side);
  *  2. else if the probe side's hottest key may own ≥ `skewShare` of
  *     its rows → [[graft.operators.Scale.saltedJoin]] (C16), spreading
  *     the hot key over `saltBuckets` reducers;
  *  3. else plain equi-join — Catalyst picks sort-merge/shuffled-hash.
  *
  * All three paths return the identical result set as
  * `left.join(right.withColumnRenamed(rightKey, leftKey), leftKey)`
  * (inner, key column once). Spec-only surface (plan shape + equality
  * + one-sidedness), like C16/C17/C164 — there is no SQL oracle for a
  * strategy choice.
  */
object CostModel {
  private val D = 4
  private val W = 1024L

  /** (rows, estimate grid) of one side's join key — the C54 cell
    * build, collected (d·w bounded). */
  private[graft] case class CmsGrid(cells: Map[(Int, Long), Long]) {
    val rows: Long =
      cells.collect { case ((0, _), c) => c }.sum
    val hottestKeyBound: Long =
      (0 until D).map { j =>
        cells.collect { case ((`j`, _), c) => c }.foldLeft(0L)(math.max)
      }.min
    def dotEstimate(other: CmsGrid): Long =
      (0 until D).map { j =>
        cells.collect { case ((`j`, idx), c) =>
          c * other.cells.getOrElse((j, idx), 0L)
        }.sum
      }.min
  }

  private[graft] def cmsGrid(df: DataFrame, key: String): CmsGrid = {
    val cells = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        explode(array((0 until D).map(j => struct(lit(j).as("j"),
          pmod(md5Long(lit(s"js$j"), col("k").cast("string")), lit(W)).as("idx"))): _*)).as("h"))
      .groupBy(col("h.j").as("j"), col("h.idx").as("idx"))
      .agg(sum(col("cnt")).as("cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    CmsGrid(cells)
  }

  /** The decision record the spec (and an operator log) reads. */
  case class JoinChoice(strategy: String, leftRows: Long, rightRows: Long,
      estOutRows: Long, estHotLeft: Long, estHotRight: Long)

  /** Join `left` and `right` on `leftKey = rightKey` with the physical
    * strategy chosen from the sketch statistics (see object doc).
    * Returns the joined frame plus the decision it took. */
  def planJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      broadcastRowCap: Long = 500000L,
      skewShare: Double = 0.2,
      saltBuckets: Int = 16): (DataFrame, JoinChoice) = {
    val gl = cmsGrid(left, leftKey)
    val gr = cmsGrid(right, rightKey)
    val r = right.withColumnRenamed(rightKey, leftKey)
    val choice = JoinChoice("", gl.rows, gr.rows, gl.dotEstimate(gr),
      gl.hottestKeyBound, gr.hottestKeyBound)
    if (math.min(gl.rows, gr.rows) <= broadcastRowCap) {
      val out =
        if (gr.rows <= gl.rows) left.join(broadcast(r), leftKey)
        else broadcast(left).join(r, leftKey)
      (out, choice.copy(strategy = "broadcast"))
    } else if (gl.hottestKeyBound >= (skewShare * gl.rows).toLong) {
      (Scale.saltedJoin(left, r, leftKey, saltBuckets),
        choice.copy(strategy = "salted"))
    } else {
      (left.join(r, leftKey), choice.copy(strategy = "shuffle"))
    }
  }
}
