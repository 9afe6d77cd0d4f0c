package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass second-moment grid for 64-dim embedding vectors, exact in
  * 1e-6-unit longs (L87).
  *
  * Semantically identical to exploding (i, j) pairs and decimal-summing
  * `round(xᵢ·xⱼ, 6)::DECIMAL(18,6)` — each element is rounded with the
  * same BigDecimal HALF_UP rule Spark's `round` applies, then
  * accumulated as its exact unscaled long (micro units), so the buffer
  * holds the identical decimal sums the SQL oracle computes. The win is
  * physical, not semantic: the explode-based plan generates |corpus|·4096
  * rows through Generate + hash partial-aggregation (measured 13.7 s at
  * sf0.1); this buffer does the same arithmetic in a tight loop and
  * ships ONE ~17 KB array per task.
  *
  * Buffer layout: [0] = n, [1..64] = Σ round(xᵢ,6) micros, then the
  * upper triangle (i ≤ j) of Σ round(xᵢxⱼ,6) micros, row-major.
  * Overflow posture: micros ≤ ~4·10⁶ per element, so the long sums hold
  * to ~10¹² rows; past that the buffer widens to BigInteger/DECIMAL(38)
  * with no other change.
  */
class MomentGridAggregator(dim: Int = 64)
    extends Aggregator[Array[Double], Array[Long], Array[Long]] {

  private val tri = dim * (dim + 1) / 2

  private def micro6(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  override def zero: Array[Long] = new Array[Long](1 + dim + tri)

  override def reduce(b: Array[Long], v: Array[Double]): Array[Long] = {
    b(0) += 1L
    var i = 0
    while (i < dim) { b(1 + i) += micro6(v(i)); i += 1 }
    var k = 1 + dim
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) { b(k) += micro6(v(i) * v(j)); k += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
}

/** One-pass RAW second-moment (Gram) grid for the C-family PCA (q_pca):
  * n, Σ v6ᵢ, and the upper triangle of Σ v6ᵢ·v6ⱼ where
  * v6 = (round(x, 6)::DECIMAL(18,6) · 10⁶)::BIGINT — the exact integer
  * chain the distributed build used (round-to-double first, THEN the
  * decimal cast, matching `round(col, 6).cast(decimal(18,6)) * 1e6`).
  *
  * DIM-ADAPTIVE, like the generator chain it replaces (the oracle's
  * `generate_series(1, len(embedding))` is per row): the buffer grows
  * to the longest vector seen, and a shorter row contributes only to
  * its own dims — identical to exploding each row's actual elements.
  *
  * Unlike [[MomentGridAggregator]] (which sums round(xᵢxⱼ, 6) micros),
  * this sums PRODUCTS OF MICROS — so each triangle cell is a 126-bit
  * accumulator: value = hi·2⁶² + lo with lo ∈ (−2⁶², 2⁶²), exact to
  * ~2·10³⁷ ⊇ the DECIMAL(38,0) range the distributed sum carried.
  * Per-element products stay exact while |v6| < 2³¹ (|x| ≲ 2000; the
  * embeddings corpus is unit-norm floats). Σ v6 is a plain long:
  * exact to ~9·10¹² rows at unit scale.
  *
  * Buffer layout: [0] = n, [1] = dim, [2 .. 2+dim) = Σ v6, then
  * (hi, lo) pairs for the upper triangle (i ≤ j), row-major.
  */
class GramAggregator
    extends Aggregator[Array[Double], Array[Long], Array[Long]] {

  private val Unit126 = 1L << 62

  private def micro6(x: Double): Long = {
    // round(x, 6) on DOUBLE (BigDecimal HALF_UP, back to double), then
    // the exact decimal(18,6) unscaled value of that rounded double —
    // two steps, matching the distributed expression chain bit-for-bit
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    java.math.BigDecimal.valueOf(r)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  private def sizeFor(dim: Int): Int = 2 + dim + dim * (dim + 1)

  /** Position of cell (i, j), i ≤ j, in a dim-`d` buffer. */
  private def cell(d: Int, i: Int, j: Int): Int =
    2 + d + 2 * (i * d - i * (i - 1) / 2 + (j - i))

  private def resize(b: Array[Long], dim: Int): Array[Long] = {
    val old = b(1).toInt
    val out = new Array[Long](sizeFor(dim))
    out(0) = b(0)
    out(1) = dim.toLong
    var i = 0
    while (i < old) { out(2 + i) = b(2 + i); i += 1 }
    i = 0
    while (i < old) {
      var j = i
      while (j < old) {
        val src = cell(old, i, j)
        val dst = cell(dim, i, j)
        out(dst) = b(src)
        out(dst + 1) = b(src + 1)
        j += 1
      }
      i += 1
    }
    out
  }

  override def zero: Array[Long] = Array(0L, 0L)

  override def reduce(b0: Array[Long], v: Array[Double]): Array[Long] = {
    val d = v.length
    val b = if (d > b0(1)) resize(b0, d) else b0
    val dim = b(1).toInt
    b(0) += 1L
    val m = new Array[Long](d)
    var i = 0
    while (i < d) { m(i) = micro6(v(i)); b(2 + i) += m(i); i += 1 }
    i = 0
    while (i < d) {
      val mi = m(i)
      var k = cell(dim, i, i)
      var j = i
      while (j < d) {
        var lo = b(k + 1) + mi * m(j)
        if (lo >= Unit126) { lo -= Unit126; b(k) += 1 }
        else if (lo <= -Unit126) { lo += Unit126; b(k) -= 1 }
        b(k + 1) = lo
        k += 2; j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a0: Array[Long], b0: Array[Long]): Array[Long] = {
    val (a, b) =
      if (a0(1) >= b0(1)) (a0, b0) else (resize(a0, b0(1).toInt), b0)
    val bd = b(1).toInt
    a(0) += b(0)
    var i = 0
    while (i < bd) { a(2 + i) += b(2 + i); i += 1 }
    val ad = a(1).toInt
    i = 0
    while (i < bd) {
      var ka = cell(ad, i, i)
      var kb = cell(bd, i, i)
      var j = i
      while (j < bd) {
        a(ka) += b(kb)
        var lo = a(ka + 1) + b(kb + 1)
        if (lo >= Unit126) { lo -= Unit126; a(ka) += 1 }
        else if (lo <= -Unit126) { lo += Unit126; a(ka) -= 1 }
        a(ka + 1) = lo
        ka += 2; kb += 2; j += 1
      }
      i += 1
    }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
}
