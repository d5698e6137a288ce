package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage — at corpus
  * scale the embedding table dwarfs the text (a 768-dim float32 vector is
  * 3 KB/doc), and 4× compression with ~0.3 % cosine error is the standard
  * trade. Everything here is exact integer/IEEE arithmetic over built-in
  * expressions (one higher-order layer per vector — fine at this width):
  * no RNG, no library codecs, bit-reproducible in any engine.
  *
  * Rule: scale = max|xᵢ| / 127; qᵢ = floor(xᵢ/scale + 0.5) ∈ [−127, 127]
  * (round-half-toward-+∞ — a closed form both Spark and the DuckDB oracle
  * evaluate identically, unlike bankers'-rounding `round`). The zero vector
  * quantizes to all zeros with scale 0.
  */
object Quantize {

  /** max|xᵢ| of the (float/double) vector, in double precision. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8 codes as array<int> (int keeps the cross-engine comparison free
    * of TINYINT width quirks; values are in [−127, 127]).
    *
    * The divisor must NOT sit inside the per-element lambda: HOF lambdas
    * run interpreted and re-evaluate their whole body per element, so an
    * embedded maxAbs subtree costs O(d²) per row (the nested-HOF trap).
    * `array_repeat(m, size)` evaluates m ONCE and hands each lambda call a
    * plain element — total work stays O(d). */
  def quantize(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m.isNull, lit(null))
      .when(m === 0.0, transform(vec, _ => lit(0)))
      .otherwise(zip_with(vec, array_repeat(m, size(vec)),
        (x, mm) => floor(x.cast("double") / mm * 127.0 + 0.5).cast("int")))
  }

  /** Reconstruction: x̂ᵢ = qᵢ · scale, scale = maxAbs/127. The error bound
    * |xᵢ − x̂ᵢ| ≤ scale/2 is pinned in SimilaritySpec. Same hoisting rule
    * as [[quantize]]: `scale` may be an arbitrary expression and must be
    * evaluated once per row, not once per element. */
  def dequantize(codes: Column, scale: Column): Column =
    zip_with(codes, array_repeat(scale, size(codes)),
      (q, s) => q.cast("double") * s)

  /** Per-vector quantization scale (maxAbs / 127). */
  def scale(vec: Column): Column = maxAbs(vec) / 127.0
}
