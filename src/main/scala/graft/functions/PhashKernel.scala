package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-point 8×8 DCT perceptual hash (pHash) kernel — the static JVM
  * body of the `phash64` codegen expression.
  *
  * The DCT-II basis is quantized ONCE to 1/16384 fixed point
  * (C(k)(n) = round(cos(π(2n+1)k/16)·2¹⁴)); every later step is pure
  * BIGINT arithmetic, so the Spark side, this kernel, and the DuckDB
  * oracle (which receives the SAME table as SQL literals, generated
  * from this object) agree bit-for-bit — no transcendental is ever
  * evaluated by two engines. The table's AC rows sum to EXACTLY zero
  * (the real-cos rows cancel pairwise and rounding preserves the
  * negation pairs), which makes the hash's brightness invariance an
  * exact integer identity, not an approximation: a constant shift of
  * every pixel moves only the DC coefficient.
  *
  * Pipeline per media row: pixels = the 64 aHash byte-window sums,
  * grayscale-normalized by floor-dividing the window width w (keeps
  * every product within BIGINT: q ≤ 255 ⇒ |d| ≤ 64·255·2²⁸ ≈ 4e12);
  * d(u,v) = Σ q(r,c)·C(u)(r)·C(v)(c); bit = 63·d > Σ AC (the
  * cross-multiplied mean compare over the 63 AC coefficients — the
  * aHash discipline applied in frequency space).
  */
object PhashKernel {

  val Scale = 16384L
  val Grid = 8

  /** Fixed-point DCT-II basis, C(k)(n) = round(cos(π(2n+1)k/16)·2¹⁴). */
  val Cos: Array[Array[Long]] = Array.tabulate(Grid, Grid) { (k, n) =>
    math.round(math.cos(math.Pi * (2 * n + 1) * k / (2.0 * Grid)) * Scale)
  }

  /** 64-bit pHash of a 64-pixel window-sum grid with window width w;
    * null when the grid is short (caller filters w ≥ 1 anyway).
    */
  def bits(pixels: ArrayData, w: Long): UTF8String = {
    if (pixels == null || pixels.numElements() < 64 || w < 1) return null
    val q = new Array[Long](64)
    var i = 0
    while (i < 64) { q(i) = pixels.getLong(i) / w; i += 1 }
    val d = new Array[Long](64)
    var u = 0
    while (u < Grid) {
      var v = 0
      while (v < Grid) {
        var s = 0L
        var r = 0
        while (r < Grid) {
          val cur = Cos(u)(r)
          var c = 0
          while (c < Grid) { s += q(r * Grid + c) * cur * Cos(v)(c); c += 1 }
          r += 1
        }
        d(u * Grid + v) = s
        v += 1
      }
      u += 1
    }
    var sumAc = 0L
    i = 1
    while (i < 64) { sumAc += d(i); i += 1 }
    val out = new Array[Byte](64)
    i = 0
    while (i < 64) { out(i) = if (63L * d(i) > sumAc) '1' else '0'; i += 1 }
    UTF8String.fromBytes(out)
  }
}
