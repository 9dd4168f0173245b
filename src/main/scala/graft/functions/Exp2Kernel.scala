package graft.functions

/** Exact fixed-point 2^(y/64) — the INVERSE of [[C64Kernel]]'s
  * 1/64-bit log₂, for the mixture-reweighting family: weights of the
  * form 2^(excess/64) must evaluate identically in Spark and DuckDB,
  * so the six dyadic roots 2^(1/2), 2^(1/4), …, 2^(1/64) are
  * quantized ONCE here to 2⁻³⁰ fixed point (the pHash cosine-table
  * discipline: constants are integer literals baked into both
  * engines; no transcendental evaluates at gate time) and the
  * fractional part multiplies out by shift-and-scale.
  *
  * exp2q(y) = ⌊2^(y/64)⌋-ish with 6-bit fractional precision:
  * y = 64·b + f, result = (2³⁰ · Π_{bit j of f} C_j >> 30) shifted to
  * magnitude b. Domain 0 ≤ y ≤ 64·40 (callers shift exponents so the
  * max lands at the top — 2⁴⁰ headroom keeps every product < 2⁶²).
  * Monotone non-decreasing in y by construction.
  */
object Exp2Kernel {

  /** C(j) = round(2^(1/2^(j+1)) · 2³⁰), j = 0..5 — HARDCODED integer
    * literals (pinned against an independent StrictMath.pow recompute
    * in OperatorsSpec's doremi-weights test — StrictMath is the
    * platform-independent fdlibm reference, so the pin itself cannot
    * drift across JVMs), not computed via Math.pow at init: a JVM whose
    * pow intrinsic differs by 1 ulp near a .5 rounding boundary would
    * otherwise bake a different table into the executors than the
    * oracle SQL carries, silently breaking the cross-engine
    * bit-exactness contract on a heterogeneous cluster.
    */
  val C: Array[Long] =
    Array(1518500250L, 1276901417L, 1170923762L, 1121280436L, 1097253708L, 1085434106L)

  val MaxY: Long = 64L * 40

  def exp2q(y: Long): Long = {
    if (y < 0 || y > MaxY)
      throw new IllegalArgumentException(s"exp2q domain: $y (requires 0 <= y <= $MaxY)")
    val b = (y / 64).toInt
    val f = y % 64
    var m = 1L << 30
    var j = 0
    while (j < 6) {
      if (((f >> (5 - j)) & 1L) == 1L) m = (m * C(j)) >> 30
      j += 1
    }
    if (b >= 30) m << (b - 30) else m >> (30 - b)
  }
}
