package graft.functions

/** Exact 1/64-bit fixed-point log₂ as a per-row kernel (a TOP-LEVEL
  * object so Scala emits static forwarders — generated Java calls
  * `graft.functions.C64Kernel.c64(v)` directly).
  *
  * C64(v) = 64·⌊log₂ v⌋ + 6 fractional bits by shift-and-square:
  * normalize v to [2³⁰, 2³¹), then 6 rounds of square-and-shift, each
  * emitting one bit — pure BIGINT arithmetic, so the Spark side here
  * and the DuckDB oracles' unrolled CTE chain agree BIT-FOR-BIT with
  * no transcendental anywhere in the gate (libm log2 differs in the
  * last ulp across engines, which a round() can amplify into a hash
  * mismatch).
  *
  * This is the same fold the unigram tokenizer runs on the DRIVER
  * over its vocab-bounded piece table (graft.operators.TextOps.c64
  * delegates here); the expression form exists for model tables that
  * are data-bounded but NOT driver-bounded — e.g. the Kneser-Ney
  * bigram model, whose (head, nxt) rows are Heaps-law-bounded but at
  * 100 TB far too many to collect. log₂ of a rational p = num/den is
  * c64(den) − c64(num), still exact.
  */
object C64Kernel {

  def c64(v: Long): Long = {
    if (v < 1)
      throw new IllegalArgumentException(s"c64 domain: $v (requires v >= 1)")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var y = if (b <= 30) v << (30 - b) else v >> (b - 30)
    var f = 0L
    var i = 0
    while (i < 6) {
      val z = y * y
      if (z >= (1L << 61)) { f = f * 2 + 1; y = z >> 31 }
      else { f = f * 2; y = z >> 30 }
      i += 1
    }
    64L * b + f
  }
}
