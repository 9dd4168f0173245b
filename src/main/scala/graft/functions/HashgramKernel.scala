package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-bag-of-words classifier score as a per-row kernel,
  * shared by interpreted eval and generated code (a TOP-LEVEL object
  * so Scala emits static forwarders — generated Java calls
  * `graft.functions.HashgramKernel.score(arr)` directly).
  *
  * Semantics are EXACTLY the fold the classifier family previously
  * ran as a higher-order `aggregate` lambda (CodegenFallback — it
  * broke whole-stage codegen in every consumer's scan stage):
  * w(token) = (top 60 bits of md5(token) in hex order) % 2001 − 1000,
  * summed over the token BAG (every occurrence counts). The 60-bit
  * value is the first 8 digest bytes big-endian >>> 4 — bit-identical
  * to SQL `conv(substring(md5(t), 1, 15), 16, 10)` and to the DuckDB
  * oracles' `CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT)`.
  * Each DISTINCT token is hashed once and weighted by its count
  * (integer sum — order-free), the same ~7× saving on natural text
  * as [[SimHashKernel]].
  */
object HashgramKernel {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def score(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null)
        throw new IllegalArgumentException("hashgram_score: null token in input array")
      val c = counts.get(t)
      if (c == null) counts.put(t, Array(1)) else c(0) += 1
      i += 1
    }
    val md = mdLocal.get()
    var acc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val d = md.digest(e.getKey.getBytes) // resets the digest
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
      acc += ((be >>> 4) % 2001L - 1000L) * e.getValue()(0)
    }
    acc
  }
}
