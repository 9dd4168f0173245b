package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The SimHash-64 per-row kernel, shared by interpreted eval and
  * generated code (a TOP-LEVEL object so Scala emits static
  * forwarders — generated Java calls `graft.functions.SimHashKernel
  * .bits(arr)` directly).
  *
  * Semantics are EXACTLY the fingerprint the aggregate pipeline
  * (`IntVecSumAgg` over `Md5SignBits(md5(t), c)`) produced: per
  * DISTINCT token, one md5 (over the token's UTF-8 bytes — identical
  * to SQL `md5(t)`), the first 64 bits read in hex order (bit j =
  * bit (7 − j mod 8) of digest byte j/8, matching Md5SignBits' nibble
  * walk), weighted by the token's occurrence count, integer-summed
  * (order-free), sign-thresholded at ≥ 0 → '1'. Hashing once per
  * distinct token keeps the ~7× saving the aggregate form had on
  * natural text.
  */
object SimHashKernel {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def bits(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null)
        throw new IllegalArgumentException("simhash64: null token in input array")
      val c = counts.get(t)
      if (c == null) counts.put(t, Array(1)) else c(0) += 1
      i += 1
    }
    val acc = new Array[Int](64)
    val md = mdLocal.get()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val digest = md.digest(e.getKey.getBytes) // resets the digest
      val w = e.getValue()(0)
      var j = 0
      while (j < 64) {
        if (((digest(j >>> 3) >> (7 - (j & 7))) & 1) == 1) acc(j) += w else acc(j) -= w
        j += 1
      }
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (acc(j) >= 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
