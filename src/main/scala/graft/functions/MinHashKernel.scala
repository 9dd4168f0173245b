package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row MinHash signature kernel (top-level object → static
  * forwarders for generated code).
  *
  * Semantics are EXACTLY the posting pipeline's (`shingleHash` +
  * `docSignatures`): distinct space-joined word n-grams (the
  * WordNgrams construction), per shingle h = the md5's first 15 hex
  * digits as a 60-bit integer (big-endian first 8 bytes >>> 4) mod
  * p = 2³¹−1, permutation k = (k·1000003+1)·h + (k·999983+12345) mod
  * p, signature = elementwise MIN — integer arithmetic, so the fold
  * order is free. A document with fewer than n tokens has NO
  * signature (the posting form produced no rows for it): the kernel
  * returns null and callers filter.
  */
object MinHashKernel {

  val Perms = 12
  val Prime = 2147483647L

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Sep = UTF8String.fromString(" ")

  /** Positional 60-bit window hashes: every n-token space-joined
    * window's md5 first-15-hex-digit value, IN WINDOW ORDER (no
    * distinct, no mod — the winnowing chain's raw hash stream,
    * bit-identical to `conv(substring(md5(g),1,15),16,10)` over
    * `word_ngrams`, which previously ran as an interpreted
    * `transform` lambda).
    */
  def windowHashes(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val m = if (n < 1) 0 else total - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Long](0))
    val md = mdLocal.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        if (t == null)
          throw new IllegalArgumentException("shingle_hashes: null token in input array")
        parts(j) = t
        j += 1
      }
      val d = md.digest(UTF8String.concatWs(Sep, parts: _*).getBytes)
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = be >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  def sigs(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val m = if (n < 1) 0 else total - n + 1
    if (m <= 0) return null
    val md = mdLocal.get()
    val seen = new java.util.HashSet[UTF8String]()
    val mins = Array.fill(Perms)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        if (t == null)
          throw new IllegalArgumentException("minhash_sigs: null token in input array")
        parts(j) = t
        j += 1
      }
      val sh = UTF8String.concatWs(Sep, parts: _*)
      if (seen.add(sh)) {
        val d = md.digest(sh.getBytes)
        var be = 0L
        var b = 0
        while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
        val h = (be >>> 4) % Prime
        var k = 0
        while (k < Perms) {
          val v = ((k.toLong * 1000003L + 1L) * h + (k.toLong * 999983L + 12345L)) % Prime
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
