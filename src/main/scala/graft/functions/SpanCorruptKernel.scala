package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData

/** The T5 span-corruption transform as a per-row kernel, shared by
  * interpreted eval and generated code (a TOP-LEVEL object so Scala
  * emits static forwarders — generated Java calls
  * `graft.functions.SpanCorruptKernel.stats(id, arr)` directly).
  *
  * Semantics are EXACTLY the three higher-order `transform` passes the
  * span family previously planned (CodegenFallback lambdas — they
  * broke whole-stage codegen in both consumers' scan stages and paid
  * ~4 interpreted array walks per doc): a span starts at position j
  * iff the top 60 bits of md5("{doc_id}:{j}") ≡ 0 (mod 14), with
  * length 1 + (top 60 bits of md5("{doc_id};{j}")) % 3; overlapping
  * spans merge; the masked stream collapses each merged run to one
  * `<X>` and the target carries `<X> ` + the dropped tokens. The
  * 60-bit value is the first 8 digest bytes big-endian >>> 4 —
  * bit-identical to SQL `conv(substring(md5(s), 1, 15), 16, 10)` and
  * the DuckDB oracle's UBIGINT hex prefix, so the gate is unchanged.
  * One pass computes the draw, the merge, both fingerprints, and the
  * counts — `span_corruption` and `ul2_mix` both read it.
  */
object SpanCorruptKernel {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def h60(md: MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8")) // resets the digest
    var be = 0L
    var b = 0
    while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
    be >>> 4
  }

  /** struct<n_corrupted: bigint, n_spans: bigint, masked_fp: bigint,
    * target_fp: bigint> for one document.
    */
  def stats(docId: Long, toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val md = mdLocal.get()
    val starts = new Array[Boolean](n)
    val lens = new Array[Int](n)
    var j = 0
    while (j < n) {
      starts(j) = h60(md, s"$docId:$j") % 14 == 0
      lens(j) = (1L + h60(md, s"$docId;$j") % 3L).toInt
      j += 1
    }
    val corr = new Array[Boolean](n)
    var nCorr = 0L
    var nSpans = 0L
    var i = 0
    while (i < n) {
      corr(i) = starts(i) ||
        (i >= 1 && starts(i - 1) && lens(i - 1) >= 2) ||
        (i >= 2 && starts(i - 2) && lens(i - 2) >= 3)
      if (corr(i)) {
        nCorr += 1
        if (i == 0 || !corr(i - 1)) nSpans += 1
      }
      i += 1
    }
    val masked = new java.lang.StringBuilder()
    val target = new java.lang.StringBuilder()
    var firstM = true
    var firstT = true
    i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null)
        throw new IllegalArgumentException("span_corrupt: null token in input array")
      if (!corr(i)) {
        if (!firstM) masked.append(' ')
        masked.append(t.toString)
        firstM = false
      } else {
        val isStart = i == 0 || !corr(i - 1)
        if (isStart) {
          if (!firstM) masked.append(' ')
          masked.append("<X>")
          firstM = false
        }
        if (!firstT) target.append(' ')
        if (isStart) target.append("<X> ")
        target.append(t.toString)
        firstT = false
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](nCorr, nSpans, h60(md, masked.toString), h60(md, target.toString)))
  }
}
