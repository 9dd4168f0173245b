package graft.functions

/** Incremental MD5 (RFC 1321) over an explicitly SERIALIZABLE state —
  * the digest a streaming fold can carry in a state store.
  * `java.security.MessageDigest` is stateful but neither serializable
  * nor encodable, which forces stateful streams to accumulate raw
  * content (O(chunk length) state with quadratic append cost) just to
  * hash it at flush time. `Md5State` is four registers + a <64-byte
  * block tail + a length — constant-size regardless of how many bytes
  * have been absorbed — and is a plain product type, so Spark's state
  * encoder carries it natively.
  *
  * The round constants are floor(|sin(i+1)|·2³²) computed with
  * StrictMath (fdlibm — platform-exact); parity with the JDK digest is
  * asserted over randomized inputs in the test suite, and end-to-end
  * by the streaming-vs-batch chunk-table gates.
  */
object IncrementalMd5 {

  /** Constant-size digest state: registers, the unprocessed tail of
    * the last partial 64-byte block, and the total absorbed length.
    */
  final case class Md5State(a: Int, b: Int, c: Int, d: Int, tail: Array[Byte], len: Long)

  val empty: Md5State =
    Md5State(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476, Array.emptyByteArray, 0L)

  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  private val K: Array[Int] = Array.tabulate(64) { i =>
    StrictMath.floor(StrictMath.abs(StrictMath.sin(i + 1.0)) * 4294967296.0).toLong.toInt
  }

  @inline private def rotl(x: Int, s: Int): Int = (x << s) | (x >>> (32 - s))

  private def compress(regs: Array[Int], block: Array[Byte], off: Int): Unit = {
    val m = new Array[Int](16)
    var j = 0
    while (j < 16) {
      val o = off + 4 * j
      m(j) = (block(o) & 0xff) | ((block(o + 1) & 0xff) << 8) |
        ((block(o + 2) & 0xff) << 16) | ((block(o + 3) & 0xff) << 24)
      j += 1
    }
    var a = regs(0); var b = regs(1); var c = regs(2); var d = regs(3)
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) % 16 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) % 16 }
      else { f = c ^ (b | ~d); g = (7 * i) % 16 }
      val prevD = d
      d = c
      c = b
      b = b + rotl(a + f + K(i) + m(g), S(i))
      a = prevD
      i += 1
    }
    regs(0) += a; regs(1) += b; regs(2) += c; regs(3) += d
  }

  /** Absorb `bytes`, compressing every completed 64-byte block; the
    * remainder (<64 bytes) becomes the new tail.
    */
  def update(st: Md5State, bytes: Array[Byte]): Md5State = {
    if (bytes.isEmpty) st
    else {
      val buf =
        if (st.tail.isEmpty) bytes
        else {
          val b = new Array[Byte](st.tail.length + bytes.length)
          System.arraycopy(st.tail, 0, b, 0, st.tail.length)
          System.arraycopy(bytes, 0, b, st.tail.length, bytes.length)
          b
        }
      val regs = Array(st.a, st.b, st.c, st.d)
      var off = 0
      while (off + 64 <= buf.length) { compress(regs, buf, off); off += 64 }
      Md5State(regs(0), regs(1), regs(2), regs(3),
        java.util.Arrays.copyOfRange(buf, off, buf.length), st.len + bytes.length)
    }
  }

  def updateUtf8(st: Md5State, s: String): Md5State =
    update(st, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Finalize (on a copy — `st` stays absorbable) and render the
    * canonical lowercase-hex digest.
    */
  def hex(st: Md5State): String = {
    val padZeros = (((56 - ((st.len + 1) % 64)) % 64) + 64) % 64
    val pad = new Array[Byte](1 + padZeros.toInt + 8)
    pad(0) = 0x80.toByte
    val bitLen = st.len * 8
    var i = 0
    while (i < 8) {
      pad(pad.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    val fin = update(st, pad)
    val out = new StringBuilder(32)
    Seq(fin.a, fin.b, fin.c, fin.d).foreach { w =>
      var k = 0
      while (k < 4) { out.append(f"${(w >>> (8 * k)) & 0xff}%02x"); k += 1 }
    }
    out.toString
  }
}
