package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashKernel, SimHashKernel}

/** Randomized property tests for the round-6 scalar kernels, against
  * independent reference implementations (JDK digest + the published
  * hex-walk formulas) — no Spark session, pure function checks over
  * seeded random token streams (unicode, duplicates, boundary
  * lengths).
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260814)

  private val alphabet =
    Vector("the", "a", "naïve", "łódź", "日本", "q", "zz", "longertokenhere", "é")

  private def randToks(n: Int): Array[String] =
    Array.fill(n)(alphabet(rnd.nextInt(alphabet.size)))

  private def arr(toks: Array[String]): GenericArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): AnyRef))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("simhash64 == hex-walk reference over random multisets; order-free") {
    def ref(toks: Array[String]): String = {
      val acc = new Array[Int](64)
      toks.groupBy(identity).foreach { case (t, occ) =>
        val hex = md5hex(t)
        (0 until 64).foreach { j =>
          val bit = (Character.digit(hex.charAt(j / 4), 16) >> (3 - j % 4)) & 1
          acc(j) += (if (bit == 1) occ.length else -occ.length)
        }
      }
      acc.map(v => if (v >= 0) '1' else '0').mkString
    }
    (0 until 300).foreach { _ =>
      val toks = randToks(rnd.nextInt(40))
      val got = SimHashKernel.bits(arr(toks)).toString
      assert(got === ref(toks))
      // multiset property: any permutation fingerprints identically
      val shuffled = rnd.shuffle(toks.toSeq).toArray
      assert(SimHashKernel.bits(arr(shuffled)).toString === got)
    }
  }

  test("minhash_sigs == posting-formula reference; null below width; width sweep") {
    def ref(toks: Array[String], n: Int): Option[Array[Long]] = {
      val shingles = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      if (shingles.isEmpty) None
      else Some((0 until MinHashKernel.Perms).map { k =>
        shingles.map { sh =>
          val h = java.lang.Long.parseLong(md5hex(sh).substring(0, 15), 16) %
            MinHashKernel.Prime
          ((k.toLong * 1000003L + 1L) * h + (k.toLong * 999983L + 12345L)) %
            MinHashKernel.Prime
        }.min
      }.toArray)
    }
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(5)
      val toks = randToks(rnd.nextInt(25))
      val got = Option(MinHashKernel.sigs(arr(toks), n)).map(_.toLongArray)
      val want = ref(toks, n)
      assert(got.isDefined === want.isDefined, s"n=$n len=${toks.length}")
      (got, want) match {
        case (Some(g), Some(w)) => assert(g.toSeq === w.toSeq)
        case _ => ()
      }
    }
    // exactly-below and exactly-at the width boundary
    assert(MinHashKernel.sigs(arr(randToks(2)), 3) == null)
    assert(MinHashKernel.sigs(arr(randToks(3)), 3) != null)
  }

  test("shingle_hashes == conv(substr(md5)) reference, positional incl. duplicates") {
    def ref(toks: Array[String], n: Int): Seq[Long] =
      toks.sliding(n).filter(_.length == n)
        .map(w => java.lang.Long.parseLong(md5hex(w.mkString(" ")).substring(0, 15), 16))
        .toSeq
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(5)
      val toks = randToks(rnd.nextInt(30))
      val got = MinHashKernel.windowHashes(arr(toks), n).toLongArray.toSeq
      assert(got === ref(toks, n), s"n=$n toks=${toks.mkString("|")}")
    }
    // duplicate windows keep their positions (NOT distinct — the
    // winnowing minima need the positional stream)
    val rep = Array("a", "b", "a", "b", "a")
    assert(MinHashKernel.windowHashes(arr(rep), 2).numElements() === 4)
  }

  test("hashgram_score == HOF-fold reference over random multisets; order-free; empty = 0") {
    def ref(toks: Array[String]): Long =
      toks.map { t =>
        java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16) % 2001L - 1000L
      }.sum
    (0 until 300).foreach { _ =>
      val toks = randToks(rnd.nextInt(40))
      val got = graft.functions.HashgramKernel.score(arr(toks))
      assert(got === ref(toks))
      // bag property: any permutation scores identically (the retired
      // aggregate lambda folded in order; the sum is order-free)
      val shuffled = rnd.shuffle(toks.toSeq).toArray
      assert(graft.functions.HashgramKernel.score(arr(shuffled)) === got)
    }
    assert(graft.functions.HashgramKernel.score(arr(Array.empty[String])) === 0L)
  }

  test("span_corrupt == three-pass HOF reference over random docs; empty doc fingerprints ''") {
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
    def ref(id: Long, toks: Array[String]): (Long, Long, Long, Long) = {
      val n = toks.length
      val starts = (0 until n).map(j => h60(s"$id:$j") % 14 == 0)
      val lens = (0 until n).map(j => 1 + h60(s"$id;$j") % 3)
      val corr = (0 until n).map { i =>
        starts(i) ||
          (i >= 1 && starts(i - 1) && lens(i - 1) >= 2) ||
          (i >= 2 && starts(i - 2) && lens(i - 2) >= 3)
      }
      val nCorr = corr.count(identity).toLong
      val nSpans = (0 until n).count(i => corr(i) && (i == 0 || !corr(i - 1))).toLong
      val masked = (0 until n).flatMap { i =>
        if (!corr(i)) Some(toks(i))
        else if (i == 0 || !corr(i - 1)) Some("<X>")
        else None
      }.mkString(" ")
      val target = (0 until n).flatMap { i =>
        if (!corr(i)) None
        else if (i == 0 || !corr(i - 1)) Some("<X> " + toks(i))
        else Some(toks(i))
      }.mkString(" ")
      (nCorr, nSpans, h60(masked), h60(target))
    }
    (0 until 200).foreach { k =>
      val id = rnd.nextLong() & Long.MaxValue
      val toks = randToks(rnd.nextInt(40))
      val row = graft.functions.SpanCorruptKernel
        .stats(id, arr(toks))
      val exp = ref(id, toks)
      assert(row.getLong(0) === exp._1, s"n_corrupted id=$id k=$k")
      assert(row.getLong(1) === exp._2, s"n_spans id=$id")
      assert(row.getLong(2) === exp._3, s"masked_fp id=$id")
      assert(row.getLong(3) === exp._4, s"target_fp id=$id")
    }
    val empty = graft.functions.SpanCorruptKernel.stats(7L, arr(Array.empty[String]))
    assert(empty.getLong(0) === 0L)
    assert(empty.getLong(1) === 0L)
    assert(empty.getLong(2) === h60(""))
    assert(empty.getLong(3) === h60(""))
  }
}
