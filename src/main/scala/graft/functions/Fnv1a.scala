package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** FNV-1a 32-bit hash, masked non-negative — the reference's shuffle
  * partitioner (`utils/hashes.go:7-11`, used at `mr/worker.go:129` as
  * `Ihash(key) % nReduce`).
  *
  * Spark's own shuffle uses Murmur3; results are identical regardless of
  * which key lands in which reduce partition, so this exists only for
  * per-file output parity with the reference (`mr-out-R` assignment) and
  * for tests that assert the bucketing function itself.
  */
object Fnv1a {
  private val OffsetBasis = 0x811c9dc5 // 2166136261
  private val Prime = 0x01000193 // 16777619

  /** Matches Go's `fnv.New32a().Write([]byte(key)).Sum32() & 0x7fffffff`. */
  def hash(key: String): Int = {
    var h = OffsetBasis
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= Prime
      i += 1
    }
    h & 0x7fffffff
  }

  /** Column form for `repartition(nReduce, pmod(fnv1a(key), nReduce))`. */
  val fnv1a: Column => Column = {
    val u = udf((s: String) => if (s == null) 0 else hash(s))
    (c: Column) => u(c)
  }
}
