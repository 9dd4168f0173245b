package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure
  * column expressions (whole-stage codegen; no UDFs).
  *
  * Determinism contract: every reduction is a sequential left fold in
  * double precision (`aggregate` evaluates in array order), which is
  * bit-identical to DuckDB's `list_sum` over a `list_transform` — so
  * cosine scores hash-match the SQL oracle exactly.
  */
object VectorFunctions {

  /** Sequential-fold sum of a double array. */
  private def dsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** dot(a, b) with per-element promotion to double. */
  def dot(a: Column, b: Column): Column =
    dsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    dsum(transform(a, x => x.cast("double") * x.cast("double")))

  /** Cosine similarity; expression shape (dot / (sqrt * sqrt)) is kept
    * identical to the SQL oracle so the doubles match bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine given precomputed norms (sqrt of normSq) — avoids
    * recomputing norms per candidate pair in top-k joins.
    */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)
}
