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

  /** dot(a, b): native codegen expression (see VectorExpressions —
    * same sequential double fold as the interpreted HOF form, minus
    * the per-element boxing).
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  /** Squared L2 norm — native codegen expression. */
  def normSq(a: Column): Column = VectorExpressions.vecNormSq(a)

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
