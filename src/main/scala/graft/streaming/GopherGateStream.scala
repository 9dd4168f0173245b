package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming Gopher-rule gate AT INGEST — the online twin of the
  * MassiveText quality heuristics (`TextOps.gopherRules`, gate query
  * `gopher_rules`): every arriving document is evaluated against the
  * seven published rules the moment it lands, so a rule-failing page
  * is flagged before it costs a byte of downstream dedup/decontam
  * work. MassiveText/FineWeb-style pipelines run exactly this pass
  * first; at 100 TB it is the cheapest gate in the stack and belongs
  * at the edge.
  *
  * Architecture: a pure per-row MAP — no state store, no watermark,
  * no shuffle, no broadcast (every rule is a cross-multiplied integer
  * comparison over row-local token/line counts). Emitted rows equal
  * the batch projection under ANY micro-batch slicing trivially.
  *
  * One definition, two transports: the rule projection is
  * `TextOps.gopherRuleProjection` over the SAME injected corpus
  * expression (`TextOps.gopherInjectExpr`) the batch side plans, so
  * the stream cannot drift from the sheet the DuckDB oracle verifies
  * (StreamingSpec asserts row-for-row equality under slicing and
  * reconciles streamed pass counts against the `gopher_rules` sheet).
  */
object GopherGateStream {

  /** Rule-flagged documents over a directory of document parquet
    * files (each file = one ingest micro-batch).
    */
  def flagged(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(DedupStream.docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextOps.gopherRuleProjection(
      raw.select(
        col("doc_id"),
        col("source"),
        graft.operators.TextOps.gopherInjectExpr.as("text")
      )
    )
  }
}
