package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming SFT rendering AT THE PACKING EDGE — the online twin of
  * the chat-template transform (`TextOps.sftRenderMask`, gate query
  * `sft_render_mask`): every document is rendered into its role-marked
  * conversation and its loss-token mass accounted the moment it flows
  * toward the trainer, which is where a post-training pipeline
  * actually runs templating (render-on-ingest, so the packer sees
  * final token counts and the loss mask ships with the record).
  *
  * Architecture: a pure per-row MAP — no state store, no watermark,
  * no shuffle, no broadcast (slicing, joining, and the fingerprint are
  * row-local column work). Emitted rows equal the batch projection
  * under ANY micro-batch slicing trivially.
  *
  * One definition, two transports: the transform is
  * `TextOps.sftRenderProjection` — the SAME Columns the batch side
  * plans — so the stream cannot drift from the sheet the DuckDB
  * oracle verifies (StreamingSpec asserts row-for-row equality under
  * slicing).
  */
object SftStream {

  /** Rendered + loss-masked records over a directory of document
    * parquet files (each file = one ingest micro-batch).
    */
  def rendered(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(DedupStream.docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextOps.sftRenderProjection(raw)
  }
}
