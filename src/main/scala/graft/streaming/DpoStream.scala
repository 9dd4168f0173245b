package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming preference-pair assembly AT THE PACKING EDGE — the online
  * twin of the DPO prep (`TextOps.dpoPairs`, gate query `dpo_pairs`):
  * every document is split into its prompt/chosen/rejected triple and
  * both branches rendered + fingerprinted the moment it flows toward
  * the preference trainer — where a DPO loader actually assembles
  * pairs (assemble-on-ingest, so the packer sees both branches' token
  * counts and degenerate pairs are droppable before batching).
  *
  * Architecture: a pure per-row MAP — no state store, no watermark, no
  * shuffle (slicing, template rendering, and the fingerprints are
  * row-local column work). Emitted rows equal the batch projection
  * under ANY micro-batch slicing trivially.
  *
  * One definition, two transports: the transform is
  * `TextOps.dpoPairProjection` — the SAME Columns the batch side
  * plans — so the stream cannot drift from the sheet the DuckDB
  * oracle verifies (StreamingSpec asserts row-for-row equality under
  * slicing).
  */
object DpoStream {

  /** Assembled preference records over a directory of document parquet
    * files (each file = one ingest micro-batch).
    */
  def pairs(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(DedupStream.docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextOps.dpoPairProjection(raw)
  }
}
