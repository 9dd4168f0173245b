package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming fill-in-the-middle transform AT INGEST — the online twin
  * of the batch `fim_split` gate (`TextOps.fimSplit`): every arriving
  * document is coin-flipped and cut into its PSM record the moment it
  * lands, so the training-shard writer downstream never sees raw text
  * that still needs the transform. This is where FIM actually runs in
  * a production pipeline: at the ingest/packing edge, not as a
  * separate corpus pass.
  *
  * Architecture: a pure per-row MAP — no state store, no watermark,
  * no shuffle, no broadcast (cut points and coin are doc_id-derived
  * hashes evaluated inside whole-stage codegen). Emitted rows equal
  * the batch transform under ANY micro-batch slicing trivially, and
  * at 100 TB the stream scales as scan-bound ingest.
  *
  * One definition, two transports: the projection is
  * `TextOps.fimProjection` — the SAME Columns the batch gate plans —
  * so the stream cannot drift from the batch or the DuckDB oracle.
  */
object FimStream {

  /** FIM records over a directory of document parquet files (each
    * file = one ingest micro-batch).
    */
  def records(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(DedupStream.docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextOps.fimProjection(raw)
  }
}
