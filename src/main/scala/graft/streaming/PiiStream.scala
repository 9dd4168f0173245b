package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming PII redaction AT INGEST — the online twin of the batch
  * `pii_rewrite` gate (`TextOps.piiRewrite`): every arriving document
  * is scanned for the shared PII classes (email / dashed phone /
  * dotted-quad IPv4) and emitted with matches replaced by typed
  * sentinels plus per-class counts. A pipeline running this at the
  * ingest edge never lands a raw identifier in a training shard —
  * redact-before-persist, the shape every public corpus pipeline
  * (C4, Dolma, RefinedWeb) ships.
  *
  * Architecture: a pure per-row MAP — no state store, no watermark,
  * no shuffle (the stateless-ingest argument of [[DecontamStream]],
  * without even a broadcast side). Emitted rows therefore equal the
  * batch rewrite under ANY micro-batch slicing trivially, and at
  * 100 TB the stream scales as scan-bound ingest.
  *
  * One definition, two transports: the injection expression
  * (`TextOps.piiInjectExpr` — the gate's non-vacuity device) and the
  * redaction projection (`TextOps.piiRedactProjection`) are the SAME
  * Columns the batch query plans, so the stream cannot drift from
  * the batch or from the DuckDB oracle (StreamingSpec asserts
  * row-for-row equality under slicing).
  */
object PiiStream {

  /** Redacted documents over a directory of document parquet files
    * (each file = one ingest micro-batch).
    */
  def redacted(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(DedupStream.docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextOps.piiRedactProjection(
      raw.select(
        col("doc_id"),
        graft.operators.TextOps.piiInjectExpr.as("text")
      )
    )
  }
}
