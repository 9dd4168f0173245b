package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming quality-classifier gate AT INGEST — the online twin of
  * the hashgram linear classifier (`TextOps.hashgramScore`, gate
  * query `hashgram_score`): every arriving document is scored by the
  * hashed-bag-of-words fold and tagged keep/drop the moment it lands.
  * This is the execution shape of fastText-style quality gating at a
  * corpus's ingest edge (CCNet / RefinedWeb run exactly this pass
  * before anything else touches a page): score-before-persist, so a
  * dropped page never costs downstream dedup/decontam work.
  *
  * Architecture: a pure per-row MAP — no state store, no watermark,
  * no shuffle, no broadcast (the weight table is IN the expression:
  * w(token) = top-60-bit md5 % 2001 − 1000, evaluated per token
  * inside whole-stage codegen). Emitted rows equal the batch
  * projection under ANY micro-batch slicing trivially, and at 100 TB
  * the stream scales as scan-bound ingest.
  *
  * One definition, two transports: the scoring projection is
  * `TextOps.hashgramGateProjection` — the SAME Columns the batch side
  * plans — so the stream cannot drift from the batch sheet the DuckDB
  * oracle verifies (StreamingSpec asserts row-for-row equality under
  * slicing and reconciles the streamed keep counts against the
  * `hashgram_score` gate's per-source sheet).
  */
object ScoreGateStream {

  /** Scored documents over a directory of document parquet files
    * (each file = one ingest micro-batch).
    */
  def scored(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(DedupStream.docsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextOps.hashgramGateProjection(raw)
  }
}
