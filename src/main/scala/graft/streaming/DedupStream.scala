package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact-dedup: the ingest-time twin of
  * DedupOps.exactDedup — documents arrive as files, each carries the
  * canonical text fingerprint (TextOps.fingerprintExpr, the SAME
  * definition as the batch dedup key), and `dropDuplicates("fp")`
  * keeps the first-arrived doc per fingerprint across micro-batches.
  *
  * This is the shape a training-data pipeline actually ingests with:
  * dedup-on-arrival so downstream stages never see a duplicate, with
  * the keyed state store carrying one entry per distinct fingerprint.
  *
  * Scale notes (100 TB/day):
  *   - state = one (fp -> seen) record per DISTINCT document; md5 keys
  *     are uniform, so the state shuffle has no skew;
  *   - unbounded-state caveat: without an event-time watermark the
  *     store grows with the distinct corpus. In production either (a)
  *     bound it with `withWatermark` + `dropDuplicatesWithinWatermark`
  *     when near-time re-delivery is the only duplicate source, or
  *     (b) run the RocksDB state store provider so state spills off
  *     heap. Both are config, not code shape.
  */
object DedupStream {

  /** documents.parquet schema (TESTDATA.md). */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** First-arrived doc per fingerprint, streaming. Emits
    * (doc_id, fp) in Append mode; a later doc with a seen fp is
    * dropped by keyed state.
    */
  def firstSeenDocs(spark: SparkSession, dir: String): DataFrame = {
    spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(
        col("doc_id"),
        graft.operators.TextOps.fingerprintExpr(col("text")).as("fp")
      )
      .dropDuplicates("fp")
  }
}
