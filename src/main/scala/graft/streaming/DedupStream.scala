package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact-dedup: the ingest-time twin of
  * DedupOps.exactDedup — documents arrive as files, each carries the
  * canonical text fingerprint (TextOps.fingerprintExpr, the SAME
  * definition as the batch dedup key), and `dropDuplicates("fp")`
  * keeps ONE doc per fingerprint: across micro-batches the first batch
  * to see a fingerprint wins (keyed state), but WITHIN a micro-batch
  * Spark keeps an arbitrary row per key — there is no ordering
  * guarantee, so which same-batch duplicate survives is
  * nondeterministic. If a deterministic survivor is required, reduce
  * to min-doc_id per fp inside each batch (foreachBatch) before the
  * state lookup.
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

  /** One surviving doc per fingerprint, streaming (see class doc for
    * the within-batch nondeterminism caveat). Emits (doc_id, fp) in
    * Append mode; a doc whose fp is already in keyed state is dropped.
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

  /** Arrival record for the bounded-state variant: the writer stamps
    * each doc with an ingest time (ns) and its fingerprint.
    */
  val arrivalSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", LongType),
    StructField("fp", StringType)
  ))

  /** The bounded-state twin of firstSeenDocs — class-doc caveat (a)
    * made real: event-time watermark + `dropDuplicatesWithinWatermark`
    * keeps a fingerprint's state only until the watermark passes its
    * event time + delay. State size tracks the RE-DELIVERY horizon,
    * not the distinct corpus — the right contract when duplicates only
    * arise from near-time redelivery (at-least-once sources, retries);
    * a duplicate arriving after the horizon is re-admitted by design
    * (the spec pins exactly that — note eviction lands at the END of
    * the first batch that runs after the watermark passes the key's
    * horizon, so re-admittance needs a subsequent batch). Late rows
    * behind the watermark are dropped entirely, same as any
    * watermarked operator.
    */
  def firstSeenWithinHorizon(
      spark: SparkSession,
      dir: String,
      delay: String = "10 minutes"
  ): DataFrame = {
    spark.readStream
      .schema(arrivalSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"))
  }
}
