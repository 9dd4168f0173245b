package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events data: the same hourly
  * rollup as EventOps.hourlyRollup, expressed as a streaming query
  * (readStream → event-time window agg → writeStream).
  *
  * The reference engine is strictly batch (SURVEY.md §1) — this is the
  * north-star streaming extension. Design notes for scale:
  * event-time windows + a watermark bound state; the aggregation is
  * partial-agg'd before the shuffle exactly like the batch twin; with
  * `maxFilesPerTrigger` the source paces backfills.
  */
object EventStream {

  /** events schema as read with nanosAsLong (see Tables.events). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** THE streaming events source: every streaming query reads through
    * here so the `ts`-is-ns-longs contract holds regardless of the
    * physical form the driver generated (ns-annotated int64 vs µs
    * timestamp — see Tables.events). readStream requires a declared
    * schema, so probe the real file schema with a one-off batch read
    * (metadata-only; no data scan) instead of hard-coding one.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    graft.operators.Tables.ensureNanosAsLong(spark)
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.Tables.tsAsNanos(stream)
  }

  /** Streaming hourly rollup: count + value sum per (hour, type) with
    * a 2-hour watermark on event time.
    */
  def hourlyRollupStream(spark: SparkSession, dir: String): DataFrame = {
    val stream = readEvents(spark, dir)
    stream
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(38, 10))).cast("double").as("sum_value")
      )
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )
  }
}
