package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchases matched to the same user's
  * clicks in the preceding hour — the streaming twin of
  * EventOps.clicksBeforePurchase (which bins; here the range lives in
  * the join condition, the shape Structured Streaming requires).
  *
  * Scale notes: both sides shuffle on user_id (the equi key); the
  * watermarks + the time-range condition let the state store evict a
  * buffered click once `click_time + 1 hour` falls behind the purchase
  * watermark — without them stream-stream join state grows without
  * bound. State is per-user and time-bounded: O(events per user per
  * watermark horizon), no cross-user blowup.
  */
object JoinStream {

  /** (purchase, click) pairs where the click precedes the purchase by
    * at most one hour, emitted as the streams advance. Inner join:
    * purchases with no qualifying click produce no row (the batch
    * count form reports those as n_clicks_1h = 0).
    */
  def purchaseClickPairs(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame = {
    graft.operators.Tables.ensureNanosAsLong(spark)
    def src = spark.readStream
      .schema(EventStream.eventsSchema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val clicks = src
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"),
        col("event_id").as("click_id"),
        timestamp_micros(expr("ts DIV 1000")).as("c_time")
      )
      .withWatermark("c_time", "2 hours")
    val purchases = src
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        timestamp_micros(expr("ts DIV 1000")).as("p_time")
      )
      .withWatermark("p_time", "2 hours")
    purchases
      .join(
        clicks,
        expr(
          "p_user = c_user AND c_time <= p_time AND c_time > p_time - interval 1 hour"
        )
      )
      .select(
        col("p_user").as("user_id"),
        col("purchase_id"),
        col("click_id"),
        unix_micros(col("p_time")).as("p_us"),
        unix_micros(col("c_time")).as("c_us")
      )
  }
}
