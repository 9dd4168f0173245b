package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — the remaining join mode of
  * Structured Streaming's three (stream-stream lives in JoinStream,
  * stream-state in SessionStream/CounterStream): arriving events are
  * joined against a STATIC dimension (here a per-user profile computed
  * in batch). The static side is planned once per micro-batch with no
  * state store at all — this is how a 100 TB pipeline attaches
  * slowly-changing reference data (user tiers, document sources,
  * model-version tags) to a live stream; refreshing the dim is a
  * re-deploy (or a Delta-style reread), not a stateful operator.
  */
object EnrichStream {

  /** The static profile: each user's lifetime purchase count and
    * exact value total, from the batch table.
    */
  def userProfile(spark: SparkSession, dir: String): DataFrame = {
    graft.operators.Tables
      .events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("lifetime_purchases"),
        sum(col("value").cast("decimal(38,10)")).cast("double").as("lifetime_value")
      )
  }

  /** Arriving clicks enriched with the static profile (inner join:
    * the enriched stream is the "active buyers clicking now" feed).
    */
  def enrichedClicks(spark: SparkSession, dir: String): DataFrame = {
    val profile = userProfile(spark, dir)
    EventStream.readEvents(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
      .join(profile, Seq("user_id"))
  }
}
