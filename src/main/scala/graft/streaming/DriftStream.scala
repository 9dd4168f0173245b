package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Distribution-drift monitoring as a STREAMING query — the shape a
  * production data pipeline actually runs drift detection in: events
  * arrive continuously, the monitor maintains per-(type, centi-bin)
  * counts as streaming aggregation state (bounded: types × value
  * bins, independent of event volume), and each trigger the current
  * Mann–Whitney U / AUC between every pair of types derives from that
  * emitted state with the SAME bins → U combinator the batch
  * `mannwhitney_drift` query uses (`EventOps.mannWhitneyFromBins`) —
  * so batch == streaming holds by construction and is proven in
  * StreamingSpec over a sliced replay of the corpus.
  *
  * Scale: the stream side shuffles only partial bin counts per
  * micro-batch (map-side combined, Complete-mode state is the bin
  * table itself); the pair statistic runs over the bounded state, not
  * the stream. At 100 TB/day the state store holds types × bins rows
  * — kilobytes — while the naive alternative (retain raw values,
  * re-rank per trigger) grows without bound.
  */
object DriftStream {

  /** Streaming per-(type, centi-bin) counts over an events directory
    * (Complete mode: the sink always holds the full current bin
    * table).
    */
  def binCounts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("event_type"), EventOps.centiBin.as("vb"))
      .groupBy(col("event_type"), col("vb"))
      .agg(count(lit(1)).as("cnt"))

  /** Batch twin over the same file listing. */
  def binCountsBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(EventStream.eventsSchema)
      .parquet(dir)
      .select(col("event_type"), EventOps.centiBin.as("vb"))
      .groupBy(col("event_type"), col("vb"))
      .agg(count(lit(1)).as("cnt"))

  /** The per-trigger readout: Mann–Whitney U / AUC per type pair from
    * a current bin table (streamed state or the batch twin).
    */
  def mannWhitney(bins: DataFrame): DataFrame =
    EventOps.mannWhitneyFromBins(bins)
}
