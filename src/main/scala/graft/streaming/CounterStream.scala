package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Running per-(user, event_type) counters on the transformWithState
  * API (Spark 4's arbitrary-state processor — the successor to
  * [flat]mapGroupsWithState used by SessionStream): typed MapState per
  * key, explicit TTL hooks, RocksDB-backed incremental checkpoints.
  * This is the streaming twin of EventOps.userActivity's count matrix.
  *
  * Scale shape: one exchange on user_id; state is one small map per
  * user in the executor-local RocksDB instance, so state size scales
  * with ACTIVE users, not event volume, and micro-batch cost scales
  * with the delta. Update-mode output emits only the counters a batch
  * actually touched — the 100 TB/day version of "maintain a live
  * activity dashboard" without ever re-scanning history.
  */
object CounterStream {

  final case class Ev(user_id: Long, event_type: String)
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Counts per event_type, kept in MapState across micro-batches.
    * TTLConfig.NONE: counters never expire (a retention policy would
    * pass a Duration here and let RocksDB age keys out).
    */
  class CountsProcessor extends StatefulProcessor[Long, Ev, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Ev],
        timerValues: TimerValues
    ): Iterator[TypeCount] = {
      // LinkedHashSet: emit each touched counter once, in first-touch
      // order, with its post-batch value
      val touched = scala.collection.mutable.LinkedHashSet[String]()
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1L)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  /** Stream of counter updates over a directory of event parquet files
    * (each file = one micro-batch). Update mode: a row per counter a
    * batch touched, carrying the new running total.
    */
  def typeCounts(spark: SparkSession, dir: String): Dataset[TypeCount] = {
    import spark.implicits._
    graft.operators.Tables.ensureNanosAsLong(spark)
    // transformWithState is only implemented by the RocksDB state
    // store; the default HDFS-backed provider rejects it
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.readStream
      .schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("user_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new CountsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
