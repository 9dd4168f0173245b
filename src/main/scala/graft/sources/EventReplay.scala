package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic micro-batch REPLAY of the events table: the corpus
  * streamed in (ts, event_id) order, `maxRowsPerBatch` rows per
  * trigger — "re-run history as if it were live", the tool every
  * streaming-pipeline change is validated with before it sees real
  * traffic. Implements the full streaming-source contract:
  *
  *   - offsets are ROW COUNTS into the sorted corpus — pure values,
  *     JSON-serializable, so a restart resumes exactly where the
  *     checkpoint says (nothing in the source is stateful);
  *   - admission control (`SupportsAdmissionControl`): latestOffset
  *     advances `start + maxRows` per trigger — paced replay — and
  *     `Trigger.AvailableNow` drains to the end and stops
  *     (`SupportsTriggerAvailableNow`, prepareForTriggerAvailableNow
  *     pins the target so every intermediate batch still respects the
  *     pacing);
  *   - each batch splits into fixed-size partition slices, so replay
  *     parallelism matches a real source's.
  *
  * Like Spark's own MemoryStream, the sorted corpus is held by the
  * DRIVER and row slices ship inside InputPartitions: this is a TEST/
  * VALIDATION harness for bounded replays (the sort itself runs
  * distributed; only the materialized result is pinned). A 100 TB
  * replay would swap the row array for per-slice parquet range reads
  * with the same offset/partition contract — the streaming plumbing
  * here is exactly what that source would implement.
  */
class EventReplay extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = EventReplay.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    // properties arrive with the caller's original key case
    val opts = new CaseInsensitiveStringMap(properties)
    new EventReplayTable(
      opts.get("path"),
      Option(opts.get("maxRowsPerBatch")).map(_.toInt).getOrElse(10000)
    )
  }
}

object EventReplay {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch ns (Tables.events normalization)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** One driver-side load per path per JVM (the MemoryStream model). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[ReplayRow]]()

  private[sources] def rows(dir: String): Array[ReplayRow] =
    cache.computeIfAbsent(
      dir,
      d =>
        graft.operators.Tables
          .events(SparkSession.active, d)
          .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
          .orderBy("ts", "event_id")
          .collect()
          .map(r =>
            ReplayRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
              r.getDouble(4), r.getString(5)))
    )
}

private[sources] case class ReplayRow(
    eventId: Long, ts: Long, userId: Long, eventType: String, value: Double, props: String)

private[sources] case class ReplayOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

private[sources] class EventReplayTable(path: String, maxRows: Int) extends Table with SupportsRead {
  require(path != null, "EventReplay requires .option(\"path\", <sf dir>)")
  override def name(): String = s"event-replay:$path"
  override def schema(): StructType = EventReplay.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new EventReplayScan(path, maxRows)
}

private[sources] class EventReplayScan(path: String, maxRows: Int) extends Scan {
  override def readSchema(): StructType = EventReplay.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventReplayStream(path, maxRows)
}

private[sources] class EventReplayStream(path: String, maxRows: Int)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private lazy val total: Long = EventReplay.rows(path).length.toLong
  private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = ReplayOffset(0L)
  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRows.toLong)

  override def prepareForTriggerAvailableNow(): Unit = availableNowTarget = Some(total)

  /** Paced, stateless advance: next watermark is start + maxRows,
    * capped at the corpus end (or the pinned AvailableNow target).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].rows
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => maxRows.toLong
    }
    ReplayOffset(math.min(availableNowTarget.getOrElse(total), s + step))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset is used")

  override def reportLatestOffset(): Offset = ReplayOffset(total)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ReplayOffset].rows
    val hi = end.asInstanceOf[ReplayOffset].rows
    val all = EventReplay.rows(path)
    val slice = 2048 // fixed partition granularity within a batch
    (lo until hi by slice)
      .map(s => ReplaySlice(all.slice(s.toInt, math.min(hi, s + slice).toInt)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val rows = partition.asInstanceOf[ReplaySlice].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val r = rows(i)
          new GenericInternalRow(Array[Any](
            r.eventId, r.ts, r.userId, UTF8String.fromString(r.eventType),
            r.value, UTF8String.fromString(r.props)))
        }
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] case class ReplaySlice(rows: Array[ReplayRow]) extends InputPartition
