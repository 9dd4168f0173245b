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
import org.apache.spark.sql.functions.col
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
  * The driver NEVER materializes the corpus (the round-3 version held
  * the whole sorted table in a per-JVM array — a scale killer the
  * moment the source saw real data). Instead, a one-time distributed
  * job computes a rank → (ts, event_id) BOUNDARY INDEX at every
  * `maxRowsPerBatch` stride (N/step entries — the only per-path
  * driver state), and each micro-batch turns its row-count offsets
  * into a key range between adjacent boundaries and runs a
  * distributed, predicate-bounded scan of just that slice of the
  * corpus. Driver memory is O(batch + N/step), per-trigger read cost
  * is the batch's own rows, and the ts-range predicates bound the
  * scan at the source. At 100 TB the remaining step — shipping the
  * batch rows through InputPartitions instead of executor-side range
  * reads — would swap ReplaySlice for per-slice parquet reads with
  * the same offset/boundary contract.
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

  /** Boundary index: `bounds(i)` is the (ts, event_id) key of global
    * rank i·step in the sorted corpus. (ts, event_id) is a total
    * order (ids are unique), so a [bounds(i), bounds(j)) key range
    * holds exactly (j−i)·step rows.
    */
  private[sources] case class ReplayIndex(total: Long, step: Long, bounds: Array[(Long, Long)])

  /** One driver-side boundary-index build per (path, step) per JVM —
    * N/step keys, not N rows. Ranks come from RankOps' range-partition
    * ledger (the repo's one definition of exact global rank: collect
    * bounded by partition count, no single-task sort, no zipWithIndex
    * over a fully-sorted lineage); the boundary collect that follows
    * is the INDEX ITSELF — O(N/step) driver entries by contract, with
    * `maxRowsPerBatch` the knob: a replay of 10¹² rows at a 10⁷-row
    * batch is a 10⁵-entry index (~3 MB). A corpus too large for that
    * wants a coarser stride, not a different structure.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), ReplayIndex]()

  private[sources] def index(dir: String, step: Long): ReplayIndex =
    cache.computeIfAbsent(
      (dir, step),
      { case (d, st) =>
        val ev = graft.operators.Tables
          .events(SparkSession.active, d)
          .selectExpr("ts", "event_id")
        val ranked = graft.operators.RankOps
          .withGlobalRank(ev, "_rank", Seq(col("ts"), col("event_id")))
          .localCheckpoint() // feeds the boundary filter AND the total
        // _rank is 1-based; the boundary of segment i is the key at
        // 0-based rank i·step
        val bounds = ranked
          .filter((col("_rank") - 1) % st === 0)
          .select(col("_rank"), col("ts"), col("event_id"))
          .collect()
          .sortBy(_.getLong(0))
          .map(r => (r.getLong(1), r.getLong(2)))
        ReplayIndex(ranked.count(), st, bounds)
      }
    )

  /** Rows [lo, hi) of the sorted corpus: resolve the covering
    * boundary segment, scan ONLY that key range distributed, and trim
    * to the exact offsets. The collect is bounded by the segment span
    * (≤ batch + one stride), never the corpus.
    */
  private[sources] def batchRows(dir: String, step: Long, lo: Long, hi: Long): Array[ReplayRow] = {
    if (lo >= hi) return Array.empty
    val idx = index(dir, step)
    val b0 = (lo / step).toInt
    val b1 = ((hi + step - 1) / step).toInt // segment-exclusive end
    val (loTs, loId) = idx.bounds(b0)
    val endKey = if (b1 < idx.bounds.length) Some(idx.bounds(b1)) else None
    val ev = graft.operators.Tables
      .events(SparkSession.active, dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      // redundant ts bounds first: plain range predicates the scan can
      // use for pruning; the tuple compare below makes them exact
      .filter(col("ts") >= loTs)
      .filter(col("ts") > loTs || col("event_id") >= loId)
    val ranged = endKey match {
      case Some((hiTs, hiId)) =>
        ev.filter(col("ts") <= hiTs).filter(col("ts") < hiTs || col("event_id") < hiId)
      case None => ev
    }
    val seg = ranged
      .orderBy("ts", "event_id")
      .collect()
      .map(r =>
        ReplayRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getDouble(4), r.getString(5)))
    val base = b0.toLong * step
    seg.slice((lo - base).toInt, (hi - base).toInt)
  }
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

  private lazy val total: Long = EventReplay.index(path, maxRows.toLong).total
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
    val batch = EventReplay.batchRows(path, maxRows.toLong, lo, hi)
    val slice = 2048 // fixed partition granularity within a batch
    (batch.indices by slice)
      .map(s => ReplaySlice(batch.slice(s, math.min(batch.length, s + slice))): InputPartition)
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
