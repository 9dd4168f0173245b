package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Timeout-emitted sessionization: transformWithState with EVENT-TIME
  * TIMERS. SessionStream (flatMapGroupsWithState) can only close a
  * session when the same user's NEXT event arrives — a user who walks
  * away leaves their last session open forever. Here the processor
  * registers an event-time timer at session end + gap; when the
  * WATERMARK passes it, handleExpiredTimer emits the session and
  * clears state — sessions complete from the passage of (event) time
  * alone. This is the idle-timeout pattern of every production
  * sessionizer; state per key is one small record + one timer, both
  * RocksDB-backed.
  */
object TimerSessionStream {

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  final case class Open(n_events: Long, start_us: Long, end_us: Long)
  final case class SessionRow(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  val GapUs: Long = graft.operators.EventOps.SessionGapUs

  class SessionProcessor extends StatefulProcessor[Long, Ev, SessionRow] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open", Encoders.product[Open], TTLConfig.NONE)

    private def rearm(endUs: Long): Unit = {
      // one live timer per key: re-arm at the new session end + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer((endUs + GapUs) / 1000L)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Ev],
        timerValues: TimerValues
    ): Iterator[SessionRow] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val closed = Seq.newBuilder[SessionRow]
      var cur = if (open.exists()) Some(open.get()) else None
      for (e <- sorted) {
        cur match {
          case Some(s) if e.ts_us - s.end_us <= GapUs =>
            cur = Some(s.copy(n_events = s.n_events + 1, end_us = math.max(s.end_us, e.ts_us)))
          case Some(s) =>
            // gap already exceeded by the data itself — close inline
            // (the timer path below covers the no-next-event case)
            closed += SessionRow(key, s.n_events, s.start_us, s.end_us)
            cur = Some(Open(1L, e.ts_us, e.ts_us))
          case None =>
            cur = Some(Open(1L, e.ts_us, e.ts_us))
        }
      }
      cur.foreach { s => open.update(s); rearm(s.end_us) }
      closed.result().iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[SessionRow] = {
      val out = (if (open.exists()) Some(open.get()) else None).map { s =>
        SessionRow(key, s.n_events, s.start_us, s.end_us)
      }
      open.clear()
      out.iterator
    }
  }

  /** Sessions over a directory of event parquet files; emitted either
    * when a later event proves the gap elapsed, or when the watermark
    * (delay 0: watermark = max event time seen) passes end + gap.
    */
  def timedOutSessions(spark: SparkSession, dir: String): Dataset[SessionRow] = {
    import spark.implicits._
    graft.operators.Tables.ensureNanosAsLong(spark)
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.readStream
      .schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(
        col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"),
        timestamp_micros(expr("ts DIV 1000")).as("event_time")
      )
      .withWatermark("event_time", "0 seconds")
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
