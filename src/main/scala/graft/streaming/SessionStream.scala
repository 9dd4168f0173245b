package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the streaming twin of
  * EventOps.sessionize, built on KeyValueGroupedDataset.
  * flatMapGroupsWithState — custom per-key state that survives across
  * micro-batches (the KV-state pattern the reference engine has no
  * answer to; SURVEY.md §2C "Streaming: none").
  *
  * Semantics: events per user, ordered by (ts_us, event_id); a gap
  * > 30 min closes the current session. Closed sessions are emitted
  * (Append mode); the open session rides in GroupState until a later
  * batch closes it. At 100 TB/day the state store holds one small
  * record per active user and the shuffle is one exchange on user_id —
  * the same shape as the batch job, plus incremental checkpointing.
  */
object SessionStream {

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long)

  /** Open-session state carried across micro-batches. */
  final case class OpenSession(session_id: Long, n_events: Long, start_us: Long, end_us: Long)

  final case class SessionRow(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      start_us: Long,
      end_us: Long
  )

  val GapUs: Long = graft.operators.EventOps.SessionGapUs

  private def fold(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[OpenSession]
  ): Iterator[SessionRow] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionRow]
    for (e <- sorted) {
      open match {
        case Some(s) if e.ts_us - s.end_us <= GapUs =>
          // max(): a late event from an out-of-order batch is absorbed
          // into the open session but can never move its bound backward
          open = Some(s.copy(n_events = s.n_events + 1, end_us = math.max(s.end_us, e.ts_us)))
        case Some(s) =>
          closed += SessionRow(userId, s.session_id, s.n_events, s.start_us, s.end_us)
          open = Some(OpenSession(s.session_id + 1, 1L, e.ts_us, e.ts_us))
        case None =>
          open = Some(OpenSession(1L, 1L, e.ts_us, e.ts_us))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Build the streaming sessionizer over a directory of event parquet
    * files (each file = one micro-batch via maxFilesPerTrigger).
    * Emits CLOSED sessions only; open sessions stay in state.
    */
  def closedSessions(spark: SparkSession, dir: String): Dataset[SessionRow] = {
    graft.operators.Tables.ensureNanosAsLong(spark)
    closedSessionsFrom(
      spark.readStream
        .schema(EventStream.eventsSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
    )
  }

  /** Source-agnostic sessionizer: any STREAMING DataFrame with
    * (user_id, event_id, ts ns-long) columns — the parquet-directory
    * source above or the EventReplay DSv2 source — feeds the same
    * stateful fold.
    */
  def closedSessionsFrom(events: org.apache.spark.sql.DataFrame): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
