package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming k-anonymity monitor: the stateful twin of
  * `EventOps.kAnonymity` — events arrive in micro-batches and every
  * quasi-identifier class (event type, hour-of-day, value band)
  * keeps its EXACT distinct-user count current, emitting an updated
  * (k, n_rows) row whenever a batch touches the class. A release
  * gate reads the latest emission per class; StreamingSpec proves
  * the final state derives the batch report exactly through the
  * shared `kAnonymityReport` stage.
  *
  * State design: per class, the distinct user-id SET — the exact-k
  * price. That is the same cardinality the batch COUNT(DISTINCT)
  * shuffle carries (|distinct (class, user)| pairs), distributed
  * across the state store by class key; per-class population is
  * bounded by the user universe, and k/n_rows are monotone so
  * "latest emission" is well-defined downstream. The 100 TB
  * swap-in, when exactness can yield, is an HLL sketch per class
  * (constant state; same fold shape).
  */
object AnonStream {

  final case class QiRow(
      event_type: String,
      hour_of_day: Long,
      value_band: Long,
      user_id: Long
  )

  final case class AnonState(users: Set[Long], nRows: Long)

  final case class ClassStat(
      event_type: String,
      hour_of_day: Long,
      value_band: Long,
      k: Long,
      n_rows: Long
  )

  val qiSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("hour_of_day", LongType),
    StructField("value_band", LongType),
    StructField("user_id", LongType)
  ))

  /** Hard cap on a class's exact distinct-user state. Exact k is the
    * contract while the set is release-gate-sized; a class whose user
    * universe outgrows the cap means the deployment needed the HLL
    * swap-in — and that must surface as a LOUD failure at the class
    * that crossed the line, not as silent state-store growth until an
    * executor OOMs. Default 1M ids ≈ 8 MB/class of long state.
    */
  val DefaultMaxUsersPerClass = 1000000

  private def fold(maxUsers: Int)(
      key: (String, Long, Long),
      rows: Iterator[QiRow],
      state: GroupState[AnonState]
  ): Iterator[ClassStat] = {
    var st = state.getOption.getOrElse(AnonState(Set.empty, 0L))
    for (r <- rows) st = AnonState(st.users + r.user_id, st.nRows + 1)
    if (st.users.size > maxUsers)
      throw new IllegalStateException(
        s"k-anonymity class $key exceeded $maxUsers distinct users " +
          s"(${st.users.size}): exact-set state is no longer release-gate-" +
          "sized — switch this deployment to the HLL sketch fold")
    state.update(st)
    Iterator.single(
      ClassStat(key._1, key._2, key._3, st.users.size.toLong, st.nRows))
  }

  /** Per-class running (k, n_rows) over a directory of QI-row parquet
    * files (each file = one micro-batch).
    */
  def classStats(
      spark: SparkSession,
      dir: String,
      maxUsersPerClass: Int = DefaultMaxUsersPerClass): Dataset[ClassStat] = {
    import spark.implicits._
    spark.readStream
      .schema(qiSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[QiRow]
      .groupByKey(r => (r.event_type, r.hour_of_day, r.value_band))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        fold(maxUsersPerClass))
  }
}
