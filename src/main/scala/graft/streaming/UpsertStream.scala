package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained materialized view: per-user lifetime
  * totals (event count, exact value sum, latest timestamp) kept
  * current by a streaming upsert — the "serving table fed by the
  * event stream" pattern.
  *
  * Each micro-batch folds ONLY its delta into the snapshot:
  * foreachBatch aggregates the batch per user, unions it with the
  * previous snapshot, and re-aggregates — never the full history.
  * Every aggregate is re-foldable (sum-of-counts, decimal sum,
  * max), so the maintained view is EXACTLY the batch answer over all
  * data seen, which StreamingSpec asserts.
  *
  * Snapshots are MVCC: batch k writes `v{k}` and readers pick the
  * highest complete version — the same atomic-swap contract a table
  * format (Delta/Iceberg MERGE) provides; those replace the
  * directory dance in production, the maintenance algebra stays the
  * same. At 100 TB the snapshot is partitioned by user-hash, the
  * per-batch delta is tiny, and the union+re-agg shuffles
  * |snapshot|+|delta| rows — the standard cost of format-less MV
  * maintenance (a MERGE-capable format reduces it to touched
  * partitions only).
  */
object UpsertStream {

  /** Exact-fold accumulator columns of one side (snapshot or delta). */
  private def foldPerUser(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"),
        max(col("latest_us")).as("latest_us")
      )

  private def versionDirs(spark: SparkSession, targetDir: String): Seq[(Long, String)] = {
    val d = new java.io.File(targetDir)
    if (!d.exists()) Seq.empty
    else
      d.listFiles()
        .toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .flatMap(f => f.getName.drop(1).toLongOption.map(_ -> f.getAbsolutePath))
        // only versions whose write committed (atomicity marker)
        .filter { case (_, p) => new java.io.File(p, "_SUCCESS").exists() }
  }

  /** Latest committed snapshot, or None before the first batch.
    * `below`: consider only versions < that id — the replay guard
    * (see upsert).
    */
  def readLatest(
      spark: SparkSession,
      targetDir: String,
      below: Long = Long.MaxValue
  ): Option[DataFrame] = {
    val vs = versionDirs(spark, targetDir).filter(_._1 < below)
    if (vs.isEmpty) None else Some(spark.read.parquet(vs.maxBy(_._1)._2))
  }

  /** Fold one micro-batch of raw events into snapshot v{batchId}.
    * IDEMPOTENT under micro-batch replay: foreachBatch re-delivers a
    * batchId if the query crashed after writing v{batchId} but before
    * the streaming commit log recorded it. Folding onto "the latest
    * snapshot" would then fold the same delta twice (v{batchId}
    * already contains it); folding onto the latest version STRICTLY
    * BELOW batchId recomputes v{batchId} to the identical contents
    * instead.
    */
  def upsert(batch: DataFrame, batchId: Long, targetDir: String): Unit = {
    val delta = foldPerUser(
      batch.select(
        col("user_id"),
        lit(1L).as("n_events"),
        col("value").cast(DecimalType(38, 10)).as("sum_value"),
        expr("ts DIV 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)").as("latest_us")
      )
    )
    val next = readLatest(batch.sparkSession, targetDir, below = batchId) match {
      case Some(cur) => foldPerUser(cur.unionByName(delta))
      case None => delta
    }
    next.write.mode("overwrite").parquet(s"$targetDir/v$batchId")
  }

  /** Raw event stream -> foreachBatch MV maintenance. The stream
    * itself is stateless (append of raw rows); all aggregation state
    * lives in the versioned snapshot.
    */
  def userTotalsStream(spark: SparkSession, dir: String, targetDir: String): StreamingQuery = {
    graft.operators.Tables.ensureNanosAsLong(spark)
    spark.readStream
      .schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsert(batch, batchId, targetDir)
      }
      .start()
  }
}
