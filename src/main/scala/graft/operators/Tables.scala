package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md). Reads are
  * plain parquet scans so Catalyst pushes filters/projections down to
  * the scan (verify via `PushedFilters`/`ReadSchema` in `.explain`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** The events table's `ts` column has shipped in two physical forms:
    * ns-precision timestamps (which Spark's parquet reader only exposes
    * as raw int64 via `nanosAsLong`) and µs-precision timestamps (read
    * as TIMESTAMP_NTZ). The engine's contract downstream is ONE shape:
    * ns-since-epoch longs — exact integer DIV arithmetic, and safer
    * than timestamps for oracle parity (ns magnitudes exceed double's
    * 2^53 mantissa). Normalize here, at the read boundary: a timestamp
    * column becomes `unix_micros(ts) * 1000` (UTC session — the NTZ
    * wall clock IS the epoch instant, matching DuckDB's `epoch_ns`).
    */
  /** Session contract: nanosAsLong should be set at session creation
    * (Bench/Verify/tests all do). Only set it as a fallback when unset
    * — an unconditional set is a hidden per-call session mutation that
    * can race with concurrent plan building.
    */
  def ensureNanosAsLong(spark: SparkSession): Unit = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
  }

  /** ns-since-epoch long from whatever physical type `ts` landed as. */
  private[graft] def tsAsNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn(
          "ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType)) *
            org.apache.spark.sql.functions.lit(1000L))
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosAsLong(spark)
    tsAsNanos(table(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
