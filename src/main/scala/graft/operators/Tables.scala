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
  /** The events table carries nanosecond timestamps, which Spark's
    * parquet reader rejects; read them as raw ns-since-epoch longs
    * (exact — and safer than timestamps for oracle parity, since ns
    * magnitudes exceed double's 2^53 mantissa). Downstream ops use
    * integer DIV arithmetic on the ns values.
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

  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosAsLong(spark)
    table(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
