package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession for the whole forked test JVM.
  * master = local[4,2]: 4 threads AND maxFailures=2, so the fault-
  * tolerance tests (reference crash-test analogue, SURVEY.md §5) can
  * observe a task retry instead of dying on first failure.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"

  /** The reference's own test corpus: 9 Project Gutenberg texts
    * (`/root/reference/inputs/pg-*.txt`), the same inputs test-mr.sh
    * feeds both engines (read-only).
    */
  val GutenbergGlob = "/root/reference/inputs/pg-*.txt"
}
