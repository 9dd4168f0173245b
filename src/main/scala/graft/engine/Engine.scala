package graft.engine

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fnv1a

/** Generic MapReduce-on-Spark kernel: capability parity with the
  * reference's fixed dataflow (SURVEY.md §2A, F1–F12).
  *
  * Reference pipeline (`mr/worker.go`): whole-file scan (F1) → user map
  * (F2) → FNV-1a hash partition into nReduce buckets (F3) → JSON
  * intermediate files (F4) → per-partition sort (F5) → adjacency
  * group + user reduce (F6) → text sink `"key value\n"` (F7).
  * Scheduling, retry, the map→reduce barrier, completion tracking, the
  * intermediate-file registry and the RPC transport (F8–F12) are Spark
  * internals here: the DAG scheduler cuts a stage at the shuffle,
  * `spark.task.maxFailures` + lineage replace the 10 s
  * deadline/re-enqueue watcher (`mr/coordinator_watcher.go:5-53`), and
  * the shuffle service's exactly-once commit removes the reference's
  * duplicate-intermediate-file hazard (`mr/notify_intermediate_file.go:6`).
  *
  * Scale notes (100 TB): the scan is one task per file (unsplittable
  * whole-file semantics — same granularity as the reference, F1); the
  * only shuffle is the groupByKey, which streams values per key through
  * an iterator rather than materializing a reduce partition in memory
  * (the reference loads + sorts the entire reduce input in memory,
  * `mr/worker.go:40-58` — that is its OOM ceiling, removed here by
  * Spark's spillable ExternalSorter). Per-key value lists are
  * materialized only inside `reduce`, matching the reference contract.
  */
object Engine {

  /** F1: whole-file scan. One row per file: (fileName, contents).
    * `binaryFile` gives (path, content) with one partition per file for
    * files below maxPartitionBytes — the same task granularity as the
    * reference's one-map-task-per-file (`mr/types.go:19-22`).
    */
  def scanWholeFiles(spark: SparkSession, inputGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read
      .format("binaryFile")
      .load(inputGlob)
      .select(
        // The reference passes the bare file path as `filename`
        // (`mr/worker.go:98`); strip the `file:` URI scheme for parity.
        regexp_replace(col("path"), "^file:", "").as("file"),
        col("content").cast("string").as("contents")
      )
      .as[(String, String)]
  }

  /** F1–F6: run an app over an input glob, returning the reduced
    * key/value dataset (one row per distinct key).
    */
  def run(spark: SparkSession, inputGlob: String, app: MrApp): Dataset[KeyValue] =
    mapReduce(spark, scanWholeFiles(spark, inputGlob), app)

  /** The kernel on an arbitrary (file, contents) dataset — lets tests
    * and table-backed callers (e.g. the `documents` table as a corpus)
    * reuse the same dataflow.
    */
  def mapReduce(
      spark: SparkSession,
      input: Dataset[(String, String)],
      app: MrApp
  ): Dataset[KeyValue] = {
    // reduce parallelism (the reference's nReduce) is Spark's
    // spark.sql.shuffle.partitions — a session conf, not a per-job
    // argument; writeText carries the explicit nReduce for output
    // bucket parity
    import spark.implicits._
    val mapped: Dataset[KeyValue] = // F2: 1 input row → N KeyValue rows
      input.flatMap { case (file, contents) => app.map(file, contents) }
    // F3+F5+F6: hash partition on key, group, fold with the user reduce.
    // groupByKey shuffles on key (Murmur3 — per-key results are
    // partition-invariant, see Fnv1a scaladoc) and hands reduce a
    // streaming iterator; sort-order of values is unspecified, matching
    // the reference (`mr/worker.go:58` sorts keys only).
    mapped
      .groupByKey(_.key)
      .mapGroups { (key, rows) =>
        KeyValue(key, app.reduce(key, rows.map(_.value).toSeq))
      }
  }

  /** F7: text sink — `"%v %v\n"`-formatted lines in nReduce files, with
    * the reference's FNV-1a bucket assignment (`mr-out-R` parity:
    * which key lands in which output partition matches
    * `utils.Ihash(key) % nReduce`, `mr/worker.go:60-74,129`).
    *
    * Uses an explicit RDD Partitioner: `Dataset.repartition(n, expr)`
    * re-hashes the expression with Murmur3, so it cannot pin a row to
    * the partition the expression names — a custom partitioner is the
    * one place the RDD API is genuinely required.
    */
  def writeText(result: Dataset[KeyValue], outDir: String, nReduce: Int = 10): Unit = {
    val sc = result.sparkSession.sparkContext
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    // Composite (bucket, key) shuffle key + repartitionAndSortWithin-
    // Partitions: the sort runs in Spark's spillable ExternalSorter, so
    // a reduce partition never has to fit in heap (an in-memory
    // toArray.sortBy here would re-introduce the reference's OOM
    // ceiling that the scaladoc above claims to remove).
    result.rdd
      .map(kv => ((Fnv1a.hash(kv.key) % nReduce, kv.key), kv.value))
      .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nReduce
        override def getPartition(key: Any): Int = key.asInstanceOf[(Int, String)]._1
      })
      .map { case ((_, key), value) => s"$key $value" }
      .saveAsTextFile(outDir)
    // Reference file-NAME parity: the reference names each reduce
    // output `mr-out-<r>` (mr/worker.go:60-61); Hadoop's committer
    // names the same bucket `part-0000r`. Rename after the commit —
    // driver-side, nReduce files, and ChecksumFileSystem moves the
    // .crc sibling along with each data file — so a directory diff
    // against a real MR run matches name-for-name, not just
    // byte-for-byte.
    (0 until nReduce).foreach { r =>
      val src = new org.apache.hadoop.fs.Path(path, f"part-$r%05d")
      if (fs.exists(src))
        fs.rename(src, new org.apache.hadoop.fs.Path(path, s"mr-out-$r"))
    }
  }

  /** Sequential-oracle twin of `mapReduce` (mirrors
    * `mr_sequential.go:41-89`): in-memory, single-threaded, sorted by
    * key. Used by differential tests exactly as `test-mr.sh:84-86` uses
    * the sequential binary.
    */
  def sequential(files: Seq[(String, String)], app: MrApp): Seq[KeyValue] = {
    val intermediate = files.flatMap { case (f, c) => app.map(f, c) }
    intermediate
      .groupBy(_.key)
      .toSeq
      .sortBy(_._1)
      .map { case (k, kvs) => KeyValue(k, app.reduce(k, kvs.map(_.value))) }
  }
}
