package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-memoized derived ARTIFACTS — expensive intermediates (the
  * MinHash near-dup pair graph, its connected-component labels, the
  * SimHash and aHash pair graphs) that many queries consume. Without
  * sharing, each of the ~11 cluster-family queries re-runs the full
  * LSH pipeline over the corpus: at 100 TB that is eleven redundant
  * corpus passes where one suffices. With sharing, the FIRST consumer
  * materializes the artifact and every later consumer reads the
  * pair-bounded result — the "materialize the dedup graph once per
  * ingest batch" pattern a real pipeline runs, expressed as a
  * session-scoped memo.
  *
  * Two materialization modes, selectable per artifact (explicit
  * `durable` argument) or session-wide (`spark.graft.artifacts
  * .durable=true`):
  *
  *  - EPHEMERAL (default): `localCheckpoint` — executor-local,
  *    UNREPLICATED blocks with truncated lineage. Fastest on a
  *    single-JVM bench, but on a real cluster one lost executor
  *    destroys the artifact with no recompute path (lineage is gone).
  *  - DURABLE: a staging parquet write under
  *    `spark.graft.artifacts.dir` (default: a per-application tmp
  *    dir), then read back. This is the intermediate-file
  *    materialization of the reference's mr framework
  *    (`mr/worker.go:104-120` writes map output to files exactly so a
  *    lost worker's partitions can be re-read, not re-mapped) at the
  *    same boundary: executor loss — or a full block sweep — costs
  *    nothing, because consumers re-scan the staged files. A repeated
  *    `memo` call after even a registry `clear()` RECOVERS from the
  *    staged files (`_SUCCESS`-gated) instead of re-running the
  *    build; `dropStaging()` is the explicit invalidation.
  *
  * Contract:
  *  - Keyed by (session instance, data dir, artifact name): different
  *    sessions / scale factors never share state. Entries hold a
  *    strong reference to their session (so an identity collision
  *    with a GC'd session is impossible) and every `memo` call first
  *    evicts entries whose SparkContext has stopped — a multi-session
  *    embedder cannot leak dead sessions' blocks.
  *  - Artifacts are PAIR-BOUNDED tables (near-dup pairs, cluster
  *    labels) — tiny relative to the corpus — so pinning (or staging)
  *    them for the session is cheap by design; nothing corpus-sized
  *    may be registered here.
  *  - Ephemeral artifacts' blocks are PINNED: `GraftSession
  *    .dropAllBlocks` (the bench's inter-query hygiene sweep) skips
  *    ids registered here, because a localCheckpointed RDD cannot
  *    recompute once its blocks are dropped. Durable artifacts need
  *    no pin — they have no blocks to lose.
  *  - Build cost is RECORDED per (dir, name): `buildSeconds` exposes
  *    the measured miss cost so Bench can report the most expensive
  *    pass the engine runs as its own line instead of letting
  *    min-of-N discard it.
  */
object Artifacts {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.catalyst.InternalRow

  private final case class Entry(
      session: SparkSession,
      df: DataFrame,
      pinnedRddId: Option[Int])

  private val cache = scala.collection.mutable.Map.empty[String, Entry]
  private val pinnedRdds = scala.collection.mutable.Map.empty[Int, RDD[InternalRow]]
  // (dir, name) -> seconds spent in the build (or staging write) on miss
  private val buildSecs = scala.collection.mutable.Map.empty[(String, String), Double]

  /** The PERSISTED rdd behind a localCheckpointed Dataset: its analyzed
    * plan is a LogicalRDD holding the checkpointed internal rows
    * (`df.rdd` would wrap it in a fresh, unpersisted deserializer RDD
    * whose id the block sweep never sees).
    */
  private def checkpointRdd(df: DataFrame): Option[RDD[InternalRow]] =
    org.apache.spark.sql.GraftSqlShim.analyzedPlan(df) match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Staging root for durable artifacts: conf-overridable, defaulting
    * to a per-APPLICATION tmp dir (two concurrent applications never
    * share staging; two sessions of one application do — they read
    * the same corpus, and the parquet result is deterministic).
    */
  private def stagingRoot(spark: SparkSession): String =
    spark.conf.get(
      "spark.graft.artifacts.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-artifacts-${spark.sparkContext.applicationId}")

  private def stagingPath(spark: SparkSession, dir: String, name: String): String =
    s"${stagingRoot(spark)}/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}/$name"

  private def evictStopped(): Unit = {
    val dead = cache.collect { case (k, e) if e.session.sparkContext.isStopped => k }
    dead.foreach { k =>
      cache.remove(k).flatMap(_.pinnedRddId).foreach(pinnedRdds.remove)
    }
  }

  /** Memoize `build` under (session, dir, name); first call runs the
    * job eagerly (localCheckpoint or staging write per `durable`),
    * later calls return the materialized frame. Synchronized on the
    * registry: concurrent first-callers of the same artifact would
    * otherwise run the build twice. That different artifacts' builders
    * also serialize is a deliberate simplicity trade — Verify/Bench
    * run queries sequentially, and a driver that DOES build artifacts
    * concurrently wants exactly one expensive job in flight anyway
    * (they contend for the same executors).
    *
    * @param durable Some(true/false) forces the mode for THIS
    *   artifact; None defers to `spark.graft.artifacts.durable`
    *   (default false — the single-JVM bench's fastest mode).
    */
  def memo(spark: SparkSession, dir: String, name: String, durable: Option[Boolean] = None)(
      build: => DataFrame): DataFrame =
    synchronized {
      evictStopped()
      // identityHashCode alone could collide after GC; the strong
      // session reference in Entry makes the (hash, eq) pair safe —
      // a live entry pins its session object, and stopped sessions
      // were just evicted.
      val key = s"${System.identityHashCode(spark)}|$dir|$name"
      cache.get(key).filter(_.session eq spark).map(_.df).getOrElse {
        val wantDurable = durable.getOrElse(
          spark.conf.get("spark.graft.artifacts.durable", "false").toBoolean)
        val entry =
          if (wantDurable) {
            val path = stagingPath(spark, dir, name)
            // Probe through the Hadoop FS API, not java.io.File: the
            // staging dir may be hdfs:///s3a:// on a real cluster, where
            // a local-File probe is always false — every memo call would
            // silently rebuild and the recovery guarantee is lost.
            val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
            val fs = success.getFileSystem(spark.sessionState.newHadoopConf())
            val staged =
              try fs.getFileStatus(success).isFile
              catch { case _: java.io.FileNotFoundException => false }
            if (!staged) { // miss: stage it (timed — the real build cost)
              val t0 = System.nanoTime()
              build.write.mode("overwrite").parquet(path)
              buildSecs((dir, name)) = (System.nanoTime() - t0) / 1e9
            } // else: RECOVERY — blocks/registry lost, staged files survive
            Entry(spark, spark.read.parquet(path), None)
          } else {
            val t0 = System.nanoTime()
            val df = build.localCheckpoint()
            buildSecs((dir, name)) = (System.nanoTime() - t0) / 1e9
            val id = checkpointRdd(df).map { r => pinnedRdds += (r.id -> r); r.id }
            Entry(spark, df, id)
          }
        cache(key) = entry
        entry.df
      }
    }

  /** Is this RDD id a pinned artifact? (Consulted by the block sweep.) */
  def isPinned(rddId: Int): Boolean = synchronized(pinnedRdds.contains(rddId))

  /** Measured build (or staging-write) seconds per artifact name for
    * one data dir — Bench emits these as `artifact:<name>` lines so
    * the workload's most expensive pass is visible instead of
    * vanishing into a min-of-N first run.
    */
  def buildSeconds(dir: String): Map[String, Double] = synchronized {
    buildSecs.collect { case ((d, n), s) if d == dir => n -> s }.toMap
  }

  /** Drop ONE memoized artifact (registry entry + pinned blocks) —
    * the targeted invalidation: the recovery spec uses it to simulate
    * losing the in-memory registry without touching other artifacts a
    * concurrently-running consumer may hold. Durable staged files
    * survive (recovery path); [[dropStaging]] removes those.
    */
  def drop(spark: SparkSession, dir: String, name: String): Unit = synchronized {
    val key = s"${System.identityHashCode(spark)}|$dir|$name"
    cache.remove(key).flatMap(_.pinnedRddId).foreach { id =>
      pinnedRdds.remove(id).foreach(_.unpersist(blocking = false))
    }
  }

  /** Drop every memoized artifact (tests / explicit teardown). Staged
    * durable files survive on purpose — that IS the recovery path; use
    * [[dropStaging]] to invalidate them.
    */
  def clear(): Unit = synchronized {
    pinnedRdds.values.foreach(_.unpersist(blocking = false))
    cache.clear()
    pinnedRdds.clear()
    buildSecs.clear()
  }

  /** Delete one artifact's staged files (or all of a dir's with
    * name=None): the explicit durable-mode invalidation for a changed
    * corpus.
    */
  def dropStaging(spark: SparkSession, dir: String, name: Option[String] = None): Unit = {
    // Same FS-API discipline as the _SUCCESS probe: a java.io recursive
    // delete is a silent no-op on hdfs:///s3a:// staging roots (and its
    // listFiles() returns null on I/O errors mid-walk).
    val root = new org.apache.hadoop.fs.Path(name match {
      case Some(n) => stagingPath(spark, dir, n)
      case None =>
        s"${stagingRoot(spark)}/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}"
    })
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.delete(root, true): Unit
  }
}
