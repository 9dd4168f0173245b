package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-memoized derived ARTIFACTS — expensive intermediates (the
  * MinHash near-dup pair graph, its connected-component labels) that
  * many queries consume. Without sharing, each of the ~11 cluster-
  * family queries re-runs the full LSH pipeline over the corpus: at
  * 100 TB that is eleven redundant corpus passes where one suffices.
  * With sharing, the FIRST consumer materializes the artifact (a
  * `localCheckpoint`: executor-local blocks, truncated lineage) and
  * every later consumer reads the pair-bounded blocks — the
  * "materialize the dedup graph once per ingest batch" pattern a real
  * pipeline runs, expressed as a session-scoped memo.
  *
  * Contract:
  *  - Keyed by (session UUID, data dir, artifact name): different
  *    sessions / scale factors never share state.
  *  - Artifacts are PAIR-BOUNDED tables (near-dup pairs, cluster
  *    labels) — tiny relative to the corpus — so pinning them for the
  *    session is cheap by design; nothing corpus-sized may be
  *    registered here.
  *  - The memoized RDD's blocks are PINNED: `GraftSession
  *    .dropAllBlocks` (the bench's inter-query hygiene sweep) skips
  *    ids registered here, because a localCheckpointed RDD cannot
  *    recompute once its blocks are dropped (lineage is truncated).
  *  - On a real cluster the durable equivalent is a staging write
  *    (or `checkpoint()` / replicated persist) of the same artifact —
  *    localCheckpoint blocks are unreplicated; the memo boundary is
  *    exactly where that write would go.
  */
object Artifacts {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.catalyst.InternalRow

  private val cache = scala.collection.mutable.Map.empty[String, DataFrame]
  private val pinnedRdds = scala.collection.mutable.Map.empty[Int, RDD[InternalRow]]

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

  /** Memoize `build` under (session, dir, name); first call runs the
    * job eagerly (localCheckpoint), later calls return the
    * materialized frame. Synchronized on the registry: concurrent
    * first-callers of the same artifact would otherwise run the build
    * twice. That different artifacts' builders also serialize is a
    * deliberate simplicity trade — Verify/Bench run queries
    * sequentially, and a driver that DOES build artifacts
    * concurrently wants exactly one expensive job in flight anyway
    * (they contend for the same executors).
    */
  def memo(spark: SparkSession, dir: String, name: String)(build: => DataFrame): DataFrame =
    synchronized {
      // identityHashCode: one namespace per live session INSTANCE (the
      // abstract SparkSession API has no session UUID accessor).
      val key = s"${System.identityHashCode(spark)}|$dir|$name"
      cache.getOrElseUpdate(key, {
        val df = build.localCheckpoint()
        checkpointRdd(df).foreach(r => pinnedRdds += (r.id -> r))
        df
      })
    }

  /** Is this RDD id a pinned artifact? (Consulted by the block sweep.) */
  def isPinned(rddId: Int): Boolean = synchronized(pinnedRdds.contains(rddId))

  /** Drop every memoized artifact (tests / explicit teardown). */
  def clear(): Unit = synchronized {
    pinnedRdds.values.foreach(_.unpersist(blocking = false))
    cache.clear()
    pinnedRdds.clear()
  }
}
