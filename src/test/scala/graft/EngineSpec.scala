package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Apps, Engine, KeyValue}
import graft.functions.Fnv1a

/** Differential tests for the generic MapReduce kernel, mirroring the
  * reference's test-mr.sh structure (SURVEY.md §5): distributed output
  * must equal the sequential oracle's, independent of partitioning.
  */
class EngineSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val gutenberg: Seq[(String, String)] =
    Files
      .list(Paths.get("/root/reference/inputs"))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.startsWith("pg-"))
      .map(p => p.toString -> new String(Files.readAllBytes(p), "UTF-8"))
      .toSeq
      .sortBy(_._1)

  private def runDistributed(app: engine.MrApp): Map[String, String] =
    Engine
      .run(spark, GutenbergGlob, app)
      .collect()
      .map(kv => kv.key -> kv.value)
      .toMap

  private def runOracle(app: engine.MrApp): Map[String, String] =
    Engine.sequential(gutenberg, app).map(kv => kv.key -> kv.value).toMap

  test("wc distributed == sequential oracle on the 9 Gutenberg texts") {
    val got = runDistributed(Apps.WordCount)
    val want = runOracle(Apps.WordCount)
    assert(got.size === want.size)
    assert(got === want)
    // spot-check a known token against independent counting
    val a = gutenberg.map(_._2.split("[^\\p{L}]+").count(_ == "the")).sum
    assert(got("the").toInt === a)
  }

  test("indexer distributed == sequential oracle (sorted doc lists)") {
    val got = runDistributed(Apps.Indexer)
    val want = runOracle(Apps.Indexer)
    assert(got === want)
    // posting lists are sorted + distinct (reference plugins/indexer.go:39)
    got.values.take(200).foreach { v =>
      val docs = v.split(" ", 2)(1).split(",").toSeq
      assert(docs == docs.sorted && docs.distinct.size == docs.size)
    }
  }

  test("partition invariance: shuffle parallelism 1 vs 10 gives identical results") {
    import spark.implicits._
    val input = spark.createDataset(gutenberg.take(4))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val r1 = Engine.mapReduce(spark, input, Apps.WordCount).collect().toSet
      spark.conf.set("spark.sql.shuffle.partitions", "10")
      val r10 = Engine.mapReduce(spark, input, Apps.WordCount).collect().toSet
      assert(r1 === r10)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("crash/nocrash data app matches oracle (P7/P8 shape)") {
    assert(runDistributed(Apps.CrashData) === runOracle(Apps.CrashData))
  }

  test("reducers are order-insensitive (reference values arrive unordered)") {
    val values = (1 to 50).map(_.toString)
    val shuffles = Seq(values, Random.shuffle(values), values.reverse)
    for (app <- Apps.registry.values; v <- shuffles)
      assert(app.reduce("k", v) === app.reduce("k", values))
  }

  test("writeText: lines land in the FNV-1a bucket file, sorted by key (F7 parity)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-out").toString
    val data = (1 to 40).map(i => KeyValue(s"key$i", i.toString))
    val nReduce = 3
    Engine.writeText(spark.createDataset(data), tmp, nReduce = nReduce)
    val byPart = Files
      .list(Paths.get(tmp))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.startsWith("mr-out-"))
      .map(p => p.getFileName.toString.drop(7).toInt -> Files.readAllLines(p).asScala.toSeq)
      .toMap
    // exact reference directory layout (mr/worker.go:60-61): every
    // bucket file named mr-out-<r>, r in [0, nReduce), plus _SUCCESS
    val names = Files.list(Paths.get(tmp)).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSet
    assert(names === (0 until nReduce).map(r => s"mr-out-$r").toSet + "_SUCCESS")
    // every key is in exactly the file its FNV-1a bucket names
    // (mr/worker.go:129 Ihash(key) % nReduce), sorted within the file
    val all = byPart.toSeq.flatMap { case (part, lines) =>
      val keys = lines.map(_.split(" ")(0))
      assert(keys === keys.sorted, s"part $part not key-sorted")
      keys.foreach(k => assert(Fnv1a.hash(k) % nReduce === part, s"$k in wrong bucket"))
      lines
    }
    assert(all.sorted === data.map(kv => s"${kv.key} ${kv.value}").sorted)
  }

  test("MrTextSource: round-trips the sink, prunes files on bucket pushdown, prunes columns") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-src").toString
    val data = (1 to 60).map(i => KeyValue(s"key$i", i.toString))
    val nReduce = 4
    Engine.writeText(spark.createDataset(data), tmp, nReduce = nReduce)
    val df = spark.read.format("graft.sources.MrTextSource").option("path", tmp).load()
    // full round-trip, bucket column correct
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.map(t => (t._2, t._3)).sorted === data.map(kv => (kv.key, kv.value)).sorted)
    rows.foreach { case (b, k, _) => assert(b === Fnv1a.hash(k) % nReduce) }
    // bucket pushdown prunes input partitions to exactly one file
    val one = df.filter($"bucket" === 2)
    assert(one.rdd.getNumPartitions === 1, "bucket filter must prune files, not just rows")
    assert(one.collect().forall(_.getInt(0) == 2))
    assert(one.count() === rows.count(_._1 == 2).toLong)
    val two = df.filter($"bucket".isin(1, 3))
    assert(two.rdd.getNumPartitions === 2)
    // the pushed filter is exact: no residual Filter node re-checks it
    assert(!one.queryExecution.executedPlan.toString.contains("Filter "),
      s"unexpected residual filter:\n${one.queryExecution.executedPlan}")
    // column pruning reaches the scan
    val pruned = df.select($"key").queryExecution.executedPlan
    val scanOut = pruned.collectLeaves().head.output.map(_.name)
    assert(scanOut === Seq("key"), s"scan must read only key, got $scanOut")
  }

  test("MrTextSource: contradictory bucket filters intersect to an empty scan") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-empty").toString
    val data = (1 to 20).map(i => KeyValue(s"key$i", i.toString))
    Engine.writeText(spark.createDataset(data), tmp, nReduce = 3)
    val df = spark.read.format("graft.sources.MrTextSource").option("path", tmp).load()
    val none = df.filter($"bucket" === 0 && $"bucket" === 2)
    assert(none.count() === 0L)
    // pruned at planning: no partitions at all, not 0 rows from N files
    assert(none.rdd.getNumPartitions === 0,
      "intersecting contradictory pushed filters must prune every file")
  }

  test("MrTextSource: runtime filtering (DSv2 DPP) prunes bucket FILES from join keys") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dpp").toString
    // pad values so the sink's REPORTED stats (real bytes, see the
    // statistics test) keep the fact side bigger than the dim — else
    // the planner broadcasts the fact itself and DPP has no probe side
    val data = (1 to 60).map(i => KeyValue(s"key$i", i.toString + ("v" * 4000)))
    val nReduce = 4
    Engine.writeText(spark.createDataset(data), tmp, nReduce = nReduce)
    val fact = spark.read.format("graft.sources.MrTextSource")
      .option("path", tmp).option("nreduce", nReduce.toString).load()
    // dim keys landing in a strict subset of the buckets
    val dimKeys = Seq("key7", "key13")
    val wantBuckets = dimKeys.map(k => Fnv1a.hash(k) % nReduce).toSet
    assert(wantBuckets.size < nReduce, "test needs keys covering a strict bucket subset")
    // the filter marks the build side selective (the DPP precondition);
    // parquet-backed so ConvertToLocalRelation cannot fold it away, and
    // a COMPARISON (not an equality, even negated — Spark's
    // CleanupDynamicPruningFilters collects nested EqualTo(attr,
    // literal) and drops DPP as "statically pruned")
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    dimKeys.toDF("key").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"key" > "")
    graft.sources.MrTextSource.lastRuntimePrune = None
    val joined = fact.join(dim, Seq("key"))
    val got = joined.select($"key", $"value").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === dimKeys.map(k => (k, k.stripPrefix("key") + ("v" * 4000))).toSet)
    val prune = graft.sources.MrTextSource.lastRuntimePrune
    assert(prune.exists { case (tot, kept) => tot == nReduce && kept == wantBuckets.size },
      s"runtime filter did not prune files (got $prune):\n${joined.queryExecution.executedPlan}")
    // a declared bucket count the layout contradicts fails loudly at
    // plan time — never a silent mis-prune
    val bad = spark.read.format("graft.sources.MrTextSource")
      .option("path", tmp).option("nreduce", "2").load()
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Throwable] { bad.collect() }
    assert(msgs(e).exists(_.contains("nreduce=2 contradicts")), s"unexpected: $e")
    // ... and the guard must validate the FULL layout: a static bucket
    // filter that happens to keep only files below the declared count
    // must NOT smuggle the lying modulus past the check (runtime key
    // pruning would map keys with it over the whole sink)
    val e2 = intercept[Throwable] { bad.filter($"bucket" === 1).collect() }
    assert(msgs(e2).exists(_.contains("nreduce=2 contradicts")), s"unexpected: $e2")
  }

  test("MrTextSource: reported statistics are real file bytes; small sink auto-broadcasts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stats").toString
    val data = (1 to 60).map(i => KeyValue(s"key$i", i.toString))
    Engine.writeText(spark.createDataset(data), tmp, nReduce = 4)
    val df = spark.read.format("graft.sources.MrTextSource").option("path", tmp).load()
    val want = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("mr-out-"))
      .map(_.length()).sum
    val full = df.queryExecution.optimizedPlan.collectLeaves().head.stats.sizeInBytes
    assert(full === BigInt(want), "stats must be the sink's actual bytes, not a default")
    // stats compose with pushed bucket pruning
    val pruned = df.filter($"bucket" === 2).queryExecution.optimizedPlan
      .collectLeaves().head.stats.sizeInBytes
    assert(pruned < full && pruned > 0)
    // real stats drive the broadcast decision WITHOUT a hint: the mr
    // sink is small, the parquet side big — planner must broadcast us
    val bigDir = Files.createTempDirectory("graft-stats-big").toString
    (1 to 20000).map(i => (s"key${i % 60 + 1}", "x" * 50)).toDF("key", "pad")
      .write.mode("overwrite").parquet(bigDir)
    val big = spark.read.parquet(bigDir)
    val joined = big.join(df.select($"key", $"value"), Seq("key"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE prints the plan twice
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    val broadcastSide = plan.split("BroadcastExchange")(1)
    assert(broadcastSide.contains("MrTextScan"),
      s"the small mr sink must be the broadcast side:\n$plan")
  }

  test("MrTextSource: MIN/MAX(key) push down to first/last-line reads via the sort invariant") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-agg").toString
    val data = (1 to 70).map(i => KeyValue(f"key$i%03d", i.toString))
    Engine.writeText(spark.createDataset(data), tmp, nReduce = 4)
    val df = spark.read.format("graft.sources.MrTextSource").option("path", tmp).load()
    val agg = df.agg(org.apache.spark.sql.functions.min($"key"), org.apache.spark.sql.functions.max($"key"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("MrTextAggScan"), s"aggregate not pushed:\n$plan")
    val r = agg.collect()(0)
    assert(r.getString(0) === "key001" && r.getString(1) === "key070")
    // composes with bucket file pruning
    val one = df.filter($"bucket" === 1)
      .agg(org.apache.spark.sql.functions.min($"key"), org.apache.spark.sql.functions.max($"key")).collect()(0)
    val keys = data.map(_.key).filter(k => Fnv1a.hash(k) % 4 === 1)
    assert(one.getString(0) === keys.min && one.getString(1) === keys.max)
  }

  test("MrTextSource write path: declared clustering+ordering reproduces Engine.writeText byte-for-byte") {
    import spark.implicits._
    val tmpA = Files.createTempDirectory("graft-wA").toString
    val tmpB = Files.createTempDirectory("graft-wB").toString
    val data = (1 to 80).map(i => KeyValue(s"key$i", i.toString))
    val nReduce = 16 // > distinct buckets hit, so empty-bucket files are exercised
    Engine.writeText(spark.createDataset(data), tmpA, nReduce = nReduce)
    graft.sources.MrTextSource.write(spark.createDataset(data), tmpB, nReduce = nReduce)
    def partFiles(dir: String): Map[String, Seq[String]] = Files
      .list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("mr-out-"))
      .filterNot(p => p.getFileName.toString.endsWith(".crc"))
      .map(p => p.getFileName.toString -> Files.readAllLines(p).asScala.toSeq)
      .toMap
    val a = partFiles(tmpA)
    val b = partFiles(tmpB)
    assert(b.keySet === a.keySet, "same file set, empty buckets included")
    a.foreach { case (f, lines) => assert(b(f) === lines, s"$f differs") }
    assert(Files.exists(Paths.get(tmpB, "_SUCCESS")))
    // and the DSv2 reader closes the loop on the DSv2-written layout
    val back = spark.read.format("graft.sources.MrTextSource").option("path", tmpB).load()
    assert(back.count() === data.length.toLong)
  }

  test("fnv1a matches the published FNV-1a 32-bit test vectors") {
    // public FNV-1a reference values (Noll's tables), masked & 0x7fffffff
    assert(Fnv1a.hash("") === (0x811c9dc5 & 0x7fffffff))
    assert(Fnv1a.hash("a") === (0xe40c292c & 0x7fffffff))
    assert(Fnv1a.hash("foobar") === (0xbf9cf968 & 0x7fffffff))
  }

  test("exactly-once map execution without failures (P5 jobcount analogue)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("mapCalls")
    val input = spark.createDataset(gutenberg)
    input
      .flatMap { case (f, c) => acc.add(1); Apps.FileCount.map(f, c) }
      .groupByKey(_.key)
      .count()
      .collect()
    assert(acc.value === gutenberg.size)
  }

  test("task retry recovers from a first-attempt crash (P7 crash analogue)") {
    import spark.implicits._
    val input = spark.createDataset(gutenberg)
    val result = input
      .repartition(4)
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected crash (attempt 0)")
        it
      }
      .flatMap { case (f, c) => Apps.WordCount.map(f, c) }
      .groupByKey(_.key)
      .mapGroups((k, rows) => KeyValue(k, Apps.WordCount.reduce(k, rows.map(_.value).toSeq)))
      .collect()
      .map(kv => kv.key -> kv.value)
      .toMap
    assert(result === runOracle(Apps.WordCount))
  }

  test("soak: randomized crash + stall injection on BOTH stages, repeated trials " +
    "(test-mr.sh random-worker loop + test-mr-many.sh analogue)") {
    // The reference soak (test-mr.sh:286-333) respawns randomly-dying
    // workers until the job drains, and its crash plugin also STALLS
    // (plugins/crash.go:29-34, sleep under the watcher's deadline);
    // test-mr-many.sh loops the whole suite to flush flakes. Analogue:
    // per trial, a seeded RNG picks map partitions AND reduce
    // partitions to kill on attempt 0 (maxFailures=2 retries them) or
    // to stall; every trial's output must equal the sequential oracle.
    val want = runOracle(Apps.WordCount)
    for (trial <- 1 to 3) {
      val seed = 0xC0FFEE + trial
      val faulty = new engine.MrApp {
        def map(file: String, contents: String): Seq[KeyValue] = {
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) {
            val rnd = new Random(seed * 1009L + tc.partitionId())
            if (tc.attemptNumber() == 0 && rnd.nextInt(100) < 40)
              throw new RuntimeException(s"injected map crash (trial $trial)")
            if (rnd.nextInt(100) < 40)
              Thread.sleep(50L + rnd.nextInt(200)) // stall under the retry deadline
          }
          Apps.WordCount.map(file, contents)
        }
        def reduce(key: String, values: Seq[String]): String = {
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) {
            // per-PARTITION decision (same for every key in the task),
            // so a doomed reduce task dies on its first key, once
            val rnd = new Random(seed * 2003L + tc.partitionId())
            if (tc.attemptNumber() == 0 && rnd.nextInt(100) < 30)
              throw new RuntimeException(s"injected reduce crash (trial $trial)")
            if (math.floorMod(key.hashCode, 97) == trial)
              Thread.sleep(30L) // sparse per-key stall
          }
          Apps.WordCount.reduce(key, values)
        }
      }
      val got = Engine
        .run(spark, GutenbergGlob, faulty)
        .collect()
        .map(kv => kv.key -> kv.value)
        .toMap
      assert(got === want, s"trial $trial diverged from the sequential oracle")
    }
  }

  test("output finality: commit marker exists before writeText returns (P6 analogue)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-final").toString
    Engine.writeText(spark.createDataset(Seq(KeyValue("k", "v"))), tmp, nReduce = 2)
    // Spark's output commit protocol writes _SUCCESS last; its presence
    // when the action returns is the reference's early-exit invariant
    // (`test-mr.sh:228-284`): no reader can observe a partial job.
    assert(Files.exists(Paths.get(tmp, "_SUCCESS")))
  }

  test("map parallelism: tasks genuinely overlap (P3 mtiming analogue)") {
    import spark.implicits._
    val spans = spark
      .createDataset(1 to 4)
      .repartition(4)
      .mapPartitions { it =>
        val start = System.nanoTime
        Thread.sleep(300)
        val end = System.nanoTime
        it.map(_ => (start, end))
      }
      .collect()
    val overlaps = spans.combinations(2).count { case Array((s1, e1), (s2, e2)) =>
      s1 < e2 && s2 < e1
    }
    assert(overlaps >= 1, "expected at least two concurrently-running map tasks")
  }

  test("reduce parallelism: post-shuffle tasks overlap (P4 rtiming analogue)") {
    // The reference asserts >= 2 concurrent REDUCERS (test-mr.sh:180-201,
    // plugins/rtiming.go:81-87); same span-overlap technique as the map
    // test, but the spans are recorded inside mapGroups — i.e. after the
    // shuffle, in reduce tasks — and overlap must cross task boundaries.
    import spark.implicits._
    // AQE would coalesce this deliberately-tiny probe shuffle into ONE
    // reduce task (correct at scale, but it's the very thing the probe
    // must not do); pin the partition count for the probe only.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val before = spark.conf.get(coalesceKey)
    val spans =
      try {
        spark.conf.set(coalesceKey, "false")
        spark
          .createDataset(1 to 64)
          .groupByKey(_ % 16)
          .mapGroups { (_, it) =>
            val start = System.nanoTime
            Thread.sleep(150)
            val end = System.nanoTime
            it.size // drain the group like a real reducer
            (org.apache.spark.TaskContext.get().partitionId(), start, end)
          }
          .collect()
      } finally spark.conf.set(coalesceKey, before)
    assert(spans.map(_._1).distinct.length >= 2, "groups all landed in one reduce task")
    val overlaps = spans.combinations(2).count { case Array((p1, s1, e1), (p2, s2, e2)) =>
      p1 != p2 && s1 < e2 && s2 < e1
    }
    assert(overlaps >= 1, "expected at least two concurrently-running reduce tasks")
  }

  test("dynamic plugin loading: class-name resolution binds the MrApp contract " +
    "(the plugin.Open/Lookup analogue)") {
    // a Scala object resolved by its runtime class name == the static
    // registry entry, end to end through the kernel
    val dynWc = graft.engine.Apps.loadDynamic("graft.engine.Apps$WordCount$")
    val files = Seq(("f1", "alpha beta alpha"), ("f2", "beta gamma"))
    val viaDynamic = graft.engine.Engine.sequential(files, dynWc)
    val viaRegistry = graft.engine.Engine.sequential(files, graft.engine.Apps.registry("wc"))
    assert(viaDynamic === viaRegistry)
    // a plain class with a no-arg constructor loads too
    val dynCls = graft.engine.Apps.loadDynamic("graft.DynamicClassApp")
    assert(dynCls.map("f", "x y").map(_.key) === Seq("f"))
    // lookup: registry name wins; unknown dotted names dlopen; junk fails loudly
    assert(graft.engine.Apps.lookup("wc") eq graft.engine.Apps.WordCount)
    intercept[ClassNotFoundException] {
      graft.engine.Apps.lookup("graft.engine.NoSuchPlugin")
    }
    intercept[IllegalArgumentException] {
      graft.engine.Apps.loadDynamic("java.lang.StringBuilder") // not an MrApp
    }
    // a PLAIN name missing from the registry is an unknown-app error,
    // never a reflection attempt (the dynamic path requires the
    // fully-qualified dotted shape)
    val typo = intercept[IllegalArgumentException] {
      graft.engine.Apps.lookup("wcc")
    }
    assert(typo.getMessage.contains("unknown app"))
  }

  test("mr_map SQL generator: equals the kernel transport, dynamic dotted names " +
    "load, junk and non-literal names fail at analysis") {
    // the gate query (SQL text end to end) == the kernel engine run
    val sqlForm = graft.operators.TextOps.wordCountViaSqlMap(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kernel = graft.operators.TextOps.wordCountViaKernel(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlForm === kernel)
    assert(sqlForm.nonEmpty)
    // the DYNAMIC path through SQL: a fully-qualified object name runs
    // the same plugin (wordCountViaSqlMap registered the input view)
    val viaDynamic = spark.sql(
      "SELECT key, count(*) AS cnt FROM (SELECT " +
        "mr_map('graft.engine.Apps$WordCount$', file, text) AS (key, value) " +
        "FROM graft_mr_input) GROUP BY key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDynamic === kernel)
    // an unknown app is an ANALYSIS error (bad .so at worker startup),
    // not a per-task error
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mr_map('no_such_app', file, text) AS (key, value) " +
        "FROM graft_mr_input")
    }
    assert(bad.getMessage.contains("unknown app"), bad.getMessage)
    // the app name must be a literal: it binds at plan time
    val nonLit = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mr_map(file, file, text) AS (key, value) " +
        "FROM graft_mr_input")
    }
    assert(nonLit.getMessage.contains("literal"), nonLit.getMessage)
  }
}

/** Test fixture for the dynamic-load path: a plugin CLASS (no-arg
  * constructor) that exists outside `Apps.registry`.
  */
class DynamicClassApp extends graft.engine.MrApp {
  def map(file: String, contents: String): Seq[graft.engine.KeyValue] =
    Seq(graft.engine.KeyValue(file, contents.length.toString))
  def reduce(key: String, values: Seq[String]): String = values.sorted.mkString(",")
}
