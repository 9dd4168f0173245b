package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Physical-plan audits: the properties that decide whether a query
  * that is correct at sf0.01 is still viable at 100 TB — filters
  * reaching the scan, scans reading only projected columns, partition
  * pruning on partitioned layouts, broadcast on fixed-size dims, top-k
  * planned without a global sort, aggregates inside whole-stage
  * codegen. Asserting them here turns "checked once with .explain"
  * into a regression gate.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestBase._

  private def planOf(df: DataFrame): String = {
    // collect() executes THIS DataFrame's QueryExecution (a write
    // would execute its own, separate one), so AQE finalizes the plan
    // and codegen stage markers `*(n)` appear in the rendering
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("projection pruning: a 2-column projection reads a 2-column schema") {
    val df = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"))
    assert(readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate"))
  }

  test("filter pushdown: scan-level predicates appear in PushedFilters") {
    val df = Tables.orders(spark, Sf0001).filter(col("o_custkey") < 100)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("LessThan(o_custkey,100)"), s"no pushdown in: $pushed")
  }

  test("partitioned layout: a partition-column filter prunes at planning time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, Sf0001)
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val df = spark.read.parquet(tmp).filter(col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"no partition filter in: $pf")
    // pruning is observable, not just annotated: only the lang=en
    // directory's files are planned
    val scanned = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scanned.contains("lang=de"))
    val n = df.count()
    val expected = Tables.documents(spark, Sf0001).filter(col("lang") === "en").count()
    assert(n === expected)
  }

  test("fixed-size dims broadcast; the fact side never builds a hash table of itself") {
    val plan = planOf(RelationalOps.regionRevenue(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"))
    // no shuffle-side join should have lineitem as the BUILD side;
    // cheap proxy: the plan contains no BroadcastNestedLoopJoin or
    // CartesianProduct anywhere
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("global top-k plans as TakeOrdered, never a global sort") {
    val plan = planOf(RelationalOps.topOrdersByPrice(spark, Sf0001))
    assert(plan.contains("TakeOrderedAndProject"))
    // the only Sort allowed is inside TakeOrdered's per-partition
    // limit; a standalone global Sort node would be the 100 TB killer
    assert(!plan.linesIterator.exists(l => l.trim.startsWith("+- Sort") && l.contains("global=true")))
  }

  test("scan-heavy aggregation runs inside whole-stage codegen") {
    val plan = planOf(RelationalOps.pricingSummary(spark, Sf0001))
    // `*(n)` prefixes mark operators fused into a whole-stage-codegen
    // stage; both HashAggregates (partial + final) must carry one
    assert(plan.linesIterator.count(l => l.contains("*(") && l.contains("HashAggregate")) >= 2,
      s"aggregates not codegen'd in: $plan")
    // an ObjectHashAggregate here would mean a non-codegen aggregate
    // slipped into the hottest scan path
    assert(!plan.contains("ObjectHashAggregate"))
  }

  test("LSH near-dup is equi-join only: no nested-loop pair scan survives") {
    // the RAW builder: the public accessor memoizes to a LogicalRDD
    val plan = planOf(SimilarityOps.embeddingNearDupBuild(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    val knn = planOf(SimilarityOps.knnJoinBuild(spark, Sf0001))
    assert(!knn.contains("BroadcastNestedLoopJoin"))
    assert(!knn.contains("CartesianProduct"))
  }

  test("binned range join is equi-join only") {
    val plan = planOf(EventOps.clicksBeforePurchase(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("Q19 derives per-side filters from the OR groups and pushes them to both scans") {
    val df = RelationalOps.disjunctivePredicateRevenue(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    // the disjunction references both sides, yet each scan still gets
    // its own side's OR-of-ranges pushed down
    assert(pushed.contains("p_brand"), s"no part-side pushdown in: $pushed")
    assert(pushed.contains("l_quantity"), s"no lineitem-side pushdown in: $pushed")
    assert(!plan.contains("CartesianProduct"))
  }

  test("Q4 EXISTS plans as a left-semi hash join on the equi key") {
    val plan = planOf(RelationalOps.latePriorityOrders(spark, Sf0001))
    assert(plan.contains("LeftSemi"), s"no semi join in: $plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("hybrid lexical arm: the df stopword screen sits in the plan before the score join") {
    val df = SimilarityOps.hybridLexArmBuild(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the screened term set is capped: a Filter on the aggregated df
    // column at the HybridDfCap literal, so candidate volume is
    // Σ_t min(df(t), cap) — one hot query term can no longer pull a
    // corpus-scale posting list through the join
    assert(
      plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains(s"<= ${SimilarityOps.HybridDfCap}")),
      s"no df cap filter in: $plan")
    assert(!plan.contains("CartesianProduct"))
    // (the one BroadcastNestedLoopJoin is the 1-row globals frame —
    // the accepted Q11/Q15 scalar-broadcast shape, not a pair loop)
    assert(plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1)
  }

  test("decontamination joins n-gram hashes with equi joins only") {
    val plan = planOf(DedupOps.decontaminate(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the join key is the 60-bit hash, not the shingle string
    assert(!plan.linesIterator.exists(l => l.contains("HashJoin") && l.contains("shingle")),
      "pair join keys on raw shingle strings")
  }

  test("Q6 pushes all three scan predicates into the lineitem scan") {
    val df = TpchOps.forecastRevenue(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate"), s"no shipdate pushdown in: $pushed")
    assert(pushed.contains("l_discount"), s"no discount pushdown in: $pushed")
    assert(pushed.contains("l_quantity"), s"no quantity pushdown in: $pushed")
  }

  test("Q15/Q11 global-scalar joins broadcast the one-row side, never a cartesian") {
    for (df <- Seq(TpchOps.topSupplier(spark, Sf0001), TpchOps.importantParts(spark, Sf0001))) {
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct"))
      // the scalar side is a 1-row broadcast; BroadcastNestedLoopJoin
      // over it is O(N) with no shuffle — the right plan here
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("Q2 per-part top-1 prunes via WindowGroupLimit before any join") {
    val plan = planOf(TpchOps.minCostSupplier(spark, Sf0001))
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in: $plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("semantic dedup pair join is an equi join on the cluster id, never a cartesian") {
    val plan = planOf(SimilarityOps.semanticDedup(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"))
    // the only nested-loop is the fixed-K seed broadcast inside the
    // assignment (K rows at any corpus size); the PAIR join itself
    // must hash on the cluster key
    assert(plan.linesIterator.exists(l => l.contains("Join") && l.contains("cluster")),
      s"no cluster-keyed join in: $plan")
  }

  test("correlated scalar subquery decorrelates to an aggregate join, no per-row rescans") {
    Tables.part(spark, Sf0001).createOrReplaceTempView("part_v")
    Tables.lineitem(spark, Sf0001).createOrReplaceTempView("lineitem_v")
    val df = spark.sql(
      """SELECT p_partkey,
        | (SELECT COUNT(*) FROM lineitem_v WHERE l_partkey = p_partkey) AS n_lines
        |FROM part_v""".stripMargin)
    val plan = planOf(df)
    // Catalyst rewrites the correlated subquery into agg + outer join:
    // running it per part row would be |part| scans of lineitem
    assert(!plan.contains("ScalarSubquery"), s"subquery survived decorrelation: $plan")
    assert(!plan.contains("CartesianProduct"))
    val expected = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_partkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === Tables.part(spark, Sf0001).count())
    got.foreach { case (k, n) => assert(n === expected.getOrElse(k, 0L)) }
  }

  test("runtime bloom filter prunes the fact scan from a selective dim filter") {
    // a selective filter on the build side injects a bloom-filter
    // predicate into the fact side's scan stage at runtime — at 100 TB
    // this is the difference between shuffling every fact row and
    // shuffling only rows that can possibly join. Thresholds are
    // lowered because the test tables are far below the 10 MB/10 GB
    // production defaults; broadcast is disabled because runtime
    // filters target shuffle joins (broadcast joins prune inline).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sup = Tables.supplier(spark, Sf0001).filter(col("s_nationkey") === 3)
      val df = Tables.lineitem(spark, Sf0001)
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n"))
      val plan = planOf(df)
      assert(plan.contains("might_contain"), s"no bloom filter injected: $plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("injected rule auto-broadcasts fixed dims even with size-based broadcast off") {
    // autoBroadcastJoinThreshold=-1 removes every size-based broadcast
    // decision, so a BroadcastHashJoin can only come from the
    // FixedDimBroadcastHint rule injected via GraftExtensions
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val withDim = Tables.supplier(spark, Sf0001)
        .join(Tables.nation(spark, Sf0001), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      assert(planOf(withDim).contains("BroadcastHashJoin"),
        "nation scan was not auto-hinted broadcast")
      // negative control: customer grows with the corpus — no auto
      // hint, so with thresholds off it must shuffle
      val withFact = Tables.orders(spark, Sf0001)
        .join(Tables.customer(spark, Sf0001), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      val factPlan = planOf(withFact)
      assert(!factPlan.contains("BroadcastHashJoin"), s"unexpected broadcast: $factPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("heavy hitters aggregates in one pass: partial and final sketch merge, no explode") {
    val df = graft.operators.TextOps.heavyHitters(spark, Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate partial +
    // final pair — the sketch IS the aggregation buffer
    assert(plan.linesIterator.count(l => l.contains("ObjectHashAggregate")) >= 2, plan)
  }

  test("interval-overlap join never plans a nested loop; PQ LUT and centroids broadcast") {
    val overlap = planOf(EventOps.concurrentSessions(spark, Sf0001))
    assert(!overlap.contains("BroadcastNestedLoopJoin") && !overlap.contains("CartesianProduct"),
      overlap)
    // the candidate join is an EQUI join on the bin key (broadcast at
    // this SF; shuffled-hash/SMJ at scale) — never a nested loop
    assert(overlap.contains("Join [bin"), overlap)
    val pq = planOf(SimilarityOps.pqAdcTopK(spark, Sf0001))
    // both the codebook and the ADC lookup table ride broadcasts —
    // the corpus side never shuffles to meet them
    assert(pq.linesIterator.count(_.contains("BroadcastExchange")) >= 2, pq)
    val outliers = planOf(SimilarityOps.centroidOutliers(spark, Sf0001))
    assert(outliers.contains("BroadcastExchange"), outliers) // labels-sized centroid join
    assert(outliers.contains("WindowGroupLimit"), outliers) // map-side partial top-3
  }

  test("native as-of join plans as AsOfJoinExec: one exchange per side, no range blowup") {
    val df = EventOps.purchaseAttributionAsOf(spark, Sf0001)
    // AQE renders Final + Initial; audit the final plan only (the
    // physical node prints as "AsOfJoin" — nodeName strips "Exec")
    val plan = planOf(df).split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin "), plan)
    // EnsureRequirements supplies exactly the two key exchanges the
    // declared ClusteredDistribution asks for (plus sorts), and the
    // time predicate never degenerates into a nested-loop range join
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(!plan.contains("SortMergeJoin"), plan) // OUR merge, not a rewritten equi-join
  }

  test("zorder layout: one exchange (the final agg); interleave stays in codegen") {
    val df = LayoutOps.zorderLayout(spark, Sf0001)
    val plan = planOf(df).split("== Initial Plan ==")(0)
    // map-side partial agg + one hash exchange on the bucket key: the
    // interleave itself adds NO shuffle
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1, plan)
    // zorder64 participates in whole-stage codegen (no CodegenFallback
    // marker on the projection that computes it)
    assert(!plan.contains("Fallback"), plan)
  }

  test("bloom prefilter sits before the decontamination join, equi joins only") {
    val plan = planOf(DedupOps.decontaminateBloom(spark, Sf0001))
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("curation ops: one-row globals broadcast, partial aggs map-side, probe filter pushed") {
    // mix_weights / dsir_importance re-join a one-row global via
    // BroadcastExchange (the Q11/Q15 scalar-threshold shape) — a
    // shuffled join against one row would be the 100 TB anti-pattern
    val mw = planOf(TextOps.mixWeights(spark, Sf0001))
    assert(mw.contains("BroadcastExchange") || mw.contains("BroadcastNestedLoopJoin"), mw)
    assert(!mw.contains("CartesianProduct") && !mw.contains("SortMergeJoin"))
    val ds = planOf(TextOps.dsirImportance(spark, Sf0001))
    assert(ds.contains("BroadcastExchange") || ds.contains("BroadcastNestedLoopJoin"), ds)
    // the bucket aggregate partially aggregates BEFORE its exchange:
    // the shuffle carries <= 64 rows per task, not the bigram stream
    assert(ds.contains("partial_sum") || ds.contains("partial_count"),
      "dsir bigram stream shuffles unaggregated")
    // compaction_plan / shuffle_shards: one hash-partition exchange each
    Seq(
      planOf(TextOps.compactionPlan(spark, Sf0001)),
      planOf(TextOps.shuffleShards(spark, Sf0001))
    ).foreach { full =>
      // AQE renders the plan twice (Final + Initial); count the final only
      val p = full.split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
    }
    // rp_project: probe filter reaches the parquet scan; the bounded
    // 45-pair combine may BNLJ but never a CartesianProduct
    val rp = planOf(SimilarityOps.rpProject(spark, Sf0001))
    assert(rp.contains("LessThan(vec_id,10)") || rp.contains("vec_id < 10"), rp)
    assert(!rp.contains("CartesianProduct"))
  }

  test("retrieval/robust-stats ops: top-k without global sort, no corpus-wide sorts") {
    // bm25 / value_outliers: LIMIT over ORDER BY must plan as
    // TakeOrdered (per-partition top-k + merge), never a global sort
    val bm = planOf(TextOps.bm25TopK(spark, Sf0001))
    assert(bm.contains("TakeOrderedAndProject"), bm)
    val vo = planOf(EventOps.valueOutliers(spark, Sf0001))
    assert(vo.contains("TakeOrderedAndProject"), vo)
    assert(vo.contains("BroadcastExchange"), "moments must broadcast, not shuffle-join")
    // winsorized_stats sorts only inside the per-type window over
    // DISTINCT BINS — a range-partitioned (global) sort of raw events
    // would be the 100 TB anti-pattern
    val ws = planOf(EventOps.winsorizedStats(spark, Sf0001))
    assert(!ws.contains("Exchange rangepartitioning"), ws)
    // table_checksum is scan -> partial agg -> one-row final per table:
    // mergeable folds need no hash-partitioned shuffle at all
    val tc = planOf(RelationalOps.tableChecksum(spark, Sf0001))
    assert(!tc.contains("Exchange hashpartitioning"), tc)
  }

  test("board-wide sweep: no query plans a CartesianProduct") {
    // The blanket version of the per-operator audits: every registered
    // query's physical plan, built against sf0.001, must be free of
    // true cartesian joins (1-row BroadcastNestedLoopJoin combines are
    // legitimate and excluded from this check — a CartesianProduct
    // node is never the plan you want at 100 TB).
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("metadata-only aggregates push into the parquet scan (DSv2)") {
    // At 100 TB a COUNT/MIN/MAX-only query should read footers, not
    // rows. The v1 path can't express it; the v2 reader pushes the
    // whole aggregate (plan shows PushedAggregation) when enabled.
    val prev = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = spark.read.parquet(s"$Sf001/orders.parquet")
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("lo"),
          max(col("o_orderkey")).as("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"), plan)
      val r = df.collect()(0)
      val exact = Tables.orders(spark, Sf001)
        .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey"))).collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
        ((exact.getLong(0), exact.getLong(1), exact.getLong(2))))
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.useV1SourceList", v)
        case None    => spark.conf.unset("spark.sql.sources.useV1SourceList")
      }
    }
  }

  test("matryoshka: one broadcast of queries, equi-join on width, no cartesian pair scan") {
    val plan = planOf(SimilarityOps.matryoshkaRecall(spark, Sf0001))
    // the q-side (queries x widths) broadcasts; the corpus never self-joins
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the scoring join is the equi form on the k width (plus the <> residual)
    assert(!plan.split("== Initial Plan ==")(0).contains("SortMergeJoin"), plan)
  }

  test("q17 decorrelates: per-part stats hash-agg + join back, no per-row rescan") {
    val plan = planOf(TpchOps.smallQtyRevenue(spark, Sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the exact-decimal threshold comparison must not block codegen of the final agg
    assert(plan.contains("HashAggregate"), plan)
  }

  test("tvd drift: corpus collapses to (type, bin) before any join; totals broadcast") {
    val plan = planOf(EventOps.tvdDrift(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("tvd drift: totals roll up from the bin counts — the (type, bin) shuffle is " +
    "computed once and AQE reuses the stage, not a second corpus aggregation") {
    val plan = planOf(EventOps.tvdDrift(spark, Sf0001))
    // binned feeds both the join input and the totals rollup; the shared
    // (event_type, vb) exchange must appear as a reused stage, so the big
    // events aggregation runs once however large the corpus is
    assert(plan.contains("reused") || plan.contains("ReusedExchange"), plan)
  }

  test("approx-distinct rewrite: off by default, opt-in swaps COUNT DISTINCT for HLL") {
    def q: DataFrame = Tables.events(spark, Sf001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
    val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!planOf(q).contains("approx_count_distinct"), "must stay exact by default")
    spark.conf.set("spark.graft.approxCountDistinct", "true")
    try {
      val plan = planOf(q)
      assert(plan.contains("approx_count_distinct"), plan)
      q.collect().foreach { r =>
        val (t, approx) = (r.getString(0), r.getLong(1))
        val rel = math.abs(approx - exact(t)).toDouble / exact(t)
        assert(rel < 0.10, s"$t: approx $approx vs exact ${exact(t)}")
      }
    } finally spark.conf.set("spark.graft.approxCountDistinct", "false")
  }

  test("ahash pairs and triangle census never plan a cartesian") {
    // the RAW builder: the public accessor memoizes, whose LogicalRDD
    // plan would make the no-cartesian assert vacuous
    val p1 = planOf(graft.sources.MultimodalOps.aHashPairsBuild(spark, Sf0001))
    assert(!p1.contains("BroadcastNestedLoopJoin") && !p1.contains("CartesianProduct"))
    val p2 = planOf(GraphOps.triangleStats(spark, Sf0001)).split("== Initial Plan ==")(0)
    assert(!p2.contains("CartesianProduct"))
    // edge/wedge joins must all be hash equi joins; the one allowed
    // nested loop is the final 1-row x 1-row census combine
    assert(p2.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p2)
  }

  test("hard negatives: per-query heap pruning, bounded broadcast, artifact consumers stay join-free") {
    val plan = planOf(SimilarityOps.hardNegatives(spark, Sf0001))
    // rank <= K over the per-query window must plan the group-limit
    // heap so map tasks keep K rows, not the scored corpus
    assert(plan.contains("WindowGroupLimit"), plan)
    // the one nested-loop is the deliberate 5-row query-slice broadcast
    // (label-inequality condition) — same shape as bruteForceTopK.
    // AQE renders Final + Initial plans; count the final only.
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, finalPlan)
    assert(!plan.contains("CartesianProduct"), plan)
    // hubness + leakage consume memoized artifacts: no corpus scan at all
    val hub = planOf(SimilarityOps.hubnessSkew(spark, Sf0001))
    assert(!hub.contains("SortMergeJoin"), hub)
  }

  test("weighted sample prunes to a 5-row heap per source (WindowGroupLimit)") {
    // rank <= K over a window must plan the group-limit pushdown: each
    // map task keeps a K-row heap per source and the shuffle carries
    // candidates, not the corpus — the difference between O(K·sources)
    // and O(N) shuffle rows at 100 TB.
    val plan = planOf(TextOps.weightedSample(spark, Sf0001))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ngram dup rate is pure scan->agg: no joins, no range partitioning") {
    val plan = planOf(DedupOps.ngramDupRate(spark, Sf0001))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("cdc chunks: doc-keyed window, no range partitioning, no cartesian") {
    // chunk assignment is the sessionize shape — one hash exchange on
    // doc_id; a rangepartitioning exchange would mean a global sort
    val plan = planOf(DedupOps.cdcChunks(spark, Sf0001))
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("padding waste and k-anonymity never global-sort the corpus") {
    // both are per-source/per-class shapes: hash-partitioned windows
    // and aggs only — a rangepartitioning exchange would mean a total
    // sort crept in
    val pw = planOf(TextOps.paddingWaste(spark, Sf0001))
    assert(!pw.contains("Exchange rangepartitioning"), pw)
    val ka = planOf(EventOps.kAnonymity(spark, Sf0001))
    assert(!ka.contains("Exchange rangepartitioning"), ka)
    assert(!ka.contains("Join"), ka)
  }

  /** Unwrap adaptive/stage/reuse wrappers to a FIXPOINT. The subtle
    * bug this replaces: unwrapping only the node the recursion
    * RECEIVES misses a wrapper that appears as the unwrap RESULT —
    * Spark 4.1 roots the final adaptive plan in a ResultQueryStage,
    * whose `children` is empty, so a single-step unwrap silently
    * swept one node and nothing below it (caught when a runtime
    * "No Partition Defined for Window" warning contradicted a green
    * sweep).
    */
  private def unwrapped(p: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    p match {
      case a: AdaptiveSparkPlanExec => unwrapped(a.executedPlan)
      case s: QueryStageExec => unwrapped(s.plan)
      case r: ReusedExchangeExec => unwrapped(r.child)
      case other => other
    }
  }

  /** Every WindowExec in the executed plan whose partitionSpec is
    * empty — the single-task global sort signature. Fixpoint-unwraps
    * AQE wrappers (see [[unwrapped]]) so materialized stages are
    * swept too.
    */
  private def globalWindowExecs(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    df.collect()
    def sweep(p: SparkPlan): Seq[String] = {
      val cur = unwrapped(p)
      val here = cur match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.simpleString(120))
        case _ => Nil
      }
      here ++ cur.children.flatMap(sweep)
    }
    sweep(df.queryExecution.executedPlan)
  }

  test("exact global NTILE/rank family: no partition-less WindowExec survives " +
    "(range-partitioned rank composition everywhere)") {
    // Each of these ranks a corpus-growing table (customers, orders,
    // docs, vocabulary). A Window.orderBy with no partitionBy plans as
    // ONE task sorting everything — the RankOps rewrite must keep every
    // window partitioned (by the range-partition id).
    val family: Seq[(String, DataFrame)] = Seq(
      "clv_deciles" -> RelationalOps.clvDeciles(spark, Sf0001),
      "equidepth_hist" -> RelationalOps.equidepthHist(spark, Sf0001),
      "zone_pruning" -> RelationalOps.zonePruning(spark, Sf0001),
      "rfm_segments" -> RelationalOps.rfmSegments(spark, Sf0001),
      "tier_migration" -> RelationalOps.tierMigration(spark, Sf0001),
      "vocab_growth" -> TextOps.vocabGrowth(spark, Sf0001),
      "vocab_nucleus" -> TextOps.vocabNucleus(spark, Sf0001),
      "sorted_neighborhood_pairs" -> DedupOps.sortedNeighborhood(spark, Sf0001)
    )
    val offenders = family.flatMap { case (name, df) =>
      val gw = globalWindowExecs(df)
      if (gw.nonEmpty) Some(s"$name: ${gw.mkString("; ")}") else None
    }
    assert(offenders.isEmpty, s"single-task global windows: $offenders")
  }

  test("column profile is two corpus scans (counts + distincts) with no Expand") {
    val plan = planOf(EventOps.columnProfile(spark, Sf0001))
    assert(!plan.contains("Expand"), s"multi-distinct Expand crept in: $plan")
    // the round-5 form paid one pruned scan per column (7 passes at
    // 100 TB); the round-6 form is exactly two reads — the full-width
    // counts pass and the stack-unpivoted distincts pass
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = "ReadSchema: struct<".r.findAllIn(finalPlan).size
    assert(scans == 2, s"expected 2 parquet scans, got $scans in: $finalPlan")
    // and the unpivot must be a stack Generate, never explode(array(..))
    // (InferFiltersFromGenerate would re-evaluate the array per row)
    assert(!finalPlan.contains("Generate explode"), finalPlan)
  }

  test("gram matrix: products born in the scan stage, one tiny exchange, no self-join") {
    val plan = planOf(SimilarityOps.gramMatrix(spark, Sf0001))
    // the old form co-partition-shuffled the exploded corpus twice for
    // a vec_id self-join; the outer_products expression leaves exactly
    // one hash exchange (the dims² final aggregate) + the broadcast
    // index table
    assert(plan.contains("outer_products"), s"expression not in plan: $plan")
    // AQE renders the plan twice (Final + Initial) — audit the final only
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles in: $finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"), "a corpus self-join survived")
  }

  test("gini: both global ranks are range-partitioned (no single-task window)") {
    val gw = globalWindowExecs(RelationalOps.giniInequality(spark, Sf0001))
    assert(gw.isEmpty, s"single-task global windows: $gw")
  }

  test("keyness: exactly the two bounded margins are broadcast-hinted; " +
    "the vocabulary-sized token-totals table is not") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    val plan = org.apache.spark.sql.GraftSqlShim
      .analyzedPlan(TextOps.keynessTerms(spark, Sf0001))
    val hints = plan.collect { case h: ResolvedHint => h }
    assert(hints.size == 2, s"expected langTotals + grand hints only, got ${hints.size}")
    // Only the TOPMOST aggregate drives the hinted side's output
    // cardinality (the vocabulary-sized (lang, token) aggregate sits
    // under both margins' re-aggregations by design).
    val tokenHinted = hints.exists(_.child.collectFirst { case a: Aggregate => a }.exists(
      _.groupingExpressions.exists(_.toString.contains("token"))))
    assert(!tokenHinted, "a vocabulary-keyed aggregate is broadcast-hinted")
  }

  test("board-wide sweep: NO query plans a partition-less window — single-task " +
    "sorts are extinct") {
    // The strongest form of the rank-family audit: across every
    // registered query's executed plan (including WindowGroupLimit
    // pre-pruning nodes), a Window with an empty partitionSpec — the
    // one-task-sorts-everything signature — appears nowhere. Global
    // rankings go through RankOps' range-partitioned composition;
    // global top-k plans as TakeOrdered; bounded bin tables aggregate
    // before any ordering.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def sweep(p: SparkPlan): Seq[String] = {
      val cur = unwrapped(p)
      val here = cur match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.simpleString(80))
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => Seq(w.simpleString(80))
        case _ => Nil
      }
      here ++ cur.children.flatMap(sweep)
    }
    // Partition-less windows whose INPUT is bounded by construction —
    // not by data volume — are allowed, each with its bound:
    //   hazard_table        running sum over t_days bins (time-bounded)
    //   hourly_spine_filled last-non-null carry over the hour spine
    //                       (grows with elapsed TIME, not data volume)
    //   keyset_page         row_number AFTER .limit(PageSize) — the
    //                       window input is one page
    //   quality_percentile  running sum over ≤5 quartile bins
    //   quantile_normalize  two windows over value-BAND bins (bounded
    //                       domain collapse before any ordering)
    //   rank_agreement      row_number per metric over |sources| rows
    //   skyline_orders      running max over one-champion-per-DAY rows
    //                       (time-bounded like the hour spine)
    //   sql_interface       SQL RANK over the |nations| aggregate
    // Everything else — corpus-, vocab-, or pair-scaled frames — must
    // go through RankOps / TakeOrdered. The second assert keeps the
    // allowlist minimal: an entry whose window disappears must be
    // removed, so the list can only shrink.
    val boundedFrameWindows = Set("hazard_table", "hourly_spine_filled", "keyset_page",
      "quality_percentile", "quantile_normalize", "rank_agreement", "skyline_orders",
      "sql_interface")
    val hitsByQuery = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, Sf0001)
      df.collect()
      val hits = sweep(df.queryExecution.executedPlan)
      if (hits.nonEmpty) Some(name -> hits) else None
    }.toMap
    val offenders = hitsByQuery.view.filterKeys(!boundedFrameWindows(_)).toMap
    assert(offenders.isEmpty,
      s"single-task windows outside the justified bounded-frame list: $offenders")
    assert(boundedFrameWindows.subsetOf(hitsByQuery.keySet),
      s"stale allowlist entries (window gone — remove them): " +
        s"${boundedFrameWindows -- hitsByQuery.keySet}")
  }

  test("board-wide sweep: no broadcast hint wraps an unaggregated corpus-scale scan") {
    // The returnLift class of bug: broadcast(part) is fine at sf0.1
    // and an executor OOM at 100 TB. A hint is legitimate only if the
    // hinted subtree bounds its cardinality (an Aggregate on a bounded
    // domain or a Limit) or scans only fixed-size dims (nation,
    // region). Vocabulary-sized aggregates need per-site judgment (see
    // the keyness test); this sweep catches the unbounded-RAW-scan
    // class mechanically for every registered query.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, ResolvedHint}
    val corpusTables =
      Seq("lineitem", "orders", "events", "documents", "embeddings",
        "part", "customer", "supplier")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = org.apache.spark.sql.GraftSqlShim.analyzedPlan(fn(spark, Sf0001))
      plan.collect {
        case h: ResolvedHint =>
          val bounded = h.child.exists {
            case _: Aggregate => true
            case _: GlobalLimit => true
            case _ => false
          }
          val corpusScan = h.child.collectLeaves().exists { leaf =>
            val s = leaf.toString.toLowerCase
            corpusTables.exists(t => s.contains(s"$t.parquet"))
          }
          if (corpusScan && !bounded) Some(name) else None
      }.flatten
    }.distinct
    assert(offenders.isEmpty, s"raw corpus-scan broadcast hints: $offenders")
  }

  test("round-7 continuation plan shapes: map-only gates shuffle nothing; small sides broadcast") {
    // mm_audio_vad is a pure per-row gate: the 100 TB contract is that
    // it fuses into the scan with NO exchange at all
    val vad = planOf(graft.sources.MultimodalOps.mmAudioVad(spark, Sf0001))
    assert(!vad.contains("Exchange"), s"vad gate shuffles:\n$vad")
    // proto_prune / silhouette: the K-bounded centroid/seed tables are
    // BROADCAST against the streamed corpus, never shuffled as a join
    // side; the per-cluster window is partitioned (board sweep) and no
    // pair scan degenerates to a nested loop
    Seq(
      "proto_prune" -> planOf(SimilarityOps.protoPrune(spark, Sf0001)),
      "silhouette_sheet" -> planOf(SimilarityOps.silhouetteSheet(spark, Sf0001))
    ).foreach { case (n, p) =>
      assert(p.contains("Broadcast"), s"$n: no broadcast side")
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian")
    }
    // top_ngram_mass: the gram count is map-side combined (partial
    // aggregation before its exchange) and the count keys are the
    // kernel's LONGs, not gram strings
    val tnm = TextOps.topNgramMass(spark, Sf0001)
    val tp = planOf(tnm)
    assert(tp.contains("partial_count") || tp.contains("partial count")
      || tp.contains("HashAggregate"), s"top_ngram_mass not partial-aggregated:\n$tp")
    assert(tp.contains("shingle_hashes"), "top_ngram_mass no longer uses the hash kernel")
    // span family consumers run the codegen kernel, not interpreted
    // HOF lambdas: the projection carrying span_corrupt must sit
    // inside a whole-stage-codegen span (the `*(n)` stage marker)
    val sc = planOf(TextOps.spanCorruption(spark, Sf0001))
    val kernelLine = sc.linesIterator.find(_.contains("span_corrupt(")).getOrElse("")
    assert(kernelLine.nonEmpty, "span_corruption lost the kernel")
    assert(kernelLine.trim.stripPrefix("+- ").startsWith("*("),
      s"span_corrupt projection not codegen: $kernelLine")
  }

  test("kneser-ney LM: totals broadcast, fp equi-join, c64 in codegen, no string corpus shuffle") {
    // the MODEL BUILD plan (the consumer reads the memoized artifact,
    // so the c64/broadcast shapes live in the build, not the scorer)
    val mp = planOf(TextOps.knModel(spark, Sf0001))
    // the 1-row t_types frame joins as a broadcast, never an exchange
    // of the model side against it
    assert(mp.contains("BroadcastNestedLoopJoin") || mp.contains("BroadcastExchange"),
      s"kn model totals not broadcast:\n$mp")
    assert(!mp.contains("CartesianProduct"), s"kn model plans a cartesian:\n$mp")
    // the integer log evaluates inside a whole-stage-codegen span —
    // c64_log2 is a defineCodeGen expression, not CodegenFallback
    val c64Line = mp.linesIterator.find(_.contains("c64_log2(")).getOrElse("")
    assert(c64Line.nonEmpty, "kn model lost the c64_log2 kernel")
    assert(c64Line.trim.stripPrefix("+- ").startsWith("*("),
      s"c64_log2 projection not codegen: $c64Line")
    // the scorer joins corpus bigrams to the (artifact) model on the
    // 60-bit fingerprint — an equi join, never a loop or cartesian
    val p = planOf(TextOps.knDocPpl(spark, Sf0001))
    assert(!p.contains("CartesianProduct"), s"kn_doc_ppl plans a cartesian:\n$p")
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("bg_fp")).toSeq
    assert(joinLines.nonEmpty, s"no fp equi-join in kn_doc_ppl:\n$p")
  }

  test("trigram KN: T2 broadcast, (v,w) equi-join, c64 codegen, fp-joined scorer") {
    val mp = planOf(TextOps.kn3Model(spark, Sf0001))
    // the 1-row continuation-type total joins as a broadcast
    assert(mp.contains("BroadcastNestedLoopJoin") || mp.contains("BroadcastExchange"),
      s"kn3 totals not broadcast:\n$mp")
    assert(!mp.contains("CartesianProduct"), s"kn3 model plans a cartesian:\n$mp")
    // the backoff hookup is a (v,w)-keyed equi join of two
    // TYPE-bounded frames — hash join, never a loop
    assert(mp.linesIterator.exists(l => l.contains("HashJoin") || l.contains("SortMergeJoin")),
      s"no equi join in kn3 model:\n$mp")
    val c64Line = mp.linesIterator.find(_.contains("c64_log2(")).getOrElse("")
    assert(c64Line.nonEmpty, "kn3 model lost the c64_log2 kernel")
    assert(c64Line.trim.stripPrefix("+- ").startsWith("*("),
      s"c64_log2 projection not codegen: $c64Line")
    val p = planOf(TextOps.kn3DocPpl(spark, Sf0001))
    assert(!p.contains("CartesianProduct"), s"kn3_doc_ppl plans a cartesian:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("tg_fp")),
      s"no fp equi-join in kn3_doc_ppl:\n$p")
  }

  test("order-5 KN: T1 broadcast, suffix equi-joins, c64 codegen, fp-joined scorer, " +
    "shrinking type tables") {
    val mp = planOf(TextOps.knNModel(spark, Sf0001, 5))
    // the 1-row T1 total joins as a broadcast
    assert(mp.contains("BroadcastNestedLoopJoin") || mp.contains("BroadcastExchange"),
      s"kn5 totals not broadcast:\n$mp")
    assert(!mp.contains("CartesianProduct"), s"kn5 model plans a cartesian:\n$mp")
    // every qp hookup (q3..q5) is a suffix-keyed equi join of two
    // TYPE-bounded frames — hash/merge joins, never a loop
    assert(mp.linesIterator.count(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin")) >= 3,
      s"missing suffix equi-joins in kn5 model:\n$mp")
    val c64Line = mp.linesIterator.find(_.contains("c64_log2(")).getOrElse("")
    assert(c64Line.nonEmpty, "kn5 model lost the c64_log2 kernel")
    assert(c64Line.trim.stripPrefix("+- ").startsWith("*("),
      s"c64_log2 projection not codegen: $c64Line")
    val p = planOf(TextOps.kn5DocPpl(spark, Sf0001))
    assert(!p.contains("CartesianProduct"), s"kn5_doc_ppl plans a cartesian:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("g_fp")),
      s"no fp equi-join in kn5_doc_ppl:\n$p")
  }

  test("dsir: lambda table broadcasts to the scorer; selection window is source-keyed") {
    val lp = planOf(TextOps.dsirLambdaBuild(spark, Sf0001))
    assert(!lp.contains("CartesianProduct"), s"dsir lambda plans a cartesian:\n$lp")
    // scoring joins the corpus gram stream to the 1024-row model as a
    // BROADCAST — the corpus side never shuffles for the model join
    val sp = planOf(TextOps.dsirDocScores(spark, Sf0001))
    assert(sp.contains("BroadcastHashJoin"), s"dsir scorer lost the broadcast join:\n$sp")
    assert(!sp.contains("CartesianProduct"))
    // the selection ranking is the grouped-RankOps composition: every
    // window is (_pid, _gk)-keyed — full partition parallelism — never
    // a bare source-keyed corpus sort (round-9 weak, closed round 10)
    val selp = planOf(TextOps.dsirSelect(spark, Sf0001))
    assert(selp.linesIterator.filter(_.contains("Window")).forall(_.contains("_pid")),
      s"dsir select ranking regressed to a #sources-wide window:\n$selp")
  }

  test("board-wide sweep: no corpus-scale frame ranks inside a bare source-keyed window") {
    // The round-9 finding class: `Window.partitionBy(source)` over a
    // corpus-scale frame is |sources| sort tasks — with ~6 sources at
    // 100 TB that is ~17 TB per task, 1/6th of a partition-less window,
    // not a scale-safe plan. Census: every WindowExec (and group-limit
    // node) whose partitionSpec references ONLY the `source` column —
    // grouped-RankOps windows carry `_pid` and drop out — is either
    //   (a) pre-pruned by a WindowGroupLimitExec somewhere below it
    //       (each map task keeps k rows per source before the shuffle,
    //       so the window input is k x sources x tasks, never the
    //       corpus), or
    //   (b) on the shrink-only allowlist of frames bounded by
    //       CONSTRUCTION (per-source aggregates and bin tables whose
    //       row count is |sources| x bins, independent of data volume).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def sourceOnly(spec: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      spec.nonEmpty && spec.forall(_.references.forall(_.name == "source"))
    def hasGroupLimitBelow(p: SparkPlan): Boolean = {
      val cur = unwrapped(p)
      cur.children.exists { c =>
        val cc = unwrapped(c)
        cc.isInstanceOf[WindowGroupLimitExec] || hasGroupLimitBelow(cc)
      }
    }
    def sweep(p: SparkPlan): Seq[String] = {
      val cur = unwrapped(p)
      val here = cur match {
        case w: WindowExec if sourceOnly(w.partitionSpec) && !hasGroupLimitBelow(w) =>
          Seq(w.simpleString(100))
        case _ => Nil
      }
      here ++ cur.children.flatMap(sweep)
    }
    //   classifier_auc  cumulative midrank over hashgramBins — the
    //                     corpus collapses to <= 257 clamped score bins
    //                     per source BEFORE the window (|sources| x 257
    //                     rows by construction, independent of volume)
    val boundedFrames: Set[String] = Set("classifier_auc")
    val hitsByQuery = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val hits = sweep(fn(spark, Sf0001).queryExecution.executedPlan)
      if (hits.nonEmpty) Some(name -> hits) else None
    }.toMap
    val offenders = hitsByQuery.view.filterKeys(!boundedFrames(_)).toMap
    assert(offenders.isEmpty,
      s"bare source-keyed windows over unbounded frames: $offenders")
    assert(boundedFrames.subsetOf(hitsByQuery.keySet),
      s"stale allowlist entries (window gone — remove them): " +
        s"${boundedFrames -- hitsByQuery.keySet}")
  }

  test("typo pairs: deletion-neighborhood candidates — no cartesian, no nested loop") {
    // The round-9 finding: the vocab x vocab crossJoin planned as a
    // BroadcastNestedLoopJoin at test SFs, so the CartesianProduct
    // sweep never saw it. The SymSpell rewrite must meet candidates on
    // the 60-bit deletion-key fingerprint — an equi join, and NEITHER
    // all-pairs node anywhere in the plan.
    val p = planOf(TextOps.typoPairs(spark, Sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"typo_pairs pair scan degenerated to all-pairs:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("k_fp")),
      s"no k_fp equi-join in typo_pairs:\n$p")
  }
}
