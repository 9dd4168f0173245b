package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph operators. The one a dedup pipeline needs:
  * connected components over the near-dup pair graph, so each cluster
  * of mutual near-duplicates resolves to one canonical document.
  *
  * Label propagation (Pregel-style): every node starts labeled with
  * itself; each round takes the min of its own and its neighbors'
  * labels; converges in O(graph diameter) rounds. Each round is one
  * shuffle on the edge key — at 100 TB this is the standard
  * large-scale CC algorithm (the driver only coordinates rounds and
  * checks a scalar convergence count; no data is collected).
  * localCheckpoint truncates the per-round lineage so plans stay flat.
  */
object GraphOps {

  /** Edge-count threshold below which the component computation runs
    * as driver-side union-find: the near-dup pair graph is tiny
    * relative to the corpus (it IS the duplicates), and the iterative
    * distributed loop pays ~1 s of job-scheduling overhead per round.
    * Above the threshold the Pregel-style loop takes over.
    */
  val LocalCcMaxEdges = 2000000L

  /** Connected components of an undirected edge list (srcCol, dstCol
    * must be long columns). Returns (doc, label) with label = min
    * node id of the component. Chooses local union-find vs the
    * distributed label-propagation loop by edge count (identical
    * results: both converge to the min node id per component).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // Materialize the edge list before the size probe: an uncached
    // input would otherwise recompute its full upstream pipeline (e.g.
    // an entire MinHash LSH job) once for the count and again for the
    // chosen algorithm.
    val e = edges
      .select(col(srcCol).cast("long").as(srcCol), col(dstCol).cast("long").as(dstCol))
      .localCheckpoint()
    val n = e.count()
    if (n <= LocalCcMaxEdges) connectedComponentsLocal(e, srcCol, dstCol)
    else connectedComponentsDistributed(e, srcCol, dstCol)
  }

  /** Small-graph fast path: union-find on the driver (one collect of
    * the edge list — bounded by LocalCcMaxEdges).
    */
  private[graft] def connectedComponentsLocal(
      edges: DataFrame,
      srcCol: String,
      dstCol: String
  ): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    for ((a, b) <- es) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min id wins
    }
    val labels = parent.keys.toSeq.map(x => (x, find(x)))
    spark.createDataset(labels).toDF("doc", "label")
  }

  private[graft] def connectedComponentsDistributed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String
  ): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .cache()
    var labels = sym
      .select(col("a").as("doc"))
      .distinct()
      .withColumn("label", col("doc"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym
        .join(labels.select(col("doc").as("b"), col("label").as("nb_label")), Seq("b"))
        .groupBy(col("a").as("doc"))
        .agg(min(col("nb_label")).as("nmin"))
      val next = labels
        .join(nbrMin, Seq("doc"), "left")
        .select(col("doc"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next
        .join(labels.withColumnRenamed("label", "old"), Seq("doc"))
        .filter(col("label") =!= col("old"))
        .count()
      labels.unpersist() // release the previous round's checkpoint blocks
      labels = next
    }
    sym.unpersist()
    labels
  }

  /** Near-dup cluster resolution: connected components over the
    * MinHash near-dup pairs; canonical doc = min doc_id of the
    * cluster; singleton docs (no near-dups) are canonical by
    * definition and omitted here (the output covers only docs that
    * appear in some pair).
    */
  /** Quality-aware survivorship: within each near-dup cluster, keep
    * the highest-quality document (doc_id tiebreak) instead of the
    * naive min-id canonical — the policy real pipelines want, since
    * the canonical duplicate is often the worst OCR/boilerplate copy.
    * Pure composition of existing operators: cluster labels
    * (MinHash → LSH → verify → connected components) ⋈ quality
    * scores, then one row_number per cluster. The join and the window
    * both key on cluster/doc ids only — no text moves — so the extra
    * cost over dedupClusters is one broadcast-or-shuffle of 2-column
    * rows.
    */
  def clusterKeepers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = TextOps
      .qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    val w = Window
      .partitionBy(col("canonical_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    dedupClusters(spark, dir)
      .join(quality, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(
        col("doc_id"),
        col("canonical_id"),
        col("cluster_size"),
        col("quality"),
        col("keep")
      )
  }

  /** Memoized like the pair list itself ([[DedupOps.minhashLsh]]):
    * four gate queries consume the cluster table (clusters, keepers,
    * size hist, dup-by-source) — one CC run per (session, dir),
    * not four.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Artifacts.memo(spark, dir, "dedup_clusters")(dedupClustersBuild(spark, dir))

  private[graft] def dedupClustersBuild(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
    val comps = connectedComponents(pairs, "doc_a", "doc_b").localCheckpoint()
    val sizes = comps.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    comps
      .join(sizes, Seq("label"))
      .select(
        col("doc").as("doc_id"),
        col("label").as("canonical_id"),
        col("cluster_size"),
        (col("doc") === col("label")).as("is_canonical")
      )
  }

  val PagerankIters = 3
  val PagerankUnit = 1000000L // micro-rank fixed point
  val PagerankDampNum = 85L // damping 0.85 as an integer ratio
  val PagerankDampDen = 100L

  /** Fixed-iteration PageRank over the deterministic referral tree
    * (node = custkey, parent = custkey/2 — the same graph as
    * hier_rollup): the weighted-propagation twin of the
    * connected-components loop. Each round every node forwards 85% of
    * its rank to its parent and resets to the 15% teleport base —
    * out-degree is 1, so the transfer is the full damped mass.
    *
    * All arithmetic is integer (micro-rank units; the damped transfer
    * is (r·85) DIV 100 — floor division, positive operands, identical
    * in both engines), so three distributed rounds are bit-exact
    * against a 3-deep chained-CTE oracle. Node 1 has no parent: its
    * outbound mass exits the system (the standard dangling-mass model,
    * documented rather than redistributed).
    *
    * Scale shape: one equi-join + one aggregate per round, both on the
    * node key — the Pregel iteration pattern; per-round
    * localCheckpoint keeps the plan flat (same discipline as
    * connectedComponentsDistributed). The driver only loops; no data
    * leaves the cluster.
    */
  /** Triangle / wedge census of the near-dup pair graph — the graph
    * structure report that distinguishes "chains of borderline pairs"
    * from "tight duplicate cliques" (a high triangle-to-wedge ratio
    * means clusters are genuinely mutual, so picking one keeper per
    * cluster is safe; a low ratio warns the threshold is gluing
    * near-strangers through a middleman).
    *
    * Algorithm: ordered (oriented) counting — edges are kept as
    * a < b, wedges enumerated once as a < m < b paths, triangles =
    * wedges whose closing (a, b) edge exists. Every join is an equi
    * join on node ids; each triangle is counted exactly once, no
    * permutation blowup. At 100 TB the id orientation is replaced by
    * DEGREE orientation (orient each edge toward the higher-degree
    * endpoint) so a hub's wedge fan-out is bounded — same plan shape,
    * one extra degree join; noted here because the synthetic pair
    * graph has no hubs to demonstrate it on.
    */
  def triangleStats(spark: SparkSession, dir: String): DataFrame = {
    // a < b by construction in minhashLsh; the edge list feeds three
    // consumers (wedge sides + closing probe) — materialize once.
    val edges = DedupOps
      .minhashLsh(spark, dir) // memoized artifact: pinned pair-bounded blocks
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val wedges = edges
      .select(col("a"), col("b").as("m"))
      .join(edges.select(col("a").as("m"), col("b")), Seq("m"))
      .select(col("a"), col("b"))
    // wedge + triangle tallies in ONE pass: a left join marks each
    // wedge whose closing (a, b) edge exists, and a single aggregate
    // counts both — no separate semi-join pass over the wedge set
    val census = wedges
      .join(edges.withColumn("closing", lit(1)), Seq("a", "b"), "left")
      .agg(count(lit(1)).as("n_wedges"), count(col("closing")).as("n_triangles"))
    edges
      .agg(count(lit(1)).as("n_edges"))
      .crossJoin(census) // 1-row x 1-row combine
  }

  def pagerankReferral(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables
      .customer(spark, dir)
      .select(col("c_custkey").as("node"))
      .localCheckpoint()
    val edges = nodes
      .filter(col("node") > 1)
      .select(col("node"), expr("node DIV 2").as("parent"))
    var rank = nodes.select(col("node"), lit(PagerankUnit).as("r"))
    for (_ <- 1 to PagerankIters) {
      val inMass = rank
        .join(edges, Seq("node"))
        .select(col("parent").as("node"),
          expr(s"r * $PagerankDampNum DIV $PagerankDampDen").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_mass"))
      val teleport = PagerankUnit * (PagerankDampDen - PagerankDampNum) / PagerankDampDen
      rank = nodes
        .join(inMass, Seq("node"), "left")
        .select(col("node"), (lit(teleport) + coalesce(col("in_mass"), lit(0L))).as("r"))
        .localCheckpoint()
    }
    val nChildren = edges.groupBy(col("parent").as("node")).agg(count(lit(1)).as("n_children"))
    rank
      .join(nChildren, Seq("node"), "left")
      .select(
        col("node"),
        col("r").as("rank_q"),
        (col("r").cast("double") / PagerankUnit.toDouble).as("pr"),
        coalesce(col("n_children"), lit(0L)).as("n_children")
      )
  }

  /** Degree distribution of the near-dup pair graph in power-of-two
    * bands (the freq_spectrum band function on node degrees) — the
    * skew readout that decides whether the pair graph needs the
    * degree-orientation guard graph_triangles applies: a hub node in
    * band 10 means some template document matches ~1000 others and
    * every per-node expansion must be orientation-bounded.
    *
    * Scale: degrees are one aggregate over the (bounded) pair list;
    * the histogram collapses nodes to ≤ 64 bands.
    */
  def degreeHist(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
    val degrees = pairs
      .select(col("doc_a").as("doc"))
      .unionAll(pairs.select(col("doc_b").as("doc")))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("degree"))
    degrees
      .select(col("degree"), length(bin(col("degree"))).cast("long").as("band"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("degree")).as("sum_degree"),
        min(col("degree")).as("min_degree"),
        max(col("degree")).as("max_degree")
      )
  }

  /** Percolation sweep: the near-dup graph re-resolved at Jaccard
    * thresholds 0.7 / 0.8 / 0.9 — edges, nodes, component count and
    * giant-component size per threshold (permille-int keys). THE
    * dedup-tuning readout: a threshold where one giant component
    * swallows the corpus means the verify bar is too low (chains of
    * barely-similar docs all collapse to one canonical), while
    * components shattering to pairs means headroom to dedup harder.
    *
    * Scale: the pair list is computed once; each threshold filters it
    * (monotone shrinking edge sets) and resolves components on a
    * pair-bounded graph.
    */
  val PercolationThresholds = Seq(700L, 800L, 900L)

  def percolationSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps
      .minhashLsh(spark, dir) // memoized artifact: pinned pair-bounded blocks
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    PercolationThresholds
      .map { t =>
        val edges = pairs.filter(col("jaccard") >= t.toDouble / 1000.0)
        val comps = connectedComponents(edges, "doc_a", "doc_b")
        val sizes = comps.groupBy(col("label")).agg(count(lit(1)).as("sz"))
        val eCount = edges.agg(count(lit(1)).as("n_edges"))
        sizes
          .agg(
            count(lit(1)).as("n_components"),
            coalesce(sum(col("sz")), lit(0L)).as("n_nodes"),
            coalesce(max(col("sz")), lit(0L)).as("max_component")
          )
          .join(eCount)
          .select(
            lit(t).as("threshold_pm"),
            col("n_edges"),
            col("n_nodes"),
            col("n_components"),
            col("max_component")
          )
      }
      .reduce(_ unionAll _)
  }

  /** Per-cluster edge statistics: each near-dup cluster's verified
    * edge count, Jaccard bounds, and edge density (2E/(n(n−1)) as
    * floor-div ppm) — density 10⁶ means a clique (every member pairs
    * with every other: true mass duplication); low density means a
    * CHAIN (A≈B≈C but A≉C), where collapsing to one canonical doc is
    * lossy — the report that says which clusters to trust.
    *
    * Scale: edges and clusters are both pair-bounded; one equi join
    * maps edges to clusters (both endpoints share a component by
    * construction), one aggregate per cluster.
    */
  def clusterEdgeStats(spark: SparkSession, dir: String): DataFrame = {
    val edges = DedupOps
      .minhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val clusters = dedupClusters(spark, dir)
      .select(col("doc_id").as("doc_a"), col("canonical_id"), col("cluster_size"))
    edges
      .join(clusters, Seq("doc_a"))
      .groupBy(col("canonical_id"), col("cluster_size"))
      .agg(
        count(lit(1)).as("n_edges"),
        min(col("jaccard")).as("min_j"),
        max(col("jaccard")).as("max_j")
      )
      .select(
        col("canonical_id"),
        col("cluster_size"),
        col("n_edges"),
        col("min_j"),
        col("max_j"),
        expr("""CAST(CAST(n_edges AS DECIMAL(38,0)) * 2 * 1000000
               |     DIV (cluster_size * (cluster_size - 1)) AS BIGINT)""".stripMargin)
          .as("density_ppm")
      )
  }

  /** Near-dup cluster size distribution — the corpus duplication
    * profile ("how much of the data is 2×, 5×, 50× duplicated?") that
    * decides whether dedup is worth a full pass at all. Multi-doc
    * clusters come from dedupClusters; the size-1 row is the
    * complement count (docs in no near-dup pair), so the histogram's
    * n_docs column partitions the whole corpus.
    *
    * Scale: the cluster table is pair-bounded (tiny next to the
    * corpus); the histogram is one aggregate over it; the singleton
    * row is two scalar counts. Nothing new shuffles.
    */
  def clusterSizeHist(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(spark, dir) // memoized artifact
    val hist = clusters
      .groupBy(col("cluster_size"))
      .agg(
        countDistinct(col("canonical_id")).as("n_clusters"),
        count(lit(1)).as("n_docs")
      )
    val totals = Tables.documents(spark, dir).agg(count(lit(1)).as("n_total"))
    val singletons = totals
      .join(broadcast(clusters.agg(count(lit(1)).as("n_in"))))
      .select(
        lit(1L).as("cluster_size"),
        (col("n_total") - col("n_in")).as("n_clusters"),
        (col("n_total") - col("n_in")).as("n_docs")
      )
    hist
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"))
      .unionAll(singletons)
  }

  /** Duplication burden per source: how many of each source's docs
    * sit in a near-dup cluster (ppm) — the report that points the
    * dedup budget at the crawl segment producing the duplicates.
    * The cluster membership list is doc-unique, so the left join
    * cannot fan out; counts are exact integers, share is floor-div
    * ppm.
    *
    * Scale: one broadcast-sized membership list (pair-bounded)
    * against the doc directory, one (source) aggregate.
    */
  def dupBySource(spark: SparkSession, dir: String): DataFrame = {
    val clustered = dedupClusters(spark, dir)
      .select(col("doc_id"), lit(1L).as("in_dup"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(clustered, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("in_dup").isNotNull, 1L).otherwise(0L)).as("n_dup")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_dup"),
        expr("CAST(CAST(n_dup AS DECIMAL(38,0)) * 1000000 DIV (n_docs) AS BIGINT)").as("dup_ppm")
      )
  }

  val KCoreK = 2
  val KCoreRounds = 8

  /** k-core peeling of the near-dup pair graph (k=2): iteratively
    * drop nodes with fewer than k surviving partners until stable.
    * The 2-core is the "dense duplication backbone" — documents that
    * stay near-dup-linked even after their weakly-attached neighbors
    * leave; chains and pendant pairs dissolve, cliques survive. The
    * third iterative graph pattern next to label-propagation CC
    * (fixpoint labels) and PageRank (weighted mass): here the ITERATE
    * is set shrinkage, and the emitted value is the whole peeling
    * trajectory (round, nodes, edges) — the convergence curve IS the
    * report.
    *
    * Determinism contract: a FIXED `KCoreRounds` rounds, mirrored by
    * the oracle's unrolled CTEs — identical sets at every round even
    * if the peel converges earlier (the spec asserts it does, so the
    * final row is the true 2-core on this corpus). Per round: one
    * degree aggregate + two semi joins on node ids, the Pregel shape;
    * the driver sees two scalars per round (the trajectory row), data
    * never leaves the cluster. localCheckpoint flattens per-round
    * lineage (the CC/PageRank discipline).
    */
  def kcorePeel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var e = DedupOps
      .minhashLsh(spark, dir) // memoized artifact: pinned pair-bounded blocks
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val rows = Seq.newBuilder[(Long, Long, Long)]
    for (r <- 1 to KCoreRounds) {
      val kept = e
        .select(col("a").as("n"))
        .unionAll(e.select(col("b").as("n")))
        .groupBy(col("n"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KCoreK)
        .select(col("n"))
        .localCheckpoint()
      e = e
        .join(kept.withColumnRenamed("n", "a"), Seq("a"), "leftsemi")
        .join(kept.withColumnRenamed("n", "b"), Seq("b"), "leftsemi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      rows += ((r.toLong, kept.count(), e.count()))
    }
    rows.result().toDF("round", "n_nodes", "n_edges")
  }

  /** Hierarchy depth by POINTER DOUBLING — the recursive-CTE query
    * shape (org charts, referral chains, reply threads) the rest of
    * the board lacks, on a RANDOM RECURSIVE TREE over the customers:
    * parent(v) = 60-bit-md5(v) mod v, so depths are genuinely
    * data-dependent (expected ~2·ln n), unlike the analytic DIV-2
    * tree pagerank uses. Each doubling round rewrites every node's
    * (ancestor, distance) to (ancestor's ancestor, sum of distances),
    * so after k rounds every node ≤ 2^k deep has resolved to the
    * root: O(log depth) self-joins TOTAL, where the naive frontier
    * BFS — and a straight recursive CTE — does one join PER LEVEL.
    * That is the 100 TB story: a billion-node chain of depth 10⁴
    * resolves in 14 rounds, not 10⁴. 8 fixed rounds here cover depth
    * 256 ≫ the ~25 this tree can reach; the oracle is DuckDB's
    * actual WITH RECURSIVE, so the gate proves the doubling rewrite
    * equals the textbook recursion. Output: (depth, n_nodes)
    * histogram.
    */
  val DepthDoublingRounds = 8

  def referralDepth(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables
      .customer(spark, dir)
      .select(col("c_custkey").as("node"))
      .localCheckpoint()
    // parent(v) = h60(v) mod v < v, so 0 (the smallest custkey) is
    // the root and the parent order is well-founded
    val parent =
      expr("CAST(conv(substring(md5(CAST(node AS STRING)), 1, 15), 16, 10) AS BIGINT) % node")
    // state: (node, anc, d) with d = #edges from node to anc; root
    // fixed at (0, 0, 0) so resolved chains are absorbing
    var state = nodes
      .select(
        col("node"),
        when(col("node") === 0L, lit(0L)).otherwise(parent).as("anc"),
        when(col("node") === 0L, lit(0L)).otherwise(lit(1L)).as("d")
      )
      .localCheckpoint()
    for (_ <- 1 to DepthDoublingRounds) {
      val anc = state.select(col("node").as("anc"), col("anc").as("anc2"), col("d").as("d2"))
      state = state
        .join(anc, Seq("anc"))
        .select(col("node"), col("anc2").as("anc"), (col("d") + col("d2")).as("d"))
        .localCheckpoint()
    }
    state
      .groupBy(col("d").as("depth"))
      .agg(count(lit(1)).as("n_nodes"))
  }
}
