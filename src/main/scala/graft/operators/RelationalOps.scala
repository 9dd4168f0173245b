package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator suite over the TPC-H-ish star schema
  * (TESTDATA.md). The reference has no join/window/limit operators at
  * all (SURVEY.md §2C) — this layer supplies the standard relational
  * algebra a user of any analytics engine expects, expressed
  * declaratively so Catalyst plans them (broadcast vs shuffle join,
  * partial aggregation, pushdown).
  *
  * Determinism discipline (DuckDB oracle hash-parity): cross-row
  * floating-point sums are order-dependent, and both engines aggregate
  * in nondeterministic parallel order — so every SUM/AVG of a double
  * goes through DECIMAL(38,10) (exact, order-independent) and is cast
  * back to double at the end. Per-row double arithmetic is IEEE-exact
  * in both engines and needs no such care.
  */
object RelationalOps {

  /** Order-independent exact sum of a double column (see class doc). */
  def xsum(c: Column): Column = sum(c.cast(DecimalType(38, 10))).cast("double")

  /** Order-independent exact avg: decimal sum / count, divided as double. */
  def xavg(c: Column): Column =
    (sum(c.cast(DecimalType(38, 10))).cast("double") / count(c))

  /** TPC-H Q1-style pricing summary: scan-heavy partial+final hash
    * aggregation; at 100 TB this is a pure map-side-combine plan — one
    * shuffle of 6 groups.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        xsum(col("l_quantity")).as("sum_qty"),
        xsum(col("l_extendedprice")).as("sum_base_price"),
        xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        xavg(col("l_quantity")).as("avg_qty"),
        xavg(col("l_extendedprice")).as("avg_price"),
        xavg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
  }

  /** TPC-H Q3-style shipping-priority top-k: selective dim filter →
    * fact join → agg → top-k. customer grows with the corpus, so it
    * carries NO broadcast hint: AQE broadcasts it while the filtered
    * side fits (it does at every test SF) and falls back to a shuffle
    * join at cluster scale — a hard hint here would force an OOM-sized
    * broadcast at 100 TB. orders⋈lineitem is the real shuffle and
    * co-partitions on orderkey.
    */
  def revenueTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(
        col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        col("revenue")
      )
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier revenue by nation: 5-way star join.
    * nation/region are FIXED-size dims (25/5 rows at any corpus size)
    * → hinted broadcast, always correct. customer/supplier grow with
    * the corpus → no hint; AQE broadcasts them while they fit and
    * degrades to shuffle joins at cluster scale instead of OOM-ing.
    * lineitem is the only pass over big data either way.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_regionkey") <= 2)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      // TPC-H Q5's "local supplier" condition: supplier and customer in
      // the same nation.
      .filter(col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Left-semi join (EXISTS): orders having at least one high-quantity
    * line. Semi joins ship only the join key — at scale, prefer them
    * over join+distinct.
    */
  def ordersWithBigLines(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 45.0)
    Tables
      .orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), xsum(col("o_totalprice")).as("sum_price"))
  }

  /** TPC-H Q4-shape: orders with at least one line shipped more than
    * 60 days after the order date, counted per priority. The EXISTS
    * subquery is a left-semi join with a non-equi residual
    * (ship > order + 60d) evaluated on the joined row — the semi join
    * still hashes on the equi key only, so the shuffle carries keys,
    * not a range-join blowup. Epoch-integer date arithmetic keeps the
    * comparison engine-exact.
    */
  def latePriorityOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), unix_timestamp(col("l_shipdate")).as("ship_s"))
    Tables
      .orders(spark, dir)
      .join(
        li,
        col("o_orderkey") === col("l_orderkey") &&
          col("ship_s") > unix_timestamp(col("o_orderdate")) + lit(60L * 86400L),
        "left_semi"
      )
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
  }

  /** TPC-H Q19-shape: revenue under three OR'd (brand, size, quantity)
    * predicate groups. The disjunction references both sides, but each
    * disjunct constrains part attributes, so Catalyst derives an
    * IN-brand filter it pushes into the part scan; the join itself
    * stays a plain equi hash join on partkey with the residual OR
    * evaluated post-join — no cross product.
    */
  def disjunctivePredicateRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables
      .part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val joined = Tables
      .lineitem(spark, dir)
      .join(pt, col("l_partkey") === col("p_partkey"))
    val hit =
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 20.0)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10.0, 30.0)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20.0, 40.0))
    joined
      .filter(hit)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")
      )
  }

  /** TPC-H Q16-shape: distinct suppliers per (brand, size) excluding a
    * NOT-IN supplier denylist. The denylist is a broadcast anti join on
    * the fact side BEFORE the part join, so disqualified rows never
    * reach the wider join; count-distinct is Spark's two-phase
    * (partial-distinct, final) expand — no row explosion.
    */
  def supplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables
      .supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    val pt = Tables
      .part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q22-shape: wealthy customers (balance above the positive-
    * balance average) who never ordered, counted per nation. The
    * average is an uncorrelated scalar subquery — one tiny broadcast
    * row — and the no-orders test is a left-anti join on the order
    * keys only (recent orders — the TPC-H "no orders at all" form is
    * vacuous on this corpus, where every customer has ordered at some
    * point). Exact-parity note: the threshold is a decimal-exact sum
    * divided once, so both engines compare against the identical
    * double.
    */
  def wealthyIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgPos = cust
      .filter(col("c_acctbal") > 0.0)
      .agg(xavg(col("c_acctbal")).as("avg_bal"))
    val ord = Tables
      .orders(spark, dir)
      .filter(col("o_orderdate") >= lit(IdleCutoff).cast("timestamp"))
      .select(col("o_custkey"))
    cust
      .join(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("numcust"),
        xsum(col("c_acctbal")).as("totacctbal")
      )
  }

  /** TPC-H Q21-shape: suppliers that were the SOLE late supplier in a
    * multi-supplier order. The textbook form is a correlated
    * EXISTS (another supplier in the order) AND NOT EXISTS (another
    * LATE supplier) — two extra correlated passes over lineitem. Both
    * collapse into one per-order aggregate: distinct-supplier count
    * ≥ 2 and distinct-LATE-supplier count = 1, and since exactly one
    * supplier is late, `max(case when late then suppkey end)` IS that
    * supplier. One lineitem⋈orders shuffle on orderkey + one per-order
    * agg + one tiny regroup by suppkey — no second or third scan of
    * the fact table, which is the difference between one pass and
    * three at 100 TB. Late = shipped > 60 days after order date
    * (epoch-integer arithmetic, engine-exact; same rule as Q4).
    *
    * Both distinct counts are over the same column, so instead of the
    * planner's multi-distinct Expand (which triples every fact row
    * before the shuffle) this dedups (orderkey, suppkey) first and
    * counts plainly on top. One explicit hash(orderkey) exchange
    * feeds BOTH group-bys — HashPartitioning(orderkey) satisfies the
    * (orderkey, suppkey) clustering too — so the whole query is a
    * single full-width shuffle plus the few-row regroup by supplier.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), unix_timestamp(col("l_shipdate")).as("ship_s"))
    val ord = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("ord_s"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("ship_s") > col("ord_s") + lit(60L * 86400L), 1L).otherwise(0L)).as("late"))
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("late")).as("n_late"),
        max(when(col("late") === 1L, col("l_suppkey"))).as("late_suppkey")
      )
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("late_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q13-shape: how many customers placed exactly k orders
    * (k = 0 included — the left outer join keeps orderless customers,
    * which an inner join would silently drop). Non-urgent orders only,
    * so the distribution is not just "all orders". Two aggregations:
    * per-customer count (shuffle on custkey — high cardinality,
    * scales out), then the tiny histogram regroup on the count value.
    * This agg-of-agg + outer-join histogram is the canonical
    * "distribution of activity" report shape.
    */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables
      .orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables
      .customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      // count(o_orderkey) counts non-null rows only: customers whose
      // every order was filtered away (or who never ordered) score 0
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q18-shape: large-quantity orders — the "IN (aggregated
    * HAVING subquery)" pattern. The textbook form filters orders by
    * membership in a grouped-HAVING subquery and then re-aggregates
    * lineitem for the report; both collapse into ONE per-order
    * aggregate that serves as filter (HAVING) and report column
    * (total_qty) — a second pass over the fact table would double the
    * dominant scan at 100 TB. The qualifying set is tiny (selective
    * HAVING), so AQE broadcasts it to orders and customer joins stay
    * on the slim side.
    */
  val BigOrderQty = 250.0

  def largeQuantityOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(xsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > BigOrderQty)
    Tables
      .orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"),
        col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        col("o_totalprice"),
        col("total_qty")
      )
  }

  /** TPC-H Q20-shape: suppliers shipping an outsized share of a part —
    * the nested "share of a correlated total" subquery family. Per
    * (part, supplier) quantity vs the part's total collapses into one
    * aggregate plus windows over the same partitioning: an explicit
    * hash(partkey) exchange feeds the (part, supplier) group-by AND
    * both per-part windows, so the fact table is scanned and shuffled
    * once. "Excess" = more than 2× the part's fair (equal-split)
    * share. Quantities have ≤ 2 decimals, so round(qty·100) BIGINTs
    * make every sum/compare integer-exact on both engines; only the
    * reported share ratio goes through (one) double division.
    */
  def excessShareSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        col("l_suppkey"),
        round(col("l_quantity") * 100.0).cast("bigint").as("q100")
      )
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("q100")).as("sq100"))
    val w = Window.partitionBy(col("l_partkey"))
    per
      .withColumn("tot100", sum(col("sq100")).over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .filter(col("sq100") * col("nsupp") > col("tot100") * 2)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(
        count(lit(1)).as("n_excess_parts"),
        max(col("sq100").cast("double") / col("tot100").cast("double")).as("max_share")
      )
  }

  /** Hierarchical rollup via WITH RECURSIVE (Spark 4's recursive CTE
    * surface — the org-chart / category-tree aggregation shape).
    * Customers form a deterministic binary referral tree (parent =
    * id / 2); every customer is expanded to its ancestor chain and
    * the regroup by ancestor yields subtree sizes and balances. The
    * recursion is O(log N) self-join rounds and the expansion is
    * N·log N rows — viable when depth is bounded (true of real org
    * hierarchies); for unbounded-diameter graphs GraphOps'
    * label-propagation loop is the scale path, this is the SQL
    * surface. Output is cut to the tree's top (node < 64) to keep
    * the report the "management rollup" rather than a per-leaf dump.
    */
  def hierRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("hier_customer_v")
    spark.sql(
      """WITH RECURSIVE anc(node, c_acctbal) AS (
        |  SELECT c_custkey AS node, c_acctbal FROM hier_customer_v
        |  UNION ALL
        |  SELECT node DIV 2 AS node, c_acctbal FROM anc WHERE node > 1
        |)
        |SELECT node, COUNT(*) AS subtree_size,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS subtree_bal
        |FROM anc WHERE node < 64
        |GROUP BY node""".stripMargin)
  }

  /** Skew.saltedEquiJoin under the oracle gate: lineitem⋈supplier with
    * the fact side salted 16 ways — row-identical to the plain join
    * (which IS the oracle), while any hot supplier's rows spread
    * across 16 tasks. This is the hot-key insurance the 100 TB plan
    * keeps on the shelf; AQE skew-join covers SMJ, salting covers
    * broadcast/hash shapes AQE can't split.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = Tables
      .supplier(spark, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Skew
      .saltedEquiJoin(li, sup, "suppkey", saltBuckets = 16)
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")
      )
  }

  /** Skew.saltedSumByKey under the oracle gate: two-phase salted sum
    * of quantity per return flag. The value is decimal-cast BEFORE the
    * salted partial, so the two-phase fold is order-independent exact
    * and hashes against the plain-aggregation oracle.
    */
  def saltedFlagTotals(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast(DecimalType(38, 10)).as("qty"))
    Skew
      .saltedSumByKey(li, "l_returnflag", "qty", saltBuckets = 16)
      .select(
        col("l_returnflag"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("n")
      )
  }

  /** Data-quality audit: one row per check with violation and total
    * counts — the ingest gate a pipeline runs before anything
    * downstream trusts a batch. Value checks are conditional sums
    * inside each table's single scan (map-side combined); referential
    * checks are anti-join counts shipping keys only. Checks that
    * SHOULD be zero stay in the report — an audit that only lists
    * known-dirty columns can't catch a regression.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    def oneCheck(name: String, violations: Column, total: Column, df: DataFrame): DataFrame =
      df.agg(violations.as("n_violations"), total.as("n_total"))
        .select(lit(name).as("check"), col("n_violations"), col("n_total"))
    val cnt = count(lit(1))
    def nviol(cond: Column) = sum(when(cond, 1L).otherwise(0L))

    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val docs = Tables.documents(spark, dir)
    // referential checks: left join against the (unique) key set, a
    // null match is an orphan — keeps the true row total in the report
    val liRef = li
      .select(col("l_orderkey"))
      .join(
        ord.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"),
        "left"
      )
    val ordRef = ord
      .select(col("o_custkey"))
      .join(
        cust.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"),
        "left"
      )

    oneCheck("customer_negative_balance", nviol(col("c_acctbal") < 0.0), cnt, cust)
      .unionByName(oneCheck("supplier_negative_balance", nviol(col("s_acctbal") < 0.0), cnt, sup))
      .unionByName(oneCheck("lineitem_discount_range",
        nviol(col("l_discount") < 0.0 || col("l_discount") > 0.1), cnt, li))
      .unionByName(oneCheck("document_nchars_mismatch",
        nviol(col("n_chars") =!= length(col("text"))), cnt, docs))
      .unionByName(oneCheck("lineitem_orphan_order", nviol(col("o_orderkey").isNull), cnt, liRef))
      .unionByName(oneCheck("order_orphan_customer", nviol(col("c_custkey").isNull), cnt, ordRef))
  }

  /** Left-anti join (NOT EXISTS): customers with no orders since the
    * cutoff ("idle customers"). The date filter is pushed to the
    * orders scan before the anti join, so the build side carries only
    * the recent keys.
    */
  val IdleCutoff = "1998-06-01 00:00:00"

  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val recent = Tables
      .orders(spark, dir)
      .filter(col("o_orderdate") >= lit(IdleCutoff).cast("timestamp"))
    Tables
      .customer(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Window rank: top-3 parts per supplier by revenue — ONE shuffle.
    * The (suppkey, partkey) aggregation barely collapses lineitem
    * (almost every pair is distinct), so the naive plan pays two
    * near-identical exchanges: hash(s,p) for the agg, then hash(s) for
    * the window. Pre-partitioning on suppkey alone satisfies BOTH
    * distributions (hash(s) clusters every (s,p) group too), halving
    * the shuffled bytes; the rank+filter still prunes via
    * WindowGroupLimit before anything wide.
    */
  def top3PartsPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li
      .select(col("l_suppkey"), col("l_partkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_term"))
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(xsum(col("rev_term")).as("revenue"))
    val w = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("revenue").desc, col("l_partkey").asc)
    perPart
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("l_suppkey"), col("l_partkey"), col("revenue"), col("rnk").cast("bigint").as("rnk"))
  }

  /** Running total per customer (window cumulative sum). Frame-ordered
    * accumulation is sequential in both engines given a total order, so
    * the tiebreak on o_orderkey makes it hash-exact; the sum itself goes
    * through decimal for safety.
    */
  def customerRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        sum(col("o_totalprice").cast(DecimalType(38, 10))).over(w).cast("double").as("running_total")
      )
  }

  /** RANGE-frame window (vs customerRunningTotal's ROWS frame):
    * rolling 7-day spend per customer. A RANGE frame is defined by the
    * ORDER-BY VALUE interval, so it is inherently order-independent
    * within ties — with the decimal-exact sum the result is
    * deterministic with no tiebreak column needed. One shuffle on
    * custkey; frames are evaluated by a sliding aggregate over the
    * sorted partition, never a per-row rescan.
    */
  def rolling7dSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day"))
      .rangeBetween(-6, 0)
    Tables
      .orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        // DIV, not `/`: keeps the day arithmetic in exact integers
        expr("unix_timestamp(o_orderdate) DIV 86400").as("epoch_day"),
        col("o_totalprice")
      )
      .withColumn(
        "spend_7d",
        sum(col("o_totalprice").cast(DecimalType(38, 10))).over(w).cast("double")
      )
      .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"), col("spend_7d"))
  }

  /** Multiset set-op (EXCEPT ALL): per-order buyer keys of 1995 minus
    * those of 2000, duplicates significant — each 2000 order cancels
    * ONE 1995 order of the same customer. Planned as a single
    * count-difference aggregation (no row-by-row matching).
    */
  def exceptAllBuyers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def ordersIn(yr: Int): DataFrame =
      ord.filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
    ordersIn(1995)
      .exceptAll(ordersIn(2000))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_net_orders"))
  }

  /** Global top-k with deterministic tiebreak. At scale Spark plans
    * this as per-partition top-k + single-reduce merge (TakeOrdered),
    * never a global sort.
    */
  def topOrdersByPrice(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch")
      )
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** ROLLUP hierarchical aggregate (grouping-set expansion). */
  def rollupReturns(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), xsum(col("l_quantity")).as("sum_qty"))
  }

  /** Distinct aggregation: exact + approximate cardinalities per flag.
    * (approx via HLL is the 100 TB path; exact countDistinct forces an
    * expand+two-phase agg — both shown here, oracle checks the exact.)
    */
  def distinctParts(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows")
      )
  }

  /** Set operations: customers that bought in 1995 but never in 2000
    * (EXCEPT), via distinct custkey sets.
    */
  def setOpCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def buyersIn(yr: Int): DataFrame =
      ord
        .filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
        .distinct()
    buyersIn(1995).except(buyersIn(2000)).select(col("o_custkey"))
  }

  /** Per-supplier revenue statistics with EXACT stddev: variance from
    * decimal-exact moments (sum, sum of squares) so the result is
    * order-independent — stddev_samp over doubles is not
    * reproducible across engines, the moment formula is.
    */
  def supplierStats(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n"),
        xsum(col("l_extendedprice")).as("sum_price"),
        // scale 5, not 10: squares are ~1e10 and DuckDB's double->
        // decimal conversion is only exact while value*10^scale fits
        // in 2^53 (verified empirically; scale 10 garbles low digits)
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(38, 5)))
          .cast("double").as("sum_sq")
      )
      .withColumn("avg_price", col("sum_price") / col("n"))
      .withColumn(
        "stddev_price",
        when(col("n") > 1,
          sqrt((col("sum_sq") - col("sum_price") * col("sum_price") / col("n")) / (col("n") - 1)))
          .otherwise(lit(null).cast("double"))
      )
      .select(col("l_suppkey"), col("n"), col("sum_price"), col("avg_price"), col("stddev_price"))
  }

  /** Full outer join: high-balance customers vs high-balance suppliers
    * per nation — nations can be present on either side only.
    */
  def fullOuterNationBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 7500.0)
      .groupBy(col("c_nationkey").as("cn")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 7500.0)
      .groupBy(col("s_nationkey").as("sn")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("cn") === col("sn"), "full_outer")
      .select(
        coalesce(col("cn"), col("sn")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp")
      )
  }

  /** INTERSECT: customers who bought in both 1995 and 2000. */
  def loyalBuyers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def buyersIn(yr: Int): DataFrame =
      ord.filter(year(col("o_orderdate")) === yr).select(col("o_custkey")).distinct()
    buyersIn(1995).intersect(buyersIn(2000))
  }

  /** Sketch-based approximate statistics — the 100 TB form of
    * distinct_parts/value_quantiles (HLL + quantile sketch: one pass,
    * bounded memory, mergeable partials). Raw sketch VALUES are not
    * oracle-checkable (implementations differ per engine, and quantile-
    * summary compression depends on partial-merge order), so the query
    * emits accuracy CERTIFICATES instead: booleans asserting each
    * sketch landed within a generous multiple of its published error
    * bound of the exact answer, computed in the same pass. The DuckDB
    * oracle asserts the same claims as TRUE literals — the hash gate
    * then fails iff a sketch ever leaves its error envelope.
    *   - HLL (rsd 0.05 default): |approx−exact| ≤ 15% of exact (3σ);
    *   - approx_percentile (accuracy 2000, rank error ≤ N/2000 — a
    *     10x margin under the certificate's ±0.005, for a 5x smaller
    *     quantile summary than the 10000 default): the
    *     claim is checked in RANK space — the count of rows ≤ the
    *     returned value must put it within ±0.005 of the requested
    *     quantile (duplicate-safe: ≤-counts bound the rank from below,
    *     <-counts from above). Counting ranks is a codegen hash-agg;
    *     an exact percentile() check would build a per-group map of
    *     every distinct value — measured 5x the whole query's cost.
    */
  def approxStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    // Pass 1: the quantile sketch alone, its 3x2 values collected to
    // the driver (a BOUNDED collect — 6 doubles, the PCA/BPE
    // precedent) and re-injected as typed literals. Profiled shape
    // (r05, sf0.1): the old single cards aggregate with two exact
    // COUNT(DISTINCT)s planned a 3x Expand costing 1.4 s alone; and
    // running the rank-certificate join as a THIRD sequential pass
    // serialized everything. Splitting the exact distincts into their
    // own partial-aggregated paths (map-side combine collapses
    // (flag, key) early; no Expand) and hanging cards/ep/es off the
    // rank pass as BROADCAST FUTURES (they execute concurrently with
    // the main stream inside ONE action) took the query 1.62 -> 1.11 s.
    val p = li
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 2000)").as("arr"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
    def pctCol(i: Int): Column =
      p.foldLeft(lit(null).cast("double")) { case (acc, (k, v)) =>
        when(col("l_returnflag") === k, lit(v(i))).otherwise(acc)
      }
    // Pass 2: ONE action — the rank-certificate aggregate is the main
    // stream; approximate cards and the two exact distinct counts ride
    // as concurrent broadcast futures, each a plain partial-aggregated
    // shape (no Expand anywhere).
    val cards = li
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey")).as("asu"),
        count(lit(1)).as("n_rows")
      )
    val ep = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ep"))
    val es = li.select(col("l_returnflag"), col("l_suppkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("es"))
    li
      .withColumn("p50", pctCol(0))
      .withColumn("p95", pctCol(1))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("p95"), 1L).otherwise(0L)).as("le95"),
        sum(when(col("l_extendedprice") < col("p95"), 1L).otherwise(0L)).as("lt95")
      )
      .join(broadcast(cards), Seq("l_returnflag"))
      .join(broadcast(ep), Seq("l_returnflag"))
      .join(broadcast(es), Seq("l_returnflag"))
      .select(
        col("l_returnflag"),
        col("n_rows"),
        (abs(col("ap") - col("ep")) <= col("ep") * 0.15).as("parts_ok"),
        (abs(col("asu") - col("es")) <= col("es") * 0.15).as("supps_ok"),
        (col("le50") >= col("n") * 0.495 && col("lt50") <= col("n") * 0.505).as("p50_ok"),
        (col("le95") >= col("n") * 0.945 && col("lt95") <= col("n") * 0.955).as("p95_ok")
      )
  }


  /** Explicit GROUPING SETS (beyond rollup/cube's fixed expansions):
    * per-flag totals, per-status totals, and the grand total in ONE
    * pass — Expand multiplies each input row by the number of sets
    * before a single partial+final aggregation, so at 100 TB this is
    * one shuffle of (sets × groups) rows, not three separate scans.
    * grouping_id disambiguates the NULL-filled grouping columns.
    */
  def groupingSetsReturns(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus")
      )
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        xsum(col("l_quantity")).as("sum_qty")
      )
  }

  /** Exact median + mode per order status. Median = percentile 0.5
    * (interpolated — bit-identical to DuckDB quantile_cont, see
    * memory'd parity rules); mode = most frequent priority with a
    * deterministic min-value tiebreak, computed as count-rank — the
    * scalable mode shape (grouped count + per-group top-1 via
    * WindowGroupLimit, no per-group value collection).
    */
  def medianModeOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val med = ord
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        count(lit(1)).as("n_orders")
      )
    val w = Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("mode_count").desc, col("mode_priority").asc)
    val mode = ord
      .groupBy(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"))
      .agg(count(lit(1)).as("mode_count"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("o_orderstatus"), col("mode_priority"), col("mode_count"))
    med.join(mode, Seq("o_orderstatus"))
  }

  /** Correlated-style scalar-subquery shape: lines above their part's
    * average quantity (TPC-H Q17 flavor) — expressed as join against a
    * pre-aggregate, the scalable form. The pre-aggregate has one row
    * per distinct part, which grows with the corpus — no broadcast
    * hint; AQE broadcasts while it fits, else both sides shuffle on
    * partkey (co-partitioned, since the aggregate's own shuffle is on
    * the same key).
    */
  def aboveAvgLines(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val avgQty = li
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg(xavg(col("l_quantity")).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") > col("avg_qty") * 1.8)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), xsum(col("l_extendedprice")).as("sum_price"))
  }

  /** Exact Pearson correlation + OLS slope of quantity vs price per
    * return flag, from decimal-mediated moment sums. Built-in
    * `corr()` accumulates doubles in partition order (nondeterministic
    * across partitionings, and unmatchable against any oracle); here
    * the five moments are exact DECIMAL sums — quantity and price have
    * <= 2 decimals, so products fit DECIMAL(37,4) losslessly — and the
    * correlation is then one per-row IEEE expression over exact
    * inputs, identical on any engine and any partitioning. One
    * map-side-combined aggregate of 3 groups; scan-bound at 100 TB.
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast(DecimalType(18, 2))
    val p = col("l_extendedprice").cast(DecimalType(18, 2))
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("sum_q"),
        sum(p).cast("double").as("sum_p"),
        sum(q * p).cast("double").as("sum_qp"),
        sum(q * q).cast("double").as("sum_q2"),
        sum(p * p).cast("double").as("sum_p2")
      )
      .withColumn(
        "corr_qp",
        (col("n") * col("sum_qp") - col("sum_q") * col("sum_p")) /
          (sqrt(col("n") * col("sum_q2") - col("sum_q") * col("sum_q")) *
            sqrt(col("n") * col("sum_p2") - col("sum_p") * col("sum_p")))
      )
      .withColumn(
        "beta",
        (col("n") * col("sum_qp") - col("sum_q") * col("sum_p")) /
          (col("n") * col("sum_q2") - col("sum_q") * col("sum_q"))
      )
  }

  /** Distribution-rank window suite: quartile (ntile), percent_rank,
    * cume_dist, rank and dense_rank of every order within its priority
    * class. ntile's bucket assignment depends on ROW positions, so the
    * order-by carries a unique tiebreak (orderkey) — without it the
    * result would be nondeterministic under ties; rank/percent_rank/
    * cume_dist depend only on key values. One shuffle on the partition
    * key; each partition is sorted once and all five functions ride
    * the same sort.
    */
  def rankSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderpriority"),
        col("o_orderkey"),
        col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("dense_rnk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume")
      )
  }

  /** Fixed-width histogram of order totals: 10 buckets of 50k, top
    * bucket open-ended. The bucket id is derived per row (no
    * data-dependent min/max pre-pass), so the whole plan is one
    * map-side-combined aggregate of <= 10 groups — the cheapest
    * possible distribution profile at 100 TB.
    */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .orders(spark, dir)
      .select(
        least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L)).as("bucket"),
        col("o_totalprice")
      )
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        xsum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price")
      )
  }

  /** Boolean/conditional aggregate family (bool_and / bool_or /
    * count_if) — the predicate-profile shape of a data-quality
    * dashboard, one map-side-combined pass. Booleans aggregate as
    * AND/OR monoids, so partial aggregation is exact like any sum.
    */
  def flagProfile(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("bool_and(l_quantity > 0.0)").as("all_positive_qty"),
        expr("bool_or(l_discount > 0.08)").as("any_deep_discount"),
        expr("count_if(l_tax = 0.0)").as("n_tax_free"),
        expr("count_if(l_discount = 0.0)").as("n_undiscounted"),
        count(lit(1)).as("n")
      )
  }

  /** Navigation-window suite (lag/lead/first_value/last_value — the
    * rank-family twin of rankSuite): per customer order, days since the
    * previous order, days until the next, and the first/latest order
    * price in the customer's full history. All five functions ride ONE
    * (custkey)-partitioned sort — one shuffle, no self-joins; the
    * deterministic (epoch_day, o_orderkey) tiebreak makes lag/lead and
    * both frame endpoints exact. last_value needs the explicit
    * unbounded-following frame: the default frame ends at CURRENT ROW,
    * which would silently return each row's own price.
    */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day").asc, col("o_orderkey").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables
      .orders(spark, dir)
      .filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        expr("unix_timestamp(o_orderdate) DIV 86400").as("epoch_day"),
        col("o_totalprice")
      )
      .withColumn("idx", row_number().over(w).cast("bigint"))
      .withColumn("prev_gap_days", col("epoch_day") - lag(col("epoch_day"), 1).over(w))
      .withColumn("next_gap_days", lead(col("epoch_day"), 1).over(w) - col("epoch_day"))
      .withColumn("first_price", first(col("o_totalprice")).over(full))
      .withColumn("last_price", last(col("o_totalprice")).over(full))
  }

  /** Cross-engine table fingerprints: one row per table with n_rows, a
    * bit_xor fold of a 60-bit per-row hash, and an independent modular
    * sum — the "did the copy/migration corrupt anything" primitive run
    * after every bulk move. Both folds are commutative+associative, so
    * the result is partitioning- and order-independent on any engine,
    * and partial fingerprints of shards combine into the table's
    * (xor / modular add are mergeable) — at 100 TB each output file's
    * fingerprint folds into the catalog entry without re-reading.
    *
    * Row canonicalization: integers and strings cast to string,
    * timestamps as epoch microseconds, <= 2-decimal doubles as
    * round(x*100) fixed-point, long text via md5 — every piece
    * bit-stable across engines (no raw double formatting).
    * The whole query is three scan + partial-agg passes (one per
    * table) unioned — no shuffle wider than one row each.
    */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    def h(s: Column): Column =
      conv(substring(md5(s), 1, 15), 16, 10).cast("bigint")
    def one(name: String, df: DataFrame, canon: Column): DataFrame =
      df.select(h(canon).as("h"))
        .agg(
          count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_fp"),
          sum(col("h") % 1000000000L).as("sum_fp")
        )
        .select(lit(name).as("tbl"), col("n_rows"), col("xor_fp"), col("sum_fp"))
    val li = Tables.lineitem(spark, dir)
    val liCanon = concat_ws(
      "|",
      col("l_orderkey").cast("string"),
      col("l_partkey").cast("string"),
      col("l_suppkey").cast("string"),
      col("l_linenumber").cast("string"),
      round(col("l_quantity") * 100).cast("long").cast("string"),
      round(col("l_extendedprice") * 100).cast("long").cast("string"),
      round(col("l_discount") * 100).cast("long").cast("string"),
      round(col("l_tax") * 100).cast("long").cast("string"),
      col("l_returnflag"),
      col("l_linestatus"),
      unix_timestamp(col("l_shipdate")).cast("string")
    )
    val o = Tables.orders(spark, dir)
    val oCanon = concat_ws(
      "|",
      col("o_orderkey").cast("string"),
      col("o_custkey").cast("string"),
      col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").cast("string"),
      unix_timestamp(col("o_orderdate")).cast("string"),
      col("o_orderpriority")
    )
    val d = Tables.documents(spark, dir)
    val dCanon = concat_ws(
      "|",
      col("doc_id").cast("string"),
      md5(col("text")),
      col("lang"),
      col("source"),
      col("n_chars").cast("string")
    )
    one("lineitem", li, liCanon)
      .unionAll(one("orders", o, oCanon))
      .unionAll(one("documents", d, dCanon))
  }

  /** floor(log10(1 + 1/d) · 1e6) for d = 1..9 — Benford's law in ppm,
    * precomputed so neither engine evaluates a log at query time (the
    * constants are the single source for the operator AND the oracle).
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L
  )

  /** First-significant-digit profile of order totals vs Benford's law
    * — the fraud/synthetic-data screen (fabricated amounts flunk it,
    * organic ones don't). The digit comes from the decimal string of
    * the centi-unit price (leading digit is invariant under the ×100
    * shift), so no float log10 anywhere; observed shares are floor-div
    * ppm and the deviation is an exact integer difference against the
    * precomputed Benford table. One map-side-combined 9-group
    * aggregate + a 1-row broadcast total; scan-bound at 100 TB.
    */
  def benfordProfile(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables
      .orders(spark, dir)
      .select(
        expr(
          "CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
        ).as("digit")
      )
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val benford = coalesce(
      BenfordPpm.map { case (d, ppm) => when(col("digit") === d, lit(ppm)) }: _*
    )
    digits
      .join(broadcast(digits.agg(sum(col("n")).as("total"))))
      .select(
        col("digit"),
        col("n"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV (total) AS BIGINT)").as("observed_ppm"),
        benford.as("benford_ppm")
      )
      .withColumn("delta_ppm", col("observed_ppm") - col("benford_ppm"))
  }

  /** Brand × return-flag association lift: which brands come back.
    * The contingency table is kept exact by cross-multiplying to the
    * common denominator — delta_scaled = o·N − rowTotal·colTotal is an
    * exact integer whose sign/magnitude ranks the association without
    * a single float (the KS/ppm discipline applied to independence
    * testing); lift = o·N/(rowTotal·colTotal) is the one IEEE
    * division. Chi-square itself is deliberately not emitted: its
    * per-cell divisions don't share a denominator, so no exact form
    * exists.
    *
    * Scale: lineitem ⋈ part-brand on the part key (the part table
    * GROWS with the corpus — billions of rows at 100 TB — so it must
    * never carry a broadcast hint; the shuffle join on partkey is the
    * honest plan, and AQE may still broadcast it when the measured
    * size is small), one (brand, flag) aggregate, bounded marginals
    * broadcast back — scan-bound.
    */
  def returnLift(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables
      .lineitem(spark, dir)
      .join(
        Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey")
      )
      .groupBy(col("p_brand"), col("l_returnflag"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("p_brand")).agg(sum(col("o")).as("row_total"))
    val colT = cells.groupBy(col("l_returnflag")).agg(sum(col("o")).as("col_total"))
    cells
      .join(broadcast(rowT), Seq("p_brand"))
      .join(broadcast(colT), Seq("l_returnflag"))
      .join(broadcast(cells.agg(sum(col("o")).as("grand"))))
      .select(
        col("p_brand"),
        col("l_returnflag"),
        col("o"),
        col("row_total"),
        col("col_total"),
        (col("o").cast(DecimalType(19, 0)) * col("grand").cast(DecimalType(19, 0)) -
          col("row_total").cast(DecimalType(19, 0)) * col("col_total").cast(DecimalType(19, 0)))
          .cast("long").as("delta_scaled"),
        ((col("o").cast("double") * col("grand").cast("double")) /
          (col("row_total").cast("double") * col("col_total").cast("double"))).as("lift")
      )
  }

  /** Market-basket co-purchase mining: the top-20 part pairs that
    * appear in the same order more than independence predicts. Pair
    * counts come from an equi-self-join on l_orderkey (fan-out
    * bounded by lines-per-order², a per-order constant — never a
    * cartesian over the corpus); part frequencies broadcast back, and
    * the ranking key is the exact integer pair count with
    * deterministic (count desc, part_a, part_b) ties. Lift
    * (co·N_orders)/(f_a·f_b) is the one IEEE expression.
    */
  def copurchaseLift(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      // four consumers (pair join x2, freq, n_orders): materialize the
      // distinct once instead of re-running scan+shuffle per consumer
      .localCheckpoint()
    val pairs = lines
      .select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(
        lines.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey")
      )
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("co"))
    val freq = lines.groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
    val nOrders = lines.select(col("l_orderkey")).distinct().agg(count(lit(1)).as("n_orders"))
    pairs
      .join(freq.select(col("l_partkey").as("part_a"), col("f").as("f_a")), Seq("part_a"))
      .join(freq.select(col("l_partkey").as("part_b"), col("f").as("f_b")), Seq("part_b"))
      .join(broadcast(nOrders))
      .select(
        col("part_a"),
        col("part_b"),
        col("co"),
        col("f_a"),
        col("f_b"),
        ((col("co").cast("double") * col("n_orders").cast("double")) /
          (col("f_a").cast("double") * col("f_b").cast("double"))).as("lift")
      )
      .orderBy(col("co").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
  }

  /** Customer-lifetime-value deciles: per-customer exact order-total
    * sums, ranked into ten equal-population tiers (NTILE over the
    * strict (clv, custkey) order), per-tier bounds/mass/share — the
    * whale-curve report behind "top decile drives X% of revenue".
    * Aggregate-then-rank: the corpus collapses to one row per
    * customer BEFORE the sort, so the NTILE runs over customers, not
    * orders; all hashed columns are exact integers or floor-div ppm.
    */
  def clvDeciles(spark: SparkSession, dir: String): DataFrame = {
    val clv = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")).as("clv_c"),
        count(lit(1)).as("n_orders")
      )
    val tiers = RankOps
      .withGlobalNtile(clv, 10, "decile", Seq(col("clv_c").asc, col("o_custkey").asc))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        min(col("clv_c")).as("lo_c"),
        max(col("clv_c")).as("hi_c"),
        sum(col("clv_c")).as("mass_c")
      )
    tiers
      .join(broadcast(tiers.agg(sum(col("mass_c")).as("total_c"))))
      .select(
        col("decile").cast("long").as("decile"),
        col("n_customers"),
        col("n_orders"),
        col("lo_c"),
        col("hi_c"),
        col("mass_c"),
        expr("CAST(CAST(mass_c AS DECIMAL(38,0)) * 1000000 DIV (total_c) AS BIGINT)").as("mass_ppm")
      )
  }

  /** Equi-depth 10-bucket histogram of order totals — the optimizer's
    * selectivity-estimation structure (equal mass per bucket, unlike
    * the fixed-width price_histogram). NTILE over the deterministic
    * (centi-price, orderkey) total order assigns buckets; per-bucket
    * bounds/counts/exact sums fall out of one aggregate. All hashed
    * columns are integers.
    *
    * Scale: a global NTILE is a total sort — the operator states the
    * honest cost (one range-partitioned sort of the key column, the
    * same price Spark's own repartitionByRange pays); at 100 TB the
    * drop-in replacement is approx_percentile boundaries, same output
    * contract.
    */
  def equidepthHist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("price_c")
      )
    RankOps
      .withGlobalNtile(ord, 10, "bucket", Seq(col("price_c").asc, col("o_orderkey").asc))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("price_c")).as("lo_c"),
        max(col("price_c")).as("hi_c"),
        sum(col("price_c")).as("sum_c")
      )
      .withColumn("bucket", col("bucket").cast("long"))
  }

  /** Pareto skyline of orders on (earliest date, highest price): an
    * order survives iff no strictly-earlier day produced an equal-or
    * -higher price — the classic staircase query (best-deal-so-far,
    * efficient frontier) that naive MIN/MAX aggregation cannot answer.
    *
    * Two-step shape keeps it scale-safe: the per-day champion pass is
    * an ordinary day-partitioned row_number (corpus shuffles once on
    * day, ~date-range many groups), which collapses the input to one
    * row per distinct day BEFORE the global staircase window runs —
    * so the unpartitioned window sorts a date-range-bounded set
    * (thousands of rows at any corpus size), never the corpus. Price
    * comparisons are centi-unit integers end to end; ties on a day
    * resolve to the lowest orderkey, so the output is deterministic.
    */
  def skylineOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("price_c"),
        col("o_totalprice")
      )
    val wDay = Window
      .partitionBy(col("o_orderdate_epoch"))
      .orderBy(col("price_c").desc, col("o_orderkey").asc)
    val champs = ord
      .withColumn("rn", row_number().over(wDay))
      .filter(col("rn") === 1)
      .drop("rn")
    // one row per distinct day => ROWS and RANGE coincide; the frame
    // excludes the current day so equal-price later days are dominated
    val wRun = Window
      .orderBy(col("o_orderdate_epoch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    champs
      .withColumn("prev_max", max(col("price_c")).over(wRun))
      .filter(col("prev_max").isNull || col("price_c") > col("prev_max"))
      .select(
        col("o_orderdate_epoch"),
        col("o_orderkey"),
        col("o_totalprice"),
        col("price_c")
      )
  }

  /** CLV tier migration: every customer's spend quintile in the first
    * half of the order history crossed with their quintile in the
    * second — the upgrade/downgrade/churn matrix behind "are whales
    * staying whales". The halves split at the midpoint day (derived
    * from the data, broadcast as one row); tiers are strict-order
    * NTILE(5) per half (the rfm discipline); customers absent from a
    * half carry tier 0, so the matrix partitions ALL customers.
    *
    * Scale: two aggregate-then-rank passes over customer-level
    * tables and one full outer join on custkey.
    */
  def tierMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("unix_timestamp(o_orderdate) DIV 86400").as("day"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("price_c")
      )
    val mid = o.agg(expr("(MIN(day) + MAX(day) + 1) DIV 2").as("mid_day"))
    val halves = o.join(broadcast(mid))
    def tiers(half: DataFrame, keep: Column, tierName: String): DataFrame =
      half
        .filter(keep)
        .groupBy(col("o_custkey"))
        .agg(sum(col("price_c")).as("spend_c"))
        .transform(h =>
          RankOps.withGlobalNtile(h, 5, tierName,
            Seq(col("spend_c").asc, col("o_custkey").asc)))
        .select(col("o_custkey"), col(tierName))
    val h1 = tiers(halves, col("day") < col("mid_day"), "tier_h1")
    val h2 = tiers(halves, col("day") >= col("mid_day"), "tier_h2")
    h1.join(h2, Seq("o_custkey"), "full_outer")
      .groupBy(
        coalesce(col("tier_h1"), lit(0L)).as("tier_h1"),
        coalesce(col("tier_h2"), lit(0L)).as("tier_h2")
      )
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Keyset ("seek-method") pagination: page 3 (rows 41–60) of the
    * order book ordered by (price desc, key asc), fetched WITHOUT an
    * offset scan — the cursor is row 40's (price, key) and the page
    * is `WHERE (price, key) AFTER cursor ORDER BY … LIMIT 20`. The
    * oracle states the OFFSET form (ROW_NUMBER BETWEEN 41 AND 60), so
    * the hash gate is a cross-engine proof that seek ≡ offset on a
    * strict total order — the pagination contract every API relies
    * on. The row numbers attached to the page are the page-relative
    * ranks + 40.
    *
    * Scale: THE point of seek — the cursor filter pushes into the
    * scan (zone min/max prune everything above the cursor) and both
    * steps are TakeOrdered top-k; an OFFSET N scan reads and sorts N
    * rows forever deeper as N grows, seek stays O(page).
    */
  val PageSize = 20

  def keysetPage(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("price_c")
      )
    // row 40 = the tail of the top-40 under the page order
    val cursor = o
      .orderBy(col("price_c").desc, col("o_orderkey").asc)
      .limit(2 * PageSize)
      .orderBy(col("price_c").asc, col("o_orderkey").desc)
      .limit(1)
      .select(col("price_c").as("c_price"), col("o_orderkey").as("c_key"))
    val page = o
      .join(broadcast(cursor))
      .filter(
        col("price_c") < col("c_price") ||
          (col("price_c") === col("c_price") && col("o_orderkey") > col("c_key"))
      )
      .orderBy(col("price_c").desc, col("o_orderkey").asc)
      .limit(PageSize)
    page
      .withColumn(
        "rn",
        (row_number().over(
          Window.orderBy(col("price_c").desc, col("o_orderkey").asc)
        ) + 2 * PageSize).cast("long")
      )
      .select(col("o_orderkey"), col("price_c"), col("rn"))
  }

  /** Kaplan–Meier hazard table over inter-order gaps: each
    * consecutive-order gap is an EVENT observation (time = days to
    * the next order); each customer's tail (last order → corpus max
    * day) is a CENSORED observation — the survival-analysis "when do
    * customers come back" primitive behind churn models. One row per
    * distinct observed time: the at-risk count (obs with time ≥ t —
    * censoring at t counts as at-risk, the standard convention),
    * events and censorings at t, and the discrete hazard d/n as
    * floor-div ppm. Every column is an exact integer; the KM survival
    * product (a float chain) is deliberately left to the caller —
    * hazard steps are the mergeable, bit-stable core.
    *
    * Scale: one custkey shuffle for the lag, then the corpus
    * collapses to distinct gap values (day-granularity-bounded); the
    * reverse-cumulative at-risk sum runs over that bounded table via
    * an exclusive ascending frame; totals broadcast.
    */
  def hazardTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        expr("unix_timestamp(o_orderdate) DIV 86400").as("day")
      )
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day").asc, col("o_orderkey").asc)
    val maxDay = o.agg(max(col("day")).as("max_day"))
    val obs = o
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .join(broadcast(maxDay))
      .select(
        when(col("nxt").isNotNull, col("nxt") - col("day"))
          .otherwise(col("max_day") - col("day"))
          .as("t_days"),
        when(col("nxt").isNotNull, 1L).otherwise(0L).as("is_event")
      )
    val byT = obs
      .groupBy(col("t_days"))
      .agg(
        sum(col("is_event")).as("d_events"),
        sum(lit(1L) - col("is_event")).as("n_censored"),
        count(lit(1)).as("tot")
      )
    val total = obs.agg(count(lit(1)).as("n_total"))
    byT
      .withColumn(
        "before",
        coalesce(
          sum(col("tot")).over(
            Window.orderBy(col("t_days").asc).rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .join(broadcast(total))
      .select(
        col("t_days"),
        (col("n_total") - col("before")).as("n_risk"),
        col("d_events"),
        col("n_censored"),
        expr("CAST(CAST(d_events AS DECIMAL(38,0)) * 1000000 DIV ((n_total - before)) AS BIGINT)").as("hazard_ppm")
      )
  }

  /** Zone-map pruning report: the same 64-zone min/max footer stats a
    * columnar store keeps, computed under TWO physical layouts — the
    * natural key order and a price-clustered order — and evaluated
    * against a standing predicate (totalprice ≥ 450k, the top ~10%).
    * One row per layout: zones/rows the predicate must scan, as
    * exact counts and floor-div ppm. The point the report makes is
    * the zorder_layout lesson in numbers: on a random layout nearly
    * every zone contains one hot row (scan_ppm ≈ 10⁶), clustered
    * layout prunes ~90% — why OPTIMIZE/CLUSTER BY exists.
    *
    * Scale: each NTILE is one range-sort of a (key, price) pair
    * table — the same price the layout rewrite itself pays; stats
    * and the two summary rows are tiny aggregates. At 100 TB the
    * zone stats come free from parquet footers; this query IS the
    * planner's pruning estimate over them.
    */
  val ZoneCount = 64
  val ZoneScanThresholdC = 45000000L // $450k in centi-units

  def zonePruning(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("price_c")
      )
    def summarize(zoned: DataFrame, layout: String): DataFrame =
      zoned
        .groupBy(col("zone"))
        .agg(count(lit(1)).as("n_rows"), max(col("price_c")).as("max_c"))
        .agg(
          count(lit(1)).as("n_zones"),
          sum(when(col("max_c") >= ZoneScanThresholdC, 1L).otherwise(0L)).as("n_scanned_zones"),
          sum(when(col("max_c") >= ZoneScanThresholdC, col("n_rows")).otherwise(0L))
            .as("n_rows_scanned"),
          sum(col("n_rows")).as("n_rows")
        )
        .select(
          lit(layout).as("layout"),
          col("n_zones"),
          col("n_scanned_zones"),
          col("n_rows_scanned"),
          col("n_rows"),
          expr("CAST(CAST(n_rows_scanned AS DECIMAL(38,0)) * 1000000 DIV (n_rows) AS BIGINT)").as("scan_ppm")
        )
    val byKey = RankOps.withGlobalNtile(o, ZoneCount, "zone", Seq(col("o_orderkey").asc))
    val byPrice =
      RankOps.withGlobalNtile(o, ZoneCount, "zone", Seq(col("price_c").asc, col("o_orderkey").asc))
    summarize(byKey, "key_order").unionAll(summarize(byPrice, "price_order"))
  }

  /** RFM segmentation: every ordering customer scored into quintiles
    * on Recency (last order epoch), Frequency (order count) and
    * Monetary (exact centi-sum), then the 5×5×5 segment grid reported
    * with exact population and mass — the classic CRM targeting
    * cube. Tier 5 is best on every axis (latest / most / highest);
    * each NTILE runs over a strict (metric, custkey) order so ties
    * are deterministic.
    *
    * Scale: aggregate-then-rank (the clv_deciles discipline) — orders
    * collapse to one row per customer before any sort, so the three
    * NTILEs sort the customer-level table, never the order corpus;
    * the output is at most 125 cells. At 100 TB the NTILE sorts swap
    * for approx_percentile tier bounds, same output contract.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(unix_timestamp(col("o_orderdate"))).as("last_s"),
        count(lit(1)).as("freq"),
        sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")).as("mon_c")
      )
    val r = RankOps.withGlobalNtile(per, 5, "r_tier", Seq(col("last_s").asc, col("o_custkey").asc))
    val rf = RankOps.withGlobalNtile(r, 5, "f_tier", Seq(col("freq").asc, col("o_custkey").asc))
    RankOps
      .withGlobalNtile(rf, 5, "m_tier", Seq(col("mon_c").asc, col("o_custkey").asc))
      .groupBy(col("r_tier"), col("f_tier"), col("m_tier"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("freq")).as("n_orders"),
        sum(col("mon_c")).as("mass_c")
      )
      .select(
        col("r_tier").cast("long").as("r_tier"),
        col("f_tier").cast("long").as("f_tier"),
        col("m_tier").cast("long").as("m_tier"),
        col("n_customers"),
        col("n_orders"),
        col("mass_c")
      )
  }

  /** The textual-SQL front door: ONE ANSI SQL string executed verbatim
    * by `spark.sql` over temp views here AND by DuckDB as its own
    * oracle — the strongest possible interface-parity statement (the
    * oracle isn't a translation, it is byte-for-byte the same query).
    * Every dialect-sensitive spot is pinned: counts are BIGINT in both
    * engines, RANK() is CAST (Spark yields INT, DuckDB BIGINT), no
    * float crosses the boundary. Catalyst plans it like any DataFrame
    * query — broadcast dim join, partial+final agg, one window.
    */
  val SqlInterfaceText: String =
    """WITH co AS (
      | SELECT n_name, c_custkey
      | FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |agg AS (
      | SELECT n_name,
      |  COUNT(DISTINCT co.c_custkey) AS n_customers,
      |  COUNT(o.o_orderkey) AS n_orders
      | FROM co LEFT JOIN orders o ON co.c_custkey = o.o_custkey
      | GROUP BY n_name)
      |SELECT n_name, n_customers, n_orders,
      | CAST(RANK() OVER (ORDER BY n_orders DESC, n_name ASC) AS BIGINT) AS rnk
      |FROM agg""".stripMargin

  def sqlInterface(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(SqlInterfaceText)
  }

  /** Exact Gini coefficient of two corpus-scale distributions —
    * customer spend (who concentrates revenue) and token frequency
    * (how skewed the training vocabulary is; a near-1 token Gini
    * means a few types dominate the corpus and dedup/mix decisions
    * move real mass). Formula: with x ranked ascending and rank i,
    * G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) — emitted as floor-div ppm
    * of exact DECIMAL(38,0) products, one IEEE-free integer per
    * subject.
    *
    * Scale: the rank is the point — a global sort of customers /
    * vocabulary. Both rank through RankOps' range-partitioned rank
    * composition (no single-task window), then ONE aggregate folds
    * Σx and Σ i·x_i; the numerator is non-negative by the Chebyshev
    * ordering (ranks aligned with values), so floor-div is
    * engine-exact.
    */
  def giniInequality(spark: SparkSession, dir: String): DataFrame = {
    def gini(dist: DataFrame, subject: String, value: Column, tie: Column): DataFrame =
      RankOps
        .withGlobalRank(dist, "rnk", Seq(value.asc, tie.asc))
        .agg(
          count(lit(1)).as("n"),
          sum(value).as("s0"),
          sum(value.cast(DecimalType(38, 0)) * col("rnk")).as("s1")
        )
        .select(
          lit(subject).as("subject"),
          col("n"),
          col("s0").as("total"),
          expr(
            """CAST((2 * CAST(s1 AS DECIMAL(38,0)) - (n + 1) * CAST(s0 AS DECIMAL(38,0)))
              |     * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * CAST(s0 AS DECIMAL(38,0)))
              |     AS BIGINT)""".stripMargin
          ).as("gini_ppm")
        )
    val spend = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")).as("x"))
    val tokenFreq = Tables
      .documents(spark, dir)
      .select(explode(TextOps.tokens(lower(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("x"))
    gini(spend, "customer_spend", col("x"), col("o_custkey"))
      .unionAll(gini(tokenFreq, "token_freq", col("x"), col("token")))
  }

  // -------------------------------------------- planner input sheets

  /** (table, fixed bytes per row from the non-string schema, string
    * columns) — ONE definition shared with the oracle SQL generator
    * so the two sides cannot drift from the test schema.
    */
  private[graft] val DimTableSpecs: Seq[(String, Int, Seq[String])] = Seq(
    ("region", 4, Seq("r_name")),
    ("nation", 8, Seq("n_name")),
    ("customer", 20, Seq("c_name", "c_mktsegment")),
    ("supplier", 20, Seq("s_name")),
    ("part", 20, Seq("p_name", "p_brand", "p_type"))
  )

  /** Spark's default `spark.sql.autoBroadcastJoinThreshold`. */
  private[graft] val BroadcastThresholdBytes = 10L * 1024 * 1024

  /** Broadcast PLANNING sheet: estimated in-memory bytes per
    * dimension table (fixed-width schema bytes + exact string mass)
    * against the auto-broadcast threshold — the input the planner's
    * broadcast-vs-shuffle decision consumes, and the sheet an
    * operator reads before pinning `broadcast()` hints at 100 TB
    * (where a dim that fits today may not after the next backfill).
    *
    * Scale: one tiny aggregate per dimension table; never touches a
    * fact table.
    */
  def broadcastThresholdPlan(spark: SparkSession, dir: String): DataFrame =
    DimTableSpecs
      .map { case (t, fixed, strCols) =>
        val strBytes =
          strCols.map(c => sum(length(col(c)).cast("long"))).reduce(_ + _)
        Tables
          .table(spark, dir, t)
          .agg(count(lit(1)).as("n_rows"), strBytes.as("sb"))
          .select(
            lit(t).as("table_name"),
            col("n_rows"),
            (col("sb") + col("n_rows") * fixed).as("est_bytes")
          )
      }
      .reduce(_ unionByName _)
      .withColumn(
        "broadcastable",
        when(col("est_bytes") < BroadcastThresholdBytes, 1L).otherwise(0L)
      )

  /** (edge, left table, left key, right table, right key) — the FK
    * spine of the star schema; shared with the oracle generator.
    */
  private[graft] val JoinEdges: Seq[(String, String, String, String, String)] =
    Seq(
      ("region_nation", "region", "r_regionkey", "nation", "n_regionkey"),
      ("nation_customer", "nation", "n_nationkey", "customer", "c_nationkey"),
      ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
      ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
      ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
      ("supplier_lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey")
    )

  /** EXACT join-size census for every FK edge — the planner's
    * frequency-vector estimator run to completion: |L ⋈ R| =
    * Σ_k cnt_L(k)·cnt_R(k), computed from the two key HISTOGRAMS and
    * never by materializing the join (at 100 TB you size a join
    * without running it; this is how). The sheet calibrates join-order
    * and skew decisions: a fat n_out over small inputs flags a
    * many-to-many edge before it burns a stage.
    *
    * Scale: per edge, two map-side-combined groupBys + one histogram
    * join (key-cardinality-sized, not row-sized) + a 1-row rollup.
    */
  def joinCardinalityCensus(spark: SparkSession, dir: String): DataFrame =
    JoinEdges
      .map { case (e, lt, lk, rt, rk) =>
        val l = Tables
          .table(spark, dir, lt)
          .groupBy(col(lk).as("k"))
          .agg(count(lit(1)).as("cl"))
        val r = Tables
          .table(spark, dir, rt)
          .groupBy(col(rk).as("k"))
          .agg(count(lit(1)).as("cr"))
        l.join(r, Seq("k"), "full")
          .agg(
            sum(coalesce(col("cl"), lit(0L))).as("n_left"),
            sum(coalesce(col("cr"), lit(0L))).as("n_right"),
            sum(coalesce(col("cl"), lit(0L)) * coalesce(col("cr"), lit(0L)))
              .as("n_out")
          )
          .select(lit(e).as("edge"), col("n_left"), col("n_right"), col("n_out"))
      }
      .reduce(_ unionByName _)
}
