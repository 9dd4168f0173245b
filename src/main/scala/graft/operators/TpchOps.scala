package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import RelationalOps.{xsum, xavg}

/** The remaining TPC-H query shapes (Q2, Q6-Q12, Q14, Q15), adapted to
  * the driver's star schema (TESTDATA.md — no partsupp table, no
  * l_shipmode/commitdate/receiptdate columns; substitutions documented
  * per query). Together with RelationalOps (Q1/3/4/5/13/16-22) this
  * completes all 22 TPC-H shapes — the standard relational surface the
  * reference engine (a two-phase MapReduce kernel, SURVEY.md §2) cannot
  * express at all.
  *
  * Shared scale discipline: fixed-size dims (nation/region) are hinted
  * broadcasts; corpus-growing sides carry no hint so AQE picks
  * broadcast only while they fit; every double sum crossing rows goes
  * through DECIMAL(38,10) (see RelationalOps class doc).
  */
object TpchOps {

  /** TPC-H Q6: forecast-revenue-change — pure scan+filter+agg, no join.
    * The canonical predicate-pushdown probe: all three filters reach
    * the parquet scan (PushedFilters), and the aggregate is one
    * map-side-combined row. At 100 TB this is I/O-bound by design —
    * the fastest possible shape for the question asked.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .filter(col("l_discount").between(0.02, 0.04))
      .filter(col("l_quantity") < 24.0)
      .agg(
        xsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines")
      )
  }

  /** TPC-H Q7: volume shipping between nation pairs, by year — the
    * cross-nation-pair join shape. TPC-H names two specific nations;
    * this corpus's tiny SF has only 10 supplier nations, so the pair
    * predicate is generalized to "different nations in the same
    * region" (non-vacuous at every SF, same shape: a residual over the
    * two nation dims after both broadcast joins; the fact-side joins
    * stay equi-hash). lineitem⋈orders is the only big shuffle,
    * co-partitioned on orderkey.
    */
  def nationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"), col("n_regionkey").as("s_rk"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"), col("n_regionkey").as("c_rk"))
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation") && col("s_rk") === col("c_rk"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** TPC-H Q8: national market share — the share-of-filtered-total
    * shape. Both the nation-specific and the total volume come out of
    * ONE aggregation pass (conditional sum), so the fact table is
    * scanned once; the share division is one per-row IEEE op over two
    * decimal-exact sums, engine-exact. Customer region and part type
    * are selective dim filters pushed to their scans.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val nCust = Tables.nation(spark, dir).select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nSupp = Tables.nation(spark, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val pt = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    Tables
      .lineitem(spark, dir)
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .select(
        year(col("o_orderdate")).cast("bigint").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        col("supp_nation")
      )
      .groupBy(col("o_year"))
      .agg(
        xsum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0.0)).as("nation_volume"),
        xsum(col("volume")).as("total_volume")
      )
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
  }

  /** TPC-H Q9: product-type profit by (supplier nation, year). The
    * schema has no partsupp.ps_supplycost, so cost is proxied by the
    * part's retail price: profit = disc_price − p_retailprice·qty·0.1
    * (documented adaptation — the SHAPE, a 4-way join with a per-row
    * profit expression regrouped by dim attributes, is Q9's). The
    * per-row profit is IEEE-exact; the cross-row sum is decimal.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    Tables
      .lineitem(spark, dir)
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(
        col("n_name").as("nation"),
        year(col("o_orderdate")).cast("bigint").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.1)).as("amount")
      )
      .groupBy(col("nation"), col("o_year"))
      .agg(xsum(col("amount")).as("sum_profit"))
  }

  /** TPC-H Q10: returned-item reporting — top 20 customers by revenue
    * lost to returns in a quarter. Selective order-date filter cuts the
    * orders side before the fact join; the final top-k is TakeOrdered
    * (per-partition top-20 + single merge), never a global sort.
    */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    Tables
      .lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"), col("c_mktsegment"))
      .agg(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q11: important stock — parts whose aggregate line value
    * exceeds a multiple of the global fair share (share-vs-global-
    * scalar shape; no partsupp, so "stock value" is the part's summed
    * disc_price). TPC-H's absolute `0.0001/SF` fraction is corpus-size
    * dependent — the same constant goes vacuous at 10× the parts — so
    * the cutoff is relative: value > 1.4× the mean per-part value,
    * scale-stable at any SF (the corpus's near-uniform part values cap
    * out at ~1.9× mean, so 1.4 keeps the report selective but
    * non-empty). One hash(partkey) aggregation; the global total
    * re-aggregates THOSE partials (tiny), not the fact table, and
    * comes back as a one-row broadcast — the fact is scanned once.
    * Per-part and global sums are decimal-exact, so the threshold
    * compare is engine-exact.
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 10))).as("dec_value"))
    val tot = per.agg(
      sum(col("dec_value")).cast("double").as("total_value"),
      count(lit(1)).as("n_parts")
    )
    per
      .select(col("l_partkey"), col("dec_value").cast("double").as("part_value"))
      .join(broadcast(tot))
      .filter(col("part_value") * col("n_parts") > col("total_value") * 1.4)
      .select(col("l_partkey"), col("part_value"))
  }

  /** TPC-H Q12: shipping-priority-by-mode — adapted: the schema has no
    * l_shipmode, so lines are classed by shipping DELAY (late = shipped
    * > 60 days after the order date, the same rule as Q4/Q21) and the
    * query reports urgent vs non-urgent order counts per class. The
    * shape — fact⋈dim join feeding a conditional two-column count — is
    * Q12's; one shuffle on orderkey, then a 2-group regroup.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), unix_timestamp(col("l_shipdate")).as("ship_s"))
    Tables
      .orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(
        when(col("ship_s") > unix_timestamp(col("o_orderdate")) + lit(60L * 86400L), "late")
          .otherwise("ontime").as("ship_class"),
        col("o_orderpriority")
      )
      .groupBy(col("ship_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count")
      )
  }

  /** TPC-H Q14: promotion-effect — share of revenue from promo-type
    * parts per ship-month. Same one-pass conditional-sum discipline as
    * Q8: both numerator and denominator come from a single aggregation
    * over the joined fact, and the percentage is a per-row division of
    * two decimal-exact doubles.
    */
  def promoEffect(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .select(
        month(col("l_shipdate")).cast("bigint").as("ship_month"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
        col("p_type")
      )
      .groupBy(col("ship_month"))
      .agg(
        xsum(when(col("p_type") === "PROMO", col("disc_price")).otherwise(0.0)).as("promo_revenue"),
        xsum(col("disc_price")).as("total_revenue")
      )
      .withColumn("promo_share", col("promo_revenue") * 100.0 / col("total_revenue"))
  }

  /** TPC-H Q15: top supplier — the max-of-an-aggregate-view shape. The
    * per-supplier revenue aggregate is computed once and reused for
    * both the maximum (a one-row broadcast back onto itself) and the
    * report row; ties would all be reported, exactly like the TPC-H
    * spec's view form. Revenue is decimal-exact so the equality join
    * against the max is bit-safe.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev
      .join(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("total_revenue"))
  }

  /** TPC-H Q2: minimum-cost supplier per part — the correlated-min
    * subquery shape. No partsupp, so "cost" is the minimum unit sale
    * price (extendedprice/quantity, per-row IEEE division) observed in
    * lineitem for that (part, supplier). The correlated MIN collapses
    * into one (part, supplier) aggregate plus a per-part
    * WindowGroupLimit top-1 (deterministic suppkey tiebreak) — one
    * shuffle on partkey instead of a per-part rescan. Part filter
    * (size, type) prunes before the rank; supplier attributes join
    * after the top-1, on the few surviving rows.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_size").between(10, 30) && col("p_type") === "SMALL")
      .select(col("p_partkey"), col("p_brand"))
    val perSupp = Tables
      .lineitem(spark, dir)
      .join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("min_unit_price"))
    val w = Window
      .partitionBy(col("p_partkey"))
      .orderBy(col("min_unit_price").asc, col("l_suppkey").asc)
    perSupp
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"), col("min_unit_price"))
  }

  /** TPC-H Q17: small-quantity-order revenue — the correlated-scalar-
    * subquery shape (`l_quantity < 0.2 * avg(l_quantity) per part`),
    * decorrelated the way every engine executes it: aggregate
    * per-part stats once, join back, filter. The part filter
    * (p_container has no twin in this schema; p_brand + p_size stand
    * in) runs FIRST and semi-prunes lineitem before the per-part
    * aggregate, so the avg is computed only over surviving parts —
    * equivalent because the subquery correlates on p_partkey alone.
    *
    * Parity: `0.2 * avg` is a float boundary — a last-ulp difference
    * between engines flips rows at the threshold. 0.2 = 1/5 exactly,
    * so the comparison is cross-multiplied into exact decimal
    * integers: qty < sum/(5n)  ⇔  5·qty·n < sum (quantities are
    * positive, n > 0). Both engines evaluate the SAME exact decimal
    * comparison; no float threshold exists in the plan.
    *
    * Scale: per-part stats are a partial+final hash agg on l_partkey
    * (the natural shuffle); the stats side is parts-sized (bounded by
    * the dim, not the corpus), so AQE broadcasts the join-back. At
    * 100 TB nothing here materializes more than the filtered-part
    * lineitem slice.
    */
  /** Fulfillment-SLA report: ship-lag (l_shipdate − o_orderdate, in
    * exact epoch seconds — no day floor-division, so no trunc-vs-floor
    * trap) percentiles per order priority, plus the exact share of
    * lines shipped within 30 days. The operations-dashboard twin of
    * gap_quantiles: same interpolated-percentile discipline
    * (`percentile` here == `quantile_cont` in the oracle, identical
    * 0.x·(n−1) interpolation arithmetic on exact integer inputs).
    *
    * Scale: the only shuffle is the lineitem⋈orders equi-join on
    * orderkey (the q3/q4 co-partitioned shape); percentiles are
    * per-priority sorts of group-local seconds, 5 groups.
    */
  def shipLagSla(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_timestamp(col("o_orderdate")).as("order_s"))
    Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), unix_timestamp(col("l_shipdate")).as("ship_s"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_s", col("ship_s") - col("order_s"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        expr("percentile(lag_s, 0.5)").as("p50_lag_s"),
        expr("percentile(lag_s, 0.9)").as("p90_lag_s"),
        expr("percentile(lag_s, 0.99)").as("p99_lag_s"),
        max(col("lag_s")).as("max_lag_s"),
        sum(when(col("lag_s") <= 2592000L, 1L).otherwise(0L)).as("n_within_30d")
      )
      .withColumn("within_30d_ppm", expr("CAST(CAST(n_within_30d AS DECIMAL(38,0)) * 1000000 DIV (n_lines) AS BIGINT)"))
  }

  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#4" && col("p_size") < 25)
      .select(col("p_partkey"))
    val li = Tables
      .lineitem(spark, dir)
      .join(pt, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val perPart = li
      .groupBy(col("l_partkey"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(38, 10))).as("qty_sum"),
        count(lit(1)).as("qty_n")
      )
      .withColumnRenamed("l_partkey", "pk")
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast(DecimalType(38, 10)) * lit(5) * col("qty_n") < col("qty_sum"))
      .agg(
        (xsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines")
      )
  }
}
