package graft

/** DuckDB oracle SQL for the TpchOps suite (Q2, Q6-Q12, Q14, Q15 —
  * see operators/TpchOps.scala). Same parity conventions as
  * SparkEntry/Oracles2: identical column aliases, BIGINT derived ints,
  * DECIMAL(38,10)→VARCHAR→DOUBLE for cross-row double sums, epoch
  * integers for any timestamp arithmetic.
  */
object Oracles3 {

  val forecastRevenue: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
      |  AS revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      | AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24.0""".stripMargin

  val nationVolume: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      | CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
      |  AS revenue
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation n1 ON s_nationkey = n1.n_nationkey
      | JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      | AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      | AND n1.n_name <> n2.n_name AND n1.n_regionkey = n2.n_regionkey
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  val marketShare: String =
    """SELECT o_year, nation_volume, total_volume,
      | nation_volume / total_volume AS mkt_share
      |FROM (
      | SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
      |        THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(38,10)))
      |       AS VARCHAR) AS DOUBLE) AS nation_volume,
      |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,10)))
      |       AS VARCHAR) AS DOUBLE) AS total_volume
      | FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      | WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      | GROUP BY o_year)""".stripMargin

  val productProfit: String =
    """SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      | CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) - p_retailprice*l_quantity*0.1
      |      AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_profit
      |FROM lineitem
      | JOIN part ON l_partkey = p_partkey
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, o_year""".stripMargin

  val returnedItems: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment, revenue FROM (
      | SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
      |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,10)))
      |       AS VARCHAR) AS DOUBLE) AS revenue
      | FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      | WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      | GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment)
      |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  val importantParts: String =
    """WITH per AS MATERIALIZED (
      | SELECT l_partkey,
      |  SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,10))) AS dec_value
      | FROM lineitem GROUP BY l_partkey),
      |tot AS MATERIALIZED (
      | SELECT CAST(CAST(SUM(dec_value) AS VARCHAR) AS DOUBLE) AS total_value,
      |  COUNT(*) AS n_parts FROM per)
      |SELECT l_partkey, CAST(CAST(dec_value AS VARCHAR) AS DOUBLE) AS part_value
      |FROM per, tot
      |WHERE CAST(CAST(dec_value AS VARCHAR) AS DOUBLE) * n_parts > total_value * 1.4""".stripMargin

  val shippingPriority: String =
    """SELECT CASE WHEN CAST(epoch(l_shipdate) AS BIGINT)
      |            > CAST(epoch(o_orderdate) AS BIGINT) + 5184000
      |       THEN 'late' ELSE 'ontime' END AS ship_class,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
      |  AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
      |  AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY ship_class""".stripMargin

  val promoEffect: String =
    """SELECT ship_month, promo_revenue, total_revenue,
      | promo_revenue * 100.0 / total_revenue AS promo_share
      |FROM (
      | SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ship_month,
      |  CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(38,10)))
      |       AS VARCHAR) AS DOUBLE) AS promo_revenue,
      |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,10)))
      |       AS VARCHAR) AS DOUBLE) AS total_revenue
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      | GROUP BY ship_month)""".stripMargin

  val topSupplier: String =
    """WITH rev AS MATERIALIZED (
      | SELECT l_suppkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,10)))
      |       AS VARCHAR) AS DOUBLE) AS total_revenue
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      | GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, s_acctbal, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin

  /** Sequential-fold dot/norm (same fold order as the Spark codegen
    * expressions — see Oracles2). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private val normSqSql: String =
    "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  private[graft] val kmeansAssignCte: String =
    s"""seeds AS (SELECT vec_id AS seed_id, embedding AS se, $normSqSql AS sn2
       |          FROM embeddings WHERE vec_id < 8),
       |v AS MATERIALIZED (SELECT vec_id, embedding, $normSqSql AS vn2 FROM embeddings),
       |d AS MATERIALIZED (SELECT vec_id, seed_id,
       |       vn2 + sn2 - 2.0 * ${dotSql("v.embedding", "se")} AS dist_sq
       |      FROM v, seeds),
       |asg AS MATERIALIZED (SELECT vec_id, seed_id AS cluster, dist_sq FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                               ORDER BY dist_sq ASC, seed_id ASC) AS rnk
       |  FROM d) WHERE rnk = 1)""".stripMargin

  val kmeansAssign: String =
    s"""WITH $kmeansAssignCte
       |SELECT vec_id, cluster, dist_sq FROM asg""".stripMargin

  val kmeansStep: String =
    s"""WITH $kmeansAssignCte,
       |flat AS (
       | SELECT cluster,
       |  CAST(UNNEST(generate_series(0, 63)) AS BIGINT) AS pos,
       |  CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       | FROM embeddings JOIN asg USING (vec_id)),
       |dims AS MATERIALIZED (
       | SELECT cluster, pos, CAST(SUM(q) AS BIGINT) AS sum_q, COUNT(*) AS n
       | FROM flat GROUP BY cluster, pos),
       |sd AS (
       | SELECT vec_id AS cluster,
       |  CAST(UNNEST(generate_series(0, 63)) AS BIGINT) AS pos,
       |  CAST(UNNEST(embedding) AS DOUBLE) AS s
       | FROM embeddings WHERE vec_id < 8)
       |SELECT cluster, MAX(n) AS n_vecs,
       | sqrt(list_reduce(
       |  list_prepend(0.0, list(
       |    (CAST(sum_q AS DOUBLE)/1000000.0/n) * (CAST(sum_q AS DOUBLE)/1000000.0/n)
       |    ORDER BY pos)),
       |  (a, x) -> a + x)) AS centroid_norm,
       | sqrt(list_reduce(
       |  list_prepend(0.0, list(
       |    (CAST(sum_q AS DOUBLE)/1000000.0/n - s) * (CAST(sum_q AS DOUBLE)/1000000.0/n - s)
       |    ORDER BY pos)),
       |  (a, x) -> a + x)) AS seed_shift
       |FROM dims JOIN sd USING (cluster, pos)
       |GROUP BY cluster""".stripMargin

  val semanticDedup: String =
    s"""WITH $kmeansAssignCte,
       |e AS MATERIALIZED (SELECT vec_id, embedding, sqrt($normSqSql) AS nv FROM embeddings)
       |SELECT cluster, vec_a, vec_b, score FROM (
       | SELECT x.cluster AS cluster, x.vec_id AS vec_a, y.vec_id AS vec_b,
       |  ${dotSql("ea.embedding", "eb.embedding")} / (ea.nv * eb.nv) AS score
       | FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |  JOIN e ea ON ea.vec_id = x.vec_id
       |  JOIN e eb ON eb.vec_id = y.vec_id)
       |WHERE score >= 0.4""".stripMargin

  val minCostSupplier: String =
    """WITH per AS MATERIALIZED (
      | SELECT p_partkey, p_brand, l_suppkey,
      |  MIN(l_extendedprice / l_quantity) AS min_unit_price
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | WHERE p_size BETWEEN 10 AND 30 AND p_type = 'SMALL'
      | GROUP BY p_partkey, p_brand, l_suppkey),
      |rk AS (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
      |                              ORDER BY min_unit_price ASC, l_suppkey ASC) AS rnk
      | FROM per)
      |SELECT p_partkey, p_brand, s_suppkey, s_name, min_unit_price
      |FROM rk JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rnk = 1""".stripMargin

  /** Mirrors TpchOps.shipLagSla: exact epoch-second lags, quantile_cont
    * percentiles, floor-div ppm.
    */
  val shipLagSla: String =
    """WITH j AS MATERIALIZED (
      | SELECT o_orderpriority,
      |  CAST(epoch(l_shipdate) AS BIGINT) - CAST(epoch(o_orderdate) AS BIGINT) AS lag_s
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT o_orderpriority, COUNT(*) AS n_lines,
      | quantile_cont(lag_s, 0.5) AS p50_lag_s,
      | quantile_cont(lag_s, 0.9) AS p90_lag_s,
      | quantile_cont(lag_s, 0.99) AS p99_lag_s,
      | CAST(MAX(lag_s) AS BIGINT) AS max_lag_s,
      | CAST(SUM(CASE WHEN lag_s <= 2592000 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30d,
      | (CAST(SUM(CASE WHEN lag_s <= 2592000 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |   // COUNT(*) AS within_30d_ppm
      |FROM j GROUP BY 1""".stripMargin

  /** Q17 twin: same decorrelation, same cross-multiplied exact-decimal
    * threshold (5·qty·n < sum — no float 0.2·avg anywhere).
    */
  val smallQtyRevenue: String =
    """WITH sel AS (
      | SELECT p_partkey FROM part WHERE p_brand = 'Brand#4' AND p_size < 25),
      |j AS MATERIALIZED (
      | SELECT l_partkey, l_quantity, l_extendedprice
      | FROM lineitem JOIN sel ON l_partkey = p_partkey),
      |st AS MATERIALIZED (
      | SELECT l_partkey AS pk,
      |  SUM(CAST(l_quantity AS DECIMAL(38,10))) AS qty_sum,
      |  COUNT(*) AS qty_n
      | FROM j GROUP BY 1)
      |SELECT
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / 7.0
      |   AS avg_yearly,
      | COUNT(*) AS n_lines
      |FROM j JOIN st ON l_partkey = pk
      |WHERE CAST(l_quantity AS DECIMAL(38,10)) * 5 * qty_n < qty_sum""".stripMargin
}
