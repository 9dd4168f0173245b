package graft

/** DuckDB oracle SQL, batch 6 — mirrors of the round-3 additions in
  * `operators/`. Same discipline as Oracles2–5: every hashed column
  * is an exact integer, a string, or an IEEE double derived from
  * exact integers by correctly-rounded ops both engines share.
  */
object Oracles6 {

  /** Mirrors EventOps.cohortMatrix: distinct (user, week) activity,
    * window-MIN cohort per user, (cohort, offset) cells, ppm
    * retention against the offset-0 cell.
    */
  val cohortMatrix: String =
    """WITH wu AS (
      | SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      | FROM events),
      |c AS (
      | SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort
      | FROM wu),
      |cells AS (
      | SELECT cohort, wk - cohort AS "offset", COUNT(*) AS n_active
      | FROM c GROUP BY 1, 2),
      |s AS (
      | SELECT cohort AS c0, n_active AS cohort_size
      | FROM cells WHERE "offset" = 0)
      |SELECT cohort, "offset", n_active, cohort_size,
      | n_active * 1000000 // cohort_size AS ret_ppm
      |FROM cells JOIN s ON cohort = c0""".stripMargin

  /** Mirrors RelationalOps.rfmSegments: per-customer R/F/M exact
    * metrics, three strict-order NTILE(5) tiers, 5×5×5 grid with
    * exact population/order/mass sums.
    */
  val rfmSegments: String =
    """WITH per AS (
      | SELECT o_custkey,
      |  MAX(CAST(epoch(o_orderdate) AS BIGINT)) AS last_s,
      |  COUNT(*) AS freq,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS mon_c
      | FROM orders GROUP BY 1),
      |t AS (
      | SELECT freq, mon_c,
      |  NTILE(5) OVER (ORDER BY last_s ASC, o_custkey ASC) AS r_tier,
      |  NTILE(5) OVER (ORDER BY freq ASC, o_custkey ASC) AS f_tier,
      |  NTILE(5) OVER (ORDER BY mon_c ASC, o_custkey ASC) AS m_tier
      | FROM per)
      |SELECT CAST(r_tier AS BIGINT) AS r_tier, CAST(f_tier AS BIGINT) AS f_tier,
      | CAST(m_tier AS BIGINT) AS m_tier, COUNT(*) AS n_customers,
      | CAST(SUM(freq) AS BIGINT) AS n_orders,
      | CAST(SUM(mon_c) AS BIGINT) AS mass_c
      |FROM t GROUP BY 1, 2, 3""".stripMargin
}
