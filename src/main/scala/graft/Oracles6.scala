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

  /** Mirrors TextOps.phraseHits: bigrams via the slice-window idiom
    * (same sample space as word_ngrams), top-1 by (count desc,
    * lexicographic), per-doc occurrence counts.
    */
  val phraseHits: String =
    """WITH toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |bg AS (
      | SELECT doc_id, unnest(list_transform(range(len(toks)-1),
      |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS bg
      | FROM toks WHERE len(toks) >= 2),
      |top AS (
      | SELECT bg AS phrase, COUNT(*) AS n_total FROM bg GROUP BY 1
      | ORDER BY n_total DESC, phrase ASC LIMIT 1)
      |SELECT doc_id, phrase, COUNT(*) AS n_hits, n_total
      |FROM bg JOIN top ON bg = phrase
      |GROUP BY doc_id, phrase, n_total""".stripMargin

  /** Mirrors TextOps.vocabGrowth: first-appearance doc per token,
    * NTILE(10) doc-id checkpoints, cumulative docs/tokens/vocab via
    * the ≤-bound join.
    */
  val vocabGrowth: String =
    """WITH docs AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |per AS (SELECT doc_id, len(toks) AS n_toks FROM docs),
      |tk AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
      |fw AS (SELECT tok, MIN(doc_id) AS first_doc FROM tk GROUP BY 1),
      |nw AS (SELECT first_doc, COUNT(*) AS n_new FROM fw GROUP BY 1),
      |b AS (SELECT doc_id, NTILE(10) OVER (ORDER BY doc_id ASC) AS bucket FROM per),
      |bounds AS (SELECT bucket, MAX(doc_id) AS bound FROM b GROUP BY 1),
      |cd AS (
      | SELECT bucket, bound, COUNT(*) AS cum_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS cum_tokens
      | FROM per JOIN bounds ON doc_id <= bound GROUP BY 1, 2),
      |cv AS (
      | SELECT bucket AS b2, CAST(SUM(n_new) AS BIGINT) AS cum_vocab
      | FROM nw JOIN bounds ON first_doc <= bound GROUP BY 1)
      |SELECT CAST(bucket AS BIGINT) AS bucket, bound, cum_docs, cum_tokens, cum_vocab
      |FROM cd JOIN cv ON bucket = b2""".stripMargin
}
