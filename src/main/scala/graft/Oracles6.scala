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
    """WITH wu AS MATERIALIZED (
      | SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      | FROM events),
      |c AS MATERIALIZED (
      | SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort
      | FROM wu),
      |cells AS MATERIALIZED (
      | SELECT cohort, wk - cohort AS "offset", COUNT(*) AS n_active
      | FROM c GROUP BY 1, 2),
      |s AS MATERIALIZED (
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
    """WITH per AS MATERIALIZED (
      | SELECT o_custkey,
      |  MAX(CAST(epoch(o_orderdate) AS BIGINT)) AS last_s,
      |  COUNT(*) AS freq,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS mon_c
      | FROM orders GROUP BY 1),
      |t AS MATERIALIZED (
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
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |bg AS MATERIALIZED (
      | SELECT doc_id, unnest(list_transform(range(len(toks)-1),
      |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS bg
      | FROM toks WHERE len(toks) >= 2),
      |top AS MATERIALIZED (
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
    """WITH docs AS MATERIALIZED (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |per AS MATERIALIZED (SELECT doc_id, len(toks) AS n_toks FROM docs),
      |tk AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok FROM docs),
      |fw AS (SELECT tok, MIN(doc_id) AS first_doc FROM tk GROUP BY 1),
      |nw AS (SELECT first_doc, COUNT(*) AS n_new FROM fw GROUP BY 1),
      |b AS MATERIALIZED (SELECT doc_id, NTILE(10) OVER (ORDER BY doc_id ASC) AS bucket FROM per),
      |bounds AS MATERIALIZED (SELECT bucket, MAX(doc_id) AS bound FROM b GROUP BY 1),
      |cd AS (
      | SELECT bucket, bound, COUNT(*) AS cum_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS cum_tokens
      | FROM per JOIN bounds ON doc_id <= bound GROUP BY 1, 2),
      |cv AS (
      | SELECT bucket AS b2, CAST(SUM(n_new) AS BIGINT) AS cum_vocab
      | FROM nw JOIN bounds ON first_doc <= bound GROUP BY 1)
      |SELECT CAST(bucket AS BIGINT) AS bucket, bound, cum_docs, cum_tokens, cum_vocab
      |FROM cd JOIN cv ON bucket = b2""".stripMargin

  /** Mirrors DedupOps.sortedNeighborhood: 16-letter normalized block
    * key, lead-1/lead-2 neighbors in (bkey, doc_id) order, exact
    * 3-gram Jaccard ≥ 0.5 over the shared shingle CTE.
    */
  val sortedNeighborhood: String =
    s"""WITH ${Oracles2.shinglesCte},
       |k AS (
       | SELECT doc_id,
       |  substr(regexp_replace(lower(text), '[^\\p{L}]+', '', 'g'), 1, 16) AS bkey
       | FROM documents),
       |o AS MATERIALIZED (
       | SELECT doc_id,
       |  LEAD(doc_id, 1) OVER (ORDER BY bkey ASC, doc_id ASC) AS nbr1,
       |  LEAD(doc_id, 2) OVER (ORDER BY bkey ASC, doc_id ASC) AS nbr2
       | FROM k),
       |cand AS MATERIALIZED (
       | SELECT LEAST(doc_id, nbr1) AS doc_a, GREATEST(doc_id, nbr1) AS doc_b
       | FROM o WHERE nbr1 IS NOT NULL
       | UNION ALL
       | SELECT LEAST(doc_id, nbr2), GREATEST(doc_id, nbr2)
       | FROM o WHERE nbr2 IS NOT NULL)
       |SELECT doc_a, doc_b, jaccard FROM (
       | SELECT doc_a, doc_b, ${Oracles2.jaccardExpr} AS jaccard
       | FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
       |WHERE jaccard >= 0.5""".stripMargin

  /** Mirrors EventOps.abTest: md5-parity arms, conversion = purchase
    * count ≥ corpus lower-median (relative cutoff from distinct-count
    * bins), exact integer counts/delta, IEEE rates and pooled z from
    * one fixed expression tree, z = 0 on degenerate variance.
    */
  val abTest: String =
    """WITH pu AS MATERIALIZED (
      | SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
      | FROM events GROUP BY 1),
      |bins AS MATERIALIZED (SELECT np, COUNT(*) AS cnt FROM pu GROUP BY 1),
      |nu AS (SELECT COUNT(*) AS n_users FROM pu),
      |cut AS (
      | SELECT MIN(np) AS cutoff FROM (
      |  SELECT np, SUM(cnt) OVER (ORDER BY np ASC ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM bins), nu
      | WHERE cum * 2 >= n_users),
      |arms AS (
      | SELECT CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |        AS UBIGINT) % 2 AS BIGINT) AS arm,
      |  CASE WHEN np >= cutoff THEN 1 ELSE 0 END AS conv, cutoff
      | FROM pu, cut),
      |s AS MATERIALIZED (
      | SELECT cutoff,
      |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |  CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
      |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |  CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      | FROM arms GROUP BY 1)
      |SELECT cutoff, n_a, conv_a, n_b, conv_b,
      | conv_a * n_b - conv_b * n_a AS delta_scaled,
      | CASE WHEN n_a = 0 THEN 0.0
      |      ELSE CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
      | CASE WHEN n_b = 0 THEN 0.0
      |      ELSE CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
      | CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
      |       OR conv_a + conv_b = n_a + n_b THEN 0.0
      |      ELSE (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |       / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |              * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) END AS z_stat
      |FROM s""".stripMargin

  /** Shared recursive-CTE prefix re-deriving minhashLsh clusters —
    * the same two-independent-algorithms check dedupClusters uses.
    */
  private val compCte =
    s"""mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh
       |          UNION SELECT doc_b AS a, doc_a AS b FROM mh),
       |reach(a, b) AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a)""".stripMargin

  /** Mirrors GraphOps.clusterSizeHist: per-size cluster/doc counts
    * plus the singleton complement row.
    */
  val clusterSizeHist: String =
    s"""WITH RECURSIVE $compCte,
       |sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label),
       |hist AS (
       | SELECT cluster_size, COUNT(*) AS n_clusters,
       |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs
       | FROM sizes GROUP BY 1),
       |tot AS MATERIALIZED (SELECT COUNT(*) AS n_total FROM documents),
       |inc AS (SELECT COUNT(*) AS n_in FROM comp)
       |SELECT cluster_size, n_clusters, n_docs FROM hist
       |UNION ALL
       |SELECT CAST(1 AS BIGINT), n_total - n_in, n_total - n_in FROM tot, inc""".stripMargin

  /** Mirrors GraphOps.dupBySource: doc-unique membership left join,
    * per-source exact counts, floor-div ppm.
    */
  val dupBySource: String =
    s"""WITH RECURSIVE $compCte
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(CASE WHEN comp.doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       | CAST(SUM(CASE WHEN comp.doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |   * 1000000 // COUNT(*) AS dup_ppm
       |FROM documents LEFT JOIN comp ON comp.doc = documents.doc_id
       |GROUP BY 1""".stripMargin

  /** Mirrors TextOps.doclenHist: power-of-two token-count bands per
    * source, band 0 reserved for empty docs.
    */
  val doclenHist: String =
    """WITH d AS MATERIALIZED (
      | SELECT source,
      |  len(list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> ''))
      |    AS n_toks
      | FROM documents)
      |SELECT source,
      | CASE WHEN n_toks = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(length(bin(n_toks)) AS BIGINT) END AS band,
      | COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      | CAST(MIN(n_toks) AS BIGINT) AS min_len, CAST(MAX(n_toks) AS BIGINT) AS max_len
      |FROM d GROUP BY 1, 2""".stripMargin

  /** Mirrors MultimodalOps.sceneCuts: frame energies from the shared
    * audio-window oracle, lag deltas, fixed 512 cut threshold,
    * max_delta 0 for single-frame media.
    */
  val sceneCuts: String =
    s"""WITH fr AS MATERIALIZED (${Oracles4.audioEnergy}),
       |l AS (
       | SELECT media_id, energy,
       |  LAG(energy, 1) OVER (PARTITION BY media_id ORDER BY win_idx) AS prev_e
       | FROM fr)
       |SELECT media_id, COUNT(*) AS n_frames,
       | CAST(SUM(CASE WHEN prev_e IS NOT NULL AND abs(energy - prev_e) > 512
       |          THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       | CAST(COALESCE(MAX(CASE WHEN prev_e IS NOT NULL
       |               THEN abs(energy - prev_e) END), 0) AS BIGINT) AS max_delta
       |FROM l GROUP BY 1""".stripMargin

  /** Mirrors RelationalOps.hazardTable: event gaps + censored tails,
    * distinct-time collapse, exclusive-frame reverse at-risk counts,
    * floor-div ppm hazard.
    */
  val hazardTable: String =
    """WITH o AS MATERIALIZED (
      | SELECT o_custkey, o_orderkey,
      |  CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
      | FROM orders),
      |mx AS (SELECT MAX(day) AS max_day FROM o),
      |l AS (
      | SELECT o_custkey, day,
      |  LEAD(day, 1) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS nxt
      | FROM o),
      |obs AS MATERIALIZED (
      | SELECT CASE WHEN nxt IS NOT NULL THEN nxt - day ELSE max_day - day END AS t_days,
      |  CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
      | FROM l, mx),
      |byt AS (
      | SELECT t_days, CAST(SUM(is_event) AS BIGINT) AS d_events,
      |  CAST(SUM(1 - is_event) AS BIGINT) AS n_censored, COUNT(*) AS tot
      | FROM obs GROUP BY 1),
      |tt AS (SELECT COUNT(*) AS n_total FROM obs),
      |r AS MATERIALIZED (
      | SELECT t_days, d_events, n_censored,
      |  n_total - COALESCE(CAST(SUM(tot) OVER (ORDER BY t_days ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
      | FROM byt, tt)
      |SELECT t_days, n_risk, d_events, n_censored,
      | d_events * 1000000 // n_risk AS hazard_ppm
      |FROM r""".stripMargin

  /** Mirrors RelationalOps.zonePruning: NTILE(64) zones under two
    * layouts, max-price footer stats, ≥450k scan predicate.
    */
  val zonePruning: String =
    """WITH o AS MATERIALIZED (
      | SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      | FROM orders),
      |zk AS (
      | SELECT price_c, NTILE(64) OVER (ORDER BY o_orderkey ASC) AS zone FROM o),
      |zp AS (
      | SELECT price_c, NTILE(64) OVER (ORDER BY price_c ASC, o_orderkey ASC) AS zone
      | FROM o),
      |sk AS (
      | SELECT zone, COUNT(*) AS n_rows, MAX(price_c) AS max_c FROM zk GROUP BY 1),
      |sp AS (
      | SELECT zone, COUNT(*) AS n_rows, MAX(price_c) AS max_c FROM zp GROUP BY 1),
      |rk AS (
      | SELECT 'key_order' AS layout, COUNT(*) AS n_zones,
      |  CAST(SUM(CASE WHEN max_c >= 45000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_scanned_zones,
      |  CAST(SUM(CASE WHEN max_c >= 45000000 THEN n_rows ELSE 0 END) AS BIGINT)
      |    AS n_rows_scanned,
      |  CAST(SUM(n_rows) AS BIGINT) AS n_rows
      | FROM sk),
      |rp AS (
      | SELECT 'price_order' AS layout, COUNT(*) AS n_zones,
      |  CAST(SUM(CASE WHEN max_c >= 45000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_scanned_zones,
      |  CAST(SUM(CASE WHEN max_c >= 45000000 THEN n_rows ELSE 0 END) AS BIGINT)
      |    AS n_rows_scanned,
      |  CAST(SUM(n_rows) AS BIGINT) AS n_rows
      | FROM sp)
      |SELECT layout, n_zones, n_scanned_zones, n_rows_scanned, n_rows,
      | n_rows_scanned * 1000000 // n_rows AS scan_ppm
      |FROM (SELECT * FROM rk UNION ALL SELECT * FROM rp)""".stripMargin

  /** Mirrors EventOps.theilsenTrend: daily collapse, pairwise exact
    * rational slopes, rank-selected lower median per type.
    */
  val theilsenTrend: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
      | FROM events GROUP BY 1, 2),
      |p AS MATERIALIZED (
      | SELECT a.event_type, b.sum_c - a.sum_c AS dy, b.day - a.day AS dx,
      |  CAST(b.sum_c - a.sum_c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      | FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day),
      |r AS MATERIALIZED (
      | SELECT *,
      |  ROW_NUMBER() OVER (PARTITION BY event_type
      |                     ORDER BY slope ASC, dy ASC, dx ASC) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
      | FROM p),
      |nd AS MATERIALIZED (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1)
      |SELECT r.event_type, n_days, n_pairs, dy AS med_dy, dx AS med_dx, slope
      |FROM r JOIN nd ON r.event_type = nd.event_type
      |WHERE rn = (n_pairs + 1) // 2""".stripMargin

  /** Mirrors EventOps.sessionEntryExit: sessionize discipline
    * (30-min gap, (ts, event_id) order), first/last rows via
    * bidirectional row numbers, exact duration sums.
    */
  val sessionEntryExit: String =
    """WITH ev AS MATERIALIZED (
      | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |m AS MATERIALIZED (
      | SELECT *, LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |   AS prev_us
      | FROM ev),
      |s AS MATERIALIZED (
      | SELECT *,
      |  SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |      THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
      |   AS session_id
      | FROM m),
      |sess AS MATERIALIZED (
      | SELECT user_id, session_id, ts_us, event_type,
      |  ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |                     ORDER BY ts_us, event_id) AS rn_a,
      |  ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |                     ORDER BY ts_us DESC, event_id DESC) AS rn_d,
      |  COUNT(*) OVER (PARTITION BY user_id, session_id) AS n_events
      | FROM s),
      |fx AS (
      | SELECT a.event_type AS entry_type, d.event_type AS exit_type,
      |  a.n_events, d.ts_us - a.ts_us AS dur_us
      | FROM sess a JOIN sess d
      |  ON a.user_id = d.user_id AND a.session_id = d.session_id
      |  AND a.rn_a = 1 AND d.rn_d = 1)
      |SELECT entry_type, exit_type, COUNT(*) AS n_sessions,
      | CAST(SUM(n_events) AS BIGINT) AS n_events,
      | CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us
      |FROM fx GROUP BY 1, 2""".stripMargin

  /** Mirrors DedupOps.lshBandSweep: the minhashLsh signature CTE
    * re-banded per configuration, candidate/verified counts, ppm
    * precision. Config CTEs are generated from the same (bands,
    * rows) list as the operator.
    */
  val lshBandSweep: String = {
    val cfgs = Seq((2, 6), (4, 3), (6, 2))
    val cfgCtes = cfgs
      .map { case (nb, rpb) =>
        val t = s"${nb}_$rpb"
        s"""bands$t AS MATERIALIZED (
           | SELECT doc_id, b.band_idx,
           |  array_to_string(sigs[CAST(b.band_idx*$rpb+1 AS INT):CAST(b.band_idx*$rpb+$rpb AS INT)], ',')
           |    AS band_hash
           | FROM sigs, (SELECT unnest(range($nb)) AS band_idx) b),
           |cand$t AS MATERIALIZED (
           | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           | FROM bands$t a JOIN bands$t b
           |  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |  AND a.doc_id < b.doc_id),
           |nc$t AS (SELECT COUNT(*) AS nc FROM cand$t),
           |nv$t AS (SELECT COUNT(*) AS nv FROM (
           |  SELECT ${Oracles2.jaccardExpr} AS j
           |  FROM cand$t JOIN sh sa ON sa.doc_id = doc_a
           |   JOIN sh sb ON sb.doc_id = doc_b) WHERE j >= 0.5),
           |r$t AS (
           | SELECT '${nb}x$rpb' AS config, CAST($nb AS BIGINT) AS n_bands,
           |  CAST($rpb AS BIGINT) AS rows_per_band,
           |  nc AS n_candidates, nv AS n_verified
           | FROM nc$t, nv$t)""".stripMargin
      }
      .mkString(",\n")
    val union = cfgs
      .map { case (nb, rpb) => s"SELECT * FROM r${nb}_$rpb" }
      .mkString(" UNION ALL ")
    s"""WITH ${Oracles2.shinglesCte},
       |hs AS (
       | SELECT doc_id, list_transform(shingles,
       |   s -> CAST(CAST(concat('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT) % 2147483647) AS hs
       | FROM sh),
       |sigs AS MATERIALIZED (
       | SELECT doc_id, list_transform(range(12),
       |   k -> list_min(list_transform(hs, h -> ((k*1000003+1)*h + (k*999983+12345)) % 2147483647))) AS sigs
       | FROM hs),
       |$cfgCtes
       |SELECT config, n_bands, rows_per_band, n_candidates, n_verified,
       | CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)
       |      ELSE n_verified * 1000000 // n_candidates END AS precision_ppm
       |FROM ($union)""".stripMargin
  }

  /** Mirrors SimilarityOps.embeddingQa: per-row array folds on the
    * labelCentroids 1e-6 quantization grid, per-label aggregate.
    */
  val embeddingQa: String =
    """WITH per AS MATERIALIZED (
      | SELECT label, len(embedding) AS n_dims,
      |  len(list_filter(embedding, v -> isnan(v))) AS n_nan,
      |  CASE WHEN len(list_filter(embedding, v -> v <> 0)) = 0 THEN 1 ELSE 0 END
      |    AS is_zero,
      |  list_min(list_transform(embedding,
      |    v -> CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))) AS mn,
      |  list_max(list_transform(embedding,
      |    v -> CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))) AS mx
      | FROM embeddings)
      |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
      | CAST(MIN(n_dims) AS BIGINT) AS n_dims_min,
      | CAST(MAX(n_dims) AS BIGINT) AS n_dims_max,
      | CAST(SUM(is_zero) AS BIGINT) AS n_zero_vecs,
      | MIN(mn) AS min_q, MAX(mx) AS max_q,
      | CAST(SUM(n_nan) AS BIGINT) AS n_nan_dims
      |FROM per GROUP BY 1""".stripMargin

  /** Mirrors MultimodalOps.mmClusters: the aHashPairs oracle resolved
    * by the dedupClusters recursive-CTE component twin.
    */
  val mmClusters: String =
    s"""WITH RECURSIVE mp AS MATERIALIZED (${Oracles5.aHashPairs}),
       |edges AS MATERIALIZED (SELECT media_a AS a, media_b AS b FROM mp
       |          UNION SELECT media_b AS a, media_a AS b FROM mp),
       |reach(a, b) AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
       |sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label)
       |SELECT doc AS media_id, label AS canonical_id, cluster_size,
       | doc = label AS is_canonical
       |FROM comp JOIN sizes USING (label)""".stripMargin

  /** Mirrors EventOps.funnelWindowed: the funnelStages oracle with a
    * 24 h (86400000000 µs) conversion window per stage.
    */
  val funnelWindowed: String =
    """WITH ev AS MATERIALIZED (
      | SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      | WHERE event_type IN ('view', 'click', 'purchase')),
      |f AS MATERIALIZED (
      | SELECT user_id,
      |  MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view_us,
      |  list(CASE WHEN event_type = 'click' THEN ts_us END) AS click_ts,
      |  list(CASE WHEN event_type = 'purchase' THEN ts_us END) AS purch_ts
      | FROM ev GROUP BY user_id),
      |g AS MATERIALIZED (
      | SELECT user_id, first_view_us, purch_ts,
      |  list_min(list_filter(click_ts,
      |    t -> t >= first_view_us AND t <= first_view_us + 86400000000))
      |    AS first_click_us
      | FROM f),
      |h AS (
      | SELECT user_id, first_view_us, first_click_us,
      |  list_min(list_filter(purch_ts,
      |    t -> t >= first_click_us AND t <= first_click_us + 86400000000))
      |    AS first_purchase_us
      | FROM g)
      |SELECT user_id, first_view_us, first_click_us, first_purchase_us,
      | CAST(CASE WHEN first_view_us IS NULL THEN 0
      |           WHEN first_click_us IS NULL THEN 1
      |           WHEN first_purchase_us IS NULL THEN 2
      |           ELSE 3 END AS BIGINT) AS stage
      |FROM h""".stripMargin

  /** Mirrors EventOps.seasonalDecompose: (type, day) collapse,
    * (type, weekday) exact sums, cross-multiplied residual + IEEE
    * residual from exact inputs.
    */
  val seasonalDecompose: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
      | FROM events GROUP BY 1, 2),
      |d2 AS MATERIALIZED (SELECT *, (day + 4) % 7 AS wd FROM daily),
      |w AS MATERIALIZED (
      | SELECT event_type AS et_w, wd AS wd_w, COUNT(*) AS wd_n,
      |  CAST(SUM(sum_c) AS BIGINT) AS wd_sum_c
      | FROM d2 GROUP BY 1, 2)
      |SELECT event_type, day, wd, sum_c, wd_n, wd_sum_c,
      | sum_c * wd_n - wd_sum_c AS resid_scaled,
      | CAST(sum_c AS DOUBLE) - CAST(wd_sum_c AS DOUBLE) / CAST(wd_n AS DOUBLE)
      |   AS resid
      |FROM d2 JOIN w ON event_type = et_w AND wd = wd_w""".stripMargin

  /** Mirrors GraphOps.degreeHist: minhashLsh pair degrees in
    * power-of-two bands.
    */
  val degreeHist: String =
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |deg AS (
       | SELECT doc, COUNT(*) AS degree FROM (
       |  SELECT doc_a AS doc FROM mh UNION ALL SELECT doc_b AS doc FROM mh)
       | GROUP BY 1)
       |SELECT CAST(length(bin(degree)) AS BIGINT) AS band, COUNT(*) AS n_nodes,
       | CAST(SUM(degree) AS BIGINT) AS sum_degree,
       | MIN(degree) AS min_degree, MAX(degree) AS max_degree
       |FROM deg GROUP BY 1""".stripMargin

  /** Mirrors EventOps.xcorrTypes: daily collapse, (day + lag) equi
    * join per ordered type pair, corrStats decimal moments, r = 0 on
    * degenerate variance, n ≥ 8 floor.
    */
  val xcorrTypes: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      | FROM events GROUP BY 1, 2),
      |lags AS (SELECT CAST(unnest(range(4)) AS BIGINT) AS lag),
      |j AS MATERIALIZED (
      | SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag, a.x, b.x AS y
      | FROM daily a CROSS JOIN lags l
      |  JOIN daily b ON b.day = a.day + l.lag
      | WHERE a.event_type < b.event_type),
      |m AS MATERIALIZED (
      | SELECT type_a, type_b, lag, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_x,
      |  CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_y,
      |  CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sum_xy,
      |  CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sum_x2,
      |  CAST(CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sum_y2
      | FROM j GROUP BY 1, 2, 3)
      |SELECT type_a, type_b, lag, n,
      | CASE WHEN CAST(n AS DOUBLE) * sum_x2 - sum_x * sum_x <= 0.0
      |       OR CAST(n AS DOUBLE) * sum_y2 - sum_y * sum_y <= 0.0 THEN 0.0
      |      ELSE (CAST(n AS DOUBLE) * sum_xy - sum_x * sum_y)
      |       / (sqrt(CAST(n AS DOUBLE) * sum_x2 - sum_x * sum_x)
      |          * sqrt(CAST(n AS DOUBLE) * sum_y2 - sum_y * sum_y)) END AS r
      |FROM m WHERE n >= 8""".stripMargin

  /** Mirrors DedupOps.minhashCalibration: the minhashLsh signature +
    * banding CTEs, J ≥ 0.5 verified candidates, signature agreement
    * vs exact Jaccard.
    */
  val minhashCalibration: String =
    s"""WITH ${Oracles2.shinglesCte},
       |hs AS (
       | SELECT doc_id, list_transform(shingles,
       |   s -> CAST(CAST(concat('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT) % 2147483647) AS hs
       | FROM sh),
       |sigs AS MATERIALIZED (
       | SELECT doc_id, list_transform(range(12),
       |   k -> list_min(list_transform(hs, h -> ((k*1000003+1)*h + (k*999983+12345)) % 2147483647))) AS sigs
       | FROM hs),
       |bands AS MATERIALIZED (
       | SELECT doc_id, b.band_idx,
       |  array_to_string(sigs[CAST(b.band_idx*3+1 AS INT):CAST(b.band_idx*3+3 AS INT)], ',') AS band_hash
       | FROM sigs, (SELECT unnest(range(4)) AS band_idx) b),
       |cand AS MATERIALIZED (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |v AS MATERIALIZED (
       | SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b, ${Oracles2.jaccardExpr} AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
       | WHERE jaccard >= 0.5)
       |SELECT doc_a, doc_b,
       | CAST(len(list_filter(range(12),
       |   k -> ga.sigs[CAST(k+1 AS INT)] = gb.sigs[CAST(k+1 AS INT)])) AS BIGINT) AS n_match,
       | CAST(len(list_filter(range(12),
       |   k -> ga.sigs[CAST(k+1 AS INT)] = gb.sigs[CAST(k+1 AS INT)])) AS DOUBLE) / 12.0 AS est,
       | jaccard,
       | abs(CAST(len(list_filter(range(12),
       |   k -> ga.sigs[CAST(k+1 AS INT)] = gb.sigs[CAST(k+1 AS INT)])) AS DOUBLE) / 12.0
       |     - jaccard) AS abs_err
       |FROM v JOIN sigs ga ON ga.doc_id = doc_a JOIN sigs gb ON gb.doc_id = doc_b""".stripMargin

  /** Mirrors RelationalOps.keysetPage — stated as the OFFSET twin
    * (ROW_NUMBER BETWEEN 41 AND 60), so the gate proves seek ≡
    * offset on the strict (price desc, key asc) order.
    */
  val keysetPage: String =
    """WITH o AS MATERIALIZED (
      | SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      | FROM orders),
      |r AS MATERIALIZED (
      | SELECT o_orderkey, price_c,
      |  ROW_NUMBER() OVER (ORDER BY price_c DESC, o_orderkey ASC) AS rn
      | FROM o)
      |SELECT o_orderkey, price_c, CAST(rn AS BIGINT) AS rn
      |FROM r WHERE rn BETWEEN 41 AND 60""".stripMargin

  /** Mirrors TextOps.stratifiedKfold: round-robin fold by in-stratum
    * doc-id rank, exact expected counts, balance flag re-derived.
    */
  val stratifiedKfold: String =
    """WITH ranked AS (
      | SELECT lang,
      |  (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id ASC) - 1) % 5 AS fold
      | FROM documents),
      |cells AS MATERIALIZED (
      | SELECT lang, CAST(fold AS BIGINT) AS fold, COUNT(*) AS n_docs
      | FROM ranked GROUP BY 1, 2),
      |t AS MATERIALIZED (
      | SELECT *, CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_total
      | FROM cells)
      |SELECT lang, fold, n_docs, lang_total,
      | lang_total // 5 + CASE WHEN fold < lang_total % 5 THEN 1 ELSE 0 END AS expected,
      | n_docs = lang_total // 5 + CASE WHEN fold < lang_total % 5 THEN 1 ELSE 0 END
      |   AS balanced
      |FROM t""".stripMargin

  /** Mirrors EventOps.spikeDays: seasonal residuals truncating-
    * divided to day scale (integer // truncates toward zero, same as
    * Spark DIV), two quantile_cont passes, 3·1.4826·MAD threshold.
    */
  val spikeDays: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
      | FROM events GROUP BY 1, 2),
      |d2 AS MATERIALIZED (SELECT *, (day + 4) % 7 AS wd FROM daily),
      |w AS MATERIALIZED (
      | SELECT event_type AS et_w, wd AS wd_w, COUNT(*) AS wd_n,
      |  CAST(SUM(sum_c) AS BIGINT) AS wd_sum_c
      | FROM d2 GROUP BY 1, 2),
      |q AS MATERIALIZED (
      | SELECT event_type, day,
      |  CAST((sum_c * wd_n - wd_sum_c) // wd_n AS BIGINT) AS resid_q
      | FROM d2 JOIN w ON event_type = et_w AND wd = wd_w),
      |med AS MATERIALIZED (SELECT event_type, quantile_cont(resid_q, 0.5) AS med_q FROM q GROUP BY 1),
      |dv AS MATERIALIZED (
      | SELECT q.event_type, q.day, q.resid_q, med.med_q,
      |  abs(CAST(q.resid_q AS DOUBLE) - med.med_q) AS dev
      | FROM q JOIN med USING (event_type)),
      |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad_q FROM dv GROUP BY 1)
      |SELECT dv.event_type, day, resid_q, dev, med_q, mad_q
      |FROM dv JOIN md USING (event_type)
      |WHERE dev > 3.0 * 1.4826 * mad_q""".stripMargin

  /** Mirrors GraphOps.clusterEdgeStats: compCte clusters joined back
    * to the verified pair list, per-cluster edge stats + density ppm.
    */
  val clusterEdgeStats: String =
    s"""WITH RECURSIVE $compCte,
       |sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label)
       |SELECT comp.label AS canonical_id, sizes.cluster_size, COUNT(*) AS n_edges,
       | MIN(mh.jaccard) AS min_j, MAX(mh.jaccard) AS max_j,
       | COUNT(*) * 2 * 1000000 // (sizes.cluster_size * (sizes.cluster_size - 1))
       |   AS density_ppm
       |FROM mh JOIN comp ON comp.doc = mh.doc_a JOIN sizes ON sizes.label = comp.label
       |GROUP BY 1, 2""".stripMargin

  /** Mirrors EventOps.maxDrawdown: running cum/peak/drawdown in
    * exact centi-integers, earliest-day trough selection.
    */
  val maxDrawdown: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
      | FROM events GROUP BY 1, 2),
      |c AS MATERIALIZED (
      | SELECT event_type, day,
      |  CAST(SUM(sum_c) OVER (PARTITION BY event_type ORDER BY day
      |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
      | FROM daily),
      |r AS MATERIALIZED (
      | SELECT event_type, day, cum_c,
      |  CAST(MAX(cum_c) OVER (PARTITION BY event_type ORDER BY day
      |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_c
      | FROM c),
      |d AS MATERIALIZED (
      | SELECT *, peak_c - cum_c AS dd_c,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY peak_c - cum_c DESC, day ASC)
      |    AS rk,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n_days
      | FROM r)
      |SELECT event_type, n_days, day AS trough_day, peak_c,
      | cum_c AS cum_at_trough_c, dd_c AS max_dd_c
      |FROM d WHERE rk = 1""".stripMargin

  /** Mirrors EventOps.funnelLatency: funnelWindowed stage-3 delays,
    * interpolated quantiles over exact integer µs.
    */
  val funnelLatency: String =
    s"""WITH fw AS ($funnelWindowed),
       |lat AS (
       | SELECT first_click_us - first_view_us AS vc_us,
       |  first_purchase_us - first_click_us AS cp_us
       | FROM fw WHERE stage = 3)
       |SELECT COUNT(*) AS n_converted,
       | quantile_cont(vc_us, 0.5) AS vc_p50_us,
       | quantile_cont(vc_us, 0.9) AS vc_p90_us,
       | MAX(vc_us) AS vc_max_us,
       | quantile_cont(cp_us, 0.5) AS cp_p50_us,
       | quantile_cont(cp_us, 0.9) AS cp_p90_us,
       | MAX(cp_us) AS cp_max_us
       |FROM lat""".stripMargin

  /** Mirrors TextOps.consonantRuns: longest consonant run per doc via
    * the shared regexp, per-source flag rate.
    */
  val consonantRuns: String =
    """WITH per AS MATERIALIZED (
      | SELECT source,
      |  CAST(COALESCE(list_max(list_transform(
      |    regexp_extract_all(lower(text), '[bcdfghjklmnpqrstvwxyz]+'),
      |    s -> length(s))), 0) AS BIGINT) AS max_run
      | FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      | CAST(SUM(CASE WHEN max_run >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      | MAX(max_run) AS max_run,
      | quantile_cont(max_run, 0.5) AS p50_run,
      | CAST(SUM(CASE WHEN max_run >= 8 THEN 1 ELSE 0 END) AS BIGINT)
      |   * 1000000 // COUNT(*) AS flag_ppm
      |FROM per GROUP BY 1""".stripMargin

  /** Mirrors EventOps.bounceRate: sessionize discipline, entry type
    * via first-row selection, one-event-session share.
    */
  val bounceRate: String =
    """WITH ev AS MATERIALIZED (
      | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |m AS MATERIALIZED (
      | SELECT *, LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |   AS prev_us
      | FROM ev),
      |s AS MATERIALIZED (
      | SELECT *,
      |  SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |      THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
      |   AS session_id
      | FROM m),
      |sess AS MATERIALIZED (
      | SELECT user_id, session_id, event_type,
      |  ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |                     ORDER BY ts_us, event_id) AS rn_a,
      |  COUNT(*) OVER (PARTITION BY user_id, session_id) AS n_events
      | FROM s)
      |SELECT event_type AS entry_type, COUNT(*) AS n_sessions,
      | CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
      | CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |   * 1000000 // COUNT(*) AS bounce_ppm
      |FROM sess WHERE rn_a = 1 GROUP BY 1""".stripMargin

  /** Mirrors EventOps.stickiness: distinct (day,user) and (week,user)
    * collapses, cross-multiplied ppm ratio.
    */
  val stickiness: String =
    """WITH du AS MATERIALIZED (
      | SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
      |dau AS (
      | SELECT day // 7 AS week, COUNT(*) AS n_days,
      |  CAST(SUM(dau) AS BIGINT) AS sum_dau
      | FROM (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1) GROUP BY 1),
      |wau AS (
      | SELECT wk, COUNT(*) AS wau FROM (
      |  SELECT DISTINCT day // 7 AS wk, user_id FROM du) GROUP BY 1)
      |SELECT week, n_days, wau, sum_dau,
      | sum_dau * 1000000 // (n_days * wau) AS stickiness_ppm
      |FROM dau JOIN wau ON week = wk""".stripMargin

  /** Mirrors EventOps.rollingZscore: trailing-14-exclusive frame,
    * decimal-exact window moments, z = 0 on zero variance, n ≥ 7.
    */
  val rollingZscore: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
      | FROM events GROUP BY 1, 2),
      |w AS MATERIALIZED (
      | SELECT event_type, day, sum_c,
      |  COUNT(*) OVER t AS n_prior,
      |  CAST(CAST(SUM(CAST(sum_c AS DECIMAL(38,0))) OVER t AS VARCHAR) AS DOUBLE) AS sx,
      |  CAST(CAST(SUM(CAST(sum_c AS DECIMAL(19,0)) * CAST(sum_c AS DECIMAL(19,0)))
      |       OVER t AS VARCHAR) AS DOUBLE) AS sx2
      | FROM daily
      | WINDOW t AS (PARTITION BY event_type ORDER BY day
      |              ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, sum_c, n_prior,
      | CASE WHEN CAST(n_prior AS DOUBLE) * sx2 - sx * sx <= 0.0 THEN 0.0
      |      ELSE (CAST(sum_c AS DOUBLE) - sx / CAST(n_prior AS DOUBLE))
      |       / sqrt((CAST(n_prior AS DOUBLE) * sx2 - sx * sx)
      |              / (CAST(n_prior AS DOUBLE) * (CAST(n_prior AS DOUBLE) - 1.0)))
      |  END AS z
      |FROM w WHERE n_prior >= 7""".stripMargin

  /** Mirrors RelationalOps.tierMigration: midpoint-day halves,
    * per-half strict NTILE(5) tiers, full-outer cross-tab with tier
    * 0 for absentees.
    */
  val tierMigration: String =
    """WITH o AS MATERIALIZED (
      | SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      | FROM orders),
      |m AS MATERIALIZED (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid_day FROM o),
      |h1 AS (
      | SELECT o_custkey,
      |  CAST(NTILE(5) OVER (ORDER BY spend_c ASC, o_custkey ASC) AS BIGINT) AS tier_h1
      | FROM (SELECT o_custkey, CAST(SUM(price_c) AS BIGINT) AS spend_c
      |       FROM o, m WHERE day < mid_day GROUP BY 1)),
      |h2 AS (
      | SELECT o_custkey,
      |  CAST(NTILE(5) OVER (ORDER BY spend_c ASC, o_custkey ASC) AS BIGINT) AS tier_h2
      | FROM (SELECT o_custkey, CAST(SUM(price_c) AS BIGINT) AS spend_c
      |       FROM o, m WHERE day >= mid_day GROUP BY 1))
      |SELECT COALESCE(tier_h1, 0) AS tier_h1, COALESCE(tier_h2, 0) AS tier_h2,
      | COUNT(*) AS n_customers
      |FROM h1 FULL OUTER JOIN h2 USING (o_custkey)
      |GROUP BY 1, 2""".stripMargin

  /** Mirrors GraphOps.percolationSweep: the minhashLsh pairs filtered
    * per threshold, each re-resolved by the recursive component twin.
    */
  val percolationSweep: String = {
    val perT = Seq(700, 800, 900)
      .map { t =>
        val j = t / 100 // 7, 8, 9 -> 0.7 etc.
        s"""e$t AS MATERIALIZED (SELECT doc_a, doc_b FROM mh WHERE jaccard >= 0.$j),
           |ed$t AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM e$t
           |         UNION SELECT doc_b, doc_a FROM e$t),
           |r$t(a, b) AS (
           | SELECT a, b FROM ed$t
           | UNION
           | SELECT r.a, e.b FROM r$t r JOIN ed$t e ON r.b = e.a),
           |c$t AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM r$t GROUP BY a),
           |s$t AS (SELECT label, COUNT(*) AS sz FROM c$t GROUP BY 1),
           |g$t AS (
           | SELECT CAST($t AS BIGINT) AS threshold_pm,
           |  (SELECT COUNT(*) FROM e$t) AS n_edges,
           |  (SELECT COUNT(*) FROM c$t) AS n_nodes,
           |  COUNT(*) AS n_components,
           |  CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS max_component
           | FROM s$t)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH RECURSIVE mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |$perT
       |SELECT * FROM g700 UNION ALL SELECT * FROM g800 UNION ALL SELECT * FROM g900""".stripMargin
  }

  /** Mirrors SimilarityOps.matryoshkaRecall: list_slice prefixes, the
    * same sequential-fold dot/norm (Oracles2 convention), the same
    * (score DESC, neighbor ASC) row_number cut, overlap vs the k=64
    * anchor. recall_ppm = overlap * 100000 (== *1e6 DIV 10), exact.
    */
  val matryoshkaRecall: String =
    """WITH ks AS MATERIALIZED (SELECT CAST(k AS INTEGER) AS k FROM (VALUES (8), (16), (32), (64)) t(k)),
      |q AS MATERIALIZED (
      | SELECT k, vec_id AS query_id, list_slice(embedding, 1, k) AS qe
      | FROM embeddings, ks WHERE vec_id < 5),
      |n AS MATERIALIZED (
      | SELECT k, vec_id AS neighbor_id, list_slice(embedding, 1, k) AS ne
      | FROM embeddings, ks),
      |p AS MATERIALIZED (
      | SELECT q.k, query_id, neighbor_id,
      |  list_sum(list_transform(list_zip(qe, ne), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |   / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      * sqrt(list_sum(list_transform(ne, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS score
      | FROM q JOIN n USING (k) WHERE query_id <> neighbor_id),
      |top AS MATERIALIZED (
      | SELECT k, query_id, neighbor_id FROM (
      |  SELECT k, query_id, neighbor_id,
      |   ROW_NUMBER() OVER (PARTITION BY k, query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
      |  FROM p)
      | WHERE rnk <= 10),
      |full_w AS (SELECT query_id AS fq, neighbor_id AS fn FROM top WHERE k = 64)
      |SELECT CAST(k AS BIGINT) AS k, query_id, COUNT(fn) AS n_overlap,
      | COUNT(fn) * 100000 AS recall_ppm
      |FROM top LEFT JOIN full_w ON query_id = fq AND neighbor_id = fn
      |GROUP BY 1, 2""".stripMargin

  /** Mirrors EventOps.tvdDrift: integer epoch-µs midpoint split,
    * exact decimal centi-value bins, cross-multiplied |c0·n1 − c1·n0|
    * numerator, one trailing IEEE division. Totals roll up from the
    * bin counts, mirroring the engine's single events scan.
    */
  val tvdDrift: String =
    """WITH e AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) AS us,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vb
      | FROM events),
      |mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM e),
      |f AS MATERIALIZED (SELECT event_type, vb,
      |       CASE WHEN us <= mid THEN 0 ELSE 1 END AS h
      |      FROM e, mid),
      |b AS MATERIALIZED (SELECT event_type, vb,
      |       SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS c0,
      |       SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS c1
      |      FROM f GROUP BY 1, 2),
      |t AS MATERIALIZED (SELECT event_type,
      |       CAST(SUM(c0) AS BIGINT) AS n_first,
      |       CAST(SUM(c1) AS BIGINT) AS n_second
      |      FROM b GROUP BY 1)
      |SELECT event_type, n_first, n_second,
      | CAST(SUM(ABS(c0 * n_second - c1 * n_first)) AS BIGINT) AS tvd_scaled,
      | COUNT(*) AS n_bins,
      | CAST(SUM(ABS(c0 * n_second - c1 * n_first)) AS DOUBLE)
      |   / (2.0 * n_first * n_second) AS tvd
      |FROM b JOIN t USING (event_type)
      |GROUP BY 1, 2, 3""".stripMargin

  /** Mirrors TextOps.bpeTrain: the same word-type collapse, the same
    * per-round (count DESC, pair ASC) argmax, and the same 3-pass
    * replace() merge contract, unrolled as chained CTEs — one
    * (pairs, argmax, apply) triple per merge round.
    */
  /** The shared r0..rM CTE chain (type collapse + M merge rounds). */
  private[graft] def bpeChain: String = {
    val init =
      """r0 AS MATERIALIZED (
        | SELECT word, COUNT(*) AS freq,
        |  ' ' || trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' ' AS seq
        | FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '')) AS word
        |  FROM documents)
        | GROUP BY 1)""".stripMargin
    val rep = "' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '"
    val rounds = (1 to graft.operators.TextOps.BpeMerges).map { k =>
      s"""p$k AS (
         | SELECT pair, SUM(freq) AS cnt FROM (
         |  SELECT freq,
         |   unnest(list_filter(
         |     list_transform(list_zip(syms, syms[2:]),
         |       x -> CASE WHEN x[2] IS NULL THEN NULL ELSE x[1] || ' ' || x[2] END),
         |     y -> y IS NOT NULL)) AS pair
         |  FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM r${k - 1}))
         | GROUP BY 1),
         |m$k AS MATERIALIZED (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair ASC LIMIT 1),
         |r$k AS MATERIALIZED (
         | SELECT word, freq,
         |  replace(replace(replace(seq, $rep), $rep), $rep) AS seq
         | FROM r${k - 1}, m$k)""".stripMargin
    }
    s"$init,\n${rounds.mkString(",\n")}"
  }

  val bpeTrain: String = {
    val sel = (1 to graft.operators.TextOps.BpeMerges)
      .map { k =>
        s"""SELECT CAST($k AS BIGINT) AS rank,
           | string_split(pair, ' ')[1] AS left_sym,
           | string_split(pair, ' ')[2] AS right_sym,
           | replace(pair, ' ', '') AS merged,
           | CAST(cnt AS BIGINT) AS pair_count
           |FROM m$k""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"WITH $bpeChain\n$sel"
  }

  /** Mirrors TextOps.bpeEncode: encode via the final round's type
    * sequences, occurrence-weighted per source.
    */
  val bpeEncode: String = {
    val last = s"r${graft.operators.TextOps.BpeMerges}"
    s"""WITH $bpeChain,
       |enc AS (SELECT word, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_syms
       |        FROM $last),
       |occ AS MATERIALIZED (
       | SELECT source, word, COUNT(*) AS cnt FROM (
       |  SELECT source,
       |   unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')) AS word
       |  FROM documents)
       | GROUP BY 1, 2)
       |SELECT source,
       | CAST(SUM(cnt) AS BIGINT) AS n_word_occurrences,
       | COUNT(DISTINCT word) AS n_word_types,
       | CAST(SUM(cnt * length(word)) AS BIGINT) AS n_letters,
       | CAST(SUM(cnt * n_syms) AS BIGINT) AS n_bpe_tokens,
       | CAST((CAST(SUM(cnt * n_syms) AS BIGINT) * 1000000)
       |      // CAST(SUM(cnt * length(word)) AS BIGINT) AS BIGINT) AS compression_ppm
       |FROM occ JOIN enc USING (word)
       |GROUP BY 1""".stripMargin
  }

  /** Mirrors SimilarityOps.gramMatrix: 0-based dims via
    * generate_series, IEEE products, decimal-exact sums.
    */
  val gramMatrix: String =
    """WITH a AS MATERIALIZED (
      | SELECT vec_id, t.i AS i, CAST(embedding[t.i + 1] AS DOUBLE) AS vi
      | FROM embeddings, generate_series(0, 63) t(i))
      |SELECT CAST(x.i AS BIGINT) AS i, CAST(y.i AS BIGINT) AS j,
      | CAST(CAST(SUM(CAST(x.vi * y.vi AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS gram
      |FROM a x JOIN a y ON x.vec_id = y.vec_id AND y.i >= x.i
      |GROUP BY 1, 2""".stripMargin

  /** Mirrors SimilarityOps.pcaPower: the same Gram rows, the same
    * sequential folds (list_sum == Spark's aggregate() left fold, the
    * dotSql contract), unrolled fixed rounds, MATERIALIZED per round.
    */
  /** The shared fit chain (Gram, full mirror, row arrays, unrolled
    * power rounds) ending at x<PcaRounds>.
    */
  private def pcaChain: String = {
    import graft.operators.SimilarityOps.PcaRounds
    val rounds = (1 to PcaRounds)
      .map { r =>
        s"""y$r AS MATERIALIZED (
           | SELECT i, list_sum(list_transform(list_zip(grow, xs), p -> p[1] * p[2])) AS y
           | FROM grows, x${r - 1}),
           |n$r AS MATERIALIZED (
           | SELECT sqrt(list_sum(list_transform(ya, v -> v * v))) AS nrm, ya
           | FROM (SELECT array_agg(y ORDER BY i) AS ya FROM y$r)),
           |x$r AS MATERIALIZED (SELECT list_transform(ya, v -> v / nrm) AS xs FROM n$r)""".stripMargin
      }
      .mkString(",\n")
    s"""g AS MATERIALIZED ($gramMatrix),
       |full_g AS MATERIALIZED (
       | SELECT i, j, gram FROM g
       | UNION ALL SELECT j AS i, i AS j, gram FROM g WHERE i <> j),
       |grows AS MATERIALIZED (
       | SELECT i, array_agg(gram ORDER BY j) AS grow FROM full_g GROUP BY 1),
       |x0 AS MATERIALIZED (SELECT list_transform(range(64), t -> 0.125) AS xs),
       |$rounds""".stripMargin
  }

  val pcaPower: String = {
    import graft.operators.SimilarityOps.PcaRounds
    s"""WITH $pcaChain
       |SELECT CAST(t.i AS BIGINT) AS i, xs[t.i + 1] AS loading,
       | (SELECT nrm FROM n$PcaRounds) AS lambda
       |FROM x$PcaRounds, generate_series(0, 63) t(i)""".stripMargin
  }

  /** Mirrors SimilarityOps.pcaScores: project every embedding with the
    * same sequential fold, per-label decimal-exact report.
    */
  val pcaScores: String = {
    import graft.operators.SimilarityOps.PcaRounds
    s"""WITH $pcaChain,
       |scored AS MATERIALIZED (
       | SELECT label,
       |  list_sum(list_transform(list_zip(embedding, xs),
       |    p -> CAST(p[1] AS DOUBLE) * p[2])) AS score
       | FROM embeddings, x$PcaRounds)
       |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
       | CAST(CAST(SUM(CAST(score AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS score_sum,
       | MIN(score) AS score_min, MAX(score) AS score_max
       |FROM scored GROUP BY 1""".stripMargin
  }

  /** Mirrors TextOps.qualityGate: the quality_score ratio CTEs + the
    * consonant-run regexp + the additive reason bitmask.
    */
  val qualityGate: String =
    """WITH base AS (
      | SELECT source, n_chars, text,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |counts AS (
      | SELECT source, n_chars, text, len(toks) AS n_words,
      |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
      |  len(list_filter(toks, t -> t IN
      |    ('the','a','an','and','or','of','to','in','is','it','on','for'))) AS n_stop
      | FROM base),
      |ratios AS (
      | SELECT source, n_chars, n_words,
      |  CASE WHEN n_words > 0
      |       THEN CAST(n_stop AS DOUBLE)/CAST(n_words AS DOUBLE) ELSE 0.0 END AS stop_ratio,
      |  CASE WHEN length(text) > 0
      |       THEN CAST(n_punct AS DOUBLE)/CAST(length(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
      |  CAST(COALESCE(list_max(list_transform(
      |    regexp_extract_all(lower(text), '[bcdfghjklmnpqrstvwxyz]+'),
      |    s -> length(s))), 0) AS BIGINT) AS max_run
      | FROM counts),
      |q AS MATERIALIZED (
      | SELECT source, n_chars, n_words, max_run,
      |  (CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END)
      |   * (1.0 - punct_ratio) * (0.5 + stop_ratio) AS quality
      | FROM ratios)
      |SELECT source,
      | CAST((CASE WHEN quality < 0.55 THEN 1 ELSE 0 END)
      |     + (CASE WHEN max_run >= 8 THEN 2 ELSE 0 END)
      |     + (CASE WHEN n_words < 30 THEN 4 ELSE 0 END) AS BIGINT) AS reason_mask,
      | COUNT(*) AS n_docs,
      | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM q GROUP BY 1, 2""".stripMargin

  /** Mirrors EventOps.linearAttribution: the same four RANGE-frame
    * window sums over one user sort, strict 1-µs-preceding upper
    * bound, floor-div ppm credit.
    */
  val linearAttribution: String =
    """WITH ev AS MATERIALIZED (
      | SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |w AS MATERIALIZED (
      | SELECT event_type,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER fr AS BIGINT) AS cnt_click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER fr AS BIGINT) AS cnt_error,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER fr AS BIGINT) AS cnt_signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER fr AS BIGINT) AS cnt_view
      | FROM ev
      | WINDOW fr AS (PARTITION BY user_id ORDER BY ts_us
      |               RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)),
      |p AS MATERIALIZED (
      | SELECT cnt_click, cnt_error, cnt_signup, cnt_view,
      |  cnt_click + cnt_error + cnt_signup + cnt_view AS n
      | FROM w WHERE event_type = 'purchase'),
      |u AS (
      | SELECT 'click' AS touch_type, cnt_click AS cnt, n FROM p
      | UNION ALL SELECT 'error', cnt_error, n FROM p
      | UNION ALL SELECT 'signup', cnt_signup, n FROM p
      | UNION ALL SELECT 'view', cnt_view, n FROM p)
      |SELECT touch_type, COUNT(*) AS n_purchases,
      | CAST(SUM(cnt) AS BIGINT) AS n_touches,
      | CAST(SUM(cnt * (1000000 // n)) AS BIGINT) AS credit_ppm
      |FROM u WHERE cnt > 0
      |GROUP BY 1""".stripMargin

  /** Mirrors GraphOps.kcorePeel: the same fixed peel rounds unrolled —
    * degree filter + both-endpoint membership per round.
    */
  val kcorePeel: String = {
    import graft.operators.GraphOps.{KCoreK, KCoreRounds}
    // MATERIALIZED per round: each CTE is referenced several times by
    // the next round, so default inlining would duplicate the whole
    // prefix 3^rounds times (observed as fd exhaustion on the leaf
    // parquet scans)
    val rounds = (1 to KCoreRounds)
      .map { r =>
        s"""d$r AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM (
           |  SELECT a AS n FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
           |k$r AS MATERIALIZED (SELECT n FROM d$r WHERE deg >= $KCoreK),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
           |        WHERE a IN (SELECT n FROM k$r) AND b IN (SELECT n FROM k$r)),
           |s$r AS (SELECT CAST($r AS BIGINT) AS round,
           |  (SELECT COUNT(*) FROM k$r) AS n_nodes,
           |  (SELECT COUNT(*) FROM e$r) AS n_edges)""".stripMargin
      }
      .mkString(",\n")
    val sel = (1 to KCoreRounds).map(r => s"SELECT * FROM s$r").mkString("\nUNION ALL\n")
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh),
       |$rounds
       |$sel""".stripMargin
  }

  /** Shared winnowing CTE chain (mirrors DedupOps.winnowed): 4-token
    * shingle 60-bit hashes, distinct minima of every 5-wide window.
    * Every derived integer is CAST to BIGINT (the HUGEINT-drift rule).
    */
  private val winnowedCte: String =
    """toks AS MATERIALIZED (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |hs AS (SELECT doc_id,
      |  list_transform(range(len(toks)-3),
      |   i -> CAST(CAST(concat('0x', substr(md5(
      |          array_to_string(toks[CAST(i+1 AS INT):CAST(i+4 AS INT)], ' ')), 1, 15))
      |        AS UBIGINT) AS BIGINT)) AS hs
      | FROM toks),
      |fp AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
      |  list_distinct(list_transform(range(len(hs)-4),
      |   i -> list_min(hs[CAST(i+1 AS INT):CAST(i+5 AS INT)]))) AS fps
      | FROM hs)""".stripMargin

  /** Mirrors DedupOps.winnowingFingerprints: per-doc selected-
    * fingerprint report, min/max coalesced to -1 so the columns stay
    * BIGINT.
    */
  val winnowingFingerprints: String =
    s"""WITH $winnowedCte
       |SELECT doc_id, n_shingles, CAST(len(fps) AS BIGINT) AS n_fps,
       | CAST(coalesce(list_min(fps), -1) AS BIGINT) AS min_fp,
       | CAST(coalesce(list_max(fps), -1) AS BIGINT) AS max_fp
       |FROM fp""".stripMargin

  /** Mirrors DedupOps.winnowingPairs: inverted-index join over the
    * winnowed fingerprints, 2..50 posting cap, top-25 with the full
    * (n_shared DESC, doc_a, doc_b) tie-break.
    */
  val winnowingPairs: String =
    s"""WITH $winnowedCte,
       |posts AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fpv FROM fp),
       |freq AS (SELECT fpv, COUNT(DISTINCT doc_id) AS nd FROM posts GROUP BY 1),
       |alive AS MATERIALIZED (SELECT doc_id, fpv FROM posts JOIN freq USING (fpv)
       |          WHERE nd >= 2 AND nd <= 50),
       |pairs AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           CAST(COUNT(*) AS BIGINT) AS n_shared
       |          FROM alive a JOIN alive b USING (fpv)
       |          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared FROM (
       | SELECT *, ROW_NUMBER() OVER (ORDER BY n_shared DESC, doc_a ASC, doc_b ASC) AS rnk
       | FROM pairs)
       |WHERE rnk <= 25""".stripMargin

  /** Mirrors TextOps.tokenBurstiness: per-(token, doc) counts, exact
    * cross-multiplied dispersion index in ppm, top-20 by count.
    */
  val tokenBurstiness: String =
    """WITH pd AS (
      | SELECT token, doc_id, COUNT(*) AS c FROM (
      |  SELECT doc_id,
      |   unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '')) AS token
      |  FROM documents)
      | GROUP BY 1, 2),
      |st AS MATERIALIZED (SELECT token, CAST(SUM(c) AS BIGINT) AS total_cnt,
      |        CAST(SUM(c*c) AS BIGINT) AS sum_sq, COUNT(*) AS doc_freq
      |       FROM pd GROUP BY 1),
      |d AS MATERIALIZED (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT token, total_cnt, doc_freq, n_docs,
      | CAST((n_docs * sum_sq - total_cnt * total_cnt) * 1000000
      |      // (n_docs * total_cnt) AS BIGINT) AS burstiness_ppm
      |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY total_cnt DESC, token ASC) AS rnk
      |      FROM st, d)
      |WHERE rnk <= 20""".stripMargin

  /** Mirrors TextOps.paddingWaste: the packing family's ASCII-only
    * tokenizer, per-source batches of 8 under doc_id vs length order,
    * per-batch pad-to-max, floor-div ppm waste.
    */
  val paddingWaste: String =
    """WITH d AS MATERIALIZED (
      | SELECT doc_id, source,
      |  CAST(len(regexp_extract_all(regexp_replace(text, '[^ -~]', ' ', 'g'),
      |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
      | FROM documents),
      |naive AS (
      | SELECT source, (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 8
      |         AS batch, n_tokens
      | FROM d),
      |srt AS (
      | SELECT source,
      |  (ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) - 1) // 8
      |         AS batch, n_tokens
      | FROM d),
      |nb AS (SELECT source, batch, COUNT(*) AS bn, MAX(n_tokens) AS mx,
      |        CAST(SUM(n_tokens) AS BIGINT) AS sm
      |       FROM naive GROUP BY 1, 2),
      |sb AS (SELECT source, batch, COUNT(*) AS bn, MAX(n_tokens) AS mx,
      |        CAST(SUM(n_tokens) AS BIGINT) AS sm
      |       FROM srt GROUP BY 1, 2),
      |agg AS (
      | SELECT source, 'naive' AS strategy, COUNT(*) AS n_batches,
      |  CAST(SUM(sm) AS BIGINT) AS total_tokens, CAST(SUM(bn * mx) AS BIGINT) AS padded_tokens
      | FROM nb GROUP BY 1
      | UNION ALL
      | SELECT source, 'sorted' AS strategy, COUNT(*) AS n_batches,
      |  CAST(SUM(sm) AS BIGINT) AS total_tokens, CAST(SUM(bn * mx) AS BIGINT) AS padded_tokens
      | FROM sb GROUP BY 1)
      |SELECT source, strategy, n_batches, total_tokens, padded_tokens,
      | CAST((padded_tokens - total_tokens) * 1000000 // padded_tokens AS BIGINT) AS waste_ppm
      |FROM agg""".stripMargin

  /** Mirrors TextOps.weightedSample: 32-bit md5 coin over the doc id,
    * int64 priority (coin·10⁸) // (n_chars+1), 5 smallest per source.
    */
  val weightedSample: String =
    """WITH p AS MATERIALIZED (
      | SELECT source, doc_id, n_chars,
      |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
      |    * 100000000 // (n_chars + 1) AS BIGINT) AS priority
      | FROM documents)
      |SELECT source, rank, doc_id, n_chars, priority FROM (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |   ORDER BY priority ASC, doc_id ASC) AS rank
      | FROM p)
      |WHERE rank <= 5""".stripMargin

  /** Mirrors DedupOps.ngramDupRate: sliding 8-token grams, 60-bit md5
    * fingerprints, per-source distinct/singleton/excess-occurrence
    * rollup in exact integers.
    */
  val ngramDupRate: String =
    """WITH toks AS MATERIALIZED (
      | SELECT source, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |g AS MATERIALIZED (
      | SELECT source,
      |  unnest(list_transform(range(len(toks)-7),
      |   i -> CAST(CAST(concat('0x', substr(md5(
      |          array_to_string(toks[CAST(i+1 AS INT):CAST(i+8 AS INT)], ' ')), 1, 15))
      |        AS UBIGINT) AS BIGINT))) AS fp
      | FROM toks WHERE len(toks) >= 8),
      |c AS MATERIALIZED (SELECT source, fp, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      |r AS MATERIALIZED (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total_grams,
      |        COUNT(*) AS distinct_grams,
      |        CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singleton_grams
      |      FROM c GROUP BY 1)
      |SELECT source, total_grams, distinct_grams, singleton_grams,
      | CAST((total_grams - distinct_grams) * 1000000 // total_grams AS BIGINT) AS dup_ppm
      |FROM r""".stripMargin

  /** Mirrors EventOps.kAnonymity: QI = (event_type, epoch-hour mod 24,
    * decimal centi-value // 5000), k = distinct users per class,
    * per-type risk rollup at the k<5 line.
    */
  val kAnonymity: String =
    """WITH q AS MATERIALIZED (
      | SELECT event_type,
      |  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000 AS value_band,
      |  user_id
      | FROM events),
      |cls AS (
      | SELECT event_type, hour_of_day, value_band,
      |  COUNT(DISTINCT user_id) AS k, COUNT(*) AS n_rows
      | FROM q GROUP BY 1, 2, 3)
      |SELECT event_type, COUNT(*) AS n_classes, CAST(MIN(k) AS BIGINT) AS min_k,
      | CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS risky_classes,
      | CAST(SUM(CASE WHEN k < 5 THEN n_rows ELSE 0 END) AS BIGINT) AS risky_rows,
      | CAST(SUM(CASE WHEN k < 5 THEN n_rows ELSE 0 END) * 1000000
      |      // SUM(n_rows) AS BIGINT) AS suppress_ppm
      |FROM cls GROUP BY 1""".stripMargin

  /** Mirrors EventOps.lDiversity: same QI classes, l = distinct
    * sensitive `$.k` prop values per class, homogeneity rollup.
    */
  val lDiversity: String =
    """WITH q AS MATERIALIZED (
      | SELECT event_type,
      |  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000 AS value_band,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS sensitive
      | FROM events),
      |cls AS (
      | SELECT event_type, hour_of_day, value_band,
      |  COUNT(DISTINCT sensitive) AS l, COUNT(*) AS n_rows
      | FROM q GROUP BY 1, 2, 3)
      |SELECT event_type, COUNT(*) AS n_classes, CAST(MIN(l) AS BIGINT) AS min_l,
      | CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS homogeneous_classes,
      | CAST(SUM(CASE WHEN l = 1 THEN n_rows ELSE 0 END) AS BIGINT) AS homogeneous_rows,
      | CAST(SUM(CASE WHEN l < 3 THEN n_rows ELSE 0 END) * 1000000
      |      // SUM(n_rows) AS BIGINT) AS low_div_ppm
      |FROM cls GROUP BY 1""".stripMargin

  /** Mirrors EventOps.mannWhitneyDrift: centi-bin counts, midrank
    * 2·R_a accumulation per type pair, u2 = 2·U_a exact; one IEEE
    * division for the AUC.
    */
  val mannWhitneyDrift: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vb FROM events),
      |bins AS MATERIALIZED (SELECT event_type, vb, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
      |tot AS MATERIALIZED (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM bins GROUP BY 1),
      |pairs AS MATERIALIZED (SELECT a.event_type AS type_a, a.n AS n_a, b.event_type AS type_b, b.n AS n_b
      |          FROM tot a, tot b WHERE a.event_type < b.event_type),
      |u AS (
      | SELECT type_a, type_b, n_a, n_b, vb, SUM(a_v) AS a_v, SUM(b_v) AS b_v
      | FROM (
      |  SELECT p.type_a, p.type_b, p.n_a, p.n_b, bn.vb, bn.cnt AS a_v, 0 AS b_v
      |  FROM bins bn JOIN pairs p ON bn.event_type = p.type_a
      |  UNION ALL
      |  SELECT p.type_a, p.type_b, p.n_a, p.n_b, bn.vb, 0, bn.cnt
      |  FROM bins bn JOIN pairs p ON bn.event_type = p.type_b)
      | GROUP BY 1, 2, 3, 4, 5),
      |w AS MATERIALIZED (
      | SELECT *, a_v + b_v AS m_v,
      |  COALESCE(SUM(a_v + b_v) OVER (PARTITION BY type_a, type_b ORDER BY vb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_before
      | FROM u),
      |r AS MATERIALIZED (
      | SELECT type_a, type_b, n_a, n_b,
      |  CAST(SUM(a_v * (2 * c_before + m_v + 1)) - n_a * (n_a + 1) AS BIGINT) AS u2_a
      | FROM w GROUP BY 1, 2, 3, 4)
      |SELECT type_a, type_b, n_a, n_b, u2_a,
      | CAST(u2_a AS DOUBLE) /
      |   ((2.0 * CAST(n_a AS DOUBLE)) * CAST(n_b AS DOUBLE)) AS auc_a
      |FROM r""".stripMargin

  /** Mirrors TextOps.keynessTerms: (lang, token) counts, 2×2 margins,
    * add-one smoothed odds ratio as exact floor-div ppm, top-5 per
    * lang.
    */
  val keynessTerms: String =
    """WITH c AS MATERIALIZED (
      | SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '')) AS token
      | FROM documents),
      |cnt AS MATERIALIZED (SELECT lang, token, COUNT(*) AS a FROM c GROUP BY 1, 2),
      |tt AS (SELECT token, CAST(SUM(a) AS BIGINT) AS tok_total FROM cnt GROUP BY 1),
      |lt AS (SELECT lang, CAST(SUM(a) AS BIGINT) AS lang_total FROM cnt GROUP BY 1),
      |g AS MATERIALIZED (SELECT CAST(SUM(a) AS BIGINT) AS grand FROM cnt),
      |m AS MATERIALIZED (
      | SELECT lang, token, a, tok_total - a AS b, lang_total - a AS c,
      |  grand - tok_total - lang_total + a AS d
      | FROM cnt JOIN tt USING (token) JOIN lt USING (lang), g),
      |o AS MATERIALIZED (
      | SELECT lang, token, a, b, c, d,
      |  CAST(((CAST(a AS HUGEINT) + 1) * (CAST(d AS HUGEINT) + 1) * 1000000)
      |       // ((CAST(b AS HUGEINT) + 1) * (CAST(c AS HUGEINT) + 1)) AS BIGINT) AS or_ppm
      | FROM m)
      |SELECT lang, rnk, token, CAST(a AS BIGINT) AS a, b, c, d, or_ppm FROM (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
      |   ORDER BY or_ppm DESC, token ASC) AS rnk
      | FROM o)
      |WHERE rnk <= 5""".stripMargin

  /** Mirrors EventOps.bootstrapMeans: md5(event_id:r) mod 10⁴ coin,
    * Poisson(1) cumulative ladder, exact integer weighted sums, one
    * IEEE division for the replica mean.
    */
  val bootstrapMeans: String =
    """WITH e AS MATERIALIZED (
      | SELECT event_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
      |  unnest(range(16)) AS replica
      | FROM events),
      |w AS MATERIALIZED (
      | SELECT event_type, CAST(replica AS BIGINT) AS replica, vc,
      |  CASE WHEN coin < 3679 THEN 0 WHEN coin < 7358 THEN 1
      |       WHEN coin < 9197 THEN 2 WHEN coin < 9810 THEN 3
      |       WHEN coin < 9963 THEN 4 WHEN coin < 9994 THEN 5
      |       ELSE 6 END AS w
      | FROM (SELECT *,
      |        CAST(CAST(concat('0x', substr(md5(concat(CAST(event_id AS VARCHAR), ':',
      |          CAST(replica AS VARCHAR))), 1, 15)) AS UBIGINT) % 10000 AS BIGINT) AS coin
      |       FROM e)),
      |agg AS (
      | SELECT event_type, replica, CAST(SUM(w) AS BIGINT) AS w_count,
      |  CAST(SUM(w * vc) AS BIGINT) AS w_sum_c
      | FROM w GROUP BY 1, 2)
      |SELECT event_type, replica, w_count, w_sum_c,
      | CAST(w_sum_c AS DOUBLE) / CAST(w_count AS DOUBLE) AS mean_c
      |FROM agg""".stripMargin

  /** Mirrors EventOps.mannKendallTrend: daily centi-mean series,
    * cross-multiplied sign pairs, per-day tie counts, 18·Var(S).
    */
  val mannKendallTrend: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sc,
      |  COUNT(*) AS n
      | FROM events GROUP BY 1, 2),
      |p AS MATERIALIZED (
      | SELECT a.event_type,
      |  CASE WHEN CAST(b.sc AS HUGEINT) * a.n > CAST(a.sc AS HUGEINT) * b.n THEN 1
      |       WHEN CAST(b.sc AS HUGEINT) * a.n < CAST(a.sc AS HUGEINT) * b.n THEN -1
      |       ELSE 0 END AS sgn
      | FROM daily a JOIN daily b USING (event_type)
      | WHERE a.day < b.day),
      |s AS MATERIALIZED (SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat FROM p GROUP BY 1),
      |t AS MATERIALIZED (
      | SELECT event_type, day_a, COUNT(*) AS t_day FROM (
      |  SELECT a.event_type, a.day AS day_a
      |  FROM daily a JOIN daily b USING (event_type)
      |  WHERE CAST(a.sc AS HUGEINT) * b.n = CAST(b.sc AS HUGEINT) * a.n)
      | GROUP BY 1, 2),
      |ties AS (
      | SELECT event_type, COUNT(*) AS n_days,
      |  CAST(SUM((t_day - 1) * (t_day * 2 + 5)) AS BIGINT) AS tie_sum
      | FROM t GROUP BY 1)
      |SELECT event_type, n_days, s_stat,
      | CAST(n_days * (n_days - 1) * (n_days * 2 + 5) - tie_sum AS BIGINT) AS var18,
      | CAST(CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END AS BIGINT)
      |   AS trend_sign
      |FROM ties JOIN s USING (event_type)""".stripMargin

  /** Mirrors GraphOps.referralDepth with DuckDB's ACTUAL recursive
    * CTE — the gate proves the pointer-doubling rewrite equals
    * textbook level-at-a-time recursion.
    */
  val referralDepth: String =
    """WITH RECURSIVE par AS (
      | SELECT c_custkey AS node,
      |  CAST(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
      |       AS UBIGINT) % CAST(c_custkey AS UBIGINT) AS BIGINT) AS parent
      | FROM customer WHERE c_custkey > 0),
      |dep AS (
      | SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
      | UNION ALL
      | SELECT p.node, d.depth + 1 FROM par p JOIN dep d ON p.parent = d.node)
      |SELECT depth, COUNT(*) AS n_nodes FROM dep GROUP BY 1""".stripMargin

  /** Mirrors DedupOps.spanRewrite: 8-token grid blocks (original
    * token case), drop every cross-doc duplicated block, rebuild
    * kept blocks in order + the remainder tokens, single-space join.
    */
  val spanRewrite: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id, list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |blocks AS MATERIALIZED (
      | SELECT doc_id, i AS k,
      |  array_to_string(toks[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ') AS block
      | FROM (SELECT doc_id, toks, unnest(range(len(toks) // 8)) AS i FROM toks)),
      |fpb AS MATERIALIZED (SELECT doc_id, k, block,
      |        CAST(CAST(concat('0x', substr(md5(block), 1, 15)) AS UBIGINT) AS BIGINT) AS fp
      |       FROM blocks),
      |nd AS MATERIALIZED (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM fpb GROUP BY 1),
      |kept AS MATERIALIZED (
      | SELECT doc_id, COUNT(*) AS n_blocks,
      |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_blocks,
      |  string_agg(CASE WHEN nd = 1 THEN block END, ' ' ORDER BY k) AS kept_text
      | FROM fpb JOIN nd USING (fp) GROUP BY doc_id),
      |base AS (
      | SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  array_to_string(toks[CAST(len(toks)//8*8+1 AS INT):CAST(len(toks) AS INT)], ' ')
      |    AS remainder
      | FROM toks)
      |SELECT b.doc_id, n_tokens,
      | COALESCE(n_blocks, 0) AS n_blocks,
      | COALESCE(n_dropped_blocks, 0) AS n_dropped_blocks,
      | trim(concat_ws(' ', COALESCE(kept_text, ''), remainder)) AS clean_text,
      | n_tokens - COALESCE(n_dropped_blocks, 0) * 8 AS clean_tokens
      |FROM base b LEFT JOIN kept USING (doc_id)""".stripMargin

  /** Mirrors EventOps.kllSources: the oracle re-derives each rollup
    * scope's row count and asserts the rank certificates TRUE (sketch
    * contents are merge-order-specific; the certificate is the
    * engine-portable claim — the kllValueQuantiles convention).
    */
  val kllSources: String =
    """SELECT COALESCE(event_type, 'ALL') AS scope, CAST(COUNT(*) AS BIGINT) AS n_rows,
      | TRUE AS p50_ok, TRUE AS p90_ok
      |FROM events GROUP BY ROLLUP(event_type)""".stripMargin

  /** Mirrors DedupOps.cdcChunks: boundary after tokens whose 60-bit
    * md5 hash ≡ 0 mod 8, exclusive prefix-sum chunk ids, md5 of the
    * pos-ordered space-joined chunk text, per-source dup rollup.
    */
  val cdcChunks: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id, source,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |p AS MATERIALIZED (
      | SELECT doc_id, source,
      |  unnest(list_transform(range(len(toks)),
      |    i -> struct_pack(pos := i, tok := toks[CAST(i + 1 AS INT)]))) AS s
      | FROM toks),
      |t AS MATERIALIZED (
      | SELECT doc_id, source, s.pos AS pos, s.tok AS tok,
      |  CASE WHEN CAST(concat('0x', substr(md5(s.tok), 1, 15)) AS UBIGINT) % 8 = 0
      |       THEN 1 ELSE 0 END AS b
      | FROM p),
      |c AS MATERIALIZED (
      | SELECT doc_id, source, pos, tok,
      |  COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      | FROM t),
      |ch AS MATERIALIZED (
      | SELECT doc_id, source, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
      |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chash
      | FROM c GROUP BY 1, 2, 3),
      |f AS MATERIALIZED (SELECT chash, COUNT(*) AS nc FROM ch GROUP BY 1),
      |r AS MATERIALIZED (
      | SELECT source, COUNT(*) AS n_chunks, CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
      |  MAX(n_toks) AS max_chunk_tokens,
      |  CAST(SUM(CASE WHEN nc >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks
      | FROM ch JOIN f USING (chash) GROUP BY 1)
      |SELECT source, n_chunks, total_tokens, max_chunk_tokens,
      | CAST(total_tokens * 1000000 // n_chunks AS BIGINT) AS mean_len_ppm,
      | CAST(dup_chunks * 1000000 // n_chunks AS BIGINT) AS dup_ppm
      |FROM r""".stripMargin

  /** Mirrors EventOps.cramersV: (type, weekday, hour) cube, full
    * margin grid per attribute pair (zero cells included),
    * cross-multiplied per-cell floor-div chi-squared ppm, V as the
    * single float.
    */
  val cramersV: String = {
    def pairSql(name: String, x: String, y: String): String =
      s"""SELECT '$name' AS attr_pair, n_rows, dof, chi2_ppm,
         | sqrt(CAST(chi2_ppm AS DOUBLE) / 1000000.0 /
         |      CAST(n_rows * LEAST(nr - 1, nc - 1) AS DOUBLE)) AS cramers_v
         |FROM (
         | WITH p AS MATERIALIZED (SELECT CAST($x AS VARCHAR) AS x, CAST($y AS VARCHAR) AS y,
         |             CAST(SUM(cnt) AS BIGINT) AS o FROM cube GROUP BY 1, 2),
         | r AS MATERIALIZED (SELECT x, CAST(SUM(o) AS BIGINT) AS r FROM p GROUP BY 1),
         | c AS MATERIALIZED (SELECT y, CAST(SUM(o) AS BIGINT) AS c FROM p GROUP BY 1),
         | nn AS MATERIALIZED (SELECT CAST(SUM(o) AS BIGINT) AS n, COUNT(DISTINCT x) AS nr,
         |         COUNT(DISTINCT y) AS nc FROM p),
         | g AS MATERIALIZED (SELECT r.x, c.y, r.r, c.c, COALESCE(p.o, 0) AS o
         |       FROM r CROSS JOIN c LEFT JOIN p USING (x, y))
         | SELECT any_value(n) AS n_rows, any_value((nr - 1) * (nc - 1)) AS dof,
         |  any_value(nr) AS nr, any_value(nc) AS nc,
         |  CAST(SUM((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) *
         |           (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) * 1000000
         |          // (CAST(r AS HUGEINT) * c * n)) AS BIGINT) AS chi2_ppm
         | FROM g, nn)""".stripMargin
    s"""WITH e AS MATERIALIZED (
       | SELECT event_type,
       |  (epoch_us(ts) // 86400000000 + 4) % 7 AS weekday,
       |  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day
       | FROM events),
       |cube AS MATERIALIZED (SELECT event_type, weekday, hour_of_day, COUNT(*) AS cnt
       |         FROM e GROUP BY 1, 2, 3)
       |${pairSql("type_x_weekday", "event_type", "weekday")}
       |UNION ALL
       |${pairSql("type_x_hour", "event_type", "hour_of_day")}
       |UNION ALL
       |${pairSql("weekday_x_hour", "weekday", "hour_of_day")}""".stripMargin
  }

  /** Mirrors MultimodalOps.imagePixelStats: the Spark side ENCODES a
    * grayscale PNG from the deterministic pixel formula and reads the
    * emitted numbers back from the DECODED raster (javax.imageio);
    * this oracle recomputes the same numbers relationally — the gate
    * fails iff the real encode→decode round trip misreads a pixel.
    */
  val imagePixelStats: String =
    """SELECT d.doc_id AS media_id,
      | CAST(8 + d.doc_id % 8 AS BIGINT) AS width,
      | CAST(8 + d.doc_id % 5 AS BIGINT) AS height,
      | CAST(COUNT(*) AS BIGINT) AS n_pixels,
      | CAST(SUM((d.doc_id * 31 + 7 * t.x + 13 * u.y) % 256) AS BIGINT) AS pixel_sum
      |FROM documents d, range(16) t(x), range(13) u(y)
      |WHERE t.x < 8 + d.doc_id % 8 AND u.y < 8 + d.doc_id % 5
      |GROUP BY d.doc_id""".stripMargin

  /** Mirrors RelationalOps.giniInequality: ascending strict-order
    * rank, G = (2·Σ i·x − (n+1)·Σx)/(n·Σx) in exact HUGEINT,
    * floor-div ppm. Numerator non-negative (Chebyshev ordering), so
    * floor == trunc in both engines. HUGEINT (not DECIMAL) for the
    * division deliberately: DuckDB's `//` on DECIMAL operands ROUNDS
    * the quotient (measured: 49033.9997 → 49034) where HUGEINT `//`
    * and Spark's decimal DIV both floor — the one seam this query
    * crosses.
    */
  val giniInequality: String =
    """WITH spend AS (
      | SELECT o_custkey,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      | FROM orders GROUP BY 1),
      |rs AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rnk FROM spend),
      |gs AS (SELECT COUNT(*) AS n, SUM(x) AS s0, SUM(CAST(x AS DECIMAL(38,0)) * rnk) AS s1
      |       FROM rs),
      |toks AS MATERIALIZED (
      | SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '')) AS token
      | FROM documents),
      |freq AS (SELECT token, COUNT(*) AS x FROM toks GROUP BY token),
      |rt AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, token) AS rnk FROM freq),
      |gt AS (SELECT COUNT(*) AS n, SUM(x) AS s0, SUM(CAST(x AS DECIMAL(38,0)) * rnk) AS s1
      |       FROM rt)
      |SELECT 'customer_spend' AS subject, CAST(n AS BIGINT) AS n, CAST(s0 AS BIGINT) AS total,
      | CAST((2 * CAST(s1 AS HUGEINT) - (n + 1) * CAST(s0 AS HUGEINT)) * 1000000
      |      // (CAST(n AS HUGEINT) * CAST(s0 AS HUGEINT)) AS BIGINT) AS gini_ppm
      |FROM gs
      |UNION ALL
      |SELECT 'token_freq', CAST(n AS BIGINT), CAST(s0 AS BIGINT),
      | CAST((2 * CAST(s1 AS HUGEINT) - (n + 1) * CAST(s0 AS HUGEINT)) * 1000000
      |      // (CAST(n AS HUGEINT) * CAST(s0 AS HUGEINT)) AS BIGINT)
      |FROM gt""".stripMargin

  /** Mirrors EventOps.columnProfile: per-column counts over the raw
    * events table; ts distinct equals the ns-long distinct (the
    * normalization is a bijection); props_k via DuckDB's JSON
    * extraction (digit strings — engine-identical).
    */
  val columnProfile: String =
    """SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
      | CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
      | CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
      |UNION ALL
      |SELECT 'ts', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(ts) AS BIGINT),
      | CAST(COUNT(DISTINCT ts) AS BIGINT) FROM events
      |UNION ALL
      |SELECT 'user_id', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
      | CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
      |UNION ALL
      |SELECT 'event_type', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
      | CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events
      |UNION ALL
      |SELECT 'value', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(value) AS BIGINT),
      | CAST(COUNT(DISTINCT value) AS BIGINT) FROM events
      |UNION ALL
      |SELECT 'props', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(props) AS BIGINT),
      | CAST(COUNT(DISTINCT props) AS BIGINT) FROM events
      |UNION ALL
      |SELECT 'props_k', CAST(COUNT(*) AS BIGINT),
      | CAST(COUNT(*) - COUNT(json_extract_string(props, '$.k')) AS BIGINT),
      | CAST(COUNT(DISTINCT json_extract_string(props, '$.k')) AS BIGINT) FROM events""".stripMargin

  /** Mirrors TextOps.massShards: the engine-stable pack tokenizer,
    * global prefix sum in doc_id order, shard = floor(start·S/total).
    * HUGEINT division (DECIMAL `//` rounds in DuckDB — the
    * gini_inequality seam).
    */
  val massShards: String =
    """WITH d AS MATERIALIZED (
      | SELECT doc_id,
      |  CAST(len(regexp_extract_all(regexp_replace(text, '[^ -~]', ' ', 'g'),
      |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_toks
      | FROM documents),
      |c AS MATERIALIZED (
      | SELECT doc_id, n_toks,
      |  SUM(n_toks) OVER (ORDER BY doc_id) AS cum,
      |  SUM(n_toks) OVER () AS total
      | FROM d)
      |SELECT CAST(CAST(cum - n_toks AS HUGEINT) * 10 // GREATEST(total, 1) AS BIGINT)
      |  AS shard,
      | CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM(n_toks) AS BIGINT) AS mass,
      | MIN(doc_id) AS first_doc,
      | MAX(doc_id) AS last_doc,
      | CAST(CAST(SUM(n_toks) AS HUGEINT) * 1000000 // GREATEST(MAX(total), 1) AS BIGINT)
      |  AS mass_ppm
      |FROM c
      |GROUP BY 1""".stripMargin

  /** Mirrors DedupOps.ensemblePairs by composing the three pair-set
    * oracles verbatim as derived tables (each keeps its own WITH
    * scope) — the audit's truth is exactly the gates' truth.
    */
  val ensemblePairs: String = {
    def cmp(na: String, a: String, nb: String, b: String): String =
      s"""SELECT '$na' AS method_a, '$nb' AS method_b,
         | CAST((SELECT COUNT(*) FROM $a) AS BIGINT) AS n_a,
         | CAST((SELECT COUNT(*) FROM $b) AS BIGINT) AS n_b,
         | CAST((SELECT COUNT(*) FROM $a JOIN $b USING (doc_a, doc_b)) AS BIGINT) AS n_both""".stripMargin
    s"""WITH m AS MATERIALIZED (SELECT doc_a, doc_b FROM (${Oracles2.minhashLsh}) mq),
       |g AS MATERIALIZED (SELECT doc_a, doc_b FROM (${Oracles2.ngramJaccard}) gq),
       |s AS MATERIALIZED (SELECT doc_a, doc_b FROM ($sortedNeighborhood) sq)
       |${cmp("minhash", "m", "ngram", "g")}
       |UNION ALL
       |${cmp("minhash", "m", "snm", "s")}
       |UNION ALL
       |${cmp("ngram", "g", "snm", "s")}""".stripMargin
  }

  /** Mirrors MultimodalOps.wavStats: the PCM formula recomputed
    * relationally; the Spark side must read identical integers back
    * out of a real WAV encode→decode round trip.
    */
  val wavStats: String =
    """SELECT d.doc_id AS media_id,
      | CAST(64 + d.doc_id % 64 AS BIGINT) AS n_samples,
      | CAST(8000 AS BIGINT) AS sample_rate,
      | CAST(SUM(ABS((d.doc_id * 131 + 17 * t.x) % 65536 - 32768)) AS BIGINT) AS abs_sum
      |FROM documents d, range(128) t(x)
      |WHERE t.x < 64 + d.doc_id % 64
      |GROUP BY d.doc_id""".stripMargin

  /** Mirrors TextOps.contentSplit: cluster labels via the recursive-CC
    * oracle chain (the dedupClusters oracle verbatim), then both split
    * assignments from the shared md5-bucket function.
    */
  val contentSplit: String = {
    def splitCase(x: String): String =
      s"""CASE WHEN CAST(CAST(concat('0x', substr(md5(CAST($x AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 80 THEN 'train'
         |     WHEN CAST(CAST(concat('0x', substr(md5(CAST($x AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 90 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh
       |          UNION SELECT doc_b AS a, doc_a AS b FROM mh),
       |reach(a, b) AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
       |d AS MATERIALIZED (SELECT doc_id, COALESCE(comp.label, doc_id) AS ckey
       |      FROM documents LEFT JOIN comp ON documents.doc_id = comp.doc),
       |s AS MATERIALIZED (SELECT ${splitCase("doc_id")} AS id_split,
       |             ${splitCase("ckey")} AS content_split
       |      FROM d)
       |SELECT id_split, content_split, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM s GROUP BY 1, 2""".stripMargin
  }

  /** Mirrors LayoutOps.hilbertLayout: the 10 quadrant-resolve levels
    * of the xy→d Hilbert algorithm, each level one generated CTE
    * stage (rx/ry from the CURRENT (hx, hy), then flip+swap) — the
    * same integer sequence the codegen expression executes.
    */
  val hilbertLayout: String = {
    val stages = (0 until 10).map { lvl =>
      val s = 1L << (9 - lvl)
      s"""h${lvl + 1} AS (
         | SELECT x, y,
         |  CASE WHEN (hy & $s) = 0
         |       THEN CASE WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END
         |       ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0
         |       THEN CASE WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END
         |       ELSE hy END AS hy,
         |  d + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
         |                     (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS d
         | FROM h$lvl)""".stripMargin
    }.mkString(",\n")
    val shift = graft.operators.LayoutOps.ZBucketShift
    s"""WITH dims AS MATERIALIZED (
       | SELECT o_custkey % 1024 AS x,
       |        (CAST(epoch(o_orderdate) AS BIGINT) // 86400) % 1024 AS y
       | FROM orders),
       |h0 AS (SELECT x, y, x AS hx, y AS hy, CAST(0 AS BIGINT) AS d FROM dims),
       |$stages
       |SELECT d // ${1L << shift} AS h_bucket, COUNT(*) AS n_rows,
       | MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
       | MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span
       |FROM h10 GROUP BY 1""".stripMargin
  }

  /** Mirrors DedupOps.dedupSavings: each method's removable mass
    * re-derived from its own oracle chain (exact fingerprints,
    * recursive-CC clusters, span block fingerprints, CDC chunk
    * hashes) — CTEs renamed to avoid collisions across the four
    * composed pipelines.
    */
  val dedupSavings: String =
    s"""WITH RECURSIVE
       |tc AS MATERIALIZED (
       | SELECT doc_id,
       |  CAST(len(regexp_extract_all(regexp_replace(text, '[^ -~]', ' ', 'g'),
       |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_toks
       | FROM documents),
       |fps AS (SELECT doc_id,
       |         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |        FROM documents),
       |ex AS MATERIALIZED (SELECT doc_id FROM (
       |        SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS k FROM fps)
       |       WHERE NOT k),
       |mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh
       |          UNION SELECT doc_b AS a, doc_a AS b FROM mh),
       |reach(a, b) AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
       |nearx AS MATERIALIZED (SELECT doc AS doc_id FROM comp WHERE doc <> label),
       |stoks AS (
       | SELECT doc_id, list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |sblocks AS (
       | SELECT doc_id,
       |  array_to_string(toks[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ') AS block
       | FROM (SELECT doc_id, toks, unnest(range(len(toks) // 8)) AS i FROM stoks)),
       |sfpb AS MATERIALIZED (SELECT doc_id, block,
       |        CAST(CAST(concat('0x', substr(md5(block), 1, 15)) AS UBIGINT) AS BIGINT) AS fp
       |       FROM sblocks),
       |snd AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM sfpb GROUP BY 1),
       |spansave AS (
       | SELECT CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN 8 ELSE 0 END), 0) AS BIGINT) AS t
       | FROM sfpb JOIN snd USING (fp)),
       |ctoks AS (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |cp AS (
       | SELECT doc_id,
       |  unnest(list_transform(range(len(toks)),
       |    i -> struct_pack(pos := i, tok := toks[CAST(i + 1 AS INT)]))) AS s
       | FROM ctoks),
       |ct AS MATERIALIZED (
       | SELECT doc_id, s.pos AS pos, s.tok AS tok,
       |  CASE WHEN CAST(concat('0x', substr(md5(s.tok), 1, 15)) AS UBIGINT) % 8 = 0
       |       THEN 1 ELSE 0 END AS b
       | FROM cp),
       |cc AS MATERIALIZED (
       | SELECT doc_id, pos, tok,
       |  COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       | FROM ct),
       |cch AS (
       | SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
       |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chash
       | FROM cc GROUP BY 1, 2),
       |chunksave AS (
       | SELECT CAST(COALESCE(SUM((nc - 1) * nt), 0) AS BIGINT) AS t
       | FROM (SELECT chash, COUNT(*) AS nc, MIN(n_toks) AS nt FROM cch GROUP BY 1))
       |SELECT 'exact' AS method,
       | CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_docs_removed,
       | CAST(COALESCE((SELECT SUM(n_toks) FROM ex JOIN tc USING (doc_id)), 0) AS BIGINT)
       |  AS n_tokens_removed
       |UNION ALL
       |SELECT 'near',
       | CAST((SELECT COUNT(*) FROM nearx) AS BIGINT),
       | CAST(COALESCE((SELECT SUM(n_toks) FROM nearx JOIN tc USING (doc_id)), 0) AS BIGINT)
       |UNION ALL
       |SELECT 'span', CAST(0 AS BIGINT), (SELECT t FROM spansave)
       |UNION ALL
       |SELECT 'chunk', CAST(0 AS BIGINT), (SELECT t FROM chunksave)""".stripMargin

  /** Mirrors SimilarityOps.annRecall by composing the three top-k
    * oracles verbatim; HUGEINT division (DECIMAL `//` rounds).
    */
  val annRecall: String = {
    def row(m: String, t: String): String =
      s"""SELECT '$m' AS method,
         | CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_truth,
         | CAST((SELECT COUNT(*) FROM $t) AS BIGINT) AS n_approx,
         | CAST((SELECT COUNT(*) FROM tr JOIN $t USING (query_id, neighbor_id)) AS BIGINT)
         |  AS n_hits,
         | CAST(CAST((SELECT COUNT(*) FROM tr JOIN $t USING (query_id, neighbor_id))
         |      AS HUGEINT) * 1000000 // (SELECT COUNT(*) FROM tr) AS BIGINT) AS recall_ppm""".stripMargin
    s"""WITH tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${Oracles2.annTopkBruteforce}) tq),
       |iv AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${Oracles2.annTopkIvf}) iq),
       |ls AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${Oracles2.annTopkLsh}) lq)
       |${row("ivf", "iv")}
       |UNION ALL
       |${row("lsh", "ls")}""".stripMargin
  }

  /** Mirrors DedupOps.simhashCalibration: the simhash-pair oracle
    * composed with the shingle postings; per-hamming integer overlap
    * sums (missing postings default 0 exactly as the Spark left
    * joins do).
    */
  val simhashCalibration: String =
    s"""WITH ${Oracles2.shinglesCte},
       |posting AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |cnts AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM posting GROUP BY 1),
       |prs AS MATERIALIZED (SELECT doc_a, doc_b, hamming FROM (${Oracles2.simhashPairs}) pq),
       |shr AS (
       | SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
       | FROM prs p
       | JOIN posting pa ON pa.doc_id = p.doc_a
       | JOIN posting pb ON pb.doc_id = p.doc_b AND pb.shingle = pa.shingle
       | GROUP BY 1, 2)
       |SELECT hamming,
       | CAST(COUNT(*) AS BIGINT) AS n_pairs,
       | CAST(COUNT(n_shared) AS BIGINT) AS n_overlapping,
       | CAST(COALESCE(SUM(COALESCE(n_shared, 0)), 0) AS BIGINT) AS sum_shared,
       | CAST(COALESCE(SUM(COALESCE(ca.n_sh, 0) + COALESCE(cb.n_sh, 0)
       |   - COALESCE(n_shared, 0)), 0) AS BIGINT) AS sum_union
       |FROM prs
       |LEFT JOIN shr USING (doc_a, doc_b)
       |LEFT JOIN cnts ca ON ca.doc_id = prs.doc_a
       |LEFT JOIN cnts cb ON cb.doc_id = prs.doc_b
       |GROUP BY hamming""".stripMargin
}
