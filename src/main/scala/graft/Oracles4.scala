package graft

/** DuckDB oracle SQL for the round-3 additions (session windows,
  * navigation windows, PMI collocations, span dedup, …). Same parity
  * conventions as SparkEntry/Oracles2/Oracles3: identical column
  * aliases, BIGINT derived ints (DuckDB SUM(BIGINT) is HUGEINT —
  * always cast back), DECIMAL(38,10)→VARCHAR→DOUBLE for cross-row
  * double sums, epoch integers for timestamps.
  */
object Oracles4 {

  /** Gaps-and-islands twin of the built-in session_window aggregate.
    * Boundary rule mirrors Spark's merge semantics (pinned by the
    * boundary spec): an event exactly AT the current window's end
    * still merges — a new session needs gap STRICTLY > 30 min; window
    * end = last event + gap. Tied µs timestamps are safe without a
    * tiebreak: the tied pair's gap is 0 either way, so session
    * membership is order-independent.
    */
  val sessionWindowAgg: String =
    """WITH e AS MATERIALIZED (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      |b AS MATERIALIZED (SELECT user_id, ts_us, value,
      |  CASE WHEN lag(ts_us) OVER w IS NULL
      |            OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |s AS MATERIALIZED (SELECT user_id, ts_us, value,
      |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
      | FROM b)
      |SELECT user_id, MIN(ts_us) AS start_us,
      | MAX(ts_us) + 1800000000 AS end_us,
      | COUNT(*) AS n_events,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin

  val orderGaps: String =
    """SELECT o_custkey, o_orderkey, epoch_day, o_totalprice,
      | CAST(ROW_NUMBER() OVER w AS BIGINT) AS idx,
      | epoch_day - LAG(epoch_day) OVER w AS prev_gap_days,
      | LEAD(epoch_day) OVER w - epoch_day AS next_gap_days,
      | FIRST_VALUE(o_totalprice)
      |  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
      | LAST_VALUE(o_totalprice)
      |  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      |FROM (SELECT o_custkey, o_orderkey,
      |       CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS epoch_day, o_totalprice
      |      FROM orders WHERE o_custkey < 200)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_day ASC, o_orderkey ASC)""".stripMargin

  /** Unigram counts are over bigram POSITIONS (each bigram contributes
    * its head and its tail), so P(a) and P(a,b) share one sample space;
    * lift = n_ab * t_pos / (n_a * n_b), emitted as the double quotient
    * of exact BIGINT products — mirrored in TextOps.pmiPairs.
    */
  val pmiPairs: String =
    """WITH toks AS MATERIALIZED (
      | SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |bg AS MATERIALIZED (
      | SELECT split_part(b, ' ', 1) AS head, split_part(b, ' ', 2) AS nxt
      | FROM (SELECT unnest(list_transform(range(len(toks)-1),
      |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS b
      |  FROM toks WHERE len(toks) >= 2)),
      |pc AS MATERIALIZED (SELECT head, nxt, COUNT(*) AS n_ab FROM bg GROUP BY head, nxt),
      |uni AS MATERIALIZED (SELECT tok, CAST(SUM(n) AS BIGINT) AS n_tok FROM (
      |  SELECT head AS tok, n_ab AS n FROM pc
      |  UNION ALL SELECT nxt AS tok, n_ab AS n FROM pc) GROUP BY tok),
      |tot AS MATERIALIZED (SELECT CAST(SUM(n_ab) * 2 AS BIGINT) AS t_pos FROM pc)
      |SELECT pc.head, pc.nxt, pc.n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
      | CAST(pc.n_ab * tot.t_pos AS DOUBLE)
      |  / CAST(ua.n_tok * ub.n_tok AS DOUBLE) AS lift
      |FROM pc
      | JOIN uni ua ON pc.head = ua.tok
      | JOIN uni ub ON pc.nxt = ub.tok
      | CROSS JOIN tot
      |WHERE pc.n_ab >= 5
      |ORDER BY lift DESC, pc.head ASC, pc.nxt ASC
      |LIMIT 25""".stripMargin

  /** Non-overlapping 8-token grid: block i = toks[i*8+1 .. i*8+8]
    * (DuckDB slices are 1-based inclusive); block count = len // 8 —
    * exactly the positions word_ngrams emits at pos % 8 = 0.
    */
  val spanDedup: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |blocks AS MATERIALIZED (
      | SELECT doc_id,
      |  CAST(CAST(concat('0x', substr(md5(
      |    array_to_string(toks[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')), 1, 15))
      |   AS UBIGINT) AS BIGINT) AS fp
      | FROM (SELECT doc_id, toks, unnest(range(len(toks) // 8)) AS i FROM toks)),
      |df AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM blocks GROUP BY fp),
      |per AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_blocks,
      |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks
      | FROM blocks JOIN df USING (fp) GROUP BY doc_id)
      |SELECT d.doc_id,
      | COALESCE(n_blocks, 0) AS n_blocks,
      | COALESCE(n_dup_blocks, 0) AS n_dup_blocks,
      | CASE WHEN COALESCE(n_blocks, 0) = 0 THEN 0.0
      |      ELSE CAST(n_dup_blocks AS DOUBLE) / CAST(n_blocks AS DOUBLE) END AS dup_ratio,
      | CASE WHEN COALESCE(n_blocks, 0) = 0 THEN 0.0
      |      ELSE CAST(n_dup_blocks AS DOUBLE) / CAST(n_blocks AS DOUBLE) END < 0.5 AS keep
      |FROM (SELECT doc_id FROM documents) d LEFT JOIN per USING (doc_id)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private def normSqSql(v: String): String =
    s"list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  /** PQ encode + ADC twin: subvector m = embedding[m·8+1 .. m·8+8],
    * codebook = the subvectors of vec_id < 16, encode = argmin
    * (distance, code_id), ADC = sum of round(d·10⁹) BIGINT lookups.
    */
  val pqAdcTopK: String = {
    val sv = "embedding[CAST(m*8+1 AS INT):CAST(m*8+8 AS INT)]"
    s"""WITH subs AS (SELECT CAST(unnest(range(8)) AS BIGINT) AS sub),
       |sv AS MATERIALIZED (SELECT vec_id, m AS sub, $sv AS sv,
       |        ${normSqSql(sv)} AS svn2
       |       FROM embeddings, (SELECT sub AS m FROM subs)),
       |cb AS MATERIALIZED (SELECT vec_id AS code_id, sub, sv AS cw, svn2 AS cwn2
       |       FROM sv WHERE vec_id < 16),
       |enc AS (SELECT vec_id, sub, code FROM (
       |  SELECT sv.vec_id, sv.sub, cb.code_id AS code,
       |   ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
       |     ORDER BY sv.svn2 + cb.cwn2 - 2.0 * ${dotSql("sv.sv", "cb.cw")} ASC,
       |              cb.code_id ASC) AS rnk
       |  FROM sv JOIN cb USING (sub)) WHERE rnk = 1),
       |lut AS (SELECT sv.vec_id AS query_id, sv.sub, cb.code_id AS code,
       |         sv.svn2 + cb.cwn2 - 2.0 * ${dotSql("sv.sv", "cb.cw")} AS d
       |        FROM sv JOIN cb USING (sub) WHERE sv.vec_id < 5),
       |adc AS (SELECT query_id, vec_id,
       |         CAST(SUM(CAST(round(d * 1000000000.0) AS BIGINT)) AS BIGINT) AS adc_q
       |        FROM enc JOIN lut USING (sub, code)
       |        WHERE vec_id <> query_id
       |        GROUP BY query_id, vec_id)
       |SELECT query_id, vec_id AS neighbor_id,
       | CAST(adc_q AS DOUBLE) / 1000000000.0 AS adc_dist, rnk
       |FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |       ORDER BY adc_q ASC, vec_id ASC) AS BIGINT) AS rnk FROM adc)
       |WHERE rnk <= 5""".stripMargin
  }

  /** Power-of-two decay is exact in doubles; the cross-row sum is the
    * usual round(w·10⁹) BIGINT fixed point — see EventOps.ewmaUserValue.
    */
  val ewmaUserValue: String =
    """WITH e AS MATERIALIZED (SELECT user_id, value,
      |            CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day FROM events),
      |w AS MATERIALIZED (SELECT user_id, value, day,
      |       MAX(day) OVER (PARTITION BY user_id) AS last_day FROM e),
      |c AS MATERIALIZED (SELECT user_id, day,
      |       CAST(round(value * 1000000000.0 /
      |            CAST((CAST(1 AS BIGINT) << CAST(LEAST(last_day - day, 62) AS INT))
      |                 AS DOUBLE)) AS BIGINT) AS contrib
      |      FROM w)
      |SELECT user_id, COUNT(*) AS n_events, MAX(day) AS last_day,
      | CAST(SUM(contrib) AS BIGINT) AS score_q,
      | CAST(CAST(SUM(contrib) AS BIGINT) AS DOUBLE) / 1000000000.0 AS score
      |FROM c GROUP BY user_id""".stripMargin

  /** Same quality formula as the quality_score oracle, binned to the
    * 1e-4 grid; the running below-count windows over distinct bins.
    */
  val qualityPercentile: String =
    """WITH base AS (
      | SELECT doc_id, text,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |counts AS (
      | SELECT doc_id, text, len(toks) AS n_words,
      |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
      |  len(list_filter(toks, t -> t IN
      |    ('the','a','an','and','or','of','to','in','is','it','on','for'))) AS n_stop
      | FROM base),
      |scored AS MATERIALIZED (
      | SELECT doc_id, CAST(round(
      |  (CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END)
      |   * (1.0 - CASE WHEN length(text) > 0
      |            THEN CAST(n_punct AS DOUBLE)/CAST(length(text) AS DOUBLE) ELSE 0.0 END)
      |   * (0.5 + CASE WHEN n_words > 0
      |            THEN CAST(n_stop AS DOUBLE)/CAST(n_words AS DOUBLE) ELSE 0.0 END)
      |  * 10000.0) AS BIGINT) AS q4
      | FROM counts),
      |bins AS MATERIALIZED (SELECT q4, COUNT(*) AS cnt FROM scored GROUP BY q4),
      |below AS (SELECT q4,
      |  CAST(SUM(cnt) OVER (ORDER BY q4 ASC ROWS UNBOUNDED PRECEDING) - cnt AS BIGINT)
      |   AS n_below,
      |  cnt AS bin_n FROM bins),
      |tot AS MATERIALIZED (SELECT COUNT(*) AS n_total FROM scored)
      |SELECT doc_id, q4, n_below, bin_n,
      | CAST(n_below AS DOUBLE) / CAST(n_total AS DOUBLE) AS pct_below
      |FROM scored JOIN below USING (q4) CROSS JOIN tot""".stripMargin

  /** Same md5 split coin as the data_split oracle, collapsed to
    * train-vs-rest; LEAST caps the fixed-width n_chars bins.
    */
  val splitDrift: String =
    """WITH d AS MATERIALIZED (
      | SELECT CASE WHEN b < 80 THEN 'train' ELSE 'rest' END AS split,
      |  LEAST(n_chars // 100, 19) AS bin
      | FROM (SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS UBIGINT) % 100 AS INT) AS b, n_chars FROM documents)),
      |c AS MATERIALIZED (SELECT bin,
      |  CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |  CAST(SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_rest
      | FROM d GROUP BY bin),
      |t AS MATERIALIZED (SELECT
      |  CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS t_train,
      |  CAST(SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS BIGINT) AS t_rest
      | FROM d)
      |SELECT bin, n_train, n_rest, p_train, p_rest,
      | CASE WHEN p_train + p_rest > 0.0
      |      THEN (p_train - p_rest) * (p_train - p_rest) / (p_train + p_rest)
      |      ELSE 0.0 END AS drift_term
      |FROM (SELECT bin, n_train, n_rest,
      |       CAST(n_train AS DOUBLE) / CAST(t_train AS DOUBLE) AS p_train,
      |       CAST(n_rest AS DOUBLE) / CAST(t_rest AS DOUBLE) AS p_rest
      |      FROM c CROSS JOIN t)""".stripMargin

  /** Exact top-20 + certificate booleans (heavy_hitters gate shape). */
  val cmTokenCounts: String =
    """SELECT token, COUNT(*) AS cnt,
      | TRUE AS no_undercount, TRUE AS within_eps
      |FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |             t -> t <> '')) AS token
      |      FROM documents)
      |GROUP BY token
      |ORDER BY cnt DESC, token ASC
      |LIMIT 20""".stripMargin

  val hourlySpineFilled: String =
    """WITH hourly AS MATERIALIZED (
      | SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      | FROM events GROUP BY hour),
      |spine AS (SELECT unnest(generate_series(
      |  (SELECT MIN(hour) FROM hourly), (SELECT MAX(hour) FROM hourly))) AS hour)
      |SELECT s.hour AS hour, s.hour * 3600 AS hour_epoch,
      | COALESCE(n_events, 0) AS n_events,
      | COALESCE(n_events, 0) = 0 AS is_gap,
      | last_value(sum_value IGNORE NULLS)
      |  OVER (ORDER BY s.hour ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |  AS carried_value
      |FROM spine s LEFT JOIN hourly USING (hour)""".stripMargin

  val flagProfile: String =
    """SELECT l_returnflag,
      | bool_and(l_quantity > 0.0) AS all_positive_qty,
      | bool_or(l_discount > 0.08) AS any_deep_discount,
      | COUNT(*) FILTER (l_tax = 0.0) AS n_tax_free,
      | COUNT(*) FILTER (l_discount = 0.0) AS n_undiscounted,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Round-1 assignment (Oracles3.kmeansAssign shape) → quantized
    * centroids → round-2 assignment against the K recomputed centroid
    * arrays → per-cluster convergence report.
    */
  val kmeansRound2: String =
    s"""WITH seeds AS (SELECT vec_id AS seed_id, embedding AS se,
       |  ${normSqSql("embedding")} AS sn2 FROM embeddings WHERE vec_id < 8),
       |v AS MATERIALIZED (SELECT vec_id, embedding, ${normSqSql("embedding")} AS vn2 FROM embeddings),
       |d AS MATERIALIZED (SELECT vec_id, seed_id,
       |       vn2 + sn2 - 2.0 * ${dotSql("v.embedding", "se")} AS dist_sq
       |      FROM v, seeds),
       |asg AS MATERIALIZED (SELECT vec_id, seed_id AS cluster FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                               ORDER BY dist_sq ASC, seed_id ASC) AS rnk
       |  FROM d) WHERE rnk = 1),
       |flat AS (SELECT cluster, CAST(UNNEST(generate_series(0, 63)) AS BIGINT) AS pos,
       |  CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       | FROM embeddings JOIN asg USING (vec_id)),
       |dims AS MATERIALIZED (SELECT cluster, pos, CAST(SUM(q) AS BIGINT) AS sum_q, COUNT(*) AS n
       |         FROM flat GROUP BY cluster, pos),
       |cent AS (SELECT cluster AS c2,
       |          list(CAST(sum_q AS DOUBLE) / 1000000.0 / n ORDER BY pos) AS centroid
       |         FROM dims GROUP BY cluster),
       |d2 AS MATERIALIZED (SELECT e.vec_id, cent.c2,
       |        list_sum(list_transform(list_zip(e.embedding, cent.centroid),
       |          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist_sq
       |       FROM embeddings e, cent),
       |a2 AS (SELECT vec_id, c2 AS cluster2, dist_sq FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                               ORDER BY dist_sq ASC, c2 ASC) AS rnk FROM d2)
       | WHERE rnk = 1)
       |SELECT a2.cluster2 AS cluster, COUNT(*) AS n_vecs,
       | CAST(SUM(CASE WHEN a2.cluster2 <> asg.cluster THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_switched,
       | CAST(SUM(CAST(round(dist_sq * 1000000000.0) AS BIGINT)) AS BIGINT) AS dist_mass_q,
       | CAST(CAST(SUM(CAST(round(dist_sq * 1000000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |  / 1000000000.0 / COUNT(*) AS mean_dist_sq
       |FROM a2 JOIN asg USING (vec_id)
       |GROUP BY a2.cluster2""".stripMargin

  /** Quantized-exact centroids (labelCentroids discipline), then a
    * per-row ascending-dim (x−mean)² fold and a top-3 window.
    */
  val centroidOutliers: String =
    """WITH flat AS (
      | SELECT label, CAST(UNNEST(generate_series(0, 63)) AS BIGINT) AS pos,
      |  CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
      | FROM embeddings),
      |dims AS MATERIALIZED (SELECT label, pos, CAST(SUM(q) AS BIGINT) AS sum_q, COUNT(*) AS n
      |         FROM flat GROUP BY label, pos),
      |cent AS (SELECT label,
      |          list(CAST(sum_q AS DOUBLE) / 1000000.0 / n ORDER BY pos) AS centroid
      |         FROM dims GROUP BY label),
      |d AS MATERIALIZED (SELECT CAST(e.label AS BIGINT) AS label, e.vec_id,
      |       list_sum(list_transform(list_zip(e.embedding, c.centroid),
      |         p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
      |            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist_sq
      |      FROM embeddings e JOIN cent c ON e.label = c.label)
      |SELECT label, vec_id, dist_sq, rnk FROM (
      | SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY label
      |            ORDER BY dist_sq DESC, vec_id ASC) AS BIGINT) AS rnk FROM d)
      |WHERE rnk <= 3""".stripMargin

  /** States the overlap join directly (DuckDB plans it as an IEJoin);
    * the Spark side's bin+equi-join+distinct plan must agree exactly.
    */
  val concurrentSessions: String =
    """WITH e AS MATERIALIZED (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |s AS MATERIALIZED (SELECT user_id, event_id, ts_us,
      |  CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
      |       THEN 1 ELSE 0 END AS new_session
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
      |t AS MATERIALIZED (SELECT user_id, ts_us,
      |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM s),
      |sess AS MATERIALIZED (SELECT user_id, session_id,
      |          MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      |         FROM t GROUP BY user_id, session_id)
      |SELECT a.user_id, a.session_id, a.start_us, a.end_us,
      | CAST(COUNT(DISTINCT CASE WHEN b.user_id IS NOT NULL
      |       THEN struct_pack(u := b.user_id, s := b.session_id) END) AS BIGINT)
      |  AS n_concurrent
      |FROM sess a LEFT JOIN sess b
      | ON a.user_id <> b.user_id
      | AND b.start_us <= a.end_us AND a.start_us <= b.end_us
      |GROUP BY a.user_id, a.session_id, a.start_us, a.end_us""".stripMargin

  val rollingUsers7d: String =
    """WITH grid AS MATERIALIZED (SELECT DISTINCT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
      |              user_id FROM events),
      |days AS (SELECT DISTINCT day FROM grid)
      |SELECT d.day AS day, COUNT(DISTINCT g.user_id) AS n_users_7d
      |FROM days d JOIN grid g ON g.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day""".stripMargin

  val bpeMerges: String =
    """WITH vocab AS (
      | SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |    t -> t <> '')) AS word
      |  FROM documents) GROUP BY word),
      |p AS MATERIALIZED (SELECT unnest(list_transform(range(length(word) - 1),
      |        i -> substr(word, CAST(i + 1 AS INT), 2))) AS pair, cnt
      |      FROM vocab WHERE length(word) >= 2)
      |SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM p GROUP BY pair
      |ORDER BY n DESC, pair ASC LIMIT 25""".stripMargin

  /** Char-for-byte window energy (the corpus is ASCII, so
    * ascii(substr(text, i, 1)) is byte i of the binary payload).
    */
  val audioEnergy: String =
    """SELECT doc_id AS media_id, CAST(w AS BIGINT) AS win_idx,
      | CAST(w * 64 AS BIGINT) AS win_start,
      | CAST(list_sum(list_transform(range(1, 65),
      |   i -> ascii(substr(text, CAST(w * 64 + i AS INT), 1)))) AS BIGINT) AS energy
      |FROM (SELECT doc_id, text, unnest(range(length(text) // 64)) AS w
      |      FROM documents WHERE length(text) // 64 > 0)""".stripMargin

  /** States the as-of rule directly: the signup with the greatest
    * (s_us, signup_id) among those with s_us <= p_us, per purchase.
    */
  val asofJoinNative: String =
    """WITH p AS MATERIALIZED (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
      |           FROM events WHERE event_type = 'purchase'),
      |s AS MATERIALIZED (SELECT user_id, event_id AS signup_id, epoch_us(ts) AS s_us
      |      FROM events WHERE event_type = 'signup')
      |SELECT user_id, purchase_id, signup_id, p_us - s_us AS gap_us FROM (
      | SELECT p.user_id AS user_id, purchase_id, signup_id, p_us, s_us,
      |  ROW_NUMBER() OVER (PARTITION BY purchase_id
      |                     ORDER BY s_us DESC, signup_id DESC) AS rnk
      | FROM p JOIN s ON p.user_id = s.user_id AND s.s_us <= p.p_us)
      |WHERE rnk = 1""".stripMargin

  /** Three unrolled propagation rounds — the CTE chain mirrors the
    * driver loop in GraphOps.pagerankReferral exactly (integer
    * micro-rank units, (r·85)//100 floor transfers).
    */
  val pagerankReferral: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (SELECT n.node AS node,
         |  CAST(150000 + COALESCE(SUM(m.c), 0) AS BIGINT) AS r
         | FROM nodes n LEFT JOIN (
         |   SELECT e.parent AS node, ($prev.r * 85) // 100 AS c
         |   FROM edges e JOIN $prev ON e.node = $prev.node) m ON n.node = m.node
         | GROUP BY n.node)""".stripMargin
    s"""WITH nodes AS MATERIALIZED (SELECT c_custkey AS node FROM customer),
       |edges AS MATERIALIZED (SELECT node, node // 2 AS parent FROM nodes WHERE node > 1),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |${round("r0", "r1")},
       |${round("r1", "r2")},
       |${round("r2", "r3")},
       |nc AS (SELECT parent AS node, COUNT(*) AS n_children FROM edges GROUP BY parent)
       |SELECT r3.node, r3.r AS rank_q, CAST(r3.r AS DOUBLE) / 1000000.0 AS pr,
       | COALESCE(n_children, 0) AS n_children
       |FROM r3 LEFT JOIN nc USING (node)""".stripMargin
  }
}
