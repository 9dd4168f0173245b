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
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      |b AS (SELECT user_id, ts_us, value,
      |  CASE WHEN lag(ts_us) OVER w IS NULL
      |            OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |s AS (SELECT user_id, ts_us, value,
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
    """WITH toks AS (
      | SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |bg AS (
      | SELECT split_part(b, ' ', 1) AS head, split_part(b, ' ', 2) AS nxt
      | FROM (SELECT unnest(list_transform(range(len(toks)-1),
      |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS b
      |  FROM toks WHERE len(toks) >= 2)),
      |pc AS (SELECT head, nxt, COUNT(*) AS n_ab FROM bg GROUP BY head, nxt),
      |uni AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS n_tok FROM (
      |  SELECT head AS tok, n_ab AS n FROM pc
      |  UNION ALL SELECT nxt AS tok, n_ab AS n FROM pc) GROUP BY tok),
      |tot AS (SELECT CAST(SUM(n_ab) * 2 AS BIGINT) AS t_pos FROM pc)
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
    """WITH toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |blocks AS (
      | SELECT doc_id,
      |  CAST(CAST(concat('0x', substr(md5(
      |    array_to_string(toks[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')), 1, 15))
      |   AS UBIGINT) AS BIGINT) AS fp
      | FROM (SELECT doc_id, toks, unnest(range(len(toks) // 8)) AS i FROM toks)),
      |df AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM blocks GROUP BY fp),
      |per AS (SELECT doc_id, COUNT(*) AS n_blocks,
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
}
