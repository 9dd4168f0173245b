package graft

/** DuckDB oracle twins for the round-10 additions: the order-N
  * Kneser-Ney generalization (orders 4 and 5 — CCNet's production
  * KenLM order), the per-order curve, and the re-pointed bucket
  * split. Same conventions as Oracles2-9: derived ints CAST AS
  * BIGINT, exact products in HUGEINT mirroring the Spark side's
  * DECIMAL(38,0), the c64 log as the unrolled square-and-shift chain
  * ([[Oracles8.c64ValChain]]), every multi-referenced CTE
  * MATERIALIZED (OracleLintSpec).
  */
object Oracles10 {

  private val Shift = 1L << graft.operators.TextOps.KnQpShift
  private val Nll0 = 64L * graft.operators.TextOps.KnQpShift

  /** Last `k` space-joined words of `col` (tokens contain no spaces —
    * mirrors Spark's `substring_index(col, ' ', -k)`).
    */
  private def sfx(col: String, k: Int): String =
    s"regexp_extract($col, '((?:\\S+ ){${k - 1}}\\S+)$$', 1)"

  /** First `k` space-joined words (mirrors `substring_index(col, ' ', k)`). */
  private def pfx(col: String, k: Int): String =
    s"regexp_extract($col, '^((?:\\S+ ){${k - 1}}\\S+)', 1)"

  /** Mirrors TextOps.knNModel at order `n`: the n-gram TYPE table,
    * the shrinking adjusted-count (continuation) tables, per-level
    * history stats, the common-denominator qp₂ collapse, and the
    * quantized-composition ladder qp₃..qp_n — the same floors in the
    * same order as the Spark side's DECIMAL(38,0) DIVs.
    */
  private[graft] def knNCtes(n: Int): String = {
    val p = s"k$n"
    // aTab(n) = raw type counts (${p}c); aTab(k) = ${p}a$k
    def aName(k: Int) = if (k == n) s"${p}c" else s"${p}a$k"
    val aTables = (n - 1 to 2 by -1)
      .map { k =>
        s"""${aName(k)} AS MATERIALIZED (
           | SELECT ${sfx("g", k)} AS g, CAST(COUNT(*) AS BIGINT) AS cnt
           | FROM ${aName(k + 1)} GROUP BY 1)""".stripMargin
      }
      .mkString(",\n")
    val statTables = (2 to n)
      .map { k =>
        val contW =
          if (k == 2)
            s""",
               |  CAST(COUNT(*) OVER (PARTITION BY ${sfx("g", 1)}) AS BIGINT) AS cont_w""".stripMargin
          else ""
        s"""${p}s$k AS (SELECT g, cnt,
           |  CAST(SUM(cnt) OVER (PARTITION BY ${pfx("g", k - 1)}) AS BIGINT) AS tot,
           |  CAST(COUNT(*) OVER (PARTITION BY ${pfx("g", k - 1)}) AS BIGINT) AS n1p$contW
           | FROM ${aName(k)})""".stripMargin
      }
      .mkString(",\n")
    val qpLadder = (3 to n)
      .map { k =>
        s"""${if (k == n) s"${p}q$k AS MATERIALIZED" else s"${p}q$k AS"} (
           | SELECT s.g, s.cnt, s.tot, s.n1p,
           |  CAST((CAST(4*s.cnt - 3 AS HUGEINT) * CAST($Shift AS HUGEINT)
           |        + CAST(3*s.n1p AS HUGEINT) * q.qp)
           |       // CAST(4*s.tot AS HUGEINT) AS BIGINT) AS qp
           | FROM ${p}s$k s JOIN ${p}q${k - 1} q ON ${sfx("s.g", k - 1)} = q.g)""".stripMargin
      }
      .mkString(",\n")
    s"""${p}t AS (
       | SELECT doc_id, source,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |${p}g AS MATERIALIZED (
       | SELECT doc_id, unnest(list_transform(range(len(toks)-${n - 1}),
       |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+$n AS INT)], ' '))) AS g
       | FROM ${p}t WHERE len(toks) >= $n),
       |${p}c AS MATERIALIZED (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM ${p}g GROUP BY g),
       |$aTables,
       |${p}t1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS t1_types FROM ${p}a2),
       |$statTables,
       |${p}q2 AS (SELECT g,
       |  CAST((CAST(4*cnt - 3 AS HUGEINT) * t1_types
       |        + CAST(3*n1p AS HUGEINT) * cont_w)
       |       * CAST($Shift AS HUGEINT)
       |       // (CAST(4*tot AS HUGEINT) * t1_types) AS BIGINT) AS qp
       | FROM ${p}s2, ${p}t1),
       |$qpLadder,
       |${p}vals AS (SELECT DISTINCT qp AS v FROM ${p}q$n),
       |${Oracles8.c64ValChain(s"${p}vals", s"kn$n")},
       |${p}model AS MATERIALIZED (SELECT q.g, q.cnt, q.tot, q.n1p, q.qp,
       |  $Nll0 - c.c64 AS nll64
       | FROM ${p}q$n q JOIN c64v_kn$n c ON q.qp = c.v)""".stripMargin
  }

  private[graft] def knNDocCtes(n: Int): String = {
    val p = s"k$n"
    s"""${knNCtes(n)},
       |${p}doc AS (
       | SELECT doc_id, COUNT(*) AS n_grams, CAST(SUM(nll64) AS BIGINT) AS sum_nll64
       | FROM ${p}g JOIN ${p}model USING (g) GROUP BY doc_id),
       |${p}ppl AS (
       | SELECT d.doc_id, d.source,
       |  COALESCE(k.n_grams, 0) AS n_grams,
       |  COALESCE(k.sum_nll64, 0) AS sum_nll64,
       |  COALESCE(k.sum_nll64 // k.n_grams, 0) AS avg_nll64
       | FROM documents d LEFT JOIN ${p}doc k USING (doc_id))""".stripMargin
  }

  val kn5Fit: String =
    s"""WITH ${knNCtes(5)}
       |SELECT g, cnt, tot, n1p, qp, nll64
       |FROM k5model ORDER BY qp DESC, g LIMIT 25""".stripMargin

  val kn4DocPpl: String =
    s"""WITH ${knNDocCtes(4)}
       |SELECT doc_id, source, n_grams, sum_nll64, avg_nll64 FROM k4ppl""".stripMargin

  val kn5DocPpl: String =
    s"""WITH ${knNDocCtes(5)}
       |SELECT doc_id, source, n_grams, sum_nll64, avg_nll64 FROM k5ppl""".stripMargin

  /** Mirrors TextOps.pplBucketSplit, round-10 re-pointed at the
    * 5-gram score (head/middle/tail CCNet tertiles per source).
    */
  val pplBucketSplit: String =
    s"""WITH ${knNDocCtes(5)},
       |kb5 AS (SELECT source, n_grams, avg_nll64,
       |  NTILE(3) OVER (PARTITION BY source ORDER BY avg_nll64, doc_id) AS bucket
       | FROM k5ppl)
       |SELECT source,
       | CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       | COUNT(*) AS n_docs,
       | CAST(SUM(avg_nll64) AS BIGINT) AS sum_avg_nll64,
       | CAST(SUM(avg_nll64) AS BIGINT) // COUNT(*) AS mean_nll64,
       | CAST(SUM(n_grams) AS BIGINT) AS n_grams
       |FROM kb5 GROUP BY source, bucket""".stripMargin

  // ── DSIR global Gumbel selection twins ────────────────────────────

  /** Mirrors TextOps.dsirGumbelKeys + the global ranking: the 60-bit
    * md5 coin, e64 = 3840 − c64(coin+1) and g64 = 384 − c64(max(e64,1))
    * through two unrolled c64 chains (the second over ≤ 3841 distinct
    * values), key64 = score64 + g64, one global ROW_NUMBER.
    */
  private val gumbelCtes: String =
    s"""gco AS MATERIALIZED (SELECT doc_id, source, score64,
       |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
       |   AS BIGINT) AS coin
       | FROM dps),
       |gcv AS (SELECT DISTINCT coin + 1 AS v FROM gco),
       |${Oracles8.c64ValChain("gcv", "gc")},
       |ge1 AS MATERIALIZED (SELECT g.doc_id, g.source, g.score64,
       |  ${64L * 60} - c.c64 AS e64
       | FROM gco g JOIN c64v_gc c ON c.v = g.coin + 1),
       |gev AS (SELECT DISTINCT greatest(e64, 1) AS v FROM ge1),
       |${Oracles8.c64ValChain("gev", "ge")},
       |gk AS MATERIALIZED (SELECT g.doc_id, g.source, g.score64,
       |  g.score64 + ${64L * 6} - c.c64 AS key64
       | FROM ge1 g JOIN c64v_ge c ON c.v = greatest(g.e64, 1)),
       |grk AS MATERIALIZED (SELECT *,
       |  ROW_NUMBER() OVER (ORDER BY key64 DESC, doc_id ASC) AS rn,
       |  COUNT(*) OVER () AS n_all
       | FROM gk)""".stripMargin

  val dsirSelectGlobal: String = {
    val kd = graft.operators.TextOps.DsirKeepDiv
    s"""WITH ${Oracles9.dsirScoreCtes},
       |$gumbelCtes
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(CASE WHEN rn * $kd <= n_all THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       | CAST(CAST(SUM(CASE WHEN rn * $kd <= n_all THEN 1 ELSE 0 END) AS HUGEINT)
       |      * 1000000 // COUNT(*) AS BIGINT) AS kept_ppm,
       | CAST(SUM(CASE WHEN rn * $kd <= n_all THEN score64 ELSE 0 END) AS BIGINT)
       |   AS kept_score64,
       | CAST(COALESCE(MIN(CASE WHEN rn * $kd <= n_all THEN key64 END), 0) AS BIGINT)
       |   AS min_kept_key64
       |FROM grk GROUP BY source""".stripMargin
  }

  val dsirSelectAgreement: String = {
    val kd = graft.operators.TextOps.DsirKeepDiv
    s"""WITH ${Oracles9.dsirScoreCtes},
       |$gumbelCtes,
       |srk AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY score64 DESC, doc_id ASC) AS rn_s,
       |  COUNT(*) OVER (PARTITION BY source) AS n_src
       | FROM grk)
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(CASE WHEN rn * $kd <= n_all AND rn_s * $kd <= n_src
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       | CAST(SUM(CASE WHEN rn * $kd <= n_all AND NOT rn_s * $kd <= n_src
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_global_only,
       | CAST(SUM(CASE WHEN NOT rn * $kd <= n_all AND rn_s * $kd <= n_src
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_strat_only,
       | CAST(SUM(CASE WHEN NOT rn * $kd <= n_all AND NOT rn_s * $kd <= n_src
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
       |FROM srk GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.weightedSampleAes: the 60-bit coin, e64 through
    * the unrolled c64 chain, the fixed-point A-ES race key
    * ⌊e64·2²⁰/(n_chars+1)⌋, rank-5 per source.
    */
  val weightedSampleAes: String =
    s"""WITH wac AS MATERIALIZED (SELECT source, doc_id, n_chars,
       |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
       |   AS BIGINT) AS coin
       | FROM documents),
       |wav AS (SELECT DISTINCT coin + 1 AS v FROM wac),
       |${Oracles8.c64ValChain("wav", "wa")},
       |wak AS MATERIALIZED (SELECT w.source, w.doc_id, w.n_chars,
       |  (${64L * 60} - c.c64) * 1048576 // (w.n_chars + 1) AS priority
       | FROM wac w JOIN c64v_wa c ON c.v = w.coin + 1)
       |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, n_chars, priority
       |FROM (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rank
       | FROM wak)
       |WHERE rank <= ${graft.operators.TextOps.SampleK}""".stripMargin

  /** Mirrors TextOps.typoRewrite: the V² typo-pair oracle (ONE
    * definition of the dist ≤ 2 truth — Oracles2.typoPairs) joined to
    * corpus type counts, strictly-heavier candidates only, top-1 per
    * token by (count desc, dist asc, candidate asc).
    */
  val typoRewrite: String =
    s"""WITH trp AS MATERIALIZED (
       | SELECT token_a, token_b, dist FROM (${Oracles2.typoPairs}) tq),
       |trt AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'),
       |          t -> t <> '')) AS token FROM documents),
       |trc AS MATERIALIZED (SELECT token, COUNT(*) AS cnt FROM trt
       |       WHERE length(token) >= 4 GROUP BY token),
       |trd AS (SELECT token_a AS token, token_b AS cand, dist FROM trp
       |        UNION ALL SELECT token_b, token_a, dist FROM trp),
       |trj AS (SELECT d.token, t1.cnt, d.cand, t2.cnt AS canon_cnt, d.dist
       |        FROM trd d JOIN trc t1 ON t1.token = d.token
       |         JOIN trc t2 ON t2.token = d.cand
       |        WHERE t2.cnt > t1.cnt)
       |SELECT token, cnt, cand AS canon, canon_cnt, dist
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY token
       |        ORDER BY canon_cnt DESC, dist ASC, cand ASC) AS rn FROM trj)
       |WHERE rn = 1""".stripMargin

  /** Mirrors TextOps.knOrderCurve: the four per-doc sheets joined on
    * the docs order 5 scores, per-source exact floor-div means at
    * every order, gains via the (source, ord−1) self-join.
    */
  val knOrderCurve: String =
    s"""WITH ${Oracles8.knDocCtes},
       |${Oracles9.kn3DocCtes},
       |${knNDocCtes(4)},
       |${knNDocCtes(5)},
       |ocb AS MATERIALIZED (
       | SELECT k2.source, k2.avg_nll64 AS nll2, k3.avg_nll64 AS nll3,
       |  k4.avg_nll64 AS nll4, k5.avg_nll64 AS nll5
       | FROM kppl k2 JOIN k3ppl k3 USING (doc_id) JOIN k4ppl k4 USING (doc_id)
       |  JOIN k5ppl k5 USING (doc_id)
       | WHERE k5.n_grams > 0),
       |occ AS MATERIALIZED (
       | SELECT source, CAST(2 AS BIGINT) AS ord, COUNT(*) AS n_docs,
       |  CAST(SUM(nll2) AS BIGINT) // COUNT(*) AS mean_nll64 FROM ocb GROUP BY source
       | UNION ALL
       | SELECT source, CAST(3 AS BIGINT), COUNT(*),
       |  CAST(SUM(nll3) AS BIGINT) // COUNT(*) FROM ocb GROUP BY source
       | UNION ALL
       | SELECT source, CAST(4 AS BIGINT), COUNT(*),
       |  CAST(SUM(nll4) AS BIGINT) // COUNT(*) FROM ocb GROUP BY source
       | UNION ALL
       | SELECT source, CAST(5 AS BIGINT), COUNT(*),
       |  CAST(SUM(nll5) AS BIGINT) // COUNT(*) FROM ocb GROUP BY source)
       |SELECT c.source, c.ord, c.n_docs, c.mean_nll64,
       | COALESCE(pv.mean_nll64 - c.mean_nll64, 0) AS gain64
       |FROM occ c LEFT JOIN occ pv ON pv.source = c.source AND pv.ord = c.ord - 1""".stripMargin
}
