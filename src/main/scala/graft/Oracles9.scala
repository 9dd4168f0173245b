package graft

/** DuckDB oracle twins for the round-9 additions: the trigram
  * Kneser-Ney model with interpolated continuation-count backoff and
  * its per-doc scorer / bucket split. Same conventions as Oracles2-8:
  * derived ints CAST AS BIGINT, exact products in HUGEINT mirroring
  * the Spark side's DECIMAL(38,0), the c64 log as the unrolled
  * square-and-shift chain ([[Oracles8.c64ValChain]]).
  */
object Oracles9 {

  /** Mirrors TextOps.kn3Model: trigram TYPE table, level-3 raw stats,
    * continuation-bigram table + stats, qp₂ over the common
    * denominator 4·N1+(·v·)·T₂, then qp₃ composing the QUANTIZED qp₂
    * — the same two floors the Spark side takes.
    */
  private val kn3Ctes: String =
    s"""k3t AS (
       | SELECT doc_id, source,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |k3gd AS MATERIALIZED (
       | SELECT doc_id, unnest(list_transform(range(len(toks)-2),
       |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' '))) AS tg
       | FROM k3t WHERE len(toks) >= 3),
       |k3cnt AS MATERIALIZED (SELECT tg, split_part(tg, ' ', 1) AS u, split_part(tg, ' ', 2) AS v,
       |          split_part(tg, ' ', 3) AS w, COUNT(*) AS c_uvw
       |          FROM k3gd GROUP BY tg),
       |k3l3 AS (SELECT tg, u, v, w, c_uvw,
       |  CAST(SUM(c_uvw) OVER (PARTITION BY u, v) AS BIGINT) AS c_uv,
       |  CAST(COUNT(*) OVER (PARTITION BY u, v) AS BIGINT) AS n1p_uv
       | FROM k3cnt),
       |k3cb AS MATERIALIZED (SELECT v, w, COUNT(*) AS n1c_vw FROM k3cnt GROUP BY v, w),
       |k3cs AS (SELECT v, w, n1c_vw,
       |  CAST(SUM(n1c_vw) OVER (PARTITION BY v) AS BIGINT) AS n1mid_v,
       |  CAST(COUNT(*) OVER (PARTITION BY v) AS BIGINT) AS n1p2_v,
       |  CAST(COUNT(*) OVER (PARTITION BY w) AS BIGINT) AS cont2_w
       | FROM k3cb),
       |k3tt AS (SELECT COUNT(*) AS t2_types FROM k3cb),
       |k3q2 AS (SELECT v, w, n1c_vw, n1mid_v, n1p2_v, cont2_w,
       |  CAST((CAST(4*n1c_vw - 3 AS HUGEINT) * t2_types
       |        + CAST(3*n1p2_v AS HUGEINT) * cont2_w)
       |       * CAST(${1L << graft.operators.TextOps.KnQpShift} AS HUGEINT)
       |       // (CAST(4*n1mid_v AS HUGEINT) * t2_types) AS BIGINT) AS qp2
       | FROM k3cs, k3tt),
       |k3qp AS MATERIALIZED (SELECT l.tg, l.u, l.v, l.w, l.c_uvw, l.c_uv, l.n1p_uv,
       |  q.n1c_vw, q.n1mid_v, q.n1p2_v, q.cont2_w, q.qp2,
       |  CAST((CAST(4*l.c_uvw - 3 AS HUGEINT)
       |        * CAST(${1L << graft.operators.TextOps.KnQpShift} AS HUGEINT)
       |        + CAST(3*l.n1p_uv AS HUGEINT) * q.qp2)
       |       // CAST(4*l.c_uv AS HUGEINT) AS BIGINT) AS qp3
       | FROM k3l3 l JOIN k3q2 q ON l.v = q.v AND l.w = q.w),
       |k3vals AS (SELECT DISTINCT qp3 AS v FROM k3qp),
       |${Oracles8.c64ValChain("k3vals", "kn3")},
       |k3model AS (SELECT q.*, ${64L * graft.operators.TextOps.KnQpShift} - c.c64 AS nll64
       |            FROM k3qp q JOIN c64v_kn3 c ON q.qp3 = c.v)""".stripMargin

  val kn3TrigramFit: String =
    s"""WITH $kn3Ctes
       |SELECT u, v, w, c_uvw, c_uv, n1p_uv, n1c_vw, n1mid_v, n1p2_v, cont2_w,
       | qp2, qp3, nll64
       |FROM k3model ORDER BY qp3 DESC, u, v, w LIMIT 25""".stripMargin

  private[graft] val kn3DocCtes: String =
    s"""$kn3Ctes,
       |k3doc AS (
       | SELECT doc_id, COUNT(*) AS n_trigrams, CAST(SUM(nll64) AS BIGINT) AS sum_nll64
       | FROM k3gd JOIN k3model USING (tg) GROUP BY doc_id),
       |k3ppl AS (
       | SELECT d.doc_id, d.source,
       |  COALESCE(k.n_trigrams, 0) AS n_trigrams,
       |  COALESCE(k.sum_nll64, 0) AS sum_nll64,
       |  COALESCE(k.sum_nll64 // k.n_trigrams, 0) AS avg_nll64
       | FROM documents d LEFT JOIN k3doc k USING (doc_id))""".stripMargin

  val kn3DocPpl: String =
    s"""WITH $kn3DocCtes
       |SELECT doc_id, source, n_trigrams, sum_nll64, avg_nll64 FROM k3ppl""".stripMargin

  // ── DSIR importance-resampling twins ──────────────────────────────

  /** Shared CTE chain for the DSIR family: hashed unigram+bigram
    * stream folded to [[graft.operators.TextOps.DsirLambdaBuckets]] buckets,
    * the add-1-smoothed target/raw tallies, and the per-bucket 1/64-bit
    * integer log ratio through the unrolled c64 chain — mirroring
    * TextOps.dsirLambdaBuild / dsirDocScores bit-for-bit.
    */
  private val dsirCtes: String = {
    val nb = graft.operators.TextOps.DsirLambdaBuckets
    val target = graft.operators.TextOps.DsirTargetSource
    s"""dst AS (
       | SELECT doc_id, source,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |dsg AS (
       | SELECT doc_id, source, unnest(list_concat(toks,
       |   list_transform(range(len(toks)-1),
       |     i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' ')))) AS g
       | FROM dst),
       |dsb AS MATERIALIZED (SELECT doc_id, source,
       |  CAST(CAST(concat('0x', substr(md5(g), 1, 15)) AS UBIGINT) AS BIGINT) % $nb AS bucket
       | FROM dsg),
       |dbk AS (SELECT bucket, COUNT(*) AS r_cnt,
       |        SUM(CASE WHEN source = '$target' THEN 1 ELSE 0 END) AS t_cnt
       |        FROM dsb GROUP BY bucket),
       |dfull AS MATERIALIZED (SELECT rg.range AS bucket,
       |  CAST(COALESCE(t_cnt, 0) AS BIGINT) AS t_cnt,
       |  CAST(COALESCE(r_cnt, 0) AS BIGINT) AS r_cnt
       | FROM range($nb) rg LEFT JOIN dbk ON rg.range = dbk.bucket),
       |dtot AS MATERIALIZED (SELECT CAST(SUM(t_cnt) AS BIGINT) AS t_tot,
       |         CAST(SUM(r_cnt) AS BIGINT) AS r_tot FROM dfull),
       |dvals AS (SELECT DISTINCT v FROM (
       |  SELECT t_cnt + 1 AS v FROM dfull
       |  UNION SELECT r_cnt + 1 FROM dfull
       |  UNION SELECT t_tot + $nb FROM dtot
       |  UNION SELECT r_tot + $nb FROM dtot)),
       |${Oracles8.c64ValChain("dvals", "ds")},
       |dlam AS (SELECT f.bucket, f.t_cnt, f.r_cnt,
       |  ct.c64 - ctt.c64 - cr.c64 + crt.c64 AS lam64
       | FROM dfull f
       | CROSS JOIN dtot
       | JOIN c64v_ds ct ON ct.v = f.t_cnt + 1
       | JOIN c64v_ds cr ON cr.v = f.r_cnt + 1
       | JOIN c64v_ds ctt ON ctt.v = t_tot + $nb
       | JOIN c64v_ds crt ON crt.v = r_tot + $nb)""".stripMargin
  }

  val dsirBucketModel: String =
    s"""WITH $dsirCtes
       |SELECT bucket, t_cnt, r_cnt, lam64 FROM dlam
       |ORDER BY lam64 DESC, bucket LIMIT 25""".stripMargin

  private[graft] val dsirScoreCtes: String =
    s"""$dsirCtes,
       |dsc AS (SELECT doc_id, COUNT(*) AS n_grams,
       |        CAST(SUM(lam64) AS BIGINT) AS score64
       |        FROM dsb JOIN dlam USING (bucket) GROUP BY doc_id),
       |dps AS (SELECT d.doc_id, d.source,
       |  COALESCE(s.n_grams, 0) AS n_grams,
       |  COALESCE(s.score64, 0) AS score64
       | FROM documents d LEFT JOIN dsc s USING (doc_id))""".stripMargin

  val dsirDocScores: String =
    s"""WITH $dsirScoreCtes
       |SELECT doc_id, source, n_grams, score64 FROM dps""".stripMargin

  val dsirSelect: String = {
    val kd = graft.operators.TextOps.DsirKeepDiv
    s"""WITH $dsirScoreCtes,
       |dsel AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY score64 DESC, doc_id ASC) AS rn,
       |  COUNT(*) OVER (PARTITION BY source) AS n_src
       | FROM dps)
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(CASE WHEN rn * $kd <= n_src THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       | CAST(CAST(SUM(CASE WHEN rn * $kd <= n_src THEN 1 ELSE 0 END) AS HUGEINT)
       |      * 1000000 // COUNT(*) AS BIGINT) AS kept_ppm,
       | CAST(SUM(CASE WHEN rn * $kd <= n_src THEN score64 ELSE 0 END) AS BIGINT)
       |   AS kept_score64,
       | CAST(COALESCE(MIN(CASE WHEN rn * $kd <= n_src THEN score64 END), 0) AS BIGINT)
       |   AS threshold64
       |FROM dsel GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.pplBucketSplit, round-9 re-pointed at the
    * trigram score (head/middle/tail CCNet tertiles per source).
    */
  val pplBucketSplit: String =
    s"""WITH $kn3DocCtes,
       |kb3 AS (SELECT source, n_trigrams, avg_nll64,
       |  NTILE(3) OVER (PARTITION BY source ORDER BY avg_nll64, doc_id) AS bucket
       | FROM k3ppl)
       |SELECT source,
       | CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       | COUNT(*) AS n_docs,
       | CAST(SUM(avg_nll64) AS BIGINT) AS sum_avg_nll64,
       | CAST(SUM(avg_nll64) AS BIGINT) // COUNT(*) AS mean_nll64,
       | CAST(SUM(n_trigrams) AS BIGINT) AS n_trigrams
       |FROM kb3 GROUP BY source, bucket""".stripMargin

  // ── Exact integer token entropy twin ──────────────────────────────

  /** Mirrors TextOps.tokenEntropyGate: per-doc H64 = c64(n) − ⌊Σc·c64(c)/n⌋
    * through the unrolled c64 chain, zero-token docs at 0, per-source
    * low-entropy ppm.
    */
  val tokenEntropyGate: String = {
    val low = graft.operators.TextOps.LowEntropyH64
    s"""WITH tet AS (
       | SELECT doc_id, source,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |tec AS MATERIALIZED (SELECT doc_id, t, COUNT(*) AS c
       |        FROM (SELECT doc_id, unnest(toks) AS t FROM tet) GROUP BY doc_id, t),
       |ten AS MATERIALIZED (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens FROM tec GROUP BY doc_id),
       |tevals AS (SELECT DISTINCT v FROM (
       |  SELECT c AS v FROM tec UNION SELECT n_tokens FROM ten)),
       |${Oracles8.c64ValChain("tevals", "te")},
       |tes AS (SELECT e.doc_id, CAST(SUM(e.c * cc.c64) AS BIGINT) AS s64
       |        FROM tec e JOIN c64v_te cc ON cc.v = e.c GROUP BY e.doc_id),
       |teh AS (SELECT n.doc_id, n.n_tokens, cn.c64 - (s.s64 // n.n_tokens) AS h64
       |        FROM ten n JOIN tes s USING (doc_id) JOIN c64v_te cn ON cn.v = n.n_tokens),
       |tep AS (SELECT d.doc_id, d.source, COALESCE(t.h64, 0) AS h64
       |        FROM documents d LEFT JOIN teh t USING (doc_id))
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(h64) AS BIGINT) AS sum_h64,
       | CAST(SUM(h64) AS BIGINT) // COUNT(*) AS mean_h64,
       | CAST(SUM(CASE WHEN h64 < $low THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       | CAST(CAST(SUM(CASE WHEN h64 < $low THEN 1 ELSE 0 END) AS HUGEINT)
       |      * 1000000 // COUNT(*) AS BIGINT) AS low_ppm
       |FROM tep GROUP BY source""".stripMargin
  }

  // ── Selector-agreement twin ───────────────────────────────────────

  /** Mirrors TextOps.selectorAgreement: the DSIR, hashgram and
    * trigram-KN per-doc sheets joined, three source-keyed tie-broken
    * rank windows, one Σd² aggregate, and the (2D−6S)·10⁶ // (2D)
    * agreement in HUGEINT.
    */
  val selectorAgreement: String = {
    def rowOf(pair: String, s: String) =
      s"""SELECT source, '$pair' AS pair, CAST(n AS BIGINT) AS n_docs,
         | CAST(CASE WHEN n < 2 THEN 1000000 ELSE
         |  (2 * (CAST(n AS HUGEINT) * n * n - n) - 6 * $s) * 1000000
         |   // (2 * (CAST(n AS HUGEINT) * n * n - n)) END AS BIGINT) AS agreement_ppm
         |FROM sag""".stripMargin
    s"""WITH $dsirScoreCtes,
       |$kn3DocCtes,
       |hst AS MATERIALIZED (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |hsx AS (SELECT s.doc_id, COALESCE(w.score, 0) AS score
       | FROM hst s LEFT JOIN (
       |   SELECT doc_id,
       |    SUM(CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT)
       |        % 2001 - 1000) AS score
       |   FROM (SELECT doc_id, unnest(toks) AS t FROM hst) GROUP BY doc_id) w USING (doc_id)),
       |srk AS (SELECT d.source,
       |  ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.score64 DESC, d.doc_id ASC) AS rd,
       |  ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY h.score DESC, d.doc_id ASC) AS rh,
       |  ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY p.avg_nll64 ASC, d.doc_id ASC) AS rp
       | FROM dps d JOIN hsx h USING (doc_id) JOIN k3ppl p USING (doc_id)),
       |sag AS MATERIALIZED (SELECT source, COUNT(*) AS n,
       |  SUM(CAST(rd - rh AS HUGEINT) * (rd - rh)) AS s_dh,
       |  SUM(CAST(rd - rp AS HUGEINT) * (rd - rp)) AS s_dp,
       |  SUM(CAST(rh - rp AS HUGEINT) * (rh - rp)) AS s_hp
       | FROM srk GROUP BY source)
       |${rowOf("dsir~hashgram", "s_dh")}
       |UNION ALL
       |${rowOf("dsir~ppl", "s_dp")}
       |UNION ALL
       |${rowOf("hashgram~ppl", "s_hp")}""".stripMargin
  }

  /** Mirrors TextOps.knOrderGain: the bigram and trigram per-doc
    * sheets joined on doc_id (trigram-scorable docs only), per-source
    * exact floor-div means, gain = difference of the means.
    */
  val knOrderGain: String =
    s"""WITH ${Oracles8.knDocCtes},
       |$kn3DocCtes,
       |og AS (SELECT k2.doc_id, k2.source, k2.avg_nll64 AS nll2, k3.avg_nll64 AS nll3
       |       FROM kppl k2 JOIN k3ppl k3 USING (doc_id) WHERE k3.n_trigrams > 0)
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(nll2) AS BIGINT) // COUNT(*) AS mean_nll64_bigram,
       | CAST(SUM(nll3) AS BIGINT) // COUNT(*) AS mean_nll64_trigram,
       | (CAST(SUM(nll2) AS BIGINT) // COUNT(*))
       |  - (CAST(SUM(nll3) AS BIGINT) // COUNT(*)) AS order_gain64
       |FROM og GROUP BY source""".stripMargin
}
