package graft

/** Round-6 DuckDB oracle twins (embedding-space QA family). Same
  * contracts as Oracles2's ANN block: sequential-fold dot/norm (bit-
  * identical to the Spark expressions' fold order), ROW_NUMBER ties
  * broken by neighbor id, BIGINT-cast derived integers.
  */
object Oracles7 {

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private val normSql: String =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Mirrors SimilarityOps.hardNegatives: brute-force cosine top-3
    * per query slice, restricted to DIFFERENT-label neighbors.
    */
  val hardNegatives: String =
    s"""WITH q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(label AS BIGINT) AS query_label,
       |                  embedding AS qe, $normSql AS nq
       |           FROM embeddings WHERE vec_id < 5),
       |n AS MATERIALIZED (SELECT vec_id AS neighbor_id, CAST(label AS BIGINT) AS neighbor_label,
       |             embedding AS ne, $normSql AS nn FROM embeddings),
       |p AS MATERIALIZED (SELECT query_id, query_label, neighbor_id, neighbor_label,
       |       ${dotSql("qe", "ne")} / (nq * nn) AS score
       |      FROM q, n WHERE query_label <> neighbor_label)
       |SELECT query_id, query_label, neighbor_id, neighbor_label, score, rnk FROM (
       | SELECT query_id, query_label, neighbor_id, neighbor_label, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
       | FROM p)
       |WHERE rnk <= 3""".stripMargin

  /** Mirrors SimilarityOps.hubnessSkew: k-occurrence histogram of the
    * knnJoin graph (shared CTE — one definition of the kNN truth),
    * plus the k_occ = 0 anti-hub complement row.
    */
  val hubnessSkew: String =
    s"""WITH kj AS (${Oracles2.knnJoin}),
       |occ AS MATERIALIZED (SELECT neighbor_id, COUNT(*) AS k_occ FROM kj GROUP BY 1),
       |hist AS (SELECT k_occ, COUNT(*) AS n_vecs FROM occ GROUP BY 1),
       |zero AS (SELECT CAST(0 AS BIGINT) AS k_occ,
       |  (SELECT COUNT(*) FROM embeddings) - (SELECT COUNT(*) FROM occ) AS n_vecs)
       |SELECT k_occ, n_vecs FROM hist
       |UNION ALL SELECT k_occ, n_vecs FROM zero WHERE n_vecs > 0""".stripMargin

  /** Mirrors DedupOps.decontamNgramSweep: one shared token CTE, per
    * width the same md5 window-hash construction as the decontaminate
    * oracle, leak stats as scalar subqueries, HUGEINT-floored ppm.
    */
  val decontamNgramSweep: String = {
    val perN = graft.operators.DedupOps.DecontamSweepNs.map { n =>
      s"""sh$n AS (
         | SELECT doc_id, b,
         |  list_distinct(list_transform(range(len(toks)-${n - 1}),
         |   i -> CAST(CAST(concat('0x', substr(md5(
         |          array_to_string(toks[CAST(i+1 AS INT):CAST(i+$n AS INT)], ' ')), 1, 15))
         |        AS UBIGINT) AS BIGINT))) AS hs
         | FROM toks WHERE len(toks) >= $n),
         |p$n AS MATERIALIZED (SELECT doc_id, b, unnest(hs) AS h FROM sh$n),
         |lk$n AS MATERIALIZED (
         | SELECT DISTINCT tr.doc_id AS train_doc, tr.h
         | FROM (SELECT doc_id, h FROM p$n WHERE b < 80) tr
         | JOIN (SELECT DISTINCT h FROM p$n WHERE b >= 90) te USING (h))""".stripMargin
    }
    val rows = graft.operators.DedupOps.DecontamSweepNs.map { n =>
      s"""SELECT n, n_train_docs, n_contaminated_docs, n_leaked_ngrams,
         | CAST((CAST(n_contaminated_docs AS HUGEINT) * 1000000)
         |      // n_train_docs AS BIGINT) AS contaminated_ppm
         |FROM (SELECT CAST($n AS BIGINT) AS n,
         | (SELECT COUNT(DISTINCT doc_id) FROM p$n WHERE b < 80) AS n_train_docs,
         | (SELECT COUNT(DISTINCT train_doc) FROM lk$n) AS n_contaminated_docs,
         | (SELECT COUNT(DISTINCT h) FROM lk$n) AS n_leaked_ngrams)""".stripMargin
    }
    s"""WITH toks AS MATERIALIZED (
       | SELECT doc_id,
       |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 100 AS INT) AS b,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |${perN.mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Mirrors TextOps.sourceDivergence: per-term HUGEINT-floored χ²
    * ppm over observed (source, token) cells + the closed-form zero
    * part (HUGEINT `//` floors like Spark's DECIMAL DIV; DECIMAL `//`
    * would round).
    */
  val sourceDivergence: String =
    """WITH tok AS (
      | SELECT source,
      |  unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS t
      | FROM documents),
      |st AS MATERIALIZED (SELECT source, t, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
      |ct AS MATERIALIZED (SELECT t, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
      |ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
      |nn AS MATERIALIZED (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM st),
      |terms AS (
      | SELECT source, c_t, n_s, n,
      |  CAST((CAST(c_st AS HUGEINT) * n - CAST(n_s AS HUGEINT) * c_t)
      |     * (CAST(c_st AS HUGEINT) * n - CAST(n_s AS HUGEINT) * c_t) * 1000000
      |     // (CAST(n_s AS HUGEINT) * c_t * n) AS BIGINT) AS term_ppm
      | FROM st JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN nn)
      |SELECT source,
      | CAST(MAX(n_s) AS BIGINT) AS n_tokens,
      | COUNT(*) AS n_token_types,
      | CAST(SUM(term_ppm) AS BIGINT) AS chi2_obs_ppm,
      | CAST(CAST(MAX(n_s) AS HUGEINT) * (MAX(n) - SUM(c_t)) * 1000000
      |      // MAX(n) AS BIGINT) AS chi2_zero_ppm,
      | CAST(SUM(term_ppm) AS BIGINT)
      |  + CAST(CAST(MAX(n_s) AS HUGEINT) * (MAX(n) - SUM(c_t)) * 1000000
      |         // MAX(n) AS BIGINT) AS chi2_total_ppm
      |FROM terms GROUP BY 1""".stripMargin

  /** Mirrors TextOps.qualityVsDup: the quality formula (same CTE
    * chain as the quality_score oracle), dup membership = either end
    * of a minhashLsh pair (pair-graph members ARE the cluster members
    * — no recursion needed), HUGEINT floor-div ppm (DuckDB's DECIMAL
    * `//` rounds; HUGEINT floors like Spark's DIV).
    */
  val qualityVsDup: String =
    s"""WITH base AS (
       | SELECT doc_id, text,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |counts AS (
       | SELECT doc_id, text, len(toks) AS n_words,
       |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
       |  len(list_filter(toks, t -> t IN
       |    ('the','a','an','and','or','of','to','in','is','it','on','for'))) AS n_stop
       | FROM base),
       |qual AS (
       | SELECT doc_id,
       |  (CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END)
       |   * (1.0 - CASE WHEN length(text) > 0
       |            THEN CAST(n_punct AS DOUBLE)/CAST(length(text) AS DOUBLE) ELSE 0.0 END)
       |   * (0.5 + CASE WHEN n_words > 0
       |            THEN CAST(n_stop AS DOUBLE)/CAST(n_words AS DOUBLE) ELSE 0.0 END)
       |  AS quality
       | FROM counts),
       |mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |dup AS MATERIALIZED (SELECT DISTINCT doc_id FROM (
       |  SELECT doc_a AS doc_id FROM mh UNION ALL SELECT doc_b AS doc_id FROM mh)),
       |binned AS (
       | SELECT CAST(FLOOR(CAST(quality AS DECIMAL(18,2)) * 10) AS BIGINT) AS q_bin,
       |  CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup
       | FROM qual q LEFT JOIN dup d USING (doc_id))
       |SELECT q_bin, COUNT(*) AS n_docs, CAST(SUM(is_dup) AS BIGINT) AS n_dup,
       | CAST((CAST(SUM(is_dup) AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT) AS dup_ppm
       |FROM binned GROUP BY 1""".stripMargin

  /** Mirrors TextOps.tokenizerFertility: the shared bpeChain CTE
    * (Oracles6 — ONE definition of the fit), occurrence-weighted per
    * LANGUAGE, with the two floor-div ppm readouts in BIGINT.
    */
  val tokenizerFertility: String = {
    val last = s"r${graft.operators.TextOps.BpeMerges}"
    s"""WITH ${Oracles6.bpeChain},
       |enc AS (SELECT word, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_syms
       |        FROM $last),
       |occ AS MATERIALIZED (
       | SELECT lang, word, COUNT(*) AS cnt FROM (
       |  SELECT lang,
       |   unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')) AS word
       |  FROM documents)
       | GROUP BY 1, 2)
       |SELECT lang,
       | CAST(SUM(cnt) AS BIGINT) AS n_word_occurrences,
       | COUNT(DISTINCT word) AS n_word_types,
       | CAST(SUM(cnt * length(word)) AS BIGINT) AS n_letters,
       | CAST(SUM(cnt * n_syms) AS BIGINT) AS n_bpe_tokens,
       | CAST((CAST(SUM(cnt * n_syms) AS BIGINT) * 1000000)
       |      // CAST(SUM(cnt) AS BIGINT) AS BIGINT) AS fertility_ppm,
       | CAST((CAST(SUM(cnt * length(word)) AS BIGINT) * 1000000)
       |      // CAST(SUM(cnt * n_syms) AS BIGINT) AS BIGINT) AS letters_per_token_ppm
       |FROM occ JOIN enc USING (word)
       |GROUP BY 1""".stripMargin
  }

  /** Mirrors SimilarityOps.lexicalVsSemantic: the two pair oracles
    * (ONE definition each) full-outer-joined, HUGEINT-floored share.
    */
  val lexicalVsSemantic: String =
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |nd AS MATERIALIZED (${Oracles2.annNearDup}),
       |cats AS (
       | SELECT CASE WHEN mh.doc_a IS NOT NULL AND nd.vec_a IS NOT NULL THEN 'both'
       |             WHEN mh.doc_a IS NOT NULL THEN 'lexical_only'
       |             ELSE 'semantic_only' END AS category
       | FROM mh FULL OUTER JOIN nd
       |   ON mh.doc_a = nd.vec_a AND mh.doc_b = nd.vec_b),
       |c AS MATERIALIZED (SELECT category, COUNT(*) AS n_pairs FROM cats GROUP BY 1),
       |t AS MATERIALIZED (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_union FROM c)
       |SELECT category, n_pairs,
       | CAST(CAST(n_pairs AS HUGEINT) * 1000000 // n_union AS BIGINT) AS share_ppm
       |FROM c CROSS JOIN t""".stripMargin

  /** Mirrors DedupOps.minhashPermSweep: the shared shingle + bands
    * CTEs (sigs list reused for every width), the minhashLsh verify
    * filter, integer |m·u − i·p| ppm per pair, HUGEINT arithmetic.
    */
  val minhashPermSweep: String = {
    val ps = graft.operators.DedupOps.PermSweepPs
    val matchCols = ps.map { p =>
      s"""CAST(len(list_filter(range($p),
         |  k -> sga.sigs[CAST(k+1 AS INT)] = sgb.sigs[CAST(k+1 AS INT)])) AS BIGINT) AS m$p"""
        .stripMargin
    }.mkString(",\n ")
    val errCols = ps.map { p =>
      s"""CAST(SUM(CAST(ABS(CAST(m$p AS HUGEINT) * uni - CAST(inter AS HUGEINT) * $p)
         |     * 1000000 // (CAST($p AS HUGEINT) * uni) AS BIGINT)) AS BIGINT) AS e$p"""
        .stripMargin
    }.mkString(",\n ")
    val rows = ps.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS n_perms, n_pairs, e$p AS sum_err_ppm,
         | CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(CAST(e$p AS HUGEINT) // n_pairs AS BIGINT) END AS mean_err_ppm
         |FROM a""".stripMargin
    }
    s"""WITH ${Oracles2.shinglesCte},
       |${Oracles2.minhashBandsCte},
       |cand AS MATERIALIZED (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |ver AS (
       | SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
       |  CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS BIGINT) AS uni
       | FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b
       | WHERE ${Oracles2.jaccardExpr} >= 0.7),
       |m AS MATERIALIZED (
       | SELECT inter, uni,
       | $matchCols
       | FROM ver JOIN sigs sga ON sga.doc_id = doc_a JOIN sigs sgb ON sgb.doc_id = doc_b),
       |a AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       | $errCols
       | FROM m)
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Mirrors EventOps.saltingPlan: integer ceil via (n + T−1) // T. */
  val saltingPlan: String = {
    val t = graft.operators.EventOps.SaltTargetRows
    s"""SELECT event_type, n_rows,
       | CAST((n_rows + ${t - 1}) // $t AS BIGINT) AS salt_factor,
       | CAST((n_rows + (n_rows + ${t - 1}) // $t - 1)
       |      // ((n_rows + ${t - 1}) // $t) AS BIGINT) AS rows_per_task
       |FROM (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1)""".stripMargin
  }

  /** Mirrors DedupOps.bloomFppSweep: the decontaminate posting CTEs
    * (same 8-gram 60-bit hashes), md5-derived bit positions, count==k
    * membership, HUGEINT-floored fpp among true negatives.
    */
  val bloomFppSweep: String = {
    val k = graft.operators.DedupOps.BloomHashes
    def posSql(src: String, m: Int): String =
      s"""SELECT h, CAST(CAST(concat('0x', substr(md5(CAST(h AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 15))
         |     AS UBIGINT) % $m AS BIGINT) AS bit
         |FROM $src, (SELECT unnest(range($k)) AS i)""".stripMargin
    val perM = graft.operators.DedupOps.BloomSweepBits.map { m =>
      s"""bits$m AS (SELECT DISTINCT bit FROM (${posSql("te", m)})),
         |pass$m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pass FROM (
         |  SELECT h FROM (${posSql("tr", m)}) x
         |  JOIN bits$m USING (bit)
         |  GROUP BY h HAVING COUNT(*) = $k))""".stripMargin
    }
    val rows = graft.operators.DedupOps.BloomSweepBits.map { m =>
      s"""SELECT CAST($m AS BIGINT) AS m_bits, n_train AS n_train_hashes,
         | n_true AS n_true_hits, n_pass,
         | CASE WHEN n_train - n_true = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(CAST(n_pass - n_true AS HUGEINT) * 1000000
         |                // (n_train - n_true) AS BIGINT) END AS false_pos_ppm
         |FROM stat CROSS JOIN pass$m""".stripMargin
    }
    s"""WITH ${Oracles2.decontamPostingCte},
       |tr AS MATERIALIZED (SELECT DISTINCT h FROM p WHERE b < 80),
       |te AS MATERIALIZED (SELECT DISTINCT h FROM p WHERE b >= 90),
       |stat AS MATERIALIZED (SELECT CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_train,
       |                CAST((SELECT COUNT(*) FROM tr JOIN te USING (h)) AS BIGINT) AS n_true),
       |${perM.mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Mirrors DedupOps.candidateVolume: per scheme the SAME banding
    * CTEs as the pair oracles (minhashBandsCte / simhashCte / the
    * 8×4 plane construction), occupancy census, HUGEINT-mediated
    * pair arithmetic.
    */
  val candidateVolume: String = {
    def census(scheme: String, keysSubquery: String): String =
      s"""SELECT '$scheme' AS scheme,
         | CAST(COUNT(*) AS BIGINT) AS n_buckets,
         | CAST(SUM(occ) AS BIGINT) AS n_rows,
         | CAST(MAX(occ) AS BIGINT) AS max_occ,
         | CAST(SUM(CAST(CAST(occ AS HUGEINT) * (occ - 1) // 2 AS BIGINT)) AS BIGINT)
         |  AS candidate_pairs
         |FROM (SELECT COUNT(*) AS occ FROM ($keysSubquery) x GROUP BY k1, k2) o""".stripMargin
    def lshBit(i: Int): String =
      s"""CASE WHEN list_sum(list_transform(list_zip(embedding,
         |  list_transform(range(64), j -> CASE WHEN substr(md5(CAST(l*4+$i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) <= '7'
         |                                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
         |  x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0.0 THEN '1' ELSE '0' END""".stripMargin
    val mh = census(
      "minhash_band",
      s"""WITH ${Oracles2.shinglesCte},
         |${Oracles2.minhashBandsCte}
         |SELECT band_idx AS k1, band_hash AS k2 FROM bands""".stripMargin
    )
    val sh = census(
      "simhash_band",
      s"""WITH ${Oracles2.simhashCte}
         |SELECT b.band_idx AS k1,
         |  substr(simhash, CAST(b.band_idx*16+1 AS INT), 16) AS k2
         |FROM fp, (SELECT unnest(range(4)) AS band_idx) b""".stripMargin
    )
    val lsh = census(
      "lsh_table",
      s"""SELECT l AS k1,
         | concat(${(0 until 4).map(lshBit).mkString(",\n")}) AS k2
         |FROM embeddings, (SELECT unnest(range(8)) AS l)""".stripMargin
    )
    Seq(mh, sh, lsh).mkString("\nUNION ALL\n")
  }

  /** Mirrors LayoutOps.shardStability: the same md5 rendezvous argmax
    * (list_position of the list_max — FIRST maximum, like Spark's
    * array_position) and modulo comparison, HUGEINT-floored ppm.
    */
  val shardStability: String = {
    val (kf, kt) = (graft.operators.LayoutOps.ShardFrom, graft.operators.LayoutOps.ShardTo)
    def hrwList(k: Int): String =
      s"list_transform(range($k), s -> md5(CAST(doc_id AS VARCHAR) || '_' || CAST(s AS VARCHAR)))"
    s"""WITH h AS (
       | SELECT doc_id % $kf AS m_from, doc_id % $kt AS m_to,
       |  list_position(lf, list_max(lf)) - 1 AS r_from,
       |  list_position(lt, list_max(lt)) - 1 AS r_to
       | FROM (SELECT doc_id, ${hrwList(kf)} AS lf, ${hrwList(kt)} AS lt FROM documents)),
       |a AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN m_from <> m_to THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved,
       |  CAST(SUM(CASE WHEN r_from <> r_to THEN 1 ELSE 0 END) AS BIGINT) AS hrw_moved
       | FROM h)
       |SELECT 'mod' AS scheme, n AS n_docs, mod_moved AS n_moved,
       | CAST(CAST(mod_moved AS HUGEINT) * 1000000 // n AS BIGINT) AS moved_ppm FROM a
       |UNION ALL
       |SELECT 'rendezvous', n, hrw_moved,
       | CAST(CAST(hrw_moved AS HUGEINT) * 1000000 // n AS BIGINT) FROM a""".stripMargin
  }

  /** Mirrors TextOps.filterFunnel: the quality formula + exact-dedup
    * keeper window over quality survivors, the clusterKeepers and
    * decontaminate oracles as nested subqueries (ONE definition of
    * each policy), cumulative conditional sums, HUGEINT-floored ppm.
    */
  val filterFunnel: String = {
    val minQ = graft.operators.TextOps.TrainingPrepMinQuality
    val names = Seq("raw", "quality", "exact_dedup", "near_dup", "decontam")
    val branches = names.zipWithIndex.map { case (nm, i) =>
      val (s, t) = (s"s${i + 1}", s"t${i + 1}")
      s"""SELECT CAST(${i + 1} AS BIGINT) AS stage_idx, '$nm' AS stage,
         | $s AS n_docs, $t AS n_tokens,
         | CAST(CAST($s AS HUGEINT) * 1000000 // s1 AS BIGINT) AS doc_yield_ppm,
         | CASE WHEN t1 = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(CAST($t AS HUGEINT) * 1000000 // t1 AS BIGINT)
         | END AS token_yield_ppm
         |FROM a""".stripMargin
    }
    s"""WITH base AS (
       | SELECT doc_id, text,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks,
       |  ${Oracles2.fingerprintSql} AS fp
       | FROM documents),
       |q AS MATERIALIZED (SELECT doc_id, fp, CAST(len(toks) AS BIGINT) AS n_toks,
       |       (${Oracles2.qualityExprSql}) >= $minQ AS pass_q
       |      FROM base),
       |k AS (SELECT doc_id, fp, n_toks, pass_q,
       |       doc_id = MIN(CASE WHEN pass_q THEN doc_id END)
       |                OVER (PARTITION BY fp) AS is_keeper
       |      FROM q),
       |ck AS (SELECT doc_id, keep FROM (${Oracles2.clusterKeepers})),
       |dc AS (SELECT train_doc FROM (${Oracles2.decontaminate})),
       |f AS MATERIALIZED (SELECT k.n_toks, k.pass_q,
       |       (k.pass_q AND k.is_keeper) AS c3,
       |       (k.pass_q AND k.is_keeper AND COALESCE(ck.keep, TRUE)) AS c4,
       |       (k.pass_q AND k.is_keeper AND COALESCE(ck.keep, TRUE)
       |        AND dc.train_doc IS NULL) AS c5
       |      FROM k LEFT JOIN ck ON ck.doc_id = k.doc_id
       |             LEFT JOIN dc ON dc.train_doc = k.doc_id),
       |a AS MATERIALIZED (SELECT
       |  CAST(COUNT(*) AS BIGINT) AS s1, CAST(SUM(n_toks) AS BIGINT) AS t1,
       |  CAST(SUM(CASE WHEN pass_q THEN 1 ELSE 0 END) AS BIGINT) AS s2,
       |  CAST(SUM(CASE WHEN pass_q THEN n_toks ELSE 0 END) AS BIGINT) AS t2,
       |  CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
       |  CAST(SUM(CASE WHEN c3 THEN n_toks ELSE 0 END) AS BIGINT) AS t3,
       |  CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
       |  CAST(SUM(CASE WHEN c4 THEN n_toks ELSE 0 END) AS BIGINT) AS t4,
       |  CAST(SUM(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS s5,
       |  CAST(SUM(CASE WHEN c5 THEN n_toks ELSE 0 END) AS BIGINT) AS t5
       | FROM f)
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Mirrors DedupOps.dupSourceMatrix: the minhashLsh pair CTE joined
    * twice to the doc directory, unordered source pair via
    * least/greatest, HUGEINT-floored share ppm.
    */
  val dupSourceMatrix: String =
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |s AS MATERIALIZED (SELECT doc_id, source FROM documents),
       |j AS MATERIALIZED (SELECT least(sa.source, sb.source) AS src_lo,
       |             greatest(sa.source, sb.source) AS src_hi
       |      FROM mh JOIN s sa ON sa.doc_id = doc_a
       |              JOIN s sb ON sb.doc_id = doc_b),
       |t AS MATERIALIZED (SELECT COUNT(*) AS n_total FROM mh)
       |SELECT src_lo, src_hi, src_lo = src_hi AS intra_source,
       | COUNT(*) AS n_pairs,
       | CAST(CAST(COUNT(*) AS HUGEINT) * 1000000 // n_total AS BIGINT) AS pair_ppm
       |FROM j CROSS JOIN t GROUP BY src_lo, src_hi, n_total""".stripMargin

  /** Mirrors SimilarityOps.lshPlaneSweep: per config the annTopkLsh
    * CTE chain with plane index l·P+i, counts as scalar subqueries,
    * the brute CTE (Oracles2.annTopkBruteforce — ONE definition of
    * the truth) intersected for hits, HUGEINT-floored recall ppm.
    */
  val lshPlaneSweep: String = {
    def cfg(nt: Int, np: Int): String = {
      def bit(i: Int): String =
        s"""CASE WHEN list_sum(list_transform(list_zip(embedding,
           |  list_transform(range(64), j -> CASE WHEN substr(md5(CAST(l*$np+$i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) <= '7'
           |                                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
           |  x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0.0 THEN '1' ELSE '0' END""".stripMargin
      s"""SELECT '${nt}x$np' AS config, CAST($nt AS BIGINT) AS n_tables,
         | CAST($np AS BIGINT) AS n_planes, n_candidates, n_topk, n_hits,
         | CAST(CAST(n_hits AS HUGEINT) * 1000000 // n_truth AS BIGINT) AS recall_ppm
         |FROM (
         | WITH buck AS MATERIALIZED (
         |  SELECT vec_id, embedding, l AS table_idx,
         |   concat(${(0 until np).map(bit).mkString(",\n")}) AS bucket
         |  FROM embeddings, (SELECT unnest(range($nt)) AS l)),
         | q AS MATERIALIZED (SELECT table_idx, bucket, vec_id AS query_id FROM buck WHERE vec_id < 5),
         | n AS MATERIALIZED (SELECT table_idx, bucket, vec_id AS neighbor_id FROM buck),
         | cand AS MATERIALIZED (SELECT DISTINCT query_id, neighbor_id
         |          FROM q JOIN n USING (table_idx, bucket) WHERE query_id <> neighbor_id),
         | qn AS MATERIALIZED (SELECT vec_id, embedding, $normSql AS nv FROM embeddings),
         | p AS MATERIALIZED (SELECT query_id, neighbor_id,
         |        ${dotSql("qe.embedding", "ne.embedding")} / (qe.nv * ne.nv) AS score
         |       FROM cand JOIN qn qe ON qe.vec_id = query_id
         |                 JOIN qn ne ON ne.vec_id = neighbor_id),
         | tk AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
         |   SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
         |   FROM p) WHERE rnk <= 5),
         | bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${Oracles2.annTopkBruteforce}))
         | SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         |        (SELECT COUNT(*) FROM tk) AS n_topk,
         |        (SELECT COUNT(*) FROM tk JOIN bf USING (query_id, neighbor_id)) AS n_hits,
         |        (SELECT COUNT(*) FROM bf) AS n_truth)""".stripMargin
    }
    graft.operators.SimilarityOps.PlaneSweepConfigs
      .map { case (nt, np) => cfg(nt, np) }
      .mkString("\nUNION ALL\n")
  }

  /** Mirrors TextOps.heapsLaw: decile of a doc/type is a pure integer
    * floor-div of (first) doc_id against the span scalar; the
    * cumulative frame is the same decile→[decile..10] unnest prefix
    * sum (BIGINT `//` floors like Spark's integer DIV).
    */
  val heapsLaw: String = {
    val dec = graft.operators.TextOps.HeapsDeciles
    s"""WITH span AS MATERIALIZED (SELECT MAX(doc_id) + 1 AS s FROM documents),
       |tokd AS MATERIALIZED (SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |mass AS (
       | SELECT CAST(doc_id * $dec // s AS BIGINT) + 1 AS dec,
       |  COUNT(*) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS n_toks
       | FROM tokd CROSS JOIN span GROUP BY 1),
       |firsts AS (SELECT t, MIN(doc_id) AS fd
       | FROM (SELECT doc_id, unnest(toks) AS t FROM tokd) GROUP BY 1),
       |ntypes AS (
       | SELECT CAST(fd * $dec // s AS BIGINT) + 1 AS dec, COUNT(*) AS new_types
       | FROM firsts CROSS JOIN span GROUP BY 1),
       |per AS MATERIALIZED (
       | SELECT mass.dec AS dec, n_docs, n_toks, COALESCE(new_types, 0) AS new_types
       | FROM mass LEFT JOIN ntypes ON mass.dec = ntypes.dec),
       |grid AS MATERIALIZED (
       | SELECT unnest(generate_series(dec, $dec)) AS decile, n_docs, n_toks, new_types
       | FROM per)
       |SELECT decile, CAST(SUM(n_docs) AS BIGINT) AS cum_docs,
       | CAST(SUM(n_toks) AS BIGINT) AS cum_tokens,
       | CAST(SUM(new_types) AS BIGINT) AS cum_types
       |FROM grid GROUP BY 1""".stripMargin
  }

  /** Mirrors TextOps.zipfFit: ROW_NUMBER over the full vocab (the
    * oracle may single-task what Spark range-partitions), HUGEINT-
    * floored ratio ppm against the rank-1 frequency.
    */
  val zipfFit: String =
    s"""WITH wc AS MATERIALIZED (SELECT t, COUNT(*) AS cnt FROM (
       |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'),
       |                x -> x <> '')) AS t
       |  FROM documents) GROUP BY 1),
       |r AS MATERIALIZED (SELECT t, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, t ASC) AS rnk FROM wc),
       |f AS MATERIALIZED (SELECT MAX(cnt) AS f1 FROM wc)
       |SELECT rnk, t AS term, CAST(cnt AS BIGINT) AS freq,
       | CAST(CAST(cnt AS HUGEINT) * rnk * 1000000 // f1 AS BIGINT) AS zipf_ratio_ppm
       |FROM r CROSS JOIN f WHERE rnk <= ${graft.operators.TextOps.ZipfTopK}""".stripMargin

  /** Mirrors DedupOps.dupGrowthCurve: the same md5 doc-id buckets and
    * per-fingerprint conditional counts, one UNION ALL branch per
    * sample size, HUGEINT-floored dup ppm.
    */
  val dupGrowthCurve: String = {
    val branches = graft.operators.DedupOps.GrowthPcts.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS pct, CAST(SUM(c$p) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN c$p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_texts,
         | CAST(SUM(CASE WHEN c$p > 1 THEN c$p - 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
         |FROM g""".stripMargin
    }
    val condCols = graft.operators.DedupOps.GrowthPcts
      .map(p => s"SUM(CASE WHEN b < $p THEN 1 ELSE 0 END) AS c$p")
      .mkString(",\n  ")
    s"""WITH d AS MATERIALIZED (SELECT md5(text) AS fp,
       |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
       |       AS UBIGINT) % 100 AS INT) AS b
       | FROM documents),
       |g AS MATERIALIZED (SELECT fp,
       |  $condCols
       | FROM d GROUP BY 1)
       |SELECT pct, n_docs, n_texts, n_dup_docs,
       | CASE WHEN n_docs = 0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(CAST(n_dup_docs AS HUGEINT) * 1000000 // n_docs AS BIGINT)
       | END AS dup_ppm
       |FROM (${branches.mkString("\nUNION ALL\n")})""".stripMargin
  }

  /** Mirrors SimilarityOps.semanticLeakage: the annNearDup pair CTE
    * bucketed by the md5 80/10/10 split of both ends (same splitCase
    * as Oracles2.splitLeakage).
    */
  val semanticLeakage: String = {
    def splitCase(idCol: String): String =
      s"""CASE WHEN CAST(CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 80 THEN 'train'
         |     WHEN CAST(CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 90 THEN 'val' ELSE 'test' END""".stripMargin
    s"""WITH nd AS MATERIALIZED (${Oracles2.annNearDup})
       |SELECT ${splitCase("vec_a")} AS split_a, ${splitCase("vec_b")} AS split_b,
       | COUNT(*) AS n_pairs, MAX(score) AS max_score
       |FROM nd GROUP BY 1, 2""".stripMargin
  }

  /** Mirrors DedupOps.spanRewriteAnyAlign: positional 8-token window
    * hashes (same md5-first-15-hex construction as the grid oracle),
    * dup = window content in ≥ 2 docs, a token is dropped iff covered
    * by any dup window, kept tokens re-joined in position order.
    */
  val spanRewriteAnyAlign: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |sh AS MATERIALIZED (
      | SELECT doc_id, i AS pos,
      |  CAST(CAST(concat('0x', substr(md5(
      |    array_to_string(toks[CAST(i+1 AS INT):CAST(i+8 AS INT)], ' ')), 1, 15))
      |   AS UBIGINT) AS BIGINT) AS h
      | FROM (SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS i
      |       FROM toks WHERE len(toks) >= 8)),
      |nd AS MATERIALIZED (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS c FROM sh GROUP BY 1)
      |       WHERE c >= 2),
      |dup AS MATERIALIZED (SELECT DISTINCT doc_id, pos FROM sh JOIN nd USING (h)),
      |cover AS (SELECT DISTINCT doc_id, pos + j AS i FROM dup, range(8) t(j)),
      |flat AS (
      | SELECT doc_id,
      |  unnest(list_transform(range(len(toks)),
      |    i -> struct_pack(i := i, t := toks[CAST(i + 1 AS INT)]))) AS s
      | FROM toks),
      |kept AS MATERIALIZED (
      | SELECT f.doc_id, f.s.i AS i, f.s.t AS t FROM flat f
      | WHERE NOT EXISTS (SELECT 1 FROM cover c
      |                   WHERE c.doc_id = f.doc_id AND c.i = f.s.i)),
      |agg AS (
      | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS clean_tokens,
      |  string_agg(t, ' ' ORDER BY i) AS clean_text
      | FROM kept GROUP BY doc_id),
      |starts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
      |           FROM dup GROUP BY doc_id)
      |SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
      | COALESCE(n_dup_windows, 0) AS n_dup_windows,
      | COALESCE(clean_tokens, 0) AS clean_tokens,
      | COALESCE(clean_text, '') AS clean_text
      |FROM toks b
      |LEFT JOIN agg USING (doc_id)
      |LEFT JOIN starts USING (doc_id)""".stripMargin

  /** Mirrors DedupOps.spanFamilyAudit: both rewrite oracles as
    * WITH-bearing subqueries, doc-joined to source, HUGEINT-floored
    * ppm rates.
    */
  val spanFamilyAudit: String =
    s"""WITH g AS MATERIALIZED (SELECT doc_id, n_tokens, n_dropped_blocks * 8 AS grid_dropped
       |           FROM (${Oracles6.spanRewrite})),
       |a AS MATERIALIZED (SELECT doc_id, n_tokens - clean_tokens AS any_dropped
       |      FROM ($spanRewriteAnyAlign)),
       |s AS MATERIALIZED (SELECT doc_id, source FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       | CAST(SUM(grid_dropped) AS BIGINT) AS grid_dropped,
       | CAST(SUM(any_dropped) AS BIGINT) AS any_dropped,
       | CAST(CAST(SUM(grid_dropped) AS HUGEINT) * 1000000 // SUM(n_tokens) AS BIGINT)
       |   AS grid_ppm,
       | CAST(CAST(SUM(any_dropped) AS HUGEINT) * 1000000 // SUM(n_tokens) AS BIGINT)
       |   AS any_ppm
       |FROM s JOIN g USING (doc_id) JOIN a USING (doc_id)
       |GROUP BY source""".stripMargin

  /** ONE definition of the PII-injected corpus (mirrors
    * TextOps.piiDocs): the raw documents text is letters-only, so the
    * oracle re-derives the injected email/phone/IP strings from doc_id
    * with the same integer arithmetic — the regexes are then verified
    * against text DuckDB built, not text Spark handed it.
    */
  private def piiCteFrom(from: String): String =
    s"""pii AS (
       | SELECT doc_id, source,
       |  text ||
       |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE '' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN ' call ' || CAST(200 + doc_id % 800 AS VARCHAR) ||
       |    '-' || CAST(100 + doc_id % 900 AS VARCHAR) ||
       |    '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END ||
       |  CASE WHEN doc_id % 4 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) ||
       |    '.' || CAST(doc_id * 7 % 256 AS VARCHAR) ||
       |    '.' || CAST(doc_id * 13 % 256 AS VARCHAR) ELSE '' END
       |  AS text
       | FROM $from)""".stripMargin

  private val piiCte: String = piiCteFrom("documents")

  /** Mirrors TextOps.piiLuhnAudit: the card-injected corpus rebuilt
    * from the SAME templates (base/sum fragments shared from TextOps,
    * `//` as the integer-division spelling), tokens re-extracted and
    * re-verified with the SAME unrolled positional Luhn sum.
    */
  val piiLuhnAudit: String = {
    import graft.operators.TextOps.{cardBaseSql, cardSumSql, luhnSumSql, CardRe}
    val sum = cardSumSql("//")
    s"""WITH pc AS MATERIALIZED (
       | SELECT doc_id, source,
       |  text ||
       |  CASE WHEN doc_id % 7 = 0 THEN ' card ' || $cardBaseSql ||
       |    CAST((10 - $sum % 10) % 10 AS STRING) ELSE '' END ||
       |  CASE WHEN doc_id % 11 = 0 THEN ' card ' || $cardBaseSql ||
       |    CAST(((10 - $sum % 10) % 10 + 5) % 10 AS STRING) ELSE '' END
       |  AS text
       | FROM documents),
       |tok AS (SELECT source, unnest(regexp_extract_all(text, '$CardRe')) AS tok FROM pc)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_cards,
       | CAST(SUM(CASE WHEN (${luhnSumSql("tok")}) % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_valid,
       | CAST(SUM(CASE WHEN (${luhnSumSql("tok")}) % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT)
       |   AS n_invalid
       |FROM tok GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.piiProfile: per-source match counts over the
    * shared PII regexes (common Java/RE2 dialect), HUGEINT-floored
    * affected-doc ppm, every SUM BIGINT-cast.
    */
  val piiProfile: String = {
    import graft.operators.TextOps.{EmailRe, PhoneRe, Ipv4Re}
    s"""WITH $piiCte,
       |c AS MATERIALIZED (SELECT source,
       |  len(regexp_extract_all(text, '$EmailRe')) AS ne,
       |  len(regexp_extract_all(text, '$PhoneRe')) AS np,
       |  len(regexp_extract_all(text, '$Ipv4Re')) AS ni
       | FROM pii)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_pii_docs,
       | CAST(SUM(ne) AS BIGINT) AS n_emails,
       | CAST(SUM(np) AS BIGINT) AS n_phones,
       | CAST(SUM(ni) AS BIGINT) AS n_ips,
       | CAST(CAST(SUM(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 ELSE 0 END)
       |      AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS pii_doc_ppm
       |FROM c GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.piiRewrite: same replacement chain (email →
    * phone → IP, 'g' flag — DuckDB replaces only the first match
    * without it), per-doc counts BIGINT-cast.
    */
  val piiRewrite: String = {
    import graft.operators.TextOps.{EmailRe, PhoneRe, Ipv4Re}
    s"""WITH $piiCte
       |SELECT doc_id,
       | CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       | CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
       | CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
       | regexp_replace(regexp_replace(regexp_replace(text,
       |   '$EmailRe', '<EMAIL>', 'g'),
       |   '$PhoneRe', '<PHONE>', 'g'),
       |   '$Ipv4Re', '<IP>', 'g') AS clean_text
       |FROM pii""".stripMargin
  }

  /** ONE definition of the boilerplate-injected corpus (mirrors
    * TextOps.boilerplateDocs): the same nav/footer/newsletter template
    * lines re-derived from doc_id, chr(10)-separated. The oracle
    * computes line doc-frequency on the line STRINGS, so a 60-bit
    * line-hash collision on the Spark side would hash-mismatch the
    * gate (the hashed-postings collision discipline).
    */
  private def boilerCteFrom(from: String): String =
    s"""bp AS MATERIALIZED (
       | SELECT doc_id, source,
       |  text ||
       |  CASE WHEN doc_id % 2 = 0 THEN chr(10) ||
       |    'nav home products pricing about contact' ELSE '' END ||
       |  CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
       |    'copyright footer all rights reserved edition ' ||
       |    CAST(doc_id % 4 AS VARCHAR) ELSE '' END ||
       |  CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
       |    'subscribe to the newsletter for updates issue ' ||
       |    CAST(doc_id % 3 AS VARCHAR) ELSE '' END
       |  AS text
       | FROM $from)""".stripMargin

  private val boilerCte: String = boilerCteFrom("documents")

  /** Mirrors TextOps.boilerplateProfile: per-source line volume and
    * boilerplate-line occurrence counts at the shared df threshold,
    * HUGEINT-floored ppm, every SUM BIGINT-cast.
    */
  val boilerplateProfile: String = {
    val k = graft.operators.TextOps.BoilerDf
    s"""WITH $boilerCte,
       |lines AS MATERIALIZED (SELECT doc_id, source,
       |  unnest(string_split(text, chr(10))) AS line FROM bp),
       |df AS (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY line),
       |j AS MATERIALIZED (SELECT l.source, CASE WHEN df.nd >= $k THEN 1 ELSE 0 END AS b
       |      FROM lines l JOIN df USING (line)),
       |pl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |        CAST(SUM(b) AS BIGINT) AS n_boiler_lines FROM j GROUP BY source),
       |pd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM bp GROUP BY source)
       |SELECT pd.source, pd.n_docs, pl.n_lines, pl.n_boiler_lines,
       | CAST(CAST(pl.n_boiler_lines AS HUGEINT) * 1000000 // pl.n_lines AS BIGINT)
       |   AS boiler_line_ppm
       |FROM pd JOIN pl USING (source)""".stripMargin
  }

  /** Mirrors TextOps.boilerplateRewrite: drop every line with corpus
    * doc-frequency ≥ the shared threshold, rebuild the doc from the
    * survivors in position order (string_agg skips the NULLed dropped
    * lines; COALESCE covers an all-dropped doc, matching Spark's
    * empty array_join).
    */
  val boilerplateRewrite: String = {
    val k = graft.operators.TextOps.BoilerDf
    s"""WITH $boilerCte,
       |ls AS MATERIALIZED (SELECT doc_id, string_split(text, chr(10)) AS ls FROM bp),
       |lines AS MATERIALIZED (SELECT doc_id, unnest(range(len(ls))) AS pos,
       |  unnest(ls) AS line FROM ls),
       |df AS (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY line),
       |j AS MATERIALIZED (SELECT l.doc_id, l.pos, l.line, df.nd
       |      FROM lines l JOIN df USING (line))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       | CAST(SUM(CASE WHEN nd >= $k THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       | COALESCE(string_agg(CASE WHEN nd < $k THEN line END, chr(10) ORDER BY pos), '')
       |   AS clean_text
       |FROM j GROUP BY doc_id""".stripMargin
  }

  /** Mirrors EventOps.tCloseness: same QI classes as the
    * k-anonymity/l-diversity oracles, ordered-EMD via the
    * cross-multiplied cumulative comparison over the classes × m
    * grid, HUGEINT-floored ppm at the shared threshold.
    */
  val tCloseness: String = {
    val thr = graft.operators.EventOps.TClosePpm
    s"""WITH q AS MATERIALIZED (
       | SELECT event_type,
       |  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
       |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000 AS value_band,
       |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS sensitive
       | FROM events),
       |r AS MATERIALIZED (SELECT * FROM q WHERE sensitive IS NOT NULL),
       |cc AS MATERIALIZED (SELECT event_type, hour_of_day, value_band, sensitive,
       |  COUNT(*) AS c FROM r GROUP BY 1, 2, 3, 4),
       |ct AS MATERIALIZED (SELECT event_type, hour_of_day, value_band, SUM(c) AS n_c
       |       FROM cc GROUP BY 1, 2, 3),
       |gc AS MATERIALIZED (SELECT sensitive, COUNT(*) AS g FROM r GROUP BY 1),
       |gt AS (SELECT SUM(g) AS big_g, COUNT(*) AS m FROM gc),
       |grid AS MATERIALIZED (SELECT ct.event_type, ct.hour_of_day, ct.value_band, ct.n_c,
       |  gc.sensitive, gc.g, COALESCE(cc.c, 0) AS c
       | FROM ct CROSS JOIN gc
       | LEFT JOIN cc USING (event_type, hour_of_day, value_band, sensitive)),
       |cum AS (SELECT *,
       |  SUM(c) OVER (PARTITION BY event_type, hour_of_day, value_band
       |    ORDER BY sensitive ROWS UNBOUNDED PRECEDING) AS cum_c,
       |  SUM(g) OVER (PARTITION BY event_type, hour_of_day, value_band
       |    ORDER BY sensitive ROWS UNBOUNDED PRECEDING) AS cum_g
       | FROM grid),
       |emd AS (SELECT event_type, hour_of_day, value_band, n_c,
       |  SUM(ABS(cum_c * gt.big_g - cum_g * n_c)) AS num,
       |  MAX(gt.big_g) AS big_g, MAX(gt.m) AS m
       | FROM cum CROSS JOIN gt GROUP BY 1, 2, 3, 4),
       |t AS MATERIALIZED (SELECT event_type, n_c,
       |  CAST(CAST(num AS HUGEINT) * 1000000 // (n_c * big_g * (m - 1)) AS BIGINT)
       |    AS t_ppm
       | FROM emd)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_classes,
       | CAST(MAX(t_ppm) AS BIGINT) AS max_t_ppm,
       | CAST(SUM(CASE WHEN t_ppm > $thr THEN 1 ELSE 0 END) AS BIGINT) AS risky_classes,
       | CAST(CAST(SUM(CASE WHEN t_ppm > $thr THEN n_c ELSE 0 END) AS HUGEINT)
       |   * 1000000 // SUM(n_c) AS BIGINT) AS risky_rows_ppm
       |FROM t GROUP BY 1""".stripMargin
  }

  /** Mirrors SimilarityOps.ivfNprobeSweep: the same 1e-6-quantized
    * exact centroids as ORDERED lists (list(... ORDER BY pos) — the
    * Spark side's array_sort(collect_list)), sequential-fold centroid
    * cosines, per-query label ranks, one widest-probe candidate pool
    * filtered per nprobe, recall vs the brute-force truth.
    */
  val ivfNprobeSweep: String = {
    val rows = (1 to 3).map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         | (SELECT CAST(COUNT(*) AS BIGINT) FROM sc WHERE label_rank <= $np)
         |   AS n_candidates,
         | (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_truth,
         | (SELECT CAST(COUNT(*) AS BIGINT) FROM tr JOIN (
         |    SELECT query_id, neighbor_id FROM (
         |     SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, neighbor_id ASC) AS rnk
         |     FROM sc WHERE label_rank <= $np)
         |    WHERE rnk <= 5) tk USING (query_id, neighbor_id)) AS n_hits,
         | CAST(CAST((SELECT COUNT(*) FROM tr JOIN (
         |    SELECT query_id, neighbor_id FROM (
         |     SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, neighbor_id ASC) AS rnk
         |     FROM sc WHERE label_rank <= $np)
         |    WHERE rnk <= 5) tk USING (query_id, neighbor_id)) AS HUGEINT)
         |   * 1000000 // (SELECT COUNT(*) FROM tr) AS BIGINT) AS recall_ppm""".stripMargin
    }
    s"""WITH dims AS MATERIALIZED (SELECT label, unnest(range(len(embedding))) AS pos,
       |  unnest(embedding) AS x FROM embeddings),
       |sq AS (SELECT label, pos,
       |  SUM(CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS sum_q
       | FROM dims GROUP BY label, pos),
       |nv AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label),
       |cent AS (SELECT s.label,
       |  list_transform(list(s.sum_q ORDER BY s.pos),
       |    v -> CAST(v AS DOUBLE) / 1000000.0 / nv.n_vecs) AS cvec
       | FROM sq s JOIN nv USING (label) GROUP BY s.label, nv.n_vecs),
       |cn AS (SELECT label, cvec,
       |  sqrt(list_sum(list_transform(cvec, c -> c * c))) AS cnorm FROM cent),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, embedding AS qe, $normSql AS nq
       |      FROM embeddings WHERE vec_id < 5),
       |pr AS (SELECT query_id, qe, nq, cn.label,
       |  ${dotSql("qe", "cvec")} / (nq * cnorm) AS csim
       | FROM q, cn),
       |rk AS (SELECT query_id, qe, nq, label,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY csim DESC, label ASC) AS label_rank FROM pr),
       |pk AS (SELECT * FROM rk WHERE label_rank <= 3),
       |n AS MATERIALIZED (SELECT vec_id AS neighbor_id, embedding AS ne, label, $normSql AS nn
       |      FROM embeddings),
       |sc AS MATERIALIZED (SELECT p.query_id, n.neighbor_id, p.label_rank,
       |  ${dotSql("p.qe", "n.ne")} / (p.nq * n.nn) AS score
       | FROM pk p JOIN n USING (label) WHERE p.query_id <> n.neighbor_id),
       |tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${Oracles2.annTopkBruteforce}) tq)
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Mirrors TextOps.tokenWaterfill — but derives the cap with the
    * FULL relational window form (rank + prefix sums over the source
    * masses), so the Spark side's driver-side scalar arithmetic is
    * verified by an independent derivation, not replayed.
    */
  val tokenWaterfill: String =
    """WITH m AS MATERIALIZED (
      | SELECT source,
      |  CAST(SUM(len(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |    t -> t <> ''))) AS BIGINT) AS mass
      | FROM documents GROUP BY source),
      |o AS MATERIALIZED (SELECT source, mass,
      |  ROW_NUMBER() OVER (ORDER BY mass, source) AS r,
      |  SUM(mass) OVER (ORDER BY mass, source ROWS UNBOUNDED PRECEDING) AS p,
      |  COUNT(*) OVER () AS k,
      |  (SUM(mass) OVER ()) // 2 AS b
      | FROM m),
      |js AS (SELECT MAX(CASE WHEN p + (k - r) * mass <= b THEN r ELSE 0 END) AS j
      |       FROM o),
      |pj AS (SELECT COALESCE((SELECT o.p FROM o, js WHERE o.r = js.j), 0) AS pj),
      |capc AS (SELECT (t.b - pj.pj) // (t.k - js.j) AS cap
      |         FROM (SELECT MAX(b) AS b, MAX(k) AS k FROM o) t, pj, js)
      |SELECT m.source, m.mass,
      | CAST(LEAST(m.mass, c.cap) AS BIGINT) AS alloc,
      | CAST(c.cap AS BIGINT) AS cap,
      | CAST(CAST(LEAST(m.mass, c.cap) AS HUGEINT) * 1000000 // m.mass AS BIGINT)
      |   AS fill_ppm
      |FROM m CROSS JOIN capc c""".stripMargin

  /** Mirrors TextOps.cleanManifest: stage bitmask + 60-bit
    * fingerprints before/after the chain.
    */
  val cleanManifest: String = {
    def fp(c: String): String =
      s"CAST(CAST(concat('0x', substr(md5($c), 1, 15)) AS UBIGINT) AS BIGINT)"
    s"""WITH $cleanChainCtes,
       |dd AS (SELECT doc_id, ${fp("text")} AS dirty_fp FROM bp)
       |SELECT f.doc_id,
       | CAST(CASE WHEN f.n_boiler_dropped > 0 THEN 1 ELSE 0 END +
       |      CASE WHEN f.n_pii_redacted > 0 THEN 2 ELSE 0 END +
       |      CASE WHEN f.n_secrets_redacted > 0 THEN 4 ELSE 0 END AS BIGINT)
       |   AS touched_mask,
       | dd.dirty_fp,
       | ${fp("f.clean_text")} AS clean_fp
       |FROM fin f JOIN dd USING (doc_id)""".stripMargin
  }

  /** Mirrors RelationalOps.broadcastThresholdPlan — generated from
    * the SAME DimTableSpecs, so schema drift breaks the build, not
    * the gate.
    */
  val broadcastThresholdPlan: String = {
    import graft.operators.RelationalOps.{DimTableSpecs, BroadcastThresholdBytes}
    DimTableSpecs
      .map { case (t, fixed, strCols) =>
        val sb = strCols.map(c => s"SUM(len($c))").mkString(" + ")
        s"""SELECT '$t' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           | CAST($sb + COUNT(*) * $fixed AS BIGINT) AS est_bytes,
           | CAST(CASE WHEN $sb + COUNT(*) * $fixed < $BroadcastThresholdBytes
           |   THEN 1 ELSE 0 END AS BIGINT) AS broadcastable
           |FROM $t""".stripMargin
      }
      .mkString("\nUNION ALL\n")
  }

  /** Mirrors RelationalOps.joinCardinalityCensus — the same
    * histogram-product computation per shared FK edge.
    */
  val joinCardinalityCensus: String = {
    import graft.operators.RelationalOps.JoinEdges
    JoinEdges
      .map { case (e, lt, lk, rt, rk) =>
        s"""SELECT '$e' AS edge,
           | CAST(SUM(COALESCE(cl, 0)) AS BIGINT) AS n_left,
           | CAST(SUM(COALESCE(cr, 0)) AS BIGINT) AS n_right,
           | CAST(SUM(COALESCE(cl, 0) * COALESCE(cr, 0)) AS BIGINT) AS n_out
           |FROM (SELECT $lk AS k, COUNT(*) AS cl FROM $lt GROUP BY $lk) l
           | FULL JOIN (SELECT $rk AS k, COUNT(*) AS cr FROM $rt GROUP BY $rk) r
           |  USING (k)""".stripMargin
      }
      .mkString("\nUNION ALL\n")
  }

  /** Mirrors TextOps.boilerplateDfSweep: one line-frequency aggregate
    * on the STRING lines, three conditional threshold rows.
    */
  val boilerplateDfSweep: String = {
    val rows = Seq(5, 10, 20).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS df_min,
         | CAST(nl_$k AS BIGINT) AS n_boiler_lines,
         | CAST(no_$k AS BIGINT) AS n_boiler_occurrences,
         | CAST(CAST(no_$k AS HUGEINT) * 1000000 // total_occ AS BIGINT)
         |   AS boiler_occ_ppm
         |FROM t""".stripMargin
    }
    val sums = Seq(5, 10, 20).map { k =>
      s"""SUM(CASE WHEN nd >= $k THEN 1 ELSE 0 END) AS nl_$k,
         | SUM(CASE WHEN nd >= $k THEN occ ELSE 0 END) AS no_$k""".stripMargin
    }
    s"""WITH $boilerCte,
       |lines AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM bp),
       |pl AS (SELECT line, COUNT(DISTINCT doc_id) AS nd, COUNT(*) AS occ
       |       FROM lines GROUP BY line),
       |t AS MATERIALIZED (SELECT SUM(occ) AS total_occ, ${sums.mkString(",\n ")} FROM pl)
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Mirrors TextOps.secretScan: the secret-injected corpus rebuilt
    * from the shared token template (24 distinct-residue alphabet
    * positions) + repeated-char decoy, candidates re-extracted with
    * the shared shape regex and re-classified by the same
    * distinct-char diversity threshold.
    */
  /** ONE definition of the secret-injected corpus (mirrors
    * TextOps.secretDocs). The Spark-side template uses
    * concat(...)/substr/CAST — all valid DuckDB; only STRING→VARCHAR
    * is a dialect seam and the template has no casts to STRING.
    */
  private def secretCteFrom(from: String): String = {
    import graft.operators.TextOps.{SecretAlphabet, secretTokenSql}
    s"""sd AS (
       | SELECT doc_id, source,
       |  text ||
       |  CASE WHEN doc_id % 6 = 0 THEN ' key ' || $secretTokenSql ELSE '' END ||
       |  CASE WHEN doc_id % 9 = 0 THEN ' key ' ||
       |    repeat(substr('$SecretAlphabet', CAST(1 + doc_id % 26 AS INT), 1), 24)
       |    ELSE '' END
       |  AS text
       | FROM $from)""".stripMargin
  }

  private val secretCte: String = secretCteFrom("documents")

  val secretScan: String = {
    import graft.operators.TextOps.{SecretShapeRe, SecretDiversityMin}
    s"""WITH $secretCte,
       |c AS MATERIALIZED (SELECT source, regexp_extract_all(text, '$SecretShapeRe') AS cands FROM sd),
       |s AS MATERIALIZED (SELECT source, len(cands) AS nc,
       |  len(list_filter(cands,
       |    t -> len(list_distinct(string_split(t, ''))) >= $SecretDiversityMin)) AS ns
       | FROM c)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(nc) AS BIGINT) AS n_candidates,
       | CAST(SUM(ns) AS BIGINT) AS n_secrets,
       | CAST(SUM(CASE WHEN ns > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_secret_docs,
       | CAST(CAST(SUM(CASE WHEN ns > 0 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
       |   // COUNT(*) AS BIGINT) AS secret_doc_ppm
       |FROM s GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.secretRewrite: the same anchored full-token
    * shape + diversity predicate over the space-split, secrets to the
    * sentinel, decoys left, space-rejoin byte-for-byte.
    */
  val secretRewrite: String = {
    import graft.operators.TextOps.{SecretShapeRe, SecretDiversityMin}
    val isSecret =
      s"regexp_matches(t, '^$SecretShapeRe$$') AND " +
        s"len(list_distinct(string_split(t, ''))) >= $SecretDiversityMin"
    s"""WITH $secretCte,
       |ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM sd)
       |SELECT doc_id,
       | CAST(len(list_filter(ts, t -> $isSecret)) AS BIGINT) AS n_redacted,
       | array_to_string(list_transform(ts,
       |   t -> CASE WHEN $isSecret THEN '<SECRET>' ELSE t END), ' ') AS clean_text
       |FROM ts""".stripMargin
  }

  /** Mirrors TextOps.perceptronEpoch: the same label rule, 64-bucket
    * 60-bit-md5 features, round-1 full-batch update and round-2
    * misclassified-only update, all-integer.
    */
  val perceptronEpoch: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |lab AS (SELECT doc_id,
      |  CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE -1 END AS y, toks
      | FROM toks),
      |tok AS (SELECT doc_id, y, unnest(toks) AS t FROM lab),
      |cells AS MATERIALIZED (SELECT doc_id, y,
      |  CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT) % 64 AS b,
      |  COUNT(*) AS x
      | FROM tok GROUP BY doc_id, y,
      |  CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT) % 64),
      |w1 AS MATERIALIZED (SELECT b, SUM(y * x) AS w1 FROM cells GROUP BY b),
      |sc AS MATERIALIZED (SELECT c.doc_id, c.y, SUM(c.x * w1.w1) AS s
      | FROM cells c JOIN w1 USING (b) GROUP BY c.doc_id, c.y),
      |upd AS (SELECT c.b, SUM(c.y * c.x) AS delta
      | FROM cells c JOIN (SELECT doc_id FROM sc WHERE y * s <= 0) m USING (doc_id)
      | GROUP BY c.b)
      |SELECT w1.b AS bucket, CAST(w1.w1 AS BIGINT) AS w1,
      | CAST(w1.w1 + COALESCE(upd.delta, 0) AS BIGINT) AS w2
      |FROM w1 LEFT JOIN upd ON w1.b = upd.b""".stripMargin

  /** The URL-injected corpus CTE (mirrors TextOps.urlDocs). */
  private val urlCte: String = {
    import graft.operators.TextOps.urlHostSql
    s"""ud AS (
       | SELECT doc_id, source,
       |  text ||
       |  CASE WHEN doc_id % 2 = 0 THEN ' see http://' ||
       |    ${urlHostSql("(doc_id // 2) % 4")} || '/page' ||
       |    CAST(doc_id AS VARCHAR) ELSE '' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN ' ref https://' ||
       |    ${urlHostSql("(doc_id // 5) % 4")} || '/q' ||
       |    CAST(doc_id % 97 AS VARCHAR) ELSE '' END
       |  AS text
       | FROM documents)""".stripMargin
  }

  /** Mirrors TextOps.urlProfile: per-(source, host) link census over
    * the shared URL regex and host-extraction group.
    */
  val urlProfile: String = {
    import graft.operators.TextOps.{UrlRe, UrlHostRe}
    s"""WITH $urlCte,
       |u AS (SELECT source, unnest(regexp_extract_all(text, '$UrlRe')) AS url FROM ud)
       |SELECT source, regexp_extract(url, '$UrlHostRe', 1) AS host,
       | CAST(COUNT(*) AS BIGINT) AS n_urls
       |FROM u GROUP BY source, regexp_extract(url, '$UrlHostRe', 1)""".stripMargin
  }

  /** Mirrors TextOps.urlBlocklistAudit: same blocklist literals, same
    * any-match semantics via a list lambda.
    */
  val urlBlocklistAudit: String = {
    import graft.operators.TextOps.{UrlRe, UrlHostRe, UrlBlocklist}
    val blocked = UrlBlocklist.map(h => s"'$h'").mkString("(", ", ", ")")
    s"""WITH $urlCte,
       |f AS MATERIALIZED (SELECT source,
       |  regexp_extract_all(text, '$UrlRe') AS urls FROM ud),
       |g AS MATERIALIZED (SELECT source, len(urls) > 0 AS has_url,
       |  len(list_filter(urls,
       |    u -> regexp_extract(u, '$UrlHostRe', 1) IN $blocked)) > 0 AS is_blocked
       | FROM f)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(CASE WHEN has_url THEN 1 ELSE 0 END) AS BIGINT) AS n_url_docs,
       | CAST(SUM(CASE WHEN is_blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked_docs,
       | CAST(CAST(SUM(CASE WHEN is_blocked THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
       |   // COUNT(*) AS BIGINT) AS blocked_ppm
       |FROM g GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.hashgramScore: the same 60-bit md5 weight table
    * ((hash % 2001) − 1000) summed over the token bag per doc, then
    * the per-source keep sheet.
    */
  val hashgramScore: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id, source,
      |  list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |tok AS (SELECT doc_id, source, unnest(toks) AS t FROM toks),
      |ds AS MATERIALIZED (SELECT s.doc_id, s.source, COALESCE(w.score, 0) AS score
      | FROM (SELECT doc_id, source FROM toks) s
      | LEFT JOIN (
      |   SELECT doc_id,
      |    SUM(CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT)
      |        % 2001 - 1000) AS score
      |   FROM tok GROUP BY doc_id) w USING (doc_id))
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      | CAST(SUM(score) AS BIGINT) AS sum_score,
      | CAST(CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
      |   // COUNT(*) AS BIGINT) AS keep_ppm
      |FROM ds GROUP BY source""".stripMargin

  /** Mirrors TextOps.cleanPipeline: the same injection composition
    * (pii → secret → boilerplate, each CTE the per-family gate's own
    * template re-FROM'd), then the same three cleaning stages in the
    * same order: boilerplate line drop at the shared df threshold,
    * PII sentinel chain, token-wise secret redaction.
    */
  /** The full cleaning-chain CTE list ending in `fin` (per-doc stage
    * counts + clean_text) — shared by cleanPipeline,
    * redactDedupGain, and cleanTokenBudget; `bp` inside it is the
    * composite dirty corpus.
    */
  private def cleanChainCtes: String = {
    import graft.operators.TextOps.{EmailRe, PhoneRe, Ipv4Re, SecretShapeRe, SecretDiversityMin, BoilerDf}
    val isSecret =
      s"regexp_matches(t, '^$SecretShapeRe$$') AND " +
        s"len(list_distinct(string_split(t, ''))) >= $SecretDiversityMin"
    s"""${piiCteFrom("documents")},
       |${secretCteFrom("pii")},
       |${boilerCteFrom("sd")},
       |ls AS MATERIALIZED (SELECT doc_id, string_split(text, chr(10)) AS ls FROM bp),
       |lines AS MATERIALIZED (SELECT doc_id, unnest(range(len(ls))) AS pos,
       |  unnest(ls) AS line FROM ls),
       |df AS (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY line),
       |j AS MATERIALIZED (SELECT l.doc_id, l.pos, l.line, df.nd
       |      FROM lines l JOIN df USING (line)),
       |dropped AS (SELECT doc_id,
       |  CAST(SUM(CASE WHEN nd >= $BoilerDf THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_boiler_dropped,
       |  COALESCE(string_agg(CASE WHEN nd < $BoilerDf THEN line END,
       |    chr(10) ORDER BY pos), '') AS text
       | FROM j GROUP BY doc_id),
       |pr AS (SELECT doc_id, n_boiler_dropped,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) +
       |       len(regexp_extract_all(text, '$PhoneRe')) +
       |       len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_pii_redacted,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g') AS text
       | FROM dropped),
       |ts AS (SELECT doc_id, n_boiler_dropped, n_pii_redacted,
       |  string_split(text, ' ') AS ts FROM pr),
       |fin AS (SELECT doc_id, n_boiler_dropped, n_pii_redacted,
       | CAST(len(list_filter(ts, t -> $isSecret)) AS BIGINT) AS n_secrets_redacted,
       | array_to_string(list_transform(ts,
       |   t -> CASE WHEN $isSecret THEN '<SECRET>' ELSE t END), ' ') AS clean_text
       | FROM ts)""".stripMargin
  }

  val cleanPipeline: String =
    s"""WITH $cleanChainCtes
       |SELECT doc_id, n_boiler_dropped, n_pii_redacted, n_secrets_redacted,
       | clean_text
       |FROM fin""".stripMargin

  /** Mirrors TextOps.redactDedupGain: exact-dedup stats on the dirty
    * composite corpus vs the cleaned corpus; DISTINCT on the text
    * itself (Spark counts 60-bit fingerprints — the collision
    * discipline again).
    */
  val redactDedupGain: String =
    s"""WITH $cleanChainCtes
       |SELECT 'dirty' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
       | CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_dup_docs,
       | CAST(CAST(COUNT(*) - COUNT(DISTINCT text) AS HUGEINT) * 1000000
       |   // COUNT(*) AS BIGINT) AS dup_ppm
       |FROM bp
       |UNION ALL
       |SELECT 'cleaned', CAST(COUNT(*) AS BIGINT),
       | CAST(COUNT(DISTINCT clean_text) AS BIGINT),
       | CAST(COUNT(*) - COUNT(DISTINCT clean_text) AS BIGINT),
       | CAST(CAST(COUNT(*) - COUNT(DISTINCT clean_text) AS HUGEINT) * 1000000
       |   // COUNT(*) AS BIGINT)
       |FROM fin""".stripMargin

  /** Mirrors TextOps.cleanTokenBudget: letter-token mass per source
    * before vs after the chain.
    */
  val cleanTokenBudget: String =
    s"""WITH $cleanChainCtes,
       |d AS MATERIALIZED (SELECT doc_id, source,
       |  len(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> ''))
       |    AS nt
       | FROM bp),
       |c AS MATERIALIZED (SELECT doc_id,
       |  len(list_filter(regexp_split_to_array(clean_text, '[^\\p{L}]+'), t -> t <> ''))
       |    AS ct
       | FROM fin)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(d.nt) AS BIGINT) AS dirty_tokens,
       | CAST(SUM(c.ct) AS BIGINT) AS clean_tokens,
       | CAST(CAST(SUM(d.nt) - SUM(c.ct) AS HUGEINT) * 1000000
       |   // SUM(d.nt) AS BIGINT) AS removed_ppm
       |FROM d JOIN c USING (doc_id) GROUP BY d.source""".stripMargin

  /** Mirrors TextOps.hashCollisionAudit: distinct key strings vs
    * distinct 60-bit md5 values at three granularities; the shingle
    * level rebuilds production's space-joined lower-token windows
    * with a per-row range unnest + list slice.
    */
  val hashCollisionAudit: String = {
    val k = graft.operators.DedupOps.SpanTokens
    def h(c: String): String =
      s"CAST(CAST(concat('0x', substr(md5($c), 1, 15)) AS UBIGINT) AS BIGINT)"
    s"""WITH $boilerCte,
       |tok AS (SELECT unnest(list_filter(
       |  regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')) AS x
       | FROM documents),
       |lin AS (SELECT unnest(string_split(text, chr(10))) AS x FROM bp),
       |tl AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |sh AS MATERIALIZED (SELECT array_to_string(
       |   toks[CAST(i + 1 AS INT):CAST(i + $k AS INT)], ' ') AS x
       | FROM (SELECT toks, unnest(range(len(toks) - ${k - 1})) AS i
       |       FROM tl WHERE len(toks) >= $k))
       |SELECT 'token' AS level, CAST(COUNT(DISTINCT x) AS BIGINT) AS n_distinct_keys,
       | CAST(COUNT(DISTINCT ${h("x")}) AS BIGINT) AS n_distinct_hashes,
       | CAST(COUNT(DISTINCT x) - COUNT(DISTINCT ${h("x")}) AS BIGINT) AS n_collisions
       |FROM tok
       |UNION ALL
       |SELECT 'line', CAST(COUNT(DISTINCT x) AS BIGINT),
       | CAST(COUNT(DISTINCT ${h("x")}) AS BIGINT),
       | CAST(COUNT(DISTINCT x) - COUNT(DISTINCT ${h("x")}) AS BIGINT)
       |FROM lin
       |UNION ALL
       |SELECT 'shingle', CAST(COUNT(DISTINCT x) AS BIGINT),
       | CAST(COUNT(DISTINCT ${h("x")}) AS BIGINT),
       | CAST(COUNT(DISTINCT x) - COUNT(DISTINCT ${h("x")}) AS BIGINT)
       |FROM sh""".stripMargin
  }

  /** The classifier-evaluation family's shared doc-score CTEs:
    * tokenize (TextOps.tokens convention, unlowered), label =
    * contains 'spark' (the perceptron convention), score = the
    * hashgram 60-bit md5 weight fold, then the clamped floor-div-256
    * score bins (positive-mod form — both engines' `%` follows the
    * dividend). Ends in `bins(source, sb, p_v, n_v)`.
    */
  private val scoreBinsCte: String =
    """t AS MATERIALIZED (
      | SELECT source,
      |  list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '') AS toks
      | FROM documents),
      |s AS MATERIALIZED (
      | SELECT source,
      |  CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS y,
      |  CAST(COALESCE(list_sum(list_transform(toks,
      |    tk -> CAST(CAST(concat('0x', substr(md5(tk), 1, 15)) AS UBIGINT) AS BIGINT)
      |          % 2001 - 1000)), 0) AS BIGINT) AS sc
      | FROM t),
      |b AS MATERIALIZED (
      | SELECT source, y,
      |  GREATEST(-128, LEAST(128, (sc - ((sc % 256 + 256) % 256)) // 256)) AS sb
      | FROM s),
      |bins AS MATERIALIZED (SELECT source, sb, SUM(y) AS p_v, SUM(1 - y) AS n_v FROM b GROUP BY 1, 2)""".stripMargin

  /** Mirrors TextOps.classifierAuc: Mann–Whitney midrank accumulation
    * over the per-source score bins, u2 = 2·U₊ integer-exact, one
    * IEEE division for the AUC.
    */
  val classifierAuc: String =
    s"""WITH $scoreBinsCte,
       |w AS MATERIALIZED (
       | SELECT *, p_v + n_v AS m_v,
       |  COALESCE(SUM(p_v + n_v) OVER (PARTITION BY source ORDER BY sb
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_before
       | FROM bins),
       |r AS MATERIALIZED (
       | SELECT source, CAST(SUM(p_v) AS BIGINT) AS n_pos, CAST(SUM(n_v) AS BIGINT) AS n_neg,
       |  SUM(p_v * (2 * c_before + m_v + 1)) AS r2
       | FROM w GROUP BY 1)
       |SELECT source, n_pos, n_neg,
       | CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2_pos,
       | CASE WHEN n_pos > 0 AND n_neg > 0
       |  THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
       |       (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       | END AS auc
       |FROM r""".stripMargin

  /** Mirrors TextOps.classifierPrSweep: conditional sums over the one
    * bin frame at five bin-aligned thresholds; floor-div ppm ratios,
    * precision defined 0 at zero predicted positives.
    */
  val classifierPrSweep: String =
    s"""WITH $scoreBinsCte,
       |spine AS (SELECT unnest([-8192, -4096, 0, 4096, 8192]) AS thr),
       |agg AS (
       | SELECT thr,
       |  SUM(CASE WHEN sb >= thr // 256 THEN p_v ELSE 0 END) AS tp,
       |  SUM(CASE WHEN sb >= thr // 256 THEN n_v ELSE 0 END) AS fp,
       |  SUM(p_v) AS pos_tot, SUM(n_v) AS neg_tot
       | FROM bins, spine GROUP BY 1)
       |SELECT CAST(thr AS BIGINT) AS thr, CAST(tp AS BIGINT) AS tp,
       | CAST(fp AS BIGINT) AS fp,
       | CAST(pos_tot - tp AS BIGINT) AS fn, CAST(neg_tot - fp AS BIGINT) AS tn,
       | CASE WHEN tp + fp > 0
       |  THEN CAST(CAST(tp AS HUGEINT) * 1000000 // (tp + fp) AS BIGINT)
       |  ELSE 0 END AS precision_ppm,
       | CAST(CAST(tp AS HUGEINT) * 1000000 // pos_tot AS BIGINT) AS recall_ppm,
       | CASE WHEN 2 * tp + fp + (pos_tot - tp) > 0
       |  THEN CAST(CAST(tp AS HUGEINT) * 2000000 // (2 * tp + fp + (pos_tot - tp)) AS BIGINT)
       |  ELSE 0 END AS f1_ppm
       |FROM agg""".stripMargin

  /** Mirrors TextOps.classifierYieldSweep: (bin → docs, token mass)
    * frame, conditional sums at the five bin-aligned thresholds,
    * floor-div ppm yields.
    */
  val classifierYieldSweep: String =
    """WITH t AS MATERIALIZED (
      | SELECT list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '') AS toks
      | FROM documents),
      |s AS MATERIALIZED (
      | SELECT CAST(len(toks) AS BIGINT) AS nt,
      |  CAST(COALESCE(list_sum(list_transform(toks,
      |    tk -> CAST(CAST(concat('0x', substr(md5(tk), 1, 15)) AS UBIGINT) AS BIGINT)
      |          % 2001 - 1000)), 0) AS BIGINT) AS sc
      | FROM t),
      |b AS MATERIALIZED (
      | SELECT nt,
      |  GREATEST(-128, LEAST(128, (sc - ((sc % 256 + 256) % 256)) // 256)) AS sb
      | FROM s),
      |bins AS MATERIALIZED (SELECT sb, COUNT(*) AS n_docs, SUM(nt) AS n_toks FROM b GROUP BY 1),
      |spine AS (SELECT unnest([-8192, -4096, 0, 4096, 8192]) AS thr),
      |agg AS (
      | SELECT thr,
      |  SUM(CASE WHEN sb >= thr // 256 THEN n_docs ELSE 0 END) AS docs_kept,
      |  SUM(CASE WHEN sb >= thr // 256 THEN n_toks ELSE 0 END) AS toks_kept,
      |  SUM(n_docs) AS docs_tot, SUM(n_toks) AS toks_tot
      | FROM bins, spine GROUP BY 1)
      |SELECT CAST(thr AS BIGINT) AS thr, CAST(docs_kept AS BIGINT) AS docs_kept,
      | CAST(toks_kept AS BIGINT) AS toks_kept,
      | CAST(CAST(docs_kept AS HUGEINT) * 1000000 // GREATEST(docs_tot, 1) AS BIGINT)
      |  AS doc_keep_ppm,
      | CAST(CAST(toks_kept AS HUGEINT) * 1000000 // GREATEST(toks_tot, 1) AS BIGINT)
      |  AS token_keep_ppm
      |FROM agg""".stripMargin

  /** Mirrors TextOps.classifierKappa: hashgram keep vs the quality
    * gate in its exact cross-multiplied integer form, 2×2 cells per
    * source, ppm floor-div agreement, one IEEE division for kappa.
    */
  val classifierKappa: String =
    """WITH t AS MATERIALIZED (
      | SELECT source, text,
      |  list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '') AS toks,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '') AS qtoks
      | FROM documents),
      |r AS MATERIALIZED (
      | SELECT source,
      |  CAST(COALESCE(list_sum(list_transform(toks,
      |    tk -> CAST(CAST(concat('0x', substr(md5(tk), 1, 15)) AS UBIGINT) AS BIGINT)
      |          % 2001 - 1000)), 0) AS BIGINT) > 0 AS ka,
      |  (len(qtoks) >= 5 AND
      |   CAST(length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
      |     * (CAST(len(qtoks) AS BIGINT)
      |        + 2 * CAST(len(list_filter(qtoks, x -> list_contains(
      |            ['the','a','an','and','or','of','to','in','is','it','on','for'], x)))
      |            AS BIGINT)) * 10
      |   >= CAST(length(text) AS BIGINT) * CAST(len(qtoks) AS BIGINT) * 11) AS kb
      | FROM t),
      |cells AS MATERIALIZED (
      | SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |  CAST(SUM(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |  CAST(SUM(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |  CAST(SUM(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS d
      | FROM r GROUP BY 1),
      |pp AS (
      | SELECT source, n, a, b, c, d,
      |  CAST(CAST(a + d AS HUGEINT) * 1000000 // n AS BIGINT) AS po_ppm,
      |  CAST(CAST((a + b) * (a + c) + (c + d) * (b + d) AS HUGEINT) * 1000000
      |       // (n * n) AS BIGINT) AS pe_ppm
      | FROM cells)
      |SELECT source, n, a, b, c, d, po_ppm, pe_ppm,
      | CASE WHEN pe_ppm < 1000000
      |  THEN CAST(po_ppm - pe_ppm AS DOUBLE) / CAST(1000000 - pe_ppm AS DOUBLE)
      | END AS kappa
      |FROM pp""".stripMargin

  /** Mirrors TextOps.classifierCalibration: 8 hard-bounded bands of
    * 32 score bins over the shared bin frame, empirical positive rate
    * as ppm floor-div.
    */
  val classifierCalibration: String =
    s"""WITH $scoreBinsCte,
       |bd AS (
       | SELECT GREATEST(-4, LEAST(3, (sb - ((sb % 32 + 32) % 32)) // 32)) AS band,
       |  p_v, n_v
       | FROM bins)
       |SELECT band, CAST(SUM(p_v + n_v) AS BIGINT) AS n_docs,
       | CAST(SUM(p_v) AS BIGINT) AS n_pos,
       | CAST(CAST(SUM(p_v) AS HUGEINT) * 1000000 // SUM(p_v + n_v) AS BIGINT) AS pos_ppm
       |FROM bd GROUP BY 1""".stripMargin

  /** Mirrors TextOps.temperatureMix: wᵢ = ⌊√massᵢ⌋ (correctly-rounded
    * IEEE sqrt, exact below 2⁵²), budget = Σmass div 2, integer
    * floor-div shares/allocations, upsample vs the proportional
    * allocator.
    */
  val temperatureMix: String =
    """WITH m AS MATERIALIZED (
      | SELECT source,
      |  CAST(SUM(len(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |    x -> x <> ''))) AS BIGINT) AS mass
      | FROM documents GROUP BY 1),
      |w AS MATERIALIZED (SELECT source, mass,
      |       CAST(FLOOR(SQRT(CAST(mass AS DOUBLE))) AS BIGINT) AS w FROM m),
      |t AS MATERIALIZED (SELECT CAST(SUM(mass) AS BIGINT) AS tot_mass,
      |             CAST(SUM(w) AS BIGINT) AS tot_w FROM w),
      |a AS MATERIALIZED (
      | SELECT source, mass, w,
      |  CAST(CAST(w AS HUGEINT) * 1000000 // tot_w AS BIGINT) AS share_ppm,
      |  CAST(CAST(tot_mass // 2 AS HUGEINT) * w // tot_w AS BIGINT) AS alloc,
      |  CAST(CAST(tot_mass // 2 AS HUGEINT) * mass // tot_mass AS BIGINT) AS prop_alloc
      | FROM w, t)
      |SELECT source, mass, w, share_ppm, alloc, prop_alloc,
      | CAST(CAST(alloc AS HUGEINT) * 1000000 // GREATEST(prop_alloc, 1) AS BIGINT)
      |  AS upsample_ppm
      |FROM a""".stripMargin

  /** Mirrors TextOps.fimSplit: the same doc_id-salted 60-bit md5
    * draws for the coin and both cut points, PSM reorder fingerprint,
    * passthrough rows with lo = hi = len.
    */
  val fimSplit: String = {
    def h(salt: String): String =
      s"""CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '$salt'), 1, 15))
         |     AS UBIGINT) AS BIGINT)""".stripMargin
    s"""WITH d AS MATERIALIZED (
       | SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents),
       |hh AS (
       | SELECT doc_id, text, len,
       |  (len >= 32 AND ${h("c")} % 100 < 50) AS fim_applied,
       |  1 + ${h("a")} % GREATEST(len - 1, 1) AS c1,
       |  1 + ${h("b")} % GREATEST(len - 1, 1) AS c2
       | FROM d),
       |s AS MATERIALIZED (
       | SELECT doc_id, fim_applied, len, text,
       |  CASE WHEN fim_applied THEN LEAST(c1, c2) ELSE len END AS lo,
       |  CASE WHEN fim_applied THEN GREATEST(c1, c2) ELSE len END AS hi
       | FROM hh)
       |SELECT doc_id, fim_applied, len, lo AS p_len, hi - lo AS m_len,
       | len - hi AS s_len,
       | CAST(CAST(concat('0x', substr(md5(
       |   '<PRE>' || substr(text, 1, CAST(lo AS INT)) ||
       |   '<SUF>' || substr(text, CAST(hi + 1 AS INT), CAST(len - hi AS INT)) ||
       |   '<MID>' || substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))), 1, 15))
       |  AS UBIGINT) AS BIGINT) AS psm_fp
       |FROM s""".stripMargin
  }

  /** Mirrors DedupOps.shardDedupLocality: the minhash pair list
    * re-derived (Oracles2.minhashLsh verbatim), each side classified
    * under the shuffle_shards md5 layout, intra/cross rollup.
    */
  val shardDedupLocality: String = {
    def shard(c: String): String =
      s"""CAST(CAST(concat('0x', substr(md5(concat(
         |  '${graft.operators.TextOps.ShuffleSeed}', CAST($c AS VARCHAR))), 1, 2))
         |  AS UBIGINT) % ${graft.operators.TextOps.NShards} AS BIGINT)""".stripMargin
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |cls AS (
       | SELECT CASE WHEN ${shard("doc_a")} = ${shard("doc_b")} THEN 1 ELSE 0 END AS intra
       | FROM mh)
       |SELECT CAST(${graft.operators.TextOps.NShards} AS BIGINT) AS n_shards,
       | CAST(COUNT(*) AS BIGINT) AS n_pairs,
       | CAST(SUM(intra) AS BIGINT) AS n_intra,
       | CAST(COUNT(*) - SUM(intra) AS BIGINT) AS n_cross,
       | CAST(CAST(COUNT(*) - SUM(intra) AS HUGEINT) * 1000000
       |      // GREATEST(COUNT(*), 1) AS BIGINT) AS cross_ppm
       |FROM cls""".stripMargin
  }

  /** Mirrors DedupOps.dupModularity: pair list re-derived, endpoints
    * joined to sources, exact integer q_num = 4m·Σe − Σd², one IEEE
    * division for Q.
    */
  val dupModularity: String =
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |ds AS MATERIALIZED (SELECT doc_id, source FROM documents),
       |p AS MATERIALIZED (
       | SELECT a.source AS sa, b.source AS sb
       | FROM mh JOIN ds a ON a.doc_id = mh.doc_a JOIN ds b ON b.doc_id = mh.doc_b),
       |deg AS (
       | SELECT s, CAST(COUNT(*) AS BIGINT) AS d
       | FROM (SELECT sa AS s FROM p UNION ALL SELECT sb FROM p) GROUP BY 1),
       |intra AS (SELECT sa AS s, CAST(COUNT(*) AS BIGINT) AS e FROM p WHERE sa = sb GROUP BY 1),
       |tot AS MATERIALIZED (
       | SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS m,
       |  (SELECT CAST(COALESCE(SUM(e), 0) AS BIGINT) FROM intra) AS se,
       |  (SELECT CAST(COALESCE(SUM(d * d), 0) AS BIGINT) FROM deg) AS sd)
       |SELECT m AS n_pairs, se AS sum_intra, sd AS sum_deg_sq,
       | CAST(4 * m * se - sd AS BIGINT) AS q_num,
       | CASE WHEN m > 0
       |  THEN CAST(4 * m * se - sd AS DOUBLE) / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
       | END AS q
       |FROM tot""".stripMargin

  /** Mirrors TextOps.spanCorruption: same salted draws for span
    * starts/lengths, same merge-and-collapse to `<X>` sentinels, same
    * masked/target fingerprints.
    */
  /** ONE definition of the span-corruption draw CTE chain (t → a → c,
    * ending in (doc_id, toks, corr)) — shared by [[spanCorruption]]
    * and [[ul2Mix]], mirroring TextOps.spanCorrFrame.
    */
  private def spanCorrChain: String = {
    def h(salt: String, j: String): String =
      s"""CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '$salt' ||
         |  CAST($j AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)""".stripMargin
    s"""t AS MATERIALIZED (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '') AS toks
       | FROM documents),
       |a AS MATERIALIZED (
       | SELECT doc_id, toks,
       |  list_transform(range(len(toks)), j -> ${h(":", "j")} % 14 = 0) AS starts,
       |  list_transform(range(len(toks)), j -> 1 + ${h(";", "j")} % 3) AS lens
       | FROM t),
       |c AS MATERIALIZED (
       | SELECT doc_id, toks,
       |  list_transform(range(len(toks)), i ->
       |    starts[CAST(i + 1 AS INT)]
       |    OR (i >= 1 AND starts[CAST(i AS INT)] AND lens[CAST(i AS INT)] >= 2)
       |    OR (i >= 2 AND starts[CAST(i - 1 AS INT)] AND lens[CAST(i - 1 AS INT)] >= 3)) AS corr
       | FROM a)""".stripMargin
  }

  val spanCorruption: String = {
    def fp(c: String): String =
      s"CAST(CAST(concat('0x', substr(md5($c), 1, 15)) AS UBIGINT) AS BIGINT)"
    // COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
    // array_join([]) is '' — the all-kept / all-dropped docs must
    // fingerprint the empty string in both engines
    val masked =
      """COALESCE(array_to_string(list_filter(list_transform(range(len(toks)), i ->
        |  CASE WHEN NOT corr[CAST(i + 1 AS INT)] THEN toks[CAST(i + 1 AS INT)]
        |       WHEN i = 0 OR NOT corr[CAST(i AS INT)] THEN '<X>'
        |       ELSE NULL END), x -> x IS NOT NULL), ' '), '')""".stripMargin
    val target =
      """COALESCE(array_to_string(list_filter(list_transform(range(len(toks)), i ->
        |  CASE WHEN corr[CAST(i + 1 AS INT)]
        |       THEN CASE WHEN i = 0 OR NOT corr[CAST(i AS INT)]
        |                 THEN '<X> ' || toks[CAST(i + 1 AS INT)]
        |                 ELSE toks[CAST(i + 1 AS INT)] END
        |       ELSE NULL END), x -> x IS NOT NULL), ' '), '')""".stripMargin
    s"""WITH $spanCorrChain
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       | CAST(len(list_filter(corr, x -> x)) AS BIGINT) AS n_corrupted,
       | CAST(len(list_filter(list_transform(range(len(toks)), i ->
       |   corr[CAST(i + 1 AS INT)] AND (i = 0 OR NOT corr[CAST(i AS INT)])), x -> x))
       |  AS BIGINT) AS n_spans,
       | ${fp(masked)} AS masked_fp,
       | ${fp(target)} AS target_fp,
       | CAST(CAST(len(list_filter(corr, x -> x)) AS HUGEINT) * 1000000
       |      // GREATEST(len(toks), 1) AS BIGINT) AS corrupt_ppm
       |FROM c""".stripMargin
  }

  /** Mirrors TextOps.ul2Mix: the shared span-draw chain, the same
    * hash-mod-4 denoiser assignment (R/R/S/X), R's loss = the
    * measured corrupted count, S = ⌊n/4⌋, X = ⌊n/2⌋, floor-div ppm.
    */
  val ul2Mix: String = {
    val h =
      """CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'u'), 1, 15))
        |     AS UBIGINT) AS BIGINT)""".stripMargin
    s"""WITH $spanCorrChain,
       |per AS MATERIALIZED (
       | SELECT c.doc_id, d.source,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(corr, x -> x)) AS BIGINT) AS n_corrupted,
       |  CASE WHEN $h % 4 < 2 THEN 'R'
       |       WHEN $h % 4 = 2 THEN 'S' ELSE 'X' END AS denoiser
       | FROM c JOIN documents d USING (doc_id)),
       |l AS (
       | SELECT source, denoiser, n_tokens,
       |  CASE WHEN denoiser = 'R' THEN n_corrupted
       |       WHEN denoiser = 'S' THEN n_tokens // 4
       |       ELSE n_tokens // 2 END AS loss_tokens
       | FROM per)
       |SELECT source, denoiser, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       | CAST(SUM(loss_tokens) AS BIGINT) AS loss_tokens,
       | CAST(CAST(SUM(loss_tokens) AS HUGEINT) * 1000000
       |      // GREATEST(CAST(SUM(n_tokens) AS BIGINT), 1) AS BIGINT) AS loss_ppm
       |FROM l GROUP BY source, denoiser""".stripMargin
  }

  /** Mirrors TextOps.detectorBakeoff with the RELATIONAL formulation
    * of all three detectors (GROUP BYs and gaps-and-islands instead
    * of the Spark side's row-local sort/run folds) — two independent
    * mechanisms, one hash compare.
    */
  val detectorBakeoff: String = {
    def sel(name: String, flag: String): String =
      s"""SELECT '$name' AS detector,
         | CAST(SUM(CASE WHEN planted THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
         | CAST(SUM(CASE WHEN planted THEN 0 ELSE 1 END) AS BIGINT) AS n_clean,
         | CAST(SUM(CASE WHEN planted AND $flag THEN 1 ELSE 0 END) AS BIGINT)
         |   AS detected_planted,
         | CAST(SUM(CASE WHEN NOT planted AND $flag THEN 1 ELSE 0 END) AS BIGINT)
         |   AS flagged_clean,
         | CAST(CAST(SUM(CASE WHEN planted AND $flag THEN 1 ELSE 0 END) AS HUGEINT)
         |      * 1000000 // GREATEST(SUM(CASE WHEN planted THEN 1 ELSE 0 END), 1)
         |      AS BIGINT) AS recall_ppm,
         | CAST(CAST(SUM(CASE WHEN NOT planted AND $flag THEN 1 ELSE 0 END) AS HUGEINT)
         |      * 1000000 // GREATEST(SUM(CASE WHEN planted THEN 0 ELSE 1 END), 1)
         |      AS BIGINT) AS fp_ppm
         |FROM f""".stripMargin
    s"""WITH rep AS MATERIALIZED (
       | SELECT doc_id,
       |  text || CASE WHEN doc_id % 37 = 0 THEN repeat(' spark', 30) ELSE '' END AS text
       | FROM documents),
       |t AS MATERIALIZED (SELECT doc_id, doc_id % 37 = 0 AS planted,
       |       list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'),
       |                   x -> x <> '') AS toks
       |      FROM rep),
       |g AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
       |       i -> toks[CAST(i + 1 AS INT)] || ' ' || toks[CAST(i + 2 AS INT)])) AS g
       |      FROM t),
       |pd AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_grams FROM
       |       (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g)
       |       GROUP BY doc_id),
       |pos AS MATERIALIZED (SELECT doc_id, i, toks[CAST(i + 1 AS INT)] AS tok FROM
       |        (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t)),
       |runs AS (SELECT doc_id, MAX(cnt) AS maxrun FROM (
       |  SELECT doc_id, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, tok, i,
       |     i - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
       |    FROM pos) GROUP BY doc_id, tok, grp) GROUP BY doc_id),
       |dis AS (SELECT doc_id, COUNT(DISTINCT tok) AS nd, COUNT(*) AS nw
       |        FROM pos GROUP BY doc_id),
       |-- dis is LEFT-joined like pd/runs: a doc whose text tokenizes
       |-- to ZERO tokens has no pos rows, and an inner join would drop
       |-- it from n_planted/n_clean while the Spark side keeps it as an
       |-- unflagged row (0*5 < 0 = false on both transports).
       |f AS MATERIALIZED (SELECT t.doc_id, t.planted,
       |       COALESCE(pd.top_c, 0) * 5 > COALESCE(pd.n_grams, 0) AS f_top2gram,
       |       COALESCE(runs.maxrun, 0) > 2 AS f_maxrun,
       |       COALESCE(dis.nd, 0) * 5 < COALESCE(dis.nw, 0) AS f_distinct_ratio
       |      FROM t LEFT JOIN pd USING (doc_id)
       |       LEFT JOIN runs USING (doc_id)
       |       LEFT JOIN dis USING (doc_id))
       |${sel("top2gram", "f_top2gram")}
       |UNION ALL
       |${sel("maxrun", "f_maxrun")}
       |UNION ALL
       |${sel("distinct_ratio", "f_distinct_ratio")}""".stripMargin
  }

  /** Mirrors TextOps.sftRenderMask: the same quarter-boundary 4-turn
    * derivation, the same template markers, list slicing clamped the
    * same way, array_to_string([]) = NULL coalesced to '' (the
    * span_corruption seam), 60-bit render fingerprint.
    */
  val sftRenderMask: String = {
    def joinS(sl: String): String =
      s"COALESCE(array_to_string($sl, ' '), '')"
    s"""WITH t AS MATERIALIZED (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks
       | FROM documents),
       |s AS MATERIALIZED (
       | SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST((len(toks) + 3) // 4 AS INT) AS q, toks
       | FROM t),
       |sl AS (
       | SELECT doc_id, n_tokens,
       |  toks[1 : q] AS u1,
       |  toks[q + 1 : 2 * q] AS a1,
       |  toks[2 * q + 1 : 3 * q] AS u2,
       |  toks[3 * q + 1 : CAST(n_tokens AS INT)] AS a2
       | FROM s)
       |SELECT doc_id, n_tokens,
       | CAST((CASE WHEN len(u1) > 0 THEN 1 ELSE 0 END) +
       |      (CASE WHEN len(a1) > 0 THEN 1 ELSE 0 END) +
       |      (CASE WHEN len(u2) > 0 THEN 1 ELSE 0 END) +
       |      (CASE WHEN len(a2) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_turns,
       | CAST(len(a1) + len(a2) AS BIGINT) AS n_loss_tokens,
       | CAST(CAST(concat('0x', substr(md5(
       |   '<|user|> ' || ${joinS("u1")} ||
       |   ' <|assistant|> ' || ${joinS("a1")} ||
       |   ' <|user|> ' || ${joinS("u2")} ||
       |   ' <|assistant|> ' || ${joinS("a2")}), 1, 15)) AS UBIGINT) AS BIGINT)
       |   AS render_fp,
       | CAST(CAST(len(a1) + len(a2) AS HUGEINT) * 1000000
       |      // GREATEST(n_tokens, 1) AS BIGINT) AS loss_ppm
       |FROM sl""".stripMargin
  }

  /** Mirrors TextOps.crawlRevisitAudit: the same crawl-fetch union
    * (base + changed + identical refetches), 60-bit url/text
    * fingerprints, per-URL (fetches, distinct digests), source rollup.
    */
  val crawlRevisitAudit: String = {
    def h(c: String): String =
      s"CAST(CAST(concat('0x', substr(md5($c), 1, 15)) AS UBIGINT) AS BIGINT)"
    val url =
      "'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' || CAST(doc_id AS VARCHAR)"
    s"""WITH cd AS (
       | SELECT source, $url AS url, text FROM documents
       | UNION ALL
       | SELECT source, $url, text || ' updated' FROM documents WHERE doc_id % 11 = 0
       | UNION ALL
       | SELECT source, $url, text FROM documents WHERE doc_id % 13 = 0),
       |g AS MATERIALIZED (SELECT source, ${h("url")} AS u, COUNT(*) AS f,
       |       COUNT(DISTINCT ${h("text")}) AS d
       |      FROM cd GROUP BY source, u)
       |SELECT source, CAST(SUM(f) AS BIGINT) AS n_fetches,
       | CAST(COUNT(*) AS BIGINT) AS n_urls,
       | CAST(SUM(f - d) AS BIGINT) AS n_identical_revisits,
       | CAST(SUM(d - 1) AS BIGINT) AS n_changed_revisits,
       | CAST(CAST(SUM(f) - COUNT(*) AS HUGEINT) * 1000000 // SUM(f) AS BIGINT)
       |   AS revisit_ppm
       |FROM g GROUP BY source""".stripMargin
  }

  /** Mirrors MultimodalOps.mmAudioVad: the audioEnergy window frame,
    * the self-normalizing activity cut (energy·n > total), island
    * grouping for the longest active run, floor-div ppm.
    */
  val mmAudioVad: String =
    s"""WITH fr AS MATERIALIZED (${Oracles4.audioEnergy}),
       |t AS MATERIALIZED (SELECT media_id, COUNT(*) AS n_windows, SUM(energy) AS total
       |      FROM fr GROUP BY media_id),
       |a AS MATERIALIZED (SELECT fr.media_id, fr.win_idx,
       |       (fr.energy * t.n_windows > t.total) AS act, t.n_windows
       |      FROM fr JOIN t USING (media_id)),
       |agg AS (SELECT media_id, MAX(n_windows) AS n_windows,
       |         SUM(CASE WHEN act THEN 1 ELSE 0 END) AS n_active
       |        FROM a GROUP BY media_id),
       |runs AS (SELECT media_id, COUNT(*) AS rl FROM (
       |  SELECT media_id, win_idx,
       |   win_idx - ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY win_idx) AS grp
       |  FROM a WHERE act) GROUP BY media_id, grp),
       |lr AS MATERIALIZED (SELECT media_id, MAX(rl) AS longest_run FROM runs GROUP BY media_id)
       |SELECT agg.media_id, CAST(n_windows AS BIGINT) AS n_windows,
       | CAST(n_active AS BIGINT) AS n_active,
       | CAST(COALESCE(longest_run, 0) AS BIGINT) AS longest_run,
       | CAST(CAST(n_active AS HUGEINT) * 1000000 // n_windows AS BIGINT) AS active_ppm
       |FROM agg LEFT JOIN lr USING (media_id)""".stripMargin

  /** Mirrors LayoutOps.epochShuffleAudit: the same seeded-hash global
    * order, LEAD adjacency, exact permutation expectation, one IEEE
    * ratio.
    */
  val epochShuffleAudit: String =
    """WITH h AS (SELECT doc_id, source,
      |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'ep'), 1, 15))
      |       AS UBIGINT) AS BIGINT) AS h
      | FROM documents),
      |r AS MATERIALIZED (SELECT source, ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rnk FROM h),
      |adj AS (SELECT COUNT(*) AS n_slots,
      |        SUM(CASE WHEN source = next_source THEN 1 ELSE 0 END) AS observed_same
      | FROM (SELECT source, LEAD(source) OVER (ORDER BY rnk) AS next_source FROM r)
      | WHERE next_source IS NOT NULL),
      |marg AS (SELECT SUM(n_s) AS n_docs, SUM(n_s * (n_s - 1)) AS sum_ns2
      | FROM (SELECT COUNT(*) AS n_s FROM documents GROUP BY source))
      |SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(n_slots AS BIGINT) AS n_slots,
      | CAST(observed_same AS BIGINT) AS observed_same,
      | CAST(sum_ns2 AS BIGINT) AS sum_ns2,
      | CAST(CAST(observed_same AS HUGEINT) * 1000000 // n_slots AS BIGINT) AS observed_ppm,
      | CAST(CAST(sum_ns2 AS HUGEINT) * 1000000
      |      // (CAST(n_docs AS HUGEINT) * n_slots) AS BIGINT) AS expected_ppm,
      | CAST(observed_same AS DOUBLE) * CAST(n_docs AS DOUBLE)
      |   / CAST(sum_ns2 AS DOUBLE) AS clump_ratio
      |FROM adj, marg""".stripMargin

  /** Mirrors TextOps.normalizeDedupGain: the same formatting-variant
    * injection (upper twin on doc_id%5=0, whitespace-mangled twin on
    * doc_id%7=3), then distinct-60-bit-fingerprint counts raw /
    * case-folded / fully normalized.
    */
  val normalizeDedupGain: String = {
    def fp(c: String): String =
      s"CAST(CAST(concat('0x', substr(md5($c), 1, 15)) AS UBIGINT) AS BIGINT)"
    val norm = "trim(regexp_replace(lower(text), '[ \\t\\r\\n]+', ' ', 'g'))"
    s"""WITH nd AS MATERIALIZED (
       | SELECT text FROM documents
       | UNION ALL
       | SELECT upper(text) FROM documents WHERE doc_id % 5 = 0
       | UNION ALL
       | SELECT '  ' || regexp_replace(text, ' ', '  ', 'g') || ' '
       | FROM documents WHERE doc_id % 7 = 3),
       |f AS MATERIALIZED (
       | SELECT ${fp("text")} AS fr, ${fp("lower(text)")} AS fc, ${fp(norm)} AS fz
       | FROM nd)
       |SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(COUNT(DISTINCT fr) AS BIGINT) AS n_distinct,
       | CAST(COUNT(*) - COUNT(DISTINCT fr) AS BIGINT) AS n_dup_docs,
       | CAST(CAST(COUNT(*) - COUNT(DISTINCT fr) AS HUGEINT) * 1000000
       |      // COUNT(*) AS BIGINT) AS dup_ppm
       |FROM f
       |UNION ALL
       |SELECT 'case_folded', CAST(COUNT(*) AS BIGINT),
       | CAST(COUNT(DISTINCT fc) AS BIGINT),
       | CAST(COUNT(*) - COUNT(DISTINCT fc) AS BIGINT),
       | CAST(CAST(COUNT(*) - COUNT(DISTINCT fc) AS HUGEINT) * 1000000
       |      // COUNT(*) AS BIGINT)
       |FROM f
       |UNION ALL
       |SELECT 'normalized', CAST(COUNT(*) AS BIGINT),
       | CAST(COUNT(DISTINCT fz) AS BIGINT),
       | CAST(COUNT(*) - COUNT(DISTINCT fz) AS BIGINT),
       | CAST(CAST(COUNT(*) - COUNT(DISTINCT fz) AS HUGEINT) * 1000000
       |      // COUNT(*) AS BIGINT)
       |FROM f""".stripMargin
  }

  /** ONE definition of the Gopher-rule-injected corpus (mirrors
    * TextOps.gopherDocs): bullet lines, ellipsis lines, '#' words and
    * one-char words re-derived from doc_id, so every rule's failure
    * class is planted in text DuckDB built itself.
    */
  private val gopherCte: String =
    """gd AS (
      | SELECT doc_id, source,
      |  text ||
      |  CASE WHEN doc_id % 17 = 0
      |    THEN repeat(chr(10) || '- item entry', 10) ELSE '' END ||
      |  CASE WHEN doc_id % 19 = 0
      |    THEN chr(10) || 'read more...' || chr(10) || 'loading...' ELSE '' END ||
      |  CASE WHEN doc_id % 23 = 0 THEN repeat(' #', 30) ELSE '' END ||
      |  CASE WHEN doc_id % 31 = 0 THEN repeat(' a', 120) ELSE '' END
      |  AS text
      | FROM documents)""".stripMargin

  /** Mirrors TextOps.gopherRules: the same seven cross-multiplied
    * integer rule comparisons over the shared injected corpus, every
    * SUM BIGINT-cast, HUGEINT-floored pass ppm.
    */
  val gopherRules: String = {
    val fails = Seq("fail_words", "fail_mwl", "fail_symbol", "fail_bullet",
      "fail_ellipsis", "fail_alpha", "fail_stop")
    val failCols = fails
      .map(f => s"CAST(SUM(CASE WHEN $f THEN 1 ELSE 0 END) AS BIGINT) AS $f")
      .mkString(",\n ")
    val passPred = fails.map(f => s"NOT $f").mkString(" AND ")
    s"""WITH $gopherCte,
       |m AS MATERIALIZED (
       | SELECT doc_id, source,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS n_words,
       |  length(regexp_replace(text, '\\s', '', 'g')) AS n_wchars,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'),
       |      w -> regexp_matches(w, '^[a-z]+$$'))) AS n_alpha,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'),
       |      w -> w = '#' OR contains(w, '...'))) AS n_symbol,
       |  len(string_split(text, chr(10))) AS n_lines,
       |  len(list_filter(string_split(text, chr(10)), l -> starts_with(l, '- '))) AS n_bullet,
       |  len(list_filter(string_split(text, chr(10)), l -> ends_with(l, '...'))) AS n_ellipsis,
       |  len(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
       |      t -> t = 'the' OR t = 'a')) AS n_stop
       | FROM gd),
       |r AS MATERIALIZED (
       | SELECT source,
       |  (n_words < 50 OR n_words > 100000) AS fail_words,
       |  (n_wchars < n_words * 3 OR n_wchars > n_words * 10) AS fail_mwl,
       |  (n_symbol * 10 > n_words) AS fail_symbol,
       |  (n_bullet * 10 > n_lines * 9) AS fail_bullet,
       |  (n_ellipsis * 10 > n_lines * 3) AS fail_ellipsis,
       |  (n_alpha * 5 < n_words * 4) AS fail_alpha,
       |  (n_stop < 2) AS fail_stop
       | FROM m)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | $failCols,
       | CAST(SUM(CASE WHEN $passPred THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       | CAST(CAST(SUM(CASE WHEN $passPred THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
       |      // COUNT(*) AS BIGINT) AS pass_ppm
       |FROM r GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.topNgramMass: the repeated-phrase corpus rebuilt
    * from doc_id, 60-bit md5 hashes of the space-joined n-grams at
    * n ∈ {2,3,4} (the `shingle_hashes` kernel identity — top 15 hex
    * chars of md5, the KernelPropertySpec-proven equivalence), per-doc
    * top multiplicity vs total, the same cross-multiplied thresholds,
    * and the doc spine restoring gram-less docs.
    */
  val topNgramMass: String =
    """WITH rep AS MATERIALIZED (
      | SELECT doc_id, source,
      |  text || CASE WHEN doc_id % 37 = 0 THEN repeat(' spark', 30) ELSE '' END AS text
      | FROM documents),
      |t AS MATERIALIZED (SELECT doc_id, source,
      |       list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      |      FROM rep),
      |lv AS MATERIALIZED (SELECT unnest([2, 3, 4]) AS n),
      |g AS MATERIALIZED (SELECT doc_id, n,
      |       unnest(list_transform(range(len(toks) - (n - 1)),
      |         i -> CAST(CAST(concat('0x', substr(md5(
      |                array_to_string(toks[CAST(i + 1 AS INT):CAST(i + n AS INT)], ' ')),
      |                1, 15)) AS UBIGINT) AS BIGINT))) AS g
      |      FROM t CROSS JOIN lv),
      |pc AS MATERIALIZED (SELECT doc_id, n, g, COUNT(*) AS c FROM g GROUP BY doc_id, n, g),
      |pd AS (SELECT doc_id, n, MAX(c) AS top_c, SUM(c) AS n_grams FROM pc GROUP BY doc_id, n),
      |spine AS (SELECT doc_id, source, n FROM rep CROSS JOIN lv),
      |j AS MATERIALIZED (SELECT source, CAST(n AS BIGINT) AS n,
      |       COALESCE(top_c, 0) AS top_c, COALESCE(n_grams, 0) AS n_grams,
      |       CASE WHEN n = 2 THEN 200000 WHEN n = 3 THEN 180000 ELSE 160000 END AS thr
      |      FROM spine LEFT JOIN pd USING (doc_id, n))
      |SELECT source, n, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM(CASE WHEN top_c * 1000000 > thr * n_grams THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_over,
      | CAST(SUM(top_c) AS BIGINT) AS sum_top,
      | CAST(SUM(n_grams) AS BIGINT) AS sum_grams,
      | CAST(CAST(SUM(CASE WHEN top_c * 1000000 > thr * n_grams THEN 1 ELSE 0 END) AS HUGEINT)
      |      * 1000000 // COUNT(*) AS BIGINT) AS over_ppm
      |FROM j GROUP BY source, n""".stripMargin

  /** Mirrors SimilarityOps.protoPrune: the shared k-means assignment
    * CTE, quantized-integer centroids as ordered lists, sequential-fold
    * cosines (list_sum — the ivfNprobeSweep discipline), per-cluster
    * prototypicality rank, and the all-integer pruned/kept id sums.
    */
  val protoPrune: String =
    s"""WITH ${Oracles3.kmeansAssignCte},
       |flat AS (
       | SELECT cluster, CAST(UNNEST(generate_series(0, 63)) AS BIGINT) AS pos,
       |  CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       | FROM embeddings JOIN asg USING (vec_id)),
       |dims AS MATERIALIZED (SELECT cluster, pos, CAST(SUM(q) AS BIGINT) AS sum_q
       |         FROM flat GROUP BY cluster, pos),
       |nv AS (SELECT cluster, COUNT(*) AS n_vecs FROM asg GROUP BY cluster),
       |cent AS (
       | SELECT cluster, n_vecs,
       |  list(CAST(sum_q AS DOUBLE) / 1000000.0 / n_vecs ORDER BY pos) AS cvec
       | FROM dims JOIN nv USING (cluster) GROUP BY cluster, n_vecs),
       |cn AS (SELECT cluster, n_vecs, cvec,
       |        sqrt(list_sum(list_transform(cvec, c -> c * c))) AS cnorm FROM cent),
       |s AS MATERIALIZED (
       | SELECT e.vec_id, a.cluster, cn.n_vecs, cn.n_vecs // 5 AS n_prune,
       |  list_sum(list_transform(list_zip(e.embedding, cn.cvec),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |   / (sqrt(list_sum(list_transform(e.embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * cn.cnorm) AS csim
       | FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id
       |  JOIN cn ON a.cluster = cn.cluster),
       |r AS MATERIALIZED (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
       |                                   ORDER BY csim DESC, vec_id ASC) AS rnk FROM s)
       |SELECT cluster, CAST(MAX(n_vecs) AS BIGINT) AS n_vecs,
       | CAST(MAX(n_prune) AS BIGINT) AS n_pruned,
       | CAST(MAX(n_vecs) - MAX(n_prune) AS BIGINT) AS n_kept,
       | CAST(COALESCE(SUM(CASE WHEN rnk <= n_prune THEN vec_id END), 0) AS BIGINT)
       |   AS pruned_id_sum,
       | CAST(COALESCE(SUM(CASE WHEN rnk > n_prune THEN vec_id END), 0) AS BIGINT)
       |   AS kept_id_sum
       |FROM r GROUP BY cluster""".stripMargin

  /** Mirrors SimilarityOps.silhouetteSheet: same assignment CTE, own
    * vs nearest-other seed distances, (b−a)/max(a,b), per-row 1e-6
    * quantization, exact integer sums, one IEEE division for the mean.
    */
  val silhouetteSheet: String =
    s"""WITH ${Oracles3.kmeansAssignCte},
       |b AS MATERIALIZED (SELECT d.vec_id, MIN(d.dist_sq) AS b2
       |      FROM d JOIN asg USING (vec_id)
       |      WHERE d.seed_id <> asg.cluster GROUP BY d.vec_id),
       |-- greatest(·,0) before sqrt mirrors the Spark clamp: dist_sq
       |-- can round FP-negative for a vector ≈ its seed, and DuckDB's
       |-- sqrt(<0) ABORTS where Spark would silently NaN.
       |s AS MATERIALIZED (SELECT asg.cluster,
       |       CASE WHEN greatest(sqrt(greatest(asg.dist_sq, 0)), sqrt(greatest(b2, 0))) = 0 THEN 0.0
       |            ELSE (sqrt(greatest(b2, 0)) - sqrt(greatest(asg.dist_sq, 0)))
       |                 / greatest(sqrt(greatest(asg.dist_sq, 0)), sqrt(greatest(b2, 0))) END AS sil
       |      FROM asg JOIN b USING (vec_id)),
       |q AS MATERIALIZED (SELECT cluster, CAST(round(sil * 1000000.0) AS BIGINT) AS s_q FROM s)
       |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       | CAST(SUM(s_q) AS BIGINT) AS sum_sil_q,
       | CAST(SUM(CASE WHEN s_q < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       | CAST(SUM(s_q) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_sil
       |FROM q GROUP BY cluster""".stripMargin

  /** Mirrors SimilarityOps.clusterRandIndex: pair counting over the
    * (cluster × label) contingency table, all-integer RI numerator,
    * ARI as the one IEEE division of exact integers.
    */
  val clusterRandIndex: String =
    s"""WITH ${Oracles3.kmeansAssignCte},
       |ct AS MATERIALIZED (SELECT a.cluster, CAST(e.label AS BIGINT) AS label, COUNT(*) AS n_ij
       |       FROM asg a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
       |cells AS MATERIALIZED (SELECT SUM(n_ij * (n_ij - 1) // 2) AS idx_pairs, SUM(n_ij) AS n,
       |           COUNT(DISTINCT cluster) AS n_clusters,
       |           COUNT(DISTINCT label) AS n_labels FROM ct),
       |ma AS (SELECT SUM(a_i * (a_i - 1) // 2) AS sum_a
       |       FROM (SELECT SUM(n_ij) AS a_i FROM ct GROUP BY cluster)),
       |mb AS (SELECT SUM(b_j * (b_j - 1) // 2) AS sum_b
       |       FROM (SELECT SUM(n_ij) AS b_j FROM ct GROUP BY label))
       |SELECT CAST(n AS BIGINT) AS n, CAST(n_clusters AS BIGINT) AS n_clusters,
       | CAST(n_labels AS BIGINT) AS n_labels, CAST(idx_pairs AS BIGINT) AS idx_pairs,
       | CAST(sum_a AS BIGINT) AS sum_a, CAST(sum_b AS BIGINT) AS sum_b,
       | CAST(n * (n - 1) // 2 AS BIGINT) AS total_pairs,
       | CAST(CAST(n * (n - 1) // 2 + 2 * idx_pairs - sum_a - sum_b AS HUGEINT)
       |      * 1000000 // (n * (n - 1) // 2) AS BIGINT) AS ri_ppm,
       | CASE WHEN (n * (n - 1) // 2) * (sum_a + sum_b) = 2 * sum_a * sum_b THEN 0.0
       |      ELSE 2.0 * CAST(idx_pairs * (n * (n - 1) // 2) - sum_a * sum_b AS DOUBLE)
       |           / CAST((n * (n - 1) // 2) * (sum_a + sum_b)
       |                  - 2 * sum_a * sum_b AS DOUBLE) END AS ari
       |FROM cells, ma, mb""".stripMargin

  /** Mirrors TextOps.bpeVocabSweep: the shared unrolled fit chain
    * (Oracles6.bpeChain) already materializes every merge round, so
    * the k-merge encodings are read straight from r2/r4/r6 — the
    * nesting property the Spark side exploits by replaying merge
    * prefixes.
    */
  val bpeVocabSweep: String = {
    val sel = graft.operators.TextOps.BpeSweepKs
      .map { k =>
        s"""SELECT CAST($k AS BIGINT) AS n_merges,
           | (SELECT CAST(COUNT(DISTINCT s) AS BIGINT)
           |  FROM (SELECT unnest(string_split(trim(seq), ' ')) AS s FROM r$k))
           |   AS n_vocab_symbols,
           | CAST(SUM(cnt * length(word)) AS BIGINT) AS n_letters,
           | CAST(SUM(cnt * n_syms) AS BIGINT) AS n_bpe_tokens,
           | CAST((CAST(SUM(cnt * n_syms) AS BIGINT) * 1000000)
           |      // CAST(SUM(cnt * length(word)) AS BIGINT) AS BIGINT) AS compression_ppm
           |FROM occ JOIN (SELECT word, CAST(len(string_split(trim(seq), ' ')) AS BIGINT)
           |               AS n_syms FROM r$k) e USING (word)""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH ${Oracles6.bpeChain},
       |occ AS MATERIALIZED (
       | SELECT word, COUNT(*) AS cnt FROM (
       |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')) AS word
       |  FROM documents)
       | GROUP BY 1)
       |$sel""".stripMargin
  }
}
