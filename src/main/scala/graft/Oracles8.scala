package graft

/** DuckDB oracle twins for the round-8 additions (hybrid retrieval
  * fusion, unigram-LM tokenizer, preference-pair prep, DCT pHash).
  * Same conventions as Oracles2-7: derived ints CAST AS BIGINT, ppm as
  * HUGEINT floor-div, doubles built by the exact expression tree the
  * Spark side plans so they are bit-identical.
  */
object Oracles8 {

  /** Sequential-fold dot product / norm — same fold order as the Spark
    * vector expressions (the Oracles2 construction).
    */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private val normSql: String =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Shared CTE chain for the hybrid family: the per-query BM25
    * lexical arm (query doc's own distinct tokens as terms, same
    * formulation and literals as Oracles5.bm25TopK, per-term score
    * quantized to 1e-6 before the integer per-doc SUM) and the
    * brute-force cosine semantic arm (Oracles2.annTopkBruteforce
    * shape), fused by integer reciprocal-rank arithmetic.
    */
  private val hybridCtes: String =
    s"""t AS MATERIALIZED (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks
       | FROM documents),
       |dlt AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
       |g AS MATERIALIZED (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dlt),
       |p AS MATERIALIZED (
       | SELECT doc_id, dl, term, COUNT(*) AS tf
       | FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dlt)
       | GROUP BY doc_id, dl, term),
       |qt AS MATERIALIZED (
       | SELECT DISTINCT doc_id AS query_id, term
       | FROM (SELECT doc_id, unnest(toks) AS term FROM dlt WHERE doc_id < 5)),
       |f AS MATERIALIZED (SELECT term, COUNT(*) AS df FROM p
       |      WHERE term IN (SELECT term FROM qt) GROUP BY term
       |      HAVING COUNT(*) <= 1000000),
       |sc AS MATERIALIZED (
       | SELECT qt.query_id, p.doc_id,
       |  SUM(CAST(round(
       |   ((((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |     * (CAST(tf AS DOUBLE) * 2.2))
       |    / (CAST(tf AS DOUBLE) +
       |       1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) /
       |                     (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
       |   * 1000000.0) AS BIGINT)) AS lex_sq
       | FROM qt JOIN p USING (term) JOIN f USING (term), g
       | WHERE p.doc_id <> qt.query_id
       | GROUP BY qt.query_id, p.doc_id),
       |lr AS MATERIALIZED (
       | SELECT query_id, doc_id, lex_sq, CAST(rn AS BIGINT) AS lex_rank FROM (
       |  SELECT query_id, doc_id, lex_sq,
       |   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY lex_sq DESC, doc_id ASC) AS rn
       |  FROM sc)
       | WHERE rn <= 10),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe, $normSql AS nq
       |       FROM embeddings WHERE vec_id < 5),
       |nv AS (SELECT vec_id AS neighbor_id, embedding AS ne, $normSql AS nn FROM embeddings),
       |pv AS (SELECT query_id, neighbor_id, ${dotSql("qe", "ne")} / (nq * nn) AS score
       |       FROM qv, nv WHERE query_id <> neighbor_id),
       |sem AS MATERIALIZED (
       | SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS sem_rank FROM (
       |  SELECT query_id, neighbor_id,
       |   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
       |  FROM pv)
       | WHERE rn <= 5),
       |fr AS MATERIALIZED (
       | SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |  COALESCE(l.doc_id, s.neighbor_id) AS doc_id,
       |  COALESCE(l.lex_rank, 0) AS lex_rank,
       |  COALESCE(s.sem_rank, 0) AS sem_rank,
       |  COALESCE(1000000 // (60 + l.lex_rank), 0)
       |   + COALESCE(1000000 // (60 + s.sem_rank), 0) AS rrf_q
       | FROM lr l FULL OUTER JOIN sem s
       |  ON l.query_id = s.query_id AND l.doc_id = s.neighbor_id),
       |fz AS (
       | SELECT query_id, doc_id, lex_rank, sem_rank, CAST(rrf_q AS BIGINT) AS rrf_q,
       |  CAST(rn AS BIGINT) AS rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_q DESC, doc_id ASC) AS rn
       |  FROM fr)
       | WHERE rn <= 5)""".stripMargin

  /** Mirrors SimilarityOps.hybridRrfTopK. */
  val hybridRrfTopK: String =
    s"""WITH $hybridCtes
       |SELECT query_id, doc_id, lex_rank, sem_rank, rrf_q, rnk FROM fz""".stripMargin

  /** Mirrors SimilarityOps.hybridRecall: recall@5 of the fused list
    * and of the lexical arm alone vs the brute-force cosine truth.
    */
  val hybridRecall: String =
    s"""WITH $hybridCtes,
       |tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM sem),
       |la AS MATERIALIZED (SELECT query_id, doc_id AS neighbor_id FROM lr WHERE lex_rank <= 5),
       |hy AS MATERIALIZED (SELECT query_id, doc_id AS neighbor_id FROM fz)
       |SELECT 'lexical_arm' AS method,
       | CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_truth,
       | CAST((SELECT COUNT(*) FROM la) AS BIGINT) AS n_approx,
       | CAST((SELECT COUNT(*) FROM tr JOIN la USING (query_id, neighbor_id)) AS BIGINT) AS n_hits,
       | CAST(CAST((SELECT COUNT(*) FROM tr JOIN la USING (query_id, neighbor_id)) AS HUGEINT)
       |      * 1000000 // (SELECT COUNT(*) FROM tr) AS BIGINT) AS recall_ppm
       |UNION ALL
       |SELECT 'hybrid_rrf' AS method,
       | CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_truth,
       | CAST((SELECT COUNT(*) FROM hy) AS BIGINT) AS n_approx,
       | CAST((SELECT COUNT(*) FROM tr JOIN hy USING (query_id, neighbor_id)) AS BIGINT) AS n_hits,
       | CAST(CAST((SELECT COUNT(*) FROM tr JOIN hy USING (query_id, neighbor_id)) AS HUGEINT)
       |      * 1000000 // (SELECT COUNT(*) FROM tr) AS BIGINT) AS recall_ppm""".stripMargin

  /** Mirrors SimilarityOps.retrievalMrr: all four approximate
    * retrievers' first-relevant-hit reciprocal ranks vs the brute
    * truth (the hybrid CTEs supply lexical/fused/truth; the IVF/LSH
    * twins are wrapped as subqueries).
    */
  val retrievalMrr: String = {
    def hm(tag: String, src: String): String =
      s"""h_$tag AS MATERIALIZED (SELECT query_id, 1000000 // MIN(rnk) AS rr
         | FROM $src JOIN tr USING (query_id, neighbor_id) GROUP BY query_id)""".stripMargin
    def rowm(name: String, tag: String): String =
      s"""SELECT '$name' AS method, CAST(n AS BIGINT) AS n_queries,
         | CAST((SELECT COUNT(*) FROM h_$tag) AS BIGINT) AS n_hit_queries,
         | CAST((SELECT COALESCE(SUM(rr), 0) FROM h_$tag) AS BIGINT) AS sum_rr_ppm,
         | CAST(CAST((SELECT COALESCE(SUM(rr), 0) FROM h_$tag) AS HUGEINT) // n AS BIGINT)
         |   AS mrr_ppm
         |FROM nq""".stripMargin
    s"""WITH $hybridCtes,
       |mivf AS MATERIALIZED (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
       |         FROM (${Oracles2.annTopkIvf})),
       |mlsh AS MATERIALIZED (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
       |         FROM (${Oracles2.annTopkLsh})),
       |mlex AS MATERIALIZED (SELECT query_id, doc_id AS neighbor_id, lex_rank AS rnk FROM lr),
       |mhyb AS MATERIALIZED (SELECT query_id, doc_id AS neighbor_id, rnk FROM fz),
       |tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM sem),
       |nq AS MATERIALIZED (SELECT COUNT(DISTINCT query_id) AS n FROM tr),
       |${hm("ivf", "mivf")},
       |${hm("lsh", "mlsh")},
       |${hm("lex", "mlex")},
       |${hm("hyb", "mhyb")}
       |${rowm("ivf", "ivf")}
       |UNION ALL
       |${rowm("lsh", "lsh")}
       |UNION ALL
       |${rowm("lexical_arm", "lex")}
       |UNION ALL
       |${rowm("hybrid_rrf", "hyb")}""".stripMargin
  }

  /** Mirrors SimilarityOps.retrievalNdcg: the same four retrievers,
    * binary relevance vs the brute truth, log₂ discount as the
    * integer c64 chain — gain(r) = 64·10⁹ // c64(r+1), micro-averaged
    * ndcg_ppm = Σdcg·10⁶ // Σidcg.
    */
  val retrievalNdcg: String = {
    def gm(tag: String, src: String): String =
      s"""g_$tag AS (
         | SELECT COALESCE(SUM(64000000000 // c.c64), 0) AS sum_dcg
         | FROM $src m JOIN tr USING (query_id, neighbor_id)
         | JOIN c64v_nd c ON c.v = m.rnk + 1)""".stripMargin
    def rowm(name: String, tag: String): String =
      s"""SELECT '$name' AS method, CAST(sum_dcg AS BIGINT) AS sum_dcg,
         | CAST(sum_idcg AS BIGINT) AS sum_idcg,
         | CAST(CAST(sum_dcg AS HUGEINT) * 1000000 // sum_idcg AS BIGINT) AS ndcg_ppm
         |FROM g_$tag, gi""".stripMargin
    s"""WITH $hybridCtes,
       |mivf AS MATERIALIZED (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
       |         FROM (${Oracles2.annTopkIvf})),
       |mlsh AS MATERIALIZED (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
       |         FROM (${Oracles2.annTopkLsh})),
       |mlex AS MATERIALIZED (SELECT query_id, doc_id AS neighbor_id, lex_rank AS rnk FROM lr),
       |mhyb AS MATERIALIZED (SELECT query_id, doc_id AS neighbor_id, rnk FROM fz),
       |tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM sem),
       |ipos AS MATERIALIZED (SELECT unnest(range(1, cnt + 1)) AS i FROM
       |         (SELECT query_id, COUNT(*) AS cnt FROM tr GROUP BY query_id)),
       |ndvals AS (
       | SELECT DISTINCT v FROM (
       |  SELECT rnk + 1 AS v FROM mivf UNION ALL SELECT rnk + 1 FROM mlsh
       |  UNION ALL SELECT rnk + 1 FROM mlex UNION ALL SELECT rnk + 1 FROM mhyb
       |  UNION ALL SELECT i + 1 FROM ipos)),
       |${c64ValChain("ndvals", "nd")},
       |gi AS MATERIALIZED (SELECT SUM(64000000000 // c.c64) AS sum_idcg
       |       FROM ipos JOIN c64v_nd c ON c.v = ipos.i + 1),
       |${gm("ivf", "mivf")},
       |${gm("lsh", "mlsh")},
       |${gm("lex", "mlex")},
       |${gm("hyb", "mhyb")}
       |${rowm("ivf", "ivf")}
       |UNION ALL
       |${rowm("lsh", "lsh")}
       |UNION ALL
       |${rowm("lexical_arm", "lex")}
       |UNION ALL
       |${rowm("hybrid_rrf", "hyb")}""".stripMargin
  }

  /** Mirrors TextOps.btSourceRatings: the same bucketed adjacent-rank
    * duels (winner = higher hashgram score via a rank window rather
    * than Spark's max_by — two mechanisms, one winner), then
    * [[graft.operators.TextOps.BtRounds]] Zermelo MM rounds unrolled
    * as HUGEINT CTEs with per-term floor division and the n·10⁶
    * renormalization, exactly the driver loop's arithmetic.
    */
  val btSourceRatings: String = {
    val rounds = (1 to graft.operators.TextOps.BtRounds).map { k =>
      s"""d$k AS (
         | SELECT p.a AS source,
         |  SUM(CAST(p.nij AS HUGEINT) * 1000000000000 // (i.r + j.r)) AS d,
         |  SUM(CAST(p.wab AS HUGEINT)) AS wi
         | FROM pairsn p JOIN bt${k - 1} i ON i.source = p.a
         |  JOIN bt${k - 1} j ON j.source = p.b
         | GROUP BY 1),
         |r0$k AS MATERIALIZED (
         | SELECT b.source,
         |  CASE WHEN d.d IS NULL OR d.d = 0 THEN b.r
         |       ELSE greatest(d.wi * 1000000000000 // d.d, 1) END AS r0
         | FROM bt${k - 1} b LEFT JOIN d$k d USING (source)),
         |t$k AS (SELECT SUM(r0) AS t, COUNT(*) AS n FROM r0$k),
         |bt$k AS MATERIALIZED (SELECT source, greatest(r0 * (n * 1000000) // t, 1) AS r
         |         FROM r0$k, t$k)""".stripMargin
    }
    val last = s"bt${graft.operators.TextOps.BtRounds}"
    s"""WITH btt AS MATERIALIZED (
       | SELECT doc_id, source,
       |  list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |btds AS MATERIALIZED (SELECT s.doc_id, s.source, COALESCE(w.score, 0) AS score
       | FROM (SELECT doc_id, source FROM btt) s
       | LEFT JOIN (
       |   SELECT doc_id,
       |    SUM(CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT)
       |        % 2001 - 1000) AS score
       |   FROM (SELECT doc_id, unnest(toks) AS t FROM btt) GROUP BY doc_id) w USING (doc_id)),
       |btk AS MATERIALIZED (SELECT doc_id, source, score,
       |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
       |   AS BIGINT) AS fp
       | FROM btds),
       |btbk AS (SELECT GREATEST(${graft.operators.TextOps.BtMinBuckets},
       |  (COUNT(*) + ${graft.operators.TextOps.BtBucketDocs - 1})
       |   // ${graft.operators.TextOps.BtBucketDocs}) AS nb FROM documents),
       |btn AS MATERIALIZED (SELECT btk.*, fp % nb AS bkt FROM btk, btbk),
       |btw AS MATERIALIZED (SELECT *,
       |  (ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY fp, doc_id) - 1) // 2 AS duel
       | FROM btn),
       |btp AS MATERIALIZED (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY bkt, duel ORDER BY score DESC, doc_id ASC) AS rw,
       |  COUNT(*) OVER (PARTITION BY bkt, duel) AS nn
       | FROM btw),
       |xw AS MATERIALIZED (SELECT w.source AS ws, l.source AS ls, COUNT(*) AS w
       | FROM btp w JOIN btp l ON w.bkt = l.bkt AND w.duel = l.duel
       |  AND w.rw = 1 AND l.rw = 2
       | WHERE w.nn = 2 AND w.source <> l.source
       | GROUP BY 1, 2),
       |srcs AS MATERIALIZED (SELECT DISTINCT source FROM documents),
       |pairsn AS MATERIALIZED (SELECT a.source AS a, b.source AS b,
       |  COALESCE(w1.w, 0) + COALESCE(w2.w, 0) AS nij, COALESCE(w1.w, 0) AS wab
       | FROM srcs a JOIN srcs b ON a.source <> b.source
       | LEFT JOIN xw w1 ON w1.ws = a.source AND w1.ls = b.source
       | LEFT JOIN xw w2 ON w2.ws = b.source AND w2.ls = a.source),
       |bt0 AS MATERIALIZED (SELECT source, CAST(1000000 AS HUGEINT) AS r FROM srcs),
       |${rounds.mkString(",\n")},
       |g AS MATERIALIZED (SELECT a AS source, CAST(SUM(nij) AS BIGINT) AS n_games,
       |      CAST(SUM(wab) AS BIGINT) AS n_wins FROM pairsn GROUP BY 1)
       |SELECT s.source, COALESCE(g.n_games, 0) AS n_games,
       | COALESCE(g.n_wins, 0) AS n_wins, CAST(b.r AS BIGINT) AS rating_q
       |FROM srcs s LEFT JOIN g USING (source) JOIN $last b ON b.source = s.source""".stripMargin
  }

  // ── DCT pHash twins ─────────────────────────────────────────────

  /** The fixed-point DCT basis as a flat row-major literal — generated
    * from graft.functions.PhashKernel.Cos, so the oracle never
    * evaluates a cosine itself.
    */
  private val cosList: String =
    graft.functions.PhashKernel.Cos.flatten.mkString("CAST([", ", ", "] AS BIGINT[])")

  /** Mirrors MultimodalOps.phashDocs + phashOf: the %23 gradient
    * twins, the 64-window byte grid, floor-normalized pixels, the
    * integer DCT, and the 63-AC cross-multiplied mean compare.
    */
  private def phashCtes: String = {
    val ramp = graft.sources.MultimodalOps.PhashRampMax
    s"""pcorp AS (
       | SELECT doc_id AS media_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 6000000000 AS media_id,
       |  CASE WHEN length(text) = 0 THEN text ELSE
       |   array_to_string(list_transform(range(length(text)), i ->
       |    chr(CAST(ascii(substr(text, CAST(i + 1 AS INT), 1)) +
       |        (i * $ramp) // GREATEST(length(text), 1) AS INT))), '')
       |  END AS text
       | FROM documents WHERE doc_id % 23 = 0),
       |pct AS (SELECT $cosList AS ct),
       |pm AS (SELECT media_id, text, length(text) // 64 AS w
       |       FROM pcorp WHERE length(text) >= 64),
       |ppx AS MATERIALIZED (SELECT media_id, w, list_transform(range(64), k ->
       |         list_sum(list_transform(range(w), j ->
       |           ascii(substr(text, CAST(k*w + j + 1 AS INT), 1))))) AS pixels
       |        FROM pm),
       |pq AS (SELECT media_id, list_transform(pixels, p -> p // w) AS q FROM ppx),
       |pd AS (SELECT media_id, list_transform(range(64), uv ->
       |        list_sum(list_transform(range(64), p ->
       |          q[CAST(p + 1 AS INT)]
       |           * ct[CAST((uv // 8) * 8 + (p // 8) + 1 AS INT)]
       |           * ct[CAST((uv % 8) * 8 + (p % 8) + 1 AS INT)]))) AS d
       |       FROM pq, pct),
       |ph AS MATERIALIZED (SELECT media_id, array_to_string(list_transform(range(64), i ->
       |        CASE WHEN 63 * d[CAST(i + 1 AS INT)] > sac THEN '1' ELSE '0' END), '') AS phash
       |       FROM (SELECT media_id, d, list_sum(d[2:64]) AS sac FROM pd))""".stripMargin
  }

  /** Mirrors MultimodalOps.phashPairs (the aHashPairs banding shape on
    * the pHash fingerprints over the twin corpus).
    */
  val mmPhashPairs: String = {
    val hmax = graft.sources.MultimodalOps.AHashHammingMax
    s"""WITH $phashCtes,
       |bands AS MATERIALIZED (
       | SELECT media_id, phash, b.band_idx,
       |  substr(phash, CAST(b.band_idx*16 + 1 AS INT), 16) AS bits
       | FROM ph, (SELECT unnest(range(4)) AS band_idx) b),
       |cand AS MATERIALIZED (
       | SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |  a.phash AS ph_a, b.phash AS ph_b
       | FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.bits = b.bits AND a.media_id < b.media_id)
       |SELECT media_a, media_b, hamming FROM (
       | SELECT media_a, media_b,
       |  CAST(list_sum(list_transform(range(64), i ->
       |    CASE WHEN substr(ph_a, CAST(i + 1 AS INT), 1) <> substr(ph_b, CAST(i + 1 AS INT), 1)
       |         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
       | FROM cand)
       |WHERE hamming <= $hmax""".stripMargin
  }

  /** Mirrors MultimodalOps.phashVsAhash: both fingerprint families
    * over the SAME twin corpus, per-family catch stats on the planted
    * (base, twin) pairs.
    */
  val mmPhashVsAhash: String = {
    val hmax = graft.sources.MultimodalOps.AHashHammingMax
    def famRow(name: String, src: String): String =
      s"""SELECT '$name' AS family,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(SUM(CASE WHEN hamming <= $hmax THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
         | CAST(SUM(hamming) AS BIGINT) AS sum_hamming,
         | CAST(CAST(SUM(CASE WHEN hamming <= $hmax THEN 1 ELSE 0 END) AS HUGEINT)
         |      * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT) AS catch_ppm
         |FROM $src""".stripMargin
    def hamCte(pairSrc: String): String =
      s"""SELECT CAST(list_sum(list_transform(range(64), i ->
         |  CASE WHEN substr(fa, CAST(i + 1 AS INT), 1) <> substr(fb, CAST(i + 1 AS INT), 1)
         |       THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
         |FROM $pairSrc""".stripMargin
    s"""WITH $phashCtes,
       |aah AS MATERIALIZED (SELECT media_id, array_to_string(list_transform(pixels,
       |         p -> CASE WHEN 64*p > list_sum(pixels) THEN '1' ELSE '0' END), '') AS ahash
       |        FROM ppx),
       |pp AS (SELECT b.phash AS fa, t.phash AS fb
       |       FROM ph b JOIN ph t ON t.media_id = b.media_id + 6000000000),
       |pa AS (SELECT b.ahash AS fa, t.ahash AS fb
       |       FROM aah b JOIN aah t ON t.media_id = b.media_id + 6000000000),
       |hp AS (${hamCte("pp")}),
       |ha AS (${hamCte("pa")})
       |${famRow("ahash", "ha")}
       |UNION ALL
       |${famRow("phash", "hp")}""".stripMargin
  }

  // ── Preference-pair (DPO) twins ─────────────────────────────────

  private def fp60(s: String): String =
    s"CAST(CAST(concat('0x', substr(md5($s), 1, 15)) AS UBIGINT) AS BIGINT)"

  private def joinS(sl: String): String =
    s"COALESCE(array_to_string($sl, ' '), '')"

  /** Mirrors TextOps.dpoCorpus + dpoPairProjection: the %17 planted
    * shared-prompt clones, half-split pair assembly, dual-branch SFT
    * renders, and the degenerate flag.
    */
  private val dpoCtes: String =
    s"""dcorp AS (
       | SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 5000000000 AS doc_id,
       |  array_to_string(list_concat(toks[1:p],
       |    list_transform(toks[p+1:CAST(n AS INT)], t -> t || 'x')), ' ') AS text
       | FROM (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
       |   CAST((len(toks) + 1) // 2 AS INT) AS p
       |  FROM (SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks
       |        FROM documents WHERE doc_id % 17 = 0))),
       |dtk AS (SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks
       |        FROM dcorp),
       |dpr AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, p,
       |         toks[1:p] AS prompt,
       |         toks[p+1:CAST(len(toks) AS INT)] AS resp
       |        FROM (SELECT doc_id, toks, CAST((len(toks) + 1) // 2 AS INT) AS p FROM dtk)),
       |dpairs AS MATERIALIZED (SELECT doc_id, n_tokens,
       | CAST(p AS BIGINT) AS n_prompt_tokens,
       | CAST(len(resp) AS BIGINT) AS n_response_tokens,
       | ${fp60(joinS("prompt"))} AS prompt_fp,
       | ${fp60(s"'<|user|> ' || ${joinS("prompt")} || ' <|assistant|> ' || ${joinS("resp")}")}
       |   AS chosen_fp,
       | ${fp60(s"'<|user|> ' || ${joinS("prompt")} || ' <|assistant|> ' || ${joinS("list_reverse(resp)")}")}
       |   AS rejected_fp,
       | CAST(CASE WHEN ${joinS("resp")} = ${joinS("list_reverse(resp)")} THEN 1 ELSE 0 END AS BIGINT)
       |   AS is_degenerate
       |FROM dpr)""".stripMargin

  val dpoPairs: String =
    s"""WITH $dpoCtes
       |SELECT doc_id, n_tokens, n_prompt_tokens, n_response_tokens,
       | prompt_fp, chosen_fp, rejected_fp, is_degenerate
       |FROM dpairs""".stripMargin

  /** Mirrors TextOps.dpoLeakage: exact shared-prompt pairs across the
    * md5 80/10/10 split assignment.
    */
  val dpoLeakage: String = {
    def splitCase(idCol: String): String =
      s"""CASE WHEN CAST(CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 80 THEN 'train'
         |     WHEN CAST(CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 90 THEN 'val' ELSE 'test' END""".stripMargin
    s"""WITH $dpoCtes,
       |pp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |       FROM dpairs a JOIN dpairs b
       |        ON a.prompt_fp = b.prompt_fp AND a.doc_id < b.doc_id)
       |SELECT ${splitCase("doc_a")} AS split_a, ${splitCase("doc_b")} AS split_b,
       | COUNT(*) AS n_pairs
       |FROM pp GROUP BY 1, 2""".stripMargin
  }

  // ── Unigram-LM tokenizer twins ──────────────────────────────────

  private val UInf = "4611686018427387904" // 2^62 — never a real cost

  /** Pure-integer ⌊log₂ v⌋ via an unrolled binary search (no float
    * log2 — floor(log2(2^k − 1)) rounds UP in IEEE near powers of
    * two).
    */
  private def bitlenSql: String = {
    var e = "(CASE WHEN v >= (CAST(1 AS BIGINT) << 32) THEN 32 ELSE 0 END)"
    var acc = s"(v >> $e)"
    for (s <- Seq(16, 8, 4, 2, 1)) {
      val t = s"(CASE WHEN $acc >= (CAST(1 AS BIGINT) << $s) THEN $s ELSE 0 END)"
      e = s"($e + $t)"
      acc = s"($acc >> $t)"
    }
    e
  }

  /** TextOps.c64 as an unrolled CTE chain over `src`(piece, v):
    * normalize to [2³⁰, 2³¹), then 6 square-and-shift steps — exact
    * BIGINT, bit-identical to the driver-side Scala fold.
    */
  private def c64Chain(src: String, tag: String): String = {
    val steps = (1 to 6)
      .map { i =>
        s"""s${i}_$tag AS (SELECT piece, b,
           | f*2 + CASE WHEN y*y >= (CAST(1 AS BIGINT) << 61) THEN 1 ELSE 0 END AS f,
           | CASE WHEN y*y >= (CAST(1 AS BIGINT) << 61) THEN (y*y) >> 31 ELSE (y*y) >> 30 END AS y
           |FROM s${i - 1}_$tag)""".stripMargin
      }
      .mkString(",\n")
    s"""n_$tag AS (SELECT piece, v, $bitlenSql AS b FROM $src),
       |s0_$tag AS (SELECT piece, b, CAST(0 AS BIGINT) AS f,
       |  CASE WHEN b <= 30 THEN v << (30 - b) ELSE v >> (b - 30) END AS y FROM n_$tag),
       |$steps,
       |c64_$tag AS MATERIALIZED (SELECT piece, 64*b + f AS c64 FROM s6_$tag)""".stripMargin
  }

  /** One Viterbi-EM round r: costs from uvocab$r (C64(total) −
    * C64(cnt)), the Viterbi DP as a RECURSIVE CTE carrying a 3-state
    * window (c0/p0 = best at pos, c1x/c2x = pos−1/pos−2) —
    * deliberately a different mechanism than the Spark side's
    * row-local array fold — then the freq-weighted M-step with
    * unused-multi pruning and the single-char count floor.
    * Tie-break matches the Spark CASE exactly: shortest piece wins.
    */
  private def emRound(r: Int): String =
    s"""uvals$r AS MATERIALIZED (SELECT piece, cnt AS v FROM uvocab$r
       |            UNION ALL SELECT '', CAST(SUM(cnt) AS BIGINT) FROM uvocab$r),
       |${c64Chain(s"uvals$r", s"r$r")},
       |ucost$r AS MATERIALIZED (SELECT a.piece, t.c64 - a.c64 AS c
       |            FROM c64_r$r a, (SELECT c64 FROM c64_r$r WHERE piece = '') t
       |            WHERE a.piece <> ''),
       |um$r AS MATERIALIZED (SELECT map(list(piece), list(c)) AS mp FROM ucost$r),
       |udp$r AS (
       | SELECT word, freq, 0 AS pos,
       |  CAST(0 AS BIGINT) AS c0, CAST([] AS VARCHAR[]) AS p0,
       |  CAST($UInf AS BIGINT) AS c1x, CAST([] AS VARCHAR[]) AS p1x,
       |  CAST($UInf AS BIGINT) AS c2x, CAST([] AS VARCHAR[]) AS p2x
       | FROM ut
       | UNION ALL
       | SELECT word, freq, pos + 1,
       |  CASE WHEN q1 <= least(q2, q3) THEN q1 WHEN q2 <= q3 THEN q2 ELSE q3 END,
       |  CASE WHEN q1 <= least(q2, q3) THEN p0 || [s1]
       |       WHEN q2 <= q3 THEN p1x || [s2] ELSE p2x || [s3] END,
       |  c0, p0, c1x, p1x
       | FROM (
       |  SELECT word, freq, pos, c0, p0, c1x, p1x, c2x, p2x, s1, s2, s3,
       |   c0 + COALESCE(mp[s1][1], $UInf) AS q1,
       |   CASE WHEN pos >= 1 THEN c1x + COALESCE(mp[s2][1], $UInf) ELSE $UInf END AS q2,
       |   CASE WHEN pos >= 2 THEN c2x + COALESCE(mp[s3][1], $UInf) ELSE $UInf END AS q3
       |  FROM (
       |   SELECT udp$r.*, mp,
       |    substr(word, pos + 1, 1) AS s1,
       |    CASE WHEN pos >= 1 THEN substr(word, pos, 2) ELSE '' END AS s2,
       |    CASE WHEN pos >= 2 THEN substr(word, pos - 1, 3) ELSE '' END AS s3
       |   FROM udp$r, um$r
       |   WHERE pos < length(word)))),
       |ufin$r AS MATERIALIZED (SELECT word, freq, c0 AS cost, p0 AS pieces FROM udp$r
       |           WHERE pos = length(word)),
       |umc$r AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |          FROM (SELECT freq, unnest(pieces) AS piece FROM ufin$r) GROUP BY piece),
       |uvocab${r + 1} AS MATERIALIZED (
       | SELECT c.piece, GREATEST(COALESCE(m.cnt, 0), 1) AS cnt
       | FROM uchars c LEFT JOIN umc$r m USING (piece)
       | UNION ALL
       | SELECT piece, cnt FROM umc$r WHERE length(piece) >= 2)""".stripMargin

  /** Mirrors TextOps.unigramFit end-to-end: type collapse, substring
    * seeding with the (cnt DESC, piece ASC) top cut, and
    * TextOps.UnigramRounds EM rounds. The DP windows hardcode piece
    * length 3 — asserted against the Spark constant.
    */
  private def unigramChain: String = {
    require(graft.operators.TextOps.UnigramMaxPieceLen == 3,
      "oracle DP window is unrolled for MaxPieceLen=3")
    require(graft.operators.TextOps.UnigramRounds == 2,
      "oracle chain is unrolled for 2 EM rounds")
    val L = graft.operators.TextOps.UnigramMaxPieceLen
    val M = graft.operators.TextOps.UnigramSeedMulti
    s"""ut AS MATERIALIZED (
       | SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')) AS word
       |  FROM documents)
       | GROUP BY word),
       |usx AS (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i FROM ut),
       |usy AS (SELECT word, freq, i,
       |        unnest(range(1, least($L, length(word) - i + 1) + 1)) AS l FROM usx),
       |useed AS MATERIALIZED (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |          CAST(SUM(freq) AS BIGINT) AS cnt FROM usy GROUP BY piece),
       |umulti AS (SELECT piece, cnt FROM useed WHERE length(piece) >= 2
       |           ORDER BY cnt DESC, piece ASC LIMIT $M),
       |uchars AS MATERIALIZED (SELECT piece, cnt FROM useed WHERE length(piece) = 1),
       |uvocab1 AS MATERIALIZED (SELECT * FROM umulti UNION ALL SELECT * FROM uchars),
       |${emRound(1)},
       |${emRound(2)},
       |uvals3 AS (SELECT piece, cnt AS v FROM uvocab3
       |           UNION ALL SELECT '', CAST(SUM(cnt) AS BIGINT) FROM uvocab3),
       |${c64Chain("uvals3", "r3")},
       |ucost3 AS (SELECT a.piece, t.c64 - a.c64 AS c FROM c64_r3 a,
       |           (SELECT c64 FROM c64_r3 WHERE piece = '') t WHERE a.piece <> '')""".stripMargin
  }

  /** Mirrors TextOps.unigramFitTable. */
  val unigramFit: String =
    s"""WITH RECURSIVE $unigramChain
       |SELECT v.piece, CAST(length(v.piece) AS BIGINT) AS piece_len,
       | CAST(v.cnt AS BIGINT) AS cnt, CAST(c.c AS BIGINT) AS cost_c64
       |FROM uvocab3 v JOIN ucost3 c USING (piece)""".stripMargin

  /** Mirrors TextOps.unigramEncode: final-round segmentation,
    * occurrence-weighted per source.
    */
  val unigramEncode: String =
    s"""WITH RECURSIVE $unigramChain,
       |uocc AS (
       | SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |  SELECT source,
       |   unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')) AS word
       |  FROM documents)
       | GROUP BY 1, 2),
       |uenc AS (SELECT word, CAST(len(pieces) AS BIGINT) AS n_syms FROM ufin2)
       |SELECT source,
       | CAST(SUM(cnt) AS BIGINT) AS n_word_occurrences,
       | CAST(COUNT(DISTINCT word) AS BIGINT) AS n_word_types,
       | CAST(SUM(cnt * length(word)) AS BIGINT) AS n_letters,
       | CAST(SUM(cnt * n_syms) AS BIGINT) AS n_unigram_tokens,
       | CAST(CAST(SUM(cnt * n_syms) AS HUGEINT) * 1000000
       |      // CAST(SUM(cnt * length(word)) AS BIGINT) AS BIGINT) AS compression_ppm
       |FROM uocc JOIN uenc USING (word)
       |GROUP BY source""".stripMargin

  /** Mirrors TextOps.unigramVsBpe: both trained tokenizers' totals
    * off their final type segmentations (BPE from the shared
    * Oracles6.bpeChain r-last; unigram from ufin2/uvocab3).
    */
  val unigramVsBpe: String = {
    val last = s"r${graft.operators.TextOps.BpeMerges}"
    s"""WITH RECURSIVE ${Oracles6.bpeChain},
       |$unigramChain,
       |bstat AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS n_letters,
       |          CAST(SUM(freq * len(string_split(trim(seq), ' '))) AS BIGINT) AS n_tokens
       |          FROM $last),
       |bvoc AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_vocab FROM
       |         (SELECT unnest(string_split(trim(seq), ' ')) AS s FROM $last)),
       |ustat AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS n_letters,
       |          CAST(SUM(freq * len(pieces)) AS BIGINT) AS n_tokens FROM ufin2),
       |uvoc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab FROM uvocab3)
       |SELECT 'bpe' AS family, n_vocab, n_letters, n_tokens,
       | CAST(CAST(n_tokens AS HUGEINT) * 1000000 // n_letters AS BIGINT) AS compression_ppm
       |FROM bstat, bvoc
       |UNION ALL
       |SELECT 'unigram' AS family, n_vocab, n_letters, n_tokens,
       | CAST(CAST(n_tokens AS HUGEINT) * 1000000 // n_letters AS BIGINT) AS compression_ppm
       |FROM ustat, uvoc""".stripMargin
  }

  // ── WordPiece tokenizer twins ───────────────────────────────────

  /** Mirrors TextOps.wordpieceFit: the BPE merge-loop shape
    * (Oracles6.bpeChain) but with `##`-marked continuation symbols
    * and the likelihood argmax — score = cnt·10¹² // (cnt_a·cnt_b) in
    * HUGEINT (the Spark side runs DECIMAL(38,0) DIV — two exact
    * mechanisms, one winner), ties (cnt DESC, pair ASC).
    */
  private[graft] def wpChain: String = {
    val init =
      """w0 AS MATERIALIZED (
        | SELECT word, COUNT(*) AS freq,
        |  ' ' || substr(word, 1, 1) ||
        |  CASE WHEN length(word) > 1
        |       THEN ' ' || trim(regexp_replace(substr(word, 2), '(.)', '##\1 ', 'g'))
        |       ELSE '' END || ' ' AS seq
        | FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '')) AS word
        |  FROM documents)
        | GROUP BY 1)""".stripMargin
    val rounds = (1 to graft.operators.TextOps.WordPieceMerges).map { k =>
      s"""wsy$k AS MATERIALIZED (SELECT sym, SUM(freq) AS scnt FROM (
         |  SELECT freq, unnest(string_split(trim(seq), ' ')) AS sym FROM w${k - 1})
         | GROUP BY 1),
         |wpp$k AS (SELECT pair, SUM(freq) AS cnt FROM (
         |  SELECT freq,
         |   unnest(list_filter(
         |     list_transform(list_zip(syms, syms[2:]),
         |       x -> CASE WHEN x[2] IS NULL THEN NULL ELSE x[1] || ' ' || x[2] END),
         |     y -> y IS NOT NULL)) AS pair
         |  FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM w${k - 1}))
         | GROUP BY 1),
         |wm$k AS MATERIALIZED (
         | SELECT pair, cnt, a.scnt AS cnt_a, b.scnt AS cnt_b,
         |  CAST(CAST(cnt AS HUGEINT) * 1000000000000
         |       // (CAST(a.scnt AS HUGEINT) * b.scnt) AS BIGINT) AS score,
         |  string_split(pair, ' ')[1] ||
         |    regexp_replace(string_split(pair, ' ')[2], '^##', '') AS merged
         | FROM wpp$k, wsy$k a, wsy$k b
         | WHERE a.sym = string_split(pair, ' ')[1] AND b.sym = string_split(pair, ' ')[2]
         | ORDER BY score DESC, cnt DESC, pair ASC LIMIT 1),
         |w$k AS MATERIALIZED (
         | SELECT word, freq,
         |  replace(replace(replace(seq, ' ' || pair || ' ', ' ' || merged || ' '),
         |          ' ' || pair || ' ', ' ' || merged || ' '),
         |          ' ' || pair || ' ', ' ' || merged || ' ') AS seq
         | FROM w${k - 1}, wm$k)""".stripMargin
    }
    s"$init,\n${rounds.mkString(",\n")}"
  }

  val wordpieceFit: String = {
    val sel = (1 to graft.operators.TextOps.WordPieceMerges)
      .map { k =>
        s"""SELECT CAST($k AS BIGINT) AS rank,
           | string_split(pair, ' ')[1] AS left_sym,
           | string_split(pair, ' ')[2] AS right_sym,
           | merged,
           | CAST(cnt AS BIGINT) AS pair_count,
           | CAST(cnt_a AS BIGINT) AS left_count,
           | CAST(cnt_b AS BIGINT) AS right_count,
           | score AS score_q
           |FROM wm$k""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"WITH $wpChain\n$sel"
  }

  val wordpieceEncode: String = {
    val last = s"w${graft.operators.TextOps.WordPieceMerges}"
    s"""WITH $wpChain,
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
       | CAST(SUM(cnt * n_syms) AS BIGINT) AS n_wp_tokens,
       | CAST(CAST(SUM(cnt * n_syms) AS HUGEINT) * 1000000
       |      // CAST(SUM(cnt * length(word)) AS HUGEINT) AS BIGINT) AS compression_ppm
       |FROM occ JOIN enc USING (word)
       |GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.wordpieceGreedy: the same greedy longest-match
    * inference as a RECURSIVE CTE (one state row per consumed piece,
    * longest match via a correlated MAX over the realized vocab;
    * whole-word [UNK] when nothing matches) — deliberately a
    * different mechanism from the Spark side's aggregate fold.
    */
  val wordpieceGreedy: String = {
    val last = s"w${graft.operators.TextOps.WordPieceMerges}"
    s"""WITH RECURSIVE $wpChain,
       |gbase AS MATERIALIZED (SELECT word, seq FROM $last),
       |gvoc AS MATERIALIZED (
       | SELECT DISTINCT unnest(string_split(trim(seq), ' ')) AS piece FROM gbase),
       |gpos AS MATERIALIZED (
       | SELECT word, CAST(unnest(range(1, length(word) + 1)) AS BIGINT) AS pos FROM gbase),
       |gbest AS MATERIALIZED (
       | SELECT p.word, p.pos,
       |  MAX(CASE WHEN p.pos = 1 THEN length(v.piece) ELSE length(v.piece) - 2 END) AS bl
       | FROM gpos p LEFT JOIN gvoc v
       |  ON CASE WHEN p.pos = 1
       |     THEN v.piece NOT LIKE '##%'
       |      AND v.piece = substr(p.word, 1, CAST(length(v.piece) AS INT))
       |     ELSE v.piece LIKE '##%'
       |      AND substr(v.piece, 3) =
       |          substr(p.word, CAST(p.pos AS INT), CAST(length(v.piece) - 2 AS INT)) END
       | GROUP BY 1, 2),
       |grec AS (
       | SELECT word, CAST(1 AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS ps, FALSE AS unk
       | FROM gbase
       | UNION ALL
       | SELECT r.word,
       |  CASE WHEN b.bl IS NULL THEN length(r.word) + 1 ELSE r.pos + b.bl END AS pos,
       |  CASE WHEN b.bl IS NULL THEN ['[UNK]']
       |       ELSE list_append(r.ps,
       |        CASE WHEN r.pos = 1 THEN substr(r.word, 1, CAST(b.bl AS INT))
       |             ELSE '##' || substr(r.word, CAST(r.pos AS INT), CAST(b.bl AS INT)) END)
       |  END AS ps,
       |  b.bl IS NULL AS unk
       | FROM grec r JOIN gbest b ON b.word = r.word AND b.pos = r.pos
       | WHERE r.pos <= length(r.word) AND NOT r.unk),
       |gfin AS (SELECT word, ps AS greedy, unk FROM grec WHERE pos > length(word)),
       |grep AS (SELECT word, string_split(trim(seq), ' ') AS replay FROM gbase),
       |gocc AS (
       | SELECT source, word, COUNT(*) AS cnt FROM (
       |  SELECT source,
       |   unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')) AS word
       |  FROM documents)
       | GROUP BY 1, 2)
       |SELECT source,
       | CAST(SUM(cnt) AS BIGINT) AS n_word_occurrences,
       | CAST(SUM(CASE WHEN unk THEN cnt ELSE 0 END) AS BIGINT) AS unk_occurrences,
       | CAST(SUM(cnt * len(greedy)) AS BIGINT) AS n_greedy_tokens,
       | CAST(SUM(cnt * len(replay)) AS BIGINT) AS n_replay_tokens,
       | CAST(SUM(CASE WHEN greedy = replay THEN cnt ELSE 0 END) AS BIGINT) AS parity_occ,
       | CAST(CAST(SUM(CASE WHEN greedy = replay THEN cnt ELSE 0 END) AS HUGEINT) * 1000000
       |      // CAST(SUM(cnt) AS HUGEINT) AS BIGINT) AS parity_ppm
       |FROM gocc JOIN gfin USING (word) JOIN grep USING (word)
       |GROUP BY source""".stripMargin
  }

  /** Mirrors TextOps.tokenizerBakeoff: the unigramVsBpe sheet plus
    * the WordPiece row, all three families off the identical type
    * table (bpeChain / unigramChain / wpChain in one WITH).
    */
  val tokenizerBakeoff: String = {
    val last = s"r${graft.operators.TextOps.BpeMerges}"
    val wlast = s"w${graft.operators.TextOps.WordPieceMerges}"
    s"""WITH RECURSIVE ${Oracles6.bpeChain},
       |$unigramChain,
       |$wpChain,
       |bstat AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS n_letters,
       |          CAST(SUM(freq * len(string_split(trim(seq), ' '))) AS BIGINT) AS n_tokens
       |          FROM $last),
       |bvoc AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_vocab FROM
       |         (SELECT unnest(string_split(trim(seq), ' ')) AS s FROM $last)),
       |ustat AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS n_letters,
       |          CAST(SUM(freq * len(pieces)) AS BIGINT) AS n_tokens FROM ufin2),
       |uvoc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab FROM uvocab3),
       |wstat AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS n_letters,
       |          CAST(SUM(freq * len(string_split(trim(seq), ' '))) AS BIGINT) AS n_tokens
       |          FROM $wlast),
       |wvoc AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_vocab FROM
       |         (SELECT unnest(string_split(trim(seq), ' ')) AS s FROM $wlast))
       |SELECT 'bpe' AS family, n_vocab, n_letters, n_tokens,
       | CAST(CAST(n_tokens AS HUGEINT) * 1000000 // n_letters AS BIGINT) AS compression_ppm
       |FROM bstat, bvoc
       |UNION ALL
       |SELECT 'unigram' AS family, n_vocab, n_letters, n_tokens,
       | CAST(CAST(n_tokens AS HUGEINT) * 1000000 // n_letters AS BIGINT) AS compression_ppm
       |FROM ustat, uvoc
       |UNION ALL
       |SELECT 'wordpiece' AS family, n_vocab, n_letters, n_tokens,
       | CAST(CAST(n_tokens AS HUGEINT) * 1000000 // n_letters AS BIGINT) AS compression_ppm
       |FROM wstat, wvoc""".stripMargin
  }

  // ── Kneser-Ney bigram LM twins ──────────────────────────────────

  /** [[c64Chain]] keyed by the VALUE itself (column v, deduped by the
    * caller) — for model tables where c64 is taken of a data column
    * rather than a vocab piece's count. Output: c64v_$tag(v, c64).
    */
  private[graft] def c64ValChain(src: String, tag: String): String = {
    val steps = (1 to 6)
      .map { i =>
        s"""s${i}_$tag AS (SELECT v, b,
           | f*2 + CASE WHEN y*y >= (CAST(1 AS BIGINT) << 61) THEN 1 ELSE 0 END AS f,
           | CASE WHEN y*y >= (CAST(1 AS BIGINT) << 61) THEN (y*y) >> 31 ELSE (y*y) >> 30 END AS y
           |FROM s${i - 1}_$tag)""".stripMargin
      }
      .mkString(",\n")
    s"""n_$tag AS (SELECT v, $bitlenSql AS b FROM $src),
       |s0_$tag AS (SELECT v, b, CAST(0 AS BIGINT) AS f,
       |  CASE WHEN b <= 30 THEN v << (30 - b) ELSE v >> (b - 30) END AS y FROM n_$tag),
       |$steps,
       |c64v_$tag AS MATERIALIZED (SELECT v, 64*b + f AS c64 FROM s6_$tag)""".stripMargin
  }

  /** Mirrors TextOps.knModel: interpolated Kneser-Ney bigram model,
    * D = 3/4, p quantized to ⌊p·2⁵⁰⌋ through HUGEINT floor division
    * (the Spark side runs the same products in DECIMAL(38,0) — two
    * exact-integer mechanisms, one value), nll64 = 3200 − c64(qp)
    * with c64 as the unrolled square-and-shift chain.
    */
  private val knCtes: String =
    s"""kt AS (
       | SELECT doc_id, source,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |kbgd AS MATERIALIZED (
       | SELECT doc_id, unnest(list_transform(range(len(toks)-1),
       |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS bg
       | FROM kt WHERE len(toks) >= 2),
       |kcnt AS MATERIALIZED (SELECT bg, split_part(bg, ' ', 1) AS head, split_part(bg, ' ', 2) AS nxt,
       |         COUNT(*) AS c_hw FROM kbgd GROUP BY bg),
       |ktt AS (SELECT COUNT(*) AS t_types FROM kcnt),
       |kst AS (SELECT bg, head, nxt, c_hw,
       |  CAST(SUM(c_hw) OVER (PARTITION BY head) AS BIGINT) AS c_h,
       |  CAST(COUNT(*) OVER (PARTITION BY head) AS BIGINT) AS n1p_h,
       |  CAST(COUNT(*) OVER (PARTITION BY nxt) AS BIGINT) AS cont_w
       | FROM kcnt),
       |kqp AS MATERIALIZED (SELECT bg, head, nxt, c_hw, c_h, n1p_h, cont_w,
       |  CAST((CAST(4*c_hw - 3 AS HUGEINT) * t_types + CAST(3*n1p_h AS HUGEINT) * cont_w)
       |       * CAST(${1L << graft.operators.TextOps.KnQpShift} AS HUGEINT)
       |       // (CAST(4*c_h AS HUGEINT) * t_types) AS BIGINT) AS qp
       | FROM kst, ktt),
       |kvals AS (SELECT DISTINCT qp AS v FROM kqp),
       |${c64ValChain("kvals", "kn")},
       |kmodel AS (SELECT q.*, ${64L * graft.operators.TextOps.KnQpShift} - c.c64 AS nll64
       |           FROM kqp q JOIN c64v_kn c ON q.qp = c.v)""".stripMargin

  val knBigramFit: String =
    s"""WITH $knCtes
       |SELECT head, nxt, c_hw, c_h, n1p_h, cont_w, qp, nll64
       |FROM kmodel ORDER BY qp DESC, head, nxt LIMIT 25""".stripMargin

  private[graft] val knDocCtes: String =
    s"""$knCtes,
       |kdoc AS (
       | SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(nll64) AS BIGINT) AS sum_nll64
       | FROM kbgd JOIN kmodel USING (bg) GROUP BY doc_id),
       |kppl AS MATERIALIZED (
       | SELECT d.doc_id, d.source,
       |  COALESCE(k.n_bigrams, 0) AS n_bigrams,
       |  COALESCE(k.sum_nll64, 0) AS sum_nll64,
       |  COALESCE(k.sum_nll64 // k.n_bigrams, 0) AS avg_nll64
       | FROM documents d LEFT JOIN kdoc k USING (doc_id))""".stripMargin

  val knDocPpl: String =
    s"""WITH $knDocCtes
       |SELECT doc_id, source, n_bigrams, sum_nll64, avg_nll64 FROM kppl""".stripMargin

  /** Mirrors TextOps.doremiWeights: per-source KN means off the kppl
    * chain, excess vs the corpus mean, then the exp2 chain with
    * [[graft.functions.Exp2Kernel]]'s quantized dyadic-root literals
    * — six conditional multiply-shift steps, identical arithmetic.
    */
  val doremiWeights: String = {
    val C = graft.functions.Exp2Kernel.C
    val maxY = graft.functions.Exp2Kernel.MaxY
    val steps = (0 until 6)
      .map { j =>
        s"""dm${j + 1} AS (SELECT source, n_docs, mean_nll64, excess, e,
           | CASE WHEN (((e % 64) >> ${5 - j}) & 1) = 1 THEN (m * ${C(j)}) >> 30 ELSE m END AS m
           |FROM dm$j)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $knDocCtes,
       |dsrc AS (SELECT source, COUNT(*) AS n_docs,
       |         CAST(SUM(avg_nll64) AS BIGINT) AS s FROM kppl GROUP BY 1),
       |dg AS (SELECT CAST(SUM(avg_nll64) AS BIGINT) // COUNT(*) AS gmean FROM kppl),
       |dx AS MATERIALIZED (SELECT source, n_docs, s // n_docs AS mean_nll64,
       |       s // n_docs - gmean AS excess FROM dsrc, dg),
       |dmx AS (SELECT MAX(excess) AS mx FROM dx),
       |dm0 AS (SELECT source, n_docs, mean_nll64, excess,
       |        greatest(excess - mx + $maxY, 0) AS e,
       |        CAST(1073741824 AS BIGINT) AS m FROM dx, dmx),
       |$steps,
       |dv AS MATERIALIZED (SELECT source, n_docs, mean_nll64, excess,
       |        CASE WHEN e // 64 >= 30 THEN m << CAST(e // 64 - 30 AS INT)
       |             ELSE m >> CAST(30 - e // 64 AS INT) END AS v
       |       FROM dm6),
       |dt AS (SELECT SUM(v) AS tv FROM dv)
       |SELECT source, n_docs, mean_nll64, excess AS excess_nll64,
       | CAST(CAST(v AS HUGEINT) * 1000000 // tv AS BIGINT) AS weight_ppm
       |FROM dv, dt""".stripMargin
  }

  // (pplBucketSplit moved to Oracles9 when round 9 re-pointed the
  // split at the trigram score)
}
