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
    s"""t AS (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks
       | FROM documents),
       |dlt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
       |g AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dlt),
       |p AS (
       | SELECT doc_id, dl, term, COUNT(*) AS tf
       | FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dlt)
       | GROUP BY doc_id, dl, term),
       |qt AS (
       | SELECT DISTINCT doc_id AS query_id, term
       | FROM (SELECT doc_id, unnest(toks) AS term FROM dlt WHERE doc_id < 5)),
       |f AS (SELECT term, COUNT(*) AS df FROM p
       |      WHERE term IN (SELECT term FROM qt) GROUP BY term),
       |sc AS (
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
       |lr AS (
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
       |sem AS (
       | SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS sem_rank FROM (
       |  SELECT query_id, neighbor_id,
       |   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
       |  FROM pv)
       | WHERE rn <= 5),
       |fr AS (
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
       |tr AS (SELECT query_id, neighbor_id FROM sem),
       |la AS (SELECT query_id, doc_id AS neighbor_id FROM lr WHERE lex_rank <= 5),
       |hy AS (SELECT query_id, doc_id AS neighbor_id FROM fz)
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
}
