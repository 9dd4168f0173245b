package graft

/** DuckDB oracle SQL for the dedup / similarity / events suites.
  * Kept apart from SparkEntry for readability; same conventions
  * (identical aliases, BIGINT derived ints, epoch-µs timestamps,
  * varchar-mediated decimal→double casts).
  */
object Oracles2 {

  /** Shared CTE prefix: tokenized docs and word-3-gram shingle sets.
    * private[graft]: Oracles5's minhash-rollup oracle reuses it so the
    * shingle definition cannot drift between the two files.
    */
  private[graft] val shinglesCte =
    """toks AS MATERIALIZED (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |sh AS MATERIALIZED (
      | SELECT doc_id,
      |  list_distinct(list_transform(range(len(toks)-2),
      |    i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' '))) AS shingles
      | FROM toks WHERE len(toks) >= 3)""".stripMargin

  private[graft] val jaccardExpr =
    """CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |  CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE)""".stripMargin

  /** The quality_score formula over columns (text, toks) — ONE
    * definition mirroring TextOps.withQualityCols, interpolated by
    * every oracle that re-derives the score (a drifted copy would
    * silently assert a stale formula). Declared before first use:
    * object vals initialize in declaration order, and a forward
    * reference interpolates null into the SQL.
    */
  private[graft] val qualityExprSql: String =
    """(CASE WHEN len(toks) >= 5 THEN 1.0 ELSE 0.0 END)
      |   * (1.0 - CASE WHEN length(text) > 0
      |            THEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
      |                 AS DOUBLE)/CAST(length(text) AS DOUBLE) ELSE 0.0 END)
      |   * (0.5 + CASE WHEN len(toks) > 0
      |            THEN CAST(len(list_filter(toks, t -> t IN
      |                 ('the','a','an','and','or','of','to','in','is','it','on','for')))
      |                 AS DOUBLE)/CAST(len(toks) AS DOUBLE) ELSE 0.0 END)""".stripMargin

  /** The exact-dedup fingerprint formula (TextOps.fingerprintExpr's
    * twin) — ONE definition, interpolated by every oracle that
    * re-derives it (dedupExact, the filter funnel).
    */
  private[graft] val fingerprintSql: String =
    """md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"""

  val dedupExact: String =
    s"""SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS group_size,
       | MIN(doc_id) OVER (PARTITION BY fp) AS keeper_id,
       | doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_keeper
       |FROM (SELECT doc_id,
       |       $fingerprintSql AS fp
       |      FROM documents)""".stripMargin

  /** The hs → sigs → bands chain shared by minhashLsh and the
    * candidate-volume audit (one definition of the banding policy).
    */
  private[graft] val minhashBandsCte: String =
    """hs AS (
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
      | FROM sigs, (SELECT unnest(range(4)) AS band_idx) b)""".stripMargin

  val minhashLsh: String =
    s"""WITH $shinglesCte,
       |$minhashBandsCte,
       |cand AS MATERIALIZED (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM (
       | SELECT doc_a, doc_b, $jaccardExpr AS jaccard
       | FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
       |WHERE jaccard >= 0.7""".stripMargin

  val ngramJaccard: String =
    s"""WITH $shinglesCte,
       |posting AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |rare AS (SELECT shingle FROM posting GROUP BY shingle
       |         HAVING COUNT(*) <= GREATEST(50,
       |                 CAST(ceil(0.001 * (SELECT COUNT(*) FROM documents)) AS BIGINT))),
       |pruned AS MATERIALIZED (SELECT p.doc_id, p.shingle FROM posting p JOIN rare USING (shingle)),
       |rc AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_rare FROM pruned GROUP BY doc_id),
       |cand AS MATERIALIZED (
       | SELECT doc_a, doc_b FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |  FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       | JOIN rc ra ON ra.doc_id = doc_a JOIN rc rb ON rb.doc_id = doc_b
       | WHERE n_shared >= GREATEST(3, CAST(ceil(LEAST(ra.n_rare, rb.n_rare) / 3.0) AS BIGINT)))
       |SELECT doc_a, doc_b, jaccard FROM (
       | SELECT doc_a, doc_b, $jaccardExpr AS jaccard
       | FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
       |WHERE jaccard >= 0.5""".stripMargin

  /** 64-bit simhash CTE ending in fp(doc_id, simhash). */
  private[graft] val simhashCte =
    """toks AS MATERIALIZED (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |tok AS (SELECT doc_id, md5(t) AS h, COUNT(*) AS c
      |        FROM (SELECT doc_id, unnest(toks) AS t FROM toks WHERE len(toks) > 0)
      |        GROUP BY doc_id, md5(t)),
      |bits AS (
      | SELECT doc_id, j,
      |  SUM(CASE WHEN CAST(floor(CAST(concat('0x', substr(h, CAST(j//4+1 AS INT), 1)) AS UBIGINT)
      |                 / pow(2.0, CAST(3 - j%4 AS DOUBLE))) AS INT) % 2 = 1
      |           THEN c ELSE -c END) AS s
      | FROM tok CROSS JOIN (SELECT unnest(range(64)) AS j) jj GROUP BY doc_id, j),
      |fp AS (
      | SELECT doc_id, string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
      | FROM bits GROUP BY doc_id)""".stripMargin

  val simhashFingerprint: String =
    s"""WITH $simhashCte
       |SELECT doc_id, simhash FROM fp""".stripMargin

  val simhashPairs: String =
    s"""WITH $simhashCte,
       |banded AS MATERIALIZED (
       | SELECT doc_id, simhash, b.band_idx,
       |  substr(simhash, CAST(b.band_idx*16+1 AS INT), 16) AS band_bits
       | FROM fp, (SELECT unnest(range(4)) AS band_idx) b),
       |cand AS MATERIALIZED (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.simhash AS sim_a, b.simhash AS sim_b
       | FROM banded a JOIN banded b
       |  ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM (
       | SELECT doc_a, doc_b,
       |  CAST(len(list_filter(range(64),
       |    j -> substr(sim_a, CAST(j+1 AS INT), 1) <> substr(sim_b, CAST(j+1 AS INT), 1))) AS BIGINT)
       |   AS hamming
       | FROM cand)
       |WHERE hamming <= 10""".stripMargin

  /** Sequential-fold dot product / norm (same fold order as the Spark
    * expressions, so scores are bit-identical).
    */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private val normSql: String =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  val annTopkBruteforce: String =
    s"""WITH q AS MATERIALIZED (SELECT vec_id AS query_id, embedding AS qe, $normSql AS nq
       |           FROM embeddings WHERE vec_id < 5),
       |n AS MATERIALIZED (SELECT vec_id AS neighbor_id, embedding AS ne, $normSql AS nn FROM embeddings),
       |p AS MATERIALIZED (SELECT query_id, neighbor_id, ${dotSql("qe", "ne")} / (nq * nn) AS score
       |      FROM q, n WHERE query_id <> neighbor_id)
       |SELECT query_id, neighbor_id, score, rnk FROM (
       | SELECT query_id, neighbor_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
       | FROM p)
       |WHERE rnk <= 5""".stripMargin

  val annTopkIvf: String =
    s"""WITH q AS MATERIALIZED (SELECT vec_id AS query_id, embedding AS qe, label, $normSql AS nq
       |           FROM embeddings WHERE vec_id < 5),
       |n AS MATERIALIZED (SELECT vec_id AS neighbor_id, embedding AS ne, label, $normSql AS nn FROM embeddings),
       |p AS MATERIALIZED (SELECT query_id, q.label AS label, neighbor_id, ${dotSql("qe", "ne")} / (nq * nn) AS score
       |      FROM q JOIN n USING (label) WHERE query_id <> neighbor_id)
       |SELECT query_id, label, neighbor_id, score, rnk FROM (
       | SELECT query_id, label, neighbor_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
       | FROM p)
       |WHERE rnk <= 5""".stripMargin

  /** One LSH bucket bit: sign of the projection onto plane l*6+i. */
  private def lshBit(i: Int): String =
    s"""CASE WHEN list_sum(list_transform(list_zip(embedding,
       |  list_transform(range(64), j -> CASE WHEN substr(md5(CAST(l*4+$i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) <= '7'
       |                                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
       |  x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0.0 THEN '1' ELSE '0' END""".stripMargin

  val annTopkLsh: String =
    s"""WITH buck AS MATERIALIZED (
       | SELECT vec_id, embedding, l AS table_idx,
       |  concat(${(0 until 4).map(lshBit).mkString(",\n")}) AS bucket
       | FROM embeddings, (SELECT unnest(range(8)) AS l)),
       |q AS MATERIALIZED (SELECT table_idx, bucket, vec_id AS query_id FROM buck WHERE vec_id < 5),
       |n AS MATERIALIZED (SELECT table_idx, bucket, vec_id AS neighbor_id FROM buck),
       |cand AS MATERIALIZED (SELECT DISTINCT query_id, neighbor_id
       |         FROM q JOIN n USING (table_idx, bucket) WHERE query_id <> neighbor_id),
       |qn AS MATERIALIZED (SELECT vec_id, embedding, $normSql AS nv FROM embeddings),
       |p AS MATERIALIZED (SELECT query_id, neighbor_id,
       |       ${dotSql("qe.embedding", "ne.embedding")} / (qe.nv * ne.nv) AS score
       |      FROM cand JOIN qn qe ON qe.vec_id = query_id
       |                JOIN qn ne ON ne.vec_id = neighbor_id)
       |SELECT query_id, neighbor_id, score, rnk FROM (
       | SELECT query_id, neighbor_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
       | FROM p)
       |WHERE rnk <= 5""".stripMargin

  /** Corpus-wide k-NN join twin of annTopkLsh: every vector is a
    * query, k = 3; same planes, same candidate set.
    */
  val knnJoin: String =
    s"""WITH buck AS MATERIALIZED (
       | SELECT vec_id, embedding, l AS table_idx,
       |  concat(${(0 until 4).map(lshBit).mkString(",\n")}) AS bucket
       | FROM embeddings, (SELECT unnest(range(8)) AS l)),
       |cand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |         FROM buck a JOIN buck b
       |          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
       |             AND a.vec_id <> b.vec_id),
       |qn AS MATERIALIZED (SELECT vec_id, embedding, $normSql AS nv FROM embeddings),
       |p AS MATERIALIZED (SELECT query_id, neighbor_id,
       |       ${dotSql("qe.embedding", "ne.embedding")} / (qe.nv * ne.nv) AS score
       |      FROM cand JOIN qn qe ON qe.vec_id = query_id
       |                JOIN qn ne ON ne.vec_id = neighbor_id)
       |SELECT query_id, neighbor_id, score, rnk FROM (
       | SELECT query_id, neighbor_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
       | FROM p)
       |WHERE rnk <= 3""".stripMargin

  /** Mirrors SimilarityOps.embeddingNearDup's LSH bucketing exactly
    * (same md5-derived planes as annTopkLsh), so both engines score
    * the identical candidate set.
    */
  val annNearDup: String =
    s"""WITH buck AS MATERIALIZED (
       | SELECT vec_id, l AS table_idx,
       |  concat(${(0 until 4).map(lshBit).mkString(",\n")}) AS bucket
       | FROM embeddings, (SELECT unnest(range(8)) AS l)),
       |cand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM buck a JOIN buck b
       |          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
       |             AND a.vec_id < b.vec_id),
       |e AS MATERIALIZED (SELECT vec_id, embedding, $normSql AS nv FROM embeddings)
       |SELECT vec_a, vec_b, score FROM (
       | SELECT vec_a, vec_b,
       |  ${dotSql("ea.embedding", "eb.embedding")} / (ea.nv * eb.nv) AS score
       | FROM cand JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b)
       |WHERE score >= 0.45""".stripMargin

  val eventsHourly: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
      | COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  val sessions: String =
    """WITH e AS MATERIALIZED (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
      |s AS MATERIALIZED (SELECT user_id, event_id, ts_us, value,
      |  CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
      |       THEN 1 ELSE 0 END AS new_session
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
      |t AS MATERIALIZED (SELECT user_id, event_id, ts_us, value,
      |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM s)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      | MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM t GROUP BY user_id, session_id""".stripMargin

  val purchaseAttribution: String =
    """WITH ev AS MATERIALIZED (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |            FROM events WHERE event_type IN ('signup','purchase')),
      |f AS MATERIALIZED (SELECT user_id, event_id, event_type, ts_us,
      |  last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS) OVER w AS last_signup_id,
      |  last_value(CASE WHEN event_type = 'signup' THEN ts_us END IGNORE NULLS) OVER w AS last_signup_us
      | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id AS purchase_id, last_signup_id AS signup_id,
      | ts_us - last_signup_us AS gap_us
      |FROM f WHERE event_type = 'purchase' AND last_signup_id IS NOT NULL""".stripMargin

  val userActivity: String =
    """SELECT user_id, COUNT(*) AS n_events,
      | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value,
      | MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
      | COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days
      |FROM events GROUP BY user_id""".stripMargin

  val valueQuantiles: String =
    """SELECT event_type, quantile_cont(value, 0.5) AS p50,
      | quantile_cont(value, 0.95) AS p95,
      | MIN(value) AS min_value, MAX(value) AS max_value, COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  val cubeDaily: String =
    """SELECT event_type, epoch_day, COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM (SELECT event_type, epoch_ns(ts) // 86400000000000 AS epoch_day, value FROM events)
      |GROUP BY CUBE(event_type, epoch_day)""".stripMargin

  val tfidfTopTerms: String =
    """WITH posting AS MATERIALIZED (
      | SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word
      | FROM documents),
      |p2 AS MATERIALIZED (SELECT doc_id, word FROM posting WHERE word <> ''),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM p2 GROUP BY doc_id, word),
      |dfx AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM p2 GROUP BY word),
      |nn AS MATERIALIZED (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM p2)
      |SELECT doc_id, word, tf, df, tfidf, rnk FROM (
      | SELECT doc_id, word, tf, df,
      |  CAST(tf AS DOUBLE) * (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) AS tfidf,
      |  ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY CAST(tf AS DOUBLE) * (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) DESC,
      |             word ASC) AS rnk
      | FROM tf JOIN dfx USING (word) CROSS JOIN nn)
      |WHERE rnk <= 5""".stripMargin

  val weeklyRetention: String =
    """WITH wu AS MATERIALIZED (SELECT DISTINCT epoch_ns(ts) // 604800000000000 AS wk, user_id FROM events)
      |SELECT a.wk AS wk, COUNT(*) AS active_users,
      | CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained_users
      |FROM wu a LEFT JOIN wu b ON b.wk = a.wk + 1 AND b.user_id = a.user_id
      |GROUP BY a.wk""".stripMargin

  val dedupClusters: String =
    s"""WITH RECURSIVE mh AS MATERIALIZED ($minhashLsh),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh
       |          UNION SELECT doc_b AS a, doc_a AS b FROM mh),
       |reach(a, b) AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
       |sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label)
       |SELECT doc AS doc_id, label AS canonical_id, cluster_size,
       | doc = label AS is_canonical
       |FROM comp JOIN sizes USING (label)""".stripMargin

  /** dedupClusters ⋈ the quality_score formula; keep = best quality
    * per cluster (doc_id tiebreak), as a window rank test.
    */
  val clusterKeepers: String =
    s"""WITH RECURSIVE mh AS MATERIALIZED ($minhashLsh),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh
       |          UNION SELECT doc_b AS a, doc_a AS b FROM mh),
       |reach(a, b) AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
       |sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label),
       |q AS MATERIALIZED (
       | SELECT doc_id,
       |  $qualityExprSql AS quality
       | FROM (SELECT doc_id, text,
       |        list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       |       FROM documents))
       |SELECT comp.doc AS doc_id, comp.label AS canonical_id, sizes.cluster_size, q.quality,
       | ROW_NUMBER() OVER (PARTITION BY comp.label
       |                    ORDER BY q.quality DESC, comp.doc ASC) = 1 AS keep
       |FROM comp JOIN sizes USING (label) JOIN q ON q.doc_id = comp.doc""".stripMargin

  /** Near-dup pair leakage across the md5 80/10/10 split (mirrors
    * TextOps.splitExpr on both ends of every minhashLsh pair).
    */
  val splitLeakage: String = {
    def splitCase(idCol: String): String =
      s"""CASE WHEN CAST(CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 80 THEN 'train'
         |     WHEN CAST(CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15))
         |          AS UBIGINT) % 100 AS INT) < 90 THEN 'val' ELSE 'test' END""".stripMargin
    s"""WITH mh AS MATERIALIZED ($minhashLsh)
       |SELECT ${splitCase("doc_a")} AS split_a, ${splitCase("doc_b")} AS split_b,
       | COUNT(*) AS n_pairs
       |FROM mh GROUP BY 1, 2""".stripMargin
  }

  val mmDecodeMeta: String =
    """SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      | CASE WHEN strlen(text) % 3 = 0 THEN 'image'
      |      WHEN strlen(text) % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      | CAST(CAST(concat('0x', substr(md5(text), 1, 2)) AS UBIGINT) AS BIGINT) + 64 AS width,
      | CAST(CAST(concat('0x', substr(md5(text), 3, 2)) AS UBIGINT) AS BIGINT) + 64 AS height
      |FROM documents""".stripMargin

  val mmFrameSample: String =
    """SELECT media_id, frame_idx,
      | md5(concat(md5(CAST(media_id AS VARCHAR)), '_', CAST(frame_idx AS VARCHAR))) AS frame_fp
      |FROM (
      | SELECT doc_id AS media_id,
      |  unnest(generate_series(0, CAST(strlen(text) AS BIGINT)//64, 2)) AS frame_idx
      | FROM documents)""".stripMargin

  /** Window functions evaluate before QUALIFY in DuckDB, so n_versions
    * counts every changelog row, mirroring Spark's count-then-filter.
    */
  val latestSnapshot: String =
    """SELECT user_id, event_id AS latest_event_id, epoch_us(ts) AS latest_us,
      | event_type AS latest_type, value AS latest_value,
      | COUNT(*) OVER (PARTITION BY user_id) AS n_versions
      |FROM events
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin

  /** list() keeps the NULLs the non-matching CASE arms produce, but
    * list_filter's NULL comparisons drop them — same contents as
    * Spark's null-dropping collect_list.
    */
  val funnelStages: String =
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
      |  list_min(list_filter(click_ts, t -> t >= first_view_us)) AS first_click_us
      | FROM f),
      |h AS (
      | SELECT user_id, first_view_us, first_click_us,
      |  list_min(list_filter(purch_ts, t -> t >= first_click_us)) AS first_purchase_us
      | FROM g)
      |SELECT user_id, first_view_us, first_click_us, first_purchase_us,
      | CAST(CASE WHEN first_view_us IS NULL THEN 0
      |           WHEN first_click_us IS NULL THEN 1
      |           WHEN first_purchase_us IS NULL THEN 2
      |           ELSE 3 END AS BIGINT) AS stage
      |FROM h""".stripMargin

  /** Mirrors DedupOps.decontaminate: same md5 split buckets, same
    * 8-gram construction, same 60-bit shingle hash — both engines
    * join the identical candidate space.
    */
  /** The decontamination posting chain (toks → 8-gram 60-bit hashes →
    * per-(doc, hash) rows with the md5 split bucket) — ONE definition
    * shared by decontaminate and the bloom-sizing sweep.
    */
  private[graft] val decontamPostingCte: String =
    """toks AS MATERIALIZED (
      | SELECT doc_id,
      |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 100 AS INT) AS b,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |sh AS MATERIALIZED (
      | SELECT doc_id, b,
      |  list_distinct(list_transform(range(len(toks)-7),
      |   i -> CAST(CAST(concat('0x', substr(md5(
      |          array_to_string(toks[CAST(i+1 AS INT):CAST(i+8 AS INT)], ' ')), 1, 15))
      |        AS UBIGINT) AS BIGINT))) AS hs
      | FROM toks WHERE len(toks) >= 8),
      |p AS MATERIALIZED (SELECT doc_id, b, unnest(hs) AS h FROM sh)""".stripMargin

  val decontaminate: String =
    s"""WITH $decontamPostingCte,
       |tr AS MATERIALIZED (SELECT doc_id AS train_doc, h FROM p WHERE b < 80),
       |te AS MATERIALIZED (SELECT doc_id AS test_doc, h FROM p WHERE b >= 90)
       |SELECT train_doc, COUNT(DISTINCT h) AS n_leaked_ngrams,
       | COUNT(DISTINCT test_doc) AS n_test_docs, MIN(test_doc) AS first_test_doc
       |FROM tr JOIN te USING (h)
       |GROUP BY train_doc""".stripMargin

  /** Mirrors TextOps.seqPacking: BPE-ish token counts, per-source
    * doc_id-ordered cumsum, integer-division bin ids. The tokenizer
    * sanitizes to printable ASCII first and uses only explicit ASCII
    * classes — no `\s`/`\p{L}`, whose meaning shifts with the regex
    * engine's Unicode-table vintage (see TextOps.packAssign).
    */
  val seqPacking: String =
    """WITH d AS MATERIALIZED (
      | SELECT doc_id, source,
      |  CAST(len(regexp_extract_all(regexp_replace(text, '[^ -~]', ' ', 'g'),
      |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
      | FROM documents),
      |c AS MATERIALIZED (
      | SELECT doc_id, source, n_tokens,
      |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      | FROM d)
      |SELECT source, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin, COUNT(*) AS n_docs,
      | CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
      | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      | CAST(SUM(n_tokens) AS BIGINT) > 512 AS overflowed
      |FROM c
      |GROUP BY source, (cum - n_tokens) // 512""".stripMargin

  /** Mirrors EventOps.scd2History: one window over (user, ts, id). */
  val scd2History: String =
    """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us, event_type, value,
      | CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
      | LEAD(epoch_us(ts)) OVER w AS valid_to_us,
      | LEAD(epoch_us(ts)) OVER w IS NULL AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)""".stripMargin

  val jsonPropsStats: String =
    """SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
      | CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
      | COUNT(DISTINCT k) AS n_distinct_k
      |FROM (SELECT event_type,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type""".stripMargin

  /** Same 90%-mass prefix rule as TextOps.vocabNucleus — the cut is
    * pure integer arithmetic so no float-threshold ambiguity.
    */
  val vocabNucleus: String =
    """WITH toks AS MATERIALIZED (
      | SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '')) AS token
      | FROM documents),
      |counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
      |w AS MATERIALIZED (SELECT token, cnt,
      | SUM(cnt) OVER () AS total,
      | SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS cum,
      | ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
      | FROM counts)
      |SELECT token, cnt, rnk, CAST(cum AS DOUBLE)/CAST(total AS DOUBLE) AS cum_share
      |FROM w WHERE (cum - cnt) * 10 < total * 9""".stripMargin

  /** Selection is a per-language running token sum over
    * (quality DESC, doc_id).
    */
  val budgetSelect: String =
    s"""WITH base AS (
      | SELECT doc_id, lang, n_chars, text,
      |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |scored AS MATERIALIZED (
      | SELECT doc_id, lang,
      |  CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS est_tokens,
      |  $qualityExprSql AS quality
      | FROM base),
      |sel AS (
      | SELECT lang, est_tokens, quality,
      |  SUM(est_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id ASC
      |                        ROWS UNBOUNDED PRECEDING) AS cum_toks
      | FROM scored)
      |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(est_tokens) AS BIGINT) AS kept_tokens,
      | MIN(quality) AS cutoff_quality
      |FROM sel WHERE cum_toks <= 2000 GROUP BY lang""".stripMargin

  /** Bigram model + per-doc re-join; p is one double division, the
    * doc mean runs over round(p*1e9) fixed-point BIGINTs (exact).
    */
  val lmDocScore: String =
    """WITH toks AS MATERIALIZED (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      | FROM documents),
      |bg AS MATERIALIZED (
      | SELECT doc_id, split_part(b, ' ', 1) AS head, split_part(b, ' ', 2) AS nxt
      | FROM (SELECT doc_id, unnest(list_transform(range(len(toks)-1),
      |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS b
      |  FROM toks WHERE len(toks) >= 2)),
      |counts AS (SELECT head, nxt, COUNT(*) AS cnt FROM bg GROUP BY head, nxt),
      |model AS (
      | SELECT head, nxt,
      |  CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY head) AS DOUBLE) AS p
      | FROM counts),
      |scored AS MATERIALIZED (
      | SELECT doc_id, CAST(round(p * 1000000000.0) AS BIGINT) AS qp, p
      | FROM bg JOIN model USING (head, nxt))
      |SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(qp) AS BIGINT) AS sum_qp,
      | CAST(SUM(qp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000000.0 AS avg_p,
      | MIN(p) AS min_p
      |FROM scored GROUP BY doc_id""".stripMargin

  val bigramTransitions: String =
    """WITH toks AS MATERIALIZED (
      | SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '') AS toks
      | FROM documents),
      |bg AS MATERIALIZED (
      | SELECT split_part(b, ' ', 1) AS head, split_part(b, ' ', 2) AS nxt
      | FROM (SELECT unnest(list_transform(range(len(toks)-1),
      |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))) AS b
      |  FROM toks WHERE len(toks) >= 2)),
      |counts AS (SELECT head, nxt, COUNT(*) AS cnt FROM bg GROUP BY head, nxt),
      |w AS MATERIALIZED (SELECT head, nxt, cnt,
      | SUM(cnt) OVER (PARTITION BY head) AS head_total,
      | ROW_NUMBER() OVER (PARTITION BY head ORDER BY cnt DESC, nxt) AS rnk
      | FROM counts)
      |SELECT head, nxt, cnt, rnk, CAST(cnt AS DOUBLE)/CAST(head_total AS DOUBLE) AS p
      |FROM w WHERE rnk <= 3""".stripMargin

  /** Moment sums are exact decimals (inputs have <= 2 decimals, so
    * squares/products fit DECIMAL(37,4) losslessly); the correlation
    * itself is per-row IEEE double over those exact sums, identical in
    * both engines.
    */
  val statsCorr: String =
    """WITH m AS MATERIALIZED (
      | SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_q,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_p,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qp,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_q2,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_p2
      | FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n, sum_q, sum_p, sum_qp, sum_q2, sum_p2,
      | (n * sum_qp - sum_q * sum_p) /
      |  (sqrt(n * sum_q2 - sum_q * sum_q) * sqrt(n * sum_p2 - sum_p * sum_p)) AS corr_qp,
      | (n * sum_qp - sum_q * sum_p) / (n * sum_q2 - sum_q * sum_q) AS beta
      |FROM m""".stripMargin

  val rankSuite: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      | NTILE(4) OVER w AS quartile,
      | RANK() OVER w AS rnk,
      | DENSE_RANK() OVER w AS dense_rnk,
      | PERCENT_RANK() OVER w AS pct_rank,
      | CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin

  val typoPairs: String =
    """WITH vocab AS (
      | SELECT DISTINCT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |   t -> t <> '')) AS token
      | FROM documents),
      |v AS MATERIALIZED (SELECT token FROM vocab WHERE length(token) >= 4)
      |SELECT a.token AS token_a, b.token AS token_b,
      | levenshtein(a.token, b.token) AS dist
      |FROM v a, v b
      |WHERE a.token < b.token
      | AND levenshtein(a.token, b.token) BETWEEN 1 AND 2""".stripMargin

  val priceHistogram: String =
    """SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
      | COUNT(*) AS n_orders,
      | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_price,
      | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1""".stripMargin

  /** vocabNucleus interpolated as the vocab CTE (declared above — see
    * the qualityExprSql note on val initialization order).
    */
  val oovRate: String =
    s"""WITH v AS MATERIALIZED ($vocabNucleus),
       |t AS MATERIALIZED (
       | SELECT doc_id, unnest(list_filter(
       |   regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '')) AS tok
       | FROM documents)
       |SELECT doc_id, COUNT(*) AS n_toks,
       | CAST(COUNT(*) - COUNT(v.token) AS BIGINT) AS n_oov,
       | CAST(COUNT(*) - COUNT(v.token) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
       |FROM t LEFT JOIN v ON t.tok = v.token
       |GROUP BY doc_id""".stripMargin
}
