package graft

/** DuckDB oracle SQL for the round-3 additions (layout, sketch-merge,
  * spectrum). Same conventions as Oracles2-4: identical column
  * aliases, BIGINT derived ints, integer-exact arithmetic wherever the
  * gate hashes values.
  */
object Oracles5 {

  /** Unrolled 10-bit Morton interleave — the SQL twin of the codegen
    * `zorder64` expression (bit-identical for inputs < 2^10, which the
    * query guarantees by folding both dims mod 1024).
    */
  private def interleave10(x: String, y: String): String =
    (0 until graft.operators.LayoutOps.ZDimBits)
      .map(i => s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  val zorderLayout: String = {
    val shift = graft.operators.LayoutOps.ZBucketShift
    s"""WITH dims AS MATERIALIZED (
       | SELECT o_custkey % 1024 AS x,
       |        (CAST(epoch(o_orderdate) AS BIGINT) // 86400) % 1024 AS y
       | FROM orders),
       |zed AS (SELECT x, y, ${interleave10("x", "y")} AS z FROM dims)
       |SELECT z // ${1L << shift} AS z_bucket, COUNT(*) AS n_rows,
       | MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
       | MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span
       |FROM zed GROUP BY 1""".stripMargin
  }

  /** Per-source and whole-corpus MinHash signatures from ONE rollup —
    * the oracle re-derives both levels independently of each other
    * (per-source mins and global mins straight from the per-doc
    * signature list), so agreement proves the elementwise-MIN merge
    * rule, not just that two engines ran the same rollup.
    */
  val minhashSources: String = {
    val sigsSelect = (0 until graft.operators.DedupOps.MinhashPerms)
      .map(k => s"MIN(sigs[${k + 1}]) AS sig$k")
      .mkString(", ")
    s"""WITH ${Oracles2.shinglesCte},
       |hs AS (
       | SELECT doc_id, list_transform(shingles,
       |   s -> CAST(CAST(concat('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT) % 2147483647) AS hs
       | FROM sh),
       |sigs AS MATERIALIZED (
       | SELECT doc_id, list_transform(range(12),
       |   k -> list_min(list_transform(hs, h -> ((k*1000003+1)*h + (k*999983+12345)) % 2147483647))) AS sigs
       | FROM hs),
       |bysrc AS (
       | SELECT d.source AS source, $sigsSelect
       | FROM sigs JOIN documents d USING (doc_id) GROUP BY d.source),
       |global AS (
       | SELECT 'ALL' AS source, $sigsSelect
       | FROM sigs)
       |SELECT * FROM bysrc UNION ALL SELECT * FROM global""".stripMargin
  }

  /** Oriented census over the same MinHash pair CTE: wedges a<m<b,
    * triangles = wedges whose closing edge exists (each counted once).
    */
  val triangleStats: String =
    s"""WITH mh AS MATERIALIZED (${Oracles2.minhashLsh}),
       |e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mh),
       |w AS MATERIALIZED (SELECT e1.a AS a, e2.b AS b FROM e e1 JOIN e e2 ON e1.b = e2.a),
       |t AS MATERIALIZED (SELECT w.a, w.b FROM w JOIN e ON w.a = e.a AND w.b = e.b)
       |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       |       (SELECT COUNT(*) FROM w) AS n_wedges,
       |       (SELECT COUNT(*) FROM t) AS n_triangles""".stripMargin

  /** Byte-grid average-hash and banded near-dup pairs — char-for-byte
    * on the ASCII corpus, mirroring MultimodalOps.aHash/aHashPairs.
    */
  val aHashPairs: String = {
    val px = graft.sources.MultimodalOps.AHashPixels
    s"""WITH m AS MATERIALIZED (
       | SELECT doc_id AS media_id, text, length(text) // $px AS w
       | FROM documents WHERE length(text) >= $px),
       |px AS (
       | SELECT media_id, list_transform(range($px), k ->
       |   list_sum(list_transform(range(w), j ->
       |     ascii(substr(text, CAST(k*w + j + 1 AS INT), 1))))) AS pixels
       | FROM m),
       |ah AS (
       | SELECT media_id, array_to_string(list_transform(pixels,
       |   p -> CASE WHEN $px*p > list_sum(pixels) THEN '1' ELSE '0' END), '') AS ahash
       | FROM px),
       |bands AS MATERIALIZED (
       | SELECT media_id, ahash, b.band_idx,
       |  substr(ahash, CAST(b.band_idx*16 + 1 AS INT), 16) AS bits
       | FROM ah, (SELECT unnest(range(4)) AS band_idx) b),
       |cand AS MATERIALIZED (
       | SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |  a.ahash AS ah_a, b.ahash AS ah_b
       | FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.bits = b.bits AND a.media_id < b.media_id)
       |SELECT media_a, media_b, hamming FROM (
       | SELECT media_a, media_b,
       |  CAST(list_sum(list_transform(range($px), i ->
       |    CASE WHEN substr(ah_a, CAST(i + 1 AS INT), 1) <> substr(ah_b, CAST(i + 1 AS INT), 1)
       |         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
       | FROM cand)
       |WHERE hamming <= ${graft.sources.MultimodalOps.AHashHammingMax}""".stripMargin
  }

  /** Certificate gate (approx_stats discipline): the oracle re-derives
    * only the engine-independent columns; the rank-envelope booleans
    * are asserted TRUE and a sketch outside its envelope flips one.
    */
  val kllValueQuantiles: String =
    """SELECT event_type, COUNT(*) AS n_rows,
      | TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
      |FROM events GROUP BY event_type""".stripMargin

  val shuffleShards: String =
    s"""SELECT CAST(CAST(concat('0x', substr(k, 1, 2)) AS UBIGINT) % ${graft.operators.TextOps.NShards} AS BIGINT) AS shard,
       | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       | MIN(k) AS first_key, MAX(k) AS last_key
       |FROM (SELECT md5(concat('${graft.operators.TextOps.ShuffleSeed}', CAST(doc_id AS VARCHAR))) AS k, n_chars
       |      FROM documents)
       |GROUP BY 1""".stripMargin

  /** Mirrors SimilarityOps.rpProject: same md5-derived Rademacher
    * signs, same dot/normSq list folds as the ANN oracles, and the
    * same left-associated 16-term d2_proj sum, so every double matches
    * bit-for-bit.
    */
  val rpProject: String = {
    def signList(k: Int): String =
      s"""list_transform(range(${graft.operators.SimilarityOps.Dim}),
         |  j -> CASE WHEN substr(md5('rp${k}_' || CAST(j AS VARCHAR)), 1, 1) <= '7'
         |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)""".stripMargin
    def dotSql(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    def normSqSql(v: String): String =
      s"list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    val rp = graft.operators.SimilarityOps.RpDims
    val yCols = (0 until rp)
      .map(k => s" ${dotSql("embedding", signList(k))} AS y$k")
      .mkString(",\n")
    val d2proj = (0 until rp)
      .map(k => s"(a.y$k - b.y$k) * (a.y$k - b.y$k)")
      .mkString(" + ")
    s"""WITH y AS MATERIALIZED (
       | SELECT vec_id, embedding,
       |$yCols
       | FROM embeddings WHERE vec_id < ${graft.operators.SimilarityOps.RpProbe}),
       |p AS MATERIALIZED (
       | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ((${normSqSql("a.embedding")} + ${normSqSql("b.embedding")}) -
       |    2.0 * ${dotSql("a.embedding", "b.embedding")}) AS d2_orig,
       |  ($d2proj) AS d2_proj
       | FROM y a JOIN y b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, d2_orig, d2_proj, d2_proj / (16.0 * d2_orig) AS ratio
       |FROM p""".stripMargin
  }

  /** Mirrors TextOps.mixWeights: same BPE-ish token regex as
    * seqPacking, integer ppm share, and the one double —
    * sqrt(cell/max) — built from correctly-rounded IEEE division +
    * sqrt so both engines emit the identical bits.
    */
  val mixWeights: String =
    """WITH cells AS MATERIALIZED (
      | SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '[\p{L}]+|[0-9]|[^\p{L}0-9\s]'))) AS BIGINT)
      |    AS cell_tokens
      | FROM documents GROUP BY lang, source),
      |g AS MATERIALIZED (SELECT CAST(SUM(cell_tokens) AS BIGINT) AS total_tokens,
      |             MAX(cell_tokens) AS max_tokens FROM cells)
      |SELECT lang, source, n_docs, cell_tokens,
      | (cell_tokens * 1000000) // total_tokens AS share_ppm,
      | sqrt(CAST(cell_tokens AS DOUBLE) / CAST(max_tokens AS DOUBLE)) AS rel_weight
      |FROM cells, g""".stripMargin

  /** Mirrors TextOps.dsirImportance: same tokenizer, space-joined
    * bigrams, md5 first-byte bucket, exact integer cross-product ppm.
    */
  val dsirImportance: String =
    s"""WITH toks AS MATERIALIZED (
       | SELECT lang,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |bg AS MATERIALIZED (
       | SELECT lang, unnest(list_transform(range(len(toks)-1),
       |   i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)])) AS bg
       | FROM toks),
       |b AS MATERIALIZED (
       | SELECT CAST(CAST(concat('0x', substr(md5(bg), 1, 2)) AS UBIGINT)
       |          % ${graft.operators.TextOps.DsirBuckets} AS BIGINT) AS bucket,
       |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS target_count,
       |  COUNT(*) AS raw_count
       | FROM bg GROUP BY 1),
       |t AS MATERIALIZED (SELECT CAST(SUM(target_count) AS BIGINT) AS t_total,
       |             CAST(SUM(raw_count) AS BIGINT) AS r_total FROM b)
       |SELECT bucket, target_count, raw_count,
       | (target_count * r_total * 1000000) // (raw_count * t_total) AS ratio_ppm
       |FROM b, t""".stripMargin

  /** Mirrors TextOps.langidConfusion: the lang_id oracle's scorer with
    * the true label carried through and the matrix grouped.
    */
  val langidConfusion: String =
    """WITH scored AS MATERIALIZED (
      | SELECT lang,
      |  len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is'))) AS n_en,
      |  len(list_filter(toks, t -> t IN ('el','la','de','los','es','y','que'))) AS n_es,
      |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS n_de,
      |  len(list_filter(toks, t -> t IN ('le','les','et','des','une','est','dans'))) AS n_fr,
      |  len(list_filter(toks, t -> t IN ('de','shi','le','zai','you','wo','ta'))) AS n_zh
      | FROM (SELECT lang,
      |        list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '') AS toks
      |       FROM documents)),
      |p AS MATERIALIZED (
      | SELECT lang,
      |  CASE WHEN n_en >= n_es AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_zh THEN 'en'
      |       WHEN n_es >= n_de AND n_es >= n_fr AND n_es >= n_zh THEN 'es'
      |       WHEN n_de >= n_fr AND n_de >= n_zh THEN 'de'
      |       WHEN n_fr >= n_zh THEN 'fr'
      |       ELSE 'zh' END AS pred_lang
      | FROM scored)
      |SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY 1, 2""".stripMargin

  /** Mirrors TextOps.ngramDiversity: same space-joined n-gram
    * construction as the decontaminate oracle, integer ppm ratio.
    */
  val ngramDiversity: String = {
    def level(n: Int): String =
      s"""SELECT source, CAST($n AS BIGINT) AS n, COUNT(*) AS types,
         | CAST(SUM(c) AS BIGINT) AS tokens,
         | (COUNT(*) * 1000000) // CAST(SUM(c) AS BIGINT) AS ttr_ppm
         |FROM (
         | SELECT source, g, COUNT(*) AS c FROM (
         |  SELECT source, unnest(list_transform(range(len(toks)-${n - 1}),
         |   i -> array_to_string(toks[CAST(i+1 AS INT):CAST(i+$n AS INT)], ' '))) AS g
         |  FROM (SELECT source,
         |         list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
         |        FROM documents))
         | GROUP BY 1, 2)
         |GROUP BY source""".stripMargin
    s"${level(1)}\nUNION ALL\n${level(2)}\nUNION ALL\n${level(3)}"
  }

  /** Mirrors DedupOps.incrementalDedup: same bag-of-words fingerprint,
    * split, and keeper window.
    */
  val incrementalDedup: String =
    """WITH f AS MATERIALIZED (
      | SELECT doc_id, lang,
      |  md5(array_to_string(list_sort(list_distinct(
      |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> ''))), ' ')) AS fp
      | FROM documents),
      |o AS MATERIALIZED (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
      |nn AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 2 = 1),
      |j AS MATERIALIZED (
      | SELECT nn.doc_id, nn.lang, nn.fp, o.fp IS NOT NULL AS in_old,
      |  MIN(nn.doc_id) OVER (PARTITION BY nn.fp) AS keeper
      | FROM nn LEFT JOIN o ON nn.fp = o.fp)
      |SELECT lang,
      | CASE WHEN in_old THEN 'dup_of_old'
      |      WHEN doc_id <> keeper THEN 'dup_in_batch'
      |      ELSE 'fresh' END AS status,
      | COUNT(*) AS n_docs
      |FROM j GROUP BY 1, 2""".stripMargin

  /** Mirrors EventOps.winsorizedStats: same centi-grid bins, integer
    * ceil ranks, exact clamped sums.
    */
  val winsorizedStats: String =
    """WITH b AS MATERIALIZED (
      | SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vb, COUNT(*) AS cnt
      | FROM events GROUP BY 1, 2),
      |c AS MATERIALIZED (
      | SELECT event_type, vb, cnt,
      |  SUM(cnt) OVER (PARTITION BY event_type ORDER BY vb ROWS UNBOUNDED PRECEDING) AS cum,
      |  CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      | FROM b),
      |k AS (
      | SELECT event_type, n,
      |  MIN(CASE WHEN cum >= (n * 5 + 99) // 100 THEN vb END) AS p05_c,
      |  MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN vb END) AS p95_c
      | FROM c GROUP BY 1, 2),
      |f AS MATERIALIZED (
      | SELECT b.event_type, n, p05_c, p95_c,
      |  CAST(SUM(vb * cnt) AS BIGINT) AS sum_c,
      |  CAST(SUM(greatest(least(vb, p95_c), p05_c) * cnt) AS BIGINT) AS wsum_c
      | FROM b JOIN k USING (event_type) GROUP BY 1, 2, 3, 4)
      |SELECT event_type, n AS n_events,
      | CAST(p05_c AS DOUBLE) / 100.0 AS p05,
      | CAST(p95_c AS DOUBLE) / 100.0 AS p95,
      | CAST(sum_c AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_binned,
      | CAST(wsum_c AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_winsorized
      |FROM f""".stripMargin

  /** Mirrors EventOps.quantileNormalize: same centi-bins, ceil-rank
    * cross products, and union+window as-of bin lookup (marker vbs
    * ascend with position, so MIN over the following frame is the
    * first covering bin on both engines).
    */
  val quantileNormalize: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vb FROM events),
      |sb AS (SELECT event_type, vb, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
      |src AS (
      | SELECT event_type, vb, cnt,
      |  SUM(cnt) OVER (PARTITION BY event_type ORDER BY vb ROWS UNBOUNDED PRECEDING) AS cum,
      |  CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_t
      | FROM sb),
      |gb AS (SELECT vb, COUNT(*) AS gcnt FROM ev GROUP BY 1),
      |mk AS (
      | SELECT CAST(SUM(gcnt) OVER (ORDER BY vb ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos,
      |  CAST(0 AS BIGINT) AS is_src, vb AS gvb,
      |  CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS svb,
      |  CAST(NULL AS BIGINT) AS cnt
      | FROM gb),
      |nt AS (SELECT COUNT(*) AS n_total FROM ev),
      |pr AS (
      | SELECT CAST((cum * n_total + n_t - 1) // n_t AS BIGINT) AS pos,
      |  CAST(1 AS BIGINT) AS is_src, CAST(NULL AS BIGINT) AS gvb,
      |  event_type, vb AS svb, cnt
      | FROM src, nt),
      |u AS (
      | SELECT *, MIN(CASE WHEN is_src = 0 THEN gvb END) OVER
      |   (ORDER BY pos ASC, is_src DESC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |   AS mapped
      | FROM (SELECT * FROM mk UNION ALL SELECT * FROM pr))
      |SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_events,
      | CAST(SUM(svb * cnt) AS BIGINT) AS raw_c,
      | CAST(SUM(mapped * cnt) AS BIGINT) AS mapped_c,
      | CAST(SUM(mapped * cnt) - SUM(svb * cnt) AS BIGINT) AS shift_c,
      | CAST(CAST(SUM(svb * cnt) AS BIGINT) AS DOUBLE) /
      |   (CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) * 100.0) AS mean_raw,
      | CAST(CAST(SUM(mapped * cnt) AS BIGINT) AS DOUBLE) /
      |   (CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) * 100.0) AS mean_mapped
      |FROM u WHERE is_src = 1 GROUP BY 1""".stripMargin

  /** Mirrors EventOps.valueOutliers: decimal-exact moments (VARCHAR-
    * mediated decimal→double), identical mean/std/z expression order.
    */
  val valueOutliers: String =
    """WITH m AS MATERIALIZED (
      | SELECT event_type, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s,
      |  CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s2
      | FROM events GROUP BY 1),
      |mm AS (
      | SELECT event_type, s / CAST(n AS DOUBLE) AS mean,
      |  sqrt(s2 / CAST(n AS DOUBLE) -
      |       (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS std
      | FROM m)
      |SELECT event_id, event_type, value, (value - mean) / std AS z
      |FROM events JOIN mm USING (event_type)
      |ORDER BY abs((value - mean) / std) DESC, event_id ASC LIMIT 25""".stripMargin

  /** Mirrors RelationalOps.tableChecksum: same canonical row strings,
    * same 60-bit md5 hash, same xor/modular-sum folds (both
    * commutative, so partitioning never matters).
    */
  val tableChecksum: String = {
    def h(s: String): String =
      s"CAST(CAST(concat('0x', substr(md5($s), 1, 15)) AS UBIGINT) AS BIGINT)"
    def one(name: String, table: String, canon: String): String =
      s"""SELECT '$name' AS tbl, COUNT(*) AS n_rows,
         | bit_xor(h) AS xor_fp, CAST(SUM(h % 1000000000) AS BIGINT) AS sum_fp
         |FROM (SELECT ${h("c")} AS h
         |      FROM (SELECT $canon AS c FROM $table))""".stripMargin
    val li = """concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR),
      | CAST(l_suppkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      | CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR),
      | CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR),
      | CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR),
      | CAST(CAST(round(l_tax * 100) AS BIGINT) AS VARCHAR),
      | l_returnflag, l_linestatus,
      | CAST(CAST(epoch(l_shipdate) AS BIGINT) AS VARCHAR))""".stripMargin
    val o = """concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
      | o_orderstatus,
      | CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
      | CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR), o_orderpriority)""".stripMargin
    val d = """concat_ws('|', CAST(doc_id AS VARCHAR), md5(text), lang, source,
      | CAST(n_chars AS VARCHAR))""".stripMargin
    s"""${one("lineitem", "lineitem", li)}
       |UNION ALL
       |${one("orders", "orders", o)}
       |UNION ALL
       |${one("documents", "documents", d)}""".stripMargin
  }

  /** Mirrors TextOps.bm25TopK: same rational idf, same parenthesized
    * IEEE evaluation order for every double, per-term columns summed
    * left-associated.
    */
  val bm25TopK: String = {
    val terms = graft.operators.TextOps.Bm25Terms
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val ptCols = terms
      .map(t => s"  COALESCE(MAX(CASE WHEN term = '$t' THEN s END), 0.0) AS s_$t")
      .mkString(",\n")
    val scoreSum = terms.map(t => s"s_$t").mkString(" + ")
    s"""WITH d AS MATERIALIZED (
       | SELECT doc_id,
       |  list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), t -> t <> '') AS toks
       | FROM documents),
       |dlt AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
       |g AS MATERIALIZED (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dlt),
       |p AS MATERIALIZED (
       | SELECT doc_id, dl, term, COUNT(*) AS tf
       | FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dlt)
       | WHERE term IN ($inList)
       | GROUP BY doc_id, dl, term),
       |f AS MATERIALIZED (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
       |s AS MATERIALIZED (
       | SELECT doc_id, dl, term,
       |  (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |    * (CAST(tf AS DOUBLE) * 2.2))
       |  / (CAST(tf AS DOUBLE) +
       |     1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) /
       |                   (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS s
       | FROM p JOIN f USING (term), g),
       |pt AS (
       | SELECT doc_id, dl,
       |$ptCols
       | FROM s GROUP BY doc_id, dl)
       |SELECT doc_id, dl, ${terms.map(t => s"s_$t").mkString(", ")}, $scoreSum AS score
       |FROM pt
       |ORDER BY score DESC, doc_id ASC LIMIT ${graft.operators.TextOps.Bm25TopK}""".stripMargin
  }

  /** Mirrors TextOps.compactionPlan: ceil-division file counts in
    * pure BIGINT math.
    */
  val compactionPlan: String = {
    val t = graft.operators.TextOps.CompactTargetBytes
    s"""WITH c AS MATERIALIZED (
       | SELECT source, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS cell_bytes,
       |  MAX(n_chars) AS max_doc_bytes
       | FROM documents GROUP BY source, lang)
       |SELECT source, lang, n_docs, cell_bytes,
       | (cell_bytes + ${t - 1L}) // $t AS n_files,
       | cell_bytes // ((cell_bytes + ${t - 1L}) // $t) AS avg_file_bytes,
       | max_doc_bytes
       |FROM c""".stripMargin
  }

  val freqSpectrum: String =
    """WITH wc AS MATERIALIZED (
      | SELECT t AS word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '')) AS t
      |  FROM documents)
      | GROUP BY t)
      |SELECT CAST(length(bin(cnt)) AS BIGINT) AS band, COUNT(*) AS n_types,
      | CAST(SUM(cnt) AS BIGINT) AS n_tokens, MIN(cnt) AS min_cnt, MAX(cnt) AS max_cnt
      |FROM wc GROUP BY 1""".stripMargin

  /** Mirrors DedupOps.containmentPairs: same rare-shingle candidate
    * screen as ngramJaccard (corpus-relative df cap, containment-0.7
    * admission over the rare-projected sets), full-set verify with
    * containment = shared/min and the diluted jaccard alongside.
    */
  val containmentPairs: String =
    s"""WITH ${Oracles2.shinglesCte},
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
       | WHERE n_shared >= GREATEST(3, CAST(ceil(LEAST(ra.n_rare, rb.n_rare) * 0.7) AS BIGINT))),
       |v AS MATERIALIZED (
       | SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS n_shared,
       |  CAST(len(sa.shingles) AS BIGINT) AS na, CAST(len(sb.shingles) AS BIGINT) AS nb
       | FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
       |SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS doc_small,
       | CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS doc_big,
       | LEAST(na, nb) AS n_small, GREATEST(na, nb) AS n_big, n_shared,
       | CAST(n_shared AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) AS containment,
       | CAST(n_shared AS DOUBLE) / CAST(na + nb - n_shared AS DOUBLE) AS jaccard
       |FROM v WHERE CAST(n_shared AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) >= 0.7""".stripMargin

  /** Mirrors EventOps.intervalCoverage: distinct floor-second starts,
    * fixed 3600 s half-open intervals, running-max-end island
    * detection (touching merges), floor-div utilization.
    */
  val intervalCoverage: String =
    """WITH iv AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 1000000 AS s, COUNT(*) AS cnt
      | FROM events GROUP BY 1, 2),
      |m AS MATERIALIZED (
      | SELECT event_type, s, s + 3600 AS e, cnt,
      |  MAX(s + 3600) OVER (PARTITION BY event_type ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      | FROM iv),
      |isl AS (
      | SELECT *, SUM(CASE WHEN prev_end IS NULL OR s > prev_end THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY event_type ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
      | FROM m),
      |pi AS (
      | SELECT event_type, island, MIN(s) AS i_start, MAX(e) AS i_end,
      |  CAST(SUM(cnt) AS BIGINT) AS n_ev
      | FROM isl GROUP BY 1, 2)
      |SELECT event_type, CAST(SUM(i_end - i_start) AS BIGINT) AS covered_s,
      | COUNT(*) AS n_islands, CAST(SUM(n_ev) AS BIGINT) AS n_events,
      | MIN(i_start) AS first_s, MAX(i_end) AS last_s,
      | CAST(SUM(i_end - i_start) AS BIGINT) * 1000000 // (MAX(i_end) - MIN(i_start))
      |   AS utilization_ppm
      |FROM pi GROUP BY 1""".stripMargin

  /** Mirrors RelationalOps.skylineOrders: per-day champion (max
    * centi-price, min orderkey) then strict-prior running-max
    * staircase; integer price compares throughout.
    */
  val skylineOrders: String =
    """WITH ord AS (
      | SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
      |  o_totalprice
      | FROM orders),
      |ch AS MATERIALIZED (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderdate_epoch
      |   ORDER BY price_c DESC, o_orderkey ASC) AS rn
      | FROM ord),
      |st AS MATERIALIZED (
      | SELECT o_orderdate_epoch, o_orderkey, o_totalprice, price_c,
      |  MAX(price_c) OVER (ORDER BY o_orderdate_epoch
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      | FROM ch WHERE rn = 1)
      |SELECT o_orderdate_epoch, o_orderkey, o_totalprice, price_c
      |FROM st WHERE prev_max IS NULL OR price_c > prev_max""".stripMargin

  /** Mirrors TextOps.vocabOverlap: distinct (source, token) sets via
    * the shared non-letter-boundary tokenizer, pairwise shared counts,
    * one exact-long division per pair.
    */
  val vocabOverlap: String =
    """WITH v AS MATERIALIZED (
      | SELECT DISTINCT source, word FROM (
      |  SELECT source, unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      |  FROM documents)
      | WHERE word <> ''),
      |s AS MATERIALIZED (SELECT source, COUNT(*) AS n_vocab FROM v GROUP BY 1),
      |p AS MATERIALIZED (
      | SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
      | FROM v a JOIN v b ON a.word = b.word AND a.source < b.source
      | GROUP BY 1, 2)
      |SELECT source_a, source_b, n_shared, sa.n_vocab AS na, sb.n_vocab AS nb,
      | CAST(n_shared AS DOUBLE) / CAST(sa.n_vocab + sb.n_vocab - n_shared AS DOUBLE)
      |   AS jaccard
      |FROM p
      |JOIN s sa ON sa.source = p.source_a
      |JOIN s sb ON sb.source = p.source_b""".stripMargin

  /** Mirrors EventOps.valueTrend: per-type recentered epoch seconds,
    * exact DECIMAL moment sums (VARCHAR-mediated double casts), then
    * the identical IEEE slope/intercept/r² expressions.
    */
  val valueTrend: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 1000000 AS s,
      |  CAST(value AS DECIMAL(18,2)) AS v
      | FROM events),
      |based AS (
      | SELECT event_type, v,
      |  s - MIN(s) OVER (PARTITION BY event_type) AS t
      | FROM ev),
      |m AS MATERIALIZED (
      | SELECT event_type, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(t AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_t,
      |  CAST(CAST(SUM(CAST(v AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_v,
      |  CAST(CAST(SUM(CAST(t * v AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_tv,
      |  CAST(CAST(SUM(CAST(t * t AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_t2,
      |  CAST(CAST(SUM(CAST(v * v AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_v2
      | FROM based GROUP BY 1)
      |SELECT event_type, n, sum_t, sum_v, sum_tv, sum_t2, sum_v2,
      | (CAST(n AS DOUBLE) * sum_tv - sum_t * sum_v)
      |   / (CAST(n AS DOUBLE) * sum_t2 - sum_t * sum_t) * 86400.0 AS slope_per_day,
      | (sum_v - (CAST(n AS DOUBLE) * sum_tv - sum_t * sum_v)
      |   / (CAST(n AS DOUBLE) * sum_t2 - sum_t * sum_t) * sum_t) / CAST(n AS DOUBLE)
      |   AS icept,
      | (CAST(n AS DOUBLE) * sum_tv - sum_t * sum_v)
      |   * (CAST(n AS DOUBLE) * sum_tv - sum_t * sum_v)
      |   / ((CAST(n AS DOUBLE) * sum_t2 - sum_t * sum_t)
      |      * (CAST(n AS DOUBLE) * sum_v2 - sum_v * sum_v)) AS r2
      |FROM m""".stripMargin

  /** Mirrors EventOps.cusumChangepoint: time-ordered running sums,
    * D_k = n·S_k − k·S_n in exact centi-integers, earliest-k argmax,
    * IEEE before/after means from exact decimal sums.
    */
  val cusumChangepoint: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) AS ts_us, event_id,
      |  CAST(value AS DECIMAL(18,2)) AS v
      | FROM events),
      |c AS MATERIALIZED (
      | SELECT event_type, ts_us, event_id, v,
      |  SUM(v) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS cum,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts_us, event_id) AS k,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n,
      |  SUM(v) OVER (PARTITION BY event_type) AS sum_v
      | FROM ev),
      |d AS MATERIALIZED (
      | SELECT *, CAST(ABS((n * cum - k * sum_v) * 100) AS BIGINT) AS d_c FROM c),
      |r AS MATERIALIZED (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |   ORDER BY d_c DESC, k ASC) AS rnk
      | FROM d)
      |SELECT event_type, n, k AS k_star, ts_us, d_c AS d_max_c,
      | CAST(CAST(cum AS VARCHAR) AS DOUBLE) / CAST(k AS DOUBLE) AS mean_before,
      | CAST(CAST(sum_v - cum AS VARCHAR) AS DOUBLE) / CAST(n - k AS DOUBLE)
      |   AS mean_after
      |FROM r WHERE rnk = 1""".stripMargin

  /** Mirrors EventOps.bitmapOverlap: 63-packed user bitmaps per
    * (type, block), bit_or merge, AND+popcount intersection, exact
    * long division for the jaccard.
    */
  val bitmapOverlap: String =
    """WITH bm AS MATERIALIZED (
      | SELECT event_type, user_id // 63 AS block,
      |  bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
      | FROM events GROUP BY 1, 2),
      |s AS MATERIALIZED (
      | SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users
      | FROM bm GROUP BY 1),
      |p AS MATERIALIZED (
      | SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
      | FROM bm a JOIN bm b ON a.block = b.block AND a.event_type < b.event_type
      | GROUP BY 1, 2)
      |SELECT type_a, type_b, sa.n_users AS users_a, sb.n_users AS users_b, n_both,
      | CAST(n_both AS DOUBLE) / CAST(sa.n_users + sb.n_users - n_both AS DOUBLE)
      |   AS jaccard
      |FROM p
      |JOIN s sa ON sa.event_type = p.type_a
      |JOIN s sb ON sb.event_type = p.type_b""".stripMargin

  /** Mirrors EventOps.rollingMedian7d: centi-integer daily sums, ROWS
    * 6 PRECEDING frame, doubled median so the even case stays integer.
    */
  val rollingMedian7d: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS day_c,
      |  COUNT(*) AS n_events
      | FROM events GROUP BY 1, 2),
      |win AS (
      | SELECT event_type, day, n_events, day_c,
      |  list_sort(list(day_c) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
      | FROM daily)
      |SELECT event_type, day, n_events, day_c,
      | CAST(len(arr) AS BIGINT) AS win_days,
      | CAST(CASE WHEN len(arr) % 2 = 1 THEN 2 * arr[(len(arr) + 1) // 2]
      |      ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1] END AS BIGINT)
      |   AS med2_c
      |FROM win""".stripMargin

  /** Mirrors RelationalOps.benfordProfile: leading digit of the
    * centi-unit decimal string, floor-div ppm, and the SAME
    * precomputed Benford constants (no log at query time).
    */
  val benfordProfile: String = {
    val cases = graft.operators.RelationalOps.BenfordPpm
      .map { case (d, ppm) => s"WHEN $d THEN ${ppm}" }
      .mkString(" ")
    s"""WITH d AS MATERIALIZED (
       | SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |   AS VARCHAR), 1, 1) AS BIGINT) AS digit
       | FROM orders),
       |g AS MATERIALIZED (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
       |t AS MATERIALIZED (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
       |SELECT digit, n, n * 1000000 // total AS observed_ppm,
       | CAST(CASE digit $cases END AS BIGINT) AS benford_ppm,
       | n * 1000000 // total - CAST(CASE digit $cases END AS BIGINT) AS delta_ppm
       |FROM g, t""".stripMargin
  }

  /** Mirrors EventOps.eventTrigrams: two leads within user order,
    * exact counts, floor-div ppm share, lexicographic tie-break cut.
    */
  val eventTrigrams: String =
    """WITH ev AS MATERIALIZED (
      | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type AS t1
      | FROM events),
      |tri AS (
      | SELECT t1,
      |  LEAD(t1, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS t2,
      |  LEAD(t1, 2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS t3
      | FROM ev),
      |g AS MATERIALIZED (
      | SELECT t1, t2, t3, COUNT(*) AS cnt FROM tri
      | WHERE t3 IS NOT NULL GROUP BY 1, 2, 3),
      |t AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM g)
      |SELECT t1, t2, t3, cnt, cnt * 1000000 // total AS share_ppm
      |FROM g, t
      |ORDER BY cnt DESC, t1 ASC, t2 ASC, t3 ASC
      |LIMIT 20""".stripMargin

  /** Mirrors EventOps.dailyAutocorr: centi-integer daily sums, one
    * lead per type, decimal-first Pearson moments, identical IEEE r.
    */
  val dailyAutocorr: String =
    """WITH daily AS MATERIALIZED (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      | FROM events GROUP BY 1, 2),
      |p AS MATERIALIZED (
      | SELECT event_type, x,
      |  LEAD(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS y
      | FROM daily),
      |m AS MATERIALIZED (
      | SELECT event_type, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_x,
      |  CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_y,
      |  CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sum_xy,
      |  CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sum_x2,
      |  CAST(CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sum_y2
      | FROM p WHERE y IS NOT NULL GROUP BY 1)
      |SELECT event_type, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
      | (CAST(n AS DOUBLE) * sum_xy - sum_x * sum_y)
      |   / (sqrt(CAST(n AS DOUBLE) * sum_x2 - sum_x * sum_x)
      |      * sqrt(CAST(n AS DOUBLE) * sum_y2 - sum_y * sum_y)) AS corr_lag1
      |FROM m""".stripMargin

  /** Mirrors EventOps.activityGini: stable (count, user_id) ranks,
    * decimal-exact Σ i·xᵢ, identical IEEE rank-formula G.
    */
  val activityGini: String =
    """WITH c AS MATERIALIZED (
      | SELECT event_type, user_id, COUNT(*) AS x FROM events GROUP BY 1, 2),
      |r AS MATERIALIZED (
      | SELECT event_type, x, user_id,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x ASC, user_id ASC) AS i
      | FROM c),
      |m AS MATERIALIZED (
      | SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sum_x,
      |  CAST(MAX(x) AS BIGINT) AS max_x,
      |  CAST(CAST(SUM(CAST(i AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
      |    AS VARCHAR) AS DOUBLE) AS sum_ix
      | FROM r GROUP BY 1)
      |SELECT event_type, n, sum_x, max_x, sum_ix,
      | 2.0 * sum_ix / (CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE))
      |  - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
      |FROM m""".stripMargin

  /** Mirrors EventOps.weekdayProfile: (epoch_day + 4) mod 7 weekday,
    * floor-div ppm share, deterministic (count desc, weekday asc) peak.
    */
  val weekdayProfile: String =
    """WITH e AS MATERIALIZED (
      | SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS weekday,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
      | FROM events),
      |g AS MATERIALIZED (
      | SELECT event_type, weekday, COUNT(*) AS n, CAST(SUM(v_c) AS BIGINT) AS sum_c
      | FROM e GROUP BY 1, 2),
      |w AS MATERIALIZED (
      | SELECT *, CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_n,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, weekday ASC) AS rn
      | FROM g)
      |SELECT event_type, weekday, n, sum_c,
      | n * 1000000 // type_n AS share_ppm, rn = 1 AS is_peak
      |FROM w""".stripMargin

  /** Mirrors EventOps.fanoFactor: hour-span n (zero hours enter via
    * the span), decimal-first Σc², identical IEEE dispersion ratio.
    */
  val fanoFactor: String =
    """WITH h AS (
      | SELECT event_type, epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS c
      | FROM events GROUP BY 1, 2),
      |m AS MATERIALIZED (
      | SELECT event_type, COUNT(*) AS n_obs_hours,
      |  MAX(hour) - MIN(hour) + 1 AS n_hours,
      |  CAST(SUM(c) AS BIGINT) AS sum_c,
      |  CAST(CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
      |    AS VARCHAR) AS DOUBLE) AS sum_c2
      | FROM h GROUP BY 1)
      |SELECT event_type, n_obs_hours, n_hours, sum_c, sum_c2,
      | (CAST(n_hours AS DOUBLE) * sum_c2
      |   - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))
      |  / (CAST(n_hours AS DOUBLE) * CAST(sum_c AS DOUBLE)) AS fano
      |FROM m""".stripMargin

  /** Mirrors TextOps.charClassProfile: length deltas after class
    * removal (same RE2 classes), floor-div ppm.
    */
  val charClassProfile: String =
    """WITH d AS MATERIALIZED (
      | SELECT source, length(text) AS len,
      |  length(text) - length(regexp_replace(text, '\p{L}', '', 'g')) AS nl,
      |  length(text) - length(regexp_replace(text, '\s', '', 'g')) AS ns
      | FROM documents),
      |g AS MATERIALIZED (
      | SELECT source, COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS n_chars,
      |  CAST(SUM(nl) AS BIGINT) AS n_letters, CAST(SUM(ns) AS BIGINT) AS n_spaces,
      |  CAST(SUM(len - nl - ns) AS BIGINT) AS n_other
      | FROM d GROUP BY 1)
      |SELECT source, n_docs, n_chars, n_letters, n_spaces, n_other,
      | n_letters * 1000000 // n_chars AS letter_ppm,
      | n_spaces * 1000000 // n_chars AS space_ppm,
      | n_other * 1000000 // n_chars AS other_ppm
      |FROM g""".stripMargin

  /** Mirrors EventOps.madRobust: quantile_cont medians over
    * centi-integers (.0/.5 doubles — bit-stable), exact deviations,
    * identical literal threshold product.
    */
  val madRobust: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
      | FROM events),
      |med AS MATERIALIZED (
      | SELECT event_type, quantile_cont(v_c, 0.5) AS med_c, COUNT(*) AS n
      | FROM ev GROUP BY 1),
      |mads AS (
      | SELECT ev.event_type, quantile_cont(abs(CAST(v_c AS DOUBLE) - med_c), 0.5) AS mad_c
      | FROM ev JOIN med USING (event_type) GROUP BY 1)
      |SELECT ev.event_type, med.n, med.med_c, mads.mad_c,
      | CAST(SUM(CASE WHEN abs(CAST(v_c AS DOUBLE) - med.med_c)
      |                    > 3.0 * 1.4826 * mads.mad_c THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_out3
      |FROM ev JOIN med USING (event_type) JOIN mads USING (event_type)
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** Mirrors EventOps.ksDrift: per-type CDFs at centi-value bins,
    * cross-multiplied to the n_a·n_b denominator (decimal-exact),
    * forward-filled union of jump points, earliest-bin argmax.
    */
  val ksDrift: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vb FROM events),
      |bins AS MATERIALIZED (SELECT event_type, vb, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
      |c AS MATERIALIZED (
      | SELECT event_type, vb, SUM(cnt) OVER (PARTITION BY event_type ORDER BY vb
      |   ROWS UNBOUNDED PRECEDING) AS cum
      | FROM bins),
      |t AS MATERIALIZED (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1),
      |p AS MATERIALIZED (
      | SELECT a.event_type AS type_a, a.n AS n_a, b.event_type AS type_b, b.n AS n_b
      | FROM t a JOIN t b ON a.event_type < b.event_type),
      |u AS (
      | SELECT p.type_a, p.type_b, p.n_a, p.n_b, c.vb, c.cum AS ca,
      |  CAST(NULL AS BIGINT) AS cb
      | FROM c JOIN p ON c.event_type = p.type_a
      | UNION ALL
      | SELECT p.type_a, p.type_b, p.n_a, p.n_b, c.vb, CAST(NULL AS BIGINT), c.cum
      | FROM c JOIN p ON c.event_type = p.type_b),
      |g AS MATERIALIZED (
      | SELECT type_a, type_b, n_a, n_b, vb,
      |  MAX(ca) AS ca, MAX(cb) AS cb
      | FROM u GROUP BY 1, 2, 3, 4, 5),
      |f AS MATERIALIZED (
      | SELECT *, COALESCE(last_value(ca IGNORE NULLS) OVER w, 0) AS ca_ff,
      |  COALESCE(last_value(cb IGNORE NULLS) OVER w, 0) AS cb_ff
      | FROM g
      | WINDOW w AS (PARTITION BY type_a, type_b ORDER BY vb ROWS UNBOUNDED PRECEDING)),
      |d AS MATERIALIZED (
      | SELECT *, CAST(ABS(CAST(ca_ff AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
      |   - CAST(cb_ff AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))) AS BIGINT)
      |   AS d_scaled
      | FROM f),
      |r AS MATERIALIZED (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b
      |   ORDER BY d_scaled DESC, vb ASC) AS rnk
      | FROM d)
      |SELECT type_a, type_b, n_a, n_b, vb AS vb_star, d_scaled,
      | CAST(d_scaled AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
      |FROM r WHERE rnk = 1""".stripMargin

  /** Mirrors TextOps.hapaxRatio: shared tokenizer, exact legomena
    * counts, decimal Simpson numerator, floor-div ppm, IEEE division.
    */
  val hapaxRatio: String =
    """WITH w AS MATERIALIZED (
      | SELECT source, word FROM (
      |  SELECT source, unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      |  FROM documents)
      | WHERE word <> ''),
      |c AS MATERIALIZED (SELECT source, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
      |g AS MATERIALIZED (
      | SELECT source, COUNT(*) AS vocab, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
      |  CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt - 1 AS DECIMAL(19,0)))
      |    AS BIGINT) AS simpson_num
      | FROM c GROUP BY 1)
      |SELECT source, vocab, n_tokens, n_hapax, n_dis,
      | n_hapax * 1000000 // vocab AS hapax_vocab_ppm,
      | n_hapax * 1000000 // n_tokens AS hapax_mass_ppm,
      | simpson_num,
      | CAST(simpson_num AS DOUBLE)
      |  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)) AS simpson_d
      |FROM g""".stripMargin

  /** Mirrors TextOps.rankAgreement: tie-broken strict permutations,
    * exact concordance counts, tau-a as one IEEE division.
    */
  val rankAgreement: String =
    """WITH w AS MATERIALIZED (
      | SELECT source, word FROM (
      |  SELECT source, unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      |  FROM documents)
      | WHERE word <> ''),
      |m AS MATERIALIZED (
      | SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab
      | FROM w GROUP BY 1),
      |r AS MATERIALIZED (
      | SELECT source,
      |  ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source ASC) AS r_mass,
      |  ROW_NUMBER() OVER (ORDER BY vocab DESC, source ASC) AS r_vocab
      | FROM m),
      |p AS MATERIALIZED (
      | SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN (a.r_mass - b.r_mass) * (a.r_vocab - b.r_vocab) > 0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS concordant
      | FROM r a JOIN r b ON a.source < b.source)
      |SELECT (SELECT COUNT(*) FROM m) AS n_items, n_pairs, concordant,
      | n_pairs - concordant AS discordant,
      | CAST(concordant - (n_pairs - concordant) AS DOUBLE) / CAST(n_pairs AS DOUBLE)
      |   AS kendall_tau
      |FROM p""".stripMargin

  /** Mirrors RelationalOps.equidepthHist: NTILE over the strict
    * (centi-price, orderkey) order, integer per-bucket stats.
    */
  val equidepthHist: String =
    """WITH o AS MATERIALIZED (
      | SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      | FROM orders),
      |b AS MATERIALIZED (
      | SELECT price_c,
      |  NTILE(10) OVER (ORDER BY price_c ASC, o_orderkey ASC) AS bucket
      | FROM o)
      |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
      | MIN(price_c) AS lo_c, MAX(price_c) AS hi_c,
      | CAST(SUM(price_c) AS BIGINT) AS sum_c
      |FROM b GROUP BY 1""".stripMargin

  /** Mirrors EventOps.wowGrowth: fixed 7-day epoch blocks, one lag,
    * exact integer delta, IEEE growth ratio, first week dropped.
    */
  val wowGrowth: String =
    """WITH weekly AS (
      | SELECT event_type, epoch_us(ts) // 604800000000 AS week,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_c,
      |  COUNT(*) AS n_events
      | FROM events GROUP BY 1, 2),
      |l AS (
      | SELECT *, LAG(sum_c, 1) OVER (PARTITION BY event_type ORDER BY week)
      |   AS prev_c
      | FROM weekly)
      |SELECT event_type, week, n_events, sum_c, prev_c,
      | sum_c - prev_c AS delta_c,
      | CAST(sum_c - prev_c AS DOUBLE) / CAST(prev_c AS DOUBLE) AS growth
      |FROM l WHERE prev_c IS NOT NULL""".stripMargin

  /** Mirrors EventOps.valueStreaks: gaps-and-islands runs per user,
    * per-user best, corpus summary + lowest-user champion.
    */
  val valueStreaks: String =
    """WITH ev AS MATERIALIZED (
      | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
      | FROM events),
      |m AS MATERIALIZED (
      | SELECT user_id, ts_us, event_id, v_c,
      |  LAG(v_c, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_v
      | FROM ev),
      |i AS (
      | SELECT user_id,
      |  SUM(CASE WHEN prev_v IS NULL OR v_c <= prev_v THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |          ROWS UNBOUNDED PRECEDING) AS run_id
      | FROM m),
      |runs AS (SELECT user_id, run_id, COUNT(*) AS len FROM i GROUP BY 1, 2),
      |pu AS MATERIALIZED (
      | SELECT user_id, MAX(len) AS best, COUNT(*) AS n_runs FROM runs GROUP BY 1),
      |s AS MATERIALIZED (
      | SELECT COUNT(*) AS n_users, CAST(MAX(best) AS BIGINT) AS max_streak,
      |  CAST(SUM(CASE WHEN best >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_streak3,
      |  CAST(SUM(n_runs) AS BIGINT) AS n_runs
      | FROM pu),
      |c AS MATERIALIZED (
      | SELECT user_id AS champion_user FROM pu
      | ORDER BY best DESC, user_id ASC LIMIT 1)
      |SELECT * FROM s, c""".stripMargin

  /** Mirrors EventOps.firstTouch: row_number-1 per user, floor-div
    * ppm of all users.
    */
  val firstTouch: String =
    """WITH f AS MATERIALIZED (
      | SELECT user_id, event_type,
      |  ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id) AS rn
      | FROM events),
      |g AS MATERIALIZED (
      | SELECT event_type, COUNT(*) AS n_users FROM f WHERE rn = 1 GROUP BY 1),
      |t AS MATERIALIZED (SELECT CAST(SUM(n_users) AS BIGINT) AS total FROM g)
      |SELECT event_type, n_users, n_users * 1000000 // total AS share_ppm
      |FROM g, t""".stripMargin

  /** Mirrors EventOps.gapQuantiles: one lag per (type, user), exact
    * integer µs gaps, quantile_cont percentiles.
    */
  val gapQuantiles: String =
    """WITH ev AS MATERIALIZED (
      | SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |g AS MATERIALIZED (
      | SELECT event_type,
      |  ts_us - LAG(ts_us, 1) OVER (PARTITION BY event_type, user_id
      |    ORDER BY ts_us, event_id) AS gap_us
      | FROM ev)
      |SELECT event_type, COUNT(*) AS n_gaps,
      | quantile_cont(gap_us, 0.5) AS p50_us,
      | quantile_cont(gap_us, 0.95) AS p95_us,
      | MIN(gap_us) AS min_us, MAX(gap_us) AS max_us
      |FROM g WHERE gap_us IS NOT NULL GROUP BY 1""".stripMargin

  /** Mirrors RelationalOps.clvDeciles: per-customer exact centi-sums,
    * NTILE-10 over the strict (clv, custkey) order, ppm mass shares.
    */
  val clvDeciles: String =
    """WITH clv AS (
      | SELECT o_custkey,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS clv_c,
      |  COUNT(*) AS n_orders
      | FROM orders GROUP BY 1),
      |t AS MATERIALIZED (
      | SELECT clv_c, n_orders,
      |  NTILE(10) OVER (ORDER BY clv_c ASC, o_custkey ASC) AS decile
      | FROM clv),
      |g AS MATERIALIZED (
      | SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_customers,
      |  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
      |  MIN(clv_c) AS lo_c, MAX(clv_c) AS hi_c,
      |  CAST(SUM(clv_c) AS BIGINT) AS mass_c
      | FROM t GROUP BY 1),
      |tt AS (SELECT CAST(SUM(mass_c) AS BIGINT) AS total_c FROM g)
      |SELECT decile, n_customers, n_orders, lo_c, hi_c, mass_c,
      | mass_c * 1000000 // total_c AS mass_ppm
      |FROM g, tt""".stripMargin

  /** Mirrors RelationalOps.returnLift: exact cross-multiplied
    * contingency deltas, one IEEE lift division.
    */
  val returnLift: String =
    """WITH cells AS MATERIALIZED (
      | SELECT p_brand, l_returnflag, COUNT(*) AS o
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | GROUP BY 1, 2),
      |r AS MATERIALIZED (SELECT p_brand, CAST(SUM(o) AS BIGINT) AS row_total FROM cells GROUP BY 1),
      |c AS MATERIALIZED (SELECT l_returnflag, CAST(SUM(o) AS BIGINT) AS col_total FROM cells GROUP BY 1),
      |g AS MATERIALIZED (SELECT CAST(SUM(o) AS BIGINT) AS grand FROM cells)
      |SELECT p_brand, l_returnflag, o, row_total, col_total,
      | CAST(CAST(o AS DECIMAL(19,0)) * CAST(grand AS DECIMAL(19,0))
      |  - CAST(row_total AS DECIMAL(19,0)) * CAST(col_total AS DECIMAL(19,0))
      |  AS BIGINT) AS delta_scaled,
      | (CAST(o AS DOUBLE) * CAST(grand AS DOUBLE))
      |  / (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)) AS lift
      |FROM cells JOIN r USING (p_brand) JOIN c USING (l_returnflag), g""".stripMargin

  /** Mirrors RelationalOps.copurchaseLift: distinct (order, part)
    * lines, bounded self-join pairs, deterministic top-20, IEEE lift.
    */
  val copurchaseLift: String =
    """WITH lines AS MATERIALIZED (
      | SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS MATERIALIZED (
      | SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS co
      | FROM lines a JOIN lines b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      | GROUP BY 1, 2),
      |f AS MATERIALIZED (SELECT l_partkey, COUNT(*) AS f FROM lines GROUP BY 1),
      |n AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lines)
      |SELECT part_a, part_b, co, fa.f AS f_a, fb.f AS f_b,
      | (CAST(co AS DOUBLE) * CAST(n_orders AS DOUBLE))
      |  / (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)) AS lift
      |FROM p
      |JOIN f fa ON fa.l_partkey = p.part_a
      |JOIN f fb ON fb.l_partkey = p.part_b, n
      |ORDER BY co DESC, part_a ASC, part_b ASC
      |LIMIT 20""".stripMargin
}
