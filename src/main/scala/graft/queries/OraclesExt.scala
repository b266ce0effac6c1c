package graft.queries

/**
 * DuckDB oracle SQL for the [[CatalogExt]] queries. Determinism rules as in
 * [[Oracles]] plus:
 *  - HOF folds (rolling hash, token-length sums) are integer-only and
 *    sequential in both engines (Spark `aggregate` == DuckDB `list_reduce`
 *    with a prepended zero seed);
 *  - cosine similarity is double math in element order on both sides
 *    (Spark's VectorMath.cosineF fold == DuckDB list_dot_product on
 *    DOUBLE[] — verified bit-equal on the testdata);
 *  - quality/ratio formulas use only +,-,*,/ and least/greatest with
 *    identical parenthesization — no libm transcendentals.
 *
 * Every declared query carries a full hash oracle: the approximate
 * operators are deterministic and mirrored (q26/q30/q35/q49/q57 recompute
 * the identical bucketing/training in SQL; q27's simhash weights are
 * md5-derived, see [[simhashSql]]) or tolerance laws (q14's HLL bound as a
 * constant-TRUE boolean) — never rows-only.
 */
object OraclesExt {

  private[queries] val stop = "('the','a','data','value','key')"

  val all: Map[String, String] = Map(
    "q21_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_bpe,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(string_split(text,' '), t -> CAST(length(t) AS BIGINT))),
         |       (acc, x) -> acc + x) AS DOUBLE)
         |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len,
         |  CAST(len(list_filter(string_split(text,' '), t -> t IN $stop)) AS DOUBLE)
         |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_ratio,
         |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
         |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
         |  greatest(least(
         |      least(CAST(len(string_split(text,' ')) AS DOUBLE) / 60.0, 1.0) * 0.35
         |    + least((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |               list_transform(string_split(text,' '), t -> CAST(length(t) AS BIGINT))),
         |             (acc, x) -> acc + x) AS DOUBLE)
         |             / CAST(len(string_split(text,' ')) AS DOUBLE)) / 6.0, 1.0) * 0.25
         |    + least((CAST(len(list_filter(string_split(text,' '), t -> t IN $stop)) AS DOUBLE)
         |             / CAST(len(string_split(text,' ')) AS DOUBLE)) * 4.0, 1.0) * 0.3
         |    - (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
         |       / CAST(length(text) AS DOUBLE)) * 0.5 + 0.1, 1.0), 0.0) AS quality_score
         |FROM documents""".stripMargin,

    "q22_lang_id" -> langIdSql,

    "q23_fingerprint" ->
      """SELECT doc_id, md5(text) AS md5_fp,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_split_to_array(text, ''), c -> CAST(ord(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS roll_fp
        |FROM documents""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
        |  min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q25_jaccard_pairs" -> jaccardSql,
    // LSH misses at the 0.6 threshold have probability ~3.6e-5 per pair
    // (rows=3, bands=42), so the sub-quadratic path reproduces the exact
    // result on the test scales — same oracle by design.
    "q26_minhash_lsh" -> jaccardSql,

    "q28_embed_knn" -> knnSql,
    // same contract, computed through the bounded-heap TopKAgg Aggregator
    "q38_embed_knn_agg" -> knnSql,

    "q29_embed_neardup" -> embedNearDupSql,

    "q49_embed_neardup_lsh" -> embedLshSql,
    "q30_ann_lsh" -> annLshSql,
    "q27_simhash_pairs" -> simhashSql,
    "q68_semantic_decontam" -> semanticDecontamSql,

    // md5 hex is identical in both engines; ('0x'||hex)::BIGINT == Spark's
    // conv(hex,16,10) for the 8-digit prefix (fits in a long)
    "q53_dedup_clusters" -> clustersSql,
    "q59_drop_neardups" -> dropNearDupsSql,
    "q61_curate_corpus" -> curateCorpusSql,

    // q65: the lossy JPEG round trip. SQL-predictable columns mirror the
    // grid rule (dims are pure functions of the byte length, exact_sum is
    // the q55-style nearest-neighbor byte resample over the w x h grid);
    // decode success and the lossy-drift bound enter as constant-TRUE
    // booleans, the q14 tolerance-law pattern.
    "q65_jpeg_decode" ->
      """WITH a AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |    4 + octet_length(encode(text)) % 13 AS w,
        |    4 + (octet_length(encode(text)) * 7) % 11 AS h
        |  FROM documents)
        |SELECT doc_id AS asset_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CASE WHEN n = 0 THEN CAST(0 AS BIGINT) ELSE
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, w * h),
        |        i -> CAST(ord(substr(text, CAST((i * n) // (w * h) AS INT) + 1, 1)) AS BIGINT))),
        |      (acc, x) -> acc + x) AS BIGINT)
        |  END AS exact_sum,
        |  TRUE AS decoded,
        |  TRUE AS within_tol
        |FROM a""".stripMargin,

    // q67: PII redaction. The SQL is GENERATED from TextOps.PiiPatterns —
    // identical pattern strings in both engines (RE2-compatible by
    // construction), replace-all semantics on both sides ('g' flag in
    // DuckDB, Spark's default), counts over the original text.
    "q67_pii_redact" -> {
      val redacted = graft.text.TextOps.PiiPatterns.foldLeft("text") {
        case (acc, (_, pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      val counts = graft.text.TextOps.PiiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $redacted AS redacted,
         |  $counts
         |FROM documents""".stripMargin
    },

    // q66: the LOSSLESS audio round trip — 8-bit PCM through an actual WAV
    // write+parse is byte-faithful, so the sample count (the 1-D grid rule,
    // 64 + n % 193) and the resampled-byte sum are exact pure functions of
    // the payload; decode success is the only boolean and it must be TRUE.
    "q66_wav_decode" ->
      """WITH a AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |    64 + octet_length(encode(text)) % 193 AS k
        |  FROM documents)
        |SELECT doc_id AS asset_id,
        |  CAST(k AS BIGINT) AS n_samples,
        |  CASE WHEN n = 0 THEN CAST(0 AS BIGINT) ELSE
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, k),
        |        i -> CAST(ord(substr(text, CAST((i * n) // k AS INT) + 1, 1)) AS BIGINT))),
        |      (acc, x) -> acc + x) AS BIGINT)
        |  END AS sample_sum,
        |  CAST(8000 AS BIGINT) AS sample_rate_hz,
        |  TRUE AS decoded
        |FROM a""".stripMargin,

    // nearest-neighbor byte sampling: position i reads byte (i*n)//64;
    // ASCII corpus => byte == ord of the 1-based character (like q39).
    // Empty payloads resize to the zero grid (checksum 0) on both sides.
    "q55_resize" ->
      """SELECT doc_id AS asset_id,
        |  CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN CAST(0 AS BIGINT) ELSE
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 64),
        |        i -> CAST(ord(substr(text,
        |               CAST((i * octet_length(encode(text))) // 64 AS INT) + 1, 1)) AS BIGINT))),
        |      (acc, x) -> acc + x) AS BIGINT)
        |  END AS checksum
        |FROM documents""".stripMargin,

    // shingles(w,3) has one entry per DISTINCT 3-gram; empty (size 0) when
    // len(w) < 3 — mirrored by the range() comprehension being empty
    "q54_rep_ngrams" ->
      """SELECT doc_id,
        |  CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_ngrams,
        |  CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                          for i in range(1, len(w) - 1)])) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(w) - 2 > 0 THEN
        |    1.0 - CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                  for i in range(1, len(w) - 1)])) AS DOUBLE)
        |          / CAST(len(w) - 2 AS DOUBLE)
        |  ELSE 0.0 END AS rep_ratio
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin,

    // 8-gram shingles mirror the engine's rule (distinct per doc; docs with
    // < 8 tokens have none and are trivially clean)
    "q56_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
        |                   for i in range(1, len(w) - 6)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 8),
        |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM t WHERE doc_id % 97 = 0),
        |hit AS (
        |  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(s) AS sh FROM t)
        |  WHERE sh IN (SELECT sh FROM bsh))
        |SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated
        |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id""".stripMargin,

    // long-span duplication: shared distinct 20-gram counts (count per
    // pair == intersection size because shingle sets are per-doc distinct)
    // q101: verbatim replay of the suffix-prefix-group ExactSubstr pass —
    // positioned 20-grams, corpus-wide occurrence >= 2 via a window count,
    // then the same gaps-and-islands merge per doc (NULL lag -> ELSE 0,
    // matching Spark's when().otherwise())
    "q101_duplicated_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    [struct_pack(pos := i,
        |       gram := list_aggregate(w[i:i+19], 'string_agg', ' '))
        |     for i in range(1, len(w) - 18)] AS gs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 20),
        |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM t),
        |d AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |        count(*) OVER (PARTITION BY gram) AS occ
        |      FROM g QUALIFY occ >= 2),
        |brks AS (SELECT doc_id, pos,
        |           CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
        |                THEN 1 ELSE 0 END AS brk
        |         FROM d),
        |isl AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS UNBOUNDED PRECEDING) AS island
        |        FROM brks)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 19 AS span_end,
        |  max(pos) + 19 - min(pos) + 1 AS span_len,
        |  count(*) AS n_dup_grams
        |FROM isl GROUP BY doc_id, island""".stripMargin,

    // q104: the q69 split expression + the q62 contamination construction
    // pointed across the boundary — test docs' 8-grams vs the TRAIN set
    "q104_split_leakage" ->
      """WITH sp AS (SELECT doc_id, text,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90.0
        |           THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95.0
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |t AS (
        |  SELECT doc_id,
        |    list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
        |                   for i in range(1, len(w) - 6)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM sp WHERE split = 'test')
        |  WHERE len(w) >= 8),
        |bt AS (
        |  SELECT doc_id,
        |    list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
        |                   for i in range(1, len(w) - 6)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM sp WHERE split = 'train')
        |  WHERE len(w) >= 8),
        |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM bt),
        |h AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(s) AS sh FROM t)
        |  WHERE sh IN (SELECT sh FROM bsh) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(len(t.s), 0) AS BIGINT) AS n_ngrams,
        |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CASE WHEN COALESCE(len(t.s), 0) > 0
        |       THEN CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(len(t.s) AS DOUBLE)
        |       ELSE 0.0 END AS overlap
        |FROM (SELECT doc_id FROM sp WHERE split = 'test') d
        |LEFT JOIN t ON d.doc_id = t.doc_id
        |LEFT JOIN h ON d.doc_id = h.doc_id""".stripMargin,

    // q105: SemDeDup — the q57 k-means CTEs verbatim, then the within-cell
    // min-id witness join. All-integer output; the only floats live inside
    // the (bit-identical) cosine threshold compare.
    "q105_semdedup" -> semDedupSql,

    // q106: rare-bigram gate — per-(doc,bigram) counts, corpus counts via
    // the same window-over-bigram construction, rational-compare gate.
    "q106_rare_bigram_gate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pd AS (
        |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT doc_id, w[u.i] AS w1, w[u.i + 1] AS w2
        |    FROM tok, LATERAL (SELECT unnest(range(1, len(w))) AS i) u
        |    WHERE len(w) >= 2)
        |  GROUP BY doc_id, w1, w2),
        |g AS (SELECT doc_id, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY w1, w2) AS BIGINT) AS gcnt
        |      FROM pd),
        |sc AS (SELECT doc_id,
        |         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |         CAST(sum(CASE WHEN gcnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS n_rare
        |       FROM g GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(sc.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(sc.n_rare, 0) AS n_rare,
        |  COALESCE(sc.n_rare, 0) * 100 <= COALESCE(sc.n_bigrams, 0) * 1 AS kept
        |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin,

    // q107: Bloom audit — the identical salted-md5 bit positions
    // (h || ':' || key idiom), set-bit membership per hash, exact-set flag,
    // 2x2 rollup. (bloom_pass=false, is_match=true) never appears.
    "q107_bloom_audit" -> bloomAuditSql,

    // q108: two-stage retrieval — q63's quantization verbatim per side,
    // integer-sum stage-1 score (scales cancel), exact-cosine rerank.
    "q108_rerank_knn" -> rerankSql,

    // q109: hard negatives — the q57 k-means CTEs, probes restricted to
    // foreign cells (crnk 2..nProbe+1), exact cosine, per-query top-j.
    "q109_hard_negatives" -> hardNegativesSql,

    // q110: the salted replicate join's contract IS the plain join — the
    // oracle states it directly, so the hash-match is the equality law on
    // real data
    "q110_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,

    // q111: BPE training replayed, then the encode chain applied per word
    // inside each document (see bpeEncodeSql)
    "q111_bpe_encode" -> bpeEncodeSql(8),

    // q112: DSIR replayed end to end — target subset via the q72 gate,
    // two bucket-count aggregates, then the per-doc fixed-order fold of
    // piecewise-linear-log2 contributions (see dsirSql)
    "q112_dsir_weights" -> dsirSql(64),

    // q113: HITS — every fixed-point round replayed (see hitsSql)
    "q113_hits" -> hitsSql(8),

    // q114: the cap's contract stated as the per-domain row_number over
    // the same md5 order — hash-match = the bounded-heap ≡ window law
    "q114_domain_cap" ->
      """SELECT domain, doc_id, rk FROM (
        |  SELECT source AS domain, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT ASC,
        |               doc_id ASC) AS BIGINT) AS rk
        |  FROM documents) WHERE rk <= 15""".stripMargin,

    // q115: KL(domain ‖ corpus) with the exact-lg fold (see domainKlSql)
    "q115_domain_kl" -> domainKlSql(64),

    // q116: first-occurrence novelty — row_number over (gram ORDER BY
    // doc_id, pos) = 1 mirrors the engine's min-struct argmin
    "q116_ngram_novelty" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM (
        |  SELECT doc_id,
        |    [struct_pack(pos := CAST(i - 1 AS BIGINT),
        |       gram := w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |     for i in range(1, len(w) - 1)] AS gs
        |  FROM base WHERE len(w) >= 3)),
        |f AS (SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY gram
        |      ORDER BY doc_id, pos) AS rn FROM g) WHERE rn = 1),
        |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_first FROM f GROUP BY 1),
        |ng AS (SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_grams
        |       FROM g GROUP BY 1)
        |SELECT ng.doc_id, ng.n_grams,
        |  CAST(coalesce(nf.n_first, 0) AS BIGINT) AS n_first,
        |  CAST(coalesce(nf.n_first, 0) AS DOUBLE) / CAST(ng.n_grams AS DOUBLE) AS novelty
        |FROM ng LEFT JOIN nf USING (doc_id)""".stripMargin,

    // q117: the A-ES draw replayed — same md5 integer, same exact-lg key,
    // same (key DESC, id ASC) order and cut
    "q117_weighted_sample" ->
      s"""SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |  (${lgSqlOf("u")} - 32.0) / CAST(n_chars AS DOUBLE) AS skey
         |FROM (SELECT doc_id, n_chars,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS u
         |  FROM documents WHERE n_chars > 0)
         |ORDER BY skey DESC, doc_id ASC LIMIT 100""".stripMargin,

    // q118: PQ-ADC replayed end to end (see pqAdcSql)
    "q118_pq_adc" -> pqAdcSql,

    // q119: the linkage replay — same prefixes, same blocks, the bigram
    // multiset intersection as an explode/join/least aggregate, the same
    // exact-rational cut and one-divide dice
    // q120: the q97 model replayed, then every doc's bigrams joined and
    // folded in position order with the exact-lg contributions
    "q120_bigram_ppl" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM (
         |  SELECT doc_id, [struct_pack(pos := CAST(i - 1 AS BIGINT),
         |                              w1 := w[i], w2 := w[i+1])
         |                  for i in range(1, len(w))] AS gs
         |  FROM t WHERE len(w) >= 2)),
         |c2 AS (SELECT w1, w2, count(*) AS c12 FROM g GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |j AS (SELECT g.doc_id, g.pos,
         |        (${lgSqlOf("c2.c12")} - ${lgSqlOf("c1.c1")}) AS contrib
         |      FROM g JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY pos)),
         |    (a, x) -> a + x) AS ll_bits,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY pos)),
         |    (a, x) -> a + x) / CAST(count(*) AS DOUBLE) AS avg_bits
         |FROM j GROUP BY doc_id""".stripMargin,

    // q121: DSIR + gate replayed as derived tables, then the same
    // equal-width binning, order-free conditional sums, and one-divide
    // rates (see thresholdSweepSql)
    "q121_threshold_sweep" -> thresholdSweepSql,

    // q122: BM25 replayed — same exact-lg idf, same one-divide avgdl and
    // length norm, same fixed-order term fold; the top-k stated as the
    // row_number window, so the hash-match is the heap ≡ window law
    "q122_bm25_topk" -> bm25Sql,

    // q123: the LR training loop replayed round by round — integer
    // gradient sums are order-free, the two floor-divides (hard sigmoid,
    // mean-gradient step) are exact doubles (see qualityLrSql)
    "q123_quality_lr" -> qualityLrSql(24),

    // q124: the real PNG encode→decode→aHash path replayed from the byte
    // grid (the q60 trick: written pixels are a pure function of the
    // bytes), then the same band join and bit_count(xor) Hamming verify
    "q124_image_neardup" -> aHashNearDupSql,

    // q125: the same literal Rademacher matrix (generated once in Scala,
    // embedded in both plans), the same seeded fixed-order folds
    "q125_random_project" -> randomProjectSql(64, 16),

    // q126: every farthest-point round replayed as a chained CTE — same
    // fixed-order distance folds, same true-min reduction, same
    // (d2 DESC, id ASC) argmax cut
    "q126_kcenter_coreset" -> kCenterSql(8, 64),

    // q128: per-char-class one-divide probabilities, exact-lg bits,
    // fixed-order fold over characters ascending
    "q128_char_entropy" ->
      s"""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
         |            FROM documents),
         |ct AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
         |       FROM ch GROUP BY 1, 2),
         |n AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n
         |      FROM ct GROUP BY 1)
         |SELECT ct.doc_id, n.n AS n_chars_counted,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) *
         |         (${lgSqlOf("n")} - ${lgSqlOf("cnt")}) ORDER BY c)),
         |    (a, x) -> a + x) AS entropy_bits
         |FROM ct JOIN n ON ct.doc_id = n.doc_id GROUP BY 1, 2""".stripMargin,

    // q129: PMI replayed — integer unigram/bigram counts, the same
    // fixed-order exact-lg difference chain, same (pmi, w1, w2) cut
    "q129_pmi_collocations" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
         |uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
         |         SELECT unnest(w) AS t FROM t) GROUP BY 1),
         |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
         |         SELECT w[i] AS w1, w[i + 1] AS w2
         |         FROM (SELECT w, unnest(range(1, len(w))) AS i FROM t))
         |       GROUP BY 1, 2),
         |st AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uc) AS n,
         |              (SELECT CAST(sum(c12) AS BIGINT) FROM bc) AS b)
         |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
         |  ((((${lgSqlOf("c12")} - ${lgSqlOf("b")}) - ${lgSqlOf("u1.c")}) -
         |    ${lgSqlOf("u2.c")}) + ${lgSqlOf("n")}) + ${lgSqlOf("n")} AS pmi_bits
         |FROM bc JOIN uc u1 ON u1.t = bc.w1
         |JOIN uc u2 ON u2.t = bc.w2 CROSS JOIN st
         |WHERE c12 >= 5
         |ORDER BY pmi_bits DESC, w1 ASC, w2 ASC LIMIT 100""".stripMargin,

    // q131: every MMR greedy round replayed — shared bit-equal cosine
    // kernel, true-max redundancy term, (mmr DESC, c_id ASC) argmax
    "q131_mmr_rerank" -> mmrSql(5, 0.5),

    // q132: the q49 edge oracle inlined as the graph, then every
    // synchronous majority round replayed (integer votes, (count DESC,
    // label ASC) argmax, clamped seeds)
    "q132_label_prop" -> labelPropSql(4),

    // q133: the split is a pure function of the domain hash — replayed
    "q133_group_split" ->
      """SELECT doc_id, source AS domain,
        |  CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < 80
        |       THEN 'train'
        |       WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < 90
        |       THEN 'val' ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    // q134: medians via quantile_cont (the q40 contract), one
    // multiply+divide score, NULL score/flag where MAD = 0
    "q134_robust_outliers" ->
      """WITH m AS (SELECT source, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
        |           FROM documents GROUP BY 1),
        |j AS (SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
        |        CAST(d.n_chars AS DOUBLE) AS x, m.med
        |      FROM documents d JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(abs(x - med), 0.5) AS mad
        |       FROM j GROUP BY 1)
        |SELECT j.doc_id, j.source, j.n_chars, j.med, md.mad,
        |  CASE WHEN md.mad <> 0.0
        |       THEN 0.6745 * (x - j.med) / md.mad END AS robust_z,
        |  CASE WHEN md.mad <> 0.0
        |       THEN abs(0.6745 * (x - j.med) / md.mad) > 3.5 END AS outlier
        |FROM j JOIN md USING (source)""".stripMargin,

    // q135: the q14 form — exact distinct counts per source + the merged
    // '*' row, tolerance verdict stated as the constant-TRUE boolean
    "q135_hll_vocab" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents)
        |SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
        |       TRUE AS within_tol
        |FROM t GROUP BY source
        |UNION ALL
        |SELECT '*' AS source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
        |       TRUE AS within_tol
        |FROM t""".stripMargin,

    // q136: the CUSUM recurrence as its running-window identity over
    // INTEGER-scaled deviations (c·n − total), so each engine's window
    // aggregation tree is irrelevant; μ and the reported cusum are one
    // divide each
    "q136_cusum_drift" ->
      """WITH h AS (SELECT event_type AS series, date_trunc('hour', ts) AS hour,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |m AS (SELECT series, CAST(sum(c) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS nh
        |      FROM h GROUP BY 1),
        |p AS (SELECT h.series, h.hour, h.c, m.total, m.nh,
        |        CAST(sum(c * nh - total) OVER (PARTITION BY h.series
        |          ORDER BY h.hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
        |      FROM h JOIN m USING (series)),
        |q AS (SELECT series, hour, c, total, nh, p,
        |        min(p) OVER (PARTITION BY series ORDER BY hour
        |          ROWS UNBOUNDED PRECEDING) AS mp
        |      FROM p)
        |SELECT series, hour, c,
        |  CAST(total AS DOUBLE) / CAST(nh AS DOUBLE) AS mu,
        |  CAST(p - least(mp, 0) AS DOUBLE) / CAST(nh AS DOUBLE) AS cusum,
        |  p - least(mp, 0) > total AS alarm
        |FROM q""".stripMargin,

    // q137: frames replayed from the byte stride (ord ≡ content byte for
    // the fixture's ascii), the same lag window and integer threshold
    "q137_shot_bounds" ->
      """WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS n
        |           FROM documents),
        |f AS (SELECT doc_id AS asset_id, CAST(off AS BIGINT) AS frame_off,
        |        CAST(ord(substr(text, CAST(off AS INT) + 1, 1)) AS BIGINT) AS frame_byte
        |      FROM t, LATERAL (SELECT unnest(range(0, n, 16)) AS off) u),
        |l AS (SELECT asset_id, frame_off, frame_byte,
        |        lag(frame_byte) OVER (PARTITION BY asset_id ORDER BY frame_off) AS prev
        |      FROM f)
        |SELECT asset_id, frame_off, frame_byte,
        |  abs(frame_byte - prev) AS delta,
        |  abs(frame_byte - prev) > 64 AS is_cut
        |FROM l""".stripMargin,

    // q138: each relationship as a LEFT JOIN against the distinct parent
    // keys; NULL fks are orphans on both engines (equality join misses)
    "q138_fk_orphans" -> fkOrphansSql,

    // q139: the delta-vs-corpus all-pairs statement of the inverted-index
    // probe (same shingle sets, same one-divide jaccard, same cut)
    "q139_incremental_dedup" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                   for i in range(1, len(w) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |d AS (SELECT * FROM t WHERE doc_id % 10 = 0),
        |c AS (SELECT * FROM t WHERE doc_id % 10 <> 0)
        |SELECT delta_id, corpus_id, jaccard FROM (
        |  SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
        |    CAST(len(list_intersect(d.s, c.s)) AS DOUBLE)
        |      / CAST(len(d.s) + len(c.s) - len(list_intersect(d.s, c.s)) AS DOUBLE)
        |      AS jaccard
        |  FROM d CROSS JOIN c)
        |WHERE jaccard >= 0.5""".stripMargin,

    // q140: melt stated as the UNION ALL it desugars to
    "q140_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m AS measure, v AS value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS m,
        |    CAST(l_quantity AS DOUBLE) AS v FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |    CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount',
        |    CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax',
        |    CAST(l_tax AS DOUBLE) FROM lineitem WHERE l_orderkey % 50 = 0)""".stripMargin,

    // q141: typed path extraction — DuckDB's JSON operators express the
    // same semantics (missing path -> NULL)
    "q141_variant_json" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k,
        |  CAST(props->>'$.missing' AS BIGINT) AS missing
        |FROM events""".stripMargin,

    // q142: the same canonical a<b<c three-way join + corner credits
    "q142_triangles" ->
      """WITH so AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.sk AS u, b.sk AS v
        |      FROM so a JOIN so b ON a.ok = b.ok AND a.sk < b.sk),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (SELECT a AS id FROM tri
        |            UNION ALL SELECT b FROM tri
        |            UNION ALL SELECT c FROM tri),
        |nodes AS (SELECT u AS id FROM e UNION SELECT v FROM e)
        |SELECT n.id,
        |  CAST(coalesce(t.ct, 0) AS BIGINT) AS n_triangles
        |FROM nodes n LEFT JOIN (
        |  SELECT id, count(*) AS ct FROM corners GROUP BY 1) t
        |  ON t.id = n.id""".stripMargin,

    // q143: the carried-last-click contract stated as a correlated
    // (click_ts DESC, click_id DESC) top-1; inclusive at equal ts
    "q143_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events
        |      WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, p.ts, w.click_id, w.click_ts,
        |  w.click_ts >= p.ts - INTERVAL 1 HOUR AS attributed
        |FROM p LEFT JOIN LATERAL (
        |  SELECT click_id, click_ts FROM c
        |  WHERE c.user_id = p.user_id AND c.click_ts <= p.ts
        |  ORDER BY c.click_ts DESC, c.click_id DESC LIMIT 1) w ON true""".stripMargin,

    // q144: per-user type sequences in (ts, event_id) order, trigram
    // comprehension, (n DESC, t1, t2, t3) cut
    "q144_event_trigrams" ->
      """WITH sq AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS t
        |            FROM events GROUP BY 1),
        |g AS (SELECT unnest(gs, recursive := true) FROM (
        |  SELECT [struct_pack(t1 := t[i], t2 := t[i+1], t3 := t[i+2])
        |          for i in range(1, len(t) - 1)] AS gs
        |  FROM sq WHERE len(t) >= 3))
        |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
        |FROM g GROUP BY 1, 2, 3
        |ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC LIMIT 20""".stripMargin,

    // q145: integer-exact seasonal residuals (the q136 scaling trick on
    // the hour-of-day profile)
    "q145_seasonal" ->
      """WITH h AS (SELECT event_type AS series, date_trunc('hour', ts) AS hour,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |h2 AS (SELECT series, hour, CAST(hour(hour) AS BIGINT) AS hod, c FROM h),
        |p AS (SELECT series, hod, CAST(sum(c) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS nh
        |      FROM h2 GROUP BY 1, 2)
        |SELECT h2.series, h2.hour, h2.hod, h2.c,
        |  CAST(total AS DOUBLE) / CAST(nh AS DOUBLE) AS seasonal_mu,
        |  CAST(c * nh - total AS DOUBLE) / CAST(nh AS DOUBLE) AS residual
        |FROM h2 JOIN p USING (series, hod)""".stripMargin,

    // q146: distinct (source, 3-shingle) rows, shingle-keyed self-join,
    // one-divide directional containment
    "q146_source_overlap" ->
      """WITH h AS (SELECT DISTINCT source, sh FROM (
        |    SELECT source, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                           for i in range(1, len(w) - 1)]) AS sh
        |    FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 3)),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM h GROUP BY 1),
        |o AS (SELECT a.source AS src, b.source AS dst,
        |             CAST(count(*) AS BIGINT) AS common
        |      FROM h a JOIN h b ON a.sh = b.sh AND a.source <> b.source
        |      GROUP BY 1, 2)
        |SELECT o.src, o.dst, s.n_src, o.common,
        |  CAST(common AS DOUBLE) / CAST(n_src AS DOUBLE) AS containment
        |FROM o JOIN s ON s.source = o.src""".stripMargin,

    // q147: q133's split replayed, q121's binning arithmetic, exact-lg
    // ratio bits, zero-count bins dropped, fold over bins ascending
    "q147_psi_drift" ->
      s"""WITH sp AS (SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < 80
         |         THEN 'train'
         |         WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < 90
         |         THEN 'val' ELSE 'test' END AS split
         |  FROM documents),
         |b0 AS (SELECT CAST(d.n_chars AS DOUBLE) AS v, sp.split = 'train' AS is_a
         |       FROM documents d JOIN sp USING (doc_id)
         |       WHERE sp.split IN ('train', 'test')),
         |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM b0),
         |bb AS (SELECT CASE WHEN hi = lo THEN 15
         |         ELSE least(greatest(CAST(floor((v - lo) / (hi - lo) * 16)
         |           AS BIGINT), 0), 15) END AS b, is_a
         |       FROM b0 CROSS JOIN mm),
         |ct AS (SELECT b,
         |         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
         |       FROM bb GROUP BY 1),
         |tt AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |              CAST(sum(cb) AS BIGINT) AS nb FROM ct)
         |SELECT na AS n_a, nb AS n_b, CAST(count(*) AS BIGINT) AS n_bins_used,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
         |          - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) *
         |         (((${lgSqlOf("ca")} - ${lgSqlOf("na")}) - ${lgSqlOf("cb")})
         |          + ${lgSqlOf("nb")}) ORDER BY b)),
         |    (a, x) -> a + x) AS psi_bits
         |FROM ct CROSS JOIN tt WHERE ca > 0 AND cb > 0 GROUP BY na, nb""".stripMargin,

    // q148: exact-microsecond latencies, integer hour buckets, integer
    // running cumulation, one-divide share
    "q148_conversion_curve" ->
      """WITH fv AS (SELECT user_id AS u, min(ts) AS t_from FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT user_id AS u, min(ts) AS t_to FROM events
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT (epoch_us(t_to) - epoch_us(t_from)) // 3600000000 AS hours
        |      FROM fv JOIN fp USING (u) WHERE t_to >= t_from),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_base FROM fv),
        |g AS (SELECT CAST(hours AS BIGINT) AS hours,
        |             CAST(count(*) AS BIGINT) AS n_converted FROM j GROUP BY 1),
        |c AS (SELECT hours, n_converted,
        |        CAST(sum(n_converted) OVER (ORDER BY hours
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_converted
        |      FROM g)
        |SELECT hours, n_converted, cum_converted,
        |  CAST(cum_converted AS DOUBLE) / CAST(n_base AS DOUBLE) AS cum_share
        |FROM c CROSS JOIN nb""".stripMargin,

    // q149: the 8 peel rounds replayed
    "q149_kcore" -> kCoreSql(40, 8),

    // q150: every metric is an existing oracle's arithmetic — q21 quality
    // through a DECIMAL(25,6) sum, the q72 gate share, exact-lg language
    // entropy folded over langs ascending
    "q150_corpus_report" -> corpusReportSql,

    // q151-q153: the TPC-H classics with the engine's money-as-double
    // discipline (decimal-stabilized sums, double casts)
    "q151_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q152_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    "q153_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    // q154/q155: the hashing-trick histogram replayed per bucket; the knn
    // reuses the q28 cosine contract (integer-valued dots -> order-free)
    "q154_hashed_tf" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS dim,
        |  CAST(len(list_filter(w, t ->
        |    ('0x' || substr(md5(t), 1, 8))::BIGINT % 64 = i)) AS BIGINT) AS cnt
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |CROSS JOIN (SELECT unnest(range(0, 64)) AS i)""".stripMargin,

    "q155_hashed_tf_knn" ->
      """WITH v AS (SELECT doc_id,
        |    [CAST(len(list_filter(w, t ->
        |       ('0x' || substr(md5(t), 1, 8))::BIGINT % 64 = i)) AS DOUBLE)
        |     for i in range(0, 64)] AS v
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |q AS (SELECT doc_id AS q_id, v AS qv FROM v WHERE doc_id % 100 = 0),
        |sc AS (SELECT q.q_id, c.doc_id AS c_id,
        |    list_dot_product(qv, c.v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v)))
        |      AS cosine
        |  FROM v c CROSS JOIN q WHERE q.q_id <> c.doc_id)
        |SELECT q_id, c_id, CAST(rnk AS BIGINT) AS rnk, cosine FROM (
        |  SELECT q_id, c_id, cosine,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, c_id ASC) AS rnk
        |  FROM sc) WHERE rnk <= 5""".stripMargin,

    // q156: same distinct (user, item) base, same pair counts, the same
    // exact-lg lift chain, same (c DESC, i, j) cut
    "q156_covisitation" ->
      s"""WITH ui AS (SELECT DISTINCT user_id AS u,
         |    CAST(props->>'$$.k' AS BIGINT) AS item
         |  FROM events WHERE CAST(props->>'$$.k' AS BIGINT) IS NOT NULL),
         |nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM ui),
         |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM ui GROUP BY 1),
         |p AS (SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c_ij
         |      FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
         |      GROUP BY 1, 2)
         |SELECT i, j, c_ij, ci.c AS c_i, cj.c AS c_j,
         |  ((${lgSqlOf("c_ij")} + ${lgSqlOf("n_users")}) - ${lgSqlOf("ci.c")})
         |   - ${lgSqlOf("cj.c")} AS lift_bits
         |FROM p JOIN ic ci ON ci.item = p.i JOIN ic cj ON cj.item = p.j
         |CROSS JOIN nu
         |ORDER BY c_ij DESC, i ASC, j ASC LIMIT 50""".stripMargin,

    // q130: same row digest (15-hex md5 prefix -> positive BIGINT), same
    // order-free bit_xor rollup with the coalesced total row
    "q130_fingerprint" ->
      """SELECT coalesce(source, '*') AS source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
        |    1, 15))::BIGINT) AS xor_fp,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY ROLLUP(source)""".stripMargin,

    // q127: pure integer bucket arithmetic + one final divide
    "q127_length_buckets" ->
      """WITH s AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |           FROM documents),
        |g AS (SELECT nt // 16 AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |        min(nt) AS min_tokens, max(nt) AS max_tokens,
        |        CAST(sum(nt) AS BIGINT) AS sum_tokens
        |      FROM s GROUP BY 1)
        |SELECT bucket, n_docs, min_tokens, max_tokens, sum_tokens,
        |  (n_docs + 31) // 32 AS batches,
        |  n_docs * max_tokens - sum_tokens AS pad_waste,
        |  CASE WHEN n_docs * max_tokens > 0
        |       THEN CAST(n_docs * max_tokens - sum_tokens AS DOUBLE)
        |            / CAST(n_docs * max_tokens AS DOUBLE)
        |       ELSE 0.0 END AS waste_ratio
        |FROM g""".stripMargin,

    "q119_fuzzy_pairs" ->
      s"""WITH $fuzzyPairsCte
         |SELECT a_id, b_id, inter, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         |  CAST(2 * inter AS DOUBLE) / CAST(na + nb AS DOUBLE) AS dice
         |FROM i WHERE 2 * inter * 4 >= 3 * (na + nb)""".stripMargin,


    // q102: the excision replay — every non-first occurrence (row_number
    // over (gram ORDER BY doc_id, pos) >= 2) marks its interval, islands
    // merge as in q101, kept tokens rebuild in position order. Docs with
    // every token excised keep a row with clean_text = ''.
    "q102_excise_dup_spans" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (
        |  SELECT doc_id,
        |    [struct_pack(pos := i,
        |       gram := list_aggregate(w[i:i+19], 'string_agg', ' '))
        |     for i in range(1, len(w) - 18)] AS gs
        |  FROM base WHERE len(w) >= 20),
        |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM t),
        |m AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |      FROM g QUALIFY rn >= 2),
        |brks AS (SELECT doc_id, pos,
        |           CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
        |                THEN 1 ELSE 0 END AS brk
        |         FROM m),
        |isl AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS UNBOUNDED PRECEDING) AS island
        |        FROM brks),
        |iv AS (SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
        |       FROM isl GROUP BY doc_id, island),
        |tokl AS (SELECT doc_id,
        |           [struct_pack(p := i, token := w[i]) for i in range(1, len(w) + 1)] AS ts
        |         FROM base),
        |tok AS (SELECT doc_id, unnest(ts, recursive := true) FROM tokl),
        |kept AS (SELECT tok.doc_id, tok.p, tok.token FROM tok
        |         WHERE NOT EXISTS (SELECT 1 FROM iv
        |           WHERE iv.doc_id = tok.doc_id AND tok.p BETWEEN iv.s AND iv.e)),
        |reb AS (SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT base.doc_id, coalesce(reb.clean_text, '') AS clean_text,
        |  CAST(len(base.w) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
        |FROM base LEFT JOIN reb USING (doc_id)""".stripMargin,

    // q103: asymmetric containment — the unordered intersection computed
    // once, both directed ratios emitted (|A∩B|/|src|), one IEEE division
    // of two exact longs per row
    "q103_containment_pairs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                   for i in range(1, len(w) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS x, b.doc_id AS y,
        |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS c,
        |        CAST(len(a.s) AS BIGINT) AS xs, CAST(len(b.s) AS BIGINT) AS ys
        |      FROM t a JOIN t b ON a.doc_id < b.doc_id),
        |d AS (SELECT x AS src_id, y AS dst_id,
        |        CAST(c AS DOUBLE) / CAST(xs AS DOUBLE) AS containment FROM p
        |      UNION ALL
        |      SELECT y AS src_id, x AS dst_id,
        |        CAST(c AS DOUBLE) / CAST(ys AS DOUBLE) AS containment FROM p)
        |SELECT src_id, dst_id, containment FROM d WHERE containment >= 0.7""".stripMargin,

    "q64_shared_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([list_aggregate(w[i:i+19], 'string_agg', ' ')
        |                   for i in range(1, len(w) - 18)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 20)
        |SELECT a_id, b_id, n_shared_spans FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_shared_spans
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |WHERE n_shared_spans >= 1""".stripMargin,

    // graded decontamination: hits / distinct-8-gram count per doc (docs
    // with < 8 tokens have no shingle row -> 0/0 -> overlap 0.0)
    "q62_contam_scores" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
        |                   for i in range(1, len(w) - 6)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 8),
        |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM t WHERE doc_id % 97 = 0),
        |h AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(s) AS sh FROM t)
        |  WHERE sh IN (SELECT sh FROM bsh) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(len(t.s), 0) AS BIGINT) AS n_ngrams,
        |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CASE WHEN COALESCE(len(t.s), 0) > 0
        |       THEN CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(len(t.s) AS DOUBLE)
        |       ELSE 0.0 END AS overlap
        |FROM documents d
        |LEFT JOIN t ON d.doc_id = t.doc_id
        |LEFT JOIN h ON d.doc_id = h.doc_id""".stripMargin,

    // int8 quantization: scale = max|v|/127, code = round(v/scale) —
    // half-away-from-zero rounding in BOTH engines (Spark BigDecimal
    // HALF_UP == DuckDB round); reconstruction error folds in element order
    "q63_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM e)
        |SELECT vec_id, scale,
        |  CAST(CASE WHEN scale = 0 THEN 0 ELSE
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(round(v[i] / scale) AS BIGINT) for i in range(1, len(v) + 1)]),
        |      (acc, x) -> acc + x) END AS BIGINT) AS qsum,
        |  CASE WHEN scale = 0 THEN 0.0 ELSE
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [abs(v[i] - round(v[i] / scale) * scale) for i in range(1, len(v) + 1)]),
        |      (acc, x) -> acc + x) END AS l1_err
        |FROM s""".stripMargin,

    "q50_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
        |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 20 ELSE 10 END""".stripMargin,

    // q69: the hash-band splitter — same md5-percent rule as q50, cumulative
    // [0,90)/[90,95)/[95,100) bands compared as DOUBLE percents
    "q69_train_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90.0
        |         THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95.0
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    // q70: √n is IEEE-exactly-rounded in both engines; the denominator sums
    // floor(√n * 2^24) BIGINTs exactly (aggregation-order independent), so
    // the final double division is deterministic
    "q70_domain_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |f AS (SELECT source, n_docs,
        |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 16777216) AS BIGINT) AS fp
        |      FROM c)
        |SELECT source, n_docs,
        |  CAST(fp AS DOUBLE) / CAST((SELECT sum(fp) FROM f) AS DOUBLE) AS weight
        |FROM f""".stripMargin,

    // q71: the sketch estimates are engine-specific; the rank-error bound
    // (the q14 tolerance-law pattern) is asserted as constant TRUE
    "q71_approx_quantiles" ->
      """SELECT l_returnflag, count(*) AS n, TRUE AS ok50, TRUE AS ok95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q72: q21's token stats + q54's distinct-3-gram rule, thresholded into
    // per-rule audit booleans with identical comparison semantics
    "q72_gopher_rules" -> gopherRulesSql,

    // q74: unigram corpus frequencies re-joined to the corpus tokens —
    // integer counts + one double division, no transcendentals
    "q74_token_rarity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |v AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1)
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(tf) AS BIGINT) AS tf_sum,
        |  CAST(sum(tf) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tf
        |FROM tok JOIN v USING (token)
        |GROUP BY doc_id""".stripMargin,

    // q75: the FULL BPE training loop replayed in SQL (the q57 mirror-the-
    // training pattern): k chained CTE rounds of pair-count → argmax →
    // literal replace over the bar-wrapped segmentation
    "q75_bpe_merges" -> bpeSql(8),

    // q83: iterative fixed-point PageRank, every round replayed (see
    // pageRankSql)
    "q83_pagerank" -> pageRankSql(8),

    // q96: PCA power iteration, fully replayed (see pcaSql)
    "q96_pca_top" -> pcaSql(8),

    // q98: PCA-projection outliers — training replayed, then the same
    // fixed-order projection fold (see pcaOutlierSql)
    "q98_pca_outliers" -> pcaOutlierSql(8, 20),

    // q99: rational TF-IDF — integer tf/df/n + one exact division, rank
    // window with the same (score DESC, token ASC) tie-break
    "q99_tfidf_keywords" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY 1, 2),
        |df_ AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, token, tf, dfreq, score, rnk FROM (
        |  SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
        |    CAST(df_.dfreq AS BIGINT) AS dfreq,
        |    CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df_.dfreq AS DOUBLE) AS score,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df_.dfreq AS DOUBLE) DESC,
        |               tf.token ASC) AS BIGINT) AS rnk
        |  FROM tf JOIN df_ USING (token) CROSS JOIN n)
        |WHERE rnk <= 3""".stripMargin,

    // q100: the perturbed next version rebuilt, then the same null-safe
    // full-outer diff semantics
    "q100_reconcile_diff" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
        |next AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CASE WHEN c_custkey % 10 = 0 THEN bal_cents + 10000 ELSE bal_cents END AS bal_cents
        |  FROM base WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT -(c_custkey + 1), c_mktsegment, bal_cents
        |  FROM base WHERE c_custkey % 50 = 0)
        |SELECT coalesce(b.c_custkey, x.c_custkey) AS c_custkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'added'
        |       WHEN x.c_custkey IS NULL THEN 'removed'
        |       WHEN b.c_mktsegment IS DISTINCT FROM x.c_mktsegment
        |         OR b.bal_cents IS DISTINCT FROM x.bal_cents THEN 'changed'
        |       ELSE 'same' END AS status
        |FROM base b FULL JOIN next x ON b.c_custkey = x.c_custkey""".stripMargin,

    // q97: bigram conditional probabilities — integer counts + one double
    // division, the q75 pair generator mirrored
    "q97_bigram_lm" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
        |                     for i in range(1, len(w))]) AS p FROM t),
        |c2 AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1)
        |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, c1,
        |  CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p_next
        |FROM c2 JOIN c1 USING (w1)""".stripMargin,

    // q94: GROUPING SETS + GROUPING() — both engines set one bit per
    // grouping column, leftmost most significant
    "q94_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    // q95: keep-last-write per key, total order (ts, event_id) descending
    "q95_latest_by_key" ->
      """SELECT event_id, user_id, event_type, ts, cents FROM (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    // q92: THE incremental-maintenance law — merge(prev_state, delta)
    // must equal the full recompute, so the oracle IS the full GROUP BY
    "q92_incremental_agg" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
        |FROM events GROUP BY user_id""".stripMargin,

    // q93: the bucketed range join must equal the plain theta join
    "q93_range_join" ->
      """SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber
        |FROM orders o JOIN lineitem l
        |  ON o.o_orderkey % 97 = 0
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY""".stripMargin,

    // q88: gaps-and-islands with the SAME total order (ts, event_id) and
    // the gap compared on epoch microseconds in both engines
    "q88_session_ids" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (SELECT event_id, user_id, ts,
        |        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 21600000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (SELECT event_id, user_id,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_seq
        |      FROM o)
        |SELECT event_id, user_id, session_seq,
        |  CAST(user_id AS VARCHAR) || '#' || CAST(session_seq AS VARCHAR) AS session_id
        |FROM i""".stripMargin,

    // q89: cohort = week of first activity; offsets in exact epoch-second
    // integer division (UTC, week-truncated — always a 604800 multiple)
    "q89_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |       FROM ev GROUP BY 1),
        |a AS (SELECT ev.user_id, fw.cohort_week,
        |        date_trunc('week', ev.ts) AS activity_week
        |      FROM ev JOIN fw USING (user_id))
        |SELECT cohort_week,
        |  (epoch(activity_week)::BIGINT - epoch(cohort_week)::BIGINT) // 604800 AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM a GROUP BY 1, 2""".stripMargin,

    // q90: base snapshot + deterministic change set versioned by the same
    // per-key lead/row_number windows; money stabilized to exact cents
    "q90_scd2" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
        |    TIMESTAMP '2024-01-01 00:00:00' AS eff
        |  FROM customer),
        |chg AS (
        |  SELECT c_custkey, c_mktsegment, bal_cents + 10000 AS bal_cents,
        |    TIMESTAMP '2024-06-01 00:00:00' AS eff
        |  FROM base WHERE c_custkey % 10 = 0),
        |obs AS (SELECT * FROM base UNION ALL SELECT * FROM chg)
        |SELECT c_custkey, c_mktsegment, bal_cents,
        |  eff AS valid_from,
        |  lead(eff) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  lead(eff) OVER w IS NULL AS is_current
        |FROM obs WINDOW w AS (PARTITION BY c_custkey ORDER BY eff)""".stripMargin,

    // q91: winsorization bounds are dataset ELEMENTS at ceil(p*n) rank —
    // same distribution-first construction as q85, then a broadcast clamp.
    // The explicit IS NOT NULL mirrors the engine's NULL exclusion (ranks
    // are over the non-null population; NULL/NaN inputs pass through the
    // clamp) — no-op on lineitem, but it keeps both constructions
    // textually agreed on nullable columns.
    "q91_winsorize" ->
      """WITH vc AS (SELECT l_extendedprice AS v, count(*) AS c FROM lineitem
        |            WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ct FROM vc),
        |tot AS (SELECT sum(c) AS n FROM vc),
        |b AS (SELECT
        |    min(CASE WHEN ct >= ceil(CAST(0.05 AS DOUBLE) * n) THEN v END) AS lo,
        |    min(CASE WHEN ct >= ceil(CAST(0.95 AS DOUBLE) * n) THEN v END) AS hi
        |  FROM cum CROSS JOIN tot)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  least(greatest(l_extendedprice, lo), hi) AS l_extendedprice_wins
        |FROM lineitem CROSS JOIN b""".stripMargin,

    // q87: the runtime filter must EQUAL the semi-join — exact keys, no
    // false positives, so the oracle is the plain IN-subquery reduction
    "q87_runtime_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    // q86: grid = per-user generate_series between that user's own hourly
    // bounds (inclusive, like Spark's sequence); LOCF = last_value IGNORE
    // NULLS over the same frame; money stabilized to exact cents
    "q86_gapfill_locf" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |              CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |h AS (SELECT user_id, date_trunc('hour', ts) AS hour,
        |        count(*) AS n, CAST(sum(cents) AS BIGINT) AS v
        |      FROM ev GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM h GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |         FROM sp)
        |SELECT g.user_id, g.hour, coalesce(h.n, 0) AS n,
        |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.hour
        |    ROWS UNBOUNDED PRECEDING) AS v_locf
        |FROM grid g LEFT JOIN h ON h.user_id = g.user_id AND h.hour = g.hour""".stripMargin,

    // q85: the same distribution-first construction — cumulative count
    // over distinct values, bucket = (cum_before * B) // n. IS NOT NULL
    // mirrors the engine's ANALYZE-style NULL exclusion (see q91 note).
    "q85_equidepth_hist" ->
      """WITH vc AS (SELECT l_extendedprice AS v, count(*) AS c
        |            FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |cum AS (SELECT v, c,
        |          coalesce(sum(c) OVER (ORDER BY v
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
        |          (SELECT sum(c) FROM vc) AS n
        |        FROM vc)
        |SELECT CAST((cb * 8) // n AS BIGINT) AS bucket,
        |  CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS ndv,
        |  min(v) AS min_v, max(v) AS max_v
        |FROM cum GROUP BY 1""".stripMargin,

    // q84: per-column UNION ALL mirror of the one-pass profiler; bounds
    // are data values cast to DOUBLE (no arithmetic on them)
    "q84_profile_stats" -> Seq(
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey")
      .map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS ndv,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
           |FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n"),

    // q82: decorate with precomposed accents via translate, fold back with
    // strip_accents (verified bit-equal to the engine's NFD+drop-marks+NFC
    // kernel on the Latin range), then the same case/space canon
    "q82_normalize_text" ->
      """WITH d AS (SELECT doc_id, text,
        |             translate(text, 'aeo', 'áéö') AS decorated
        |           FROM documents)
        |SELECT doc_id, decorated,
        |  trim(regexp_replace(lower(strip_accents(decorated)), '\s+', ' ', 'g')) AS normalized,
        |  trim(regexp_replace(lower(strip_accents(decorated)), '\s+', ' ', 'g')) = text
        |    AS roundtrip_ok
        |FROM d""".stripMargin,

    // q81: stage CTEs chained exactly like the engine's per-stage folds;
    // ts truncated to microseconds FIRST so the >= comparisons see the
    // same instants Spark's ns→µs reader does
    "q81_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |s1 AS (SELECT user_id, min(ts) AS t_view FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(ev.ts) AS t_click FROM ev JOIN s1 USING (user_id)
        |       WHERE ev.event_type = 'click' AND ev.ts >= s1.t_view GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(ev.ts) AS t_purchase FROM ev JOIN s2 USING (user_id)
        |       WHERE ev.event_type = 'purchase' AND ev.ts >= s2.t_click GROUP BY 1)
        |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
        |  CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
        |            WHEN s2.t_click IS NOT NULL THEN 2
        |            WHEN s1.t_view IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS depth
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)""".stripMargin,

    // q80: the salt must be INVISIBLE — the oracle is the plain GROUP BY
    // the two-phase rewrite must equal; value stabilized to exact cents
    "q80_salted_agg" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_total
        |FROM events GROUP BY user_id""".stripMargin,

    // q79: window starts mirrored as range(0, len, stride) (DuckDB range
    // excludes the end = Spark sequence(0, len-1, stride) inclusive), the
    // 1-based inclusive list slice = Spark's slice(arr, start+1, window)
    "q79_context_windows" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w,
        |        unnest(range(0, greatest(len(w), 1), 16)) AS start
        |      FROM t)
        |SELECT doc_id,
        |  CAST(start // 16 AS BIGINT) AS win_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(least(32, len(w) - start) AS BIGINT) AS n_tokens,
        |  array_to_string(w[start + 1 : start + 32], ' ') AS chunk
        |FROM s""".stripMargin,

    // q78: both rankings rebuilt (tf-of-'spark' window, cosine window with
    // the q28 dot-product mirror), RRF = two IEEE divisions summed in fixed
    // order — rank-based fusion, so doubles stay engine-identical
    "q78_rrf_fusion" ->
      """WITH kw0 AS (
        |  SELECT doc_id AS id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t = 'spark')) AS BIGINT) AS score
        |  FROM documents),
        |kw AS (SELECT id, r FROM (
        |  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS BIGINT) AS r FROM kw0)
        |  WHERE r <= 50),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |vs AS (SELECT vec_id AS id,
        |    list_dot_product(embedding::DOUBLE[], q.qv)
        |      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |         * sqrt(list_dot_product(q.qv, q.qv))) AS cos
        |  FROM embeddings CROSS JOIN q),
        |vt AS (SELECT id, r FROM (
        |  SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id ASC) AS BIGINT) AS r FROM vs)
        |  WHERE r <= 50)
        |SELECT id, r_kw, r_vec, rrf FROM (
        |  SELECT coalesce(kw.id, vt.id) AS id, kw.r AS r_kw, vt.r AS r_vec,
        |    coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + kw.r), CAST(0.0 AS DOUBLE))
        |      + coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + vt.r), CAST(0.0 AS DOUBLE)) AS rrf
        |  FROM kw FULL JOIN vt ON kw.id = vt.id)
        |ORDER BY rrf DESC, id ASC LIMIT 20""".stripMargin,

    // q77: the count-min sketch REPLAYED — buckets are md5-derived, the
    // grid is a (row, bucket) SUM, estimates the row-wise MIN: cell-wise
    // addition is commutative so the approximate answer is still a pure
    // function of the token multiset and hash-matches exactly
    "q77_cms_freq" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1),
        |e AS (SELECT token, tf, r,
        |        CAST(('0x' || substr(md5(token || ':' || r), 1, 8))::BIGINT % 256 AS BIGINT) AS b
        |      FROM tf CROSS JOIN (SELECT unnest(range(0, 4)) AS r) x),
        |c AS (SELECT r, b, sum(tf) AS cnt FROM e GROUP BY 1, 2)
        |SELECT token, any_value(tf) AS tf, CAST(min(cnt) AS BIGINT) AS est
        |FROM e JOIN c USING (r, b) GROUP BY token""".stripMargin,

    // q76: scale each dim to 16 bits against its global min/max (IEEE
    // double floor — engine-identical), Morton-interleave with plain
    // shift/mask terms, bucket by the top 8 z-bits
    "q76_zorder_cluster" ->
      """WITH b AS (SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
        |                  min(l_suppkey) AS mins, max(l_suppkey) AS maxs FROM lineitem),
        |s AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |    CAST(floor(CAST(l.l_partkey - b.minp AS DOUBLE) * 65535.0
        |               / greatest(CAST(b.maxp - b.minp AS DOUBLE), 1.0)) AS BIGINT) AS xs,
        |    CAST(floor(CAST(l.l_suppkey - b.mins AS DOUBLE) * 65535.0
        |               / greatest(CAST(b.maxs - b.mins AS DOUBLE), 1.0)) AS BIGINT) AS ys
        |  FROM lineitem l CROSS JOIN b),
        |z AS (
        |  SELECT l_partkey, l_suppkey,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [((xs >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
        |         + ((ys >> i) & 1) * (CAST(2 AS BIGINT) << (2*i)) for i in range(0, 16)]),
        |      (a, x) -> a + x) AS zval
        |  FROM s)
        |SELECT zval >> 24 AS z_bucket, count(*) AS n,
        |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
        |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
        |FROM z GROUP BY 1""".stripMargin,

    // q73: the fixed-point mean mirror — floor(v * 2^24) BIGINTs summed
    // exactly per (label, dim), divided back in double in the same order
    "q73_label_centroids" ->
      """WITH pv AS (
        |  SELECT label,
        |    unnest(list_transform(range(0, len(embedding)),
        |                          i -> {'pos': i, 'v': embedding[CAST(i + 1 AS INT)]})) AS e
        |  FROM embeddings),
        |f AS (SELECT label, CAST(e.pos AS BIGINT) AS pos, CAST(e.v AS DOUBLE) AS v FROM pv)
        |SELECT label, pos, count(*) AS n_vecs,
        |  CAST(sum(CAST(floor(v * 16777216) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 16777216 AS centroid
        |FROM f GROUP BY 1, 2""".stripMargin,

    "q51_token_freq" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""".stripMargin,

    // per-document bin assignment (q52) and its occupancy audit view (q58)
    "q52_packing" -> packAssignSql,
    "q58_pack_stats" ->
      s"""WITH a AS ($packAssignSql)
         |SELECT shard, bin_in_shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM a GROUP BY 1, 2""".stripMargin,

    "q31_multimodal" ->
      """SELECT doc_id AS asset_id,
        |  'application/x-graft-' || source AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 577 AS width,
        |  64 + (CAST(octet_length(encode(text)) AS BIGINT) * 31) % 433 AS height,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_split_to_array(substr(text, 1, 16), ''),
        |        c -> CAST(ord(c) AS BIGINT))),
        |    (acc, x) -> acc + x) AS luma16
        |FROM documents""".stripMargin,

    // the REAL png round trip stays oracle-checkable because the encoded
    // image's pixels are the gridDims resample of the text bytes (ASCII
    // corpus => byte == ord); min grid is 4x4 = 16 px so luma16 always
    // sums exactly the first 16 pixels
    "q60_png_decode" ->
      """WITH t AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |    4 + octet_length(encode(text)) % 13 AS w,
        |    4 + (octet_length(encode(text)) * 7) % 11 AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, w, h,
        |    [CASE WHEN n = 0 THEN 0
        |          ELSE ord(substr(text, CAST((i * n) // (w * h) AS INT) + 1, 1)) END
        |     for i in range(0, w * h)] AS px
        |  FROM t)
        |SELECT doc_id AS asset_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), px[1:16]),
        |       (acc, x) -> acc + x) AS BIGINT) AS luma16,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), px),
        |       (acc, x) -> acc + x) AS BIGINT) AS pix_sum,
        |  true AS decoded
        |FROM p""".stripMargin,

    "q47_set_ops_all" ->
      """WITH high AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25),
        |ret AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
        |SELECT k, n_excess FROM (
        |  SELECT k, count(*) AS n_excess FROM (
        |    SELECT k FROM high EXCEPT ALL SELECT k FROM ret) GROUP BY k
        |  UNION ALL
        |  SELECT -k AS k, count(*) AS n_excess FROM (
        |    SELECT k FROM high INTERSECT ALL SELECT k FROM ret) GROUP BY k)
        |WHERE n_excess >= 3""".stripMargin,

    "q48_array_hofs" ->
      """SELECT l_orderkey,
        |  len(list_filter(qs, q -> q >= 45)) > 0 AS has_bulk,
        |  len(list_filter(qs, q -> NOT q > 0)) = 0 AS all_positive,
        |  CAST(len(list_filter(qs, q -> q % 2 = 0)) AS BIGINT) AS n_even,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [qs[i] * qs[len(qs) - i + 1] for i in range(1, len(qs) + 1)]),
        |    (acc, x) -> acc + x) AS rev_dot
        |FROM (
        |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)""".stripMargin,

    "q45_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order,
        |  percent_rank() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q46_edit_distance" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS name_seg_dist,
        |  CAST(levenshtein(substr(c_name, 1, 10), reverse(substr(c_name, 1, 10))) AS BIGINT)
        |    AS palindrome_dist
        |FROM customer""".stripMargin,

    "q43_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    // floor(), not a bare BIGINT cast: DuckDB's double->int cast ROUNDS the
    // sub-second fraction while Spark's unix_timestamp truncates — invisible
    // at sf0.01, caught at sf0.1 where two events straddled a window edge
    "q44_range_window" ->
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_last_hour
        |FROM events""".stripMargin,

    "q40_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  min(l_extendedprice) AS lo,
        |  max(l_extendedprice) AS hi
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q41_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) / count(*) AS DOUBLE)
        |  FROM orders) * 1.5""".stripMargin,

    "q42_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    // ASCII corpus: byte at offset o == ord of character o+1 (1-based substr)
    "q39_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |  CAST(o AS BIGINT) AS frame_off,
        |  CAST(ord(substr(text, CAST(o AS INT) + 1, 1)) AS BIGINT) AS frame_byte
        |FROM documents, LATERAL (
        |  SELECT unnest(range(0, length(text), 16)) AS o)""".stripMargin,

    "q32_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |i AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS island
        |  FROM o)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL '6 hours', '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM i GROUP BY user_id, island""".stripMargin,

    "q36_tz_shift" ->
      """SELECT CAST(hour(ts + INTERVAL '5 hours 30 minutes') AS BIGINT) AS local_hour,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    // the map build/explode round-trips the grouped counts, so the oracle is
    // the flat per-(user, type) count — exercising map_from_entries/explode
    // against a semantics-equivalent relational form
    "q37_map_funcs" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q57_kmeans_ivf" -> kmeansIvfSql,

    "q35_ann_ivf" -> annIvfSql,

    "q34_asof_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey % 150 AS user_id, o_orderdate FROM orders),
        |e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts, event_id, event_type, value
        |  FROM events),
        |j AS (
        |  SELECT o.o_orderkey, e.event_type, e.value,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |                       ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM o JOIN e ON o.user_id = e.user_id AND e.ts <= o.o_orderdate)
        |SELECT o.o_orderkey, o.user_id,
        |  j.event_type AS last_type, j.value AS last_value
        |FROM o LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
        |  ON o.o_orderkey = j.o_orderkey""".stripMargin,

    "q33_sliding_window" ->
      """SELECT
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
        |  event_type, count(*) AS n
        |FROM (
        |  SELECT event_type, ts,
        |    unnest([time_bucket(INTERVAL '5 minutes', ts),
        |            time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws
        |  FROM events)
        |WHERE ts >= ws AND ts < ws + INTERVAL '10 minutes'
        |GROUP BY 1, 2, 3""".stripMargin
  )

  /** q22 (and q196's confusion-matrix leg): the marker-token language-ID replay. */
  private[queries] lazy val langIdSql: String =
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('table','row','merge'))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','fast'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('data','query','small'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('stream','filter','sort'))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('hash','scan','key'))) AS BIGINT) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang,
        |  (CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |        WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |        WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |        WHEN s_fr >= s_zh THEN 'fr'
        |        ELSE 'zh' END) = lang AS is_correct
        |FROM s""".stripMargin

  /** q29 (and q194's exact leg): the brute-force near-dup pair scan. */
  private[queries] lazy val embedNearDupSql: String =
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a_id, b_id, cosine FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.45""".stripMargin

  /** q35 (and q192's IVF leg): the stride-quantizer IVF replay. */
  private[queries] lazy val annIvfSql: String =
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, v AS cent_v FROM e WHERE vec_id % 50 = 0),
        |assign AS (
        |  SELECT x.vec_id AS x_id, x.v AS x_v, c.cent_id,
        |    row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |      list_dot_product(x.v, c.cent_v)
        |        / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(c.cent_v, c.cent_v))) DESC,
        |      c.cent_id ASC) AS crnk
        |  FROM e x CROSS JOIN cents c),
        |cells AS (SELECT x_id AS c_id, x_v AS c_v, cent_id FROM assign WHERE crnk = 1),
        |probes AS (SELECT x_id AS q_id, x_v AS q_v, cent_id FROM assign
        |           WHERE crnk <= 3 AND x_id % 25 = 0),
        |scored AS (
        |  SELECT p.q_id, s.c_id,
        |    list_dot_product(p.q_v, s.c_v)
        |      / (sqrt(list_dot_product(p.q_v, p.q_v)) * sqrt(list_dot_product(s.c_v, s.c_v))) AS cosine
        |  FROM probes p JOIN cells s USING (cent_id) WHERE p.q_id <> s.c_id)
        |SELECT q_id, c_id, rnk, cosine FROM (
        |  SELECT q_id, c_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS BIGINT) AS rnk
        |  FROM scored) WHERE rnk <= 10""".stripMargin

  /** The q75 BPE oracle: replay `k` merge rounds. Round r: split the
    * bar-wrapped segmentation back into symbols, count adjacent pairs
    * weighted by word count, pick the (count DESC, pair ASC) argmax, and
    * apply it as one literal replace — identical non-overlapping
    * left-to-right semantics in both engines (= BPE's greedy merge). */
  /** The q96 PCA oracle: quantize → integer center → exact-integer
    * scatter → k power-iteration rounds. Every corpus-order reduction is
    * integer (commutes); every floating-point fold is in-row with fixed
    * element order (`list_dot_product` = the engine's zip_with/aggregate
    * fold, the equality q28 already proves), so the loadings hash-match.
    * `//` truncates toward zero in DuckDB exactly like Spark's `div`. */
  /** The shared q96/q98 WITH-body: quantize → integer center (vec_id
    * carried through `cen` for the projection consumer) → exact-integer
    * scatter → k power-iteration rounds ending at `r$k`. */
  private def pcaCtes(k: Int): String = {
    val rounds = (1 to k).map { i =>
      val prev = s"r${i - 1}"
      s"""w$i AS MATERIALIZED (
         |  SELECT j, list_dot_product(srow, (SELECT v FROM $prev)) AS w FROM srows),
         |a$i AS MATERIALIZED (SELECT list(w ORDER BY j) AS warr FROM w$i),
         |r$i AS MATERIALIZED (
         |  SELECT list_transform(warr, x -> x / sqrt(list_dot_product(warr, warr))) AS v,
         |         sqrt(list_dot_product(warr, warr)) AS norm
         |  FROM a$i)""".stripMargin
    }.mkString(",\n")
    s"""q AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
       |             x -> CAST(floor(x * 1048576) AS BIGINT)) AS q FROM embeddings),
       |ex AS (SELECT unnest(q) AS qv, generate_subscripts(q, 1) - 1 AS j FROM q),
       |m AS (SELECT j, CAST(CAST(sum(qv) AS BIGINT) // count(*) AS BIGINT) AS m
       |      FROM ex GROUP BY 1),
       |marr AS (SELECT list(m ORDER BY j) AS marr FROM m),
       |cen AS MATERIALIZED (
       |  SELECT q.vec_id, [q.q[i] - ma.marr[i] for i in range(1, len(q.q) + 1)] AS c
       |  FROM q CROSS JOIN marr ma),
       |e1 AS (SELECT c, unnest(c) AS cj, generate_subscripts(c, 1) - 1 AS j FROM cen),
       |e2 AS (SELECT j, cj, unnest(c) AS ck, generate_subscripts(c, 1) - 1 AS k FROM e1),
       |sjk AS MATERIALIZED (
       |  SELECT j, k, CAST(sum(cj * ck) AS BIGINT) AS s FROM e2 GROUP BY 1, 2),
       |srows AS MATERIALIZED (
       |  SELECT j, list(CAST(s AS DOUBLE) ORDER BY k) AS srow FROM sjk GROUP BY j),
       |r0 AS (SELECT list_transform(marr, x -> CAST(1.0 AS DOUBLE)) AS v FROM marr),
       |$rounds""".stripMargin
  }

  private def pcaSql(k: Int): String =
    s"""WITH ${pcaCtes(k)}
       |SELECT CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim,
       |  unnest(v) AS loading, norm AS eigval FROM r$k""".stripMargin

  /** q98: project every centered vector onto the fitted component (the
    * same fixed-order fold as training) and keep the top-|proj| rows. */
  private def pcaOutlierSql(k: Int, topN: Int): String =
    s"""WITH ${pcaCtes(k)},
       |projv AS (SELECT vec_id,
       |    list_dot_product(list_transform(c, x -> CAST(x AS DOUBLE)),
       |                     (SELECT v FROM r$k)) AS proj
       |  FROM cen)
       |SELECT vec_id, proj FROM projv
       |ORDER BY abs(proj) DESC, vec_id ASC LIMIT $topN""".stripMargin

  /** The q83 PageRank oracle: the fixed-point iteration replayed as k
    * chained MATERIALIZED CTEs. `//` is DuckDB integer division = Spark's
    * `div` on the all-positive rank domain; the contribution sum is BIGINT
    * addition — order-free — so every round is bit-exact. */
  private def pageRankSql(k: Int): String = {
    val scale = 1L << 40
    val rounds = (1 to k).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS MATERIALIZED (SELECT nodes.node,
         |  CAST(((15 * CAST($scale AS BIGINT)) // 100) // nn.n
         |    + (85 * coalesce(c.contrib, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS rank
         |FROM nodes CROSS JOIN nn LEFT JOIN (
         |  SELECT e.dst, CAST(sum($prev.rank // od.outdeg) AS BIGINT) AS contrib
         |  FROM e JOIN $prev ON $prev.node = e.src JOIN od ON od.src = e.src
         |  GROUP BY e.dst) c ON c.dst = nodes.node)""".stripMargin
    }.mkString(",\n")
    // MATERIALIZED on the loop INVARIANTS too (round 10): every round
    // references e/nodes/nn/od, and each of those references e (itself a
    // 2-way dedup over the lineitem⋈orders pair build) — DuckDB's default
    // inlining recomputed the whole edge build ~6× per round, which at the
    // ×10 gate spilled >79 GB (ENOSPC) before any round finished. The same
    // oracle-side lineage-cut rule the engine's IterativeLoop enforces.
    s"""WITH p AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS MATERIALIZED (SELECT 2*ck AS src, 2*sk + 1 AS dst FROM p
       |      UNION SELECT 2*sk + 1 AS src, 2*ck AS dst FROM p),
       |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT node, CAST(CAST($scale AS BIGINT) // nn.n AS BIGINT) AS rank
       |       FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT node, rank FROM r$k""".stripMargin
  }

  /** The shared BPE training replay: `tok`, `v0`, and the k chained
    * (pair-count → argmax → replace) rounds, ending at `b1..bk`/`vk`.
    * MATERIALIZED is load-bearing: each round references its predecessor
    * several times (pair CTE + argmax scalar subqueries + the replace),
    * so default CTE inlining would expand the plan exponentially in k. */
  private def bpeRoundCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT pr.l AS l, pr.r AS r, sum(n) AS cnt FROM (
         |    SELECT n, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS pr
         |    FROM (SELECT string_split(trim(repr, '|'), '||') AS s, n FROM v${r - 1}))
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT replace(repr,
         |           '|' || (SELECT l FROM b$r) || '||' || (SELECT r FROM b$r) || '|',
         |           '|' || (SELECT l FROM b$r) || (SELECT r FROM b$r) || '|') AS repr, n
         |  FROM v${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |v0 AS MATERIALIZED (
       |  SELECT '|' || list_aggregate(regexp_split_to_array(w, ''), 'string_agg', '||') || '|' AS repr,
       |         count(*) AS n
       |  FROM tok GROUP BY w),
       |$rounds""".stripMargin
  }

  private def bpeSql(k: Int): String = {
    val out = (1 to k).map { r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS l_sym, r AS r_sym, " +
        s"l || r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b$r"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeRoundCtes(k)}
       |$out""".stripMargin
  }

  /** q111: training replayed (bpeRoundCtes), then every document encoded
    * with the learned chain — the same per-word bar representation and the
    * same k literal replaces in rank order, applied inside a list
    * comprehension so word order (and thus the joined piece sequence) is
    * the document's own. */
  private[queries] def bpeEncodeSql(k: Int): String = {
    // DuckDB forbids subqueries inside lambdas, so the k merge pairs are
    // hoisted into one cross-joined row (m) and the chain references its
    // columns — plain outer-column capture, which lambdas do allow
    val mergeRow = (1 to k).map { r =>
      s"(SELECT l FROM b$r) AS l$r, (SELECT r FROM b$r) AS r$r"
    }.mkString(",\n    ")
    val wordRepr =
      "'|' || list_aggregate(regexp_split_to_array(w, ''), 'string_agg', '||') || '|'"
    val chain = (1 to k).foldLeft(wordRepr) { (prev, r) =>
      s"""replace($prev,
         |  '|' || m.l$r || '||' || m.r$r || '|',
         |  '|' || m.l$r || m.r$r || '|')""".stripMargin
    }
    s"""WITH ${bpeRoundCtes(k)},
       |m AS MATERIALIZED (SELECT
       |    $mergeRow),
       |enc AS MATERIALIZED (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    flatten([string_split(trim($chain, '|'), '||')
       |             for w in string_split(text, ' ')]) AS ps
       |  FROM documents CROSS JOIN m)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(len(ps) AS BIGINT) AS n_pieces,
       |  list_aggregate(ps, 'string_agg', ' ') AS encoded,
       |  CAST(len(ps) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS pieces_per_token
       |FROM enc""".stripMargin
  }

  /** q112: the DSIR replay. `lg` is the engine's exact-arithmetic
    * piecewise-linear log2 — (L-1) + (x - 2^(L-1)) / 2^(L-1) with
    * L = length(bin(x)) — integer ops, one IEEE divide, one IEEE add, so
    * DuckDB reproduces Spark's doubles bit-for-bit (same parenthesization
    * on both sides, which IS the determinism contract). Target subset =
    * the q72 gate's pass set; per-doc weight = the fixed-order
    * `list_reduce` fold of per-token bucket contributions, mirroring the
    * engine's `aggregate` over the token array. */
  /** Exact-arithmetic piecewise-linear log2 (the engine's `lg` — see
    * Curation.lg): (L-1) + (x - 2^(L-1)) / 2^(L-1), L = bitlength. */
  /** The q119 fuzzy-candidate CTE chain (prefixes, blocks, bigram
    * multiset intersection) ending in `i(a_id, b_id, na, nb, inter)` —
    * UNTHRESHOLDED; consumers apply the Dice cut. Shared by q119 and
    * the q442 one-to-one assignment oracle ([[OraclesRx]]). A `def`
    * deliberately: the `all` map initializes earlier in this object, so
    * a val here would still be null when the map captures it. */
  private[queries] def fuzzyPairsCte: String =
    """p AS (SELECT doc_id AS k, lang AS blk, substr(text, 1, 40) AS s
      |           FROM documents WHERE len(substr(text, 1, 40)) >= 2),
      |bg AS (SELECT k, gram, count(*) AS c FROM (
      |  SELECT k, unnest([substr(s, i, 2) for i in range(1, len(s))]) AS gram
      |  FROM p) GROUP BY 1, 2),
      |n AS (SELECT k, blk, len(s) - 1 AS nbg FROM p),
      |pairs AS (SELECT a.k AS a_id, b.k AS b_id, a.nbg AS na, b.nbg AS nb
      |          FROM n a JOIN n b ON a.blk = b.blk AND a.k < b.k),
      |i AS (SELECT pr.a_id, pr.b_id, pr.na, pr.nb,
      |        CAST(sum(least(ga.c, gb.c)) AS BIGINT) AS inter
      |      FROM pairs pr
      |      JOIN bg ga ON ga.k = pr.a_id
      |      JOIN bg gb ON gb.k = pr.b_id AND ga.gram = gb.gram
      |      GROUP BY 1, 2, 3, 4)""".stripMargin

  private[queries] def lgSqlOf(x: String): String = {
    val p = s"(CAST(1 AS BIGINT) << (length(bin($x)) - 1))"
    s"(CAST(length(bin($x)) - 1 AS DOUBLE) + CAST(($x) - $p AS DOUBLE) / CAST($p AS DOUBLE))"
  }

  /** q122: the BM25 replay — the workload is the shared
    * [[CatalogExt.Bm25Workload]] literal; arithmetic mirrors
    * [[graft.sim.Bm25]] parenthesis-for-parenthesis (exact-lg idf over
    * integer args, one-divide avgdl, fixed-order fold over terms asc). */
  private lazy val bm25Sql: String = {
    val values = CatalogExt.Bm25Workload
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val vocab = CatalogExt.Bm25Workload.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    s"""WITH qt(query_id, term) AS (VALUES $values),
       |base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM base),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |               CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
       |post AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS tok FROM base)
       |  WHERE tok IN ($vocab) GROUP BY 1, 2),
       |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM post GROUP BY 1),
       |sc AS (SELECT qt.query_id, p.doc_id, p.tok,
       |    (${lgSqlOf("n_docs + 1")} - ${lgSqlOf("df_t")}) *
       |      ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
       |        (CAST(tf AS DOUBLE) + 1.2 *
       |          (1.0 - 0.75 + 0.75 * (CAST(dl.dl AS DOUBLE) /
       |            (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
       |  FROM post p JOIN qt ON qt.term = p.tok
       |  JOIN dfc ON dfc.tok = p.tok
       |  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN st),
       |agg AS (SELECT query_id, doc_id,
       |    CAST(count(*) AS BIGINT) AS n_terms,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY tok)),
       |      (a, x) -> a + x) AS score
       |  FROM sc GROUP BY 1, 2)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rk, n_terms, score
       |FROM (SELECT query_id, doc_id, n_terms, score,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
       |      FROM agg) WHERE rk <= 10""".stripMargin
  }

  /** q123: the fixed-point LR replay. Every round is one CTE: the hard
    * sigmoid is the same clamp+floor over exact doubles, gradients are
    * BIGINT sums (order-free on both engines), the step is the same
    * floor-divide — mirrors [[graft.model.QualityLr]] op for op. */
  private[queries] def qualityLrSql(rounds: Int): String = {
    def pSql(w: String) =
      s"""least(greatest(CAST(floor(CAST($w.w0*x0 + $w.w1*x1 + $w.w2*x2 + $w.w3*x3
         | AS DOUBLE) / 4.0) AS BIGINT) + 32768,
         | CAST(0 AS BIGINT)), CAST(65536 AS BIGINT))""".stripMargin.replace("\n", "")
    def upd(j: Int) =
      s"""max(w$j) - CAST(floor(CAST(sum((p - y*65536) * x$j) AS DOUBLE) /
         | (1024.0 * CAST(max(n) AS DOUBLE))) AS BIGINT) AS w$j""".stripMargin.replace("\n", "")
    val roundCtes = (1 to rounds).map { k =>
      val prev = if (k == 1) "w0t" else s"r${k - 1}"
      s"""r$k AS (SELECT ${upd(0)}, ${upd(1)}, ${upd(2)}, ${upd(3)}, max(n) AS n
         |  FROM (SELECT f.*, t.n, t.w0, t.w1, t.w2, t.w3, ${pSql("t")} AS p
         |        FROM f CROSS JOIN $prev t))""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS x1,
       |    CAST(len(list_filter(w, t -> t IN $stop)) AS BIGINT) AS x2,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(w, t -> CAST(length(t) AS BIGINT))),
       |         (acc, x) -> acc + x) AS BIGINT) AS x3,
       |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_ngrams,
       |    CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                            for i in range(1, len(w) - 1)])) AS BIGINT) AS n_distinct
       |  FROM b),
       |f AS (SELECT doc_id, CAST(1 AS BIGINT) AS x0,
       |    abs(x1 - 55) AS x1, x2, abs(x3*2 - x1*11) AS x3,
       |    CAST((x1 BETWEEN 20 AND 90)
       |      AND (CAST(x3 AS DOUBLE) / CAST(x1 AS DOUBLE) >= 3.0
       |           AND CAST(x3 AS DOUBLE) / CAST(x1 AS DOUBLE) <= 8.0)
       |      AND x2 >= 2
       |      AND ((CASE WHEN n_ngrams > 0
       |                 THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
       |                 ELSE 0.0 END) <= 0.2) AS BIGINT) AS y
       |  FROM s),
       |w0t AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |               CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
       |               CAST(count(*) AS BIGINT) AS n FROM f),
       |$roundCtes
       |SELECT f.doc_id, f.y,
       |  (t.w0*x0 + t.w1*x1 + t.w2*x2 + t.w3*x3) AS z,
       |  ${pSql("t")} AS p,
       |  ${pSql("t")} * 2 > 65536 AS pred
       |FROM f CROSS JOIN r$rounds t""".stripMargin
  }

  /** q124: aHash near-dup replay — pixels from the byte-resample grid
    * (shared with q60), the 8×8 nearest-neighbor downsample, the
    * no-divide mean test (64·v > Σv), 16-bit bands, band-bucket join,
    * bit_count(xor) Hamming — mirroring
    * [[graft.multimodal.Multimodal.imageNearDupPairs]]. */
  private lazy val aHashNearDupSql: String = {
    def band(b: Int) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CASE WHEN 64 * v[${8 * b} + j + 1] > s THEN CAST(1 AS BIGINT) << j
         |            ELSE CAST(0 AS BIGINT) END for j in range(0, 8)]),
         |    (a, x) -> a + x) AS b$b""".stripMargin
    val ham = (0 to 7).map(i => s"bit_count(xor(a$i, c$i))").mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS n,
       |    4 + octet_length(encode(text)) % 13 AS w,
       |    4 + (octet_length(encode(text)) * 7) % 11 AS h
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, w, h,
       |    [CASE WHEN n = 0 THEN 0
       |          ELSE ord(substr(text, CAST((i * n) // (w * h) AS INT) + 1, 1)) END
       |     for i in range(0, w * h)] AS px
       |  FROM t),
       |sv AS (SELECT doc_id,
       |    [CAST(px[((i // 8) * h // 8) * w + ((i % 8) * w // 8) + 1] AS BIGINT)
       |     for i in range(0, 64)] AS v
       |  FROM p),
       |hh AS (SELECT doc_id, v,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), v), (a, x) -> a + x) AS s
       |  FROM sv),
       |bands AS (SELECT doc_id, ${(0 to 7).map(band).mkString(", ")} FROM hh),
       |e AS (SELECT doc_id, b0, b1, b2, b3, b4, b5, b6, b7, bi,
       |        [b0, b1, b2, b3, b4, b5, b6, b7][bi + 1] AS bv
       |      FROM bands CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS bi)),
       |pr AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |         ${(0 to 7).map(i => s"a.b$i AS a$i").mkString(", ")},
       |         ${(0 to 7).map(i => s"b.b$i AS c$i").mkString(", ")}
       |       FROM e a JOIN e b ON a.bi = b.bi AND a.bv = b.bv
       |         AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, CAST($ham AS BIGINT) AS hamming
       |FROM pr WHERE $ham <= 7""".stripMargin
  }

  /** q125: the JL projection replay — per output dim, a seeded
    * fixed-order list_reduce over sign·x products with the SAME literal
    * sign matrix ([[graft.sim.Similarity.rademacherSign]], generated
    * driver-side and printed into the SQL). */
  private def randomProjectSql(inDims: Int, outDims: Int): String = {
    val ys = (0 until outDims).map { j =>
      val signs = (0 until inDims)
        .map(i => s"${graft.sim.Similarity.rademacherSign(j, i)}.0")
        .mkString(", ")
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      [CAST(embedding[i + 1] AS DOUBLE) * ([$signs][i + 1])
         |       for i in range(0, $inDims)]),
         |    (a, x) -> a + x) AS y$j""".stripMargin
    }.mkString(",\n")
    val ycols = (0 until outDims).map(j => s"y$j").mkString(", ")
    val dims = (0 until outDims).mkString(", ")
    s"""WITH ys AS (SELECT vec_id,
       |$ys
       |FROM embeddings)
       |SELECT vec_id, CAST(d.j AS BIGINT) AS dim, [$ycols][d.j + 1] AS val
       |FROM ys CROSS JOIN (SELECT unnest([$dims]) AS j) d""".stripMargin
  }

  /** q126: the greedy k-center replay — mirrors
    * [[graft.sim.Similarity.kCenterCoreset]] round for round. */
  private def kCenterSql(k: Int, dims: Int): String = {
    val sq = s"(CAST(e.embedding[i] AS DOUBLE) - CAST(c.vec[i] AS DOUBLE))"
    val d2 =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         | [$sq * $sq for i in range(1, ${dims + 1})]), (a, x) -> a + x)"""
        .stripMargin.replace("\n", "")
    val rounds = (1 until k).map { t =>
      s"""m$t AS (SELECT e.vec_id, e.embedding, min($d2) AS md
         |        FROM embeddings e CROSS JOIN u${t - 1} c GROUP BY 1, 2),
         |u$t AS (SELECT round, vec_id, vec, d2 FROM u${t - 1}
         |        UNION ALL
         |        (SELECT CAST($t AS BIGINT) AS round, vec_id,
         |                embedding AS vec, md AS d2
         |         FROM m$t ORDER BY md DESC, vec_id ASC LIMIT 1))""".stripMargin
    }.mkString(",\n")
    s"""WITH u0 AS (SELECT CAST(0 AS BIGINT) AS round, vec_id,
       |    embedding AS vec, CAST(0.0 AS DOUBLE) AS d2
       |  FROM embeddings WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |$rounds
       |SELECT round, vec_id, d2 FROM u${k - 1}""".stripMargin
  }

  /** q131: the MMR replay — mirrors [[graft.sim.Similarity.mmrTopK]]
    * round for round (λ·rel − (1−λ)·maxSim with the engine's exact
    * parenthesization; round 1's redundancy term is the coalesced 0.0). */
  private def mmrSql(k: Int, lambda: Double): String = {
    def cos(a: String, b: String) =
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
        s"sqrt(list_dot_product($b, $b)))"
    def mmr(ms: String) = s"$lambda * rel - (1.0 - $lambda) * $ms"
    def winner(t: Int, from: String, ms: String) =
      s"""w$t AS (SELECT q_id, CAST($t AS BIGINT) AS round, c_id, cv, mmr FROM (
         |  SELECT q_id, c_id, cv, ${mmr(ms)} AS mmr,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${mmr(ms)} DESC, c_id ASC) AS rn
         |  FROM $from) WHERE rn = 1)""".stripMargin
    val rounds = (2 to k).map { t =>
      s"""m$t AS (SELECT r.q_id, r.c_id, r.cv, r.rel,
         |    max(${cos("r.cv", "s.cv")}) AS ms
         |  FROM rel r JOIN u${t - 1} s USING (q_id)
         |  LEFT JOIN u${t - 1} x ON x.q_id = r.q_id AND x.c_id = r.c_id
         |  WHERE x.c_id IS NULL GROUP BY 1, 2, 3, 4),
         |${winner(t, s"m$t", "ms")},
         |u$t AS (SELECT * FROM u${t - 1} UNION ALL SELECT * FROM w$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0),
       |c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |rel AS (SELECT q_id, c_id, cv, ${cos("qv", "cv")} AS rel
       |  FROM c JOIN q ON q.q_id <> c.c_id),
       |${winner(1, "rel", "0.0")},
       |u1 AS (SELECT * FROM w1),
       |$rounds
       |SELECT q_id, round, c_id, mmr FROM u$k""".stripMargin
  }

  /** q132: the label-propagation replay — edges from [[embedLshSql]]
    * (inlined as a derived table), then `rounds` chained synchronous
    * majority CTEs mirroring [[graft.graph.Graph.labelPropagation]]. */
  private def labelPropSql(rounds: Int): String = {
    // MATERIALIZED is load-bearing on pairs/und/l_t (round 10): each l_t
    // references l_{t-1} TWICE (the vote join and the carry-forward), so
    // default inlining re-evaluates the chain 2^rounds times — and every
    // re-evaluation re-runs the full LSH pair pipeline, whose 4-bit/16-
    // bucket candidate join is ~50M pairs at the ×10 gate (it spilled
    // >79 GB before finishing). Materialized, the pipeline runs once.
    val roundCtes = (1 to rounds).map { t =>
      s"""v$t AS (SELECT u.dst, l.lab, CAST(count(*) AS BIGINT) AS c
         |  FROM und u JOIN l${t - 1} l ON l.id = u.src
         |  WHERE l.lab IS NOT NULL GROUP BY 1, 2),
         |w$t AS (SELECT dst, lab AS wlab FROM (
         |  SELECT dst, lab, row_number() OVER (PARTITION BY dst
         |    ORDER BY c DESC, lab ASC) AS rn FROM v$t) WHERE rn = 1),
         |l$t AS MATERIALIZED (SELECT l.id,
         |    CASE WHEN l.seeded THEN l.lab ELSE coalesce(w.wlab, l.lab) END AS lab,
         |    l.seeded
         |  FROM l${t - 1} l LEFT JOIN w$t w ON w.dst = l.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT a_id, b_id FROM ($embedLshSql)),
       |und AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM pairs
       |        UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
       |l0 AS (SELECT vec_id AS id,
       |    CASE WHEN vec_id % 5 = 0 THEN CAST(label AS BIGINT) END AS lab,
       |    vec_id % 5 = 0 AS seeded
       |  FROM embeddings),
       |$roundCtes
       |SELECT l.id AS vec_id, l.seeded, l.lab AS label,
       |  l.lab = CAST(e.label AS BIGINT) AS correct
       |FROM l$rounds l JOIN embeddings e ON e.vec_id = l.id""".stripMargin
  }

  /** q138: one LEFT-JOIN audit block per declared FK relationship. */
  private lazy val fkOrphansSql: String = {
    val rels = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
    rels.map { case (name, child, fk, parent, pk) =>
      s"""SELECT '$name' AS relationship,
         |  CAST(count(*) AS BIGINT) AS n_child,
         |  CAST(count(CASE WHEN p.$pk IS NULL THEN 1 END) AS BIGINT) AS n_orphans
         |FROM $child ch LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
         |  ON ch.$fk = p.$pk""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** q149: the k-core peel replay — mirrors
    * [[graft.graph.Graph.kCore]] round for round. */
  private def kCoreSql(k: Int, rounds: Int): String = {
    // every e_t is referenced three times by round t+1 — without
    // MATERIALIZED DuckDB inlines the chain 3^rounds times and runs out
    // of file handles on the base scans
    val roundCtes = (1 to rounds).map { t =>
      s"""d$t AS MATERIALIZED (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
         |    SELECT u AS id FROM e${t - 1} UNION ALL SELECT v FROM e${t - 1})
         |  GROUP BY 1),
         |k$t AS MATERIALIZED (SELECT id FROM d$t WHERE degree >= $k),
         |e$t AS MATERIALIZED (SELECT u, v FROM e${t - 1}
         |        WHERE u IN (SELECT id FROM k$t)
         |          AND v IN (SELECT id FROM k$t))""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
       |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(c, s) AS u, greatest(c, s) AS v FROM p),
       |$roundCtes
       |SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
       |  SELECT u AS id FROM e$rounds UNION ALL SELECT v FROM e$rounds)
       |GROUP BY 1""".stripMargin
  }

  /** q150: the report-card replay. */
  private lazy val corpusReportSql: String =
    s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_src,
       |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_total,
       |    CAST(sum(CAST(floor(${qualitySqlOf("text")} * 1000000.0) AS BIGINT))
       |      AS BIGINT) AS q_total
       |  FROM documents),
       |g AS (SELECT CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |      FROM ($gopherRulesSql)),
       |le AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
       |         (${lgSqlOf("n")} - ${lgSqlOf("c")}) ORDER BY lang)),
       |    (a, x) -> a + x) AS lang_entropy_bits
       |  FROM (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1)
       |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM documents))
       |SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM a
       |UNION ALL SELECT 'n_sources', CAST(n_src AS DOUBLE) FROM a
       |UNION ALL SELECT 'exact_dup_rate',
       |  1.0 - CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE) FROM a
       |UNION ALL SELECT 'mean_tokens',
       |  CAST(tok_total AS DOUBLE) / CAST(n AS DOUBLE) FROM a
       |UNION ALL SELECT 'mean_quality',
       |  (CAST(q_total AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE) FROM a
       |UNION ALL SELECT 'gate_pass_share',
       |  CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) FROM g CROSS JOIN a
       |UNION ALL SELECT 'lang_entropy_bits', lang_entropy_bits FROM le""".stripMargin

  /** The q72 gate replay, shared with q121's label side. */
  private lazy val gopherRulesSql: String =
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(w, t -> CAST(length(t) AS BIGINT))),
         |         (acc, x) -> acc + x) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_tok,
         |    CAST(len(list_filter(w, t -> t IN $stop)) AS BIGINT) AS n_stop,
         |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_ngrams,
         |    CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                            for i in range(1, len(w) - 1)])) AS BIGINT) AS n_distinct
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
         |SELECT doc_id,
         |  n_tokens BETWEEN 20 AND 90 AS r_len,
         |  avg_tok >= 3.0 AND avg_tok <= 8.0 AS r_tok_len,
         |  n_stop >= 2 AS r_stop,
         |  (CASE WHEN n_ngrams > 0
         |        THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
         |        ELSE 0.0 END) <= 0.2 AS r_rep,
         |  (n_tokens BETWEEN 20 AND 90)
         |    AND (avg_tok >= 3.0 AND avg_tok <= 8.0)
         |    AND (n_stop >= 2)
         |    AND ((CASE WHEN n_ngrams > 0
         |               THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
         |               ELSE 0.0 END) <= 0.2) AS pass
         |FROM s""".stripMargin

  /** q121: score = dsirSql's weight, label = the q72 gate's pass bit,
    * both embedded as derived tables; the sweep mirrors the engine's
    * guard/clamp/threshold arithmetic exactly. */
  private lazy val thresholdSweepSql: String = {
    val bins = 32
    s"""WITH sc AS (SELECT doc_id, dsir_weight AS s FROM (${dsirSql(64)})),
       |lab AS (SELECT doc_id, pass AS y FROM (${gopherRulesSql})),
       |j AS (SELECT sc.s, lab.y FROM sc JOIN lab USING (doc_id)),
       |mm AS (SELECT min(s) AS lo, max(s) AS hi FROM j),
       |bb AS (SELECT CASE WHEN hi = lo THEN ${bins - 1}
       |              ELSE least(greatest(CAST(floor((s - lo) / (hi - lo) * $bins)
       |                     AS BIGINT), 0), ${bins - 1}) END AS b, y
       |       FROM j CROSS JOIN mm),
       |cnt AS (SELECT b, y, count(*) AS n FROM bb GROUP BY 1, 2),
       |sw AS (
       |  SELECT bn.bin,
       |    CAST(coalesce(sum(CASE WHEN cnt.b >= bn.bin AND cnt.y THEN cnt.n END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN cnt.b >= bn.bin AND NOT cnt.y THEN cnt.n END), 0) AS BIGINT) AS fp,
       |    CAST(coalesce(sum(CASE WHEN cnt.b < bn.bin AND cnt.y THEN cnt.n END), 0) AS BIGINT) AS fn,
       |    CAST(coalesce(sum(CASE WHEN cnt.b < bn.bin AND NOT cnt.y THEN cnt.n END), 0) AS BIGINT) AS tn
       |  FROM (SELECT CAST(unnest(range(0, $bins)) AS BIGINT) AS bin) bn CROSS JOIN cnt
       |  GROUP BY 1)
       |SELECT sw.bin, mm.lo + CAST(sw.bin AS DOUBLE) * ((mm.hi - mm.lo) / $bins) AS thr,
       |  tp, fp, fn, tn,
       |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END AS tpr,
       |  CASE WHEN fp + tn > 0 THEN CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) ELSE 0.0 END AS fpr,
       |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END AS prec
       |FROM sw CROSS JOIN mm""".stripMargin
  }

  /** q113: HITS replayed round by round — raw sums, L1 totals, integer
    * normalize — exactly the engine's fixed-point update chain. */
  private def hitsSql(k: Int): String = {
    val scale = 1L << 30
    val rounds = (1 to k).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT nodes.node, CAST(coalesce(s.raw, 0) AS BIGINT) AS raw
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst, CAST(sum(h.hub) AS BIGINT) AS raw
         |    FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst) s
         |  ON s.dst = nodes.node),
         |at$i AS (SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS tot FROM ar$i),
         |a$i AS MATERIALIZED (
         |  SELECT node, CAST((raw * CAST($scale AS BIGINT)) // tot AS BIGINT) AS auth
         |  FROM ar$i CROSS JOIN at$i),
         |hr$i AS MATERIALIZED (
         |  SELECT nodes.node, CAST(coalesce(s.raw, 0) AS BIGINT) AS raw
         |  FROM nodes LEFT JOIN (
         |    SELECT e.src, CAST(sum(a.auth) AS BIGINT) AS raw
         |    FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src) s
         |  ON s.src = nodes.node),
         |ht$i AS (SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS tot FROM hr$i),
         |h$i AS MATERIALIZED (
         |  SELECT node, CAST((raw * CAST($scale AS BIGINT)) // tot AS BIGINT) AS hub
         |  FROM hr$i CROSS JOIN ht$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT 2 * ck AS src, 2 * sk + 1 AS dst FROM p),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |h0 AS (SELECT node, CAST(CAST($scale AS BIGINT) // nn.n AS BIGINT) AS hub
       |       FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT h$k.node, h$k.hub, a$k.auth
       |FROM h$k JOIN a$k ON h$k.node = a$k.node""".stripMargin
  }

  /** q115: the (domain, bucket) counts, corpus margins, exact-lg
    * contributions, and the same bucket-ascending fixed-order fold. */
  private def domainKlSql(bk: Int): String = {
    def bucket(x: String): String =
      s"CAST(('0x' || substr(md5($x), 1, 8))::BIGINT % $bk AS BIGINT)"
    s"""WITH tk AS (
       |  SELECT source AS domain, ${bucket("tok")} AS b
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)),
       |dc AS (SELECT domain, b, count(*) AS ct FROM tk GROUP BY 1, 2),
       |cc AS (SELECT b, CAST(sum(ct) AS BIGINT) AS cr FROM dc GROUP BY 1),
       |td AS (SELECT domain, CAST(sum(ct) AS BIGINT) AS totd FROM dc GROUP BY 1),
       |tr AS (SELECT CAST(sum(cr) AS BIGINT) AS totr FROM cc),
       |c AS (
       |  SELECT domain, b,
       |    (CAST(ct AS DOUBLE) / CAST(totd AS DOUBLE)) *
       |    (((${lgSqlOf("ct")} - ${lgSqlOf("totd")}) - ${lgSqlOf("cr")})
       |      + ${lgSqlOf("totr")}) AS contrib
       |  FROM dc JOIN cc USING (b) JOIN td USING (domain) CROSS JOIN tr)
       |SELECT c.domain, td.totd AS n_tokens,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY b)),
       |    (a, x) -> a + x) AS kl_bits
       |FROM c JOIN td ON c.domain = td.domain
       |GROUP BY c.domain, td.totd""".stripMargin
  }

  /** q118: PQ-ADC replayed — the sorted strided codebook, per-subspace
    * argmin encode (list_sort on (d, j) structs = the engine's
    * array_sort tie-break), per-query distance tables, and the
    * fixed-order 4-lookup ADC fold. Sub-dim 16 = 64 / 4. */
  private lazy val pqAdcSql: String = {
    val m = 4; val sd = 16; val stride = 40; val k = 10
    def d2(s: String, j: String): String =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      [(e.v[p] - cb.cb[$j].cv[p]) * (e.v[p] - cb.cb[$j].cv[p])
         |       for p in range(($s) * $sd + 1, (($s) + 1) * $sd + 1)]),
         |    (a, x) -> a + x)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cb AS (SELECT list(struct_pack(cid := vec_id, cv := v) ORDER BY vec_id) AS cb
       |       FROM e WHERE vec_id % $stride = 0),
       |enc AS (
       |  SELECT e.vec_id AS c_id,
       |    [list_sort([struct_pack(d := ${d2("s", "j")}, j := j)
       |       for j in range(1, len(cb.cb) + 1)])[1].j
       |     for s in range(0, $m)] AS code
       |  FROM e CROSS JOIN cb),
       |qt AS (
       |  SELECT e.vec_id AS q_id,
       |    [[${d2("s", "j")} for j in range(1, len(cb.cb) + 1)]
       |     for s in range(0, $m)] AS dt
       |  FROM e CROSS JOIN cb WHERE e.vec_id % 25 = 0),
       |sc AS (
       |  SELECT qt.q_id, enc.c_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [dt[s][code[s]] for s in range(1, $m + 1)]), (a, x) -> a + x) AS dist2
       |  FROM enc CROSS JOIN qt WHERE qt.q_id <> enc.c_id)
       |SELECT q_id, c_id, rnk, dist2 FROM (
       |  SELECT q_id, c_id, dist2,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY dist2 ASC, c_id ASC) AS BIGINT) AS rnk
       |  FROM sc) WHERE rnk <= $k""".stripMargin
  }

  private def dsirSql(bk: Int): String = {
    def bucket(x: String): String =
      s"CAST(('0x' || substr(md5($x), 1, 8))::BIGINT % $bk AS BIGINT)"
    def lg(x: String): String = {
      val p = s"(CAST(1 AS BIGINT) << (length(bin($x)) - 1))"
      s"(CAST(length(bin($x)) - 1 AS DOUBLE) + CAST(($x) - $p AS DOUBLE) / CAST($p AS DOUBLE))"
    }
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(w, t -> CAST(length(t) AS BIGINT))),
       |         (acc, x) -> acc + x) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_tok,
       |    CAST(len(list_filter(w, t -> t IN $stop)) AS BIGINT) AS n_stop,
       |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_ngrams,
       |    CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                            for i in range(1, len(w) - 1)])) AS BIGINT) AS n_distinct
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |tgt AS (
       |  SELECT d.doc_id, d.text FROM documents d JOIN s USING (doc_id)
       |  WHERE (s.n_tokens BETWEEN 20 AND 90)
       |    AND (s.avg_tok >= 3.0 AND s.avg_tok <= 8.0)
       |    AND (s.n_stop >= 2)
       |    AND ((CASE WHEN s.n_ngrams > 0
       |               THEN 1.0 - CAST(s.n_distinct AS DOUBLE) / CAST(s.n_ngrams AS DOUBLE)
       |               ELSE 0.0 END) <= 0.2)),
       |tc AS (SELECT ${bucket("tok")} AS b, count(*) AS ct
       |       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM tgt) GROUP BY 1),
       |rc AS (SELECT ${bucket("tok")} AS b, count(*) AS cr
       |       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY 1),
       |c AS (
       |  SELECT CAST(dom.b AS BIGINT) AS b,
       |    CAST(coalesce(tc.ct, 0) AS BIGINT) AS ct,
       |    CAST(coalesce(rc.cr, 0) AS BIGINT) AS cr
       |  FROM (SELECT unnest(range(0, $bk)) AS b) dom
       |  LEFT JOIN tc ON tc.b = dom.b LEFT JOIN rc ON rc.b = dom.b),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM c),
       |wt AS (
       |  SELECT b, ((${lg("ct + 1")} - ${lg(s"tt + $bk")}) - ${lg("cr + 1")})
       |           + ${lg(s"tr + $bk")} AS w
       |  FROM c CROSS JOIN tot),
       |arr AS (SELECT list(w ORDER BY b) AS ws FROM wt)
       |SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(string_split(text, ' '),
       |        t -> ws[${bucket("t")} + 1])),
       |    (a, x) -> a + x) AS dsir_weight
       |FROM documents CROSS JOIN arr""".stripMargin
  }

  private lazy val packAssignSql: String =
    """SELECT doc_id, shard, prior // 512 AS bin_in_shard, n_tokens FROM (
      |  SELECT doc_id, shard, n_tokens,
      |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
      |  FROM (
      |    SELECT doc_id, doc_id // 100 AS shard,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |    FROM documents))""".stripMargin

  private[queries] lazy val knnSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |    list_dot_product(q.v, c.v)
      |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
      |  FROM e q JOIN e c ON q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id)
      |SELECT q_id, c_id, rnk, cosine FROM (
      |  SELECT q_id, c_id, cosine,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS BIGINT) AS rnk
      |  FROM p)
      |WHERE rnk <= 10""".stripMargin

  /** q49's mirror of the engine's sign-LSH bucketing for dim=64 (this
    * testdata's embedding width): the Rademacher sign rows are a fixed
    * function of (plane, component) — splitmix64(p*64 + j) & 1, the exact
    * schedule of [[graft.functions.VectorMath.signBucket]] — inlined as
    * ±1.0 literals so DuckDB recomputes the identical 16-bit code with
    * plain arithmetic (multiplying by ±1.0 is exact and list_dot_product
    * accumulates doubles in element order, like the engine kernel). The
    * candidate rule (agree on >= 1 of the 4 four-bit chunks) and the exact
    * cosine verify are then mirrored relationally, so engine and oracle
    * compute the SAME deterministic approximation — hash-comparable end to
    * end, like q35's mirrored IVF. */
  /** The 16-plane sign-code SQL expression shared by every oracle that
    * mirrors [[graft.functions.VectorMath.signBucket]] at planes=16
    * (q49/q68): ±1.0 Rademacher rows from the splitmix64 schedule, inlined
    * as literals. */
  private def signCodeExpr(planes: Int, dim: Int): String = {
    val signRows = (0 until planes).map { p =>
      (0 until dim).map { j =>
        if ((graft.functions.VectorMath.splitmix64(p.toLong * dim + j) & 1L) == 1L) "1.0"
        else "-1.0"
      }.mkString("[", ",", "]")
    }
    (0 until planes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${signRows(p)}) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("\n    + ")
  }

  private[queries] lazy val embedLshSql: String = {
    val planes = 16; val dim = 64; val chunks = 4; val bitsPer = 4
    val codeExpr = signCodeExpr(planes, dim)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id,
       |    $codeExpr AS code
       |  FROM e),
       |k AS (
       |  SELECT vec_id, u.c AS chunk, (code >> (u.c * $bitsPer)) & ${(1 << bitsPer) - 1} AS ck
       |  FROM b, LATERAL (SELECT unnest(range(0, $chunks)) AS c) u),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
       |  FROM k a JOIN k b2 ON a.chunk = b2.chunk AND a.ck = b2.ck AND a.vec_id < b2.vec_id)
       |SELECT a_id, b_id, cosine FROM (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(x.v, y.v)
       |      / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cosine
       |  FROM cand c JOIN e x ON x.vec_id = c.a_id JOIN e y ON y.vec_id = c.b_id)
       |WHERE cosine >= 0.45""".stripMargin
  }

  /** q27's mirror of the simhash near-dup pair set: the engine's per-token
    * weight is [[graft.functions.VectorMath.md5Prefix64]] — the first 8
    * md5 bytes big-endian, i.e. exactly the two 32-bit hex-prefix words
    * `('0x'||substr(md5(t),1,8))` / `(…,9,8)` — so DuckDB recomputes the
    * identical 64-bit fingerprint as (hi, lo) word pairs: per (doc, bit)
    * majority vote (2·set ≥ seen, the engine's votes ≥ 0 rule), then
    * pairwise hamming as the sum of two 32-bit bit_count(xor)s. The engine's
    * chunk-pigeonhole candidate generation is COMPLETE for hamming ≤ 3
    * (Manku/Jain/Sarma 2007), so its output equals the all-pairs filter the
    * oracle computes — hash-identical, not just approximately equal. */
  private lazy val simhashSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(t), 1, 8))::BIGINT AS whi,
      |    ('0x' || substr(md5(t), 9, 8))::BIGINT AS wlo
      |  FROM tok),
      |v AS (
      |  SELECT doc_id, u.b,
      |    CASE WHEN 2 * sum(CASE WHEN u.b < 32 THEN (wlo >> u.b) & 1
      |                           ELSE (whi >> (u.b - 32)) & 1 END) >= count(*)
      |         THEN 1 ELSE 0 END AS bit
      |  FROM h, LATERAL (SELECT unnest(range(0, 64)) AS b) u
      |  GROUP BY doc_id, u.b),
      |fp AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN b < 32 THEN bit << b ELSE 0 END) AS flo,
      |    sum(CASE WHEN b >= 32 THEN bit << (b - 32) ELSE 0 END) AS fhi
      |  FROM v GROUP BY doc_id)
      |SELECT a_id, b_id, hamming FROM (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(bit_count(xor(a.fhi, b.fhi)) + bit_count(xor(a.flo, b.flo)) AS BIGINT) AS hamming
      |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
      |WHERE hamming <= 3""".stripMargin

  /** q68's mirror of the semantic-decontamination dataflow: the same
    * 16-plane sign code and 4-bit chunk keys as q49's, but joined CROSS
    * frame (corpus = vec_id % 97 != 0, eval = % 97 == 0), exact-cosine
    * verified at 0.45, then anti-joined — every step deterministic, so the
    * surviving id set hash-matches. */
  private lazy val semanticDecontamSql: String = {
    val planes = 16; val dim = 64; val chunks = 4; val bitsPer = 4
    val codeExpr = signCodeExpr(planes, dim)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    $codeExpr AS code
       |  FROM e),
       |k AS (
       |  SELECT vec_id, u.c AS chunk, (code >> (u.c * $bitsPer)) & ${(1 << bitsPer) - 1} AS ck
       |  FROM b, LATERAL (SELECT unnest(range(0, $chunks)) AS c) u),
       |cand AS (
       |  SELECT DISTINCT c.vec_id AS l_id, q.vec_id AS r_id
       |  FROM k c JOIN k q ON c.chunk = q.chunk AND c.ck = q.ck
       |  WHERE c.vec_id % 97 <> 0 AND q.vec_id % 97 = 0),
       |dirty AS (
       |  SELECT DISTINCT l_id FROM (
       |    SELECT c.l_id,
       |      list_dot_product(x.v, y.v)
       |        / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cosine
       |    FROM cand c JOIN e x ON x.vec_id = c.l_id JOIN e y ON y.vec_id = c.r_id)
       |  WHERE cosine >= 0.45)
       |SELECT vec_id FROM e
       |WHERE vec_id % 97 <> 0 AND vec_id NOT IN (SELECT l_id FROM dirty)""".stripMargin
  }

  /** q30's mirror of the multi-probe sign-LSH KNN
    * ([[graft.sim.Similarity.lshKnn]], planes=8, probeHamming=2, k=10):
    * the 8-bit bucket is the same splitmix64-seeded Rademacher code as
    * [[embedLshSql]]'s (inlined ±1.0 sign rows, exact double arithmetic in
    * element order), and the engine's probe rule — explode all codes within
    * `probeHamming` sign flips of the query's bucket, then equi-join — is
    * relationally identical to joining on
    * `bit_count(q.code XOR c.code) <= probeHamming`, which DuckDB computes
    * directly. Ranking mirrors the engine's (cosine DESC, c_id ASC) window,
    * so both engines emit the SAME deterministic approximate neighbor set —
    * hash-comparable like q49/q35. */
  private lazy val annLshSql: String = {
    val planes = 8; val dim = 64; val probeHamming = 2; val topK = 10
    val signRows = (0 until planes).map { p =>
      (0 until dim).map { j =>
        if ((graft.functions.VectorMath.splitmix64(p.toLong * dim + j) & 1L) == 1L) "1.0"
        else "-1.0"
      }.mkString("[", ",", "]")
    }
    val codeExpr = (0 until planes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${signRows(p)}) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    $codeExpr AS code
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    list_dot_product(q.v, c.v)
       |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
       |  FROM b q JOIN b c
       |    ON c.vec_id <> q.vec_id
       |   AND bit_count(xor(q.code, c.code)) <= $probeHamming
       |  WHERE q.vec_id % 25 = 0)
       |SELECT q_id, c_id, rnk, cosine FROM (
       |  SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS BIGINT) AS rnk
       |  FROM scored)
       |WHERE rnk <= $topK""".stripMargin
  }

  /** q57's mirror of the ENTIRE k-means training loop plus the IVF probe:
    * possible only because the engine's update is fixed-point (floor(v*2^24)
    * long sums — exact, order-free) and its init is the md5-prefix stride —
    * both plain SQL. Each round: argmax assignment (cosine DESC, cent_id
    * ASC — the engine's struct-sort order), per-(cluster,dim) fixed-point
    * mean, then normalize in double and store through a FLOAT cast exactly
    * like the engine's `.cast("float")` centroid column. */
  /** The mirrored cosine expression every embedding oracle shares. */
  private def cosSqlOf(a: String, b: String) =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** The shared k-means training CTE chain (`e`, `cents0` .. `cents$iters`)
    * — the full fixed-point Lloyd loop of
    * [[graft.sim.Similarity.kmeansCentroids]] in SQL, reused verbatim by
    * every oracle that consumes the trained quantizer (q57 IVF, q105
    * SemDeDup, q109 hard negatives). Replayable because the engine's init
    * is the md5-prefix stride and its mean update is exact fixed-point. */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val scale = 1L << 24; val dim = 64
    val rounds = (1 to iters).map { i =>
      val prev = s"cents${i - 1}"
      s"""assign$i AS (
         |  SELECT vec_id, v, cent_id FROM (
         |    SELECT x.vec_id, x.v, c.cent_id,
         |      row_number() OVER (PARTITION BY x.vec_id ORDER BY
         |        ${cosSqlOf("x.v", "c.cent_v")} DESC, c.cent_id ASC) AS crnk
         |    FROM e x CROSS JOIN $prev c)
         |  WHERE crnk = 1),
         |sums$i AS (
         |  SELECT cent_id AS cid, u.pos,
         |    CAST(sum(CAST(floor(v[u.pos] * $scale) AS BIGINT)) AS DOUBLE)
         |      / count(*) / $scale AS m
         |  FROM assign$i, LATERAL (SELECT unnest(range(1, ${dim + 1})) AS pos) u
         |  GROUP BY cent_id, u.pos),
         |cents$i AS (
         |  SELECT cid AS cent_id,
         |    CAST(list_transform(mv,
         |      x -> CAST(CASE WHEN nrm > 0 THEN x / nrm ELSE x END AS FLOAT)) AS DOUBLE[])
         |      AS cent_v
         |  FROM (
         |    SELECT cid, mv,
         |      sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list_transform(mv, x -> x * x)), (acc, x) -> acc + x)) AS nrm
         |    FROM (SELECT cid, list(m ORDER BY pos) AS mv FROM sums$i GROUP BY cid)))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cents0 AS (
       |  SELECT vec_id AS cent_id, v AS cent_v FROM e
       |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
       |        % greatest(1, (SELECT count(*) FROM e) // $k) = 0),
       |$rounds""".stripMargin
  }

  private lazy val kmeansIvfSql: String = {
    val k = 16; val iters = 2; val nProbe = 3; val topK = 10
    def cos(a: String, b: String) = cosSqlOf(a, b)
    s"""WITH ${kmeansCtes(k, iters)},
       |assignF AS (
       |  SELECT x.vec_id AS x_id, x.v AS x_v, c.cent_id,
       |    row_number() OVER (PARTITION BY x.vec_id ORDER BY
       |      ${cos("x.v", "c.cent_v")} DESC, c.cent_id ASC) AS crnk
       |  FROM e x CROSS JOIN cents$iters c),
       |cells AS (SELECT x_id AS c_id, x_v AS c_v, cent_id FROM assignF WHERE crnk = 1),
       |probes AS (SELECT x_id AS q_id, x_v AS q_v, cent_id FROM assignF
       |           WHERE crnk <= $nProbe AND x_id % 25 = 0),
       |scored AS (
       |  SELECT p.q_id, s.c_id, ${cos("p.q_v", "s.c_v")} AS cosine
       |  FROM probes p JOIN cells s USING (cent_id) WHERE p.q_id <> s.c_id)
       |SELECT q_id, c_id, rnk, cosine FROM (
       |  SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS BIGINT) AS rnk
       |  FROM scored) WHERE rnk <= $topK""".stripMargin
  }

  /** q105's mirror: the [[kmeansCtes]] training chain, final crnk=1
    * assignment, then the within-cell (a_id < b_id, cosine >= tau) min-id
    * witness — [[graft.dedup.Dedup.semDedup]] replayed end to end. */
  private lazy val semDedupSql: String = {
    val k = 16; val iters = 2; val tau = 0.3
    s"""WITH ${kmeansCtes(k, iters)},
       |assignF AS (
       |  SELECT x.vec_id, x.v, c.cent_id,
       |    row_number() OVER (PARTITION BY x.vec_id ORDER BY
       |      ${cosSqlOf("x.v", "c.cent_v")} DESC, c.cent_id ASC) AS crnk
       |  FROM e x CROSS JOIN cents$iters c),
       |cells AS (SELECT vec_id, v, cent_id FROM assignF WHERE crnk = 1),
       |w AS (
       |  SELECT b.vec_id AS b_id, min(a.vec_id) AS dup_of
       |  FROM cells a JOIN cells b
       |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       |  WHERE ${cosSqlOf("a.v", "b.v")} >= $tau
       |  GROUP BY b.vec_id)
       |SELECT c.vec_id, c.cent_id, w.dup_of
       |FROM cells c LEFT JOIN w ON c.vec_id = w.b_id""".stripMargin
  }

  /** q107's mirror: one md5 digest per key split into 8-hex windows (the
    * engine's digest-splitting), the distinct set-bit table, per-window
    * membership conjunction, exact-set flag, 2x2 rollup. */
  private lazy val bloomAuditSql: String = {
    val m = 16384; val kHashes = 3
    def pos(h: Int, key: String) =
      s"('0x' || substr(md5(CAST($key AS VARCHAR)), ${1 + 8 * h}, 8))::BIGINT % $m"
    val passes = (0 until kHashes)
      .map(h => s"${pos(h, "l_orderkey")} IN (SELECT p FROM pos)")
      .mkString("\n        AND ")
    val buildPos = (0 until kHashes)
      .map(h => s"SELECT ${pos(h, "key")} AS p FROM k")
      .mkString("\n    UNION\n    ")
    s"""WITH k AS (
       |  SELECT o_orderkey AS key FROM orders WHERE o_totalprice > 450000.0),
       |pos AS (
       |    $buildPos),
       |f AS (
       |  SELECT
       |    ($passes) AS bloom_pass,
       |    l_orderkey IN (SELECT key FROM k) AS is_match
       |  FROM lineitem)
       |SELECT bloom_pass, is_match, CAST(count(*) AS BIGINT) AS n
       |FROM f GROUP BY bloom_pass, is_match""".stripMargin
  }

  /** q108's mirror: q63's quantization per side (round-half-away codes,
    * zero-vector guard), stage-1 rank by the scale-free integer score
    * dotq/sqrt(nqa*nqb) (exact longs under one IEEE divide), stage-2
    * exact-cosine rerank over the kept k1. */
  private lazy val rerankSql: String = {
    val k1 = 40; val k2 = 10
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qz AS (
       |  SELECT vec_id, v,
       |    CASE WHEN scale = 0 THEN [CAST(0 AS BIGINT) for i in range(1, len(v) + 1)]
       |         ELSE [CAST(round(v[i] / scale) AS BIGINT) for i in range(1, len(v) + 1)]
       |    END AS qv
       |  FROM (SELECT vec_id, v,
       |          list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       |        FROM e)),
       |qn AS (SELECT vec_id, v, qv,
       |         CAST(list_dot_product(qv, qv) AS BIGINT) AS nq FROM qz),
       |s1 AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        CASE WHEN q.nq > 0 AND c.nq > 0
       |             THEN CAST(list_dot_product(q.qv, c.qv) AS DOUBLE)
       |                  / sqrt(CAST(q.nq * c.nq AS DOUBLE))
       |             ELSE 0.0 END DESC, c.vec_id ASC) AS rnk1
       |    FROM qn q JOIN qn c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id % 25 = 0)
       |  WHERE rnk1 <= $k1)
       |SELECT q_id, c_id, rnk, cosine FROM (
       |  SELECT s1.q_id, s1.c_id, ${cosSqlOf("q.v", "c.v")} AS cosine,
       |    CAST(row_number() OVER (PARTITION BY s1.q_id ORDER BY
       |      ${cosSqlOf("q.v", "c.v")} DESC, s1.c_id ASC) AS BIGINT) AS rnk
       |  FROM s1 JOIN e q ON s1.q_id = q.vec_id
       |          JOIN e c ON s1.c_id = c.vec_id)
       |WHERE rnk <= $k2""".stripMargin
  }

  /** q109's mirror: [[kmeansCtes]] + final assignment, probes = the
    * query's crnk 2..nProbe+1 (foreign) cells, exact cosine, top-j. */
  private lazy val hardNegativesSql: String = {
    val k = 16; val iters = 2; val nProbe = 3; val j = 10
    s"""WITH ${kmeansCtes(k, iters)},
       |assignF AS (
       |  SELECT x.vec_id, x.v, c.cent_id,
       |    row_number() OVER (PARTITION BY x.vec_id ORDER BY
       |      ${cosSqlOf("x.v", "c.cent_v")} DESC, c.cent_id ASC) AS crnk
       |  FROM e x CROSS JOIN cents$iters c),
       |cells AS (SELECT vec_id AS neg_id, v AS c_v, cent_id
       |          FROM assignF WHERE crnk = 1),
       |probes AS (SELECT vec_id AS q_id, v AS q_v, cent_id FROM assignF
       |           WHERE crnk BETWEEN 2 AND ${nProbe + 1} AND vec_id % 25 = 0),
       |scored AS (
       |  SELECT p.q_id, s.neg_id, ${cosSqlOf("p.q_v", "s.c_v")} AS cosine
       |  FROM probes p JOIN cells s USING (cent_id))
       |SELECT q_id, neg_vec_id, rnk, cosine FROM (
       |  SELECT q_id, neg_id AS neg_vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY
       |      cosine DESC, neg_id ASC) AS BIGINT) AS rnk
       |  FROM scored) WHERE rnk <= $j""".stripMargin
  }

  /** q53/q59's shared mirror: transitive closure over the Jaccard near-dup
    * relation by recursive CTE — each node's component is the least id it
    * can reach (edges made bidirectional first, so reachability =
    * connectivity). The engine computes the same fixpoint by distributed
    * pointer-jumped min-label propagation; both are deterministic, so the
    * results hash-compare. */
  private def clusterCtesOver(rel: String): String =
    s"""p AS MATERIALIZED (
       |${jaccardSqlOver(rel)}),
       |e AS (
       |  SELECT a_id AS u, b_id AS v FROM p
       |  UNION
       |  SELECT b_id AS u, a_id AS v FROM p),
       |reach AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
       |lab AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)""".stripMargin

  private lazy val clusterCtes: String = clusterCtesOver("documents")

  private lazy val clustersSql: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT id, component FROM lab""".stripMargin

  /** q59: documents minus every labeled node whose component is not itself
    * (the non-canonical members of each dedup group). */
  private lazy val dropNearDupsSql: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT d.doc_id, d.lang, d.source FROM documents d
       |LEFT JOIN (SELECT id FROM lab WHERE id <> component) l ON d.doc_id = l.id
       |WHERE l.id IS NULL""".stripMargin

  private def jaccardSqlOver(rel: String): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                   for i in range(1, len(w) - 1)]) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $rel)
       |  WHERE len(w) >= 3)
       |SELECT a_id, b_id, jaccard FROM (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
       |WHERE jaccard >= 0.6""".stripMargin

  private lazy val jaccardSql: String = jaccardSqlOver("documents")

  /** The q21 quality-score expression over a text reference — shared with
    * the q61 quality gate so engine and oracle can never drift. */
  private def qualitySqlOf(t: String): String =
    s"""greatest(least(
       |      least(CAST(len(string_split($t,' ')) AS DOUBLE) / 60.0, 1.0) * 0.35
       |    + least((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(string_split($t,' '), tk -> CAST(length(tk) AS BIGINT))),
       |             (acc, x) -> acc + x) AS DOUBLE)
       |             / CAST(len(string_split($t,' ')) AS DOUBLE)) / 6.0, 1.0) * 0.25
       |    + least((CAST(len(list_filter(string_split($t,' '), tk -> tk IN $stop)) AS DOUBLE)
       |             / CAST(len(string_split($t,' ')) AS DOUBLE)) * 4.0, 1.0) * 0.3
       |    - (CAST(length(regexp_replace($t, '[^.!?,;:]', '', 'g')) AS DOUBLE)
       |       / CAST(length($t) AS DOUBLE)) * 0.5 + 0.1, 1.0), 0.0)""".stripMargin

  /** q61: the composed curation pipeline — quality gate, exact-dedup
    * canonical keep, near-dedup components keep-canonical, 8-gram
    * decontamination vs the eval subset, then hash-rate sampling; every
    * stage reuses the per-stage oracles' exact SQL forms. */
  private lazy val curateCorpusSql: String =
    s"""WITH RECURSIVE
       |q AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  WHERE ${qualitySqlOf("text")} >= 0.5),
       |ex AS (
       |  SELECT q.* FROM q
       |  JOIN (
       |    SELECT min(doc_id) AS kid FROM q
       |    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) c
       |  ON q.doc_id = c.kid),
       |${clusterCtesOver("ex")},
       |near AS (
       |  SELECT * FROM ex
       |  WHERE doc_id NOT IN (SELECT id FROM lab WHERE id <> component)),
       |nsh AS (
       |  SELECT doc_id,
       |    list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
       |                   for i in range(1, len(w) - 6)]) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM near)
       |  WHERE len(w) >= 8),
       |bsh AS (
       |  SELECT DISTINCT unnest(s) AS sh FROM (
       |    SELECT list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
       |                          for i in range(1, len(w) - 6)]) AS s
       |    FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0)
       |    WHERE len(w) >= 8)),
       |dirty AS (
       |  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(s) AS sh FROM nsh)
       |  WHERE sh IN (SELECT sh FROM bsh))
       |SELECT doc_id, lang, source FROM near
       |WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
       |  AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
       |      CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 20 ELSE 10 END""".stripMargin
}
