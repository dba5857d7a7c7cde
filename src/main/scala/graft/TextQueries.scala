package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, TextAnalysis}

/** Oracle-checked registrations for the text-analysis and deduplication
  * operators. The DuckDB oracles rebuild the identical portable
  * constructions (md5-based minhash/simhash, integer bit ops, no
  * division) with list comprehensions, so values — not just shapes —
  * must agree.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> ((s, d) => TextAnalysis.textStats(s, d)),
    "q_token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "q_lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "q_quality_score" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "q_quality_lr" -> ((s, d) => TextAnalysis.linearScore(s, d)),
    "q_sql_custom_fn" -> ((s, d) => TextAnalysis.sqlFunctionRegistry(s, d)),
    "q_feature_hash" -> ((s, d) => TextAnalysis.featureHash(s, d)),
    "q_doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "q_tfidf_top" -> ((s, d) => TextAnalysis.tfidfTop(s, d)),
    "q_lm_score" -> ((s, d) => TextAnalysis.lmScore(s, d)),
    "q_pmi_top" -> ((s, d) => TextAnalysis.pmiTop(s, d)),
    "q_distinctive_terms" -> ((s, d) => TextAnalysis.distinctiveTerms(s, d)),
    "q_redact_pii" -> ((s, d) => TextAnalysis.redactPiiQuery(s, d)),
    "q_k_anon" -> ((s, d) => TextAnalysis.kAnonymity(s, d)),
    // Attribute-disclosure audit: k-anonymous classes that still leak
    // the sensitive attribute (homogeneity attack surface).
    "q_l_diversity" -> ((s, d) => TextAnalysis.lDiversity(s, d)),
    // Per-source leave-one-out KS drift on the length distribution,
    // exact-integer ECDF comparison (fixed-point ppm statistic).
    "q_ks_drift" -> ((s, d) => TextAnalysis.ksDrift(s, d)),
    // PSI over pooled-CDF decile bins, add-one smoothed, fixed-point
    // per-bin terms summed as integers.
    "q_psi_drift" -> ((s, d) => TextAnalysis.psiDrift(s, d)),
    // GPT-style concat-and-chunk packing manifest (distributed prefix
    // sum over corpus-order token counts — never an empty-key window).
    "q_pack_blocks" -> ((s, d) => graft.operators.DataPrep.packBlocks(s, d)),
    "q_extract_numbers" -> ((s, d) => TextAnalysis.extractNumbers(s, d)),
    "q_quality_audit" -> ((s, d) => TextAnalysis.qualityAudit(s, d)),
    // The curation terminal: dedup ∧ quality ∧ language-verified,
    // accounted per (source, lang) stratum.
    "q_curate" -> ((s, d) => TextAnalysis.curate(s, d)),
    // Vocabulary build: min-frequency cut + contiguous top-K token ids.
    "q_vocab" -> ((s, d) => TextAnalysis.vocab(s, d)),
    // Tokenizer-coverage audit: per-doc OOV rate against the vocab.
    "q_oov_rate" -> ((s, d) => TextAnalysis.oovRate(s, d)),
    // C4-style line-level boilerplate removal (edits inside documents).
    "q_line_dedup" -> ((s, d) => Dedup.lineDedup(s, d)),
    // Native catalyst Generator (UDTF) via LATERAL VIEW in SQL text.
    "q_udtf_lines" -> ((s, d) => TextAnalysis.udtfLines(s, d)),
    // Zipf slope of the token frequency distribution (fixed-point LSQ).
    "q_zipf_fit" -> ((s, d) => TextAnalysis.zipfFit(s, d)),
    // Spark 4 listagg WITHIN GROUP — ordered string aggregation; the
    // ORDER BY inside the aggregate makes the result deterministic
    // (unordered listagg would hash-mismatch by partition order). The
    // agg runs over the DISTINCT (source, lang) relation, so the
    // concatenated value is bounded by |langs|, not corpus size.
    "q_listagg" -> ((s, d) => {
      graft.sources.Tables.documents(s, d)
        .createOrReplaceTempView("documents")
      s.sql(
        """SELECT source,
          |  listagg(lang, ',') WITHIN GROUP (ORDER BY lang) AS langs,
          |  CAST(count(*) AS BIGINT) AS n_langs
          |FROM (SELECT DISTINCT source, lang FROM documents)
          |GROUP BY source""".stripMargin)
    }),
    "q_train_split" -> ((s, d) => graft.operators.DataPrep.trainSplit(s, d)),
    "q_time_split" -> ((s, d) => graft.operators.DataPrep.timeSplit(s, d)),
    "q_bpe_merges" -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    "q_bpe_apply" -> ((s, d) => TextAnalysis.bpeApply(s, d)),
    "q_fuzzy_join" -> ((s, d) => Dedup.fuzzyNameMatch(s, d)),
    "q_split_leakage_safe" -> ((s, d) => graft.operators.DataPrep.leakageSafeSplit(s, d)),
    "q_sample_stratified" -> ((s, d) => graft.operators.DataPrep.stratifiedSample(s, d)),
    "q_sample_weighted" -> ((s, d) => graft.operators.DataPrep.weightedSample(s, d)),
    "q_mixture_sample" -> ((s, d) => graft.operators.DataPrep.mixtureSample(s, d)),
    "q_pack_sequences" -> ((s, d) => graft.operators.DataPrep.packSequences(s, d)),
    "q_chunk_stride" -> ((s, d) => graft.operators.DataPrep.chunkStride(s, d)),
    // Deterministic Poisson(1) bootstrap replicate assembly.
    "q_bootstrap" -> ((s, d) => graft.operators.DataPrep.bootstrapPoisson(s, d)),
    // Hash-ordered shuffle + round-robin exactly-balanced shards.
    "q_data_shuffle" -> ((s, d) => graft.operators.DataPrep.dataShuffle(s, d)),
    // Largest-remainder exact-total budget apportionment.
    "q_apportion" -> ((s, d) => graft.operators.DataPrep.apportion(s, d)),
    // Per-source bootstrap min/max uncertainty bands.
    "q_bootstrap_by_source" ->
      ((s, d) => graft.operators.DataPrep.bootstrapBySource(s, d)),
    // Rendezvous-hash ownership with the minimal-movement invariant.
    "q_rendezvous" ->
      ((s, d) => graft.operators.DataPrep.rendezvousAssign(s, d)),
    "q_dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "q_dedup_near" -> ((s, d) => Dedup.near(s, d)),
    "q_dedup_minhash" -> ((s, d) => Dedup.minhashBands(s, d)),
    "q_dedup_minhash_pairs" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q_dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    // successor-capped generators: the mega-dup-family output guards
    "q_dedup_minhash_pairs_capped" -> ((s, d) => Dedup.minhashPairsCapped(s, d)),
    "q_dedup_simhash_pairs_capped" -> ((s, d) => Dedup.simhashPairsCapped(s, d)),
    "q_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q_containment" -> ((s, d) => Dedup.containment(s, d)),
    "q_jaccard_prefix" -> ((s, d) => Dedup.jaccardPrefix(s, d)),
    // band-first forms: LSH bands generate, exact arithmetic only scores
    "q_ngram_jaccard_banded" -> ((s, d) => Dedup.ngramJaccardBanded(s, d)),
    "q_containment_banded" -> ((s, d) => Dedup.containmentBanded(s, d)),
    // prefix postings with the per-posting successor cap — the scale
    // twin of q_jaccard_prefix
    "q_jaccard_prefix_capped" -> ((s, d) => Dedup.jaccardPrefixCapped(s, d)),
    // min-wise inclusion probes: asymmetric containment, recall-complete
    // at any size ratio — the scale twin of q_containment
    "q_containment_ensemble" -> ((s, d) => Dedup.containmentEnsemble(s, d)),
    "q_dedup_verify_pairs" -> ((s, d) => Dedup.verifyPairs(s, d)),
    "q_jaccard_calibration" -> ((s, d) => Dedup.jaccardCalibration(s, d)),
    "q_dedup_components" -> ((s, d) => Dedup.components(s, d)),
    "q_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "q_decontaminate_bloom" -> ((s, d) => Dedup.decontaminateBloom(s, d)),
    "q_repetition" -> ((s, d) => Dedup.repetition(s, d)),
    "q_dedup_apply" -> ((s, d) => Dedup.dedupApply(s, d)),
    "q_dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(s, d)),
    "q_pagerank" -> ((s, d) => graft.operators.Graph.pagerank(s, d)),
    "q_triangles" -> ((s, d) => graft.operators.Graph.triangles(s, d)),
    "q_reach_bfs" -> ((s, d) => graft.operators.Graph.reachBfs(s, d)),
    "q_kcore" -> ((s, d) => graft.operators.Graph.kcore(s, d)),
    "q_label_prop" -> ((s, d) => graft.operators.Graph.labelProp(s, d)),
    "q_bm25_top" -> ((s, d) => TextAnalysis.bm25Top(s, d)),
    "q_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "q_char_entropy" -> ((s, d) => TextAnalysis.charEntropy(s, d)),
    "q_sketch_source" -> ((s, d) => Dedup.sourceSketch(s, d)),
    "q_sketch_source_sim" -> ((s, d) => Dedup.sourceSimilarity(s, d)),
    "q_gopher_rules" -> ((s, d) => TextAnalysis.gopherRules(s, d)),
    "q_dup_ngrams" -> ((s, d) => Dedup.dupNgrams(s, d)),
    // MOSS winnowing fingerprints + the cross-document match join.
    "q_winnow" -> ((s, d) => Dedup.winnow(s, d)),
    "q_winnow_pairs" -> ((s, d) => Dedup.winnowPairs(s, d)),
    "q_length_buckets" -> ((s, d) => graft.operators.DataPrep.lengthBuckets(s, d)),
    "q_domain_cap" -> ((s, d) => graft.operators.DataPrep.domainCap(s, d)),
    // distributed row_number() OVER (ORDER BY …) without the one-task window
    "q_global_index" -> ((s, d) => graft.operators.DataPrep.globalIndex(s, d)),
    // exact NTILE staging derived from the distributed global rank
    "q_curriculum" -> ((s, d) => graft.operators.DataPrep.curriculum(s, d))
  )

  /** Shared DuckDB CTE fragments (must mirror TextFunctions exactly). */
  private val baseCte =
    """base AS (SELECT doc_id, source, text, n_chars,
      |  lower(trim(text)) AS norm,
      |  regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents)""".stripMargin

  /** Winnowing CTEs (k=5, w=4) over `base.toks` — grams are md5→60-bit
    * BIGINTs of the space-joined 5-token slice, selection is the
    * rightmost window minimum; mirrors `Dedup.winnow` exactly.
    */
  private val winnowCtes =
    """wt AS (SELECT doc_id, toks FROM base WHERE len(toks) >= 8),
      |wg AS (SELECT doc_id, list_transform(range(0, len(toks) - 4), i ->
      |    CAST(CAST(('0x' || substr(md5(array_to_string(toks[i+1:i+5], ' ')),
      |      1, 15)) AS UBIGINT) AS BIGINT)) AS gs
      |  FROM wt),
      |wwin AS (SELECT doc_id, gs, unnest(range(0, len(gs) - 3)) AS j FROM wg),
      |wsel AS (SELECT DISTINCT doc_id,
      |  CAST(j + list_max(list_filter(range(0, 4), i ->
      |    gs[j+i+1] = list_min(gs[j+1:j+4]))) AS BIGINT) AS pos,
      |  list_min(gs[j+1:j+4]) AS fp FROM wwin)""".stripMargin

  private val shinglesCte =
    """sh AS (SELECT doc_id, source,
      |  CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(len(toks)-2),
      |           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
      |    ELSE [norm] END AS s
      |  FROM base)""".stripMargin

  /** 60-bit shingle fingerprints over `sh.s` — mirrors
    * `TextFunctions.shingleFps3` (first 15 hex md5 chars as BIGINT,
    * distinct applied to the fingerprints), the representation the
    * heavy postings operators shuffle at scale.
    */
  private val fpsCte =
    """shf AS (SELECT doc_id, source,
      |  list_distinct(list_transform(s, x ->
      |    CAST(CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT) AS BIGINT)))
      |    AS fps
      |  FROM sh)""".stripMargin

  private[graft] val bandsCte =
    s"""WITH $baseCte, $shinglesCte,
       |sig AS (SELECT doc_id,
       |  list_transform(range(16),
       |    i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || '|' || x)))) AS g
       |  FROM sh),
       |bands AS (SELECT doc_id, CAST(b AS INTEGER) AS band_id,
       |  md5(g[b*4+1] || g[b*4+2] || g[b*4+3] || g[b*4+4]) AS band_key
       |  FROM sig, range(4) r(b))""".stripMargin

  /** The BPE oracle replays the identical merge recursion as a CTE
    * chain: each iteration recounts pairs, picks the (count desc, pair
    * asc) argmax, and applies it with the same gaps-and-islands parity
    * resolution the Spark side plans. Generated per iteration so both
    * engines stay structurally in lockstep.
    */
  private def bpeIteration(i: Int): String =
    s"""pairs$i AS (
       |  SELECT sym AS a, nxt AS b, sum(freq) AS pair_count FROM (
       |    SELECT sym, freq, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
       |    FROM toks${i - 1})
       |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |top$i AS (
       |  SELECT a, b, pair_count FROM pairs$i
       |  ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1),
       |c$i AS (
       |  SELECT t.w, t.freq, t.pos, t.sym, m.a, m.b,
       |    lead(t.sym) OVER (PARTITION BY t.w ORDER BY t.pos) AS nxt
       |  FROM toks${i - 1} t CROSS JOIN top$i m),
       |d$i AS (SELECT *, coalesce(sym = a AND nxt = b, false) AS cand FROM c$i),
       |e$i AS (
       |  SELECT *, sum(CASE WHEN cand THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY w ORDER BY pos ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d$i),
       |f$i AS (SELECT *, pos - cum AS runid FROM e$i),
       |g$i AS (
       |  SELECT *, cand AND (cum - min(CASE WHEN cand THEN cum END)
       |    OVER (PARTITION BY w, runid)) % 2 = 0 AS keep
       |  FROM f$i),
       |h$i AS (
       |  SELECT *, coalesce(lag(keep) OVER (PARTITION BY w ORDER BY pos), false)
       |    AS prev_keep
       |  FROM g$i),
       |toks$i AS (
       |  SELECT w, freq,
       |    row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
       |    CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
       |  FROM h$i WHERE NOT prev_keep)""".stripMargin

  private def bpeChain(k: Int): String = {
    val base =
      """WITH words AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |    FROM documents)
        |  WHERE length(w) BETWEEN 1 AND 30 GROUP BY 1),
        |toks0 AS (
        |  SELECT w, freq, pos, substr(w, pos + 1, 1) AS sym FROM (
        |    SELECT w, freq, unnest(range(0, length(w))) AS pos FROM words))""".stripMargin
    base + ",\n" + (1 to k).map(bpeIteration).mkString(",\n")
  }

  private def bpeOracle(k: Int): String = {
    val finals = (1 to k).map(i =>
      s"SELECT CAST($i AS INTEGER) AS merge_rank, a AS left_sym, " +
        s"b AS right_sym, CAST(pair_count AS BIGINT) AS pair_count FROM top$i")
      .mkString(" UNION ALL ")
    s"${bpeChain(k)}\nSELECT * FROM ($finals) ORDER BY merge_rank"
  }

  private def bpeApplyOracle(k: Int): String =
    s"""${bpeChain(k)},
       |word_cost AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n_bpe FROM toks$k GROUP BY 1),
       |corpus AS (
       |  SELECT source, w FROM (
       |    SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
       |    FROM documents)
       |  WHERE length(w) BETWEEN 1 AND 30)
       |SELECT c.source, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(wc.n_bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(wc.n_bpe) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT)
       |    AS bpe_per_1000_words
       |FROM corpus c JOIN word_cost wc ON c.w = wc.w
       |GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_bpe_merges" -> bpeOracle(3),
    "q_bpe_apply" -> bpeApplyOracle(3),

    // FastSS deletion-neighborhood candidates + exact levenshtein
    // verify, identical construction on both engines.
    // names DISTINCT (mirroring the engine's entity resolution — and
    // without it the scaled-sf row replication squares the bare-variant
    // join: 100× duplicated names → 10⁴× the joined pairs, the round-9
    // sf10 gate hang); variants DISTINCT per name because dense digit
    // runs reach one key from many positions
    "q_fuzzy_join" ->
      """WITH names AS (SELECT DISTINCT c_name AS nm FROM customer),
        |variants AS (
        |  SELECT DISTINCT nm, unnest(list_append(
        |    list_transform(range(0, length(nm)),
        |      i -> substr(nm, 1, i) || substr(nm, i + 2, length(nm))), nm))
        |    AS key
        |  FROM names),
        |cand AS (
        |  SELECT DISTINCT a.nm AS n1, b.nm AS n2
        |  FROM variants a JOIN variants b ON a.key = b.key AND a.nm < b.nm),
        |matched AS (
        |  SELECT n1, n2 FROM cand WHERE levenshtein(n1, n2) <= 1),
        |neigh AS (
        |  SELECT nm, CAST(count(*) AS BIGINT) AS n_neighbors FROM (
        |    SELECT n1 AS nm FROM matched UNION ALL SELECT n2 AS nm FROM matched)
        |  GROUP BY 1)
        |SELECT n_neighbors, CAST(count(*) AS BIGINT) AS n_customers,
        |  min(nm) AS first_name, max(nm) AS last_name
        |FROM neigh GROUP BY 1""".stripMargin,
    "q_text_stats" ->
      s"""WITH $baseCte
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS len_text,
         |  length(text) = n_chars AS n_chars_ok,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq_tokens,
         |  CAST(list_max(list_transform(toks, w -> length(w))) AS INTEGER) AS max_token_len
         |FROM base""".stripMargin,

    "q_token_count" ->
      s"""WITH $baseCte
         |SELECT doc_id,
         |  CAST(len(toks) AS INTEGER) AS ws_tokens,
         |  CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS re_tokens,
         |  CAST(length(regexp_replace(norm, '\\s', '', 'g')) AS INTEGER) AS n_chars_nospace
         |FROM base""".stripMargin,

    "q_lang_id" ->
      """WITH scored AS (SELECT doc_id, lang AS claimed_lang,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '[\x{4e00}-\x{9fff}]')) AS INTEGER) AS zh_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|is)\b')) AS INTEGER) AS en_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(el|la|los|de|que)\b')) AS INTEGER) AS es_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(der|die|das|und|ist)\b')) AS INTEGER) AS de_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(le|les|des|et|est)\b')) AS INTEGER) AS fr_n
        |  FROM documents)
        |SELECT *, pred_lang = claimed_lang AS lang_match FROM (
        |  SELECT doc_id, claimed_lang, zh_n, en_n, es_n, de_n, fr_n,
        |    CASE WHEN greatest(zh_n, en_n, es_n, de_n, fr_n) = 0 THEN 'und'
        |      WHEN zh_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'zh'
        |      WHEN en_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'en'
        |      WHEN es_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'es'
        |      WHEN de_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'de'
        |      ELSE 'fr' END AS pred_lang
        |  FROM scored)""".stripMargin,

    "q_vocab" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents
        |), counts AS (
        |  SELECT token, count(*) AS n FROM toks GROUP BY token HAVING count(*) >= 5
        |  ORDER BY n DESC, token LIMIT 500
        |)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) - 1 AS token_id,
        |  token, n
        |FROM counts""".stripMargin,

    // vocab rebuilt as a CTE; OOV accounting via LEFT JOIN; the rate is
    // integer ppm (// division) so no float rounding can split engines
    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents
        |), vocab AS (
        |  SELECT token FROM toks GROUP BY token HAVING count(*) >= 5
        |  ORDER BY count(*) DESC, token LIMIT 500
        |), j AS (
        |  SELECT t.doc_id, v.token IS NOT NULL AS iv
        |  FROM toks t LEFT JOIN vocab v USING (token))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
        |  (1000000 * CAST(sum(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS oov_ppm
        |FROM j GROUP BY doc_id""".stripMargin,

    // identical dual argmax; only w0's documents may move
    "q_rendezvous" ->
      """WITH s AS (SELECT doc_id, w.worker,
        |    md5(CAST(doc_id AS VARCHAR) || '|' || w.worker) AS score
        |  FROM documents,
        |    (SELECT unnest(['w0','w1','w2','w3','w4']) AS worker) w),
        |a AS (SELECT doc_id, worker FROM (
        |    SELECT doc_id, worker, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, worker) AS rk FROM s)
        |  WHERE rk = 1),
        |b AS (SELECT doc_id, worker FROM (
        |    SELECT doc_id, worker, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, worker) AS rk FROM s
        |    WHERE worker != 'w0')
        |  WHERE rk = 1)
        |SELECT b.worker,
        |  CAST(sum(CASE WHEN a.worker = b.worker THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN a.worker != b.worker THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved_in
        |FROM a JOIN b USING (doc_id)
        |GROUP BY 1""".stripMargin,

    // same draws rolled up per stratum; min/max across replicates
    "q_bootstrap_by_source" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |    unnest(range(1, 4)) AS rep
        |  FROM documents),
        |u AS (SELECT source, rep, n_chars,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
        |    || CAST(rep AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000000
        |    AS u_ppm
        |  FROM r),
        |k AS (SELECT source, rep, n_chars,
        |  CASE WHEN u_ppm < 367879 THEN 0 WHEN u_ppm < 735759 THEN 1
        |       WHEN u_ppm < 919699 THEN 2 WHEN u_ppm < 981012 THEN 3
        |       ELSE 4 END AS k
        |  FROM u),
        |per AS (SELECT rep, source, CAST(sum(k * n_chars) AS BIGINT)
        |    AS chars_rep
        |  FROM k GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
        |  CAST(min(chars_rep) AS BIGINT) AS chars_lo,
        |  CAST(max(chars_rep) AS BIGINT) AS chars_hi,
        |  CAST(max(chars_rep) - min(chars_rep) AS BIGINT) AS band
        |FROM per GROUP BY 1""".stripMargin,

    // identical floor-quota + largest-remainder top-up
    "q_apportion" ->
      """WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w),
        |q AS (SELECT source, weight,
        |    (10000 * weight) // W AS base_alloc,
        |    (10000 * weight) % W AS rem
        |  FROM w CROSS JOIN t),
        |r AS (SELECT *,
        |    10000 - sum(base_alloc) OVER () AS deficit,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM q)
        |SELECT source, weight, CAST(base_alloc AS BIGINT) AS base_alloc,
        |  CAST(CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |    AS extra,
        |  CAST(base_alloc + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc
        |FROM r""".stripMargin,

    // same salted-hash permutation, same round-robin deal
    "q_data_shuffle" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    md5('shuf|' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |i AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY h, doc_id) - 1 AS idx
        |  FROM h)
        |SELECT CAST(idx % 8 AS INTEGER) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM i GROUP BY 1""".stripMargin,

    // identical md5-uniform -> Poisson(1) inverse-CDF in integer ppm
    "q_bootstrap" ->
      """WITH r AS (SELECT doc_id, unnest(range(1, 4)) AS rep
        |  FROM documents),
        |u AS (SELECT rep,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
        |    || CAST(rep AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000000
        |    AS u_ppm
        |  FROM r),
        |k AS (SELECT rep,
        |  CASE WHEN u_ppm < 367879 THEN 0 WHEN u_ppm < 735759 THEN 1
        |       WHEN u_ppm < 919699 THEN 2 WHEN u_ppm < 981012 THEN 3
        |       ELSE 4 END AS k
        |  FROM u)
        |SELECT CAST(rep AS INTEGER) AS rep,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(k) AS BIGINT) AS n_drawn,
        |  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi
        |FROM k GROUP BY 1""".stripMargin,

    // DuckDB's ordered string_agg is listagg WITHIN GROUP
    "q_listagg" ->
      """SELECT source,
        |  string_agg(lang, ',' ORDER BY lang) AS langs,
        |  CAST(count(*) AS BIGINT) AS n_langs
        |FROM (SELECT DISTINCT source, lang FROM documents)
        |GROUP BY source""".stripMargin,

    // identical fixed-point regression; HUGEINT carries the cross
    // terms where Spark uses DECIMAL(38,0); numerator sign-flipped so
    // the integral division runs on positives in both engines
    "q_zipf_fit" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
        |    AS token
        |  FROM documents
        |), c AS (
        |  SELECT token, count(*) AS n FROM toks GROUP BY token
        |  ORDER BY n DESC, token LIMIT 100
        |), r AS (
        |  SELECT row_number() OVER (ORDER BY n DESC, token) AS rnk, n FROM c
        |), p AS (
        |  SELECT CAST(round(ln(rnk) * 1000000) AS BIGINT) AS x,
        |         CAST(round(ln(n) * 1000000) AS BIGINT) AS y
        |  FROM r
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x*x) AS HUGEINT) AS sxx,
        |    CAST(sum(x*y) AS HUGEINT) AS sxy
        |  FROM p)
        |SELECT k AS n_points,
        |  CAST((1000000 * (sx * sy - k * sxy)) // (k * sxx - sx * sx)
        |    AS BIGINT) AS slope_neg_ppm
        |FROM s""".stripMargin,

    // the generator's rows restated as the segment CTE
    "q_udtf_lines" ->
      """WITH base AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS line_idx,
        |  array_to_string(toks[i*10+1 : i*10+10], ' ') AS line
        |FROM base, LATERAL unnest(range((len(toks)+9)//10)) r(i)""".stripMargin,

    // fixed-width 10-token lines; corpus-frequent (>2 occurrences)
    // lines removed; documents rebuilt in line order
    "q_line_dedup" ->
      """WITH base AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |seg AS (SELECT doc_id, CAST(i AS INTEGER) AS line_idx,
        |    array_to_string(toks[i*10+1 : i*10+10], ' ') AS line
        |  FROM base, LATERAL unnest(range((len(toks)+9)//10)) r(i)),
        |c AS (SELECT line, count(*) AS n_occ FROM seg GROUP BY line)
        |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN c.n_occ <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN c.n_occ <= 2 THEN s.line END, ' '
        |    ORDER BY s.line_idx), '') AS clean_text
        |FROM seg s JOIN c USING (line)
        |GROUP BY s.doc_id""".stripMargin,

    // Same metric definitions as q_quality_score / q_lang_id /
    // q_dedup_exact, composed: the oracle recomputes all three gates.
    "q_curate" ->
      """WITH base AS (SELECT doc_id, source, lang, md5(text) AS h,
        |  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|a|of|and|to)\b')) AS INTEGER) AS n_stop,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '[\x{4e00}-\x{9fff}]')) AS INTEGER) AS zh_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|is)\b')) AS INTEGER) AS en_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(el|la|los|de|que)\b')) AS INTEGER) AS es_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(der|die|das|und|ist)\b')) AS INTEGER) AS de_n,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(le|les|des|et|est)\b')) AS INTEGER) AS fr_n
        |  FROM documents
        |), scored AS (SELECT *,
        |  CAST(n_tokens >= 10 AS INTEGER) + CAST(n_chars >= 50 AS INTEGER)
        |    + CAST(n_punct * 20 <= n_chars AS INTEGER)
        |    + CAST(n_stop > 0 AS INTEGER) AS q,
        |  CASE WHEN greatest(zh_n, en_n, es_n, de_n, fr_n) = 0 THEN 'und'
        |    WHEN zh_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'zh'
        |    WHEN en_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'en'
        |    WHEN es_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'es'
        |    WHEN de_n = greatest(zh_n, en_n, es_n, de_n, fr_n) THEN 'de'
        |    ELSE 'fr' END AS pred_lang,
        |  doc_id = min(doc_id) OVER (PARTITION BY h) AS canon
        |  FROM base)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(CAST(canon AS INTEGER)) AS BIGINT) AS n_canonical,
        |  CAST(sum(CAST((canon AND q >= 3 AND pred_lang = lang) AS INTEGER)) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN canon AND q >= 3 AND pred_lang = lang
        |    THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM scored GROUP BY source, lang""".stripMargin,

    "q_quality_score" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS n_punct,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|a|of|and|to)\b')) AS INTEGER) AS n_stopwords
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_chars, n_punct, n_stopwords,
        |  CAST((n_tokens >= 10) AS INTEGER) + CAST((n_chars >= 50) AS INTEGER)
        |  + CAST((n_punct * 20 <= n_chars) AS INTEGER)
        |  + CAST((n_stopwords > 0) AS INTEGER) AS quality_score
        |FROM m""".stripMargin,

    // linear quality classifier: integer micro-unit weights x integer
    // count features — the keep decision is the exact sign of the score
    "q_quality_lr" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|a|of|and|to)\b')) AS BIGINT) AS n_stopwords
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(-800000 + 20000 * n_tokens + 500 * n_chars
        |    - 60000 * n_punct + 30000 * n_stopwords AS BIGINT) AS score_e6,
        |  (-800000 + 20000 * n_tokens + 500 * n_chars
        |    - 60000 * n_punct + 30000 * n_stopwords) > 0 AS keep
        |FROM m""".stripMargin,

    // hashing-trick featurizer: md5-derived buckets, vocabulary-free
    "q_feature_hash" ->
      s"""WITH $baseCte,
         |t AS (SELECT doc_id, unnest(toks) AS token FROM base)
         |SELECT doc_id,
         |  CAST(CAST(('0x' || substr(md5(token), 1, 8)) AS UBIGINT)
         |    % 64 AS INTEGER) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM t GROUP BY 1, 2""".stripMargin,

    // the registered graft_token_stats SQL function must agree with the
    // portable token-stats formulation
    "q_sql_custom_fn" ->
      s"""WITH $baseCte
         |SELECT doc_id,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq_tokens,
         |  CAST(list_max(list_transform(toks, w -> length(w))) AS INTEGER) AS max_token_len
         |FROM base""".stripMargin,

    "q_doc_fingerprint" ->
      s"""WITH $baseCte
         |SELECT doc_id,
         |  CAST(CAST(('0x' || substr(md5(norm), 1, 15)) AS UBIGINT) AS BIGINT) AS fp64,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(toks,
         |        w -> CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) AS BIGINT))),
         |    (a, b) -> (a * 1000003 + b) % 1000000007) AS rolling_fp
         |FROM base""".stripMargin,

    "q_extract_numbers" ->
      """SELECT doc_id, match_idx, number_str,
        |  CAST(number_str AS BIGINT) AS number_val
        |FROM (SELECT doc_id,
        |  CAST(unnest(range(len(m))) AS INTEGER) AS match_idx,
        |  unnest(m) AS number_str
        |  FROM (SELECT doc_id,
        |    regexp_extract_all(text || ' ' || source, '[0-9]+') AS m
        |    FROM documents))""".stripMargin,

    "q_quality_audit" ->
      """SELECT * FROM (
        |SELECT 'doc_id' AS column_name, CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  count(DISTINCT doc_id) AS n_distinct, CAST(min(doc_id) AS VARCHAR) AS min_str, CAST(max(doc_id) AS VARCHAR) AS max_str FROM documents
        |UNION ALL SELECT 'text', CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT text), CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'lang', CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'source', CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT source), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'n_chars', CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents)""".stripMargin,

    "q_train_split" ->
      """SELECT doc_id, lang, bucket,
        |CASE WHEN bucket < 8 THEN 'train' WHEN bucket < 9 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |    % 10 AS BIGINT) AS bucket
        |  FROM documents)""".stripMargin,

    // Range-based cutoff in pure integer microseconds — `*8//10` is the
    // same Long arithmetic Spark runs, so the boundary can't drift.
    "q_time_split" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        |  FROM events),
        |s AS (SELECT CASE WHEN epoch_us(ts) < lo + (hi - lo) * 8 // 10
        |    THEN 'train' ELSE 'holdout' END AS split,
        |    epoch_us(ts) AS ts_us
        |  FROM events, b)
        |SELECT split, CAST(count(*) AS BIGINT) AS n,
        |  min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us
        |FROM s GROUP BY 1""".stripMargin,

    // The incoming batch (doc_id >= 450) probed against the standing
    // corpus's band index — same band construction, old×new join only.
    "q_dedup_incremental" ->
      (bandsCte +
        s""",
           |hits AS (SELECT n.doc_id, count(DISTINCT o.doc_id) AS n_dup_candidates,
           |  min(o.doc_id) AS first_match
           |  FROM bands n JOIN bands o ON n.band_id = o.band_id
           |    AND n.band_key = o.band_key
           |  WHERE n.doc_id >= 450 AND o.doc_id < 450
           |  GROUP BY n.doc_id)
           |SELECT d.doc_id,
           |  CAST(coalesce(h.n_dup_candidates, 0) AS BIGINT) AS n_dup_candidates,
           |  h.first_match,
           |  coalesce(h.n_dup_candidates, 0) > 0 AS is_duplicate
           |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
           |WHERE d.doc_id >= 450""".stripMargin),

    // Three PageRank iterations unrolled in integer fixed-point — the
    // same micro-unit floor-division arithmetic as the engine, so the
    // BIGINT ranks must agree exactly (no float tolerance anywhere).
    "q_pagerank" -> {
      val iter = (i: Int) =>
        s"""c$i AS (SELECT e.dst,
           |  CAST(sum((r.rank_f * 85) // (d.deg * 100)) AS BIGINT) AS in_mass
           |  FROM edges e JOIN r${i - 1} r ON e.src = r.doc_id
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r$i AS (SELECT d0.doc_id,
           |  CAST((15 * 1000000000000) // (100 * nn.n_nodes)
           |    + coalesce(c$i.in_mass, 0) AS BIGINT) AS rank_f
           |  FROM documents d0 CROSS JOIN nn
           |  LEFT JOIN c$i ON d0.doc_id = c$i.dst)""".stripMargin
      bandsCte +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
           |  UNION ALL SELECT doc_b, doc_a FROM prs),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*) AS n_nodes FROM documents),
           |r0 AS (SELECT doc_id, CAST(1000000000000 // nn.n_nodes AS BIGINT) AS rank_f
           |  FROM documents CROSS JOIN nn),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT r3.doc_id, CAST(coalesce(deg.deg, 0) AS BIGINT) AS degree,
           |  r3.rank_f AS pagerank_f,
           |  CAST(round(CAST(r3.rank_f AS DOUBLE) / 1e12, 9) AS DOUBLE) AS pagerank
           |FROM r3 LEFT JOIN deg ON r3.doc_id = deg.src""".stripMargin
    },

    // Three synchronous LPA rounds unrolled — per-neighbor label votes,
    // argmax by (count desc, label asc), no-vote nodes keep their label
    "q_label_prop" -> {
      val iter = (i: Int) =>
        s"""v$i AS (SELECT e.dst, l.lbl, count(*) AS c
           |  FROM edges e JOIN l${i - 1} l ON e.src = l.doc_id
           |  GROUP BY 1, 2),
           |b$i AS (SELECT dst, lbl FROM (
           |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst
           |      ORDER BY c DESC, lbl) AS rn FROM v$i)
           |  WHERE rn = 1),
           |l$i AS (SELECT l.doc_id, coalesce(b.lbl, l.lbl) AS lbl
           |  FROM l${i - 1} l LEFT JOIN b$i b ON l.doc_id = b.dst)""".stripMargin
      bandsCte +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
           |  UNION ALL SELECT doc_b, doc_a FROM prs),
           |l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT doc_id, lbl AS label FROM l3""".stripMargin
    },

    // Three k=2 peeling rounds unrolled — each round keeps edges whose
    // both endpoints still have degree >= 2, mirroring the engine's
    // semi-join rounds exactly (set semantics, integer degrees).
    "q_kcore" -> {
      val peel = (i: Int) =>
        s"""a$i AS (SELECT src FROM e${i - 1} GROUP BY src
           |  HAVING count(*) >= 2),
           |e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN a$i s ON e.src = s.src
           |  JOIN a$i t ON e.dst = t.src)""".stripMargin
      bandsCte +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |e0 AS (SELECT doc_a AS src, doc_b AS dst FROM prs
           |  UNION ALL SELECT doc_b, doc_a FROM prs),
           |${peel(1)},
           |${peel(2)},
           |${peel(3)}
           |SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
           |FROM e3 GROUP BY src""".stripMargin
    },

    // Near-dup components (same recursive CTE as q_dedup_components)
    // split by the hash of their canonical id — the whole cluster lands
    // in one split, so the test set can never contain a soft copy of a
    // training document.
    "q_split_leakage_safe" ->
      (bandsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (SELECT doc_a AS n, doc_b AS m FROM prs
           |  UNION ALL SELECT doc_b, doc_a FROM prs),
           |reach(n, m) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.m FROM reach JOIN edges e ON reach.m = e.n),
           |comp AS (SELECT n AS doc_id, min(m) AS component_id FROM reach GROUP BY n)
           |SELECT doc_id, component_id, bucket,
           |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket < 9 THEN 'val'
           |    ELSE 'test' END AS split
           |FROM (SELECT doc_id, component_id,
           |  CAST(CAST(('0x' || substr(md5(CAST(component_id AS VARCHAR)), 1, 8)) AS UBIGINT)
           |    % 10 AS BIGINT) AS bucket
           |  FROM comp)""".stripMargin),

    // Same u-draw and ln(u)/w ranking; ln/log1p are IEEE-double on both
    // engines and ties are broken on doc_id, so the selected set and
    // order agree (the float key itself is not emitted).
    "q_sample_weighted" ->
      """SELECT doc_id, lang, CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS INTEGER) AS rn
        |FROM (SELECT doc_id, lang,
        |  ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) + 1.0)
        |     / 4294967296.0) / ln(1 + n_chars) AS es_key
        |  FROM documents)
        |ORDER BY es_key DESC, doc_id LIMIT 50""".stripMargin,

    // Quotas are budget*wt//sum(wt) floor division — integer on both
    // engines; selection is longest-first within source, id tiebreak.
    "q_mixture_sample" ->
      """WITH w AS (SELECT source,
        |    1 + (CAST(substr(source, 4) AS INTEGER) % 3) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT sum(wt) AS tw FROM w),
        |q AS (SELECT w.source, CAST(200 * wt // tw AS BIGINT) AS quota
        |  FROM w, tot),
        |r AS (SELECT d.source, d.n_chars, row_number() OVER (
        |    PARTITION BY d.source ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM documents d)
        |SELECT r.source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(r.n_chars) AS BIGINT) AS sum_chars_kept
        |FROM r JOIN q ON r.source = q.source
        |WHERE r.rn <= q.quota GROUP BY r.source""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, tokens_before,
        |  tokens_before // 512 AS pack_id FROM c""".stripMargin,

    // chunk starts are every 48 tokens while < len; chunk covers up to
    // 64 tokens; fingerprint = md5 of the space-joined token window
    "q_chunk_stride" ->
      s"""WITH $baseCte,
         |c AS (SELECT doc_id, toks, len(toks) AS n,
         |    unnest(range(0, CAST(len(toks) AS BIGINT), 48)) AS start
         |  FROM base)
         |SELECT doc_id,
         |  CAST(start // 48 AS INTEGER) AS chunk_id,
         |  CAST(start AS INTEGER) AS start_tok,
         |  CAST(least(64, n - start) AS INTEGER) AS n_tok_chunk,
         |  md5(array_to_string(toks[start + 1 : start + 64], ' '))
         |    AS chunk_md5
         |FROM c""".stripMargin,

    "q_tfidf_top" ->
      s"""WITH $baseCte,
         |toks AS (SELECT doc_id, unnest(toks) AS token FROM base),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT token, count(*) AS df
         |  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |scored AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |  tf.tf * ln(n.n / df.df) AS score FROM tf JOIN df USING (token), n)
         |SELECT doc_id, token AS top_token, tf AS top_tf, df AS top_df,
         |  CAST(round(score, 6) AS DOUBLE) AS tfidf
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, token) AS rn FROM scored)
         |WHERE rn = 1""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
        |count(*) AS n_docs FROM documents GROUP BY 1""".stripMargin,

    // Benchmark decontamination: any 3-shingle shared with the
    // benchmark slice (doc_id < 5) flags the document.
    // The unbiased minhash estimator (agreeing rows / 16) against the
    // exact shingle Jaccard, per surfaced candidate pair.
    "q_jaccard_calibration" ->
      (bandsCte +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |ds AS (SELECT sh.doc_id, list_distinct(sh.s) AS shd, sig.g
           |  FROM sh JOIN sig ON sh.doc_id = sig.doc_id),
           |j AS (SELECT p.doc_a, p.doc_b,
           |  CAST(len(list_filter(list_transform(range(16),
           |    i -> sa.g[i+1] = sb.g[i+1]), x -> x)) AS INTEGER) AS n_agree,
           |  len(list_intersect(sa.shd, sb.shd)) AS inter,
           |  len(sa.shd) + len(sb.shd) - len(list_intersect(sa.shd, sb.shd)) AS uni
           |  FROM prs p JOIN ds sa ON p.doc_a = sa.doc_id
           |  JOIN ds sb ON p.doc_b = sb.doc_id)
           |SELECT doc_a, doc_b, n_agree,
           |  CAST(n_agree AS DOUBLE) / 16.0 AS est,
           |  CAST(round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS DOUBLE) AS exact_j,
           |  CAST(round(abs(CAST(n_agree AS DOUBLE) / 16.0
           |    - CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)), 6) AS DOUBLE) AS abs_err
           |FROM j""".stripMargin),

    "q_decontaminate" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh),
         |bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id < 5),
         |ov AS (SELECT doc_id, count(*) AS n_overlap
         |  FROM ex SEMI JOIN bench USING (shingle)
         |  WHERE doc_id >= 5 GROUP BY 1)
         |SELECT d.doc_id, coalesce(ov.n_overlap, 0) AS n_overlap,
         |  coalesce(ov.n_overlap, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |WHERE d.doc_id >= 5""".stripMargin,

    // Smoothed log-odds z-score from exact integer counts; same
    // operation order as the engine so the per-source top-3 agrees.
    "q_distinctive_terms" ->
      s"""WITH $baseCte,
         |toks AS (SELECT source, unnest(toks) AS token FROM base),
         |ys AS (SELECT source, token, count(*) AS y_s FROM toks GROUP BY 1, 2),
         |ya AS (SELECT token, count(*) AS y_all FROM toks GROUP BY 1),
         |ns AS (SELECT source, sum(y_s) AS n_s FROM ys GROUP BY 1),
         |tot AS (SELECT sum(y_all) AS n_all, count(*) AS v FROM ya),
         |d AS (SELECT ys.source, ys.token, ys.y_s,
         |  ln((CAST(y_s AS DOUBLE) + 1.0)
         |    / (CAST(n_s AS DOUBLE) - CAST(y_s AS DOUBLE) + CAST(v AS DOUBLE)))
         |  - ln((CAST(y_all - y_s AS DOUBLE) + 1.0)
         |    / (CAST(n_all - n_s AS DOUBLE) - CAST(y_all - y_s AS DOUBLE) + CAST(v AS DOUBLE)))
         |  AS lo,
         |  1.0 / (CAST(y_s AS DOUBLE) + 1.0)
         |    + 1.0 / (CAST(y_all - y_s AS DOUBLE) + 1.0) AS var
         |  FROM ys JOIN ya USING (token) JOIN ns USING (source), tot)
         |SELECT source, token, y_s, CAST(rn AS INTEGER) AS rn,
         |  CAST(round(z, 6) + 0 AS DOUBLE) AS zscore
         |FROM (SELECT *, lo / sqrt(var) AS z,
         |  row_number() OVER (PARTITION BY source ORDER BY lo / sqrt(var) DESC, token) AS rn
         |  FROM d)
         |WHERE rn <= 3""".stripMargin,

    // Exact integer PMI ratio before the single ln, snapped to x1e6 —
    // identical fixed-point ranking on both engines. Tie-break on
    // (prev, cur) keeps the LIMIT stable.
    "q_pmi_top" ->
      s"""WITH $baseCte,
         |toks AS (SELECT unnest(toks) AS token FROM base),
         |uni AS (SELECT token, count(*) AS c_tok FROM toks GROUP BY 1),
         |nu AS (SELECT sum(c_tok) AS n_uni FROM uni),
         |bg AS (SELECT u['prev'] AS prev, u['cur'] AS cur
         |  FROM (SELECT unnest(list_transform(range(len(toks)-1),
         |      i -> {'prev': toks[i+1], 'cur': toks[i+2]})) AS u
         |    FROM base WHERE len(toks) >= 2)),
         |bi AS (SELECT prev, cur, count(*) AS c_bi FROM bg GROUP BY 1, 2),
         |nb AS (SELECT sum(c_bi) AS n_bi FROM bi)
         |SELECT prev, cur, c_bi,
         |  CAST(round(ln((CAST(c_bi AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE))
         |    / (CAST(n_bi AS DOUBLE) * CAST(u1.c_tok AS DOUBLE) * CAST(u2.c_tok AS DOUBLE))) * 1e6) AS BIGINT) AS pmi_f
         |FROM bi JOIN uni u1 ON bi.prev = u1.token
         |JOIN uni u2 ON bi.cur = u2.token, nu, nb
         |WHERE c_bi >= 5
         |ORDER BY pmi_f DESC, prev, cur LIMIT 100""".stripMargin,

    // k-anonymity: equivalence classes under the (lang, source,
    // 100-char-length) quasi-identifier with fewer than k=5 members
    "q_k_anon" ->
      """SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5""".stripMargin,

    // Leave-one-out KS per source: both ECDFs evaluated on the pooled
    // distinct-length grid, all-integer comparison, ppm fixed point.
    "q_ks_drift" ->
      """WITH c AS (SELECT n_chars AS v, source, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
        |  FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM c),
        |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS t_v FROM c GROUP BY 1),
        |cumt AS (SELECT v,
        |    CAST(sum(t_v) OVER (ORDER BY v) AS BIGINT) AS cum_tot FROM vals),
        |grid AS (SELECT vals.v, srcs.source FROM vals CROSS JOIN srcs),
        |cum AS (SELECT g.v, g.source,
        |    CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.source
        |      ORDER BY g.v) AS BIGINT) AS cum_s
        |  FROM grid g LEFT JOIN c ON c.v = g.v AND c.source = g.source),
        |d AS (SELECT cum.source, n_s, n_tot - n_s AS rest_n, cum.v,
        |    abs(cum_s * (n_tot - n_s) - (cum_tot - cum_s) * n_s) AS dd
        |  FROM cum JOIN cumt USING (v)
        |  JOIN srcs ON srcs.source = cum.source, tot),
        |m AS (SELECT source, CAST(max(dd) AS BIGINT) AS d_num
        |  FROM d GROUP BY 1)
        |SELECT d.source, CAST(max(n_s) AS BIGINT) AS n_s,
        |  CAST(max(d_num) AS BIGINT) AS d_num,
        |  CAST(min(v) AS BIGINT) AS v_at_max,
        |  CAST(max(d_num) * 1000000 // (max(n_s) * max(rest_n)) AS BIGINT)
        |    AS ks_ppm
        |FROM d JOIN m ON m.source = d.source AND d.dd = m.d_num
        |GROUP BY 1""".stripMargin,

    // PSI: equal-frequency bins from the pooled CDF (first-rank rule,
    // ties together), leave-one-out rest, add-one smoothing, per-bin
    // ×1e6 fixed-point terms summed as integers.
    "q_psi_drift" ->
      """WITH c AS (SELECT n_chars AS v, source, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
        |  FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM c),
        |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS t_v FROM c GROUP BY 1),
        |bins AS (SELECT v, least(9,
        |    CAST(COALESCE(sum(t_v) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) * 10 // n_tot) AS bin
        |  FROM vals, tot),
        |pb AS (SELECT source, bin, CAST(sum(c) AS BIGINT) AS c_sb
        |  FROM c JOIN bins USING (v) GROUP BY 1, 2),
        |bt AS (SELECT bin, CAST(sum(c_sb) AS BIGINT) AS c_b
        |  FROM pb GROUP BY 1),
        |dense AS (SELECT srcs.source, srcs.n_s, bt.bin, bt.c_b,
        |    COALESCE(pb.c_sb, 0) AS c_sb, n_tot
        |  FROM srcs CROSS JOIN bt
        |  LEFT JOIN pb ON pb.source = srcs.source AND pb.bin = bt.bin, tot),
        |terms AS (SELECT source, n_s,
        |    CAST(round(
        |      ((CAST(c_sb + 1 AS DOUBLE) / CAST(n_s + 10 AS DOUBLE))
        |        - (CAST(c_b - c_sb + 1 AS DOUBLE)
        |           / CAST(n_tot - n_s + 10 AS DOUBLE)))
        |      * ln((CAST(c_sb + 1 AS DOUBLE) / CAST(n_s + 10 AS DOUBLE))
        |        / (CAST(c_b - c_sb + 1 AS DOUBLE)
        |           / CAST(n_tot - n_s + 10 AS DOUBLE))) * 1e6)
        |      AS BIGINT) AS term_f
        |  FROM dense)
        |SELECT source, CAST(max(n_s) AS BIGINT) AS n_s,
        |  CAST(sum(term_f) AS BIGINT) AS psi_fp, count(*) AS n_bins
        |FROM terms GROUP BY 1""".stripMargin,

    // l-diversity: classes ≥ k=5 members whose sensitive attribute
    // (lang) spans < l=3 distinct values.
    "q_l_diversity" ->
      """SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  count(*) AS n_docs, count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1, 2
        |HAVING count(*) >= 5 AND count(DISTINCT lang) < 3""".stripMargin,

    // Concat-and-chunk packing manifest: the window form of the
    // distributed prefix sum the Spark side computes without a window.
    "q_pack_blocks" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
        |      AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, n_toks,
        |    CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS tok_offset
        |  FROM t)
        |SELECT doc_id, n_toks, tok_offset, first_block, last_block,
        |  last_block - first_block + 1 AS n_blocks,
        |  CAST((last_block - first_block + 1) > 1 AS INT) AS is_split
        |FROM (SELECT doc_id, n_toks, tok_offset,
        |  tok_offset // 1024 AS first_block,
        |  CASE WHEN n_toks = 0 THEN tok_offset // 1024 - 1
        |    ELSE (tok_offset + n_toks - 1) // 1024 END AS last_block
        |FROM c)""".stripMargin,

    // Identical deterministic PII injection (the corpus itself is
    // sanitized), then the same three-pattern redaction chain; DuckDB
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all default.
    "q_redact_pii" ->
      """WITH dirty AS (SELECT doc_id,
        |  text ||
        |  CASE WHEN doc_id % 3 > 0 THEN printf(' contact user%d@example.com', doc_id) ELSE '' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN printf(' tel +1-555-%04d', doc_id % 10000) ELSE '' END ||
        |  printf(' see https://corpus.example/doc/%d', doc_id) AS text
        |  FROM documents),
        |red AS (SELECT doc_id, text,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    'https?://[^\s]+', '[URL]', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS r
        |  FROM dirty)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_email,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INTEGER) AS n_url,
        |  CAST(len(regexp_extract_all(text, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phone,
        |  md5(r) AS redacted_hash,
        |  CAST(length(r) AS BIGINT) AS redacted_len
        |FROM red""".stripMargin,

    // Fixed-point (×1e6 BIGINT) per-bigram log-probs summed exactly,
    // divided and rounded only at the end — mirrors the Spark side so
    // float summation order can never split the engines. Bigrams travel
    // as the engine's 60-bit fingerprints (fp60 of "prev cur" / of prev
    // — the space separator is injective over whitespace-split tokens),
    // so a fingerprint collision merges the same identities on both
    // engines and the gate stays exact at any collision odds.
    "q_lm_score" ->
      s"""WITH $baseCte,
         |bg AS (SELECT doc_id,
         |    CAST(CAST(('0x' || substr(md5(u['prev'] || ' ' || u['cur']),
         |      1, 15)) AS UBIGINT) AS BIGINT) AS fp_bi,
         |    CAST(CAST(('0x' || substr(md5(u['prev']),
         |      1, 15)) AS UBIGINT) AS BIGINT) AS fp_prev
         |  FROM (SELECT doc_id, unnest(list_transform(range(len(toks)-1),
         |      i -> {'prev': toks[i+1], 'cur': toks[i+2]})) AS u
         |    FROM base WHERE len(toks) >= 2)),
         |bi AS (SELECT fp_bi, fp_prev, count(*) AS c_bi FROM bg GROUP BY 1, 2),
         |uni AS (SELECT fp_prev, sum(c_bi) AS c_prev FROM bi GROUP BY 1),
         |model AS (SELECT fp_bi,
         |  CAST(round(ln(CAST(c_bi AS DOUBLE) / c_prev) * 1e6) AS BIGINT) AS logp_f
         |  FROM bi JOIN uni USING (fp_prev)),
         |sc AS (SELECT doc_id, count(*) AS n_bigrams, sum(logp_f) AS sum_f
         |  FROM bg JOIN model USING (fp_bi) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(round(CAST(sum_f AS DOUBLE) / (n_bigrams * 1e6), 6) + 0 AS DOUBLE) AS lm_score
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,

    // The bloom prefilter is exact end-to-end (false positives are
    // removed by the verify join), so the oracle is the same exact
    // semi-join overlap count as q_decontaminate.
    "q_decontaminate_bloom" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh),
         |bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id < 5),
         |ov AS (SELECT doc_id, count(*) AS n_overlap
         |  FROM ex SEMI JOIN bench USING (shingle)
         |  WHERE doc_id >= 5 GROUP BY 1)
         |SELECT d.doc_id, coalesce(ov.n_overlap, 0) AS n_overlap,
         |  coalesce(ov.n_overlap, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |WHERE d.doc_id >= 5""".stripMargin,

    // Degenerate-text detection: the most-repeated shingle's share of
    // the document's shingle stream.
    "q_repetition" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         |g AS (SELECT doc_id, shingle, count(*) AS cnt FROM ex GROUP BY 1, 2),
         |t AS (SELECT doc_id, max(cnt) AS top_count,
         |  CAST(sum(cnt) AS BIGINT) AS n_shingles FROM g GROUP BY 1)
         |SELECT doc_id, top_count, n_shingles,
         |  CAST(round(CAST(top_count AS DOUBLE) / n_shingles, 6) AS DOUBLE) AS top_ratio,
         |  top_count * 5 >= n_shingles AS degenerate
         |FROM t""".stripMargin,

    "q_dedup_near" ->
      """SELECT md5(regexp_replace(regexp_replace(lower(trim(text)),
        |  '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm_hash,
        |min(doc_id) AS canonical_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "q_dedup_minhash" ->
      s"""$bandsCte
         |SELECT doc_id, band_id, band_key FROM bands""".stripMargin,

    "q_dedup_minhash_pairs" ->
      s"""$bandsCte
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.band_key = b.band_key
         | AND a.doc_id < b.doc_id""".stripMargin,

    // Degree-ordered orientation: each triangle materializes exactly
    // once, as a wedge at its (deg, id)-lowest vertex.
    "q_triangles" ->
      s"""$bandsCte,
         |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band_id = b.band_id
         |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |deg AS (SELECT v, count(*) AS deg FROM (
         |  SELECT doc_a AS v FROM prs UNION ALL SELECT doc_b FROM prs)
         |  GROUP BY v),
         |ori AS (SELECT
         |  CASE WHEN da.deg < db.deg
         |      OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |    THEN p.doc_a ELSE p.doc_b END AS src,
         |  CASE WHEN da.deg < db.deg
         |      OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |    THEN p.doc_b ELSE p.doc_a END AS dst,
         |  CASE WHEN da.deg < db.deg
         |      OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |    THEN da.deg ELSE db.deg END AS deg_src,
         |  CASE WHEN da.deg < db.deg
         |      OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |    THEN db.deg ELSE da.deg END AS deg_dst
         |  FROM prs p JOIN deg da ON p.doc_a = da.v
         |    JOIN deg db ON p.doc_b = db.v),
         |tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
         |  FROM ori e1 JOIN ori e2 ON e1.src = e2.src
         |    AND (e1.deg_dst < e2.deg_dst
         |      OR (e1.deg_dst = e2.deg_dst AND e1.dst < e2.dst))
         |  WHERE EXISTS (SELECT 1 FROM ori e3
         |    WHERE e3.src = e1.dst AND e3.dst = e2.dst))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
         |  SELECT u AS doc_id FROM tri
         |  UNION ALL SELECT v FROM tri
         |  UNION ALL SELECT w FROM tri)
         |GROUP BY doc_id""".stripMargin,

    // The space-saving sketch's no-false-negative guarantee makes the
    // candidate+exact-recount pipeline EQUAL to this brute-force HAVING.
    "q_heavy_hitters" ->
      s"""WITH $baseCte,
         |tok AS (SELECT unnest(toks) AS token FROM base)
         |SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM tok GROUP BY token
         |HAVING count(*) * 512 > (SELECT count(*) FROM tok)""".stripMargin,

    // BM25 argmax per document; the ranking key is the x1e6 fixed-point
    // snap so a last-ulp wobble can never flip the winner.
    "q_bm25_top" ->
      s"""WITH $baseCte,
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM base),
         |dl AS (SELECT doc_id, len(toks) AS dl FROM base),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  CAST(sum(len(toks)) AS DOUBLE) AS sum_dl FROM base),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT token, count(*) AS df FROM (
         |  SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1),
         |sc AS (SELECT tf.doc_id, tf.token, tf.tf,
         |  ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0))
         |      / (tf.tf + 1.2 * (1.0 - 0.75
         |        + 0.75 * dl.dl / (st.sum_dl / st.n_docs)))) AS score
         |  FROM tf JOIN df USING (token)
         |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
         |SELECT doc_id, token AS top_token, CAST(tf AS BIGINT) AS top_tf,
         |  round(score, 6) AS bm25
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY CAST(round(score * 1e6) AS BIGINT) DESC, token) AS rn
         |  FROM sc)
         |WHERE rn = 1""".stripMargin,

    // Entropy terms snap to x1e6 fixed point per (doc, char) before the
    // per-document sum — distributed summation order can't move a digit.
    "q_char_entropy" ->
      """WITH c AS (SELECT doc_id,
        |  regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS cl
        |  FROM documents),
        |ch AS (SELECT doc_id, unnest(list_transform(range(length(cl)),
        |  i -> substr(cl, CAST(i AS INTEGER) + 1, 1))) AS ch FROM c),
        |pc AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |lens AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS len
        |  FROM pc GROUP BY 1),
        |t AS (SELECT pc.doc_id, pc.cnt, lens.len,
        |  CAST(round(CAST(cnt AS DOUBLE) / len
        |    * ln(CAST(len AS DOUBLE) / cnt) * 1e6) AS BIGINT) AS term_f
        |  FROM pc JOIN lens USING (doc_id)),
        |e AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |  max(len) AS n_ascii_chars,
        |  round(CAST(sum(term_f) AS DOUBLE) / 1e6, 6) AS entropy
        |  FROM t GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(e.n_distinct_chars, 0) AS n_distinct_chars,
        |  coalesce(e.n_ascii_chars, 0) AS n_ascii_chars,
        |  coalesce(e.entropy, 0.0) AS entropy
        |FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id""".stripMargin,

    "q_dedup_simhash" ->
      """WITH h AS (SELECT doc_id,
        |  list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    w -> md5(w)) AS hs
        |  FROM documents),
        |sim AS (SELECT doc_id, array_to_string(
        |  list_transform(range(64), b -> CASE WHEN list_sum(
        |    list_transform(hs, x ->
        |      (((strpos('0123456789abcdef', substr(x, CAST(b//4 AS INTEGER)+1, 1)) - 1
        |         >> CAST(b%4 AS INTEGER)) & 1) * 2 - 1))) > 0
        |    THEN '1' ELSE '0' END), '') AS simhash
        |  FROM h)
        |SELECT doc_id, simhash, substr(simhash, 1, 16) AS bucket16 FROM sim""".stripMargin,

    // Same-prefix simhash blocking + exact Hamming on collisions only.
    "q_dedup_simhash_pairs" ->
      """WITH h AS (SELECT doc_id,
        |  list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    w -> md5(w)) AS hs
        |  FROM documents),
        |sim AS (SELECT doc_id, array_to_string(
        |  list_transform(range(64), b -> CASE WHEN list_sum(
        |    list_transform(hs, x ->
        |      (((strpos('0123456789abcdef', substr(x, CAST(b//4 AS INTEGER)+1, 1)) - 1
        |         >> CAST(b%4 AS INTEGER)) & 1) * 2 - 1))) > 0
        |    THEN '1' ELSE '0' END), '') AS simhash
        |  FROM h)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(list_sum(list_transform(range(64), i ->
        |    CASE WHEN substr(a.simhash, CAST(i AS INTEGER) + 1, 1)
        |      != substr(b.simhash, CAST(i AS INTEGER) + 1, 1)
        |    THEN 1 ELSE 0 END)) AS INTEGER) AS hamming,
        |  list_sum(list_transform(range(64), i ->
        |    CASE WHEN substr(a.simhash, CAST(i AS INTEGER) + 1, 1)
        |      != substr(b.simhash, CAST(i AS INTEGER) + 1, 1)
        |    THEN 1 ELSE 0 END)) <= 8 AS near_dup
        |FROM sim a JOIN sim b
        |  ON substr(a.simhash, 1,
        |       (SELECT greatest(8, length(bin(count(*) // 32))) FROM documents))
        |     = substr(b.simhash, 1,
        |       (SELECT greatest(8, length(bin(count(*) // 32))) FROM documents))
        |  AND a.doc_id < b.doc_id""".stripMargin,

    // The successor cap restated: rank each band bucket by doc_id, keep
    // a pair iff it is within 32 rank-successors in SOME shared band.
    "q_dedup_minhash_pairs_capped" ->
      s"""$bandsCte,
         |rk AS (SELECT doc_id, band_id, band_key,
         |  row_number() OVER (PARTITION BY band_id, band_key
         |    ORDER BY doc_id) AS rn FROM bands)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM rk a JOIN rk b ON a.band_id = b.band_id
         |  AND a.band_key = b.band_key
         |  AND b.rn > a.rn AND b.rn <= a.rn + 32""".stripMargin,

    "q_dedup_simhash_pairs_capped" ->
      """WITH h AS (SELECT doc_id,
        |  list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    w -> md5(w)) AS hs
        |  FROM documents),
        |sim AS (SELECT doc_id, array_to_string(
        |  list_transform(range(64), b -> CASE WHEN list_sum(
        |    list_transform(hs, x ->
        |      (((strpos('0123456789abcdef', substr(x, CAST(b//4 AS INTEGER)+1, 1)) - 1
        |         >> CAST(b%4 AS INTEGER)) & 1) * 2 - 1))) > 0
        |    THEN '1' ELSE '0' END), '') AS simhash
        |  FROM h),
        |rk AS (SELECT doc_id, simhash,
        |  substr(simhash, 1,
        |    (SELECT greatest(8, length(bin(count(*) // 32))) FROM documents))
        |    AS bucket,
        |  row_number() OVER (PARTITION BY substr(simhash, 1,
        |    (SELECT greatest(8, length(bin(count(*) // 32))) FROM documents))
        |    ORDER BY doc_id) AS rn
        |  FROM sim)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(list_sum(list_transform(range(64), i ->
        |    CASE WHEN substr(a.simhash, CAST(i AS INTEGER) + 1, 1)
        |      != substr(b.simhash, CAST(i AS INTEGER) + 1, 1)
        |    THEN 1 ELSE 0 END)) AS INTEGER) AS hamming,
        |  list_sum(list_transform(range(64), i ->
        |    CASE WHEN substr(a.simhash, CAST(i AS INTEGER) + 1, 1)
        |      != substr(b.simhash, CAST(i AS INTEGER) + 1, 1)
        |    THEN 1 ELSE 0 END)) <= 8 AS near_dup
        |FROM rk a JOIN rk b ON a.bucket = b.bucket
        |  AND b.rn > a.rn AND b.rn <= a.rn + 32""".stripMargin,

    "q_dedup_verify_pairs" ->
      s"""$bandsCte,
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band_id = b.band_id
         |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |docs AS (SELECT doc_id, text,
         |  list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS toks
         |  FROM documents)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist,
         |  CAST(len(list_intersect(a.toks, b.toks)) AS INTEGER) AS tok_inter,
         |  CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
         |    AS INTEGER) AS tok_union
         |FROM pairs p JOIN docs a ON p.doc_a = a.doc_id
         |JOIN docs b ON p.doc_b = b.doc_id""".stripMargin,

    // Depth-bounded BFS — Spark runs the identical recursive tail over
    // the operator-computed prs view; the oracle rebuilds prs from the
    // band keys in SQL first.
    "q_reach_bfs" ->
      (bandsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |""".stripMargin +
        graft.operators.Graph.reachBfsTail
          .replaceFirst("WITH RECURSIVE ", "")
          .replace("__DOCS__", "documents")),

    // Recursive transitive closure over the candidate graph — the oracle
    // for the Spark side's iterative label propagation.
    "q_dedup_components" ->
      (bandsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (SELECT doc_a AS n, doc_b AS m FROM prs
           |  UNION ALL SELECT doc_b, doc_a FROM prs),
           |reach(n, m) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.m FROM reach JOIN edges e ON reach.m = e.n)
           |SELECT n AS doc_id, min(m) AS component_id,
           |  min(m) = n AS is_canonical
           |FROM reach GROUP BY n""".stripMargin),

    "q_dedup_apply" ->
      (bandsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        s""",
           |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.band_id = b.band_id
           |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (SELECT doc_a AS n, doc_b AS m FROM prs
           |  UNION ALL SELECT doc_b, doc_a FROM prs),
           |reach(n, m) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.m FROM reach JOIN edges e ON reach.m = e.n),
           |comp AS (SELECT n AS doc_id, min(m) AS component_id FROM reach GROUP BY n),
           |sizes AS (SELECT component_id, count(*) AS n_members FROM comp GROUP BY 1)
           |SELECT d.doc_id, d.lang, d.source, sizes.n_members
           |FROM documents d JOIN comp ON d.doc_id = comp.doc_id
           |JOIN sizes ON comp.component_id = sizes.component_id
           |WHERE comp.component_id = d.doc_id""".stripMargin),

    "q_sketch_source" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT source, unnest(s) AS shingle FROM sh)
         |SELECT source, CAST(i AS INTEGER) AS i,
         |  min(md5(CAST(i AS VARCHAR) || '|' || shingle)) AS minh
         |FROM ex, range(16) r(i) GROUP BY source, i""".stripMargin,

    "q_sketch_source_sim" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT source, unnest(s) AS shingle FROM sh),
         |sig AS (SELECT source, CAST(i AS INTEGER) AS i,
         |  min(md5(CAST(i AS VARCHAR) || '|' || shingle)) AS minh
         |  FROM ex, range(16) r(i) GROUP BY source, i)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(sum(CAST(a.minh = b.minh AS INTEGER)) AS INTEGER) AS n_agree
         |FROM sig a JOIN sig b ON a.i = b.i AND a.source < b.source
         |GROUP BY a.source, b.source""".stripMargin,

    // Mirrors the engine's inverted-index + stop-shingle form: shingles
    // with within-source document frequency > 100 are excluded from the
    // sets on BOTH sides (no shingle reaches df 100 in the fixture, so
    // this is result-identical to the uncapped form — verified).
    "q_ngram_jaccard" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT doc_id, source, unnest(list_distinct(s)) AS shingle FROM sh),
         |stop AS (SELECT source, shingle FROM (
         |  SELECT source, shingle, count(*) AS df FROM ex GROUP BY 1, 2) WHERE df > 100),
         |kept AS (SELECT ex.* FROM ex ANTI JOIN stop USING (source, shingle)),
         |szs AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |  FROM kept a JOIN kept b ON a.source = b.source AND a.shingle = b.shingle
         |    AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(n_inter AS INTEGER) AS n_inter,
         |  CAST(sa.sz + sb.sz - n_inter AS INTEGER) AS n_union,
         |  n_inter * 10 >= (sa.sz + sb.sz - n_inter) * 8 AS near_dup
         |FROM inter JOIN szs sa ON doc_a = sa.doc_id
         |JOIN szs sb ON doc_b = sb.doc_id""".stripMargin,

    // Containment scored from each sharing pair's smaller side; the
    // stop cap is corpus-wide (cross-source excerpts are the point).
    "q_containment" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh),
         |stop AS (SELECT shingle FROM (
         |  SELECT shingle, count(*) AS df FROM ex GROUP BY 1) WHERE df > 100),
         |kept AS (SELECT ex.* FROM ex ANTI JOIN stop USING (shingle)),
         |szs AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS sz
         |  FROM kept GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
         |    CAST(count(*) AS INTEGER) AS n_inter
         |  FROM kept a JOIN kept b ON a.shingle = b.shingle
         |    AND a.doc_id <> b.doc_id GROUP BY 1, 2)
         |SELECT doc_small, doc_big, n_inter,
         |  sa.sz AS sz_small, sb.sz AS sz_big,
         |  CAST(n_inter * 10000 // sa.sz AS BIGINT) AS containment_bp
         |FROM inter JOIN szs sa ON doc_small = sa.doc_id
         |JOIN szs sb ON doc_big = sb.doc_id
         |WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND doc_small < doc_big))
         |  AND n_inter * 10 >= sa.sz * 9""".stripMargin,

    // Banded recall contract, restated: exactly the band-colliding pairs
    // are scored — the oracle generates candidates from the SAME band
    // keys and runs the same exact shingle arithmetic on them.
    "q_ngram_jaccard_banded" ->
      s"""$bandsCte,
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band_id = b.band_id
         |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |docs AS (SELECT doc_id, list_distinct(s) AS ds FROM sh),
         |sc AS (SELECT p.doc_a, p.doc_b,
         |    CAST(len(list_intersect(a.ds, b.ds)) AS INTEGER) AS n_inter,
         |    CAST(len(a.ds) + len(b.ds)
         |      - len(list_intersect(a.ds, b.ds)) AS INTEGER) AS n_union
         |  FROM pairs p JOIN docs a ON p.doc_a = a.doc_id
         |  JOIN docs b ON p.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, n_inter, n_union,
         |  n_inter * 10 >= n_union * 8 AS near_dup
         |FROM sc""".stripMargin,

    "q_containment_banded" ->
      s"""$bandsCte,
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band_id = b.band_id
         |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |docs AS (SELECT doc_id, list_distinct(s) AS ds FROM sh),
         |sc AS (SELECT
         |    CASE WHEN len(a.ds) <= len(b.ds) THEN p.doc_a ELSE p.doc_b END
         |      AS doc_small,
         |    CASE WHEN len(a.ds) <= len(b.ds) THEN p.doc_b ELSE p.doc_a END
         |      AS doc_big,
         |    CAST(len(list_intersect(a.ds, b.ds)) AS INTEGER) AS n_inter,
         |    CAST(least(len(a.ds), len(b.ds)) AS INTEGER) AS sz_small,
         |    CAST(greatest(len(a.ds), len(b.ds)) AS INTEGER) AS sz_big
         |  FROM pairs p JOIN docs a ON p.doc_a = a.doc_id
         |  JOIN docs b ON p.doc_b = b.doc_id)
         |SELECT doc_small, doc_big, n_inter, sz_small, sz_big,
         |  CAST(n_inter * 10000 // sz_small AS BIGINT) AS containment_bp
         |FROM sc WHERE n_inter * 10 >= sz_small * 9""".stripMargin,

    // Brute-force threshold join within source — the prefix filter must
    // lose NOTHING above the 0.8 threshold (its exactness guarantee).
    "q_jaccard_prefix" ->
      s"""WITH $baseCte, $shinglesCte,
         |ex AS (SELECT doc_id, source, unnest(list_distinct(s)) AS shingle FROM sh),
         |szs AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |  FROM ex a JOIN ex b ON a.source = b.source AND a.shingle = b.shingle
         |    AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(n_inter AS INTEGER) AS n_inter,
         |  CAST(sa.sz + sb.sz - n_inter AS INTEGER) AS n_union
         |FROM inter JOIN szs sa ON doc_a = sa.doc_id
         |JOIN szs sb ON doc_b = sb.doc_id
         |WHERE n_inter * 10 >= (sa.sz + sb.sz - n_inter) * 8""".stripMargin,

    // Mirrors the CAPPED prefix generator (not the brute-force join):
    // same 60-bit shingle fingerprints (fp60), same df-ascending
    // (df, fp) prefix order, same per-(source, fp) doc_id rank,
    // candidates within 32 rank positions, exact verification on top.
    "q_jaccard_prefix_capped" ->
      s"""WITH $baseCte, $shinglesCte, $fpsCte,
         |ex AS (SELECT doc_id, source, unnest(fps) AS fp FROM shf),
         |szs AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY 1),
         |dfs AS (SELECT fp, count(*) AS df FROM ex GROUP BY 1),
         |pref AS (SELECT doc_id, source, fp FROM (
         |  SELECT e.doc_id, e.source, e.fp, z.sz,
         |    row_number() OVER (PARTITION BY e.doc_id
         |      ORDER BY d.df, e.fp) AS rnk
         |  FROM ex e JOIN dfs d USING (fp) JOIN szs z USING (doc_id))
         |  WHERE rnk <= sz - (8 * sz + 9) // 10 + 1),
         |rk AS (SELECT doc_id, source, fp,
         |  row_number() OVER (PARTITION BY source, fp
         |    ORDER BY doc_id) AS rn FROM pref),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM rk a JOIN rk b ON a.source = b.source
         |    AND a.fp = b.fp
         |    AND b.rn > a.rn AND b.rn <= a.rn + 32),
         |docs AS (SELECT doc_id, fps AS ds FROM shf),
         |sc AS (SELECT c.doc_a, c.doc_b,
         |    CAST(len(list_intersect(a.ds, b.ds)) AS INTEGER) AS n_inter,
         |    CAST(len(a.ds) + len(b.ds)
         |      - len(list_intersect(a.ds, b.ds)) AS INTEGER) AS n_union
         |  FROM cand c JOIN docs a ON c.doc_a = a.doc_id
         |  JOIN docs b ON c.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, n_inter, n_union FROM sc
         |WHERE n_inter * 10 >= n_union * 8""".stripMargin,

    // Min-wise inclusion ensemble on 60-bit fingerprints: 8 argmin-fp
    // probes per doc (min over (md5 of the fp's decimal string, fp) —
    // the fixed-width md5 prefix makes the concatenated string min
    // identical to the engine's struct min), joined against the kept
    // postings; probes are size-oriented (only the strictly smaller
    // doc queries, ties by smaller doc_id — the engine's round-15
    // orientation), so each unordered pair surfaces once with qdoc as
    // the output's doc_small; exact containment scoring on the
    // surfaced pairs, from that smaller side.
    // Execution shape (round 15): list-native, mirroring the ENGINE's
    // own structure — the stop set rides as one list value (the
    // broadcast path), kept sets stay per-doc LISTS, the 8 argmin
    // probes are per-row list folds, and the exact verification is
    // len(list_intersect) per surfaced pair. The earlier exploded form
    // (kept × range(8) min-aggregate, pair-count over exploded
    // postings twice) radix-partitioned multi-billion-row aggregate
    // inputs to disk and exceeded the sandbox's free space at sf100
    // (round-15 gate log); every heavy step here streams row-wise.
    "q_containment_ensemble" ->
      s"""WITH $baseCte, $shinglesCte, $fpsCte,
         |ex AS (SELECT doc_id, unnest(fps) AS fp FROM shf),
         |stop AS (SELECT fp FROM (
         |  SELECT fp, count(*) AS df FROM ex GROUP BY 1) WHERE df > 100),
         |stopl AS (SELECT coalesce(list(fp), CAST([] AS BIGINT[])) AS sl
         |  FROM stop),
         |klk AS (SELECT doc_id, ks FROM (
         |    SELECT doc_id,
         |      list_filter(fps, x -> NOT list_contains(s.sl, x)) AS ks
         |    FROM shf, stopl s)
         |  WHERE len(ks) > 0),
         |szs AS (SELECT doc_id, CAST(len(ks) AS INTEGER) AS sz FROM klk),
         |qm AS (SELECT doc_id, unnest(list_transform(range(8), i ->
         |    CAST(substr(list_min(list_transform(ks, x ->
         |      md5(CAST(i AS VARCHAR) || '|' || CAST(x AS VARCHAR))
         |        || CAST(x AS VARCHAR))), 33) AS BIGINT))) AS fp
         |  FROM klk),
         |kp AS (SELECT doc_id, unnest(ks) AS fp FROM klk),
         |cand AS (SELECT q.doc_id AS doc_a, p.doc_id AS doc_b
         |  FROM qm q JOIN kp p ON q.fp = p.fp
         |  JOIN szs sq ON sq.doc_id = q.doc_id
         |  JOIN szs sp ON sp.doc_id = p.doc_id
         |  WHERE sq.sz < sp.sz
         |     OR (sq.sz = sp.sz AND q.doc_id < p.doc_id)
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT doc_a AS doc_small, doc_b AS doc_big, n_inter,
         |  sz_small, sz_big,
         |  CAST(n_inter * 10000 // sz_small AS BIGINT) AS containment_bp
         |FROM (SELECT c.doc_a, c.doc_b,
         |    CAST(len(list_intersect(a.ks, b.ks)) AS INTEGER) AS n_inter,
         |    CAST(len(a.ks) AS INTEGER) AS sz_small,
         |    CAST(len(b.ks) AS INTEGER) AS sz_big
         |  FROM cand c JOIN klk a ON a.doc_id = c.doc_a
         |  JOIN klk b ON b.doc_id = c.doc_b)
         |WHERE n_inter * 10 >= sz_small * 9""".stripMargin,

    "q_gopher_rules" ->
      s"""WITH $baseCte,
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) AS sum_len,
         |  CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha_words,
         |  CAST(len(list_filter(toks,
         |    t -> list_contains(['the','a','of','and','to','in','is'], t))) AS BIGINT) AS stop_hits
         |  FROM base)
         |SELECT doc_id, n_words,
         |  sum_len * 1000 // n_words AS mean_word_len_e3,
         |  alpha_words * 10000 // n_words AS frac_alpha_bp,
         |  stop_hits,
         |  (n_words BETWEEN 5 AND 5000
         |    AND sum_len * 1000 // n_words BETWEEN 2000 AND 10000
         |    AND alpha_words * 10000 // n_words >= 8000
         |    AND stop_hits >= 1) AS passes
         |FROM m""".stripMargin,

    // Winnowing (k=5, w=4): same k-gram md5→60-bit hashes, same
    // rightmost-window-min selection, positions and mins computed over
    // DuckDB lists exactly as the engine's higher-order functions
    "q_winnow" ->
      s"""WITH $baseCte, $winnowCtes
         |SELECT doc_id, pos, fp FROM wsel""".stripMargin,

    "q_winnow_pairs" ->
      s"""WITH $baseCte, $winnowCtes,
         |wfp AS (SELECT DISTINCT doc_id, fp FROM wsel),
         |wkeep AS (SELECT fp FROM (
         |  SELECT fp, count(*) AS df FROM wfp GROUP BY 1) WHERE df <= 100)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM (SELECT * FROM wfp JOIN wkeep USING (fp)) a
         |JOIN (SELECT * FROM wfp JOIN wkeep USING (fp)) b
         |  ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "q_dup_ngrams" ->
      s"""WITH $baseCte, $shinglesCte,
         |d AS (SELECT DISTINCT doc_id, unnest(s) AS shingle FROM sh),
         |df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
         |  FROM d GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_shingles,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS dup_bp
         |FROM d JOIN df USING (shingle)
         |GROUP BY doc_id""".stripMargin,

    "q_length_buckets" ->
      s"""WITH $baseCte,
         |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM base),
         |b AS (SELECT n_tokens,
         |  CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
         |       WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
         |       WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
         |       WHEN n_tokens <= 1024 THEN 1024 ELSE 2048 END AS bucket
         |  FROM m)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(bucket * count(*) - sum(n_tokens) AS BIGINT) AS pad_tokens,
         |  CAST(sum(n_tokens) * 10000 // (bucket * count(*)) AS BIGINT)
         |    AS fill_bp
         |FROM b GROUP BY bucket""".stripMargin,

    "q_domain_cap" ->
      """WITH ranked AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |kept AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |  FROM ranked WHERE rk <= 20 GROUP BY 1)
        |SELECT t.source, t.n_docs, k.n_kept,
        |  t.n_docs - k.n_kept AS n_dropped, k.kept_chars
        |FROM tot t JOIN kept k ON t.source = k.source""".stripMargin,

    // the distributed two-scan enumeration must equal the window form
    "q_global_index" ->
      """SELECT event_id,
        |  CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
        |    AS global_idx
        |FROM events""".stripMargin,

    // arithmetic staging from the global rank must equal NTILE exactly
    "q_curriculum" ->
      """SELECT doc_id, n_chars,
        |  CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS stage
        |FROM documents""".stripMargin
  )
}
