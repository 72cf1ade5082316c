package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.{bigramsSql, charHashSql, ngramsSql, tokensSql}
import graft.operators.{Sampling, TextOps}

/** SURVEY §2.3 — text-analysis operators over the documents table, each
  * with a full DuckDB oracle (the hash-based ones rely on TextFunctions'
  * portable polynomial hash being expressed identically on both sides).
  */
object TextQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  /** Closed plan-time query-term set for q_bm25 (constants.py-style). */
  private val bm25Terms: Seq[String] = Seq("join", "merge", "vector", "window")

  val defs: Seq[Q] = Seq(

    // Token counting: whitespace tokens + BPE-ish regex token runs.
    Q("q_token_count",
      (s, d) => TextOps.tokenCounts(docs(s, d), "text")
        .select(col("doc_id"), col("n_ws_tokens"), col("n_re_tokens"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        s"CAST(len(${tokensSql("text")}) AS BIGINT) AS n_ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens " +
        "FROM documents ORDER BY doc_id")),

    // Quality scoring: length/stopword ratios + combined [0,1] score.
    Q("q_quality_score",
      (s, d) => TextOps.qualityScore(docs(s, d), "text")
        .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
          col("stopword_ratio"), col("quality_score"))
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, " +
        s"CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tok, " +
        s"CAST(len(list_filter(${tokensSql("text")}, t -> (t = 'the' OR t = 'a'))) AS BIGINT) AS n_stop, " +
        "CAST(length(text) AS BIGINT) AS n_ch FROM documents) " +
        "SELECT doc_id, n_tok AS n_tokens, " +
        "round((n_ch - (n_tok - 1)) / n_tok, 6) AS avg_token_len, " +
        "round(n_stop / n_tok, 6) AS stopword_ratio, " +
        "round(least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * (1.0 - (n_stop / n_tok)), 6) AS quality_score " +
        "FROM t ORDER BY doc_id")),

    // Language-ID: marker-word count per language, deterministic argmax.
    Q("q_lang_id",
      (s, d) => TextOps.langId(docs(s, d), "text")
        .select(col("doc_id") +:
          TextOps.langMarkers.map { case (l, _) => col(s"s_$l") } :+
          col("pred_lang"): _*)
        .orderBy("doc_id"),
      Some {
        val scores = TextOps.langMarkers.map { case (lang, words) =>
          s"CAST(${TextOps.markerCountSql(tokensSql("text"), words)} AS BIGINT) AS s_$lang"
        }.mkString(", ")
        val scoreCols = TextOps.langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")
        s"WITH s AS (SELECT doc_id, $scores FROM documents) " +
          s"SELECT doc_id, $scoreCols, ${TextOps.langIdArgmaxSql} AS pred_lang " +
          "FROM s ORDER BY doc_id"
      }),

    // Language-ID via char-n-gram profiles (the tokenization-free variant).
    Q("q_lang_id_ngram",
      (s, d) => TextOps.langIdNgram(docs(s, d), "text")
        .select(col("doc_id") +:
          TextOps.langNgramProfiles.map { case (l, _) => col(s"n_$l") } :+
          col("pred_lang_ngram"): _*)
        .orderBy("doc_id"),
      Some {
        val (scores, argmax) = TextOps.langIdNgramSql("text")
        s"WITH s AS (SELECT doc_id, $scores FROM documents) " +
          s"SELECT doc_id, ${TextOps.langNgramProfiles.map(p => s"n_${p._1}").mkString(", ")}, " +
          s"$argmax AS pred_lang_ngram FROM s ORDER BY doc_id"
      }),

    // Normalization pass (lowercase, strip punct, collapse whitespace) —
    // the cleaning step upstream of every hash/dedup operator.
    Q("q_text_norm",
      (s, d) => TextOps.normalize(docs(s, d), "text")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_before"),
          length(col("norm_text")).cast("long").as("n_after"),
          col("norm_text"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_before, " +
        "CAST(length(trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_after, " +
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), " +
        "' +', ' ', 'g')) AS norm_text " +
        "FROM documents ORDER BY doc_id")),

    // Deterministic redaction (digit runs -> <num>) with per-doc audit
    // counts — the PII-scrub plan shape.
    Q("q_redact",
      (s, d) => TextOps.redact(docs(s, d), "text")
        .select(col("doc_id"), col("n_redactions"), col("redacted"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_redactions, " +
        "regexp_replace(text, '[0-9]+', '<num>', 'g') AS redacted " +
        "FROM documents ORDER BY doc_id")),

    // Repetition quality signal: duplicate-token / duplicate-bigram
    // fractions (the Gopher-style boilerplate filters).
    Q("q_rep_ratio",
      (s, d) => TextOps.repetitionRatio(docs(s, d), "text")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
          col("dup_token_ratio"), col("n_grams"), col("n_distinct_grams"),
          col("dup_gram_ratio"))
        .orderBy("doc_id"),
      Some {
        val toks = tokensSql("text")
        val grams = bigramsSql(toks)
        "WITH t AS (SELECT doc_id, " +
          s"CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"CAST(len(list_distinct($toks)) AS BIGINT) AS n_distinct_tokens, " +
          s"CAST(len($grams) AS BIGINT) AS n_grams, " +
          s"CAST(len(list_distinct($grams)) AS BIGINT) AS n_distinct_grams " +
          "FROM documents) " +
          "SELECT doc_id, n_tokens, n_distinct_tokens, " +
          "round(1.0 - n_distinct_tokens / n_tokens, 6) AS dup_token_ratio, " +
          "n_grams, n_distinct_grams, " +
          "CASE WHEN n_grams > 0 THEN round(1.0 - n_distinct_grams / n_grams, 6) " +
          "ELSE 0.0 END AS dup_gram_ratio " +
          "FROM t ORDER BY doc_id"
      }),

    // TF-IDF top-3 terms per document (two-stage TopK, no vocabulary-wide
    // window).
    Q("q_tfidf_top",
      (s, d) => TextOps.tfidfTopTerms(docs(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rn"),
      Some("WITH terms AS (SELECT doc_id, unnest(" + tokensSql("text") + ") AS term " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term), " +
        "dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        "scored AS (SELECT doc_id, term, tf, doc_freq, " +
        "round(tf * ln(CAST(n_docs + 1 AS DOUBLE) / (doc_freq + 1)), 6) AS tfidf " +
        "FROM tf JOIN dfreq USING (term) CROSS JOIN nd) " +
        "SELECT doc_id, rn, term, tf, doc_freq, tfidf FROM (" +
        "SELECT doc_id, term, tf, doc_freq, tfidf, row_number() OVER (" +
        "PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM scored) t " +
        "WHERE rn <= 3 ORDER BY doc_id, rn")),

    // Sequence packing: documents cut into fixed-token-budget sequences
    // (hash-bucketed, fixed cumulative-sum boundaries within bucket —
    // see TextOps.packSequences; one row per sequence).
    Q("q_pack_seqs",
      (s, d) => TextOps.packSequences(docs(s, d), "doc_id", "text",
          budget = 256, buckets = 8)
        .orderBy("bucket", "seq_id"),
      Some {
        val h = charHashSql("CAST(doc_id AS VARCHAR)")
        s"WITH d AS (SELECT doc_id, CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tok, " +
          s"$h % 8 AS bucket FROM documents), " +
          "c AS (SELECT bucket, n_tok, COALESCE(sum(n_tok) OVER (" +
          "PARTITION BY bucket ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_tok FROM d) " +
          "SELECT bucket, CAST(floor(prev_tok / 256.0) AS BIGINT) AS seq_id, " +
          "count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens " +
          "FROM c GROUP BY bucket, seq_id ORDER BY bucket, seq_id"
      }),

    // Deterministic hash-stratified sampling (training-mix downweighting:
    // 20% of en, 50% of de, 80% of fr, everything else kept).
    Q("q_sample_strat",
      (s, d) => Sampling.stratified(docs(s, d), "doc_id", "lang",
          Map("en" -> 20, "de" -> 50, "fr" -> 80), defaultPct = 100)
        .select(col("doc_id"), col("lang"), col("sample_bucket"))
        .orderBy("doc_id"),
      Some {
        val (bucket, rate) = Sampling.stratifiedSql("doc_id", "lang",
          Map("en" -> 20, "de" -> 50, "fr" -> 80), defaultPct = 100)
        s"SELECT doc_id, lang, $bucket AS sample_bucket FROM documents " +
          s"WHERE $bucket < $rate ORDER BY doc_id"
      }),

    // URL canonicalization + dedup election: URLs synthesized Shots-
    // style from documents (scheme/www/case/utm/fragment variants of 20
    // hosts × 40 paths), canonicalized by the shared regexp chain, then
    // min-id elected per canonical form. Narrow regex chain + ONE
    // map-side-combined groupBy.
    Q("q_url_dedup",
      (s, d) => {
        val url = concat(lit("HTTPS://WWW."), col("source"),
          lit(".Example.com/Page/"), (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 4 === 1, lit("?utm_source=feed"))
            .when(col("doc_id") % 4 === 2,
              concat(lit("?page="), (col("doc_id") % 3).cast("string"),
                lit("&utm_campaign=x")))
            .when(col("doc_id") % 4 === 3,
              concat(lit("?utm_medium=m&page="),
                (col("doc_id") % 3).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#sec")).otherwise(lit("")))
        TextOps.urlCanonicalize(docs(s, d).withColumn("url", url), "url")
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
          .orderBy("canonical_url")
      },
      Some {
        val url = "'HTTPS://WWW.' || source || '.Example.com/Page/' || " +
          "CAST(doc_id % 40 AS VARCHAR) || " +
          "CASE WHEN doc_id % 4 = 1 THEN '?utm_source=feed' " +
          "WHEN doc_id % 4 = 2 THEN '?page=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=x' " +
          "WHEN doc_id % 4 = 3 THEN '?utm_medium=m&page=' || CAST(doc_id % 3 AS VARCHAR) " +
          "ELSE '' END || " +
          "CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END"
        s"WITH u AS (SELECT doc_id, ${TextOps.urlCanonicalizeSql(s"($url)")} " +
          "AS canonical_url FROM documents) " +
          "SELECT canonical_url, count(*) AS n_docs, " +
          "CAST(min(doc_id) AS BIGINT) AS keep_id " +
          "FROM u GROUP BY canonical_url ORDER BY canonical_url"
      }),

    // Deterministic train/val/test split: tagged-hash bucket → cumulative
    // percent bands (90/5/5). Membership is reconstructable (no RNG) and
    // independent of the sampling buckets (different hash tag). Narrow
    // zero-shuffle scan-stage CASE — a free column at any scale.
    Q("q_split_hash",
      (s, d) => Sampling.hashSplit(docs(s, d), "doc_id",
          Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("split_bucket"), col("split"))
        .orderBy("doc_id"),
      Some {
        val (bucket, cse) = Sampling.hashSplitSql("doc_id",
          Seq("train" -> 90, "val" -> 5, "test" -> 5))
        s"SELECT doc_id, CAST($bucket AS BIGINT) AS split_bucket, " +
          s"$cse AS split FROM documents ORDER BY doc_id"
      }),

    // Boilerplate mining: top-20 5-token shingles by distinct-document
    // frequency (the removal list q_substr_dedup measures the damage
    // of). One distinct-gram explode, map-side combined, TakeOrdered.
    Q("q_boilerplate",
      (s, d) => TextOps.boilerplate(docs(s, d), "doc_id", "text",
        n = 5, k = 20),
      Some(TextOps.boilerplateSql(n = 5, k = 20))),

    // Token-balanced contiguous shard plan (~50k chars per shard):
    // exclusive-prefix-weight div budget, all integer. The global
    // prefix is the two-stage scan — no corpus-sized single window.
    Q("q_shard_plan",
      (s, d) => TextOps.shardPlan(docs(s, d), "doc_id", "n_chars",
          budget = 50000L)
        .orderBy("id"),
      Some(TextOps.shardPlanSql("documents", "doc_id", "n_chars",
        budget = 50000L))),

    // Poisson bootstrap CI on the mean document length: 32 deterministic
    // hash-drawn resamples, INTEGER per-resample sums (partitioning-
    // invariant — no corpus-sized ordered fold), rank-based 2/31 bounds.
    // Shuffle payload: 32 rows.
    Q("q_bootstrap_ci",
      (s, d) => graft.operators.StatsOps.bootstrapCi(
        docs(s, d), "doc_id", "n_chars", b = 32, loRank = 2, hiRank = 31),
      Some(graft.operators.StatsOps.bootstrapCiSql(
        "documents", "doc_id", "n_chars", b = 32, loRank = 2, hiRank = 31))),

    // First BPE training iteration: top-20 adjacent char-pair merge
    // candidates weighted by word frequency. Corpus collapses to the
    // word vocabulary BEFORE the char-pair explode (vocab ≪ corpus —
    // the classic BPE trick); two map-side-combined shuffles + a
    // TakeOrdered.
    Q("q_bpe_merges",
      (s, d) => TextOps.bpeMerges(docs(s, d), "text", k = 20),
      Some(TextOps.bpeMergesSql(k = 20))),

    // BPE ENCODE (r8): price every document with an ordered merge table
    // — the per-batch tokenizer application once training has produced
    // the vocabulary. Fixed 8-merge table exercises CHAINED merges
    // (t+h -> th, th+e -> the); the replace chain runs over the word
    // vocabulary only (vocab << corpus), one word-keyed join prices
    // docs. True-tokenizer token counts are the budget currency
    // whitespace counting (q_token_count) mispricess.
    Q("q_bpe_encode",
      (s, d) => TextOps.bpeEncode(docs(s, d), "doc_id", "text",
          TextOps.demoMerges)
        .orderBy("doc_id"),
      Some(TextOps.bpeEncodeSql("documents", "doc_id", "text",
        TextOps.demoMerges))),

    // The BPE training RECURRENCE, 3 rounds unrolled: count weighted
    // adjacent symbol pairs on the word vocabulary, argmax, merge
    // everywhere (sentinel-delimited symbol strings; merge = one
    // literal replace), recount. Output = the learned merge table.
    Q("q_bpe_train",
      (s, d) => TextOps.bpeTrain(docs(s, d), "text", iters = 3),
      Some(TextOps.bpeTrainSql(iters = 3))),

    // Per-source KL divergence from the corpus token distribution over
    // the top-200 vocabulary + ONE tail bucket (add-0.5 smoothing): the
    // source-drift gate. Grid is |sources|·(V+1) — domain-bounded (chi²
    // stance), tail mass closed-form; KL folds as per-group ordered
    // cumsums so the doubles hash-verify.
    Q("q_kl_drift",
      (s, d) => TextOps.klDrift(docs(s, d), "source", "text",
        topV = 200, alpha = 0.5),
      Some(TextOps.klDriftSql("source", topV = 200, alpha = 0.5))),

    // Zipf rank-frequency fit over the top-200 vocabulary: least-squares
    // slope of ln(freq) on ln(rank) (+ intercept, r2) — the one-row
    // corpus-health gate (natural text ~ -1; boilerplate/synthetic
    // repetition bends it). Count shuffle is term-keyed map-side
    // combined; top-V is a TakeOrdered; the regression folds run as
    // ordered cumsums over 200 rows, so the doubles hash-verify.
    Q("q_zipf_fit",
      (s, d) => TextOps.zipfFit(docs(s, d), "text", topV = 200),
      Some(TextOps.zipfFitSql(topV = 200))),

    // Exact substring-duplication fraction (Lee et al. 2107.06499):
    // per doc, the share of its distinct 5-token shingles appearing in
    // >= 1 other doc — catches partial containment MinHash's whole-doc
    // threshold misses. One corpus explode; gram frequencies map-side
    // combined; the corpus-sized dup-gram frame joins on the gram key
    // (NOT broadcast — bigram-vocab stance); zero-dup docs recovered by
    // a doc-keyed left join.
    Q("q_substr_dedup",
      (s, d) => TextOps.substrDupFraction(docs(s, d), "doc_id", "text",
          n = 5)
        .orderBy("doc_id"),
      Some(TextOps.substrDupFractionSql(n = 5))),

    // Weighted sampling without replacement (Efraimidis-Spirakis
    // exponential-sort reservoir): per language, the 10 docs minimizing
    // -ln(u)/n_chars — inclusion probability proportional to character
    // mass, i.e. a token-budget draw rather than a doc-count draw. u is
    // the portable hash of the doc id, so the sampled SET and its keys
    // hash-verify cross-engine (single IEEE ops, identical order).
    Q("q_weighted_sample",
      (s, d) => Sampling.weightedSample(docs(s, d), "doc_id", "lang",
          "n_chars", k = 10)
        .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"))
        .orderBy("lang", "rn"),
      Some {
        val key = Sampling.weightedKeySql("doc_id", "n_chars")
        s"WITH t AS (SELECT doc_id, lang, n_chars, $key AS es_key " +
          "FROM documents WHERE n_chars > 0), " +
          "r AS (SELECT lang, doc_id, n_chars, es_key, row_number() OVER (" +
          "PARTITION BY lang ORDER BY es_key, doc_id) AS rn FROM t) " +
          "SELECT lang, rn, doc_id, n_chars, round(es_key, 9) AS es_key " +
          "FROM r WHERE rn <= 10 ORDER BY lang, rn"
      }),

    // End-to-end pipeline composition — the flagship training-data flow as
    // ONE declarative plan: normalize -> exact-dedup on normalized text
    // (keep min-id representative) -> quality gate (>= 5 tokens) ->
    // stratified downsample (50% of en) -> pack into 256-token sequences.
    // Five operators, one oracle; Catalyst sees a single DAG (three
    // shuffles: dedup window, pack window, pack groupBy — the narrow
    // normalize/filter/sample stages fuse into the scans).
    Q("q_pipeline_e2e",
      (s, d) => {
        val norm = TextOps.normalize(docs(s, d), "text")
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("norm_text"))
        val kept = norm.withColumn("_keep", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("_keep")).drop("_keep")
        val qual = kept.filter(
          size(graft.functions.TextFunctions.tokens(col("norm_text"))) >= 5)
        val sampled = Sampling.stratified(qual, "doc_id", "lang",
          Map("en" -> 50), defaultPct = 100)
        TextOps.packSequences(sampled, "doc_id", "norm_text",
            budget = 256, buckets = 4)
          .orderBy("bucket", "seq_id")
      },
      Some {
        val normExpr = "trim(regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
        val h = charHashSql("CAST(doc_id AS VARCHAR)")
        s"WITH n AS (SELECT doc_id, lang, $normExpr AS norm_text FROM documents), " +
          "d AS (SELECT *, min(doc_id) OVER (PARTITION BY norm_text) AS keep FROM n), " +
          "k AS (SELECT doc_id, lang, norm_text FROM d WHERE doc_id = keep), " +
          s"q AS (SELECT * FROM k WHERE len(${tokensSql("norm_text")}) >= 5), " +
          s"smp AS (SELECT * FROM q WHERE ($h % 100) < " +
          "CASE WHEN lang = 'en' THEN 50 ELSE 100 END), " +
          s"t AS (SELECT doc_id, CAST(len(${tokensSql("norm_text")}) AS BIGINT) AS n_tok, " +
          s"$h % 4 AS bucket FROM smp), " +
          "c AS (SELECT bucket, n_tok, COALESCE(sum(n_tok) OVER (" +
          "PARTITION BY bucket ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_tok FROM t) " +
          "SELECT bucket, CAST(floor(prev_tok / 256.0) AS BIGINT) AS seq_id, " +
          "count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens " +
          "FROM c GROUP BY bucket, seq_id ORDER BY bucket, seq_id"
      }),

    // Corpus heavy hitters: exact top-10 terms hash-verify; the
    // frequent-items sketch's no-false-negative guarantee is the flag
    // column the oracle pins to TRUE (same contract as the HLL/GK rows).
    Q("q_heavy_hitters",
      (s, d) => TextOps.heavyHitters(docs(s, d), "text", k = 10),
      Some("WITH t AS (SELECT unnest(" + tokensSql("text") + ") AS term " +
        "FROM documents), c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term) " +
        "SELECT term, cnt, TRUE AS in_sketch FROM c " +
        "ORDER BY cnt DESC, term LIMIT 10")),

    // Count-min sketch estimates for the top-20 corpus terms next to
    // their exact counts (4 tagged hash rows x 256 counters — fixed-size
    // state regardless of corpus volume). The sketch builds from the
    // vocab-sized count frame (algebraically identical to streaming
    // increments); n_cms >= n_exact by construction.
    Q("q_cms_heavy",
      (s, d) => graft.operators.StatsOps.countMin(
        docs(s, d).select(
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("term")),
        "term", width = 256, depth = 4, k = 20),
      Some(graft.operators.StatsOps.countMinSql(
        "(SELECT unnest(" + tokensSql("text") + ") AS term FROM documents)",
        width = 256, depth = 4, k = 20))),

    // Benchmark decontamination: corpus docs sharing any 3-token shingle
    // with the "eval" slice (doc_id % 20 == 0). Spark joins 64-bit gram
    // hashes against the broadcast benchmark gram set; the oracle joins
    // the gram STRINGS — identical results up to ~2^-64 hash collisions.
    Q("q_decontaminate",
      (s, d) => {
        val all = docs(s, d)
        TextOps.decontaminate(
          all.filter(col("doc_id") % 20 =!= 0),
          all.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 3)
          .orderBy("doc_id")
      },
      Some {
        val grams = ngramsSql(tokensSql("text"), 3)
        s"WITH bg AS (SELECT DISTINCT g FROM (SELECT unnest($grams) AS g " +
          "FROM documents WHERE doc_id % 20 = 0) t), " +
          "cg AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, " +
          s"unnest($grams) AS g FROM documents WHERE doc_id % 20 <> 0) t) " +
          "SELECT doc_id, count(*) AS n_shared_grams FROM cg JOIN bg USING (g) " +
          "GROUP BY doc_id ORDER BY doc_id"
      }),

    // Winnowing candidate pairs (Schleimer 2003 / MOSS): sliding-window
    // minima over bigram-shingle hashes (rightmost tie = the paper's
    // rule, struct-min portable), docs paired on >= 2 shared selected
    // fingerprints after the over-common-fingerprint df cap — the
    // plagiarism-detection guarantee q_fingerprint's single
    // representative can't give (any shared run spanning >= w+1 shingles
    // must collide). Winnow window is per-doc; fp frame joins on the
    // hash key; the df cap keeps pair mass linear when boilerplate
    // concentrates a fingerprint.
    Q("q_winnow",
      (s, d) => TextOps.winnowPairs(docs(s, d), "doc_id", "text",
          w = 4, minShared = 2, maxDf = 64)
        .orderBy("a", "b"),
      Some(TextOps.winnowPairsSql(w = 4, minShared = 2, maxDf = 64) +
        " ORDER BY a, b")),

    // Rolling-hash fingerprint: doc hash + winnowed bigram-shingle hash.
    Q("q_fingerprint",
      (s, d) => TextOps.fingerprint(docs(s, d), "text")
        .select(col("doc_id"), col("doc_hash"), col("n_kgrams"), col("min_kgram_hash"))
        .orderBy("doc_id"),
      Some {
        val grams = bigramsSql(tokensSql("text"))
        s"SELECT doc_id, ${charHashSql("text")} AS doc_hash, " +
          s"CAST(len($grams) AS BIGINT) AS n_kgrams, " +
          s"COALESCE(list_min(list_transform($grams, g -> ${charHashSql("g")})), -1) AS min_kgram_hash " +
          "FROM documents ORDER BY doc_id"
      }),

    // Per-source quota ("domain cap"): at most 10 docs per source, picked
    // in deterministic pseudo-random order (portable id hash, id
    // tiebreak) so no domain dominates the mix. The Spark side runs the
    // salted two-stage TopK (a hot domain never funnels through one
    // window task); the oracle is the single-window equivalent.
    Q("q_domain_cap",
      (s, d) => Sampling.perGroupCap(docs(s, d), "doc_id", "source", k = 10)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy("source", "rn"),
      Some {
        val h = charHashSql("CAST(doc_id AS VARCHAR)")
        s"SELECT doc_id, source, rn FROM (SELECT doc_id, source, " +
          s"row_number() OVER (PARTITION BY source ORDER BY $h, doc_id) AS rn " +
          "FROM documents) t WHERE rn <= 10 ORDER BY source, rn"
      }),

    // Inverted-index build: term -> (doc_freq, capped sorted posting
    // list). The cap rides the salted two-stage TopK BEFORE any list
    // materializes (a stopword's postings never funnel through one
    // buffer); doc_freq stays exact over the full pair set.
    Q("q_inverted_index",
      (s, d) => TextOps.invertedIndex(docs(s, d), "doc_id", "text",
          maxPostings = 20)
        .orderBy("term"),
      Some(s"WITH p AS (SELECT DISTINCT doc_id, term FROM " +
        s"(SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents) t) " +
        "SELECT term, count(*) AS doc_freq, " +
        "array_to_string(list_transform(array_slice(list_sort(list(doc_id)), 1, 20), " +
        "x -> CAST(x AS VARCHAR)), ',') AS postings " +
        "FROM p GROUP BY term ORDER BY term")),

    // Sliding-window chunking: 32-token windows every 24 tokens (25%
    // overlap) — the context-window prep step. Purely narrow (zero
    // shuffles): offsets explode in the scan stage, slices stay inside
    // whole-stage codegen.
    Q("q_chunk_docs",
      (s, d) => TextOps.chunkDocs(docs(s, d), "doc_id", "text",
          window = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx"),
      Some {
        val toks = tokensSql("text")
        s"WITH t AS (SELECT doc_id, $toks AS toks FROM documents), " +
          "s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start FROM t) " +
          "SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx, " +
          "array_to_string(array_slice(toks, start + 1, start + 32), ' ') AS chunk_text, " +
          "CAST(least(32, len(toks) - start) AS BIGINT) AS n_tok " +
          "FROM s ORDER BY doc_id, chunk_idx"
      }),

    // BM25 retrieval: top-5 documents per query term (corpus curation /
    // inspection). All query-term tfs come from ONE native pass per doc
    // (no corpus-wide token explode); ranking rides the salted two-stage
    // TopK. The oracle recomputes the identical arithmetic tree, so the
    // scores themselves hash-verify.
    Q("q_bm25",
      (s, d) => TextOps.bm25TopDocs(docs(s, d), "doc_id", "text",
          terms = bm25Terms, k = 5)
        .orderBy("term", "rn"),
      Some(TextOps.bm25Sql(bm25Terms, k = 5, k1 = 1.2, b = 0.75))),

    // Paragraph(block)-level exact dedup: 32-token blocks, global
    // first-occurrence election on the 8-byte block hash, documents
    // reassembled from surviving blocks — the boilerplate-removal pass
    // document-level dedup cannot express.
    Q("q_block_dedup",
      (s, d) => TextOps.blockDedup(docs(s, d), "doc_id", "text",
          blockTokens = 32)
        .orderBy("doc_id"),
      Some(TextOps.blockDedupSql(blockTokens = 32))),

    // Character-entropy quality signal (bits/char over normalized text):
    // all 37 alphabet counts from one native scan, entropy as a pure
    // column fold — narrow, zero-shuffle.
    Q("q_entropy",
      (s, d) => TextOps.charEntropy(docs(s, d), "text")
        .select(col("doc_id"), col("n_chars"), col("entropy_bits"))
        .orderBy("doc_id"),
      Some {
        val normExpr = "trim(regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
        val (nChars, entropy) = TextOps.charEntropySql("norm_text")
        s"WITH n AS (SELECT doc_id, $normExpr AS norm_text FROM documents), " +
          s"c AS (SELECT doc_id, norm_text, $nChars AS n_chars FROM n) " +
          s"SELECT doc_id, n_chars, $entropy AS entropy_bits " +
          "FROM c ORDER BY doc_id"
      }),

    // Per-source rank calibration: each doc's score becomes its within-
    // source cumulative fraction (cume_dist, max-tie), making scores
    // comparable ACROSS sources before one global keep threshold — the
    // cross-corpus mixing prerequisite q_quality_bucket's global terciles
    // don't provide. Grid-cumsum form (domain-bounded distinct-score
    // window + broadcast join-back), so doc rows never enter a window.
    Q("q_score_calibrate",
      (s, d) => graft.operators.StatsOps.rankCalibrate(
          docs(s, d), "source", "n_chars", "doc_id", keepFrac = 0.2)
        .orderBy("source", "doc_id"),
      Some(graft.operators.StatsOps.rankCalibrateSql(
        "documents", "source", "n_chars", "doc_id", keepFrac = 0.2) +
        " ORDER BY source, doc_id")),

    // CCNet-style quality bucketing: head/middle/tail by global quality-
    // score terciles. NOT ntile — a global ntile window funnels the whole
    // corpus through one task; threshold cuts come from a 1-row exact-
    // percentile aggregate broadcast into a narrow comparison, so the
    // bucket assignment scales like a filter.
    Q("q_quality_bucket",
      (s, d) => {
        val scored = TextOps.qualityScore(docs(s, d), "text")
          .select(col("doc_id"), col("n_tokens"), col("quality_score"))
        val p1 = (1.0 / 3).toString
        val p2 = (2.0 / 3).toString
        val cuts = scored.agg(
          expr(s"percentile(quality_score, $p1)").as("t1"),
          expr(s"percentile(quality_score, $p2)").as("t2"))
        scored.crossJoin(broadcast(cuts))
          .withColumn("bucket",
            when(col("quality_score") <= col("t1"), "tail")
              .when(col("quality_score") <= col("t2"), "middle")
              .otherwise("head"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            round(min(col("quality_score")), 6).as("min_score"),
            round(max(col("quality_score")), 6).as("max_score"),
            round(avg(col("quality_score")), 6).as("avg_score"))
          .orderBy("bucket")
      },
      Some {
        val toks = tokensSql("text")
        val p1 = (1.0 / 3).toString
        val p2 = (2.0 / 3).toString
        "WITH t AS (SELECT doc_id, " +
          s"CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"CAST(len(list_filter($toks, x -> (x = 'the' OR x = 'a'))) AS BIGINT) AS n_stop " +
          "FROM documents), " +
          "sc AS (SELECT doc_id, n_tokens, " +
          "round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * " +
          "(1.0 - (n_stop / n_tokens)), 6) AS quality_score FROM t), " +
          s"cuts AS (SELECT quantile_cont(quality_score, $p1) AS t1, " +
          s"quantile_cont(quality_score, $p2) AS t2 FROM sc) " +
          "SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens, " +
          "round(min(quality_score), 6) AS min_score, " +
          "round(max(quality_score), 6) AS max_score, " +
          "round(avg(quality_score), 6) AS avg_score FROM (" +
          "SELECT n_tokens, quality_score, " +
          "CASE WHEN quality_score <= t1 THEN 'tail' " +
          "WHEN quality_score <= t2 THEN 'middle' ELSE 'head' END AS bucket " +
          "FROM sc CROSS JOIN cuts) b GROUP BY bucket ORDER BY bucket"
      }),

    // Unigram-LM perplexity filter: avg per-token -ln p(token) under the
    // corpus unigram distribution. Corpus explodes once, vocabulary
    // broadcasts back, per-doc sum is an ORDERED window cumsum (the
    // engine-portable float reduction) — the NLL values themselves
    // hash-verify.
    Q("q_unigram_nll",
      (s, d) => TextOps.unigramNll(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.unigramNllSql)),

    // Temperature-based training-mix weights (multilingual-sampling
    // style): per-source token mass, weight ∝ sqrt(mass) normalized, and
    // the resulting document budget per source. sqrt is IEEE-correctly-
    // rounded on every engine (unlike pow/ln) and the normalizer is an
    // ordered cumsum, so the weights hash-verify exactly. The frame is
    // source-count sized — the global window costs nothing.
    // Welch's t between two sources' document-length distributions (the
    // parametric mean-drift gate next to q_ks_drift's distribution-shape
    // gate): exact integer moments from one conditional single-scan
    // aggregate, then a fixed IEEE tree -> bit-identical t and df.
    Q("q_welch_drift",
      (s, d) => graft.operators.StatsOps.welchT(
        docs(s, d), "source", "n_chars", "src0", "src1"),
      Some(graft.operators.StatsOps.welchTSql(
        "documents", "source", "n_chars", "src0", "src1"))),

    // Gini coefficient of character mass across sources — the scalar
    // concentration gate beside q_mix_weights' per-source table. Group
    // masses are one map-side-combined shuffle; the rank fold runs on
    // the source frame (domain-bounded).
    Q("q_gini_sources",
      (s, d) => graft.operators.StatsOps.giniConcentration(
        docs(s, d), "source", "n_chars"),
      Some(graft.operators.StatsOps.giniConcentrationSql(
        "documents", "source", "n_chars"))),

    // UniMax epoch-capped waterfill (Chung et al. 2023) across languages
    // — the mixing design q_mix_weights' sqrt-temperature can't express:
    // a hard per-language repetition bound (3 epochs) with the freed
    // budget handed to languages that can absorb it. Closed-form water
    // level over the domain-bounded lang frame; on this corpus the en
    // head absorbs the budget the four capped tails release.
    Q("q_unimax_mix",
      (s, d) => graft.operators.StatsOps.unimaxAllocation(
        docs(s, d), "lang", "text", epochCap = 3, budgetX = 2),
      Some(graft.operators.StatsOps.unimaxAllocationSql(
        "documents", "lang", "text", epochCap = 3, budgetX = 2))),

    Q("q_mix_weights",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.orderBy("source")
        val cum = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
        val all = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        docs(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
          .withColumn("pw", sqrt(col("n_tokens").cast("double")))
          .withColumn("cum_pw", sum(col("pw")).over(cum))
          .withColumn("total_pw", max(col("cum_pw")).over(all))
          .withColumn("weight", round(col("pw") / col("total_pw"), 6))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
            floor(col("weight") * 100000.0).cast("long").as("budget_docs"))
          .orderBy("source")
      },
      Some {
        val toks = tokensSql("text")
        "WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          s"CAST(sum(len($toks)) AS BIGINT) AS n_tokens " +
          "FROM documents GROUP BY source), " +
          "p AS (SELECT source, n_docs, n_tokens, " +
          "sqrt(CAST(n_tokens AS DOUBLE)) AS pw FROM s), " +
          "c0 AS (SELECT source, n_docs, n_tokens, pw, " +
          "sum(pw) OVER (ORDER BY source " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pw FROM p), " +
          "c AS (SELECT source, n_docs, n_tokens, pw, " +
          "max(cum_pw) OVER () AS total_pw FROM c0) " +
          "SELECT source, n_docs, n_tokens, " +
          "round(pw / total_pw, 6) AS weight, " +
          "CAST(floor(round(pw / total_pw, 6) * 100000.0) AS BIGINT) AS budget_docs " +
          "FROM c ORDER BY source"
      }),

    // Hashing-trick features (fasttext-style classifier front-end): a
    // fixed 16-bucket token-count vector per doc, bucket = portable token
    // hash % 16. No vocabulary exists anywhere — narrow zero-shuffle
    // scan-stage projection, output width a plan-time constant. The
    // declared form unrolls the bucket vector to scalar columns f0..f15
    // (the driver comparator sorts rows, and array cells are unsortable
    // in its pandas frame); the array form stays available as the
    // operator output and hash-verifies in TextOpsSpec.
    Q("q_feature_hash",
      (s, d) => graft.operators.TextOps
        .featureHash(docs(s, d), "doc_id", "text", nBuckets = 16)
        .select(col("doc_id") +:
          (0 until 16).map(b =>
            element_at(col("features"), b + 1).as(s"f$b")): _*)
        .orderBy("doc_id"),
      Some {
        val cols = (0 until 16).map(b => s"features[${b + 1}] AS f$b")
        "SELECT doc_id, " + cols.mkString(", ") + " FROM (SELECT doc_id, " +
          graft.operators.TextOps.featureHashSql("text", 16) + " AS features " +
          "FROM documents) ORDER BY doc_id"
      }),

    // PMI-style collocation mining: top-20 adjacent pairs by lift with a
    // min pair count — phrase-detection / tokenizer-merge candidates.
    // Counts are exact integers; the score is per-factor double casts +
    // one multiply + one divide (no bigint product overflow at corpus
    // scale), so scores and ranking hash-verify.
    Q("q_collocations",
      (s, d) => graft.operators.TextOps
        .collocations(docs(s, d), "doc_id", "text", minCount = 3, k = 20),
      Some(graft.operators.TextOps.collocationsSql(minCount = 3, k = 20))),

    // Interpolated bigram-LM perplexity (KenLM/CCNet-style quality
    // filter, one order above q_unigram_nll): conditional ML probability
    // against live history counts, unigram-smoothed; per-doc ordered
    // cumsum keeps the float reduction engine-portable, so the NLL
    // values themselves hash-verify.
    Q("q_bigram_nll",
      (s, d) => graft.operators.TextOps
        .bigramNll(docs(s, d), "doc_id", "text", lambda = 0.75)
        .orderBy("doc_id"),
      Some(graft.operators.TextOps.bigramNllSql(lambda = 0.75))),

    // Kneser-Ney bigram NLL (KenLM's default smoothing, one rung above
    // q_bigram_nll's raw-frequency interpolation): absolute discount
    // D = 0.75, freed mass backs off to the CONTINUATION count — tokens
    // frequent after only one history stop inflating novel-context
    // likelihoods. Same one-explode chassis; vocabulary frames join on
    // the term key (never broadcast); per-doc ordered cumsum keeps the
    // NLL doubles hash-verifiable.
    Q("q_kneser_ney",
      (s, d) => graft.operators.TextOps
        .kneserNeyNll(docs(s, d), "doc_id", "text", discount = 0.75)
        .orderBy("doc_id"),
      Some(graft.operators.TextOps.kneserNeyNllSql(discount = 0.75))),

    // Mutual information between lang and source (nats): the
    // feature-association measure for mix design — does language predict
    // provenance? Fact scanned once (contingency groupBy); marginals
    // derive from the domain-bounded cell frame; the cell-sum runs as an
    // ordered cumsum so the MI double is bit-identical across engines.
    Q("q_mutual_info",
      (s, d) => graft.operators.StatsOps
        .mutualInfo(docs(s, d), "lang", "source"),
      Some("WITH cells AS (SELECT lang AS x, source AS y, " +
        "CAST(count(*) AS BIGINT) AS c_xy FROM documents " +
        "WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2), " +
        "xm AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cells GROUP BY x), " +
        "ym AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cells GROUP BY y), " +
        "nn AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells), " +
        "t AS (SELECT x, y, n, " +
        "(CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "ln((CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE)) / " +
        "(CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))) AS term " +
        "FROM cells JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN nn), " +
        "cum AS (SELECT n, " +
        "sum(term) OVER (ORDER BY x, y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "row_number() OVER (ORDER BY x, y) AS rn, count(*) OVER () AS nc FROM t) " +
        "SELECT n, CAST(nc AS BIGINT) AS n_cells, round(cum, 6) AS mi_nats " +
        "FROM cum WHERE rn = nc")),

    // Pearson chi-squared independence of (lang, source) — the
    // significance-testable form of the q_mutual_info association (and
    // the categorical sibling of q_ks_drift). Sums over the FULL
    // marginal grid (zero-observed cells contribute their expectation);
    // one fact scan; grid sum as ordered cumsum so the statistic is
    // bit-identical.
    Q("q_chi2",
      (s, d) => graft.operators.StatsOps
        .chiSquare(docs(s, d), "lang", "source"),
      Some {
        val e = "((CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)) / CAST(n AS DOUBLE))"
        val dterm = s"(CAST(o AS DOUBLE) - $e)"
        "WITH cells AS (SELECT lang AS x, source AS y, " +
          "CAST(count(*) AS BIGINT) AS c_xy FROM documents " +
          "WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2), " +
          "xm AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cells GROUP BY x), " +
          "ym AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cells GROUP BY y), " +
          "nn AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells), " +
          "grid AS (SELECT xm.x, ym.y, c_x, c_y, coalesce(c_xy, 0) AS o, n " +
          "FROM xm CROSS JOIN ym " +
          "LEFT JOIN cells ON cells.x = xm.x AND cells.y = ym.y CROSS JOIN nn), " +
          s"t AS (SELECT x, y, n, (($dterm * $dterm) / $e) AS term FROM grid), " +
          "cum AS (SELECT n, " +
          "sum(term) OVER (ORDER BY x, y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
          "row_number() OVER (ORDER BY x, y) AS rn, count(*) OVER () AS nc FROM t), " +
          "dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM xm) AS nx, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM ym) AS ny) " +
          "SELECT n, CAST(nc AS BIGINT) AS n_cells, " +
          "(nx - 1) * (ny - 1) AS dof, round(cum, 6) AS chi2 " +
          "FROM cum CROSS JOIN dims WHERE rn = nc"
      }),

    // Pairwise source vocabulary overlap via the bitmask-histogram
    // trick (tokens collapse to ≤64-bit membership masks; the s²/2
    // pair stats read the mask HISTOGRAM, never a pairwise token
    // join). The oracle is the direct pairwise self-join the histogram
    // must equal — the driver hash-compare proves the rewrite exact.
    Q("q_source_overlap",
      (s, d) => TextOps.sourceOverlap(docs(s, d), "source", "text"),
      Some(TextOps.sourceOverlapSql("documents", "source", "text"))),

    // Gopher quality rules (Rae et al. 2021): the published heuristic
    // gate — word count, mean word length, stop-word presence,
    // top-word-repetition — as per-RULE flags + conjunction verdict.
    // Rationals compare cross-multiplied, so every flag is exact
    // integer arithmetic; zero-shuffle narrow scan.
    Q("q_gopher_rules",
      (s, d) => TextOps.gopherRules(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.gopherRulesSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Hashed linear-classifier margin gate (fastText-style quality
    // model): score = Σ w[h(token) mod 64] with deterministic
    // pseudo-weights — the model-based filter curation stacks run after
    // the heuristic rules. No vocabulary, no join: the weight lookup is
    // arithmetic on the native token code, so the gate costs a filter.
    Q("q_clf_filter",
      (s, d) => TextOps.clfMarginFilter(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.clfMarginFilterSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Calibration audit of the classifier gate against the rule gate
    // (reliability table / ECE terms): per confidence decile, mean
    // sigmoid-confidence vs the fraction the Gopher rules actually pass.
    // A calibrated classifier can replace the rule cascade at scan cost;
    // the gap column says which confidence region still needs rules.
    Q("q_clf_calibration",
      (s, d) => TextOps.clfCalibration(docs(s, d), "doc_id", "text"),
      Some(TextOps.clfCalibrationSql("documents", "doc_id", "text"))),

    // Per-source PII exposure audit (emails + long digit runs per
    // kilochar): the routing signal upstream of q_redact's per-doc
    // scrub — zero-shuffle narrow scan + one source collapse.
    Q("q_pii_density",
      (s, d) => TextOps.piiDensity(docs(s, d), "source", "text"),
      Some(TextOps.piiDensitySql("documents", "source", "text"))),

    // Per-source entity-mention profile (capitalized-token heuristic):
    // mention volume, distinct surface forms, mentions per kilotoken —
    // the no-model NER stand-in for source-quality reading.
    Q("q_entity_mentions",
      (s, d) => TextOps.entityMentions(docs(s, d), "source", "text"),
      Some(TextOps.entityMentionsSql("documents", "source", "text"))),

    // DSIR importance weights (Xie et al. 2023): per-doc average
    // log-likelihood ratio between the TARGET unigram LM (en subset)
    // and the RAW corpus LM, add-1 smoothed over the shared vocabulary
    // — the principled domain-tilt signal to feed q_weighted_sample.
    // One corpus explode; both LMs broadcast back; ordered-fold floats.
    Q("q_dsir_weights",
      (s, d) => TextOps.dsirWeights(docs(s, d), "doc_id", "text",
          col("lang") === "en")
        .orderBy("doc_id"),
      Some(TextOps.dsirWeightsSql("documents", "doc_id", "text",
        "(lang = 'en')") + " ORDER BY doc_id")),

    // Content-defined chunking (rsync/LBFS cut rule): shift-resistant
    // dedup at chunk granularity — where q_block_dedup's fixed blocks
    // lose alignment after one insertion, CDC cuts re-synchronize.
    // Native one-pass kernel in the scan stage; one explode + one
    // code-keyed join; total_len reconstructs n_chars exactly.
    Q("q_cdc_chunks",
      (s, d) => TextOps.cdcChunkProfile(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.cdcChunkProfileSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Rendezvous (HRW) shard assignment, 8 → 9 shards: consistent
    // sharding where id%n reshuffles everything — only ids whose
    // new-shard weight WINS move, and every move lands on the new
    // shard (spec-asserted). Zero-shuffle scan-stage weight argmax.
    Q("q_rendezvous",
      (s, d) => graft.operators.Sampling.rendezvousShards(
          docs(s, d), "doc_id", n = 8, nNew = 9)
        .orderBy("doc_id"),
      Some(graft.operators.Sampling.rendezvousShardsSql(
        "documents", "doc_id", n = 8, nNew = 9) + " ORDER BY doc_id")),

    // Train/eval split-leakage audit: after the reproducible hash split,
    // how many 5-grams does each EVAL doc share with the TRAIN side?
    // q_decontaminate guards external benchmarks; this guards the split
    // itself — straddling near-dups turn eval loss into memorization.
    // Gram-keyed semi-join; train side corpus-sized, NEVER broadcast.
    Q("q_split_leakage",
      (s, d) => TextOps.splitLeakage(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.splitLeakageSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Simpson diversity + effective source count (Hill number of order
    // 2): "the mix behaves like N_eff equally-sized sources" — the
    // interpretable companion to q_gini_sources, weighted by TOKEN mass
    // (what the model actually trains on). DECIMAL(38,0) moments, one
    // double tree.
    Q("q_simpson",
      (s, d) => graft.operators.StatsOps.simpsonDiversity(
        docs(s, d).select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("_t")),
        "source"),
      Some(graft.operators.StatsOps.simpsonDiversitySql(
        s"(SELECT source, unnest(${tokensSql("text")}) AS t FROM documents) tk",
        "source"))),

    // Heaps'-law vocabulary-growth fit across sources (V = K·N^β in
    // log-log): the tokenizer/vocab capacity-planning signal — β→1
    // means the "vocabulary" is IDs/noise and normalization is failing.
    // Regression runs on the 20-row source frame (ordered fold + one
    // closed-form tree); the corpus is touched once.
    Q("q_heaps_law",
      (s, d) => TextOps.heapsLaw(docs(s, d), "source", "text"),
      Some(TextOps.heapsLawSql("documents", "source", "text"))),

    // N-gram novelty: fraction of each doc's distinct 5-grams appearing
    // in NO other document — the across-corpus inverse-redundancy signal
    // (q_rep_ratio's within-doc sibling): low novelty = boilerplate /
    // near-dup territory even when no pair-level match fires. One
    // explode, one df count, one gram-keyed join back.
    Q("q_novelty",
      (s, d) => TextOps.ngramNovelty(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.ngramNoveltySql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Wilson 95% interval on the per-source Gopher pass rate: the honest
    // read of "92% of src7 passes" when src7 has 12 docs — threshold on
    // the LOWER bound, not the point rate. Exact counts + one fixed
    // closed-form tree per bound (sqrt is IEEE-exact).
    Q("q_wilson",
      (s, d) => {
        val flags = TextOps.gopherRules(docs(s, d), "doc_id", "text")
          .join(docs(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        graft.operators.StatsOps.wilsonInterval(flags, "source", "pass")
      },
      Some(graft.operators.StatsOps.wilsonIntervalSql(
        s"(SELECT d.source, gr.pass FROM (${TextOps.gopherRulesSql(
          "documents", "doc_id", "text")}) gr " +
          "JOIN documents d USING (doc_id)) fl",
        "source", "pass"))),

    // Language-ID confusion matrix: q_lang_id's predictions cross-
    // tabbed against the documents' DECLARED lang — the self-audit of
    // our own classifier operator (per-cell counts + within-truth
    // recall). The cell frame is |langs|² — domain-bounded.
    Q("q_lang_confusion",
      (s, d) => graft.operators.StatsOps.confusionMatrix(
        TextOps.langId(docs(s, d), "text"), "lang", "pred_lang"),
      Some {
        val scores = TextOps.langMarkers.map { case (lang, words) =>
          s"CAST(${TextOps.markerCountSql(tokensSql("text"), words)} AS BIGINT) AS s_$lang"
        }.mkString(", ")
        graft.operators.StatsOps.confusionMatrixSql(
          s"SELECT lang AS truth, ${TextOps.langIdArgmaxSql} AS predicted " +
            s"FROM (SELECT lang, $scores FROM documents) sc")
      })
  )
}
