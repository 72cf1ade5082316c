package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** SURVEY §2.3 — dedup operators over the documents table. The MinHash and
  * SimHash oracles re-express the identical portable-hash arithmetic in
  * DuckDB (TextFunctions *Sql emitters), so even the LSH candidate set is
  * fully hash-verified, not just rows-counted.
  */
object DedupQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  /** Block caps for the fixed-cardinality pairwise-verify family
    * (Dedup.thinBlocks — hash-residue thinning, oracle mirroring the
    * rule). Sized to NOT bind at the sf0.1 board scale (max block: 250
    * per source, 112 per (source, lang)) so results there stay
    * bit-identical to the unthinned form, while bounding every block —
    * and so the within-block quadratic — to ~cap at any larger scale
    * (the r12 sf1 board measured the unthinned family at 33–183× wall
    * on 10× data). */
  private[queries] val SourceBlockCap = 512
  private[queries] val SourceLangBlockCap = 160

  /** (band, key) pairs per doc as UNION ALL branches (DuckDB side of
    * Dedup.minhashCandidates' posexplode). */
  private def mhBandsSql(k: Int, bands: Int): String = {
    val sig = minhashSigSql(tokenCodesSql("text"), k)
    (0 until bands).map { b =>
      s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b, k / bands)} AS bkey " +
        s"FROM (SELECT doc_id, $sig AS sig FROM documents)"
    }.mkString(" UNION ALL ")
  }

  val defs: Seq[Q] = Seq(

    // Exact dedup: Spark groups on the 8-byte text hash (the raw text never
    // shuffles); the oracle groups on the text itself — identical output
    // absent a 64-bit collision.
    Q("q_dedup_exact",
      (s, d) => Dedup.exactDedup(docs(s, d), "doc_id", "text").orderBy("keep_id"),
      Some("SELECT min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY text ORDER BY keep_id")),

    // MinHash + banded LSH candidate pairs (16 components, 4 bands of 4),
    // declared in the SKEW-CAPPED 100 TB profile (maxBucket = 64): the
    // synthetic corpus has a boilerplate bucket holding ~77% of all docs
    // per band (3847 docs at sf0.1 — uncapped, that one bucket alone is
    // ~30 M pairs in one task, the classic hot-key scale killer), and a
    // real 100 TB web corpus is worse. The cap bounds every bucket's join
    // contribution to cap² at a recall cost ONLY inside over-cap buckets
    // (DedupSpec proves cap >= bucket size ⟹ bit-identical to exact
    // LSH); members truncated out of a hot bucket remain pairable through
    // their other bands. For CLUSTERING the hot bucket, q_dedup_clusters'
    // star-contracted edges keep exact semantics at linear cost — the
    // pair form is for bounded pairwise verification. The oracle mirrors
    // the cap: same lowest-64-ids-per-bucket membership, same pairs.
    Q("q_minhash_pairs",
      (s, d) => Dedup.minhashCandidates(docs(s, d), "doc_id", "text",
          k = 16, bands = 4, maxBucket = Some(64))
        .orderBy("a", "b"),
      Some(s"WITH bands AS (${mhBandsSql(16, 4)}), " +
        "capped AS (SELECT doc_id, band, bkey FROM " +
        "(SELECT doc_id, band, bkey, row_number() OVER " +
        "(PARTITION BY band, bkey ORDER BY doc_id) AS rn FROM bands) " +
        "WHERE rn <= 64) " +
        "SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM capped x " +
        "JOIN capped y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id " +
        "ORDER BY a, b")),

    // SimHash 16-bit buckets with keep-min-id representative.
    Q("q_simhash_dup",
      (s, d) => Dedup.simhashBuckets(docs(s, d), "doc_id", "text", bits = 16)
        .orderBy("simhash"),
      Some("WITH h AS (SELECT doc_id, " +
        s"CAST(${simhashSql(tokenCodesSql("text"), 16)} AS BIGINT) AS simhash FROM documents) " +
        "SELECT simhash, min(doc_id) AS keep_id, count(*) AS n_docs " +
        "FROM h GROUP BY simhash ORDER BY simhash")),

    // Connected components over a high-precision LSH graph (bands=2 of 8
    // rows: only docs agreeing on 8 consecutive minhash components link
    // up) — candidate buckets become dedup GROUPS labelled by min member
    // id. Both sides build the star-contracted edge set (member →
    // bucket-min; a bucket clique is connected through its min, so
    // components are identical to the pairwise graph's — and the dense
    // clique fan-out that made the recursive oracle explode is gone).
    // The component ALGORITHMS stay independent: Spark iterates min-label
    // propagation, the oracle walks BFS reachability in a recursive CTE.
    Q("q_dedup_clusters",
      (s, d) => Dedup.connectedComponents(
          Dedup.lshStarEdges(docs(s, d), "doc_id", "text", k = 16, bands = 2))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some(s"WITH RECURSIVE bands AS (${mhBandsSql(16, 2)}), " +
        "stars AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bkey) AS bmin " +
        "FROM bands), " +
        "e0 AS (SELECT DISTINCT doc_id AS src, bmin AS dst FROM stars " +
        "WHERE doc_id <> bmin), " +
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0), " +
        "reach(id, m) AS (SELECT DISTINCT src AS id, src AS m FROM edges " +
        "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.m) " +
        "SELECT id AS doc_id, min(m) AS comp FROM reach GROUP BY id ORDER BY doc_id")),

    // Soft dedup (the down-weighting alternative to dropping: SoftDeDup,
    // He et al. 2024): every member of a near-dup component keeps its
    // row but samples at weight 1/|component|, so each duplicated
    // passage contributes ONE document's worth of gradient regardless of
    // clique size. Rides the same star-contracted component chain as
    // q_dedup_clusters (linear edges, no pair blowup); the size join is
    // component-keyed, map-side combined.
    Q("q_softdedup",
      (s, d) => {
        val cc = Dedup.connectedComponents(
          Dedup.lshStarEdges(docs(s, d), "doc_id", "text", k = 16, bands = 2))
          .withColumnRenamed("id", "doc_id")
        // singletons never enter the edge frame but MUST keep weight 1.0
        // — a weighting op that silently drops un-duplicated docs would
        // zero out exactly the data dedup exists to protect
        val comps = docs(s, d).select(col("doc_id"))
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
        val sizes = comps.groupBy("comp").agg(count(lit(1)).as("csize"))
        comps.join(sizes, "comp")
          .select(col("doc_id"), col("comp"), col("csize"),
            round(lit(1.0) / col("csize").cast("double"), 6).as("weight"))
          .orderBy("doc_id")
      },
      Some(s"WITH RECURSIVE bands AS (${mhBandsSql(16, 2)}), " +
        "stars AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bkey) AS bmin " +
        "FROM bands), " +
        "e0 AS (SELECT DISTINCT doc_id AS src, bmin AS dst FROM stars " +
        "WHERE doc_id <> bmin), " +
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0), " +
        "reach(id, m) AS (SELECT DISTINCT src AS id, src AS m FROM edges " +
        "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.m), " +
        "cc AS (SELECT id AS doc_id, min(m) AS comp FROM reach GROUP BY id), " +
        "comps AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp " +
        "FROM documents d LEFT JOIN cc c USING (doc_id)), " +
        "sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS csize FROM comps GROUP BY comp) " +
        "SELECT doc_id, comp, csize, round(1.0 / CAST(csize AS DOUBLE), 6) AS weight " +
        "FROM comps JOIN sizes USING (comp) ORDER BY doc_id")),

    // n-gram Jaccard verification over same-source candidate pairs: the
    // candidate generator here is the source bucket (25 docs/source at
    // sf0.01) — set ops run only within buckets, never all-pairs.
    // Edit-distance verification of near-dup candidates: exact
    // Levenshtein <= 30 on 48-char prefixes. THREE cost bounds make this
    // scale: (source, lang) composite blocking keys cap the candidate
    // set (the multi-attribute blocking norm in fuzzy dedup — a plain
    // source bucket was 80x more pairs and 45 s at sf0.1), hash-residue
    // block thinning bounds each block to ~SourceLangBlockCap rows (160) (the
    // keys are fixed-cardinality, so unthinned blocks grow with the
    // corpus and pairs quadratically — 123–183x at sf1 on the r12
    // board; the oracle mirrors the thinning), and the
    // bounded prefix caps the per-pair DP. The 2-arg full Wagner-Fischer
    // is deliberate: Spark's banded 3-arg form measured identical here
    // (threshold 30 on 48 chars leaves the band nearly full-width) and
    // its -1 over-threshold sentinel would sneak through a plain <=
    // filter. The projection recomputes the distance only for SURVIVING
    // pairs (the filtered fraction), which is cheaper than carrying it
    // through the join for every candidate.
    Q("q_edit_verify",
      (s, d) => {
        val dd = Dedup.thinBlocks(docs(s, d), Seq("source", "lang"),
          "doc_id", SourceLangBlockCap)
        // explicit partition count: the pair stage is COMPUTE-heavy on
        // tiny data, and AQE's size-based coalescing would fold the probe
        // side into one task (observed: 7 s single-threaded at sf0.1) —
        // a user-specified count is exempt from coalescing
        val shufflePartitions = s.sessionState.conf.numShufflePartitions
        val pref = dd
          .select(col("doc_id"), col("source"), col("lang"),
            substring(col("text"), 1, 48).as("pref"))
          .repartition(shufflePartitions, col("doc_id"))
        // id test FIRST in the non-equi remainder so codegen
        // short-circuits before the DP on the mirrored half of each pair
        pref.as("d1").join(pref.as("d2"),
            col("d1.source") === col("d2.source") &&
              col("d1.lang") === col("d2.lang") &&
              col("d1.doc_id") < col("d2.doc_id") &&
              levenshtein(col("d1.pref"), col("d2.pref")) <= 30)
          .select(col("d1.doc_id").as("a"), col("d2.doc_id").as("b"),
            levenshtein(col("d1.pref"), col("d2.pref")).cast("long")
              .as("edit_dist"))
          .orderBy("a", "b")
      },
      Some("WITH p AS (SELECT doc_id, source, lang, substr(text, 1, 48) AS pref " +
        s"FROM ${Dedup.thinBlocksSql("documents", Seq("source", "lang"),
          "doc_id", SourceLangBlockCap)} thin) " +
        "SELECT x.doc_id AS a, y.doc_id AS b, " +
        "CAST(levenshtein(x.pref, y.pref) AS BIGINT) AS edit_dist " +
        "FROM p x JOIN p y ON x.source = y.source AND x.lang = y.lang " +
        "AND x.doc_id < y.doc_id " +
        "WHERE levenshtein(x.pref, y.pref) <= 30 ORDER BY a, b")),

    // Same-source pairs, source blocks hash-thinned to ~SourceBlockCap
    // rows (fixed-cardinality key — unthinned blocks grow with the
    // corpus, 33–43x at sf1 on the r12 board; oracle mirrors the rule).
    Q("q_ngram_jaccard",
      (s, d) => {
        val dd = Dedup.thinBlocks(docs(s, d), Seq("source"),
          "doc_id", SourceBlockCap)
        // the docs parquet is one small file = one input partition; without
        // a repartition the whole quadratic pair stage would run on a
        // couple of tasks no matter how many cores exist — and the count
        // must be EXPLICIT or AQE's size-based coalescing re-folds the
        // tiny-but-compute-heavy stage into one task (the q_edit_verify
        // lesson)
        val pairs = dd.select(col("doc_id"), col("source"))
          .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
          .as("d1")
          .join(dd.select(col("doc_id"), col("source")).as("d2"),
            col("d1.source") === col("d2.source") &&
              col("d1.doc_id") < col("d2.doc_id"))
          .select(col("d1.doc_id").as("a"), col("d2.doc_id").as("b"))
        Dedup.ngramJaccard(pairs, dd, "doc_id", "text")
          .select(col("a"), col("b"), col("n_inter"), col("n_union"), col("jaccard"))
          .orderBy("a", "b")
      },
      Some {
        val grams = s"list_distinct(${bigramsSql(tokensSql("text"))})"
        val thin = Dedup.thinBlocksSql("documents", Seq("source"),
          "doc_id", SourceBlockCap)
        s"WITH g AS (SELECT doc_id, source, $grams AS grams FROM $thin thin) " +
          "SELECT x.doc_id AS a, y.doc_id AS b, " +
          "CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_inter, " +
          "CAST(len(list_distinct(list_concat(x.grams, y.grams))) AS BIGINT) AS n_union, " +
          "round(CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) / " +
          "CAST(len(list_distinct(list_concat(x.grams, y.grams))) AS BIGINT), 6) AS jaccard " +
          "FROM g x JOIN g y ON x.source = y.source AND x.doc_id < y.doc_id " +
          "ORDER BY a, b"
      }),

    // Exact whole-corpus set-similarity join (AllPairs/PPJoin prefix
    // filtering, trigram shingle sets, tau = 1/2): the LOSSLESS exact
    // near-dup path — no blocking key, no probabilistic miss. The oracle
    // is the full quadratic join, so the driver hash-compare PROVES the
    // prefix filter dropped no qualifying pair (and the integer rational
    // threshold `2*inter >= union` decides inclusion identically on both
    // engines — no float threshold edge).
    Q("q_setsim_join",
      (s, d) => Dedup.setSimJoin(docs(s, d), "doc_id", "text",
          n = 3, tauNum = 1, tauDen = 2)
        .orderBy("a", "b"),
      Some {
        val grams = s"list_distinct(${ngramsSql("t", 3)})"
        s"WITH tk AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents), " +
          s"g AS (SELECT doc_id, $grams AS grams FROM tk WHERE len($grams) > 0), " +
          "p AS (SELECT x.doc_id AS a, y.doc_id AS b, " +
          "CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_inter, " +
          "CAST(len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_union " +
          "FROM g x JOIN g y ON x.doc_id < y.doc_id) " +
          "SELECT a, b, n_inter, n_union, " +
          "round(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 6) AS jaccard " +
          "FROM p WHERE 2 * n_inter >= n_union ORDER BY a, b"
      }),

    // LSH recall audit: of the pairs EXACT trigram Jaccard (>= 0.3,
    // computed exhaustively inside lang blocks) calls duplicates, what
    // fraction does each production path surface? recall_pairs = the
    // skew-capped pairwise candidates (0/6 here — all six J>=0.95 dups
    // sit past the cap inside one 388-doc boilerplate bucket: the cap's
    // cost bound is real and so is its recall bill); recall_cluster =
    // the capless star-contraction components (5/6, cost linear in
    // bucket size — the path that keeps hot-bucket dups at scale; the
    // residual miss is a genuine probabilistic LSH miss, absent from
    // the uncapped pairwise set too). One
    // row, fully hash-verified: truth set, candidate set AND components
    // rebuild identically in DuckDB.
    Q("q_lsh_recall",
      (s, d) => {
        val dd = docs(s, d)
        Dedup.lshRecall(dd, "doc_id", "text",
          blockCols = Seq("lang"), n = 3, tau = 0.3,
          k = 16, bands = 4, maxBucket = Some(64),
          // truth stays EXHAUSTIVE through the sf0.1 board scale
          // (mod = 1, oracle pins the sf0.01 derivation); past it the
          // quadratic truth runs on the hash-residue doc sample — the
          // "block-sampled at scale" form SURVEY declares. The mod is
          // derived from the NULL-FILTERED doc count — the same frame
          // lshRecall actually pairs (lang-NULL docs are excluded on
          // both engines), so the Spark-side derivation and the oracle's
          // pinned value can never drift apart on a corpus whose null
          // share pushes the raw count past fullUpTo first.
          truthSampleMod = Dedup.scaledTruthSampleMod(
            dd.filter(col("lang").isNotNull).count()))
      },
      Some {
        val grams = s"list_distinct(${ngramsSql("t", 3)})"
        // sf0.01 derivation: scaledTruthSampleMod(500) = 1 (the `% 1 = 0`
        // filter keeps every doc — the exhaustive audit)
        val h = charHashSql("CAST(id AS VARCHAR)")
        s"WITH RECURSIVE tk AS (SELECT doc_id, lang, ${tokensSql("text")} AS t " +
          "FROM documents WHERE lang IS NOT NULL), " +
          s"g AS (SELECT doc_id AS id, lang, $grams AS grams FROM tk), " +
          s"gs AS (SELECT * FROM g WHERE ($h) % 1 = 0), " +
          "p AS (SELECT x.id AS a, y.id AS b, " +
          "CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS inter, " +
          "CAST(len(x.grams) AS BIGINT) AS na, CAST(len(y.grams) AS BIGINT) AS nb " +
          "FROM gs x JOIN gs y ON x.lang = y.lang AND x.id < y.id), " +
          "truth AS (SELECT a, b FROM p WHERE " +
          "CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.3), " +
          s"bands AS (${mhBandsSql(16, 4)}), " +
          "capped AS (SELECT doc_id, band, bkey FROM " +
          "(SELECT doc_id, band, bkey, row_number() OVER " +
          "(PARTITION BY band, bkey ORDER BY doc_id) AS rn FROM bands) " +
          "WHERE rn <= 64), " +
          "cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM capped x " +
          "JOIN capped y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id), " +
          "hitp AS (SELECT truth.a, truth.b FROM truth " +
          "JOIN cand ON truth.a = cand.a AND truth.b = cand.b), " +
          // capless star edges -> BFS reachability -> component min per
          // node (the q_dedup_clusters oracle pattern, 16/4 banding)
          "stars AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bkey) AS bmin FROM bands), " +
          "e0 AS (SELECT DISTINCT doc_id AS src, bmin AS dst FROM stars WHERE doc_id <> bmin), " +
          "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), " +
          "reach(id, m) AS (SELECT DISTINCT src AS id, src AS m FROM edges " +
          "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.m), " +
          "comps AS (SELECT id, min(m) AS comp FROM reach GROUP BY id), " +
          "hitc AS (SELECT truth.a, truth.b FROM truth " +
          "JOIN comps x ON truth.a = x.id JOIN comps y ON truth.b = y.id " +
          "WHERE x.comp = y.comp) " +
          // empty-truth guard MIRRORS the Spark side's when(n_truth > 0):
          // NULL recall, never an engine-dependent x/0
          "SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM hitp) AS n_hit_pairs, " +
          "CASE WHEN (SELECT count(*) FROM truth) > 0 THEN " +
          "round(CAST((SELECT count(*) FROM hitp) AS DOUBLE) / " +
          "CAST((SELECT count(*) FROM truth) AS DOUBLE), 6) END AS recall_pairs, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM hitc) AS n_hit_cluster, " +
          "CASE WHEN (SELECT count(*) FROM truth) > 0 THEN " +
          "round(CAST((SELECT count(*) FROM hitc) AS DOUBLE) / " +
          "CAST((SELECT count(*) FROM truth) AS DOUBLE), 6) END AS recall_cluster"
      }),

    // Incremental near-dup admission: the doc_id % 10 == 0 slice plays
    // the NEW batch, the rest the existing corpus. Candidates come from
    // the UNCAPPED band join (batch side broadcast — the corpus never
    // shuffles per increment): with a small batch, a hot bucket costs
    // |corpus bucket| x |batch bucket| — LINEAR in corpus bucket size —
    // so the skew cap that q_minhash_pairs needs is unnecessary here,
    // and capping would drop every true dup living in the hot bucket
    // (measured: all 5 J >= 0.95 cross-boundary dups vanish at cap 64).
    // Verified by exact bigram Jaccard >= 0.5; gram-hash vs gram-string
    // jaccard agree up to ~2^-64 collisions (the q_ngram_jaccard stance).
    Q("q_dedup_incr",
      (s, d) => {
        // The admission batch is a CONSTANT-SIZE id slice (50 docs), not a
        // fraction of the corpus: a real incremental ingest admits
        // fixed-size batches against a growing index, so the declared
        // query's cost profile is linear in corpus size (the r10 sf1 audit
        // showed the old doc_id%10 batch — 10% OF THE CORPUS — made both
        // join sides grow 10x and the band join ~100x).
        val all = docs(s, d)
        val cand = Dedup.minhashIncrement(
          all.filter(col("doc_id") >= 50),
          all.filter(col("doc_id") < 50),
          "doc_id", "text", k = 16, bands = 4)
        Dedup.ngramJaccard(
            cand.select(col("new_id").as("a"), col("dup_of").as("b")),
            all, "doc_id", "text")
          .filter(col("jaccard") >= 0.5)
          .select(col("a").as("new_id"), col("b").as("dup_of"), col("jaccard"))
          .orderBy("new_id", "dup_of")
      },
      Some {
        val grams = s"list_distinct(${bigramsSql(tokensSql("text"))})"
        s"WITH bands AS (${mhBandsSql(16, 4)}), " +
          "cband AS (SELECT doc_id, band, bkey FROM bands WHERE doc_id >= 50), " +
          "bband AS (SELECT doc_id, band, bkey FROM bands WHERE doc_id < 50), " +
          "cand AS (SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS dup_of " +
          "FROM cband c JOIN bband b ON c.band = b.band AND c.bkey = b.bkey " +
          "AND c.doc_id <> b.doc_id), " +
          s"g AS (SELECT doc_id, $grams AS grams FROM documents) " +
          "SELECT new_id, dup_of, j AS jaccard FROM " +
          "(SELECT new_id, dup_of, " +
          "round(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE) / " +
          "CAST(len(list_distinct(list_concat(x.grams, y.grams))) AS DOUBLE), 6) AS j " +
          "FROM cand JOIN g x ON cand.new_id = x.doc_id " +
          "JOIN g y ON cand.dup_of = y.doc_id) " +
          "WHERE j >= 0.5 ORDER BY new_id, dup_of"
      }),

    // Hamming-radius (<= 2) pairs over 60-bit widened SimHashes via
    // pigeonhole banding (3 disjoint 20-bit bands — a pair within radius
    // must agree on a whole band, perfect candidate recall; bit_count
    // verify), declared in the SKEW-CAPPED 100 TB profile
    // (maxBucket = 64, the q_minhash_pairs convention, oracle mirroring
    // the cap). Band WIDTH fixes random collisions (population n/2^20),
    // but near-identical docs share whole band values BY DESIGN, so
    // template/replica cliques pile linearly-growing mass onto a few
    // buckets at ANY width — the r12 sf1 board measured the uncapped
    // 20-bit form at 40–62x on 10x docs (hot buckets 292 -> 2774), and
    // the true radius-2 pair set itself grew 163x (nothing lossless can
    // beat its own output). Cap 64 bounds every bucket's contribution
    // to 64² (measured: 11.6x candidate rows on 10x docs); cap >= every
    // bucket is bit-identical to the exact form (spec), recall is lost
    // only inside over-cap buckets = dense near-dup cliques, where the
    // CLUSTERING face (q_simhash_dup buckets / star contraction) keeps
    // the dups at linear cost. Token codes xorshift-spread onto 60 bits
    // first (charHash carries only 30 bits of signal; widening makes
    // every vote bit real on BOTH engines).
    Q("q_simhash_hamming",
      (s, d) => Dedup.simhashHammingPairs(docs(s, d), "doc_id", "text",
          bits = 60, radius = 2, widen = true, maxBucket = Some(64))
        .orderBy("a", "b"),
      Some(Dedup.simhashHammingPairsSql("documents", "doc_id", "text",
        bits = 60, radius = 2, widen = true, maxBucket = Some(64)))),

    // Asymmetric n-gram containment over same-source pairs: C(A->B) =
    // |A∩B|/|A| catches a short doc embedded in a long one, which
    // Jaccard structurally misses (the union drowns the short side —
    // visible in the output as 0.3-vs-0.03 containment pairs with tiny
    // jaccard). Both directions + jaccard from ONE intersect per pair.
    // Candidate-policy note (r10, measured): the lossless prefix filter
    // (Dedup.overlapPrefixCandidates / q_overlap_join) was tried here and
    // REVERTED — at the 0.25 threshold the frequency-ascending prefix
    // keeps ~75% of each doc's grams, and on this template-heavy corpus
    // even rare grams carry fat postings, so the candidate join costs
    // MORE rows than the blocked all-pairs it replaces (289M vs 62M at
    // sf1; 21.2s vs 9.4s). Low-threshold containment over short docs is
    // intrinsically near-quadratic per block; the prefix policy is the
    // right tool at high thresholds over long-tailed real corpora.
    // Source blocks hash-thinned to ~SourceBlockCap (75–90x at sf1
    // unthinned on the r12 board; oracle mirrors the rule).
    Q("q_containment",
      (s, d) => {
        val dd = Dedup.thinBlocks(docs(s, d), Seq("source"),
          "doc_id", SourceBlockCap)
        val pairs = dd.select(col("doc_id"), col("source"))
          .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
          .as("d1")
          .join(dd.select(col("doc_id"), col("source")).as("d2"),
            col("d1.source") === col("d2.source") &&
              col("d1.doc_id") < col("d2.doc_id"))
          .select(col("d1.doc_id").as("a"), col("d2.doc_id").as("b"))
        Dedup.ngramContainment(pairs, dd, "doc_id", "text")
          .filter(greatest(col("containment_ab"), col("containment_ba")) >= 0.25)
          .select(col("a"), col("b"), col("n_inter"),
            col("containment_ab"), col("containment_ba"), col("jaccard"))
          .orderBy("a", "b")
      },
      Some {
        val grams = s"list_distinct(${bigramsSql(tokensSql("text"))})"
        val thin = Dedup.thinBlocksSql("documents", Seq("source"),
          "doc_id", SourceBlockCap)
        s"WITH g AS (SELECT doc_id, source, $grams AS grams FROM $thin thin), " +
          "m AS (SELECT x.doc_id AS a, y.doc_id AS b, " +
          "CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_inter, " +
          "CAST(len(x.grams) AS BIGINT) AS na, CAST(len(y.grams) AS BIGINT) AS nb " +
          "FROM g x JOIN g y ON x.source = y.source AND x.doc_id < y.doc_id) " +
          "SELECT a, b, n_inter, c_ab AS containment_ab, c_ba AS containment_ba, " +
          "jaccard FROM (SELECT a, b, n_inter, " +
          "round(CAST(n_inter AS DOUBLE) / CAST(na AS DOUBLE), 6) AS c_ab, " +
          "round(CAST(n_inter AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS c_ba, " +
          "round(CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE), 6) AS jaccard " +
          "FROM m) WHERE greatest(c_ab, c_ba) >= 0.25 ORDER BY a, b"
      }),

    // Dedup survivorship bill per source: elect the min-id survivor per
    // q_dedup_clusters component and price what each feed loses in
    // documents and characters — the number the pipeline reports
    // ("dedup cut feed X by 38% of bytes"). Same star-edge graph and
    // algorithm-independent oracle as q_dedup_clusters (Spark: min-label
    // propagation; DuckDB: recursive BFS reachability).
    Q("q_dedup_survivors",
      (s, d) => Dedup.dedupSurvivors(docs(s, d), "doc_id", "text", "source",
        k = 16, bands = 2),
      Some(s"WITH RECURSIVE bands AS (${mhBandsSql(16, 2)}), " +
        "stars AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bkey) AS bmin " +
        "FROM bands), " +
        "e0 AS (SELECT DISTINCT doc_id AS src, bmin AS dst FROM stars " +
        "WHERE doc_id <> bmin), " +
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0), " +
        "reach(id, m) AS (SELECT DISTINCT src AS id, src AS m FROM edges " +
        "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.m), " +
        "cmp AS (SELECT id, CAST(min(m) AS BIGINT) AS comp FROM reach GROUP BY id), " +
        "lab AS (SELECT d.source, CAST(length(d.text) AS BIGINT) AS nch, " +
        "(d.doc_id = coalesce(c.comp, d.doc_id)) AS keep " +
        "FROM documents d LEFT JOIN cmp c ON d.doc_id = c.id) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "CAST(sum(nch) AS BIGINT) AS chars_total, " +
        "CAST(sum(CASE WHEN keep THEN nch ELSE 0 END) AS BIGINT) AS chars_kept, " +
        "round(1.0 - CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS doc_cut_ratio, " +
        "round(1.0 - CAST(sum(CASE WHEN keep THEN nch ELSE 0 END) AS DOUBLE) / " +
        "CAST(sum(nch) AS DOUBLE), 6) AS char_cut_ratio " +
        "FROM lab GROUP BY source ORDER BY source"))
  )
}
