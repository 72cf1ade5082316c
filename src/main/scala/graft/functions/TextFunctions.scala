package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.plans.Exprs

/** Text-pipeline primitives (shingles, portable hashes, MinHash, SimHash)
  * for the training-data operators (SURVEY §2.3).
  *
  * Every primitive here exists twice: a Spark `Column` builder and a DuckDB
  * SQL emitter that produces the *identical operation tree* (same literals,
  * same strict left-fold order, same integer arithmetic). That is what lets
  * the driver hash-verify even the hash-based operators: both engines fold
  * `(acc * 31 + code) % P` over the same character sequence and must agree
  * bit-for-bit. No library hash (xxhash64/murmur) could be oracle-checked
  * this way.
  *
  * All arithmetic stays inside int64 (max intermediate ~3e13 << 2^63), so
  * the expressions are ANSI-safe and overflow-free in both engines.
  */
object TextFunctions {

  /** Fold modulus (large prime < 2^30, keeps products within int64). */
  val P: Long = 1000000007L

  /** Whitespace tokenization. Single-space split on both sides: Spark's
    * regex split and DuckDB's string_split agree on single-space-joined
    * text (the documents table's format). */
  def tokens(text: Column): Column = split(text, " ")
  def tokensSql(text: String): String = s"string_split($text, ' ')"

  /** Portable polynomial string hash: strict left fold of
    * `(acc * 31 + ascii(char)) % P` over the characters. Backed by the
    * native codegen'd expression (the HOF fold it replaces is
    * CodegenFallback — interpreted per character); charHashHof remains for
    * the equivalence spec. */
  def charHash(s: Column): Column =
    PlanBridge.column(Exprs.CharHash(PlanBridge.expression(s)))

  /** Jaro–Winkler similarity (DuckDB jaro_winkler_similarity parity —
    * the record-linkage verify-stage comparator; native codegen'd). */
  def jaroWinkler(a: Column, b: Column): Column =
    PlanBridge.column(Exprs.JaroWinkler(
      PlanBridge.expression(a), PlanBridge.expression(b)))

  /** The original higher-order-function form of charHash (spec oracle). */
  def charHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % P)

  def charHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"

  /** Content-defined chunk codes (native one pass): Rabin-style CDC cut
    * rule on the rolling w-char hash, each chunk coded as
    * `charHash(chunk)·2^20 + len`. */
  def cdcChunkCodes(text: Column, window: Int, maskBits: Int): Column =
    PlanBridge.column(Exprs.CdcChunkCodes(
      PlanBridge.expression(text), window, maskBits))

  /** DuckDB twin of [[cdcChunkCodes]] as a STAGED subquery — O(n·w)
    * direct window hashes, identical cut set and chunk codes; the
    * boundary/cut lists materialize as columns so nothing re-evaluates.
    * The kernel's forced max-length cut (Kernels.CdcMaxChunkLen) is
    * mirrored by inserting synthetic boundaries every maxLen chars
    * inside each natural-cut gap — identical augmented cut set, so the
    * codes still match the native kernel bit-for-bit.
    * Yields (doc_id, codes). `text` must be a bare column name. */
  def cdcChunkCodesSql(table: String, idExpr: String, text: String,
                       window: Int, maskBits: Int): String = {
    val mask = 1L << maskBits
    val maxLen = graft.plans.Kernels.CdcMaxChunkLen
    val win = charHashSql(s"substr($text, i - ${window - 1}, $window)")
    val chunk = s"substr($text, b3[j - 1] + 1, b3[j] - b3[j - 1])"
    s"SELECT doc_id, list_transform(range(2, len(b3) + 1), " +
      s"j -> ${charHashSql(chunk)} * 1048576 + (b3[j] - b3[j - 1])) AS codes " +
      "FROM (SELECT doc_id, " +
      "list_concat([CAST(0 AS BIGINT)], " +
      "flatten(list_transform(range(2, len(b2) + 1), " +
      s"j -> list_concat(list_transform(range(b2[j - 1] + $maxLen, b2[j], $maxLen), " +
      "x -> CAST(x AS BIGINT)), [b2[j]])))) AS b3, " +
      s"$text FROM (SELECT doc_id, " +
      "list_concat(list_concat([CAST(0 AS BIGINT)], bnd), " +
      s"CASE WHEN length($text) > 0 AND (len(bnd) = 0 OR " +
      s"bnd[len(bnd)] <> length($text)) " +
      s"THEN [CAST(length($text) AS BIGINT)] ELSE [] END) AS b2, $text " +
      s"FROM (SELECT $idExpr AS doc_id, $text, " +
      s"list_filter(range($window, length($text) + 1), " +
      s"i -> ($win) % $mask = 0) AS bnd FROM $table) tb) t2i) t2"
  }

  /** Per-token hash codes: array<long>, one code per whitespace token
    * (native: one pass, no per-token closure). */
  def tokenCodes(text: Column): Column =
    PlanBridge.column(Exprs.TokenCodes(PlanBridge.expression(text)))
  def tokenCodesSql(text: String): String =
    s"list_transform(${tokensSql(text)}, t -> ${charHashSql("t")})"

  /** Adjacent-token (bigram) pair fragments — ONE definition shared by
    * collocations and the bigram LM on BOTH engines, so the operators and
    * their oracles cannot desynchronize. The Spark form expects the token
    * array aliased as `_t`; both emit structs {a, b} for positions
    * (i, i+1), empty for sub-2-token docs. The size guard is INSIDE the
    * expression: Spark's `sequence(1, size - 1)` is DESCENDING [1, 0]
    * when size = 1 and element_at(_t, 0) throws, so without the guard the
    * contract held only for callers that pre-filtered size >= 2 (the
    * DuckDB form's `range` is genuinely empty there). */
  val adjacentPairsExpr: String =
    "CASE WHEN size(_t) < 2 THEN " +
      "array() " +
      "ELSE transform(sequence(1, size(_t) - 1), " +
      "i -> named_struct('a', element_at(_t, i), 'b', element_at(_t, i + 1))) END"

  def adjacentPairsSql(t: String): String =
    s"list_transform(range(1, len($t)), " +
      s"i -> struct_pack(a := $t[i], b := $t[i + 1]))"

  /** Deterministic MinHash parameter family (a_i odd, b_i spread). */
  def mhParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (101L + 2L * i, 7919L * i + 13L))

  /** k-component MinHash signature over token codes: component i is
    * `min((a_i * code + b_i) % P)` over the token-code set. Duplicated
    * tokens don't change a min, so this is a true set signature.
    * Native: all k components in one pass over the codes. */
  def minhashSig(codes: Column, k: Int): Column = {
    val ps = mhParams(k)
    PlanBridge.column(
      Exprs.MinHashSig(PlanBridge.expression(codes), ps.map(_._1), ps.map(_._2)))
  }

  def minhashSigSql(codes: String, k: Int): String =
    mhParams(k).map { case (a, b) =>
      s"list_min(list_transform($codes, x -> (x * $a + $b) % $P))"
    }.mkString("[", ", ", "]")

  /** LSH band key: fold the band's signature components with
    * `(acc * 31 + m) % P`. The mod keeps every intermediate < 31*P+2^30
    * (int64-safe for ANY rowsPerBand — the unmodded fold overflowed at 8
    * components, and DuckDB errors on BIGINT overflow where Spark wraps).
    * `sig` is 1-indexed on both sides (Spark element_at / DuckDB list
    * index). */
  def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column =
    (0 until rowsPerBand)
      .map(i => element_at(sig, band * rowsPerBand + i + 1))
      .reduceLeft((acc, m) => (acc * 31L + m) % P)

  def bandKeySql(sig: String, band: Int, rowsPerBand: Int): String =
    (0 until rowsPerBand)
      .map(i => s"$sig[${band * rowsPerBand + i + 1}]")
      .reduceLeft((acc, m) => s"(($acc * 31 + $m) % $P)")

  /** Xorshift spread of sub-2^30 token codes onto 60 bits — the
    * code-width stage under wide SimHashes ([[Kernels.widenCode]] has the
    * bit-coverage argument). charHash codes carry only 30 bits, so a
    * 60-bit simhash over RAW codes would have 30 vote-constant bits and
    * its upper pigeonhole bands would collide everything. */
  def widenCodes(codes: Column): Column =
    PlanBridge.column(Exprs.WidenCodes(PlanBridge.expression(codes)))

  /** DuckDB twin of [[widenCodes]] — the same three xorshift steps as
    * overflow-free BIGINT arithmetic (every intermediate < 2^61). */
  def widenCodesSql(codes: String): String = {
    val a = "xor(x, x << 13)"
    val b = s"xor($a, ($a) >> 7)"
    val w = s"xor($b, ($b) << 17)"
    val folded = s"xor($w, (($w) & 1073741823) << 30)"
    s"list_transform($codes, x -> $folded)"
  }

  /** `bits`-bit SimHash over token codes, frequency-weighted: bit p is set
    * when the +1/-1 vote sum over tokens (by bit p of each code) is > 0.
    * Native: one pass accumulates every bit's vote (the HOF form ran one
    * interpreted fold per bit). */
  def simhash(codes: Column, bits: Int): Column =
    PlanBridge.column(Exprs.SimHash(PlanBridge.expression(codes), bits))

  def simhashSql(codes: String, bits: Int): String =
    (0 until bits).map { p =>
      s"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($codes, x -> ((x >> $p) & 1) * 2 - 1)), " +
        s"(a, b) -> a + b) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Non-overlapping occurrence counts of literal `patterns` in one scan
    * (array<long>, one count per pattern — same values as one
    * regexp_count per pattern, ~k regex passes collapsed to one loop). */
  def substringCounts(text: Column, patterns: Seq[String]): Column =
    PlanBridge.column(Exprs.SubstringCounts(PlanBridge.expression(text), patterns))

  /** Character-level Shannon entropy in bits over an ASCII alphabet — one
    * lookup-table scan + the oracle's exact fold (double). */
  def charEntropyBits(text: Column, alphabet: Seq[String]): Column =
    PlanBridge.column(Exprs.CharEntropy(PlanBridge.expression(text), alphabet))

  /** Per-set token membership counts in one pass (array<long>, one count
    * per set — same values as size(filter(toks, t IN set)) per set). */
  def memberCounts(toks: Column, sets: Seq[Seq[String]]): Column =
    PlanBridge.column(Exprs.MemberCounts(PlanBridge.expression(toks), sets))

  /** Adjacent-token bigram shingles ("w1 w2"). Empty for <2 tokens. */
  def bigrams(toks: Column): Column = {
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(
      slice(toks, lit(1), n),
      slice(toks, lit(2), n),
      (a, b) => concat_ws(" ", a, b))
  }

  def bigramsSql(toks: String): String =
    s"list_transform(range(1, len($toks)), i -> $toks[i] || ' ' || $toks[i + 1])"

  /** Sorted distinct 64-bit hashes of the text's n-token shingles (native
    * one-pass kernel). Joins/counts over these match joins/counts over the
    * gram STRINGS (what the oracle computes) up to ~2^-64 collisions. */
  def ngramHashes(text: Column, n: Int): Column =
    PlanBridge.column(Exprs.SortedNgramHashes(PlanBridge.expression(text), n))

  /** DuckDB n-gram STRINGS for a token-list expression (1-based list
    * indexing; empty below n tokens). */
  def ngramsSql(toks: String, n: Int): String = {
    val concat = (0 until n).map(g => s"$toks[i + $g]")
      .mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1), i -> $concat)"
  }

  /** Hamming distance between two simhash values (bit-count of xor). */
  def hamming(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { p =>
      shiftright(a.bitwiseXOR(b), p).bitwiseAND(lit(1L))
    }.reduceLeft(_ + _)
}
