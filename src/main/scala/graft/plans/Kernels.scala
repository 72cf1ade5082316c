package graft.plans

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native expressions in Exprs.scala. Generated code
  * calls these statics directly, so the hot loops run as plain JIT'd JVM
  * loops instead of Catalyst's interpreted higher-order-function machinery
  * (ArrayAggregate/ArrayTransform are CodegenFallback — every fold under
  * them is an interpreted per-element closure call).
  *
  * Every kernel reproduces the EXACT arithmetic of the Column/SQL form it
  * replaces (same fold order, same IEEE operation tree), so the DuckDB
  * oracles keep hash-matching bit-for-bit.
  */
object Kernels {

  val P: Long = 1000000007L

  /** Strict left fold (acc*31 + char) % P — TextFunctions.charHash.
    * UTF-16 code units match ascii() codepoints for ASCII payloads (the
    * documents corpus); astral-plane text would need codePointAt. */
  def charHash(s: UTF8String): Long = {
    val str = s.toString
    var a = 0L
    var i = 0
    while (i < str.length) {
      a = (a * 31L + str.charAt(i).toLong) % P
      i += 1
    }
    a
  }

  /** Per-token charHash codes; split semantics match Spark's split(s, " ")
    * (regex split with limit -1: trailing empties kept). */
  def tokenCodes(s: UTF8String): ArrayData = {
    val parts = s.toString.split(" ", -1)
    val out = new Array[Long](parts.length)
    var i = 0
    while (i < parts.length) {
      var a = 0L
      val t = parts(i)
      var j = 0
      while (j < t.length) {
        a = (a * 31L + t.charAt(j).toLong) % P
        j += 1
      }
      out(i) = a
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-component MinHash: min((a_j * code + b_j) % P) per component, one
    * pass over the codes. Empty input yields all-null components (the
    * array_min-of-empty behavior of the HOF form). */
  def minhashSig(codes: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = codes.numElements()
    val k = as.length
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val c = codes.getLong(i)
      var j = 0
      while (j < k) {
        val h = (c * as(j) + bs(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** GF(2)-linear xorshift spread of a sub-2^30 token code onto 60 bits:
    * every output bit is an XOR of a distinct nonempty subset of input
    * bits, so widened codes of distinct inputs stay distinct and each of
    * the 60 simhash vote bits carries real signal — charHash codes live
    * below 2^30, where bits 30+ of a plain simhash are vote-constant
    * (the r10 sf1 audit's 30-bit code-width ceiling). Shift amounts keep
    * every intermediate below 2^61, so the identical expression is
    * overflow-free BIGINT arithmetic on the DuckDB side (which errors on
    * int64 overflow where the JVM wraps). */
  def widenCode(x: Long): Long = {
    val a = x ^ (x << 13)
    val b = a ^ (a >>> 7)
    val w = b ^ (b << 17)
    // fold the low half onto bits 30..59: without this, output bits
    // 53..59 are PLAIN copies of input bits 23..29 (the xorshift's top
    // bits clear the mixing stages), and a corpus whose token-hash high
    // bits are vote-biased gets near-dead top-band keys
    w ^ ((w & 0x3FFFFFFFL) << 30)
  }

  /** [[widenCode]] over a code array, one pass. */
  def widenCodes(codes: ArrayData): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = widenCode(codes.getLong(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** bits-bit SimHash: one pass accumulating all per-bit +1/-1 votes. */
  def simhash(codes: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = codes.numElements()
    var i = 0
    while (i < n) {
      val c = codes.getLong(i)
      var p = 0
      while (p < bits) {
        votes(p) += ((c >> p) & 1L) * 2L - 1L
        p += 1
      }
      i += 1
    }
    var h = 0L
    var p = 0
    while (p < bits) {
      if (votes(p) > 0) h |= 1L << p
      p += 1
    }
    h
  }

  /** Strict ascending-index dot product of two float arrays in double —
    * identical accumulation order to the zip_with+aggregate fold. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft dot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Dot of a float array against constant double weights. */
  def dotConst(a: ArrayData, w: Array[Double]): Double = {
    val n = a.numElements()
    if (w.length != n)
      throw new IllegalArgumentException(
        s"graft dot: length mismatch ${n} vs ${w.length}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * w(i)
      i += 1
    }
    acc
  }

  /** Top-`k` nearest centroid ids of float vector `v` by squared-L2
    * (tie: lower cid) in ONE scan-stage pass — the IVF/SemDeDup
    * assignment without the crossJoin-with-centroids row explosion
    * (n·|centroids| rows through a per-vector rank window stops being
    * viable once the centroid count is corpus-derived). Arithmetic is
    * the EXACT column tree it replaces, term for term: dist =
    * dot(v,v) − 2·dot(v,c) + dot(c,c) with each dot the strict
    * left-fold of per-index double products, and `cc(j)` precomputed
    * with that same fold — so assignments are bit-identical to the
    * crossJoin + row_number form (spec-proven) and to the DuckDB
    * oracle. k is tiny (1–4): selection is insertion into k slots. */
  def centroidProbes(v: ArrayData, cents: Array[Array[Float]],
                     cc: Array[Double], k: Int): ArrayData = {
    val d = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < d) {
      val x = v.getFloat(i).toDouble
      vv += x * x
      i += 1
    }
    val nC = cents.length
    val topDist = new Array[Double](k)
    val topCid = new Array[Int](k)
    var filled = 0
    var j = 0
    while (j < nC) {
      val c = cents(j)
      var vc = 0.0
      i = 0
      while (i < d) {
        vc += v.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      val dist = vv - 2.0 * vc + cc(j)
      // insert (dist, j) if it beats the current k-th; cid tie-break is
      // free — j ascends, so equal dists never displace an earlier cid
      if (filled < k || dist < topDist(filled - 1)) {
        var pos = math.min(filled, k - 1)
        while (pos > 0 && topDist(pos - 1) > dist) {
          topDist(pos) = topDist(pos - 1)
          topCid(pos) = topCid(pos - 1)
          pos -= 1
        }
        topDist(pos) = dist
        topCid(pos) = j
        if (filled < k) filled += 1
      }
      j += 1
    }
    val out = new Array[Long](filled)
    i = 0
    while (i < filled) { out(i) = topCid(i).toLong; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** |distinct(a) ∩ distinct(b)| for string arrays without materializing
    * the intersection array (ArrayIntersect builds it; the Jaccard verify
    * only needs the count). */
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](math.max(4, na * 2))
    var i = 0
    while (i < na) {
      set.add(a.getUTF8String(i))
      i += 1
    }
    var cnt = 0L
    var j = 0
    while (j < nb) {
      if (set.remove(b.getUTF8String(j))) cnt += 1 // remove => count distinct b
      j += 1
    }
    cnt
  }

  /** |a ∩ b| for two SORTED distinct string arrays: a two-pointer merge
    * walk — no per-pair hash-set allocation, no hashing, O(n+m) binary
    * comparisons. Callers sort once per document (array_sort), not once
    * per pair. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  /** Sorted distinct 64-bit hashes of a text's adjacent-token bigrams, in
    * one pass: tokens -> "a b" gram hashes (unreduced 31-polynomial over
    * chars — full 64-bit space, ~2^-64 pairwise collision) -> sort ->
    * dedupe. Counts over these equal counts over the gram strings
    * themselves (what the DuckDB oracle computes) up to that collision
    * probability; the hash VALUES never face the oracle. */
  def sortedGramHashes(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < 2) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      var h = 0L
      val a = toks(i)
      val b = toks(i + 1)
      var j = 0
      while (j < a.length) { h = h * 31L + a.charAt(j); j += 1 }
      h = h * 31L + ' '.toLong
      j = 0
      while (j < b.length) { h = h * 31L + b.charAt(j); j += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var n = 0
    i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, n))
  }

  /** Sorted distinct 64-bit hashes of a text's n-token shingles, one pass
    * (the n-gram generalization of sortedGramHashes; same unreduced
    * 31-polynomial over the space-joined gram chars, ~2^-64 pairwise
    * collision, so joins/counts over these equal joins/counts over the
    * gram strings the oracle computes). Empty for < n tokens. */
  def sortedNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < hs.length) {
      var h = 0L
      var g = 0
      while (g < n) {
        if (g > 0) h = h * 31L + ' '.toLong
        val t = toks(i + g)
        var j = 0
        while (j < t.length) { h = h * 31L + t.charAt(j); j += 1 }
        g += 1
      }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, m))
  }

  /** |a ∩ b| for two sorted distinct long arrays (two-pointer merge). */
  def sortedIntersectSizeLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  /** Non-overlapping occurrence counts of ALL literal patterns in ONE scan
    * of the string (replaces one regexp engine pass per pattern — the
    * lang-ID profile scorer ran 15 of those per row). Per pattern, matches
    * count left-to-right non-overlapping: after a match at i the same
    * pattern can next match at i+len — exactly regexp_count / DuckDB
    * len(regexp_extract_all(...)) semantics for a literal pattern. */
  def substringCounts(s: UTF8String, pats: Array[String]): ArrayData = {
    val str = s.toString
    val k = pats.length
    val counts = new Array[Long](k)
    val nextOk = new Array[Int](k)
    val n = str.length
    var i = 0
    while (i < n) {
      var p = 0
      while (p < k) {
        if (i >= nextOk(p) && str.startsWith(pats(p), i)) {
          counts(p) += 1
          nextOk(p) = i + pats(p).length
        }
        p += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Per-set membership counts over a token array, all sets in one pass
    * (replaces one interpreted HOF filter per marker set — filter() is
    * CodegenFallback). counts(p) = number of tokens (with multiplicity)
    * equal to any word of sets(p) — the size(filter(toks, t IN set))
    * tree both engines compute. */
  def memberCounts(toks: ArrayData, sets: Array[Array[UTF8String]]): ArrayData = {
    val k = sets.length
    val counts = new Array[Long](k)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        var p = 0
        while (p < k) {
          val ws = sets(p)
          var j = 0
          var found = false
          while (!found && j < ws.length) {
            found = ws(j).equals(t)
            j += 1
          }
          if (found) counts(p) += 1
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Even-odd ray cast over precomputed non-horizontal edges; the per-edge
    * test reproduces GeoFunctions.pointInPolygon's expression tree
    * (((xj-xi) * (y-yi)) / (yj-yi) + xi). */
  def pointInPolygon(x: Double, y: Double, xi: Array[Double], yi: Array[Double],
                     xj: Array[Double], yj: Array[Double]): Boolean = {
    var cnt = 0
    var i = 0
    while (i < xi.length) {
      if (((yi(i) > y) != (yj(i) > y)) &&
        x < (xj(i) - xi(i)) * (y - yi(i)) / (yj(i) - yi(i)) + xi(i)) cnt += 1
      i += 1
    }
    (cnt % 2) == 1
  }

  /** Character-level Shannon entropy (bits/char) over a small ASCII
    * alphabet, in ONE pass: count via a 128-entry lookup table, then the
    * exact left-fold the DuckDB oracle runs — sum over alphabet order of
    * -( (c/n) * ln(c/n) ), divided by ln 2 at the end. `n` is the full
    * character length (chars outside the alphabet count toward n but get
    * no term, matching length() on the SQL side). Zero-count symbols are
    * skipped — adding their 0.0 terms is an IEEE no-op, so the fold value
    * is bit-identical either way. */
  def charEntropyBits(s: UTF8String, lut: Array[Int], k: Int): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    val counts = new Array[Long](k)
    var i = 0
    while (i < n) {
      val c = str.charAt(i).toInt
      if (c < 128) {
        val idx = lut(c)
        if (idx >= 0) counts(idx) += 1
      }
      i += 1
    }
    var acc = 0.0
    var p = 0
    while (p < k) {
      if (counts(p) > 0) {
        val pr = counts(p).toDouble / n
        acc += -(pr * java.lang.Math.log(pr))
      }
      p += 1
    }
    acc / java.lang.Math.log(2.0)
  }

  /** Hilbert-curve index of a quantized (x, y) cell on a 2^bits × 2^bits
    * grid — the standard iterative xy2d walk (per level: quadrant digit
    * `(3*rx) xor ry`, then the rotate/flip that keeps curve ends
    * adjacent). All-integer; the unrolled-CTE DuckDB oracle reproduces
    * the identical per-level arithmetic (GeoFunctions.hilbertCtesSql). */
  def hilbertIndex(x: Long, y: Long, bits: Int): Long = {
    var cx = x
    var cy = y
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((cx & s) > 0) 1L else 0L
      val ry = if ((cy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          cx = s - 1 - cx
          cy = s - 1 - cy
        }
        val t = cx; cx = cy; cy = t
      }
      s >>= 1
    }
    d
  }

  /** Content-defined chunk codes (Rabin-style CDC, the rsync/LBFS cut
    * rule): a chunk boundary falls after 1-based position i (i ≥ w)
    * whenever the rolling charHash of the last `w` characters is ≡ 0
    * mod 2^maskBits; each chunk emits `charHash(chunk)·2^20 + len`.
    * ONE pass: the window hash rolls (subtract the outgoing char's
    * 31^(w−1) term, shift, add), the chunk hash accumulates since the
    * last cut — both stay in the exact arithmetic of the O(n·w) oracle
    * form (same fold, same mod), so codes hash-match bit-for-bit.
    * A cut is FORCED once a chunk reaches [[CdcMaxChunkLen]] chars (the
    * standard CDC max bound): a cut-free run (e.g. long repeated
    * content whose rolling hash never hits the mask) bounds the chunk
    * instead of aborting the job, and the length bits can never alias
    * into the hash term of the `hash·2^20 + len` code. The SQL twin
    * applies the identical bound, so codes still match bit-for-bit.
    * (Production CDC would add a min bound too; not needed for the
    * exact-oracle core.) */
  val CdcMaxChunkLen = 65536

  def cdcChunkCodes(s: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val t = s.toString
    val n = t.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mask = (1L << maskBits) - 1L
    var pw = 1L
    var k = 0
    while (k < w - 1) { pw = pw * 31L % P; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var rh = 0L
    var ch = 0L
    var chunkStart = 0
    var i = 0
    while (i < n) {
      val c = t.charAt(i).toLong
      ch = (ch * 31L + c) % P
      rh =
        if (i < w) (rh * 31L + c) % P
        else (((rh - t.charAt(i - w).toLong * pw % P + P) % P) * 31L + c) % P
      val isBoundary = i >= w - 1 && (rh & mask) == 0L
      val len = i + 1 - chunkStart
      if (isBoundary || i == n - 1 || len == CdcMaxChunkLen) {
        out += ch * 1048576L + len
        ch = 0L
        chunkStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Jaro–Winkler similarity, matching DuckDB's jaro_winkler_similarity
    * semantics (validated against it case-by-case in JaroWinklerSpec):
    * either side empty → 0; match window max(|a|,|b|)/2 − 1 (floor,
    * clamped ≥ 0); transpositions = mismatches between the two matched
    * sequences, halved with FLOOR (integer division — an odd mismatch
    * count rounds down, DuckDB/RapidFuzz parity); Winkler boost p = 0.1
    * over the common prefix capped at 4, applied only when jaro > 0.7
    * (strict). */
  def jaroWinkler(aS: UTF8String, bS: UTF8String): Double = {
    val a = aS.toString
    val b = bS.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var hit = false
      while (j <= hi && !hit) {
        if (!bM(j) && ca == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var tRaw = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) tRaw += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - (tRaw / 2).toDouble) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(la, lb))
    while (prefix < pMax && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  // --- UTM forward / inverse (Snyder PP 1395 eq. 8-9..8-25) -----------------
  // Why kernels (r12): the inlined Column trees for the UTM round-trip
  // exceed janino's 64 KB method ceiling — Spark logged `Code grows
  // beyond 64 KB` and silently RAN THE STAGE INTERPRETED. Each transform
  // is one static call now, so the scan stage stays inside whole-stage
  // codegen. Arithmetic is transcribed OPERATION FOR OPERATION from the
  // GeoFunctions Column trees (same IEEE order, same java.lang.Math
  // transcendentals Spark codegen itself emits), so results are
  // bit-identical to the Column face and the DuckDB oracles' whole-meter
  // / micro-degree rounding margins are untouched.

  import graft.functions.GeoFunctions.{Deg2Rad, UtmK0, mCoefs}

  /** UTM zone number (1..60) from longitude — GeoFunctions.utmZone. */
  def utmZoneOf(lon: Double): Long =
    math.min(math.floor((lon + 180.0) / 6.0).toLong + 1L, 60L)

  /** Forward easting (meters) — the exact GeoFunctions.utmForward x tree. */
  def utmEasting(lon: Double, lat: Double, a: Double, e2: Double): Double = {
    val ep2 = e2 / (1.0 - e2)
    val lon0 = utmZoneOf(lon).toDouble * 6.0 - 183.0
    val phi = lat * Deg2Rad
    val dlam = (lon - lon0) * Deg2Rad
    val sp = math.sin(phi); val cp = math.cos(phi); val tp = math.tan(phi)
    val nRad = a / math.sqrt(1.0 - e2 * sp * sp)
    val t = tp * tp
    val c = ep2 * cp * cp
    val aa = cp * dlam
    val aa2 = aa * aa; val aa3 = aa2 * aa; val aa4 = aa3 * aa
    val aa5 = aa4 * aa
    UtmK0 * nRad * (aa +
      (1.0 - t + c) * aa3 / 6.0 +
      (5.0 - t * 18.0 + t * t + c * 72.0 - ep2 * 58.0) * aa5 / 120.0) +
      500000.0
  }

  /** Forward northing (meters) — the exact GeoFunctions.utmForward y tree. */
  def utmNorthing(lon: Double, lat: Double, a: Double, e2: Double): Double = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, m2, m4, m6) = mCoefs(e2)
    val lon0 = utmZoneOf(lon).toDouble * 6.0 - 183.0
    val phi = lat * Deg2Rad
    val dlam = (lon - lon0) * Deg2Rad
    val sp = math.sin(phi); val cp = math.cos(phi); val tp = math.tan(phi)
    val nRad = a / math.sqrt(1.0 - e2 * sp * sp)
    val t = tp * tp
    val c = ep2 * cp * cp
    val aa = cp * dlam
    val m = a * (m0 * phi - m2 * math.sin(phi * 2.0) +
      m4 * math.sin(phi * 4.0) - m6 * math.sin(phi * 6.0))
    val aa2 = aa * aa; val aa3 = aa2 * aa; val aa4 = aa3 * aa
    val aa5 = aa4 * aa; val aa6 = aa5 * aa
    UtmK0 * (m + nRad * tp * (aa2 / 2.0 +
      (5.0 - t + c * 9.0 + c * c * 4.0) * aa4 / 24.0 +
      (61.0 - t * 58.0 + t * t + c * 600.0 - ep2 * 330.0) * aa6 / 720.0)) +
      (if (lat < 0.0) 10000000.0 else 0.0)
  }

  /** Inverse longitude (degrees) — the exact GeoFunctions.utmInverse tree. */
  def utmInvLon(easting: Double, northing: Double, zone: Long,
                south: Boolean, a: Double, e2: Double): Double = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, _, _, _) = mCoefs(e2)
    val sq1e = math.sqrt(1.0 - e2)
    val e1 = (1.0 - sq1e) / (1.0 + sq1e)
    val j2 = 3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0
    val j4 = 21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0
    val j6 = 151.0 * e1 * e1 * e1 / 96.0
    val j8 = 1097.0 * e1 * e1 * e1 * e1 / 512.0
    val lon0 = zone.toDouble * 6.0 - 183.0
    val xp = (easting - 500000.0) / UtmK0
    val yp = (northing - (if (south) 10000000.0 else 0.0)) / UtmK0
    val mu = yp / (a * m0)
    val phi1 = mu + j2 * math.sin(mu * 2.0) + j4 * math.sin(mu * 4.0) +
      j6 * math.sin(mu * 6.0) + j8 * math.sin(mu * 8.0)
    val sp = math.sin(phi1); val cp = math.cos(phi1); val tp = math.tan(phi1)
    val w = 1.0 - e2 * sp * sp
    val n1 = a / math.sqrt(w)
    val t1 = tp * tp
    val c1 = ep2 * cp * cp
    val d = xp / n1
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d
    val d5 = d4 * d
    val lam = (d - (1.0 + t1 * 2.0 + c1) * d3 / 6.0 +
      (5.0 - c1 * 2.0 + t1 * 28.0 - c1 * c1 * 3.0 +
        ep2 * 8.0 + t1 * t1 * 24.0) * d5 / 120.0) / cp
    lon0 + lam / Deg2Rad
  }

  /** Inverse latitude (degrees) — the exact GeoFunctions.utmInverse tree. */
  def utmInvLat(easting: Double, northing: Double, zone: Long,
                south: Boolean, a: Double, e2: Double): Double = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, _, _, _) = mCoefs(e2)
    val sq1e = math.sqrt(1.0 - e2)
    val e1 = (1.0 - sq1e) / (1.0 + sq1e)
    val j2 = 3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0
    val j4 = 21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0
    val j6 = 151.0 * e1 * e1 * e1 / 96.0
    val j8 = 1097.0 * e1 * e1 * e1 * e1 / 512.0
    val xp = (easting - 500000.0) / UtmK0
    val yp = (northing - (if (south) 10000000.0 else 0.0)) / UtmK0
    val mu = yp / (a * m0)
    val phi1 = mu + j2 * math.sin(mu * 2.0) + j4 * math.sin(mu * 4.0) +
      j6 * math.sin(mu * 6.0) + j8 * math.sin(mu * 8.0)
    val sp = math.sin(phi1); val cp = math.cos(phi1); val tp = math.tan(phi1)
    val w = 1.0 - e2 * sp * sp
    val n1 = a / math.sqrt(w)
    val r1 = (a * (1.0 - e2)) / (w * math.sqrt(w))
    val t1 = tp * tp
    val c1 = ep2 * cp * cp
    val d = xp / n1
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d
    val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tp / r1) * (d2 / 2.0 -
      (5.0 + t1 * 3.0 + c1 * 10.0 - c1 * c1 * 4.0 - ep2 * 9.0) * d4 / 24.0 +
      (61.0 + t1 * 90.0 + c1 * 298.0 + t1 * t1 * 45.0 -
        ep2 * 252.0 - c1 * c1 * 3.0) * d6 / 720.0)
    phi / Deg2Rad
  }

  /** Latitude (radians) from the conformal auxiliary t (Snyder eq. 7-9
    * iterated a FIXED `iters` times — deterministic, oracle-unrollable;
    * linear rate ~e², so 5 iterations land < 1e-13 rad for Earth
    * eccentricities). The shared inverse-latitude primitive of the
    * conformal family: LCC and polar stereographic. */
  def conformalLat(t: Double, e: Double, iters: Int): Double = {
    var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
    var i = 0
    while (i < iters) {
      val sp = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        t * math.pow((1.0 - e * sp) / (1.0 + e * sp), e / 2.0))
      i += 1
    }
    phi
  }

  /** Latitude (radians) from the equal-area auxiliary q (Snyder eq.
    * 3-16 Newton-iterated a FIXED `iters` times; quadratic convergence
    * — 4 iterations land < 1e-13 rad inside the conic validity domain).
    * The Albers inverse-latitude primitive. */
  def albersLat(q: Double, e: Double, e2: Double, iters: Int): Double = {
    var phi = math.asin(q / 2.0)
    var i = 0
    while (i < iters) {
      val sp = math.sin(phi)
      val cp = math.cos(phi)
      val om = 1.0 - e2 * sp * sp
      phi = phi + om * om / (2.0 * cp) * (q / (1.0 - e2) - sp / om +
        (1.0 / (2.0 * e)) * math.log((1.0 - e * sp) / (1.0 + e * sp)))
      i += 1
    }
    phi
  }
}
