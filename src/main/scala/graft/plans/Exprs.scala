package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with doGenCode) for graft's hot paths.
  *
  * Why these exist: Spark's higher-order functions (transform / aggregate /
  * zip_with) are CodegenFallback — each element evaluation goes through an
  * interpreted closure. The text/vector pipeline folds over every character
  * / token / vector component, so the HOF forms dominated scan time. These
  * expressions generate a single call into Kernels (plain JIT'd loops)
  * inside whole-stage codegen, preserving bit-identical results (specs
  * assert equivalence; the DuckDB oracles keep hash-matching).
  *
  * This is the brief's preference order in action: native Expression with
  * doGenCode, not a Scala UDF (no encoder boundary, null-safety and
  * codegen integration for free).
  */
object Exprs {

  /** TextFunctions.charHash as a native expression. */
  case class CharHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_char_hash"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.charHash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.charHash($c)")
    override protected def withNewChildInternal(newChild: Expression): CharHash =
      copy(child = newChild)
  }

  /** Content-defined chunk codes (Kernels.cdcChunkCodes), one native
    * pass: rolling-window cut rule + per-chunk hash·2^20+len codes. */
  case class CdcChunkCodes(child: Expression, window: Int, maskBits: Int)
      extends UnaryExpression {
    require(window >= 2 && maskBits >= 1 && maskBits <= 62)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_cdc_chunk_codes"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.cdcChunkCodes(input.asInstanceOf[UTF8String], window, maskBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.plans.Kernels.cdcChunkCodes($c, $window, $maskBits)")
    override protected def withNewChildInternal(newChild: Expression): CdcChunkCodes =
      copy(child = newChild)
  }

  /** Whitespace tokens -> charHash codes, one native pass. */
  case class TokenCodes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_token_codes"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.tokenCodes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.tokenCodes($c)")
    override protected def withNewChildInternal(newChild: Expression): TokenCodes =
      copy(child = newChild)
  }

  /** k-component MinHash signature over token codes. */
  case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
      extends UnaryExpression {
    require(as.length == bs.length && as.nonEmpty)
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "graft_minhash_sig"
    @transient private lazy val aArr = as.toArray
    @transient private lazy val bArr = bs.toArray
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashSig(input.asInstanceOf[ArrayData], aArr, bArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.minhashSig($c, $aRef, $bRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** Xorshift spread of sub-2^30 token codes onto 60 bits (see
    * [[Kernels.widenCode]]) — the code-width stage under wide SimHashes. */
  case class WidenCodes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_widen_codes"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.widenCodes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.widenCodes($c)")
    override protected def withNewChildInternal(newChild: Expression): WidenCodes =
      copy(child = newChild)
  }

  /** bits-bit SimHash over token codes, one pass for all bits. */
  case class SimHash(child: Expression, bits: Int)
      extends UnaryExpression {
    require(bits > 0 && bits <= 63)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.simhash(input.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.simhash($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression): SimHash =
      copy(child = newChild)
  }

  /** Strict-fold dot product of two float-array columns (as double). */
  case class DotFold(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.dot($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotFold =
      copy(left = newLeft, right = newRight)
  }

  /** Dot of a float-array column against constant weights (LSH planes). */
  case class DotConst(child: Expression, weights: Seq[Double])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot_const"
    @transient private lazy val wArr = weights.toArray
    override protected def nullSafeEval(input: Any): Any =
      Kernels.dotConst(input.asInstanceOf[ArrayData], wArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("dotW", wArr, "double[]")
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.dotConst($c, $wRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): DotConst =
      copy(child = newChild)
  }

  /** Top-k nearest centroid ids (squared-L2, cid tie) of a float-array
    * column against a constant centroid codebook — the IVF/SemDeDup
    * assignment as one codegen'd scan call (see
    * [[Kernels.centroidProbes]] for the bit-identity argument). */
  case class CentroidProbes(child: Expression, cents: Seq[Seq[Float]], k: Int)
      extends UnaryExpression {
    require(k >= 1 && cents.nonEmpty, "centroidProbes needs k >= 1 and centroids")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_centroid_probes"
    @transient private lazy val cArr: Array[Array[Float]] =
      cents.map(_.toArray).toArray
    @transient private lazy val ccArr: Array[Double] =
      cArr.map { c =>
        var acc = 0.0
        var i = 0
        while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
        acc
      }
    override protected def nullSafeEval(input: Any): Any =
      Kernels.centroidProbes(input.asInstanceOf[ArrayData], cArr, ccArr, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("cpCents", cArr, "float[][]")
      val ccRef = ctx.addReferenceObj("cpCc", ccArr, "double[]")
      defineCodeGen(ctx, ev,
        c => s"graft.plans.Kernels.centroidProbes($c, $cRef, $ccRef, $k)")
    }
    override protected def withNewChildInternal(newChild: Expression): CentroidProbes =
      copy(child = newChild)
  }

  /** Count of |distinct(a) ∩ distinct(b)| over string arrays. */
  case class IntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_intersect_size"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.intersectSize($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): IntersectSize =
      copy(left = newLeft, right = newRight)
  }

  /** Sorted distinct 64-bit bigram-gram hashes of a text (one pass). */
  case class SortedGramHashes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_sorted_gram_hashes"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.sortedGramHashes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.sortedGramHashes($c)")
    override protected def withNewChildInternal(newChild: Expression): SortedGramHashes =
      copy(child = newChild)
  }

  /** Sorted distinct n-token shingle hashes of a text (one pass). */
  case class SortedNgramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "ngram size must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_sorted_ngram_hashes"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.sortedNgramHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.sortedNgramHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): SortedNgramHashes =
      copy(child = newChild)
  }

  /** Hilbert-curve index of quantized (x, y) grid coordinates. */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbert_index"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.hilbertIndex(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.hilbertIndex($a, $b, $bits)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HilbertIndex =
      copy(left = newLeft, right = newRight)
  }

  /** |a ∩ b| for sorted distinct long arrays (two-pointer merge). */
  case class SortedIntersectSizeLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sorted_intersect_size_long"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sortedIntersectSizeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.sortedIntersectSizeLong($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectSizeLong =
      copy(left = newLeft, right = newRight)
  }

  /** |a ∩ b| for SORTED distinct string arrays (two-pointer merge). */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sorted_intersect_size"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.sortedIntersectSize($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectSize =
      copy(left = newLeft, right = newRight)
  }

  /** Non-overlapping literal-substring counts, all patterns in one scan. */
  case class SubstringCounts(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty literals")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_substring_counts"
    @transient private lazy val pArr = patterns.toArray
    override protected def nullSafeEval(input: Any): Any =
      Kernels.substringCounts(input.asInstanceOf[UTF8String], pArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("subPats", pArr, "java.lang.String[]")
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.substringCounts($c, $pRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): SubstringCounts =
      copy(child = newChild)
  }

  /** Character-entropy (bits/char) over an ASCII alphabet — ONE scan with
    * a lookup table plus the oracle's exact fold, replacing an
    * element_at-per-symbol column tree whose 37 array references
    * re-evaluated the counting scan per symbol. */
  case class CharEntropy(child: Expression, alphabet: Seq[String])
      extends UnaryExpression {
    require(alphabet.nonEmpty &&
      alphabet.forall(c => c.length == 1 && c.charAt(0) < 128),
      "alphabet must be single ASCII characters")
    require(alphabet.distinct == alphabet, "alphabet must be distinct")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_char_entropy"
    @transient private lazy val lut: Array[Int] = {
      val t = Array.fill(128)(-1)
      alphabet.zipWithIndex.foreach { case (c, i) => t(c.charAt(0).toInt) = i }
      t
    }
    override protected def nullSafeEval(input: Any): Any =
      Kernels.charEntropyBits(input.asInstanceOf[UTF8String], lut, alphabet.length)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lutRef = ctx.addReferenceObj("entropyLut", lut, "int[]")
      defineCodeGen(ctx, ev,
        c => s"graft.plans.Kernels.charEntropyBits($c, $lutRef, ${alphabet.length})")
    }
    override protected def withNewChildInternal(newChild: Expression): CharEntropy =
      copy(child = newChild)
  }

  /** Per-set token membership counts, all sets in one pass. */
  case class MemberCounts(child: Expression, sets: Seq[Seq[String]])
      extends UnaryExpression {
    require(sets.nonEmpty && sets.forall(_.nonEmpty), "sets must be non-empty")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_member_counts"
    @transient private lazy val sArr: Array[Array[UTF8String]] =
      sets.map(_.map(UTF8String.fromString).toArray).toArray
    override protected def nullSafeEval(input: Any): Any =
      Kernels.memberCounts(input.asInstanceOf[ArrayData], sArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sRef = ctx.addReferenceObj("memberSets", sArr,
        "org.apache.spark.unsafe.types.UTF8String[][]")
      defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.memberCounts($c, $sRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): MemberCounts =
      copy(child = newChild)
  }

  /** Even-odd ray-cast point-in-polygon with a plan-time polygon. Unlike
    * the one-when-per-edge Column tree (which blows the codegen method
    * limit on multi-thousand-vertex AOIs), this generates one call with
    * the edges as reference arrays — constant code size at any vertex
    * count. */
  case class PointInPolygon(left: Expression, right: Expression,
                            poly: Seq[(Double, Double)])
      extends BinaryExpression {
    require(poly.length >= 3, "polygon needs >= 3 vertices")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_point_in_polygon"

    // non-horizontal edges, in vertex order (horizontal edges never flip
    // ray parity — and skipping them keeps the division well-defined)
    @transient private lazy val (exi, eyi, exj, eyj) = {
      val es = poly.indices.map(i => (poly(i), poly((i + 1) % poly.length)))
        .filter { case ((_, a), (_, b)) => a != b }
      (es.map(_._1._1).toArray, es.map(_._1._2).toArray,
        es.map(_._2._1).toArray, es.map(_._2._2).toArray)
    }

    override protected def nullSafeEval(x: Any, y: Any): Any =
      Kernels.pointInPolygon(x.asInstanceOf[Double], y.asInstanceOf[Double],
        exi, eyi, exj, eyj)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xiR = ctx.addReferenceObj("pipXi", exi, "double[]")
      val yiR = ctx.addReferenceObj("pipYi", eyi, "double[]")
      val xjR = ctx.addReferenceObj("pipXj", exj, "double[]")
      val yjR = ctx.addReferenceObj("pipYj", eyj, "double[]")
      defineCodeGen(ctx, ev, (x, y) =>
        s"graft.plans.Kernels.pointInPolygon($x, $y, $xiR, $yiR, $xjR, $yjR)")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PointInPolygon =
      copy(left = newLeft, right = newRight)
  }

  /** Jaro–Winkler similarity of two strings (Kernels.jaroWinkler —
    * DuckDB-parity semantics for the record-linkage verify face). */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.jaroWinkler($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  // --- UTM (r12): one static call per transform instead of the inlined
  // Column series — the round-trip's generated code blew janino's 64 KB
  // method ceiling and Spark silently ran the stage INTERPRETED. Results
  // are bit-identical to the Column trees (Kernels transcribes them
  // operation for operation); the DuckDB oracle faces are untouched.

  /** UTM forward easting(lon, lat) in meters (Kernels.utmEasting).
    * ImplicitCastInputTypes on the whole UTM family: the static Kernels
    * calls unbox with hard casts, and without declared input types an
    * IntegerType argument works under codegen (Java widens) but throws
    * ClassCastException in interpreted eval — analysis-inserted casts
    * keep both paths identical. */
  case class UtmEasting(left: Expression, right: Expression,
                        a: Double, e2: Double)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[org.apache.spark.sql.graftbridge.PlanBridge.AbstractType] = Seq(DoubleType, DoubleType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_utm_easting"
    override protected def nullSafeEval(lon: Any, lat: Any): Any =
      Kernels.utmEasting(lon.asInstanceOf[Double], lat.asInstanceOf[Double], a, e2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (x, y) => s"graft.plans.Kernels.utmEasting($x, $y, ${a}D, ${e2}D)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): UtmEasting =
      copy(left = newLeft, right = newRight)
  }

  /** UTM forward northing(lon, lat) in meters (Kernels.utmNorthing). */
  case class UtmNorthing(left: Expression, right: Expression,
                         a: Double, e2: Double)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[org.apache.spark.sql.graftbridge.PlanBridge.AbstractType] = Seq(DoubleType, DoubleType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_utm_northing"
    override protected def nullSafeEval(lon: Any, lat: Any): Any =
      Kernels.utmNorthing(lon.asInstanceOf[Double], lat.asInstanceOf[Double], a, e2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (x, y) => s"graft.plans.Kernels.utmNorthing($x, $y, ${a}D, ${e2}D)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): UtmNorthing =
      copy(left = newLeft, right = newRight)
  }

  /** UTM inverse longitude(easting, northing, zone, south) in degrees. */
  /** Conformal latitude (radians) from the isometric auxiliary t —
    * Snyder eq. 7-9 fixed-iteration ([[Kernels.conformalLat]]); the
    * inverse-latitude primitive LCC and polar stereographic share. */
  case class ConformalLat(child: Expression, e: Double, iters: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[org.apache.spark.sql.graftbridge.PlanBridge.AbstractType] =
      Seq(DoubleType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_conformal_lat"
    override def nullSafeEval(t: Any): Any =
      Kernels.conformalLat(t.asInstanceOf[Double], e, iters)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.plans.Kernels.conformalLat($c, ${e}D, $iters)")
    override protected def withNewChildInternal(newChild: Expression): ConformalLat =
      copy(child = newChild)
  }

  /** Equal-area latitude (radians) from the Albers auxiliary q — Snyder
    * eq. 3-16 fixed Newton iteration ([[Kernels.albersLat]]). */
  case class AlbersLat(child: Expression, e: Double, e2: Double, iters: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[org.apache.spark.sql.graftbridge.PlanBridge.AbstractType] =
      Seq(DoubleType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_albers_lat"
    override def nullSafeEval(q: Any): Any =
      Kernels.albersLat(q.asInstanceOf[Double], e, e2, iters)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.plans.Kernels.albersLat($c, ${e}D, ${e2}D, $iters)")
    override protected def withNewChildInternal(newChild: Expression): AlbersLat =
      copy(child = newChild)
  }

  case class UtmInvLon(first: Expression, second: Expression,
                       third: Expression, fourth: Expression,
                       a: Double, e2: Double)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[org.apache.spark.sql.graftbridge.PlanBridge.AbstractType] =
      Seq(DoubleType, DoubleType, LongType, BooleanType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_utm_inv_lon"
    override def nullSafeEval(e: Any, n: Any, z: Any, s: Any): Any =
      Kernels.utmInvLon(e.asInstanceOf[Double], n.asInstanceOf[Double],
        z.asInstanceOf[Long], s.asInstanceOf[Boolean], a, e2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (e, n, z, s) =>
        s"graft.plans.Kernels.utmInvLon($e, $n, $z, $s, ${a}D, ${e2}D)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): UtmInvLon =
      copy(first = f, second = s, third = t, fourth = q)
  }

  /** UTM inverse latitude(easting, northing, zone, south) in degrees. */
  case class UtmInvLat(first: Expression, second: Expression,
                       third: Expression, fourth: Expression,
                       a: Double, e2: Double)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[org.apache.spark.sql.graftbridge.PlanBridge.AbstractType] =
      Seq(DoubleType, DoubleType, LongType, BooleanType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_utm_inv_lat"
    override def nullSafeEval(e: Any, n: Any, z: Any, s: Any): Any =
      Kernels.utmInvLat(e.asInstanceOf[Double], n.asInstanceOf[Double],
        z.asInstanceOf[Long], s.asInstanceOf[Boolean], a, e2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (e, n, z, s) =>
        s"graft.plans.Kernels.utmInvLat($e, $n, $z, $s, ${a}D, ${e2}D)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): UtmInvLat =
      copy(first = f, second = s, third = t, fourth = q)
  }
}
