package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

/** Geometry helpers. gedixr builds shapely Points and intersects them with
  * AOI polygons (reference: gedixr/extract.py:166-184, ancillary.py:121-154).
  * graft keeps geometry as plain numeric columns + WKT strings so every geo
  * predicate is a pure Column expression tree: no UDFs, fully inside
  * WholeStageCodegen, and bbox predicates push down to parquet row-group
  * statistics — which is what makes spatial subsetting viable at 100 TB.
  */
object GeoFunctions {

  /** WKT point string from x/y — ref extract.py:166-168 (Point(lon, lat)).
    * Fixed 6-decimal formatting keeps the string deterministic. */
  def stPointWkt(x: Column, y: Column): Column =
    format_string("POINT (%.6f %.6f)", x, y)

  /** bbox = (xmin, xmax, ymin, ymax). Range predicates — these push all the
    * way into the parquet scan (row-group skipping). */
  def inBbox(x: Column, y: Column, bbox: (Double, Double, Double, Double)): Column = {
    val (xmin, xmax, ymin, ymax) = bbox
    x.between(xmin, xmax) && y.between(ymin, ymax)
  }

  /** General even-odd ray-cast point-in-polygon (ref extract.py:177
    * `gdf.intersects(geo)` for point-vs-polygon). The polygon is a
    * plan-time constant — the moral equivalent of gedixr holding the
    * shapely polygon in memory. Backed by the native codegen'd expression
    * (graft.plans.Exprs.PointInPolygon): the edges travel as reference
    * arrays, so generated code size is constant in vertex count — a
    * realistic multi-thousand-vertex AOI cannot blow the 64KB codegen
    * method limit the way a one-when-per-edge Column tree does
    * (pointInPolygonColumnTree, kept for the equivalence spec).
    * Horizontal edges never flip ray parity and are skipped. Works for
    * concave polygons. */
  def pointInPolygon(x: Column, y: Column, poly: Seq[(Double, Double)]): Column =
    org.apache.spark.sql.graftbridge.PlanBridge.column(
      graft.plans.Exprs.PointInPolygon(
        org.apache.spark.sql.graftbridge.PlanBridge.expression(x.cast("double")),
        org.apache.spark.sql.graftbridge.PlanBridge.expression(y.cast("double")),
        poly))

  /** The original one-when-per-edge Column form (spec oracle). */
  def pointInPolygonColumnTree(x: Column, y: Column, poly: Seq[(Double, Double)]): Column = {
    val crossings = edges(poly).map { case ((xi, yi), (xj, yj)) =>
      val cond = (lit(yi) > y) =!= (lit(yj) > y)
      val xcross = lit(xj - xi) * (y - lit(yi)) / lit(yj - yi) + lit(xi)
      when(cond && (x < xcross), 1).otherwise(0)
    }
    (crossings.reduce(_ + _) % 2) === 1
  }

  /** ANSI SQL for the identical ray-cast (same literals, same operation
    * tree → bit-identical IEEE doubles in any engine). Used to generate
    * the DuckDB oracle for the PIP query. */
  def pointInPolygonSql(xExpr: String, yExpr: String, poly: Seq[(Double, Double)]): String = {
    val terms = edges(poly).map { case ((xi, yi), (xj, yj)) =>
      s"(CASE WHEN (($yi > $yExpr) <> ($yj > $yExpr)) AND " +
        s"($xExpr < ((${xj - xi} * ($yExpr - $yi)) / ${yj - yi} + $xi)) " +
        "THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2) = 1"
  }

  private def edges(poly: Seq[(Double, Double)]): Seq[((Double, Double), (Double, Double))] =
    poly.indices.map(i => (poly(i), poly((i + 1) % poly.length)))
      .filter { case ((_, yi), (_, yj)) => yi != yj }

  /** Web-mercator forward transform (gedixr normalizes CRS via geopandas
    * `to_crs` — ancillary.py:146-147). Uses transcendentals, so it is
    * tolerance-tested in specs rather than hash-checked against the oracle
    * (libm last-ulp differences across engines). */
  def webMercator(lon: Column, lat: Column): (Column, Column) = {
    val k = 20037508.342789244
    (lon * k / 180.0,
      log(tan((lit(90.0) + lat) * (math.Pi / 360.0))) * k / math.Pi)
  }

  /** Equirectangular metric approximation — pure multiplications, so
    * bit-stable across engines (used by the oracle-checked CRS query). */
  def metricApprox(lon: Column, lat: Column): (Column, Column) =
    (lon * 111320.0, lat * 110540.0)

  // --- UTM transverse mercator (general CRS transform) ----------------------
  // gedixr reprojects AOIs/points to arbitrary EPSG via geopandas `to_crs`
  // (reference: gedixr/ancillary.py:146-147); the overwhelmingly common
  // target for GEDI work is a UTM zone. This is the classic Snyder
  // forward series (Map Projections — A Working Manual, USGS PP 1395,
  // p. 61, eq. 8-9..8-15): pure Column arithmetic + sin/cos/tan, fully
  // codegen'd, no UDF — a 100 TB reprojection is a narrow map over the
  // scan. Zone + central meridian derive from lon per row, so one pass
  // handles a world-spanning table (gedixr picks one zone per AOI;
  // per-row zoning is the generalization that needs no driver loop).
  //
  // Engine parity: the series uses transcendentals, whose last ulp may
  // differ across libm implementations, so the ORACLE-face of this
  // transform emits whole-meter integers (round-then-cast) — ~1e-9 m of
  // cross-engine noise against 0.5 m of rounding headroom — while the
  // Column face keeps full doubles for analytics use. Validity domain is
  // the UTM spec's lat ∈ [-80, 84]; callers filter (the query does).

  /** WGS84 semi-major axis / first eccentricity squared. */
  val Wgs84A: Double = 6378137.0
  val Wgs84E2: Double = { val f = 1.0 / 298.257223563; f * (2.0 - f) }
  private[graft] val Deg2Rad = 0.017453292519943295 // closest double to pi/180
  private[graft] val UtmK0 = 0.9996

  /** Meridional-arc series coefficients for eccentricity² `e2`. */
  private[graft] def mCoefs(e2: Double): (Double, Double, Double, Double) = {
    val e4 = e2 * e2; val e6 = e4 * e2
    (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0,
      3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0,
      15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0,
      35.0 * e6 / 3072.0)
  }

  /** UTM zone number (1..60) from longitude. */
  def utmZone(lon: Column): Column =
    least(floor((lon + 180.0) / 6.0).cast("long") + 1L, lit(60L))

  /** Forward UTM easting/northing (meters, full doubles) for a point and
    * its per-row zone; southern-hemisphere rows get the 10,000,000 m
    * false northing. `a`/`e2` default to WGS84 — pass e.g. Clarke 1866
    * to reproduce published test vectors.
    *
    * Native since r12: the inlined Column series compiled fine alone,
    * but COMPOSED plans (the round-trip) blew janino's 64 KB method
    * ceiling and Spark silently ran the stage interpreted. Each
    * coordinate is now ONE codegen'd static call
    * (plans.Exprs.UtmEasting/UtmNorthing → Kernels), bit-identical to
    * the Column tree ([[utmForwardColumns]], equivalence spec-pinned). */
  def utmForward(lon: Column, lat: Column,
                 a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val le = PlanBridge.expression(lon)
    val la = PlanBridge.expression(lat)
    (PlanBridge.column(graft.plans.Exprs.UtmEasting(le, la, a, e2)),
      PlanBridge.column(graft.plans.Exprs.UtmNorthing(le, la, a, e2)))
  }

  /** The r11 inlined Column tree of [[utmForward]] — kept as the
    * equivalence reference the spec checks the kernel against. */
  private[graft] def utmForwardColumns(lon: Column, lat: Column,
                 a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, m2, m4, m6) = mCoefs(e2)
    val lon0 = utmZone(lon).cast("double") * 6.0 - 183.0
    val phi = lat * Deg2Rad
    val dlam = (lon - lon0) * Deg2Rad
    val sp = sin(phi); val cp = cos(phi); val tp = tan(phi)
    val nRad = lit(a) / sqrt(lit(1.0) - lit(e2) * sp * sp)
    val t = tp * tp
    val c = lit(ep2) * cp * cp
    val aa = cp * dlam
    val m = lit(a) * (lit(m0) * phi - lit(m2) * sin(phi * 2.0) +
      lit(m4) * sin(phi * 4.0) - lit(m6) * sin(phi * 6.0))
    val aa2 = aa * aa; val aa3 = aa2 * aa; val aa4 = aa3 * aa
    val aa5 = aa4 * aa; val aa6 = aa5 * aa
    val x = lit(UtmK0) * nRad * (aa +
      (lit(1.0) - t + c) * aa3 / 6.0 +
      (lit(5.0) - t * 18.0 + t * t + c * 72.0 - ep2 * 58.0) * aa5 / 120.0) +
      500000.0
    val y = lit(UtmK0) * (m + nRad * tp * (aa2 / 2.0 +
      (lit(5.0) - t + c * 9.0 + c * c * 4.0) * aa4 / 24.0 +
      (lit(61.0) - t * 58.0 + t * t + c * 600.0 - ep2 * 330.0) * aa6 / 720.0)) +
      when(lat < 0.0, 10000000.0).otherwise(0.0)
    (x, y)
  }

  /** Inverse UTM (Snyder PP 1395 eq. 8-16..8-25): easting/northing +
    * zone + hemisphere back to lon/lat degrees — the other direction of
    * `to_crs`. Footprint-latitude rectifying series then the standard
    * D-power corrections; pure Column arithmetic like the forward. The
    * series truncation is sub-mm inside the UTM validity domain, so
    * forward∘inverse round-trips to ~1e-9 degrees (spec-pinned).
    *
    * Native since r12 like the forward: one codegen'd static call per
    * coordinate (plans.Exprs.UtmInvLon/UtmInvLat), bit-identical to the
    * Column tree ([[utmInverseColumns]], equivalence spec-pinned). */
  def utmInverse(easting: Column, northing: Column, zone: Column,
                 south: Column,
                 a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = PlanBridge.expression(easting)
    val n = PlanBridge.expression(northing)
    val z = PlanBridge.expression(zone)
    val s = PlanBridge.expression(south)
    (PlanBridge.column(graft.plans.Exprs.UtmInvLon(e, n, z, s, a, e2)),
      PlanBridge.column(graft.plans.Exprs.UtmInvLat(e, n, z, s, a, e2)))
  }

  /** The r11 inlined Column tree of [[utmInverse]] — kept as the
    * equivalence reference the spec checks the kernel against. */
  private[graft] def utmInverseColumns(easting: Column, northing: Column,
                 zone: Column, south: Column,
                 a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, _, _, _) = mCoefs(e2)
    val sq1e = math.sqrt(1.0 - e2)
    val e1 = (1.0 - sq1e) / (1.0 + sq1e)
    // rectifying series coefficients (Snyder eq. 3-26)
    val j2 = 3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0
    val j4 = 21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0
    val j6 = 151.0 * e1 * e1 * e1 / 96.0
    val j8 = 1097.0 * e1 * e1 * e1 * e1 / 512.0
    val lon0 = zone.cast("double") * 6.0 - 183.0
    val xp = (easting - 500000.0) / UtmK0
    val yp = (northing - when(south, 10000000.0).otherwise(0.0)) / UtmK0
    val mu = yp / (a * m0)
    val phi1 = mu + lit(j2) * sin(mu * 2.0) + lit(j4) * sin(mu * 4.0) +
      lit(j6) * sin(mu * 6.0) + lit(j8) * sin(mu * 8.0)
    val sp = sin(phi1); val cp = cos(phi1); val tp = tan(phi1)
    val w = lit(1.0) - lit(e2) * sp * sp
    val n1 = lit(a) / sqrt(w)
    val r1 = lit(a * (1.0 - e2)) / (w * sqrt(w))
    val t1 = tp * tp
    val c1 = lit(ep2) * cp * cp
    val d = xp / n1
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d
    val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tp / r1) * (d2 / 2.0 -
      (lit(5.0) + t1 * 3.0 + c1 * 10.0 - c1 * c1 * 4.0 - ep2 * 9.0) * d4 / 24.0 +
      (lit(61.0) + t1 * 90.0 + c1 * 298.0 + t1 * t1 * 45.0 -
        ep2 * 252.0 - c1 * c1 * 3.0) * d6 / 720.0)
    val lam = (d - (lit(1.0) + t1 * 2.0 + c1) * d3 / 6.0 +
      (lit(5.0) - c1 * 2.0 + t1 * 28.0 - c1 * c1 * 3.0 +
        ep2 * 8.0 + t1 * t1 * 24.0) * d5 / 120.0) / cp
    (lon0 + lam / Deg2Rad, phi / Deg2Rad)
  }

  /** The identical Snyder series as a SQL fragment pair
    * (easting, northing) over column names — the DuckDB oracle face.
    * Same formula, same Scala-computed double literals; cross-engine
    * drift is bounded by libm's last ulp, which the whole-meter
    * round-then-cast in the query absorbs. */
  def utmForwardSql(lon: String, lat: String,
                    a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, m2, m4, m6) = mCoefs(e2)
    val zone = s"least(CAST(floor((($lon) + 180.0) / 6.0) AS BIGINT) + 1, 60)"
    val lon0 = s"(CAST($zone AS DOUBLE) * 6.0 - 183.0)"
    val phi = s"(($lat) * $Deg2Rad)"
    val dlam = s"((($lon) - $lon0) * $Deg2Rad)"
    val sp = s"sin($phi)"; val cp = s"cos($phi)"; val tp = s"tan($phi)"
    val nRad = s"($a / sqrt(1.0 - $e2 * $sp * $sp))"
    val t = s"($tp * $tp)"
    val c = s"($ep2 * $cp * $cp)"
    val aa = s"($cp * $dlam)"
    val m = s"($a * ($m0 * $phi - $m2 * sin($phi * 2.0) + " +
      s"$m4 * sin($phi * 4.0) - $m6 * sin($phi * 6.0)))"
    def pow(b: String, n: Int) = "(" + Seq.fill(n)(b).mkString(" * ") + ")"
    val x = s"($UtmK0 * $nRad * ($aa + (1.0 - $t + $c) * ${pow(aa, 3)} / 6.0 + " +
      s"(5.0 - $t * 18.0 + $t * $t + $c * 72.0 - $ep2 * 58.0) * ${pow(aa, 5)} / 120.0) + 500000.0)"
    val y = s"($UtmK0 * ($m + $nRad * $tp * (${pow(aa, 2)} / 2.0 + " +
      s"(5.0 - $t + $c * 9.0 + $c * $c * 4.0) * ${pow(aa, 4)} / 24.0 + " +
      s"(61.0 - $t * 58.0 + $t * $t + $c * 600.0 - $ep2 * 330.0) * ${pow(aa, 6)} / 720.0)) + " +
      s"(CASE WHEN ($lat) < 0.0 THEN 10000000.0 ELSE 0.0 END))"
    (x, y)
  }

  /** The identical inverse Snyder series as SQL fragments (lon, lat in
    * degrees) over easting/northing/zone/south column names — the DuckDB
    * oracle face of [[utmInverse]]. Same Scala-computed double literals;
    * the micro-degree round-then-cast in the query absorbs libm's last
    * ulp, as whole meters do for the forward. */
  def utmInverseSql(easting: String, northing: String, zone: String,
                    south: String,
                    a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val ep2 = e2 / (1.0 - e2)
    val (m0, _, _, _) = mCoefs(e2)
    val sq1e = math.sqrt(1.0 - e2)
    val e1 = (1.0 - sq1e) / (1.0 + sq1e)
    val j2 = 3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0
    val j4 = 21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0
    val j6 = 151.0 * e1 * e1 * e1 / 96.0
    val j8 = 1097.0 * e1 * e1 * e1 * e1 / 512.0
    val lon0 = s"(CAST($zone AS DOUBLE) * 6.0 - 183.0)"
    val xp = s"((($easting) - 500000.0) / $UtmK0)"
    val yp = s"(((($northing) - (CASE WHEN $south THEN 10000000.0 ELSE 0.0 END))) / $UtmK0)"
    // one Scala-computed literal: DuckDB types decimal literals as
    // DECIMAL, and literal*literal overflows DECIMAL(18) here
    val mu = s"($yp / (${a * m0}))"
    val phi1 = s"($mu + $j2 * sin($mu * 2.0) + $j4 * sin($mu * 4.0) + " +
      s"$j6 * sin($mu * 6.0) + $j8 * sin($mu * 8.0))"
    val sp = s"sin($phi1)"; val cp = s"cos($phi1)"; val tp = s"tan($phi1)"
    val w = s"(1.0 - $e2 * $sp * $sp)"
    val n1 = s"($a / sqrt($w))"
    val r1 = s"((${a * (1.0 - e2)}) / ($w * sqrt($w)))"
    val t1 = s"($tp * $tp)"
    val c1 = s"($ep2 * $cp * $cp)"
    val d = s"($xp / $n1)"
    def pow(b: String, n: Int) = "(" + Seq.fill(n)(b).mkString(" * ") + ")"
    val phi = s"($phi1 - ($n1 * $tp / $r1) * (${pow(d, 2)} / 2.0 - " +
      s"(5.0 + $t1 * 3.0 + $c1 * 10.0 - $c1 * $c1 * 4.0 - $ep2 * 9.0) * ${pow(d, 4)} / 24.0 + " +
      s"(61.0 + $t1 * 90.0 + $c1 * 298.0 + $t1 * $t1 * 45.0 - " +
      s"$ep2 * 252.0 - $c1 * $c1 * 3.0) * ${pow(d, 6)} / 720.0))"
    val lam = s"(($d - (1.0 + $t1 * 2.0 + $c1) * ${pow(d, 3)} / 6.0 + " +
      s"(5.0 - $c1 * 2.0 + $t1 * 28.0 - $c1 * $c1 * 3.0 + " +
      s"$ep2 * 8.0 + $t1 * $t1 * 24.0) * ${pow(d, 5)} / 120.0) / $cp)"
    (s"($lon0 + $lam / $Deg2Rad)", s"($phi / $Deg2Rad)")
  }
  // --- Lambert conformal conic (2 standard parallels) ------------------------
  // The conic family national grids use (Snyder PP 1395 p. 104-110,
  // eq. 15-1..15-10, ellipsoid form): plan-time constants n, F, rho0
  // computed in Scala from the declared parallels; per-row work is one
  // t(phi) evaluation plus sin/cos — a codegen'd narrow map like UTM.
  // Whole-meter oracle face per the established CRS convention.

  private def lccT(e: Double)(phi: Double): Double =
    math.tan(math.Pi / 4.0 - phi / 2.0) /
      math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2.0)
  private def lccM(e2: Double)(phi: Double): Double =
    math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))

  /** Plan-time LCC constants (n, F, rho0) for standard parallels
    * `phi1Deg`/`phi2Deg` and latitude of origin `phi0Deg`. */
  def lccConstants(phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                   a: Double, e2: Double): (Double, Double, Double) = {
    val e = math.sqrt(e2)
    val p0 = math.toRadians(phi0Deg)
    val p1 = math.toRadians(phi1Deg)
    val p2 = math.toRadians(phi2Deg)
    val n = (math.log(lccM(e2)(p1)) - math.log(lccM(e2)(p2))) /
      (math.log(lccT(e)(p1)) - math.log(lccT(e)(p2)))
    val f = lccM(e2)(p1) / (n * math.pow(lccT(e)(p1), n))
    val rho0 = a * f * math.pow(lccT(e)(p0), n)
    (n, f, rho0)
  }

  /** Forward Lambert conformal conic (meters, full doubles): Snyder's
    * ellipsoid series with the Scala-computed plan constants — the
    * Snyder PP 1395 p. 296 numerical example reproduces to < 0.1 m
    * (spec-pinned). Validity: latitudes strictly inside (−90, 90) on the
    * cone's side; callers filter. */
  def lccForward(lon: Column, lat: Column,
                 phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                 lon0Deg: Double,
                 a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = math.sqrt(e2)
    val (n, f, rho0) = lccConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    val phi = lat * Deg2Rad
    val sp = sin(phi)
    val t = tan(lit(math.Pi / 4.0) - phi / 2.0) /
      pow((lit(1.0) - lit(e) * sp) / (lit(1.0) + lit(e) * sp), e / 2.0)
    val rho = lit(a * f) * pow(t, n)
    val theta = lit(n) * (lon - lon0Deg) * Deg2Rad
    (rho * sin(theta), lit(rho0) - rho * cos(theta))
  }

  /** The identical LCC series as SQL fragments (x, y) — same plan-time
    * constant literals, same per-row tree. */
  def lccForwardSql(lon: String, lat: String,
                    phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                    lon0Deg: Double,
                    a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val e = math.sqrt(e2)
    val (n, f, rho0) = lccConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    val phi = s"(($lat) * $Deg2Rad)"
    val sp = s"sin($phi)"
    val t = s"(tan(${math.Pi / 4.0} - $phi / 2.0) / " +
      s"pow((1.0 - $e * $sp) / (1.0 + $e * $sp), ${e / 2.0}))"
    val rho = s"((${a * f}) * pow($t, $n))"
    val theta = s"($n * (($lon) - ($lon0Deg)) * $Deg2Rad)"
    (s"($rho * sin($theta))", s"($rho0 - $rho * cos($theta))")
  }

  // --- Albers equal-area conic (2 standard parallels) -----------------------
  // The equal-area conic family statistical/national grids use where LCC's
  // conformality is the wrong trade (Snyder PP 1395 p. 98-103, eq. 3-12,
  // 14-1..14-6, ellipsoid form): plan-time constants n, C, rho0 from the
  // declared parallels; per-row work is one q(phi) evaluation plus
  // sin/cos — a codegen'd narrow map like LCC. The defining property —
  // area scale EXACTLY 1 everywhere — is spec-checked by finite
  // differences against the ellipsoid area element, so a series error
  // cannot hide.

  /** Snyder eq. 3-12: the equal-area auxiliary q(phi). */
  private def albersQ(e: Double, e2: Double)(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - e2) * (s / (1.0 - e2 * s * s) -
      (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
  }

  /** Plan-time Albers constants (n, C, rho0). */
  def albersConstants(phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                      a: Double, e2: Double): (Double, Double, Double) = {
    val e = math.sqrt(e2)
    val p0 = math.toRadians(phi0Deg)
    val p1 = math.toRadians(phi1Deg)
    val p2 = math.toRadians(phi2Deg)
    val m1 = lccM(e2)(p1)
    val m2 = lccM(e2)(p2)
    val q0 = albersQ(e, e2)(p0)
    val q1 = albersQ(e, e2)(p1)
    val q2 = albersQ(e, e2)(p2)
    val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    val c = m1 * m1 + n * q1
    val rho0 = a * math.sqrt(c - n * q0) / n
    (n, c, rho0)
  }

  /** Forward Albers equal-area conic (meters, full doubles): Snyder's
    * ellipsoid form with Scala-computed plan constants. Validity:
    * latitudes strictly inside (−90, 90); callers filter. */
  def albersForward(lon: Column, lat: Column,
                    phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                    lon0Deg: Double,
                    a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = math.sqrt(e2)
    val (n, c, rho0) = albersConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    val phi = lat * Deg2Rad
    val sp = sin(phi)
    val q = lit(1.0 - e2) * (sp / (lit(1.0) - lit(e2) * sp * sp) -
      lit(1.0 / (2.0 * e)) *
        log((lit(1.0) - lit(e) * sp) / (lit(1.0) + lit(e) * sp)))
    val rho = lit(a) * sqrt(lit(c) - lit(n) * q) / n
    val theta = lit(n) * (lon - lon0Deg) * Deg2Rad
    (rho * sin(theta), lit(rho0) - rho * cos(theta))
  }

  /** The identical Albers series as SQL fragments (x, y). */
  def albersForwardSql(lon: String, lat: String,
                       phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                       lon0Deg: Double,
                       a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val e = math.sqrt(e2)
    val (n, c, rho0) = albersConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    val phi = s"(($lat) * $Deg2Rad)"
    val sp = s"sin($phi)"
    val q = s"((${1.0 - e2}) * ($sp / (1.0 - $e2 * $sp * $sp) - " +
      s"(${1.0 / (2.0 * e)}) * ln((1.0 - $e * $sp) / (1.0 + $e * $sp))))"
    val rho = s"(($a) * sqrt(($c) - ($n) * $q) / ($n))"
    val theta = s"(($n) * (($lon) - ($lon0Deg)) * $Deg2Rad)"
    (s"($rho * sin($theta))", s"($rho0 - $rho * cos($theta))")
  }

  // --- Polar stereographic (north aspect, central scale k0) ------------------
  // The azimuthal member of the family (polar research grids; Snyder PP
  // 1395 p. 160-161, eq. 21-33/21-34 ellipsoid form with central scale):
  // reuses LCC's conformal auxiliary t(phi). Conformality — scale
  // identical in every direction — is spec-checked by finite differences.

  /** Forward north-polar stereographic (meters): x = rho sin(λ−λ0),
    * y = −rho cos(λ−λ0) with rho = 2 a k0 t / √((1+e)^(1+e)(1−e)^(1−e)).
    * Validity: latitudes strictly above −90 (the south pole is the
    * antipode); callers filter to the northern cap in practice. */
  def polarStereoForward(lon: Column, lat: Column, lon0Deg: Double,
                         k0: Double = 0.994,
                         a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = math.sqrt(e2)
    val denom = math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))
    val phi = lat * Deg2Rad
    val sp = sin(phi)
    val t = tan(lit(math.Pi / 4.0) - phi / 2.0) /
      pow((lit(1.0) - lit(e) * sp) / (lit(1.0) + lit(e) * sp), e / 2.0)
    val rho = lit(2.0 * a * k0 / denom) * t
    val lam = (lon - lon0Deg) * Deg2Rad
    (rho * sin(lam), lit(0.0) - rho * cos(lam))
  }

  /** The identical polar-stereographic series as SQL fragments (x, y). */
  def polarStereoForwardSql(lon: String, lat: String, lon0Deg: Double,
                            k0: Double = 0.994,
                            a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val e = math.sqrt(e2)
    val denom = math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))
    val phi = s"(($lat) * $Deg2Rad)"
    val sp = s"sin($phi)"
    val t = s"(tan(${math.Pi / 4.0} - $phi / 2.0) / " +
      s"pow((1.0 - $e * $sp) / (1.0 + $e * $sp), ${e / 2.0}))"
    val rho = s"((${2.0 * a * k0 / denom}) * $t)"
    val lam = s"((($lon) - ($lon0Deg)) * $Deg2Rad)"
    (s"($rho * sin($lam))", s"(0.0 - $rho * cos($lam))")
  }

  // --- Inverse conic / azimuthal transforms (r15) ----------------------------
  // to_crs is bidirectional (ancillary.py:146-147 via pyproj); only UTM had
  // an inverse before r15. The longitude legs are closed-form atan2 trees;
  // the latitude legs recover phi from the projection's auxiliary (t for
  // the conformal family, q for the equal-area family) by FIXED-count
  // iteration — deterministic on both engines, so the oracle unrolls the
  // identical steps as staged CTE columns and the micro-degree
  // round-then-cast absorbs cross-engine libm ulps exactly as q_utm_inverse
  // does. Latitude iterations run as one codegen'd kernel call per row
  // (plans.Exprs.ConformalLat / AlbersLat — no 7^iters Column-tree blowup).

  /** Fixed iteration counts — pinned here AND in every oracle unroll. */
  val ConformalLatIters = 5
  val AlbersLatIters = 4

  /** Normalize a recovered longitude into [-180, 180) — atan2 hands the
    * azimuthal inverse delta-lambda in (-180, 180], so a point more than
    * 180 degrees of longitude from lon0 would otherwise come back a full
    * turn off (the conic inverses divide theta by n < 1 and never wrap,
    * but the normalization is the identity there). Same floor tree on
    * both engines. */
  private def wrapLonCol(lon: Column): Column =
    lon - lit(360.0) * floor((lon + 180.0) / 360.0)

  private def wrapLonSql(lon: String): String =
    s"(($lon) - 360.0 * floor((($lon) + 180.0) / 360.0))"

  private def conformalLatCol(t: Column, e: Double): Column =
    PlanBridge.column(graft.plans.Exprs.ConformalLat(
      PlanBridge.expression(t), e, ConformalLatIters))

  /** Inverse Lambert conformal conic (Snyder eq. 15-5/15-6/7-9):
    * projected meters back to lon/lat degrees. North-aspect cones
    * (n > 0) only — both declared parallels in the northern hemisphere,
    * the gedixr-relevant case. */
  def lccInverse(x: Column, y: Column,
                 phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                 lon0Deg: Double,
                 a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = math.sqrt(e2)
    val (n, f, rho0) = lccConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    require(n > 0.0, "lccInverse supports north-aspect cones (n > 0)")
    val dy = lit(rho0) - y
    val rho = sqrt(x * x + dy * dy)
    val theta = atan2(x, dy)
    val lon = wrapLonCol((theta / n) / Deg2Rad + lon0Deg)
    val t = pow(rho / (a * f), 1.0 / n)
    (lon, conformalLatCol(t, e) / Deg2Rad)
  }

  /** Inverse north-polar stereographic (Snyder eq. 21-39/21-40/7-9). */
  def polarStereoInverse(x: Column, y: Column, lon0Deg: Double,
                         k0: Double = 0.994,
                         a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = math.sqrt(e2)
    val denom = math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))
    val rho = sqrt(x * x + y * y)
    val t = rho * (denom / (2.0 * a * k0))
    val lon = wrapLonCol(atan2(x, lit(0.0) - y) / Deg2Rad + lon0Deg)
    (lon, conformalLatCol(t, e) / Deg2Rad)
  }

  /** Inverse Albers equal-area conic (Snyder eq. 14-19..14-21/3-16).
    * North-aspect cones (n > 0) only, like [[lccInverse]]. */
  def albersInverse(x: Column, y: Column,
                    phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                    lon0Deg: Double,
                    a: Double = Wgs84A, e2: Double = Wgs84E2): (Column, Column) = {
    val e = math.sqrt(e2)
    val (n, c, rho0) = albersConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    require(n > 0.0, "albersInverse supports north-aspect cones (n > 0)")
    val dy = lit(rho0) - y
    val rho = sqrt(x * x + dy * dy)
    val theta = atan2(x, dy)
    val lon = wrapLonCol((theta / n) / Deg2Rad + lon0Deg)
    val q = (lit(c) - rho * rho * lit(n * n) / (a * a)) / n
    val lat = PlanBridge.column(graft.plans.Exprs.AlbersLat(
      PlanBridge.expression(q), e, e2, AlbersLatIters)) / Deg2Rad
    (lon, lat)
  }

  /** SQL (lonDeg, t) legs of [[lccInverse]] over projected columns —
    * the latitude leg is the [[conformalLatSqlSteps]] unroll over t. */
  def lccInverseSqlParts(x: String, y: String,
                         phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                         lon0Deg: Double,
                         a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val (n, f, rho0) = lccConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    val dy = s"(($rho0) - ($y))"
    val rho = s"sqrt(($x) * ($x) + $dy * $dy)"
    val lon = wrapLonSql(s"((atan2(($x), $dy) / ($n)) / $Deg2Rad + ($lon0Deg))")
    val t = s"pow($rho / (${a * f}), ${1.0 / n})"
    (lon, t)
  }

  /** SQL (lonDeg, t) legs of [[polarStereoInverse]]. */
  def polarStereoInverseSqlParts(x: String, y: String, lon0Deg: Double,
                                 k0: Double = 0.994,
                                 a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val e = math.sqrt(e2)
    val denom = math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))
    val lon = wrapLonSql(s"(atan2(($x), 0.0 - ($y)) / $Deg2Rad + ($lon0Deg))")
    val t = s"(sqrt(($x) * ($x) + ($y) * ($y)) * (${denom / (2.0 * a * k0)}))"
    (lon, t)
  }

  /** SQL (lonDeg, q) legs of [[albersInverse]] — the latitude leg is the
    * [[albersLatSqlSteps]] unroll over q. */
  def albersInverseSqlParts(x: String, y: String,
                            phi0Deg: Double, phi1Deg: Double, phi2Deg: Double,
                            lon0Deg: Double,
                            a: Double = Wgs84A, e2: Double = Wgs84E2): (String, String) = {
    val (n, c, rho0) = albersConstants(phi0Deg, phi1Deg, phi2Deg, a, e2)
    val dy = s"(($rho0) - ($y))"
    val rho = s"sqrt(($x) * ($x) + $dy * $dy)"
    val lon = wrapLonSql(s"((atan2(($x), $dy) / ($n)) / $Deg2Rad + ($lon0Deg))")
    val q = s"((($c) - $rho * $rho * (${n * n}) / (${a * a})) / ($n))"
    (lon, q)
  }

  /** The [[Kernels.conformalLat]] iteration as staged SQL expressions:
    * element 0 initializes phi from column `t`, element k+1 computes the
    * k-th refinement from columns `phi` and `t` — one CTE per element
    * keeps the oracle free of 2^iters expression blowup. */
  def conformalLatSqlSteps(e2: Double = Wgs84E2): Seq[String] = {
    val e = math.sqrt(e2)
    val step = s"(${math.Pi / 2.0} - 2.0 * atan(t * " +
      s"pow((1.0 - $e * sin(phi)) / (1.0 + $e * sin(phi)), ${e / 2.0})))"
    s"(${math.Pi / 2.0} - 2.0 * atan(t))" +: Seq.fill(ConformalLatIters)(step)
  }

  /** The [[Kernels.albersLat]] Newton iteration as staged SQL
    * expressions over columns `phi` and `q` (element 0 over `q` only). */
  def albersLatSqlSteps(e2: Double = Wgs84E2): Seq[String] = {
    val e = math.sqrt(e2)
    val om = s"(1.0 - $e2 * sin(phi) * sin(phi))"
    val step = s"(phi + $om * $om / (2.0 * cos(phi)) * " +
      s"(q / (${1.0 - e2}) - sin(phi) / $om + " +
      s"(${1.0 / (2.0 * e)}) * ln((1.0 - $e * sin(phi)) / (1.0 + $e * sin(phi)))))"
    "asin(q / 2.0)" +: Seq.fill(AlbersLatIters)(step)
  }

  /** Z-order (Morton) value of a lon/lat point: each coordinate is
    * quantized to `bits` levels over its world range, then the bits are
    * interleaved. Points close on the curve are close in space, so a
    * dataset SORTED by z-value has spatially tight per-file min/max
    * stats — bbox predicates then prune parquet row groups instead of
    * scanning the world (see GeoOps.writeSpatiallyClustered). Pure
    * integer shifts/masks → codegen'd, and expressible identically in
    * any engine (zValueSql) for hash verification. */
  def zValue(lon: Column, lat: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val n = (1L << bits) - 1
    val qx = least(greatest(floor((lon + 180.0) / 360.0 * (n + 1)), lit(0.0)), lit(n.toDouble)).cast("long")
    val qy = least(greatest(floor((lat + 90.0) / 180.0 * (n + 1)), lit(0.0)), lit(n.toDouble)).cast("long")
    (0 until bits).map { i =>
      (shiftright(qx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(qy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduceLeft(_ + _)
  }

  /** DuckDB SQL for the identical z-value tree, split so the oracle can
    * compute the quantized coords once in a subquery: `zQuantizeSql`
    * emits the (qx, qy) expressions, `zInterleaveSql` the bit
    * interleave over those column names. */
  def zQuantizeSql(lon: String, lat: String, bits: Int = 16): (String, String) = {
    val n = (1L << bits) - 1
    (s"CAST(least(greatest(floor((($lon) + 180.0) / 360.0 * ${n + 1}), 0.0), $n.0) AS BIGINT)",
      s"CAST(least(greatest(floor((($lat) + 90.0) / 180.0 * ${n + 1}), 0.0), $n.0) AS BIGINT)")
  }

  def zInterleaveSql(qx: String, qy: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($qx >> $i) & 1) * ${1L << (2 * i)}) + ((($qy >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Hilbert-curve value of a lon/lat point: same quantization as
    * [[zValue]], then the Hilbert xy2d walk (native kernel). The layout
    * win over Morton: consecutive curve positions are ALWAYS
    * grid-adjacent (Morton is ~50% — it jumps across quadrant seams), so
    * row-group-sized runs of the sorted order stay spatially contiguous
    * and carry tighter bbox min/max stats. Measured (GeoSpec): at
    * NON-quadrant-aligned block sizes — real row groups never align —
    * mean block bbox area is ~35% smaller (48-cell blocks: 59 vs 92;
    * quadrant-aligned sizes tie, both curves being quadrant-recursive).
    * Z-order stays the cheaper-to-compute default; this is the upgrade
    * when write cost amortizes over many pruned reads. */
  def hilbertValue(lon: Column, lat: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val n = (1L << bits) - 1
    val qx = least(greatest(floor((lon + 180.0) / 360.0 * (n + 1)), lit(0.0)), lit(n.toDouble)).cast("long")
    val qy = least(greatest(floor((lat + 90.0) / 180.0 * (n + 1)), lit(0.0)), lit(n.toDouble)).cast("long")
    PlanBridge.column(graft.plans.Exprs.HilbertIndex(
      PlanBridge.expression(qx), PlanBridge.expression(qy), bits))
  }

  /** DuckDB CTE chain for the identical Hilbert walk, one CTE per level
    * (the expression tree would grow 3x per level inlined — linear as a
    * chain). `from` must expose columns `$keep`, qx, qy; the final CTE
    * `h$bits` exposes `$keep, d`. */
  def hilbertCtesSql(keep: String, from: String, bits: Int): String = {
    val levels = (0 until bits).map { k =>
      val p = bits - 1 - k // bit position probed at this level
      val s = 1L << p
      val prev = if (k == 0) from else s"h$k"
      val digit = "CASE WHEN rx = 0 AND ry = 0 THEN 0 WHEN rx = 0 THEN 1 " +
        "WHEN ry = 1 THEN 2 ELSE 3 END"
      s"h${k + 1} AS (SELECT $keep, " +
        s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END AS x, " +
        s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END AS y, " +
        s"d + CAST(${s * s} AS BIGINT) * ($digit) AS d FROM " +
        s"(SELECT $keep, x, y, d, ((x >> $p) & 1) AS rx, ((y >> $p) & 1) AS ry FROM $prev))"
    }
    levels.mkString(", ")
  }

  private val wktPoint = "POINT \\(([-0-9.]+) ([-0-9.]+)\\)"

  /** Inverse of stPointWkt: numeric coordinates back out of a WKT point. */
  def wktPointX(wkt: Column): Column =
    regexp_extract(wkt, wktPoint, 1).cast("double")
  def wktPointY(wkt: Column): Column =
    regexp_extract(wkt, wktPoint, 2).cast("double")
}
