package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Whole-frame geospatial operators derived from gedixr's spatial surface. */
object GeoOps {

  /** Rasterize points onto a regular grid — the Spark-first answer to
    * gedixr's `gdf_to_xr`/make_geocube (reference: gedixr/xr.py:144-174).
    * One shuffle on the (cell-y, cell-x) key with map-side partial
    * aggregation; the cell key has far lower cardinality than the input, so
    * the shuffle payload collapses before it moves. `res` mirrors the
    * reference's `resolution` parameter (xr.py:168-169). */
  def rasterize(df: DataFrame, x: Column, y: Column, res: Double,
                measurements: Seq[(String, Column)]): DataFrame = {
    val aggs = measurements.map { case (n, c) => c.as(n) }
    df.groupBy(
        floor(y / res).cast("long").as("cy"),
        floor(x / res).cast("long").as("cx"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Multiband raster as a long-format columnar frame — the distributed
    * answer to the reference's in-memory xarray Dataset (gedixr
    * xr.py:144-174 returns one ndarray per variable): one row per
    * (band, cell), every band from ONE cell shuffle. The wide cell frame
    * ([[rasterize]], map-side combined) unpivots via `stack` — a narrow
    * zero-shuffle projection — so adding bands costs aggregate columns,
    * never extra scans or shuffles. Values cast to double (the multiband
    * contract needs one value type); downstream consumers pivot a band
    * to dense rows or export via the ESRI ASCII writer. */
  def rasterizeMultiband(df: DataFrame, x: Column, y: Column, res: Double,
                         bands: Seq[(String, Column)]): DataFrame = {
    bands.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"band name '$n' must be alphanumeric/underscore (it is spliced " +
          "into a stack() expression)")
    }
    val cells = rasterize(df, x, y, res, bands)
    val stackExpr = s"stack(${bands.size}, " +
      bands.map { case (n, _) => s"'$n', CAST(`$n` AS DOUBLE)" }
        .mkString(", ") + ") AS (band, value)"
    cells.select(col("cy"), col("cx"), expr(stackExpr))
      .select(col("band"), col("cy"), col("cx"), col("value"))
  }

  /** Multi-AOI fan-out — ref extract.py:175-207: one tagged subset per AOI
    * geometry. SINGLE scan of the input (r1 unioned one filtered scan per
    * AOI — N scans for N AOIs): the OR of all bboxes is pushed as one scan
    * predicate, then each surviving row explodes into its matching AOI
    * tags. The AOI list is a plan-time constant (the broadcast analogue of
    * gedixr's in-memory AOI dict); rows matching no AOI are dropped by the
    * explode of an empty tag array. */
  def multiAoiBbox(df: DataFrame, x: Column, y: Column,
                   aois: Seq[(String, (Double, Double, Double, Double))]): DataFrame = {
    val anyBbox = aois.map { case (_, b) => GeoFunctions.inBbox(x, y, b) }
      .reduceLeft(_ || _)
    multiAoiTagged(df.filter(anyBbox),
      aois.map { case (n, b) => n -> GeoFunctions.inBbox(x, y, b) })
  }

  /** Multi-AOI fan-out with exact polygon membership (general form). The
    * bbox pre-filter of each polygon's envelope is pushed to the scan; the
    * exact ray-cast runs once per (row, AOI) in the same single pass. */
  def multiAoiPolygon(df: DataFrame, x: Column, y: Column,
                      aois: Seq[(String, Seq[(Double, Double)])]): DataFrame = {
    val envelopes = aois.map { case (_, poly) =>
      val (xs, ys) = (poly.map(_._1), poly.map(_._2))
      GeoFunctions.inBbox(x, y, (xs.min, xs.max, ys.min, ys.max))
    }
    multiAoiTagged(df.filter(envelopes.reduceLeft(_ || _)),
      aois.map { case (n, poly) => n -> GeoFunctions.pointInPolygon(x, y, poly) })
  }

  /** One-scan core: per-row array of matching AOI names, exploded. */
  private def multiAoiTagged(df: DataFrame, tagged: Seq[(String, Column)]): DataFrame = {
    val tags = filter(
      array(tagged.map { case (n, pred) => when(pred, lit(n)) }: _*),
      t => t.isNotNull)
    df.withColumn("aoi", explode(tags))
  }

  /** Per-AOI partitioned write — ref extract.py:196-220 writes one parquet
    * per AOI; the Spark-native form is a single partitioned write (each
    * `aoi=.../` directory is the per-AOI file set). */
  def writePerAoi(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy("aoi").parquet(outDir)

  /** Spatially clustered write: order rows along the Z (Morton) curve of
    * (x, y) before writing, so each output file covers a tight spatial
    * patch and carries tight lon/lat min/max footer stats — bbox
    * predicates then PRUNE row groups/files at scan time instead of
    * reading the world. This is the lakehouse answer to spatial
    * indexing at 100 TB: no index structure to maintain, just data
    * layout + ordinary parquet stats (the same mechanism Delta/Iceberg
    * Z-ORDER uses, expressed with repartitionByRange + sort). `files`
    * ~= dataset size / 128 MB at the target scale. */
  /** Supersampled footprint COVERAGE raster: the fraction of each grid
    * cell covered by the UNION of circular footprints of radius `r`
    * around each shot — the physical-GEDI nuance [[rasterize]]'s
    * point-in-cell counting misses (a 25 m footprint straddling a cell
    * boundary contributes area to BOTH cells; a point rasterizer credits
    * one). Coverage is computed on an `sub`×`sub` subcell lattice:
    * a subcell counts as covered when its CENTER lies inside any
    * footprint — an integer-exact union (no circle-rectangle analytic
    * area, which needs asin/acos — libm calls with no cross-engine
    * exactness guarantee).
    *
    * Scale shape: per shot a constant 9·sub² candidate fan-out (narrow
    * generate, no join — `r` must be ≤ `res` so 3×3 neighborhoods
    * suffice; require-checked), then ONE distinct-collapse shuffle on
    * the (cell, subcell) key and a map-side-combined count per cell.
    * Output is cell-count-sized. The distance test and subcell centers
    * are fixed double trees over exact integers — hash-portable. */
  def footprintCover(df: DataFrame, x: Column, y: Column, res: Double,
                     r: Double, sub: Int = 4): DataFrame = {
    require(r <= res, s"footprint radius $r must be <= cell size $res " +
      "(3x3 candidate neighborhoods)")
    val base = df.select(x.as("px"), y.as("py"),
      floor(x / res).cast("long").as("bx"),
      floor(y / res).cast("long").as("by"))
    val fan = base
      .select(col("px"), col("py"), col("bx"), col("by"),
        explode(sequence(lit(-1), lit(1))).as("dx"))
      .select(col("px"), col("py"), col("bx"), col("by"), col("dx"),
        explode(sequence(lit(-1), lit(1))).as("dy"))
      .select(col("px"), col("py"),
        (col("bx") + col("dx")).as("cx"), (col("by") + col("dy")).as("cy"),
        explode(sequence(lit(0), lit(sub - 1))).as("si"))
      .select(col("px"), col("py"), col("cx"), col("cy"), col("si"),
        explode(sequence(lit(0), lit(sub - 1))).as("sj"))
    val subD = sub.toDouble
    val sx = (col("cx").cast("double") +
      ((col("si").cast("double") + lit(0.5)) / lit(subD))) * lit(res)
    val sy = (col("cy").cast("double") +
      ((col("sj").cast("double") + lit(0.5)) / lit(subD))) * lit(res)
    val covered = ((sx - col("px")) * (sx - col("px")) +
      (sy - col("py")) * (sy - col("py"))) <= lit(r * r)
    fan.filter(covered)
      .select(col("cx"), col("cy"), col("si"), col("sj"))
      .groupBy(col("cx"), col("cy"), col("si"), col("sj")).agg(lit(1))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n_sub"))
      .select(col("cx"), col("cy"), col("n_sub"),
        round(col("n_sub").cast("double") / lit(subD * subD), 6)
          .as("coverage"))
  }

  /** DuckDB oracle for [[footprintCover]] — identical lattice and trees.
    * `pointsSub` yields columns aliased `px`, `py`. */
  def footprintCoverSql(pointsSub: String, res: Double, r: Double,
                        sub: Int = 4): String = {
    val subD = s"$sub.0"
    val sx = s"((CAST(cx AS DOUBLE) + ((CAST(si AS DOUBLE) + 0.5) / $subD)) * $res)"
    val sy = s"((CAST(cy AS DOUBLE) + ((CAST(sj AS DOUBLE) + 0.5) / $subD)) * $res)"
    s"WITH pts AS (SELECT px, py, CAST(floor(px / $res) AS BIGINT) AS bx, " +
      s"CAST(floor(py / $res) AS BIGINT) AS by FROM $pointsSub), " +
      "fan AS (SELECT px, py, bx + dx.x AS cx, by + dy.x AS cy, si.x AS si, sj.x AS sj " +
      "FROM pts, (SELECT unnest(range(-1, 2)) AS x) dx, " +
      "(SELECT unnest(range(-1, 2)) AS x) dy, " +
      s"(SELECT unnest(range(0, $sub)) AS x) si, " +
      s"(SELECT unnest(range(0, $sub)) AS x) sj), " +
      s"cov AS (SELECT DISTINCT cx, cy, si, sj FROM fan WHERE " +
      s"($sx - px) * ($sx - px) + ($sy - py) * ($sy - py) <= ${r * r}) " +
      "SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_sub, " +
      s"round(CAST(count(*) AS DOUBLE) / ($subD * $subD), 6) AS coverage " +
      "FROM cov GROUP BY cx, cy"
  }

  def writeSpatiallyClustered(df: DataFrame, x: Column, y: Column,
                              outDir: String, files: Int = 16,
                              bits: Int = 16): Unit =
    df.withColumn("_z", GeoFunctions.zValue(x, y, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
}
