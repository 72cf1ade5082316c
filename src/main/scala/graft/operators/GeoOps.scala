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

  /** Multi-AOI fan-out — ref extract.py:175-207: one tagged subset per AOI
    * geometry, concatenated. The AOI list is a plan-time constant (the
    * broadcast analogue of gedixr's in-memory `out_dict`); each branch's
    * bbox predicate pushes to the scan, and Spark unions the branches
    * without a shuffle. */
  def multiAoiBbox(df: DataFrame, x: Column, y: Column,
                   aois: Seq[(String, (Double, Double, Double, Double))]): DataFrame =
    aois.map { case (name, bbox) =>
      df.filter(GeoFunctions.inBbox(x, y, bbox)).withColumn("aoi", lit(name))
    }.reduce(_.unionByName(_))

  /** Multi-AOI fan-out with exact polygon membership (general form). */
  def multiAoiPolygon(df: DataFrame, x: Column, y: Column,
                      aois: Seq[(String, Seq[(Double, Double)])]): DataFrame =
    aois.map { case (name, poly) =>
      df.filter(GeoFunctions.pointInPolygon(x, y, poly)).withColumn("aoi", lit(name))
    }.reduce(_.unionByName(_))

  /** Per-AOI partitioned write — ref extract.py:196-220 writes one parquet
    * per AOI; the Spark-native form is a single partitioned write (each
    * `aoi=.../` directory is the per-AOI file set). */
  def writePerAoi(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy("aoi").parquet(outDir)
}
