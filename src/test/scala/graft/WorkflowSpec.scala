package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Extract, ExtractMetrics, GeoOps, MergeOps}
import graft.sources.GeoIO

/** The reference's whole main workflow, end to end, through graft's API:
  * granule extract -> quality filter (with run metrics) -> acq_time stamp
  * -> spatial subset per AOI -> geo write -> read back -> L2A⋈L2B merge ->
  * rasterize. This is the "a gedixr user could switch" proof, exercised as
  * one integration flow rather than per-operator specs.
  */
class WorkflowSpec extends SparkSpec {

  test("full gedixr-shaped pipeline runs end to end") {
    val dir = Files.createTempDirectory("graft_flow").toString

    // 1. "granules": shots frame with synthetic flags + granule ids
    val shots = graft.queries.Shots.df(spark, sfDir)
      .withColumn("granule_id", format_string("GEDI02_A_%04d%03d%02d%02d%02d",
        lit(2019), (col("shot") % 365) + 1, col("shot") % 24,
        col("shot") % 60, col("shot") % 60))
      .withColumn("quality_flag", (col("shot") % 2).cast("int"))
      .withColumn("degrade_flag", lit(0))
      .withColumn("num_detectedmodes", lit(2))
      .withColumn("elev", col("value"))
      .withColumn("elev_dem_tdx", col("value"))

    // 2. quality filter with observed metrics (R9 + R21)
    val (filtered, metrics) = ExtractMetrics.qualityFilterObserved(shots)

    // 3. acq_time stamp (R8/R2) + variable mapping (R5)
    val stamped = Extract.stampAcqTime(filtered, "granule_id")
      .select("shot", "lon", "lat", "value", "acq_time")

    // 4. multi-AOI subset (R11/R12) and per-AOI geo write (R15)
    val tagged = GeoOps.multiAoiBbox(stamped, col("lon"), col("lat"),
      graft.queries.CoreQueries.testAois)
    GeoOps.writePerAoi(tagged, s"$dir/by_aoi")
    val meta = GeoIO.writeGeoParquet(stamped, s"$dir/geo")

    // metrics observed from the same job that produced the outputs
    assert(metrics.nInput > 0 && metrics.nKept > 0)
    assert(metrics.nKept < metrics.nInput)

    // 5. read back (R16)
    val (back, meta2) = GeoIO.readGeoParquet(spark, s"$dir/geo")
    assert(meta2 === meta)
    assert(back.count() === stamped.count())

    // 6. L2A⋈L2B merge on (shot, acq_time) with pre-checks (R17/R18)
    val l2a = back.select(col("shot"), col("acq_time"), col("value").as("rh98"))
    val l2b = back.select(col("shot"), col("acq_time"), (col("value") / 2).as("pai"))
    val merged = MergeOps.mergeGdf(l2a, l2b, how = "left", check = true)
    assert(merged.count() === l2b.count())
    assert(merged.columns.contains("pai") && merged.columns.contains("rh98"))

    // 7. rasterize the merged frame (R19)
    val grid = GeoOps.rasterize(
      merged.join(back.select("shot", "lon", "lat"), Seq("shot")),
      col("lon"), col("lat"), 1.0,
      Seq("n" -> count(lit(1)), "mean_rh98" -> avg(col("rh98"))))
    assert(grid.count() > 0)
    val firstCell = grid.orderBy("cy", "cx").head
    assert(firstCell.getLong(2) > 0)

    // per-AOI read-back honors partition pruning
    val west = spark.read.parquet(s"$dir/by_aoi").filter(col("aoi") === "aoi_west")
    assert(west.count() ===
      tagged.filter(col("aoi") === "aoi_west").count())
  }

  test("granule files to raster: ingest both products, merge, grid write") {
    val dir = Files.createTempDirectory("graft_flow2").toString
    def writeGranule(sub: String, name: String,
                     layers: Seq[(String, Seq[String])]): Unit = {
      val sb = new StringBuilder
      layers.foreach { case (layer, vals) =>
        sb.append(s"BEAM0101 $layer ${vals.mkString(" ")}\n")
      }
      val p = java.nio.file.Paths.get(dir, sub, name)
      Files.createDirectories(p.getParent)
      Files.writeString(p, sb.toString)
    }
    val n = 4
    val shots = (0 until n).map(i => (100 + i).toString)
    val lats = (0 until n).map(i => (10.0 + i).toString)
    val lons = (0 until n).map(i => (20.0 + i).toString)
    val ones = Seq.fill(n)("1")
    val zeros = Seq.fill(n)("0")
    val flat = Seq.fill(n)("100.0")
    // the two products cover the SAME shots at the same acquisition
    writeGranule("a", "GEDI02_A_2019170155833_O1_T1_02_001_01.h5", Seq(
      "shot_number" -> shots, "lat_lowestmode" -> lats,
      "lon_lowestmode" -> lons, "elev_lowestmode" -> flat,
      "digital_elevation_model" -> flat, "degrade_flag" -> zeros,
      "quality_flag" -> ones, "sensitivity" -> Seq.fill(n)("0.9"),
      "num_detectedmodes" -> ones,
      "rh" -> (0 until n).map(i => (0 to 100).map(b => b * (i + 1) / 1e4).mkString(","))))
    writeGranule("b", "GEDI02_B_2019170155833_O1_T1_02_001_01.h5", Seq(
      "shot_number" -> shots, "geolocation/lat_lowestmode" -> lats,
      "geolocation/lon_lowestmode" -> lons,
      "geolocation/elev_lowestmode" -> flat,
      "geolocation/digital_elevation_model" -> flat,
      "geolocation/degrade_flag" -> zeros, "l2b_quality_flag" -> ones,
      "sensitivity" -> Seq.fill(n)("0.9"), "num_detectedmodes" -> ones,
      "cover" -> Seq.fill(n)("0.5"), "fhd_normal" -> Seq.fill(n)("1.1"),
      "pai" -> (0 until n).map(i => (1.0 + i).toString),
      "rh100" -> Seq.fill(n)("30.0")))

    val (l2a, e1) = graft.sources.Ingest.ingest(spark, s"$dir/a", "L2A",
      applyQualityFilter = true)
    val (l2b, e2) = graft.sources.Ingest.ingest(spark, s"$dir/b", "L2B",
      applyQualityFilter = true)
    assert(e1.value === 0 && e2.value === 0)
    assert(l2a.count() === n && l2b.count() === n)
    assert(l2a.columns.contains("rh98") && l2b.columns.contains("pai"))

    // products merge on (shot, acq_time) — acq_time came from each
    // granule's filename and must line up across products
    val merged = MergeOps.mergeGdf(
      l2a.select("shot", "acq_time", "longitude", "latitude", "rh98"),
      l2b.select("shot", "acq_time", "pai", "tcc"),
      on = Seq("shot", "acq_time"))
    assert(merged.count() === n)

    val cells = GeoOps.rasterize(merged,
      col("longitude"), col("latitude"), 2.0,
      Seq("n" -> count(lit(1)), "mean_rh98" -> avg(col("rh98")),
        "mean_pai" -> avg(col("pai"))))
    val files = GeoIO.writeAsciiGrids(cells, Seq("mean_rh98", "mean_pai"),
      2.0, s"$dir/asc")
    assert(files.map(_.split("/").last).toSet ===
      Set("mean_rh98.asc", "mean_pai.asc"))
    val asc = Files.readString(java.nio.file.Paths.get(s"$dir/asc", "mean_pai.asc"))
    assert(asc.startsWith("ncols") && asc.contains("cellsize 2.0"))
  }
}
