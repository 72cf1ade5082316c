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
}
