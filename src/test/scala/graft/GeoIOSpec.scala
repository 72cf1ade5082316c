package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.MergeOps
import graft.sources.GeoIO

class GeoIOSpec extends SparkSpec {

  test("geo parquet round-trip: WKT geometry, sidecar metadata, restored coords") {
    val dir = Files.createTempDirectory("graft_geo").toString + "/shots"
    val shots = graft.queries.Shots.df(spark, sfDir)
      .select("shot", "lon", "lat", "value").limit(200)
    val expected = shots.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val meta = GeoIO.writeGeoParquet(shots, dir)
    assert(meta.crs === "EPSG:4326" && meta.encoding === "WKT")
    val Seq(minx, miny, maxx, maxy) = meta.bbox
    expected.values.foreach { case (lon, lat) =>
      assert(lon >= minx && lon <= maxx && lat >= miny && lat <= maxy)
    }

    val (back, meta2) = GeoIO.readGeoParquet(spark, dir)
    assert(meta2 === meta)
    assert(!spark.read.parquet(dir).columns.contains("lon"),
      "raw lon/lat must be dropped on write (geometry replaces them)")
    val got = back.select("shot", "lon", "lat").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (lon, lat)) =>
      // WKT carries 6 decimals; restoration is exact to that precision
      assert(math.abs(lon - expected(id)._1) < 5e-7)
      assert(math.abs(lat - expected(id)._2) < 5e-7)
    }
  }

  test("geo merge pre-check: CRS mismatch fails, disjoint bbox fails, match merges") {
    val base = Files.createTempDirectory("graft_geomerge").toString
    val shots = graft.queries.Shots.df(spark, sfDir)
      .select(col("shot"), col("ts").as("acq_time"), col("lon"), col("lat"),
        col("value")).filter(col("shot") <= 100)
    val n = shots.count()
    assert(n > 0)
    GeoIO.writeGeoParquet(shots.withColumnRenamed("value", "rh98"), s"$base/l2a")
    GeoIO.writeGeoParquet(shots.withColumnRenamed("value", "pai"), s"$base/l2b")

    // same AOI, same CRS: pre-checks pass and the merge joins every shot
    val merged = MergeOps.mergeGeoParquet(spark, s"$base/l2a", s"$base/l2b")
    assert(merged.count() === n)
    assert(merged.columns.contains("rh98") && merged.columns.contains("pai"))

    // tamper the sidecar CRS (the reference's CRS-equality failure case)
    val sidecar = java.nio.file.Paths.get(s"$base/l2b", "_geo.json")
    val raw = Files.readString(sidecar)
    Files.writeString(sidecar, raw.replace("EPSG:4326", "EPSG:32633"))
    val e = intercept[IllegalArgumentException] {
      MergeOps.mergeGeoParquet(spark, s"$base/l2a", s"$base/l2b")
    }
    assert(e.getMessage.contains("CRS mismatch"), e.getMessage)

    // disjoint bboxes (different AOIs) must also fail loudly
    Files.writeString(sidecar,
      raw.replaceAll(""""bbox":\[[^\]]*\]""", """"bbox":[500.0,500.0,501.0,501.0]"""))
    val e2 = intercept[IllegalArgumentException] {
      MergeOps.mergeGeoParquet(spark, s"$base/l2a", s"$base/l2b")
    }
    assert(e2.getMessage.contains("disjoint"), e2.getMessage)
  }

  test("bucketed merge joins without any shuffle exchange") {
    val l = Tables.load(spark, sfDir, "lineitem")
    val l2a = l.filter(col("l_linenumber") === 1).select(
      col("l_orderkey").as("shot"), col("l_extendedprice").as("rh98"))
    val l2b = l.filter(col("l_linenumber") === 2).select(
      col("l_orderkey").as("shot"), col("l_tax").as("pai"))
    MergeOps.writeBucketed(l2a, "l2a_bucketed", "shot", 8)
    MergeOps.writeBucketed(l2b, "l2b_bucketed", "shot", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is meaningful
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = MergeOps.mergeBucketed(spark, "l2a_bucketed", "l2b_bucketed",
        on = Seq("shot"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still computes the right thing
      val viaPlain = MergeOps.mergeGdf(l2a, l2b, on = Seq("shot")).count()
      assert(merged.count() === viaPlain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS l2a_bucketed")
      spark.sql("DROP TABLE IF EXISTS l2b_bucketed")
    }
  }
}
