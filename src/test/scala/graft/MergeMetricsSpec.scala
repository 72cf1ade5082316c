package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExtractMetrics, MergeOps, Multimodal}
import graft.functions.TextFunctions

class MergeMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def l2a = Seq(
    (1L, "2019-01-01", 10.0, 98.0), (2L, "2019-01-01", 20.0, 97.0))
    .toDF("shot", "acq_time", "sensitivity", "rh98")
  private def l2b = Seq(
    (1L, "2019-01-01", 11.0, 0.5), (3L, "2019-01-01", 30.0, 0.7))
    .toDF("shot", "acq_time", "sensitivity", "pai")

  test("mergeGdf inner join suffixes overlapping columns, l2b on the left") {
    val m = MergeOps.mergeGdf(l2a, l2b)
    assert(m.columns.toSeq ===
      Seq("shot", "acq_time", "sensitivity_l2b", "pai", "sensitivity_l2a", "rh98"))
    val rows = m.collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 1L)
    assert(rows.head.getDouble(2) === 11.0) // l2b sensitivity
    assert(rows.head.getDouble(4) === 10.0) // l2a sensitivity
  }

  test("mergeGdf how=left keeps unmatched l2b rows (reference: l2b merges l2a)") {
    val m = MergeOps.mergeGdf(l2a, l2b, how = "left")
    assert(m.count() === 2) // shots 1 and 3 (the l2b side)
    val unmatched = m.filter(col("shot") === 3L).collect().head
    assert(unmatched.isNullAt(m.columns.indexOf("rh98")))
  }

  test("mergeGdf how=outer keeps both sides") {
    assert(MergeOps.mergeGdf(l2a, l2b, how = "outer").count() === 3)
  }

  test("compareFrames validates keys and returns one-action counts") {
    val (na, nb) = MergeOps.compareFrames(l2a, l2b, Seq("shot", "acq_time"))
    assert((na, nb) === ((2L, 2L)))
    intercept[IllegalArgumentException] {
      MergeOps.compareFrames(l2a.drop("shot"), l2b, Seq("shot"))
    }
    intercept[IllegalArgumentException] {
      MergeOps.compareFrames(l2a.withColumn("shot", col("shot").cast("string")),
        l2b, Seq("shot"))
    }
    // checked merge still yields the same plan output
    assert(MergeOps.mergeGdf(l2a, l2b, check = true).count() === 1)
  }

  test("qualityFilterObserved reports input/kept/dropped from the same job") {
    val flags = Tables.load(spark, sfDir, "lineitem").select(
      col("l_orderkey").as("shot"),
      (col("l_orderkey") % 2).cast("int").as("quality_flag"),
      (col("l_partkey") % 3).cast("int").as("degrade_flag"),
      (col("l_linenumber") % 3).cast("int").as("num_detectedmodes"),
      (col("l_extendedprice") / 100.0).as("elev"),
      (col("l_extendedprice") / 100.0).as("elev_dem_tdx"))
    val (filtered, metrics) = ExtractMetrics.qualityFilterObserved(flags)
    val kept = filtered.count()
    assert(metrics.nInput === flags.count())
    assert(metrics.nKept === kept)
    assert(metrics.nDropped === metrics.nInput - kept)
    assert(!filtered.columns.contains("quality_flag"))
  }

  test("multimodal stub decode agrees with the column-expression hash") {
    val docs = Tables.load(spark, sfDir, "documents").limit(100)
    val viaDataset = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .toDF().select("media_id", "n_bytes", "checksum")
    val viaColumns = docs.select(
      col("doc_id").as("media_id"),
      length(col("text")).cast("long").as("n_bytes"),
      TextFunctions.charHash(col("text")).as("checksum"))
    // two independent implementations (JVM fold in mapPartitions vs
    // Catalyst aggregate expression) must agree byte-for-byte
    assert(viaDataset.exceptAll(viaColumns).isEmpty)
    assert(viaColumns.exceptAll(viaDataset).isEmpty)
  }

  test("gedi catalog: beam groups, patterns, and default variable maps") {
    import graft.operators.GediCatalog
    assert(GediCatalog.beamGroups("power").size === 4)
    assert(GediCatalog.beamGroups("all").size === 8)
    assert(GediCatalog.granulePattern("L2A") === "*GEDI02_A_*.h5")
    assert(GediCatalog.defaultBase("L2B").toMap.apply("quality_flag") === "l2b_quality_flag")

    val df = Seq((1L, "BEAM0101"), (2L, "BEAM0000"), (3L, "BEAM1011"))
      .toDF("shot", "beam")
    val power = GediCatalog.beamFilterGroup(df, "beam", "power")
      .select("shot").collect().map(_.getLong(0)).sorted
    assert(power.toSeq === Seq(1L, 3L))
    assert(GediCatalog.beamFilterGroup(df, "beam", "all").count() === 3)
    intercept[IllegalArgumentException] {
      GediCatalog.beamFilterGroup(df, "beam", "nope")
    }
  }

  test("multimodal resize and frame-sample keep the typed batch shape") {
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val media = Multimodal.mediaFromDocuments(docs)
    val resized = Multimodal.resizeStub(media, 50).collect()
    assert(resized.forall(_.content.length <= 50))
    assert(resized.length === 20)

    val frames = Multimodal.frameSample(media, frameBytes = 40, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.frame_idx % 2 === 0)
      assert(f.offset === f.frame_idx * 40)
      assert(f.frame.length <= 40)
    }
    // every record with >40 bytes contributes its frame 0
    val ids = frames.filter(_.frame_idx == 0).map(_.media_id).toSet
    assert(ids.size === 20)
  }

  test("mediaNearDup pairs media by shared frame fingerprints (r8)") {
    import spark.implicits._
    // frames are 4 bytes, stride 1. A/B share frames "aaaa" and "bbbb";
    // A/C share only "aaaa"; D shares nothing.
    val media = Seq(
      Multimodal.MediaRecord(1L, "text", "aaaabbbbcccc".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, "text", "aaaabbbbdddd".getBytes("UTF-8")),
      Multimodal.MediaRecord(3L, "text", "aaaaeeee".getBytes("UTF-8")),
      Multimodal.MediaRecord(4L, "text", "ffffgggg".getBytes("UTF-8"))
    ).toDS()
    val got = Multimodal.mediaNearDup(media, frameBytes = 4, stride = 1,
        minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // only (1,2) passes minShared=2: 2 shared of min(3,3) frames
    assert(got === Map((1L, 2L) -> ((2L, 0.666667))))
    // with minShared=1 the (1,3)/(2,3) single-frame pairs appear too
    val loose = Multimodal.mediaNearDup(media, frameBytes = 4, stride = 1,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // duplicate frames within one record don't inflate shared counts:
    // distinct (media, fh) means repeated "aaaa" still counts once
    val rep = Seq(
      Multimodal.MediaRecord(10L, "text", "aaaaaaaa".getBytes("UTF-8")),
      Multimodal.MediaRecord(11L, "text", "aaaahhhh".getBytes("UTF-8"))
    ).toDS()
    val repGot = Multimodal.mediaNearDup(rep, 4, 1, 1).collect()
    assert(repGot.length === 1)
    assert(repGot(0).getLong(2) === 1L) // shared = 1, not 2
  }

  test("manifest discover walks directories recursively by glob") {
    import graft.sources.Manifest
    val root = java.nio.file.Files.createTempDirectory("graft_disc")
    val sub = java.nio.file.Files.createDirectories(root.resolve("y2019/d001"))
    java.nio.file.Files.writeString(sub.resolve("GEDI02_A_2019001120000.h5"), "x")
    java.nio.file.Files.writeString(sub.resolve("GEDI02_B_2019001120000.h5"), "x")
    java.nio.file.Files.writeString(root.resolve("readme.txt"), "x")
    val found = Manifest.discover(spark, root.toString, "*GEDI02_A_*.h5")
    val rows = found.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("granule_id") === "GEDI02_A_2019001120000")
    assert(Manifest.discover(spark, root.toString, "*GEDI02_*.h5").count() === 2)
  }

  test("manifest prune + resume filters as specified") {
    import graft.sources.Manifest
    val m = Seq(
      ("g1", "GEDI02_A", "2019-07-01 00:00:00", -20.0, -10.0, 0.0, 10.0, "/d/g1"),
      ("g2", "GEDI02_B", "2019-07-01 00:00:00", -20.0, -10.0, 0.0, 10.0, "/d/g2"),
      ("g3", "GEDI02_A", "2019-01-01 00:00:00", -20.0, -10.0, 0.0, 10.0, "/d/g3"),
      ("g4", "GEDI02_A", "2019-08-01 00:00:00", 100.0, 110.0, 0.0, 10.0, "/d/g4"))
      .toDF("granule_id", "product", "ts", "xmin", "xmax", "ymin", "ymax", "path")
      .withColumn("acq_time", to_timestamp(col("ts"))).drop("ts")
    val pruned = Manifest.prune(m, Some("GEDI02_A%"), Some((8, 6)), // swapped range
      Some((-30.0, 30.0, -10.0, 40.0)))
    assert(pruned.select("granule_id").collect().map(_.getString(0)).toSet === Set("g1"))
    val done = Seq("g1").toDF("granule_id")
    assert(Manifest.pendingOnly(pruned, done).count() === 0)
    assert(Manifest.pendingOnly(m, done).count() === 3)
  }
}
