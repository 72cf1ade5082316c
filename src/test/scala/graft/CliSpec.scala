package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class CliSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_cli").toString

  test("cli extract filters beams/months and projects variables") {
    val out = tmp() + "/out"
    Cli.run(spark, "extract", Map(
      "input" -> s"$sfDir/events.parquet", "output" -> out,
      "beam-col" -> "event_type", "beams" -> "click,purchase"))
    val got = spark.read.parquet(out)
    val expect = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(got.count() === expect)

    val out2 = tmp() + "/vars"
    Cli.run(spark, "extract", Map(
      "input" -> s"$sfDir/lineitem.parquet", "output" -> out2,
      "vars" -> "okey=l_orderkey,qty=l_quantity"))
    assert(spark.read.parquet(out2).columns.toSeq === Seq("okey", "qty"))
  }

  test("cli subset applies the bbox") {
    val out = tmp() + "/sub"
    Cli.run(spark, "subset", Map(
      "input" -> s"$sfDir/events.parquet", "output" -> out,
      "x" -> "value", "y" -> "value", "bbox" -> "10,20,10,20"))
    val got = spark.read.parquet(out)
    assert(got.count() ===
      Tables.load(spark, sfDir, "events")
        .filter(col("value").between(10, 20)).count())
  }

  test("cli merge suffixes and joins the two sides") {
    import spark.implicits._
    val base = tmp()
    Seq((1L, "2019-01", 10.0), (2L, "2019-01", 20.0))
      .toDF("shot", "acq_time", "sensitivity")
      .write.parquet(s"$base/l2a")
    Seq((1L, "2019-01", 11.0), (3L, "2019-01", 30.0))
      .toDF("shot", "acq_time", "sensitivity")
      .write.parquet(s"$base/l2b")
    Cli.run(spark, "merge", Map(
      "left" -> s"$base/l2a", "right" -> s"$base/l2b",
      "output" -> s"$base/merged", "on" -> "shot,acq_time", "how" -> "inner"))
    val got = spark.read.parquet(s"$base/merged")
    assert(got.count() === 1)
    assert(got.columns.toSet === Set("shot", "acq_time", "sensitivity_l2a", "sensitivity_l2b"))
  }

  test("cli manifest prunes by product/months/bbox") {
    import spark.implicits._
    val base = tmp()
    Seq(
      ("g1", "GEDI02_A", java.sql.Timestamp.valueOf("2019-07-01 00:00:00"),
        -20.0, -10.0, 0.0, 10.0, "/d/g1"),
      ("g2", "GEDI02_B", java.sql.Timestamp.valueOf("2019-07-01 00:00:00"),
        -20.0, -10.0, 0.0, 10.0, "/d/g2"))
      .toDF("granule_id", "product", "acq_time", "xmin", "xmax", "ymin", "ymax", "path")
      .write.parquet(s"$base/manifest")
    Cli.run(spark, "manifest", Map(
      "input" -> s"$base/manifest", "output" -> s"$base/pruned",
      "product" -> "GEDI02_A%", "months" -> "6,8", "bbox" -> "-30,30,-10,40"))
    val got = spark.read.parquet(s"$base/pruned")
    assert(got.select("granule_id").collect().map(_.getString(0)).toSeq === Seq("g1"))
  }

  test("cli rasterize buckets points") {
    val out = tmp() + "/ras"
    Cli.run(spark, "rasterize", Map(
      "input" -> s"$sfDir/events.parquet", "output" -> out,
      "x" -> "value", "y" -> "value", "res" -> "25", "sum" -> "value"))
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq === Seq("cy", "cx", "n", "sum"))
    assert(got.count() > 0)
  }
}
