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
