package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 guard (VERDICT r7 #3): a query whose plan throws must still
  * land an output directory — the board can never silently shrink. */
class VerifySpec extends SparkSpec {

  test("dumpQueries emits an error sentinel for a throwing query") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }),
      "boom" -> ((_, _) => throw new IllegalStateException("forced failure")))
    val errs = Verify.dumpQueries(spark, sfDir, out, queries)
    assert(errs.keySet === Set("boom"))
    // EVERY declared query has an output dir — none vanish
    queries.keys.foreach { name =>
      assert(new java.io.File(s"$out/$name").isDirectory, s"$name missing")
    }
    val good = spark.read.parquet(s"$out/good")
    assert(good.count() === 3)
    val boom = spark.read.parquet(s"$out/boom")
    assert(boom.columns.toSeq === Seq("_verify_error"))
    assert(boom.head.getString(0).contains("forced failure"))
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_errors.json"))
    assert(errJson.contains("\"boom\""))
    assert(errJson.contains("forced failure"))
  }
}
