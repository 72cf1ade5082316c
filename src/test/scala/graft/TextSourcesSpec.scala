package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TextSources

/** CSV / JSON-lines ingest: explicit-schema reads, corrupt-record
  * quarantine, and the parquet conversion round-trip. */
class TextSourcesSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_src").toString

  test("jsonl round-trips documents and quarantines corrupt lines") {
    val base = tmp()
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    docs.write.json(s"$base/docs_json")
    // append a malformed line alongside Spark's output
    Files.writeString(java.nio.file.Paths.get(s"$base/docs_json/zz_bad.json"),
      "{not json at all\n")
    val schema = docs.schema
    // Spark forbids plans that prune to ONLY the corrupt column
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so materialize rows once and
    // check client-side
    val back = TextSources.readJsonl(spark, s"$base/docs_json", schema)
      .collect()
    val ci = schema.length // _corrupt is appended last
    assert(back.count(r => !r.isNullAt(ci)) === 1)
    val clean = back.filter(_.isNullAt(ci))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(clean === docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("csv round-trips events (explicit schema, header) and converts to parquet") {
    val base = tmp()
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.option("header", "true").csv(s"$base/ev_csv")
    // cache() is Spark's documented way to query the corrupt column
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids it on the raw scan)
    val raw = TextSources.readCsv(spark, s"$base/ev_csv", ev.schema).cache()
    try {
      val back = raw.filter(col("_corrupt").isNull).drop("_corrupt")
      assert(back.count() === ev.count())
      assert(back.agg(round(sum("value"), 4)).head.getDouble(0) ===
        ev.agg(round(sum("value"), 4)).head.getDouble(0))

      TextSources.toParquet(back, s"$base/ev_parquet", partitionBy = Seq("event_type"))
      val pq = spark.read.parquet(s"$base/ev_parquet")
      assert(pq.count() === ev.count())
      // partitioned layout prunes: reading one type touches one directory
      val one = spark.read.parquet(s"$base/ev_parquet")
        .filter(col("event_type") === "click")
      val scan = one.queryExecution.executedPlan.toString
      assert(one.count() === ev.filter(col("event_type") === "click").count())
      assert(scan.contains("PartitionFilters") || scan.contains("event_type"), scan)
    } finally raw.unpersist()
  }

  test("orc round-trips with predicate pushdown into the ORC scan") {
    val base = tmp()
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    TextSources.toOrc(ev, s"$base/ev_orc")
    val back = TextSources.readOrc(spark, s"$base/ev_orc")
    assert(back.count() === ev.count())
    assert(back.agg(round(sum("value"), 4)).head.getDouble(0) ===
      ev.agg(round(sum("value"), 4)).head.getDouble(0))
    // filters must reach the ORC scan like they do for parquet
    val filtered = back.filter(col("user_id") === 7L).select("event_id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"), plan)
    assert(filtered.count() === ev.filter(col("user_id") === 7L).count())
  }
}
