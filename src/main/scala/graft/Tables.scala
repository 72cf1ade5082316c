package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the graft table catalog (one parquet per table).
  *
  * Mirrors gedixr's granule-directory input model (reference:
  * gedixr/extract.py:128-129 discovers granules under a root directory) with
  * a columnar catalog: every reader goes through `spark.read.parquet` so
  * Catalyst keeps scans pruned (ReadSchema) and predicates pushed
  * (PushedFilters). At cluster scale each "table" is a directory of many
  * parquet files; nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Rebuild a proper microsecond timestamp from an int64-NANOS column.
    * Spark has no TIMESTAMP(NANOS) type; sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true and this is the ONE place
    * the encoding rule lives (batch load, stream load, and the CLI all
    * call it). Integer `div` (not `/`) — int64 nanos overflow double's
    * 53-bit mantissa. No-op when the column is already a timestamp. */
  def normalizeNanosTs(df: DataFrame, tsCol: String): DataFrame =
    if (df.schema.fieldNames.contains(tsCol) &&
      df.schema(tsCol).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(tsCol,
        org.apache.spark.sql.functions.expr(s"timestamp_micros($tsCol div 1000)"))
    else df

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeNanosTs(df, "ts") else df
  }

  /** Streaming read of a catalog table (file-source streaming over the
    * same parquet, same ts normalization as the batch path) — the input
    * for §2.4's incremental plans. Schema comes from the batch footer. */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/$name.parquet").schema
    val df = spark.readStream.schema(batchSchema).parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeNanosTs(df, "ts") else df
  }

  /** Session settings every graft entrypoint should apply. */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")
}
