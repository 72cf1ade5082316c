package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A GEDI-shaped "shots" frame synthesized deterministically from the
  * `events` table (SURVEY §3): lon/lat are pure arithmetic over event_id and
  * value, written with the exact same operation tree here and in the DuckDB
  * oracle fragment so both engines produce bit-identical doubles.
  */
object Shots {
  def df(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(
      col("event_id").as("shot"),
      col("ts"),
      col("event_type"),
      col("value"),
      ((col("event_id") % 360) - 180.0 + col("value") / 1000.0).as("lon"),
      ((col("event_id") * 7) % 180 - 90.0 + col("value") / 2000.0).as("lat"))
  }

  /** DuckDB subquery mirroring `df` exactly (same parenthesization). */
  val sql: String =
    "(SELECT event_id AS shot, ts, event_type, value, " +
      "((event_id % 360) - 180.0) + (value / 1000.0) AS lon, " +
      "(((event_id * 7) % 180) - 90.0) + (value / 2000.0) AS lat " +
      "FROM events) shots"
}

/** One declared operator query: name, Spark plan, optional DuckDB oracle. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
