package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Run metrics — ref ancillary.py:10-118 (structured run logging with
  * per-granule error/success counting). The Spark-first form is
  * `Dataset.observe`: metrics ride the job that computes the result — no
  * second pass over the data, and exactly-once semantics under task retry
  * (unlike raw accumulators). `get` blocks until the observed frame has
  * been materialized by an action.
  */
final class ExtractMetrics(name: String = "extract_metrics") {
  val observation = new Observation(name)

  /** Attach input/kept counters for `kept` to `df` (pre-filter). */
  def observe(df: DataFrame, kept: Column): DataFrame =
    df.observe(observation,
      count(lit(1)).as("n_input"),
      sum(when(kept, 1L).otherwise(0L)).as("n_kept"))

  def get: Map[String, Any] = observation.get
  def nInput: Long = get("n_input").asInstanceOf[Long]
  def nKept: Long = get("n_kept").asInstanceOf[Long]
  def nDropped: Long = nInput - nKept
}

object ExtractMetrics {

  /** Extract.qualityFilter with observed input/kept/dropped counts — the
    * analogue of the reference's per-run log summary. */
  def qualityFilterObserved(df: DataFrame): (DataFrame, ExtractMetrics) = {
    val m = new ExtractMetrics()
    val observed = m.observe(df, Extract.qualityPred)
    (observed.filter(Extract.qualityPred).drop("quality_flag", "degrade_flag"), m)
  }
}
