package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, Q}

/** Driver contract — see /root/repo/SURVEY.md §2/§6 + the builder prompt.
  * Every declared operator has a `queries` entry; SQL-expressible ones also
  * have an `oracleSql` entry (column names aliased identically on both
  * sides, deterministic ORDER BY everywhere).
  */
object SparkEntry {

  private def modules: Seq[Q] =
    CoreQueries.defs ++ AnalyticsQueries.defs ++
      graft.queries.TemporalQueries.defs ++
      graft.queries.PipelineQueries.defs ++ graft.queries.SourceQueries.defs ++
      graft.queries.EvalQueries.defs ++ graft.queries.AuditQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check; those have ScalaTest oracles). */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
