package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-sequence operators (SURVEY §2.2): per-entity behavioral
  * sequences as strings, regex sequence matching (the ClickHouse
  * `sequenceMatch` / Splunk `transaction` analytics shape) and common-path
  * mining. The reference's per-granule shot ordering (extract.py:299 stamps
  * acq_time on every shot) is the same per-key time-ordered fold.
  *
  * Both operators reduce each entity's history to a STRING of one-char
  * event codes in strict (ts, tie) order, then run plain string machinery
  * — the pattern step is a regex on a per-user-bounded string, not a
  * self-join chain, so adding a stage to the pattern costs nothing
  * (q_funnel's per-stage semi-join chain pays one join per stage).
  */
object SequenceOps {

  /** Per-entity ordered code string. One key shuffle; the collected state
    * is bounded by the per-entity history length (the sessionize bound —
    * see SURVEY §5; entities are users/devices, whose histories are
    * short relative to the corpus). Order inside the group is made total
    * by sorting collected (sortUs, tie, code) structs — collect_list
    * order is partitioning-dependent, the sort makes it deterministic. */
  def codeSequences(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, codeCol: Column): DataFrame =
    df.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("us"),
        col(tieCol).as("tie"), codeCol.as("code"))
      .groupBy(col("k").as("user_id"))
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(us, tie, code))), x -> x.code)"),
          "").as("seq"),
        count(lit(1)).as("n_events"))

  /** DuckDB twin of [[codeSequences]]: ordered string_agg. The code
    * expression is a third ORDER BY key, mirroring the Spark struct
    * sort's (us, tie, code) total order — without it, ties on
    * (ts, tie) would leave the DuckDB ordering unspecified. */
  def codeSequencesSql(table: String, keyExpr: String, tsExpr: String,
                       tieExpr: String, codeExpr: String): String =
    s"SELECT $keyExpr AS user_id, " +
      s"string_agg($codeExpr, '' ORDER BY $tsExpr, $tieExpr, $codeExpr) AS seq, " +
      s"CAST(count(*) AS BIGINT) AS n_events FROM $table GROUP BY $keyExpr"

  /** Sequence pattern matching: for each entity, whether its ordered code
    * string matches each named regex (partial-match semantics on both
    * engines — Spark `rlike` and DuckDB `regexp_matches` both search, not
    * anchor). Patterns must stay in the RE2 ∩ java.util.regex common
    * subset: literals, classes, `.`/`*`/`+`/`{m,n}`, alternation — no
    * backreferences or lookaround. */
  def seqMatch(seqs: DataFrame, patterns: Seq[(String, String)]): DataFrame =
    patterns.foldLeft(seqs) { case (acc, (name, re)) =>
      acc.withColumn(name, col("seq").rlike(re))
    }

  /** DuckDB twin of [[seqMatch]] over a codeSequences subquery. */
  def seqMatchSql(seqSub: String, patterns: Seq[(String, String)]): String = {
    val flags = patterns
      .map { case (name, re) => s"regexp_matches(seq, '$re') AS $name" }
      .mkString(", ")
    s"SELECT user_id, seq, n_events, $flags FROM ($seqSub) seqs"
  }

  /** Common-path mining: the first `n` events of each entity as a path
    * string, counted across entities — "how do users start" funnels
    * without fixing the stages in advance. The prefix is cut BEFORE the
    * collect (row_number ≤ n per key), so the aggregation state is
    * n-bounded regardless of history length — the shape that survives
    * power users with million-event histories at 100 TB. Output is
    * path-domain-sized (≤ |codes|^n rows). */
  def eventPaths(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, codeCol: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("us", "tie")
    df.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("us"),
        col(tieCol).as("tie"), codeCol.as("code"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .groupBy("k")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(rn, code))), x -> x.code)"),
        "").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB twin of [[eventPaths]]. */
  def eventPathsSql(table: String, keyExpr: String, tsExpr: String,
                    tieExpr: String, codeExpr: String, n: Int): String =
    s"WITH r AS (SELECT $keyExpr AS k, $codeExpr AS code, " +
      s"row_number() OVER (PARTITION BY $keyExpr ORDER BY $tsExpr, $tieExpr) AS rn " +
      s"FROM $table), " +
      s"p AS (SELECT k, string_agg(code, '' ORDER BY rn) AS path FROM r " +
      s"WHERE rn <= $n GROUP BY k) " +
      s"SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY path"
}
