package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (SURVEY §2.3) — the relational
  * side of the scrub that [[TextOps.redact]] does inside document text:
  * before a curated dataset (or its per-source statistics) leaves the
  * pipeline, quasi-identifier combinations that single out fewer than k
  * individuals must not survive in the clear.
  */
object PrivacyOps {

  /** k-anonymity suppression over a quasi-identifier column set (Sweeney
    * 2002): equivalence classes (distinct quasi-value combinations) with
    * fewer than `k` rows are SUPPRESSED — every quasi column collapses to
    * `"*"` — and the suppressed classes merge into one residual row, so
    * the release states how many rows were withheld without revealing
    * their (identifying) key combination. Classes with ≥ k rows release
    * their exact count: every released non-residual row is guaranteed to
    * describe at least k individuals.
    *
    * Scale shape: one map-side-combined groupBy on the quasi key builds
    * the equivalence classes (the only corpus-sized shuffle); the
    * suppression re-group runs on the CLASS frame (distinct combinations,
    * domain-bounded). All integer. Nulls are real class values here —
    * a null quasi value is itself a combination to protect — so they are
    * compared null-safely (both engines group nulls together) and
    * released as the string "null" to keep the output schema string-typed
    * on both engines.
    *
    * Sentinel collisions: a RELEASED class whose quasi value is the
    * literal string "*" would merge with the suppression residual and be
    * mis-reported as withheld — the operator REFUSES such data (one
    * domain-bounded check on the class frame; rename the value
    * upstream). A real NULL and the literal string "null" DO merge into
    * one released class — that collision only ever ENLARGES a class
    * (never splits one below k), so it is privacy-safe and accepted as
    * the release format.
    *
    * Output: (quasi..., n_rows, suppressed), quasi columns as strings. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymize needs at least one quasi column")
    require(k >= 2, "k must be >= 2 (k=1 releases everything)")
    val classes = df
      .groupBy(quasiCols.map(c =>
        coalesce(col(c).cast("string"), lit("null")).as(c)): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // class frame (domain-bounded): guard + release
    val starred = classes.filter(col("n") >= k &&
      quasiCols.map(c => col(c) === "*").reduce(_ || _)).limit(1).count()
    require(starred == 0L,
      "kAnonymize: a released class carries the literal quasi value \"*\" " +
        "(it would merge with the suppression residual) — rename it upstream")
    classes
      .select(quasiCols.map(c =>
        when(col("n") >= k, col(c)).otherwise(lit("*")).as(c)) :+ col("n"): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("n")).as("n_rows"))
      .withColumn("suppressed", col(quasiCols.head) === "*")
      .orderBy(quasiCols.map(col): _*)
  }

  /** DuckDB oracle for [[kAnonymize]] — identical class build,
    * suppression collapse and residual re-group. `quasi` pairs each SQL
    * expression with its output name (MUST equal the Spark column name). */
  def kAnonymizeSql(table: String, quasi: Seq[(String, String)], k: Int): String = {
    val names = quasi.map(_._2)
    val qsel = quasi
      .map { case (e, n) => s"coalesce(CAST($e AS VARCHAR), 'null') AS $n" }
      .mkString(", ")
    val star = names.map(n => s"CASE WHEN n >= $k THEN $n ELSE '*' END AS $n")
      .mkString(", ")
    val glist = names.mkString(", ")
    s"WITH classes AS (SELECT $qsel, CAST(count(*) AS BIGINT) AS n " +
      s"FROM $table GROUP BY $glist), " +
      s"marked AS (SELECT $star, n FROM classes) " +
      s"SELECT $glist, CAST(sum(n) AS BIGINT) AS n_rows, " +
      s"(${names.head} = '*') AS suppressed " +
      s"FROM marked GROUP BY $glist ORDER BY $glist"
  }
}
