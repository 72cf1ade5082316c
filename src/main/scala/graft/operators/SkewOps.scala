package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large equi-joins — the manual salting
  * pattern for when AQE's skew-join split isn't available or a key is so
  * hot that one partition still holds one key's entire row set.
  *
  * Mechanics: the skewed (probe) side gets a deterministic salt in
  * [0, salts) derived from a row-unique column, widening one hot join key
  * into `salts` shuffle keys; the build side is replicated `salts`× (one
  * copy per salt value) so every (key, salt) pair still meets its match.
  * Join output is EXACTLY the plain equi-join — salting only changes the
  * partitioning, which is why the declared query's oracle is the plain
  * join SQL.
  *
  * Cost model: build-side shuffle volume × salts in exchange for the hot
  * key's rows spreading over `salts` tasks — worth it when the probe
  * side's hottest key exceeds a task's capacity, waste otherwise (prefer
  * AQE skew handling when its thresholds catch the skew; this operator is
  * the deterministic, always-available fallback, and the (key, salt)
  * repartitioning it produces is also the standard recipe inside
  * iterative algorithms that AQE cannot re-plan mid-loop).
  */
object SkewOps {

  /** Salted inner equi-join of `probe` (skewed side) with `build`
    * (replicated side).
    *
    * @param saltOn row-unique probe column (e.g. a primary key) — salts
    *   must spread a hot key's rows, so they must vary WITHIN the key
    * @param salts replication factor; hot-key rows per task shrink ~salts× */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame,
                     probeKey: String, buildKey: String,
                     saltOn: Column, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salt = Cols.fresh("_salt", probe.columns ++ build.columns)
    val p = probe.withColumn(salt, pmod(xxhash64(saltOn), lit(salts.toLong)))
    val b = build.withColumn(salt,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    p.join(b, p(probeKey) === b(buildKey) && p(salt) === b(salt))
      .drop(salt)
  }

  /** Join-key skew diagnostics — the "should I salt this join?" gate run
    * BEFORE committing to [[saltedEquiJoin]]'s replication cost (or to
    * trusting AQE): one row of concentration measures over the key
    * distribution. `top1_share` = hottest key's row fraction (directly:
    * can one task hold it?); `hhi` = Σ(c/N)² (Herfindahl — 1/n_keys when
    * uniform, →1 when one key dominates); `cv` = coefficient of variation
    * of key counts (0 uniform, grows with imbalance).
    *
    * Scale shape: one map-side-combined count shuffle (key-cardinality-
    * sized), then a single 1-row aggregate of EXACT integer moments
    * (Σc, Σc², max, count) — partitioning-invariant with no ordered
    * fold; derived ratios are single IEEE ops on those exact integers,
    * so they hash-verify. Σc² stays in int64 — exact to ~3·10⁹ rows
    * (the KS cross-product stance); beyond that lift the moments to
    * decimal. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val cnt = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val nR = col("n_rows").cast("double")
    val ssD = col("ss").cast("double")
    cnt.agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("c")).as("max_cnt"), sum(col("c") * col("c")).as("ss"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("max_cnt").cast("double") / nR, 6).as("top1_share"),
        round(ssD / (nR * nR), 6).as("hhi"),
        round(sqrt(col("n_keys").cast("double") * ssD - nR * nR) / nR, 6)
          .as("cv"))
  }

  /** DuckDB oracle for [[keySkew]] — identical integer moments and IEEE
    * ratio tree. */
  def keySkewSql(table: String, keyExpr: String): String =
    s"WITH c AS (SELECT $keyExpr AS k, CAST(count(*) AS BIGINT) AS c " +
      s"FROM $table GROUP BY k), " +
      "a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, " +
      "CAST(count(*) AS BIGINT) AS n_keys, " +
      "CAST(max(c) AS BIGINT) AS max_cnt, " +
      "CAST(sum(c * c) AS BIGINT) AS ss FROM c) " +
      "SELECT n_rows, n_keys, max_cnt, " +
      "round(CAST(max_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top1_share, " +
      "round(CAST(ss AS DOUBLE) / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6) AS hhi, " +
      "round(sqrt(CAST(n_keys AS DOUBLE) * CAST(ss AS DOUBLE) - " +
      "CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) / CAST(n_rows AS DOUBLE), 6) AS cv " +
      "FROM a"
}
