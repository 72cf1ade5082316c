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
}
