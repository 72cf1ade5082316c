package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust / order-statistics operators (SURVEY §2.2).
  *
  * The reference pipeline's quality gates are plain threshold filters
  * (gedixr extract.py:303-339); production metric pipelines additionally
  * need data-driven thresholds that survive outliers. These operators keep
  * every per-group statistic EXACT (nested medians, not approximations) and
  * keep the fact table out of every shuffle: the group-level statistics
  * frames are tiny and broadcast back onto narrow scans.
  */
object StatsOps {

  /** Per-group median/MAD outlier profile: for each group, the exact
    * median of `valueCol`, the exact median absolute deviation, and the
    * count of rows with |x - median| > k * MAD (the robust z-score gate —
    * ~3 sigma for normal data at k = 4.45, but MAD-based so a single
    * corrupt feed can't drag the threshold the way mean/stddev gates do).
    *
    * Exact nested medians are inherently two passes (the deviation
    * distribution doesn't exist until the first median is known); each
    * pass is one map-side-combined percentile aggregate whose output is
    * group-count sized, broadcast back onto a narrow scan — the fact rows
    * never shuffle on the group key a second time. All arithmetic on the
    * threshold compare is single-op IEEE (sub/abs/mult), so the boundary
    * rows agree bit-for-bit with the DuckDB oracle.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("_dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("percentile(_dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("med")), 6).as("med"),
        round(min(col("mad")), 6).as("mad"),
        sum(when(col("_dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
