package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.plans.PointIntervalJoin

/** Range-join operators backed by the custom PointIntervalJoin plan
  * (graft.plans.RangeJoinPlan). Sessions must have GraftStrategies
  * registered (GraftExtensions does it). */
object RangeJoin {

  /** Inner join `points.tCol BETWEEN intervals.loCol AND intervals.hiCol`.
    * The intervals side is broadcast (must be small); all three columns
    * must share one internal integral encoding (timestamp/timestamp,
    * date/date, long/long). Output = points columns ++ intervals columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tCol: String, loCol: String, hiCol: String): DataFrame = {
    // self-register the planner strategy (idempotent) so the operator works
    // in any session, not only ones built with GraftExtensions
    graft.plans.GraftExtensions.register(points.sparkSession)
    val lp = PlanBridge.analyzedPlan(points)
    val rp = PlanBridge.analyzedPlan(intervals)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column '$n' not found"))
    PlanBridge.ofRows(points.sparkSession,
      PointIntervalJoin(lp, rp, attr(lp, tCol), attr(rp, loCol), attr(rp, hiCol)))
  }
}
