package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: every `PointInPolygon(x, y, poly)` predicate implies
  * `x ∈ [minx, maxx] && y ∈ [miny, maxy]` — the polygon's envelope. The
  * ray-cast itself can never reach a parquet scan, but the implied range
  * conjuncts can: they push to row-group statistics, so at 100 TB a
  * spatial subset skips every file/row-group outside the AOI envelope
  * WITHOUT the user writing the bbox pre-filter by hand (gedixr users
  * never did — geopandas did it for them).
  *
  * The added conjuncts are implied by the PIP predicate, so semantics are
  * unchanged; idempotence (optimizer rules run to fixpoint) is ensured by
  * skipping conjuncts already semantically present.
  */
object PipBboxPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def envelope(p: Exprs.PointInPolygon): Seq[Expression] = {
    val xs = p.poly.map(_._1)
    val ys = p.poly.map(_._2)
    Seq(
      GreaterThanOrEqual(p.left, Literal(xs.min)),
      LessThanOrEqual(p.left, Literal(xs.max)),
      GreaterThanOrEqual(p.right, Literal(ys.min)),
      LessThanOrEqual(p.right, Literal(ys.max)))
  }

  private def contains(cond: Expression, pred: Expression): Boolean =
    cond.exists(_.semanticEquals(pred))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // Only a PIP that IS a top-level conjunct implies its envelope for the
      // whole filter. A PIP under Not/Or (e.g. `!pip`, `pipA || pipB`) does
      // NOT — adding its bbox there would wrongly drop rows, so those are
      // left untouched.
      val pips = splitConjunctivePredicates(cond).collect {
        case p: Exprs.PointInPolygon => p
      }
      val missing = pips.flatMap(envelope).filterNot(contains(cond, _))
      if (missing.isEmpty) f
      else Filter(missing.foldLeft(cond)(And(_, _)), child)
  }
}
