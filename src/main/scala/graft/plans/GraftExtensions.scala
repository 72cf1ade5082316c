package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData

/** SparkSessionExtensions packaging: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_char_hash(text) ...")`
  * works from pure SQL (and from any SQL-speaking client of a cluster
  * configured with `spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => PipBboxPushdown)
    ext.injectPlannerStrategy(_ => GraftStrategies)
  }
}

object GraftExtensions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples for injectFunction. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_char_hash"),
      info(classOf[Exprs.CharHash], "graft_char_hash", "graft_char_hash(str) - portable polynomial hash"),
      (es: Seq[Expression]) => Exprs.CharHash(es.head)),
    (FunctionIdentifier("graft_token_codes"),
      info(classOf[Exprs.TokenCodes], "graft_token_codes", "graft_token_codes(str) - per-token hash codes"),
      (es: Seq[Expression]) => Exprs.TokenCodes(es.head)),
    (FunctionIdentifier("graft_minhash_sig"),
      info(classOf[Exprs.MinHashSig], "graft_minhash_sig", "graft_minhash_sig(codes, k) - MinHash signature"),
      (es: Seq[Expression]) => {
        val ps = graft.functions.TextFunctions.mhParams(litInt(es(1), "k"))
        Exprs.MinHashSig(es.head, ps.map(_._1), ps.map(_._2))
      }),
    (FunctionIdentifier("graft_simhash"),
      info(classOf[Exprs.SimHash], "graft_simhash", "graft_simhash(codes, bits) - SimHash value"),
      (es: Seq[Expression]) => Exprs.SimHash(es.head, litInt(es(1), "bits"))),
    (FunctionIdentifier("graft_dot"),
      info(classOf[Exprs.DotFold], "graft_dot", "graft_dot(a, b) - strict-fold float-array dot product"),
      (es: Seq[Expression]) => Exprs.DotFold(es(0), es(1))),
    (FunctionIdentifier("graft_point_in_polygon"),
      info(classOf[Exprs.PointInPolygon], "graft_point_in_polygon",
        "graft_point_in_polygon(x, y, array(x1,...), array(y1,...)) - ray-cast containment"),
      (es: Seq[Expression]) => {
        val xs = litDoubles(es(2), "polygon xs")
        val ys = litDoubles(es(3), "polygon ys")
        require(xs.length == ys.length && xs.length >= 3,
          "polygon arrays must have equal length >= 3")
        Exprs.PointInPolygon(es(0), es(1), xs.zip(ys))
      }))

  /** Evaluate a foldable array expression to its double values. */
  private def litDoubles(e: Expression, what: String): Seq[Double] = {
    require(e.foldable, s"$what must be a literal array")
    e.eval(null).asInstanceOf[ArrayData].toDoubleArray().toSeq
  }

  /** Register directly on a live session (tests / notebooks). The
    * optimizer rule goes through the public experimental hook since
    * injectOptimizerRule only applies at session construction. */
  def register(spark: SparkSession): Unit = {
    descriptions.foreach { case (id, fInfo, builder) =>
      org.apache.spark.sql.graftbridge.PlanBridge
        .registerFunction(spark, id, fInfo, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(PipBboxPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PipBboxPushdown
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
  }
}
