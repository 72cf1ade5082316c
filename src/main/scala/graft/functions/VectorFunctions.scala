package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.plans.Exprs

/** Embedding-vector primitives for similarity search (SURVEY §2.3).
  *
  * Like TextFunctions, every op has a Spark `Column` form and a DuckDB SQL
  * form with the *identical* operation tree: float components are cast to
  * double (exact), products are summed by a strict left fold starting at
  * 0.0, so both engines produce bit-identical IEEE doubles and the ANN
  * queries can be fully hash-verified (ranking ties resolve identically).
  */
object VectorFunctions {

  /** Strict left-fold dot product of two float-array columns (as double).
    * Native codegen'd expression; dotHof remains for the equivalence spec. */
  def dot(a: Column, b: Column): Column =
    PlanBridge.column(Exprs.DotFold(PlanBridge.expression(a), PlanBridge.expression(b)))

  /** The original higher-order-function fold (spec oracle). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** L2 norm via the same strict fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))
  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Cosine similarity with the exact same expression tree on both sides. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Deterministic integer-valued random hyperplane p over `dims` dims:
    * seeded-PRNG components in [-8, 8]. The values are materialized as
    * plan-time literals on BOTH sides (Spark typedLit, DuckDB list
    * literal), so the generator never needs to be SQL-expressible, and
    * integral doubles ensure the two engines agree exactly. */
  def plane(p: Int, dims: Int): Seq[Long] = {
    val r = new scala.util.Random(1234567L * (p + 1))
    Seq.fill(dims)((r.nextInt(17) - 8).toLong)
  }

  /** Signed projection of v onto hyperplane p (strict fold, native). */
  def planeDot(v: Column, p: Int, dims: Int): Column =
    PlanBridge.column(Exprs.DotConst(PlanBridge.expression(v),
      plane(p, dims).map(_.toDouble)))

  def planeDotSql(v: String, p: Int, dims: Int): String = {
    val pl = plane(p, dims).mkString("[", ", ", "]")
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, $dims + 1), " +
      s"i -> CAST($v[i] AS DOUBLE) * CAST($pl[i] AS DOUBLE))), (x, y) -> x + y)"
  }

  /** Random-hyperplane LSH band key: `rowsPerBand` sign bits packed into an
    * int, for band `j` of a `bits`-plane signature. */
  def hyperBandKey(v: Column, band: Int, rowsPerBand: Int, dims: Int): Column =
    (0 until rowsPerBand).map { i =>
      val p = band * rowsPerBand + i
      when(planeDot(v, p, dims) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  def hyperBandKeySql(v: String, band: Int, rowsPerBand: Int, dims: Int): String =
    (0 until rowsPerBand).map { i =>
      val p = band * rowsPerBand + i
      s"(CASE WHEN ${planeDotSql(v, p, dims)} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
