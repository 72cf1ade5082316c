package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def points = Tables.load(spark, sfDir, "lineitem")
    .filter(col("l_linenumber") === 1)
    .select(col("l_orderkey").as("pk"), col("l_shipdate").as("ts"))

  private def intervals = Tables.load(spark, sfDir, "orders")
    .filter(col("o_orderkey") % 50 === 0)
    .select(col("o_orderkey").as("ik"), col("o_orderdate").as("lo"),
      (col("o_orderdate") + expr("INTERVAL 45 DAYS")).as("hi"))

  test("PointIntervalJoinExec replaces the nested-loop join in the plan") {
    val joined = RangeJoin.pointInInterval(points, intervals, "ts", "lo", "hi")
    val plan = joined.queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the Exec suffix when printing
    assert(plan.contains("PointIntervalJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("range join matches the built-in BETWEEN join exactly") {
    val custom = RangeJoin.pointInInterval(points, intervals, "ts", "lo", "hi")
      .select("ik", "pk", "ts").orderBy("ik", "pk").collect().toSeq
    val builtin = points.join(intervals,
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("ik", "pk", "ts").orderBy("ik", "pk").collect().toSeq
    assert(custom.nonEmpty)
    assert(custom === builtin)
  }

  test("nulls and empty interval sets behave like inner-join BETWEEN") {
    import spark.implicits._
    val p = Seq((1L, Option(10L)), (2L, None), (3L, Option(100L)))
      .toDF("pk", "ts")
    val i = Seq((7L, Option(5L), Option(15L)), (8L, None, Option(20L)))
      .toDF("ik", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, i, "ts", "lo", "hi")
      .select("pk", "ik").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 7L))) // null ts / null lo never match
    val none = RangeJoin.pointInInterval(p, i.filter(col("ik") < 0), "ts", "lo", "hi")
    assert(none.count() === 0)
  }

  test("oversized build side fails loudly instead of OOMing the driver") {
    spark.conf.set("spark.graft.rangeJoin.maxBuildRows", "100")
    try {
      val big = RangeJoin.pointInInterval(
        points, Tables.load(spark, sfDir, "orders")
          .select(col("o_orderkey").as("ik"), col("o_orderdate").as("lo"),
            (col("o_orderdate") + expr("INTERVAL 45 DAYS")).as("hi")),
        "ts", "lo", "hi")
      val e = intercept[Exception] { big.count() }
      def root(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else root(t.getCause)
      val msg = e.getMessage + " / " + root(e).getMessage
      assert(msg.contains("maxBuildRows"), msg)
    } finally spark.conf.unset("spark.graft.rangeJoin.maxBuildRows")
  }
}
