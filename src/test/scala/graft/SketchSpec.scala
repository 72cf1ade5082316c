package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates (their CORRECTNESS entries are
  * rows-only — these specs are the accuracy oracle). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per event_type") {
    val ev = Tables.load(spark, sfDir, "events")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, e) =>
      val a = approx(t)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$t: approx=$a exact=$e")
    }
  }

  test("approx_percentile is within rank error of exact quantiles") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val values = li.select("l_returnflag", "l_quantity").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    // GK sketch with accuracy 10000 guarantees rank error <= n/10000
    values.foreach { case (flag, sorted) =>
      val n = sorted.length
      val tol = math.max(1, n / 10000)
      Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (p, i) =>
        val got = approx(flag)(i)
        // values are discrete with heavy ties: the returned value covers
        // the rank interval [count(<v), count(<=v)]; the target rank must
        // fall in it (widened by the sketch tolerance)
        val lo = sorted.count(_ < got) - tol - 1
        val hi = sorted.count(_ <= got) + tol + 1
        val target = p * n
        assert(target >= lo && target <= hi,
          s"$flag p$p: value=$got rankRange=[$lo,$hi] target=$target n=$n")
      }
    }
  }
}
