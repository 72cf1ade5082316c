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

  private def regs(df: org.apache.spark.sql.DataFrame, p: Int): Map[Long, Int] =
    graft.operators.StatsOps.hllRegisters(df, "k", p)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("hllRegisters obey the mergeable-sketch law: regs(A∪B) == max-merge of parts") {
    import spark.implicits._
    val a = (1 to 4000).map(i => s"key_a_$i").toDF("k")
    val b = (2000 to 6000).map(i => s"key_a_$i").toDF("k") // overlaps a
    val merged = regs(a, 9).foldLeft(regs(b, 9)) { case (acc, (bk, r)) =>
      acc.updated(bk, math.max(r, acc.getOrElse(bk, 0)))
    }
    assert(regs(a.unionByName(b), 9) === merged)
    // registers stay sketch-sized
    assert(merged.size <= 512)
  }

  test("hllEstimate lands within the rsd bound on the real composite key") {
    val keyed = Tables.load(spark, sfDir, "events")
      .select(concat(col("user_id").cast("string"), lit("\t"),
        col("props")).as("k"))
    val exact = keyed.distinct().count().toDouble
    val est = graft.operators.StatsOps.hllEstimate(
        graft.operators.StatsOps.hllRegisters(keyed, "k", p = 9), p = 9)
      .collect()(0).getDouble(3)
    // rsd(p=9) = 1.04/sqrt(512) ~ 4.6%; allow 3x
    assert(math.abs(est - exact) <= 3 * 0.046 * exact,
      s"est=$est exact=$exact")
  }

  test("hllEstimate uses linear counting in the sparse regime, exactly") {
    import spark.implicits._
    // 30 distinct keys << 2.5m: raw estimate would bias high, linear
    // counting is near-exact
    val small = (1 to 30).map(i => s"s$i").toDF("k")
    val row = graft.operators.StatsOps.hllEstimate(regsDf(small, 9), 9)
      .collect()(0)
    val (m, nb, est) = (row.getInt(0), row.getLong(1), row.getDouble(3))
    assert(m === 512)
    // linear counting formula reproduced exactly from the register count
    val want = m.toDouble * math.log(m.toDouble / (m - nb).toDouble)
    assert(est === want)
    assert(math.abs(est - 30.0) <= 2.0)
  }

  private def regsDf(df: org.apache.spark.sql.DataFrame, p: Int) =
    graft.operators.StatsOps.hllRegisters(df, "k", p)

  private def kmvSet(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
    graft.operators.StatsOps.kmvSketch(df, "g", "k", k)
      .select("hv").collect().map(_.getLong(0)).toSet

  test("kmvSketch obeys the mergeable-sketch law: bottomK(A∪B) == bottomK(parts' sketches)") {
    import spark.implicits._
    val a = (1 to 4000).map(i => ("g", s"key_a_$i")).toDF("g", "k")
    val b = (2000 to 6000).map(i => ("g", s"key_a_$i")).toDF("g", "k")
    val whole = kmvSet(a.unionByName(b), 64)
    // merge = dedup the union of the part sketches, keep the 64 smallest
    val merged = (kmvSet(a, 64) ++ kmvSet(b, 64)).toSeq.sorted.take(64).toSet
    assert(whole === merged)
    assert(whole.size === 64)
  }

  test("kmvSketch is exact below saturation and ranks are dense") {
    import spark.implicits._
    val small = (1 to 40).map(i => ("g", s"s$i")).toDF("g", "k")
    val rows = graft.operators.StatsOps.kmvSketch(small, "g", "k", 64)
      .orderBy("rn").collect()
    assert(rows.length === 40) // unsaturated: every distinct hash kept
    assert(rows.map(_.getInt(2)).toSeq === (1 to 40))
    // sorted ascending by hash value
    val hvs = rows.map(_.getLong(1)).toSeq
    assert(hvs === hvs.sorted)
  }

  test("kmvEstimate is exact when unsaturated, within 3*rsd when saturated") {
    import spark.implicits._
    val small = (1 to 40).map(i => ("g", s"s$i")).toDF("g", "k")
    val eSmall = graft.operators.StatsOps.kmvEstimate(
        graft.operators.StatsOps.kmvSketch(small, "g", "k", 64), "g", 64)
      .collect()(0)
    assert(eSmall.getInt(1) === 40)
    assert(eSmall.getDouble(3) === 40.0)

    val big = (1 to 5000).map(i => ("g", s"key_b_$i")).toDF("g", "k")
    val eBig = graft.operators.StatsOps.kmvEstimate(
        graft.operators.StatsOps.kmvSketch(big, "g", "k", 64), "g", 64)
      .collect()(0)
    // rsd(KMV, k=64) ~ 1/sqrt(k-2) ~ 12.7%; allow 3x
    assert(math.abs(eBig.getDouble(3) - 5000.0) <= 3 * 0.127 * 5000.0,
      s"est=${eBig.getDouble(3)}")
  }
}
