package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, StatsOps, Temporal}

/** Closed-form invariants for the r10 eval/drift/ranking operators —
  * the oracle hash-proves engine agreement; these pin the MATH against
  * hand-computable cases. */
class EvalOpsSpec extends SparkSpec {

  test("cohensKappa: perfect agreement gives kappa 1, independence gives ~0") {
    import spark.implicits._
    val same = Seq((1L, 1L), (1L, 1L), (0L, 0L), (0L, 0L)).toDF("a", "b")
    val k1 = StatsOps.cohensKappa(same, "a", "b").collect()(0)
    assert(k1.getAs[Double]("po") === 1.0)
    assert(k1.getAs[Double]("kappa") === 1.0)
    // independent raters: po == pe by construction -> kappa 0
    val indep = Seq((1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L)).toDF("a", "b")
    val k0 = StatsOps.cohensKappa(indep, "a", "b").collect()(0)
    assert(k0.getAs[Double]("kappa") === 0.0)
  }

  test("psi: identical populations give psi 0") {
    import spark.implicits._
    // both sides carry the identical bin histogram -> p == q in every
    // bin, every cell is (p-q)ln(p/q) = 0
    val rows = for (b <- 0L until 5L; s <- Seq(0L, 1L); _ <- 1 to 3)
      yield ("g", b, s)
    val df = rows.toDF("grp", "bin", "side")
    val got = StatsOps.psi(df, "grp", "bin", "side", bins = 5).collect()(0)
    assert(got.getAs[Long]("n_ref") === 15L && got.getAs[Long]("n_cur") === 15L)
    assert(math.abs(got.getAs[Double]("psi")) < 1e-9)
  }

  test("groupAuc: perfect separation gives 1, reversed gives 0, all-ties 0.5") {
    import spark.implicits._
    def auc(rows: Seq[(String, Long, Long)]): Double =
      StatsOps.groupAuc(rows.toDF("grp", "b", "y"), "grp", "b", "y")
        .collect()(0).getAs[Double]("auc")
    // positives all in higher buckets than negatives
    assert(auc(Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 8L, 1L), ("g", 9L, 1L))) === 1.0)
    assert(auc(Seq(("g", 8L, 0L), ("g", 9L, 0L), ("g", 1L, 1L), ("g", 2L, 1L))) === 0.0)
    // every row in ONE bucket: pure mid-rank ties
    assert(auc(Seq(("g", 5L, 0L), ("g", 5L, 1L), ("g", 5L, 0L), ("g", 5L, 1L))) === 0.5)
  }

  test("rbo: identical rankings give 1, disjoint give 0") {
    import spark.implicits._
    val ident = (1L to 30L).map(i => (i, 100L - i, 100L - i)).toDF("id", "ma", "mb")
    val r1 = StatsOps.rbo(ident, "id", col("ma"), col("mb"), depth = 10)
      .collect()(0)
    assert(r1.getAs[Double]("rbo") === 1.0 - math.round(math.pow(0.9, 10) * 1e6) / 1e6
      || math.abs(r1.getAs[Double]("rbo") - (1.0 - math.pow(0.9, 10))) < 1e-5)
    // metric B exactly reverses metric A: top-10 sets are disjoint (30 ids)
    val rev = (1L to 30L).map(i => (i, 100L - i, i)).toDF("id", "ma", "mb")
    val r0 = StatsOps.rbo(rev, "id", col("ma"), col("mb"), depth = 10)
      .collect()(0)
    assert(r0.getAs[Double]("rbo") === 0.0)
    assert(r0.getAs[Long]("n_both") === 0L)
  }

  test("timeWeightedAvg: hand-computed holding intervals") {
    import spark.implicits._
    // key g: value 10 held 2s, value 20 held 1s, last sample drops
    // TWA = (10*2e6 + 20*1e6) / 3e6 = 13.333333
    val df = Seq(
      ("g", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1L, 10.0),
      ("g", java.sql.Timestamp.valueOf("2020-01-01 00:00:02"), 2L, 20.0),
      ("g", java.sql.Timestamp.valueOf("2020-01-01 00:00:03"), 3L, 99.0))
      .toDF("k", "ts", "tie", "v")
    val got = Temporal.timeWeightedAvg(df, "k", "ts", "tie", "v").collect()(0)
    assert(got.getAs[Long]("span_us") === 3000000L)
    assert(got.getAs[Double]("twa") === 13.333333)
  }

  test("ohlcBars: duplicate-timestamp election is tie-broken deterministically") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2020-01-01 05:30:00")
    val df = Seq(
      ("g", t, 2L, 7.0), ("g", t, 1L, 3.0), // same ts: tie 1 opens
      ("g", java.sql.Timestamp.valueOf("2020-01-01 05:45:00"), 3L, 5.0))
      .toDF("k", "ts", "tie", "v")
    val got = Temporal.ohlcBars(df, "k", "ts", "tie", "v").collect()(0)
    assert(got.getAs[Double]("open") === 3.0)   // tie 1 at the shared ts
    assert(got.getAs[Double]("close") === 5.0)
    assert(got.getAs[Double]("high") === 7.0 && got.getAs[Double]("low") === 3.0)
    assert(got.getAs[Long]("n_rows") === 3L)
  }

  test("overlapPrefixJoin: pair set EQUALS the brute-force quadratic policy") {
    import spark.implicits._
    // doc texts engineered around the 1/4 threshold; same block
    val docs = Seq(
      (1L, "a b c d e f g h"),       // grams: ab bc cd de ef fg gh (7)
      (2L, "a b c x y z q r"),       // shares ab bc -> inter 2, min 7 -> 8>=7 pass
      (3L, "p q r s t u v w"),       // disjoint from 1
      (4L, "a b c d e f g h i"),     // near-dup of 1 (inter 7, min 7) pass
      (5L, "zz yy xx ww vv uu tt ss")) // disjoint
      .map { case (id, t) => (id, t, "s1") }
      .toDF("doc_id", "text", "source")
    val got = Dedup.overlapPrefixJoin(docs, "doc_id", "text", "source")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same gram sets
    def grams(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val all = Seq(1L -> "a b c d e f g h", 2L -> "a b c x y z q r",
      3L -> "p q r s t u v w", 4L -> "a b c d e f g h i",
      5L -> "zz yy xx ww vv uu tt ss")
    val expect = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      ga = grams(ta); gb = grams(tb)
      inter = (ga & gb).size
      if inter * 4 >= math.min(ga.size, gb.size)
    } yield (ia, ib)).toSet
    assert(got === expect, s"got $got expect $expect")
    assert(got.contains((1L, 4L)) && got.contains((1L, 2L)))
  }
}
