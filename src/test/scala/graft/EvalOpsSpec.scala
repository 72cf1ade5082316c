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

  test("fleissKappa: unanimous items give kappa 1; singletons drop") {
    import spark.implicits._
    // two items, 3 raters each, all unanimous (different categories so
    // pe < 1); a singleton item (one rating) must not count
    val rows = Seq((1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "y"), (2L, "y"), (2L, "y"), (3L, "z"))
    val got = StatsOps.fleissKappa(rows.toDF("it", "cat"), "it", "cat")
      .collect()(0)
    assert(got.getAs[Long]("n_items") === 2L)
    assert(got.getAs[Long]("n_ratings") === 6L)
    assert(got.getAs[Double]("p_bar") === 1.0)
    assert(got.getAs[Double]("kappa") === 1.0)
  }

  test("fleissKappa: matches the hand-computed Fleiss value on mixed raters") {
    import spark.implicits._
    // item 1 (n=3): 2 x, 1 y -> S=5, P_1=(5-3)/6=1/3
    // item 2 (n=2): 1 x, 1 y -> S=2, P_2=(2-2)/2=0
    // pbar=(1/3+0)/2=1/6; c_x=3, c_y=2, N=5 -> pe=(9+4)/25=0.52
    // kappa=(1/6-0.52)/(1-0.52)=-0.736111
    val rows = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val got = StatsOps.fleissKappa(rows.toDF("it", "cat"), "it", "cat")
      .collect()(0)
    assert(got.getAs[Double]("p_bar") === 0.166667)
    assert(got.getAs[Double]("p_e") === 0.52)
    assert(math.abs(got.getAs[Double]("kappa") - (-0.736111)) < 1e-6)
  }

  test("mcnemar: symmetric disagreement gives 0; no disagreement gives null") {
    import spark.implicits._
    val sym = Seq((1L, 0L), (0L, 1L), (1L, 1L), (0L, 0L)).toDF("a", "b")
    val g = StatsOps.mcnemar(sym, "a", "b").collect()(0)
    assert(g.getAs[Long]("n10") === 1L && g.getAs[Long]("n01") === 1L)
    assert(g.getAs[Double]("mcnemar") === 0.0)
    // cc: (|1-1|-1 -> clamped 0)^2/2 = 0
    assert(g.getAs[Double]("mcnemar_cc") === 0.0)
    val agree = Seq((1L, 1L), (0L, 0L)).toDF("a", "b")
    val g2 = StatsOps.mcnemar(agree, "a", "b").collect()(0)
    assert(g2.isNullAt(g2.fieldIndex("mcnemar")))
  }

  test("distShift: identical populations give hellinger 0 and tv 0") {
    import spark.implicits._
    val rows = for (b <- 0L until 5L; s <- Seq(0L, 1L); _ <- 1 to 3)
      yield ("g", b, s)
    val got = StatsOps.distShift(rows.toDF("grp", "bin", "side"),
      "grp", "bin", "side", bins = 5).collect()(0)
    assert(math.abs(got.getAs[Double]("hellinger")) < 1e-9)
    assert(math.abs(got.getAs[Double]("tv")) < 1e-9)
  }

  test("distShift: disjoint populations approach hellinger 1") {
    import spark.implicits._
    // side 0 all in bin 0, side 1 all in bin 4 — smoothing keeps it < 1
    // (n large enough that the +0.5 Laplace mass stays negligible)
    val rows = (1 to 500).flatMap(_ => Seq(("g", 0L, 0L), ("g", 4L, 1L)))
    val got = StatsOps.distShift(rows.toDF("grp", "bin", "side"),
      "grp", "bin", "side", bins = 5).collect()(0)
    assert(got.getAs[Double]("hellinger") > 0.9)
    assert(got.getAs[Double]("tv") > 0.9)
  }

  test("bhFdr: a strongly shifted feed rejects, identical feeds do not") {
    import spark.implicits._
    // feed 'shift': side 0 in low bins, side 1 in high bins (max drift);
    // feed 'same': identical sides
    val shift = (1 to 200).flatMap(i =>
      Seq(("shift", (i % 8).toLong, 0L), ("shift", 56L + (i % 8), 1L)))
    val same = (1 to 200).flatMap(i =>
      Seq(("same", (i % 64).toLong, 0L), ("same", (i % 64).toLong, 1L)))
    val got = StatsOps.bhFdr((shift ++ same).toDF("grp", "bin", "side"),
        "grp", "bin", "side", bins = 64, alpha = 0.10)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p_value"), r.getAs[Boolean]("reject"))).toMap
    assert(got("shift")._2, s"shifted feed must reject: $got")
    assert(!got("same")._2, s"identical feed must not reject: $got")
    assert(got("shift")._1 < 1e-6 && got("same")._1 === 1.0)
  }

  test("avgPrecision: perfect ranking gives AP 1, all-one-bucket gives prevalence") {
    import spark.implicits._
    def ap(rows: Seq[(String, Long, Long)]): Double =
      StatsOps.avgPrecision(rows.toDF("grp", "b", "y"), "grp", "b", "y")
        .collect()(0).getAs[Double]("avg_prec")
    // all positives above all negatives, distinct buckets
    assert(ap(Seq(("g", 9L, 1L), ("g", 8L, 1L), ("g", 2L, 0L), ("g", 1L, 0L)))
      === 1.0)
    // one bucket: single block, AP = precision = prevalence 1/4
    assert(ap(Seq(("g", 5L, 1L), ("g", 5L, 0L), ("g", 5L, 0L), ("g", 5L, 0L)))
      === 0.25)
    // positives at ranks 1 and 3 (distinct buckets): AP = (1 + 2/3)/2
    assert(ap(Seq(("g", 9L, 1L), ("g", 8L, 0L), ("g", 7L, 1L), ("g", 1L, 0L)))
      === 0.833333)
  }

  test("jaroWinkler kernel matches DuckDB jaro_winkler_similarity case-by-case") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.plans.Kernels.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // expected values read off DuckDB 'SELECT jaro_winkler_similarity(a,b)'
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("", "", 0.0), ("a", "", 0.0), ("ab", "ba", 0.0),
      ("abc", "abc", 1.0),
      ("aaaaaab", "aaaaaba", 0.9714285714285714),
      ("prefixprefix", "prefixzzzzzz", 0.6666666666666666), // <= 0.7: no boost
      ("ababab", "bababa", 0.8333333333333334),
      ("crate", "trace", 0.7333333333333334),
      ("dwayne", "duane", 0.8400000000000001),
      ("abcdefgh", "hgfedcba", 0.5),
      ("red widget", "new widget", 0.825), // odd mismatch count: floor halving
      ("small ring", "small rings", 0.9818181818181818))
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("quantileNorm: identical groups map each bucket to itself") {
    import spark.implicits._
    // two groups with the SAME histogram -> each group's CDF equals the
    // pooled CDF at every bucket, so norm_b == b everywhere
    val rows = for (g <- Seq("x", "y"); b <- 0L until 4L; _ <- 1 to (b + 1).toInt)
      yield (g, b)
    val got = StatsOps.quantileNorm(rows.toDF("grp", "bin"), "grp", "bin",
      bins = 8).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("norm_b") === r.getAs[Long]("b"),
      s"identity mapping violated at $r"))
  }

  test("quantileNorm: a shifted group maps onto the pooled scale") {
    import spark.implicits._
    // group lo lives in buckets 0-1, group hi in 6-7, uniform mass;
    // pooled median sits between them: lo's top bucket must map to a
    // pooled bucket >= its own (pulled up), hi's bottom to <= its own
    val rows = (1 to 10).flatMap(_ =>
      Seq(("lo", 0L), ("lo", 1L), ("hi", 6L), ("hi", 7L)))
    val got = StatsOps.quantileNorm(rows.toDF("grp", "bin"), "grp", "bin",
        bins = 8).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("b")) ->
        r.getAs[Long]("norm_b")).toMap
    assert(got(("lo", 0L)) === 1L) // lo CDF 0.5 -> pooled CDF 0.5 at b=1
    assert(got(("lo", 1L)) === 7L) // lo CDF 1.0 -> pooled CDF 1.0 at b=7
    assert(got(("hi", 6L)) === 1L) // hi CDF 0.5 -> pooled CDF 0.5 at b=1
    assert(got(("hi", 7L)) === 7L)
  }

  test("tokenBudget: closed-form split, rate clamps at 1, deficit surfaces") {
    import spark.implicits._
    // source a: 10 tokens; source b: 2 tokens; budget 8 -> target 4 each
    val df = Seq(("a", "t t t t t t t t t t"), ("b", "t t"))
      .toDF("src", "text")
    val got = graft.operators.TextOps.tokenBudget(df, "text", "src", 8L)
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("have_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Double]("rate"), r.getAs[Long]("deficit")))).toMap
    assert(got("a") === ((10L, 4L, 0.4, 0L)))   // downsampled to 4/10
    assert(got("b") === ((2L, 4L, 1.0, 2L)))    // short by 2: deficit
  }

  test("dedupSurvivors: survivor count equals component count plus isolated docs") {
    val dd = Tables.load(spark, sfDir, "documents")
    val cc = Dedup.connectedComponents(
      Dedup.lshStarEdges(dd, "doc_id", "text", k = 16, bands = 2))
    val nComp = cc.select("comp").distinct().count()
    val nInGraph = cc.count()
    val nDocs = dd.count()
    val got = Dedup.dedupSurvivors(dd, "doc_id", "text", "source").collect()
    val kept = got.map(_.getAs[Long]("n_kept")).sum
    val total = got.map(_.getAs[Long]("n_docs")).sum
    assert(total === nDocs)
    assert(kept === nComp + (nDocs - nInGraph),
      "one survivor per component, isolated docs all survive")
  }

  test("freqDriftTopK: the moved token ranks first; identical halves drift 0") {
    import spark.implicits._
    // side 0: 'a' dominates; side 1: 'b' takes its place
    val moved = Seq((0L, "a a a a c"), (1L, "b b b b c")).toDF("side", "text")
    val top = graft.operators.TextOps.freqDriftTopK(moved, "side", "text",
      topV = 10, k = 3).collect()
    assert(Set(top(0).getAs[String]("term"), top(1).getAs[String]("term"))
      === Set("a", "b")) // both moved by the full 0.8 share, term tie-break
    assert(top(0).getAs[String]("term") === "a")
    assert(top(0).getAs[Double]("delta") === -0.8)
    assert(top(2).getAs[String]("term") === "c")
    assert(top(2).getAs[Double]("delta") === 0.0)
    val same = Seq((0L, "x y z"), (1L, "x y z")).toDF("side", "text")
    graft.operators.TextOps.freqDriftTopK(same, "side", "text", 10, 3)
      .collect().foreach(r => assert(r.getAs[Double]("delta") === 0.0))
  }

  test("winRateMatrix: a lopsided pair decides only with enough sample") {
    import spark.implicits._
    // 2 users, A always beats B: rate 1.0 but the Wilson CI at n=2
    // still straddles 0.5 -> NOT decided
    val small = (1L to 2L).flatMap(u =>
      Seq((u, "A"), (u, "A"), (u, "B"))).toDF("u", "t")
    val s2 = StatsOps.winRateMatrix(small, "u", "t").collect()(0)
    assert(s2.getAs[Long]("n_comp") === 2L)
    assert(s2.getAs[Double]("win_rate") === 1.0)
    assert(!s2.getAs[Boolean]("decided"))
    // 100 users: the same edge separates
    val big = (1L to 100L).flatMap(u =>
      Seq((u, "A"), (u, "A"), (u, "B"))).toDF("u", "t")
    val b2 = StatsOps.winRateMatrix(big, "u", "t").collect()(0)
    assert(b2.getAs[Long]("n_comp") === 100L)
    assert(b2.getAs[Boolean]("decided"))
    assert(b2.getAs[Double]("ci_lo") > 0.9)
  }

  test("distinctNgrams: degenerate and diverse sources hit closed forms") {
    import spark.implicits._
    val df = Seq(("loop", "a a a a"), ("rich", "a b c d")).toDF("src", "text")
    val got = graft.operators.TextOps.distinctNgrams(df, "text", "src")
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val loop = got("loop")
    assert(loop.getAs[Long]("n_tokens") === 4L && loop.getAs[Long]("n_uni") === 1L)
    assert(loop.getAs[Double]("distinct1") === 0.25)
    assert(loop.getAs[Long]("n_bigrams") === 3L && loop.getAs[Long]("n_bi") === 1L)
    assert(loop.getAs[Double]("distinct2") === 0.333333)
    val rich = got("rich")
    assert(rich.getAs[Double]("distinct1") === 1.0)
    assert(rich.getAs[Double]("distinct2") === 1.0)
  }

  test("cascadeYield: conjunction never exceeds either gate") {
    val got = graft.operators.TextOps.cascadeYield(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", "source")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, nr, nc, nb) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_rules"),
        r.getAs[Long]("n_clf"), r.getAs[Long]("n_both"))
      assert(nb <= math.min(nr, nc) && nr <= n && nc <= n)
      assert(nb >= nr + nc - n) // inclusion-exclusion floor
    }
  }
}
