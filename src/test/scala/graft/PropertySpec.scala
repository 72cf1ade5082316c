package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.functions.{GeoFunctions, TextFunctions}
import graft.plans.Kernels

/** Property-based checks: the native kernels against independent Scala
  * models over randomized inputs — coverage the example-based specs can't
  * reach. Seeds are random per run (deliberate: each run explores new
  * inputs); a reported counterexample is re-runnable via the shrunk arg
  * printed in the failure. */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val P = TextFunctions.P

  test("property: charHash kernel == Scala fold for arbitrary ASCII strings") {
    val asciiStr = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    check(Prop.forAll(asciiStr) { s =>
      val viaKernel = Kernels.charHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val model = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
      viaKernel == model
    })
  }

  test("property: simhash kernel == per-bit vote model") {
    val codes = Gen.listOf(Gen.choose(0L, P - 1))
    check(Prop.forAll(codes) { cs =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(cs.toArray)
      val got = Kernels.simhash(arr, 16)
      val model = (0 until 16).map { p =>
        val vote = cs.map(c => ((c >> p) & 1L) * 2 - 1).sum
        if (vote > 0) 1L << p else 0L
      }.sum
      got == model
    })
  }

  test("property: minhash sig components are mins of the permuted codes") {
    val codes = Gen.nonEmptyListOf(Gen.choose(0L, P - 1))
    val params = TextFunctions.mhParams(8)
    check(Prop.forAll(codes) { cs =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(cs.toArray)
      val sig = Kernels.minhashSig(arr,
        params.map(_._1).toArray, params.map(_._2).toArray)
      params.indices.forall { i =>
        val (a, b) = params(i)
        sig.getLong(i) == cs.map(c => (c * a + b) % P).min
      }
    })
  }

  test("property: logStar components == union-find on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    val p = Prop.forAll(edgeGen) { es =>
      val edges = es.toDF("a", "b")
      val got = graft.operators.Dedup.connectedComponentsLogStar(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val pr = parent.getOrElseUpdate(x, x)
        if (pr == x) x else { val r = find(pr); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.toList.map(x => x -> find(x)).toMap
      got == expect
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), p)
    assert(res.passed, res.status.toString)
  }

  test("property: both CC variants correct with NEGATIVE (hashed-style) ids") {
    // xxhash64 ids — the documented way in for string keys — are negative
    // about half the time. The old endpoint-sum convergence heuristic was
    // only monotone for nonnegative ids and could read a stall/rise as the
    // fixpoint, silently returning wrong labels (ADVICE r4). Exact edge-set
    // fixpoint detection must label sign-mixed graphs correctly.
    import spark.implicits._
    val id = Gen.oneOf(Gen.choose(-30L, -1L), Gen.choose(0L, 30L))
    val edgeGen = Gen.nonEmptyListOf(Gen.zip(id, id))
      .map(_.filter { case (a, b) => a != b }).suchThat(_.nonEmpty)
    val p = Prop.forAll(edgeGen) { es =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val pr = parent.getOrElseUpdate(x, x)
        if (pr == x) x else { val r = find(pr); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.toList.map(x => x -> find(x)).toMap
      val edges = es.toDF("a", "b")
      val viaLogStar = graft.operators.Dedup.connectedComponentsLogStar(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaMinLabel = graft.operators.Dedup.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      viaLogStar == expect && viaMinLabel == expect
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), p)
    assert(res.passed, res.status.toString)
  }

  test("property: sortedNgramHashes == hashed distinct gram strings, any n") {
    val word = Gen.choose(1, 3).flatMap(l =>
      Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))
    val text = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    def hash64(s: String): Long =
      s.foldLeft(0L)((a, c) => a * 31 + c.toLong) // unreduced, like the kernel
    check(Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val got = Kernels.sortedNgramHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), n)
      val toks = t.split(" ", -1)
      val model =
        if (toks.length < n) Array.emptyLongArray
        else toks.sliding(n).map(g => hash64(g.mkString(" ")))
          .toArray.distinct.sorted
      (0 until got.numElements()).map(got.getLong).toSeq == model.toSeq
    })
  }

  test("property: PIP kernel == independent ray-cast for random polygons/points") {
    val coord = Gen.choose(-10.0, 10.0)
    val vertex = Gen.zip(coord, coord)
    val polyGen = Gen.listOfN(6, vertex).suchThat(p =>
      p.map(_._2).distinct.length >= 2) // at least one non-horizontal edge
    check(Prop.forAll(polyGen, coord, coord) { (poly, px, py) =>
      val es = poly.indices.map(i => (poly(i), poly((i + 1) % poly.length)))
        .filter { case ((_, a), (_, b)) => a != b }
      val got = Kernels.pointInPolygon(px, py,
        es.map(_._1._1).toArray, es.map(_._1._2).toArray,
        es.map(_._2._1).toArray, es.map(_._2._2).toArray)
      var inside = false
      poly.indices.foreach { i =>
        val (xi, yi) = poly(i)
        val (xj, yj) = poly((i + 1) % poly.length)
        if (yi != yj && ((yi > py) != (yj > py)) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      }
      got == inside
    })
  }

  test("property: sortedIntersectSize == set intersection size") {
    val words = Gen.listOf(Gen.listOfN(3, Gen.choose('a', 'z')).map(_.mkString))
    check(Prop.forAll(words, words) { (ws1, ws2) =>
      val s1 = ws1.distinct.sorted
      val s2 = ws2.distinct.sorted
      def arr(ss: Seq[String]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ss.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      Kernels.sortedIntersectSize(arr(s1), arr(s2)) ==
        s1.toSet.intersect(s2.toSet).size.toLong
    })
  }

  test("property: two-stage TopK == single-window top-k on generated groups") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rowsGen = Gen.listOfN(300,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 50L)))
    val prop = Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), id) => (id.toLong, s"g$g", v) }
        .toDF("id", "grp", "v")
      val two = graft.operators.TopK.perGroupTopK(df,
          groupCols = Seq(col("grp")),
          order = Seq(col("v").desc, col("id")),
          k = 5, salt = col("id"), salts = 4)
        .select("grp", "rn", "id").orderBy("grp", "rn")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      val w = Window.partitionBy(col("grp")).orderBy(col("v").desc, col("id"))
      val single = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("grp", "rn", "id").orderBy("grp", "rn")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      two == single
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: connectedComponents == union-find on random graphs") {
    import spark.implicits._
    val edgesGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    val prop = Prop.forAll(edgesGen) { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.toList.map(x => x -> find(x)).toMap
      val got = graft.operators.Dedup.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: asofJoin == per-row brute-force latest-at-or-before") {
    import spark.implicits._
    val leftGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    val rightGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      // right unique per (k, t): keep max tag (the operator's precondition)
      val rsu = rs.groupBy(identity).keys.toSeq
        .map { case (k, t) => (k, t, k * 1000 + t) }
      val right = rsu.toDF("k", "t", "tag")
      val got = graft.operators.Temporal.asofJoin(left, right, "k", "t", Seq("tag"))
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val expect = rsu.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        got(i.toLong) == expect
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: urlCanonicalize is idempotent and a function of the canonical form") {
    import spark.implicits._
    // URL-ish strings assembled from the parts the chain manipulates
    val scheme = Gen.oneOf("", "http://", "https://", "HTTP://", "HTTPS://")
    val www = Gen.oneOf("", "www.", "WWW.")
    val host = Gen.oneOf("a.com", "B.org", "x-y.net")
    val path = Gen.oneOf("", "/p", "/a/b", "/a/b/", "/P/Q")
    val param = Gen.oneOf("x=1", "y=2", "utm_source=s", "utm_a=b",
      "xutm_foo=1", "page=3")
    val query = Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, param).map(ps =>
        if (ps.isEmpty) "" else "?" + ps.mkString("&")))
    val frag = Gen.oneOf("", "#sec", "#a/b")
    val url = for {
      s <- scheme; w <- www; h <- host; p <- path; q <- query; f <- frag
    } yield s + w + h + p + q + f
    check(Prop.forAll(Gen.listOfN(30, url)) { urls =>
      val once = graft.operators.TextOps
        .urlCanonicalize(urls.toDF("url"), "url")
        .select("canonical_url").collect().map(_.getString(0)).toSeq
      val twice = graft.operators.TextOps
        .urlCanonicalize(once.toDF("url"), "url")
        .select("canonical_url").collect().map(_.getString(0)).toSeq
      // idempotent: canonicalizing a canonical form changes nothing
      twice == once &&
        // and no canonical form retains scheme/www/fragment/utm debris
        once.forall(c => !c.contains("#") && !c.contains("http") &&
          !c.startsWith("www.") && !c.contains("utm_source=") &&
          !c.contains("&&") && !c.endsWith("&") && !c.endsWith("?"))
    }, n = 20)
  }

  test("property: cdcApply == latest-op-wins union-find-free Scala model") {
    import spark.implicits._
    val op = Gen.oneOf("I", "U", "D")
    val entry = for {
      k <- Gen.choose(0L, 8L); v <- Gen.choose(1L, 50L)
      o <- op; x <- Gen.choose(0.0, 9.0)
    } yield (k, v, x, o)
    // distinct (k, ver): the operator's documented total-order contract
    val logGen = Gen.listOf(entry)
      .map(_.groupBy(e => (e._1, e._2)).map(_._2.head).toSeq)
    val baseGen = Gen.listOf(
      for { k <- Gen.choose(0L, 8L); x <- Gen.choose(0.0, 9.0) } yield (k, 0L, x))
      .map(_.groupBy(_._1).map(_._2.head).toSeq)
    check(Prop.forAll(baseGen, logGen) { (base, log) =>
      val got = graft.operators.MergeOps.cdcApply(
          base.toDF("k", "ver", "value"),
          log.toDF("k", "ver", "value", "op"),
          Seq("k"), Seq("ver"), "op")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val model = (base.map(b => (b._1, b._2, b._3, "I", 1)) ++
          log.map(l => (l._1, l._2, l._3, l._4, 0)))
        .groupBy(_._1).flatMap { case (k, rows) =>
          val win = rows.minBy(r => (-r._2, r._5)) // ver desc, log before base
          if (win._4 == "D") None else Some(k -> (win._2, win._3))
        }
      got == model
    }, n = 40)
  }

  test("property: webMercator round-trips lon within tolerance (Spark expr)") {
    import spark.implicits._
    val lons = Seq(-179.9, -90.0, -1.5, 0.0, 0.1, 45.3, 120.7, 179.9)
    val lats = Seq(-84.9, -45.0, 0.0, 30.5, 60.1, 84.9)
    val pts = (for (lo <- lons; la <- lats) yield (lo, la)).toDF("lon", "lat")
    val (mx, my) = GeoFunctions.webMercator(col("lon"), col("lat"))
    val rows = pts.select(col("lon"), col("lat"), mx.as("x"), my.as("y")).collect()
    val k = 20037508.342789244
    rows.foreach { r =>
      val (lon, lat, x, y) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // inverse transform recovers the inputs
      val lonBack = x * 180.0 / k
      val latBack = math.atan(math.exp(y * math.Pi / k)) * 360.0 / math.Pi - 90.0
      assert(math.abs(lonBack - lon) < 1e-9)
      assert(math.abs(latBack - lat) < 1e-9, s"lat $lat -> $latBack")
    }
  }
}
