package graft

import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions, TextFunctions, VectorFunctions}

/** Native codegen'd expressions must be bit-identical to the HOF Column
  * trees they replaced (which are what the DuckDB oracles mirror). */
class ExprsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("native charHash == HOF charHash on every document") {
    val diff = docs.select(
        TextFunctions.charHash(col("text")).as("a"),
        TextFunctions.charHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native tokenCodes == transform(split) form") {
    val hof = transform(split(col("text"), " "),
      t => TextFunctions.charHashHof(t))
    val diff = docs.select(
        TextFunctions.tokenCodes(col("text")).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native minhashSig == array-of-array_min form") {
    val codes = TextFunctions.tokenCodes(col("text"))
    val hof = array(TextFunctions.mhParams(16).map { case (a, b) =>
      array_min(transform(codes, x => (x * a + b) % TextFunctions.P))
    }: _*)
    val diff = docs.select(
        TextFunctions.minhashSig(codes, 16).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native simhash == per-bit fold form") {
    val codes = TextFunctions.tokenCodes(col("text"))
    val hof = (0 until 16).map { p =>
      val vote = aggregate(codes, lit(0L),
        (acc, x) => acc + (shiftright(x, p).bitwiseAND(lit(1L)) * 2L - 1L))
      when(vote > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduceLeft(_ + _)
    val diff = docs.select(
        TextFunctions.simhash(codes, 16).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native dot == HOF dot, bit-identical, on real embedding pairs") {
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ida") === col("idb") - 1)
    val diff = pairs.select(
        VectorFunctions.dot(col("va"), col("vb")).as("x"),
        VectorFunctions.dotHof(col("va"), col("vb")).as("y"))
      .filter(col("x") =!= col("y")).count() // exact equality, not tolerance
    assert(diff === 0)
  }

  test("native intersectSize == size(array_intersect) on distinct arrays") {
    val grams = array_distinct(split(col("text"), " "))
    val a = docs.select(col("doc_id").as("ida"), grams.as("ga"))
    val b = docs.select(col("doc_id").as("idb"), grams.as("gb"))
    val pairs = a.join(b, col("ida") === col("idb") - 1)
    val native = org.apache.spark.sql.graftbridge.PlanBridge.column(
      graft.plans.Exprs.IntersectSize(
        org.apache.spark.sql.graftbridge.PlanBridge.expression(col("ga")),
        org.apache.spark.sql.graftbridge.PlanBridge.expression(col("gb"))))
    val diff = pairs.select(native.as("x"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff === 0)

    // sorted-merge variant agrees when inputs are sorted
    val sa = docs.select(col("doc_id").as("ida"), array_sort(grams).as("ga"))
    val sb = docs.select(col("doc_id").as("idb"), array_sort(grams).as("gb"))
    val sortedNative = org.apache.spark.sql.graftbridge.PlanBridge.column(
      graft.plans.Exprs.SortedIntersectSize(
        org.apache.spark.sql.graftbridge.PlanBridge.expression(col("ga")),
        org.apache.spark.sql.graftbridge.PlanBridge.expression(col("gb"))))
    val diff2 = sa.join(sb, col("ida") === col("idb") - 1)
      .select(sortedNative.as("x"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff2 === 0)
  }

  test("sortedGramHashes counts agree with string-set bigram counts") {
    val strGrams = array_sort(array_distinct(
      graft.functions.TextFunctions.bigrams(split(col("text"), " "))))
    def native(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftbridge.PlanBridge.column(
        graft.plans.Exprs.SortedGramHashes(
          org.apache.spark.sql.graftbridge.PlanBridge.expression(c)))
    // per-doc distinct counts equal
    val diff = docs.select(size(native(col("text"))).as("x"), size(strGrams).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff === 0)
    // pairwise intersection counts equal the string-set intersection
    val a = docs.select(col("doc_id").as("ida"), native(col("text")).as("ha"),
      strGrams.as("sa"))
    val b = docs.select(col("doc_id").as("idb"), native(col("text")).as("hb"),
      strGrams.as("sb"))
    val inter = org.apache.spark.sql.graftbridge.PlanBridge.column(
      graft.plans.Exprs.SortedIntersectSizeLong(
        org.apache.spark.sql.graftbridge.PlanBridge.expression(col("ha")),
        org.apache.spark.sql.graftbridge.PlanBridge.expression(col("hb"))))
    val diff2 = a.join(b, col("ida") === col("idb") - 1)
      .select(inter.as("x"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff2 === 0)
  }

  test("native substringCounts == one regexp_count per pattern") {
    val grams = graft.operators.TextOps.langNgramProfiles.flatMap(_._2).distinct
    val regexps = array(grams.map(g =>
      regexp_count(col("text"), lit(g)).cast("long")): _*)
    val diff = docs.select(
        TextFunctions.substringCounts(col("text"), grams).as("a"),
        regexps.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
    // overlap edge cases: non-overlapping left-to-right, like regexp_count
    import spark.implicits._
    val edge = Seq("aaa", "eiei", "ababab", "").toDF("text")
      .select(TextFunctions.substringCounts(col("text"), Seq("aa", "ei", "aba")).as("c"))
      .collect().map(_.getSeq[Long](0))
    assert(edge(0) === Seq(1L, 0L, 0L)) // "aaa": one non-overlapping "aa"
    assert(edge(1) === Seq(0L, 2L, 0L))
    assert(edge(2) === Seq(0L, 0L, 1L)) // "ababab": "aba" at 0 blocks 2; next at 4 won't fit
    assert(edge(3) === Seq(0L, 0L, 0L))
  }

  test("native memberCounts == size(filter) per marker set") {
    val sets = graft.operators.TextOps.langMarkers.map(_._2)
    val toks = split(col("text"), " ")
    val hof = array(sets.map(ws =>
      size(filter(toks, t => ws.map(w => t === w).reduceLeft(_ || _)))
        .cast("long")): _*)
    val diff = docs.select(
        TextFunctions.memberCounts(toks, sets).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native point-in-polygon == when-per-edge tree on the shots frame") {
    val shots = graft.queries.Shots.df(spark, sfDir)
    val poly = graft.queries.CoreQueries.testPolygon
    val diff = shots.select(
        GeoFunctions.pointInPolygon(col("lon"), col("lat"), poly).as("a"),
        GeoFunctions.pointInPolygonColumnTree(col("lon"), col("lat"), poly).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("native PIP survives a 3000-vertex polygon inside codegen") {
    // a 3000-vertex circle around (0, 30) with radius 30
    val n = 3000
    val poly = (0 until n).map { i =>
      val t = 2 * math.Pi * i / n
      (30.0 * math.cos(t), 30.0 + 30.0 * math.sin(t))
    }
    val shots = graft.queries.Shots.df(spark, sfDir)
    val inside = shots
      .filter(GeoFunctions.pointInPolygon(col("lon"), col("lat"), poly))
      .count()
    // cross-check against the Scala ray-cast
    def rayCast(px: Double, py: Double): Boolean = {
      var in = false
      var i = 0
      while (i < n) {
        val (xi, yi) = poly(i); val (xj, yj) = poly((i + 1) % n)
        if (yi != yj && ((yi > py) != (yj > py)) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) in = !in
        i += 1
      }
      in
    }
    val expect = shots.select("lon", "lat").collect()
      .count(r => rayCast(r.getDouble(0), r.getDouble(1)))
    assert(inside === expect.toLong)
    assert(inside > 0)
  }
}
