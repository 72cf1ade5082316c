package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Dedup operators vs brute-force Scala oracles (sf0.001). */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val P = TextFunctions.P
  private def hashScala(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("exactDedup keeps min id and counts copies") {
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "z"), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 3L -> 1L))
  }

  test("lshRecall truth sample: derivation pins, mod=1 exhaustive, sampled truth is a subset") {
    import graft.operators.Dedup.scaledTruthSampleMod
    assert(scaledTruthSampleMod(500L) === 1)   // sf0.01 — oracle pin
    assert(scaledTruthSampleMod(5000L) === 1)  // sf0.1 board — unchanged
    assert(scaledTruthSampleMod(50000L) === 10) // sf1 — truth pairs /100
    assert(scaledTruthSampleMod(0L) === 1)
    val full = Dedup.lshRecall(docs, "doc_id", "text", blockCols = Seq("lang"),
      maxBucket = Some(64)).collect().head
    val sampled = Dedup.lshRecall(docs, "doc_id", "text", blockCols = Seq("lang"),
      maxBucket = Some(64), truthSampleMod = 3).collect().head
    assert(sampled.getLong(0) <= full.getLong(0), "sampled truth <= full truth")
    assert(sampled.getLong(1) === full.getLong(1), "candidate set is untouched")
    assert(sampled.getLong(2) <= full.getLong(2))
    assert(sampled.getLong(4) <= full.getLong(4))
  }

  test("thinBlocks: identity when every block <= cap") {
    val d = docs.limit(200).select("doc_id", "source", "lang", "text")
    // sf0.001 blocks are far below 512 — step = 1 everywhere
    val thin = Dedup.thinBlocks(d, Seq("source"), "doc_id", 512)
    assert(thin.count() === d.count())
    assert(thin.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(d.select("doc_id").collect().map(_.getLong(0)).sorted))
  }

  test("thinBlocks matches the hash-residue Scala model and bounds blocks past the cap") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val cap = 20
    val got = Dedup.thinBlocks(df, Seq("source"), "doc_id", cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // model: per block of n=100, step = ceil(100/20) = 5, keep rows with
    // charHash(id.toString) % 5 == 0
    val expect = (0L until 300L).filter { i =>
      hashScala(i.toString) % 5 == 0
    }.toSet
    assert(got === expect)
    // survivors per block stay near the cap (hash-uniform thinning)
    val perBlock = Dedup.thinBlocks(df, Seq("source"), "doc_id", cap)
      .groupBy("source").count().collect().map(_.getLong(1))
    perBlock.foreach(n => assert(n <= 2L * cap, s"block kept $n > 2*cap"))
  }

  test("minhash candidates: identical token sets are always recalled; high-jaccard recall is strong") {
    val corpus = docs.limit(100).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").map(hashScala).toSet)
    val exact = for {
      i <- corpus.indices; j <- (i + 1) until corpus.length
      (ida, sa) = corpus(i); (idb, sb) = corpus(j)
      jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
    } yield ((ida, idb), jac)
    val cands = Dedup.minhashCandidates(docs.limit(100), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val identical = exact.filter(_._2 == 1.0).map(_._1)
    identical.foreach(p => assert(cands.contains(p), s"J=1 pair $p missed"))

    val high = exact.filter(_._2 >= 0.8).map(_._1)
    if (high.nonEmpty) {
      val recall = high.count(cands.contains).toDouble / high.size
      assert(recall >= 0.7, s"recall of J>=0.8 pairs was $recall")
    }
    cands.foreach { case (a, b) => assert(a < b) }
  }

  test("minhash bucket cap >= every bucket size is bit-identical to exact LSH") {
    // the semantically-free regime: when no bucket exceeds the cap, the
    // truncation window passes everything through and the capped variant
    // must equal uncapped EXACTLY (this is why declaring q_minhash_pairs
    // capped costs nothing until a bucket is genuinely hot)
    val sub = docs.limit(100)
    val uncapped = Dedup.minhashCandidates(sub, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashCandidates(sub, "doc_id", "text",
        maxBucket = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped)
  }

  test("minhash bucket cap bounds bucket contribution and stays a subset") {
    val uncapped = Dedup.minhashCandidates(docs.limit(100), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashCandidates(docs.limit(100), "doc_id", "text",
        maxBucket = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // cap of 5 over 4 bands bounds pairs at bands * C(cap,2) * buckets;
    // with 100 docs the capped set must be strictly smaller here
    assert(capped.size < uncapped.size)
    assert(capped.nonEmpty)
  }

  test("minhash bucket cap matches brute-force capped-LSH oracle (pairs surviving only in later bands kept)") {
    val k = 16; val bands = 4; val rpb = k / bands; val cap = 2
    // independent Scala oracle: band keys per doc, per-band capped buckets,
    // union of per-band pair sets, distinct
    val keyed = docs.limit(300)
      .select(col("doc_id"),
        TextFunctions.minhashSig(TextFunctions.tokenCodes(col("text")), k).as("sig"))
      .select(col("doc_id"), array((0 until bands).map(b =>
        TextFunctions.bandKey(col("sig"), b, rpb)): _*).as("keys"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    def bucketPairs(b: Int): Set[(Long, Long)] =
      keyed.groupBy(_._2(b)).values.flatMap { grp =>
        val ids = grp.map(_._1).sorted.take(cap)
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val expected = (0 until bands).map(bucketPairs).reduce(_ ++ _)
    // the pre-fix algorithm dropped pairs whose first key-colliding band was
    // truncated; make sure this corpus actually exercises that case, so the
    // equality below is a real regression check
    val firstCollisionFiltered = (0 until bands).map { b =>
      bucketPairs(b).filter { case (a, c) =>
        val (ka, kc) = (keyed.find(_._1 == a).get._2, keyed.find(_._1 == c).get._2)
        (0 until b).forall(e => ka(e) != kc(e))
      }
    }.reduce(_ ++ _)
    assume(firstCollisionFiltered != expected,
      "corpus/cap no longer exercises the truncated-first-band case")
    val got = Dedup.minhashCandidates(docs.limit(300), "doc_id", "text",
        maxBucket = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("connectedComponents handles snowflake-sized ids (no int64 sum overflow)") {
    val big = Long.MaxValue
    val edges = Seq((big - 1, big - 2), (big - 2, big - 3), (big - 10, big - 11))
      .toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      (big - 1) -> (big - 3), (big - 2) -> (big - 3), (big - 3) -> (big - 3),
      (big - 10) -> (big - 11), (big - 11) -> (big - 11)))
  }

  test("minhashCandidates with bands = 1 is legal (no empty reduce)") {
    val got = Dedup.minhashCandidates(docs.limit(50), "doc_id", "text",
        k = 16, bands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (a, b) => assert(a < b) }
    assert(got.distinct.length === got.length)
  }

  test("connectedComponents labels chains, islands, and triangles by min id") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), // chain 1-2-3-4-5 (diameter 4)
      (10L, 11L),                             // island pair
      (20L, 21L), (21L, 22L), (20L, 22L))     // triangle
      .toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents throws instead of returning truncated labels") {
    // chain of diameter 9; min-label moves one hop per round, so
    // maxIter=3 cannot reach the fixpoint — silent wrong labels before,
    // a loud error now
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 3)
    }
    assert(e.getMessage.contains("maxIter"))
    // same graph converges fine with headroom
    val ok = Dedup.connectedComponents(chain, maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("logStar components equal min-label components, incl. high-diameter chains") {
    // the case the min-label variant REFUSES (diameter > maxIter): a
    // 60-node chain converges for logStar in ~log rounds
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val viaLogStar = Dedup.connectedComponentsLogStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLogStar === (1L to 60L).map(_ -> 1L).toMap)
    // mixed shapes: identical labels to the min-label variant
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("a", "b")
    val a = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsLogStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // and on real LSH star edges
    val stars = Dedup.lshStarEdges(docs.limit(150), "doc_id", "text", k = 16, bands = 2)
    val viaMinLabel = Dedup.connectedComponents(stars)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = Dedup.connectedComponentsLogStar(stars)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars === viaMinLabel)
  }

  test("connectedComponents matches union-find over real minhash candidate pairs") {
    val pairs = Dedup.minhashCandidates(docs.limit(150), "doc_id", "text",
        k = 16, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.toList.map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponents(
        Dedup.minhashCandidates(docs.limit(150), "doc_id", "text", k = 16, bands = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // star-contracted edges (linear) must yield the identical components
    // as the quadratic pairwise graph
    val viaStars = Dedup.connectedComponents(
        Dedup.lshStarEdges(docs.limit(150), "doc_id", "text", k = 16, bands = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars === expect)
  }

  test("simhash: equal texts collide; bucket sizes sum to corpus size") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "q r s t")).toDF("doc_id", "text")
    val got = Dedup.simhashBuckets(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.exists { case (_, keep, n) => keep == 1L && n == 2L })
    assert(got.map(_._3).sum === 3L)

    val full = Dedup.simhashBuckets(docs, "doc_id", "text")
    assert(full.agg(sum("n_docs")).head.getLong(0) === docs.count())
  }

  test("ngramJaccard matches brute-force bigram jaccard") {
    val pairs = Seq((0L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.ngramJaccard(pairs, docs, "doc_id", "text")
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val texts = docs.filter(col("doc_id") <= 11).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(s: String) =
      s.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    got.foreach { case ((a, b), j) =>
      val (ga, gb) = (grams(texts(a)), grams(texts(b)))
      val expect = ga.intersect(gb).size.toDouble / ga.union(gb).size
      assert(math.abs(j - expect) < 1e-6, s"pair ($a,$b)")
    }
    assert(got.size === 3)
  }

  test("setSimJoin == brute-force whole-corpus trigram jaccard (prefix filter lossless)") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(s: String) = s.split(" ", -1).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet
    val gs = rows.map { case (id, t) => id -> grams(t) }.toMap
    val ids = rows.map(_._1).sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      if gs(a).nonEmpty && gs(b).nonEmpty
      inter = (gs(a) intersect gs(b)).size.toLong
      union = gs(a).size + gs(b).size - inter
      if 2 * inter >= union
    } yield (a, b, inter, union)).toSet
    val got = Dedup.setSimJoin(docs, "doc_id", "text", n = 3, tauNum = 1, tauDen = 2)
      .select("a", "b", "n_inter", "n_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "corpus should contain qualifying near-dup pairs")
  }

  test("setSimJoin rational threshold keeps the exact-boundary pair, drops below, skips gramless docs") {
    val df = Seq(
      (1L, "a b c d e"),     // grams {abc,bcd,cde}
      (2L, "a b c d x"),     // inter=2, union=4 -> J exactly 1/2: kept
      (3L, "a b c q r s"),   // vs 1: inter=1 {abc}, union=6 -> dropped
      (4L, "t u"))           // <3 tokens: no grams, excluded (not crashed)
      .toDF("doc_id", "text")
    val got = Dedup.setSimJoin(df, "doc_id", "text", n = 3, tauNum = 1, tauDen = 2)
      .select("a", "b", "n_inter", "n_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 2L, 2L, 4L)))
  }

  test("levenshtein verify matches a Scala Wagner-Fischer model") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val texts = docs.filter(col("doc_id") < 10)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).take(64)).toMap
    val pairs = texts.keys.toSeq.sorted.combinations(2).map {
      case Seq(a, b) => (a, b)
    }.toSeq
    import spark.implicits._
    val df = pairs.map { case (a, b) => (a, b, texts(a), texts(b)) }
      .toDF("a", "b", "ta", "tb")
      .select(col("a"), col("b"),
        levenshtein(col("ta"), col("tb")).as("d"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === lev(texts(a), texts(b)), s"pair ($a,$b)")
    }
  }

  test("lshRecall == brute-force truth vs candidate-set audit") {
    val (n, tau) = (3, 0.3)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.load(spark, sfDir, "documents")
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val gramSets = rows.map { case (id, _, t) =>
      id -> t.split(" ", -1).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    }.toMap
    val truth = (for {
      (a, la, _) <- rows; (b, lb, _) <- rows
      if la == lb && a < b
      inter = (gramSets(a) intersect gramSets(b)).size
      if inter.toDouble / (gramSets(a).size + gramSets(b).size - inter) >= tau
    } yield (a, b)).toSet
    val cand = graft.operators.Dedup.minhashCandidates(
        docs, "doc_id", "text", k = 16, bands = 4, maxBucket = Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = truth.count(cand.contains)
    val comps = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.lshStarEdges(docs, "doc_id", "text", 16, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hitC = truth.count { case (a, b) =>
      comps.contains(a) && comps.get(a) == comps.get(b)
    }
    val row = graft.operators.Dedup.lshRecall(docs, "doc_id", "text",
      blockCols = Seq("lang"), n = n, tau = tau,
      k = 16, bands = 4, maxBucket = Some(64)).head
    assert(row.getLong(0) === truth.size.toLong)
    assert(row.getLong(1) === cand.size.toLong)
    assert(row.getLong(2) === hit.toLong)
    assert(row.getDouble(3) === r6(hit.toDouble / truth.size.toDouble))
    assert(row.getLong(4) === hitC.toLong)
    assert(row.getDouble(5) === r6(hitC.toDouble / truth.size.toDouble))
    assert(truth.nonEmpty, "audit needs a non-empty ground-truth set")
    // the capless cluster path must never trail the capped pairwise path
    assert(row.getLong(4) >= row.getLong(2))
  }

  test("minhashIncrement (uncapped) equals the batch path's cross pairs exactly") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val incr = graft.operators.Dedup
      .minhashIncrement(corpus, batch, "doc_id", "text", k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the batch-mode candidate set over ALL docs, restricted to pairs
    // crossing the increment boundary, must be found identically
    val cross = graft.operators.Dedup
      .minhashCandidates(docs, "doc_id", "text", k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }.toSet
    assert(incr === cross)
    assert(incr.nonEmpty, "the synthetic corpus has cross-boundary near-dups")
    // no pair may pair a batch doc with itself or another batch doc
    assert(incr.forall { case (n2, o) => n2 % 10 == 0 && o % 10 != 0 })
  }

  test("minhashIncrement corpus-side cap yields a subset that keeps identical-text dups") {
    import spark.implicits._
    val corpus = (1L to 30L).map(i => (i, s"alpha beta gamma delta eps$i zeta"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, "alpha beta gamma delta eps7 zeta")).toDF("doc_id", "text")
    val un = graft.operators.Dedup
      .minhashIncrement(corpus, batch, "doc_id", "text", k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = graft.operators.Dedup
      .minhashIncrement(corpus, batch, "doc_id", "text", k = 16, bands = 4,
        maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(un))
    // the identical-token-set duplicate (doc 7) shares every band; it must
    // be caught uncapped, and capped too while its id ranks inside the cap
    assert(un.contains((100L, 7L)))
    assert(capped.contains((100L, 7L)))
  }

  test("ngramContainment: embedded doc has containment 1.0 while jaccard stays low") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // grams subset of doc 2's
      (2L, "alpha beta gamma delta eps zeta eta theta iota kappa lambda mu"),
      (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val byPair = graft.operators.Dedup
      .ngramContainment(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Double]("containment_ab"), r.getAs[Double]("containment_ba"),
          r.getAs[Double]("jaccard")))).toMap
    val (cab, cba, j) = byPair((1L, 2L))
    assert(cab === 1.0, "every gram of the short doc is in the long one")
    assert(cba < 0.5 && j < 0.5, "jaccard drowns the embedded doc")
    assert(byPair((1L, 3L))._1 === 0.0)
  }

  test("ngramContainment agrees with ngramJaccard on the shared kernel; containment >= jaccard") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = docs.select(col("doc_id"), col("source")).as("d1")
      .join(docs.select(col("doc_id"), col("source")).as("d2"),
        col("d1.source") === col("d2.source") &&
          col("d1.doc_id") < col("d2.doc_id"))
      .select(col("d1.doc_id").as("a"), col("d2.doc_id").as("b"))
    val cont = graft.operators.Dedup
      .ngramContainment(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Double]("containment_ab"), r.getAs[Double]("containment_ba"),
          r.getAs[Double]("jaccard")))).toMap
    val jac = graft.operators.Dedup.ngramJaccard(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(cont.keySet === jac.keySet)
    cont.foreach { case (k, (cab, cba, j)) =>
      assert(j === jac(k), s"jaccard drift at $k")
      assert(cab >= j && cba >= j, s"containment < jaccard at $k")
    }
  }

  test("simhashHammingPairs bucket cap: cap >= every bucket is bit-identical; small cap is a subset") {
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = graft.operators.Dedup
      .simhashHammingPairs(docs, "doc_id", "text", bits = 60, radius = 2,
        widen = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sf0.001 band buckets are all far below 100000 — the capped path
    // (rank-truncate + distinct) must equal the exact pigeonhole set
    val capped = graft.operators.Dedup
      .simhashHammingPairs(docs, "doc_id", "text", bits = 60, radius = 2,
        widen = true, maxBucket = Some(100000))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === exact)
    // a binding cap yields a SUBSET (pairs lost only inside over-cap
    // buckets), never a superset and never wrong hammings
    val tight = graft.operators.Dedup
      .simhashHammingPairs(docs, "doc_id", "text", bits = 60, radius = 2,
        widen = true, maxBucket = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tight.subsetOf(exact))
  }

  test("simhashHammingPairs is EXACTLY the brute-force hamming-radius pair set") {
    val docs = Tables.load(spark, sfDir, "documents")
    val P = graft.functions.TextFunctions.P
    def charHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
    def simhash(text: String, bits: Int): Long = {
      val codes = text.split(" ").map(charHash)
      (0 until bits).map { p =>
        val vote = codes.map(c => ((c >> p) & 1L) * 2 - 1).sum
        if (vote > 0) 1L << p else 0L
      }.sum
    }
    val sims = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> simhash(r.getString(1), 30)).toMap
    val ids = sims.keys.toSeq.sorted
    val expect = (for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sims(i) ^ sims(j)) if h <= 2
    } yield (i, j, h.toLong)).toSet
    val got = graft.operators.Dedup
      .simhashHammingPairs(docs, "doc_id", "text", bits = 30, radius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "the synthetic corpus has hamming-close simhashes")
    // band geometry: near-even disjoint cover of the code width
    assert(graft.operators.Dedup.hammingBands(30, 3) ===
      Seq((0, 10), (10, 10), (20, 10)))
    assert(graft.operators.Dedup.hammingBands(16, 3) ===
      Seq((0, 6), (6, 5), (11, 5)))
  }

  test("widened 60-bit simhashHammingPairs: brute-force-exact, all 60 vote bits live") {
    val docs = Tables.load(spark, sfDir, "documents")
    val P = graft.functions.TextFunctions.P
    def charHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
    def widen(x: Long): Long = { // the Kernels.widenCode model
      val a = x ^ (x << 13)
      val b = a ^ (a >>> 7)
      val w = b ^ (b << 17)
      w ^ ((w & 0x3FFFFFFFL) << 30)
    }
    def simhash60(text: String): Long = {
      val codes = text.split(" ", -1).map(t => widen(charHash(t)))
      (0 until 60).map { p =>
        val vote = codes.map(c => ((c >> p) & 1L) * 2 - 1).sum
        if (vote > 0) 1L << p else 0L
      }.sum
    }
    val sims = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> simhash60(r.getString(1))).toMap
    val ids = sims.keys.toSeq.sorted
    val expect = (for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sims(i) ^ sims(j)) if h <= 2
    } yield (i, j, h.toLong)).toSet
    val got = graft.operators.Dedup
      .simhashHammingPairs(docs, "doc_id", "text", bits = 60, radius = 2,
        widen = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "exact duplicates collide at hamming 0 even on 60 bits")
    // band-key entropy: every 20-bit pigeonhole band must have plenty of
    // LIVE bits (varying across the corpus) — a plain 30-bit code under
    // a 60-bit simhash would have bits 30..59 all-zero and the upper
    // bands would collide EVERYTHING, the failure mode widening exists
    // to prevent. A few vote-biased bits per band are expected on a
    // 500-doc template corpus; 12+ live of 20 keeps bucket population
    // ~n/2^12 even in the worst band.
    val live = sims.values.reduce(_ | _) & ~sims.values.reduce(_ & _)
    for ((off, w) <- graft.operators.Dedup.hammingBands(60, 3)) {
      val bandLive = java.lang.Long.bitCount((live >>> off) & ((1L << w) - 1))
      assert(bandLive >= 12, f"band at $off has only $bandLive live bits (live=$live%x)")
    }
    // 20-bit pigeonhole bands at radius 2
    assert(graft.operators.Dedup.hammingBands(60, 3) ===
      Seq((0, 20), (20, 20), (40, 20)))
  }

  test("overlap candidate-policy chooser: all-pairs on templates, prefix on long tails, identical output") {
    import spark.implicits._
    val ops = graft.operators.Dedup
    // the synthetic documents corpus is TEMPLATE-HEAVY: even rare grams
    // carry fat postings, and at low alpha the prefix keeps ~75% of each
    // doc — the measured r10 regime where all-pairs wins
    val docs = Tables.load(spark, sfDir, "documents")
    val (tpPrefix, tpAll) =
      ops.overlapCandidateVolumes(docs, "doc_id", "text", "source", 1, 4)
    assert(tpAll < tpPrefix,
      s"template corpus must predict all-pairs ($tpAll) < prefix ($tpPrefix)")
    // long-tailed corpus at high alpha: per-doc-unique grams (thin
    // postings) + a tiny shared core; prefixes are short — PPJoin's regime
    val base = (0L until 60L).map { i =>
      val unique = (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
      (i, s"core alpha beta $unique", if (i % 2 == 0) "s0" else "s1")
    }
    // a handful of near-copies so the high-alpha join has real output
    val longTail = (base ++ base.filter(_._1 % 10 == 0).map {
      case (i, text, src) => (1000L + i, s"$text extracopy", src)
    }).toDF("doc_id", "text", "source")
    val (ltPrefix, ltAll) =
      ops.overlapCandidateVolumes(longTail, "doc_id", "text", "source", 3, 4)
    assert(ltPrefix < ltAll,
      s"long-tail corpus must predict prefix ($ltPrefix) < all-pairs ($ltAll)")
    // the choice is cost-only: both faces and the auto form agree exactly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a", "b").collect().map(_.toSeq).toSeq
    for ((corpus, an, ad) <- Seq((docs, 1, 4), (longTail, 3, 4))) {
      val pref = rows(ops.overlapPrefixJoin(corpus, "doc_id", "text", "source", an, ad))
      val all = rows(ops.overlapAllPairsJoin(corpus, "doc_id", "text", "source", an, ad))
      val auto = rows(ops.overlapJoinAuto(corpus, "doc_id", "text", "source", an, ad))
      assert(pref === all, "policies must be output-identical")
      assert(auto === all)
      assert(all.nonEmpty)
    }
  }

  test("scale-honest parameter derivations pin their oracle values (r11)") {
    import graft.operators.{GeoOps, Similarity}
    // q_dbscan: density-scaled radius — constant expected neighbors on
    // the fixed 1e6^2 domain; the oracle pins the sf0.01 value 31622
    assert(GeoOps.densityRadius(10000L) === 31622L)
    assert(GeoOps.densityRadius(100000L) === 10000L) // the sf0.1 board point
    assert(GeoOps.densityRadius(1000000L) === 3162L) // sf1
    // monotone non-increasing in n
    val rs = Seq(1000L, 10000L, 100000L, 1000000L, 10000000L)
      .map(GeoOps.densityRadius(_))
    assert(rs === rs.sortBy(-_))
    // q_embed_dup family: corpus-scaled LSH band width — bucket
    // population n/2^k held <= 32; oracle pins the sf0.01 value 4
    assert(Similarity.scaledRowsPerBand(500L) === 4)
    assert(Similarity.scaledRowsPerBand(2000L) === 6)  // sf0.1
    assert(Similarity.scaledRowsPerBand(20000L) === 10) // sf1
    assert(Similarity.scaledRowsPerBand(0L) === 4)
    // bucket-population invariant: n / 2^k <= 32 whenever k < cap
    for (n <- Seq(100L, 500L, 5000L, 50000L, 500000L)) {
      val k = Similarity.scaledRowsPerBand(n)
      assert(k === 24 || (n.toDouble / (1L << k)) <= 32.0, s"n=$n k=$k")
    }
    assert(Similarity.scaledRowsPerBand(Long.MaxValue / 2) === 24)
  }
}
