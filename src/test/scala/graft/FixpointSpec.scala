package graft

import graft.operators.{Dedup, GeoOps, GraphOps}

/** Round-9 (VERDICT r8 #3): the fixed-round forms of dbscan label
  * propagation, k-core peeling and BFS hop labeling are oracle twins —
  * correct versus their declared unrolled chains, UNDER-CONVERGED versus
  * the textbook definitions whenever the graph needs more rounds than
  * the fixed count. The fixpoint forms are the production entry points.
  * This spec proves the distinction on a chain graph whose
  * diameter/cascade depth exceeds the default 4 rounds: the fixed-round
  * form demonstrably truncates, the fixpoint form lands on the exact
  * textbook answer. */
class FixpointSpec extends SparkSpec {

  import spark.implicits._

  // A 14-point chain: unit spacing on the x axis, diameter 13 > 4 rounds.
  private val n = 14

  test("dbscan fixed-round under-merges a long chain; fixpoint labels one cluster") {
    val pts = (1 to n).map(i => (i.toLong, i.toLong * 10L, 0L))
      .toDF("id", "ix", "iy")
    // r=10: each interior point sees exactly its two chain neighbors;
    // minPts=2 makes every point core (n_nbrs >= 1), so textbook DBSCAN
    // yields ONE cluster labeled by the min id.
    val fixedClusters = GeoOps.dbscan(pts, r = 10L, minPts = 2, rounds = 4)
      .select("cluster").distinct().count()
    val fix = GeoOps.dbscanFixpoint(pts, r = 10L, minPts = 2)
    val fixClusters = fix.select("cluster").distinct().count()
    assert(fixedClusters > 1L,
      s"fixed-round dbscan merged the whole chain in 4 rounds ($fixedClusters) — " +
        "the under-merge premise broke; lengthen the chain")
    assert(fixClusters == 1L,
      s"dbscanFixpoint left $fixClusters clusters on a connected core chain")
    val labels = fix.select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(labels.values.forall(_ == 1L), s"fixpoint labels not the min id: $labels")
    assert(fix.filter("role <> 'core'").count() == 0L,
      "every chain point is core under minPts=2")
  }

  test("dbscan fixpoint and fixed-round forms agree when rounds >= diameter") {
    val pts = (1 to 5).map(i => (i.toLong, i.toLong * 10L, 0L))
      .toDF("id", "ix", "iy")
    val a = GeoOps.dbscan(pts, r = 10L, minPts = 2, rounds = 4)
      .orderBy("id").collect().toSeq
    val b = GeoOps.dbscanFixpoint(pts, r = 10L, minPts = 2)
      .orderBy("id").collect().toSeq
    assert(a == b, "forms diverge on a graph the fixed rounds fully cover")
  }

  test("k-core fixed-round over-reports on a chain; fixpoint peels to empty") {
    // A chain has no 2-core: the peel cascades one endpoint layer per
    // round, so 4 rounds strip 4 layers per side and the middle of a
    // 14-node chain survives INCORRECTLY; the fixpoint form empties.
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val fixed = GraphOps.kCore(edges, k = 2, rounds = 4).count()
    val fix = GraphOps.kCoreFixpoint(edges, k = 2).count()
    assert(fixed > 0L,
      s"fixed-round k-core already peeled the chain in 4 rounds — lengthen it")
    assert(fix == 0L, s"kCoreFixpoint left $fix vertices in a chain's 2-core")
  }

  test("k-core fixpoint keeps a genuine dense core intact") {
    // K5 plus a pendant chain: the 2-core is exactly the K5 (residual
    // degree 4); the chain peels away entirely.
    val k5 = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val chain = (5 until 12).map(i => (i.toLong, (i + 1).toLong))
    val edges = (k5 ++ chain).toDF("a", "b")
    val out = GraphOps.kCoreFixpoint(edges, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == (1L to 5L).toSet, s"2-core should be the K5: $out")
    assert(out.values.forall(_ == 4L), s"K5 residual degrees should be 4: $out")
  }

  test("bfs fixed-round truncates at 4 hops; fixpoint reaches the whole chain") {
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    val fixed = GraphOps.bfsHops(edges, seeds, rounds = 4)
    assert(fixed.count() == 5L, "4 rounds from node 1 label exactly 5 chain nodes")
    val fix = GraphOps.bfsHopsFixpoint(edges, seeds)
      .as[(Long, Long)].collect().toMap
    assert(fix.size == n, s"fixpoint BFS should label all $n nodes: ${fix.size}")
    (1 to n).foreach { i =>
      assert(fix(i.toLong) == (i - 1).toLong,
        s"node $i should sit at hop ${i - 1}, got ${fix(i.toLong)}")
    }
  }

  test("bfs fixpoint agrees with the fixed-round form inside its horizon") {
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    val fixed = GraphOps.bfsHops(edges, seeds, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val fix = GraphOps.bfsHopsFixpoint(edges, seeds)
      .as[(Long, Long)].collect().toMap
    fixed.foreach { case (node, hops) =>
      assert(fix(node) == hops, s"hop label diverged at $node")
    }
  }
}
