package graft

import org.apache.spark.sql.functions._

import graft.operators.Extract

/** SURVEY §5: predicate pushdown and column pruning must actually reach
  * the parquet scan — asserted on the executed plan, not assumed. */
class PushdownSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("beamFilter pushes the isin predicate to the scan") {
    val df = Extract.beamFilter(Tables.load(spark, sfDir, "events"),
      "event_type", Seq("click", "purchase"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("In(event_type"), s"expected In(event_type...) in:\n$plan")
  }

  test("selectVariables prunes the read schema to the mapped columns") {
    val df = Extract.selectVariables(Tables.load(spark, sfDir, "lineitem"),
      Seq("okey" -> "l_orderkey", "qty" -> "l_quantity"))
    val plan = planOf(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(
      plan.split("ReadSchema").last)
    assert(readSchema.contains("l_orderkey"))
    assert(readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment"), "unselected column must not be read")
    assert(!readSchema.contains("l_extendedprice"))
  }

  test("quality-filter range predicates push to the scan") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 25.0 && col("l_discount") <= 0.05)
      .select("l_orderkey")
    // toString truncates PushedFilters; formatted explain lists them fully
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThan(l_quantity,25.0)"))
    assert(plan.contains("LessThanOrEqual(l_discount,0.05)"))
  }

  test("bbox range predicates on raw columns push to the scan") {
    val df = Tables.load(spark, sfDir, "events")
      .filter(col("value").between(10.0, 20.0))
      .select("event_id")
    val plan = planOf(df)
    assert(plan.contains("GreaterThanOrEqual(value,10.0)"))
    assert(plan.contains("LessThanOrEqual(value,20.0)"))
  }

  test("analytics joins broadcast the dimension side") {
    val q5 = SparkEntry.queries("q5_region_flow")(spark, sfDir)
    val plan = planOf(q5)
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast, not shuffle")
  }

  test("stratified sampling stays narrow: zero Exchange, pruned read schema") {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val df = PlanBridge.stripTopSort(
      SparkEntry.queries("q_sample_strat")(spark, sfDir))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    val readSchema = plan.split("ReadSchema").last
    assert(!readSchema.contains("text"), "untouched text column must not be read")
  }

  test("asofJoin plans exactly one shuffle into the carry-forward window") {
    import org.apache.spark.sql.graftbridge.PlanBridge
    import graft.operators.Temporal
    import spark.implicits._
    // plain frames (no pre-agg on the right): the as-of itself must cost
    // ONE exchange — the union into the key-partitioned window
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = PlanBridge.stripTopSort(
      Temporal.asofJoin(left, right, "k", "t", Seq("v")))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), "as-of must not plan a row-multiplying join")
  }

  test("sessionize shares one sort across both windows and co-partitions the final agg") {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val df = PlanBridge.stripTopSort(
      SparkEntry.queries("q_sessionize")(spark, sfDir))
    val plan = planOf(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"lag + running-sum + group agg must reuse one user_id shuffle, got $exchanges:\n$plan")
  }

  test("featureHash and jlProject are zero-Exchange scans with pruned schemas") {
    val fh = graft.operators.TextOps
      .featureHash(Tables.load(spark, sfDir, "documents"), "doc_id", "text")
    val fhPlan = fh.queryExecution.executedPlan.toString()
    assert(!fhPlan.contains("Exchange"), s"featureHash must not shuffle:\n$fhPlan")
    val fhSchema = fhPlan.linesIterator.find(_.contains("ReadSchema")).get
    assert(fhSchema.contains("doc_id") && fhSchema.contains("text"))
    assert(!fhSchema.contains("source") && !fhSchema.contains("lang"),
      "unused document columns must not be read")

    val jl = graft.operators.Similarity
      .jlProject(Tables.load(spark, sfDir, "embeddings"), outDims = 16, dims = 64)
    val jlPlan = jl.queryExecution.executedPlan.toString()
    assert(!jlPlan.contains("Exchange"), s"jlProject must not shuffle:\n$jlPlan")
    val jlSchema = jlPlan.linesIterator.find(_.contains("ReadSchema")).get
    assert(jlSchema.contains("vec_id") && jlSchema.contains("embedding"))
    assert(!jlSchema.contains("label"), "label must not be read")
  }

  test("countMin: one corpus shuffle; the sketch-cell join is broadcast") {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val plan = graft.operators.StatsOps.countMin(toks, "term", 256, 4, 20)
      .queryExecution.executedPlan.toString
    // cells come back via BroadcastExchange, never a second row shuffle
    assert(plan.contains("BroadcastExchange"), s"cells must broadcast:\n$plan")
    // the vocab aggregation is the localCheckpoint input; the post-
    // checkpoint plan may only shuffle vocab-sized frames (tagged rows),
    // never join corpus rows by key
    assert(!plan.contains("SortMergeJoin"),
      s"countMin must not sort-merge join:\n$plan")
  }

  test("rrfFuse never rescans a corpus: only the two ranking inputs feed it") {
    import spark.implicits._
    val a = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("qid", "rank", "vec_id")
    val b = Seq((1L, 1, 11L)).toDF("qid", "rank", "vec_id")
    val plan = graft.operators.Similarity.rrfFuse(a, b, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"fusion must read only its ranking inputs:\n$plan")
  }

  test("simhashHammingPairs plan: no distinct after the pair join (first-collision emission)") {
    val df = graft.operators.Dedup.simhashHammingPairs(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text")
    val optimized = df.queryExecution.optimizedPlan.toString
    // a Deduplicate/Aggregate over the pair output would betray a global
    // distinct; the only aggregates allowed sit UNDER the join (none here)
    assert(!optimized.contains("Deduplicate"),
      s"hamming pairs must not global-distinct:\n$optimized")
    assert(!optimized.toLowerCase.contains("aggregate"),
      s"hamming pairs need no aggregate at all:\n$optimized")
  }

  test("knnGraph shuffles on the cell key, not a corpus broadcast of queries") {
    // at spec scale the tiny cells side legitimately broadcasts; disable
    // auto-broadcast to surface the SCALE plan — both join sides must
    // meet on the cell id, never a corpus broadcast or a cartesian
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.operators.Similarity
        .knnGraph(Tables.load(spark, sfDir, "embeddings"), k = 3,
          nCentroids = 8, nprobe = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(cell"),
        s"expected a cell-keyed exchange:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("stripTopSort removes only the top-level global sort") {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val sorted = Tables.load(spark, sfDir, "events").orderBy("event_id")
    val stripped = PlanBridge.stripTopSort(sorted)
    assert(!stripped.queryExecution.logical.toString.startsWith("Sort"))
    val unsorted = Tables.load(spark, sfDir, "events")
    assert(PlanBridge.stripTopSort(unsorted).queryExecution.logical
      eq unsorted.queryExecution.logical)
  }

  test("batch-3 curation gates are zero-Exchange narrow scans (r8)") {
    val docs = Tables.load(spark, sfDir, "documents")
    for ((name, df) <- Seq(
      "gopherRules" -> graft.operators.TextOps.gopherRules(docs, "doc_id", "text"),
      "clfMarginFilter" -> graft.operators.TextOps.clfMarginFilter(docs, "doc_id", "text"),
      "rendezvousShards" -> graft.operators.Sampling.rendezvousShards(docs, "doc_id", 8, 9))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name must not shuffle:\n$plan")
      val schema = plan.linesIterator.find(_.contains("ReadSchema")).get
      assert(!schema.contains("source") && !schema.contains("lang"),
        s"$name reads columns it does not use")
    }
  }

  test("radius join is grid-binned: no cartesian product, broadcast only for the 3x3 stamp (r8)") {
    val pts = Tables.load(spark, sfDir, "events")
      .select(col("event_id").as("id"),
        ((col("event_id") * 7919L) % 1000000L).as("ix"),
        ((col("event_id") * 104729L + col("user_id")) % 1000000L).as("iy"))
    val plan = graft.operators.GeoOps.radiusJoin(pts, 30000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"radius join degenerated to a cross join:\n$plan")
    // the only broadcast is the 9-row offset frame; the point sides meet
    // in a key join on the stamped cell
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "expected the 3x3 offset stamp to broadcast")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(plan).isDefined, "expected an equi-join on the cell key")
  }

  test("dsirWeights: both LMs broadcast back; the corpus never shuffles on the term key (r8)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = graft.operators.TextOps.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en").queryExecution.executedPlan.toString
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 2,
      s"expected vocab + totals to broadcast (got $broadcasts):\n$plan")
  }
}
