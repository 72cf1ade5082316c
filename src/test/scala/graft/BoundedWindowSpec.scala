package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Round-8 (VERDICT r7 #6): every deliberate single-partition window in
  * the declared queries is DOMAIN-bounded — bootstrap resamples, top-V
  * vocab, |X|·|Y| marginal grids, per-partition offset frames. That was
  * documented prose; this spec ENFORCES it by walking each query's
  * analyzed plan, finding every window with an empty (or all-foldable,
  * e.g. `partitionBy(lit(1))`) partition spec, and counting the rows
  * that actually feed it. A refactor that accidentally points a global
  * window at a corpus-scaled frame turns this suite red — the "would
  * this survive 100×" claim becomes a test, not a comment. */
class BoundedWindowSpec extends SparkSpec {

  /** Row counts of every single-partition window input in the plan. */
  private def globalWindowInputs(df: DataFrame): Seq[Long] =
    PlanBridge.analyzedPlan(df).collect {
      case w: LWindow if w.partitionSpec.forall(_.foldable) =>
        PlanBridge.ofRows(spark, w.child).count()
    }

  private def q(name: String): DataFrame =
    PlanBridge.stripTopSort(SparkEntry.queries(name)(spark, sfDir))

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  // q_kaplan_meier's KM fold domain: one row per distinct gap duration
  private lazy val kmDurations = graft.operators.Temporal
    .kaplanMeier(Tables.load(spark, sfDir, "events"), "user_id", "ts",
      "event_id").count()
  private lazy val nSources = docs.select("source").distinct().count()
  private lazy val nLangs = docs.select("lang").distinct().count()
  private lazy val nDocs = docs.count()

  private def assertBounded(name: String, bound: Long): Unit = {
    val inputs = globalWindowInputs(q(name))
    assert(inputs.nonEmpty,
      s"$name: expected at least one global window fold — plan changed, " +
        "update this spec alongside it")
    inputs.foreach { n =>
      assert(n <= bound,
        s"$name: a global window reads $n rows, documented bound is $bound")
      assert(n < nDocs,
        s"$name: a global window reads $n rows — corpus-scaled, not domain-bounded")
    }
  }

  test("bootstrap CI: global windows fold over B = 32 resample rows") {
    assertBounded("q_bootstrap_ci", 32L)
  }

  test("kaplan-meier: KM fold runs on the distinct-duration frame") {
    val events = Tables.load(spark, sfDir, "events")
    val nEvents = events.count()
    val distinctDurations = graft.operators.Temporal
      .kaplanMeier(events, "user_id", "ts", "event_id").count()
    val inputs = globalWindowInputs(q("q_kaplan_meier"))
    assert(inputs.nonEmpty)
    inputs.foreach { n =>
      assert(n <= distinctDurations, s"KM fold reads $n rows")
      assert(n < nEvents, "KM fold must run on the duration DOMAIN, not events")
    }
  }

  test("zipf fit: regression folds over the top-200 vocabulary") {
    assertBounded("q_zipf_fit", 200L)
  }

  test("mutual information: cumsum over the |lang|x|source| cell frame") {
    assertBounded("q_mutual_info", nLangs * nSources)
  }

  test("chi-squared: cumsum over the full marginal grid") {
    assertBounded("q_chi2", nLangs * nSources)
  }

  test("mix weights: cumulative weights over the source frame") {
    assertBounded("q_mix_weights", nSources)
  }

  test("gini: rank fold over the source frame") {
    assertBounded("q_gini_sources", nSources)
  }

  test("KL drift: per-source folds over sources x (V+1) cells") {
    // kl_drift's cumsums are PARTITIONED by source (no global window),
    // so bound every window input — partitioned or not — by the cell
    // frame: |sources| x (topV + tail bucket)
    val inputs = PlanBridge.analyzedPlan(q("q_kl_drift")).collect {
      case w: LWindow => PlanBridge.ofRows(spark, w.child).count()
    }
    assert(inputs.nonEmpty, "q_kl_drift: expected window folds in the plan")
    inputs.foreach { n =>
      assert(n <= nSources * 201L,
        s"q_kl_drift: a window fold reads $n rows, cell-frame bound is ${nSources * 201L}")
    }
  }

  test("shard plan: the only global window is the per-partition offset frame") {
    // documented bound: one row per input RDD partition of the scan —
    // never more than the doc corpus's partition count, far below rows
    val parts = docs.rdd.getNumPartitions.toLong
    assertBounded("q_shard_plan", math.max(parts, 64L))
  }

  test("score calibrate: the grid cumsum reads distinct scores, never doc rows (r8)") {
    // rankCalibrate's declared scale story is that the window runs over
    // the (source, DISTINCT score) grid — enforce it: every window in
    // the plan (the grid cumsum is partitioned by source) is bounded by
    // the distinct-score-pair count and strictly below the corpus size
    val gridRows = docs.select("source", "n_chars").distinct().count()
    val inputs = PlanBridge.analyzedPlan(q("q_score_calibrate")).collect {
      case w: LWindow => PlanBridge.ofRows(spark, w.child).count()
    }
    assert(inputs.nonEmpty, "q_score_calibrate: expected the grid window")
    inputs.foreach { n =>
      assert(n <= gridRows,
        s"q_score_calibrate: window reads $n rows, grid bound is $gridRows")
      assert(n < nDocs,
        s"q_score_calibrate: window reads $n rows — corpus-scaled")
    }
  }

  test("heaps law: the regression fold reads the source frame, never the corpus (r8)") {
    assertBounded("q_heaps_law", nSources)
  }

  test("graph folds: blockTotal's global window reads block sums, never the node frame (r9)") {
    // The pagerank/ppr dangling folds and the HITS L1 normalizers all
    // route through GraphOps.blockTotal. Prove the de-funnel on a frame
    // LARGER than FoldBlocks: the only single-partition windows in the
    // plan read the <= FoldBlocks block-sum frame, and the two-stage
    // fixed fold tree reproduces a same-tree Scala reference exactly.
    import spark.implicits._
    val b = graft.operators.GraphOps.FoldBlocks
    val n = 3 * b / 2 // 1536 nodes > 1024 blocks
    val rows = (0 until n).map(i => (i.toLong, ((i * 2654435761L) % 1000).toDouble / 7.0))
    val df = rows.toDF("v", "r")
    val got = graft.operators.GraphOps.blockTotal(df, "r")
      .collect().map(_.getDouble(0)).toSeq
    // same-tree reference: per-block in-v-order fold, then in-block-order fold
    val expect = rows.groupBy { case (v, _) => ((v % b) + b) % b }
      .toSeq.sortBy(_._1)
      .map { case (_, vs) => vs.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _) }
      .foldLeft(0.0)(_ + _)
    assert(got == Seq(expect), s"blockTotal tree diverged: $got vs $expect")
    val inputs = globalWindowInputs(graft.operators.GraphOps.blockTotal(df, "r"))
    assert(inputs.nonEmpty, "expected the stage-2 block-sum window")
    inputs.foreach { rowsIn =>
      assert(rowsIn <= b.toLong,
        s"blockTotal global window reads $rowsIn rows, bound is $b")
      assert(rowsIn < n.toLong,
        s"blockTotal global window reads $rowsIn rows — node-frame-scaled")
    }
  }

  test("board-wide gate: every single-partition window reads a DECLARED bounded frame (r9)") {
    // VERDICT r8 #7: turn the per-query bounded-window audits into a
    // permanent regression fence over the WHOLE board. Every query whose
    // final analyzed plan carries a single-partition window must appear
    // in this whitelist with its documented bound; any query that grows
    // an undeclared global window — or whose declared window outgrows
    // its bound — turns this red. (Operators that materialize eagerly,
    // e.g. the checkpointed graph rounds, are fenced separately: the
    // blockTotal test above pins their fold shape.)
    val parts = docs.rdd.getNumPartitions.toLong
    val gridRows = docs.select("source", "n_chars").distinct().count()
    val declaredBounds: Map[String, Long] = Map(
      "q_bootstrap_ci" -> 32L,                  // B resample rows
      "q_zipf_fit" -> 200L,                     // top-V vocabulary
      "q_heaps_law" -> nSources,                // source frame
      "q_mutual_info" -> (nLangs * nSources),   // marginal grid
      "q_chi2" -> (nLangs * nSources),          // marginal grid
      "q_mix_weights" -> nSources,              // source frame
      "q_gini_sources" -> nSources,             // source frame
      "q_dsir_weights" -> 201L,                 // top-V + tail bucket
      "q_shard_plan" -> math.max(parts, 64L),   // per-partition offsets
      "q_score_calibrate" -> gridRows,          // distinct-score grid
      "q_equidepth" -> 64L,                     // bucket-boundary frame
      "q_hill_tail" -> 512L,                    // salted top-k order stats
      "q_ann_recall" -> 256L,                   // query-batch rank frames
      "q_ivf_recall" -> 256L,                   // query-batch rank frames
      "q_ivf_trained_recall" -> 256L,           // query-batch rank frames
      "q_ivf_trained_gain" -> 256L,             // per-variant metrics folds
      // (GainQueryFilter caps queries at 32, so each retrievalMetrics
      // ordered fold reads <= 32 rows at ANY scale)
      "q_bq_recall" -> 256L,                    // query-batch rank frames
      "q_unimax_mix" -> nLangs,                 // language frame waterfill
      "q_ks_drift" -> 64L,                      // per-partition offset frame
      "q_skyline" -> 64L,                       // partition-maxima frame
      "q_bradley_terry" -> 64L,                 // event-type strength frame
      "q_cohens_kappa" -> 4L,                   // 2x2 boolean-rater grid
      "q_rbo" -> 20L,                           // top-d rank frames + k-grid
      "q_brier" -> 10L,                         // confidence-decile bin fold
      "q_fleiss_kappa" -> 256L,                 // rater-count class grid
      "q_bh_fdr" -> 64L,                        // one row per tested feed
      "q_quantile_norm" -> 64L,                 // pooled bin-grid CDF
      "q_freq_drift" -> 200L,                   // top-V vocabulary grid
      "q_kaplan_meier" -> kmDurations           // distinct-duration frame
    )
    val failures = scala.collection.mutable.Buffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val wins =
        try PlanBridge.analyzedPlan(PlanBridge.stripTopSort(fn(spark, sfDir)))
          .collect { case w: LWindow if w.partitionSpec.forall(_.foldable) => w }
        catch {
          case e: Throwable =>
            failures += s"$name: plan construction failed: $e"; Nil
        }
      if (wins.nonEmpty) declaredBounds.get(name) match {
        case None =>
          failures += s"$name: ${wins.size} UNDECLARED single-partition window(s)"
        case Some(bound) =>
          wins.foreach { w =>
            val n = PlanBridge.ofRows(spark, w.child).count()
            if (n > bound)
              failures += s"$name: global window reads $n rows > declared bound $bound"
          }
      }
    }
    assert(failures.isEmpty,
      s"bounded-window gate failures:\n${failures.mkString("\n")}")
  }

  test("partitioned windows on low-cardinality keys never funnel the corpus (r12)") {
    // The q_lorenz r11 flaw class: Window.partitionBy(lowCardKey) over a
    // corpus-scaled frame ranks ~corpus/|keys| rows in ONE task — and is
    // invisible to the single-partition gate above because the partition
    // spec is non-foldable. At sf0.001 EVERY key is low-cardinality, so
    // the gate is a two-SF GROWTH probe: prefilter here (non-foldable
    // partition spec, < minKeys keys, corpus-sized input), then
    // adjudicate the flagged queries at sf0.1 — keys whose cardinality
    // GROWS with the corpus (user_id 15 → 1500) pass; keys that stay
    // fixed (source, decile bin, event_type) while per-key rows grow are
    // the funnel shape and must carry a declared per-key bound at sf0.1.
    // A new query that points a per-source window at the corpus turns
    // this red at author time.
    val minKeys = 32L
    val sfBig = "/root/testdata/sf0.1"
    val corpusFloorBig = 5000L // |documents| at sf0.1 — smallest fact table
    // Windows partitioned by the reserved `_pid` column (the two-stage
    // prefix-scan convention: spark_partition_id materialized after a
    // repartitionByRange) are stage-1 locals whose per-key size is
    // input/numPartitions BY CONSTRUCTION — numPartitions is the
    // parallelism knob, not a data-fixed key — and are exempt.
    def isPidWindow(w: LWindow): Boolean =
      w.partitionSpec.exists {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
          a.name == "_pid"
        case _ => false
      }
    // Declared bounds = max rows one window task reads at sf0.1.
    // TopK stage-2 frames are k·salts per group by construction
    // (constants forever). No corpus-scaled entry remains: the r12
    // q_brier/q_clf_calibration exemptions (per-bin ordered sigmoid
    // folds, corpus/10 per task) were rewritten onto the per-bin
    // blockTotal fixed tree in r13 — their stage-2 folds now read
    // ≤ TextOps.ClfFoldBlocks rows per bin, under the probe's corpus
    // floor by construction. A regression past a bound or a NEW
    // unlisted funnel fails.
    val declared: Map[String, Long] = Map(
      "q_hill_tail" -> 1632L,        // TopK stage 2: (k+1)=51 × 32 salts
      "q_kmv_sketch" -> 2048L,       // TopK stage 2: k=64 × 32 salts
      "q_kmv_estimate" -> 2048L,     // same sketch frame
      "q_inverted_index" -> 640L,    // TopK stage 2: maxPostings=20 × 32
      "q_bq_topk" -> 1600L,          // TopK stage 2: n=50 × 32 salts
      "q_bq_recall" -> 1600L         // same coarse frame via bqTopK
    )
    val failures = scala.collection.mutable.Buffer[String]()
    val candidates = scala.collection.mutable.Buffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val flagged =
        try {
          PlanBridge.analyzedPlan(PlanBridge.stripTopSort(fn(spark, sfDir)))
            .collect {
              case w: LWindow
                if w.partitionSpec.nonEmpty &&
                  !w.partitionSpec.forall(_.foldable) &&
                  !isPidWindow(w) => w
            }
            .exists { w =>
              val child = PlanBridge.ofRows(spark, w.child)
              child.count() >= nDocs &&
                child.select(w.partitionSpec.map(PlanBridge.column): _*)
                  .distinct().count() < minKeys
            }
        } catch {
          case e: Throwable =>
            failures += s"$name: plan construction failed: $e"; false
        }
      if (flagged) candidates += name
    }
    candidates.foreach { name =>
      val wins =
        try PlanBridge.analyzedPlan(PlanBridge.stripTopSort(
            SparkEntry.queries(name)(spark, sfBig)))
          .collect {
            case w: LWindow
              if w.partitionSpec.nonEmpty &&
                !w.partitionSpec.forall(_.foldable) &&
                !isPidWindow(w) => w
          }
        catch {
          case e: Throwable =>
            failures += s"$name: sf0.1 plan construction failed: $e"; Nil
        }
      // dedup identical window shapes (multi-function windows analyze to
      // stacked LWindow nodes over the same child)
      val seen = scala.collection.mutable.Set[(String, Long)]()
      wins.foreach { w =>
        val keySql = w.partitionSpec.map(_.sql).mkString(",")
        val child = PlanBridge.ofRows(spark, w.child)
        val n = child.count()
        if (n >= corpusFloorBig && seen.add((keySql, n))) {
          val keyed = child
            .groupBy(w.partitionSpec.map(PlanBridge.column): _*).count()
          val g = keyed.count()
          if (g < minKeys) {
            val maxPer = keyed.agg(org.apache.spark.sql.functions.max("count"))
              .first().getLong(0)
            val bound = declared.getOrElse(name, -1L)
            if (bound < 0)
              failures += s"$name: UNDECLARED fixed-cardinality window " +
                s"funnel at sf0.1 — $g keys [$keySql] over a $n-row " +
                s"input, max $maxPer rows in one task"
            else if (maxPer > bound)
              failures += s"$name: window funnel reads $maxPer rows in " +
                s"one task at sf0.1 > declared bound $bound"
          }
        }
      }
    }
    assert(failures.isEmpty,
      s"partitioned-window funnel gate failures:\n${failures.mkString("\n")}")
  }

  test("record linkage: after the pattern collapse, the EM never touches the corpus (r8)") {
    // the EM rounds run eagerly on localCheckpointed frames, so the
    // final plan must read ONLY the <= 2^3-row pattern checkpoint — a
    // refactor that re-derives from the pair frame would put a parquet
    // scan (and a corpus-scaled fold) back into this plan
    val df = q("q_record_linkage")
    assert(df.count() <= 8L, "pattern frame exceeded 2^3 rows")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"record-linkage output re-derives from the corpus scan:\n$plan")
  }
}
