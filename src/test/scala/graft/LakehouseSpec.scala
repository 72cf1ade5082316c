package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomOps, MergeOps, Sampling, TextOps}
import graft.sources.Layout

/** Round-5 lakehouse / training-mix operators: bloom-pruned semi-join,
  * latest-wins incremental merge, per-group quota cap, sliding-window
  * chunking. Each checked against an independent in-memory model or
  * Spark's own exact plan.
  */
class LakehouseSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sfDir, "lineitem")
  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val events = Tables.load(spark, sfDir, "events")

  test("bloomSemiJoin == exact semi-join, and the bloom actually prunes") {
    val urgent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val got = BloomOps.bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 10000, fpp = 0.03)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === exact)
    // the prefilter alone must pass all matches (no false negatives) while
    // pruning most non-matches — rebuild it standalone to measure
    val bf = urgent.stat.bloomFilter("o_orderkey", 10000, 0.03)
    val keys = li.select("l_orderkey").collect().map(_.getLong(0))
    val survivors = keys.count(bf.mightContainLong)
    val matches = keys.count(k => exact.exists(_._1 == k))
    assert(survivors >= matches, "bloom must never drop a true match")
    assert(survivors < keys.length / 2,
      s"bloom pruned nothing: $survivors of ${keys.length} survive")
  }

  test("bloomSemiJoin is exact for STRING keys (ADVICE r5: insert/probe encoding must agree)") {
    // pre-fix, strings were inserted via putBinary but probed via
    // mightContainLong(cast) — every true match was rejected
    import spark.implicits._
    val srcs = docs.select("source").distinct().limit(2)
      .collect().map(_.getString(0)).toSeq
    val dim = srcs.toDF("src")
    val got = BloomOps.bloomSemiJoin(docs, dim, "source", "src",
        expectedItems = 100, fpp = 0.03)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = docs.join(dim, docs("source") === dim("src"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty, "fixture must produce matches")
    assert(got === exact)
  }

  test("bloomSemiJoin rejects mismatched key types loudly") {
    val dim = docs.select(col("source").as("src_key"))
    val e = intercept[IllegalArgumentException] {
      BloomOps.bloomSemiJoin(docs, dim, "doc_id", "src_key", 100)
    }
    assert(e.getMessage.contains("identical types"))
  }

  test("latestWinsMerge == full-recompute latest state, any split point") {
    import spark.implicits._
    val keyed = events.select(col("user_id"), col("event_type"),
      col("ts"), col("event_id"), col("value"))
    val expect = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      keyed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn").as[(Long, String, java.sql.Timestamp, Long, Double)]
        .collect().toSet
    }
    for (cutDay <- Seq("2024-01-08", "2024-01-21")) {
      val cut = to_timestamp(lit(cutDay))
      val got = MergeOps.latestWinsMerge(
          keyed.filter(col("ts") < cut), keyed.filter(col("ts") >= cut),
          keys = Seq("user_id", "event_type"), version = Seq("ts", "event_id"))
        .as[(Long, String, java.sql.Timestamp, Long, Double)].collect().toSet
      assert(got === expect, s"cut=$cutDay")
    }
    // idempotence: re-applying an empty update batch changes nothing
    val state = MergeOps.latestWinsMerge(
      keyed.filter(col("ts") < to_timestamp(lit("2024-01-21"))),
      keyed.filter(col("ts") >= to_timestamp(lit("2024-01-21"))),
      Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val again = MergeOps.latestWinsMerge(state, state.limit(0),
        Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .as[(Long, String, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(again === expect)
  }

  test("perGroupCap bounds every group at k and picks by hash order") {
    val capped = Sampling.perGroupCap(docs, "doc_id", "source", k = 5)
    val sizes = capped.groupBy("source").count().collect()
    assert(sizes.forall(_.getLong(1) <= 5))
    // deterministic: same call, same picks
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.perGroupCap(docs, "doc_id", "source", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // matches the single-window reference cut
    import graft.functions.TextFunctions
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(TextFunctions.charHash(col("doc_id").cast("string")), col("doc_id"))
    val ref = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === ref)
  }

  test("chunkDocs: stride == window reconstructs the document exactly") {
    val chunks = TextOps.chunkDocs(docs, "doc_id", "text", window = 16, stride = 16)
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("rebuilt"))
    val joined = docs.join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt"))
    assert(joined.count() === 0)
  }

  test("range-clustered layout prunes a time-range scan; shuffled layout reads all") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val ev = events.select("event_id", "ts", "value")
    val total = ev.count()
    ev.repartition(16).write.mode("overwrite").parquet(s"$dir/plain")
    graft.sources.Layout.writeRangeClustered(ev, s"$dir/byts", 16, col("ts"))
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("ts").between("2024-01-10", "2024-01-11"))
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves()
        .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .getOrElse(fail("no FileSourceScanExec in plan"))
        .metrics("numOutputRows").value
    }
    val clustered = scannedRows(s"$dir/byts")
    val plain = scannedRows(s"$dir/plain")
    // same answer either way
    assert(spark.read.parquet(s"$dir/byts")
      .filter(col("ts").between("2024-01-10", "2024-01-11")).count() ===
      ev.filter(col("ts").between("2024-01-10", "2024-01-11")).count())
    // one day of a one-month table behind 16 range files: the footer
    // stats must skip most rows; the shuffled layout's per-file ranges
    // all span the month, so its scan emits (roughly) everything
    assert(clustered < total / 2,
      s"range-clustered scan read $clustered of $total rows — no pruning")
    assert(clustered < plain / 2,
      s"clustered=$clustered vs plain=$plain — layout made no difference")
  }

  test("dynamic partition overwrite backfills one day without touching the rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_backfill").toString + "/t"
    val ev = events.select(col("event_id"), col("ts"), col("value"))
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
    Layout.overwritePartitions(ev, dir, "date")
    val total = ev.count()
    val day = "2024-01-10"
    val nDay = ev.filter(col("date") === day).count()
    assume(nDay > 0)
    // corrected batch: that one day's rows with zeroed values
    val corrected = ev.filter(col("date") === day).withColumn("value", lit(0.0))
    Layout.overwritePartitions(corrected, dir, "date")
    val back = spark.read.parquet(dir)
    // same total: only the day's partition was replaced, nothing truncated
    assert(back.count() === total)
    assert(back.filter(col("date") === day).agg(sum(col("value"))).head.getDouble(0) === 0.0)
    // every other day's data untouched
    val otherSum = ev.filter(col("date") =!= day).agg(round(sum(col("value")), 2)).head.getDouble(0)
    assert(back.filter(col("date") =!= day).agg(round(sum(col("value")), 2)).head.getDouble(0) === otherSum)
  }

  test("saltedEquiJoin == plain join and spreads a hot key across salts") {
    import spark.implicits._
    // one pathologically hot key (900 of 1000 rows) + a long tail
    val probe = ((1 to 900).map(i => (7L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 50, 900L + i))).toDF("k", "row_id")
    val build = (0L to 49L).map(k => (k, s"dim_$k")).toDF("bk", "payload")
    val salted = graft.operators.SkewOps.saltedEquiJoin(
        probe, build, "k", "bk", saltOn = col("row_id"), salts = 8)
      .select("k", "row_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "row_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.size === 1000)
    // the hot key's rows must actually land on several salts
    val hotSalts = probe.filter(col("k") === 7L)
      .select(pmod(xxhash64(col("row_id")), lit(8L)))
      .distinct().count()
    assert(hotSalts >= 4, s"hot key spread over only $hotSalts salts")
  }

  test("chunkDocs == Scala sliding-window model on randomized texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — no flakes
    val texts = (0 until 40).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong,
        Seq.fill(n)(('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(2)))
          .mkString(" "))
    }
    for ((w, s) <- Seq((1, 1), (3, 2), (4, 4), (5, 3), (7, 2))) {
      val got = TextOps.chunkDocs(texts.toDF("doc_id", "text"),
          "doc_id", "text", window = w, stride = s)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val model = texts.flatMap { case (id, t) =>
        val toks = t.split(" ", -1) // "" -> [""], same as the engine split
        (0 until toks.length by s).map { st =>
          val chunk = toks.slice(st, math.min(st + w, toks.length))
          (id, (st / s).toLong, chunk.mkString(" "), chunk.length.toLong)
        }
      }.toSet
      assert(got === model, s"w=$w s=$s")
    }
  }

  test("perGroupCap works with STRING ids (review regression: salt must hash)") {
    import spark.implicits._
    val rows = (1 to 60).map(i => (s"url_$i", s"dom_${i % 3}")).toDF("id", "grp")
    val capped = Sampling.perGroupCap(rows, "id", "grp", k = 4)
    val sizes = capped.groupBy("grp").count().collect()
    assert(sizes.length === 3 && sizes.forall(_.getLong(1) === 4))
    // deterministic repeat
    val a = capped.select("id").collect().map(_.getString(0)).toSet
    val b = Sampling.perGroupCap(rows, "id", "grp", k = 4)
      .select("id").collect().map(_.getString(0)).toSet
    assert(a === b)
  }

  test("upsertParquet state survives across batches with a file: URI stateDir") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_uri").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp, Long, Double)]
    // URI-style path: the java.nio existence check (pre-fix) never saw it
    // and silently reset state every batch
    val q = graft.streaming.EventStreams.upsertParquet(
      input.toDF().toDF("user_id", "event_type", "ts", "event_id", "value"),
      s"file:$dir/state", s"$dir/ckpt",
      keys = Seq("user_id", "event_type"), version = Seq("ts", "event_id"))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((1L, "view", t("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      input.addData((2L, "buy", t("2024-01-01 11:00:00"), 2L, 2.0))
      q.processAllAvailable()
      // both keys present: batch 2 merged INTO batch 1's state instead of
      // replacing it
      val keys = graft.streaming.EventStreams
        .readUpsertState(spark, s"file:$dir/state")
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(keys === Set(1L, 2L))
    } finally q.stop()
  }

  test("compact shrinks a fragmented table without changing its rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // simulate micro-batch ingest debris: 64 tiny files
    events.repartition(64).write.parquet(s"$dir/frag")
    val (before, after) = Layout.compact(spark, s"$dir/frag", s"$dir/packed",
      targetFileBytes = 4L * 1024 * 1024)
    assert(before === 64 && after < before)
    val a = spark.read.parquet(s"$dir/frag").orderBy("event_id").collect()
    val b = spark.read.parquet(s"$dir/packed").orderBy("event_id").collect()
    assert(a.toSeq === b.toSeq)
    val outFiles = new java.io.File(s"$dir/packed")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles === after)
  }

  test("upsertParquet snapshots: marker loss recovers, old snapshots pruned (ADVICE r5)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_snap").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp, Long, Double)]
    val q = graft.streaming.EventStreams.upsertParquet(
      input.toDF().toDF("user_id", "event_type", "ts", "event_id", "value"),
      s"$dir/state", s"$dir/ckpt",
      keys = Seq("user_id", "event_type"), version = Seq("ts", "event_id"))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      for (b <- 1 to 3) {
        input.addData((b.toLong, "view", t(s"2024-01-0$b 10:00:00"), b.toLong, b.toDouble))
        q.processAllAvailable()
      }
      val root = new java.io.File(s"$dir/state")
      val snaps = root.listFiles().map(_.getName).filter(_.startsWith("snap-")).sorted
      assert(snaps.length === 2, s"prune must keep current+previous, got ${snaps.toSeq}")
      // a crash inside the marker swap leaves no _LATEST: the reader must
      // fall back to the newest complete snapshot, losing nothing
      assert(new java.io.File(root, "_LATEST").delete())
      val keys = graft.streaming.EventStreams
        .readUpsertState(spark, s"$dir/state")
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(keys === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("saltedEquiJoin / latestWinsMerge / perGroupTopK survive colliding helper column names (ADVICE r5)") {
    import spark.implicits._
    // user data that already carries _salt / _lw_rn / _topk_rn columns —
    // pre-fix these were silently overwritten and then dropped
    val probe = Seq((1L, "a", 7L), (1L, "b", 8L), (2L, "c", 9L))
      .toDF("k", "payload", "_salt")
    val build = Seq((1L, "x"), (2L, "y")).toDF("bk", "battr")
    val salted = graft.operators.SkewOps
      .saltedEquiJoin(probe, build, "k", "bk", saltOn = col("payload"), salts = 4)
    val plain = probe.join(build, probe("k") === build("bk"))
    assert(salted.columns.toSeq === plain.columns.toSeq,
      "user _salt column must survive")
    assert(salted.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)

    val st = Seq((1L, 1L, "old", 5L), (1L, 2L, "new", 6L), (2L, 1L, "only", 7L))
      .toDF("id", "v", "s", "_lw_rn")
    val mergedLw = graft.operators.MergeOps
      .latestWinsMerge(st.limit(0), st, keys = Seq("id"), version = Seq("v"))
    assert(mergedLw.columns.toSeq === st.columns.toSeq)
    assert(mergedLw.select("id", "s", "_lw_rn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      Set((1L, "new", 6L), (2L, "only", 7L)))

    val tk = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L), (2L, 5L, 50L))
      .toDF("g", "score", "_topk_rn")
    val top = graft.operators.TopK.perGroupTopK(tk,
      groupCols = Seq(col("g")), order = Seq(col("score").desc),
      k = 2, salt = col("_topk_rn"), salts = 4, rankCol = "rn")
    assert(top.columns.contains("_topk_rn"), "user _topk_rn column must survive")
    assert(top.select("g", "score", "_topk_rn", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet ===
      Set((1L, 30L, 300L, 1), (1L, 20L, 200L, 2), (2L, 5L, 50L, 1)))
  }

  test("pq codebook ranks gapped id spaces; too-small corpora refused (r15)") {
    import spark.implicits._
    val dims = 8
    // gapped ids (the r14 collectCentroids lesson applied to PQ):
    // codes must equal the contiguous relabeling's codes — the emitted
    // code is the codebook RANK, not the raw id
    def vec(seed: Long) = Array.tabulate(dims)(d => (seed * 7 + d).toFloat)
    val gapped = Seq(0L, 2L, 5L, 9L, 14L, 20L, 27L, 35L, 44L, 54L)
      .map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val dense = Seq(0L, 2L, 5L, 9L, 14L, 20L, 27L, 35L, 44L, 54L).zipWithIndex
      .map { case (id, i) => (i.toLong, vec(id)) }.toDF("vec_id", "embedding")
    def codes(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.pqEncode(df, m = 2, nCodes = 8)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(codes(gapped) === codes(dense),
      "gapped ids must encode as their contiguous relabeling")
    // negative ids are filtered, and a corpus smaller than nCodes is
    // refused rather than silently shrinking the codebook
    val tiny = Seq(-1L, 0L, 1L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.pqEncode(tiny, m = 2, nCodes = 8)
    }
    assert(e.getMessage.contains("codebook needs"))
  }

  test("chunkDocs: overlap, tail chunk, and n_tok accounting") {
    import spark.implicits._
    val one = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // 7 tokens
    val rows = TextOps.chunkDocs(one, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows === Array(
      (0L, "a b c d", 4L),
      (1L, "d e f g", 4L),
      (2L, "g", 1L)))
  }

  test("cdcApply: latest op wins, deletes drop keys, later inserts resurrect") {
    import spark.implicits._
    val base = Seq((1L, 0L, 10.0), (2L, 0L, 20.0), (3L, 0L, 30.0))
      .toDF("k", "ver", "value")
    val log = Seq(
      (1L, 5L, 11.0, "U"),  // update key 1
      (2L, 3L, 0.0, "D"),   // delete key 2
      (3L, 2L, 0.0, "D"),   // delete key 3 ...
      (3L, 7L, 33.0, "I"),  // ... then resurrect it
      (4L, 1L, 40.0, "I"),  // brand-new key
      (4L, 2L, 41.0, "U"))  // updated in the same batch
      .toDF("k", "ver", "value", "op")
    val got = graft.operators.MergeOps
      .cdcApply(base, log, Seq("k"), Seq("ver"), "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 5L, 11.0), (3L, 7L, 33.0), (4L, 2L, 41.0)))
  }

  test("scd2: per-key validity intervals chain and exactly one current row") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2020-01-01 00:00:00"), "bronze"),
      (1L, ts("2020-02-01 00:00:00"), "silver"),
      (1L, ts("2020-03-01 00:00:00"), "gold"),
      (2L, ts("2020-01-15 00:00:00"), "bronze"))
      .toDF("k", "ts", "segment")
    val got = graft.operators.MergeOps.scd2(log, Seq("k"), "ts")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(2),
        Option(r.getTimestamp(4)).map(_.toString).orNull, r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (1L, "bronze", "2020-02-01 00:00:00.0", false),
      (1L, "silver", "2020-03-01 00:00:00.0", false),
      (1L, "gold", null, true),
      (2L, "bronze", null, true)))
    // intervals chain: each valid_to equals the next row's valid_from
    val k1 = graft.operators.MergeOps.scd2(log, Seq("k"), "ts")
      .filter(col("k") === 1L).orderBy("valid_from").collect()
    k1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(4) === b.getTimestamp(3))
    case _ => ()
    }
  }

  test("keySkew: uniform keys score low, a hot key drives every measure up") {
    import spark.implicits._
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // uniform: 10 keys x 10 rows
    val uni = (1 to 100).map(i => (i % 10).toLong).toDF("k")
    val u = graft.operators.SkewOps.keySkew(uni, "k").head
    assert((u.getLong(0), u.getLong(1), u.getLong(2)) === ((100L, 10L, 10L)))
    assert(u.getDouble(3) === 0.1) // top1_share = 1/n_keys
    assert(u.getDouble(4) === 0.1) // hhi = 1/n_keys when uniform
    assert(u.getDouble(5) === 0.0) // cv = 0 when uniform
    // skewed: one key holds 91 of 100 rows (tail keys disjoint from 7)
    val skew = ((1 to 91).map(_ => 7L) ++ (10 to 18).map(_.toLong)).toDF("k")
    val s = graft.operators.SkewOps.keySkew(skew, "k").head
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) === ((100L, 10L, 91L)))
    assert(s.getDouble(3) === 0.91)
    val ss = (91.0 * 91 + 9).toLong
    assert(s.getDouble(4) === r6(ss.toDouble / (100.0 * 100.0)))
    assert(s.getDouble(5) === r6(math.sqrt(10.0 * ss - 100.0 * 100.0) / 100.0))
    assert(s.getDouble(4) > u.getDouble(4) && s.getDouble(5) > u.getDouble(5))
  }

  test("goldenRecord: per-field last non-null survives a fresher null; whole-row would not") {
    import spark.implicits._
    val df = Seq(
      // key 1: v3 has null city — survivorship keeps v2's city but v3's name
      (1L, 1L, Some("ann"), Some("austin")),
      (1L, 2L, None, Some("boston")),
      (1L, 3L, Some("anne"), None),
      // key 2: all nulls for name -> null survives as null
      (2L, 1L, None, Some("carmel")))
      .toDF("k", "ver", "name", "city")
    val got = MergeOps.goldenRecord(df, "k", "ver", Seq("name", "city"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(got === Map(
      1L -> ((3L, 3L, Some("anne"), Some("boston"))),
      2L -> ((1L, 1L, None, Some("carmel")))))
  }

  test("goldenRecord matches a per-field fold model on real events") {
    val base = events.select((col("user_id") % 50).as("k"),
      col("event_id").as("ver"),
      when(col("event_type") =!= "error", col("event_type")).as("etype"),
      when(col("event_id") % 3 =!= 0, col("value")).as("v"))
    val rows = base.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.toString), Option(r.get(3)).map(_.asInstanceOf[Double])))
    val model = rows.groupBy(_._1).map { case (k, es) =>
      val sorted = es.sortBy(_._2)
      k -> ((sorted.length.toLong, sorted.last._2,
        sorted.flatMap(_._3).lastOption, sorted.flatMap(_._4).lastOption))
    }
    val got = MergeOps.goldenRecord(base, "k", "ver", Seq("etype", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got === model)
  }
}
