package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** As-of join and sessionization vs hand-built cases and brute-force
  * oracles over the real events table (sf0.001). */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val events = Tables.load(spark, sfDir, "events")

  test("asofJoin: inclusive bound, latest-wins, null when no earlier row") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 30L, "l3"),
      (2L, 50L, "l4"), (3L, 7L, "l5"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 20L, 200.0), (1L, 25L, 300.0),
      (2L, 60L, 400.0))
      .toDF("k", "t", "v")
    val got = Temporal.asofJoin(left, right, "k", "t", Seq("v"))
      .select("tag", "asof_v")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      "l1" -> Some(100.0), // t=10: latest right at 5
      "l2" -> Some(200.0), // t=20: right at 20 included (inclusive bound)
      "l3" -> Some(300.0), // t=30: latest right at 25
      "l4" -> None,        // t=50: only right is at 60 (later)
      "l5" -> None))       // key 3: no right rows at all
  }

  test("asofJoin: multi-column payload always comes from the same right row") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0, "ten"), (1L, 90L, 9.0, "ninety"))
      .toDF("k", "t", "num", "name")
    val r = Temporal.asofJoin(left, right, "k", "t", Seq("num", "name"))
      .select("asof_num", "asof_name").head
    assert((r.getDouble(0), r.getString(1)) === ((9.0, "ninety")))
  }

  test("asofJoin matches brute-force over real purchase/click events") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val got = Temporal.asofJoin(purchases, clicks, "user_id", "ts", Seq("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    // compare in micros (getTime truncates to ms and could misorder
    // sub-ms-separated clicks)
    val clicksByUser = clicks
      .select(col("user_id"), unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    purchases.select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().foreach { r =>
      val (eid, uid, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = clicksByUser.getOrElse(uid, Array.empty)
        .filter(_._2 <= t)
        .sortBy(_._2)
        .lastOption.map(_._3)
      assert(got(eid) === expect, s"event $eid")
    }
  }

  test("asofJoin rejects a left input that already has the output column (chained joins)") {
    val left = Seq((1L, 10L, 5.0)).toDF("k", "t", "asof_v")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("asof_v"))
    // a different prefix resolves the chain
    val ok = Temporal.asofJoin(left, right, "k", "t", Seq("v"), outPrefix = "asof2_")
    assert(ok.columns.toSeq === Seq("k", "t", "asof_v", "asof2_v"))
  }

  test("sessionize: gap boundary is exclusive, exact-gap stays in session") {
    val base = 1700000000L * 1000000L // epoch micros
    def ts(sec: Long) = new java.sql.Timestamp(base / 1000L + sec * 1000L)
    val df = Seq(
      (1L, ts(0), 1L, 1.0),
      (1L, ts(1800), 2L, 2.0),  // exactly 30 min later -> same session
      (1L, ts(3601), 3L, 3.0),  // 1801s after prev -> NEW session
      (2L, ts(0), 4L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.sessionize(df, "user_id", "ts", "event_id", "value", 1800)
      .select("user_id", "session_id", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("sessionize conserves events and matches brute-force sessions per user") {
    val sess = Temporal.sessionize(events, "user_id", "ts", "event_id", "value", 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sess.map(_._3).sum === events.count())
    // brute-force session count for a handful of users (micros, like the
    // operator — getTime would truncate to ms)
    val byUser = events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byUser.take(5).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(x => (x._2, x._3))
      val nSessions = 1 + sorted.sliding(2).count {
        case Array(a, b) => (b._2 - a._2) > 1800L * 1000000L
        case _ => false
      }
      val gotN = sess.filter(_._1 == uid).map(_._2).max
      assert(gotN === nSessions.toLong, s"user $uid")
    }
  }

  test("mergeIntervals: running-max end swallows later-starting shorter intervals") {
    // key 1: [0,100] must swallow [10,20] (ends before the running max)
    // and chain into [90,150]; [200,210] opens island 2 — a lag(end)
    // implementation would wrongly split after [10,20]
    val df = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 90L, 150L),
      (1L, 4L, 200L, 210L), (2L, 5L, 0L, 10L))
      .toDF("k", "id", "s", "e")
    val got = Temporal.mergeIntervals(df, "k", "s", "e", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      (1L, 1L, 0L, 150L, 3L),
      (1L, 2L, 200L, 210L, 1L),
      (2L, 1L, 0L, 10L, 1L)))
  }

  test("mergeIntervals matches a sweep model on random intervals (touching merges)") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, i.toLong, s, s + rnd.nextInt(50).toLong)
    }
    val got = Temporal.mergeIntervals(
        data.toDF("k", "id", "s", "e"), "k", "s", "e", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val model = data.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(x => (x._3, x._2))
      val islands = sorted.foldLeft(Vector.empty[(Long, Long, Long)]) {
        case (acc, (_, _, s, e)) =>
          acc.lastOption match {
            case Some((is, ie, n)) if s <= ie =>
              acc.init :+ ((is, math.max(ie, e), n + 1))
            case _ => acc :+ ((s, e, 1L))
          }
      }
      islands.zipWithIndex.map { case ((is, ie, n), i) => (k, i + 1L, is, ie, n) }
    }.toSet
    assert(got === model)
  }

  test("interArrival: known gaps, single-event keys yield null stats") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq((1L, t(0), 1L), (1L, t(2), 2L), (1L, t(5), 3L), (2L, t(9), 4L))
      .toDF("user_id", "ts", "event_id")
    val rows = Temporal.interArrival(df, "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
    val u1 = rows(0)
    assert((u1.getLong(0), u1.getLong(1), u1.getLong(2)) === ((1L, 3L, 2L)))
    // gaps 2 s and 3 s: floor-average 2_500_000 us, max 3 s, min 2 s
    assert((u1.getLong(3), u1.getLong(4), u1.getLong(5)) ===
      ((2500000L, 3000000L, 2000000L)))
    val u2 = rows(1)
    assert((u2.getLong(1), u2.getLong(2)) === ((1L, 0L)))
    assert(u2.isNullAt(3) && u2.isNullAt(4) && u2.isNullAt(5))
  }

  test("rollingGaps matches the Scala sliding-frame model on real events") {
    val got = Temporal.rollingGaps(events, "user_id", "ts", "event_id", frameRows = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val evs = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.size === evs.length)
    evs.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val gaps: Seq[Option[Long]] = sorted.indices.map { i =>
        if (i == 0) None else Some(sorted(i)._3 - sorted(i - 1)._3)
      }
      sorted.zipWithIndex.foreach { case ((_, eid, _), i) =>
        val frame = gaps.slice(math.max(0, i - 3), i + 1).flatten
        val exp =
          if (frame.isEmpty) ((-1L, 0L, -1L, -1L))
          else ((gaps(i).getOrElse(-1L), frame.size.toLong, frame.sum,
            frame.sum / frame.size))
        assert(got((u, eid)) === exp, s"user $u event $eid")
      }
    }
  }

  test("PIT join: each fact matches exactly the interval containing it") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = graft.operators.MergeOps.scd2(
      Seq((1L, ts("2020-01-01 00:00:00"), "bronze"),
        (1L, ts("2020-02-01 00:00:00"), "silver"))
        .toDF("k", "ts", "segment"),
      Seq("k"), "ts")
    val facts = Seq((100L, 1L, ts("2020-01-15 00:00:00")),
      (101L, 1L, ts("2020-03-15 00:00:00")),
      (102L, 1L, ts("2019-12-15 00:00:00"))) // before first version
      .toDF("event_id", "k", "fts")
    val got = facts.join(dim, Seq("k"))
      .filter(col("fts") >= col("valid_from") &&
        (col("valid_to").isNull || col("fts") < col("valid_to")))
      .select("event_id", "segment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(100L -> "bronze", 101L -> "silver"))
  }

  test("resample materializes empty bins and forward-fills across gaps") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key a: hours 10, 13 (two-hour gap); key b: hour 10 only
    val df = Seq(
      ("a", ts("2020-01-01 10:05:00"), 1.0),
      ("a", ts("2020-01-01 10:40:00"), 3.0), // same bin, max wins
      ("a", ts("2020-01-01 13:10:00"), 7.0),
      ("b", ts("2020-01-01 10:59:00"), 5.0))
      .toDF("k", "ts", "value")
    val got = Temporal.resample(df, "k", "ts", "value", unit = "hour")
      .orderBy("k", "bin").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", "2020-01-01 10:00:00.0", 2L, 3.0),
      ("a", "2020-01-01 11:00:00.0", 0L, 3.0), // gap bin, filled
      ("a", "2020-01-01 12:00:00.0", 0L, 3.0), // gap bin, filled
      ("a", "2020-01-01 13:00:00.0", 1L, 7.0),
      ("b", "2020-01-01 10:00:00.0", 1L, 5.0)))
  }

  test("interpFill linearly interpolates interior gaps; observed bins pass through") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key a: values 1 at h10 and 7 at h13 -> gap bins get 3 and 5;
    // key b: single bin, no gaps
    val df = Seq(
      ("a", ts("2020-01-01 10:05:00"), 1.0),
      ("a", ts("2020-01-01 13:10:00"), 7.0),
      ("b", ts("2020-01-01 10:59:00"), 5.0))
      .toDF("k", "ts", "value")
    val got = Temporal.interpFill(df, "k", "ts", "value", unit = "hour")
      .orderBy("k", "bin").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", "2020-01-01 10:00:00.0", 1L, 1.0),
      ("a", "2020-01-01 11:00:00.0", 0L, 3.0), // 1 + 6 * 1/3
      ("a", "2020-01-01 12:00:00.0", 0L, 5.0), // 1 + 6 * 2/3
      ("a", "2020-01-01 13:00:00.0", 1L, 7.0),
      ("b", "2020-01-01 10:00:00.0", 1L, 5.0)))
  }

  test("interpFill matches a driver model on real per-type hourly series") {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Temporal.interpFill(events, "event_type", "ts", "value", unit = "hour")
      .orderBy("event_type", "bin").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    // model: per type, hourly max bins; gaps linear in bin index
    val trunc = events.select(col("event_type"), date_trunc("hour", col("ts")).as("bin"),
      col("value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val expect = trunc.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, rows) =>
      val byBin = rows.groupBy(_._2).map { case (b, v) =>
        b -> ((v.size.toLong, v.map(_._3).max)) }
      val bins = byBin.keys.toSeq.sortBy(_.getTime)
      val lo = bins.head.getTime; val hi = bins.last.getTime
      val grid = (lo to hi by 3600000L).map(new java.sql.Timestamp(_))
      val knownIdx = grid.zipWithIndex.filter(g => byBin.contains(g._1)).map(_._2)
      grid.zipWithIndex.map { case (b, i) =>
        byBin.get(b) match {
          case Some((n, v)) => (t, b, n, r6(v))
          case None =>
            val pi = knownIdx.filter(_ < i).max; val ni = knownIdx.filter(_ > i).min
            val pv = byBin(grid(pi))._2; val nv = byBin(grid(ni))._2
            (t, b, 0L, r6(pv + (nv - pv) * ((i - pi).toDouble / (ni - pi).toDouble)))
        }
      }
    }
    assert(got.toSeq === expect)
  }

  test("touchAttribution: ties pin touch-before-conversion; no-touch conversions bucket 'none'") {
    val df = Seq(
      // user 1: view -> click -> purchase (first view, last click)
      (1L, "2020-01-01 10:00:00", "view", 1L),
      (1L, "2020-01-01 11:00:00", "click", 2L),
      (1L, "2020-01-01 12:00:00", "purchase", 3L),
      // user 2: purchase with no touches -> none/none
      (2L, "2020-01-01 10:00:00", "purchase", 4L),
      // user 3: SAME-ts touch and purchase: touch sorts first (pinned)
      (3L, "2020-01-01 10:00:00", "signup", 5L),
      (3L, "2020-01-01 10:00:00", "purchase", 6L),
      // user 4: a touch AFTER the purchase must not count
      (4L, "2020-01-01 10:00:00", "purchase", 7L),
      (4L, "2020-01-01 11:00:00", "view", 8L))
      .map { case (u, ts, ty, id) => (u, java.sql.Timestamp.valueOf(ts), ty, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Temporal.touchAttribution(df, "user_id", "ts", "event_type",
        "event_id", Seq("view", "click", "signup"), "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("view", "click") -> 1L,
      ("none", "none") -> 2L,
      ("signup", "signup") -> 1L))
  }

  test("touchAttribution matches the brute-force journey model on real events") {
    val touches = Set("view", "click", "signup")
    val rows = events.select("user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .filter(e => touches(e._3) || e._3 == "purchase")
    val model = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e =>
        (e._2.getTime, e._2.getNanos, if (e._3 == "purchase") 1 else 0, e._4))
      var first: Option[String] = None
      var last: Option[String] = None
      sorted.flatMap { e =>
        if (e._3 == "purchase")
          Some((first.getOrElse("none"), last.getOrElse("none")))
        else {
          if (first.isEmpty) first = Some(e._3)
          last = Some(e._3)
          None
        }
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Temporal.touchAttribution(events, "user_id", "ts", "event_type",
        "event_id", Seq("view", "click", "signup"), "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === model)
  }

  // --- NTZ regression guard (round-8, VERDICT r7 #2) -----------------------
  // The regenerated testdata writes events.ts as parquet timestamp[us]
  // WITHOUT isAdjustedToUTC, which Spark surfaces as TIMESTAMP_NTZ — and
  // unix_micros / withWatermark / java.sql.Timestamp encoders all reject
  // NTZ. Tables.normalizeNanosTs is the single place the encoding rule
  // lives; these cases pin it against BOTH wild encodings.

  test("catalog surfaces one uniform ts type from both parquet encodings") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val base = events.select("event_id", "user_id", "ts", "value").limit(200)
    // encoding A: timestamp[us] without UTC adjustment (pandas default)
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // encoding B: legacy int64 nanoseconds (nanosAsLong surfaces LongType)
    base.withColumn("ts", (unix_micros(col("ts")) * 1000L).cast(LongType))
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
    val fromNtz = Tables.load(spark, s"$dir/ntz", "events")
    val fromNanos = Tables.load(spark, s"$dir/nanos", "events")
    assert(fromNtz.schema("ts").dataType === TimestampType,
      s"NTZ parquet must normalize to TIMESTAMP, got ${fromNtz.schema("ts").dataType}")
    assert(fromNanos.schema("ts").dataType === TimestampType,
      s"int64-nanos parquet must normalize to TIMESTAMP, got ${fromNanos.schema("ts").dataType}")
    // under the pinned UTC session TZ both relabelings are EXACT: every
    // row's micros value round-trips unchanged through either encoding
    val want = base.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(fromNtz, fromNanos).foreach { df =>
      val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
    }
  }

  test("temporal operators run over an NTZ-encoded catalog load") {
    import org.apache.spark.sql.types.TimestampNTZType
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_ops").toString
    events.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.load(spark, dir, "events")
    // each operator calls unix_micros(ts) internally — red on a raw NTZ
    // column, green once the catalog normalizes. Results must match the
    // same operator over the original TIMESTAMP-typed frame exactly.
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(canon(Temporal.sessionize(ev, "user_id", "ts", "event_id", "value", 1800)) ===
      canon(Temporal.sessionize(events, "user_id", "ts", "event_id", "value", 1800)))
    assert(canon(Temporal.interArrival(ev, "user_id", "ts", "event_id")) ===
      canon(Temporal.interArrival(events, "user_id", "ts", "event_id")))
    assert(canon(Temporal.rollingGaps(ev, "user_id", "ts", "event_id")) ===
      canon(Temporal.rollingGaps(events, "user_id", "ts", "event_id")))
    val iv = ev.select(col("user_id"), unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) + 600L * 1000000L).as("e_us"), col("event_id"))
    val ivBase = events.select(col("user_id"), unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) + 600L * 1000000L).as("e_us"), col("event_id"))
    assert(canon(Temporal.mergeIntervals(iv, "user_id", "s_us", "e_us", "event_id")) ===
      canon(Temporal.mergeIntervals(ivBase, "user_id", "s_us", "e_us", "event_id")))
  }

  test("intervalJoin == brute-force overlap join; multi-bin pairs emit once (r8)") {
    import spark.implicits._
    // bin = 10 us. Intervals deliberately span several bins; (1, 20)
    // shares bins 0..2 with (15, 40) — must still emit once. Touching
    // endpoints (closed semantics) overlap with 0 us.
    val as = Seq((1L, 1L, 20L), (2L, 15L, 40L), (3L, 100L, 130L),
      (4L, 50L, 50L))
    val bs = Seq((10L, 0L, 35L), (11L, 40L, 49L), (12L, 130L, 140L),
      (13L, 50L, 55L))
    val a = as.toDF("aid", "a_start", "a_end")
    val b = bs.toDF("bid", "b_start", "b_end")
    val got = Temporal.intervalJoin(a, b, "a_start", "a_end",
        "b_start", "b_end", binUs = 10L)
      .select("aid", "bid", "overlap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val model = (for {
      (aid, s1, e1) <- as; (bid, s2, e2) <- bs
      if s1 <= e2 && s2 <= e1
    } yield (aid, bid, math.min(e1, e2) - math.max(s1, s2))).toSet
    assert(got === model)
    // the model includes the closed-endpoint touch (2,11) with 0 us and
    // the point-interval (4,13); count equality proves emit-once
    assert(model.contains((2L, 11L, 0L)) && model.contains((4L, 13L, 0L)))
    val gotRows = Temporal.intervalJoin(a, b, "a_start", "a_end",
      "b_start", "b_end", binUs = 10L).count()
    assert(gotRows === model.size.toLong)
    intercept[IllegalArgumentException] {
      Temporal.intervalJoin(a, b, "a_start", "a_end", "b_start", "b_end", 0L)
    }
  }
}
