package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY §2.4 — Structured Streaming transforms over the events stream.
  * Batch analogues are q_events_bucket (windowed counts) and gedixr's
  * per-granule run loop; here the same semantics run incrementally with
  * bounded state: the watermark expires window state, and sessions expire
  * via event-time timeout. Specs drive these with MemoryStream — the
  * ScalaTest IS the oracle (no DuckDB entry for streams).
  */
object EventStreams {

  /** Windowed event counts + watermark (stream_bucket). State per window
    * is dropped once the watermark passes window end — memory is bounded
    * by (watermark / window) live windows per key-space, not by stream
    * length. */
  def bucketCounts(events: DataFrame, windowDur: String = "1 hour",
                   watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup: drop events whose key was already seen within
    * the watermark horizon (the incremental form of Dedup.exactDedup —
    * state is bounded by the watermark, so memory doesn't grow with the
    * stream). Keys should include the event id / content hash. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream join: enrich an event stream with a second stream
    * (e.g. impressions ⋈ purchases) keyed by `key`, with both sides
    * watermarked and the match bounded to `maxDelay` of event time —
    * the time bound is what lets Spark discard state, keeping the join's
    * memory proportional to the delay window, not the stream history.
    *
    * `how = "left_outer"` adds attribution's MISS rows: an impression
    * with no purchase inside the bound emits null-extended — but only
    * once BOTH watermarks have passed its match window (the engine must
    * be sure no matching right row can still arrive), so outer results
    * trail the inner ones by up to watermark + maxDelay of event time.
    * Same state bound as the inner join. */
  def joinStreams(left: DataFrame, right: DataFrame, key: String,
                  watermark: String = "30 minutes",
                  maxDelay: String = "1 hour",
                  how: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("ts") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $maxDelay"),
      how)
  }

  /** Durable sink: stream a frame to date-partitioned parquet (the
    * lakehouse ingest layout — each day's directory is one partition for
    * downstream pruning). Returns the started query; caller awaits. */
  def toPartitionedParquet(df: DataFrame, outDir: String,
                           checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .writeStream
      .partitionBy("date")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .outputMode("append")
      .start(outDir)

  /** Streaming latest-wins upsert: fold each micro-batch into a parquet
    * state snapshot via [[graft.operators.MergeOps.latestWinsMerge]] —
    * the streaming form of q_incr_merge (a continuously maintained
    * current-state table). foreachBatch may REPLAY a batch after a
    * failure; latest-wins is idempotent under replay (re-merging the
    * same rows yields the same state), which is what makes this sink
    * exactly-once in effect without a transactional store. The merged
    * frame is materialized (localCheckpoint) before the overwrite
    * because its plan reads the same directory it replaces; a lakehouse
    * table format's ACID swap is the cluster-grade version of this
    * materialize-then-replace, with the same merge plan inside. */
  def upsertParquet(df: DataFrame, stateDir: String, checkpointDir: String,
                    keys: Seq[String], version: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // existence check through the Hadoop FS layer, not java.nio: a
        // URI-style ("file:/...") or non-local stateDir is a path
        // spark.read understands but Paths.get does not — the nio check
        // would be false every batch and silently RESET the state to
        // just that batch's keys
        val spark = batch.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(stateDir)
        val exists = hPath
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(hPath)
        val base =
          if (exists) spark.read.parquet(stateDir)
          else batch.limit(0)
        val merged = graft.operators.MergeOps
          .latestWinsMerge(base, batch.toDF(), keys, version)
          .localCheckpoint()
        try merged.write.mode("overwrite").parquet(stateDir)
        finally org.apache.spark.sql.graftbridge.PlanBridge
          .unpersistLocalCheckpoint(merged)
        ()
      }
      .start()

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, sum_value: Double)
  final case class SessState(start: Long, last: Long, n: Long, sum: Double)

  /** Sessionization via flatMapGroupsWithState (stream_session): sessions
    * close after `gapMs` of event-time silence, enforced two ways — a
    * micro-batch may contain the gap itself (emit immediately), or the gap
    * spans batches (event-time timeout fires once the watermark passes
    * last + gap). Keyed by user_id, so state shards across executors. */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val out = Seq.newBuilder[Session]
            var cur = state.getOption
            for (e <- evs.toSeq.sortBy(_.ts.getTime)) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.result().iterator
          }
      }
  }
}
