package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.PlanBridge

/** Per-query time attribution probe (optimization rounds): runs named
  * queries through the SAME harness shape as Bench (noop sink, stripped
  * top sort, warm-up pass) and reports, per query, where the wall time
  * goes — number of Spark jobs (each an action/materialization barrier),
  * scheduled job wall, summed task time, shuffle bytes — so a slow query
  * can be attributed to driver/planning overhead (wall >> job wall),
  * action count (many small jobs), or genuine task work before any code
  * is touched.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.QueryProbe
  *          /root/testdata/sf0.1 q_louvain,q_profile [reps]"
  */
object QueryProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q1_pricing_agg"))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    graft.plans.GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")

    // r19 (ADVICE): AtomicLong counters + a deterministic listener-bus
    // drain (waitUntilEmpty) replace volatile `+=` and a fixed sleep —
    // on a loaded bus a rep's events could bleed into the next rep's
    // reset and skew the attribution this tool exists to provide.
    import java.util.concurrent.atomic.AtomicLong
    val jobs = new AtomicLong
    val jobWallNs = new AtomicLong
    val taskTimeMs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    def resetCounters(): Unit =
      Seq(jobs, jobWallNs, taskTimeMs, stages, tasks, shufWrite, shufRead)
        .foreach(_.set(0L))
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStart(j.jobId) = System.nanoTime()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        jobStart.remove(j.jobId)
          .foreach(t0 => jobWallNs.addAndGet(System.nanoTime() - t0))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {}
    }

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      PlanBridge.stripTopSort(graft.SparkEntry.queries(name)(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      runOnce(name) // warm-up (JIT, codegen, footers) — not measured
      spark.sparkContext.addSparkListener(listener)
      val walls = (1 to reps).map { _ =>
        PlanBridge.drainListenerBus(spark)
        resetCounters()
        val w = runOnce(name)
        // deterministic drain: all events for this rep's jobs are posted
        // before the action returns; waitUntilEmpty flushes them through
        PlanBridge.drainListenerBus(spark)
        (w, jobs.get, jobWallNs.get / 1e9, taskTimeMs.get / 1e3, stages.get,
          tasks.get, shufWrite.get, shufRead.get)
      }
      spark.sparkContext.removeSparkListener(listener)
      val best = walls.minBy(_._1)
      println(f"PROBE ${name}%-28s wall=${best._1}%7.3f jobs=${best._2}%3d " +
        f"jobWall=${best._3}%7.3f taskTime=${best._4}%8.3f stages=${best._5}%3d " +
        f"tasks=${best._6}%5d shufW=${best._7 / 1024}%8dKB shufR=${best._8 / 1024}%8dKB")
    }
    spark.stop()
  }
}
