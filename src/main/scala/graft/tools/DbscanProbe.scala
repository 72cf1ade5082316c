package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of the q_dbscan chain at a given sf —
  * a profiling aid (tools/, not shipped): times each materialization the
  * operator pays so an optimization pass attacks the measured stage, not
  * a guessed one. Mirrors GeoOps.dbscanCore stage by stage. */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    graft.plans.GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val ev = Tables.load(spark, sfDir, "events")
    val pts = ev.select(col("event_id").as("id"),
      ((col("event_id") * 7919L) % 1000000L).as("ix"),
      ((col("event_id") * 104729L + col("user_id")) % 1000000L).as("iy"))
    val n = t("count") { pts.count() }
    val r = graft.operators.GeoOps.densityRadius(n)
    println(s"[probe] n=$n r=$r")
    // warm-up full run, then timed full, then stages
    t("full-warm") {
      graft.operators.GeoOps.dbscan(pts, r, 5, 4).write.format("noop")
        .mode("overwrite").save()
    }
    t("full") {
      graft.operators.GeoOps.dbscan(pts, r, 5, 4).write.format("noop")
        .mode("overwrite").save()
    }
    // stage breakdown (mirrors dbscanCore)
    import org.apache.spark.sql.graftbridge.PlanBridge
    val pairs = t("pairs-ckpt") {
      graft.operators.GeoOps.radiusJoin(pts, r).select("id_a", "id_b")
        .localCheckpoint()
    }
    println(s"[probe] pairs=${pairs.count()}")
    val deg = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_nbrs"))
    val ptsF = t("deg-ckpt") {
      pts.select(col("id"))
        .join(broadcast(deg), Seq("id"), "left")
        .withColumn("n_nbrs", coalesce(col("n_nbrs"), lit(0L)))
        .localCheckpoint()
    }
    val core = ptsF.filter(col("n_nbrs") >= 4).select("id")
    val adj = pairs
      .join(broadcast(core.withColumnRenamed("id", "id_a")), Seq("id_a"), "left_semi")
      .join(broadcast(core.withColumnRenamed("id", "id_b")), Seq("id_b"), "left_semi")
      .select(col("id_a").as("v"), col("id_b").as("w"))
    val adjSym = t("adj-ckpt") {
      adj.unionByName(adj.select(col("w").as("v"), col("v").as("w")))
        .unionByName(core.select(col("id").as("v"), col("id").as("w")))
        .localCheckpoint()
    }
    println(s"[probe] adjSym=${adjSym.count()} core=${core.count()}")
    var labels = core.withColumn("cluster", col("id"))
    val lab = t("4-rounds-bcast") {
      var l = labels
      for (_ <- 1 to 4) {
        l = adjSym.join(broadcast(l.withColumnRenamed("id", "v")), Seq("v"))
          .select(col("w").as("id"), col("cluster"))
          .groupBy("id").agg(min(col("cluster")).as("cluster"))
      }
      l.localCheckpoint()
    }
    val shuffleP = spark.sessionState.conf.numShufflePartitions
    val adjW = t("adj-wpart-ckpt") {
      adj.unionByName(adj.select(col("w").as("v"), col("v").as("w")))
        .unionByName(core.select(col("id").as("v"), col("id").as("w")))
        .repartition(shuffleP, col("w"))
        .localCheckpoint()
    }
    t("4-rounds-wpart") {
      var l = labels
      for (_ <- 1 to 4) {
        l = adjW.join(broadcast(l.withColumnRenamed("id", "v")), Seq("v"))
          .select(col("w").as("id"), col("cluster"))
          .groupBy("id").agg(min(col("cluster")).as("cluster"))
      }
      l.write.format("noop").mode("overwrite").save()
    }
    println("[probe] wpart round plan:")
    locally {
      val l1 = adjW.join(broadcast(labels.withColumnRenamed("id", "v")), Seq("v"))
        .select(col("w").as("id"), col("cluster"))
        .groupBy("id").agg(min(col("cluster")).as("cluster"))
      println(l1.queryExecution.executedPlan.toString.linesIterator
        .filter(s => s.contains("Exchange") || s.contains("HashAggregate") || s.contains("BroadcastHashJoin"))
        .mkString("\n"))
    }
    // hypothesis: degree agg without doubling the pair frame through the
    // exchange — two per-endpoint aggs on the same checkpoint + outer merge
    t("deg-split") {
      val da = pairs.groupBy(col("id_a").as("id")).agg(count(lit(1)).as("na"))
      val db = pairs.groupBy(col("id_b").as("id")).agg(count(lit(1)).as("nb"))
      da.join(db, Seq("id"), "full")
        .select(col("id"), (coalesce(col("na"), lit(0L)) +
          coalesce(col("nb"), lit(0L))).as("n_nbrs"))
        .write.format("noop").mode("overwrite").save()
    }
    // hypothesis: border short-circuit — when no non-core point exists the
    // border pass is provably empty; the gate is one job on the
    // checkpointed degree frame
    t("noncore-count") {
      println(s"[probe] nonCore=${ptsF.filter(col("n_nbrs") < 4).limit(1).count()}")
    }
    t("final-noborder") {
      val coreL = lab.withColumn("role", lit("core"))
      ptsF.join(broadcast(coreL), Seq("id"), "left")
        .select(col("id"), col("n_nbrs"),
          coalesce(col("role"), lit("noise")).as("role"), col("cluster"))
        .write.format("noop").mode("overwrite").save()
    }
    t("border+final") {
      val borderLabels = pairs
        .join(broadcast(core.withColumnRenamed("id", "id_a")), Seq("id_a"), "left_semi")
        .join(broadcast(core.withColumnRenamed("id", "id_b")), Seq("id_b"), "left_anti")
        .select(col("id_a").as("cid"), col("id_b").as("pid"))
        .unionByName(pairs
          .join(broadcast(core.withColumnRenamed("id", "id_b")), Seq("id_b"), "left_semi")
          .join(broadcast(core.withColumnRenamed("id", "id_a")), Seq("id_a"), "left_anti")
          .select(col("id_b").as("cid"), col("id_a").as("pid")))
        .join(broadcast(lab.withColumnRenamed("id", "cid")), Seq("cid"))
        .groupBy(col("pid").as("id")).agg(min(col("cluster")).as("cluster"))
      val coreL = lab.withColumn("role", lit("core"))
      val borderL = borderLabels.withColumn("role", lit("border"))
      ptsF.join(broadcast(coreL.unionByName(borderL)), Seq("id"), "left")
        .select(col("id"), col("n_nbrs"),
          coalesce(col("role"), lit("noise")).as("role"), col("cluster"))
        .write.format("noop").mode("overwrite").save()
    }
    // the ORDER BY the declared query carries (stripTopSort removes it in
    // bench, so NOT part of the board cost — timed for completeness)
    spark.stop()
  }
}
