package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: does a CollectMetrics observation fire when the frame
  * is materialized by localCheckpoint()? (Decides whether iterative gate
  * scores can ride a round's checkpoint action instead of their own.) */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("gate")
    val df = spark.range(100).toDF("x")
      .observe(obs, sum(col("x")).as("sx"), count(lit(1)).as("n"))
    val ck = df.localCheckpoint()
    Thread.sleep(500)
    println("OBS after localCheckpoint: " +
      org.apache.spark.sql.graftbridge.PlanBridge.observedMetrics(obs))
    println("CK count: " + ck.count())
    // does collect_list of a struct (incl. an array col) survive observe?
    val obs2 = Observation("rows")
    val df2 = spark.range(10).toDF("id")
      .withColumn("vec", array(col("id").cast("float"),
        (col("id") * 2).cast("float")))
      .observe(obs2, collect_list(when(col("id") < 3,
        struct(col("id"), col("vec")))).as("coarse"))
    df2.localCheckpoint()
    Thread.sleep(500)
    val m2 = org.apache.spark.sql.graftbridge.PlanBridge.observedMetrics(obs2)
    println("OBS2 keys: " + m2.keys)
    m2.get("coarse").foreach { v =>
      val rows = v.asInstanceOf[Seq[org.apache.spark.sql.Row]]
      println("OBS2 rows: " + rows.map(r =>
        (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1))
    }
    spark.stop()
  }
}
