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
    spark.stop()
  }
}
