package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines ingest for the catalog tables — the interchange
  * formats a training-data pipeline receives from upstream crawlers and
  * labeling tools before converting to parquet.
  *
  * Scale rules baked in: schemas are EXPLICIT (schema inference is a
  * full extra pass over 100 TB — never pay it), `columnNameOfCorruptRecord`
  * routes malformed lines to a quarantine column instead of failing the
  * job (PERMISSIVE), and both formats split by line so reads parallelize
  * per HDFS block like any text source. `toParquet` is the one-time
  * conversion that makes every downstream scan pruned + pushdown-eligible.
  */
object TextSources {

  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                quarantineCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(quarantineCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true,
              quarantineCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(quarantineCol, "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .csv(path)

  /** One-time conversion to parquet (optionally partitioned) — after
    * which every read is columnar, pruned, and pushdown-eligible. */
  def toParquet(df: DataFrame, out: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(out)
  }

  /** ORC interchange — the other columnar lake format Spark ships
    * natively. Same pruning/pushdown properties as parquet (filters and
    * ReadSchema reach the ORC scan), for pipelines whose upstream (Hive,
    * Trino, legacy lakes) hands over ORC instead of parquet. */
  def toOrc(df: DataFrame, out: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(out)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
