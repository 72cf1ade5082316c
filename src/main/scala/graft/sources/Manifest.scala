package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Granule-manifest source — the Spark-first form of gedixr's download
  * surface (reference download.py:19-110: CMR/Harmony-style granule
  * listing with spatial/temporal subset parameters and job resume).
  *
  * A manifest is a plain DataFrame with columns
  * (granule_id, product, acq_time, xmin, xmax, ymin, ymax, path) — so
  * pruning is ordinary pushdown-eligible predicates (at scale the
  * manifest is parquet and product/month/bbox prune at the row-group
  * level), and "which granules still need fetching" is a left-anti join,
  * not a driver-side loop over job files.
  */
object Manifest {

  val columns: Seq[String] =
    Seq("granule_id", "product", "acq_time", "xmin", "xmax", "ymin", "ymax", "path")

  /** Prune by product glob (R1's pattern), month-of-year range (R3, hi/lo
    * normalized like the reference), and bbox intersection (download.py's
    * spatial subset). All predicates are conjunctive scan filters. */
  def prune(manifest: DataFrame,
            productPattern: Option[String] = None,
            monthRange: Option[(Int, Int)] = None,
            bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val preds = Seq(
      productPattern.map(p => col("product").like(p)),
      monthRange.map { case (a, b) =>
        val (lo, hi) = if (a > b) (b, a) else (a, b)
        month(col("acq_time")).between(lo, hi)
      },
      bbox.map { case (x0, x1, y0, y1) =>
        col("xmin") < x1 && col("xmax") > x0 && col("ymin") < y1 && col("ymax") > y0
      }).flatten
    preds.foldLeft(manifest)(_ filter _)
  }

  /** Job resume (download.py's completed-granule skip): keep only granules
    * absent from `done`. Left-anti join — broadcast when `done` is small. */
  def pendingOnly(manifest: DataFrame, done: DataFrame): DataFrame =
    manifest.join(done.select("granule_id"), Seq("granule_id"), "left_anti")

  /** Recursive granule discovery by glob pattern — R1 (ref
    * extract.py:128-129: rglob over a root directory). File listing is a
    * driver-side action in Spark too (this is what every DataSource does
    * before planning splits); the result is a small manifest frame
    * (path, size, mtime, granule_id) that downstream pruning runs on. */
  def discover(spark: SparkSession, root: String,
               glob: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:$glob")
    def walk(p: Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (matcher.matches(java.nio.file.Paths.get(st.getPath.getName)))
          Seq((st.getPath.toString, st.getLen, st.getModificationTime))
        else Seq.empty
      }
    val rows = walk(new Path(root))
    import spark.implicits._
    rows.toDF("path", "size", "mtime")
      .withColumn("granule_id",
        regexp_extract(col("path"), "([^/]+)\\.[A-Za-z0-9]+$", 1))
  }
}
