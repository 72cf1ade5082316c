package graft.operators

import org.apache.spark.sql.DataFrame

/** gedixr `merge_gdf` re-expressed (reference: gedixr/xr.py:56-112): a
  * suffix join of the L2A and L2B frames on a composite key (the reference
  * default is `[geometry, shot, acq_time]`, xr.py:86).
  *
  * Scale notes: Spark picks broadcast vs sort-merge via AQE. On the 100 TB
  * path both sides come from the same extraction pipeline, so they should be
  * written bucketed by `shot` — then this join is co-located and needs no
  * re-shuffle (SURVEY §5).
  */
object MergeOps {

  /** Suffix join. `how` mirrors the reference's `how` parameter
    * (xr.py:73-75); overlapping non-key columns get the `suffixes`
    * (xr.py:84). The reference merges `l2b.merge(l2a)` — l2b is the left
    * side (xr.py:109). */
  def mergeGdf(l2a: DataFrame, l2b: DataFrame,
               on: Seq[String] = Seq("shot", "acq_time"),
               how: String = "inner",
               suffixes: (String, String) = ("_l2a", "_l2b")): DataFrame = {
    val overlap = (l2a.columns.toSet & l2b.columns.toSet) -- on.toSet
    def resuffix(df: DataFrame, sfx: String) =
      overlap.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + sfx))
    resuffix(l2b, suffixes._2).join(resuffix(l2a, suffixes._1), on, how)
  }

  /** Merge pre-checks — ref xr.py:115-141: schema compatibility and
    * row-count comparison (CRS equality is moot here: graft geometries are
    * always EPSG:4326 numeric columns, like the reference enforces in
    * ancillary.py:146-147). Returns (leftCount, rightCount). */
  def compareFrames(a: DataFrame, b: DataFrame): (Long, Long) = {
    require(a.columns.nonEmpty && b.columns.nonEmpty)
    (a.count(), b.count())
  }
}
