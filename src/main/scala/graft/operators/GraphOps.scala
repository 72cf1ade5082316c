package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over candidate-pair graphs (SURVEY §2.3) — the audit
  * layer on top of the dedup graph builders: [[Dedup]] turns buckets into
  * edges and components; these operators measure the GRAPH ITSELF
  * (clustering coefficient = how clique-like the near-dup neighborhoods
  * are — a sanity signal for LSH threshold tuning: random-pair noise has
  * coefficient ~0, true duplicate clusters ~1).
  */
object GraphOps {

  /** Exact triangle count + global clustering coefficient of an
    * undirected graph given as an edge list (any orientation/dups — the
    * edge set is canonicalized first).
    *
    * The compute-bounding trick is orientation: every triangle x<y<z is
    * counted exactly once by joining oriented edges (x,y)⋈(y,z) into
    * wedges and semi-joining the closing edge (x,z) — three shuffles on
    * 8-byte vertex keys, never an all-pairs step. Wedge totals come from
    * the degree frame (Σ deg·(deg−1)/2, exact integers). The canonical
    * edge set is localCheckpoint-ed: four downstream aggregates read the
    * materialized edges instead of re-deriving the (possibly expensive)
    * candidate-pair lineage; on a cluster that is a reliable-storage
    * checkpoint. For skewed degree distributions the standard refinement
    * is degree orientation (low-degree endpoint first), which bounds the
    * per-vertex wedge fan-out by arboricity without changing the count —
    * id orientation keeps the oracle tree identical, which is what makes
    * the result hash-verifiable.
    *
    * Output: one row (n_vertices, n_edges, n_wedges, n_triangles,
    * clustering_coeff = 3·triangles/wedges).
    */
  def triangleStats(edges0: DataFrame,
                    aCol: String = "a", bCol: String = "b"): DataFrame = {
    val e = edges0
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") < col("b")).distinct()
      .localCheckpoint()
    val degs = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e2.b").as("z"))
    val closed = wedges.join(e.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    degs.agg(count(lit(1)).as("n_vertices"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(degs.agg(
        coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          round((lit(3.0) * col("n_triangles").cast("double")) /
            col("n_wedges").cast("double"), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }
}
