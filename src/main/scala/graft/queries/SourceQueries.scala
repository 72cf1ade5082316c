package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Manifest

/** SURVEY §2.1 (manifest row) — granule-manifest source with pruning and
  * job resume (R20). The manifest is synthesized deterministically from
  * `orders` so both engines derive identical inputs from the same parquet.
  */
object SourceQueries {

  val defs: Seq[Q] = Seq(

    Q("q_manifest_prune",
      (s, d) => {
        val k = col("o_orderkey")
        val prod = when(k % 2 === 0, "GEDI02_A").otherwise("GEDI02_B")
        val gid = concat(prod, format_string("_%04d%03d%02d%02d%02d",
          lit(2019) + (k % 3), (k % 365) + 1, k % 24, k % 60, (k * 7) % 60))
        val m = Tables.load(s, d, "orders").select(
          k.as("k"), gid.as("granule_id"), prod.as("product"),
          col("o_orderdate").as("acq_time"),
          ((k % 36) * 10 - 180).cast("double").as("xmin"),
          ((k % 36) * 10 - 170).cast("double").as("xmax"),
          (((k * 3) % 18) * 10 - 90).cast("double").as("ymin"),
          (((k * 3) % 18) * 10 - 80).cast("double").as("ymax"))
        val done = m.filter(col("k") % 7 === 0).select("granule_id")
        val pruned = Manifest.prune(m.drop("k"),
          productPattern = Some("GEDI02_A%"),
          monthRange = Some((6, 8)),
          bbox = Some((-30.0, 30.0, -10.0, 40.0)))
        Manifest.pendingOnly(pruned, done)
          .select(col("granule_id"), col("product"),
            to_date(col("acq_time")).as("odate"),
            col("xmin"), col("xmax"), col("ymin"), col("ymax"))
          .orderBy("granule_id")
      },
      Some("WITH m AS (SELECT o_orderkey AS k, " +
        "CASE WHEN o_orderkey % 2 = 0 THEN 'GEDI02_A' ELSE 'GEDI02_B' END || " +
        "printf('_%04d%03d%02d%02d%02d', 2019 + (o_orderkey % 3), (o_orderkey % 365) + 1, " +
        "o_orderkey % 24, o_orderkey % 60, (o_orderkey * 7) % 60) AS granule_id, " +
        "CASE WHEN o_orderkey % 2 = 0 THEN 'GEDI02_A' ELSE 'GEDI02_B' END AS product, " +
        "o_orderdate AS acq_time, " +
        "CAST((o_orderkey % 36) * 10 - 180 AS DOUBLE) AS xmin, " +
        "CAST((o_orderkey % 36) * 10 - 170 AS DOUBLE) AS xmax, " +
        "CAST(((o_orderkey * 3) % 18) * 10 - 90 AS DOUBLE) AS ymin, " +
        "CAST(((o_orderkey * 3) % 18) * 10 - 80 AS DOUBLE) AS ymax FROM orders) " +
        "SELECT granule_id, product, CAST(acq_time AS DATE) AS odate, " +
        "xmin, xmax, ymin, ymax FROM m " +
        "WHERE product LIKE 'GEDI02_A%' " +
        "AND EXTRACT(month FROM acq_time) BETWEEN 6 AND 8 " +
        "AND xmin < 30.0 AND xmax > -30.0 AND ymin < 40.0 AND ymax > -10.0 " +
        "AND granule_id NOT IN (SELECT granule_id FROM m WHERE k % 7 = 0) " +
        "ORDER BY granule_id"))
  )
}
