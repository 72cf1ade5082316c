package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the pattern behind Spark's own runtime row
  * filtering (InjectRuntimeFilter), exposed as an explicit operator so a
  * pipeline can prune a 100 TB fact scan against a keyed dimension BEFORE
  * any shuffle happens.
  *
  * Shape: build one bloom filter over the dimension keys (a distributed
  * treeAggregate — only the ~KB filter reaches the driver, never the
  * keys), probe it in the fact's scan stage with Spark's native
  * codegen'd [[BloomFilterMightContain]] expression (no UDF), then run
  * the EXACT semi-join on the survivors. The bloom admits false
  * positives only, so the final result is exactly the semi-join — the
  * filter just shrinks the join's shuffle input by ~(1 - selectivity).
  *
  * At 100 TB: a 1% -selective dimension turns a full fact shuffle into a
  * ~1% shuffle for the cost of one broadcast-sized bitmap in the task
  * closure — the same economics that make Spark's automatic runtime
  * filtering its highest-leverage AQE-era optimization, but available
  * deterministically and to non-equi downstreams.
  */
object BloomOps {

  /** Exact left-semi join of `fact` against `dim`, bloom-pruned.
    *
    * @param expectedItems sizing for the bloom (≥ distinct dim keys keeps
    *   the realized fpp at or under `fpp`)
    * @param fpp target false-positive rate; survivors ≈ matches +
    *   fpp × non-matches */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // stat.bloomFilter inserts integral keys via putLong, and
    // BloomFilterMightContain probes with mightContainLong — so the probe
    // value is the raw key as int64, NOT re-hashed (Spark's injected
    // filters hash with xxhash64 on BOTH sides instead; either is
    // consistent, mixing them is not).
    val might = PlanBridge.column(BloomFilterMightContain(
      Literal.create(bos.toByteArray, BinaryType),
      PlanBridge.expression(col(factKey).cast("long"))))
    fact.filter(col(factKey).isNotNull && might)
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }
}
