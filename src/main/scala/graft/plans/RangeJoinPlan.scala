package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, BinaryNode => LogicalBinaryNode}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Custom whole-operator plan: broadcast point-in-interval range join.
  *
  * Spark plans a non-equi `t BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin — every point row probes EVERY interval,
  * O(points × intervals). This operator broadcasts the intervals sorted by
  * `lo` with a prefix-max of `hi`, and each point binary-searches the last
  * interval with lo <= t, then walks left only while the prefix-max says a
  * cover is still possible — O(points × (log m + answer)). This is the
  * (c)-path of the brief: custom LogicalPlan + Strategy + SparkPlan,
  * registered through GraftExtensions, for semantics the built-in operators
  * can't plan efficiently.
  *
  * Contract: `t`, `lo`, `hi` must share one internal numeric encoding
  * (timestamps are micros longs, dates are day ints — don't mix the two);
  * the intervals side must be broadcast-small; NULL t/lo/hi never match
  * (inner-join semantics, like BETWEEN).
  */
case class PointIntervalJoin(left: LogicalPlan, right: LogicalPlan,
                             t: Expression, lo: Expression, hi: Expression)
    extends LogicalBinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointIntervalJoin =
    copy(left = newLeft, right = newRight)
}

case class PointIntervalJoinExec(left: SparkPlan, right: SparkPlan,
                                 t: Expression, lo: Expression, hi: Expression)
    extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): PointIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  private def toL(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => sys.error(s"range join key must be integral, got $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    // Build-side guard: this operator collects the interval side to the
    // driver (like BroadcastExchange, which enforces its own 512m-row/8GB
    // limit). executeTake fetches partitions incrementally and stops at
    // the cap, so an oversized build side fails loudly BEFORE the driver
    // materializes it (a post-collect length check would OOM first).
    val maxBuildRows = math.min(
      conf.getConfString("spark.graft.rangeJoin.maxBuildRows", "5000000").toLong,
      Int.MaxValue - 1L).toInt
    val collected = right.executeTake(maxBuildRows + 1)
    if (collected.length > maxBuildRows) {
      throw new IllegalStateException(
        s"PointIntervalJoin build side exceeds " +
        s"spark.graft.rangeJoin.maxBuildRows=$maxBuildRows. The intervals " +
        "side must be broadcast-small; for a large interval side fall back " +
        "to a plain non-equi join (BroadcastNestedLoopJoin) or pre-bucket " +
        "both sides on a coarse time grid and equi-join on the bucket.")
    }
    val items = collected.flatMap { r =>
      val l = loB.eval(r)
      val h = hiB.eval(r)
      if (l == null || h == null) None else Some((toL(l), toL(h), r.copy()))
    }.sortBy(_._1)
    val los = items.map(_._1)
    val his = items.map(_._2)
    val rows = items.map(_._3)
    val prefMaxHi = new Array[Long](items.length)
    var m = Long.MinValue
    var i = 0
    while (i < items.length) {
      if (his(i) > m) m = his(i)
      prefMaxHi(i) = m
      i += 1
    }
    val bc = sparkContext.broadcast((los, his, rows, prefMaxHi))
    val tB = BindReferences.bindReference(t, left.output)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val (losL, hisL, rowsL, pmax) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val tv = tB.eval(lrow)
        if (tv == null || losL.isEmpty) Iterator.empty
        else {
          val tl = toL(tv)
          // binary search: first index with lo > tl (candidates are [0, ub))
          var a = 0
          var b = losL.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (losL(mid) <= tl) a = mid + 1 else b = mid
          }
          val ub = a
          new Iterator[InternalRow] {
            private var j = ub - 1
            private var nextIdx = advance()
            private def advance(): Int = {
              while (j >= 0 && pmax(j) >= tl) {
                if (hisL(j) >= tl) { val k = j; j -= 1; return k }
                j -= 1
              }
              -1
            }
            override def hasNext: Boolean = nextIdx >= 0
            override def next(): InternalRow = {
              val r = proj(joined(lrow, rowsL(nextIdx)))
              nextIdx = advance()
              r
            }
          }
        }
      }
    }
  }
}

/** Planner strategy mapping the logical node to its exec. */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointIntervalJoin(l, r, t, lo, hi) =>
      PointIntervalJoinExec(planLater(l), planLater(r), t, lo, hi) :: Nil
    case _ => Nil
  }
}
