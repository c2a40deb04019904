package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DoubleType

/** Whole-operator Catalyst extension: point-in-interval (range) join.
  *
  * Spark has no physical operator for `p BETWEEN lo AND hi` joins — the
  * planner falls back to BroadcastNestedLoopJoin, which scans EVERY interval
  * for EVERY point row (O(points × intervals)). This package adds the full
  * extension stack the engine's scalar functions already use at expression
  * level: a logical node ([[PointIntervalJoin]]), a planner strategy
  * ([[PointIntervalJoinStrategy]]), and a physical operator
  * ([[PointIntervalJoinExec]]) that broadcasts the interval side as a
  * STABBING INDEX — intervals sorted by `lo` with a max-`hi` segment tree —
  * so each point row enumerates its matches in O(log n + k) instead of
  * O(n). The big (point) side streams: no shuffle, no per-row allocation
  * beyond the emitted rows.
  *
  * Lives under `org.apache.spark.sql` for `Dataset.ofRows` access — the
  * same pattern Spark's own connectors use to plant logical plans. For
  * shuffle-scale interval sides, use the bucketed composition
  * (`graft.operators.RangeJoin`) instead; this operator is the
  * broadcast-dimension fast path.
  */
final case class PointIntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Attribute,
    lo: Attribute,
    hi: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointIntervalJoin =
    copy(left = newLeft, right = newRight)
}

object PointIntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointIntervalJoin(l, r, p, lo, hi) =>
      PointIntervalJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Broadcast stabbing index: intervals sorted by lo + a segment tree of the
  * max hi per range, queried by descending into exactly the subtrees whose
  * max hi can still reach the point. */
final class IntervalIndex(
    los: Array[Double], his: Array[Double], val rows: Array[InternalRow])
    extends Serializable {
  private val n = los.length
  private val tree = new Array[Double](math.max(4 * n, 1))

  private def build(node: Int, l: Int, r: Int): Unit = {
    if (l == r) tree(node) = his(l)
    else {
      val m = (l + r) >>> 1
      build(2 * node, l, m); build(2 * node + 1, m + 1, r)
      tree(node) = math.max(tree(2 * node), tree(2 * node + 1))
    }
  }
  if (n > 0) build(1, 0, n - 1)

  /** count of intervals with lo <= p (they precede index u in sort order) */
  private def upperBound(p: Double): Int = {
    var a = 0; var b = n
    while (a < b) {
      val m = (a + b) >>> 1
      if (los(m) <= p) a = m + 1 else b = m
    }
    a
  }

  private def collect(node: Int, l: Int, r: Int, qr: Int, p: Double,
      buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
    if (l > qr || tree(node) < p) return // whole subtree ends before p
    if (l == r) { buf += rows(l); return }
    val m = (l + r) >>> 1
    collect(2 * node, l, m, qr, p, buf)
    if (qr > m) collect(2 * node + 1, m + 1, r, qr, p, buf)
  }

  def stab(p: Double): Iterator[InternalRow] = {
    val u = upperBound(p)
    if (u == 0) Iterator.empty
    else {
      val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
      collect(1, 0, n - 1, u - 1, p, buf)
      buf.iterator
    }
  }
}

final case class PointIntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Attribute,
    lo: Attribute,
    hi: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): PointIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](lo, right.output)
    val hiB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](hi, right.output)
    // executeCollect returns copied rows; keep only valid (non-null, lo<=hi)
    val triples = right.executeCollect().flatMap { r =>
      val lv = loB.eval(r); val hv = hiB.eval(r)
      if (lv == null || hv == null) None
      else {
        val l = lv.asInstanceOf[Double]; val h = hv.asInstanceOf[Double]
        if (l <= h) Some((l, h, r.asInstanceOf[InternalRow])) else None
      }
    }.sortBy(_._1)
    val index = new IntervalIndex(
      triples.map(_._1), triples.map(_._2), triples.map(_._3))
    val bc = sparkContext.broadcast(index)
    val pointB = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](point, left.output)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val idx = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val pv = pointB.eval(lrow)
        if (pv == null) Iterator.empty
        else idx.stab(pv.asInstanceOf[Double]).map(rrow => proj(joined(lrow, rrow)))
      }
    }
  }
}

/** DSL entry: `points` joined to every interval row containing its point.
  * Columns must be DoubleType (cast upstream); the strategy self-installs
  * idempotently on the session. */
object PointIntervalJoinApi {
  def join(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame = {
    val spark = points.sparkSession
    if (!spark.experimental.extraStrategies.contains(PointIntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PointIntervalJoinStrategy
    val lp = points.queryExecution.analyzed
    val rp = intervals.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found in ${plan.output.map(_.name)}"))
    val (p, l, h) = (attr(lp, pointCol), attr(rp, loCol), attr(rp, hiCol))
    Seq(p, l, h).foreach(a => require(a.dataType == DoubleType,
      s"${a.name} must be DOUBLE (cast upstream), got ${a.dataType.simpleString}"))
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      PointIntervalJoin(lp, rp, p, l, h))
  }
}
