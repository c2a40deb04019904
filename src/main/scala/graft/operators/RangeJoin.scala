package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair every point with every interval
  * containing it. Spark plans the naive `p BETWEEN lo AND hi` theta join as
  * a broadcast-nested-loop — O(points × intervals), hopeless at scale.
  *
  * The scalable composition is bucketing: quantize the number line into
  * fixed-width buckets, explode each interval over the buckets it touches
  * (`(hi-lo)/width + 1` rows — bounded when `width` is chosen near the
  * typical interval span), bucket the points (1 row each), EQUI-join on the
  * bucket id, and verify exact containment on the survivors. One hash
  * shuffle on bucket id; candidate count ≈ points × average interval
  * density per bucket — linear for bounded-span intervals.
  */
object RangeJoin {

  private def bucketOf(c: Column, width: Double): Column =
    floor(c / lit(width)).cast("long")

  /** @param width bucket width — pick ≈ the typical interval length so most
    *              intervals explode into ≤2 buckets. */
  def bucketedRangeJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      width: Double
  ): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol), width))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol), width), bucketOf(col(hiCol), width))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Broadcast-dimension fast path: the interval side ships as a stabbing
    * index (sorted-by-lo + max-hi segment tree) via the engine's custom
    * logical node / planner strategy / physical operator
    * ([[org.apache.spark.sql.graft.PointIntervalJoin]]) — each point row
    * enumerates matches in O(log n + k) where BroadcastNestedLoopJoin scans
    * all n intervals. No width parameter, no shuffle of the point side.
    * Columns are cast to DOUBLE here; all other columns pass through. */
  def indexedRangeJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String
  ): DataFrame = {
    val p = points.withColumn(pointCol, col(pointCol).cast("double"))
    val iv = intervals
      .withColumn(loCol, col(loCol).cast("double"))
      .withColumn(hiCol, col(hiCol).cast("double"))
    org.apache.spark.sql.graft.PointIntervalJoinApi.join(p, pointCol, iv, loCol, hiCol)
  }
}
