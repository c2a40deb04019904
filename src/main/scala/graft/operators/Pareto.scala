package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — "cheapest-and-best" shortlists
  * over a quality/cost trade-off, e.g. the lowest-perplexity documents per
  * token budget or the cheapest parts at each size point. A row is on the
  * skyline iff no other row is at-least-as-good on BOTH axes and strictly
  * better on at least one.
  */
object Pareto {

  /** Exact 2-D skyline: minimize `minCol`, maximize `maxCol` (both integral
    * — convert money to cents first for engine-exact comparisons). Strict
    * dominance: a twin row (equal on both axes) does NOT dominate, so
    * duplicated frontier points all survive.
    *
    * Scale: the naive formulation is an O(n²) self-join, and the exact
    * sweep needs a global order — both unacceptable at corpus scale. This
    * plan prunes first: stage 1 aggregates `max(maxCol)` per `bucketWidth`
    * slice of `minCol` (ONE map-side-combined shuffle of |occupied
    * buckets| rows — pick the width so that's thousands), the driver folds
    * the slices into a prefix-max staircase over strictly-cheaper buckets,
    * and stage 2 drops every row map-side whose `maxCol` doesn't beat the
    * staircase at its bucket — any such row has a strictly-cheaper
    * dominator, and by dominance transitivity the drop can never orphan a
    * frontier row. Only the survivors (frontier-dominated-frontier sized,
    * typically ≪ corpus) reach stage 3's exact two-window sweep:
    * dominated ⇔ max over strictly-smaller `minCol` ≥ mine (cheaper, at
    * least as good) OR max over `minCol` ≤ mine > mine (no costlier,
    * strictly better). The unpartitioned window is safe only BECAUSE the
    * staircase ran: on adversarial data that all lands in one bucket the
    * pruning is void, so choose `bucketWidth` from the column's range, not
    * a constant. */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String,
      bucketWidth: Long, maxSurvivors: Long = 1000000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxSurvivors > 0, "maxSurvivors must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    // decimal floor-div keeps the bucketing exact over the full Long range
    // (a double quotient would round above 2^52); any monotone disjoint
    // bucketing preserves the pruning proof, so exactness here is about
    // determinism, not correctness of the frontier
    val bucket = floor(col(minCol).cast("decimal(38,0)") / bucketWidth).cast("long")
    val slices = df.groupBy(bucket.as("__b")).agg(max(col(maxCol)).as("__m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // staircase(b) = best maxCol seen in any STRICTLY cheaper bucket
    val stairs = slices.scanLeft((Long.MinValue, Long.MinValue)) {
      case ((_, best), (b, m)) => (b, math.max(best, m))
    }
    val lowerBest = slices.map(_._1).zip(stairs.map(_._2)).toSeq
      .toDF("__b", "__lower_best")

    // localCheckpoint: the count below must not re-run the corpus filter
    // when the windows read the survivors a second time
    val survivors = df.withColumn("__b", bucket)
      .join(broadcast(lowerBest), "__b")
      .filter(col(maxCol) > col("__lower_best"))
      .drop("__b", "__lower_best")
      .localCheckpoint()
    // the single-partition exact sweep below is safe only BECAUSE the
    // staircase pruned; on an all-skyline anti-chain (every row strictly
    // better on one axis, worse on the other) the pruning is void and the
    // sweep would sort the whole corpus in one task. Fail loudly with the
    // escape hatch instead of hanging: refine bucketWidth (more staircase
    // steps), or pre-partition by a coarse minCol range and skyline each
    // range before a final merge pass over the per-range frontiers.
    val nSurv = survivors.count()
    require(nSurv <= maxSurvivors,
      s"skyline2D: $nSurv rows survive the staircase pruning (> maxSurvivors=$maxSurvivors) — " +
        "anti-chain-shaped data or too-coarse bucketWidth; refine bucketWidth or pre-partition by " +
        s"$minCol range and merge per-range frontiers")

    val wStrict = Window.orderBy(col(minCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wLe = Window.orderBy(col(minCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    survivors
      .withColumn("__dom_cheaper", max(col(maxCol)).over(wStrict))
      .withColumn("__dom_better", max(col(maxCol)).over(wLe))
      .filter(
        (col("__dom_cheaper").isNull || col("__dom_cheaper") < col(maxCol)) &&
          col("__dom_better") === col(maxCol))
      .drop("__dom_cheaper", "__dom_better")
  }
}
