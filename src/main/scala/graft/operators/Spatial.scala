package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar proximity search on integer coordinates — the spatial sibling of
  * the LSH/banded dedup family: geo near-duplicate detection (same venue,
  * jittered GPS), sensor co-location, map-matching candidate generation.
  * Coordinates are caller-scaled integers (e.g. microdegrees) so every
  * comparison is engine-exact; the metric is squared euclidean, planar —
  * correct for the city-scale distances where proximity joins are run
  * (great-circle corrections matter at continent scale, not at r ≈ meters).
  */
object Spatial {

  /** All distinct pairs within L2 `radius`: exact answer, never an O(n²)
    * join. Each point hashes to a `cellSize` grid cell; the right side
    * replicates to its 3×3 cell neighborhood (a constant ≤ 9× map-side
    * blow-up of (id, x, y) triples — no payload), and the equi-join on
    * cell id meets every pair at distance ≤ cellSize exactly once (the
    * neighbor offsets are distinct, so no dedup pass is needed). With
    * `cellSize ≥ radius`, a qualifying pair can never straddle more than
    * one cell boundary per axis, so the candidate set provably contains
    * every true pair; the exact dist² ≤ r² filter runs inside the join.
    *
    * Scale: ONE hash shuffle on cell id; per-cell cost is |cell|², so
    * `cellSize` is the skew knob — size it near `radius` in dense data
    * (smallest neighborhoods) and larger in sparse data (fewer replicas).
    * Output: (id1, id2, dist2) with id1 < id2. */
  def proximityPairs(df: DataFrame, idCol: String, xCol: String, yCol: String,
      radius: Long, cellSize: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    require(cellSize >= radius,
      "cellSize must be >= radius or neighbor cells would miss true pairs")
    def cell(c: String) =
      floor(col(c).cast("decimal(38,0)") / cellSize).cast("long")
    val pts = df.select(col(idCol).cast("long").as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
      cell(xCol).as("__cx"), cell(yCol).as("__cy"))
    val left = pts.select(col("__id").as("id1"), col("__x").as("x1"),
      col("__y").as("y1"), col("__cx"), col("__cy"))
    val right = pts
      .select(col("__id").as("id2"), col("__x").as("x2"), col("__y").as("y2"),
        explode(expr("transform(sequence(-1, 1), i -> __cx + i)")).as("__cx"),
        col("__cy").as("__rcy"))
      .select(col("id2"), col("x2"), col("y2"), col("__cx"),
        explode(expr("transform(sequence(-1, 1), i -> __rcy + i)")).as("__cy"))
    val dx = col("x1") - col("x2")
    val dy = col("y1") - col("y2")
    left.join(right, Seq("__cx", "__cy"))
      .filter(col("id1") < col("id2"))
      .filter(dx * dx + dy * dy <= lit(radius) * lit(radius))
      .select(col("id1"), col("id2"), (dx * dx + dy * dy).as("dist2"))
  }
}
