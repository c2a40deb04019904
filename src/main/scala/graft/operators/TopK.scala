package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k without sorting the corpus. The obvious Spark
  * formulation — `row_number() OVER (PARTITION BY g ORDER BY v DESC)` then
  * `WHERE rn <= k` — exchanges and sorts EVERY row of every group before
  * discarding all but k; at corpus scale that is a full-data sort shuffle
  * for a k-row answer. Here each map task first reduces its partition to at
  * most k candidates per group with a bounded heap (one of the few
  * genuinely imperative per-partition algorithms — there is no built-in
  * partial per-group top-k, only the global `TakeOrdered`), so the only
  * shuffle carries ≤ k·|groups|·|tasks| survivor rows into the exact
  * window rank. The heap pass is a selection, not a sort: O(n log k) with
  * k-bounded memory per group.
  */
object TopK {

  /** Top `k` rows per group by (`valueCol` DESC, `idCol` ASC tiebreak).
    * Precondition: `idCol` is a row identity — unique within its group —
    * so the ordering is total and the result deterministic; group is
    * rendered as string (canonical across group types), id/value must be
    * integral. Output: (grp, id, value, rank), rank 1..k. */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    // candidate (v1, i1) beats (v2, i2) iff v1 > v2, or v1 == v2 ∧ i1 < i2
    def beats(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    val survivors = df
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"), col(valueCol).cast("long").as("value"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // min-heap per group ordered worst-first, capped at k
        val worstFirst: Ordering[(Long, Long)] = (a, b) => {
          val c = java.lang.Long.compare(b._1, a._1) // smaller value = worse
          if (c != 0) c else java.lang.Long.compare(a._2, b._2) // bigger id = worse
        }
        val heaps = mutable.HashMap.empty[String, mutable.PriorityQueue[(Long, Long)]]
        it.foreach { case (g, id, v) =>
          val h = heaps.getOrElseUpdate(g, mutable.PriorityQueue.empty(worstFirst))
          if (h.size < k) h.enqueue((v, id))
          else {
            val (wv, wi) = h.head
            if (beats(v, id, wv, wi)) { h.dequeue(); h.enqueue((v, id)) }
          }
        }
        heaps.iterator.flatMap { case (g, h) => h.iterator.map { case (v, id) => (g, id, v) } }
      }
      .toDF("grp", "id", "value")

    // exact rank over the k-per-group-per-task survivor set only
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("value").desc, col("id"))
    survivors
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
