package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

/** Streaming per-group top-k — the streaming twin of
  * `operators.TopK.topKPerGroup`: a continuously-maintained leaderboard
  * over an unbounded observation stream.
  *
  * State is the current top-k PER GROUP — O(k·groups), never the stream:
  * each batch merges its arrivals into the k-bounded buffer exactly like
  * the batch operator's heap (same (value DESC, id ASC) order, so stream
  * and batch agree bit-for-bit on the same observations). Arrival order
  * is irrelevant — top-k of a set is order-free — which is what makes
  * out-of-order and at-least-once delivery safe: a duplicate delivery of
  * a row already in the buffer is idempotent (same (id, value) sorts to
  * the same slot and the duplicate falls off the end or ties in place;
  * dedupe upstream if ids may recur with CHANGED values).
  *
  * Same bounded-state posture as the rest of this package: the payload
  * stream never enters state, only (id, value) pairs.
  */
object StreamingTopK {

  final case class Obs(group: String, id: Long, value: Long)

  /** A group's current leaderboard, ids and values rank-aligned. */
  final case class GroupTop(group: String, ids: Seq[Long], values: Seq[Long])

  def topK(obs: Dataset[Obs], k: Int): Dataset[GroupTop] = {
    require(k > 0, "k must be positive")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.group)
      .mapGroupsWithState[Seq[(Long, Long)], GroupTop](GroupStateTimeout.NoTimeout) {
        case (g, rows, state) =>
          val merged = (state.getOption.getOrElse(Vector.empty) ++
            rows.map(o => (o.value, o.id)))
            .distinct // duplicate (value, id) deliveries are idempotent
            .sortBy { case (v, id) => (-v, id) }
            .take(k)
          state.update(merged)
          GroupTop(g, merged.map(_._2), merged.map(_._1))
      }
  }

  /** Drain an AvailableNow pass into a memory sink; callers take the last
    * row per group (Update mode emits one row per touched group per
    * batch). */
  def runToTable(obs: Dataset[Obs], k: Int, queryName: String): Dataset[GroupTop] = {
    val spark = obs.sparkSession
    import spark.implicits._
    val q = topK(obs, k).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).as[GroupTop]
  }
}
