package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator`: per group, keep the k largest
  * (score, id) pairs in a bounded buffer — O(k) state per group, partial
  * merges on the map side.
  *
  * This is the 100 TB alternative to `row_number().over(Window)` ranking:
  * the window form shuffles and SORTS every candidate row per group; this
  * aggregator reduces each partition to ≤k pairs before the shuffle, so the
  * exchange carries k·groups rows instead of candidates·groups. Used for
  * kNN-join style workloads where candidates per probe ≫ k.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def zero: List[(Double, Long)] = Nil

  /** Insert keeping the buffer sorted descending (score, then id asc for
    * deterministic ties) and bounded at k. */
  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    val ordered = ((x :: buf) sortBy { case (s, id) => (-s, id) })
    ordered.take(k)
  }

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    (a ++ b).sortBy { case (s, id) => (-s, id) }.take(k)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
