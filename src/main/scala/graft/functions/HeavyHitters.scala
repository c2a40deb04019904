package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * bounded-memory path to "top tokens over 100 TB of text".
  *
  * The exact token top-k (explode → groupBy token → orderBy count) shuffles
  * one row PER DISTINCT TOKEN; at web scale the token dictionary is billions
  * of entries and the shuffle dominates. Misra–Gries keeps at most
  * `capacity` counters per partition, merges associatively (partial
  * aggregation — Spark runs it map-side), and guarantees for every item:
  *
  *   trueCount − n/(capacity+1)  ≤  sketchCount  ≤  trueCount
  *
  * so any item with frequency above n/(capacity+1) is PRESENT in the sketch
  * (the classic frequent-elements guarantee), and reported counts are
  * certified lower bounds. The merge (counter sum → subtract the
  * (capacity+1)-th largest → drop non-positive) preserves the bound
  * [Agarwal et al., "Mergeable Summaries", PODS'12].
  *
  * Determinism note: counter VALUES depend on arrival/merge order, so this
  * is spec-verified against its error bound rather than oracle-hashed —
  * the exact form ([[graft.operators.TextAnalysis.topTermsPerDoc]] family)
  * remains the small-scale gate; this is the scale path.
  */
object HeavyHitters {

  /** One Misra–Gries update: add `x` (weight 1) to `m`, evicting by global
    * decrement when the counter set would exceed `capacity`. */
  private[graft] def offer(m: Map[String, Long], x: String, capacity: Int): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < capacity => m.updated(x, 1L)
      case None =>
        // classic MG step: ONE unrecorded arrival pays for exactly ONE
        // decrement of every counter (the arriving item is consumed by its
        // own decrement and does not enter). Decrementing by more than 1
        // per arrival — e.g. by the buffer minimum — would charge one
        // arrival several decrements and break the n/(capacity+1) bound
        // (capacity 2, stream a,a,a,b,b,b,c would wipe the whole buffer).
        m.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  /** Mergeable-summaries combine: sum counters, then subtract the
    * (capacity+1)-th largest combined count from all and keep positives. */
  private[graft] def combine(a: Map[String, Long], b: Map[String, Long], capacity: Int): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) => acc.updated(k, acc.getOrElse(k, 0L) + c) }
    if (summed.size <= capacity) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse).apply(capacity)
      summed.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  final case class Hitter(item: String, min_count: Long)

  /** The typed Aggregator: feed it item strings, get the surviving counters
    * (certified lower-bound counts), largest first. */
  def sketch(capacity: Int): Aggregator[String, Map[String, Long], Seq[Hitter]] = {
    require(capacity > 0, "capacity must be positive")
    new Aggregator[String, Map[String, Long], Seq[Hitter]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(m: Map[String, Long], x: String): Map[String, Long] = offer(m, x, capacity)
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = combine(a, b, capacity)
      def finish(m: Map[String, Long]): Seq[Hitter] =
        m.toSeq.sortBy { case (k, c) => (-c, k) }.map { case (k, c) => Hitter(k, c) }
      def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Seq[Hitter]] = ExpressionEncoder[Seq[Hitter]]()
    }
  }
}
