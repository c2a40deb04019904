package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch as a typed [[Aggregator]] — the
  * REPLAYABLE approximate-distinct estimator (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream").
  *
  * State is the k smallest DISTINCT hash values seen, kept as a sorted
  * ascending array — O(k) per group, map-side partial aggregation, and the
  * merge is a sorted-merge-dedup-truncate, so the sketch is a pure function
  * of the input SET: partitioning, row order, and duplication cannot change
  * it. That set-determinism is the point of choosing KMV over HLL++ here:
  * with the hash pinned to an md5 fold (a plain SQL expression), any SQL
  * engine can replay the sketch VALUE-exactly — `ORDER BY h LIMIT k` over
  * the distinct hashes — which makes an approx-distinct profile
  * oracle-checkable instead of merely certifiable within sketch error
  * (contrast `approx_count_distinct`, whose HLL++ registers no other engine
  * reproduces; see q324's 3σ certificate for that mode).
  *
  * Estimate (computed FROM the returned sketch, see
  * [[graft.engine.DiffEngine.profileKmvDf]]): with m = kth smallest hash in
  * a hash space of size H, distinct ≈ (k−1)·H ∕ m; if fewer than k distinct
  * hashes exist the sketch IS the distinct set and the count is exact.
  * Relative standard error ≈ 1∕√(k−2) (~6% at k = 256).
  *
  * Input contract: the 48-bit non-negative hash of a non-null value, or a
  * NEGATIVE sentinel for SQL NULL (nulls never count toward distincts —
  * the profile's existing semantics). 48 bits keeps every quantity inside
  * BIGINT for both engines: m ≤ 2^48−1 and (k−1)·2^48 ≪ 2^63.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  require(k > 1, "k must be at least 2 (the estimator divides by k-1)")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    if (x < 0L) return buf // NULL sentinel: never counts
    val pos = java.util.Arrays.binarySearch(buf, x)
    if (pos >= 0) return buf // already present: a sketch of a SET
    val ins = -pos - 1
    if (buf.length < k) {
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = x
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (ins < k) { // displaces the current max; buf stays size k
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = x
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    } else buf // x >= current kth min: irrelevant to the sketch
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
