package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOINS — the delta rule. q153 maintains
  * an incremental AGGREGATE; this is the other half: for insert-only deltas,
  *
  *   (R₀ ∪ ΔR) ⋈ (S₀ ∪ ΔS)  =  R₀⋈S₀  ∪  ΔR⋈S₀  ∪  R₀⋈ΔS  ∪  ΔR⋈ΔS
  *
  * so a materialized join advances by computing only the three DELTA terms —
  * each join has at least one (small) delta side, so at 100 TB the base
  * tables are probed (broadcast or shuffled-by-key against a delta that fits
  * in memory), never re-joined against each other. The reference's
  * full-rebuild model re-runs R⋈S from scratch; this is the standing
  * alternative a warehouse migration buys.
  */
object Ivm {

  /** The three delta terms of the insert-only join delta rule, unioned:
    * exactly the NEW rows of R⋈S after applying ΔR and ΔS. Inputs must
    * share the join key column name `key`; output columns follow
    * `r ⋈ s` column order. Correctness requires ΔR ∩ R₀ = ∅ and
    * ΔS ∩ S₀ = ∅ (insert-only), which the caller's ingest layer
    * guarantees (append-only logs); the certificate query proves the
    * algebra against a full recompute. */
  def joinDelta(
      r0: DataFrame,
      dr: DataFrame,
      s0: DataFrame,
      ds: DataFrame,
      key: String
  ): DataFrame = {
    dr.join(s0, key)
      .unionByName(r0.join(ds, key))
      .unionByName(dr.join(ds, key))
  }

  /** Retraction-capable join delta — the signed-multiplicity (Z-set) form
    * of the delta rule, completing [[joinDelta]] for real CDC feeds that
    * carry updates and tombstones, not just appends.
    *
    * Each delta row carries `mCol` ∈ {+1, −1}: insert = +1, delete = −1,
    * update = delete(old) + insert(new). Multiplicities multiply through a
    * join, so the same three delta terms cover every case:
    *
    *   Δ(R⋈S) = ΔR⋈S₀ + R₀⋈ΔS + ΔR⋈ΔS,  m(a⋈b) = m(a)·m(b)
    *
    * (a tombstone meeting a tombstone on the same key yields +1 — exactly
    * the term the naive "subtract deletions twice" derivation double-counts
    * away). `r0`/`s0` are the base snapshots WITHOUT a multiplicity column
    * (implicitly all +1); `dr`/`ds` carry `mCol`. Output is the base join's
    * columns plus `mCol`; rows with net multiplicity 0 cancel when the
    * caller folds with [[applyDelta]] (or any sum-by-payload).
    *
    * Scale shape is identical to the insert-only rule: every term has a
    * delta side, so the base tables are probed by a small frame (broadcast
    * or shuffled-by-key) and never re-joined against each other. */
  def joinDeltaCdc(
      r0: DataFrame,
      dr: DataFrame,
      s0: DataFrame,
      ds: DataFrame,
      key: String,
      mCol: String = "m"
  ): DataFrame = {
    val a = dr.join(s0, Seq(key))
    val b = r0.join(ds, Seq(key))
    val c = dr.withColumnRenamed(mCol, "__mr")
      .join(ds.withColumnRenamed(mCol, "__ms"), Seq(key))
      .withColumn(mCol, col("__mr") * col("__ms"))
      .drop("__mr", "__ms")
    a.unionByName(b).unionByName(c)
  }

  /** Retraction-capable incremental AGGREGATE maintenance — the
    * aggregate-side twin of [[joinDeltaCdc]], completing q153's insert-only
    * incremental aggregate for real CDC feeds. The materialized view holds
    * one row per group `(keys, cntCol, sumCol)`; a signed row-level delta
    * batch (base-table payload + `mCol` ∈ {+1,−1}, update = −1 old +1 new)
    * folds in as
    *
    *   n' = n + Σm        total' = total + Σ(m·v)
    *
    * — one keyed aggregate over the DELTA only, then a full-outer merge on
    * the grouping key so brand-new groups appear and groups whose count
    * reaches zero vanish (their retracted sum cancels exactly, so dropping
    * the row loses nothing; trailing ±0-sum float residue can't occur
    * because values are integral here — callers with fractional measures
    * should scale to integers first, the suite-wide cents discipline).
    *
    * Scale shape: the delta aggregate is proportional to the BATCH, not the
    * corpus, and the merge is a keyed join against the view — the base
    * table is never re-scanned. SUM/COUNT (and any other self-inverse
    * group homomorphism: their combination gives AVG) maintain exactly;
    * MIN/MAX do not survive retractions without per-group history and are
    * deliberately out of scope. */
  def maintainSumCount(
      view: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, cntCol: String = "n", sumCol: String = "total",
      mCol: String = "m"): DataFrame = {
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(mCol)).as("__dn"),
        sum(col(mCol) * col(valueCol)).as("__dsum"))
    view.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(cntCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dsum"), lit(0L))).as(sumCol)): _*)
      .filter(col(cntCol) > 0)
  }

  /** Distinct-count view maintenance under retractions — the
    * NON-invertible aggregate [[maintainSumCount]] deliberately excludes.
    * COUNT(DISTINCT v) per group cannot be maintained from the count alone:
    * deleting one copy of a value that still has other copies must NOT
    * decrement the distinct count, and whether it does depends on state the
    * scalar view discarded. The standard fix is an auxiliary multiplicity
    * table — one row per (group, value) with its net copy count — against
    * which both deletes and inserts resolve exactly:
    *
    *   mult' = collapse(mult ∪ Δ)   — group by (keys, value), Σm, keep > 0
    *   view(g) = |{v : mult'(g,v) > 0}|
    *
    * Inputs: `mult` is the maintained multiplicity state
    * `(keys…, valueCol, mCol)` with net-positive `mCol`; `delta` carries
    * signed rows (`mCol` ∈ {+1,−1}, update = −1 old +1 new). Returns the
    * merged multiplicity state; derive the distinct-count view with
    * [[distinctCounts]].
    *
    * Scale shape: the collapse is ONE keyed aggregate on (keys, value) —
    * proportional to |state| + |batch|, and because the state is keyed by
    * (group, value) the merge co-partitions with any bucketed layout of the
    * same key. The auxiliary state is the price of exactness; the sketch
    * alternative (HLL per group) is mergeable but cannot retract at all. */
  def maintainDistinct(
      mult: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, mCol: String = "m"): DataFrame = {
    val grp = (keys :+ valueCol).map(col)
    mult.select((keys :+ valueCol :+ mCol).map(col): _*)
      .unionByName(delta.select((keys :+ valueCol :+ mCol).map(col): _*))
      .groupBy(grp: _*)
      .agg(sum(col(mCol)).as(mCol))
      .filter(col(mCol) > 0)
  }

  /** The distinct-count view over a multiplicity state: one row per group
    * with the number of values whose net multiplicity is positive. */
  def distinctCounts(mult: DataFrame, keys: Seq[String],
      outCol: String = "n_distinct"): DataFrame =
    mult.groupBy(keys.map(col): _*).agg(count(lit(1)).cast("long").as(outCol))

  /** Fold a signed delta into a materialized multiset view: group by every
    * payload column, sum multiplicities, keep net-positive rows (with their
    * surviving multiplicity). `view` rows count +1 each. One keyed shuffle
    * on the full payload — the collapse a Z-set materialization runs after
    * each maintenance batch. */
  def applyDelta(view: DataFrame, delta: DataFrame, mCol: String = "m"): DataFrame = {
    val payload = view.columns.filterNot(_ == mCol)
    view.withColumn(mCol, lit(1L))
      .unionByName(delta.select((view.columns.filterNot(_ == mCol).map(col) :+ col(mCol)).toIndexedSeq: _*))
      .groupBy(payload.map(col).toIndexedSeq: _*)
      .agg(sum(col(mCol)).as(mCol))
      .filter(col(mCol) > 0)
  }
}
