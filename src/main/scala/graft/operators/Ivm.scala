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
}
