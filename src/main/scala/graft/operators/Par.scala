package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for expensive per-row operator stages.
  *
  * A single-file, single-row-group parquet input plans as ONE partition, so
  * an operator whose first stage is heavy per-row work (shingle explode +
  * md5, media decode, per-doc trigram folds) runs that stage on one core no
  * matter how many the session has — q318 measured 6.0 → 1.0 s and q32's
  * LSH banding carries the same shape. At cluster scale a table splits into
  * at least `maxPartitionBytes`-sized partitions and the guard is a no-op,
  * so the round-robin shuffle is only ever paid on inputs small enough for
  * it to be trivial (it shuffles the input ONCE, before the per-row
  * amplification — never the exploded rows).
  *
  * Plan caveats, verified on Spark 4.1.2 (see also `queries.tParallel`):
  * the optimizer will collapse a deterministic Project pair through the
  * round-robin exchange when a Project sits directly under it, and will
  * push a deterministic Filter below it wholesale — so guard the RAW input
  * frame and keep pushable predicates cheap; a filter referencing a heavy
  * derived column re-runs the whole expression below the exchange.
  */
object Par {
  import org.apache.spark.sql.catalyst.plans.logical.{
    Filter => LFilter, LeafNode, LogicalPlan, Project, Repartition, SubqueryAlias, Union}

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** True iff `plan` is a bare relation (scan, local data, checkpointed
    * RDD) under nothing but narrow row-wise wrappers — the only shape
    * whose partition count is safe to inspect EAGERLY. Anything that
    * plans an exchange (join, aggregate, window, distinct,
    * repartition-by-expression) is excluded: under AQE, `.rdd` on such a
    * plan materializes every upstream query stage at composition time,
    * and that work is thrown away when the returned Dataset re-plans.
    * Plain `Repartition` (repartition(n)/coalesce(n)) stays transparent —
    * its child is re-checked, so a coalesced scan is still guarded. */
  private def scanRooted(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode      => true
    case p: Project       => scanRooted(p.child)
    case f: LFilter       => scanRooted(f.child)
    case s: SubqueryAlias => scanRooted(s.child)
    case r: Repartition   => scanRooted(r.child)
    case u: Union         => u.children.forall(scanRooted)
    case _                => false
  }

  /** `df`, round-robin repartitioned up to the session's shuffle
    * parallelism iff it is scan-rooted AND its current plan yields fewer
    * partitions. Non-scan-rooted inputs pass through untouched (reference-
    * identical): probing their partition count would eagerly run the
    * upstream stages (see [[scanRooted]]), and their final parallelism
    * is not even knowable pre-execution under AQE. CALLER CONTRACT for
    * exchange-rooted frames: a shuffled/aggregated frame normally carries
    * session parallelism, but AQE coalesces a SMALL shuffle output
    * (under the advisory partition size) down to few partitions — if you
    * feed such a frame into a row-exploding stage, add an explicit
    * `repartition` yourself; this guard deliberately will not touch it
    * (every in-repo call site passes raw scans or localCheckpoints).
    * `spark.graft.scanParallel=false` disables the guard (A/B lever). */
  def ensureParallel(df: DataFrame): DataFrame = {
    if (sys.env.get("GRAFT_SCAN_PARALLEL").contains("false") ||
      df.sparkSession.conf.get("spark.graft.scanParallel", "true") == "false") return df
    if (!scanRooted(df.queryExecution.analyzed)) {
      // r13 ADVICE: the decline is deliberate (see CALLER CONTRACT above)
      // but was invisible — a library caller feeding an AQE-coalesced
      // aggregate into a row-exploding stage lost the guard with no
      // signal. One debug line makes the regression diagnosable.
      log.debug(
        "ensureParallel: non-scan-rooted plan ({}) passed through unguarded; " +
          "add an explicit repartition if this feeds a row-exploding stage",
        df.queryExecution.analyzed.nodeName)
      return df
    }
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
