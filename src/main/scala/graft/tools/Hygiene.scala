package graft.tools

import org.apache.spark.sql.SparkSession

/** Session hygiene shared by the Bench/Verify mains: long sweeps (300+
  * queries in one JVM) must drop every block a finished query pinned
  * (localCheckpoints, persisted diffs) or block-manager pressure taxes the
  * later entries — but `RDD.unpersist` on a locally-checkpointed RDD
  * unconditionally WARNs that the lineage "cannot be recomputed after
  * unpersisting". That warning exists for callers who might still USE the
  * RDD; here every query is fully materialized before cleanup and the
  * handle is dropped, so the r8 bench tail was hundreds of copies of a
  * warning about a situation that cannot arise — noise burying real
  * errors. The cleanup scopes `org.apache.spark.rdd` to ERROR for exactly
  * the duration of the unpersist loop and restores it after, so genuine
  * RDD warnings elsewhere in the run still surface. */
object Hygiene {

  /** Scope the WindowExec "No Partition Defined ... single partition" WARN
    * out of suite runs (Bench/Verify/ScaleRehearsal mains and the test
    * session). Every partition-less window in this codebase sits on a
    * require-bounded level grid (≤1k rows by construction — mannWhitneyAuc
    * / isotonicCalibration level tables, skyline survivors behind the
    * maxSurvivors guard, rank fusion over ≤2·pool rows, the budget
    * allocator's ≤|domains| rows), so the warning describes a hazard that
    * cannot arise and r8–r10 bench tails were hundreds of copies of it,
    * burying real errors. `partitionBy(lit(0))` does NOT silence it —
    * Catalyst strips foldable partition keys before WindowExec sees them
    * (verified on Spark 4.1.2) — so the CLASS logger (not the package) is
    * set to ERROR: genuine WindowExec errors still surface, and every
    * other execution-layer warning is untouched. Library consumers who
    * build their own session keep the default logging. */
  def silenceBoundedWindowWarn(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
  }

  /** Run `body` with `org.apache.spark.rdd` scoped to ERROR, restoring the
    * PRIOR effective level after (not a hardcoded WARN — a developer who
    * set the package to DEBUG to chase storage issues keeps their
    * diagnostics). For unpersisting a handle the caller has fully
    * materialized and is dropping: RDD.unpersist logs its
    * "cannot be recomputed after unpersisting" warning synchronously at
    * the call, so the scope is exact — iterative operators (star-
    * contraction CC, pagerank, distributed BPE training) drop their
    * previous round's checkpoint every round, and each drop is safe by
    * construction but would otherwise WARN once per iteration per query
    * across a 330-query sweep. */
  def quietly[A](body: => A): A = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val pkg = "org.apache.spark.rdd"
    val prior: Level = LogManager.getLogger(pkg).getLevel
    Configurator.setLevel(pkg, Level.ERROR)
    try body finally Configurator.setLevel(pkg, prior)
  }

  def unpersistAll(spark: SparkSession): Unit =
    quietly(spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false)))
}
