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
  def unpersistAll(spark: SparkSession): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val pkg = "org.apache.spark.rdd"
    // restore the logger's PRIOR effective level, not a hardcoded WARN —
    // a developer who set the package to DEBUG to chase storage issues
    // keeps their diagnostics after the cleanup
    val prior: Level = LogManager.getLogger(pkg).getLevel
    Configurator.setLevel(pkg, Level.ERROR)
    try spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    finally Configurator.setLevel(pkg, prior)
  }
}
