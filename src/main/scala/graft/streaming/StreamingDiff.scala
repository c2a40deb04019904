package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.DiffEngine

/** Incremental diff of an ARRIVING head against a static base snapshot —
  * the streaming form of the reference's one-shot comparison (out of the
  * reference's scope, SURVEY §2.8; the natural Spark idiom is foreachBatch).
  *
  * Per micro-batch: join the batch's (keys, hash) projection against the
  * base's (broadcast-able or shuffled once per batch, sized by the batch not
  * the base), classify each arriving row as added (no base key) / changed
  * (hash differs) / unchanged, update running counters, and spool the
  * arriving keys to `spoolDir`. `removed` is only knowable once the stream
  * is declared complete: [[removedCount]] anti-joins the base against the
  * spooled key set.
  *
  * Counter state is O(1); the spool holds only key columns + hash. Exactly-
  * once caveat: foreachBatch re-runs a batch after failure — counters here
  * are in-memory session-scoped (fine for monitoring; route through an
  * idempotent sink keyed by batchId for transactional use).
  */
object StreamingDiff {

  final case class RunningCounts(added: AtomicLong = new AtomicLong,
      changed: AtomicLong = new AtomicLong,
      unchanged: AtomicLong = new AtomicLong) {
    def snapshot: (Long, Long, Long) = (added.get, changed.get, unchanged.get)
  }

  /** Start the incremental diff; returns the query and the live counters. */
  def start(
      base: DataFrame,
      headStream: DataFrame,
      keys: Seq[String],
      nonKeyCols: Seq[String],
      spoolDir: String,
      queryName: String = "graft_streaming_diff"
  ): (StreamingQuery, RunningCounts) = {
    val counts = RunningCounts()
    val baseProj = base.select(keys.map(col) :+ DiffEngine.rowHash(nonKeyCols).as("__base_hash"): _*)

    val q = headStream.writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val headProj = batch
          .select(keys.map(col) :+ DiffEngine.rowHash(nonKeyCols).as("__head_hash"): _*)
        headProj.write.mode("append").parquet(spoolDir)
        val joined = headProj.join(baseProj, keys, "left")
        val stats = joined.agg(
          sum(when(col("__base_hash").isNull, 1L).otherwise(0L)),
          sum(when(col("__base_hash").isNotNull && col("__base_hash") =!= col("__head_hash"), 1L)
            .otherwise(0L)),
          sum(when(col("__base_hash") === col("__head_hash"), 1L).otherwise(0L))
        ).head()
        def s(i: Int): Long = if (stats.isNullAt(i)) 0L else stats.getLong(i)
        counts.added.addAndGet(s(0))
        counts.changed.addAndGet(s(1))
        counts.unchanged.addAndGet(s(2))
        ()
      }
      .start()
    (q, counts)
  }

  /** Base rows whose keys never arrived — call after the stream completes. */
  def removedCount(base: DataFrame, spoolDir: String, keys: Seq[String]): Long = {
    val arrived = base.sparkSession.read.parquet(spoolDir).select(keys.map(col): _*)
    base.join(arrived, keys, "left_anti").count()
  }
}
