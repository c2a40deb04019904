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

  // ---- exactly-once variant -------------------------------------------

  /** One micro-batch of the exactly-once diff: spool and per-batch stats
    * both land in `batch_id=N` directories written with OVERWRITE, so a
    * replayed batch (foreachBatch's at-least-once contract after failure)
    * rewrites its own output instead of double-counting — the standard
    * idempotent-sink-keyed-by-batchId recipe. Totals are derived by
    * summing the stats files, never by in-memory accumulation. */
  def processBatch(
      baseProj: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      nonKeyCols: Seq[String],
      spoolDir: String,
      statsDir: String,
      batchId: Long): Unit = {
    val headProj = batch
      .select(keys.map(col) :+ DiffEngine.rowHash(nonKeyCols).as("__head_hash"): _*)
    headProj.write.mode("overwrite").parquet(s"$spoolDir/batch_id=$batchId")
    val stats = headProj.join(baseProj, keys, "left").agg(
      sum(when(col("__base_hash").isNull, 1L).otherwise(0L)),
      sum(when(col("__base_hash").isNotNull && col("__base_hash") =!= col("__head_hash"), 1L)
        .otherwise(0L)),
      sum(when(col("__base_hash") === col("__head_hash"), 1L).otherwise(0L))
    ).head()
    def s(i: Int): Long = if (stats.isNullAt(i)) 0L else stats.getLong(i)
    val spark = batch.sparkSession
    import spark.implicits._
    Seq((s(0), s(1), s(2))).toDF("added", "changed", "unchanged")
      .coalesce(1).write.mode("overwrite").parquet(s"$statsDir/batch_id=$batchId")
  }

  /** Exactly-once incremental diff: unlike [[start]]'s monitoring counters,
    * all state lives in batchId-keyed overwrite-mode directories, so a
    * post-failure replay converges to the same totals. Pass a durable
    * `checkpointDir` — Structured Streaming's offset log plus the
    * idempotent sink is what upgrades at-least-once to exactly-once. */
  def startExactlyOnce(
      base: DataFrame,
      headStream: DataFrame,
      keys: Seq[String],
      nonKeyCols: Seq[String],
      spoolDir: String,
      statsDir: String,
      checkpointDir: String,
      queryName: String = "graft_streaming_diff_eo"
  ): StreamingQuery = {
    val baseProj = base.select(keys.map(col) :+ DiffEngine.rowHash(nonKeyCols).as("__base_hash"): _*)
    headStream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(baseProj, batch, keys, nonKeyCols, spoolDir, statsDir, batchId)
      }
      .start()
  }

  /** Summed (added, changed, unchanged) across all batch stats — replay-safe
    * because each batch directory holds exactly one row however many times
    * the batch ran. */
  def totals(spark: org.apache.spark.sql.SparkSession, statsDir: String): (Long, Long, Long) = {
    val row = spark.read.parquet(statsDir)
      .agg(sum("added"), sum("changed"), sum("unchanged")).head()
    def s(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    (s(0), s(1), s(2))
  }
}
