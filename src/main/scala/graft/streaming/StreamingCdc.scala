package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

/** Streaming CDC materialization — the streaming twin of
  * `DiffEngine.cdcLatest`: a change stream (keyed versions + tombstones)
  * folds into a continuously-current table via `mapGroupsWithState`.
  *
  * State is ONE (version, value, tombstone) record per live key — O(keys),
  * never a history: the batch operator ranks the whole log, the stream
  * keeps only each key's winner so far. Out-of-order delivery resolves by
  * VERSION, not arrival order — a stale v1 arriving after v2 leaves state
  * untouched (the property the spec forces), which is what makes at-least-
  * once upstream delivery safe to consume.
  *
  * At 100 TB-of-log scale the state store carries only current keys (the
  * working set, not the stream), partitioned by the grouping key across
  * executors — the same bounded-state posture as the other streaming ops
  * here (payload bytes never enter state).
  */
object StreamingCdc {

  /** One change-log record: `version` must be unique and monotone per key
    * (a CDC sequence number). */
  final case class Change(key: Long, version: Long, value: String, tombstone: Boolean)

  /** A key's current state; `live = false` marks a tombstoned key (kept in
    * the update stream so sinks can delete — a Complete-mode sink filters
    * on it). */
  final case class Current(key: Long, version: Long, value: String, live: Boolean)

  /** Fold an arriving change stream into per-key current state. Emits the
    * key's (possibly unchanged) current record on every batch that touches
    * it. */
  def latestState(changes: Dataset[Change]): Dataset[Current] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[(Long, String, Boolean), Current](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val candidates = state.getOption
            .map { case (v, s, t) => Change(key, v, s, t) }
            .toSeq ++ rows
          val win = candidates.maxBy(_.version) // versions unique per key: total order
          state.update((win.version, win.value, win.tombstone))
          Current(key, win.version, win.value, live = !win.tombstone)
      }
  }

  /** Drain an AvailableNow pass into a memory sink and return the final
    * current-state table (test/bootstrap helper, same shape as
    * `EventStreams.runToBatch` but Update-mode as `mapGroupsWithState`
    * requires; the memory sink keeps every update, so callers take the
    * last row per key). */
  def runToTable(changes: Dataset[Change], queryName: String): Dataset[Current] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val q = latestState(changes).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).as[Current]
  }
}
