package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the events stream (beyond the reference,
  * which is batch-only — SURVEY §2.8; mandated by the engine's stream-table
  * duality goal). Every transform here is defined on an unbounded DataFrame:
  * the same code runs on `readStream` (incremental, stateful) and on a batch
  * frame (the ParityQueries q20/q21 batch twins are the oracle-checkable
  * forms).
  *
  * Scale posture: watermarks bound state; windowed aggregation state is
  * per-(window,event_type) — small; sessionization keys state by user_id
  * with a processing-time-free event-time gap, dropped on timeout.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must be able to reach the accessors). */
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Tumbling-window counts/sums with a watermark for bounded state and
    * late-data tolerance. Works on streaming and batch inputs alike. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour", lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window event rate per type. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Sliding-window distinct users for unbounded streams — the stream side
    * of the q288/q289 duality: exact `countDistinct` is not allowed in a
    * streaming aggregation (it would need the full per-window user SET in
    * state), so the streaming form carries `approx_count_distinct`
    * (HyperLogLog++ — a few KB of bounded state per open window, same
    * sketch family the batch q289 merges). The watermark closes windows
    * and frees their state; `rsd` trades state size against the relative
    * error the batch-parity spec asserts. */
  def slidingDistinctUsers(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", lateness: String = "30 minutes",
      rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide).as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"), col("approx_users"))

  /** Event-time sessionization with custom state:
    * `flatMapGroupsWithState` keyed by user, closing a session after
    * `gapMillis` of event-time silence (checked via the event-time timeout).
    * This is the reference pattern for arbitrary stateful stream logic the
    * built-in windows can't express. */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMillis =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join: pair each right-stream event with the
    * left-stream events of the same key whose timestamps fall within
    * `[rt - windowBefore, rt]` (e.g. clicks attributed to impressions in the
    * preceding hour). Both sides carry watermarks and the join condition
    * bounds the time distance, so Spark can PURGE buffered state once the
    * watermark passes — without the time bound a stream-stream inner join
    * must buffer both streams forever. Columns are prefixed per side. */
  def intervalJoin(
      left: DataFrame, // event schema with ts, user_id
      right: DataFrame,
      windowBefore: String = "1 hour",
      lateness: String = "30 minutes"
  ): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col("user_id"),
        col("event_id").as("l_event_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"))
    val r = right.withWatermark("ts", lateness)
      .select(col("user_id").as("r_user_id"),
        col("event_id").as("r_event_id"), col("ts").as("r_ts"),
        col("event_type").as("r_type"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $windowBefore") &&
        col("l_ts") <= col("r_ts"))
      .select(col("user_id"), col("l_event_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"), col("l_type"), col("r_type"))
  }

  /** Binned histogram with FIXED bin edges — works identically on a batch
    * frame and a stream (a streaming groupBy here keeps at most
    * `nBuckets + 1` state rows, the minimum any running histogram holds).
    * Bin arithmetic matches [[graft.engine.DiffEngine.numericDrift]]
    * exactly (`(x − lo)·n div width`, all integer); values outside
    * [lo, lo+width) clamp to the edge bins so a drifting stream can't
    * silently create unbounded bin state. Edges are FIXED by the caller —
    * a stream has no global min/max to derive them from; take them from the
    * base snapshot's observed range. */
  def binHistogram(df: DataFrame, c: String, lo: Long, width: Long, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && width > 0, "nBuckets and width must be positive")
    require(width <= Long.MaxValue / nBuckets, "range x buckets overflows long")
    // clamp the VALUE into [lo, hi] before any arithmetic: an outlier far
    // outside the base range would otherwise overflow (x−lo)·nBuckets —
    // an ArithmeticException under ANSI (killing the streaming query) or a
    // negative wrap clamped to the WRONG edge without it. After clamping,
    // (x−lo) ∈ [0, width−1] so the product is bounded by the require above.
    val hi =
      try Math.addExact(lo, width - 1)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"lo=$lo width=$width overflows long; rescale the column")
      }
    val bin = expr(
      s"(least(greatest(cast(`$c` as bigint), ${lo}L), ${hi}L) - ${lo}L) * $nBuckets div ${width}L")
    df.filter(col(c).isNotNull).groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
  }

  /** Exact TV-contribution drift between two bin histograms (same edges):
    * `|base_n·Nh − head_n·Nb|` per bin — the integer cross-multiplied form
    * of [[graft.engine.DiffEngine.numericDrift]], applied to a static base
    * histogram vs. the latest streaming histogram (e.g. inside
    * foreachBatch, where the Complete-mode table is a plain frame). */
  def driftVsBase(baseHist: DataFrame, headHist: DataFrame): DataFrame = {
    val joined = baseHist.select(col("bin"), col("n").as("base_n"))
      .join(headHist.select(col("bin"), col("n").as("head_n")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("head_n"), lit(0L)).as("head_n"))
    val totals = joined.agg(sum("base_n"), sum("head_n")).head()
    def total(i: Int): Long = if (totals.isNullAt(i)) 0L else totals.getLong(i)
    joined.withColumn("tv_contrib",
      abs(col("base_n") * lit(total(1)) - col("head_n") * lit(total(0))))
  }

  /** Run a streaming transform over a bounded source and collect the final
    * result — used by tests and batch/stream parity checks
    * (Trigger.AvailableNow processes everything then stops). */
  def runToBatch(spark: SparkSession, streaming: DataFrame, queryName: String): DataFrame = {
    val q = streaming.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
