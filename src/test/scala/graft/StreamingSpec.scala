package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Structured Streaming specs: windowed agg and sessionization over a
  * MemoryStream, checking stream results against batch-computed truth. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val fixture = Seq(
    Event(1, ts(0), 1, "click", 1.0),
    Event(2, ts(5), 1, "click", 2.0),
    Event(3, ts(10), 2, "view", 3.0),
    Event(4, ts(40), 1, "click", 4.0), // >15min gap for user 1 -> new session
    Event(5, ts(41), 2, "view", 5.0)
  )

  test("windowed aggregation over a stream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val streamed = EventStreams.runToBatch(
      spark, EventStreams.windowedAgg(mem.toDF(), "15 minutes"), "win_agg_test")
      .orderBy("window_start", "event_type")
      .collect()
    val batch = EventStreams.windowedAgg(fixture.toDF(), "15 minutes")
      .orderBy("window_start", "event_type")
      .collect()
    assert(streamed.sameElements(batch))
    assert(streamed.length == 4) // (10:00 click), (10:00 view), (10:30 click), (10:30 view)
  }

  test("native window() matches the arithmetic sliding-window form") {
    import org.apache.spark.sql.functions._
    val ev = fixture.toDF()
    val native = EventStreams.slidingCounts(ev, "1 hour", "15 minutes")
      .select(unix_timestamp(col("window_start")).as("ws"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    val arithmetic = ev
      .select(col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("k", explode(sequence(lit(0), lit(3))))
      .withColumn("ws", expr("sec div 900 * 900 - k * 900"))
      .filter(col("sec") - col("ws") < 3600)
      .groupBy(col("ws"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(native == arithmetic)
  }

  test("sliding distinct users: stream sketch lands on batch exact per window") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.slidingDistinctUsers(mem.toDF(), "1 hour", "15 minutes"),
      "sliding_distinct_test")
      .collect().map(r => (r.getTimestamp(0), (r.getLong(1), r.getLong(2)))).toMap
    val exact = fixture.toDF()
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("d"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.keySet == exact.keySet)
    exact.foreach { case (w, (n, d)) =>
      val (sn, sd) = streamed(w)
      assert(sn == n, s"event count drifted in window $w")
      // 5 users max — HLL++ at rsd=0.02 is exact at this cardinality
      assert(sd == d, s"distinct estimate off in window $w: $sd vs $d")
    }
  }

  test("streaming diff accumulates added/changed and finds removed at completion") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDiff
    // base: ids 1-6; stream delivers head = {1 same, 2 changed, 7 added, 3 same} in 2 batches
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
      .toDF("id", "v")
    val mem = MemoryStream[(Long, String)]
    val spool = java.nio.file.Files.createTempDirectory("graft_spool_").toString + "/keys"
    val (q, counts) = StreamingDiff.start(
      base, mem.toDF().toDF("id", "v"), Seq("id"), Seq("v"), spool)
    mem.addData((1L, "a"), (2L, "CHANGED"))
    mem.addData((7L, "new"), (3L, "c"))
    q.awaitTermination()
    val (added, changed, unchanged) = counts.snapshot
    assert(added == 1 && changed == 1 && unchanged == 2)
    // 4,5,6 never arrived
    assert(StreamingDiff.removedCount(base, spool, Seq("id")) == 3)
  }

  test("exactly-once streaming diff: batch replay is idempotent, totals from durable stats") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDiff
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft_eo_").toString
    val (spool, stats, ckpt) = (s"$tmp/spool", s"$tmp/stats", s"$tmp/ckpt")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "CHANGED"))
    mem.addData((9L, "new"))
    val q = StreamingDiff.startExactlyOnce(
      base, mem.toDF().toDF("id", "v"), Seq("id"), Seq("v"), spool, stats, ckpt)
    q.awaitTermination()
    assert(StreamingDiff.totals(spark, stats) == ((1L, 1L, 1L)))
    // simulate foreachBatch's at-least-once replay: re-run batch 0 verbatim
    // (AvailableNow delivered all rows as one batch) — overwrite-by-batchId
    // must leave totals unchanged however many times the batch runs
    val baseProj = base.select($"id",
      graft.engine.DiffEngine.rowHash(Seq("v")).as("__base_hash"))
    val replay = Seq((1L, "a"), (2L, "CHANGED"), (9L, "new")).toDF("id", "v")
    StreamingDiff.processBatch(baseProj, replay, Seq("id"), Seq("v"), spool, stats, batchId = 0L)
    StreamingDiff.processBatch(baseProj, replay, Seq("id"), Seq("v"), spool, stats, batchId = 0L)
    assert(StreamingDiff.totals(spark, stats) == ((1L, 1L, 1L)))
    // spool is replay-safe too: removed = base keys never arrived (3, 4)
    assert(StreamingDiff.removedCount(base, spool, Seq("id")) == 2)
  }

  test("stream-stream interval join attributes events within the window, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    impressions.addData(
      Event(100, ts(0), 1, "impression", 0.0),
      Event(101, ts(30), 1, "impression", 0.0),
      Event(102, ts(5), 2, "impression", 0.0))
    clicks.addData(
      Event(200, ts(10), 1, "click", 1.0),  // within 15m of imp 100
      Event(201, ts(44), 1, "click", 1.0),  // within 15m of imp 101 only
      Event(202, ts(50), 2, "click", 1.0))  // imp 102 is 45m earlier -> no match
    val joined = EventStreams.intervalJoin(
      impressions.toDF(), clicks.toDF(), windowBefore = "15 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pairs = spark.table("ij")
      .collect().map(r => (r.getAs[Long]("l_event_id"), r.getAs[Long]("r_event_id"))).toSet
    assert(pairs == Set((100L, 200L), (101L, 201L)))
  }

  test("streaming exact dedup drops later copies within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 99.0), // same event_id, later copy in-batch
      Event(2, ts(2), 2, "view", 2.0))
    mem.addData(Event(2, ts(9), 2, "view", 98.0), Event(3, ts(10), 3, "click", 3.0))
    val q = StreamingDedup.dedupExact(mem.toDF(), "ts", "30 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_exact_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("dedup_exact_test")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
    assert(rows.keySet == Set(1L, 2L, 3L)) // one survivor per id
    assert(rows(1L) == 1.0 && rows(2L) == 2.0) // first arrival wins
  }

  test("streaming LSH candidates match batch banding, first-seen keeps") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "completely different words about spark engines here now"
    val docs = Seq((1L, textA), (2L, textA), (3L, textB), (5L, textA))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = StreamingDedup.lshCandidates(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lsh_cand_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("lsh_cand_test")
      .select("keep_id", "dup_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // first-seen (min id in the arrival order) owns the bucket: copies of
    // textA attach to doc 1; the unrelated doc 3 appears nowhere
    assert(streamed == Set((1L, 2L), (1L, 5L)))
    // every streamed candidate is a pair the BATCH pipeline also bands
    val batchPairs = graft.operators.Dedup.minHashLshPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.subsetOf(batchPairs))
  }

  test("streaming LSH bucket cap bounds fan-out on over-common text") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val boiler = "common boiler plate words repeated in every single document"
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L to 10L).map(i => (i, boiler)): _*)
    val q = StreamingDedup.lshCandidates(
      mem.toDF().toDF("doc_id", "text"), maxBucketSize = 4)
      .writeStream.format("memory").queryName("lsh_cap_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dups = spark.table("lsh_cap_test")
      .select("dup_id").distinct().collect().map(_.getLong(0)).toSet
    // only the first maxBucketSize arrivals may emit: docs 2..4 attach to 1,
    // arrivals 5..10 are past the cap and emit nothing in any band
    assert(dups == Set(2L, 3L, 4L))
  }

  test("streaming LSH: replayed doc ids neither re-emit nor consume cap slots") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val boiler = "replay hygiene words repeated across every duplicate document"
    val mem = MemoryStream[(Long, String)]
    // doc 1 arrives 5 times in batch 1 (replays), then docs 2..4 in batch 2,
    // then doc 4 replays in batch 3 (cross-batch, adjacent re-arrival)
    mem.addData((1L to 5L).map(_ => (1L, boiler)): _*)
    mem.addData((2L, boiler), (3L, boiler), (4L, boiler))
    mem.addData((4L, boiler))
    val q = StreamingDedup.lshCandidates(
      mem.toDF().toDF("doc_id", "text"), maxBucketSize = 4)
      .writeStream.format("memory").queryName("lsh_replay_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val cands = spark.table("lsh_replay_test")
      .select("band_idx", "keep_id", "dup_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // replays of doc 1 consumed ONE slot, not five: docs 2..4 all fit under
    // the distinct-arrival cap of 4 and each emits against keeper 1
    assert(cands.map(c => (c._2, c._3)).toSet == Set((1L, 2L), (1L, 3L), (1L, 4L)))
    // and no (band, pair) was emitted twice — doc 4's replay was swallowed
    assert(cands.length == cands.distinct.length)
  }

  test("streaming LSH: replay sorted after a new smaller id still can't crowd out") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val boiler = "crowding scenario text shared verbatim by every document here"
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, boiler), (5L, boiler))      // keep=1, emit (1,5), prevLast=5
    mem.addData((3L, boiler), (5L, boiler))      // 3 is NEW, 5 is a replay of prev max
    mem.addData((7L, boiler))                    // must still fit under cap 4
    val q = StreamingDedup.lshCandidates(
      mem.toDF().toDF("doc_id", "text"), maxBucketSize = 4)
      .writeStream.format("memory").queryName("lsh_crowd_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pairs = spark.table("lsh_crowd_test")
      .select("keep_id", "dup_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the batch-2 replay of 5 must not re-emit or burn the slot doc 7 needs
    assert(pairs == Set((1L, 5L), (1L, 3L), (1L, 7L)))
    // doc_id 0 is a legal id, not a state sentinel: it participates fully
    val mem0 = MemoryStream[(Long, String)]
    mem0.addData((2L, boiler), (0L, boiler))
    val q0 = StreamingDedup.lshCandidates(mem0.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lsh_zero_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination()
    val p0 = spark.table("lsh_zero_test")
      .select("keep_id", "dup_id").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p0 == Set((0L, 2L))) // 0 sorts first -> owns the bucket, pair emitted
  }

  test("streaming numeric drift: fixed-edge histogram matches batch, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // base snapshot fixes the edges: range 0..19, 20 bins -> bin == value
    val base = Seq(0L, 0L, 5L, 19L).toDF("v")
    val baseHist = EventStreams.binHistogram(base, "v", lo = 0L, width = 20L, nBuckets = 20)
    val mem = MemoryStream[Long]
    mem.addData(0L, 5L, 5L)
    mem.addData(19L, 25L, -3L) // out-of-range values clamp to edge bins
    val headHist = EventStreams.runToBatch(spark,
      EventStreams.binHistogram(mem.toDF().toDF("v"), "v", 0L, 20L, 20), "drift_hist_test")
    val h = headHist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(0L -> 2L, 5L -> 2L, 19L -> 2L)) // -3 -> bin 0, 25 -> bin 19
    // drift vs base: Nb=4, Nh=6; exact integer TV contributions
    val d = EventStreams.driftVsBase(baseHist, headHist)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(d(0L) == math.abs(2L * 6 - 2L * 4)) // 4
    assert(d(5L) == math.abs(1L * 6 - 2L * 4)) // 2
    assert(d(19L) == math.abs(1L * 6 - 2L * 4))
    // in-range data: streaming histogram == batch histogram == numericDrift bins
    val sameBatch = Seq(0L, 5L, 5L, 19L).toDF("v")
    val bh = EventStreams.binHistogram(sameBatch, "v", 0L, 20L, 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nd = graft.engine.DiffEngine.numericDrift(base, sameBatch, "v", nBuckets = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).filter(_._2 > 0).toMap
    assert(bh == nd) // same bin arithmetic end to end
    // an extreme outlier clamps to the edge bin instead of overflowing
    // (x−lo)·nBuckets — under ANSI that overflow would kill the query
    val extreme = Seq(Long.MaxValue, Long.MinValue, 5L).toDF("v")
    val eh = EventStreams.binHistogram(extreme, "v", 0L, 20L, 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(eh == Map(0L -> 1L, 5L -> 1L, 19L -> 1L))
    intercept[IllegalArgumentException](
      EventStreams.binHistogram(extreme, "v", Long.MaxValue - 5, 20L, 2))
  }

  test("misra-gries sketch aggregates a token stream with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    // the same mergeable Aggregator runs as a streaming aggregate — state is
    // ONE bounded counter map, the scale path for live ingest token stats
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "hot hot hot warm rare1"), (2L, "hot warm warm rare2"))
    mem.addData((3L, "hot hot warm rare3 rare4"))
    val toks = mem.toDF().toDF("doc_id", "text")
      .select(explode(graft.operators.TextAnalysis.tokens("text")).as("token"))
      .as[String]
    val q = toks.select(graft.functions.HeavyHitters.sketch(4).toColumn)
      .toDF("hitters")
      .writeStream.format("memory").queryName("mg_stream_test")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("mg_stream_test")
      .select(explode(col("hitters")).as("h"))
      .select(col("h.item"), col("h.min_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=15, capacity 4 -> bound 3: hot (6) and warm (4) must be present,
    // counts are certified lower bounds
    assert(got.contains("hot") && got.contains("warm"))
    assert(got("hot") <= 6L && got("hot") >= 3L)
    assert(got("warm") <= 4L && got("warm") >= 1L)
    assert(got.size <= 4) // the state never exceeds the capacity
  }

  test("streaming SimHash corpus gate: stream flags == batch incremental join, verify-before-drop (r17b)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingDedup
    import graft.operators.Dedup
    def mk(i: Long) = s"document number $i with shared scaffold words " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpusDf = (0L until 30L).map(i => (i, mk(i))).toDF("doc_id", "text")
    val idx = Dedup.simHashCorpusIndex(corpusDf, "doc_id", "text")
    // arriving batch: exact replays of 3 corpus docs (hamming 0 guaranteed),
    // one-word-appended twins (low hamming), and unrelated noise
    val batchRows: Seq[(Long, String)] =
      (0L until 3L).map(i => (3000L + i, mk(i))) ++
        (0L until 10L).map(i => (1000L + i, mk(i) + " zz")) ++
        (0L until 5L).map(i => (2000L + i,
          s"totally unrelated content row $i sharing nothing with the corpus fixture"))
    val batchDf = batchRows.toDF("doc_id", "text")
    val truth = Dedup.simHashAgainstCorpus(batchDf, corpusDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(truth.exists(_._3 == 0L), "exact replays must flag at hamming 0")
    val mem = MemoryStream[(Long, String)]
    mem.addData(batchRows.take(8): _*)
    mem.addData(batchRows.drop(8): _*)
    val q = StreamingDedup.simHashCorpusGate(mem.toDF().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("simhash_gate_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("simhash_gate_test")
      .select("doc_id", "corpus_id", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the stateless row-local hash + stream-static join reproduces the
    // batch incremental operator EXACTLY (after the documented distinct)
    assert(got == truth, s"stream ${got.size} vs batch ${truth.size}")
    // every drop decision was verified: nothing unrelated was flagged
    assert(!got.exists(t => t._1 >= 2000L && t._1 < 3000L))
    // custom column names work like the batch twins' idCol/textCol (r18,
    // r17 ADVICE 3) — same stream under renamed columns, same flags
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(batchRows: _*)
    val q2 = StreamingDedup.simHashCorpusGate(
        mem2.toDF().toDF("item_id", "body"), idx, idCol = "item_id", textCol = "body")
      .writeStream.format("memory").queryName("simhash_gate_renamed")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got2 = spark.table("simhash_gate_renamed")
      .select("doc_id", "corpus_id", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == truth)
    // and a missing column is a CONTRACT error naming the columns, not a
    // raw mid-stream AnalysisException
    val ex = intercept[IllegalArgumentException] {
      StreamingDedup.simHashCorpusGate(mem2.toDF().toDF("item_id", "body"), idx)
    }
    assert(ex.getMessage.contains("doc_id") && ex.getMessage.contains("item_id"))
  }

  test("streaming graph serve gate: broadcast-index walk == batch graphSearchNeighbors row-for-row (r18)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    import graft.streaming.StreamingSimilarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
      bits = 3, kGraph = 4, seed2 = 1337).localCheckpoint()
    val batch = Similarity.graphSearchNeighbors(e, "vec_id", "embedding", g,
        col("vec_id") % 20 === 0, k = 4, beam = 3, nEntry = 3, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    val idx = StreamingSimilarity.buildServeIndex(e, "vec_id", "embedding", g, nEntry = 3)
    // probes arrive over TWO stream batches — the gate is stateless, so
    // delivery slicing cannot change any answer
    val probeRows = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData(probeRows.take(probeRows.size / 2): _*)
    mem.addData(probeRows.drop(probeRows.size / 2): _*)
    val q = StreamingSimilarity.graphServeGate(
        mem.toDF().toDF("probe_id", "vec"), idx, k = 4, beam = 3, maxHops = 3)
      .writeStream.format("memory").queryName("graph_serve_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("graph_serve_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch, s"stream ${got.size} rows vs batch ${batch.size}")
    // the replica-memory contract fails LOUDLY at build, never as an
    // executor OOM mid-stream
    val ex = intercept[IllegalArgumentException] {
      StreamingSimilarity.buildServeIndex(e, "vec_id", "embedding", g,
        nEntry = 3, maxIndexRows = 10)
    }
    assert(ex.getMessage.contains("int8/binary"), ex.getMessage)
  }

  test("streaming mixture gate: frozen thresholds reproduce the batch rebalance row-for-row (r17b)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Sampling
    import graft.streaming.StreamingCurate
    val rows: Seq[(Long, String)] =
      (0L until 120L).map(i => (i, if (i % 4 == 0L) "web" else "books")) ++
        (200L until 210L).map(i => (i, "junk")) // unweighted -> must drop
    val batch = rows.toDF("doc_id", "domain")
    val weights = Map("web" -> 3, "books" -> 1)
    val thresholds = Sampling.mixtureThresholds(batch, "domain", weights, totalBudget = 40L)
    val expected = Sampling.rebalanceToMixture(batch, "domain", "doc_id", weights, 40L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expected.nonEmpty && !expected.exists(_._2 == "junk"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows.take(60): _*)
    mem.addData(rows.drop(60): _*)
    val q = StreamingCurate.mixtureGate(
        mem.toDF().toDF("doc_id", "domain"), "doc_id", "domain", thresholds)
      .writeStream.format("memory").queryName("mixture_gate_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("mixture_gate_test")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected, s"stream ${got.size} vs batch ${expected.size}")
  }

  test("sessionization closes sessions on event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    // advance watermark far past all data so every session times out
    mem.addData(Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "click", 0.0))
    val q = EventStreams.sessionize(mem.toDS(), gapMillis = 15 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table("sessions_test").as[Session].collect()
      .sortBy(s => (s.user_id, s.session_start.getTime))
    // user 1: [10:00-10:05] then [10:40]; user 2: [10:10] then [10:41]
    val u1 = sessions.filter(_.user_id == 1)
    assert(u1.length == 2)
    assert(u1(0).n_events == 2 && u1(0).sum_value == 3.0)
    assert(u1(1).n_events == 1 && u1(1).sum_value == 4.0)
    val u2 = sessions.filter(_.user_id == 2)
    assert(u2.length == 2)
    assert(u2.map(_.n_events).toSeq == Seq(1, 1))
  }

  test("streaming curate intake: quality gate + horizon dedup on the firehose") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCurate
    val stop = Seq("the", "a", "of")
    val good = (1 to 60).map(i => s"word$i").mkString(" ") + " the a"
    val good2 = (1 to 60).map(i => s"term$i").mkString(" ") + " of the"
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, ts(0), good),            // passes, first arrival of its content
      (2L, ts(1), "the a short"),   // fails the word-count gate
      (3L, ts(2), good),            // duplicate content -> dropped
      (4L, ts(3), good2))           // passes, distinct content
    val q = StreamingCurate.intake(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "text", "30 minutes", stop, minWords = 50)
      .writeStream.format("memory").queryName("curate_intake_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("curate_intake_test")
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivors: first copy of each distinct passing content only
    assert(rows.keySet == Set(1L, 4L))
    assert(rows(1L) == 62L && rows(4L) == 62L)
    // batch twin: gate + min-id-per-content dedup gives the same survivors
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, md5, row_number}
    val batch = TextAnalysis.gopherFilter(
      Seq((1L, good), (2L, "the a short"), (3L, good), (4L, good2)).toDF("doc_id", "text"),
      "text", stop, minWords = 50)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == rows.keySet)
  }

  test("streaming asset intake: content-routed mime, junk dropped, payload dedup in horizon") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    import graft.streaming.StreamingCurate
    val png = Multimodal.encodePngFromText("abc", 2, 2, 3)
    val bmp = Multimodal.encodeBmpFromText("abc", 2, 2)
    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    mem.addData(
      (1L, ts(0), png),                        // lands: image/png
      (2L, ts(1), bmp),                        // lands: image/bmp
      (3L, ts(2), png),                        // byte-identical dup -> dropped
      (4L, ts(3), "not an image".getBytes("UTF-8"))) // junk -> dropped at the door
    val q = StreamingCurate.assetIntake(
      mem.toDF().toDF("asset_id", "ts", "payload"), "ts", "payload", "30 minutes")
      .writeStream.format("memory").queryName("asset_intake_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("asset_intake_test")
      .select("asset_id", "mime").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "image/png", 2L -> "image/bmp"))
    // batch twin: the q125 sniff expression routes the same set
    import org.apache.spark.sql.functions.col
    val batch = Seq((1L, png), (2L, bmp), (4L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
      .select(col("asset_id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .filter(col("mime") =!= "application/octet-stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch == rows)
  }

  test("streaming cdc: latest-state matches batch compaction, stale arrivals ignored") {
    import graft.streaming.StreamingCdc
    import graft.streaming.StreamingCdc.Change
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    // first delivery: key 1's v2 arrives BEFORE its v1 (out of order)
    mem.addData(Change(1L, 2L, "B", tombstone = false), Change(2L, 1L, "x", tombstone = false))
    // later delivery: the stale v1 (must NOT regress state), a tombstone, a new key
    mem.addData(
      Change(1L, 1L, "A", tombstone = false),
      Change(2L, 2L, "xx", tombstone = true),
      Change(3L, 1L, "c", tombstone = false))
    val updates = StreamingCdc.runToTable(mem.toDS(), "cdc_stream_test").collect()
    val finalState = updates.groupBy(_.key).map { case (_, rows) => rows.maxBy(_.version) }
    // stale v1 for key 1 did not overwrite v2
    assert(finalState.find(_.key == 1L).get == StreamingCdc.Current(1L, 2L, "B", live = true))
    // batch twin: cdcLatest over the full log produces the same live rows
    import spark.implicits._
    val log = Seq(
      (1L, 2L, "B", 0), (2L, 1L, "x", 0),
      (1L, 1L, "A", 0), (2L, 2L, "xx", 1), (3L, 1L, "c", 0)
    ).toDF("key", "version", "value", "__del")
    val batchLive = graft.engine.DiffEngine.cdcLatest(log, Seq("key"), "version", Some("__del"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamLive = finalState.filter(_.live).map(c => c.key -> c.value).toMap
    assert(streamLive == batchLive && batchLive == Map(1L -> "B", 3L -> "c"))
  }

  test("streaming top-k agrees with the batch operator across out-of-order batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingTopK
    import graft.streaming.StreamingTopK.Obs
    import graft.operators.TopK
    // same distribution as the batch spec, delivered in two shuffled
    // batches with a duplicate redelivery of (g0, id 0)
    val rows = (0L until 100L).map(i => Obs(s"g${i % 2}", i, (i * 37) % 50))
    val (b1, b2) = rows.splitAt(60)
    val mem = MemoryStream[Obs]
    mem.addData(b2.reverse: _*) // later rows arrive first
    mem.addData(b1 :+ rows.head: _*)
    val out = StreamingTopK.runToTable(mem.toDS(), 4, "topk_stream").collect()
    // Update mode: last emitted row per group is its final leaderboard
    val finalTop = out.zipWithIndex.groupBy(_._1.group)
      .map { case (g, xs) => g -> xs.maxBy(_._2)._1 }
    val batch = TopK.topKPerGroup(
      spark.createDataFrame(rows.map(o => (o.group, o.id, o.value))).toDF("g", "id", "v"),
      "g", "id", "v", 4)
      .orderBy("grp", "rank").collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> (rs.map(_.getLong(1)).toSeq, rs.map(_.getLong(2)).toSeq) }
    assert(finalTop.keySet == batch.keySet)
    finalTop.foreach { case (g, gt) =>
      assert((gt.ids, gt.values) == batch(g), s"group $g")
    }
  }

  test("streaming blocklist gate: native expression on the firehose equals the batch screen row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCurate
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "a dup appears in this one"),
      (3L, "table hash in the middle"),
      (4L, "dup dup and table hash both"),
      (5L, "nothing flagged again"))
    val phrases = Seq("dup", "table hash") ++ (0 until 500).map(i => s"abs$i")
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.take(3): _*)
    mem.addData(docs.drop(3): _*)
    val q = StreamingCurate.blocklistGate(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", phrases, keepBlocked = true)
      .writeStream.format("memory").queryName("blk_gate_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("blk_gate_test")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis
      .blocklistHitsLarge(docs.toDF("doc_id", "text"), "doc_id", "text", phrases)
      .join(docs.toDF("doc_id", "text"), "doc_id")
      .select("doc_id", "text", "n_uni_hits", "n_bi_hits", "blocked")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(stream == batch)
    // intake form: flagged docs never land
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(docs: _*)
    val q2 = StreamingCurate.blocklistGate(
        mem2.toDF().toDF("doc_id", "text"), "doc_id", "text", phrases)
      .writeStream.format("memory").queryName("blk_gate_drop_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("blk_gate_drop_test").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
  }

  test("streaming verified near-dup: stream admits exactly the batch verifier's pairs, drops raw collisions") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    // docs 1/2 exact dups (J=100), doc 3 a near dup (J=80 on word
    // trigrams, band-collides with both), doc 4 unrelated — two batches
    val docs = Seq(
      (1L, "the cat sat on the warm mat near the door today"),
      (2L, "the cat sat on the warm mat near the door today"),
      (3L, "the cat sat on the warm mat near the door now"),
      (4L, "completely different words entirely here now"))
    def runStream(pct: Int, name: String): Set[(Long, Long, Long, Long, Long, Long, Long)] = {
      val mem = MemoryStream[(Long, String)]
      mem.addData(docs.take(2): _*)
      mem.addData(docs.drop(2): _*)
      val q = StreamingDedup.lshVerifiedCandidates(
          mem.toDF().toDF("doc_id", "text"), minJaccardPct = pct)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name)
        .select("a_doc_id", "b_doc_id", "a_n", "b_n", "inter_n", "union_n", "jaccard_pct")
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    }
    def runBatch(pct: Int) = graft.operators.Dedup.minHashLshVerifiedPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", pct)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    // every admitted stream pair is byte-identical to the batch verifier's
    // row for that pair — same set build, same integer filter, same
    // jaccard arithmetic. (Subset, not equality: a stream bucket pairs
    // arrivals against its KEEPER only — (1,2) and (1,3) here — while the
    // batch bucket join also emits dup-vs-dup (2,3); min-id survivorship
    // needs exactly the keeper pairs.)
    val s50 = runStream(50, "vnd50")
    assert(s50.subsetOf(runBatch(50)), s"stream $s50 vs batch ${runBatch(50)}")
    assert(s50.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L)), s"$s50")
    assert(s50.exists(p => p._1 == 1L && p._2 == 3L && p._7 == 80L),
      s"the J=80 near dup must be admitted at pct 50 with its exact jaccard: $s50")
    // at pct 90 the same band collision (1,3) still FIRES but the verify
    // drops it before any removal could act on it — the r15 silent-data-
    // loss class, now closed on the stream side too
    val s90 = runStream(90, "vnd90")
    assert(s90.subsetOf(runBatch(90)))
    assert(s90.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(!s90.exists(p => p._2 == 3L), s"unverified collision must not be admitted: $s90")
    // and the raw candidate stream DID see the pair the verify dropped
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = StreamingDedup.lshCandidates(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("vnd_raw")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val raw = spark.table("vnd_raw").select("keep_id", "dup_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw.contains((1L, 3L)), s"fixture must band-collide the near dup: $raw")
  }

  test("streaming DSIR gate: frozen-model firehose scores equal the batch scorer row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCurate
    import graft.operators.Dsir
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "alpha beta alpha", "t"), (2L, "alpha beta gamma delta", "r"),
      (3L, "beta beta beta", "r"), (7L, "alpha alpha", "t")).toDF("id", "text", "grp")
    val model = Dsir.fitModel(corpus, "text", col("grp") === "t", buckets = 64)
    // batch includes seen vocab, raw-only vocab, unseen vocab, a
    // featureless doc — delivered across two stream batches
    val docs = Seq((10L, "alpha beta alpha"), (11L, "beta beta gamma"),
      (12L, "zzqq wwrr unseen"), (13L, ""))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.take(2): _*)
    mem.addData(docs.drop(2): _*)
    val q = StreamingCurate.dsirGate(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", model,
        buckets = 64, minWeightX1000 = 0L, keepRejected = true)
      .writeStream.format("memory").queryName("dsir_gate_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("dsir_gate_test")
      .select("doc_id", "n_features", "weight_x1000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dsir.scoreWithModel(docs.toDF("doc_id", "text"),
        "doc_id", "text", model, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch, s"stream $stream vs batch $batch")
    assert(!stream.exists(_._1 == 13L)) // featureless doc emits no row
    // intake form: only docs at/above the threshold land
    val cut = batch.map(_._3).toSeq.sorted.apply(1) // drop the lowest scorer
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(docs: _*)
    val q2 = StreamingCurate.dsirGate(
        mem2.toDF().toDF("doc_id", "text"), "doc_id", "text", model,
        buckets = 64, minWeightX1000 = cut)
      .writeStream.format("memory").queryName("dsir_gate_drop_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val landed = spark.table("dsir_gate_drop_test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == batch.filter(_._3 >= cut).map(_._1))
    // reserved-name refusal, like the blocklist gate
    val e = intercept[IllegalArgumentException] {
      StreamingCurate.dsirGate(Seq((1L, "x", 0L)).toDF("doc_id", "text", "weight_x1000"),
        "doc_id", "text", model, buckets = 64, minWeightX1000 = 0L)
    }
    assert(e.getMessage.contains("weight_x1000"))
  }

  test("blocklist gate refuses inputs that already carry its reserved column names") {
    import graft.streaming.StreamingCurate
    // a stream already carrying `blocked` (or `__row` etc.) would be
    // silently clobbered by the gate's struct-pack/flatten — the operator
    // must refuse loudly instead (r16, per advice)
    for (bad <- Seq("__row", "n_uni_hits", "blocked")) {
      val df = Seq((1L, "text here", 0L)).toDF("doc_id", "text", bad)
      val e = intercept[IllegalArgumentException] {
        StreamingCurate.blocklistGate(df, "doc_id", "text", Seq("dup"))
      }
      assert(e.getMessage.contains(bad))
    }
  }
}
