package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.Dedup

/** Streaming deduplication — the incremental twins of the batch operators in
  * [[graft.operators.Dedup]], for ingest pipelines that must reject dups as
  * documents ARRIVE rather than in a nightly sweep.
  *
  * Two tiers, mirroring the batch family:
  *   - exact: drop later copies of an id/content hash inside the watermark
  *     horizon (state bounded by the watermark — Spark expires it);
  *   - near-dup candidates: MinHash band buckets as keyed state; the first
  *     document seen in a bucket is its canonical owner, and every later
  *     arrival emits a (keep_id, dup_id) candidate — the streaming form of
  *     the batch LSH bucket-join, same shingling/signature/banding math, so
  *     a candidate emitted here IS a candidate the batch pipeline would emit.
  *
  * Scale posture: signatures are computed STATELESSLY per row (array fold
  * over the document's own shingles — no groupBy), so the only stateful
  * operator is the bucket map: 8 bytes of state per occupied (band, hash)
  * bucket, the minimum any streaming dedup dictionary can hold. An optional
  * processing-time timeout expires idle buckets for horizon-limited dedup.
  */
object StreamingDedup {

  /** Exact streaming dedup: first arrival of each `dedupCols` tuple wins
    * inside the watermark horizon; later copies drop. State is expired by
    * the watermark (`dropDuplicatesWithinWatermark`), so it holds only the
    * horizon's distinct keys. */
  def dedupExact(events: DataFrame, tsCol: String, lateness: String, dedupCols: Seq[String]): DataFrame = {
    require(dedupCols.nonEmpty, "dedup needs at least one column")
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(dedupCols.head, dedupCols.tail: _*)
  }

  final case class DupCandidate(band_idx: Int, keep_id: Long, dup_id: Long)

  /** Streaming MinHash-LSH near-dup candidates over a (doc_id, text) stream.
    *
    * Per row (stateless): word `shingleK`-shingles → one md5-fold per
    * shingle → `numHashes` affine min-signatures → `numHashes/bandSize`
    * band hashes (identical math to [[Dedup.minHashLshPairs]] — the
    * signatures are a pure function of the text). Stateful: group by
    * (band_idx, band_hash); state = first doc_id seen in the bucket; later
    * arrivals emit (first, later) candidates. Downstream verifies with the
    * same jaccard/cosine verifiers as the batch path.
    *
    * `idleTimeout` (e.g. "2 hours") expires buckets not hit for that long —
    * horizon-limited dedup with bounded state; None keeps the full
    * dictionary (exact streaming dedup IS a dictionary).
    *
    * `maxBucketSize` bounds per-bucket fan-out, mirroring the batch cap's
    * intent (an over-common band carries no near-dup signal): after that
    * many distinct arrivals a bucket emits nothing further. Semantics
    * necessarily diverge from batch ABOVE the cap — batch sees the final
    * bucket size and drops the whole bucket, a stream cannot retract
    * already-emitted candidates — so the subset-of-batch guarantee holds
    * exactly for buckets that stay under the cap, and over-common buckets
    * degrade to "first maxBucketSize distinct arrivals emitted, bounded"
    * instead of O(n).
    *
    * Replay hygiene: re-arrivals of the SAME doc_id are deduplicated within
    * a batch (exact — arrivals are sorted, dups adjacent), and across
    * batches against the keeper and the PREVIOUS batch's highest id (the
    * common at-least-once tail-redelivery shape); ids surviving that filter
    * are what consume cap slots. The filter compares against the previous
    * batch's value for the whole batch — comparing against a running
    * last-seen would let a replay sorted after a new smaller id slip
    * through AND burn a slot. Suppression beyond that single remembered id
    * is not attempted (it would need per-bucket id SETS — unbounded state);
    * an id replayed from deeper history re-emits its candidate, so
    * downstream must `distinct()` candidates before clustering, exactly as
    * the batch path does. */
  /** The stateless per-row signature/banding stage shared by
    * [[lshCandidates]] and [[lshVerifiedCandidates]]: (doc_id, band_idx,
    * band_hash[, __set]) with the SAME shingling/signature/banding math as
    * [[Dedup.minHashLshPairs]]. `withSet` additionally carries the sorted
    * distinct shingle-hash set (exactly [[Dedup]]'s `collect_set` +
    * `sort_array` build, per-row) for the stream-side exact verify. */
  private def bandedFrame(docs: DataFrame, numHashes: Int, bandSize: Int,
      shingleK: Int, withSet: Boolean): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    val numBands = numHashes / bandSize
    // stateless per-row signatures: materialize the shingle array (the SAME
    // Dedup.shingles the batch pipeline bands with) and then the hash array
    // as their own columns — HOF lambdas are interpreted per element, so the
    // array builds must never nest inside the fold
    val hashedShingles = expr(
      """transform(__shingles, s ->
        |  cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))""".stripMargin)
    val sigCols = Dedup.minHashCoeffs(numHashes).zipWithIndex.map { case ((a, b), s) =>
      expr(
        s"""aggregate(__hs, cast(${Dedup.MinHashP} as bigint),
           |  (acc, h) -> least(acc, (h * ${a}L + ${b}L) % ${Dedup.MinHashP}L))""".stripMargin)
        .as(s"sig_$s")
    }
    val bandCols = (0 until numBands).map { bnd =>
      val parts = (0 until bandSize).map(j => col(s"sig_${bnd * bandSize + j}").cast("string"))
      struct(lit(bnd).as("band_idx"), md5(concat_ws(",", parts: _*)).as("band_hash")).as(s"band_$bnd")
    }
    val setCol =
      if (withSet) Seq(sort_array(array_distinct(col("__hs"))).as("__set")) else Nil
    val carried = col("doc_id") +: (if (withSet) Seq(col("__set")) else Nil)
    docs
      .withColumn("__shingles", Dedup.shingles("text", shingleK))
      .withColumn("__hs", hashedShingles)
      .filter(size(col("__hs")) > 0)
      .select((col("doc_id") +: setCol) ++ sigCols: _*)
      .select(carried :+ explode(array(bandCols: _*)).as("band"): _*)
      .select(carried :+ col("band.band_idx").as("band_idx") :+
        col("band.band_hash").as("band_hash"): _*)
  }

  def lshCandidates(
      docs: DataFrame, // columns: doc_id LONG, text STRING
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3,
      idleTimeout: Option[String] = None,
      maxBucketSize: Int = 500
  ): Dataset[DupCandidate] = {
    val banded = bandedFrame(docs, numHashes, bandSize, shingleK, withSet = false)
    require(maxBucketSize >= 2, "maxBucketSize must allow at least one pair")
    implicit val keyEnc = Encoders.product[(Int, String)]
    implicit val rowEnc = Encoders.product[(Int, String, Long)]
    implicit val outEnc = Encoders.product[DupCandidate]
    // state = (keep_id, distinct arrivals counted, previous batch's max id,
    // whether that max is valid). seen == 0 encodes "no keeper yet" and
    // hasPrev guards the replay filter — NO sentinel ids anywhere, so
    // documents with doc_id == 0/Long.MinValue/MaxValue behave like any
    // other. NOTE: this state schema is incompatible with checkpoints
    // written by the pre-round-4 (2-long) build; restart such queries with
    // a fresh checkpoint.
    implicit val stateEnc = Encoders.product[(Long, Long, Long, Boolean)]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .selectExpr("band_idx", "band_hash", "doc_id")
      .as[(Int, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Long, Long, Long, Boolean), DupCandidate](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout) {
        case ((bandIdx, _), rows, state: GroupState[(Long, Long, Long, Boolean)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // sorted → within-batch replays are adjacent; distinct drops them
            val arrivals = rows.map(_._3).toSeq.sorted.distinct
            var (keep, seen, prevLast, hasPrev) =
              state.getOption.getOrElse((0L, 0L, 0L, false))
            val out = Seq.newBuilder[DupCandidate]
            arrivals.foreach { id =>
              if (seen == 0L) { keep = id; seen = 1L } // first distinct arrival owns the bucket
              // cross-batch replay filter: compare against the PREVIOUS
              // batch's max id (constant for this whole batch) and the keeper
              else if (id != keep && !(hasPrev && id == prevLast)) {
                seen += 1
                if (seen <= maxBucketSize) // over-common bucket: stop fanning out
                  out += DupCandidate(bandIdx, math.min(keep, id), math.max(keep, id))
              }
            }
            // sorted ⇒ last element is this batch's max
            if (arrivals.nonEmpty) { prevLast = arrivals.last; hasPrev = true }
            state.update((keep, seen, prevLast, hasPrev))
            idleTimeout.foreach(t => state.setTimeoutDuration(t))
            out.result().iterator
          }
      }
  }

  final case class VerifiedDupCandidate(band_idx: Int, a_doc_id: Long, b_doc_id: Long,
      a_n: Long, b_n: Long, inter_n: Long, union_n: Long, jaccard_pct: Long)

  /** [[lshCandidates]] with the batch path's verify-before-drop contract
    * ON THE STREAM (r16, verdict #7): raw band collisions fire well below
    * the threshold, so a firehose pipeline that REMOVES documents must
    * verify exact Jaccard first — exactly what
    * [[Dedup.minHashLshVerifiedPairs]] gives batch. Emitted rows carry
    * the batch verifier's full tuple (a_n, b_n, inter_n, union_n,
    * jaccard_pct over the sorted distinct shingle-hash sets — the
    * identical set build), filtered to `minJaccardPct`, so a pair this
    * stream admits IS a pair the batch join admits (subset-of-batch for
    * under-cap buckets; the same cap/replay semantics as
    * [[lshCandidates]], see there).
    *
    * State: the bucket keeper's id plus its SORTED SHINGLE-HASH SET —
    * bounded by one document's distinct shingles per occupied bucket
    * (~8 bytes × shingles), the price of verifying against a document
    * that left the stream long ago without a store lookup. The verify
    * itself is a per-arrival sorted-merge intersection in the state
    * function — no extra shuffle, no retained candidate. */
  def lshVerifiedCandidates(
      docs: DataFrame, // columns: doc_id LONG, text STRING
      minJaccardPct: Int,
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3,
      idleTimeout: Option[String] = None,
      maxBucketSize: Int = 500
  ): Dataset[VerifiedDupCandidate] = {
    require(minJaccardPct >= 1 && minJaccardPct <= 100, "minJaccardPct must be 1..100")
    require(maxBucketSize >= 2, "maxBucketSize must allow at least one pair")
    val banded = bandedFrame(docs, numHashes, bandSize, shingleK, withSet = true)
    implicit val keyEnc = Encoders.product[(Int, String)]
    implicit val rowEnc = Encoders.product[(Int, String, Long, Seq[Long])]
    implicit val outEnc = Encoders.product[VerifiedDupCandidate]
    implicit val stateEnc = Encoders.product[(Long, Long, Long, Boolean, Seq[Long])]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    // sorted-merge intersection — the JVM twin of the batch path's native
    // SortedIntersectCount expression (both sides are sorted distinct)
    def interN(x: Seq[Long], y: Seq[Long]): Long = {
      var i = 0; var j = 0; var n = 0L
      while (i < x.length && j < y.length) {
        val c = java.lang.Long.compare(x(i), y(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      n
    }
    banded
      .selectExpr("band_idx", "band_hash", "doc_id", "__set")
      .as[(Int, String, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Long, Long, Long, Boolean, Seq[Long]), VerifiedDupCandidate](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout) {
        case ((bandIdx, _), rows, state: GroupState[(Long, Long, Long, Boolean, Seq[Long])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // sorted by id → within-batch replays adjacent; keep one set per id
            val arrivals = rows.toSeq.sortBy(_._3)
              .foldLeft(Vector.empty[(Long, Seq[Long])]) { (acc, r) =>
                if (acc.nonEmpty && acc.last._1 == r._3) acc else acc :+ (r._3, r._4)
              }
            var (keep, seen, prevLast, hasPrev, keepSet) =
              state.getOption.getOrElse((0L, 0L, 0L, false, Seq.empty[Long]))
            val out = Seq.newBuilder[VerifiedDupCandidate]
            arrivals.foreach { case (id, set) =>
              if (seen == 0L) { keep = id; keepSet = set; seen = 1L }
              else if (id != keep && !(hasPrev && id == prevLast)) {
                seen += 1
                if (seen <= maxBucketSize) {
                  // the batch verifier's exact filter, inline: admit iff
                  // inter·(100+pct) >= (|a|+|b|)·pct  (⇔ J >= pct)
                  val aN = math.min(keep, id) == keep // orientation for output only
                  val (loId, loSet, hiId, hiSet) =
                    if (aN) (keep, keepSet, id, set) else (id, set, keep, keepSet)
                  val inter = interN(keepSet, set)
                  val sizes = keepSet.length.toLong + set.length.toLong
                  if (inter * (100L + minJaccardPct) >= sizes * minJaccardPct) {
                    val union = sizes - inter
                    out += VerifiedDupCandidate(bandIdx, loId, hiId,
                      loSet.length.toLong, hiSet.length.toLong, inter, union,
                      inter * 100L / union)
                  }
                }
              }
            }
            if (arrivals.nonEmpty) { prevLast = arrivals.last._1; hasPrev = true }
            state.update((keep, seen, prevLast, hasPrev, keepSet))
            idleTimeout.foreach(t => state.setTimeoutDuration(t))
            out.result().iterator
          }
      }
  }

  /** Streaming SimHash gate against a FROZEN corpus epoch — the firehose
    * twin of [[Dedup.simHashAgainstCorpus]] (the MinHash side has had one
    * since r16; this closes the SimHash leg). `corpusIndex` is
    * [[Dedup.simHashCorpusIndex]]'s output, banded once per epoch and
    * persisted; the stream computes each arriving doc's simhash64
    * STATELESSLY ([[simHash64RowLocal]] math), explodes its 4 band keys,
    * stream-static joins the index, and VERIFIES with one
    * `bit_count(xor)` before anything downstream may drop the doc — the
    * verify-before-drop contract, now on both near-dup legs.
    *
    * The arriving doc's hash computes WITHOUT the batch form's word
    * explode + per-doc aggregate (a streaming agg would demand a watermark
    * and a state store for a value that is a pure function of the text):
    * distinct words → md5 per word → one 64-wide bit-count fold, each bit
    * extracted with the SAME per-hex-digit `conv` arithmetic as
    * [[Dedup.simHash64]]'s aggregate — integer counts either way, so the
    * two forms are bit-identical by construction and the spec pins it.
    * O(words·64) per row, fused into the stream's map stage.
    *
    * Output: (band_idx, doc_id, corpus_id, hamming) per MATCHING band —
    * stateless, so a pair matching in two bands emits twice; downstream
    * `distinct()`s before acting, exactly as with [[lshCandidates]] (the
    * batch operator's own final `distinct` plays that role there). The
    * whole gate is a stream-static inner equi-join: no watermark, no
    * state store, bounded memory at any stream length. */
  def simHashCorpusGate(docs: DataFrame, corpusIndex: DataFrame,
      maxHamming: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "banded recall is exact only for maxHamming <= 3 (4 bands, pigeonhole)")
    // contract error, not a mid-stream AnalysisException — and the same
    // idCol/textCol surface as the batch twins (r17 ADVICE)
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"simHashCorpusGate needs '$idCol' and '$textCol' columns " +
        s"(saw ${docs.columns.mkString(", ")})")
    val zeros = (0 until 64).map(_ => "0").mkString("array(", ", ", ")")
    val bitOf = (0 until 64).map { b =>
      val j = b / 4
      val k = 3 - (b % 4)
      s"cast(cast(conv(substring(h, ${j + 1}, 1), 16, 10) as int) / ${1 << k} as int) % 2"
    }.mkString("array(", ", ", ")")
    val sim = (0 until 64).map { b =>
      when(expr(s"element_at(__counts, ${b + 1})") * 2 >= col("__nw"),
        lit(1L << (63 - b))).otherwise(lit(0L))
    }.reduce(_ + _)
    docs
      .withColumn("__counts", expr(
        s"""aggregate(transform(array_distinct(split($textCol, ' ')), w -> md5(w)),
           |  $zeros, (acc, h) -> zip_with(acc, $bitOf, (a, c) -> a + c))""".stripMargin))
      .withColumn("__nw", size(array_distinct(split(col(textCol), " "))))
      .filter(col("__nw") > 0)
      .withColumn("simhash64", sim)
      .select(col(idCol).as("doc_id"), col("simhash64"),
        explode(expr("sequence(0, 3)")).as("band_idx"))
      .withColumn("band_key",
        expr("(simhash64 >> ((3 - band_idx) * 16)) & 65535").cast("int"))
      .join(corpusIndex, Seq("band_idx", "band_key"))
      .select(col("band_idx"), col("doc_id"), col("corpus_id"),
        expr("bit_count(simhash64 ^ corpus_simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
