package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Design point: every method here is a linear-shuffle plan — no O(n²)
  * pairwise comparison ever materializes. Candidate generation is always
  * blocking/banding (group-by on a short key), so at 100 TB the shuffle
  * volume is proportional to input size + candidate-pair count, and the
  * expensive verify step runs only on candidates. All hashing is md5-based
  * (codegen'd builtin, stable across engines) — no JVM `hashCode`, no
  * nondeterministic seeds.
  */
object Dedup {

  /** Exact dedup — hash-groupBy keeping the smallest id per duplicate group.
    * `dropDuplicates` would keep an arbitrary row; min-id is deterministic,
    * which matters for reproducible pipeline runs. One shuffle on the hash. */
  def exactByContent(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Exact dedup on arbitrary key columns (SURVEY §2.9): keep min-id row. */
  def exactByKeys(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Word k-shingles of `textCol` (single-space tokenization — matches the
    * oracle's `string_split(text,' ')`). Shared with the streaming dedup,
    * which must band identically to this batch pipeline. */
  private[graft] def shingles(textCol: String, k: Int): Column = {
    val w = s"split($textCol, ' ')"
    expr(
      s"""transform(sequence(0, greatest(size($w) - $k, 0)),
         |  i -> array_join(slice($w, i + 1, $k), ' '))""".stripMargin)
  }

  /** MinHash base hash: ONE md5 per shingle, folded to a 32-bit integer via
    * its first 8 hex chars. The `numHashes` signature values derive from this
    * single hash by affine maps `(a_s·h + b_s) mod P` (universal hashing,
    * P prime > 2^32) — integer ops in a codegen'd aggregate instead of
    * `numHashes` string hashes per shingle. Engine-portable: DuckDB computes
    * the identical `('0x'||substr(md5(x),1,8))::BIGINT` and modular math. */
  val MinHashP: Long = 4294967311L
  /** Affine coefficients per signature (fixed primes; a < 2^30 keeps
    * a·h < 2^62 — no ANSI overflow). */
  def minHashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map(s => (1000003L * (s + 1) + 17L, 998244353L * (s + 1) + 7L))

  /** MinHash + LSH banding: documents sharing any band of `bandSize`
    * consecutive signature values become a candidate pair.
    *
    * Plan shape (all linear, no pairwise scan):
    *   1. explode shingles → one md5 + int fold per shingle;
    *   2. ONE codegen'd groupBy(id) computing all `numHashes` signature mins;
    *   3. explode band structs, groupBy (band_idx, band_hash) collecting the
    *      bucket's ids — signatures are computed ONCE (a self-join would
    *      recompute the whole upstream for each side);
    *   4. emit sorted in-bucket pairs; buckets above `maxBucketSize` are
    *      dropped (an over-common band carries no near-dup signal and would
    *      produce O(n²) pairs — standard LSH cap, applied identically in the
    *      oracle).
    *
    * Returns distinct (id_a, id_b) with id_a < id_b.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3,
      maxBucketSize: Int = 500
  ): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    val banded = sigBands(df, idCol, textCol, numHashes, bandSize, shingleK)
    pairsFromBands(banded, idCol, maxBucketSize)
  }

  /** In-bucket sorted pair emission with the standard LSH bucket cap —
    * shared by [[minHashLshPairs]] and [[minHashCertificate]]. */
  private def pairsFromBands(banded: DataFrame, idCol: String,
      maxBucketSize: Int): DataFrame = {
    val buckets = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(sort_array(collect_list(col(idCol))).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucketSize))
    buckets
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
          |  transform(slice(__ids, i + 2, size(__ids)), y -> struct(x as a, y as b))))""".stripMargin))
        .as("p"))
      .select(col("p.a").as(s"a_$idCol"), col("p.b").as(s"b_$idCol"))
      .distinct()
  }

  /** Band rows (id, band_idx, band_hash) derived from an already-built
    * signature frame — lets callers that need signatures for other work
    * (the certificate) band WITHOUT a second shingle pass. */
  private def bandsFromSigs(sigs: DataFrame, idCol: String,
      numHashes: Int, bandSize: Int): DataFrame = {
    val numBands = numHashes / bandSize
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until bandSize).map(j => col(s"sig_${b * bandSize + j}").cast("string"))
      struct(lit(b).as("band_idx"), md5(concat_ws(",", parts: _*)).as("band_hash")).as(s"band_$b")
    }
    sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Shared MinHash banding stage: shingle → 32-bit hash → per-doc
    * signature minima → banded hashes, as (id, band_idx, band_hash) rows.
    * One explode + one agg + one generate; the only shuffle keys on the
    * doc id for the signature aggregate. */
  private def sigBands(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bandSize: Int, shingleK: Int): DataFrame = {
    val hashed = hashedShingleFrame(df, idCol, textCol, shingleK)
    val sigAggs = minHashCoeffs(numHashes).zipWithIndex.map { case ((a, b), s) =>
      min((col("__h") * a + b) % MinHashP).as(s"sig_$s")
    }
    val sigs = hashed.groupBy(col(idCol)).agg(sigAggs.head, sigAggs.tail: _*)
    bandsFromSigs(sigs, idCol, numHashes, bandSize)
  }

  /** Shared per-shingle base-hash frame: (id, __h) with ONE md5 per
    * shingle folded to its first 8 hex chars — the value both the
    * signature aggregate and the exact-Jaccard set build on. */
  private def hashedShingleFrame(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame = Par.ensureParallel(df)
    .select(col(idCol), explode(shingles(textCol, shingleK)).as("__sh"))
    .select(col(idCol),
      expr("cast(conv(substring(md5(__sh), 1, 8), 16, 10) as bigint)").as("__h"))

  /** MinHash accuracy certificate — completes the sketch-certificate
    * family (q99 Misra–Gries, q120 HLL, q135 Count-Min, q140 GK): for
    * every LSH candidate pair, the signature's Jaccard ESTIMATE
    * (matching components / numHashes) next to the EXACT Jaccard of the
    * hashed shingle sets, plus a 3σ Bernoulli check done entirely in
    * ×10^6 fixed point — `(est−exact)²·k ≤ 9·exact·(10^6−exact)` is the
    * integer form of |est−J| ≤ 3·√(J(1−J)/k), so the verdict is
    * bit-identical cross-engine (no sqrt, no floats). Unlike MG/HLL/GK
    * this bound is probabilistic (each signature component is a Bernoulli
    * trial), so `within_3sigma` is a per-pair audit flag, not a
    * guarantee; the expected violation rate is < 1%.
    *
    * Scale shape: ONE shingle pass — signatures AND sorted hash-sets come
    * out of a single groupBy over the shared shingle frame, materialized
    * once; the LSH bands (and so the candidate pairs, bounded buckets, no
    * all-pairs) derive from those signatures rather than re-running the
    * pipeline, and the same frame joins to both sides of the (small) pair
    * list. Set intersection is a per-row sorted-array op — the full
    * shingle stream never re-shuffles for the verify. */
  def minHashCertificate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3,
      maxBucketSize: Int = 500
  ): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    require(1000000 % numHashes == 0, "numHashes must divide 10^6 for exact fixed-point")
    val sigAggs = minHashCoeffs(numHashes).zipWithIndex.map { case ((a, b), s) =>
      min((col("__h") * a + b) % MinHashP).as(s"sig_$s")
    }
    val perDoc = hashedShingleFrame(df, idCol, textCol, shingleK)
      .groupBy(col(idCol))
      .agg(sigAggs.head, (sigAggs.tail :+ sort_array(collect_set(col("__h"))).as("__set")): _*)
      .localCheckpoint() // one signature+set build feeds bands AND both pair sides
    val pairs = pairsFromBands(
      bandsFromSigs(perDoc, idCol, numHashes, bandSize), idCol, maxBucketSize)
    def side(p: String) = perDoc.select(
      col(idCol).as(s"${p}_$idCol") +:
        ((0 until numHashes).map(s => col(s"sig_$s").as(s"${p}_sig_$s")) :+
          col("__set").as(s"${p}_set")): _*)
    val est = (0 until numHashes)
      .map(s => when(col(s"a_sig_$s") === col(s"b_sig_$s"), 1L).otherwise(0L))
      .reduce(_ + _) * lit(1000000L / numHashes)
    pairs
      .join(side("a"), s"a_$idCol").join(side("b"), s"b_$idCol")
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        est.as("est_x1m"),
        size(array_intersect(col("a_set"), col("b_set"))).cast("long").as("inter_n"),
        (size(col("a_set")) + size(col("b_set"))).cast("long").as("sizes"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"), col("est_x1m"),
        col("inter_n"), (col("sizes") - col("inter_n")).as("union_n"))
      .withColumn("exact_x1m", expr("inter_n * 1000000 div union_n"))
      .withColumn("within_3sigma",
        when(((col("est_x1m") - col("exact_x1m")) * (col("est_x1m") - col("exact_x1m"))
          * numHashes) <= lit(9L) * col("exact_x1m") * (lit(1000000L) - col("exact_x1m")),
          1L).otherwise(0L))
  }

  /** [[minHashLshPairs]] candidates passed through an EXACT Jaccard
    * verify at `minJaccardPct` — the destructive-decision form (r15
    * review finding): raw band collisions fire with probability
    * 1−(1−J^bands)^… even for pairs far below the threshold, so a
    * pipeline that REMOVES documents must verify, exactly like
    * [[prefixFilterPairs]] does natively. Same one-pass build as
    * [[minHashCertificate]]: signatures and sorted hashed shingle sets
    * come out of a single groupBy, bands derive from the signatures, and
    * the verify is a per-row sorted-merge over the (bounded) pair list —
    * the shingle stream never re-shuffles. Output contract matches
    * [[prefixFilterPairs]]: (a_id, b_id, a_n, b_n, inter_n, union_n,
    * jaccard_pct). Recall is LSH's, by collision design (a true pair
    * missed by every band stays missed — that is the path's contract);
    * precision is exact. */
  def minHashLshVerifiedPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccardPct: Int,
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3,
      maxBucketSize: Int = 500
  ): DataFrame = {
    require(minJaccardPct >= 1 && minJaccardPct <= 100, "minJaccardPct must be 1..100")
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sigAggs = minHashCoeffs(numHashes).zipWithIndex.map { case ((a, b), s) =>
      min((col("__h") * a + b) % MinHashP).as(s"sig_$s")
    }
    val perDoc = hashedShingleFrame(df, idCol, textCol, shingleK)
      .groupBy(col(idCol))
      .agg(sigAggs.head, (sigAggs.tail :+ sort_array(collect_set(col("__h"))).as("__set")): _*)
      .localCheckpoint()
    val pairs = pairsFromBands(
      bandsFromSigs(perDoc, idCol, numHashes, bandSize), idCol, maxBucketSize)
    def side(p: String) = perDoc.select(col(idCol).as(s"${p}_$idCol"),
      col("__set").as(s"${p}_ws"), size(col("__set")).cast("long").as(s"${p}_n"))
    pairs
      .join(side("a"), s"a_$idCol").join(side("b"), s"b_$idCol")
      .select(col(s"a_$idCol"), col(s"b_$idCol"), col("a_n"), col("b_n"),
        graft.functions.GraftFunctions.sortedIntersectCount(col("a_ws"), col("b_ws"))
          .as("inter_n"))
      .filter(col("inter_n") * (100 + minJaccardPct) >= (col("a_n") + col("b_n")) * minJaccardPct)
      .withColumn("union_n", col("a_n") + col("b_n") - col("inter_n"))
      .withColumn("jaccard_pct", expr("inter_n * 100 div union_n"))
  }

  /** Driver-side (bands, rowsPerBand) derivation for a Jaccard threshold
    * — the q308 S-curve pick as a pure function, wired into
    * `curate --near-dup-mode auto|lsh` so the banding follows
    * `--near-dup-pct` instead of a fixed default (r16, verdict top item:
    * at low thresholds a fixed 4×2 silently loses candidate RECALL that
    * verify-before-drop cannot restore, because a pair no band emits is
    * never seen). Same ×10⁶ integer fixed point as q308/q360 — each power
    * step is acc·s div 10⁶, so this, the gated query and the DuckDB
    * oracle replay the identical truncation chain: over all (b, r) splits
    * of `numHashes`, pick the one whose collision curve
    * p(s) = 1 − (1 − s^r)^b passes closest to 1/2 AT the threshold
    * (ties → fewer bands, q308's order). p(t) ≥ 1/2 − dev means a
    * true-threshold pair survives banding with at least that probability,
    * and the curve's steepness does the rest above t.
    *
    * Cost model note: b·r = numHashes always — the derived choice never
    * changes the signature width, only how it is sliced, so the CLI's
    * signature build cost is threshold-invariant. */
  def lshParamsForThreshold(minJaccardPct: Int, numHashes: Int = 8): (Int, Int) = {
    require(minJaccardPct >= 1 && minJaccardPct <= 100, "minJaccardPct must be 1..100")
    require(numHashes >= 1 && numHashes <= 512, "numHashes must be 1..512")
    val sFp = minJaccardPct * 10000L
    def foldPow(base: Long, times: Int): Long =
      (1 to times).foldLeft(1000000L)((acc, _) => acc * base / 1000000L)
    val scored = (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      val sr = foldPow(sFp, r)
      val pFp = 1000000L - foldPow(1000000L - sr, b)
      (math.abs(pFp - 500000L), b, r)
    }
    val (_, b, r) = scored.minBy { case (dev, b, _) => (dev, b) }
    (b, r)
  }

  /** Incremental NEAR-dup against a frozen corpus — the MinHash-LSH twin
    * of [[dedupAgainstCorpusBloom]]'s exact check, and the op a crawl
    * pipeline actually runs nightly: band the arriving batch, join its
    * band hashes against the corpus's, emit (batch_id, corpus_id)
    * candidates. The corpus side of the join is its BANDED form —
    * `numBands` short rows per doc that at scale are computed once per
    * corpus epoch and persisted (band_hash-bucketed), so a batch lands as
    * one shuffle of the (tiny) batch bands against a pre-partitioned
    * table. Corpus postings per bucket are capped (smallest ids win,
    * deterministic) exactly like [[minHashLshPairs]]'s bucket cap: an
    * over-common band is boilerplate, not near-dup signal.
    *
    * Returns DISTINCT candidate pairs; callers verify with
    * [[jaccardPairs]]-style exact overlap when the decision is
    * destructive. */
  def nearDupAgainstCorpus(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3,
      maxPostings: Int = 500
  ): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    require(maxPostings >= 1, "maxPostings must be positive")
    import org.apache.spark.sql.expressions.Window
    val corpusBands = sigBands(corpus, idCol, textCol, numHashes, bandSize, shingleK)
      .withColumnRenamed(idCol, "corpus_id")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("band_idx"), col("band_hash")).orderBy(col("corpus_id"))))
      .filter(col("__rn") <= maxPostings)
      .drop("__rn")
    sigBands(batch, idCol, textCol, numHashes, bandSize, shingleK)
      .withColumnRenamed(idCol, "batch_id")
      .join(corpusBands, Seq("band_idx", "band_hash"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
  }

  /** 32-bit SimHash over distinct words. Bit b (MSB-first) comes from hex
    * digit b/4 of md5(word); the document bit is the majority vote across
    * words (ties → 1). Computed via explode + 32 integer sums in one
    * aggregation — fully codegen'd, one shuffle on the id. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Deliberately NOT Par.ensureParallel'd: A/B at sf0.1 measured the
    // round-robin exchange a consistent +0.5 s on q231 — simHash's per-row
    // stage (space-split + per-word md5) is light enough that the scan
    // task finishes before the shuffle pays for itself.
    // the 8 hex digits are projected ONCE per word (r18): aggregate-input
    // expressions are not common-subexpression-eliminated across the 32
    // sums, so the substring+conv pair previously re-ran 4x per digit
    val words = df.select(
      col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("__w"))
      .withColumn("__h", md5(col("__w")))
    val digits = words.select(
      col(idCol) +: (0 until 8).map(j =>
        expr(s"cast(conv(substring(__h, ${j + 1}, 1), 16, 10) as int)").as(s"__d$j")): _*)
    val bitCols = (0 until 32).map { b =>
      val j = b / 4 // hex digit index
      val k = 3 - (b % 4) // bit within digit, msb first
      sum((col(s"__d$j").divide(lit(1 << k)).cast("int") % 2)).as(s"__b$b")
    }
    val agged = digits
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), bitCols: _*)
    val simhash = (0 until 32)
      .map { b => when(col(s"__b$b") * 2 >= col("__n"), lit(1L << (31 - b))).otherwise(lit(0L)) }
      .reduce(_ + _)
    agged.select(col(idCol), simhash.as("simhash"))
  }

  /** 64-bit SimHash over distinct words — the banding-grade fingerprint
    * [[simHashPairs]] joins on. Bit b (MSB-first) comes from bit (3−b%4)
    * of hex digit b/4 of md5(word) — the same digit algebra as the 32-bit
    * [[simHash]], extended across all 16 leading hex digits; the document
    * bit is the majority vote across words (ties → 1). 64 integer sums in
    * one aggregation — fully codegen'd, one shuffle on the id. 32 bits is
    * plenty for per-block QUALITY grading (q33/q231); candidate
    * GENERATION needs the wider hash so the band keyspace doesn't
    * saturate (see [[simHashPairs]]). */
  def simHash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // 16 hex digits projected once per word (r18) — see [[simHash]]
    val words = df.select(
      col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("__w"))
      .withColumn("__h", md5(col("__w")))
    val digits = words.select(
      col(idCol) +: (0 until 16).map(j =>
        expr(s"cast(conv(substring(__h, ${j + 1}, 1), 16, 10) as int)").as(s"__d$j")): _*)
    val bitCols = (0 until 64).map { b =>
      val j = b / 4 // hex digit index
      val k = 3 - (b % 4) // bit within digit, msb first
      sum((col(s"__d$j").divide(lit(1 << k)).cast("int") % 2)).as(s"__b$b")
    }
    val agged = digits
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), bitCols: _*)
    // bit 0 carries the sign (1L << 63 = Long.MinValue); building the word
    // by addition is exact two's complement since each bit contributes once
    val simhash = (0 until 64)
      .map { b => when(col(s"__b$b") * 2 >= col("__n"), lit(1L << (63 - b))).otherwise(lit(0L)) }
      .reduce(_ + _)
    agged.select(col(idCol), simhash.as("simhash64"))
  }

  /** Banded SimHash near-dup JOIN — the scale path q33/q231 lacked: those
    * emit fingerprints and measure their quality inside externally-chosen
    * blocks, but a 100 TB dedup needs candidate generation from the hash
    * ITSELF. Pigeonhole banding does it: split the 64-bit [[simHash64]]
    * into 4×16-bit bands; two hashes within Hamming distance ≤ 3 differ
    * in at most 3 bands, so AT LEAST ONE band matches — a candidate join
    * on (band_idx, band_key) finds every such pair (the operator refuses
    * larger bounds rather than silently losing pairs). The verify is one
    * codegen'd `bit_count(xor)` per candidate — no arrays move, the
    * cheapest verify of any near-dup path here.
    *
    * Per-bucket postings are capped like [[minHashLshPairs]]'s (an
    * over-common band key is boilerplate/skew, not near-dup signal;
    * smallest ids win, deterministic) — so recall is exact WHEN THE CAP
    * IS NON-BINDING, and the 16-bit keyspace is what keeps a
    * WELL-SPREAD corpus non-binding at scale: 65,536 buckets per band
    * hold ~maxBucketSize·65,536 docs (3.3e7 at the default cap) at even
    * spread before any bucket fills. (An 8-bit band key — 256 buckets —
    * hit that even-spread ceiling at ~1.3e5 docs and silently dropped
    * true pairs exactly on the 100 TB corpora this operator exists for;
    * r15 advice.) No keyspace protects against CONCENTRATION — a
    * boilerplate-skewed corpus can fill one bucket at maxBucketSize+1
    * docs — so the non-binding claim is NEVER assumed:
    * [[simHashCapReport]] measures it (n_foregone_postings = 0 is the
    * certificate), and any destructive use must gate on that report, not
    * on corpus size. Shuffles: the simhash aggregate, one band explode
    * (4 short rows/doc), the banded self-join — all keyed, never
    * cartesian. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "banded recall is exact only for maxHamming <= 3 (4 bands, pigeonhole)")
    require(maxBucketSize >= 2, "maxBucketSize must be at least 2")
    simHashPairsFromBands(simHashBands(df, idCol, textCol), idCol,
      maxHamming, maxBucketSize)
  }

  /** [[simHashPairs]] over pre-computed bands (r18, see
    * [[simHashBandsOf]]). */
  def simHashPairsFromBands(bandsIn: DataFrame, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "banded recall is exact only for maxHamming <= 3 (4 bands, pigeonhole)")
    require(maxBucketSize >= 2, "maxBucketSize must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val bands = bandsIn
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("band_idx"), col("band_key")).orderBy(col(idCol))))
      .filter(col("__rn") <= maxBucketSize)
    val a = bands.select(col(idCol).as(s"a_$idCol"), col("simhash64").as("a_sh"),
      col("band_idx"), col("band_key"))
    val b = bands.select(col(idCol).as(s"b_$idCol"), col("simhash64").as("b_sh"),
      col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        expr("bit_count(a_sh ^ b_sh)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Shared banded frame for [[simHashPairs]] / [[simHashCapReport]]:
    * (id, simhash64, band_idx ∈ 0..3, band_key ∈ 0..65535). */
  private def simHashBands(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simHash64(df, idCol, textCol).localCheckpoint()
      .select(col(idCol), col("simhash64"),
        explode(expr("sequence(0, 3)")).as("band_idx"))
      .withColumn("band_key",
        expr("(simhash64 >> ((3 - band_idx) * 16)) & 65535").cast("int"))

  /** Cap accounting for [[simHashPairs]] — the [[prefixFilterCapReport]]
    * twin: one row pricing what the per-bucket postings cap forgoes.
    * `n_buckets`/`n_postings` give the band-key occupancy (4·n_docs
    * postings over ≤ 262,144 buckets), `n_capped_buckets` the buckets
    * past `maxBucketSize`, and `n_foregone_postings` the postings the cap
    * drops — when it is 0 the pair join's pigeonhole recall is exact, and
    * a destructive pipeline should gate on exactly that. Same shuffles as
    * the join's build (simhash aggregate + one keyed count); no pair is
    * materialized. */
  def simHashCapReport(df: DataFrame, idCol: String, textCol: String,
      maxBucketSize: Int = 500): DataFrame =
    simHashCapReports(df, idCol, textCol, Seq(maxBucketSize))
      .drop("cap")

  /** Multi-cap form of [[simHashCapReport]]: ONE simhash + band-occupancy
    * pass prices every candidate cap (a cap-sizing sweep at 100 TB costs
    * one pass, not one per cap); one row per cap with a `cap` column,
    * ordered by cap. The occupancy frame is localCheckpoint'd when more
    * than one cap is asked for (r17 advice: simHashBands pins only the
    * simhash aggregate, so without this the band explode and occupancy
    * groupBy re-ran once per cap — one shuffle per cap, exactly what the
    * one-pass claim denies). Bounded pin: ≤ 4·65,536 occupancy rows. */
  def simHashCapReports(df: DataFrame, idCol: String, textCol: String,
      caps: Seq[Int]): DataFrame = {
    require(caps.nonEmpty && caps.forall(_ >= 2), "each cap must be at least 2")
    require(caps.distinct.size == caps.size, "caps must be distinct")
    val occ0 = simHashBands(df, idCol, textCol)
      .groupBy("band_idx", "band_key").agg(count(lit(1)).as("__c"))
    val occ = if (caps.size > 1) occ0.localCheckpoint() else occ0
    val perCap = caps.sorted.map { cap =>
      occ.agg(
        count(lit(1)).cast("long").as("n_buckets"),
        sum(col("__c")).cast("long").as("n_postings"),
        sum(when(col("__c") > cap, 1L).otherwise(0L)).as("n_capped_buckets"),
        sum(when(col("__c") > cap, col("__c") - cap).otherwise(0L))
          .cast("long").as("n_foregone_postings"))
        .withColumn("cap", lit(cap.toLong))
    }
    perCap.reduce(_ unionByName _)
  }

  /** Incremental SimHash near-dup against a FROZEN corpus (r17, VERDICT
    * #4) — [[nearDupAgainstCorpus]]'s twin on the [[simHashPairs]] algebra,
    * for the nightly-crawl shape: band the corpus ONCE per epoch (at scale
    * the banded frame is persisted bucket-partitioned on (band_idx,
    * band_key) and reused batch after batch — 4 short rows per corpus
    * doc), band the arriving batch, join batch bands against corpus
    * bands, verify each candidate with one codegen'd `bit_count(xor)`.
    * The Hamming ≤ 3 pigeonhole exactness carries over UNCHANGED: a batch
    * doc within Hamming ≤ 3 of a corpus doc shares at least one of the 4
    * 16-bit bands, so recall is exact while the CORPUS-side postings cap
    * is non-binding — and that is never assumed: [[simHashCapReport]] on
    * the corpus prices it per epoch, exactly as for the self-join. Corpus
    * postings per bucket are capped (smallest ids win, deterministic);
    * the batch side is never capped (a batch is bounded by construction).
    * Output: (batch_id, corpus_id, hamming), distinct. */
  def simHashAgainstCorpus(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, maxHamming: Int = 3, maxPostings: Int = 500): DataFrame =
    simHashAgainstCorpusFromBands(simHashBands(batch, idCol, textCol),
      simHashCorpusIndex(corpus, idCol, textCol, maxPostings), idCol, maxHamming)

  /** [[simHashAgainstCorpus]] over a PRE-BANDED batch and a built corpus
    * index (r18): a pipeline that also needs the batch's self-join pairs
    * (q386's incremental-cluster feed) bands the batch once and feeds
    * both legs. */
  def simHashAgainstCorpusFromBands(batchBands: DataFrame, corpusIndex: DataFrame,
      idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "banded recall is exact only for maxHamming <= 3 (4 bands, pigeonhole)")
    batchBands
      .select(col(idCol).as("batch_id"), col("simhash64").as("__bsh"),
        col("band_idx"), col("band_key"))
      .join(corpusIndex, Seq("band_idx", "band_key"))
      .select(col("batch_id"), col("corpus_id"),
        expr("bit_count(__bsh ^ corpus_simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The banded fingerprint table the simhash family builds internally —
    * exposed (r18) so a pipeline needing several legs over the SAME side
    * (q386: prior pairs + frozen index from the corpus; cross-leg +
    * self-pairs from the batch) computes the simhash aggregate once per
    * side (the aggregate is pinned by the internal checkpoint; the band
    * explode re-derives lazily per leg, 4 short rows/doc). Columns:
    * (idCol, simhash64, band_idx, band_key). */
  def simHashBandsOf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simHashBands(df, idCol, textCol)

  /** The frozen-epoch half of [[simHashAgainstCorpus]], exposed so a
    * pipeline (or the streaming gate) can band the corpus ONCE per epoch,
    * persist the result bucket-partitioned on (band_idx, band_key), and
    * join arriving batches against it all night: (corpus_id,
    * corpus_simhash, band_idx, band_key), 4 short rows per doc, postings
    * per bucket capped at `maxPostings` (smallest ids win, deterministic —
    * price the cap with [[simHashCapReport]] before destructive use). */
  def simHashCorpusIndex(corpus: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 500): DataFrame =
    simHashCorpusIndexFromBands(simHashBands(corpus, idCol, textCol), idCol, maxPostings)

  /** [[simHashCorpusIndex]] over pre-computed bands (r18, see
    * [[simHashBandsOf]]). */
  def simHashCorpusIndexFromBands(bands: DataFrame, idCol: String,
      maxPostings: Int = 500): DataFrame = {
    require(maxPostings >= 1, "maxPostings must be positive")
    import org.apache.spark.sql.expressions.Window
    bands
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("band_idx"), col("band_key")).orderBy(col(idCol))))
      .filter(col("__rn") <= maxPostings)
      .select(col(idCol).as("corpus_id"), col("simhash64").as("corpus_simhash"),
        col("band_idx"), col("band_key"))
  }

  /** Incremental near-dup CLUSTER maintenance — the assignment-table half
    * of the nightly loop [[simHashAgainstCorpus]] / [[nearDupAgainstCorpus]]
    * feed: given the FROZEN epoch's cluster table and only the NEW edges
    * (batch↔corpus flags + batch↔batch pairs), produce the next epoch's
    * full assignment without re-clustering the corpus.
    *
    * Every new edge has a batch endpoint, so prior components can only
    * merge through batch paths — all of which live in the DELTA graph:
    * nodes are batch ids plus the prior CLUSTER LABELS their corpus
    * endpoints map to, edges are the new pairs with corpus ids replaced by
    * their labels. One [[connectedComponents]] over that graph (work ∝ new
    * edges, never corpus size), then: batch docs take their delta
    * component (own id if unpaired — a new singleton), and prior clusters
    * whose label appears in a delta component remap to the component
    * label (one bounded keyed join over the corpus table).
    *
    * Contract: `prior` is a min-id component labeling covering EVERY
    * corpus doc (a [[connectedComponents]] run completed with singleton
    * self-labels), and batch ids are disjoint from corpus ids. Under that
    * contract the output is EXACTLY the from-scratch min-id clustering of
    * corpus ∪ batch — the delta component min is min(batch ids, prior
    * minima) = the merged component's true min. The gate's oracle
    * computes the from-scratch answer independently; the spec pins the
    * equivalence on planted chain-merge fixtures. Output: (idCol,
    * cluster, is_new). */
  def incrementalClusters(prior: DataFrame, idCol: String,
      batchCorpusPairs: DataFrame, batchPairs: DataFrame,
      batchIds: DataFrame, bpACol: String, bpBCol: String): DataFrame = {
    val priorLab = prior.select(col(idCol).cast("long").as("__pid"),
      col("cluster").cast("long").as("__pcl"))
    val bcE = batchCorpusPairs
      .select(col("batch_id").cast("long").as("__a"),
        col("corpus_id").cast("long").as("__pid"))
      .join(priorLab, "__pid")
      .select(col("__a"), col("__pcl").as("__b"))
    val bbE = batchPairs.select(col(bpACol).cast("long").as("__a"),
      col(bpBCol).cast("long").as("__b"))
    val comp = connectedComponents(bcE.unionByName(bbE), "__a", "__b")
      .select(col("id").as("__n"), col("component").as("__c"))
    val batchOut = batchIds.select(col(idCol).cast("long").as("__bid")).distinct()
      .join(comp.withColumnRenamed("__n", "__bid"), Seq("__bid"), "left")
      .select(col("__bid").as(idCol),
        coalesce(col("__c"), col("__bid")).as("cluster"), lit(1L).as("is_new"))
    val remap = comp
      .join(priorLab.select(col("__pcl").as("__n")).distinct(), "__n")
      .select(col("__n").as("__oldcl"), col("__c").as("__newcl"))
    val priorOut = priorLab
      .join(remap, priorLab("__pcl") === remap("__oldcl"), "left")
      .select(col("__pid").as(idCol),
        coalesce(col("__newcl"), col("__pcl")).as("cluster"), lit(0L).as("is_new"))
    priorOut.unionByName(batchOut)
  }

  /** Runtime CONTRACT AUDIT for [[incrementalClusters]]' prior table (r18,
    * VERDICT r17 #2): the from-scratch-equivalence proof requires `prior`
    * to be a MIN-ID labeling — every cluster label is itself a member of
    * its own cluster AND no smaller member id exists — but
    * `neardup-maintain --prior` reads whatever parquet the user points at,
    * and a stale or hand-edited table silently yields wrong clusters (the
    * one silent-garbage mode the nightly loop had left).
    *
    * ONE aggregate over the prior: per label, member count, min member id
    * and a self-membership flag; a label violates iff it is not a member
    * of its own cluster (`label_not_member` — covers stale labels whose
    * min-id row moved clusters, and null labels) or it is a member but not
    * the minimum (`label_not_min`). Self-membership ⇒ label ≥ min, so the
    * two reasons partition every possible violation and an empty result IS
    * the contract. Coverage (every corpus doc labeled) is the caller's
    * anti-join — it needs the corpus, not the prior alone.
    *
    * Output: (cluster, n_members, min_member, self_member, reason), one
    * row per VIOLATING label; empty = safe to maintain incrementally. */
  def auditPriorLabeling(prior: DataFrame, idCol: String): DataFrame =
    prior
      .select(col(idCol).cast("long").as("__id"),
        col("cluster").cast("long").as("__cl"))
      .groupBy(col("__cl").as("cluster"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        min(col("__id")).as("min_member"),
        max(when(col("__id") === col("__cl"), 1L).otherwise(0L))
          .cast("long").as("self_member"))
      .filter(col("self_member") === 0 || col("cluster") > col("min_member"))
      .withColumn("reason",
        when(col("self_member") === 0, lit("label_not_member"))
          .otherwise(lit("label_not_min")))

  /** Per-source dedup-savings datasheet — what exact dedup actually BUYS,
    * in the unit budgets are written in (tokens): per source, doc and
    * token totals before/after min-id exact dedup and the saved fraction
    * in basis points. q131 reports the dup RATE; this prices it — "feed
    * B contributes 2M docs but only 40k post-dedup tokens" is the row an
    * ingest review acts on.
    *
    * Scale: one (content-hash) aggregate for the keeper ids, one keyed
    * join back (hash-bucketed, group width = duplicate multiplicity),
    * one per-source aggregate. Token counting is map-side at the scan;
    * bodies never shuffle (only the 32-hex key and the count move). */
  def dedupSavings(df: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val base = Par.ensureParallel(df).select(col(idCol), col(srcCol).as("__src"),
      md5(col(textCol)).as("__h"),
      size(expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')")).cast("long").as("__nt"))
    val keepers = base.groupBy("__h").agg(min(col(idCol)).as("__keep"))
    base.join(keepers, "__h")
      .withColumn("__kept", when(col(idCol) === col("__keep"), 1L).otherwise(0L))
      .groupBy(col("__src").as("source"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("__kept")).cast("long").as("n_kept"),
        sum(col("__nt")).cast("long").as("tokens_total"),
        sum(col("__nt") * col("__kept")).cast("long").as("tokens_kept"))
      .withColumn("saved_bp",
        when(col("tokens_total") === 0, 0L)
          .otherwise(expr("(tokens_total - tokens_kept) * 10000 div tokens_total")))
  }

  /** Corpus EPOCH diff — the engine's diff identity applied to the corpus
    * itself (r16 tranche J): what changed between two crawl/curation
    * epochs, one row per source. A nightly pipeline wants this BEFORE
    * retraining decisions: "feed B dropped 40% of its docs and its
    * surviving texts changed" is a stop-the-line signal no per-epoch
    * datasheet row shows. Per source:
    *   - `n_base` / `n_head`: doc counts on each side;
    *   - `added` / `removed`: ids present on one side only;
    *   - `changed` / `unchanged`: shared ids split by md5(text) equality
    *     (the row-hash identity [[graft.engine.DiffEngine]] diffs tables
    *     with, applied to documents);
    *   - `token_delta`: head tokens − base tokens across the source
    *     (signed; new text minus deleted text in the budget's unit).
    *
    * Scale: token counts and content hashes are map-side at each scan;
    * ONE full-outer join keyed on the id (bodies never move — only the
    * 32-hex hash and the counts), one per-source rollup. A doc whose
    * SOURCE differs between epochs counts under the head side's source
    * (head is the epoch being reviewed; base's label is history). */
  def corpusEpochDiff(base: DataFrame, head: DataFrame, idCol: String,
      textCol: String, srcCol: String): DataFrame = {
    // explicit presence literals, NOT hash nullness: md5(NULL) is NULL, so
    // a null-text doc would otherwise read as ABSENT from its epoch
    // (counted added/removed instead of changed; r16 self-review). The
    // hash comparison is null-safe for the same reason: null text on both
    // sides is "unchanged", null-vs-text is "changed".
    def side(df: DataFrame, p: String) = Par.ensureParallel(df).select(
      col(idCol).as("__id"),
      col(srcCol).as(s"${p}_src"),
      lit(1L).as(s"${p}_p"),
      md5(col(textCol)).as(s"${p}_h"),
      coalesce(size(expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')"))
        .cast("long"), lit(0L)).as(s"${p}_nt"))
    side(base, "b").join(side(head, "h"), Seq("__id"), "full_outer")
      .select(coalesce(col("h_src"), col("b_src")).as("source"),
        coalesce(col("b_p"), lit(0L)).as("b_p"),
        coalesce(col("h_p"), lit(0L)).as("h_p"),
        col("b_h"), col("h_h"),
        coalesce(col("b_nt"), lit(0L)).as("b_nt"),
        coalesce(col("h_nt"), lit(0L)).as("h_nt"))
      .groupBy(col("source"))
      .agg(
        sum(col("b_p")).cast("long").as("n_base"),
        sum(col("h_p")).cast("long").as("n_head"),
        sum(when(col("b_p") === 0 && col("h_p") === 1, 1L).otherwise(0L))
          .cast("long").as("added"),
        sum(when(col("b_p") === 1 && col("h_p") === 0, 1L).otherwise(0L))
          .cast("long").as("removed"),
        sum(when(col("b_p") === 1 && col("h_p") === 1 &&
          !(col("b_h") <=> col("h_h")), 1L).otherwise(0L)).cast("long").as("changed"),
        sum(when(col("b_p") === 1 && col("h_p") === 1 &&
          (col("b_h") <=> col("h_h")), 1L).otherwise(0L)).cast("long").as("unchanged"),
        sum(col("h_nt") - col("b_nt")).cast("long").as("token_delta"))
  }

  /** Boundary-overlap pairs — the crawl-pagination stitcher: page 2 of a
    * paginated article begins with the same tokens page 1 ends with, and
    * a curation pipeline wants those re-joined (or the overlap scrubbed)
    * BEFORE dedup sees two half-documents. Emits (a, b, boundary) where
    * a's last `k` tokens equal b's first `k` exactly — the join key IS
    * the k-token string, so there is no hash-collision caveat to verify
    * away.
    *
    * Scale: one token pass per doc (head/tail slices only — the body is
    * never carried), one keyed join on the boundary string. Boilerplate
    * boundaries (site headers shared by thousands of pages) would make a
    * hot key quadratic, so each side's postings per boundary are capped
    * (smallest ids win, deterministic) — the q318/q334 rule: the cap is
    * a contract, sized so genuine pagination (a handful of pages per
    * boundary) never hits it while header boilerplate does. */
  def boundaryOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, maxBucket: Int = 100): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxBucket >= 1, "maxBucket must be positive")
    import org.apache.spark.sql.expressions.Window
    // checkpointed: heads and tails both read it — without this the
    // corpus would scan + re-tokenize twice (r15b review finding), and
    // only the two k-token slices are materialized, never the body
    val base = Par.ensureParallel(df)
      .select(col(idCol),
        expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')").as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(idCol),
        array_join(slice(col("__w"), 1, k), " ").as("__head"),
        array_join(slice(col("__w"), -k, k), " ").as("__tail"))
      .localCheckpoint()
    val heads = base
      .select(col(idCol).as("b_id"), col("__head").as("boundary"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("boundary").orderBy(col("b_id"))))
      .filter(col("__rn") <= maxBucket).drop("__rn")
    val tails = base
      .select(col(idCol).as("a_id"), col("__tail").as("boundary"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("boundary").orderBy(col("a_id"))))
      .filter(col("__rn") <= maxBucket).drop("__rn")
    tails.join(heads, "boundary")
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("boundary"))
  }

  /** N-gram (word-set) Jaccard near-dup pairs within blocks.
    * Blocking keys bound candidate pairs; the verify step computes exact
    * |A∩B| / |A∪B| on distinct-word arrays. Integer outputs (inter/union
    * sizes) keep results engine-exact.
    *
    * Pruning before the expensive intersect:
    *   - size-compatibility in the JOIN condition — J ≤ min(|A|,|B|)/max, so
    *     pairs failing `min·100 ≥ max·pct` can't reach the threshold and are
    *     cut before any array work;
    *   - |A∪B| = |A|+|B|−|A∩B| (sets are distinct) — no array_union pass;
    *   - threshold test in pure integers: I/(|A|+|B|−I) ≥ t ⇔
    *     I·(100+pct) ≥ (|A|+|B|)·pct. */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockExprs: Seq[Column],
      minJaccardPct: Int,
      maxBlockSize: Int = Int.MaxValue
  ): DataFrame = {
    val withBlock0 = Par.ensureParallel(df).select(
      col(idCol),
      sort_array(array_distinct(split(col(textCol), " "))).as("__ws"),
      struct(blockExprs: _*).as("__blk"))
      .withColumn("__n", size(col("__ws")).cast("long"))
    // same cap discipline as LSH bands/prefix blocks: an over-common block
    // (all docs same lang+length on a skewed corpus) would go O(n²); drop it
    val withBlock =
      if (maxBlockSize == Int.MaxValue) withBlock0
      else {
        import org.apache.spark.sql.expressions.Window
        withBlock0
          .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__blk"))))
          .filter(col("__bn") <= maxBlockSize)
          .drop("__bn")
      }
    val a = withBlock.toDF(s"a_$idCol", "a_ws", "__blk", "a_n")
    val b = withBlock.toDF(s"b_$idCol", "b_ws", "__blk", "b_n")
    graft.functions.GraftFunctions.register(df.sparkSession)
    a.join(b, Seq("__blk"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol") &&
        least(col("a_n"), col("b_n")) * 100 >= greatest(col("a_n"), col("b_n")) * minJaccardPct)
      .select(
        col(s"a_$idCol"), col(s"b_$idCol"), col("a_n"), col("b_n"),
        // arrays are sorted+distinct: native merge-count, no per-row hash set
        graft.functions.GraftFunctions.sortedIntersectCount(col("a_ws"), col("b_ws"))
          .as("inter_n"))
      .filter(col("inter_n") * (100 + minJaccardPct) >= (col("a_n") + col("b_n")) * minJaccardPct)
      .select(col(s"a_$idCol"), col(s"b_$idCol"), col("inter_n"),
        (col("a_n") + col("b_n") - col("inter_n")).as("union_n"))
  }

  /** Prefix-filtering set-similarity join — PPJoin's candidate generation,
    * the EXACT-threshold complement to MinHash-LSH: tokens order globally
    * rare-first (document frequency asc, token asc — fully deterministic),
    * and two documents can reach Jaccard ≥ t only if they share a token
    * within their first `n − ⌈t·n⌉ + 1` tokens in that order (the prefix
    * lemma). Candidates come from an equi-join on PREFIX tokens only —
    * rare-first ordering makes those the lowest-fanout tokens in the
    * corpus, and a `maxBucket` cap (smallest doc ids win, the house
    * bucket discipline) bounds any residual hot token. Verify is the
    * exact sorted-merge intersect on hashed token arrays — no estimate
    * anywhere in the path, so unlike LSH the PREFIX INDEX cannot miss a
    * qualifying pair; only the explicit cap can. RECALL CONDITION: a
    * qualifying pair is missed iff its FIRST shared prefix token (in the
    * global rare-first order — the witness the position filter always
    * admits) is cap-dropped for one of the two docs, and every later
    * shared token is cap-dropped too or fails the positional bound.
    * With a non-binding cap (q334 certifies zero truncation for the
    * shipped config) recall is exactly 100%. Overflowing prefix tokens
    * are the corpus's most common shingles under rare-first ordering,
    * so exposure is measurable, and
    * [[prefixFilterCapReport]] quantifies it from the SAME postings
    * build (truncated-token + foregone-posting counts; q334 gates it,
    * OperatorsSpec proves a cap-induced miss is counted, never silent).
    * Shuffles: token df, per-doc rank window, prefix self-join, two
    * array joins — all keyed, no cartesian. */
  def prefixFilterPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int, maxBucket: Int = 500, shingleWords: Int = 1): DataFrame = {
    require(maxBucket >= 1, "maxBucket must be positive")
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(df.sparkSession)
    val (sets, prefix, _) = prefixPostings(df, idCol, textCol, minJaccardPct, shingleWords)
    val capped = prefix.withColumn("__brn", row_number().over(
        Window.partitionBy("__tok").orderBy(col("__doc"))))
      .filter(col("__brn") <= maxBucket)
      .select(col("__tok"), col("__doc"), col("__n"), col("__rn"))
    // the PP in PPJoin (Xiao et al.): a shared prefix token at global
    // ranks (rn_a, rn_b) can witness J ≥ t only if the tokens at or after
    // those ranks could still supply the required overlap —
    // 1 + min(n_a−rn_a, n_b−rn_b) ≥ ⌈t(n_a+n_b)/(1+t)⌉ (integer form:
    // ×(100+pct) both sides). With an UNCAPPED (or non-binding) bucket
    // the filter is sound — the first shared token of any qualifying
    // pair passes it; when the cap binds, cap and position filter can
    // interact (the surviving witness may be position-pruned), so the
    // q257 oracle applies the IDENTICAL length+position bounds to its
    // candidates — parity is formula-level, not
    // superset-plus-exact-verify (r13 review finding).
    // On dense corpora it prunes late-rank (common-token) witnesses;
    // note it cannot bound a corpus whose TRUE t-similar pair count is
    // itself quadratic (measured on the 100× rehearsal set: tag-degraded
    // trigrams made ~all same-replica pairs genuine candidates — see
    // ScaleRehearsal.Flagships for why this query is not rehearsed).
    val a = capped.toDF("__tok", "a", "a_n", "a_rn")
    val b = capped.toDF("__tok", "b", "b_n", "b_rn")
    val cands = a.join(b, "__tok")
      .filter(col("a") < col("b"))
      .filter(least(col("a_n"), col("b_n")) * 100 >=
        greatest(col("a_n"), col("b_n")) * minJaccardPct)
      .filter((lit(1L) + least(col("a_n") - col("a_rn"), col("b_n") - col("b_rn"))) *
        (100 + minJaccardPct) >= (col("a_n") + col("b_n")) * minJaccardPct)
      .select("a", "b").distinct()
    // verify on the SAME sorted hashed arrays candidate generation used —
    // the sets are already distinct 57-bit ints, sorted at creation
    val arrs = sets.select(col("__doc"), col("__ts").as("__ws"), col("__n").as("__wn"))
    cands
      .join(arrs.select(col("__doc").as("a"), col("__ws").as("a_ws"), col("__wn").as("a_n")), "a")
      .join(arrs.select(col("__doc").as("b"), col("__ws").as("b_ws"), col("__wn").as("b_n")), "b")
      .filter(least(col("a_n"), col("b_n")) * 100 >= greatest(col("a_n"), col("b_n")) * minJaccardPct)
      .select(col("a").as(s"a_$idCol"), col("b").as(s"b_$idCol"), col("a_n"), col("b_n"),
        graft.functions.GraftFunctions.sortedIntersectCount(col("a_ws"), col("b_ws"))
          .as("inter_n"))
      .filter(col("inter_n") * (100 + minJaccardPct) >= (col("a_n") + col("b_n")) * minJaccardPct)
      .withColumn("union_n", col("a_n") + col("b_n") - col("inter_n"))
      .withColumn("jaccard_pct", expr("inter_n * 100 div union_n"))
  }

  /** Shared postings build for [[prefixFilterPairs]],
    * [[prefixFilterCapReport]] and [[similarityJoinAdvisor]]:
    * (token sets, UNCAPPED prefix postings, global token df).
    *
    * `shingleWords` > 1 joins on word n-gram sets — unigram Jaccard
    * saturates on small-vocabulary corpora (everything resembles
    * everything, the output itself goes quadratic); shingles restore a
    * sparse similarity space, exactly why the MinHash path shingles too.
    * __w is MATERIALIZED before the shingle transform (the documented
    * HOF trap: an inlined split would re-run per element), and the token
    * sets are checkpointed so candidate generation and verify share ONE
    * tokenize pass. */
  private def prefixPostings(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int, shingleWords: Int): (DataFrame, DataFrame, DataFrame) = {
    require(minJaccardPct >= 1 && minJaccardPct <= 100, "minJaccardPct must be 1..100")
    require(shingleWords >= 1, "shingleWords must be positive")
    import org.apache.spark.sql.expressions.Window
    val words = Par.ensureParallel(df).select(col(idCol).as("__doc"),
      expr(s"filter(split($textCol, ' '), x -> x != '')").as("__w"))
    // Shingles hash to 57-bit ints AT SET CREATION (base-31 code-point
    // polynomial mod 2^57−13 — the q318/cdc family fold, identical in
    // DuckDB): the exploded postings, the df aggregate, the rank window
    // and the prefix self-join all move 8-byte longs instead of ~30-char
    // strings, and the verify stage reuses the SAME sorted array — no
    // second tokenize+md5 pass. r13: the string form measured 381 s at
    // 100× (205× per 100× rows — postings spilled in the window/join
    // stages); the hashed form is the one that scales. Prefix-lemma
    // completeness holds for ANY consistent global token order, so
    // ranking by (df, hash) instead of (df, string) changes candidates
    // only through the cap; collisions (~n²/2^58 per doc) affect both
    // engines identically.
    val fold = "aggregate(split(%s, ''), 0L, " +
      "(a, c) -> (a * 31 + ascii(c)) %% 144115188075855859L)"
    val setCol =
      if (shingleWords <= 1)
        expr(s"sort_array(array_distinct(transform(__w, t -> ${fold.format("t")})))")
      else expr(
        s"""CASE WHEN size(__w) >= $shingleWords
           |  THEN sort_array(array_distinct(transform(sequence(0, size(__w) - $shingleWords),
           |    i -> ${fold.format(s"array_join(slice(__w, i + 1, $shingleWords), ' ')")})))
           |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
    val sets = words.select(col("__doc"), setCol.as("__ts"))
      .withColumn("__n", size(col("__ts")).cast("long"))
      .localCheckpoint()
    // per-doc set size rides the explode — no count() window pass
    val toks = sets.select(col("__doc"), col("__n"), explode(col("__ts")).as("__tok"))
    val dfreq = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val ranked = toks.join(dfreq, "__tok")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__doc").orderBy(col("__df"), col("__tok"))))
    val prefix = ranked.filter(
      col("__rn") <= col("__n") - expr(s"(__n * $minJaccardPct + 99) div 100") + 1)
    (sets, prefix, dfreq)
  }

  /** The accounting [[prefixFilterPairs]]' `maxBucket` cap owes: one row —
    * (n_prefix_tokens, n_prefix_postings, n_truncated_tokens,
    * n_foregone_postings) — over the SAME uncapped postings the join
    * builds. `n_truncated_tokens` counts prefix tokens whose bucket
    * overflows `maxBucket`; `n_foregone_postings` sums the postings the
    * cap drops (each a doc the candidate join will never pair through
    * that token). Zero truncation ⇒ the join is provably complete at the
    * threshold; non-zero bounds the exposure (a truncated first witness
    * can also strand a pair on position-pruned later witnesses — the
    * full recall condition is on [[prefixFilterPairs]], and every miss
    * path starts with a posting counted here). The q318 skipped-block pattern:
    * a cap is a contract, so it reports what it declined, never silently.
    * Scale: the postings build's keyed shuffles plus one global agg row. */
  def prefixFilterCapReport(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int, maxBucket: Int = 500, shingleWords: Int = 1): DataFrame = {
    require(maxBucket >= 1, "maxBucket must be positive")
    val (_, prefix, _) = prefixPostings(df, idCol, textCol, minJaccardPct, shingleWords)
    prefix.groupBy("__tok").agg(count(lit(1)).as("__c"))
      .agg(
        count(lit(1)).cast("long").as("n_prefix_tokens"),
        sum(col("__c")).cast("long").as("n_prefix_postings"),
        sum(when(col("__c") > maxBucket, 1L).otherwise(0L)).as("n_truncated_tokens"),
        sum(when(col("__c") > maxBucket, col("__c") - maxBucket).otherwise(0L))
          .cast("long").as("n_foregone_postings"))
  }

  /** Routes a planned similarity self-join BEFORE it runs — the missing
    * guard rail in front of [[prefixFilterPairs]]: on a low-diversity
    * corpus the TRUE t-similar pair count is itself quadratic (the r13
    * probe measured 548M genuine candidates on tag-degraded trigrams —
    * PPJoin's position filter pruned nothing and the exact join ran
    * 618 s/OOM at 100×), so at 100 TB the launch decision must be made
    * from a stats pass, not discovered from a dead executor. One
    * postings-stats pass over the SAME uncapped build the join would run
    * (shared [[prefixPostings]]) emits one row:
    *
    *   - `n_docs`, `n_distinct_tokens`, `max_df` — corpus shape;
    *   - `pred_pairs_index` — Σ df·(df−1)/2 over ALL tokens: the
    *     candidate mass of a plain inverted-index join (no prefix
    *     filter), the naive-plan cost;
    *   - `n_prefix_tokens`, `n_prefix_postings`, `max_prefix_df`,
    *     `pred_pairs_prefix` — the same mass over the PREFIX postings:
    *     exactly the pairs [[prefixFilterPairs]]' candidate self-join
    *     will generate (before the length/position filters, which cannot
    *     save a corpus whose genuine matches are quadratic);
    *   - `pair_budget` = n_docs × maxPairsPerDoc and the `verdict`:
    *     'prefix_filter' when the predicted mass fits the budget,
    *     'minhash_lsh' otherwise (LSH's banded candidates are bounded by
    *     collision design, not corpus diversity — the safe path).
    *
    * Integer algebra end to end, DuckDB-replayable (q342). Per-token df
    * is CLAMPED at 3e9 before squaring: below the clamp the mass is
    * exact (3e9·(3e9−1) < 2^63, no ANSI overflow); a token past the
    * clamp already contributes ~4.5e18 pairs, orders of magnitude over
    * any realistic budget, so the ROUTING decision is invariant under
    * the clamp — the advisor refuses to under-report, never wraps. The
    * mass totals are summed as DECIMAL(38,0) and published as strings
    * (1e12 distinct shingles × 4.5e18 ≈ 1e30 still fits), because the
    * one place this operator must not fail is on the corpus that needs
    * the LSH verdict.
    *
    * Scale: the postings build's keyed shuffles (the same ones the join
    * itself would pay) plus three one-row aggregates cross-joined — the
    * advisor costs one stats pass and saves a quadratic join. */
  def similarityJoinAdvisor(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int, maxPairsPerDoc: Long = 100L,
      shingleWords: Int = 1): DataFrame = {
    require(maxPairsPerDoc >= 1 && maxPairsPerDoc <= 1000000L,
      "maxPairsPerDoc must be in 1..1e6 (the budget must fit a long at any corpus size)")
    val (sets, prefix, dfreq) = prefixPostings(df, idCol, textCol, minJaccardPct, shingleWords)
    def mass(c: String) =
      s"sum(CAST(least($c, 3000000000L) * (least($c, 3000000000L) - 1) div 2 AS DECIMAL(38,0)))"
    val docsAgg = sets.agg(count(lit(1)).cast("long").as("n_docs"))
    val idxAgg = dfreq.agg(
      count(lit(1)).cast("long").as("n_distinct_tokens"),
      coalesce(max(col("__df")), lit(0L)).cast("long").as("max_df"),
      coalesce(expr(mass("__df")), lit(0).cast("decimal(38,0)")).as("__ppi"))
    val preAgg = prefix.groupBy("__tok").agg(count(lit(1)).as("__c"))
      .agg(
        count(lit(1)).cast("long").as("n_prefix_tokens"),
        coalesce(sum(col("__c")), lit(0L)).cast("long").as("n_prefix_postings"),
        coalesce(max(col("__c")), lit(0L)).cast("long").as("max_prefix_df"),
        coalesce(expr(mass("__c")), lit(0).cast("decimal(38,0)")).as("__ppp"))
    docsAgg.crossJoin(broadcast(idxAgg)).crossJoin(broadcast(preAgg))
      .withColumn("pair_budget", col("n_docs") * lit(maxPairsPerDoc))
      .select(col("n_docs"), col("n_distinct_tokens"), col("max_df"),
        col("__ppi").cast("string").as("pred_pairs_index"),
        col("n_prefix_tokens"), col("n_prefix_postings"), col("max_prefix_df"),
        col("__ppp").cast("string").as("pred_pairs_prefix"),
        col("pair_budget"),
        when(col("__ppp") <= col("pair_budget"), lit("prefix_filter"))
          .otherwise(lit("minhash_lsh")).as("verdict"))
  }

  /** The accounting [[minHashLshPairs]]' `maxBucketSize` cap owes — the
    * LSH-side twin of [[prefixFilterCapReport]], and the second half of
    * the routing story [[similarityJoinAdvisor]] starts: the advisor
    * predicts the EXACT join's candidate mass; this one row prices the
    * LSH alternative from the same corpus — per (band, band_hash) bucket
    * of size sz, the in-bucket emission is C(sz, 2), and
    * [[minHashLshPairs]] DROPS buckets above the cap entirely
    * (`between(2, maxBucketSize)`), so:
    *   - `n_buckets` / `n_pair_buckets` — occupancy shape;
    *   - `pred_pairs_emitted` — Σ C(sz,2) over surviving buckets: the
    *     join work LSH will actually do (an upper bound on distinct
    *     pairs — multi-band duplicates collapse later);
    *   - `n_capped_buckets` / `pairs_skipped_capped` — what the cap
    *     declined, the recall exposure (a real pair is missed only if
    *     EVERY band it collides in overflowed — each such collision is
    *     a posting counted here). The q318/q334 rule: a cap is a
    *     contract, so it reports what it dropped, never silently.
    * Same 3e9 clamp + DECIMAL(38,0)-sum + string-publish discipline as
    * the advisor (the corpus that needs this report is the one whose
    * masses overflow). Scale: the signature build's doc-keyed aggregate
    * plus one bucket-keyed count — no pair is ever materialized. */
  def lshCandidateMass(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, shingleK: Int = 3,
      maxBucketSize: Int = 500): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    require(maxBucketSize >= 2, "maxBucketSize must be at least 2")
    val sizes = sigBands(df, idCol, textCol, numHashes, bandSize, shingleK)
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__sz"))
    val mass =
      "CAST(least(__sz, 3000000000L) * (least(__sz, 3000000000L) - 1) div 2 AS DECIMAL(38,0))"
    val zero = lit(0).cast("decimal(38,0)")
    sizes.agg(
        count(lit(1)).cast("long").as("n_buckets"),
        coalesce(sum(when(col("__sz").between(2, maxBucketSize), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_pair_buckets"),
        coalesce(sum(when(col("__sz") > maxBucketSize, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_capped_buckets"),
        coalesce(sum(when(col("__sz").between(2, maxBucketSize), expr(mass)).otherwise(zero)), zero)
          .as("__em"),
        coalesce(sum(when(col("__sz") > maxBucketSize, expr(mass)).otherwise(zero)), zero)
          .as("__sk"))
      .select(col("n_buckets"), col("n_pair_buckets"), col("n_capped_buckets"),
        col("__em").cast("string").as("pred_pairs_emitted"),
        col("__sk").cast("string").as("pairs_skipped_capped"))
  }

  /** Cross-source exact-duplication matrix — the datasheet axis q131's
    * per-source dup rate can't see: how much of feed A's content is ALSO
    * in feed B. Per unordered source pair: the number of distinct texts
    * present in both, the cross-source doc-pair mass (Σ cnt_A·cnt_B over
    * shared hashes — the rows an exact cross-dedup would reconcile), and
    * each side's shared doc counts. A licensing/provenance review and an
    * ingest-rationalization pass ("feed B is 80% a mirror of feed A —
    * drop it") both read this table.
    *
    * Scale: one (hash, source) aggregate with map-side combine is the
    * only corpus-sized shuffle; the self-join keys on the content hash,
    * whose bucket width is the number of DISTINCT SOURCES sharing that
    * text (≤ #sources, never the doc count — per-source multiplicity is
    * already collapsed into `cnt`), so the join is linear in distinct
    * (hash, source) rows. The final aggregate groups on source pairs —
    * at most C(#sources, 2) rows. No pair of documents is ever
    * materialized. */
  def crossSourceDupMatrix(df: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val g = df.groupBy(md5(col(textCol)).as("__h"), col(srcCol).as("__src"))
      .agg(count(lit(1)).as("__cnt"))
    val a = g.toDF("__h", "src_a", "__cnt_a")
    val b = g.toDF("__h", "src_b", "__cnt_b")
    a.join(b, "__h")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(
        count(lit(1)).cast("long").as("n_shared_texts"),
        sum(col("__cnt_a") * col("__cnt_b")).cast("long").as("cross_doc_pairs"),
        sum(col("__cnt_a")).cast("long").as("docs_a_shared"),
        sum(col("__cnt_b")).cast("long").as("docs_b_shared"))
  }

  /** Measured MinHash-LSH recall against the exact similarity join — the
    * certificate that closes the routing loop: [[similarityJoinAdvisor]]
    * picks a path on predicted COST (q342), [[prefixFilterCapReport]] /
    * [[lshCandidateMass]] price each path's candidate mass (q334/q345);
    * this measures what the cheap path actually GIVES UP on this corpus.
    * Ground truth is [[prefixFilterPairs]] (exact at a non-binding cap —
    * q334 certifies zero truncation for the shipped config); the measured
    * side is [[minHashLshVerifiedPairs]] at the same threshold and
    * shingle width. Output: both pair counts, the intersection, recall
    * ×1000, and `n_lsh_only` — pairs the LSH path admits that the exact
    * join does not. The two paths hash shingles through different
    * families (57-bit polynomial vs md5-prefix), so boundary pairs CAN
    * disagree in either direction; the certificate reports both sides
    * honestly instead of assuming containment.
    *
    * Scale: both inputs are the operators' own (shuffle-bounded,
    * cap-reported) plans; the comparison adds one full-outer join keyed
    * on the pair ids — linear in emitted pairs, which both caps bound.
    * Run it on a SAMPLE at 100 TB (recall is a corpus-shape property;
    * the q318 census samples the same way) — the exact side is the
    * expensive one, and that is exactly what the advisor's verdict says
    * when it routes away from it. */
  def lshRecallCertificate(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int, numHashes: Int = 8, bandSize: Int = 2,
      shingleK: Int = 3, maxBucket: Int = 500): DataFrame = {
    val exact = prefixFilterPairs(df, idCol, textCol, minJaccardPct,
        maxBucket, shingleWords = shingleK)
      .select(col(s"a_$idCol"), col(s"b_$idCol"), lit(1L).as("__e"))
    val lsh = minHashLshVerifiedPairs(df, idCol, textCol, minJaccardPct,
        numHashes, bandSize, shingleK, maxBucket)
      .select(col(s"a_$idCol"), col(s"b_$idCol"), lit(1L).as("__l"))
    exact.join(lsh, Seq(s"a_$idCol", s"b_$idCol"), "full_outer")
      .agg(
        coalesce(sum(col("__e")), lit(0L)).cast("long").as("n_exact_pairs"),
        coalesce(sum(col("__l")), lit(0L)).cast("long").as("n_lsh_pairs"),
        coalesce(sum(col("__e") * col("__l")), lit(0L)).cast("long").as("n_common"))
      .withColumn("n_lsh_only", col("n_lsh_pairs") - col("n_common"))
      // div guard: an exact-pair-free corpus yields recall 1000 by
      // convention (nothing to recall), not a division by zero
      .withColumn("recall_x1000",
        when(col("n_exact_pairs") === 0, 1000L)
          .otherwise(expr("n_common * 1000 div n_exact_pairs")))
  }

  /** [[jaccardPairs]] over HASHED token sets: each distinct token folds to a
    * 32-bit integer via its md5 prefix (the engine-portable
    * `('0x'||substr(md5(t),1,8))::BIGINT` fold the MinHash path already
    * uses), so the candidate-verify merge compares 8-byte ints instead of
    * variable-length strings — same one-block-shuffle plan, several× less
    * CPU per pair on the verify hot path, and the shuffled token arrays
    * shrink to 8 bytes/element. Exactly reproducible cross-engine (the
    * oracle computes identical hashes); equals token-set Jaccard up to
    * 32-bit collisions (~n²/2³³ per document — negligible at ~10²-token
    * docs, and collisions affect both engines identically). */
  def jaccardPairsHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockExprs: Seq[Column],
      minJaccardPct: Int
  ): DataFrame = {
    val hashedTokens = expr(
      s"""sort_array(array_distinct(transform(split($textCol, ' '),
         |  t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))))""".stripMargin)
    val withBlock = Par.ensureParallel(df).select(
      col(idCol),
      hashedTokens.as("__ws"),
      struct(blockExprs: _*).as("__blk"))
      .withColumn("__n", size(col("__ws")).cast("long"))
    val a = withBlock.toDF(s"a_$idCol", "a_ws", "__blk", "a_n")
    val b = withBlock.toDF(s"b_$idCol", "b_ws", "__blk", "b_n")
    graft.functions.GraftFunctions.register(df.sparkSession)
    a.join(b, Seq("__blk"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol") &&
        least(col("a_n"), col("b_n")) * 100 >= greatest(col("a_n"), col("b_n")) * minJaccardPct)
      .select(
        col(s"a_$idCol"), col(s"b_$idCol"), col("a_n"), col("b_n"),
        graft.functions.GraftFunctions.sortedIntersectCount(col("a_ws"), col("b_ws"))
          .as("inter_n"))
      .filter(col("inter_n") * (100 + minJaccardPct) >= (col("a_n") + col("b_n")) * minJaccardPct)
      .select(col(s"a_$idCol"), col(s"b_$idCol"), col("inter_n"),
        (col("a_n") + col("b_n") - col("inter_n")).as("union_n"))
  }

  /** Bloom-join pruning CERTIFICATE with an engine-exact Bloom: the bit
    * array is represented as the distinct SET of bit positions lit by the
    * build keys (position i of key = md5-fold of `key:i` mod `mBits`), and
    * a probe passes iff all `kHashes` of its positions are lit — exactly a
    * Bloom filter, but every number is replayable in plain SQL, unlike an
    * opaque bitset whose false positives can't be oracle-checked. Reports
    * how many probe rows a runtime Bloom filter would admit vs the exact
    * semi-join truth — the measurement behind sizing Spark's runtime
    * row-group/bloom pruning (`fpr_bp` = false positives per 10k true
    * negatives).
    *
    * Plan shape: build positions aggregate to ≤ mBits rows (broadcast);
    * the probe side explodes to kHashes rows per probe, one broadcast-hash
    * join, no shuffle of the probe table itself.
    *
    * Certifying SEVERAL sizes (q224) deliberately runs this whole pass
    * once per size rather than sharing the size-independent md5 fold: two
    * shared-fold shapes were A/B-measured and rejected (r12) — per-key
    * row-count reweighting (adds a probe shuffle + a non-broadcast join,
    * 2.9→4.4 s) and a map<size,pass> pivot (collect_list + map-typed
    * broadcast, 2.9→5.9 s). The ~kHashes·|keys| md5 calls saved are worth
    * less than ANY extra exchange over the probe side; the all-broadcast
    * probe-stays-map-side shape is the measured optimum. */
  def bloomJoinPruneStats(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      mBits: Int,
      kHashes: Int
  ): DataFrame = {
    require(mBits > 0 && kHashes > 0, "mBits and kHashes must be positive")
    def positions(df: DataFrame, key: String) = df
      .select(col(key).cast("string").as("__k"))
      .select(col("__k"), explode(expr(
        s"""transform(sequence(0, ${kHashes - 1}),
           |  i -> CAST(conv(substring(md5(concat(__k, ':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % $mBits)""".stripMargin))
        .as("__pos"))
    val lit_ = positions(build, buildKey).select("__pos").distinct()
    val buildKeys = build.select(col(buildKey).cast("string").as("__bk")).distinct()
    // membership is per key VALUE: hash the distinct probe keys once, then
    // join the verdict back to probe ROWS (the runtime-filter shape)
    val probeKeys = probe.select(col(probeKey).cast("string").as("__k"))
    val perKey = positions(probeKeys.distinct(), "__k")
      .join(broadcast(lit_.withColumnRenamed("__pos", "__lp")),
        col("__pos") === col("__lp"), "left")
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), count(col("__lp")).as("__hit"))
      .select(col("__k"), (col("__hit") === col("__n")).as("__pass"))
    val truth = buildKeys
    probeKeys
      .join(broadcast(perKey), Seq("__k"), "left")
      .join(broadcast(truth), col("__k") === col("__bk"), "left")
      .agg(
        count(lit(1)).as("n_probe_rows"),
        sum(when(col("__pass"), 1L).otherwise(0L)).as("bloom_pass"),
        sum(when(col("__bk").isNotNull, 1L).otherwise(0L)).as("true_matches"))
      .select(
        col("n_probe_rows"),
        lit(mBits.toLong).as("m_bits"), lit(kHashes.toLong).as("k_hashes"),
        col("bloom_pass"), col("true_matches"),
        (col("bloom_pass") - col("true_matches")).as("false_pos"),
        expr("(bloom_pass - true_matches) * 10000 div greatest(n_probe_rows - true_matches, 1)")
          .as("fpr_bp"))
  }

  /** ASYMMETRIC containment against a small probe set: for each (probe,
    * doc) pair, |probe ∩ doc| / |probe| — excerpt/quotation detection,
    * where symmetric Jaccard fails by construction (a 10-token quote inside
    * a 1000-token article has Jaccard ≈ 1% but containment 100%).
    *
    * The probe side must be SMALL (eval snippets, canary strings, known
    * quotes): it broadcasts, so the corpus never shuffles — the pair space
    * is |corpus|·|probes| scanned map-side, never materialized. Probes with
    * fewer than `minProbeTokens` tokens are dropped (a tiny probe set makes
    * containment vacuous — an empty probe is contained in everything).
    * Both token arrays must be sorted+distinct (the sorted-merge intersect
    * contract shared with [[jaccardPairs]]). */
  def containmentPairs(
      corpus: DataFrame,
      idCol: String,
      tokensCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTokensCol: String,
      minContainPct: Int,
      minProbeTokens: Int = 5
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val p = probes
      .select(col(probeIdCol), col(probeTokensCol),
        size(col(probeTokensCol)).cast("long").as("probe_n"))
      .filter(col("probe_n") >= minProbeTokens)
    Par.ensureParallel(corpus).select(col(idCol), col(tokensCol))
      .crossJoin(broadcast(p))
      .select(col(probeIdCol), col(idCol),
        graft.functions.GraftFunctions
          .sortedIntersectCount(col(probeTokensCol), col(tokensCol))
          .as("inter_n"),
        col("probe_n"))
      .filter(col("inter_n") * 100 >= col("probe_n") * minContainPct)
  }

  /** Embedding-cosine near-dup pairs: LSH-bucket blocking then exact
    * cosine ≥ threshold within buckets — the embedding-space member of the
    * near-dup family. Pair count is bounded by bucket populations
    * (~n²/2^bits for balanced buckets), never all-pairs. Default bucketing is
    * the seeded random-hyperplane form ([[Similarity.hyperplaneBucket]],
    * balanced under biased dims — use bits ≥ 12 at corpus scale);
    * `axisAligned=true` selects the oracle-replicable axis-sign form. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      minCosineX100: Int,
      axisAligned: Boolean = false,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val bucket =
      if (axisAligned) Similarity.signBucket(vecCol, bits)
      else Similarity.hyperplaneBucket(vecCol, bits)
    val bucketed0 = df.select(col(idCol), col(vecCol), bucket.as("__bucket"))
    // degenerate corpora (near-identical vectors) collapse into one bucket
    // regardless of plane quality — cap it like LSH bands so the in-bucket
    // pair join stays bounded (mirrored in the oracle)
    val bucketed = {
      import org.apache.spark.sql.expressions.Window
      bucketed0
        .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__bucket"))))
        .filter(col("__bn") <= maxBucketSize)
        .drop("__bn")
    }
    val a = bucketed.toDF(s"a_$idCol", "a_vec", "__bucket")
    val b = bucketed.toDF(s"b_$idCol", "b_vec", "__bucket")
    a.join(b, Seq("__bucket"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        graft.functions.GraftFunctions.cosineSim(col("a_vec"), col("b_vec"))
          .cast("decimal(16,12)").as("cos_sim"))
      .filter(col("cos_sim") * 100 >= minCosineX100)
  }

  /** Incremental ingest dedup: drop arriving documents whose content
    * already exists in the accumulated corpus — the nightly-batch twin of
    * [[graft.streaming.StreamingDedup.dedupExact]]. A LEFT ANTI join of
    * the batch's content hashes against the corpus's (hash-before-join:
    * 32-hex keys shuffle, never document bodies; with the corpus side
    * pre-bucketed on the hash the exchange is one-sided). Also drops
    * within-batch copies (min-id winner), so output is globally fresh. */
  def dedupAgainstCorpus(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      contentCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seen = corpus.select(md5(col(contentCol)).as("__h")).distinct()
    val fresh = batch.withColumn("__h", md5(col(contentCol)))
      .join(seen, Seq("__h"), "left_anti")
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** Duplicated-span coverage — the exact-substring-dedup SIGNAL: slide a
    * token window of `n` over every document, count each n-gram's distinct-
    * document frequency corpus-wide, and report per document how many of
    * its windows also occur elsewhere. `dup_pct_x100` is the "fraction of
    * the doc covered by text that exists verbatim in another doc" number
    * that suffix-array substring dedup thresholds on; computing it with
    * sliding n-gram hashes instead of a suffix array keeps the plan
    * relational: explode → count → join back, every stage a linear hash
    * shuffle, no global ordering anywhere.
    *
    * The n-grams shuffle as md5 hashes (16 bytes however long the span
    * is), and the count table is filtered to `freq >= 2` BEFORE the join
    * back, so the join's build side holds only actually-duplicated grams —
    * on a mostly-novel corpus that's a small fraction of the gram volume
    * (and a candidate for a broadcast under AQE). Docs shorter than `n`
    * tokens have no windows: reported with `n_grams = 0` and null pct. */
  def duplicatedSpanStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    require(n >= 1, "n must be at least 1")
    // CASE-guard: sequence(0, len-n) with len < n would generate a
    // DESCENDING sequence (Spark defaults step to -1), not an empty one;
    // short docs must instead surface one null gram via explode_outer
    val grams = Par.ensureParallel(df)
      .withColumn("__t", expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')"))
      .select(col(idCol), explode_outer(expr(
        s"""CASE WHEN size(__t) < $n THEN cast(null as array<string>)
           |ELSE transform(sequence(0, size(__t) - $n),
           |  i -> md5(array_join(slice(__t, i + 1, $n), ' '))) END""".stripMargin))
        .as("__gh"))
    val dupGrams = grams.filter(col("__gh").isNotNull)
      .groupBy(col("__gh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__gh"), lit(1).as("__dup"))
    grams.join(dupGrams, Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("__gh").isNotNull, 1L).otherwise(0L)).cast("long").as("n_grams"),
        sum(coalesce(col("__dup"), lit(0))).cast("long").as("dup_grams"))
      .withColumn("dup_pct_x100",
        when(col("n_grams") === 0, lit(null).cast("long"))
          .otherwise(expr("dup_grams * 10000 div n_grams").cast("long")))
  }

  /** Cross-doc duplicated-span SCRUB — the action [[duplicatedSpanStats]]
    * signals: every token covered by any sliding `n`-token window that
    * occurs verbatim in `minDocs`+ distinct documents is cut, and the
    * survivors re-join in order. This is the relational form of exact-
    * substring dedup's "remove the duplicated substring" step: flag
    * duplicated window STARTS (gram-hash count ≥ minDocs), expand each
    * start to its `n` covered token positions (a generate, ≤ n× the
    * flagged starts, then distinct — overlapping windows collapse), and
    * anti-join the doc's (position, token) stream against the covered set.
    * Every stage is a linear hash shuffle on either the gram hash or the
    * doc id; nothing is ever quadratic in corpus size.
    *
    * Docs shorter than `n` tokens have no windows and pass through whole;
    * a fully-covered doc survives with `kept_tokens = 0` and empty text
    * (callers typically drop those rows next). Whitespace is normalized to
    * single spaces by tokenization, like [[removeBoilerplateSpans]]. */
  def scrubDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Long = 2L
  ): DataFrame = {
    require(n >= 1, "n must be at least 1")
    require(minDocs >= 2, "minDocs below 2 would scrub every token")
    val toks = Par.ensureParallel(df)
      .withColumn("__t", expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')"))
      .select(col(idCol), col("__t"), size(col("__t")).cast("long").as("n_tokens"))
    val grams = toks.filter(size(col("__t")) >= n)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(__t) - $n), i -> md5(array_join(slice(__t, i + 1, $n), ' ')))"))
        .as(Seq("i", "gh")))
    val dup = grams.groupBy(col("gh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("gh")
    // covered positions aggregate to ONE array row per affected doc
    // (collect_set dedups overlapping windows in-agg — no separate
    // distinct pass), so the scrub join is doc-level: the corpus's full
    // token stream never shuffles, only flagged positions do — on a
    // mostly-novel corpus that's a tiny fraction of the token volume
    val covered = grams.join(dup, Seq("gh"))
      .select(col(idCol), explode(expr(s"sequence(i, i + ${n - 1})")).as("j"))
      .groupBy(col(idCol))
      .agg(collect_set(col("j")).as("__cov"))
    toks.join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        expr("""filter(transform(__t, (x, i) -> named_struct('x', x, 'i', i)),
               |  s -> __cov IS NULL OR NOT array_contains(__cov, s.i))""".stripMargin).as("__keep"))
      .select(col(idCol), col("n_tokens"),
        size(col("__keep")).cast("long").as("kept_tokens"),
        array_join(expr("transform(__keep, s -> s.x)"), " ").as("clean_text"))
  }

  /** Per-eval-document contamination fraction: the share of an eval doc's
    * sliding `n`-token windows that occur verbatim ANYWHERE in the
    * training corpus — the standard benchmark-decontamination report
    * ([[crossOverlapPairs]] names the offending train docs; this scores
    * each eval doc). The train side collapses to a DISTINCT gram-hash set
    * before the join, so the join's build side is bounded by train's
    * distinct-gram count regardless of duplication, and the eval side —
    * typically thousands of times smaller — drives the output. At corpus
    * scale the distinct train-gram set is the natural thing to persist
    * across eval suites (or fold into a Bloom sketch for a lossy-but-tiny
    * variant à la [[dedupAgainstCorpusBloom]]).
    *
    * Eval docs shorter than `n` tokens report `n_grams = 0` (nothing to
    * match, not evidence of cleanliness). */
  def evalOverlapStats(
      evalDf: DataFrame,
      trainDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    require(n >= 1, "n must be at least 1")
    def gramsOf(d: DataFrame) = Par.ensureParallel(d)
      .withColumn("__t", expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(__t) - $n), i -> md5(array_join(slice(__t, i + 1, $n), ' ')))"))
        .as("gh"))
    val trainGrams = gramsOf(trainDf).select("gh").distinct()
      .withColumn("__hit", lit(1))
    val scored = gramsOf(evalDf)
      .join(trainGrams, Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("hit_grams"))
      .withColumn("contaminated_pct_x100",
        expr("hit_grams * 10000 div n_grams").cast("long"))
    // short eval docs surface with zero grams
    evalDf
      .select(col(idCol),
        size(expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')")).as("__len"))
      .filter(col("__len") < n)
      .select(col(idCol), lit(0L).as("n_grams"), lit(0L).as("hit_grams"),
        lit(0L).as("contaminated_pct_x100"))
      .unionByName(scored)
  }

  /** Bloom-prefiltered incremental ingest dedup — [[dedupAgainstCorpus]]
    * semantics at a fraction of its shuffle. The corpus's content hashes
    * are folded into a Bloom filter (`DataFrameStatFunctions.bloomFilter`:
    * a distributed, MERGEABLE aggregation — each partition builds a local
    * sketch, the driver ORs them), the batch is prefiltered map-side
    * against the broadcast sketch, and only the bloom-POSITIVE rows (true
    * dups + an `fpp` sliver of false positives) reach the exact confirm
    * anti-join. Bloom-negative rows are *definitively* fresh — a Bloom
    * filter has no false negatives — so the typical new-crawl batch where
    * most content is novel skips the join almost entirely.
    *
    * Exactly equal output to [[dedupAgainstCorpus]] (the confirm join
    * removes every false positive), so the q94 oracle doubles as this
    * operator's oracle. Scale: at 100 TB the sketch is built ONCE per
    * corpus epoch and reused across every arriving batch (persist
    * `BloomFilter.writeTo`), amortizing the one corpus scan; per batch the
    * only work is a map-side membership probe plus a join whose left side
    * is ~`dup_rate + fpp` of the batch. ~10 bits/item at fpp=1%: a
    * 10-billion-doc corpus fits a ~12 GiB broadcast, and tighter budgets
    * just raise `fpp` — correctness never depends on it. */
  def dedupAgainstCorpusBloom(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      contentCol: String,
      expectedCorpusItems: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(expectedCorpusItems > 0, "expectedCorpusItems must be positive")
    // upper bound 0.5 keeps the derived numBits >= 1 for any n >= 1
    // (Spark rejects a zero-bit sketch) — and a looser-than-coinflip bloom
    // is pointless anyway
    require(fpp > 0 && fpp <= 0.5, s"fpp must be in (0, 0.5], got $fpp")
    val spark = batch.sparkSession
    val seen = corpus.select(md5(col(contentCol)).as("__h")).distinct()
    val bloom = seen.stat.bloomFilter("__h", expectedCorpusItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val maybeSeen = udf((h: String) => bc.value.mightContainString(h))
    val hashed = batch.withColumn("__h", md5(col(contentCol)))
    // negatives bypass the join (no false negatives exist); positives get
    // the exact confirm so fpp affects cost only, never the answer.
    // NULL content hashes to NULL: such rows are negatives (a null key
    // never equi-joins, so the exact path keeps them too) — without the
    // isNull arm they'd fail BOTH branches and vanish
    val fresh = hashed.filter(col("__h").isNull || !maybeSeen(col("__h")))
      .unionByName(hashed.filter(col("__h").isNotNull && maybeSeen(col("__h")))
        .join(seen, Seq("__h"), "left_anti"))
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** SemDedup-style semantic dedup: block by COARSE CLUSTER (nearest of
    * `nlist` centroids by cosine, deterministic tie-break) and verify with
    * exact cosine inside each cell — the published cluster-then-prune
    * recipe, complementing [[embeddingNearDupPairs]]'s hyperplane buckets.
    * Clustering concentrates semantically-close vectors into one block, so
    * at equal candidate budget it catches near-dups that straddle a
    * hyperplane sign boundary.
    *
    * Centroid seeding is the `nlist` smallest-id vectors (deterministic, no
    * RNG to ship) and `kmeansIters` Lloyd rounds refine them
    * ([[Similarity.refineCentroids]]). **Production config is
    * `kmeansIters >= 2`**: on a crawl-ordered corpus the first `nlist` ids
    * all come from one source, so unrefined cells collapse onto that
    * source's region and the rest of the space lands in one giant cell —
    * Lloyd rounds tile the data so `maxCellSize` bounds real work instead
    * of silently dropping the only populated cell. `kmeansIters = 0` keeps
    * the raw seeding for replicability studies. Assignment is
    * [[Similarity.assignToCentroids]]'s per-row expression argmax — the
    * big side genuinely does not shuffle until the in-cell pair join, and
    * `maxCellSize` bounds that join exactly like the LSH band cap. */
  def semDedupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      minCosineX100: Int,
      maxCellSize: Int = 10000,
      kmeansIters: Int = 2
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val centSeq =
      if (kmeansIters > 0)
        Similarity.refineCentroids(df, idCol, vecCol, nlist, kmeansIters)
      else df.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
        .collect().toSeq
    val assigned = Similarity.assignToCentroids(df, vecCol, centSeq)
      .select(col(idCol), col(vecCol), col("cid"))
    val capped = assigned
      .withColumn("__cn", count(lit(1)).over(Window.partitionBy(col("cid"))))
      .filter(col("__cn") <= maxCellSize)
      .drop("__cn")
    val a = capped.toDF(s"a_$idCol", "a_vec", "cid")
    val b = capped.toDF(s"b_$idCol", "b_vec", "cid")
    a.join(b, Seq("cid"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col("cid"), col(s"a_$idCol"), col(s"b_$idCol"),
        graft.functions.GraftFunctions.cosineSim(col("a_vec"), col("b_vec"))
          .cast("decimal(16,12)").as("cos_sim"))
      .filter(col("cos_sim") * 100 >= minCosineX100)
  }

  /** Cross-corpus contamination detection: for every (train, eval) document
    * pair sharing at least `minShared` word `shingleK`-shingles, the shared
    * count — the benchmark-decontamination primitive (is an eval item's
    * n-gram content inside the training set?).
    *
    * Plan shape is an INVERTED-INDEX join, never pairwise: distinct
    * (doc, shingle-hash) postings on both sides, equi-join on the hash,
    * count per pair. Shuffles are proportional to posting counts.
    * `maxPostingsPerShingle` drops shingles too common to carry signal
    * (stopword runs, boilerplate) — the same cap discipline as LSH bands,
    * without it one ubiquitous shingle produces |train|×|eval| pairs. */
  def crossOverlapPairs(
      train: DataFrame, trainId: String, trainText: String,
      eval: DataFrame, evalId: String, evalText: String,
      shingleK: Int = 8,
      minShared: Int = 2,
      maxPostingsPerShingle: Int = 1000
  ): DataFrame = {
    def postings(df: DataFrame, id: String, text: String, outId: String) =
      Par.ensureParallel(df).select(col(id).as(outId), explode(shingles(text, shingleK)).as("__sh"))
        .select(col(outId),
          expr("cast(conv(substring(md5(__sh), 1, 8), 16, 10) as bigint)").as("__h"))
        .distinct()
    val tp = postings(train, trainId, trainText, s"train_$trainId")
    val ep = postings(eval, evalId, evalText, s"eval_$evalId")
    // a shingle is hot if EITHER side's posting list exceeds the cap —
    // capping only the train side leaves an eval-ubiquitous shingle free to
    // fan out train×eval pairs, so the bound must be two-sided
    def hotIn(p: DataFrame) = p.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxPostingsPerShingle)
      .select(col("__h"))
    val hot = hotIn(tp).union(hotIn(ep)).distinct()
    tp.join(hot, Seq("__h"), "left_anti")
      .join(ep.join(hot, Seq("__h"), "left_anti"), Seq("__h"))
      .groupBy(col(s"train_$trainId"), col(s"eval_$evalId"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Connected components over an undirected pair list — turns candidate
    * near-dup PAIRS into dedup CLUSTERS (transitive closure), labeling every
    * node with the minimum id reachable from it. The final dedup keep-list
    * is "one representative (min id) per component".
    *
    * Algorithm: iterative min-label propagation (Pregel-lite) — each round
    * every node adopts the smallest label among itself and its neighbors;
    * converges in O(component diameter) rounds, each ONE shuffle of the
    * (small) edge list. Near-dup components are shallow in practice, and the
    * loop stops as soon as a round changes nothing (driver-side count — the
    * only driver involvement).
    *
    * Returns (id, component) for every id appearing in `pairs`.
    *
    * Hybrid execution: near-dup pair graphs are tiny relative to the corpus
    * (banding caps them), so below `driverThreshold` edges the closure runs
    * as driver-side union-find (microseconds, no iterative jobs); above it,
    * the distributed propagation loop takes over. Identical results. */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20, driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    // single pass: fetch up to threshold+1 edges — only a larger-than-
    // threshold graph (rare for banded candidates) falls through to the
    // distributed loop and recomputes
    val probe = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .limit((driverThreshold + 1).toInt).collect()
    if (probe.length <= driverThreshold) {
      val edges = probe.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
      }
      val rows = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      import spark.implicits._
      return rows.toDF("id", "component")
    }
    connectedComponentsStarContraction(pairs, aCol, bCol)
  }

  /** Star-contraction connected components — the diameter-robust
    * distributed path (alternating large-star / small-star contraction,
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014 — public algorithm).
    *
    * Min-label propagation ([[connectedComponentsDistributed]]) needs one
    * shuffle round per hop of component diameter: a chain-shaped near-dup
    * component (template drift across a crawl) forces O(n) rounds. Star
    * contraction converges in O(log n) rounds regardless of diameter:
    *
    *   - large-star(u): every neighbor v > u is re-pointed at
    *     m = min(Γ(u) ∪ {u}) — tall trees flatten toward local minima;
    *   - small-star(u): with edges oriented high→low, u and all its
    *     smaller neighbors are re-pointed at the minimum neighbor —
    *     local minima chain down to the component minimum.
    *
    * At fixpoint the edge set is a union of stars centered at each
    * component's minimum id — the same labels union-find produces. Each
    * round is two keyed shuffles (groupBy min + self-join) over the EDGE
    * set only (never the corpus); edges are `localCheckpoint`ed per round
    * so plan depth stays O(1) across rounds.
    *
    * Returns (id, component) for every id appearing in `pairs`. */
  def connectedComponentsStarContraction(
      pairs: DataFrame, aCol: String, bCol: String, maxIters: Int = 50): DataFrame =
    starContractionWithRounds(pairs, aCol, bCol, maxIters)._1

  /** [[connectedComponentsStarContraction]] plus the number of
    * (large-star, small-star) rounds it took to converge — the O(log n)
    * claim is testable, so the spec asserts the round count, not just the
    * labels.
    *
    * Round shape is the measured optimum, not the fewest-exchanges one: a
    * window-min rewrite (`min(v) over (partition by u)` replacing each
    * groupBy+join, intermediate distinct dropped, ~3 exchanges/round vs
    * ~6) measured q259 3.6→5.1 s and q285 4.0→6.0 s in an isolated
    * same-conditions A/B (r12) — WindowExec's per-round full sort of the
    * symmetrized edge list costs more than the hash-aggregate + SMJ it
    * replaces. Keep the groupBy+join form. */
  def starContractionWithRounds(
      pairs: DataFrame, aCol: String, bCol: String, maxIters: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    if (edges.isEmpty) return (Seq.empty[(Long, Long)].toDF("id", "component"), 0)
    var lastRdd = ckptRdd(edges)
    // carry the previous round's count forward (r18): edges.count() per
    // round re-counted the frame the previous round already counted as
    // `next` — one job per round for a number already in hand
    var edgeCount = edges.count()
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxIters) {
      // large-star: from each undirected edge {u,v}, u<v, re-point v at
      // min(Γ(u) ∪ {u}); self-loops (u was its own neighborhood min) drop
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      // the intermediate distinct is KEPT deliberately (r18 re-A/B):
      // dropping it is algebraically sound (mins2's MIN ignores
      // duplicates, the round's final distinct dedups) but measured
      // q259 2.24→3.34 s / q285 2.53→3.46 s on a clean close-out sweep —
      // the duplicate fan-out through the small-star join costs more than
      // the exchange it saves. Same lesson class as the r12 window-min
      // A/B above: fewer exchanges ≠ faster round.
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: edges now oriented high→low; re-point u and every
      // smaller neighbor at u's minimum neighbor
      val oriented = large.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins2 = oriented.groupBy("u").agg(min(col("v")).as("m"))
      val next = oriented.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint()
      val nextCount = next.count()
      stable = nextCount == edgeCount && next.except(edges).isEmpty
      edgeCount = nextCount
      graft.tools.Hygiene.quietly(lastRdd.foreach(_.unpersist(blocking = false)))
      lastRdd = ckptRdd(next)
      edges = next
      rounds += 1
    }
    // fixpoint edge set is (child, componentMin) stars; minima label
    // themselves
    val labels = edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
    (labels, rounds)
  }

  private def ckptRdd(d: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    d.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Distributed min-label propagation (see [[connectedComponents]]).
    *
    * Each round's frame is built FROM the previous round's, so without
    * truncation the logical plan nests one level per iteration — on a
    * high-diameter component the plan (and any recomputation path) grows
    * linearly with rounds. `checkpointEvery` rounds the labels are
    * `localCheckpoint`ed instead of persisted, cutting lineage back to a
    * materialized leaf; plan depth stays bounded by the checkpoint interval
    * regardless of graph diameter. */
  def connectedComponentsDistributed(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20, checkpointEvery: Int = 5): DataFrame = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
    // Dataset.unpersist() frees CacheManager entries but is a no-op for
    // localCheckpoint storage (an internal RDD cache) — track the backing
    // RDD of the latest checkpoint and free it when a NEWER checkpoint
    // materializes (at which point nothing depends on the old one). The
    // final checkpoint stays cached: it backs the returned frame.
    var lastCkptRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("component", "__nc"), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min(col("__nc")).as("__minNeighbor"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__minNeighbor"), col("component"))).as("component"))
      val next =
        if ((iter + 1) % checkpointEvery == 0) {
          val d = stepped.localCheckpoint() // eager: materializes + truncates lineage
          graft.tools.Hygiene.quietly(lastCkptRdd.foreach(_.unpersist(blocking = false)))
          lastCkptRdd = d.queryExecution.analyzed.collectFirst {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }
          d
        } else stepped.persist()
      val changed = next.join(labels.withColumnRenamed("component", "__old"), Seq("id"))
        .filter(col("component") =!= col("__old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Canonical-representative pick per near-dup cluster — the last stage of
    * the dedup pipeline (pairs → components → ONE kept doc per cluster).
    * Winner is highest `qualityCol`, smallest id on ties (deterministic
    * keep-list, reproducible across runs). Input `clusters` is
    * [[connectedComponents]] output (id, component); one window over the
    * component — no extra shuffle beyond it. */
  def canonicalPerCluster(
      clusters: DataFrame,
      quality: DataFrame,
      idCol: String,
      qualityCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = clusters.join(quality, clusters("id") === quality(idCol))
      .select(clusters("id"), col("component"), col(qualityCol).as("__q"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("__q").desc, col("id"))
    joined
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("component"))
      .agg(
        min(when(col("__rn") === 1, col("id"))).as("keep_id"),
        count(lit(1)).as("cluster_size"))
  }

  /** Bounded intra-component pair enumeration — the scale-safe form of
    * `cc JOIN cc ON component` for audits that must look at pairs *inside*
    * a near-dup cluster (transitive-contamination, chain attribution).
    *
    * The naive self-join is quadratic in component size: boilerplate
    * families at corpus scale routinely reach 10⁴–10⁶ members, i.e.
    * 10⁸–10¹² pairs from a single component. This caps the fan-out at the
    * source: components with ≤ `maxMembers` members enumerate every pair
    * (`exact = 1`); larger ones are truncated to their `maxMembers`
    * smallest ids — a deterministic, reproducible sample — and pairs among
    * that prefix are emitted with `exact = 0`. Output is therefore bounded
    * by `maxMembers·(maxMembers−1)/2` rows per component no matter how
    * degenerate the cluster.
    *
    * Two keyed shuffles on `componentCol` (size agg + rank window), both
    * co-partitioned with the pair join that follows — no all-pairs stage
    * anywhere. Consumers surface `exact` so sampled audits are labeled as
    * such rather than silently partial (the q238 exactness-flag pattern).
    *
    * Input `cc` is [[connectedComponents]] output (`idCol`,
    * `componentCol`); returns (component, a_id, b_id, exact). */
  def boundedIntraPairs(
      cc: DataFrame,
      idCol: String = "id",
      componentCol: String = "component",
      maxMembers: Int = 64
  ): DataFrame = {
    require(maxMembers >= 2, "maxMembers must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val sizes = cc.groupBy(col(componentCol))
      .agg(count(lit(1)).as("__csize"))
    val w = Window.partitionBy(col(componentCol)).orderBy(col(idCol))
    val kept = cc.select(col(componentCol), col(idCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxMembers)
      .join(sizes, Seq(componentCol))
      .withColumn("exact", (col("__csize") <= maxMembers).cast("long"))
    kept.select(col(componentCol), col(idCol).as("a_id"), col("exact"))
      .join(kept.select(col(componentCol), col(idCol).as("b_id")), Seq(componentCol))
      .filter(col("a_id") < col("b_id"))
      .select(col(componentCol), col("a_id"), col("b_id"), col("exact"))
  }

  /** Edit-distance near-dup pairs: block on a text prefix, verify with
    * levenshtein — the classic cheap-block/expensive-verify split.
    *
    * Two guards keep the block from going quadratic on real corpora:
    *   - length-difference prune IN the join condition —
    *     `|len(a)−len(b)| ≤ maxDist` is a lower bound on edit distance, so
    *     it is exact (never changes results) and cuts candidates before any
    *     O(len²) levenshtein work;
    *   - `maxBlockSize` cap — web corpora share boilerplate prefixes
    *     ("Terms of Service…") that would otherwise make one block O(n²);
    *     over-common prefixes are dropped like over-common LSH bands
    *     ([[minHashLshPairs]]), applied identically in the oracle. */
  def levenshteinPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int,
      maxDist: Int,
      maxBlockSize: Int = 500
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val proj = df.select(col(idCol), col(textCol),
      substring(col(textCol), 1, prefixLen).as("__pfx"),
      length(col(textCol)).as("__len"))
    val capped = proj
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__pfx"))))
      .filter(col("__bn") <= maxBlockSize)
      .drop("__bn")
    val a = capped.toDF(s"a_$idCol", "a_text", "__pfx", "a_len")
    val b = capped.toDF(s"b_$idCol", "b_text", "__pfx", "b_len")
    a.join(b, Seq("__pfx"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol") &&
        abs(col("a_len") - col("b_len")) <= maxDist)
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        levenshtein(col("a_text"), col("b_text")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** Sub-document (line-level) dedup — the C4/RefinedWeb-style boilerplate
    * scrub: split each document into fixed-width word SPANS, count each
    * span's corpus-wide document frequency, drop spans occurring in more
    * than `maxDocs` distinct documents (navigation chrome, license headers,
    * cookie banners — anything repeated verbatim across documents), and
    * reassemble each document from its surviving spans in order. Documents
    * whose every span is boilerplate drop out entirely.
    *
    * Scale shape: one generate (posexplode — no shuffle), one two-level
    * distinct-count aggregation keyed by span, one equi-join back on the
    * span (both sides hash-partition on the same key, so the exchange is
    * shared), one per-document reassembly agg. Everything is linear in
    * total span count; no driver-side data. The reassembly's
    * sort_array(collect_list(struct(pos, span))) sorts WITHIN one
    * document's row group only — bounded by that document's span count. */
  def removeBoilerplateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanWords: Int,
      maxDocs: Long
  ): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    require(maxDocs >= 1, "maxDocs must be at least 1")
    // null-guard as a CHEAP pushable predicate: `size(split(text)) > 0`
    // is true for every non-null text (split of "" is [""], size 1) and
    // false only for null, so `text IS NOT NULL` is equivalent — and
    // unlike the size form it pushes below the [[Par.ensureParallel]]
    // exchange at zero cost instead of re-running the split there.
    val spans = Par.ensureParallel(df)
      .filter(col(textCol).isNotNull)
      .withColumn("__w", split(col(textCol), " "))
      // (len + spanWords - 1) div spanWords spans; integer arithmetic so
      // both engines agree without float ceil
      .select(col(idCol),
        expr(s"(size(__w) + ${spanWords - 1}) div $spanWords").cast("long").as("n_spans"),
        posexplode(expr(
          s"""transform(sequence(0, (size(__w) + ${spanWords - 1}) div $spanWords - 1),
             |  i -> array_join(slice(__w, i * $spanWords + 1, $spanWords), ' '))""".stripMargin))
          .as(Seq("span_pos", "span")))
    val counts = spans.groupBy(col("span"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") <= maxDocs)
      .drop("__nd")
    spans.join(counts, Seq("span"))
      .groupBy(col(idCol))
      .agg(
        first(col("n_spans")).as("n_spans"),
        count(lit(1)).as("kept_spans"),
        array_join(expr("transform(array_sort(collect_list(struct(span_pos, span))), x -> x.span)"), " ")
          .as("clean_text"))
  }

  /** Temporal-locality dedup: mark each row a rapid repeat iff the SAME
    * key fired within the previous `minGap` time units — the telemetry
    * debounce (double-clicks, retry storms, at-least-once re-deliveries)
    * that exact content dedup can't express because the payload is
    * legitimately identical and legitimately recurring, just not THIS
    * fast. The first row of a key always survives; gap comparison is
    * strict (`gap < minGap` drops). One lag window per key — a single
    * hash shuffle, rows stream through in time order per key.
    *
    * NOTE the gap is measured to the previous RAW event, not the previous
    * KEPT one (window semantics, engine-portable, one pass); a debounce
    * relative to kept events is inherently sequential state — that
    * variant lives in the streaming ops. Adds `is_repeat` (0/1). */
  def flagRapidRepeats(df: DataFrame, keyCols: Seq[String], timeCol: String,
      minGap: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(minGap > 0, "minGap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    df.withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("is_repeat",
        when(col("__prev").isNotNull &&
          col(timeCol) - col("__prev") < minGap, 1L).otherwise(0L))
      .drop("__prev")
  }

  /** Content-defined chunking (the storage-dedup classic, Rabin/FastCDC
    * family): split each document at positions where a rolling
    * content hash hits a divisor condition, so chunk boundaries follow
    * CONTENT, not offsets — insert one byte near the front of a document
    * and fixed-size blocks all shift (every block hash changes), while
    * content-defined boundaries re-synchronize after the edit and every
    * downstream chunk dedups against the unedited original. This is the
    * byte-level complement to token-window span dedup
    * ([[duplicatedSpanStats]]) and winnowing fingerprints: those DETECT
    * shared regions, chunk identity is what a dedup STORE keys on.
    *
    * Boundary rule (deliberately stateless per position, so an ANSI
    * oracle can replay it): a boundary falls after 1-based position `p`,
    * `k ≤ p ≤ len−1`, iff the base-31 polynomial of the k code points
    * ending at `p` — (Σ code(c_j)·31^(k−1−j)) mod 1e9+7 — ≡ 0
    * (mod `divisor`): expected chunk length ≈ `divisor` chars. This is
    * the gear/Rabin-family cheap-hash design the CDC literature uses —
    * integer multiply-adds over a precomputed per-char code array
    * (O(1) `element_at` lookups), which measured 2× faster than the
    * earlier md5-per-position predicate at sf0.1 (1.3 s vs 2.5 s for the
    * full chunking pass) with the same boundary density; at corpus scale
    * the boundary scan IS the operator, so its constant matters.
    * Production CDC adds min/max chunk clamps; those make the
    * boundary decision depend on the PREVIOUS boundary (sequential
    * state), so this variant keeps the pure content predicate and
    * documents the tradeoff: pathological inputs (a constant byte run)
    * produce degenerate all-or-nothing chunking instead of clamped
    * chunks. Docs shorter than `k+1` chars form a single chunk.
    *
    * Everything runs as codegen'd array expressions fused into the scan —
    * no data-keyed shuffle until the caller aggregates chunk hashes (the
    * [[Par.ensureParallel]] guard may round-robin a small single-partition
    * input once so the boundary scan uses every core; no-op at scale). Chunk CONTENT
    * identity stays md5 (one digest per chunk, collision-safe for a dedup
    * store); only the boundary probe is the cheap hash. Output: one row
    * per chunk (id, chunk_idx, start_pos 0-based, chunk_len, chunk_md5). */
  /* Unit-consistency note (ADVICE r9 flagged a suspected UTF-16/code-point
   * mismatch here): Spark's `split(text, '')` yields one element PER CODE
   * POINT (a supplementary-plane char stays one element) and `ascii` of
   * that element returns the full code point (e.g. U+1D54F -> 120143) —
   * verified against Spark 4.1.2 — so `__codes`, `length()` positions and
   * `substring()` chunk extraction all speak code points, matching the
   * DuckDB oracle's string_split('')+ord. OperatorsSpec ("cdc chunks:
   * supplementary-plane ...") pins this with U+1D54F-bearing input
   * against a plain-Scala code-point reference. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, divisor: Int = 32): DataFrame = {
    // k ≤ 9 keeps the largest polynomial term (max code point 0x10FFFF ×
    // 31^(k−1), summed k times) inside exact Long arithmetic
    require(k >= 1 && k <= 9, "k must be in 1..9")
    require(divisor >= 2, "divisor must be at least 2")
    val weights = Array.iterate(1L, k)(_ * 31L).reverse // 31^(k-1) .. 31^0
    val poly = (0 until k)
      .map(j => s"element_at(__codes, p - ${k - 1 - j}) * ${weights(j)}L")
      .mkString(" + ")
    Par.ensureParallel(df)
      .withColumn("__len", length(col(textCol)).cast("int"))
      .withColumn("__codes", expr(s"transform(split($textCol, ''), ch -> ascii(ch))"))
      .withColumn("__bpos", expr(
        s"CASE WHEN __len - 1 < $k THEN CAST(array() AS ARRAY<INT>) ELSE " +
        s"transform(filter(sequence($k, __len - 1), p -> (($poly) % 1000000007L) % $divisor = 0), " +
        s"x -> CAST(x AS INT)) END"))
      .withColumn("__bounds",
        expr("concat(array(0), __bpos, array(__len))"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(__bounds) - 2), i -> " +
        s"named_struct('s', __bounds[i], 'l', __bounds[i + 1] - __bounds[i], " +
        s"'h', md5(substring($textCol, __bounds[i] + 1, __bounds[i + 1] - __bounds[i]))))"))
        .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.s").cast("long").as("start_pos"),
        col("__c.l").cast("long").as("chunk_len"),
        col("__c.h").as("chunk_md5"))
  }
}
