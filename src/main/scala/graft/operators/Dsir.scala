package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") —
  * re-expressed as exact integer algebra so the whole model fit AND the
  * per-document scores replay in plain SQL.
  *
  * The method: hash every document's unigram+bigram features into B
  * buckets, fit two bucket-frequency models (target distribution vs the
  * raw corpus), and score each document by its average per-feature
  * log-likelihood ratio — documents that "look like" the target
  * distribution score high and get selected/upweighted for training.
  *
  * Deviations from the paper, both deliberate and documented:
  *   - logs are HALF-BIT quantized: ql(n) = floor(2·log2 n) computed as
  *     `length(bin(n²)) − 1` — a pure string/integer expression both
  *     Spark and DuckDB evaluate identically (float log2 has real
  *     knife-edge divergence: DuckDB's floor(log2(2^49−1)) returns 49).
  *     Quantization error is ±0.25 bit per feature and averages out over
  *     the ~2·tokens features of a document; the fixture measures 4-5×
  *     target enrichment in the top-100 (DsirSpec), so the discretized
  *     estimator keeps the paper's selection power.
  *   - scores are per-feature AVERAGES (×1000), not raw sums: the raw
  *     sum is length-dominated (every feature of a minority-target fit
  *     carries a negative ratio, so long documents sink regardless of
  *     content — measured 16/100 vs 66/100 target hits on the same fit).
  *
  * Scale shape: two passes over the corpus, NOTHING document-sized ever
  * materializes or shuffles. Pass 1 aggregates feature occurrences into
  * the B-bucket model (map-side combine; output is B rows no matter the
  * corpus). Pass 2 re-derives features and scores them against the
  * broadcast model, aggregating per document (partial aggregation; the
  * only doc-keyed shuffle carries one row per document). Recomputing the
  * explode beats checkpointing it: the exploded frame is corpus×~2·tokens
  * rows, the model is 8k. The half-bit log is overflow-safe to 2^62 (see
  * [[halfBitLog2]]) — bucket counts AND the corpus-total normalizer stay
  * exact at any reachable corpus size (9.2e18 feature occurrences is
  * ~10 EB of text), with a loud `require`-style guard built into the
  * expression rather than silent wraparound.
  *
  * Hash parity: bucket = base-31 code-point polynomial of the feature
  * string mod the prime 2^57−13, then mod B — the same fold q318's
  * shingles and cdcChunks use (Spark `ascii` ≡ DuckDB `ord`, both
  * code-point based on Spark 4). A few integer ops per character beat the
  * md5+hex+conv chain ~5× on the feature-hash-dominated profile (r12:
  * the md5 form measured 12.5 s at 10×, near-linear in rows — the only
  * super-linear-looking rehearsal entry — because per-row hashing, not
  * the data motion, was the whole cost).
  */
object Dsir {

  /** floor(2·log2 n) as a codegen'd string/integer expression, safe for
    * all 1 ≤ n < 2^62 — no intermediate ever overflows signed 64-bit.
    *
    * Two regimes, both pure integer algebra an oracle replays verbatim:
    *   - n < 2^31: the exact form `length(bin(n²)) − 1` (n² ≤ 2^62).
    *   - n ≥ 2^31 (where n² would overflow — the r12 form wrapped here,
    *     reachable once corpus-total feature occurrences pass ~3.03e9, a
    *     few GB of text): floor(2·log2 n) = 2·(bitlen(n)−1) + extra,
    *     where extra tests whether n crosses the half-power 2^(b+0.5).
    *     The test squares only the TOP-31-BIT mantissa m (read straight
    *     off the binary string, so no shift-by-column is needed):
    *     m ∈ [2^30, 2^31), m² < 2^62, compared against the constant
    *     2^61 = (2^30.5)². m² ≥ 2^61 ⟹ n² ≥ 2^(2b+1) exactly (n ≥
    *     m·2^s); the converse can miss only when m = ⌊2^30.5⌋ =
    *     1518500249 and the discarded low bits of n decide the crossing
    *     — a ±1 half-bit knife edge on one mantissa in 2^31. Both
    *     engines evaluate the IDENTICAL formula (DuckDB folds the same
    *     binary-prefix string back to m), so oracle parity is exact
    *     everywhere, including the knife edge; DsirSpec pins the formula
    *     against BigInt truth across both regimes and the edge. */
  private[graft] def halfBitLog2(n: Column): Column = {
    val bs = conv(n, 10, 2)
    val b = length(bs) - lit(1)
    val m = conv(substring(bs, 1, 31), 2, 10).cast("long")
    when(n < lit(2147483648L), length(conv(n * n, 10, 2)) - lit(1))
      .otherwise(b * lit(2) +
        when(m * m >= lit(2305843009213693952L), lit(1)).otherwise(lit(0)))
  }

  /** Per-document importance weights against a target distribution.
    *
    * `targetCol` is a boolean Column over `df`'s rows marking the target
    * corpus (NULL counts as raw). Output: one row per document with at
    * least one token — (idCol, n_features, weight_x1000), where
    * weight_x1000 = 1000 × average per-feature half-bit LLR
    * (positive ⇒ the document looks more like the target than the raw
    * corpus). Deterministic: same input set ⇒ same weights, any layout. */
  /** The unigram+adjacent-bigram feature expression over a token-array
    * column — ONE definition shared by every DSIR form (fit-and-score,
    * multi-domain, frozen fit, frozen score, the streaming gate), so the
    * featurization can never drift between the model a pipeline fits and
    * the gate that scores against it. */
  private[graft] def featuresSqlOver(toksCol: String): String =
    s"""concat($toksCol,
       |  CASE WHEN size($toksCol) >= 2
       |    THEN transform(sequence(0, size($toksCol) - 2),
       |      i -> concat(element_at($toksCol, i + 1), ' ', element_at($toksCol, i + 2)))
       |    ELSE CAST(array() AS ARRAY<STRING>) END)""".stripMargin

  /** The base-31 string fold onto `buckets` hash buckets, as a SQL
    * fragment over one feature string `f` — shared like
    * [[featuresSqlOver]]. */
  private[graft] def bucketSqlOver(f: String, buckets: Int): String =
    s"aggregate(split($f, ''), 0L, (a, c) -> (a * 31 + ascii(c)) % 144115188075855859L) % $buckets"

  /** Per-document feature-bucket ARRAY (no explode) — the stateless
    * per-row form the streaming gate fuses into its map stage. `toksCol`
    * must name a BOUND token-array column (bind it with one withColumn
    * first): [[featuresSqlOver]] references the token array five times,
    * twice inside the per-bigram lambda, and HOF lambdas are interpreted
    * with no loop-invariant hoisting — an inline filter(split(text))
    * would re-tokenize the whole document once per bigram, O(tokens²)
    * per row (r16 self-review; the batch paths bind __toks for the same
    * reason). */
  private[graft] def featureBucketsExpr(toksCol: String, buckets: Int): Column =
    expr(s"transform(${featuresSqlOver(toksCol)}, f -> ${bucketSqlOver("f", buckets)})")

  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetCol: Column,
      buckets: Int = 8192
  ): DataFrame = {
    require(buckets > 1, "need at least 2 hash buckets")
    val spark = df.sparkSession
    // the token array binds ONCE in a projection above the guard exchange
    // (the q318-proven shape: only pushable-FILTER reuse re-runs heavy
    // expressions below the exchange; the cheap IS NOT NULL prefilter is
    // the one predicate allowed to push). Features = unigrams ++ adjacent
    // bigrams, the short-doc CASE inside the expression.
    def exploded = Par.ensureParallel(df)
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        coalesce(targetCol, lit(false)).as("__tgt"),
        expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')").as("__toks"))
      .select(col("__id"), col("__tgt"), explode(expr(featuresSqlOver("__toks"))).as("__f"))
      .select(col("__id"), col("__tgt"), expr(bucketSqlOver("__f", buckets)).as("__b"))
    // pass 1: the B-bucket model (target and raw occurrence counts) —
    // checkpointed at ≤ B rows, it feeds the per-bucket LLRs AND the
    // corpus totals, so the normalizer costs no extra corpus pass
    val model = exploded
      .groupBy(col("__b"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("__cr"))
      .localCheckpoint()
    val llrByBucket = model.select(col("__b"),
      (halfBitLog2(col("__ct") + 1) - halfBitLog2(col("__cr") + 1))
        .cast("long").as("__l"))
    // smoothing-mass normalizer: ql(Ttot + B) − ql(Rtot + B), one row
    val norm = model
      .agg(sum(col("__ct")).as("__tt"), sum(col("__cr")).as("__tr"))
      .select((halfBitLog2(col("__tt") + buckets) -
        halfBitLog2(col("__tr") + buckets)).cast("long").as("__nl"))
    // pass 2: score each document against the broadcast model. The +256
    // half-bits-per-feature offset keeps the dividend non-negative so
    // integer division truncates identically in Spark (`div`, toward
    // zero) and DuckDB (`//`, floor) — they differ on negatives.
    exploded
      .join(broadcast(llrByBucket), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_features"), sum(col("__l")).as("__s"))
      .crossJoin(broadcast(norm))
      .select(col("__id").as(idCol),
        col("n_features").cast("long").as("n_features"),
        (expr("(__s - n_features * __nl + 256L * n_features) * 1000 div n_features")
          - lit(256000L)).cast("long").as("weight_x1000"))
  }

  /** The PERSISTABLE half of [[importanceWeights]] (r16 tranche H — the
    * frozen-model family, completing the incremental story next to
    * [[graft.operators.Dedup.dedupAgainstCorpusBloom]] /
    * [[graft.operators.Similarity.incrementalIvfAssign]]): fit the
    * bucket-LLR model ONCE over the reference corpus and hand back a
    * plain DataFrame — one row per OCCUPIED bucket,
    * (bucket, llr, norm) with the smoothing-mass normalizer repeated on
    * every row so the model is self-contained (write it to parquet,
    * broadcast it, ship it to the firehose gate). Integer algebra
    * identical to [[importanceWeights]]'s fit stage ([[halfBitLog2]]
    * half-bits), so scoring the SAME corpus against its own frozen model
    * reproduces [[importanceWeights]] row-for-row (DsirSpec pins it).
    * An unoccupied bucket carries llr = ql(1) − ql(1) = 0 — exactly the
    * 0 [[scoreWithModel]] coalesces for unseen buckets, so absence and
    * zero-count presence score identically by construction. The model
    * also records its own `buckets` (repeated like `norm`): scoring with
    * a different hash width silently produces plausible garbage, so the
    * scorer REFUSES a mismatch instead (r16 self-review). */
  def fitModel(
      df: DataFrame,
      textCol: String,
      targetCol: Column,
      buckets: Int = 8192
  ): DataFrame = {
    require(buckets > 1, "need at least 2 hash buckets")
    val exploded = Par.ensureParallel(df)
      .filter(col(textCol).isNotNull)
      .select(coalesce(targetCol, lit(false)).as("__tgt"),
        expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')").as("__toks"))
      .select(col("__tgt"), explode(expr(featuresSqlOver("__toks"))).as("__f"))
      .select(col("__tgt"), expr(bucketSqlOver("__f", buckets)).as("__b"))
    val model = exploded
      .groupBy(col("__b"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("__cr"))
      .localCheckpoint()
    val norm = model
      .agg(sum(col("__ct")).as("__tt"), sum(col("__cr")).as("__tr"))
      .select((halfBitLog2(col("__tt") + buckets) -
        halfBitLog2(col("__tr") + buckets)).cast("long").as("norm"))
    model.select(col("__b").cast("long").as("bucket"),
        (halfBitLog2(col("__ct") + 1) - halfBitLog2(col("__cr") + 1))
          .cast("long").as("llr"))
      .crossJoin(broadcast(norm))
      .withColumn("buckets", lit(buckets.toLong))
  }

  /** Score documents against a FROZEN [[fitModel]] model — the daily-crawl
    * form: the model was fit on the reference corpus epoch, the arriving
    * batch is scored without refit (how DSIR selection actually deploys —
    * refitting per batch would let the arriving data move its own
    * yardstick). Same per-doc formula as [[importanceWeights]]'s scoring
    * stage; features hashing to buckets the model never saw contribute
    * llr 0 (see [[fitModel]] — absence ≡ zero-count presence). Documents
    * with no features (null/empty text) emit no row, exactly like
    * [[importanceWeights]]. Scale: one feature pass over the batch, the
    * ≤ `buckets`-row model broadcast — nothing corpus-sized shuffles. */
  def scoreWithModel(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      buckets: Int = 8192
  ): DataFrame = {
    require(buckets > 1, "need at least 2 hash buckets")
    // one-row driver read: an EMPTY model (wrong path, schema-only frame)
    // must refuse loudly, not annihilate every row through a crossJoin
    // with an empty normalizer; and a hash-width mismatch with the fit
    // must refuse too — both silently produce plausible garbage weights
    // (r16 self-review)
    val head = model.select(col("norm"), col("buckets")).limit(1).collect()
    require(head.nonEmpty, "scoreWithModel needs a non-empty model (Dsir.fitModel output)")
    val normV = head.head.getAs[Long]("norm")
    val fitBuckets = head.head.getAs[Long]("buckets")
    require(fitBuckets == buckets.toLong,
      s"model was fit with buckets=$fitBuckets, scoring requested $buckets — hash widths must match")
    val exploded = Par.ensureParallel(df)
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')").as("__toks"))
      .select(col("__id"), explode(expr(featuresSqlOver("__toks"))).as("__f"))
      .select(col("__id"), expr(bucketSqlOver("__f", buckets)).as("__b"))
    val llr = model.select(col("bucket").as("__b"), col("llr").as("__l"))
    exploded
      .join(broadcast(llr), Seq("__b"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_features"),
        sum(coalesce(col("__l"), lit(0L))).as("__s"))
      .select(col("__id").as(idCol),
        col("n_features").cast("long").as("n_features"),
        (expr(s"(__s - n_features * ${normV}L + 256L * n_features) * 1000 div n_features")
          - lit(256000L)).cast("long").as("weight_x1000"))
  }

  /** K per-domain DSIR weights plus an integer-mixture composite — the
    * multi-domain upgrade of [[importanceWeights]] (VERDICT r13 #5 /
    * r14 #6). Real training mixes are multi-target ("40% code, 30%
    * encyclopedic, 30% dialogue"); fitting K single-target models with K
    * calls would pay 2K corpus passes. This fits ALL K per-bucket models
    * from ONE shared feature pass (per bucket: total occurrences plus K
    * target sums — each domain's raw side is total − target, exactly the
    * contrast [[importanceWeights]] computes, so `w_<name>_x1000` equals
    * the single-target output column-for-column, a property DsirSpec
    * pins) and scores every document against all K broadcast models in
    * ONE doc-keyed shuffle: 2 corpus passes regardless of K.
    *
    * `mixX1000` are integer mixture weights (parts, not necessarily
    * summing to 1000); the composite is
    *   mix = Σ_k mix_k·(w_k + 256000) div Σ_k mix_k − 256000,
    * the same positivity-offset trick as the per-feature average: w_k ≥
    * −124000 > −256000 keeps every dividend non-negative, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree (they diverge on
    * negatives — the documented engine boundary). Bounds: K ≤ 16 and
    * mix_k ≤ 1e6 keep the dividend under ~6.2e12, far inside a long.
    *
    * Scale: identical shape to [[importanceWeights]] — the K-column
    * bucket model is still ≤ B rows (broadcast), nothing document-sized
    * shuffles, and the per-doc aggregate carries K longs instead of 1. */
  def multiDomainWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      domains: Seq[(String, Column)],
      mixX1000: Seq[Long],
      buckets: Int = 8192
  ): DataFrame = {
    require(buckets > 1, "need at least 2 hash buckets")
    require(domains.nonEmpty && domains.size <= 16,
      "domains must be 1..16 (the model broadcast carries K columns per bucket)")
    require(domains.map(_._1).distinct.size == domains.size, "domain names must be unique")
    require(domains.forall(_._1.matches("[A-Za-z][A-Za-z0-9_]*")),
      "domain names must be identifier-safe (they become output columns)")
    require(mixX1000.size == domains.size, "one mixture weight per domain")
    require(mixX1000.forall(m => m >= 0 && m <= 1000000L) && mixX1000.sum >= 1,
      "mixture weights must be in 0..1e6 with a positive sum")
    val ks = domains.indices
    def exploded = Par.ensureParallel(df)
      .filter(col(textCol).isNotNull)
      .select((col(idCol).as("__id") +:
        domains.zipWithIndex.map { case ((_, p), k) =>
          coalesce(p, lit(false)).as(s"__t$k") }) :+
        expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')").as("__toks"): _*)
      .select((col("__id") +: ks.map(k => col(s"__t$k"))) :+
        explode(expr(featuresSqlOver("__toks"))).as("__f"): _*)
      .select((col("__id") +: ks.map(k => col(s"__t$k"))) :+
        expr(bucketSqlOver("__f", buckets)).as("__b"): _*)
    val model = exploded
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__call"),
        ks.map(k => sum(when(col(s"__t$k"), 1L).otherwise(0L)).as(s"__ct$k")): _*)
      .localCheckpoint()
    val llrByBucket = model.select(col("__b") +: ks.map { k =>
      (halfBitLog2(col(s"__ct$k") + 1) -
        halfBitLog2(col("__call") - col(s"__ct$k") + 1)).cast("long").as(s"__l$k")
    }: _*)
    val norm = model
      .agg(sum(col("__call")).as("__all"),
        ks.map(k => sum(col(s"__ct$k")).as(s"__tt$k")): _*)
      .select(ks.map { k =>
        (halfBitLog2(col(s"__tt$k") + buckets) -
          halfBitLog2(col("__all") - col(s"__tt$k") + buckets))
          .cast("long").as(s"__nl$k")
      }: _*)
    val scored = exploded
      .join(broadcast(llrByBucket), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_features"), ks.map(k => sum(col(s"__l$k")).as(s"__s$k")): _*)
      .crossJoin(broadcast(norm))
    val base = scored.select(
      col("__id").as(idCol) +: col("n_features").cast("long").as("n_features") +:
        domains.zipWithIndex.map { case ((name, _), k) =>
          (expr(s"(__s$k - n_features * __nl$k + 256L * n_features) * 1000 div n_features")
            - lit(256000L)).cast("long").as(s"w_${name}_x1000")
        }: _*)
    val mixSql = domains.zipWithIndex
      .map { case ((n, _), k) => s"${mixX1000(k)}L * (w_${n}_x1000 + 256000L)" }
      .mkString(" + ")
    base.withColumn("mix_weight_x1000",
      expr(s"($mixSql) div ${mixX1000.sum}L - 256000L").cast("long"))
  }
}
