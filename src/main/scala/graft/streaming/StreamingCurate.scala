package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming corpus INTAKE — the curation stages that are a pure function
  * of one document run on the live firehose, so low-quality and duplicate
  * docs never land in the lake at all:
  *
  *   1. Gopher quality gate ([[graft.operators.TextAnalysis.gopherFilter]])
  *      — stateless per-row expressions, fused into the stream's map stage.
  *   2. Exact content dedup within the watermark horizon
  *      ([[StreamingDedup.dedupExact]] on the md5 content key) — state
  *      bounded to the horizon's distinct hashes (32-hex keys, never the
  *      document bodies).
  *   3. Token count on the survivors (whitespace tokens, the
  *      [[TextAnalysis.tokens]] definition).
  *
  * The corpus-GLOBAL stages of [[graft.operators.Pipelines.curateAndPack]]
  * (boilerplate-span scrub needs cross-document span counts; packing needs
  * the final corpus) stay batch over the landed output — this split is the
  * standard lambda shape: per-document decisions stream, cross-corpus
  * decisions batch. Near-dup candidates can additionally stream via
  * [[StreamingDedup.lshCandidates]] downstream of this intake. */
object StreamingCurate {

  def intake(
      docs: DataFrame, // doc_id, <tsCol>, <textCol>
      tsCol: String,
      textCol: String,
      lateness: String,
      stopwords: Seq[String],
      minWords: Int = 50
  ): DataFrame = {
    val gated = TextAnalysis.gopherFilter(docs, textCol, stopwords, minWords = minWords)
      .withColumn("content_key", md5(col(textCol)))
    StreamingDedup.dedupExact(gated, tsCol, lateness, Seq("content_key"))
      .withColumn("n_tokens", size(TextAnalysis.tokens(textCol)).cast("long"))
  }

  /** Streaming blocklist/compliance gate — the large-list phrase screen
    * run ON THE FIREHOSE so blocked documents never land: one call to the
    * native [[graft.functions.TokenSetHits]] expression per document
    * (stateless, O(tokens) regardless of list size, fuses into the
    * stream's map stage exactly like the Gopher gate — no watermark, no
    * state). Output schema matches the batch
    * [[graft.operators.TextAnalysis.blocklistHitsLarge]] plus the
    * pass-through columns; StreamingSpec pins stream ≡ batch row-for-row.
    * `keepBlocked = false` drops flagged docs at the door (the intake
    * form); `true` keeps them annotated (the audit form). */
  def blocklistGate(
      docs: DataFrame, // <idCol>, <textCol>, ...
      idCol: String,
      textCol: String,
      phrases: Seq[String],
      keepBlocked: Boolean = false
  ): DataFrame = {
    // the gate packs the input into a "__row" struct and appends the three
    // score columns; a stream already carrying any of those names would be
    // silently clobbered by the withColumn / flattening select (r15
    // advice) — refuse loudly, the operators' standard __-prefix contract
    val reserved = Seq("__row", "n_uni_hits", "n_bi_hits", "blocked")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"blocklistGate reserves column names ${reserved.mkString(", ")}; " +
        s"input already carries ${clash.mkString(", ")} — rename before gating")
    val scored = TextAnalysis.blocklistHitsLarge(
      docs.withColumn("__row", struct(docs.columns.map(col).toIndexedSeq: _*)),
      "__row", textCol, phrases)
    val flat = scored.select(col("__row.*") +:
      Seq("n_uni_hits", "n_bi_hits", "blocked").map(col): _*)
    if (keepBlocked) flat else flat.filter(col("blocked") === 0)
  }

  /** Streaming DSIR gate — frozen-model importance scoring ON THE
    * FIREHOSE (r16 tranche H): the bucket-LLR model is fit ONCE in batch
    * ([[graft.operators.Dsir.fitModel]] — an epoch job over the reference
    * corpus), collected here into a literal map (≤ `buckets` entries —
    * a few KB), and every arriving document scores with ONE stateless
    * per-row expression chain (featurize → map-lookup fold → the exact
    * [[graft.operators.Dsir.importanceWeights]] weight formula) that
    * fuses into the stream's map stage like the Gopher and blocklist
    * gates — no state, no watermark, no join. StreamingSpec pins
    * stream ≡ [[graft.operators.Dsir.scoreWithModel]] row-for-row.
    *
    * Featureless documents (empty/null text) emit no row — the batch
    * scorer's contract. `keepRejected = true` keeps low-weight docs
    * annotated (the audit form); false drops them at the door. */
  def dsirGate(
      docs: DataFrame, // <idCol>, <textCol>, ...
      idCol: String,
      textCol: String,
      model: DataFrame, // Dsir.fitModel output: (bucket, llr, norm)
      buckets: Int,
      minWeightX1000: Long,
      keepRejected: Boolean = false
  ): DataFrame = {
    val reserved = Seq("__toks", "__fb", "__s", "n_features", "weight_x1000")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"dsirGate reserves column names ${reserved.mkString(", ")}; " +
        s"input already carries ${clash.mkString(", ")} — rename before gating")
    val rows = model.select("bucket", "llr", "norm", "buckets").collect()
    require(rows.nonEmpty, "dsirGate needs a non-empty model (Dsir.fitModel output)")
    val normV = rows.head.getAs[Long]("norm")
    val fitBuckets = rows.head.getAs[Long]("buckets")
    require(fitBuckets == buckets.toLong,
      s"model was fit with buckets=$fitBuckets, gate requested $buckets — hash widths must match")
    // DENSE llr array (index = bucket, absent = 0): element_at on a map
    // literal is a linear key scan per lookup — O(model) on the per-row
    // hot path; the dense array is O(1) and subsumes the unseen-bucket
    // coalesce (r16 self-review)
    val llrArr = Array.fill(buckets)(0L)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      require(b >= 0 && b < buckets, s"model bucket $b outside [0, $buckets)")
      llrArr(b.toInt) = r.getAs[Long]("llr")
    }
    val m = typedLit(llrArr.toSeq)
    val scored = docs
      .filter(col(textCol).isNotNull)
      // bind the token array ONCE — featureBucketsExpr's bigram lambda
      // references it per element, and an inline tokenize would re-split
      // the document once per bigram (see featureBucketsExpr's scaladoc)
      .withColumn("__toks", expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')"))
      .withColumn("__fb", graft.operators.Dsir.featureBucketsExpr("__toks", buckets))
      .withColumn("n_features", size(col("__fb")).cast("long"))
      .filter(col("n_features") > 0)
      .withColumn("__s", aggregate(
        transform(col("__fb"), b => element_at(m, (b + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x))
      .withColumn("weight_x1000",
        (expr(s"(__s - n_features * ${normV}L + 256L * n_features) * 1000 div n_features")
          - lit(256000L)).cast("long"))
      .drop("__toks", "__fb", "__s")
    if (keepRejected) scored else scored.filter(col("weight_x1000") >= minWeightX1000)
  }

  /** Streaming ASSET intake — the multimodal twin of [[intake]]: binary
    * payloads come off the firehose, are routed by CONTENT
    * ([[graft.operators.Multimodal.sniffMime]] — a stateless codegen'd
    * prefix expression, so it fuses into the stream's map stage exactly
    * like the Gopher gate), unrecognized bytes are dropped at the door,
    * and exact payload dedup runs within the watermark horizon on the
    * md5 of the BYTES (32-hex state keys — payloads never enter state).
    * Decode/feature-extraction stays downstream of landing, batch, where
    * a decoder bug can be replayed; sniff-and-dedup is the part that must
    * happen before bytes are stored twice. */
  def assetIntake(
      assets: DataFrame, // asset_id, <tsCol>, <payloadCol>
      tsCol: String,
      payloadCol: String,
      lateness: String
  ): DataFrame = {
    import graft.operators.Multimodal
    val routed = assets
      .withColumn("mime", Multimodal.sniffMime(col(payloadCol)))
      .filter(col("mime") =!= "application/octet-stream")
      .withColumn("content_key", md5(col(payloadCol)))
    StreamingDedup.dedupExact(routed, tsCol, lateness, Seq("content_key"))
  }

  /** Streaming mixture gate — [[graft.operators.Sampling.rebalanceToMixture]]
    * on the firehose, via the frozen-model pattern the DSIR gate uses:
    * compute [[graft.operators.Sampling.mixtureThresholds]] ONCE per corpus
    * epoch (the batch side's exact BigInt threshold algebra), ship the
    * tiny map here, and keep a document iff `hash32(key) < threshold` for
    * its domain. A key's verdict is a pure function of (key, thresholds) —
    * the same document admitted by the batch rebalance is admitted here,
    * which the spec pins row-for-row. Stateless (a broadcast when-chain
    * fused into the stream's map stage): no watermark, no state store,
    * and domains without a threshold entry drop — including NULL domains,
    * which can never equal a key. */
  def mixtureGate(docs: DataFrame, keyCol: String, domainCol: String,
      thresholds: Map[String, Long]): DataFrame = {
    require(thresholds.nonEmpty, "empty threshold table gates everything out")
    val domainStr = col(domainCol).cast("string")
    val t = thresholds.foldLeft(lit(0L)) { case (acc, (d, th)) =>
      when(domainStr === d, lit(th)).otherwise(acc)
    }
    docs.filter(graft.operators.Sampling.hash32Of(keyCol) < t)
  }
}
