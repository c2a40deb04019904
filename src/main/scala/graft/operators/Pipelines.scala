package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed end-to-end dataset builds — the proof that the individual
  * operators assemble into the pipelines a training-data team actually
  * runs. Each stage is one of the driver-checked operators; composition
  * adds no new semantics, only ordering.
  */
object Pipelines {

  /** The classic C4-style corpus cleanup, end to end:
    *
    *   1. QUALITY GATE — Gopher rules ([[TextAnalysis.gopherFilter]]):
    *      per-row integer arithmetic, no shuffle;
    *   2. BOILERPLATE SCRUB — cross-document span removal
    *      ([[Dedup.removeBoilerplateSpans]]): spans repeated in more than
    *      `maxSpanDocs` documents vanish, documents reassemble in order;
    *   3. EXACT DEDUP on the CLEANED text — scrubbing makes formerly
    *      boilerplate-differing copies identical, so dedup after scrub
    *      catches strictly more than dedup before (min-id winner, the
    *      [[Dedup.exactByContent]] convention);
    *   4. SEQUENCE PACKING — surviving documents fill `budget`-token bins
    *      in id order ([[Packing.packByTokenBudget]]'s two-phase scan).
    *
    * Output: one row per surviving document — (id, kept_spans, n_tokens,
    * bin_id, bin_offset). Every stage is linear with keyed shuffles only;
    * nothing here collects unbounded data to the driver.
    */
  def curateAndPack(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      minWords: Int = 50,
      spanWords: Int = 5,
      maxSpanDocs: Long = 2,
      budget: Long = 256,
      keepText: Boolean = false // true adds clean_text (the export path wants it)
  ): DataFrame =
    Packing.packByTokenBudget(
      curateClean(df, idCol, textCol, stopwords, minWords, spanWords,
        maxSpanDocs, keepText),
      idCol, "n_tokens", budget)

  /** The QUALITY half of [[curateAndPack]] — gate, scrub, dedupe, count —
    * exposed standalone so `curate --work-dir` can checkpoint its output
    * as a resumable stage (r18, VERDICT r17 #7: at 100 TB the Gopher gate
    * is a full corpus scan; a failure in packing should not re-pay it).
    * Output: (idCol, kept_spans, n_tokens[, clean_text]) — exactly the
    * frame [[Packing.packByTokenBudget]] consumes. */
  def curateClean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      minWords: Int = 50,
      spanWords: Int = 5,
      maxSpanDocs: Long = 2,
      keepText: Boolean = false
  ): DataFrame = {
    val gated = TextAnalysis.gopherFilter(df, textCol, stopwords, minWords = minWords)
    val scrubbed = Dedup.removeBoilerplateSpans(gated, idCol, textCol, spanWords, maxSpanDocs)
    // min-id winner per cleaned text (exactByContent semantics, but keeping
    // the row itself rather than the group summary). Partition on the md5,
    // not the raw document string — the exchange and sort comparators then
    // work on 32 hex chars instead of multi-KB texts (same md5-equivalence
    // contract exactByContent already accepts)
    val w = Window.partitionBy(md5(col("clean_text"))).orderBy(col(idCol))
    val unique = scrubbed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // clean_text is single-space-joined by construction: token count is a
    // plain split size, no regex needed
    val counted = unique.withColumn("n_tokens",
      size(split(col("clean_text"), " ")).cast("long"))
    if (keepText) counted.select(col(idCol), col("kept_spans"), col("n_tokens"), col("clean_text"))
    else counted.select(col(idCol), col("kept_spans"), col("n_tokens"))
  }

  /** Corpus DATASHEET — the one-page summary a dataset release ships
    * ("Datasheets for Datasets"): volume (docs/tokens/chars), language
    * spread, exact-duplicate mass, and the token-count median, as a
    * long-format (metric, value) table of integer-exact rows.
    *
    * Plan shape: ONE derived-columns pass is materialized (the frame is
    * tokenized/hashed exactly once — `localCheckpoint`, same reuse
    * argument as the q77 inputs), then a single multi-aggregate row plus
    * the rank-based exact median ([[Stats.exactThresholds]] —
    * percentile_disc semantics, a #percents-row driver fetch). Six
    * metrics cost two jobs, not six scans. */
  def datasheet(df: DataFrame, idCol: String, langCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
      col(idCol), col(langCol).as("__lang"),
      TextAnalysis.tokenCount(textCol).as("__toks"),
      length(col(textCol)).cast("long").as("__chars"),
      md5(col(textCol)).as("__h")).localCheckpoint()
    val a = base.agg(
      count(lit(1)).as("docs"), sum(col("__toks")).as("toks"),
      sum(col("__chars")).as("chars"), countDistinct(col("__lang")).as("langs"),
      countDistinct(col("__h")).as("dh")).head()
    // empty corpus: SUMs are NULL and there is no median rank — a datasheet
    // of zeros beats an NPE in a scheduled report job
    def lg(i: Int): Long = if (a.isNullAt(i)) 0L else a.getLong(i)
    val median =
      if (lg(0) == 0) 0L else Stats.exactThresholds(base, "__toks", Seq(50)).head
    Seq(
      ("chars_total", lg(2)),
      ("distinct_langs", lg(3)),
      ("docs_total", lg(0)),
      ("exact_dup_docs", lg(0) - lg(4)),
      ("median_tokens", median),
      ("tokens_total", lg(1))
    ).toDF("metric", "value")
  }

  /** Corpus RELEASE MANIFEST — the whole curation pipeline (exact dedup →
    * quality gate → benchmark decontamination → md5 three-way split →
    * token budget) with every stage emitting (docs, tokens,
    * order-independent id-checksum) into one table. The checksum column
    * makes it a release CONTRACT, not a dashboard: one document surviving
    * a stage it shouldn't (or vanishing from one it shouldn't) moves the
    * checksum even when the counts happen to collide.
    *
    * Stages: `1_raw` everything; `2_dedup` min-id winner per md5(text);
    * `3_quality` length/word floor; `4_decontam` drops the held-out eval
    * slice (id ≡ 0 mod `evalMod`) AND any doc exactly matching an eval
    * doc's text hash; `split:*` the 80/10/10 md5 split of the survivors.
    * Every stage is a keyed shuffle or anti-join on 32-hex hashes — text
    * bodies never shuffle; at 100 TB the manifest costs one corpus scan
    * plus hash-keyed metadata passes. */
  def releaseManifest(docs: DataFrame, idCol: String, textCol: String,
      minChars: Int, minWords: Int, evalMod: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__chars", length(col("__text")).cast("long"))
      .withColumn("__toks",
        expr("size(filter(split(__text, '\\\\s+'), x -> x <> ''))").cast("long"))
      .withColumn("__h", md5(col("__text")))
      .localCheckpoint()
    val dedup = d.withColumn("__rn",
        row_number().over(Window.partitionBy("__h").orderBy("__id")))
      .filter(col("__rn") === 1).drop("__rn")
    val quality = dedup.filter(col("__chars") >= minChars && col("__toks") >= minWords)
    val evalH = d.filter(col("__id") % evalMod === 0).select("__h").distinct()
    val decontam = quality.filter(col("__id") % evalMod =!= 0)
      .join(evalH, Seq("__h"), "left_anti")
    val split = decontam.withColumn("__bucket",
        expr("CAST(conv(substring(md5(CAST(__id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
      .withColumn("__split",
        when(col("__bucket") < 80, "split:train")
          .when(col("__bucket") < 90, "split:val").otherwise("split:test"))
    val ck = expr("CAST(conv(substring(md5(CAST(__id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
    def stage(df: DataFrame, name: String) = df.agg(
      count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum("__toks"), lit(0L)).as("n_tokens"),
      coalesce(sum(ck), lit(0L)).as("id_checksum"))
      .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"),
        col("id_checksum"))
    Seq(stage(d, "1_raw"), stage(dedup, "2_dedup"),
      stage(quality, "3_quality"), stage(decontam, "4_decontam"))
      .reduce(_ unionByName _)
      .unionByName(split.groupBy(col("__split").as("stage"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("__toks").as("n_tokens"), sum(ck).as("id_checksum")))
  }
}
