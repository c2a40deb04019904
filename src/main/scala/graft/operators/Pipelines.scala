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
    val carried =
      if (keepText) counted.select(col(idCol), col("kept_spans"), col("n_tokens"), col("clean_text"))
      else counted.select(col(idCol), col("kept_spans"), col("n_tokens"))
    Packing.packByTokenBudget(carried, idCol, "n_tokens", budget)
  }
}
