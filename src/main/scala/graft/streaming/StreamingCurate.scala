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
}
