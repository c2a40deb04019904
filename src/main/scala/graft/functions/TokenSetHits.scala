package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared matcher state for [[TokenSetHits]]: the phrase sets folded ONCE
  * at construction and the precompiled whitespace pattern. Both the
  * interpreted eval and the generated code call [[hits]] — one
  * implementation, no codegen/eval drift.
  *
  * Phrase folding goes through `UTF8String.toLowerCase` — the EXACT
  * routine Spark's `lower()` runs — so non-ASCII case edges ('İ', 'ẞ',
  * final sigma) fold identically on the phrase and document sides by
  * construction (the r14-advice trap the SQL-generating
  * [[graft.operators.TextAnalysis.blocklistHits]] solves by wrapping each
  * literal in the engine's own lower(); here both sides share one JVM
  * routine). The whitespace `Pattern` is compiled once per matcher, never
  * per row (the per-row `String.replaceAll` recompile cost q138 ~60% of
  * its wall once — same trap). */
final class TokenSetMatcher(unigrams: Seq[String], bigrams: Seq[String])
    extends Serializable {
  private def fold(p: String): String = UTF8String.fromString(p).toLowerCase.toString
  private val uniSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, unigrams.size * 2))
    unigrams.foreach(p => s.add(fold(p)))
    s
  }
  private val biSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, bigrams.size * 2))
    bigrams.foreach(p => s.add(fold(p)))
    s
  }
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** Unigram and adjacent-bigram hit counts over the whitespace tokens of
    * `text`, packed as (n_uni << 32) | n_bi. Token adjacency is over the
    * NON-EMPTY tokens (a leading-whitespace empty token never breaks a
    * bigram), duplicates count per occurrence — exactly
    * `blocklistHits`'s filter-count semantics. n_uni/n_bi each fit in 31
    * bits for any document under 2^31 tokens. */
  def hits(text: UTF8String): Long = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    var nUni = 0L
    var nBi = 0L
    var prev: String = null
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        if (uniSet.contains(t)) nUni += 1
        if (prev != null && !biSet.isEmpty && biSet.contains(prev + " " + t)) nBi += 1
        prev = t
      }
      i += 1
    }
    (nUni << 32) | nBi
  }
}

/** Native large-blocklist phrase matcher: O(tokens) hash-set lookups per
  * document, independent of blocklist size — versus the literal-array
  * `array_contains` plan whose per-token cost is O(|blocklist|). At a
  * C4-class blocklist (hundreds of phrases) the array scan is already
  * measurable; at the 10⁴–10⁵-phrase lists real safety pipelines carry it
  * is the difference between one pass over the text and a quadratic-ish
  * blowup on the 100 TB hot path. Participates in whole-stage codegen —
  * the generated consume path calls the shared matcher through a
  * referenced object, so the plan stays a single fused scan stage.
  *
  * The expression carries the phrase SEQS (not the matcher) so case-class
  * equality is structural over the lists: two `token_set_hits` calls built
  * from the same phrases compare equal and canonicalize together, keeping
  * common-subexpression elimination, plan caching and exchange reuse alive
  * for plans that invoke the matcher twice (r15 advice — a
  * `TokenSetMatcher` field had reference equality only, which silently
  * defeated all three). The matcher itself is a `@transient lazy val`,
  * built once per JVM from the folded sets. */
case class TokenSetHits(child: Expression, unigrams: Seq[String], bigrams: Seq[String])
    extends UnaryExpression {

  @transient private lazy val matcher = new TokenSetMatcher(unigrams, bigrams)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "token_set_hits"

  override def nullSafeEval(input: Any): Any =
    matcher.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matcher", matcher, classOf[TokenSetMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hits($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
