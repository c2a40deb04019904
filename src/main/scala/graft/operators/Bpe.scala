package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real token counter behind context-
  * window packing and token-budget curation (the whitespace and regex
  * counts in [[TextAnalysis]] approximate it; packing 100 TB against a
  * model's ACTUAL vocabulary needs the merge-table form).
  *
  * Scale split, mirroring practice: TRAINING comes in two equivalent
  * forms — [[train]], a bounded-sample driver-side greedy merge loop (one
  * job; vocabularies are routinely induced on samples), and
  * [[trainDistributed]], the same algorithm with the corpus-sized pair
  * counting as a per-round Spark aggregation (full-corpus training, no
  * sample cap). ENCODING is the hot path and runs distributed: merges
  * broadcast as a rank map, each document encoded independently in
  * `mapPartitions` — embarrassingly parallel, no data-keyed shuffle, no
  * per-row driver contact.
  *
  * Determinism: the trainer breaks pair-frequency ties lexicographically
  * and the encoder always applies the LOWEST-RANK applicable merge first
  * (standard BPE semantics) — same corpus in, same vocabulary and same
  * token stream out, on any partitioning.
  *
  * Counter values are whitespace-word-internal (merges never cross word
  * boundaries), the classic word-BPE formulation. */
object Bpe {

  /** Initial symbol split of one word: one symbol PER CODE POINT (a
    * supplementary-plane char stays one symbol). `w.map(_.toString)` would
    * split UTF-16 code units — self-consistent but it would break the
    * q107 certificate's `n_bpe_tokens <= code-point word length` bound on
    * supplementary-plane input, and it disagrees with how every other
    * operator here (cdcChunks, length(), substring()) counts characters. */
  private def codePointSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Train `numMerges` merges on up to `sampleDocs` documents (collected —
    * the documented bounded sample). Returns merges in rank order. */
  def train(df: DataFrame, textCol: String, numMerges: Int, sampleDocs: Int = 10000): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val texts = df.select(col(textCol)).as[String]
      .filter((s: String) => s != null && s.nonEmpty)
      .limit(sampleDocs).collect()
    // word -> frequency, words as symbol sequences (single chars initially)
    var words: Map[Vector[String], Long] = texts.iterator
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .map(codePointSyms)
      .foldLeft(Map.empty[Vector[String], Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    val merges = Vector.newBuilder[(String, String)]
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      val pairCounts = words.iterator.flatMap { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).map(p => p -> n)
      }.foldLeft(Map.empty[(String, String), Long]) { case (m, (p, n)) =>
        m.updated(p, m.getOrElse(p, 0L) + n)
      }
      if (pairCounts.isEmpty) done = true
      else {
        // most frequent pair, ties lexicographic — fully deterministic
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val (x, y) = best
        val xy = x + y
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) { out += xy; i += 2 }
            else { out += syms(i); i += 1 }
          }
          out.result() -> n
        }.foldLeft(Map.empty[Vector[String], Long]) { case (m, (w, n)) =>
          m.updated(w, m.getOrElse(w, 0L) + n)
        }
        it += 1
      }
    }
    merges.result()
  }

  /** Distributed trainer: the same greedy merge loop as [[train]], but the
    * PAIR COUNTING — the only step whose cost grows with corpus size —
    * runs as a Spark aggregation over the full corpus instead of a driver
    * fold over a sample. Per round: one `groupBy(a, b).sum(weight)` on the
    * word-frequency frame and a 1-ROW collect of the winner (count DESC,
    * pair ASC — the exact tie-break [[train]] uses, so both paths produce
    * the same merge table on the same corpus¹); the merge rewrite is a
    * shuffle-free map, and the frame is `localCheckpoint`ed every round so
    * round N never re-executes rounds 1..N−1 (without it the loop is
    * quadratic in merges). The frame carries one row per DISTINCT word —
    * pair counting is weighted by word frequency, so the aggregate's input
    * is vocabulary-sized, not corpus-sized, after the initial word count.
    *
    * Driver [[train]] remains the small-corpus fast path (one job instead
    * of `numMerges`); this is the form that trains on all 100 TB.
    *
    * ¹ tie-break caveat: Spark compares strings in UTF-8 binary (= code
    * point) order, `java.lang.String` in UTF-16 code-unit order; they
    * diverge only when supplementary-plane characters tie with U+E000..
    * U+FFFF ones — no natural-language corpus trips this. */
  def trainDistributed(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    var words: org.apache.spark.sql.Dataset[(Seq[String], Long)] =
      df.select(col(textCol)).as[String]
        .filter((s: String) => s != null && s.nonEmpty)
        .flatMap(_.split("\\s+").iterator.filter(_.nonEmpty))
        .groupBy(col("value")).agg(count(lit(1)).as("n"))
        .as[(String, Long)]
        .map { case (w, n) => (codePointSyms(w): Seq[String], n) }
        .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      val best = words.flatMap { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, n) }
      }.toDF("a", "b", "n")
        .groupBy("a", "b").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .head(1)
      if (best.isEmpty) done = true
      else {
        val x = best(0).getString(0); val y = best(0).getString(1)
        merges += ((x, y))
        val xy = x + y
        val prev = words
        words = words.map { case (syms, n) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) { out += xy; i += 2 }
            else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }.localCheckpoint()
        graft.tools.Hygiene.quietly(prev.unpersist(blocking = false))
        it += 1
      }
    }
    graft.tools.Hygiene.quietly(words.unpersist(blocking = false))
    merges.result()
  }

  /** Encode one word with a rank map: repeatedly apply the lowest-rank
    * applicable merge (leftmost occurrence first) until none applies. */
  private[graft] def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = codePointSyms(word)
    var hit = true
    while (hit && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) hit = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Distributed encode: per-document BPE token count and the token list —
    * merges broadcast as a rank map, `mapPartitions`, no data-keyed
    * shuffle ([[Par.ensureParallel]] may round-robin a small
    * single-partition input once so the encode loop uses every core —
    * a no-op at scale, where the scan already splits). */
  def encodeTokens(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    Par.ensureParallel(df)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (id, text) =>
          val toks =
            if (text == null) Vector.empty[String]
            else text.split("\\s+").iterator.filter(_.nonEmpty)
              .flatMap(w => encodeWord(w, r)).toVector
          (id, toks.length.toLong, toks)
        }
      }
      .toDF(idCol, "n_bpe_tokens", "bpe_tokens")
  }
}
