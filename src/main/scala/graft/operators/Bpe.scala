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

  /** The shared greedy merge loop over a word-frequency table — one body
    * serving both the code-point trainer ([[train]]) and the byte trainer
    * ([[trainBytes]]); only the initial symbolization differs. Most
    * frequent pair wins each round, ties lexicographic — fully
    * deterministic. */
  private def greedyMerges(words0: Map[Vector[String], Long],
      numMerges: Int): Seq[(String, String)] = {
    var words = words0
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

  /** Pure-driver form of [[train]] — the same word-frequency fold and
    * greedy loop over an in-memory corpus, shared by the DataFrame trainer
    * (post-collect) and oracle generators that have no SparkSession. */
  def trainFromTexts(texts: Iterable[String], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    // word -> frequency, words as symbol sequences (single chars initially)
    val words: Map[Vector[String], Long] = texts.iterator
      .filter(s => s != null && s.nonEmpty)
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .map(codePointSyms)
      .foldLeft(Map.empty[Vector[String], Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    greedyMerges(words, numMerges)
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
    trainFromTexts(texts.toSeq, numMerges)
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
    // checkpoint every 4th rewrite, not every round (r18): the rewrite is
    // a narrow vocab-sized map, so re-deriving ≤3 of them inside the next
    // count job is cheaper than an eager materialization job per round —
    // halves the loop's job count, merges unchanged
    var lastCkpt = words
    var sinceCkpt = 0
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
        words = words.map { case (syms, n) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) { out += xy; i += 2 }
            else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        sinceCkpt += 1
        if (sinceCkpt >= 4) {
          words = words.localCheckpoint()
          graft.tools.Hygiene.quietly(lastCkpt.unpersist(blocking = false))
          lastCkpt = words
          sinceCkpt = 0
        }
        it += 1
      }
    }
    graft.tools.Hygiene.quietly(lastCkpt.unpersist(blocking = false))
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

  // ---------------------------------------------------------------------
  // BYTE-LEVEL mode (r17, VERDICT r16 #3): production token budgets
  // (GPT-2/Llama-class vocabularies) are byte-level with regex
  // pre-tokenization and a 256-byte base alphabet — no OOV by
  // construction, and whitespace/punctuation carry tokens instead of
  // vanishing at a split. The word-BPE mode above drifts from those
  // budgets exactly on punctuation-heavy and non-Latin text; this mode is
  // the one whose counts a context-window packer can trust.
  //
  // Representation: each pre-token's UTF-8 bytes are carried as a
  // LATIN-1 string (bytes 0–255 ↔ chars U+0000–U+00FF, bijective), so the
  // entire merge/encode algebra above applies verbatim with one symbol per
  // byte. Tie-breaks stay consistent distributed-vs-driver: for chars
  // 0–255, Java's UTF-16 order and Spark's UTF-8 binary order are both
  // plain byte order.
  // ---------------------------------------------------------------------

  /** GPT-2-style pre-tokenization (public since the GPT-2 release):
    * contractions, optionally-space-prefixed letter runs, digit runs,
    * punctuation runs, then whitespace. The alternatives PARTITION any
    * string — every char lands in exactly one piece — so concatenating
    * the pieces reproduces the input byte-for-byte (the roundtrip
    * certificate in q367 rests on this). */
  private val preTokPattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Pre-tokenize into latin-1-encoded UTF-8 byte pieces. */
  private[graft] def bytePreTokens(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val m = preTokPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) {
      out += new String(m.group.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    out.result()
  }

  /** One symbol per byte of a latin-1-encoded piece. */
  private def byteSyms(piece: String): Vector[String] =
    piece.iterator.map(_.toString).toVector

  /** Pure-driver byte-level trainer over an in-memory corpus (the
    * [[trainFromTexts]] twin) — also the oracle generator's path. */
  def trainBytesFromTexts(texts: Iterable[String], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val words: Map[Vector[String], Long] = texts.iterator
      .filter(s => s != null && s.nonEmpty)
      .flatMap(bytePreTokens).map(byteSyms)
      .foldLeft(Map.empty[Vector[String], Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    greedyMerges(words, numMerges)
  }

  /** Byte-level trainer — [[train]]'s algebra over pre-token byte
    * sequences. The base alphabet is all 256 byte values by construction
    * (any byte not seen in training simply stays a single-byte token at
    * encode time), so there is no OOV and no UNK. */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
      sampleDocs: Int = 10000): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val texts = df.select(col(textCol)).as[String]
      .filter((s: String) => s != null && s.nonEmpty)
      .limit(sampleDocs).collect()
    trainBytesFromTexts(texts.toSeq, numMerges)
  }

  /** Pure byte-level encode of one document: pre-tokenize, merge by rank —
    * tokens as latin-1 byte strings. Shared by [[encodeBytes]]'s
    * partitions and oracle generators. */
  private[graft] def encodeBytesText(text: String,
      ranks: Map[(String, String), Int]): Vector[String] =
    bytePreTokens(text).flatMap(p => encodeWord(p, ranks))

  /** Distributed byte-level trainer — [[trainDistributed]]'s per-round
    * Spark pair counting over pre-token byte sequences; same merge table
    * as [[trainBytes]] on the same corpus (the q368 gate proves it: the
    * oracle's VALUES are computed with the driver trainer, the query runs
    * this one). */
  def trainBytesDistributed(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    var words: org.apache.spark.sql.Dataset[(Seq[String], Long)] =
      df.select(col(textCol)).as[String]
        .filter((s: String) => s != null && s.nonEmpty)
        .flatMap(bytePreTokens(_))
        .groupBy(col("value")).agg(count(lit(1)).as("n"))
        .as[(String, Long)]
        .map { case (w, n) => (byteSyms(w): Seq[String], n) }
        .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    // checkpoint every 4th rewrite (r18) — see [[trainDistributed]]
    var lastCkpt = words
    var sinceCkpt = 0
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
        words = words.map { case (syms, n) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) { out += xy; i += 2 }
            else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        sinceCkpt += 1
        if (sinceCkpt >= 4) {
          words = words.localCheckpoint()
          graft.tools.Hygiene.quietly(lastCkpt.unpersist(blocking = false))
          lastCkpt = words
          sinceCkpt = 0
        }
        it += 1
      }
    }
    graft.tools.Hygiene.quietly(lastCkpt.unpersist(blocking = false))
    merges.result()
  }

  /** One certificate row of the delta trainer's cost curve: the merge
    * round, the winning pair's count, how many distinct word entries the
    * round actually rewrote (the delta work unit), and the candidate-pair
    * population before the merge. */
  final case class BpeRoundStat(round: Int, bestCount: Long,
    wordsTouched: Long, distinctPairs: Long)

  /** [[trainBytesScalable]]'s result: the merge table plus the vocabulary
    * cap pricing (distinct pre-tokens seen vs kept, occurrence mass
    * foregone by the cap) and the per-round cost curve. */
  final case class ScalableBpeTrain(merges: Seq[(String, String)],
    nDistinct: Long, nKept: Long, occTotal: Long, occKept: Long,
    rounds: Vector[BpeRoundStat])

  /** DELTA-MAINTAINED greedy merge loop (r18, VERDICT r17 #5): the merge
    * sequence of [[greedyMerges]] EXACTLY — same pair counting (positional
    * adjacency, overlaps included), same (count DESC, pair ASC) tie-break
    * — but per round the work is ∝ occurrences of the WINNING pair, not
    * the vocabulary: the classic BPE trainer trick. Pair counts live in a
    * hash map mirrored by an ordered set (argmax is O(log P)); a
    * pair→containing-words index names the entries a merge touches; each
    * touched word subtracts its old adjacent pairs, rewrites left-to-right
    * (the [[greedyMerges]] loop), and adds its new pairs — additivity
    * makes the maintained counts identical to a from-scratch recount, and
    * the spec pins merge-for-merge equality against [[greedyMerges]].
    *
    * Distinct word entries never collide under merging (a merge preserves
    * each word's concatenated content), so the entry count is invariant
    * and `wordsTouched` is well-defined against any replay. */
  private[graft] def greedyMergesDelta(words0: Iterable[(Vector[String], Long)],
      numMerges: Int): (Seq[(String, String)], Vector[BpeRoundStat]) = {
    import scala.collection.mutable
    val words = mutable.ArrayBuffer.empty[(Vector[String], Long)]
    words0.foreach(words += _)
    def pairsOf(syms: Vector[String]): Iterator[(String, String)] =
      syms.iterator.zip(syms.iterator.drop(1))
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    words.indices.foreach { i =>
      val (s, n) = words(i)
      pairsOf(s).foreach { p =>
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
        pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
      }
    }
    val sorted = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.by(t => (-t._1, t._2, t._3)))
    pairCounts.foreach { case ((a, b), n) => sorted += ((n, a, b)) }
    def bump(p: (String, String), delta: Long): Unit = if (delta != 0) {
      val old = pairCounts.getOrElse(p, 0L)
      if (old != 0) sorted -= ((old, p._1, p._2))
      val nw = old + delta
      if (nw != 0) { pairCounts(p) = nw; sorted += ((nw, p._1, p._2)) }
      else pairCounts.remove(p)
    }
    def rewrite(syms: Vector[String], x: String, y: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      var hit = false
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
          out += (x + y); i += 2; hit = true
        } else { out += syms(i); i += 1 }
      }
      if (hit) out.result() else syms
    }
    val merges = Vector.newBuilder[(String, String)]
    val stats = Vector.newBuilder[BpeRoundStat]
    var it = 0
    while (it < numMerges && sorted.nonEmpty) {
      val (cnt, x, y) = sorted.head
      val distinctPairs = pairCounts.size.toLong
      val affected = pairWords.getOrElse((x, y), mutable.Set.empty).toArray
      var touched = 0L
      affected.foreach { i =>
        val (syms, n) = words(i)
        val newSyms = rewrite(syms, x, y)
        if (newSyms ne syms) {
          touched += 1
          val delta = mutable.HashMap.empty[(String, String), Long]
          pairsOf(syms).foreach(p => delta(p) = delta.getOrElse(p, 0L) - n)
          pairsOf(newSyms).foreach(p => delta(p) = delta.getOrElse(p, 0L) + n)
          delta.foreach { case (p, d) => bump(p, d) }
          val oldSet = pairsOf(syms).toSet
          val newSet = pairsOf(newSyms).toSet
          (oldSet diff newSet).foreach(p => pairWords.get(p).foreach { s =>
            s -= i; if (s.isEmpty) { pairWords.remove(p); () }
          })
          (newSet diff oldSet).foreach(p =>
            pairWords.getOrElseUpdate(p, mutable.Set.empty) += i)
          words(i) = (newSyms, n)
        }
      }
      merges += ((x, y))
      stats += BpeRoundStat(it + 1, cnt, touched, distinctPairs)
      it += 1
    }
    (merges.result(), stats.result())
  }

  /** Production-vocab byte-level trainer (r18, VERDICT r17 #5):
    * [[trainBytesDistributed]] runs one corpus-wide Spark aggregate PER
    * MERGE ROUND — at the 8k–32k merges a production vocabulary needs,
    * that is 8k–32k job launches of pure fixed cost. This is the scalable
    * split practice uses: the only corpus-sized step — pre-token counting
    * — runs as ONE distributed aggregate; the merge loop then runs
    * driver-side over the (vocabulary-sized, Heaps-law-bounded) distinct
    * pre-token table with DELTA-maintained pair counts
    * ([[greedyMergesDelta]] — work per round ∝ the winning pair's
    * occurrences). `maxVocab` caps the collected table at the top entries
    * by (count DESC, token ASC) — deterministic — and the result PRICES
    * the cap (distinct/kept entries, occurrence mass foregone), the same
    * no-silent-caps contract as the LSH postings caps. Merge-for-merge
    * equal to [[trainBytes]]/[[trainBytesDistributed]] whenever the cap
    * is not binding (spec + the q389 gate). */
  def trainBytesScalable(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 22): ScalableBpeTrain = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxVocab >= 1, "maxVocab must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(textCol)).as[String]
      .filter((s: String) => s != null && s.nonEmpty)
      .flatMap(bytePreTokens(_))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // two reads below: the kept collect + the totals row
    val totals = counts.agg(count(lit(1)).as("d"), sum(col("n")).as("o")).head()
    val nDistinct = totals.getLong(0)
    val occTotal = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    val kept = counts.orderBy(col("n").desc, col("value"))
      .limit(maxVocab).as[(String, Long)].collect()
    graft.tools.Hygiene.quietly(counts.unpersist(blocking = false))
    val occKept = kept.iterator.map(_._2).sum
    val (merges, rounds) =
      greedyMergesDelta(kept.iterator.map { case (w, n) => (byteSyms(w), n) }.toSeq,
        numMerges)
    ScalableBpeTrain(merges, nDistinct, kept.length.toLong, occTotal, occKept, rounds)
  }

  /** Canonical md5 of a merge-table prefix — tokens are latin-1 byte
    * strings, so the digest runs over ISO-8859-1 bytes (UTF-8 would
    * re-encode bytes ≥ 0x80 and two engines would disagree). */
  private[graft] def mergesMd5(merges: Seq[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(merges.map { case (a, b) => a + " " + b }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Gate-facing certificate for [[trainBytesScalable]] at production
    * merge counts (r18, VERDICT r17 #5): one row per requested curve
    * round — the winning pair's count, the round's delta work
    * (`words_touched`, the operative cost unit), its cumulative sum, the
    * candidate-pair population, and the md5 of the merge-table PREFIX
    * (pinning the exact merge sequence up to that round — a thousand
    * merges checked without a thousand-row table). Every row also carries
    * the vocab-cap pricing so a capped run can never read as exact. */
  def scalableTrainCertificate(df: DataFrame, textCol: String, numMerges: Int,
      curveRounds: Seq[Int], maxVocab: Int = 1 << 22): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val t = trainBytesScalable(df, textCol, numMerges, maxVocab)
    val cum = t.rounds.scanLeft(0L)(_ + _.wordsTouched).tail
    curveRounds.filter(r => r >= 1 && r <= t.rounds.length).sorted.map { r =>
      val st = t.rounds(r - 1)
      (r.toLong, st.bestCount, st.wordsTouched, cum(r - 1), st.distinctPairs,
        mergesMd5(t.merges.take(r)), t.nKept, t.occTotal - t.occKept)
    }.toDF("round", "best_count", "words_touched", "cum_touched",
      "distinct_pairs", "merges_md5", "n_vocab_kept", "occ_foregone")
  }

  /** Distributed byte-level encode: per document, token count, total token
    * byte mass, the md5 of the CONCATENATED token bytes (== md5 of the
    * document's UTF-8 bytes whenever the encode lost nothing — the
    * roundtrip certificate column), and the tokens themselves as binary.
    * Merges broadcast as a rank map; `mapPartitions`, no data-keyed
    * shuffle — the same shape as [[encodeTokens]]. */
  def encodeBytes(df: DataFrame, idCol: String, textCol: String,
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
        val hexDigits = "0123456789abcdef"
        it.map { case (id, text) =>
          val toks = encodeBytesText(text, r)
          val md = java.security.MessageDigest.getInstance("MD5")
          var mass = 0L
          toks.foreach { t =>
            val bs = t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
            mass += bs.length
            md.update(bs)
          }
          val hex = md.digest().foldLeft(new StringBuilder(32)) { (sb, b) =>
            sb.append(hexDigits((b >> 4) & 0xf)).append(hexDigits(b & 0xf))
          }.toString
          (id, toks.length.toLong, mass, hex,
            toks.map(_.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
        }
      }
      .toDF(idCol, "n_bpe_tokens", "token_mass_bytes", "roundtrip_md5", "bpe_tokens")
  }
}
