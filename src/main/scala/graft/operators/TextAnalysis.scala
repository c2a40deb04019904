package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token stats, quality
  * scoring, language-ID heuristics, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) producing integer/string outputs so
  * results are engine-exact. */
object TextAnalysis {

  /** The conservative default stopword list shared by the quality operators,
    * the query pack, and the curate CLI — one definition so the claimed
    * CLI/query-pack parity cannot silently drift. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Whitespace tokens, empties dropped (split/filter semantics chosen to
    * be portable: trailing-empty behavior differs between engines, the
    * filter normalizes it away). */
  def tokens(textCol: String): Column =
    expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')")

  def tokenCount(textCol: String): Column = size(tokens(textCol)).cast("long")

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols — the shape of a byte-pair pre-tokenizer's regex. */
  def bpeishTokenCount(textCol: String): Column =
    size(expr(s"regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)")).cast("long")

  /** Occurrences of substring `pat` — (len(s) - len(remove(s,pat))) / len(pat),
    * expressible in any SQL engine. */
  def substrCount(textCol: String, pat: String): Column =
    ((length(col(textCol)) - length(regexp_replace(col(textCol), java.util.regex.Pattern.quote(pat), ""))) / lit(pat.length)).cast("long")

  /** Quality-signal bundle: integer counts only (length, tokens, distinct
    * tokens, stopwords, vowels, digits) + avg token length ×100 as an int —
    * downstream filters derive ratios. */
  def qualitySignals(df: DataFrame, idCol: String, textCol: String, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(textCol)
    val stopArr = array(stopwords.map(lit): _*)
    df.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      size(expr(s"filter(${toksSql(textCol)}, x -> array_contains(${stopArrSql(stopwords)}, x))"))
        .cast("long").as("n_stopwords"),
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[aeiou]", ""))).cast("long").as("n_vowels"),
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", ""))).cast("long").as("n_digits"),
      when(size(toks) === 0, lit(0L)).otherwise(
        (aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, v) => acc + v) * 100)
          .divide(size(toks)).cast("long")).as("avg_token_len_x100"))
  }

  private def toksSql(textCol: String) = s"filter(split($textCol, '\\\\s+'), x -> x != '')"
  private def stopArrSql(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** Language-ID heuristic: score each candidate language by marker-token
    * hits (an n-gram/stopword heuristic), argmax with deterministic
    * first-listed tie-break. Markers are per-language token lists. */
  def languageId(df: DataFrame, idCol: String, textCol: String,
      markers: Seq[(String, Seq[String])]): DataFrame = {
    val toks = tokens(textCol)
    val scoreCols = markers.map { case (lang, ws) =>
      size(expr(s"filter(${toksSql(textCol)}, x -> array_contains(${stopArrSql(ws)}, x))"))
        .cast("long").as(s"score_$lang")
    }
    val scored = df.select(col(idCol) +: scoreCols: _*)
    val best = markers.map { case (lang, _) => col(s"score_$lang") }
    val greatestScore = greatest(best: _*)
    // first language (in declaration order) achieving the max score
    val pred = markers.reverse.foldLeft(lit("unknown")) { case (acc, (lang, _)) =>
      when(col(s"score_$lang") === greatestScore, lit(lang)).otherwise(acc)
    }
    scored.select(col(idCol) +: markers.map { case (l, _) => col(s"score_$l") } :+ pred.as("pred_lang"): _*)
  }

  /** Normalized text with word boundaries marked for n-gram profiling:
    * [[normalizeText]] then spaces → `_` (Cavnar–Trenkle's padding), so
    * trigrams straddle word edges deterministically in pure ASCII. */
  private[graft] def triNorm(textCol: String): Column =
    translate(normalizeText(textCol), " ", "_")

  /** All character trigrams of an ALREADY-MATERIALIZED normalized-text
    * column (empty when < 3 chars — `sequence` is CASE-guarded because a
    * descending range is Spark's default when end < start).
    *
    * The argument must be a plain column reference, never the [[triNorm]]
    * expression inline: HOF lambdas re-evaluate captured expressions PER
    * ELEMENT, so an inlined regex-normalize chain makes trigram extraction
    * O(len²) regex work per document — measured 200+ s at sf0.1 vs 2 s
    * materialized (the same trap `withRepetitionScore` documents). */
  private def triGramsOf(s: Column): Column =
    when(length(s) >= 3,
      transform(sequence(lit(1), length(s) - 2), i => s.substr(i, lit(3))))
      .otherwise(array())

  /** TRAINED character-trigram language profiles — Cavnar & Trenkle's
    * n-gram text categorization (the classic trained langid real pipelines
    * run, e.g. textcat): per language, the top-`k` trigrams of the labeled
    * corpus ranked by frequency (count DESC, trigram ASC tie-break — fully
    * deterministic). Output (lang, tri, lang_rank), at most `langs × k`
    * rows — a BROADCAST-sized model no matter how large the training
    * corpus, produced by one count aggregate + one per-language window.
    * NULL-lang rows train no class (a NULL label is not a language). */
  def trigramProfiles(df: DataFrame, langCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("tri"))
    df.filter(col(langCol).isNotNull)
      .select(col(langCol).as("lang"), triNorm(textCol).as("__s"))
      .select(col("lang"), explode(triGramsOf(col("__s"))).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("n"))
      .withColumn("lang_rank", row_number().over(w))
      .filter(col("lang_rank") <= k)
      .select("lang", "tri", "lang_rank")
  }

  /** Classify each document against trained [[trigramProfiles]] by
    * out-of-place rank distance: build the document's own top-`k` trigram
    * profile, then for every candidate language sum |doc_rank − lang_rank|
    * per shared trigram and `k` (the max penalty) per trigram absent from
    * the language profile; argmin wins (lang ASC tie-break). ALL-INTEGER
    * algebra — rank statistics cross engines exactly, where log-prob Naive
    * Bayes would hash-drift on 1-ulp `ln` differences.
    *
    * Scale shape: two doc-keyed shuffles (trigram count + profile window);
    * the per-language fan-out is a crossJoin against the BROADCAST distinct
    * language list (tens of rows) and the profile join is broadcast too —
    * the corpus never replicates beyond `k × langs` rows per doc. Documents
    * with no trigrams (< 3 normalized chars) emit no row. */
  def trigramLanguageId(df: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // doc-local plan (r11, same shape as [[trigramLanguageIdSelf]]): the
    // model is broadcast-sized by construction (≤ langs×k rows), so
    // collect it once and classify each document in place — zero
    // doc-keyed shuffles. A profile trigram that is not 3 ASCII chars can
    // never match a normalized doc trigram (the normalized alphabet is
    // [a-z0-9_]); dropping it changes no distance, since the absence
    // penalty is charged per DOC trigram. NULL-lang profile rows are
    // dropped too (r12): a NULL label is not a language class, and no SQL
    // oracle can score one — `lang = NULL` never matches, so a NULL class
    // would silently degenerate to the all-absent penalty there while
    // scoring normally here.
    val model: Map[String, scala.collection.mutable.LongMap[Int]] =
      profiles.filter(col("lang").isNotNull)
        .select(col("lang").cast("string"), col("tri").cast("string"),
          col("lang_rank").cast("int")).collect()
        .groupBy(_.getString(0)).map { case (lang, rows) =>
          val m = scala.collection.mutable.LongMap.empty[Int]
          rows.foreach { r =>
            val t = packTri(r.getString(1))
            if (t >= 0) m.update(t, r.getInt(2))
          }
          lang -> m
        }
    classifyAgainstModel(
      df.select(col(idCol), col(textCol).cast("string")), idCol, model, k)
  }

  /** (c0<<16)|(c1<<8)|c2 of a 3-char ASCII trigram, -1 if not packable. */
  private def packTri(t: String): Long =
    if (t != null && t.length == 3 &&
      t.charAt(0) < 128 && t.charAt(1) < 128 && t.charAt(2) < 128)
      (t.charAt(0).toLong << 16) | (t.charAt(1).toLong << 8) | t.charAt(2).toLong
    else -1L

  /** JVM twin of [[triNorm]] for the doc-local langid path: lower →
    * strip [^a-z0-9\s] → collapse \s+ → trim → spaces to '_', as ONE char
    * scan instead of the regex chain (String.replaceAll recompiles its
    * Pattern per call — 4 compiles per document dominated the x100 pass).
    * Equivalence: after String.toLowerCase (the full-string form — the
    * per-char form mishandles 1:N mappings like U+0130), every maximal
    * run of non-[a-z0-9] characters becomes exactly one '_' unless it
    * touches an end (trim); Java's \s is ASCII-only, so whitespace and
    * junk collapse identically to the junk→space, \s+→space, trim
    * pipeline. Output alphabet is exactly [a-z0-9_], pure ASCII. */
  private[graft] def triNormJvm(text: String): String = {
    if (text == null) return ""
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(s.length)
    var sep = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (sep && sb.length > 0) sb.append('_')
        sep = false
        sb.append(c)
      } else sep = true
      i += 1
    }
    sb.toString
  }

  /** Per-document trigram counts over the normalized text, keys packed as
    * (c0<<16)|(c1<<8)|c2 — all chars are ASCII after [[triNormJvm]], so
    * NUMERIC packed order == LEXICOGRAPHIC trigram order and every
    * rank tie-break below matches the windowed/string form exactly.
    * LongMap is primitive-specialized: no boxing on the hot path. */
  private[graft] def triCountsPacked(text: String): scala.collection.mutable.LongMap[Int] = {
    val s = triNormJvm(text)
    val m = scala.collection.mutable.LongMap.empty[Int]
    var i = 0
    while (i + 2 < s.length) {
      val key = (s.charAt(i).toLong << 16) | (s.charAt(i + 1).toLong << 8) | s.charAt(i + 2).toLong
      m.update(key, m.getOrElse(key, 0) + 1)
      i += 1
    }
    m
  }

  /** Top-`k` trigrams of a count map as (packedTri, rank), rank 1-based by
    * (count DESC, trigram ASC) — the exact window tie-break. */
  private def topKPacked(m: scala.collection.mutable.LongMap[Int], k: Int): Array[(Long, Int)] = {
    val arr = m.toArray
    java.util.Arrays.sort(arr, Ordering.by[(Long, Int), (Int, Long)](e => (-e._2, e._1)))
    arr.take(k).zipWithIndex.map { case ((t, _), i) => (t, i + 1) }
  }

  /** Train AND classify over the same corpus — the self-calibrating form
    * q138 gates. Semantically identical to `trigramProfiles` +
    * [[trigramLanguageId]], re-planned doc-locally (r11): a document's
    * trigram counts, its top-`k` profile, and its out-of-place distance
    * against a broadcast model are all PER-DOCUMENT state, so none of it
    * needs a shuffle — mapPartitions counts trigrams into a packed-int
    * LongMap per doc (the expression form would rebuild an immutable map
    * per element) and classifies against the collected rank model. The
    * ONLY shuffle left is the vocabulary-keyed (lang, tri) profile
    * aggregate, whose input is per-doc DISTINCT trigrams and whose output
    * is the ≤ langs×k broadcast model. The previous plan's corpus-sized
    * (doc, lang, tri, n) frame — localCheckpointed and shuffled twice
    * more (doc-rank window, classify groupBy) — is gone: measured
    * 107 → 18 s on the 100× rehearsal set (500k docs), same oracle
    * answer to the row. Documents with no trigrams emit no row; NULL-lang
    * documents train NO class (a NULL label is not a language — see
    * [[trigramLanguageId]]) but are still classified against the named
    * languages. */
  def trigramLanguageIdSelf(df: DataFrame, idCol: String, langCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // vocabulary pass: per-doc distinct (tri, n) -> one small shuffle
    val wLang = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("tri"))
    val profRows = df.select(col(langCol).cast("string"), col(textCol).cast("string"))
      .filter(col(langCol).isNotNull)
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (lang, text) =>
          triCountsPacked(text).iterator.map { case (t, n) => (lang, t, n.toLong) }
        }
      }.toDF("lang", "tri", "n")
      .groupBy("lang", "tri").agg(sum("n").as("n"))
      .withColumn("lang_rank", row_number().over(wLang))
      .filter(col("lang_rank") <= k)
      .select("lang", "tri", "lang_rank")
      .collect()
    val model: Map[String, scala.collection.mutable.LongMap[Int]] =
      profRows.groupBy(_.getString(0)).map { case (lang, rows) =>
        val m = scala.collection.mutable.LongMap.empty[Int]
        rows.foreach(r => m.update(r.getLong(1), r.getInt(2)))
        lang -> m
      }
    classifyAgainstModel(
      df.select(col(idCol), col(textCol).cast("string")), idCol, model, k)
  }

  /** Doc-local out-of-place-distance classification against a collected
    * rank model (shared by both langid forms): each document's top-`k`
    * profile and its distance to every language are computed in place —
    * no shuffle. Documents with no trigrams emit no row. `docs` must be
    * a two-column (id, text) projection; the id column passes through in
    * its ORIGINAL type — the pre-r12 path cast ids to long, silently
    * NULL-collapsing string ids (ADVICE r11). Model keys are non-null by
    * construction (both trainers drop NULL-lang rows), so the plain JVM
    * string sort matches the oracle's `ORDER BY dist, lang` with no
    * NULL-placement divergence (Spark orders NULL first, DuckDB last). */
  private def classifyAgainstModel(docs: DataFrame, idCol: String,
      model: Map[String, scala.collection.mutable.LongMap[Int]], k: Int): DataFrame = {
    val spark = docs.sparkSession
    require(model.keysIterator.forall(_ != null),
      "langid model keys must be non-null (NULL-lang rows are dropped at training)")
    // argmin candidate order = (dist ASC, lang ASC); strict < keeps the
    // first (lowest-sorting) language on ties
    val langsOrdered: Array[String] = model.keys.toArray.sorted
    val bcModel = spark.sparkContext.broadcast(model)
    val bcLangs = spark.sparkContext.broadcast(langsOrdered)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      docs.schema.head.copy(name = idCol),
      org.apache.spark.sql.types.StructField("pred_lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("best_dist",
        org.apache.spark.sql.types.LongType, nullable = false)))
    docs.mapPartitions { (it: Iterator[org.apache.spark.sql.Row]) =>
      val m = bcModel.value
      val langs = bcLangs.value
      it.flatMap { row =>
        val text = if (row.isNullAt(1)) null else row.getString(1)
        val top = topKPacked(triCountsPacked(text), k)
        if (top.isEmpty || langs.isEmpty) None
        else {
          var bestLang: String = null
          var bestDist = Long.MaxValue
          var li = 0
          while (li < langs.length) {
            val ranks = m(langs(li))
            var d = 0L
            var ti = 0
            while (ti < top.length) {
              val (t, dr) = top(ti)
              val lr = ranks.getOrElse(t, -1) // ranks are >= 1; -1 = absent
              d += (if (lr < 0) k.toLong else math.abs(dr - lr).toLong)
              ti += 1
            }
            if (d < bestDist) { bestDist = d; bestLang = langs(li) }
            li += 1
          }
          Some(org.apache.spark.sql.Row(row.get(0), bestLang, bestDist))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token set —
    * invariant to token order and repetition (a rolling-hash-class
    * fingerprint for shuffle-robust dedup keys). */
  def fingerprint(textCol: String): Column =
    md5(array_join(sort_array(array_distinct(tokens(textCol))), " "))

  /** Canonical text normalization for dedup: lowercase, strip everything
    * outside `[a-z0-9\s]`, collapse whitespace runs, trim. Two documents
    * differing only in case/punctuation/spacing normalize identically —
    * run exact or near-dup over the normalized column to catch the
    * formatting-only duplicates raw hashing misses. Pure codegen'd
    * builtins; the identical regex pipeline runs in any SQL engine. */
  def normalizeText(textCol: String): Column =
    trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  private val EmailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val PhonePat = "\\b[0-9]{3}[-.]?[0-9]{3}[-.]?[0-9]{4}\\b"

  /** PII scrubbing for training text: emails and NANP-style phone numbers
    * replaced with typed sentinels. Counting happens BEFORE redaction (the
    * counts drive per-source PII-rate quality gates); both the patterns and
    * the replacement run as codegen'd regexp builtins, portable to any
    * RE2-compatible engine. Extend by chaining further patterns — order
    * matters (emails first: a phone-looking run inside an email must not
    * split it). */
  def redactPii(textCol: String): Column =
    regexp_replace(regexp_replace(col(textCol), EmailPat, "<EMAIL>"), PhonePat, "<PHONE>")

  def piiCounts(textCol: String): (Column, Column) = {
    // SQL string literals consume backslash escapes ('\b' -> backspace):
    // double them so the REGEX sees \b, matching the DSL-path patterns
    def sqlLit(p: String) = p.replace("\\", "\\\\")
    (size(expr(s"regexp_extract_all($textCol, '${sqlLit(EmailPat)}', 0)")).cast("long"),
      size(expr(s"regexp_extract_all($textCol, '${sqlLit(PhonePat)}', 0)")).cast("long"))
  }

  /** Card-number candidates: 13–19 digits, optionally space/dash-grouped
    * (the formats payment numbers are actually typed in). */
  private val CardCandPat = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Luhn check as a pure SQL lambda over a digit string `d`: double every
    * second digit from the RIGHT, fold digit sums, valid ⇔ mod 10 == 0 —
    * the ISO/IEC 7812 checksum every real payment number carries, which is
    * what separates an actual PAN from 16 arbitrary digits (a 10× false-
    * positive cut no regex alone gets). Integer-only, engine-portable. */
  private def luhnSql(d: String): String = {
    val v = s"CAST(substr(reverse($d), i, 1) AS INT)"
    s"aggregate(sequence(1, length($d)), 0, (acc, i) -> acc + " +
      s"(CASE WHEN i % 2 = 0 THEN CASE WHEN 2 * $v > 9 THEN 2 * $v - 9 ELSE 2 * $v END " +
      s"ELSE $v END)) % 10 = 0"
  }

  /** (candidate count, Luhn-valid count) over card-number-shaped digit
    * runs — the PII class [[piiCounts]]' email/phone patterns miss. Both
    * scan-fused codegen'd-HOF expressions; the valid count gates redaction
    * policy (a corpus slice with REAL validated PANs is quarantined, not
    * just scrubbed). */
  def cardCounts(textCol: String): (Column, Column) = {
    val cands = s"transform(regexp_extract_all($textCol, '${CardCandPat.replace("\\", "\\\\")}', 0), " +
      "c -> regexp_replace(c, '[^0-9]', ''))"
    val inRange = "length(d) >= 13 AND length(d) <= 19"
    (size(expr(s"filter($cands, d -> $inRange)")).cast("long"),
      size(expr(s"filter($cands, d -> $inRange AND ${luhnSql("d")})")).cast("long"))
  }

  /** Conservative card redaction: every candidate run (valid or not)
    * becomes `<CARD>` — redaction errs on the side of removal; the
    * [[cardCounts]] valid count is the signal that decides quarantine. */
  def redactCards(textCol: String): Column =
    regexp_replace(col(textCol), CardCandPat, "<CARD>")

  /** Driver/test helper: the check digit making `digits + d` Luhn-valid. */
  def luhnCheckDigit(digits: String): Int = {
    var sum = 0
    var i = digits.length - 1
    var pos = 1 // position from the right in the FULL number (check digit = 0)
    while (i >= 0) {
      val v = digits.charAt(i) - '0'
      val dv = if (pos % 2 == 1) { val t = 2 * v; if (t > 9) t - 9 else t } else v
      sum += dv
      i -= 1; pos += 1
    }
    (10 - sum % 10) % 10
  }

  /** IBAN candidate pattern: 2 country letters, 2 check digits, 11–30
    * alphanumerics (the ISO 13616 length envelope), on word boundaries. */
  private val IbanCandPat = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

  /** ISO 13616 mod-97 validity of one candidate string, as a pure
    * higher-order-function expression (codegen-friendly, no UDF): move the
    * first four chars to the end, expand letters to two digits (A=10 …
    * Z=35), then fold `(acc·10 + digit) mod 97` left-to-right — the
    * standard incremental remainder, so the 30+-digit number never
    * materializes. Valid iff the remainder is 1. */
  private def ibanValidExpr(cand: String): String = {
    val digits = s"""concat_ws('', transform(
       |  filter(split(concat(substring($cand, 5), substring($cand, 1, 4)), ''), ch -> ch <> ''),
       |  ch -> CASE WHEN ch >= '0' AND ch <= '9' THEN ch
       |             ELSE cast(ascii(ch) - 55 AS string) END))""".stripMargin
    s"""aggregate(filter(split($digits, ''), d -> d <> ''),
       |  cast(0 AS bigint), (acc, d) -> (acc * 10 + (ascii(d) - 48)) % 97) = 1""".stripMargin
  }

  /** (candidate count, mod-97-valid count) of IBANs in `textCol` — the
    * bank-account sibling of [[cardCounts]]: candidates gate redaction,
    * the checksum separates real leaks from random uppercase noise. One
    * `regexp_extract_all` + per-candidate integer fold, fused into the
    * scan. */
  def ibanCounts(textCol: String): (Column, Column) = {
    // SQL string literals eat one level of backslash — double them so the
    // regex engine sees \b, not a backspace char (the Column-API redaction
    // below takes the pattern raw)
    val sqlPat = IbanCandPat.replace("\\", "\\\\")
    val cands = s"regexp_extract_all($textCol, '$sqlPat', 0)"
    (size(expr(cands)).cast("long"),
      size(expr(s"filter($cands, c -> ${ibanValidExpr("c")})")).cast("long"))
  }

  /** Conservative IBAN redaction: every candidate (valid or not) becomes
    * `<IBAN>` — same quarantine contract as [[redactCards]]. */
  def redactIbans(textCol: String): Column =
    regexp_replace(col(textCol), IbanCandPat, "<IBAN>")

  /** Driver/test helper: the two check digits making `country + cc + bban`
    * pass mod-97 (ISO 13616 generation: remainder of BBAN + country + "00",
    * check = 98 − r). */
  def ibanCheckDigits(country: String, bban: String): Int = {
    def expand(s: String): String = s.flatMap { c =>
      if (c.isDigit) c.toString else (c - 'A' + 10).toString
    }
    val r = expand(bban + country + "00").foldLeft(0L)((acc, d) => (acc * 10 + (d - '0')) % 97)
    (98 - r).toInt
  }

  /** Word n-gram repetition score in [0, 100]: the percentage of n-grams
    * that are repeats of an earlier one — the Gopher/C4-style signal that
    * flags boilerplate and generation loops. Integer output
    * (`(total-distinct)*100/total`, 0 for short texts) keeps the score
    * engine-exact.
    *
    * DF-level on purpose: HOFs are interpreted per element, so the gram
    * array MUST be materialized once as its own column — referencing the
    * `transform(...)` expression from each of the three places the formula
    * needs it re-evaluates the whole array each time (measured 8× slower;
    * same trap the winnowing operator hit). */
  def withRepetitionScore(df: DataFrame, textCol: String, outCol: String, n: Int = 3): DataFrame =
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("__grams", expr(
        s"transform(sequence(0, greatest(size(__w) - $n, 0)), i -> array_join(slice(__w, i + 1, $n), ' '))"))
      .withColumn(outCol, expr(
        s"""CASE WHEN size(__w) < $n THEN CAST(0 AS BIGINT)
           |ELSE CAST((size(__grams) - size(array_distinct(__grams))) * 100 DIV size(__grams) AS BIGINT)
           |END""".stripMargin))
      .drop("__w", "__grams")

  /** Winnowing fingerprint (the rolling-hash document-fingerprint scheme):
    * hash every character k-gram via a polynomial rolling hash mod a prime,
    * then keep the MINIMUM hash of each window of `w` consecutive k-grams —
    * the standard plagiarism/near-dup fingerprint selection. Returns the
    * sorted distinct selected hashes; two documents sharing long substrings
    * share fingerprints regardless of position.
    *
    * Pure integer arithmetic (char codes, base 257, prime mod < 2^31) —
    * engine-exact; expressed with HOFs over one k-gram array per row. */
  /** k-gram polynomial rolling hashes of `textCol` (base 257 mod prime) —
    * materialize this as its own column BEFORE winnowing: nesting it inside
    * the winnow lambda would re-evaluate the whole gram array per window. */
  def gramHashesSql(textCol: String, k: Int = 8): String = {
    val P = 1000000007L // prime modulus; acc*257+c stays well under 2^63
    s"""transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)),
       |  i -> aggregate(transform(sequence(0, ${k - 1}),
       |         j -> ascii(substring($textCol, i + j, 1))),
       |       cast(0 as bigint), (acc, c) -> (acc * 257 + c) % $P))""".stripMargin
  }

  /** Winnowing selection over a MATERIALIZED gram-hash array column: the
    * minimum of every `w`-window, distinct and sorted. */
  def winnowSql(ghCol: String, w: Int = 4): String =
    s"""array_sort(array_distinct(transform(
       |  sequence(1, greatest(size($ghCol) - ${w - 1}, 1)),
       |  i -> array_min(slice($ghCol, i, $w)))))""".stripMargin

  /** Winnowing fingerprint pipeline (the rolling-hash document-fingerprint
    * scheme): adds `outCol` with the sorted distinct window-min hashes —
    * computed by the native [[graft.functions.WinnowingFingerprints]]
    * expression (one compiled loop per row; the HOF formulation above is
    * the portable spec, ~50× slower interpreted). */
  def withWinnowingFingerprints(df: DataFrame, textCol: String, outCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn(outCol, graft.functions.GraftFunctions.winnowing(col(textCol), k, w))
  }

  /** HOF (portable-spec) form of [[withWinnowingFingerprints]] — used by
    * specs to prove the native expression equivalent. */
  def withWinnowingFingerprintsHof(df: DataFrame, textCol: String, outCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    df.withColumn("__gh", expr(gramHashesSql(textCol, k)))
      .withColumn(outCol, expr(winnowSql("__gh", w)))
      .drop("__gh")

  /** Distinctive terms per document — TF-IDF's ranking without its float:
    * rank a document's tokens by (term frequency DESC, corpus document
    * frequency ASC, token ASC). The float IDF log only MONOTONICALLY
    * transforms df, so ordering by raw (tf, −df) selects the same top
    * terms while staying integer-exact — `ln` differs in last-ulp between
    * libm implementations, which would break cross-engine hash parity.
    *
    * Plan: one explode + distinct for document frequencies, one explode +
    * count for term frequencies, an equi-join on the token, a per-doc
    * window for the top-k. All shuffles are on token/doc keys — linear. */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = Par.ensureParallel(df)
      .select(col(idCol), explode(tokens(textCol)).as("token"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"))
  }

  /** Gopher-style document quality rules — the published rule family from
    * the Gopher corpus paper (word-count bounds, mean-word-length band,
    * symbol-to-word ratio, alphabetic-word fraction, stopword presence),
    * each evaluated in INTEGER arithmetic so the verdicts are engine-exact:
    * "mean word length in [3, 10]" becomes `3·n ≤ Σlen ≤ 10·n` — no float
    * division anywhere. Emits the raw counts plus one boolean per rule and
    * the conjunction, so a pipeline can filter on `passes_all` or log
    * per-rule rejection rates. Pure per-row expressions — no shuffle. */
  /** Shared rule machinery: appends the integer signal columns plus the
    * per-rule flags and `passes_all` (token array materialized ONCE — the
    * HOF re-evaluation trap). Used by both the report and filter forms. */
  private def withGopherVerdicts(
      df: DataFrame, textCol: String, stopwords: Seq[String],
      minWords: Int, maxWords: Int, minMeanLen: Int, maxMeanLen: Int,
      maxSymbolPct: Int, minAlphaPct: Int, minStopwordHits: Int): DataFrame =
    df.withColumn("__t", tokens(textCol))
      .withColumn("n_words", size(col("__t")).cast("long"))
      .withColumn("sum_word_chars",
        expr("aggregate(__t, cast(0 as bigint), (acc, x) -> acc + length(x))"))
      .withColumn("n_symbol_words",
        size(expr("filter(__t, x -> x rlike '^[#@]|\\\\.{3}$')")).cast("long"))
      .withColumn("n_alpha_words",
        size(expr("filter(__t, x -> x rlike '[a-zA-Z]')")).cast("long"))
      .withColumn("n_stopword_hits",
        size(expr(s"filter(__t, x -> array_contains(${stopArrSql(stopwords)}, x))")).cast("long"))
      .drop("__t")
      .withColumn("ok_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("sum_word_chars") >= col("n_words") * minMeanLen &&
          col("sum_word_chars") <= col("n_words") * maxMeanLen)
      .withColumn("ok_symbols", col("n_symbol_words") * 100 <= col("n_words") * maxSymbolPct)
      .withColumn("ok_alpha", col("n_alpha_words") * 100 >= col("n_words") * minAlphaPct)
      .withColumn("ok_stopwords", col("n_stopword_hits") >= minStopwordHits)
      .withColumn("passes_all",
        col("ok_word_count") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))

  private val GopherCols = Seq(
    "n_words", "sum_word_chars", "n_symbol_words", "n_alpha_words", "n_stopword_hits",
    "ok_word_count", "ok_mean_len", "ok_symbols", "ok_alpha", "ok_stopwords", "passes_all")

  def gopherQualityRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      maxSymbolPct: Int = 10,
      minAlphaPct: Int = 80,
      minStopwordHits: Int = 2
  ): DataFrame =
    withGopherVerdicts(df, textCol, stopwords, minWords, maxWords, minMeanLen,
      maxMeanLen, maxSymbolPct, minAlphaPct, minStopwordHits)
      .select((idCol +: GopherCols).map(col): _*)

  /** Filter form of [[gopherQualityRules]]: keeps only passing documents,
    * original columns intact — the quality gate stage of a curation
    * pipeline. Same rule arithmetic (shared implementation), zero shuffle.
    * The rule machinery claims the 11 gopher column names internally, so
    * input frames must not already carry them (checked — silently
    * overwriting and then dropping a caller's `n_words` would lose data). */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      stopwords: Seq[String],
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      maxSymbolPct: Int = 10,
      minAlphaPct: Int = 80,
      minStopwordHits: Int = 2
  ): DataFrame = {
    val clash = df.columns.toSet.intersect(GopherCols.toSet)
    require(clash.isEmpty,
      s"gopherFilter reserves columns ${clash.mkString(", ")} — rename them on the input frame")
    withGopherVerdicts(df, textCol, stopwords, minWords, maxWords, minMeanLen,
      maxMeanLen, maxSymbolPct, minAlphaPct, minStopwordHits)
      .filter(col("passes_all"))
      .drop(GopherCols: _*)
  }

  /** Vocabulary coverage / out-of-vocabulary rate: build the corpus top-`v`
    * vocabulary (by total occurrences, ties broken token-ASC so the cut is
    * deterministic), then count each document's in-vocab and OOV token
    * occurrences. The tokenizer-coverage audit run before committing to a
    * vocab size.
    *
    * Scale shape: token counts are one explode + one agg; the vocabulary is
    * `v` rows — collected to the driver and rejoined as a BROADCAST set, so
    * the per-document pass is shuffle-free on the fact side (explode →
    * broadcast semi-match → per-doc agg). */
  def oovStats(df: DataFrame, idCol: String, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = df.select(col(idCol), explode(tokens(textCol)).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(vocabSize)
      .select(col("token"))
    toks.join(broadcast(vocab).withColumn("__in", lit(1)), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in"), lit(0))).cast("long").as("in_vocab"))
      .withColumn("oov", col("n_tokens") - col("in_vocab"))
      .withColumn("oov_pct_x100",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("oov * 10000 div n_tokens").cast("long")))
  }

  /** Token-rarity score — the surprisal-shaped quality signal computed
    * WITHOUT a language model: rank the corpus top-`vocabSize` tokens
    * 1..V by frequency (count DESC, token ASC — the [[oovStats]] cut), give
    * out-of-vocab tokens rank V+1, and score each document by its mean
    * token rank (×100, integer). Common-word prose scores low; rare-token /
    * OOV-heavy noise scores high — the cheap stand-in for LM-perplexity
    * filtering, fully rank-based so it is integer-exact across engines
    * (a float log-prob would never hash-match).
    *
    * Scale shape: vocab is a bounded top-V aggregate broadcast to the
    * token join — the corpus side never shuffles on the token. */
  def rarityScore(df: DataFrame, idCol: String, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = df.select(col(idCol), explode(tokens(textCol)).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(vocabSize)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("token").asc)))
      .select(col("token"), col("rank"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("rank"), lit(vocabSize + 1)).cast("long")).as("sum_rank"))
      .withColumn("mean_rank_x100",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("sum_rank * 100 div n_tokens").cast("long")))
  }

  /** Collocation mining — adjacent-token pairs ranked by LIFT, the
    * integer-exact PMI ordering: lift = P(xy)/(P(x)·P(y)) =
    * c(xy)·N / (c(x)·c(y)), and since log is monotone, ranking by
    * fixed-point lift IS ranking by pointwise mutual information without
    * a cross-engine float log ever entering the gate. The classic
    * collocation detector (Church & Hanks association ratio) a corpus
    * pipeline runs to find multiword expressions worth protecting from
    * tokenizer splits.
    *
    * Scale shape: one unigram explode + one bigram explode, three hash
    * aggregations (map-side combined), then two joins of the SURVIVING
    * bigram table (already cut to `minCount`, typically tiny) against the
    * unigram counts — at 100 TB the bigram table after a sane minCount is
    * broadcast-sized and the corpus itself never shuffles twice. The
    * unigram frame materializes once (localCheckpoint) because it feeds
    * the total-count scalar AND both join sides.
    *
    * Overflow headroom: lift numerator is c(xy)·N·10^6 ≤ N²·10^6, safe in
    * a signed 64-bit for corpora to ~3·10^6 tokens per partition-exact
    * count; beyond that callers should pre-scale counts (documented, not
    * silently truncated). Output: (x, y, c_xy, c_x, c_y, lift_x1m), top
    * `topK` by (lift DESC, x, y) — a total order, so the cut is
    * deterministic. */
  def collocations(df: DataFrame, textCol: String,
      minCount: Long = 3, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1, "minCount and topK must be positive")
    val toks = df.select(tokens(textCol).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val total = uni.agg(sum(col("c"))).head().getLong(0)
    val bigrams = toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] as x, w[i+1] as y))")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    bigrams
      .join(uni.select(col("t").as("x"), col("c").as("c_x")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("c_y")), "y")
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        expr(s"c_xy * ${total}L * 1000000L div (c_x * c_y)").as("lift_x1m"))
      .orderBy(col("lift_x1m").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** Token diversity per document — the Gini–Simpson index 1 − Σcᵢ(cᵢ−1) /
    * (N(N−1)): the probability two tokens drawn without replacement
    * differ. The log-free diversity signal (entropy's integer-exact
    * sibling): template/boilerplate pages score low, natural prose high —
    * and unlike Shannon entropy it needs no float log, so the gate is
    * bit-identical cross-engine in ×10^6 fixed point.
    *
    * Scale shape: one explode + two map-side-combined aggregations, both
    * keyed on the doc — no corpus-global state at all. Docs with zero
    * tokens drop out (diversity of nothing is undefined); single-token
    * docs report 0. */
  def tokenDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(textCol)).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("__n") * (col("__n") - 1)).as("__rep"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        when(col("n_tokens") >= 2,
          lit(1000000L) - expr("__rep * 1000000 div (n_tokens * (n_tokens - 1))"))
          .otherwise(lit(0L)).as("simpson_x1m"))

  /** Document-level co-occurrence lift — the A-Priori-pruned market-basket
    * pass over tokens: pairs of DISTINCT terms that appear in the same
    * document, both individually frequent (doc-frequency ≥ `minDf` — the
    * A-Priori monotonicity cut that bounds everything downstream), ranked
    * by lift over doc-frequencies co_df·D / (df_x·df_y) in ×10^6 integer
    * fixed point. [[collocations]] finds ADJACENT pairs (phrases); this
    * finds topical association at document range.
    *
    * Scale shape: the frequent-vocabulary joins are plain equi-joins —
    * Catalyst/AQE broadcasts them when the vocab is small and falls back
    * to a hash join when a web-scale minDf leaves millions of frequent
    * terms (a FORCED broadcast here would OOM the driver at 100 TB; don't
    * hint what the planner can measure). Each doc reduces to its sorted
    * distinct frequent terms, capped at `maxTermsPerDoc` (head of the
    * sorted array — deterministic; prevents one pathological doc from
    * emitting a quadratic pair blast); in-doc pairs generate from the
    * capped array exactly like the LSH bucket pairing. No corpus
    * self-join. */
  def cooccurrencePairs(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5, minPairDf: Long = 3, maxTermsPerDoc: Int = 200,
      topK: Int = 50): DataFrame = {
    val docTerms = df
      .select(col(idCol), explode(array_distinct(tokens(textCol))).as("t"))
    val docTermsC = docTerms.localCheckpoint() // feeds df-counts AND the pair build
    val dfCounts = docTermsC.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .localCheckpoint() // feeds the semi-join and both lift joins
    val nDocs = df.count()
    val pairs = docTermsC
      .join(dfCounts.select(col("t")), Seq("t"))
      .groupBy(col(idCol))
      .agg(slice(sort_array(collect_list(col("t"))), 1, maxTermsPerDoc).as("__ts"))
      .select(explode(expr(
        """flatten(transform(__ts, (a, i) ->
          |  transform(slice(__ts, i + 2, size(__ts)), b -> struct(a as x, b as y))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("co_df"))
      .filter(col("co_df") >= minPairDf)
    pairs
      .join(dfCounts.select(col("t").as("x"), col("df").as("df_x")), "x")
      .join(dfCounts.select(col("t").as("y"), col("df").as("df_y")), "y")
      .select(col("x"), col("y"), col("co_df"), col("df_x"), col("df_y"),
        expr(s"co_df * ${nDocs}L * 1000000L div (df_x * df_y)").as("lift_x1m"))
      .orderBy(col("lift_x1m").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** HTML → text extraction — the FIRST transform of every web-crawl
    * pipeline (upstream of all quality/dedup signals here): drop script /
    * style / comment blocks wholesale (non-greedy, case-insensitive,
    * dot-matches-newline — a `</p>` inside a JS string literal must not
    * terminate the script block early), strip remaining tags, decode the
    * five core entities (+ nbsp; ampersand LAST, standard order), and
    * collapse whitespace. Pure codegen'd `regexp_replace` chain fused into
    * the scan — no UDF, no parser state, embarrassingly parallel. A real
    * DOM parser handles pathological markup better; this is the regex
    * tier every large-scale pipeline actually runs first. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** BM25 keyword retrieval: score every document against a small fixed
    * query-term set (Robertson/Okapi BM25, the log-idf formulation
    * `ln((N - df + 0.5)/(df + 0.5) + 1)`) and keep the top `k` — the
    * retrieval primitive a curation pipeline uses for targeted corpus
    * slices ("all docs about X") and contamination probes.
    *
    * Scale shape: ONE corpus-stats aggregate (N, Σdl, and one df counter
    * per query term — a single 1-row reduction, no per-term passes)
    * broadcast back via a 1-row crossJoin; per-doc tf/score is then a pure
    * map expression and the only ordering work is the TakeOrdered top-k.
    * The corpus never shuffles. Query terms are bounded (≤16) because each
    * adds one counter to the stats row and one `size(filter(...))` to the
    * map stage.
    *
    * Engine parity: every arithmetic step is IEEE +,-,*,/ on exactly-
    * representable inputs (bit-identical across engines); `ln` is the one
    * libm call and can differ by 1 ulp on ~0.1% of df values, so callers
    * hash-comparing across engines should render the score at ≤4 decimal
    * places (a 1-ulp input flips a 4-decimal rounding with probability
    * ~1e-12 per value). The per-term sum is written as an explicit
    * left-associated chain — never a float SUM() whose order could vary
    * with partitioning. */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: String = "1.2",
      b: String = "0.75"
  ): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 16, "1..16 query terms")
    require(k > 0, "k must be positive")
    val base = df.select(col(idCol), tokens(textCol).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val statAggs =
      Seq(count(lit(1)).cast("double").as("__n"), sum(col("__dl")).as("__sumdl")) ++
        queryTerms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__toks"), t), 1.0d).otherwise(0.0d)).as(s"__df$i")
        }
    val stats = base.agg(statAggs.head, statAggs.drop(1): _*)
    val withTf = queryTerms.zipWithIndex.foldLeft(base.crossJoin(broadcast(stats))) {
      case (acc, (t, i)) =>
        val esc = t.replace("\\", "\\\\").replace("'", "\\'")
        acc.withColumn(s"__tf$i",
          expr(s"cast(size(filter(__toks, x -> x = '$esc')) as double)"))
    }
    // textual shape mirrored by the DuckDB oracle (bm25DuckScore) so both
    // engines evaluate the identical IEEE expression tree
    val perTerm = queryTerms.indices.map { i =>
      s"(ln((__n - __df$i + 0.5) / (__df$i + 0.5) + 1.0) * " +
        s"(__tf$i * ($k1 + 1.0)) / (__tf$i + $k1 * (1.0 - $b + $b * (__dl / (__sumdl / __n)))))"
    }
    val anyTf = queryTerms.indices.map(i => s"__tf$i").mkString(" + ")
    withTf
      .filter(expr(s"($anyTf) > 0"))
      .withColumn("score", expr(perTerm.mkString(" + ")).cast("decimal(16,4)"))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** N-gram language-model table: for every (n−1)-token prefix, the top-`k`
    * next tokens with counts — the classic count-based LM / autocomplete /
    * contamination-probe artifact a corpus pipeline materializes. Pure
    * relational shape: explode n-grams (per-row generate), count per
    * (prefix, next), rank within prefix (count DESC, token ASC — fully
    * deterministic), keep k. The rank window benefits from the same
    * map-side WindowGroupLimit prune as every top-k-per-group here. */
  def ngramModel(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2, "need n >= 2 (a prefix and a next token)")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val grams = Par.ensureParallel(df)
      .select(tokens(textCol).as("__toks"))
      .select(explode(expr(gramStructsSql(n))).as("g"))
      .select(col("g.prefix"), col("g.next"))
    val counted = grams.groupBy("prefix", "next").agg(count(lit(1)).as("cnt"))
    counted
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("prefix")).orderBy(col("cnt").desc, col("next").asc)))
      .filter(col("rank") <= k)
      .select(col("prefix"), col("rank").cast("long").as("rank"), col("next"), col("cnt"))
  }

  /** Adjacent n-gram (prefix, next) structs of `__toks`, as one array
    * expression. The short-doc guard lives INSIDE the expression (CASE →
    * empty array, explode drops the row) rather than as a `.filter`: the
    * gram stage sits above a [[Par.ensureParallel]] exchange, and a
    * pushable `size(__toks) >= n` predicate would be substituted through
    * the Project and pushed below the exchange, re-running the whole
    * tokenize on the single scan task (the q318 trap). The CASE also
    * keeps `sequence()` from seeing a negative end (which would yield a
    * DESCENDING range, not an empty one). */
  private def gramStructsSql(n: Int): String =
    s"""CASE WHEN size(__toks) >= $n THEN transform(sequence(0, size(__toks) - $n),
       |  i -> named_struct(
       |    'prefix', array_join(slice(__toks, i + 1, ${n - 1}), ' '),
       |    'next', element_at(__toks, i + $n)))
       |ELSE CAST(array() AS ARRAY<STRUCT<prefix: STRING, next: STRING>>) END""".stripMargin

  /** Count-LM fluency score — [[rarityScore]] lifted from unigrams to the
    * [[ngramModel]] table: every document's adjacent n-grams are looked up
    * in the corpus LM and scored by the model RANK of the observed
    * continuation (1 = the most likely next token, `k+1` = not in the
    * model's top-k). Mean rank ×100, integer — fluent in-distribution text
    * scores near 100, shuffled/garbled/foreign text scores near
    * `(k+1)*100`, which is exactly the perplexity-shaped signal a pipeline
    * thresholds on, with NO float log-prob to break cross-engine hashing.
    *
    * Scale shape: the model is a bounded aggregate (≤ k rows per distinct
    * prefix); doc grams join it on (prefix, next) — one hash shuffle each
    * side, both linear. The model side arrives pre-aggregated so the join
    * never amplifies. Docs with fewer than `n` tokens get no grams and are
    * absent from the output (nothing to score). */
  def lmFluencyScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, k: Int = 10): DataFrame = {
    require(n >= 2, "need n >= 2")
    require(k > 0, "k must be positive")
    val model = ngramModel(df, textCol, n, k).select(col("prefix"), col("next"), col("rank"))
    val grams = Par.ensureParallel(df)
      .select(col(idCol), tokens(textCol).as("__toks"))
      .select(col(idCol), explode(expr(gramStructsSql(n))).as("g"))
      .select(col(idCol), col("g.prefix"), col("g.next"))
    grams.join(model, Seq("prefix", "next"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("rank").isNotNull, 1L).otherwise(0L)).cast("long").as("in_model"),
        sum(coalesce(col("rank"), lit((k + 1).toLong))).cast("long").as("sum_rank"))
      .withColumn("mean_rank_x100", expr("sum_rank * 100 div n_grams").cast("long"))
  }

  /** TRUE bigram cross-entropy in HALF-BITS — the CCNet/Wikipedia-LM
    * perplexity filter as exact integer algebra, upgrading the two rank
    * stand-ins ([[rarityScore]] q103, [[lmFluencyScore]] q112) the same
    * way q337's [[charEntropyHalfBits]] upgraded the log-free diversity
    * score: [[Dsir.halfBitLog2]] makes the actual −log₂ p computable
    * identically on both engines. Per document,
    *   xent = mean over bigrams of [hb(c(w1·) + V) − hb(c(w1,w2) + 1)]
    * where c(w1,w2) is the corpus bigram count, c(w1·) the context
    * total (Σ_w c(w1,w)), and V the continuation vocabulary
    * (distinct w2 types) — add-one smoothing, so the term is
    * floor-quantized 2·log₂(1/p̂(w2|w1)) and ALWAYS ≥ 0 (c12+1 ≤ c1+V
    * and hb is monotone). Fluent in-distribution prose scores low;
    * shuffled/garbled/OOV-heavy text scores near 2·log₂ V — the signal
    * CCNet thresholds on, with no float log to break cross-engine
    * hashing. Quantization is ±0.25 bit per bigram and averages out
    * across a document, the q332-measured behavior of this estimator
    * family.
    *
    * Scale shape: the bigram model is ONE count aggregate over the gram
    * explode (map-side combine; output = distinct bigrams); context
    * totals and V derive from that bounded table, NOT a second corpus
    * pass. Scoring re-derives the grams (recomputing the explode beats
    * checkpointing corpus×tokens rows — the [[Dsir]] measurement) and
    * joins the model on its key: keyed shuffles only, nothing
    * broadcast-sized but the 1-row V. Docs with <2 tokens have no
    * bigrams and are absent (nothing to score), like [[lmFluencyScore]].
    * Counts are safe to 2^62 via the two-regime hb. */
  def lmCrossEntropyHalfBits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def grams = Par.ensureParallel(df)
      .select(col(idCol), tokens(textCol).as("__toks"))
      .select(col(idCol), explode(expr(gramStructsSql(2))).as("g"))
      .select(col(idCol), col("g.prefix").as("__w1"), col("g.next").as("__w2"))
    val c12 = grams.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c12"))
    val c1 = c12.groupBy(col("__w1")).agg(sum(col("__c12")).as("__c1"))
    val v = c12.agg(countDistinct(col("__w2")).cast("long").as("__v"))
    grams
      .join(c12, Seq("__w1", "__w2"))
      .join(c1, Seq("__w1"))
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(Dsir.halfBitLog2(col("__c1") + col("__v")) -
            Dsir.halfBitLog2(col("__c12") + 1))
          .cast("long").as("xent_num_hb"))
      .withColumn("xent_halfbits", expr("xent_num_hb div n_bigrams").cast("long"))
  }

  /** Compression-ratio quality signal: `deflated bytes ×100 / raw bytes`
    * per document (UTF-8, `java.util.zip.Deflater` level 6) — the
    * RedPajama/CCNet-style repetition detector: boilerplate and template
    * spam compress far below prose. Real compression in shuffle-free
    * `mapPartitions` (one Deflater reused per partition); the engine-
    * specific byte stream means no SQL oracle — the ordering property
    * (repetitive ≪ prose ≪ random) is spec-gated. Empty/null text → null
    * ratio. */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          if (text == null || text.isEmpty) (id, None: Option[Long], None: Option[Long])
          else {
            val raw = text.getBytes("UTF-8")
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var compressed = 0L
            while (!deflater.finished()) compressed += deflater.deflate(buf)
            (id, Some(raw.length.toLong), Some(compressed * 100L / raw.length))
          }
        }
      }
      .toDF(idCol, "raw_bytes", "compression_pct")
  }

  /** Occurrences of literal `pat` inside an arbitrary Column (the Column
    * twin of [[substrCount]]): (len − len(remove)) / len(pat), portable
    * integer arithmetic in any engine. */
  private def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(regexp_replace(c,
      java.util.regex.Pattern.quote(pat), ""))) / lit(pat.length)).cast("long")

  /** Encoding-artifact audit per document — the mojibake triage a crawl
    * corpus needs before training: UTF-8 text decoded as Latin-1 and
    * re-encoded (the classic double-decode) leaves 'Ã' lead characters
    * and the 'â€' punctuation family; lossy decodes leave U+FFFD
    * replacement characters; binary bleed-through leaves C0 control
    * characters. Each is a per-row counter — pure map-side scan, no
    * shuffle, no UDF; every counter is engine-portable length arithmetic.
    * `artifact` flags any non-zero counter (the drop/requeue signal). */
  def encodingArtifacts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val moji = (occurrences(t0, "\u00c3") + occurrences(t0, "\u00e2\u20ac")).as("moji_marks")
    val repl = occurrences(t0, "\ufffd").as("repl_chars")
    val ctrl = (length(t0) - length(regexp_replace(t0,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long").as("ctrl_chars")
    df.select(col(idCol), moji, repl, ctrl)
      .withColumn("artifact",
        (col("moji_marks") + col("repl_chars") + col("ctrl_chars") > 0L).cast("int"))
  }

  /** Exact phrase (bigram) occurrence counts via a positional-postings
    * adjacency join — the search-index formulation: postings (doc, pos,
    * token) from ONE tokenize pass; occurrences of "w1 w2" are the
    * equi-join of w1-postings with w2-postings shifted one position.
    * BOTH sides are filtered to the phrase vocabulary BEFORE the shuffle,
    * so at corpus scale the join moves only the queried terms' postings —
    * never the full index. Requested phrases absent from the corpus
    * report 0 (left join against the phrase list, which is query-sized
    * and broadcast). */
  def phraseOccurrences(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[(String, String)]): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    val spark = df.sparkSession
    import spark.implicits._
    val postings = df.select(col(idCol).as("__doc"),
      posexplode(tokens(s"lower(`$textCol`)")).as(Seq("__pos", "__tok")))
    val firsts = phrases.map(_._1).distinct
    val seconds = phrases.map(_._2).distinct
    val p1 = postings.filter(col("__tok").isin(firsts: _*))
      .select(col("__doc"), col("__pos"), col("__tok").as("__w1"))
    val p2 = postings.filter(col("__tok").isin(seconds: _*))
      .select(col("__doc"), (col("__pos") - 1).as("__pos"), col("__tok").as("__w2"))
    val wanted = phrases.map { case (a, b) => s"$a $b" }.distinct
    val hits = p1.join(p2, Seq("__doc", "__pos"))
      .select(col("__doc"), concat_ws(" ", col("__w1"), col("__w2")).as("phrase"))
      .filter(col("phrase").isin(wanted: _*))
      .groupBy("phrase")
      .agg(countDistinct("__doc").as("n_docs"), count(lit(1)).as("n_occ"))
    wanted.toDF("phrase").join(hits, Seq("phrase"), "left")
      .select(col("phrase"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"))
  }

  /** Per-source ingest quality report — the monitoring aggregate a corpus
    * pipeline runs on every batch: document and token mass per source plus
    * the Gopher-gate pass rate, all integer (rate in basis points). One
    * pass, one aggregation keyed by the source column; the per-row verdict
    * machinery is [[gopherQualityRules]]'s. */
  def sourceQualityReport(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      stopwords: Seq[String],
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      maxSymbolPct: Int = 10,
      minAlphaPct: Int = 80,
      minStopwordHits: Int = 2
  ): DataFrame =
    withGopherVerdicts(df, textCol, stopwords, minWords, maxWords, minMeanLen,
      maxMeanLen, maxSymbolPct, minAlphaPct, minStopwordHits)
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_stopword_hits")).as("total_stopword_hits"),
        sum(when(col("passes_all"), 1L).otherwise(0L)).as("passing_docs"))
      .withColumn("pass_x10000", expr("passing_docs * 10000 div docs"))
      .withColumn("mean_words_x100", expr("total_words * 100 div docs"))

  /** Approximate corpus-wide top tokens via the Misra–Gries sketch
    * ([[graft.functions.HeavyHitters]]): bounded memory per partition,
    * map-side partial merge — never shuffles the token dictionary. Returns
    * (token, min_count) with min_count a certified LOWER bound; every token
    * with true frequency > n/(capacity+1) is guaranteed present. The scale
    * path for token-frequency audits; the exact gate twin is q63's
    * window-ranked form. */
  def topTokensApprox(df: DataFrame, textCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(tokens(textCol)).as("token")).as[String]
      .select(graft.functions.HeavyHitters.sketch(capacity).toColumn) // typed select: one Seq[Hitter] row
      .toDF("hitters")
      .select(explode(col("hitters")).as("h"))
      .select(col("h.item").as("token"), col("h.min_count"))
  }

  /** Fixed-size overlapping text chunks — the context-window chunking a
    * training/RAG pipeline applies before embedding or packing. Chunk `i`
    * starts at character `i·(chunkSize − overlap)`; chunks cover every
    * character (the last may be short), and the LAST start is the first one
    * whose chunk reaches the end — a tail shorter than the overlap is
    * already inside the previous chunk and must not re-emit (a redundant
    * tail double-feeds ~⅓ of docs into downstream embedding). Chunk count
    * is `max(1, ⌈(len − overlap)/step⌉)`; the max() runs BEFORE the
    * division so both engines' integer division (Spark truncates, DuckDB
    * floors — they differ on negatives) see a non-negative numerator.
    * Empty documents produce no chunks. Pure per-row generate — no
    * shuffle. */
  /** Parse web-server access-log lines (Common/Combined Log Format) into
    * typed columns — the structured-extraction head of any log-analytics
    * ingest. ONE regex evaluated per row, fused into the scan by codegen
    * (`regexp_extract` is a native expression — no UDF); a line that
    * doesn't match the grammar yields `parsed = 0` with NULL fields,
    * never a task failure, so a corrupt shard degrades to a counted
    * quarantine instead of killing the job. CLF's `-` bytes sentinel
    * (no body) maps to 0. Output adds
    * (ip, http_method, url_path, status, resp_bytes, parsed).
    *
    * Scale: stateless per-row projection — no shuffle, embarrassingly
    * parallel, and column pruning drops the raw line immediately after
    * the extract when downstream only keeps the typed fields. */
  def parseAccessLog(df: DataFrame, lineCol: String): DataFrame = {
    val re = """^(\S+) (\S+) (\S+) \[([^\]]+)\] "([A-Z]+) (\S+)[^"]*" (\d{3}) (\d+|-)"""
    def grp(i: Int) = regexp_extract(col(lineCol), re, i)
    val statusS = grp(7)
    df.withColumn("ip", when(grp(1) === "", lit(null)).otherwise(grp(1)))
      .withColumn("http_method", when(grp(5) === "", lit(null)).otherwise(grp(5)))
      .withColumn("url_path", when(grp(6) === "", lit(null)).otherwise(grp(6)))
      .withColumn("status",
        when(statusS === "", lit(null)).otherwise(statusS).cast("long"))
      .withColumn("resp_bytes",
        when(statusS === "", lit(null))
          .when(grp(8) === "-", 0L)
          .otherwise(grp(8).cast("long")))
      .withColumn("parsed", when(statusS === "", 0L).otherwise(1L))
  }

  def chunkText(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
    val step = chunkSize - overlap
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, cast(greatest(length($textCol) - $overlap - 1, 0) div $step as int)),
           |  i -> substring($textCol, i * $step + 1, $chunkSize))""".stripMargin))
        .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  /** Vocabulary growth curve (Heaps-law datasheet row): walk the corpus in
    * `idCol` order split into `nBuckets` equal id-range buckets and report,
    * per bucket, the token occurrences it contributes and how many tokens
    * appear there for the FIRST time. A flattening `new_tokens` column
    * says more data is mostly re-seeing known vocabulary; a linear one
    * says the corpus keeps introducing novelty (or rot: OCR noise and
    * boilerplate mutations show up as unbounded vocabulary growth).
    *
    * Exact and integer: first occurrence = min position over one
    * token-keyed aggregate; positions are `id·2^20 + token_idx` (callers
    * guarantee docs under 2^20 tokens — enforced here with a require on
    * the observed max). Two linear shuffles (token agg, bucket agg); the
    * id→bucket split uses the corpus max id from a 1-row broadcast, so
    * bucket boundaries never need a global sort. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val toks = df
      .select(col(idCol).cast("long").as("__id"),
        posexplode(tokens(textCol)).as(Seq("__ti", "__tok")))
    val bounds = toks.agg(max("__ti").as("__maxTi"), max("__id").as("__maxId"))
    // the 2^20 packing guard lives INSIDE the position expression so
    // column pruning can never drop it
    val positioned = toks.crossJoin(broadcast(bounds))
      .withColumn("__pos", expr(
        """CASE WHEN __maxTi < 1048576 THEN __id * 1048576 + __ti
          |ELSE CAST(raise_error('vocabGrowth: a doc exceeds 2^20 tokens') AS BIGINT)
          |END""".stripMargin))
      .withColumn("bucket",
        expr(s"least(__id * $nBuckets div (__maxId + 1), ${nBuckets - 1})"))
    val firsts = positioned.groupBy(col("__tok"))
      .agg(min("__pos").as("__fpos"))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(
        s"least((__fpos div 1048576) * $nBuckets div (__maxId + 1), ${nBuckets - 1})"))
      .groupBy("bucket").agg(count(lit(1)).as("new_tokens"))
    positioned.groupBy("bucket")
      .agg(count(lit(1)).as("token_occurrences"),
        countDistinct("__id").as("docs"))
      .join(firsts, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_tokens"))
  }

  /** Flesch reading-ease in ×1000 fixed point — the readability lens next
    * to the Gopher gates (q83) and LM fluency (q112): a curation signal
    * that needs no trained model and no floats. The three counts are all
    * single regexp passes: words = whitespace-split tokens, sentences =
    * maximal [.!?] runs, syllables = maximal vowel-group runs over the
    * lowercased text (whitespace breaks groups, so the text-global count
    * equals the per-word sum). The classic 206.835 − 1.015·w/s −
    * 84.6·syl/w lands as
    *
    *   flesch_fp = 206835 − (1015·w) div s − (84600·syl) div w
    *
    * with truncation-toward-zero on both divisions — a documented ≤1
    * fixed-point-unit quantization both engines replay identically.
    * Degenerate docs (no words or no sentences) yield NULL, not a
    * division error. Pure map-side scan. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.select(col(idCol),
        expr(s"size(filter(split($textCol, '\\\\s+'), x -> x <> ''))")
          .cast("long").as("n_words"),
        expr(s"size(regexp_extract_all($textCol, '[.!?]+', 0))")
          .cast("long").as("n_sentences"),
        expr(s"size(regexp_extract_all(lower($textCol), '[aeiouy]+', 0))")
          .cast("long").as("n_syllables"))
      .withColumn("flesch_fp",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          lit(206835L) - expr("(1015 * n_words) div n_sentences") -
            expr("(84600 * n_syllables) div n_words")))
  }

  /** Blocklist filter — the C4-style "bad words" gate (C4 drops any page
    * containing a term from a fixed blocklist; RefinedWeb and FineWeb run
    * the same shape with curated lists). Phrases of one or two tokens are
    * matched case-insensitively against whitespace tokens / adjacent
    * token pairs. Per doc: unigram hits, bigram hits, and the drop flag.
    *
    * Scale: the list ships as a LITERAL array inside the codegen'd
    * filter — for the real lists (hundreds of terms) this is still a
    * constant-time-per-token `array_contains` with zero shuffle and zero
    * broadcast machinery; the whole operator is map-side, so it composes
    * with the scan and survives any fan-out. (A list big enough to need
    * a broadcast join stops being a blocklist and becomes q236's
    * contamination check.) Bigrams come from `zip_with(toks,
    * slice(toks, 2, ...))` — no explode, no per-token rows. */
  /** Shared phrase normalization for BOTH blocklist paths — one
    * definition so the "identical semantics by construction" contract
    * between [[blocklistHits]] and [[blocklistHitsLarge]] cannot drift
    * (r15b review finding): trim, whitespace-split, partition into
    * unigrams and space-rejoined bigrams, refuse anything longer. */
  private def normalizePhrases(phrases: Seq[String]): (Seq[String], Seq[String]) = {
    val norm = phrases.map(_.trim.split("\\s+").toSeq)
    require(norm.forall(t => t.nonEmpty && t.length <= 2 && t.forall(_.nonEmpty)),
      "blocklist phrases must be one or two whitespace-separated tokens")
    val (b, u) = norm.partition(_.length == 2)
    (b.map(_.mkString(" ")), u.map(_.head))
  }

  def blocklistHits(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    // normalize BEFORE classifying: real lists arrive with stray/odd
    // whitespace ("fast ", "table\thash"), and raw contains(" ") would
    // misclassify those into silently-inert patterns. Case-folding is
    // NOT done here: JVM toLowerCase (any locale) and Spark's lower()
    // disagree on non-ASCII edge cases ('İ', 'ẞ', final sigma — r14
    // advice), which would leave such terms silently inert. Instead the
    // generated SQL wraps each phrase literal in the ENGINE's own
    // lower(), so both sides fold identically by construction (Catalyst
    // constant-folds the literal, so the match stays codegen'd).
    val (bigrams, unigrams) = normalizePhrases(phrases)
    // SQL string-literal escaping: real blocklists contain quotes
    // ("don't") and the occasional backslash — unescaped they break or
    // silently reinterpret the generated expression
    def sqlLit(w: String) = "lower('" +
      w.replace("\\", "\\\\").replace("'", "\\'") + "')"
    def litArr(ws: Seq[String]) =
      if (ws.isEmpty) "array('')" else ws.map(sqlLit).mkString("array(", ", ", ")")
    val toks = s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')"
    val bigs = s"zip_with($toks, slice($toks, 2, greatest(size($toks) - 1, 0)), " +
      "(x, y) -> concat(x, ' ', y))"
    df.select(
      col(idCol),
      size(expr(s"filter($toks, t -> array_contains(${litArr(unigrams)}, t))"))
        .cast("long").as("n_uni_hits"),
      // zip_with pads the shorter side with NULL; concat(x, NULL) is NULL
      // and array_contains never matches it, so the trailing pair is inert
      size(expr(s"filter($bigs, b -> array_contains(${litArr(bigrams)}, b))"))
        .cast("long").as("n_bi_hits"))
      .withColumn("blocked",
        (col("n_uni_hits") + col("n_bi_hits") > 0).cast("long"))
  }

  /** [[blocklistHits]] for LARGE blocklists: same contract and output
    * schema, but matching through the native
    * [[graft.functions.TokenSetHits]] expression — O(tokens) hash-set
    * lookups per document instead of the literal-array `array_contains`
    * scan whose per-token cost grows with the blocklist. Identical
    * semantics by construction: both sides fold through the engine's own
    * lowercase routine (the expression calls `UTF8String.toLowerCase`,
    * which IS Spark's `lower()`), tokens split on whitespace with
    * empties dropped, duplicates count per occurrence, bigrams pair
    * adjacent non-empty tokens. Measured at sf0.1 with a 1504-phrase
    * list: the array-scan plan's extra cost is the blocklist factor the
    * native path doesn't pay (see q352 and PLANS.md r15b).
    *
    * Crossover guidance: below ~10 phrases the constant-folded array
    * scan is equivalent; use this form when lists reach the hundreds —
    * real safety/compliance lists run 10³–10⁵ phrases, where the array
    * plan is a quadratic-ish hot-path tax at 100 TB. */
  def blocklistHitsLarge(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val (bigrams, unigrams) = normalizePhrases(phrases)
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        graft.functions.GraftFunctions
          .tokenSetHits(col(textCol), unigrams, bigrams).as("__packed"))
      .select(col(idCol),
        shiftright(col("__packed"), 32).as("n_uni_hits"),
        col("__packed").bitwiseAND(lit(0xFFFFFFFFL)).as("n_bi_hits"))
      .withColumn("blocked",
        (col("n_uni_hits") + col("n_bi_hits") > 0).cast("long"))
  }

  /** Character-level Shannon entropy in HALF-BITS — the true-entropy
    * upgrade of q149's Gini–Simpson diversity (which went log-free
    * because float log2 is not cross-engine exact). r13's integer
    * half-bit log (floor(2·log2 n) = length(bin(n²))−1, see
    * [[Dsir.halfBitLog2]]) makes real entropy engine-exact: with run
    * counts c over N codepoints,
    *   numer = N·hb(N) − Σ c·hb(c)  (= Σ c·(hb(N)−hb(c)) ≥ 0, monotone),
    *   entropy ≈ numer / (2N) bits/char; we publish numer and
    *   `ent_halfbits` = numer div N. English text sits near 8 halfbits
    *   (4 bits/char); base64/random runs ≥ 11; "aaaa…" ≥ 0 — the
    * gibberish/boilerplate screen quality pipelines run alongside the
    * Gopher rules. The simple hb regime suffices: c ≤ N = one document's
    * codepoint count, far under the 2^31 regime boundary.
    *
    * Scale: one codegen'd `aggregate` over the SORTED codepoint array
    * computes all run counts map-side — no per-character explode, no
    * (doc, char) shuffle, nothing leaves the row. The sort is per-row
    * over one document's characters (n log n on a few KB), the same
    * cost class every shingle operator here already pays. */
  // run-length accumulator over the sorted codepoints: (prev, run, acc);
  // each run boundary folds run·hb(run) into acc, the finisher flushes
  // the last run. hb(run) inline: length(bin(run²))−1 (run ≥ 1 always).
  // Shared by charEntropyHalfBits and the Column form (q356's cascade
  // filter) so the two can never drift.
  private def entropyHb(n: String): String =
    s"CAST(length(bin($n * $n)) - 1 AS BIGINT)"
  private def entropySumChbSql(textCol: String): String = {
    val hb = entropyHb _
    s"""aggregate(
      array_sort(filter(split($textCol, ''), c -> c != '')),
      named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS BIGINT)),
      (s, x) -> IF(s.prev IS NOT NULL AND x = s.prev,
        named_struct('prev', x, 'run', s.run + CAST(1 AS BIGINT), 'acc', s.acc),
        named_struct('prev', x, 'run', CAST(1 AS BIGINT),
          'acc', s.acc + IF(s.prev IS NULL, CAST(0 AS BIGINT), s.run * ${hb("s.run")}))),
      s -> s.acc + IF(s.prev IS NULL, CAST(0 AS BIGINT), s.run * ${hb("s.run")}))"""
  }

  /** [[charEntropyHalfBits]]'s `ent_halfbits` as a single Column — for
    * use as a predicate inside other operators (e.g. [[filterOrderAdvisor]]
    * cascades). Recomputes the codepoint count inline; a standalone scan
    * should prefer the DataFrame form, which shares one split pass. */
  def charEntropyHalfBitsCol(textCol: String): Column = {
    val n = s"size(filter(split($textCol, ''), c -> c != ''))"
    expr(s"""CASE WHEN $n = 0 THEN CAST(0 AS BIGINT)
      ELSE (CAST($n AS BIGINT) * ${entropyHb(s"CAST($n AS BIGINT)")}
            - ${entropySumChbSql(textCol)}) div CAST($n AS BIGINT) END""")
  }

  def charEntropyHalfBits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hb = entropyHb _
    val sumChb = entropySumChbSql(textCol)
    df.select(
      col(idCol),
      size(expr(s"filter(split($textCol, ''), c -> c != '')")).cast("long").as("n_cp"),
      expr(sumChb).as("sum_chb"))
      .withColumn("ent_numer_hb",
        when(col("n_cp") === 0, lit(0L))
          .otherwise(col("n_cp") * expr(hb("n_cp")) - col("sum_chb")))
      // div: both operands non-negative, so Spark div ≡ DuckDB //
      .withColumn("ent_halfbits",
        when(col("n_cp") === 0, lit(0L)).otherwise(expr("ent_numer_hb div n_cp")))
  }

  /** Planted-canary leakage audit — the memorization-risk gate a training
    * pipeline runs over its OWN split assignment: extract every canary
    * token (`pattern`, e.g. the GUID markers planted by a privacy canary
    * campaign, Carlini et al.'s secret-sharer setup) and report, per
    * canary, how many documents carry it and across how many splits it
    * leaked. A canary present in more than one split means the held-out
    * evaluation can no longer certify non-memorization for it — `leaked`
    * is the row a release gate fails on.
    *
    * Scale: extraction is one codegen'd `regexp_extract_all` at the scan
    * (no pre-tokenize pass), the explode is bounded by actual matches
    * (zero rows for canary-free documents — the overwhelming majority),
    * and the single shuffle groups on the canary string whose cardinality
    * is the PLANTED SET's size, not the corpus's. `collect_set(split)` is
    * bounded by the number of splits (here ≤ a handful) — never a
    * corpus-sized driver or executor list. The pattern goes through the
    * Column API (never spliced into SQL text), so regex metacharacters,
    * backslashes and quotes arrive at the matcher verbatim — `\\d+`
    * means digits, not a literal 'd' (self-review r15b finding). */
  def canaryLeakage(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, pattern: String): DataFrame =
    df.select(col(idCol), col(splitCol).as("__split"),
        explode(regexp_extract_all(col(textCol), lit(pattern), lit(0))).as("canary"))
      .groupBy("canary")
      .agg(
        countDistinct(col(idCol)).cast("long").as("n_docs"),
        countDistinct(col("__split")).cast("long").as("n_splits"),
        concat_ws(",", sort_array(collect_set(col("__split")))).as("splits"))
      .withColumn("leaked", when(col("n_splits") > 1, 1L).otherwise(0L))

  /** Vocabulary coverage curve — the tokenizer-sizing datasheet: for each
    * coverage target (basis points of total token mass), the SMALLEST
    * frequency-ranked vocabulary whose cumulative mass reaches the
    * target, with the exact mass it covers and the boundary frequency.
    * "How big must the vocab be to cover 99% of tokens" is the first
    * question a BPE/unigram tokenizer build asks of a corpus.
    *
    * Scale: the token histogram is the only corpus-sized shuffle
    * (map-side combined). Everything downstream aggregates the
    * FREQUENCY-OF-FREQUENCIES histogram — one row per distinct frequency
    * value, O(√total_tokens) rows (d distinct positive frequencies sum to
    * ≥ d(d+1)/2) — so the global cumulative window runs over a provably
    * tiny relation. A vocab-ordered global window would single-partition
    * a 100M-type corpus; this never ranks individual types. Within the
    * boundary frequency f* every type contributes exactly f*, so the
    * minimal vocab is n_above + ⌈(need − mass_above)/f*⌉ — exact integer
    * algebra, Spark `div` ≡ DuckDB `//` (all operands non-negative: the
    * boundary row is the FIRST whose cumulative mass reaches `need`, so
    * need − mass_above ≥ 1). Long-safe to ~9·10¹⁴ total tokens
    * (total × 10⁴ must fit in a signed 64-bit). A token-free corpus
    * yields ZERO rows by contract — there is no boundary frequency to
    * report, and both engines agree on the empty result (the oracle's
    * inequality join is empty too). */
  def vocabCoverage(df: DataFrame, textCol: String,
      targetsBp: Seq[Int] = Seq(5000, 9000, 9500, 9900)): DataFrame =
    vocabCoverageFromCounts(
      Par.ensureParallel(df)
        .select(explode(tokens(textCol)).as("__t"))
        .groupBy("__t").agg(count(lit(1)).as("__c")),
      "__t", "__c", targetsBp)

  /** [[vocabCoverage]]'s algebra over a PRE-BUILT token histogram
    * `(tokenCol, countCol)` — the maintenance-friendly entry point: a
    * nightly pipeline keeps the histogram incrementally (merge = groupBy
    * sum of per-batch histograms, exact by additivity of counts) and
    * re-derives the coverage curve from it without re-tokenizing the
    * corpus. q355 gates maintained ≡ recomputed. */
  def vocabCoverageFromCounts(counts: DataFrame, tokenCol: String,
      countCol: String, targetsBp: Seq[Int] = Seq(5000, 9000, 9500, 9900)): DataFrame = {
    require(targetsBp.nonEmpty && targetsBp.forall(t => t >= 1 && t <= 10000),
      "coverage targets must be 1..10000 basis points")
    import org.apache.spark.sql.expressions.Window
    // zero-count rows (tombstones from a maintained histogram that also
    // applies deletions) are by definition outside the vocabulary — and
    // admitting them would divide by the boundary frequency 0 (r15b
    // review finding). Negative counts are equally non-vocabulary.
    val df = counts.select(col(tokenCol).as("__t"), col(countCol).as("__c"))
      .filter(col("__c") > 0)
    val fh = df.groupBy("__c").agg(count(lit(1)).cast("long").as("__nt"))
    val w = Window.orderBy(col("__c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = fh.select(col("__c"), col("__nt"),
      sum(col("__c") * col("__nt")).over(w).as("__cm"),
      sum(col("__nt")).over(w).as("__ct"))
    val total = fh.agg(sum(col("__c") * col("__nt")).cast("long").as("__total"))
    val targets = df.sparkSession.range(1)
      .select(explode(lit(targetsBp.map(_.toLong).toArray)).as("target_bp"))
    targets.crossJoin(total)
      .withColumn("__need", expr("(__total * target_bp + 9999) div 10000"))
      .join(cum, col("__cm") >= col("__need"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("target_bp").orderBy("__cm")))
      .filter(col("__rn") === 1)
      .withColumn("__above", col("__cm") - col("__c") * col("__nt"))
      .withColumn("__extra", expr("(__need - __above + __c - 1) div __c"))
      .select(col("target_bp"),
        (col("__ct") - col("__nt") + col("__extra")).cast("long").as("vocab_size"),
        (col("__above") + col("__extra") * col("__c")).cast("long").as("cum_tokens"),
        col("__total").as("total_tokens"),
        col("__c").cast("long").as("boundary_freq"))
  }

  /** Filter-cascade ordering advisor — a curation pipeline runs many
    * gates (language, length, blocklist, entropy, model scores) and the
    * ORDER matters enormously at 100 TB: every document a cheap filter
    * rejects never reaches the expensive ones. For independent
    * predicates the classic greedy rule is optimal: run filters in
    * descending (rejected fraction)/cost. This measures each filter's
    * pass rate in ONE aggregate pass over the corpus (or a sample — the
    * rates are corpus-shape properties), prices rejection per cost unit
    * in exact integers, and emits the recommended position.
    *
    * `filters` = (name, predicate, costX1000) with caller-pinned cost
    * proxies (relative units; only ratios matter). Output per filter:
    * pass_bp (basis points), drop_per_cost = (10000−pass_bp)·1000 div
    * cost, position = rank by (drop_per_cost desc, name). An empty
    * corpus reports pass_bp = 10000 (nothing rejected) by convention.
    * Scale: one map-side-combined aggregate computes every indicator sum
    * in a single corpus pass; everything after runs on |filters| rows. */
  def filterOrderAdvisor(df: DataFrame,
      filters: Seq[(String, Column, Long)]): DataFrame = {
    require(filters.nonEmpty, "at least one filter required")
    require(filters.forall(_._3 > 0), "filter costs must be positive")
    require(filters.map(_._1).distinct.size == filters.size, "filter names must be unique")
    import org.apache.spark.sql.expressions.Window
    val aggs = count(lit(1)).as("__n") +:
      filters.zipWithIndex.map { case ((_, p, _), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"__p$i")
      }
    val structs = filters.zipWithIndex.map { case ((name, _, cost), i) =>
      struct(lit(name).as("filter"), lit(cost).as("cost_x1000"),
        expr(s"CASE WHEN __n = 0 THEN CAST(10000 AS BIGINT) " +
          s"ELSE __p$i * 10000 div __n END").as("pass_bp"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("__f"))
      .select(col("__f.filter").as("filter"), col("__f.cost_x1000").as("cost_x1000"),
        col("__f.pass_bp").as("pass_bp"))
      .withColumn("drop_per_cost", expr("(10000 - pass_bp) * 1000 div cost_x1000"))
      .withColumn("position", row_number().over(
        Window.orderBy(col("drop_per_cost").desc, col("filter"))).cast("long"))
  }

  /** TextTiling-style semantic boundary detection (Hearst 1997), in the
    * integer-exact variant this engine can gate: fixed-size pseudo-
    * sentence blocks of `blockTokens` tokens, adjacent-block lexical
    * cohesion as JACCARD ×10⁶ (Hearst's cosine needs a sqrt no SQL
    * engine reproduces bit-exactly; Jaccard over the same bags is the
    * standard set-overlap substitute), gap depth from the immediate
    * neighbors (depth_g = max(0, s_{g−1}−s_g) + max(0, s_{g+1}−s_g) —
    * Hearst climbs to the nearest peaks; the one-step form is the
    * documented simplification that stays window-free), and a boundary
    * wherever depth > 0 AND 4·depth ≥ 3·max_depth (a fixed fraction of
    * the doc's own strongest depth, replacing the mean−σ/2 cutoff whose
    * σ needs the same non-gateable sqrt). The use case is semantic
    * chunking — RAG/context splits at topic shifts instead of q144's
    * fixed offsets.
    *
    * Entirely map-side: blocks, scores, depths and flags are one chain
    * of codegen'd HOFs over the token array — nothing leaves the row,
    * no explode, no shuffle before the output sort. Every array index
    * is CASE-guarded (ANSI mode throws on out-of-bounds element_at) and
    * the degenerate single-block document short-circuits to zero gaps.
    * Output per doc: n_tokens, n_blocks, n_gaps, max_depth ×10⁶-scaled,
    * n_boundaries, first_boundary (1-based gap index, −1 if none). */
  def semanticBoundaries(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 20): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    val bt = blockTokens
    val M = "CAST(1000000 AS BIGINT)"
    df.select(col(idCol), expr(toksSql(textCol)).as("__toks"))
      .withColumn("__nt", size(col("__toks")).cast("long"))
      .withColumn("__nb", expr(s"(__nt + ${bt - 1}) div $bt"))
      // sequence(1, 0) DESCENDS in Spark — the nb<=1 guard is load-bearing
      .withColumn("__sets", expr(s"""CASE WHEN __nb = 0 THEN array()
        ELSE transform(sequence(1, CAST(__nb AS INT)),
          b -> array_distinct(slice(__toks, (b - 1) * $bt + 1, $bt))) END"""))
      .withColumn("__scores", expr(s"""CASE WHEN __nb <= 1 THEN CAST(array() AS ARRAY<BIGINT>)
        ELSE transform(sequence(1, CAST(__nb AS INT) - 1),
          g -> CAST(size(array_intersect(element_at(__sets, g), element_at(__sets, g + 1))) AS BIGINT) * $M
               div CAST(size(array_union(element_at(__sets, g), element_at(__sets, g + 1))) AS BIGINT)) END"""))
      .withColumn("__ng", size(col("__scores")).cast("long"))
      .withColumn("__depths", expr(s"""CASE WHEN __ng = 0 THEN CAST(array() AS ARRAY<BIGINT>)
        ELSE transform(sequence(1, CAST(__ng AS INT)),
          g -> greatest(CAST(0 AS BIGINT), CASE WHEN g > 1
                 THEN element_at(__scores, g - 1) - element_at(__scores, g) ELSE CAST(0 AS BIGINT) END)
             + greatest(CAST(0 AS BIGINT), CASE WHEN g < CAST(__ng AS INT)
                 THEN element_at(__scores, g + 1) - element_at(__scores, g) ELSE CAST(0 AS BIGINT) END)) END"""))
      .withColumn("max_depth",
        expr("CASE WHEN __ng = 0 THEN CAST(0 AS BIGINT) ELSE array_max(__depths) END"))
      // ONE boundary-index array feeds both outputs — the predicate
      // written twice could drift into mutually-inconsistent counts
      .withColumn("__bidx", expr("""CASE WHEN __ng = 0 THEN CAST(array() AS ARRAY<BIGINT>)
        ELSE filter(transform(sequence(1, CAST(__ng AS INT)),
          g -> CASE WHEN element_at(__depths, g) > 0
                     AND 4 * element_at(__depths, g) >= 3 * max_depth
                    THEN CAST(g AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
          x -> x > 0) END"""))
      .withColumn("n_boundaries", expr("CAST(size(__bidx) AS BIGINT)"))
      .withColumn("first_boundary",
        expr("CASE WHEN size(__bidx) = 0 THEN CAST(-1 AS BIGINT) ELSE element_at(__bidx, 1) END"))
      .select(col(idCol), col("__nt").as("n_tokens"), col("__nb").as("n_blocks"),
        col("__ng").as("n_gaps"), col("max_depth"), col("n_boundaries"), col("first_boundary"))
  }

  /** Per-source token-distribution divergence vs the whole corpus —
    * "which feed is distributionally WEIRD" as one datasheet row per
    * source (r16 tranche I): the KL(source ‖ corpus) surrogate in exact
    * integer half-bits via [[Dsir.halfBitLog2]]. Per source-token count
    * c, corpus count C, source total Nₛ, corpus total N, the true
    * 2·Nₛ·KL = Σ c·2·log2(c·N / (C·Nₛ)); the integer statistic replaces
    * each log with its floor:
    *   kl_numer = Σ c·(ql(c) + ql(N) − ql(C) − ql(Nₛ)),
    * exact and engine-replayable (the floor-of-sums vs sum-of-floors gap
    * is bounded by ±4 half-bits per token — that bound is also what makes
    * the published per-token average's dividend provably non-negative:
    * kl_x1000 = (numer + 4·Nₛ)·1000 div Nₛ − 4000, the established
    * positivity-offset trick so Spark `div` ≡ DuckDB `//`). Skimming the
    * table: en-like feeds cluster near the corpus mix; a synthetic or
    * single-template feed stands out at multiples of the pack.
    *
    * Scale: one token pass (source-token counts, checkpointed at the
    * aggregate — corpus counts DERIVE from it by additivity, no second
    * pass), one keyed join on token, one per-source rollup. Nothing
    * document-sized shuffles twice; source totals broadcast. */
  def sourceDivergence(df: DataFrame, textCol: String, srcCol: String): DataFrame = {
    def ql(c: Column) = Dsir.halfBitLog2(c).cast("long")
    val st = graft.operators.Par.ensureParallel(df)
      .select(col(srcCol).as("source"), explode(tokens(textCol)).as("__t"))
      .groupBy(col("source"), col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val ct = st.groupBy(col("__t")).agg(sum(col("__c")).as("__ct"))
    val ns = st.groupBy(col("source"))
      .agg(sum(col("__c")).as("__ns"), count(lit(1)).as("__dt"))
    val n = st.agg(sum(col("__c")).as("__n"))
    st.join(ct, Seq("__t"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("__term",
        col("__c") * (ql(col("__c")) + ql(col("__n")) - ql(col("__ct")) - ql(col("__ns"))))
      .groupBy(col("source"))
      .agg(first(col("__ns")).as("n_tokens"), first(col("__dt")).as("distinct_tokens"),
        sum(col("__term")).as("__numer"))
      .select(col("source"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("distinct_tokens").cast("long").as("distinct_tokens"),
        expr("(__numer + 4 * n_tokens) * 1000 div n_tokens").cast("long")
          .minus(lit(4000L)).as("kl_x1000"))
  }

  /** Reliability curve for ANY document quality scorer — the calibration
    * datasheet that says whether a score is safe to threshold on (r16
    * tranche I): rank all docs by (score, id), split into `nBuckets`
    * equal-count rank buckets, and report each bucket's size, score range
    * and positive-label rate. A scorer worth gating on shows a monotone
    * `pos_bp` column; a flat one is noise however good its top-k looks.
    * Pure integer algebra (ranks, counts, basis points) — engine-exact.
    *
    * Scale note: the rank is ONE global sort window (the q240 posture —
    * exact form for gates and samples); at full corpus scale compute
    * approximate score cutpoints first and bucket by range instead. */
  def scoreCalibration(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: Column, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val tot = df.agg(count(lit(1)).as("__n"))
    df.select(col(idCol), col(scoreCol).cast("long").as("__score"),
        when(coalesce(labelCol, lit(false)), 1L).otherwise(0L).as("__y"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__score"), col(idCol))))
      .crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"(__rk - 1) * $nBuckets div __n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("__score")).cast("long").as("min_score"),
        max(col("__score")).cast("long").as("max_score"),
        sum(col("__y")).cast("long").as("n_pos"))
      .withColumn("pos_bp", expr("n_pos * 10000 div n_docs"))
  }

  /** Per-document Unicode-SCRIPT character census — the multilingual
    * pipeline's sibling to the language-ID model: lang-ID says what a doc
    * claims to be, the script census says what its characters ARE (a
    * 'zh'-labeled doc with zero CJK characters is a labeling bug this
    * surfaces in one pass). Counts over the space-stripped text: Latin
    * letters (ASCII + Latin-1, × and ÷ excluded), ASCII digits, CJK
    * unified ideographs (U+4E00–9FFF), Cyrillic (U+0400–04FF), and the
    * remainder (`other` — punctuation, symbols, every script not counted).
    * Each count is a regexp-strip length delta — codegen'd per row, no
    * shuffle, no explode. Counts are UTF-16 code units on the JVM and
    * code points in SQL engines: identical for BMP text (all counted
    * classes are BMP); supplementary-plane characters land in `other`
    * with weight 2 here vs 1 there — the q368 BMP caveat applies. */
  def scriptCensus(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def cnt(cls: String) =
      (length(col("__t")) - length(regexp_replace(col("__t"), cls, ""))).cast("long")
    df.withColumn("__t", regexp_replace(col(textCol), "\\s", ""))
      .select(col(idCol),
        length(col("__t")).cast("long").as("n_chars"),
        cnt("[A-Za-zÀ-ÖØ-öø-ÿ]").as("latin"),
        cnt("[0-9]").as("digit"),
        cnt("[一-鿿]").as("cjk"),
        cnt("[Ѐ-ӿ]").as("cyrillic"))
      .withColumn("other",
        col("n_chars") - col("latin") - col("digit") - col("cjk") - col("cyrillic"))
  }
}
