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
    * oracle's `string_split(text,' ')`). */
  private def shingles(textCol: String, k: Int): Column = {
    val w = s"split($textCol, ' ')"
    expr(
      s"""transform(sequence(0, greatest(size($w) - $k, 0)),
         |  i -> array_join(slice($w, i + 1, $k), ' '))""".stripMargin)
  }

  /** MinHash signature: for seed s, min over shingles of md5('s|'||shingle).
    * The md5 hex string is uniformly distributed, so the lexicographic min is
    * a valid min-hash; using strings keeps the scheme byte-identical in any
    * engine with md5. */
  def minHashSignature(textCol: String, numHashes: Int, shingleK: Int): Seq[Column] = {
    val sh = shingles(textCol, shingleK)
    (0 until numHashes).map { s =>
      array_min(transform(sh, x => md5(concat(lit(s"$s|"), x)))).as(s"sig_$s")
    }
  }

  /** MinHash + LSH banding: documents sharing any band of `bandSize`
    * consecutive signature values become a candidate pair.
    *
    * Plan shape: project (id, band_idx, band_hash) — `numBands` rows per doc
    * via explode — then ONE shuffle on (band_idx, band_hash) for the
    * self-join, distinct pairs out. No pairwise scan; skewed bands (a near-
    * universal shingle) are the one hazard at scale — AQE skew-join handles
    * moderate cases, and raising bandSize shrinks band populations
    * exponentially.
    *
    * Returns (id_a, id_b) with id_a < id_b.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bandSize: Int = 2,
      shingleK: Int = 3
  ): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    val numBands = numHashes / bandSize
    val sigs = df.select(col(idCol) +: minHashSignature(textCol, numHashes, shingleK): _*)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until bandSize).map(j => col(s"sig_${b * bandSize + j}"))
      struct(lit(b).as("band_idx"), md5(concat(parts: _*)).as("band_hash")).as(s"band_$b")
    }
    val banded = sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
    val a = banded.toDF(s"a_$idCol", "band_idx", "band_hash")
    val b = banded.toDF(s"b_$idCol", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"))
      .distinct()
  }

  /** 32-bit SimHash over distinct words. Bit b (MSB-first) comes from hex
    * digit b/4 of md5(word); the document bit is the majority vote across
    * words (ties → 1). Computed via explode + 32 integer sums in one
    * aggregation — fully codegen'd, one shuffle on the id. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(
      col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("__w"))
      .withColumn("__h", md5(col("__w")))
    val bitCols = (0 until 32).map { b =>
      val j = b / 4 // hex digit index
      val k = 3 - (b % 4) // bit within digit, msb first
      val d = expr(s"cast(conv(substring(__h, ${j + 1}, 1), 16, 10) as int)")
      sum((d.divide(lit(1 << k)).cast("int") % 2)).as(s"__b$b")
    }
    val agged = words
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), bitCols: _*)
    val simhash = (0 until 32)
      .map { b => when(col(s"__b$b") * 2 >= col("__n"), lit(1L << (31 - b))).otherwise(lit(0L)) }
      .reduce(_ + _)
    agged.select(col(idCol), simhash.as("simhash"))
  }

  /** N-gram (word-set) Jaccard near-dup pairs within blocks.
    * Blocking keys bound candidate pairs; the verify step computes exact
    * |A∩B| / |A∪B| on distinct-word arrays. Integer outputs (inter/union
    * sizes) keep results engine-exact. */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockExprs: Seq[Column],
      minJaccardPct: Int
  ): DataFrame = {
    val withBlock = df.select(
      col(idCol),
      sort_array(array_distinct(split(col(textCol), " "))).as("__ws"),
      struct(blockExprs: _*).as("__blk"))
    val a = withBlock.toDF(s"a_$idCol", "a_ws", "__blk")
    val b = withBlock.toDF(s"b_$idCol", "b_ws", "__blk")
    a.join(b, Seq("__blk"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(
        col(s"a_$idCol"), col(s"b_$idCol"),
        size(array_intersect(col("a_ws"), col("b_ws"))).cast("long").as("inter_n"),
        size(array_union(col("a_ws"), col("b_ws"))).cast("long").as("union_n"))
      .filter(col("inter_n") * 100 >= col("union_n") * minJaccardPct)
  }

  /** Edit-distance near-dup pairs: block on a text prefix, verify with
    * levenshtein — the classic cheap-block/expensive-verify split. */
  def levenshteinPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int,
      maxDist: Int
  ): DataFrame = {
    val proj = df.select(col(idCol), col(textCol),
      substring(col(textCol), 1, prefixLen).as("__pfx"))
    val a = proj.toDF(s"a_$idCol", "a_text", "__pfx")
    val b = proj.toDF(s"b_$idCol", "b_text", "__pfx")
    a.join(b, Seq("__pfx"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        levenshtein(col("a_text"), col("b_text")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }
}
