package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY §7.3 risk 7: a hot diff key — or
  * a hot LSH band — concentrates one shuffle partition).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in our sessions);
  * salting is for the cases AQE can't fix, e.g. aggregation skew or a
  * broadcast-averse many-to-one join. Salting here is deterministic
  * (hash-derived, no RNG) so runs are reproducible.
  */
object SkewTools {

  /** Deterministic salt in [0, buckets) derived from the row's non-key
    * columns (falls back to the key itself for key-only frames): stable
    * across runs, uniform enough to split a hot key. */
  def saltCol(buckets: Int, from: Seq[Column]): Column =
    pmod(xxhash64(from: _*), lit(buckets.toLong))

  /** Salted many-to-one equi-join: fact side gets a deterministic salt in
    * [0, buckets); the (small-ish, but not broadcastable) dim side is
    * replicated `buckets`× with every salt value. The shuffle key becomes
    * (key, salt) — a hot key now spreads over `buckets` partitions.
    *
    * Cost model: dim side inflates buckets×; use when
    * `dimRows × buckets ≪ factRows(hotKey)`. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedFact = fact.withColumn(
      "__salt", saltCol(buckets, fact.columns.map(col).toSeq))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedFact
      .join(saltedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys: first
    * aggregate on (key, salt), then combine the partials per key. Works for
    * algebraic aggregates (sum/count/min/max). Spark already does map-side
    * partial aggregation; this adds a REDUCE-side split for keys whose
    * partials still overwhelm one task. */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int
  ): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(buckets, Seq(col(valueCol))))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Skew diagnostic: the top-`k` heaviest values of a prospective join/
    * group key with their exact share of rows in basis points — the "should
    * this join be salted?" report run BEFORE committing to a shuffle plan
    * at scale. One aggregation + a driver-side total (two tiny jobs); the
    * heavy-hitter list is bounded by `k`. Integer share arithmetic
    * (`n·10000 div total`), so the report is engine-exact. NULL keys count
    * as their own group — a null-heavy key is the classic silent skew. */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totalRow = counts.agg(sum("n")).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    counts
      .withColumn("share_x10000",
        if (total == 0L) lit(0L) else expr(s"n * 10000 div ${total}L"))
      .orderBy(col("n").desc, col(keyCol).asc_nulls_first)
      .limit(k)
  }
}
