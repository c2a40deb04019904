package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only per partitioning — a repartition or a
  * different executor count changes the sample, which is poison for
  * reproducible dataset builds. These operators decide membership from a
  * HASH OF THE ROW KEY alone: any engine, any partitioning, any scale
  * produces the identical sample (and the md5 fold is the same one DuckDB
  * computes, so samples are oracle-checkable). Embarrassingly parallel —
  * a pure filter, no shuffle, pushes down around column pruning.
  *
  * The hash is uniform on [0, 2^32), so `pct`% selects pct/100 of keys in
  * expectation with deviation O(1/√n); membership is stable under corpus
  * growth (a key's verdict never changes as other rows arrive) — the
  * property that makes held-out sets stay held out across pipeline runs.
  */
object Sampling {

  /** Uniform per-key bucket in [0, 100): `hash32(key) mod 100` with the
    * engine-portable `conv(substring(md5(key),1,8),16,10)` fold. */
  def bucketOf(keyCol: String): Column =
    expr(s"cast(conv(substring(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint) % 100")

  /** Keep ~`pct`% of rows, decided per key — deterministic across runs,
    * partitionings, and engines. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.filter(bucketOf(keyCol) < pct)
  }

  /** Stratified deterministic sample: an independent per-stratum rate.
    * Strata absent from `pctByStratum` default to 0 (dropped) — explicit
    * rates only, so a new stratum appearing upstream can't silently flood
    * the sample. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      pctByStratum: Map[String, Int]
  ): DataFrame = {
    require(pctByStratum.values.forall(p => p >= 0 && p <= 100), "rates must be 0..100")
    val rate = pctByStratum.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucketOf(keyCol) < rate)
  }

  /** Disjoint train/holdout split on the same key hash: a key lands in
    * exactly one side, forever (holdout = buckets [100-holdoutPct, 100)). */
  def trainHoldoutSplit(df: DataFrame, keyCol: String, holdoutPct: Int): (DataFrame, DataFrame) = {
    require(holdoutPct > 0 && holdoutPct < 100, s"holdoutPct must be 1..99, got $holdoutPct")
    val b = bucketOf(keyCol)
    (df.filter(b < 100 - holdoutPct), df.filter(b >= 100 - holdoutPct))
  }
}
