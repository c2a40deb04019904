package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side shuffle reduction. The reference rebuilds joins from scratch
  * (SQL templating over a warehouse — `/root/reference` has no physical
  * join tuning surface); at 100 TB the dominant cost of a selective
  * fact⋈dim join is shuffling fact rows that can never match. These
  * helpers cut that volume before the exchange. */
object JoinOpt {

  /** Bloom runtime-filter equi-join (semi-join reduction): build a Bloom
    * sketch of the dim side's join keys (`DataFrameStatFunctions
    * .bloomFilter` — built distributed via treeAggregate, merged on the
    * driver), broadcast it, and drop fact rows map-side BEFORE the join's
    * shuffle. No false negatives, so the result is EXACTLY the plain
    * inner join — false positives only cost shuffle bytes (they're
    * eliminated by the exact join that follows), so `fpp` tunes memory vs
    * shuffle, never correctness; q261 gates the equality.
    *
    * Scale shape: with a 1% selective dim, ~99% of the fact table never
    * enters the exchange — the filter runs inside the scan stage, after
    * parquet pushdown, at Bloom-probe cost per row. Spark's own AQE
    * injects a similar runtime filter only in limited shapes
    * (`spark.sql.optimizer.runtime.bloomFilter` targets shuffle-join key
    * reuse); this operator makes the reduction explicit and composable —
    * the sketch can also be persisted and reused across queries of the
    * same dim epoch, which the AQE form cannot.
    *
    * The probe wraps the broadcast sketch in a UDF — same justification
    * as `Dedup.dedupAgainstCorpusBloom`: no public Catalyst expression
    * exposes `BloomFilter.mightContainLong`, and the UDF is a pure
    * per-row probe with no shuffle semantics of its own. Keys must be
    * integral (long-castable); null keys never match (inner-join
    * semantics). */
  def bloomFilteredEquiJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedDimKeys > 0, "expectedDimKeys must be positive")
    val bloom = dim.select(col(key).cast("long")).na.drop()
      .stat.bloomFilter(key, expectedDimKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightMatch = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(mightMatch(col(key).cast("long"))).join(dim, Seq(key))
  }
}
