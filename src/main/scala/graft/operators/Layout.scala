package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * technique behind `OPTIMIZE ZORDER BY` in lakehouse table formats: sort
  * a table along a space-filling curve over several columns so Parquet
  * row-group/file min-max stats prune for predicates on ANY clustered
  * dimension, not just the leading sort key.
  *
  * Why it matters at 100 TB: a table sorted by `(part, supplier)` prunes
  * beautifully on `part` and not at all on `supplier`; z-ordered on both,
  * a box predicate on either (or both) touches O(box-size) files instead
  * of all of them. The curve key is PURE codegen'd integer arithmetic
  * (shift/and/or — no UDF, no sketch), so the identical algebra runs in
  * any SQL engine for the oracle.
  */
object Layout {

  /** Interleave the low `bitsPerDim` bits of each cell column into one
    * Long: result bit `b·d + i` = bit `b` of dim `i` (dim 0 in the least
    * significant lane). Cells must already be non-negative and below
    * 2^bitsPerDim — see [[zOrderBucketized]] for the range mapping. */
  def zOrderKey(cells: Seq[Column], bitsPerDim: Int): Column = {
    val d = cells.size
    require(d > 0 && bitsPerDim > 0 && d * bitsPerDim <= 63,
      "need 1+ dims and dims*bitsPerDim <= 63")
    val terms = for {
      (c, i) <- cells.zipWithIndex
      b <- 0 until bitsPerDim
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * d + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Attach a `z_key` column over integer dimension columns: each dim is
    * range-mapped to a 2^bitsPerDim-cell grid with the exact integer
    * formula `(v − min) · 2^bits div (max − min + 1)` (no floats — the
    * same rows land in the same cells in every engine), then bit-
    * interleaved by [[zOrderKey]]. The min/max come from ONE 1-row
    * aggregate broadcast-crossJoined back (never a per-row driver call);
    * everything downstream is a scan-fused projection. NULL dims map to
    * cell 0 via the min coalesce, keeping the key total so a later sort
    * never drops rows. */
  def zOrderBucketized(df: DataFrame, dims: Seq[String], bitsPerDim: Int): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    val aggs = dims.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__mn_$c"),
      max(col(c)).cast("long").as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val cells = dims.map { c =>
      expr(s"CAST((coalesce(CAST(`$c` AS BIGINT), `__mn_$c`) - `__mn_$c`) * ${1L << bitsPerDim} " +
        s"DIV (`__mx_$c` - `__mn_$c` + 1) AS BIGINT)")
    }
    withStats
      .withColumn("z_key", zOrderKey(cells, bitsPerDim))
      .drop(dims.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Rendezvous (highest-random-weight) shard assignment: the key's shard
    * is the `t` in 0..nShards-1 maximizing the engine-portable md5-fold
    * weight of `key:t`. The property this buys over `key mod n`: growing
    * the fleet n → n+1 moves only ~1/(n+1) of keys (only those whose new
    * shard's weight now wins), where mod-resharding moves ~n/(n+1) —
    * i.e., nearly everything. Pure scan-fused projection, codegen'd array
    * expression, no shuffle, no UDF; ties (a 32-bit weight collision
    * across two shards of one key) break deterministically to the higher
    * shard via the lexicographic struct max. */
  /** Zone-map (min/max) pruning certificate for one candidate layout: rows
    * in `orderKey` order form `bucketRows`-row "row groups"; a range scan
    * `lo ≤ value ≤ hi` must read every bucket whose [min,max] overlaps the
    * predicate. Reports buckets/rows scanned vs rows actually matching —
    * `amplification_bp` is the integer measure of how much a layout makes
    * the reader over-fetch (10000 = perfect pruning). Complements the RLE
    * run-count advisor: runs measure encoding, this measures skipping.
    *
    * Ranks come from the Packing distributed prefix sum (one range shuffle
    * + a #partitions-row collect), never a single-task global window;
    * everything after is two grouped aggregates on the bucket id. */
  def zoneMapScan(df: DataFrame, orderKey: Column, valueCol: Column,
      bucketRows: Int, lo: Long, hi: Long, label: String): DataFrame = {
    require(bucketRows > 0, "bucketRows must be positive")
    require(lo <= hi, "empty predicate range")
    val keyed = df.select(orderKey.as("__ord"), valueCol.cast("long").as("__v"))
      .withColumn("__one", lit(1L))
    val scanned = col("mx") >= lo && col("mn") <= hi
    Packing.withRunningTotal(keyed, "__ord", "__one", "__rn")
      .withColumn("__b", expr(s"(__rn - 1) div ${bucketRows}L"))
      .groupBy("__b")
      .agg(min("__v").as("mn"), max("__v").as("mx"), count(lit(1)).as("n"),
        sum(when(col("__v").between(lo, hi), 1L).otherwise(0L)).as("match_n"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(scanned, 1L).otherwise(0L)).as("buckets_scanned"),
        sum(col("n")).as("rows_total"),
        sum(when(scanned, col("n")).otherwise(0L)).as("rows_scanned"),
        sum(col("match_n")).as("rows_matching"))
      .select(lit(label).as("layout"), col("n_buckets"), col("buckets_scanned"),
        col("rows_total"), col("rows_scanned"), col("rows_matching"),
        expr("rows_scanned * 10000 div greatest(rows_matching, 1)")
          .as("amplification_bp"))
  }

  def rendezvousShard(keyCol: String, nShards: Int): Column = {
    require(nShards >= 1, "nShards must be >= 1")
    expr(
      s"""array_max(transform(sequence(0, ${nShards - 1}),
         |  t -> struct(CAST(conv(substring(md5(concat(CAST(`$keyCol` AS STRING), ':', CAST(t AS STRING))), 1, 8), 16, 10) AS BIGINT) AS w,
         |              t))).t""".stripMargin)
  }
}
