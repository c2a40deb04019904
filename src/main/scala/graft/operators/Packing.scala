package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: lay documents out in a
  * deterministic total order and slice the stream into fixed token-budget
  * bins (context windows). The core primitive is a DISTRIBUTED prefix sum —
  * the naive Spark form, `sum(...).over(Window.orderBy(id))` with no
  * partitionBy, collapses the whole dataset into ONE task and cannot scale.
  *
  * Scale shape (the classic two-phase scan):
  *   1. range-repartition by the order column and sort within partitions —
  *      one shuffle, full parallelism;
  *   2. per-partition running totals (window inside each range slice);
  *   3. partition TOTALS (one tiny row per partition) collect to the driver,
  *      their exclusive cumulative sums broadcast back as offsets;
  *   4. running total = partition offset + local running total.
  * The only driver data is #partitions rows, independent of input size, and
  * the result depends ONLY on the total order — partition boundaries cancel
  * out — so it is deterministic and oracle-checkable.
  */
object Packing {

  /** Inclusive running total of `valueCol` over the total order given by
    * `orderCol` (must be unique; ties would make the prefix sum
    * order-dependent). Appends `outCol` as LongType. NULL values count as 0
    * (the coalesce below), so an all-NULL range slice contributes a zero
    * offset instead of a null that would NPE the driver-side getLong. */
  def withRunningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String
  ): DataFrame = {
    val safeVal = coalesce(col(valueCol).cast("long"), lit(0L))
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    // the window's required clustering on __pid re-shuffles rows by slice id
    // (cheap: keys are already grouped); parallelism stays #partitions wide,
    // unlike the single-task Window.orderBy(...) with no partitionBy
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // MATERIALIZE before the totals collect: the range partitioner draws its
    // bounds by sampling, and a second execution (the final join job) could
    // sample different bounds — a boundary row would then carry a different
    // __pid than the one its value was accounted to, silently corrupting
    // offsets. The checkpoint pins one partitioning for both jobs (and stops
    // paying for the shuffle + window twice).
    val withLocal = ranged
      .withColumn("__local", sum(safeVal).over(wLocal))
      .localCheckpoint()
    // per-partition totals: one row per range slice, bounded by the
    // partition count — never by data size. sum(value), NOT max(__local):
    // running totals are only monotone for non-negative values, and this
    // helper accepts signed inputs (balance deltas etc.).
    val totals = withLocal.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("__tot"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, tot) =>
      val off = (pid, acc); acc += tot; off
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__pid", "__off"))
    withLocal.join(offDf, Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Contiguous-fill sequence packing: documents in `orderCol` order fill a
    * stream of `budget`-token bins; each document is assigned the bin its
    * FIRST token lands in (`bin_id`) plus its offset inside that bin
    * (`bin_offset`). Long documents may straddle bins — downstream splitters
    * use (bin_id, bin_offset, tokens) to cut exactly; short tails pad. This
    * is the standard pack-then-split layout for fixed-context training.
    *
    * All integer arithmetic (`div` is exact integer division); one shuffle
    * plus one #partitions-row driver collect (see [[withRunningTotal]]). */
  def packByTokenBudget(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    withRunningTotal(df, orderCol, tokenCol, "__cum")
      .withColumn("__start",
        col("__cum") - coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("bin_id", expr(s"__start div ${budget}L"))
      .withColumn("bin_offset", col("__start") - col("bin_id") * budget)
      .drop("__cum", "__start")
  }

  /** FIXED-LENGTH sequence packing with documents CROSSING boundaries
    * (r18): [[packByTokenBudget]] bins whole documents; a training packer
    * fills every context window to exactly `seqLen` tokens, SPLITTING the
    * document that straddles each boundary — this emits that
    * sample-to-sequence mapping as a per-sequence summary. Over the
    * deterministic total order of `orderCol`, each document occupies the
    * token interval [start, start+n) of the concatenated stream; sequence
    * `s` is the interval [s·seqLen, (s+1)·seqLen); a document contributes
    * to every sequence its interval intersects. Output, one row per
    * sequence: (seq_id, n_docs, n_tokens — seqLen everywhere but the tail,
    * BY CONSTRUCTION, n_split_docs — member docs that cross any
    * boundary, first_doc, last_doc).
    *
    * Zero-token documents sit AT their start offset (they occupy no
    * interval): they count as members of the sequence containing that
    * offset, contribute 0 tokens, never split.
    *
    * Scale shape: the distributed prefix sum above, then ONE bounded
    * explode (a doc lands in 1 + ⌊(n−1)/seqLen⌋ sequences — total rows
    * = docs + crossings, ≤ docs + totalTokens/seqLen) and one seq-keyed
    * aggregate. No driver state beyond the prefix sum's partition row. */
  def packFixedSequences(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      seqLen: Long
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    withRunningTotal(df, orderCol, tokenCol, "__cum")
      .withColumn("__n", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("__start", col("__cum") - col("__n"))
      .withColumn("__first", expr(s"__start div ${seqLen}L"))
      .withColumn("__last", expr(
        s"case when __n <= 0 then __start div ${seqLen}L " +
          s"else (__start + __n - 1) div ${seqLen}L end"))
      .withColumn("seq_id", explode(expr("sequence(__first, __last)")))
      .withColumn("__tok_in_seq", expr(
        s"greatest(0L, least(__start + __n, (seq_id + 1) * ${seqLen}L) - " +
          s"greatest(__start, seq_id * ${seqLen}L))"))
      .groupBy("seq_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("__tok_in_seq")).cast("long").as("n_tokens"),
        sum(when(col("__first") =!= col("__last"), 1L).otherwise(0L))
          .cast("long").as("n_split_docs"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
  }

  /** EXCLUSIVE running max of `valueCol` over the total order given by
    * `orderCol` (unique, as in [[withRunningTotal]]): each row gets the max
    * over all STRICTLY EARLIER rows, null for the first. Same two-phase
    * distributed-scan shape as the prefix sum — per-slice window plus a
    * #partitions-row exclusive prefix of slice maxima broadcast back —
    * because max, like sum, is associative. The single-task
    * `Window.orderBy` form this replaces cannot scale. */
  def withRunningMaxExclusive(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String
  ): DataFrame = {
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wPrev = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // same materialize-before-collect discipline as withRunningTotal: pin
    // ONE range partitioning for both the maxima collect and the final join
    val withLocal = ranged
      .withColumn("__local", max(col(valueCol).cast("long")).over(wPrev))
      .localCheckpoint()
    val maxima = withLocal.groupBy(col("__pid"))
      .agg(max(col(valueCol).cast("long")).as("__mx"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var acc: Option[Long] = None
    val offsets = maxima.map { case (pid, mx) =>
      val off = (pid, acc)
      acc = (acc.toSeq ++ mx.toSeq).reduceOption((a: Long, b: Long) => math.max(a, b))
      off
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(
      offsets.map { case (p, o) => (p, o.getOrElse(Long.MinValue), o.isDefined) }
        .toDF("__pid", "__offv", "__offh"))
    withLocal.join(offDf, Seq("__pid"))
      .withColumn(outCol,
        greatest(col("__local"), when(col("__offh"), col("__offv"))))
      .drop("__pid", "__local", "__offv", "__offh")
  }

  /** Distributed `lead(orderCol, 1)`: each row gets the NEXT row's order
    * value in the total order, null for the global last row — the third
    * member of the two-phase scan family (prefix sum, running max, lead).
    * Per-slice `lead` covers everything except each partition's last row,
    * whose successor lives in the next non-empty slice; those boundaries
    * are exactly the per-partition minima (#partitions rows), collected
    * once and broadcast back. `orderCol` must be unique, as elsewhere. */
  def withNextValue(
      df: DataFrame,
      orderCol: String,
      outCol: String
  ): DataFrame = {
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wLead = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val minima = ranged.groupBy(col("__pid"))
      .agg(min(col(orderCol).cast("long")).as("__mn"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // boundary for slice p = the min of the NEXT non-empty slice
    val boundary = minima.sliding(2).collect {
      case Array((p, _), (_, nextMin)) => (p, nextMin)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val bDf = broadcast(boundary.toDF("__pid", "__bnext"))
    ranged
      .withColumn("__ll", lead(col(orderCol).cast("long"), 1).over(wLead))
      .join(bDf, Seq("__pid"), "left")
      .withColumn(outCol, coalesce(col("__ll"), col("__bnext")))
      .drop("__pid", "__ll", "__bnext")
  }

  /** Padding-waste certificate for fixed-size batch assembly: under each
    * candidate document ORDER (a strategy), consecutive runs of `batchSize`
    * documents form a batch padded to its longest member — the layout used
    * when sequences are batched un-packed. Reports, per strategy, how many
    * tokens the padding burns and the utilization in basis points; the
    * classic result this certifies is that length-sorted batching recovers
    * most of the padding a natural (ingest-order) layout wastes.
    *
    * Ranks come from [[withRunningTotal]]'s distributed prefix sum — NOT a
    * global `row_number` window (single task) — so each strategy costs one
    * range shuffle + one #partitions-row collect at any scale. `orderKey`
    * must be unique per row (same contract as [[withRunningTotal]]).
    * All-integer arithmetic; `util_bp = total*10000 div slots` exact. */
  def paddingWaste(
      df: DataFrame,
      lenCol: String,
      batchSize: Int,
      strategies: Seq[(String, org.apache.spark.sql.Column)]
  ): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(strategies.nonEmpty, "need at least one ordering strategy")
    strategies.map { case (label, orderKey) =>
      val keyed = df.select(orderKey.as("__ord"),
        coalesce(col(lenCol).cast("long"), lit(0L)).as("__len"))
        .withColumn("__one", lit(1L))
      withRunningTotal(keyed, "__ord", "__one", "__rn")
        .withColumn("__batch", expr(s"(__rn - 1) div ${batchSize}L"))
        .groupBy("__batch")
        .agg(max("__len").as("__mx"), sum("__len").as("__tot"),
          count(lit(1)).as("__n"))
        .agg(count(lit(1)).as("n_batches"), sum("__tot").as("total_tokens"),
          sum(col("__mx") * col("__n")).as("slot_tokens"))
        .select(lit(label).as("strategy"), col("n_batches"),
          col("total_tokens"),
          (col("slot_tokens") - col("total_tokens")).as("waste_tokens"),
          expr("total_tokens * 10000 div slot_tokens").as("util_bp"))
    }.reduce(_ unionByName _)
  }
}
