package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DateType, DecimalType, TimestampNTZType, TimestampType}

package object queries {

  /** One driver-checkable query: a Spark DataFrame program plus (when the
    * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
    * same parquet tables. Column names/types and row order are made identical
    * on both sides — the driver hash-compares values. */
  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String]
  )

  private def needsTextRender(dt: DataType): Boolean = dt match {
    case _: DecimalType                              => true
    case DateType | TimestampType | TimestampNTZType => true
    case _                                           => false
  }

  /** Output-boundary canonicalization. The driver reads the Spark result via
    * pyarrow (typed `Decimal`/`date` objects) but the DuckDB oracle via
    * `fetchdf` (float64/datetime64), so a DECIMAL/DATE/TIMESTAMP column in the
    * FINAL projection hash-mismatches even when values are identical. Exact
    * DECIMAL math stays internal (order-independent aggregation); the last
    * projection renders those columns as text — the reference's own
    * comparison scheme is likewise text-rendered (adapters/postgres.py:99).
    * Every oracle SQL mirrors this with CAST(... AS VARCHAR), applied in the
    * same SELECT as the ORDER BY so ordering stays on the typed value. */
  def canonOut(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(f => needsTextRender(f.dataType))) df
    else
      df.select(df.schema.fields.toIndexedSeq.map { f =>
        if (needsTextRender(f.dataType)) col(f.name).cast("string").as(f.name)
        else col(f.name)
      }: _*)

  /** Globally-ordered output without executing the pipeline twice: a global
    * `orderBy` plans a range exchange whose partition-bound SAMPLING pass
    * re-runs everything above the last materialized stage — for a query
    * whose final stage is an expensive join/aggregate, that roughly doubles
    * the cost (measured 40% of q24's wall before this). Materializing the
    * (typically much smaller) result first makes the sampler read the
    * materialized blocks instead. Use on ordered outputs whose pre-sort
    * pipeline is the expensive part; a plain scan+filter doesn't need it. */
  def orderedOut(df: DataFrame, cols: String*): DataFrame =
    df.localCheckpoint().orderBy(cols.map(col): _*)

  /** Load one of the driver-generated parquet tables (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Load a table guaranteeing at least the session's shuffle parallelism
    * for downstream per-row work. A single-file, single-row-group fixture
    * scans as ONE partition, so an expensive projection right above the
    * scan (shingle hashing, media decode) runs on one core of 32 — q318
    * measured 6.0 → 1.0 s from exactly this. At cluster scale a table has
    * at least `maxPartitionBytes`-many splits and the guard makes this a
    * no-op, so the round-robin shuffle cost is only ever paid on inputs
    * small enough for it to be trivial. Two plan caveats, both verified on
    * Spark 4.1.2: the optimizer collapses a deterministic Project pair
    * THROUGH the exchange when another Project sits between repartition
    * and scan (so repartition the scan itself, as here, not a projection
    * of it), and a pushable Filter referencing the heavy column re-runs
    * the whole expression below the exchange on the one scan task (so
    * pre-filter on a cheap equivalent predicate instead — see q318). */
  def tParallel(spark: SparkSession, dir: String, name: String): DataFrame = {
    // raw-scan-only by construction (t() is always a bare parquet scan),
    // so the eager .rdd partition probe below is safe here — the general
    // guard with the scan-rooted check is Par.ensureParallel
    val df = t(spark, dir, name)
    val target = spark.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** events.parquet's `ts` physical type has varied across driver-generated
    * testdata versions: TIMESTAMP(NANOS) (which Spark's parquet reader
    * surfaces as raw Long nanos under the legacy conf), TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (TimestampNTZType), or a plain TimestampType.
    * Normalize all three to a microsecond TimestampType column so every
    * downstream query sees one shape. All sessions here run with
    * spark.sql.session.timeZone=UTC (Verify/Bench/SparkTestBase), so the
    * NTZ→instant cast is the identity on wall-clock values and agrees with
    * DuckDB's naive read of the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** events with `ts` additionally surfaced as an exact epoch-micros Long
    * column `ts_us` — the tie-free integer time axis the window/debounce/
    * funnel queries aggregate on. Integer-exact in every schema branch
    * (`div`, not floating division, for the nanos-as-Long case). */
  def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_us", expr("ts div 1000"))
      case TimestampType => raw.withColumn("ts_us", unix_micros(col("ts")))
      case _ =>
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
    }
  }
}
