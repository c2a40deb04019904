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

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default; read `ts` as raw nanos (legacy conf) and surface it
    * as a microsecond TimestampType column. DuckDB reads the same file as
    * TIMESTAMP_NS — hour/day truncations agree on both. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
  }
}
