package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
