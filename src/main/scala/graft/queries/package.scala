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
}
