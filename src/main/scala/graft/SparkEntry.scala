package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-module packs (graft.queries.*); each pack
  * entry pairs a Spark DataFrame program with a DuckDB oracle when the
  * semantics are ANSI-SQL-expressible. */
object SparkEntry {

  private def packs: Seq[QueryDef] = ParityQueries.defs ++ ExtensionQueries.defs

  /** Flagship: full diff pipeline (rowcounts, schema diff, profiles, row
    * diff) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/orders.parquet")
    val head = base
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 131 =!= 0)
    val r = graft.engine.DiffEngine.diff(base, head, keys = Seq("o_orderkey"), model = "orders_smoke")
    Seq(
      ("base_rows", r.rowcounts.base),
      ("head_rows", r.rowcounts.head),
      ("added", r.rowDiff.map(_.added).getOrElse(-1L)),
      ("removed", r.rowDiff.map(_.removed).getOrElse(-1L)),
      ("changed", r.rowDiff.map(_.changed).getOrElse(-1L))
    ).toDF("metric", "value")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
