package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingest/export — the interchange format training-data
  * pipelines actually ship (one JSON document per line, newline-delimited).
  *
  * Reading is SCHEMA-EXPLICIT by contract: Spark's JSON schema inference
  * runs a whole extra pass over the data and silently unions drifting
  * shapes — at corpus scale both are unacceptable. Malformed lines land in
  * a `_corrupt_record` column (PERMISSIVE mode) so ingest can quarantine
  * them instead of failing the build or silently dropping data; use
  * [[partitionCorrupt]] to split the two streams.
  */
object CorpusIO {

  val CorruptCol = "_corrupt_record"

  /** Read newline-delimited JSON with an explicit schema; bad lines are
    * captured in `_corrupt_record` rather than dropped or fatal. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, org.apache.spark.sql.types.StringType)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Split a [[readJsonl]] frame into (clean rows without the corrupt
    * column, quarantined raw lines). Counts of the two sides are the ingest
    * health metric.
    *
    * The parsed frame is CACHED here: Spark refuses corrupt-column-only
    * queries over raw JSON (the parser would have to re-read the file just
    * to reproduce failures — `QUERY_ONLY_CORRUPT_RECORD_COLUMN`), and both
    * sides of the split want the same single parse anyway. At corpus scale
    * the right pattern is write-through: save the parsed frame once, then
    * split from the saved copy — this helper is the in-memory form of that
    * pattern for frames that fit the cache tier (MEMORY_AND_DISK spills,
    * it does not OOM). Call `unpersist()` on the returned clean frame's
    * input when done. */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    require(df.columns.contains(CorruptCol), s"frame has no $CorruptCol column")
    val parsed = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")))
  }

  /** Write JSONL sharded into AT MOST `shards` files by RANGE of
    * `orderCol` — the export format downstream tokenizer/training jobs
    * consume. Range (not hash) sharding keeps each shard a contiguous id
    * interval, so a consumer can map shard → id range without reading the
    * others. The range partitioner samples its bounds, so low-cardinality
    * or skewed order columns can leave some ranges empty and produce fewer
    * files — consumers must enumerate the directory, not assume exactly
    * `shards` entries. */
  def writeJsonl(df: DataFrame, path: String, orderCol: String, shards: Int): Unit = {
    require(shards > 0, "shards must be positive")
    df.repartitionByRange(shards, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .write.mode("overwrite").json(path)
  }
}
