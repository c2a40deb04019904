package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-run snapshot isolation — the reference's `dbt_model_diff__{run_id}`
  * schema of CTAS copies (core/diff_flow.py:69-71, adapters/postgres.py:29-44)
  * re-expressed as a run-scoped directory of Parquet tables.
  *
  * Parquet snapshots are a strict upgrade over warehouse CTAS at scale:
  * columnar layout, min/max row-group stats (scan pruning for every later
  * comparison pass), and immutability — both diff sides become immune to
  * re-planning drift, the same isolation property the reference buys with
  * its throwaway schema.
  *
  * All IO goes through `org.apache.hadoop.fs.FileSystem` resolved from the
  * root path's scheme, NOT `java.io.File`: a 100 TB deployment keeps its
  * snapshots on HDFS/S3/ABFS, where `java.io` doesn't exist. The commit
  * protocol is tmp-dir → rename → `_GRAFT_COMMITTED` marker, and the MARKER
  * IS THE SOLE COMMIT SIGNAL readers trust: on HDFS the rename is atomic
  * (belt and braces); on object stores whose "rename" is copy+delete a
  * killed run can leave a half-copied destination, but never one carrying
  * the marker — [[read]] refuses it either way. Local `file://` behavior is
  * unchanged (Hadoop's local FS implements the same contract).
  */
final class SnapshotStore(spark: SparkSession, rootDir: String, runId: String) {
  import SnapshotStore._

  val runDir: String = s"${rootDir.stripSuffix("/")}/${sanitize(runId)}"

  private def hadoopConf: Configuration = spark.sessionState.newHadoopConf()

  /** The filesystem owning the snapshot root — `file://`, `hdfs://`,
    * `s3a://`, … resolved from the path's scheme via the session's Hadoop
    * configuration (so `spark.hadoop.fs.*` settings apply). */
  private def fs: FileSystem = new Path(runDir).getFileSystem(hadoopConf)

  private def path(table: String): Path = new Path(s"$runDir/${sanitize(table)}")

  /** CTAS-equivalent snapshot copy (adapters/postgres.py:37-44): materialize
    * an immutable Parquet copy; overwrite = the reference's
    * `drop table if exists` + `create table as`.
    *
    * ATOMIC COMMIT: the copy is written to `<table>.tmp` and renamed into
    * place only after the write fully succeeds, with a `_GRAFT_COMMITTED`
    * marker written after the rename. The reference gets this isolation
    * from warehouse CTAS (a transaction either creates the table or
    * doesn't); a plain `df.write.parquet(dst)` does not — a killed run
    * leaves a torn directory that a later diff would silently read as "the
    * table lost rows". [[read]] refuses uncommitted snapshots instead. */
  def snapshot(df: DataFrame, table: String): DataFrame =
    commitVia(table)(tmp => df.write.mode("overwrite").parquet(tmp.toString))

  def read(table: String): DataFrame = {
    val dir = path(table)
    require(fs.exists(new Path(dir, CommitMarker)),
      s"snapshot '$table' at $dir is not committed (torn write from an " +
        "interrupted run?) — refusing to diff against it")
    spark.read.parquet(dir.toString)
  }

  /** Bucketed snapshot: both diff sides written `bucketBy(keys)` land
    * co-partitioned, so every later key join (the full-outer row diff, the
    * anti joins) runs with ZERO exchange — the scans are already hash-
    * distributed on the diff keys. At 100 TB this converts the diff's one
    * remaining shuffle of both tables into none; the sort/cluster cost is
    * paid once at snapshot time, amortized over every comparison query.
    * Requires a catalog table (bucketing metadata lives there). */
  def snapshotBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): DataFrame = {
    val qualified = s"${SnapshotStore.sanitize(runId)}_${SnapshotStore.sanitize(table)}"
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path(table).toString)
      .saveAsTable(qualified)
    spark.table(qualified)
  }

  /** Hive-style partitioned snapshot: subsequent comparisons filtered on the
    * partition column(s) (e.g. diffing one day/region of a 100 TB table)
    * read ONLY the matching directories — partition pruning happens before
    * any IO is scheduled. Pair with the reference's `--where` flag: a
    * predicate on a partition column turns a full-table diff into a
    * per-partition one. */
  def snapshotPartitioned(df: DataFrame, table: String, partitionCols: Seq[String]): DataFrame =
    commitVia(table)(tmp =>
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp.toString))

  /** The shared tmp → rename → marker commit. The destination is deleted
    * only AFTER the tmp copy fully wrote; if the rename (or an object
    * store's copy-loop behind it) dies midway, the destination has no
    * marker and [[read]] refuses it — torn-write-safe on every scheme. */
  private def commitVia(table: String)(write: Path => Unit): DataFrame = {
    val dst = path(table)
    val tmp = new Path(dst.toString + ".tmp")
    val f = fs
    if (f.exists(tmp)) f.delete(tmp, true)
    write(tmp)
    if (f.exists(dst)) f.delete(dst, true)
    require(f.rename(tmp, dst), s"atomic snapshot commit failed: rename $tmp -> $dst")
    f.create(new Path(dst, CommitMarker), true).close()
    read(table)
  }

  /** Z-ORDERED snapshot: rows range-partitioned and sorted along the
    * Morton curve over `dims` (see [[graft.operators.Layout]]) before the
    * same tmp → rename → marker commit as [[snapshot]]. Every output file
    * then covers a compact multi-dimensional tile, so Parquet min/max
    * stats prune later diffs/scans filtered on ANY of the clustered
    * columns — the `--where l_suppkey = …` diff against a
    * `(l_partkey, l_suppkey)`-z-ordered 100 TB snapshot reads O(matching
    * tiles), where a lexicographic sort would prune only its leading
    * column. The curve key is layout-only and dropped from the data. */
  def snapshotZOrdered(df: DataFrame, table: String, dims: Seq[String],
      bitsPerDim: Int = 8, files: Int = 0): DataFrame = {
    val n = if (files > 0) files
      else spark.sessionState.conf.numShufflePartitions
    val keyed = graft.operators.Layout.zOrderBucketized(df, dims, bitsPerDim)
    val laid = keyed
      .repartitionByRange(n, keyed("z_key"))
      .sortWithinPartitions("z_key")
      .drop("z_key")
    snapshot(laid, table)
  }

  /** Compact a committed snapshot to `targetFiles` files — the small-file
    * management every long-lived Parquet lake needs: a snapshot written by
    * a 1000-task job carries 1000 files; every later comparison pays 1000
    * opens/footer reads. Rewrite goes through the same tmp + rename +
    * marker protocol as [[snapshot]], so a killed compaction can never
    * tear the original (the source directory is replaced only after the
    * compacted copy fully commits). `coalesce` (not `repartition`) — a
    * pure merge, no shuffle of the data. */
  def compact(table: String, targetFiles: Int): DataFrame = {
    require(targetFiles > 0, "targetFiles must be positive")
    snapshot(read(table).coalesce(targetFiles), table)
  }

  /** Retention GC: delete committed run directories under `rootDir` whose
    * last modification is older than `maxAgeMillis` — the reference drops
    * its diff schema per run (diff_flow.py:271-275); long-lived stores
    * (`--keep-snapshots`) need the janitor form. The CURRENT run's dir is
    * never dropped. Returns the dropped run ids. */
  def gc(maxAgeMillis: Long, now: Long = System.currentTimeMillis()): Seq[String] = {
    val root = new Path(rootDir)
    val f = fs
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != sanitize(runId))
      .filter(s => now - s.getModificationTime > maxAgeMillis)
      .map { s => f.delete(s.getPath, true); s.getPath.getName }
  }

  /** Drop the catalog entries created by bucketed snapshots. */
  def dropTable(table: String): Unit = {
    val qualified = s"${SnapshotStore.sanitize(runId)}_${SnapshotStore.sanitize(table)}"
    spark.sql(s"DROP TABLE IF EXISTS $qualified")
    ()
  }

  /** `drop schema … cascade` cleanup (adapters/postgres.py:33-35), honoring
    * the reference's `--keep-schemas` escape hatch (diff_flow.py:271-275). */
  def drop(): Unit = { fs.delete(new Path(runDir), true); () }
}

object SnapshotStore {

  /** Underscore-prefixed so Spark/Hadoop readers ignore it as a data file
    * (the `_SUCCESS` convention). Present = the snapshot write completed
    * and was renamed into place. */
  val CommitMarker = "_GRAFT_COMMITTED"

  /** Identifier sanitization with the reference's exact semantics
    * (core/util.py:8-32): non-alphanumerics collapse to `_`, lowercase,
    * trimmed of leading/trailing `_`, capped at 60 chars. */
  def sanitize(ident: String, maxLen: Int = 60): String = {
    val cleaned = ident.replaceAll("[^a-zA-Z0-9_]+", "_").toLowerCase
      .replaceAll("^_+|_+$", "")
    val out = if (cleaned.isEmpty) "run" else cleaned
    out.take(maxLen)
  }
}
