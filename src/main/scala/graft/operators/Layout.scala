package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Hilbert-curve index of a 2-D cell — the locality-tighter alternative
    * to [[zOrderKey]]: Morton order takes long diagonal jumps at power-of-
    * two boundaries (bit carry flips the high lanes), while the Hilbert
    * curve visits every cell via unit steps, so a range predicate's box
    * maps to fewer, longer runs of the sort key — fewer zone-map windows
    * touched for the same box (the spec quantifies it: total key jump
    * along a grid walk is ~2× smaller than Morton's on the same grid).
    *
    * The classic xy2d loop (Hamilton's algorithm, public domain) folded
    * over the bit levels as ONE `aggregate` higher-order expression —
    * pure codegen'd integer CASE/xor/shift algebra over a plan-time
    * constant array, no UDF, no recursion, so the identical algebra is
    * replayable step-for-step in ANSI SQL (the oracle unrolls the same
    * `bits` levels as chained CTEs). Inputs must be in [0, 2^bits);
    * compose with [[zOrderBucketized]]'s range mapping for raw columns.
    * `xCol`/`yCol` are column NAMES (expression-string composition). */
  def hilbertIndex(xCol: String, yCol: String, bits: Int): Column = {
    require(bits > 0 && 2 * bits <= 62, "need 1 <= bits <= 31")
    val sValues = (0 until bits).map(i => 1L << (bits - 1 - i))
    val m = (1L << bits) - 1 // flips invert against the FULL grid: the
    // coordinate still carries the just-consumed bit, so a level-sized
    // flip would go negative; higher bits are never examined again
    expr(
      s"""aggregate(
         |  array(${sValues.mkString("L,")}L),
         |  named_struct('d', 0L, 'x', CAST(`$xCol` AS BIGINT), 'y', CAST(`$yCol` AS BIGINT)),
         |  (a, sv) -> named_struct(
         |    'd', a.d + sv * sv * ((CASE WHEN (a.x & sv) > 0 THEN 3L ELSE 0L END) ^
         |                          (CASE WHEN (a.y & sv) > 0 THEN 1L ELSE 0L END)),
         |    'x', CASE WHEN (a.y & sv) > 0 THEN a.x
         |              WHEN (a.x & sv) > 0 THEN ${m}L - a.y ELSE a.y END,
         |    'y', CASE WHEN (a.y & sv) > 0 THEN a.y
         |              WHEN (a.x & sv) > 0 THEN ${m}L - a.x ELSE a.x END),
         |  a -> a.d)""".stripMargin)
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

  /** RLE run counts for every column in `cols` under the ordering `ordCol`,
    * measured inside `bucketRows`-row "row groups" (runs don't span row-group
    * boundaries, matching how Parquet encodes). Fewer runs = tighter RLE /
    * dictionary-RLE encoding AND better min/max locality — the integer that
    * ranks candidate sort keys. One range shuffle for the global rank
    * (Packing prefix sum — never a single-task window), then per-bucket lag
    * windows that parallelize across buckets.
    *
    * Rows tied on `ordCol` count runs in an unspecified (but
    * Spark-deterministic per plan) tie order — same caveat as any
    * ORDER BY on a non-unique key; pass a composite ordering to pin it. */
  def rleRuns(df: DataFrame, ordCol: Column, cols: Seq[String],
      bucketRows: Int, label: String): DataFrame = {
    require(cols.nonEmpty, "need at least one measured column")
    require(bucketRows > 0, "bucketRows must be positive")
    val keyed = df.select(ordCol.as("__ord") +:
      cols.map(c => col(c).cast("string").as(s"__c_$c")): _*)
      .withColumn("__one", lit(1L))
    val ranked = Packing.withRunningTotal(keyed, "__ord", "__one", "__rn")
      .withColumn("__b", expr(s"(__rn - 1) div ${bucketRows}L"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__rn"))
    val flagged = cols.foldLeft(ranked) { (acc, c) =>
      val v = col(s"__c_$c")
      // row 1 of each bucket always opens a run; after that a run opens
      // exactly when the value differs null-safely from its predecessor
      acc.withColumn(s"__chg_$c",
        when(row_number().over(w) === 1, 1L)
          .otherwise(when(!(v <=> lag(v, 1).over(w)), 1L).otherwise(0L)))
    }
    val aggs = cols.map(c => sum(col(s"__chg_$c")).as(s"runs_$c"))
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    cols.map(c => one.select(lit(label).as("layout"),
        lit(c).as("column_name"), col(s"runs_$c").as("runs")))
      .reduce(_ unionByName _)
  }

  /** Dictionary-vs-plain encoding verdict per column from ONE aggregate
    * pass: exact NDV against row count; below `dictThresholdBp` basis
    * points of distinct values the column dictionary-encodes well. */
  def encodingAdvice(df: DataFrame, cols: Seq[String],
      dictThresholdBp: Long = 500L): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).as("n") +:
      cols.map(c => countDistinct(col(c)).as(s"__ndv_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      one.select(lit(c).as("column_name"), col("n"),
        col(s"__ndv_$c").as("ndv"),
        expr(s"`__ndv_$c` * 10000 div n").as("ndv_bp"),
        when(expr(s"`__ndv_$c` * 10000 div n") < dictThresholdBp, "dictionary")
          .otherwise("plain").as("encoding"))
    }.reduce(_ unionByName _).orderBy("column_name")
  }

  /** Compaction plan over a file inventory — the "small files problem"
    * planner: within each table partition, files under `smallThreshold`
    * pack contiguously (ascending file id — rewrite locality, adjacent
    * files merge together) into target-size output bins, `bin_id` =
    * bytes-before div `targetSize`. Files at/over the threshold are left
    * alone (rewriting them is pure write amplification). Returns the small
    * files with their assigned `bin_id`.
    *
    * Scale shape: a file inventory is METADATA — one row per file, ~10⁶
    * rows for a 100 TB table — so the per-partition prefix-sum window is
    * safe (partitions parallelize; no partition holds more files than its
    * own directory). The data itself is never touched here; the plan is
    * what a rewrite job consumes. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, smallThreshold: Long, targetSize: Long): DataFrame = {
    require(smallThreshold > 0, "smallThreshold must be positive")
    require(targetSize > 0, "targetSize must be positive")
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.filter(col(sizeCol) < smallThreshold)
      .withColumn("__cum", sum(col(sizeCol).cast("long")).over(w))
      .withColumn("bin_id",
        expr(s"(__cum - CAST(`$sizeCol` AS BIGINT)) div ${targetSize}L"))
      .drop("__cum")
  }

  /** Combined layout advice — the decision frame behind the `advise-layout`
    * CLI: for the natural input order plus one candidate layout per sort
    * column, measure (a) total RLE runs across ALL candidate columns
    * ([[rleRuns]]) and (b) zone-map scan amplification ([[zoneMapScan]])
    * for the `lo..hi` probe on `valueCol` — rows a min/max-pruning reader
    * fetches per matching row. Sorting by a candidate uses the OTHER
    * candidates as tie-breakers (the multi-column sort a writer would
    * actually emit). One row per layout; lower runs + lower amplification
    * = the layout to pick. Everything is bucketed aggregate algebra — no
    * all-pairs, no driver loop; per-layout passes scale linearly and there
    * are |candidates|+1 of them. */
  def adviseLayout(df: DataFrame, candidates: Seq[String], valueCol: String,
      bucketRows: Int, lo: Long, hi: Long): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate sort column")
    val layouts: Seq[(String, Column)] =
      ("natural", monotonically_increasing_id()) +:
        candidates.map { c =>
          val tiebreak = candidates.filterNot(_ == c).map(col)
          (s"sort:$c", struct(col(c) +: tiebreak: _*))
        }
    layouts.map { case (label, ord) =>
      val runs = rleRuns(df, ord, candidates, bucketRows, label)
        .groupBy("layout").agg(sum("runs").as("total_runs"))
      val zone = zoneMapScan(df, ord, col(valueCol), bucketRows, lo, hi, label)
      runs.join(zone, Seq("layout"))
        .select(col("layout"), col("total_runs"), col("n_buckets"),
          col("buckets_scanned"), col("rows_total"), col("rows_scanned"),
          col("rows_matching"), col("amplification_bp"))
    }.reduce(_ unionByName _).orderBy("layout")
  }

  /** REAL Parquet footer statistics — the physical layer behind every
    * zone-map argument in this file: footers open ON EXECUTORS (the
    * driver only lists file names), each yielding row-group × column
    * metadata rows, then one small keyed aggregate merges per-column
    * value counts and typed global min/max (integral stats merge on a
    * long lane, UTF8 binary on a string lane — string-comparing "9" vs
    * "10" would invert the order, and the spec plants that trap). The
    * q216 certificate simulates row-group pruning; this reads the stats
    * a pruning reader actually consults. Caveats: Parquet may truncate
    * binary min/max for long strings, and float/INT96 stat types are
    * skipped rather than rendered unportably — restrict to
    * short-string/integral columns when comparing against exact data
    * aggregates. */
  def parquetFooterStats(spark: org.apache.spark.sql.SparkSession, path: String,
      columns: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(columns.nonEmpty, "need at least one column")
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // the driver only LISTS (names are cheap at any file count); every
    // footer OPEN happens on executors — at 10⁶ files a driver-side
    // footer loop would be the bottleneck, exactly the pattern this
    // repo's no-driver-loops discipline forbids
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet"))
          .map(_.toString).sorted.toSeq
      else Seq(p.toString)
    val confEntries = {
      import scala.jdk.CollectionConverters._
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    val bc = spark.sparkContext.broadcast(confEntries)
    val wanted = columns.toSet
    import spark.implicits._
    val perChunk = spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism).max(1))
      .mapPartitions { it =>
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import scala.jdk.CollectionConverters._
        val c = new org.apache.hadoop.conf.Configuration(false)
        bc.value.foreach { case (k, v) => c.set(k, v) }
        it.flatMap { fp =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(fp), c))
          // footers only: row-group × column metadata rows, data pages
          // are never read. Integral stats ride the long lane, UTF8
          // binary the string lane (ASCII-safe lexicographic merge);
          // float/INT96/other stat types are skipped — rendering them
          // portably is the caller's problem, not silently wrong here.
          try reader.getFooter.getBlocks.asScala.flatMap { block =>
            block.getColumns.asScala.flatMap { cc =>
              val name = cc.getPath.toDotString
              // wildcard ascription: the raw getter infers an existential
              // Statistics[T forSome ...] the compiler warns about
              val st: org.apache.parquet.column.statistics.Statistics[_] = cc.getStatistics
              if (!wanted.contains(name) || st == null || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  Some((name, cc.getValueCount, Some(mn.longValue), Some(mx.longValue),
                    None: Option[String], None: Option[String]))
                case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                  Some((name, cc.getValueCount, Some(mn.longValue), Some(mx.longValue),
                    None: Option[String], None: Option[String]))
                case (mn: org.apache.parquet.io.api.Binary, mx: org.apache.parquet.io.api.Binary) =>
                  Some((name, cc.getValueCount, None: Option[Long], None: Option[Long],
                    Some(mn.toStringUsingUTF8), Some(mx.toStringUsingUTF8)))
                case _ => None
              }
            }
          }.toList
          finally reader.close()
        }
      }
      .toDF("column_name", "num_values", "min_l", "max_l", "min_s", "max_s")
    perChunk.groupBy("column_name")
      .agg(sum("num_values").as("num_values"),
        min("min_l").as("min_l"), max("max_l").as("max_l"),
        min("min_s").as("min_s"), max("max_s").as("max_s"))
      .select(col("column_name"), col("num_values"),
        coalesce(col("min_l").cast("string"), col("min_s")).as("min_value"),
        coalesce(col("max_l").cast("string"), col("max_s")).as("max_value"))
      .orderBy("column_name")
  }

  /** Consistent-hash ring positions: `vnodes` virtual nodes per shard at
    * the md5-fold of `ring:shard:vnode`, sorted by position (shard index
    * breaks the astronomically-unlikely position tie). Pure driver-side
    * arithmetic on the SHARD LIST — never on data — so the ring is a
    * plan-time literal a few KB large. */
  def consistentHashRing(nShards: Int, vnodes: Int): Seq[(Long, Int)] = {
    require(nShards >= 1 && vnodes >= 1, "need at least one shard and vnode")
    val md = java.security.MessageDigest.getInstance("MD5")
    val ring = for { s <- 0 until nShards; v <- 0 until vnodes } yield {
      val hex = md.digest(s"ring:$s:$v".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16), s)
    }
    ring.sortBy(identity)
  }

  /** Consistent-hash shard assignment: the key's shard is the first ring
    * vnode at or clockwise-after md5-fold(`key:k`), wrapping to the ring
    * start. The property this buys (the OTHER classic minimal-movement
    * scheme next to [[rendezvousShard]]): adding shard n+1 only inserts
    * that shard's vnodes, so keys can only move TO the new shard — old
    * shards never trade keys with each other. Pure scan-fused codegen'd
    * expression over a literal array; no shuffle, no UDF, no driver data
    * access.
    *
    * Cost note: the filter scans the ring linearly per row —
    * O(nShards·vnodes) work per key, fine through ~10³ vnodes total.
    * A 1000-shard fleet should pre-bucket the ring by hash high bits
    * (one extra CASE level) before reaching for this expression; the
    * assignment SEMANTICS (first vnode clockwise) stay identical. */
  def consistentShard(keyCol: String, nShards: Int, vnodes: Int): Column = {
    val ring = consistentHashRing(nShards, vnodes)
    val arr = ring.map { case (p, s) => s"struct(${p}L AS pos, $s AS shard)" }
      .mkString("array(", ", ", ")")
    val kh = s"cast(conv(substring(md5(concat('key:', cast(`$keyCol` as string))), 1, 8), 16, 10) as bigint)"
    // ONE aggregate() fold over the (sorted) ring: the zero element carries
    // the key hash, so md5 runs once per row — the earlier two-filter CASE
    // embedded the hash inside each lambda body, where HOF codegen
    // re-evaluated it per vnode comparison (2·vnodes md5 calls per row).
    // The first vnode at/after the hash wins; shard = -1 is the "none yet"
    // sentinel, resolved to the ring start (wrap) in the finish lambda.
    expr(s"""aggregate($arr,
            |  named_struct('kh', $kh, 'shard', -1),
            |  (acc, r) -> IF(acc.shard = -1 AND r.pos >= acc.kh,
            |                 named_struct('kh', acc.kh, 'shard', r.shard), acc),
            |  acc -> IF(acc.shard = -1, ${ring.head._2}, acc.shard))""".stripMargin)
  }

  def rendezvousShard(keyCol: String, nShards: Int): Column = {
    require(nShards >= 1, "nShards must be >= 1")
    expr(
      s"""array_max(transform(sequence(0, ${nShards - 1}),
         |  t -> struct(CAST(conv(substring(md5(concat(CAST(`$keyCol` AS STRING), ':', CAST(t AS STRING))), 1, 8), 16, 10) AS BIGINT) AS w,
         |              t))).t""".stripMargin)
  }
}
