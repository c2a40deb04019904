package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.DiffEngine

/** The reference's operator inventory (SURVEY.md §2) as driver-checkable
  * queries over the TPC-H-ish testdata tables.
  *
  * Cross-engine parity rules (Spark result must hash-match the DuckDB oracle):
  *   - every multi-row result is ORDER BY'd on a unique key on both sides;
  *   - doubles are never aggregated raw — inputs are cast to DECIMAL first
  *     (exact, order-independent) so partial-aggregation order can't perturb
  *     low bits; raw doubles only ever pass through untouched;
  *   - timestamps are cast to DATE (or hashed via their DATE rendering) —
  *     identical text form in Spark (UTC session) and DuckDB;
  *   - row hashes stringify via DECIMAL/DATE renderings, which are
  *     byte-identical across engines (SURVEY §7.3 risk #1).
  */
object ParityQueries {

  /** Canonical orders projection used by the diff-family queries: doubles →
    * DECIMAL(18,2), timestamps → DATE, so the md5 row-hash scheme
    * (adapters/postgres.py:94-101) renders identically in Spark and DuckDB. */
  private def ordersCanon(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_custkey"),
      col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"),
      to_date(col("o_orderdate")).as("o_orderdate"),
      col("o_orderpriority")
    )

  private val ordersCanonSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |       CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
      |       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      |FROM orders""".stripMargin

  /** Synthetic HEAD side for the diff-family queries (FIXTURES.md §3: clone +
    * perturb with a known recipe): delete keys %131==0, mutate
    * o_orderpriority on keys %97==0, append fresh keys (+10M) for %139==0. */
  private def ordersHead(s: SparkSession, dir: String): DataFrame = {
    val o = ordersCanon(s, dir)
    val survived = o
      .filter(col("o_orderkey") % 131 =!= 0)
      .withColumn(
        "o_orderpriority",
        when(col("o_orderkey") % 97 === 0, lit("X-MUTATED")).otherwise(col("o_orderpriority")))
    val fresh = o
      .filter(col("o_orderkey") % 139 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    survived.unionByName(fresh)
  }

  private val ordersHeadSql =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       |       CASE WHEN o_orderkey % 97 = 0 THEN 'X-MUTATED' ELSE o_orderpriority END AS o_orderpriority
       |FROM ($ordersCanonSql) ob WHERE o_orderkey % 131 <> 0
       |UNION ALL
       |SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
       |FROM ($ordersCanonSql) oa WHERE o_orderkey % 139 = 0""".stripMargin

  private val nonKeyCols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** TPC-H Q3-shaped SQL written once in the dialect intersection of Spark
    * SQL and DuckDB: the exact same text runs on both engines (q52). DECIMAL
    * math stays internal; output columns render as text (STRING is a cast
    * alias in both dialects) and ORDER BY keeps the typed values. */
  private val VerbatimSql: String =
    """SELECT l_orderkey,
      |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS STRING) AS revenue,
      |       CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) DESC,
      |         CAST(o_orderdate AS DATE), l_orderkey
      |LIMIT 50""".stripMargin

  private def hashSql(alias: String): String =
    "md5(concat_ws('|', " + nonKeyCols
      .map(c => s"coalesce(CAST($c AS VARCHAR),'<NULL>')")
      .mkString(", ") + s")) AS $alias"

  val defs: Seq[QueryDef] = Seq(

    // S1/P1: scan + filter + projection. Both filters and the 4-column
    // projection reach the parquet reader (PushedFilters/ReadSchema).
    QueryDef(
      "q01_scan_filter_project",
      (s, dir) =>
        canonOut(
          t(s, dir, "lineitem")
            .filter(to_date(col("l_shipdate")) <= lit("1998-09-02") && col("l_returnflag") === "R")
            .select(
              col("l_orderkey"),
              col("l_linenumber"),
              col("l_quantity").cast("decimal(18,2)").as("qty"),
              col("l_returnflag"))
            .orderBy("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) AS qty, l_returnflag
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02' AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // S2-S4: CTAS snapshot copy into a run-scoped namespace and read-back
    // (adapters/postgres.py:29-44) — identity-preserving, so the oracle is
    // the source itself.
    QueryDef(
      "q02_snapshot_roundtrip",
      (s, dir) => {
        val store = new graft.engine.SnapshotStore(
          s, sys.props("java.io.tmpdir") + "/graft_snapshots", "verify_run")
        canonOut(store.snapshot(ordersCanon(s, dir), "orders__base").orderBy("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_orderstatus,
              |       CAST(o_totalprice AS VARCHAR) AS o_totalprice,
              |       CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority
              |FROM ($ordersCanonSql) o ORDER BY o_orderkey""".stripMargin)
    ),

    // A1: row count.
    QueryDef(
      "q03_rowcount",
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem")
    ),

    // A3: single-pass multi-column profile — 2·N aggregates, ONE scan
    // (adapters/postgres.py:71-92). Exact count(distinct) here (test scale);
    // approx HLL++ variant is q05.
    QueryDef(
      "q04_profile_exact",
      (s, dir) =>
        DiffEngine.profileDf(
          t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
        "SELECT " + cols.flatMap { c =>
          Seq(
            s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nulls",
            s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS ${c}__distinct")
        }.mkString(", ") + " FROM orders"
      }
    ),

    // A3 at 100 TB: sketch-based approx profile — single pass, bounded
    // memory per column, no Expand. Gated on the REPLAYABLE estimator
    // (KMV over a pinned md5 fold, DiffEngine.profileKmvDf): the sketch
    // is a pure function of the input SET through a plain SQL hash, so
    // DuckDB replays the estimate VALUE-exactly (ORDER BY hash LIMIT k
    // over the distinct folds) — retiring this query's r1-r11 no_oracle.
    // The HLL++ mode (approx_count_distinct — better constants at equal
    // memory, but opaque register state no other engine reproduces)
    // remains the profile default and is certified within 3σ by q324;
    // the mergeable-sketch path is profileSketchDf.
    QueryDef(
      "q05_profile_approx",
      (s, dir) =>
        DiffEngine.profileKmvDf(
          t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
          k = 256),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        val k = 256
        val big = (k - 1).toLong * (1L << 48)
        val sketches = cols.map { c =>
          s"""k_$c AS (SELECT h FROM (SELECT DISTINCT
             |    ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 12))::BIGINT AS h
             |    FROM orders WHERE $c IS NOT NULL) ORDER BY h LIMIT $k)""".stripMargin
        }.mkString("WITH ", ",\n", "")
        val selects = cols.flatMap { c =>
          Seq(
            s"""(SELECT CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               |   FROM orders) AS ${c}__nulls""".stripMargin,
            s"""(SELECT CAST(CASE WHEN count(*) < $k THEN count(*)
               |   ELSE $big // greatest(max(h), 1) END AS BIGINT)
               |   FROM k_$c) AS ${c}__distinct""".stripMargin)
        }.mkString(",\n")
        s"$sketches\nSELECT\n$selects"
      }
    ),

    // A3 exact mode at scale: melt + two-phase distinct (no Expand) — same
    // values as q04, different (shuffle-lean) plan; same oracle.
    QueryDef(
      "q23_profile_melt",
      (s, dir) =>
        DiffEngine.profileMeltDf(
          t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
        "SELECT " + cols.flatMap { c =>
          Seq(
            s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nulls",
            s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS ${c}__distinct")
        }.mkString(", ") + " FROM orders"
      }
    ),

    // Numeric column summary (profile extension beyond the reference's
    // null/distinct): min/max exact; median/p95 via exact interpolated
    // percentile (Spark `percentile` ≡ DuckDB `quantile_cont` — same linear
    // interpolation over identical sorted values), pinned to DECIMAL.
    // Scale note: exact `percentile` buffers every value (the sweep's 4.6×
    // scaler) and exists for oracle parity; the 100 TB path is
    // `approx_percentile` (GK sketch, mergeable, constant memory) — swap is
    // one function name, the query shape is identical.
    QueryDef(
      "q27_numeric_summary",
      (s, dir) =>
        canonOut(
          t(s, dir, "orders").agg(
            min(col("o_totalprice")).cast("decimal(18,2)").as("min_price"),
            max(col("o_totalprice")).cast("decimal(18,2)").as("max_price"),
            expr("percentile(o_totalprice, 0.5)").cast("decimal(18,4)").as("median_price"),
            expr("percentile(o_totalprice, 0.95)").cast("decimal(18,4)").as("p95_price"),
            count(lit(1)).as("n"))),
      Some("""SELECT CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS min_price,
             |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS max_price,
             |       CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,4)) AS VARCHAR) AS median_price,
             |       CAST(CAST(quantile_cont(o_totalprice, 0.95) AS DECIMAL(18,4)) AS VARCHAR) AS p95_price,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM orders""".stripMargin)
    ),

    // Skew-mitigation equivalence: two-phase salted aggregation returns the
    // same result as the direct group-by (oracle is the direct form).
    QueryDef(
      "q28_salted_agg",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q"))
        canonOut(
          graft.engine.SkewTools.saltedSumCount(li, Seq("l_returnflag"), "q", buckets = 16)
            .select(col("l_returnflag"),
              col("sum_q").cast("decimal(18,2)").as("sum_q"), col("cnt"))
            .orderBy("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_q,
             |       CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // F1-F4: the md5 row-hash scheme, byte-for-byte cross-engine.
    QueryDef(
      "q06_rowhash",
      (s, dir) =>
        ordersCanon(s, dir)
          .select(col("o_orderkey"), DiffEngine.rowHash(nonKeyCols).as("row_hash"))
          .orderBy("o_orderkey"),
      Some(s"""SELECT o_orderkey, ${hashSql("row_hash")}
              |FROM ($ordersCanonSql) o ORDER BY o_orderkey""".stripMargin)
    ),

    // J1: added rows — left_anti join on keys (reference: LEFT JOIN … IS NULL,
    // diff_flow.py:189-197). Emits the full added key list, ordered.
    QueryDef(
      "q07_diff_added",
      (s, dir) =>
        DiffEngine
          .added(ordersCanon(s, dir), ordersHead(s, dir), Seq("o_orderkey"))
          .select(col("o_orderkey"))
          .orderBy("o_orderkey"),
      Some(s"""SELECT h.o_orderkey FROM ($ordersHeadSql) h
              |WHERE NOT EXISTS (SELECT 1 FROM ($ordersCanonSql) b WHERE b.o_orderkey = h.o_orderkey)
              |ORDER BY h.o_orderkey""".stripMargin)
    ),

    // J2: removed rows — symmetric anti join (diff_flow.py:198-205).
    QueryDef(
      "q08_diff_removed",
      (s, dir) =>
        DiffEngine
          .removed(ordersCanon(s, dir), ordersHead(s, dir), Seq("o_orderkey"))
          .select(col("o_orderkey"))
          .orderBy("o_orderkey"),
      Some(s"""SELECT b.o_orderkey FROM ($ordersCanonSql) b
              |WHERE NOT EXISTS (SELECT 1 FROM ($ordersHeadSql) h WHERE h.o_orderkey = b.o_orderkey)
              |ORDER BY b.o_orderkey""".stripMargin)
    ),

    // J3: changed rows — keys+hash projected BEFORE the join, hash inequality
    // after (diff_flow.py:207-225). Shuffle carries only key + 32-byte hash.
    QueryDef(
      "q09_diff_changed",
      (s, dir) =>
        DiffEngine
          .changed(ordersCanon(s, dir), ordersHead(s, dir), Seq("o_orderkey"), nonKeyCols)
          .select(col("o_orderkey"))
          .orderBy("o_orderkey"),
      Some(s"""SELECT h.o_orderkey
              |FROM (SELECT o_orderkey, ${hashSql("h_hash")} FROM ($ordersHeadSql) hh) h
              |JOIN (SELECT o_orderkey, ${hashSql("b_hash")} FROM ($ordersCanonSql) bb) b
              |  ON h.o_orderkey = b.o_orderkey
              |WHERE h.h_hash <> b.b_hash
              |ORDER BY h.o_orderkey""".stripMargin)
    ),

    // J4/O1: changed-key sample — deterministic (ordered) variant of the
    // reference's unordered LIMIT (diff_flow.py:227-249, SURVEY §7.3 #6).
    QueryDef(
      "q10_diff_sample",
      (s, dir) =>
        DiffEngine
          .changed(ordersCanon(s, dir), ordersHead(s, dir), Seq("o_orderkey"), nonKeyCols)
          .select(col("o_orderkey"))
          .orderBy("o_orderkey")
          .limit(20),
      Some(s"""SELECT h.o_orderkey
              |FROM (SELECT o_orderkey, ${hashSql("h_hash")} FROM ($ordersHeadSql) hh) h
              |JOIN (SELECT o_orderkey, ${hashSql("b_hash")} FROM ($ordersCanonSql) bb) b
              |  ON h.o_orderkey = b.o_orderkey
              |WHERE h.h_hash <> b.b_hash
              |ORDER BY h.o_orderkey LIMIT 20""".stripMargin)
    ),

    // Flagship: the whole diff as one summary frame (rowcounts + added/
    // removed/changed) — the reference's result document's numeric spine.
    QueryDef(
      "q11_diff_summary",
      (s, dir) => {
        val base = ordersCanon(s, dir)
        val head = ordersHead(s, dir)
        // added/removed/changed AND both side row counts from ONE full-outer
        // pass (vs the reference's three join queries + two COUNTs —
        // diff_flow.py:133-135, 189-249). Side counts = non-null per-side
        // hashes, exact under the keyed diff's unique-key contract.
        val stats = DiffEngine.rowDiffFrame(base, head, Seq("o_orderkey"), nonKeyCols)
          .agg(
            sum(when(col("__base_hash").isNull, 1L).otherwise(0L)).as("added"),
            sum(when(col("__head_hash").isNull, 1L).otherwise(0L)).as("removed"),
            sum(when(col("__base_hash").isNotNull && col("__head_hash").isNotNull &&
              col("__base_hash") =!= col("__head_hash"), 1L).otherwise(0L)).as("changed"),
            sum(when(col("__base_hash").isNotNull, 1L).otherwise(0L)).as("base_rows"),
            sum(when(col("__head_hash").isNotNull, 1L).otherwise(0L)).as("head_rows"))
          .head()
        def stat(i: Int): Long = if (stats.isNullAt(i)) 0L else stats.getLong(i)
        val rows = Seq(
          ("added", stat(0)),
          ("base_rows", stat(3)),
          ("changed", stat(2)),
          ("head_rows", stat(4)),
          ("removed", stat(1))
        )
        import s.implicits._
        rows.toDF("metric", "value").orderBy("metric")
      },
      Some(s"""WITH b AS ($ordersCanonSql), h AS ($ordersHeadSql),
              |bh AS (SELECT o_orderkey, ${hashSql("v")} FROM b),
              |hh AS (SELECT o_orderkey, ${hashSql("v")} FROM h)
              |SELECT 'added' AS metric, CAST((SELECT count(*) FROM h WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.o_orderkey=h.o_orderkey)) AS BIGINT) AS value
              |UNION ALL SELECT 'base_rows', CAST((SELECT count(*) FROM b) AS BIGINT)
              |UNION ALL SELECT 'changed', CAST((SELECT count(*) FROM bh JOIN hh ON bh.o_orderkey=hh.o_orderkey WHERE bh.v <> hh.v) AS BIGINT)
              |UNION ALL SELECT 'head_rows', CAST((SELECT count(*) FROM h) AS BIGINT)
              |UNION ALL SELECT 'removed', CAST((SELECT count(*) FROM b WHERE NOT EXISTS (SELECT 1 FROM h WHERE h.o_orderkey=b.o_orderkey)) AS BIGINT)
              |ORDER BY metric""".stripMargin)
    ),

    // Composite-key row diff: the same full-outer single-pass over a
    // two-column key (l_orderkey, l_linenumber) — multi-key joins shuffle on
    // both columns; perturbation recipe mirrors the single-key family.
    QueryDef(
      "q44_diff_multikey",
      (s, dir) => {
        val canon = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("decimal(18,2)").as("l_quantity"),
          col("l_returnflag"))
        val head = canon
          .filter((col("l_orderkey") + col("l_linenumber")) % 211 =!= 0)
          .withColumn("l_quantity",
            when((col("l_orderkey") + col("l_linenumber")) % 89 === 0,
              col("l_quantity") + lit(java.math.BigDecimal.ONE)).otherwise(col("l_quantity")))
        val joined = DiffEngine.rowDiffFrame(canon, head,
          Seq("l_orderkey", "l_linenumber"), Seq("l_quantity", "l_returnflag"))
        val stats = joined.agg(
          sum(when(col("__base_hash").isNull, 1L).otherwise(0L)),
          sum(when(col("__head_hash").isNull, 1L).otherwise(0L)),
          sum(when(col("__base_hash").isNotNull && col("__head_hash").isNotNull &&
            col("__base_hash") =!= col("__head_hash"), 1L).otherwise(0L))).head()
        import s.implicits._
        Seq(("added", stats.getLong(0)), ("changed", stats.getLong(2)),
          ("removed", stats.getLong(1)))
          .toDF("metric", "value").orderBy("metric")
      },
      Some("""WITH canon AS (SELECT l_orderkey, l_linenumber,
             |    CAST(l_quantity AS DECIMAL(18,2)) AS l_quantity, l_returnflag FROM lineitem),
             |head AS (SELECT l_orderkey, l_linenumber,
             |    CASE WHEN (l_orderkey + l_linenumber) % 89 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
             |    l_returnflag
             |  FROM canon WHERE (l_orderkey + l_linenumber) % 211 <> 0),
             |bh AS (SELECT l_orderkey, l_linenumber, md5(concat_ws('|',
             |    coalesce(CAST(l_quantity AS VARCHAR),'<NULL>'), coalesce(l_returnflag,'<NULL>'))) AS v FROM canon),
             |hh AS (SELECT l_orderkey, l_linenumber, md5(concat_ws('|',
             |    coalesce(CAST(l_quantity AS VARCHAR),'<NULL>'), coalesce(l_returnflag,'<NULL>'))) AS v FROM head)
             |SELECT 'added' AS metric, CAST((SELECT count(*) FROM hh WHERE NOT EXISTS
             |  (SELECT 1 FROM bh WHERE bh.l_orderkey = hh.l_orderkey AND bh.l_linenumber = hh.l_linenumber)) AS BIGINT) AS value
             |UNION ALL SELECT 'changed', CAST((SELECT count(*) FROM bh JOIN hh
             |  ON bh.l_orderkey = hh.l_orderkey AND bh.l_linenumber = hh.l_linenumber WHERE bh.v <> hh.v) AS BIGINT)
             |UNION ALL SELECT 'removed', CAST((SELECT count(*) FROM bh WHERE NOT EXISTS
             |  (SELECT 1 FROM hh WHERE hh.l_orderkey = bh.l_orderkey AND hh.l_linenumber = bh.l_linenumber)) AS BIGINT)
             |ORDER BY metric""".stripMargin)
    ),

    // Per-column change attribution over the synthetic head: only
    // o_orderpriority is mutated by the recipe, so its count equals the
    // changed-row count and every other column is 0.
    QueryDef(
      "q70_diff_by_column",
      (s, dir) =>
        DiffEngine.changedByColumn(ordersCanon(s, dir), ordersHead(s, dir),
          Seq("o_orderkey"), nonKeyCols)
          .orderBy("column"),
      Some(s"""WITH b AS ($ordersCanonSql), h AS ($ordersHeadSql),
              |m AS (SELECT ${nonKeyCols.map(c => s"b.$c AS b_$c, h.$c AS h_$c").mkString(", ")}
              |      FROM h JOIN b ON h.o_orderkey = b.o_orderkey)
              |${nonKeyCols.map(c =>
                 s"""SELECT '$c' AS "column", CAST(SUM(CASE WHEN b_$c IS DISTINCT FROM h_$c THEN 1 ELSE 0 END) AS BIGINT) AS n_changed FROM m""")
                 .mkString("\nUNION ALL ")}
              |ORDER BY "column"""".stripMargin)
    ),

    // Incremental-diff scoping: partitions (order dates) whose content
    // fingerprint (count + order-independent 60-bit hash XOR) moved between
    // the sides — the scope list that lets a 100 TB diff skip unchanged
    // history entirely.
    QueryDef(
      "q72_changed_partitions",
      (s, dir) =>
        canonOut(DiffEngine.changedPartitions(
          ordersCanon(s, dir), ordersHead(s, dir), "o_orderdate",
          Seq("o_orderkey") ++ nonKeyCols.filterNot(_ == "o_orderdate"))
          .orderBy("part")),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        val rh = "md5(concat_ws('|', " + cols
          .map(c => s"coalesce(CAST($c AS VARCHAR),'<NULL>')").mkString(", ") + "))"
        val fp = s"CAST(count(*) AS BIGINT) AS n, bit_xor(('0x' || substr($rh, 1, 15))::BIGINT) AS x"
        s"""WITH b AS (SELECT o_orderdate AS part, $fp FROM ($ordersCanonSql) bb GROUP BY 1),
           |h AS (SELECT o_orderdate AS part, $fp FROM ($ordersHeadSql) hh GROUP BY 1)
           |SELECT CAST(coalesce(b.part, h.part) AS VARCHAR) AS part
           |FROM b FULL OUTER JOIN h ON b.part = h.part
           |WHERE b.n IS DISTINCT FROM h.n OR b.x IS DISTINCT FROM h.x
           |ORDER BY part""".stripMargin
      }
    ),

    // Categorical drift: per-value counts across the diff sides plus each
    // value's exact total-variation contribution |n_i*Nh - m_i*Nb| —
    // integer math, no float divergence metric to mismatch.
    QueryDef(
      "q71_categorical_drift",
      (s, dir) =>
        DiffEngine.categoricalDrift(
          ordersCanon(s, dir), ordersHead(s, dir), "o_orderpriority")
          .orderBy("value"),
      Some(s"""WITH b AS (SELECT o_orderpriority AS value, CAST(count(*) AS BIGINT) AS base_n
              |           FROM ($ordersCanonSql) bb GROUP BY 1),
              |h AS (SELECT o_orderpriority AS value, CAST(count(*) AS BIGINT) AS head_n
              |      FROM ($ordersHeadSql) hh GROUP BY 1),
              |j AS (SELECT coalesce(b.value, h.value) AS value,
              |             coalesce(base_n, 0) AS base_n, coalesce(head_n, 0) AS head_n
              |      FROM b FULL OUTER JOIN h ON b.value IS NOT DISTINCT FROM h.value),
              |t AS (SELECT CAST(sum(base_n) AS BIGINT) AS nb, CAST(sum(head_n) AS BIGINT) AS nh FROM j)
              |SELECT value, base_n, head_n,
              |       CAST(abs(base_n * nh - head_n * nb) AS BIGINT) AS tv_contrib
              |FROM j CROSS JOIN t ORDER BY value""".stripMargin)
    ),

    // Numeric drift: the continuous sibling of q71 — o_totalprice in cents
    // buckets into 20 equal-width bins over the combined range, each bin's
    // TV contribution in the exact integer cross-multiplied form. Bucketing
    // is multiply-then-integer-divide: no float rounding to diverge.
    QueryDef(
      "q77_numeric_drift",
      (s, dir) => {
        // numericDrift makes three passes over each side (range, counts,
        // totals); materialize the single needed column once so the side
        // pipelines don't re-execute per pass — the 100 TB form reads a
        // snapshot table, which is materialized by construction
        def cents(df: DataFrame) =
          df.select((col("o_totalprice") * 100).cast("long").as("cents")).localCheckpoint()
        DiffEngine.numericDrift(cents(ordersCanon(s, dir)), cents(ordersHead(s, dir)),
          "cents", nBuckets = 20)
          .orderBy("bin")
      },
      Some(s"""WITH b AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS v FROM ($ordersCanonSql) bb),
              |h AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS v FROM ($ordersHeadSql) hh),
              |r AS (SELECT least((SELECT min(v) FROM b), (SELECT min(v) FROM h)) AS lo,
              |             greatest((SELECT max(v) FROM b), (SELECT max(v) FROM h)) AS hi),
              |bc AS (SELECT (v - lo) * 20 // (hi - lo + 1) AS bin, CAST(count(*) AS BIGINT) AS base_n
              |       FROM b, r GROUP BY 1),
              |hc AS (SELECT (v - lo) * 20 // (hi - lo + 1) AS bin, CAST(count(*) AS BIGINT) AS head_n
              |       FROM h, r GROUP BY 1),
              |j AS (SELECT coalesce(bc.bin, hc.bin) AS bin,
              |             coalesce(base_n, 0) AS base_n, coalesce(head_n, 0) AS head_n
              |      FROM bc FULL OUTER JOIN hc ON bc.bin = hc.bin),
              |t AS (SELECT CAST(sum(base_n) AS BIGINT) AS nb, CAST(sum(head_n) AS BIGINT) AS nh FROM j)
              |SELECT CAST(bin AS BIGINT) AS bin, base_n, head_n,
              |       CAST(abs(base_n * nh - head_n * nb) AS BIGINT) AS tv_contrib
              |FROM j CROSS JOIN t ORDER BY bin""".stripMargin)
    ),

    // P3: order-preserving name-only schema diff (metadata operator,
    // diff_flow.py:139-150). Deterministic → literal VALUES oracle.
    QueryDef(
      "q12_schema_diff",
      (s, dir) => {
        val base = t(s, dir, "orders").drop("o_orderpriority")
        val head = t(s, dir, "orders").drop("o_custkey").withColumn("o_comment", lit("x"))
        val sd = DiffEngine.schemaDiff(base, head)
        import s.implicits._
        (sd.common.map(_ -> "common") ++ sd.onlyInHead.map(_ -> "only_in_head") ++
          sd.onlyInBase.map(_ -> "only_in_base")).zipWithIndex
          .map { case ((c, st), i) => (i.toLong, c, st) }
          .toDF("pos", "col_name", "status")
      },
      Some("""SELECT CAST(pos AS BIGINT) AS pos, col_name, status FROM (VALUES
             |  (0,'o_orderkey','common'), (1,'o_orderstatus','common'),
             |  (2,'o_totalprice','common'), (3,'o_orderdate','common'),
             |  (4,'o_orderpriority','only_in_head'), (5,'o_comment','only_in_head'),
             |  (6,'o_custkey','only_in_base')
             |) t(pos, col_name, status) ORDER BY pos""".stripMargin)
    ),

    // P1: --where predicate pushed identically into both sides
    // (cli.py:54-55, diff_flow.py:129-131) before counting.
    QueryDef(
      "q13_where_predicate",
      (s, dir) => {
        val pred = "o_totalprice > 100000 AND o_orderstatus = 'O'"
        val base = ordersCanon(s, dir).filter(expr(pred))
        val head = ordersHead(s, dir).filter(expr(pred))
        import s.implicits._
        Seq(("base", base.count()), ("head", head.count()))
          .toDF("side", "n").orderBy("side")
      },
      Some(s"""SELECT 'base' AS side, CAST(count(*) AS BIGINT) AS n FROM ($ordersCanonSql) b WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
              |UNION ALL
              |SELECT 'head', CAST(count(*) AS BIGINT) FROM ($ordersHeadSql) h WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
              |ORDER BY side""".stripMargin)
    ),

    // J5: workload left join (int_orders.sql:1-9 shape) — small dim side is
    // auto-broadcast by Catalyst (customer ≪ autoBroadcastJoinThreshold).
    QueryDef(
      "q14_left_join",
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left")
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // A6/J6: group-by aggregate then inner join (int_order_agg.sql shape).
    // DECIMAL inputs keep partial-agg order out of the result bits.
    QueryDef(
      "q15_agg_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val agg = li
          .groupBy(col("l_orderkey"))
          .agg(
            count(lit(1)).as("item_count"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("revenue"))
        canonOut(
          agg
            .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
            .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
              col("item_count"), col("revenue"))
            .orderBy("o_orderkey"))
      },
      Some("""SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
             |       CAST(count(*) AS BIGINT) AS item_count,
             |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // TPC-H Q1 shape: the canonical wide aggregate (A6) — map-side partial
    // agg then single shuffle on the 2-key group.
    QueryDef(
      "q16_groupby_wide_agg",
      (s, dir) =>
        canonOut(
          t(s, dir, "lineitem")
            .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(
              count(lit(1)).as("count_order"),
              sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
              sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_base_price"),
              sum((col("l_extendedprice").cast("decimal(18,6)") *
                (lit(java.math.BigDecimal.ONE).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
                .cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_disc_price"))
            .orderBy("l_returnflag", "l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(count(*) AS BIGINT) AS count_order,
             |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty,
             |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_base_price,
             |       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS sum_disc_price
             |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // F9-F15: the workload scalar functions from the demo models
    // (stg_customers.sql:5-9 etc): initcap/trim/lower/upper, decimal cast,
    // multiply, CASE IN. DuckDB has no initcap — the oracle replicates it
    // word-wise (Spark semantics: first letter upper, rest lower, words on
    // whitespace).
    QueryDef(
      "q22_workload_scalars",
      (s, dir) =>
        canonOut(
          t(s, dir, "customer").select(
            col("c_custkey"),
            initcap(lower(trim(col("c_name")))).as("name_initcap"),
            upper(col("c_mktsegment")).as("seg_upper"),
            lower(col("c_mktsegment")).as("seg_lower"),
            (col("c_acctbal").cast("decimal(12,2)") * lit(2).cast("decimal(4,0)"))
              .cast("decimal(14,2)").as("bal_x2"),
            when(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), lit("core"))
              .otherwise(lit("other")).as("seg_class"))
            .orderBy("c_custkey")),
      Some("""SELECT c_custkey,
             |  array_to_string(list_transform(string_split(lower(trim(c_name)), ' '),
             |    w -> upper(w[1:1]) || lower(w[2:])), ' ') AS name_initcap,
             |  upper(c_mktsegment) AS seg_upper,
             |  lower(c_mktsegment) AS seg_lower,
             |  CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 2 AS DECIMAL(14,2)) AS VARCHAR) AS bal_x2,
             |  CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'core' ELSE 'other' END AS seg_class
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),

    // O1: top-k — global sort + limit (AQE turns this into TakeOrdered).
    QueryDef(
      "q17_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    ),

    // §2.7: row-level set op (EXCEPT ⇒ distinct difference) — customers with
    // no orders.
    QueryDef(
      "q18_set_except",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey"))
          .except(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY c_custkey""".stripMargin)
    ),

    // §2.7: INTERSECT — customers appearing in both order-status populations.
    QueryDef(
      "q51_set_intersect",
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .intersect(t(s, dir, "orders").filter(col("o_orderstatus") === "O").select(col("o_custkey")))
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_custkey""".stripMargin)
    ),

    // SQL-entry parity: ONE SQL text executed verbatim by BOTH engines —
    // spark.sql over registered views and DuckDB over the same parquet. The
    // strongest statement that the engine's SQL surface matches.
    QueryDef(
      "q52_sql_verbatim",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(VerbatimSql)
      },
      Some(VerbatimSql)
    ),

    // Beyond-reference: ROLLUP grouping sets (SURVEY §2.4 notes their absence
    // — covered here as engine capability).
    QueryDef(
      "q19_rollup",
      (s, dir) =>
        canonOut(
          t(s, dir, "lineitem")
            .rollup(col("l_returnflag"), col("l_linestatus"))
            .agg(count(lit(1)).as("n"),
              sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"))
            .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
             |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    ),

    // Beyond-reference: sliding windows (1h length, 15m slide) in the
    // engine-portable arithmetic form — each event lands in 4 windows via
    // explode; integer epoch-second window starts keep both engines exact.
    // (StreamingSpec asserts Spark's native window() gives identical frames.)
    QueryDef(
      "q53_sliding_window",
      (s, dir) =>
        canonOut(
          events(s, dir)
            .select(col("event_type"), unix_timestamp(col("ts")).as("sec"),
              col("value").cast("decimal(18,4)").as("v"))
            .withColumn("k", explode(sequence(lit(0), lit(3))))
            .withColumn("window_start", expr("sec div 900 * 900 - k * 900"))
            .filter(col("sec") - col("window_start") < 3600)
            .groupBy(col("window_start"), col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("v")).cast("decimal(18,4)").as("sum_value"))
            .orderBy("window_start", "event_type")),
      Some("""WITH x AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |              CAST(value AS DECIMAL(18,4)) AS v FROM events),
             |w AS (SELECT x.*, (sec // 900) * 900 - t.k * 900 AS window_start
             |      FROM x CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) t)
             |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(CAST(SUM(v) AS DECIMAL(18,4)) AS VARCHAR) AS sum_value
             |FROM w WHERE sec - window_start < 3600
             |GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin)
    ),

    // Beyond-reference: semi-structured (JSON) column extraction — the
    // events.props payload. get_json_object ≡ DuckDB ->> for scalar paths.
    QueryDef(
      "q48_json_extract",
      (s, dir) =>
        events(s, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .groupBy((col("k_val") / 10).cast("long").as("k_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("k_bucket"),
      Some("""SELECT CAST(CAST(props->>'k' AS BIGINT) // 10 AS BIGINT) AS k_bucket,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin)
    ),

    // Beyond-reference: pivot (long → wide) as engine-portable conditional
    // aggregation; Spark's groupBy().pivot() with an explicit value list
    // produces the identical frame.
    QueryDef(
      "q49_pivot",
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        t(s, dir, "documents")
          .groupBy(col("source"))
          .pivot("lang", langs)
          .agg(count(lit(1)))
          .na.fill(0L, langs)
          .orderBy("source")
      },
      Some("""SELECT source,
             |  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
             |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
             |  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
             |  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
             |  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // Beyond-reference: unpivot (wide → long) via Spark's unpivot/melt;
    // oracle is the portable UNION ALL form.
    QueryDef(
      "q50_unpivot",
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .unpivot(Array(col("c_custkey")), Array(col("c_name"), col("c_mktsegment")),
            "attr", "value")
          .orderBy("c_custkey", "attr"),
      Some("""SELECT c_custkey, 'c_name' AS attr, c_name AS value FROM customer
             |UNION ALL SELECT c_custkey, 'c_mktsegment', c_mktsegment FROM customer
             |ORDER BY c_custkey, attr""".stripMargin)
    ),

    // Beyond-reference: window (analytic) functions — top-3 events per user.
    QueryDef(
      "q20_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("user_id"), col("event_id"), col("event_type"), col("rn"))
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id, event_type, CAST(rn AS INT) AS rn FROM (
             |  SELECT user_id, event_id, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events) t
             |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin)
    ),

    // Beyond-reference: tumbling-window aggregation (batch form of the
    // Structured Streaming windowed agg in graft.streaming).
    QueryDef(
      "q21_window_agg",
      (s, dir) =>
        canonOut(
          events(s, dir)
            .groupBy(
              date_trunc("hour", col("ts")).cast("string").as("window_start"),
              col("event_type"))
            .agg(
              count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_value"))
            .orderBy("window_start", "event_type")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)
    )
  )
}
