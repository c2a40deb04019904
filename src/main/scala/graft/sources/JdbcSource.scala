package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.modelrun.Profiles.ConnInfo

/** Live-warehouse (JDBC) sources — the reference's deployment mode.
  *
  * The reference executes every comparison *inside* the customer's warehouse
  * over the Postgres wire protocol (adapters/postgres.py:18-24 psycopg2
  * connect; adapters/redshift.py connects the same way — Redshift speaks the
  * postgres protocol). This engine inverts that: the warehouse is a SOURCE,
  * Spark is the execution engine. A profiles.yml target of `type: postgres`
  * or `type: redshift` maps to a `spark.read.jdbc` scan; the relation is then
  * snapshotted to Parquet (the CTAS-copy isolation step,
  * adapters/postgres.py:37-44) and every comparison runs on the immutable
  * columnar snapshot.
  *
  * Scale design (100 TB warehouse table → 1000-executor cluster):
  *   - `--where` is applied ON THE JDBC FRAME so Catalyst pushes it into the
  *     remote scan (`PushedFilters` in the plan) — the warehouse filters
  *     before a single row crosses the wire, exactly like the reference's
  *     `where` interpolation into its comparison SQL (core/diff_flow.py).
  *   - A partition column splits the read into `numPartitions` parallel
  *     range-bounded queries (`spark.read.jdbc`'s predicated form), so the
  *     transfer is cluster-wide, not a single-connection trickle. Bounds are
  *     fetched with one MIN/MAX query pushed to the warehouse.
  *   - `fetchsize` keeps the per-connection stream batched (default 10k rows)
  *     instead of the pg driver's row-at-a-time default.
  */
object JdbcSource {

  /** Warehouse types this source accepts (reference adapter surface). */
  val JdbcTypes: Set[String] = Set("postgres", "redshift", "jdbc")

  def isJdbc(conn: ConnInfo): Boolean = JdbcTypes(conn.warehouseType)

  /** JDBC URL for a connection descriptor. postgres and redshift both map to
    * the postgresql driver URL — the reference connects to BOTH with psycopg2
    * (adapters/redshift.py imports psycopg2), i.e. the postgres wire
    * protocol; a dedicated redshift driver can be supplied via `type: jdbc` +
    * explicit `url:`. The generic `jdbc` type requires an explicit url and
    * exists so any JDBC-compliant warehouse (and the offline test harness's
    * embedded Derby) can be a source. */
  def url(conn: ConnInfo): String = conn.warehouseType match {
    case "jdbc" =>
      conn.jdbcUrl.getOrElse(throw new IllegalArgumentException(
        "profiles.yml target of type 'jdbc' requires an explicit `url:` scalar"))
    case "postgres" | "redshift" =>
      conn.jdbcUrl.getOrElse(s"jdbc:postgresql://${conn.host}:${conn.port}/${conn.dbname}")
    case t =>
      throw new IllegalArgumentException(s"not a JDBC warehouse type: '$t'")
  }

  private def baseReader(spark: SparkSession, conn: ConnInfo) = {
    val r = spark.read.format("jdbc")
      .option("url", url(conn))
      .option("fetchsize", "10000")
    val r1 = if (conn.user.nonEmpty) r.option("user", conn.user) else r
    val r2 = if (conn.password.nonEmpty) r1.option("password", conn.password) else r1
    conn.driver.fold(r2)(d => r2.option("driver", d))
  }

  /** Read one warehouse relation. `table` is `schema.table` or bare `table`
    * (resolved in the target schema, like the reference's search-path-free
    * qualified names, adapters/postgres.py:37-44). `where` lands in the scan
    * as pushed filters; `partitionColumn` turns the read into
    * `numPartitions` parallel bounded queries. */
  def read(
      spark: SparkSession,
      conn: ConnInfo,
      table: String,
      where: Option[String] = None,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      redshiftCompat: Boolean = false): DataFrame = {
    val qualified = if (table.contains(".")) table else s"${conn.schema}.$table"
    val reader = partitionColumn match {
      case Some(pc) =>
        // one MIN/MAX probe pushed to the warehouse sizes the range split
        val bounds = baseReader(spark, conn)
          .option("dbtable", s"(select min($pc) as lo, max($pc) as hi from $qualified) b")
          .load().head()
        if (bounds.isNullAt(0)) // empty relation: plain single-part read
          baseReader(spark, conn).option("dbtable", qualified)
        else
          baseReader(spark, conn)
            .option("dbtable", qualified)
            .option("partitionColumn", pc)
            .option("lowerBound", bounds.get(0).toString)
            .option("upperBound", bounds.get(1).toString)
            .option("numPartitions", numPartitions.toString)
      case None => baseReader(spark, conn).option("dbtable", qualified)
    }
    val raw = reader.load()
    // unquoted-identifier case folding is warehouse-dependent (postgres folds
    // down, Derby/Oracle fold UP); fold to lowercase so `--keys customer_id`
    // matches the postgres-cased names the reference's users type
    val lowered = raw.columns.map(_.toLowerCase)
    require(lowered.distinct.length == lowered.length,
      s"case-folded column collision reading $qualified: ${lowered.mkString(", ")}")
    val df0 = raw.toDF(lowered.toIndexedSeq: _*)
    // --redshift-compat: the reference's Redshift adapter introspects via
    // svv_columns and EXCLUDES boolean columns from every comparison
    // (adapters/redshift.py:64-74, the `data_type !='boolean'` predicate at
    // :69) — so a user A/B-ing this engine against the reference on
    // Redshift sees boolean columns ignored there. SURVEY §1.2 deliberately
    // does NOT replicate that quirk by default (booleans diff fine here);
    // this opt-in reproduces the reference's column list bit-for-bit.
    // Column pruning reaches the JDBC scan, so excluded booleans are never
    // transferred.
    // filter on the JDBC frame (not post-snapshot) so it compiles into the
    // remote query — assert `PushedFilters` in the plan, not hope. The
    // filter runs BEFORE the compat drop: the reference interpolates
    // `where` into warehouse SQL where boolean columns still exist, so a
    // predicate on an excluded boolean must keep working here too.
    val filtered = where.fold(df0)(df0.filter)
    if (!redshiftCompat) filtered
    else filtered.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.BooleanType => f.name
    } match {
      case Array() => filtered
      case bools   => filtered.drop(bools.toIndexedSeq: _*)
    }
  }

  /** True when the physical plan's JDBC scan carries at least one pushed
    * filter — the "did the warehouse do the filtering" assertion. */
  def hasPushedFilter(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    val m = "PushedFilters: \\[(.*?)\\]".r.findFirstMatchIn(plan)
    m.exists(_.group(1).trim.nonEmpty)
  }

  /** Publish a RESULT frame back to the warehouse (append) — the return
    * leg of the reference's in-warehouse workflow: dbt users keep run
    * history in warehouse tables their BI stack already reads, so the diff
    * summary lands next to the models it describes. Append-only with
    * `createTableOptions` left to driver defaults; intended for
    * SUMMARY-sized frames (one row per run) — the `coalesce(1)` makes that
    * contract explicit (one connection, one transaction), it is NOT a bulk
    * export path. */
  def publish(spark: SparkSession, conn: ConnInfo, table: String, df: DataFrame): Unit = {
    val qualified = if (table.contains(".")) table else s"${conn.schema}.$table"
    var w = df.coalesce(1).write.format("jdbc")
      .option("url", url(conn))
      .option("dbtable", qualified)
    if (conn.user.nonEmpty) w = w.option("user", conn.user)
    if (conn.password.nonEmpty) w = w.option("password", conn.password)
    conn.driver.foreach(d => w = w.option("driver", d))
    w.mode("append").save()
  }
}
