package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.cli.Main
import graft.modelrun.Profiles
import graft.sources.JdbcSource

/** Live-warehouse (JDBC) source tests. The reference's deployment mode is a
  * live Postgres/Redshift (adapters/postgres.py:18-24); no warehouse runs in
  * this offline harness, so the e2e path uses embedded Derby (ships with
  * Spark at /opt/spark/jars) — a real JDBC database exercising the identical
  * spark.read.jdbc code path a postgres profile takes. */
class JdbcSourceSpec extends SparkTestBase {

  private def conn(url: String) = Profiles.ConnInfo(
    warehouseType = "jdbc", host = "", user = "", password = "",
    port = 0, dbname = "", schema = "APP",
    jdbcUrl = Some(url), driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

  /** One embedded Derby database seeded with the reference e2e golden shape
    * (test_postgres_e2e.py:301-307): base = customers 1-3, head = 1-4. */
  private lazy val derbyUrl: String = {
    val dir = Files.createTempDirectory("graft_derby_").resolve("db")
    val url = s"jdbc:derby:$dir"
    val c = DriverManager.getConnection(s"$url;create=true")
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "create table customers_base(customer_id int not null primary key, name varchar(64))")
      st.executeUpdate(
        "create table customers_head(customer_id int not null primary key, name varchar(64))")
      val names = Seq(1 -> "Alice", 2 -> "Bob", 3 -> "Chandra", 4 -> "Deepak")
      for ((id, n) <- names.take(3))
        st.executeUpdate(s"insert into customers_base values ($id, '$n')")
      for ((id, n) <- names)
        st.executeUpdate(s"insert into customers_head values ($id, '$n')")
      st.close()
    } finally c.close()
    url
  }

  test("JDBC URL derivation: postgres/redshift wire-protocol default, jdbc needs explicit url") {
    val pg = Profiles.ConnInfo("postgres", "db.example.com", "u", "p", 5432, "wh", "public")
    assert(JdbcSource.url(pg) == "jdbc:postgresql://db.example.com:5432/wh")
    // the reference connects to Redshift with psycopg2 (adapters/redshift.py)
    // i.e. the postgres wire protocol — same URL family here
    val rs = pg.copy(warehouseType = "redshift", port = 5439)
    assert(JdbcSource.url(rs) == "jdbc:postgresql://db.example.com:5439/wh")
    assert(JdbcSource.url(rs.copy(jdbcUrl = Some("jdbc:redshift://x"))) == "jdbc:redshift://x")
    val e = intercept[IllegalArgumentException](
      JdbcSource.url(pg.copy(warehouseType = "jdbc", jdbcUrl = None)))
    assert(e.getMessage.contains("url"))
    assert(JdbcSource.isJdbc(pg) && JdbcSource.isJdbc(rs) && !JdbcSource.isJdbc(
      pg.copy(warehouseType = "spark")))
  }

  test("profiles.yml jdbc/postgres targets route to the JDBC source, not a session error") {
    val dir = Files.createTempDirectory("graft_prof_jdbc_")
    Files.writeString(dir.resolve("profiles.yml"),
      s"""wh:
         |  target: prod
         |  outputs:
         |    prod:
         |      type: jdbc
         |      url: $derbyUrl
         |      driver: org.apache.derby.jdbc.EmbeddedDriver
         |      schema: APP
         |""".stripMargin)
    val c = Profiles.load(dir.resolve("profiles.yml").toString, Some("wh"), Some("prod"))
    assert(c.warehouseType == "jdbc" && c.jdbcUrl.contains(derbyUrl) && c.schema == "APP")
    assert(c.driver.contains("org.apache.derby.jdbc.EmbeddedDriver"))
    // a warehouse-type profile no longer hard-errors: it configures nothing
    // on the session (execution stays Spark) and is consumed as a source
    assert(Main.sessionTarget(Some(c)) == ((None, None, None)))
    val pg = c.copy(warehouseType = "postgres")
    assert(Main.sessionTarget(Some(pg)) == ((None, None, None)))
  }

  test("diff-tables over a live JDBC warehouse hits the reference e2e golden 3/4/1/0/0") {
    val a = Main.parseArgs(Seq("diff-tables", "customers_base", "customers_head",
      "--keys", "customer_id", "--format", "json")).copy(model = "dim_customers")
    val r = Main.runDiffTables(spark, a, Some(conn(derbyUrl)))
    assert(r.rowcounts.base == 3 && r.rowcounts.head == 4)
    val rd = r.rowDiff.get
    assert(rd.added == 1 && rd.removed == 0 && rd.changed == 0)
    // CTAS-snapshot meta recorded like the worktree flow (diff_flow.py:87-88)
    assert(r.meta.diffSchema.exists(_.startsWith("dbt_model_diff__")))
    assert(r.meta.tables.contains(("dim_customers__base", "dim_customers__head")))
  }

  test("--redshift-compat excludes boolean columns like adapters/redshift.py:69; default keeps them") {
    val c = DriverManager.getConnection(derbyUrl)
    try {
      val st = c.createStatement()
      st.executeUpdate("create table flags_t(id int not null primary key, " +
        "active boolean, vip boolean, name varchar(32))")
      st.executeUpdate("insert into flags_t values (1, true, false, 'a')")
      st.executeUpdate("insert into flags_t values (2, false, true, 'b')")
      st.close()
    } finally c.close()
    val cc = conn(derbyUrl)
    // default: booleans are ordinary columns (SURVEY §1.2 divergence)
    assert(JdbcSource.read(spark, cc, "flags_t").columns.toSeq ==
      Seq("id", "active", "vip", "name"))
    // compat: the reference's svv_columns list drops data_type='boolean'
    val compat = JdbcSource.read(spark, cc, "flags_t", redshiftCompat = true)
    assert(compat.columns.toSeq == Seq("id", "name"))
    assert(compat.count() == 2)
    // a --where on an excluded boolean still works (the reference applies
    // `where` in warehouse SQL where the column exists)
    val w = JdbcSource.read(spark, cc, "flags_t", where = Some("active"),
      redshiftCompat = true)
    assert(w.columns.toSeq == Seq("id", "name") && w.count() == 1)
    // e2e: the diff's profile/hash surface under the flag has no booleans
    val a = Main.parseArgs(Seq("diff-tables", "flags_t", "flags_t",
      "--keys", "id", "--redshift-compat", "--format", "json")).copy(model = "flags")
    assert(a.redshiftCompat)
    val r = Main.runDiffTables(spark, a, Some(cc))
    assert(r.columnProfiles.map(_.column).toSet == Set("id", "name"))
    assert(r.rowDiff.get.changed == 0)
  }

  test("--where compiles into the remote JDBC scan as a pushed filter") {
    val df = JdbcSource.read(spark, conn(derbyUrl), "customers_head",
      where = Some("customer_id <= 3"))
    assert(JdbcSource.hasPushedFilter(df),
      s"expected PushedFilters in:\n${df.queryExecution.executedPlan}")
    assert(df.count() == 3)
    // and end-to-end: the filtered diff sees only the constrained scope
    val a = Main.parseArgs(Seq("diff-tables", "customers_base", "customers_head",
      "--keys", "customer_id", "--where", "customer_id <= 3")).copy(model = "m")
    val r = Main.runDiffTables(spark, a, Some(conn(derbyUrl)))
    assert(r.rowcounts.base == 3 && r.rowcounts.head == 3)
    assert(r.rowDiff.get.added == 0 && r.rowDiff.get.removed == 0 && r.rowDiff.get.changed == 0)
  }

  test("--publish-jdbc appends the run summary back to the warehouse (round trip)") {
    val c = conn(derbyUrl)
    val a = Main.parseArgs(Seq("diff-tables", "customers_base", "customers_head",
      "--keys", "customer_id")).copy(model = "dim_customers")
    val r = Main.runDiffTables(spark, a, Some(c))
    JdbcSource.publish(spark, c, "diff_runs", Main.summaryFrame(spark, r))
    // second run appends, never replaces - run history accumulates
    JdbcSource.publish(spark, c, "diff_runs", Main.summaryFrame(spark, r))
    val back = JdbcSource.read(spark, c, "diff_runs")
    assert(back.count() == 2)
    val row = back.collect().head
    assert(row.getAs[String]("model") == "dim_customers")
    assert(row.getAs[Long]("base_rows") == 3L && row.getAs[Long]("head_rows") == 4L)
    assert(row.getAs[Long]("added") == 1L && row.getAs[Long]("removed") == 0L)
    assert(row.getAs[Int]("keys_not_unique") == 0)
    // the CLI flag parses and lands in Args
    val pa = Main.parseArgs(Seq("diff-tables", "b", "h", "--publish-jdbc", "myschema.diff_runs"))
    assert(pa.publishJdbc.contains("myschema.diff_runs"))
  }

  test("publish: concurrent appends both land; schema drift refused loudly") {
    val c = conn(derbyUrl)
    val a = Main.parseArgs(Seq("diff-tables", "customers_base", "customers_head",
      "--keys", "customer_id")).copy(model = "dim_customers")
    val frame = Main.summaryFrame(spark, Main.runDiffTables(spark, a, Some(c)))
    JdbcSource.publish(spark, c, "diff_runs_cc", frame) // creates the table
    // two runs publishing at once (separate schedulers hitting the same
    // warehouse table): append isolation means BOTH rows land — no lost
    // update, no unique-constraint invention
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val both = Future.sequence(Seq(
      Future(JdbcSource.publish(spark, c, "diff_runs_cc", frame)),
      Future(JdbcSource.publish(spark, c, "diff_runs_cc", frame))))
    Await.result(both, 120.seconds)
    assert(JdbcSource.read(spark, c, "diff_runs_cc").count() == 3)
    // a drifted summary schema (renamed column) must fail LOUDLY on append
    // and leave the run history untouched — silent positional mapping into
    // the wrong column would corrupt every later reader
    val drifted = frame.withColumnRenamed("model", "model_name")
    intercept[Exception](JdbcSource.publish(spark, c, "diff_runs_cc", drifted))
    assert(JdbcSource.read(spark, c, "diff_runs_cc").count() == 3)
  }

  test("--jdbc-partition-col splits the warehouse read into parallel bounded queries") {
    val df = JdbcSource.read(spark, conn(derbyUrl), "customers_head",
      partitionColumn = Some("customer_id"), numPartitions = 2)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4)
    // empty relation: bounds probe finds no rows -> clean single-part read
    val c0 = DriverManager.getConnection(derbyUrl)
    try c0.createStatement().executeUpdate(
      "create table empty_t(customer_id int not null primary key, name varchar(64))")
    finally c0.close()
    val empty = JdbcSource.read(spark, conn(derbyUrl), "empty_t",
      partitionColumn = Some("customer_id"), numPartitions = 4)
    assert(empty.count() == 0)
  }
}
