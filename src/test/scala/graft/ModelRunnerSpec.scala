package graft

import java.nio.file.Files

import graft.modelrun.{ModelRunner, Profiles}

/** Workload-layer specs: ref/source resolution, topo order, seed loading,
  * and the demo-warehouse golden facts (FIXTURES.md §2). */
class ModelRunnerSpec extends SparkTestBase {
  import spark.implicits._

  test("parse extracts refs/sources and renders view names") {
    val m = ModelRunner.parse("int_orders",
      "select * from {{ ref('stg_orders') }} o left join {{ source('raw', 'customers') }} c on o.id = c.id")
    assert(m.deps == Set("stg_orders", "raw__customers"))
    assert(m.sql.contains("from stg_orders o"))
    assert(m.sql.contains("join raw__customers c"))
    // config blocks are stripped (materialization hints, not semantics)
    val withCfg = ModelRunner.parse("m",
      "{{ config(materialized='table', tags=['x']) }}\nselect * from {{ ref('a') }}")
    assert(withCfg.deps == Set("a") && !withCfg.sql.contains("config"))
  }

  test("unsupported jinja fails fast, NAMING the construct, with a --build-mode dbt pointer") {
    // VERDICT r12 #7: the refusal must tell the user WHICH construct the
    // native runner refused, not just that something did — '{% set %}'
    // and the macro call are the two shapes real projects hit first
    val e2 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "{% set x = 1 %}\nselect {{ x }} as v"))
    assert(e2.getMessage.contains("--build-mode dbt"))
    assert(e2.getMessage.contains("{% set"),
      s"refusal must name the '{% set %}' block: ${e2.getMessage}")
    val e3 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "select {{ my_macro('a') }} as v"))
    assert(e3.getMessage.contains("--build-mode dbt"))
    assert(e3.getMessage.contains("my_macro"),
      s"refusal must echo the unrendered macro call: ${e3.getMessage}")
    val e4 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "{% macro foo() %}select 1{% endmacro %}"))
    assert(e4.getMessage.contains("{% macro") &&
      e4.getMessage.contains("--build-mode dbt"),
      s"refusal must name the macro definition block: ${e4.getMessage}")
  }

  test("var(): defaults, supplied values, CLI-over-project precedence, missing fails like dbt") {
    // literal default renders unquoted (dbt semantics); supplied value wins
    val dflt = ModelRunner.parse("m",
      "select * from {{ ref('a') }} where id <= {{ var('limit', 3) }}")
    assert(dflt.sql.contains("id <= 3") && dflt.deps == Set("a"))
    val strDflt = ModelRunner.parse("m",
      "select * from t where lang = '{{ var(\"lang\", \"en\") }}'")
    assert(strDflt.sql.contains("lang = 'en'"))
    val supplied = ModelRunner.parse("m",
      "select * from t where id <= {{ var('limit', 3) }}", Map("limit" -> "7"))
    assert(supplied.sql.contains("id <= 7"))
    // no default + not supplied -> loud failure naming the var
    val e = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "select {{ var('missing') }} as v"))
    assert(e.getMessage.contains("required var 'missing'"))
    // project-file vars feed loadProject; CLI extraVars override them
    val dir = Files.createTempDirectory("graft_vars_")
    Files.createDirectories(dir.resolve("models"))
    Files.writeString(dir.resolve("dbt_project.yml"),
      "name: demo\nvars:\n  cutoff: 5\n  lang: en\n")
    Files.writeString(dir.resolve("models/m.sql"),
      "select {{ var('cutoff') }} as cutoff, '{{ var('lang') }}' as lang")
    assert(ModelRunner.projectVars(dir.toString) == Map("cutoff" -> "5", "lang" -> "en"))
    val fromFile = ModelRunner.loadProject(dir.toString).head
    assert(fromFile.sql.contains("select 5 as cutoff") && fromFile.sql.contains("'en' as lang"))
    val overridden = ModelRunner.loadProject(dir.toString, Map("cutoff" -> "9")).head
    assert(overridden.sql.contains("select 9 as cutoff") && overridden.sql.contains("'en'"))
    // end to end through spark.sql
    val out = ModelRunner.run(spark, Seq(overridden))("m").collect().head
    assert(out.getInt(0) == 9 && out.getString(1) == "en")
  }

  test("{% if %}: var()-driven branches render both ways, elif/else/nesting, ==/!=/not") {
    val sql = """select id from {{ ref('a') }}
                |{% if var('incremental', false) %}where id > {{ var('cutoff', 0) }}
                |{% else %}-- full refresh
                |{% endif %}""".stripMargin
    val on = ModelRunner.parse("m", sql, Map("incremental" -> "true", "cutoff" -> "42"))
    assert(on.sql.contains("where id > 42") && !on.sql.contains("full refresh"))
    val off = ModelRunner.parse("m", sql) // default false -> else branch
    assert(!off.sql.contains("where id >") && off.sql.contains("full refresh"))
    // == / != / not, elif chain
    val chain = """select {% if var('env') == 'prod' %}1{% elif var('env') != 'dev' %}2{% else %}3{% endif %} as v"""
    assert(ModelRunner.parse("m", chain, Map("env" -> "prod")).sql.contains("select 1 as v"))
    assert(ModelRunner.parse("m", chain, Map("env" -> "staging")).sql.contains("select 2 as v"))
    assert(ModelRunner.parse("m", chain, Map("env" -> "dev")).sql.contains("select 3 as v"))
    val neg = "select {% if not var('skip', false) %}included{% endif %} from t"
    assert(ModelRunner.parse("m", neg).sql.contains("included"))
    assert(!ModelRunner.parse("m", neg, Map("skip" -> "true")).sql.contains("included"))
    // nested if inside if: outer true, inner false -> exactly "a"
    val nested = "{% if var('a', true) %}{% if var('b', false) %}ab{% else %}a{% endif %}{% endif %}"
    val nr = ModelRunner.parse("m", "select 1 -- " + nested)
    assert(nr.sql.trim.endsWith("-- a") && !nr.sql.contains("ab"))
    // ref()s inside a dead branch must NOT become dependencies
    val deadRef = "select * from {% if var('x', false) %}{{ ref('live') }}{% else %}{{ ref('fallback') }}{% endif %}"
    assert(ModelRunner.parse("m", deadRef).deps == Set("fallback"))
  }

  test("{% for %}: inline lists, var()-fed lists, loop-var substitution, end to end") {
    // inline literal list, {{ s }} substituted per iteration
    val union = """{% for s in ['web', 'app'] %}select '{{ s }}' as src from {{ ref('stg_{{ s }}') }}
                  |{% endfor %}""".stripMargin
    val m = ModelRunner.parse("m", union)
    assert(m.deps == Set("stg_web", "stg_app"))
    assert(m.sql.contains("'web' as src from stg_web") && m.sql.contains("'app' as src from stg_app"))
    // var()-fed list: comma-separated value from --vars
    val fed = ModelRunner.parse("m",
      "select id{% for c in var('cols') %}, {{ c }}{% endfor %} from t",
      Map("cols" -> "name, city"))
    assert(fed.sql.contains("select id, name, city from t"))
    // inline-list-shaped var value
    val shaped = ModelRunner.parse("m",
      "select id{% for c in var('cols') %}, {{ c }}{% endfor %} from t",
      Map("cols" -> "['x', 'y']"))
    assert(shaped.sql.contains("select id, x, y from t"))
    // if nested in for
    val mixed = ModelRunner.parse("m",
      "select 1{% for c in ['a', 'b'] %}{% if c == 'a' %}, {{ c }}{% endif %}{% endfor %}")
    assert(mixed.sql.replaceAll("\\s+", " ").contains("select 1, a"))
    assert(!mixed.sql.contains(", b"))
    // end to end through spark.sql: a for-generated UNION ALL
    val u = ModelRunner.parse("m",
      "{% for v in [1, 2, 3] %}select {{ v }} as n {% if v != 3 %}union all {% endif %}{% endfor %}")
    val got = ModelRunner.run(spark, Seq(u))("m").collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(1, 2, 3))
  }

  test("block rendering failure modes: unbalanced, unknown tags, bad expressions") {
    val e1 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "select 1 {% if var('x', true) %} from t"))
    assert(e1.getMessage.contains("endif") && e1.getMessage.contains("--build-mode dbt"))
    val e2 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "{% for x in ['a'] %}select '{{ x }}'"))
    assert(e2.getMessage.contains("endfor"))
    val e3 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "{% macro foo() %}{% endmacro %}select 1"))
    assert(e3.getMessage.contains("--build-mode dbt"))
    val e4 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "select 1 {% if len(x) > 2 %}a{% endif %}"))
    assert(e4.getMessage.contains("--build-mode dbt"))
    // a required var missing inside a condition names the var
    val e5 = intercept[IllegalArgumentException](ModelRunner.parse("m",
      "{% if var('nope') %}a{% endif %}"))
    assert(e5.getMessage.contains("required var 'nope'"))
  }

  test("topo order respects dependencies and detects cycles") {
    val models = Seq(
      ModelRunner.Model("c", "select * from b", Set("b")),
      ModelRunner.Model("a", "select 1", Set.empty),
      ModelRunner.Model("b", "select * from a", Set("a")))
    assert(ModelRunner.topoOrder(models).map(_.name) == Seq("a", "b", "c"))
    val cyclic = Seq(
      ModelRunner.Model("x", "", Set("y")),
      ModelRunner.Model("y", "", Set("x")))
    intercept[IllegalArgumentException](ModelRunner.topoOrder(cyclic))
  }

  test("demo warehouse DAG reproduces the documented golden facts") {
    // FIXTURES.md §2: 4 seeds -> stage casts -> intermediate joins/aggs.
    Seq(
      (1, "Alice Smith", "ALICE@example.com", "2024-01-10", "UK"),
      (2, "bob jones", "Bob@Example.com", "2024-02-11", "US"),
      (3, "Carol King", "carol@example.com", "2024-03-12", "FR"),
      (4, "dan lee", "DAN@example.com", "2024-04-13", "UK")
    ).toDF("customer_id", "customer_name", "email", "signup_date", "country")
      .createOrReplaceTempView("seed_customers")
    Seq(
      (1001, 1, "2024-05-01", "COMPLETED"),
      (1002, 2, "2024-05-02", "completed"),
      (1003, 3, "2024-05-03", "PENDING"),
      (1004, 4, "2024-05-04", "completed") // no items -> dropped by inner join
    ).toDF("order_id", "customer_id", "order_date", "status")
      .createOrReplaceTempView("seed_orders")
    Seq(
      (1001, 1, 2, "25.00"), (1001, 2, 1, "9.00"),
      (1002, 3, 1, "140.00"),
      (1003, 1, 3, "7.99")
    ).toDF("order_id", "product_id", "quantity", "unit_price")
      .createOrReplaceTempView("seed_order_items")

    val models = Seq(
      ModelRunner.parse("stg_customers",
        """select cast(customer_id as int) as customer_id,
          |  initcap(trim(customer_name)) as customer_name,
          |  lower(trim(email)) as email,
          |  cast(signup_date as date) as signup_date,
          |  upper(country) as country
          |from {{ ref('seed_customers') }}""".stripMargin),
      ModelRunner.parse("stg_orders",
        """select cast(order_id as int) as order_id, cast(customer_id as int) as customer_id,
          |  cast(order_date as date) as order_date, lower(status) as status
          |from {{ ref('seed_orders') }}""".stripMargin),
      ModelRunner.parse("stg_order_items",
        """select cast(order_id as int) as order_id, cast(product_id as int) as product_id,
          |  cast(quantity as int) as quantity, cast(unit_price as decimal(10,2)) as unit_price,
          |  cast(quantity as int) * cast(unit_price as decimal(10,2)) as line_total
          |from {{ ref('seed_order_items') }}""".stripMargin),
      ModelRunner.parse("int_orders",
        """select o.order_id, o.order_date, o.status, c.customer_id, c.customer_name, c.country
          |from {{ ref('stg_orders') }} o
          |left join {{ ref('stg_customers') }} c on o.customer_id = c.customer_id""".stripMargin),
      ModelRunner.parse("fct_orders",
        """select io.order_id, io.order_date, io.status, io.customer_id, io.customer_name, io.country,
          |  agg.item_count, agg.order_total
          |from (select order_id, cast(sum(quantity) as bigint) as item_count,
          |        cast(sum(line_total) as decimal(10,2)) as order_total
          |      from {{ ref('stg_order_items') }} group by order_id) agg
          |join {{ ref('int_orders') }} io on agg.order_id = io.order_id""".stripMargin)
    )
    val frames = ModelRunner.run(spark, models)
    val fct = frames("fct_orders").orderBy("order_id").collect()
    assert(fct.length == 3) // order 1004 dropped (no items)
    val totals = fct.map(_.getAs[java.math.BigDecimal]("order_total").toString).toSeq
    assert(totals == Seq("59.00", "140.00", "23.97"))
    assert(fct.map(_.getAs[Long]("item_count")).toSeq == Seq(3L, 1L, 3L))
    // stage normalization applied
    assert(frames("stg_customers").orderBy("customer_id").collect()
      .map(_.getAs[String]("customer_name")).take(2).toSeq == Seq("Alice Smith", "Bob Jones"))
  }

  test("the reference's ACTUAL demo dbt project runs unmodified on this engine") {
    // switch-compatibility proof: load the read-only demo project's seeds and
    // model SQL directly (only {{ ref(...) }} jinja — fully supported) and
    // check the documented facts (FIXTURES.md §2 / demo schema.yml).
    val demo = "/root/reference/dbt/dbt_warehouse_demo_with_docs"
    assume(new java.io.File(s"$demo/models").isDirectory, "reference demo not present")
    ModelRunner.loadSeeds(spark, demo)
    val frames = ModelRunner.run(spark, ModelRunner.loadProject(demo))
    assert(frames.keySet == Set(
      "stg_customers", "stg_orders", "stg_order_items", "stg_products",
      "int_customers", "int_orders", "int_products", "int_order_agg",
      "dim_customers", "dim_products", "fct_orders"))
    val fct = frames("fct_orders").orderBy("order_id").collect()
    assert(fct.length == 3) // order 1004 dropped by the items inner join
    assert(fct.map(_.getAs[java.math.BigDecimal]("order_total").toString).toSeq ==
      Seq("59.00", "140.00", "23.97"))
    assert(fct.map(_.getAs[Long]("item_count")).toSeq == Seq(3L, 1L, 3L))
    // int_customers.locale is the constant 'EN' (schema.yml uniqueness 25%)
    val locales = frames("dim_customers").select("locale").distinct().collect()
    assert(locales.map(_.getString(0)).toSeq == Seq("EN"))
    // stage normalization applied (initcap/trim/lower/upper)
    val c1 = frames("stg_customers").orderBy("customer_id").head()
    assert(c1.getAs[String]("email") == "alice@example.com")
    assert(c1.getAs[String]("country") == "UK")
  }

  test("profiles.yml parsing: resolution order, fallbacks, errors") {
    val dir = Files.createTempDirectory("graft_profiles_")
    val f = dir.resolve("profiles.yml")
    Files.writeString(f,
      """mini_project:
        |  target: dev
        |  outputs:
        |    dev:
        |      type: postgres
        |      host: 127.0.0.1
        |      user: postgres
        |      password: postgres
        |      port: 55432
        |      dbname: postgres
        |      schema: core
        |    prod:
        |      type: spark
        |      database: warehouse
        |""".stripMargin)
    val c = Profiles.load(f.toString, env = Map.empty)
    assert(c.warehouseType == "postgres" && c.port == 55432 && c.schema == "core")
    // target override + database fallback + default port
    val p = Profiles.load(f.toString, targetArg = Some("prod"), env = Map.empty)
    assert(p.warehouseType == "spark" && p.dbname == "warehouse" && p.port == 5432)
    // DBT_PROFILE env resolution
    val viaEnv = Profiles.load(f.toString, env = Map("DBT_PROFILE" -> "mini_project"))
    assert(viaEnv.warehouseType == "postgres")
    intercept[IllegalArgumentException](Profiles.load(f.toString, profileArg = Some("nope"), env = Map.empty))
    intercept[IllegalArgumentException](Profiles.load(f.toString, targetArg = Some("nope"), env = Map.empty))
  }
}
