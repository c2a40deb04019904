package graft.modelrun

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-native model execution — the workload layer the reference delegates
  * to `dbt build` (core/dbt_runner.py:11-39). Models are SQL files using
  * dbt-style `{{ ref('name') }}` / `{{ source('schema','table') }}`
  * references; we resolve the reference graph, topologically order it, and
  * execute each model with `spark.sql` over temp views — Catalyst sees the
  * whole lineage, so cross-model pushdown/pruning happen for free (something
  * per-model warehouse CTAS can never do).
  */
object ModelRunner {

  final case class Model(name: String, sql: String, deps: Set[String])

  private val RefPat = raw"""\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val SourcePat = raw"""\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  // dbt config blocks are materialization hints, not query semantics —
  // stripped (this engine decides materialization via SnapshotStore).
  private val ConfigPat = raw"\{\{\s*config\([^)]*\)\s*\}\}".r
  // {{ var('name') }} / {{ var('name', default) }} — group 2 is the raw
  // default expression (a quoted string or a bare number), if present
  private val VarPat = raw"""\{\{\s*var\(\s*['"]([^'"]+)['"]\s*(?:,\s*([^)]*?)\s*)?\)\s*\}\}""".r

  /** Source tables referenced as `{{ source('s','t') }}` resolve to the view
    * name `s__t` — register sources under that convention. */
  def sourceViewName(schema: String, table: String): String = s"${schema}__$table"

  /** Parse one model's SQL: extract ref/source dependencies and rewrite the
    * jinja-ish references to plain view names; render `var()` lookups from
    * the merged project/CLI vars (dbt semantics: the value substitutes RAW —
    * users quote string vars at the call site; a missing var with no
    * default fails like dbt's "Required var not found").
    *
    * The native surface is exactly `ref`/`source`/`config`/`var` — any
    * OTHER jinja (macros, `{% ... %}` blocks) is detected up front and
    * fails with a pointer to `--build-mode dbt` (which renders full jinja
    * through the real dbt), instead of leaking `{{ ... }}` into spark.sql
    * and dying with an unrelated SQL parse error. */
  def parse(name: String, rawSql: String,
      vars: Map[String, String] = Map.empty): Model = {
    val noConfig = ConfigPat.replaceAllIn(rawSql, "")
    val withVars = VarPat.replaceAllIn(noConfig, m => {
      val varName = m.group(1)
      val default = Option(m.group(2)).map(_.trim).filter(_.nonEmpty).map { d =>
        // a jinja string literal default renders unquoted, like dbt
        if ((d.startsWith("'") && d.endsWith("'") && d.length >= 2) ||
          (d.startsWith("\"") && d.endsWith("\"") && d.length >= 2))
          d.substring(1, d.length - 1)
        else d
      }
      val v = vars.get(varName).orElse(default).getOrElse(
        throw new IllegalArgumentException(
          s"model '$name': required var '$varName' not found in " +
            "dbt_project.yml vars or --vars, and no default given"))
      scala.util.matching.Regex.quoteReplacement(v)
    })
    val refs = RefPat.findAllMatchIn(withVars).map(_.group(1)).toSet
    val sources = SourcePat.findAllMatchIn(withVars)
      .map(m => sourceViewName(m.group(1), m.group(2))).toSet
    val rendered = SourcePat.replaceAllIn(
      RefPat.replaceAllIn(withVars, m => m.group(1)),
      m => sourceViewName(m.group(1), m.group(2)))
    val leftover = raw"\{\{[\s\S]*?\}\}|\{%[\s\S]*?%\}".r.findFirstIn(rendered)
    leftover.foreach { j =>
      throw new IllegalArgumentException(
        s"model '$name' uses jinja beyond ref/source/config/var (found: ${j.take(60)}); " +
          "the native runner cannot render it — run with --build-mode dbt")
    }
    Model(name, rendered, refs ++ sources)
  }

  /** Flat `vars:` scalars from the project's dbt_project.yml (plus one
    * nested level flattened by bare key — dbt's project-scoped vars shape),
    * empty when the file or section is absent. */
  def projectVars(projectDir: String): Map[String, String] = {
    val p = Paths.get(projectDir, "dbt_project.yml")
    if (!Files.isRegularFile(p)) return Map.empty
    val doc = Profiles.parseYaml(Files.readString(p))
    doc.get("vars").map { n =>
      n.scalars ++ n.children.flatMap { case (_, scope) => scope.scalars }
    }.getOrElse(Map.empty)
  }

  /** Load every .sql file under `models/` (recursively; model name = file
    * basename, like dbt). `extraVars` (CLI `--vars`) override the
    * project-file vars, matching dbt precedence. */
  def loadProject(projectDir: String,
      extraVars: Map[String, String] = Map.empty): Seq[Model] = {
    val modelsDir = Paths.get(projectDir, "models")
    if (!Files.isDirectory(modelsDir)) return Nil
    val vars = projectVars(projectDir) ++ extraVars
    Files.walk(modelsDir).iterator().asScala
      .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
      .map { p: Path =>
        val name = p.getFileName.toString.stripSuffix(".sql")
        parse(name, Files.readString(p), vars)
      }
      .toSeq.sortBy(_.name)
  }

  /** Kahn topological order; external names (sources/seeds, registered
    * before the run) are satisfied implicitly. Cycles raise. */
  def topoOrder(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val resolved = scala.collection.mutable.LinkedHashSet.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(name: String): Unit = byName.get(name).foreach { m =>
      if (!resolved.contains(name)) {
        require(visiting.add(name), s"model dependency cycle through '$name'")
        m.deps.toSeq.sorted.foreach(visit)
        visiting.remove(name)
        resolved += name
      }
    }
    models.map(_.name).foreach(visit)
    resolved.toSeq.map(byName)
  }

  /** Execute models in dependency order, registering each result as a temp
    * view; returns every model's DataFrame. Lazy: nothing materializes until
    * a downstream action (diff/write) runs — one Catalyst plan end to end. */
  def run(spark: SparkSession, models: Seq[Model]): Map[String, DataFrame] =
    topoOrder(models).map { m =>
      val df = spark.sql(m.sql)
      df.createOrReplaceTempView(m.name)
      m.name -> df
    }.toMap

  /** Convenience: load seeds (CSV files under `seeds/`, header row) as
    * source views, mirroring dbt's seed step (demo/dbt_project.yml:22-25). */
  def loadSeeds(spark: SparkSession, projectDir: String, schema: String = "seeds"): Seq[String] = {
    val seedsDir = Paths.get(projectDir, "seeds")
    if (!Files.isDirectory(seedsDir)) return Nil
    Files.list(seedsDir).iterator().asScala
      .filter(_.toString.endsWith(".csv"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".csv")
        val view = sourceViewName(schema, name)
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(p.toString)
          .createOrReplaceTempView(view)
        // also register the bare name so `{{ ref('seed') }}` works like dbt
        spark.table(view).createOrReplaceTempView(name)
        view
      }.toSeq.sorted
  }
}
