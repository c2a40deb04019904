package graft.modelrun

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** External `dbt build` execution mode — full jinja fidelity.
  *
  * The native [[ModelRunner]] resolves `ref`/`source`/`config` only; a
  * project using macros, `var()`, `{% if %}` blocks or incremental models
  * needs the real dbt. This mode mirrors the reference exactly: shell out to
  * `dbt build --select <model>` in each worktree (reference:
  * core/dbt_runner.py:11-39), then resolve the BUILT relation's identity
  * from `target/manifest.json` (core/manifest.py:11-65) — which is what
  * makes `alias`, custom schemas, and duplicate basenames across folders
  * resolve correctly — and read that relation from the Spark catalog.
  */
object DbtBuild {

  /** dbt executable missing/not runnable — callers fall back to the native
    * runner with a warning rather than failing the diff. */
  final case class DbtUnavailable(message: String) extends RuntimeException(message)

  /** The manifest fields relation resolution needs (manifest.py node dict). */
  final case class ManifestNode(
      uniqueId: String,
      name: String,
      alias: String,
      schema: String,
      database: Option[String],
      relationName: Option[String])

  /** Executable override for tests/deployments (system property wins). */
  def dbtBin: String =
    sys.props.get("graft.dbt.bin").orElse(sys.env.get("GRAFT_DBT_BIN")).getOrElse("dbt")

  /** `dbt build --select <model>` in `projectDir` (dbt_runner.py:11-39).
    * @throws DbtUnavailable when the executable can't start
    * @throws IllegalArgumentException on missing dbt_project.yml or build failure */
  def build(
      projectDir: String,
      profilesDir: Option[String],
      model: String,
      target: Option[String],
      bin: String = dbtBin,
      vars: Map[String, String] = Map.empty): Unit = {
    require(Files.exists(Paths.get(projectDir, "dbt_project.yml")),
      s"dbt_project.yml not found in: $projectDir") // dbt_runner.py:24
    // --vars forwards as dbt's YAML-dict form, so native and dbt build
    // modes honor the same CLI overrides; values quote as YAML strings
    // (dbt coerces numerics itself)
    val varsArg =
      if (vars.isEmpty) Nil
      else Seq("--vars",
        vars.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k: ${'"'}${v.replace("\\", "\\\\").replace("\"", "\\\"")}${'"'}" }
          .mkString("{", ", ", "}"))
    val cmd = Seq(bin, "build", "--project-dir", projectDir) ++
      profilesDir.toSeq.flatMap(d => Seq("--profiles-dir", d)) ++
      Seq("--select", model) ++
      target.toSeq.flatMap(t => Seq("--target", t)) ++ varsArg
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(projectDir))
    pb.redirectErrorStream(true)
    val p =
      try pb.start()
      catch {
        case e: java.io.IOException =>
          throw DbtUnavailable(s"dbt executable '$bin' not runnable (${e.getMessage})")
      }
    val out = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"dbt build failed (${cmd.mkString(" ")}):\n$out")
  }

  /** The manifest node for `model` (manifest.py:11-65: resource_type filter
    * + name match over target/manifest.json's `nodes`). */
  def modelNode(projectDir: String, model: String): ManifestNode = {
    val mp = Paths.get(projectDir, "target", "manifest.json")
    if (!Files.exists(mp))
      throw new java.io.FileNotFoundException(s"manifest.json not found at: $mp")
    val root = new ObjectMapper().readTree(Files.readString(mp))
    val nodes = root.get("nodes")
    require(nodes != null && nodes.isObject, "Invalid manifest.json: nodes missing")
    def opt(n: com.fasterxml.jackson.databind.JsonNode, field: String): Option[String] =
      Option(n.get(field)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
    nodes.elements().asScala
      .find(n => n.path("resource_type").asText == "model" && n.path("name").asText == model)
      .map { n =>
        ManifestNode(
          uniqueId = n.path("unique_id").asText(""),
          name = n.path("name").asText,
          alias = opt(n, "alias").getOrElse(model), // dbt defaults alias to the model name
          schema = n.path("schema").asText(""),
          database = opt(n, "database"),
          relationName = opt(n, "relation_name"))
      }
      .getOrElse(throw new IllegalArgumentException(s"Model '$model' not found in manifest.json"))
  }

  /** (schema, identifier) of the built relation: parse `relation_name` when
    * present (quoted or dotted — manifest.py parse_relation_name_pg), else
    * schema + alias. */
  def relation(node: ManifestNode): (String, String) = {
    node.relationName.flatMap { rn =>
      val quoted = "\"([^\"]+)\"".r.findAllMatchIn(rn).map(_.group(1)).toVector
      if (quoted.length >= 2) Some((quoted(quoted.length - 2), quoted.last))
      else {
        val parts = rn.split('.').toVector
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
        if (parts.length >= 2) Some((parts(parts.length - 2), parts.last)) else None
      }
    }.getOrElse((node.schema, node.alias))
  }

  /** Read the relation dbt built from the session catalog. */
  def readRelation(spark: SparkSession, schema: String, ident: String): DataFrame =
    if (schema.isEmpty) spark.table(s"`$ident`")
    else spark.table(s"`$schema`.`$ident`")
}
