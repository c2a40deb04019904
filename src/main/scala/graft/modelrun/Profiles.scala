package graft.modelrun

import java.nio.file.{Files, Paths}

/** profiles.yml connection-descriptor parsing with the reference's resolution
  * semantics (core/dbt_profiles.py:14-85), minus any warehouse TCP use — the
  * descriptor configures which Spark-side execution target a run uses.
  *
  * Resolution order for the profile name: explicit arg → $DBT_PROFILE → the
  * sole profile in the file (dbt_profiles.py:45-51). `dbname` falls back to
  * `database` (:83), port defaults per type (:82). A tiny purpose-built
  * parser covers the two-level mapping shape the reference reads — no YAML
  * library dependency.
  */
object Profiles {

  final case class ConnInfo(
      warehouseType: String,
      host: String,
      user: String,
      password: String,
      port: Int,
      dbname: String,
      schema: String,
      // JDBC-source extras (graft.sources.JdbcSource): an explicit `url:`
      // overrides the type-derived URL; `driver:` names the JDBC driver
      // class when the jar doesn't self-register
      jdbcUrl: Option[String] = None,
      driver: Option[String] = None)

  /** Accepted targets: the reference's two (read over JDBC), our native
    * one, and a generic `jdbc` escape hatch (explicit `url:`). */
  val SupportedTypes: Set[String] = Set("postgres", "redshift", "spark", "jdbc")

  def load(
      profilesPath: String,
      profileArg: Option[String] = None,
      targetArg: Option[String] = None,
      env: Map[String, String] = sys.env
  ): ConnInfo = {
    val path = Paths.get(profilesPath)
    require(Files.isRegularFile(path), s"profiles file not found: $profilesPath")
    val doc = parseYaml(Files.readString(path))

    val profileName = profileArg
      .orElse(env.get("DBT_PROFILE"))
      .getOrElse {
        require(doc.size == 1,
          s"multiple profiles in $profilesPath and none selected (use --profile or DBT_PROFILE)")
        doc.keys.head
      }
    val profile = doc.getOrElse(profileName,
      throw new IllegalArgumentException(s"profile '$profileName' not found in $profilesPath"))

    val target = targetArg
      .orElse(profile.scalars.get("target"))
      .getOrElse(throw new IllegalArgumentException(s"profile '$profileName' has no target"))
    val outputs = profile.children.getOrElse("outputs",
      throw new IllegalArgumentException(s"profile '$profileName' has no outputs"))
    val out = outputs.children.getOrElse(target,
      throw new IllegalArgumentException(s"target '$target' not found in profile '$profileName'"))

    val s = out.scalars
    val tpe = s.getOrElse("type",
      throw new IllegalArgumentException(s"target '$target' has no type"))
    require(SupportedTypes(tpe), s"unsupported warehouse type '$tpe' (want ${SupportedTypes.mkString("/")})")
    ConnInfo(
      warehouseType = tpe,
      host = s.getOrElse("host", "localhost"),
      user = s.getOrElse("user", ""),
      password = s.getOrElse("password", ""),
      port = s.get("port").map(_.toInt).getOrElse(if (tpe == "redshift") 5439 else 5432),
      dbname = s.get("dbname").orElse(s.get("database")).getOrElse(""),
      schema = s.getOrElse("schema", "public"),
      jdbcUrl = s.get("url").filter(_.nonEmpty),
      driver = s.get("driver").filter(_.nonEmpty))
  }

  /** Minimal indentation-based mapping parser: scalar `k: v` and nested
    * mapping nodes — the only YAML shapes profiles.yml uses. */
  final case class Node(scalars: Map[String, String], children: Map[String, Node])

  private[modelrun] def parseYaml(text: String): Map[String, Node] = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.takeWhile(_ == ' ').length, l.trim, i) }
      .filter { case (_, t, _) => t.nonEmpty && !t.startsWith("#") }
      .toVector

    def parseBlock(start: Int, indent: Int): (Map[String, String], Map[String, Node], Int) = {
      var scalars = Map.empty[String, String]
      var children = Map.empty[String, Node]
      var i = start
      while (i < lines.length && lines(i)._1 >= indent) {
        val (ind, t, _) = lines(i)
        if (ind == indent) {
          val colon = t.indexOf(':')
          require(colon > 0, s"unparseable profiles.yml line: '$t'")
          val key = t.substring(0, colon).trim
          val value = t.substring(colon + 1).trim.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("'").stripSuffix("'")
          if (value.nonEmpty) { scalars += key -> value; i += 1 }
          else {
            val childIndent = if (i + 1 < lines.length) lines(i + 1)._1 else indent
            if (childIndent > indent) {
              val (cs, cc, next) = parseBlock(i + 1, childIndent)
              children += key -> Node(cs, cc)
              i = next
            } else { scalars += key -> ""; i += 1 }
          }
        } else i += 1
      }
      (scalars, children, i)
    }

    if (lines.isEmpty) Map.empty
    else {
      val (s, c, _) = parseBlock(0, lines.head._1)
      c ++ s.map { case (k, _) => k -> Node(Map.empty, Map.empty) }
    }
  }
}
