package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt evaluation — crawl politeness, the gate in front of every
  * fetch a web-corpus pipeline makes (RFC 9309 semantics for the parts
  * that matter at corpus scale):
  *
  *   - `#` comments stripped, blank-line-separated GROUPS of one or more
  *     `User-agent:` lines followed by `Allow:`/`Disallow:` rules;
  *   - a crawler obeys the union of the groups naming it EXACTLY
  *     (case-insensitive); only if none do, the `*` groups apply;
  *   - decision per path: among rules whose path is a prefix of the
  *     target, the LONGEST path wins; on a length tie Allow wins; an
  *     empty-path `Disallow:` disallows nothing; no matching rule ⇒
  *     allowed.
  *
  * A REAL line-walking parser (the honest-decoder contract of the
  * PPM/WAV/PNG/BMP/WARC family): unknown fields (Crawl-delay, Sitemap)
  * are skipped, malformed lines are ignored — a broken robots.txt must
  * never kill a fetch task. [[robotsCheck]] runs it per row in a
  * shuffle-free Dataset map: robots payloads stay on the executor that
  * scanned them; at scale the per-DOMAIN robots table is small and this
  * joins AFTER a broadcast of it against the URL frontier. */
object Robots {

  final case class Rule(allow: Boolean, path: String)

  /** Rules applying to `agent` (see object doc for group selection). */
  def parse(content: String, agent: String): Seq[Rule] = {
    if (content == null) return Seq.empty
    val a = agent.toLowerCase
    final case class Group(agents: Seq[String], rules: Seq[Rule])
    val groups = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[Rule]
    var inAgents = true
    var haveGroup = false
    def flush(): Unit = {
      if (haveGroup) groups += Group(agents.result(), rules.result())
      agents = Seq.newBuilder[String]; rules = Seq.newBuilder[Rule]
      inAgents = true; haveGroup = false
    }
    content.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush() // a new agent line after rules starts a new group
            agents += value.toLowerCase; haveGroup = true
          case "allow" | "disallow" =>
            if (haveGroup) { inAgents = false; rules += Rule(field == "allow", value) }
          case _ => () // Crawl-delay, Sitemap, unknown fields: skipped
        }
      }
      // malformed (no colon) and blank lines are ignored; group breaks are
      // driven by agent-after-rules, which survives missing blank lines
    }
    flush()
    val all = groups.result()
    val exact = all.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else all.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** Longest-prefix-match decision (Allow wins length ties). */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    val matching = rules.filter(r => r.path.nonEmpty && path.startsWith(r.path))
    if (matching.isEmpty) true
    else {
      val longest = matching.map(_.path.length).max
      matching.filter(_.path.length == longest).exists(_.allow)
    }
  }

  /** Evaluate one (robots, path) pair per row for a fixed crawler name —
    * output (id, n_rules, allowed 0/1). Shuffle-free Dataset map. */
  def robotsCheck(df: DataFrame, idCol: String, robotsCol: String,
      pathCol: String, agent: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(robotsCol), col(pathCol))
      .as[(Long, String, String)]
      .map { case (id, robots, path) =>
        val rules = parse(robots, agent)
        (id, rules.size, if (isAllowed(rules, path)) 1L else 0L)
      }
      .toDF(idCol, "n_rules", "allowed")
  }
}
