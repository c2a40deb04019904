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
  *   - rule paths are PATTERNS (RFC 9309 §2.2.3): `*` matches any run
  *     of characters, a trailing `$` anchors the match to the end of
  *     the target path, and a pattern without `$` matches any target it
  *     is a prefix-pattern of; percent-escapes are normalized on both
  *     sides before matching (decoded to the octet, except `%2F` which
  *     stays encoded so an escaped slash never collides with the path
  *     delimiter);
  *   - decision per path: among matching rules, the one with the
  *     LONGEST pattern wins; on a length tie Allow wins; an empty-path
  *     `Disallow:` disallows nothing; no matching rule ⇒ allowed.
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

  private final case class Group(agents: Seq[String], rules: Seq[Rule], delay: Option[Long])

  /** The groups applying to `agent` (see object doc for group selection). */
  private def chosenGroups(content: String, agent: String): Seq[Group] = {
    if (content == null) return Seq.empty
    val a = agent.toLowerCase
    val groups = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[Rule]
    var delay: Option[Long] = None
    var inAgents = true
    var haveGroup = false
    def flush(): Unit = {
      if (haveGroup) groups += Group(agents.result(), rules.result(), delay)
      agents = Seq.newBuilder[String]; rules = Seq.newBuilder[Rule]
      delay = None; inAgents = true; haveGroup = false
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
          case "crawl-delay" =>
            // non-standard but universally emitted; seconds, fractional
            // tolerated (floored), malformed ignored — first value wins
            if (haveGroup) {
              inAgents = false
              if (delay.isEmpty)
                delay = scala.util.Try(value.toDouble).toOption
                  .filter(d => d >= 0 && d <= 86400).map(_.toLong)
            }
          case _ => () // Sitemap, unknown fields: skipped
        }
      }
      // malformed (no colon) and blank lines are ignored; group breaks are
      // driven by agent-after-rules, which survives missing blank lines
    }
    flush()
    val all = groups.result()
    val exact = all.filter(_.agents.contains(a))
    if (exact.nonEmpty) exact else all.filter(_.agents.contains("*"))
  }

  /** Rules applying to `agent` (see object doc for group selection). */
  def parse(content: String, agent: String): Seq[Rule] =
    chosenGroups(content, agent).flatMap(_.rules)

  /** Crawl-delay (whole seconds) applying to `agent`: the MINIMUM across
    * the agent's groups (obeying the strictest published rate is the safe
    * reading of a conflicting robots.txt); None when no group sets one. */
  def crawlDelay(content: String, agent: String): Option[Long] = {
    val ds = chosenGroups(content, agent).flatMap(_.delay)
    if (ds.isEmpty) None else Some(ds.min)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Percent-escape normalization so `/a%2Db` and `/a-b` compare equal:
    * decode `%XX` to its octet, EXCEPT `%2F` (an escaped slash must stay
    * distinct from the path delimiter — kept encoded, hex uppercased).
    * Malformed escapes pass through literally. */
  private[operators] def pctNormalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v == 0x2F) sb.append("%2F") else sb.append(v.toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 9309 §2.2.3 pattern match: `*` = any character run, one
    * trailing `$` = end anchor (a `$` anywhere else is literal). A
    * pattern without the anchor is a prefix pattern — implemented by
    * appending `*` and requiring a whole-string glob match. Iterative
    * glob with single-star backtracking: O(|path|·stars) worst case, no
    * recursion, so a hostile robots.txt can't blow the task stack. */
  private[operators] def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val base = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val pat = if (anchored) base else base + "*"
    var pi = 0; var si = 0; var starPi = -1; var starSi = 0
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') { starPi = pi; starSi = si; pi += 1 }
      else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (starPi >= 0) { starSi += 1; si = starSi; pi = starPi + 1 }
      else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** Longest-pattern-match decision (Allow wins length ties). Pattern
    * length is ranked on the raw rule path per RFC 9309 §2.2.2. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    val target = pctNormalize(path)
    val matching = rules.filter(r => r.path.nonEmpty && pathMatches(pctNormalize(r.path), target))
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
