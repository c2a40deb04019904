package graft

/** Guards on the driver contract: the queries map must not silently lose
  * entries (duplicate names), every oracle must point at a real query, and
  * the flagship entry must return rows. */
class SparkEntrySpec extends SparkTestBase {

  test("query names are unique across packs (Map would silently drop dups)") {
    val names = graft.queries.ParityQueries.defs.map(_.name) ++
      graft.queries.ExtensionQueries.defs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: ${missing.mkString(", ")}")
  }

  test("oracle SQL contains no unescapable control characters") {
    // tabs/newlines are escaped by Verify's writer; NUL or other exotic
    // control chars in SQL would indicate an authoring accident
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n' && c != '\t' && c != '\r'),
        s"$name oracle contains exotic control characters")
    }
  }

  test("flagship entry returns the diff summary") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 5)
    val metrics = rows.map(_.getString(0)).toSet
    assert(metrics == Set("base_rows", "head_rows", "added", "removed", "changed"))
  }
}
