package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compliance primitives over the warehouse graph. The reference diffs
  * tables; a production deployment of the same warehouse also has to
  * answer "delete subject X everywhere" — this module plans that cascade
  * as data, so the destructive step is reviewable before it runs. */
object Governance {

  /** One FK hop of the cascade: rows of `child` whose `fkCol` matches an
    * affected key of `parentName` are affected; their `childKeyCol`
    * values seed any further hops. Edges must be listed parent-first
    * (topological order over the FK DAG). */
  case class FkEdge(childName: String, child: DataFrame, fkCol: String,
      childKeyCol: String, parentName: String)

  /** Right-to-be-forgotten cascade manifest: starting from seed subject
    * keys, follow FK edges breadth-first and emit, per table, the count
    * and an order-independent md5 checksum of the keys that must be
    * deleted — the reviewable plan a deletion job (and its auditor)
    * consumes, produced WITHOUT touching any table twice.
    *
    * Every hop is one `left_semi` join of the child on the parent's
    * affected key-set — semi-joins shuffle only the key columns, never
    * payloads, and the affected sets are proportional to the deletion
    * request, not the corpus, so at 100 TB each hop is a small-side
    * keyed probe. The checksum is Σ over affected rows of the first
    * 8 hex digits of md5(key) — order-independent integer algebra, so
    * the driver's oracle (or a second engine) can certify the manifest
    * covers EXACTLY the right rows, not just the right count. */
  def cascadeManifest(rootName: String, root: DataFrame, rootKeyCol: String,
      seeds: DataFrame, seedCol: String, edges: Seq[FkEdge]): DataFrame = {
    val rootKeys = root
      .join(seeds.select(col(seedCol).as(rootKeyCol)).distinct(),
        Seq(rootKeyCol), "left_semi")
      .select(col(rootKeyCol).as("__k"))
    val affected = edges.foldLeft(Seq(rootName -> rootKeys)) { (acc, e) =>
      val parentKeys = acc.collectFirst { case (n, d) if n == e.parentName => d }
        .getOrElse(throw new IllegalArgumentException(
          s"edge ${e.childName}: unknown parent ${e.parentName} (edges must be parent-first)"))
      val rows = e.child
        .join(parentKeys.select(col("__k").as(e.fkCol)).distinct(),
          Seq(e.fkCol), "left_semi")
      acc :+ (e.childName -> rows.select(col(e.childKeyCol).as("__k")))
    }
    affected.map { case (name, keys) =>
      keys.agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(expr(
          "CAST(conv(substring(md5(CAST(__k AS STRING)), 1, 8), 16, 10) AS BIGINT)")),
          lit(0L)).as("key_hash"))
        .select(lit(name).as("table_name"), col("n_rows"), col("key_hash"))
    }.reduce(_ unionByName _)
  }
}
