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

  /** Randomized-response (Warner 1965) privacy mechanism with a debiasing
    * certificate — the local-DP counting primitive: each row reports its
    * sensitive bit truthfully with probability 1/2, otherwise reports a
    * fair coin. P(report=b | true=b) = 3/4 vs P(report=b | true=¬b) = 1/4,
    * a 3:1 likelihood ratio — the classic ln 3 local ε, so NO individual
    * report reveals its true bit, yet group totals debias exactly:
    *
    *   E[yes] = (1/2)·t + (1/4)·n   ⟹   t̂ = (4·yes − n) / 2
    *
    * Coins derive from md5(seed:key) hex digits — deterministic, engine-
    * portable, and per-row independent in the Bernoulli-audit sense the
    * sketch certificates (q148) established; a REAL deployment would use a
    * non-replayable entropy source, which is exactly what an oracle-checked
    * suite cannot (and here deliberately does not) have. Output per group:
    * n, the true count (certificate side — the deployment would not emit
    * it), the reported count, the debiased estimate at ×scale fixed point,
    * and its absolute error. One map-side scan + one keyed aggregate; the
    * estimate's error concentrates as O(√n) so at corpus scale the noisy
    * census is tight while any single row stays deniable. The hash is
    * built with Column APIs (not string-interpolated SQL), so a seed
    * containing quotes or SQL metacharacters is just data. */
  def randomizedResponseCounts(df: DataFrame, groupCol: String,
      keyCol: String, bitCol: String, seed: String,
      scale: Int = 1000): DataFrame = {
    val h = md5(concat(lit(seed), lit(":"), col(keyCol).cast("string")))
    val c1 = conv(substring(h, 1, 1), 16, 10).cast("int")
    val c2 = conv(substring(h, 2, 1), 16, 10).cast("int") % 2
    val reported = when(c1 < 8, col(bitCol)).otherwise(c2)
    df.withColumn("__rep", reported)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(bitCol).cast("long")).as("yes_true"),
        sum(col("__rep").cast("long")).as("yes_reported"))
      .withColumn("est_fp",
        expr(s"CAST(((4 * yes_reported - n) * $scale) div 2 AS BIGINT)"))
      .withColumn("err_fp", abs(col("est_fp") - col("yes_true") * scale))
  }

  /** k-anonymity with a two-level local-generalization ladder — the
    * release-side privacy primitive next to [[randomizedResponseCounts]]
    * (collection-side): a quasi-identifier combination shared by fewer
    * than k rows re-identifies; the fix is not to drop those rows but to
    * GENERALIZE until each survives in a crowd of ≥ k:
    *
    *   level 0 — (qi1, qi2) combos with ≥ k rows release at full detail;
    *   level 1 — rows of failing combos regroup on qi1 alone ('*' for
    *             qi2); qi1 groups that now reach k release generalized;
    *   level 2 — the remainder is suppressed outright.
    *
    * Output: one row per ORIGINAL combo with its row count and assigned
    * level — the reviewable release plan (the same plan-as-data contract
    * as [[cascadeManifest]]). Two keyed aggregates + one keyed join; the
    * level-1 recount runs over failing rows only. Levels are monotone in
    * k and deterministic — no tie-breaking exists to get wrong. */
  def kAnonymityLevels(df: DataFrame, qi1: String, qi2: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val g0 = df.groupBy(col(qi1), col(qi2))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val failing = g0.filter(col("n_rows") < k)
    val g1 = failing.groupBy(col(qi1))
      .agg(sum("n_rows").as("__n1"))
    g0.join(g1, Seq(qi1), "left_outer")
      .withColumn("level",
        when(col("n_rows") >= k, 0)
          .when(col("__n1") >= k, 1)
          .otherwise(2))
      .select(col(qi1), col(qi2), col("n_rows"), col("level"))
  }
}
