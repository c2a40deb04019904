package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage extraction from the ANALYZED Catalyst plan — the
  * governance question "which source columns can influence this output
  * column" answered from the plan itself, before anything executes. The
  * reference diffs tables; a warehouse migration also has to audit what
  * feeds each published column (PII reachability, impact analysis for a
  * source-schema change), and on Spark that answer is already sitting in
  * the logical plan's attribute graph — this walks it rather than parsing
  * SQL text.
  *
  * The walk is a bottom-up fold mapping every intermediate attribute
  * (by `ExprId` — names alias and collide, ids don't) to its set of leaf
  * `(table, column)` sources:
  *
  *   - `LogicalRelation` (file scans): each output column is its own leaf;
  *     the table name is the scan's root-path basename.
  *   - `Project` / `Aggregate` / `Window` / `Generate`: each defined
  *     attribute unions the sources of every attribute its expression
  *     tree references (transitively through the child env). An output
  *     built from no input columns at all (e.g. `count(1)`, literals)
  *     resolves to the empty set and is reported against `(literal)`.
  *   - `Union`: positional merge — output column i unions child i-th
  *     outputs across all children.
  *   - joins, filters, sorts, limits, distinct, hints, subquery aliases:
  *     pass attribute environments through untouched (filters AFFECT rows,
  *     not column derivation — this is data lineage, not provenance of
  *     row selection).
  *
  * This is deliberately an analysis-time tool: zero jobs run, cost is the
  * plan size. Conservative by construction — unhandled node types union
  * their children's environments, so lineage can over-approximate but
  * never silently drops a known source. */
object Lineage {

  type Env = Map[ExprId, Set[(String, String)]]

  private def tableNameOf(rel: LogicalRelation): String = {
    val viaCatalog = rel.catalogTable.map(_.identifier.table)
    val viaPath = rel.relation match {
      case hfs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        hfs.location.rootPaths.headOption.map(_.getName)
      case _ => None
    }
    viaCatalog.orElse(viaPath).getOrElse("(unknown)")
      .replaceAll("\\.parquet$|\\.csv$|\\.json$", "")
  }

  private def sourcesOf(ne: NamedExpression, env: Env): Set[(String, String)] =
    ne match {
      case a: Attribute => env.getOrElse(a.exprId, Set.empty)
      case other =>
        other.references.toSeq
          .flatMap(a => env.getOrElse(a.exprId, Set.empty)).toSet
    }

  private def envOf(plan: LogicalPlan): Env = plan match {
    case rel: LogicalRelation =>
      val table = tableNameOf(rel)
      rel.output.map(a => a.exprId -> Set(table -> a.name)).toMap
    case lr: LocalRelation =>
      lr.output.map(a => a.exprId -> Set("(inline)" -> a.name)).toMap
    case Project(projectList, child) =>
      val env = envOf(child)
      env ++ projectList.map(ne => ne.exprId -> sourcesOf(ne, env))
    case a: Aggregate =>
      val env = envOf(a.child)
      env ++ a.aggregateExpressions.map(ne => ne.exprId -> sourcesOf(ne, env))
    case w: Window =>
      val env = envOf(w.child)
      env ++ w.windowExpressions.map(ne => ne.exprId -> sourcesOf(ne, env))
    case g: Generate =>
      val env = envOf(g.child)
      val gen = g.generator.references.toSeq
        .flatMap(a => env.getOrElse(a.exprId, Set.empty[(String, String)])).toSet
      env ++ g.generatorOutput.map(a => a.exprId -> gen)
    case u: Union =>
      val childEnvs = u.children.map(envOf)
      val merged = u.output.zipWithIndex.map { case (out, i) =>
        val srcs = u.children.zip(childEnvs).flatMap { case (c, e) =>
          e.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
        }.toSet
        out.exprId -> srcs
      }
      childEnvs.foldLeft(Map.empty: Env)(_ ++ _) ++ merged
    case other =>
      other.children.map(envOf).foldLeft(Map.empty: Env)(_ ++ _)
  }

  /** Lineage triples `(out_column, src_table, src_column)` for every output
    * column of `df`, one row per contributing source; outputs with no
    * column sources report a single `((literal), (literal))` row. */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val env = envOf(plan)
    plan.output.flatMap { a =>
      val srcs = env.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "(literal)", "(literal)"))
      else srcs.toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }
  }

  /** The lineage report as a DataFrame (for the driver contract). */
  def columnLineageDf(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    columnLineage(df).toDF("out_column", "src_table", "src_column")
  }
}
