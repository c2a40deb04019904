package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative expectation auditing — the "data contract" gate a pipeline
  * runs before promoting a snapshot: every rule is counted over the whole
  * table and the report says exactly how many rows break each contract.
  * Complements the drift monitors in DiffEngine (drift compares two
  * corpora; this checks ONE corpus against invariants).
  */
object DataQuality {

  private def finish(df: DataFrame): DataFrame =
    df.withColumn("pass", when(col("n_violations") === 0, 1L).otherwise(0L))

  /** Row-level expectations in ONE map-side-combined aggregate pass: each
    * rule is a boolean Column that must hold for every row; a NULL
    * predicate counts as a violation (an expectation that cannot be
    * evaluated is not met). Output one row per rule:
    * (rule_id, n_rows, n_violations, pass).
    *
    * Scale: adding a rule adds one conditional-sum slot to the same
    * single scan — 50 rules still read the table once, shuffle one
    * partial-agg row per task, and never widen the scan beyond the
    * columns the rules reference (column pruning sees through the
    * predicates). */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__v_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = rules.zipWithIndex.map { case ((id, _), i) =>
      struct(lit(id).as("rule_id"), col("__n").as("n_rows"),
        coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"))
    }
    finish(row.select(explode(array(structs: _*)).as("r")).select(col("r.*")))
  }

  /** Referential-integrity expectation: child rows whose key is absent
    * from the parent. One left join against the DISTINCT parent keys —
    * the build side dedupes before any shuffle, and a dimension-sized
    * parent broadcasts (Catalyst sizes it; at 100 TB the child streams
    * map-side past the broadcast key set). Same output shape as
    * [[audit]], union the rows into one report. */
  def refIntegrityRow(ruleId: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    finish(child.select(col(childKey).as("__ck"))
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("__pk").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_violations"))
      .select(lit(ruleId).as("rule_id"), col("n_rows"), col("n_violations")))
  }

  /** Functional-dependency audit A→B: a schema-inference profiling probe —
    * violations = Σ over distinct A of (distinct B under that A − 1), zero
    * iff A determines B. One two-key aggregate then a one-key aggregate —
    * both map-side combined, shuffles carry only (A, B) / (A, nB) pairs.
    * NULL A groups with NULL A (a null LHS still constrains its B set),
    * and a NULL B counts as a value via the `<NULL>` sentinel (A → {null,
    * 5} IS a violation — countDistinct alone would miss it).
    * Output one row: (rule_id, n_lhs, n_violations, holds). */
  def fdViolations(ruleId: String, df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs).as("__a"))
      .agg(countDistinct(coalesce(col(rhs).cast("string"), lit("<NULL>"))).as("__nb"))
      .agg(count(lit(1)).as("n_lhs"),
        coalesce(sum(col("__nb") - 1), lit(0L)).as("n_violations"))
      .select(lit(ruleId).as("rule_id"), col("n_lhs"), col("n_violations"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("holds"))

  /** Uniqueness expectation: violations = n_rows − n_distinct(key) —
    * zero iff the column is a key. One exact distinct aggregate (the
    * cost of certainty; see DiffEngine.inferKeys for the sketch-first
    * shortlist pattern when the candidate set is wide). */
  def uniqueRow(ruleId: String, df: DataFrame, keyCol: String): DataFrame =
    finish(df
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col(keyCol))).as("n_violations"))
      .select(lit(ruleId).as("rule_id"), col("n_rows"), col("n_violations")))
}
