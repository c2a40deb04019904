package graft.model

/** Result-plane case classes mirroring the reference's result document shape
  * (reference: dbt-model-diff/dbt_model_diff/core/diff_flow.py:80-94).
  *
  * The reference builds a nested dict `meta / rowcounts / schema_diff /
  * column_profile / row_diff`; we mirror it as a typed tree so formatters and
  * tests are compile-checked. JSON field names emitted by
  * [[graft.formatters.JsonFormatter]] match the reference's exactly.
  */
final case class DiffMeta(
    model: String,
    baseRef: String,
    headRef: String,
    mode: String, // "FULL_DIFF" | "STATS_ONLY" (diff_flow.py:85)
    where: Option[String],
    keys: Seq[String],
    // Snapshot namespace + table names, mirroring meta.diff_schema/tables
    // (diff_flow.py:87-88). None ⇒ formatter derives the reference's
    // deterministic names from model/base/head.
    diffSchema: Option[String] = None,
    tables: Option[(String, String)] = None
)

final case class RowCounts(base: Long, head: Long)

/** Name-only, order-preserving column-set diff (diff_flow.py:139-150).
  * `common` preserves HEAD column order — profiles and row hashes iterate in
  * this order (diff_flow.py:137-143,181). `typeChanges` is a Spark-side
  * improvement over the reference (which ignores types — SURVEY §1.2):
  * common columns whose DataType differs, as (column, baseType, headType). */
final case class SchemaDiff(
    common: Seq[String],
    onlyInHead: Seq[String],
    onlyInBase: Seq[String],
    typeChanges: Seq[(String, String, String)] = Nil
)

/** Per-side column stats (diff_flow.py:156-175): null count, distinct count,
  * null% and uniqueness% derived from the side's row count
  * (core/util.py:35-37 `pct`). */
final case class SideProfile(
    nulls: Long,
    distinct: Long,
    nullPct: Double,
    uniqPct: Double
)

final case class ColumnProfile(
    column: String,
    base: SideProfile,
    head: SideProfile
)

/** Key-based row-level diff (diff_flow.py:180-256). `sampleChangedKeys` is a
  * bounded sample of key tuples whose non-key hash changed (diff_flow.py:227-249);
  * values are stringified at render time like the reference. `integralKeys`
  * carries which key COLUMNS are integer-typed in the source schema, so the
  * JSON formatter can serialize those samples as JSON numbers (matching the
  * reference's native-int serialization) without guessing from the string —
  * a genuinely string-typed key like "007" must stay a JSON string. */
final case class RowDiff(
    added: Long,
    removed: Long,
    changed: Long,
    sampleChangedKeys: Seq[Map[String, String]],
    integralKeys: Set[String] = Set.empty,
    // True when the full-outer join saw more rows than distinct key tuples —
    // the key columns are NOT a primary key, so added/removed/changed and the
    // sample come from a join-multiplied frame and over-count. Rowcounts fall
    // back to exact per-side counts in that case; this flag lets consumers
    // (and the console warning in Main) know the row-diff numbers are suspect.
    keysNotUnique: Boolean = false
)

/** One drifted value's exact counts: `tv` is the integer cross-multiplied
  * total-variation contribution |base_n·Nh − head_n·Nb| (DiffEngine
  * categoricalDrift). Values are stringified for rendering. */
final case class DriftRow(value: String, baseN: Long, headN: Long, tv: Long)

final case class DiffResult(
    meta: DiffMeta,
    rowcounts: RowCounts,
    schemaDiff: SchemaDiff,
    columnProfiles: Seq[ColumnProfile],
    rowDiff: Option[RowDiff],
    // Engine extension (absent from the reference document): per-column
    // changed-row counts among key-matched rows, populated by --by-column.
    // JSON emits `changed_by_column` only when present, preserving
    // byte-parity for reference-shaped runs.
    changedByColumn: Option[Seq[(String, Long)]] = None,
    // Engine extension: per-column value drift (--drift col1,col2) — the
    // top TV-contributing values per requested column. Emitted only when
    // requested, same parity discipline as changedByColumn.
    drift: Option[Seq[(String, Seq[DriftRow])]] = None,
    // Engine extension: binned numeric drift (--drift-numeric col1,col2).
    // DriftRow.value carries the bin index (equal-width bins over the
    // combined min..max range — DiffEngine.numericDrift). Emitted only when
    // requested.
    driftNumeric: Option[Seq[(String, Seq[DriftRow])]] = None
)
