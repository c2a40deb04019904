package graft.formatters

import graft.model._

/** Output renderers mirroring the reference's three formats
  * (cli.py:137-145 → formatters/{json_fmt,markdown_fmt,rich_fmt}.py).
  *
  * The JSON document is golden-comparable with the reference's: the result
  * dict shape of diff_flow.py:80-94/251-256 (meta.base/head/diff_schema/
  * tables, row_diff.sample_keys as key tuples) rendered like
  * json_fmt.py:28's `json.dumps(indent=2, sort_keys=True)`. Two documented
  * extensions appear ONLY when non-empty, so a run the reference could
  * produce matches byte-for-byte: `meta.where` (set by --where) and
  * `schema_diff.type_changes` (the reference ignores column types). */
object JsonFormatter {

  private sealed trait J
  private final case class JRaw(text: String) extends J // numbers / null
  private final case class JStr(s: String) extends J
  private final case class JArr(items: Seq[J]) extends J
  private final case class JObj(fields: Seq[(String, J)]) extends J

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** python json.dumps(indent=2, sort_keys=True) layout: one entry per
    * line, 2-space nesting, empty containers inline. */
  private def pretty(j: J, indent: Int): String = {
    val pad = "  " * indent
    val padIn = "  " * (indent + 1)
    j match {
      case JRaw(t) => t
      case JStr(s) => "\"" + esc(s) + "\""
      case JArr(Seq()) => "[]"
      case JArr(items) =>
        items.map(i => padIn + pretty(i, indent + 1)).mkString("[\n", ",\n", s"\n$pad]")
      case JObj(Seq()) => "{}"
      case JObj(fields) =>
        fields.sortBy(_._1).map { case (k, v) =>
          s"""$padIn"${esc(k)}": ${pretty(v, indent + 1)}"""
        }.mkString("{\n", ",\n", s"\n$pad}")
    }
  }

  private def jnum(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString + ".0" else d.toString

  /** Sample-key values come back stringified from the collect; re-render
    * values of integer-TYPED key columns as JSON numbers the way the
    * reference's native ints serialize (diff_flow.py:249 keeps raw driver
    * values). The decision comes from the source schema (RowDiff.integralKeys),
    * never from the string's shape — a string-typed key "007" keeps its
    * leading zeros as a JSON string. */
  private def keyValue(v: String, integral: Boolean): J =
    if (v == null) JRaw("null")
    else if (integral && scala.util.Try(v.toLong).isSuccess) JRaw(v.toLong.toString)
    else JStr(v)

  def render(r: DiffResult): String = {
    val sanitize = graft.engine.SnapshotStore.sanitize(_: String)
    // reference-deterministic defaults (diff_flow.py:68-71) when the caller
    // didn't thread actual snapshot names through
    val diffSchema = r.meta.diffSchema.getOrElse(
      "dbt_model_diff__" + sanitize(s"${r.meta.model}_${r.meta.baseRef}_${r.meta.headRef}"))
    val (baseTable, headTable) = r.meta.tables.getOrElse(
      (s"${sanitize(r.meta.model)}__base", s"${sanitize(r.meta.model)}__head"))
    val meta = JObj(Seq(
      "model" -> JStr(r.meta.model),
      "base" -> JStr(r.meta.baseRef),
      "head" -> JStr(r.meta.headRef),
      "mode" -> JStr(r.meta.mode),
      "keys" -> JArr(r.meta.keys.map(JStr.apply)),
      "diff_schema" -> JStr(diffSchema),
      "tables" -> JObj(Seq("base" -> JStr(baseTable), "head" -> JStr(headTable)))
    ) ++ r.meta.where.map(w => "where" -> (JStr(w): J)).toSeq)
    val rowcounts = JObj(Seq(
      "base" -> JRaw(r.rowcounts.base.toString),
      "head" -> JRaw(r.rowcounts.head.toString)
    ))
    val schemaDiff = JObj(Seq(
      "common" -> JArr(r.schemaDiff.common.map(JStr.apply)),
      "only_in_head" -> JArr(r.schemaDiff.onlyInHead.map(JStr.apply)),
      "only_in_base" -> JArr(r.schemaDiff.onlyInBase.map(JStr.apply))
    ) ++ (if (r.schemaDiff.typeChanges.isEmpty) Nil
          else Seq("type_changes" -> (JArr(r.schemaDiff.typeChanges.map { case (c, bt, ht) =>
            JObj(Seq("column" -> JStr(c), "base_type" -> JStr(bt), "head_type" -> JStr(ht)))
          }): J))))
    def side(p: SideProfile): J = JObj(Seq(
      "nulls" -> JRaw(p.nulls.toString),
      "distinct" -> JRaw(p.distinct.toString),
      "null_pct" -> JRaw(jnum(p.nullPct)),
      "uniq_pct" -> JRaw(jnum(p.uniqPct))
    ))
    val profiles = JObj(r.columnProfiles.map { cp =>
      cp.column -> (JObj(Seq("base" -> side(cp.base), "head" -> side(cp.head))): J)
    })
    val rowDiff: J = r.rowDiff.map { rd =>
      JObj(Seq(
        "added" -> JRaw(rd.added.toString),
        "removed" -> JRaw(rd.removed.toString),
        "changed" -> JRaw(rd.changed.toString),
        // key TUPLES in meta.keys order (diff_flow.py:249 `[list(r) for r in rows]`)
        "sample_keys" -> (JArr(rd.sampleChangedKeys.map(m =>
          JArr(r.meta.keys.map(k => keyValue(m.getOrElse(k, null), rd.integralKeys(k)))))): J)
      ) ++ (if (rd.keysNotUnique)
              // emitted ONLY when tripped — reference-shaped runs stay byte-identical
              Seq("keys_not_unique" -> (JRaw("true"): J))
            else Nil)): J
    }.getOrElse(JRaw("null"))
    pretty(JObj(Seq(
      "meta" -> meta,
      "rowcounts" -> rowcounts,
      "schema_diff" -> schemaDiff,
      "column_profile" -> profiles,
      "row_diff" -> rowDiff
    ) ++ r.changedByColumn.map(bc => "changed_by_column" -> (JObj(
      bc.map { case (c, n) => c -> (JRaw(n.toString): J) }): J)).toSeq
      ++ r.drift.map(ds => "drift" -> (JObj(ds.map { case (c, rows) =>
        c -> (JArr(rows.map(d => JObj(Seq(
          "value" -> (JStr(d.value): J),
          "base_n" -> JRaw(d.baseN.toString),
          "head_n" -> JRaw(d.headN.toString),
          "tv_contrib" -> JRaw(d.tv.toString))): J)): J)
      }): J)).toSeq
      ++ r.driftNumeric.map(ds => "drift_numeric" -> (JObj(ds.map { case (c, rows) =>
        c -> (JArr(rows.map(d => JObj(Seq(
          "bin" -> (JRaw(d.value): J), // bin index, a JSON number
          "base_n" -> JRaw(d.baseN.toString),
          "head_n" -> JRaw(d.headN.toString),
          "tv_contrib" -> JRaw(d.tv.toString))): J)): J)
      }): J)).toSeq), 0)
  }
}

/** Markdown rendition (formatters/markdown_fmt.py:15-119 section order). */
object MarkdownFormatter {

  private def table(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val h = header.mkString("| ", " | ", " |")
    val sep = header.map(_ => "---").mkString("| ", " | ", " |")
    (Seq(h, sep) ++ rows.map(_.mkString("| ", " | ", " |"))).mkString("\n")
  }

  def render(r: DiffResult): String = {
    val sb = new StringBuilder
    sb ++= s"# dbt-model-diff: ${r.meta.model}\n\n"
    sb ++= s"`${r.meta.baseRef}` → `${r.meta.headRef}` (mode: ${r.meta.mode})\n\n"
    sb ++= "## Row counts\n\n"
    sb ++= table(Seq("side", "rows"), Seq(
      Seq("base", r.rowcounts.base.toString),
      Seq("head", r.rowcounts.head.toString))) + "\n\n"
    sb ++= "## Schema diff\n\n"
    sb ++= table(Seq("status", "columns"), Seq(
      Seq("common", r.schemaDiff.common.mkString(", ")),
      Seq("only_in_head", r.schemaDiff.onlyInHead.mkString(", ")),
      Seq("only_in_base", r.schemaDiff.onlyInBase.mkString(", ")),
      Seq("type_changes", r.schemaDiff.typeChanges
        .map { case (c, bt, ht) => s"$c: $bt -> $ht" }.mkString(", ")))) + "\n\n"
    if (r.columnProfiles.nonEmpty) {
      sb ++= "## Column profiles\n\n"
      sb ++= table(
        Seq("column", "base_nulls", "head_nulls", "base_distinct", "head_distinct",
          "base_null_pct", "head_null_pct", "base_uniq_pct", "head_uniq_pct"),
        r.columnProfiles.map(cp => Seq(
          cp.column,
          cp.base.nulls.toString, cp.head.nulls.toString,
          cp.base.distinct.toString, cp.head.distinct.toString,
          f"${cp.base.nullPct}%.2f", f"${cp.head.nullPct}%.2f",
          f"${cp.base.uniqPct}%.2f", f"${cp.head.uniqPct}%.2f"))) + "\n\n"
    }
    r.rowDiff.foreach { rd =>
      sb ++= "## Row diff\n\n"
      sb ++= table(Seq("metric", "count"), Seq(
        Seq("added", rd.added.toString),
        Seq("removed", rd.removed.toString),
        Seq("changed", rd.changed.toString))) + "\n\n"
      if (rd.sampleChangedKeys.nonEmpty) {
        sb ++= "### Sample changed keys\n\n"
        val keys = r.meta.keys
        sb ++= table(keys, rd.sampleChangedKeys.map(m => keys.map(m.getOrElse(_, "")))) + "\n"
      }
    }
    r.drift.foreach { ds =>
      sb ++= "## Value drift\n\n"
      ds.foreach { case (c, rows) =>
        sb ++= s"### $c\n\n"
        sb ++= table(Seq("value", "base_n", "head_n", "tv_contrib"),
          rows.map(d => Seq(d.value, d.baseN.toString, d.headN.toString, d.tv.toString))) + "\n\n"
      }
    }
    r.driftNumeric.foreach { ds =>
      sb ++= "## Numeric drift (binned)\n\n"
      ds.foreach { case (c, rows) =>
        sb ++= s"### $c\n\n"
        sb ++= table(Seq("bin", "base_n", "head_n", "tv_contrib"),
          rows.map(d => Seq(d.value, d.baseN.toString, d.headN.toString, d.tv.toString))) + "\n\n"
      }
    }
    sb.result()
  }
}

/** Console rendition mirroring formatters/rich_fmt.py:58-141 section for
  * section: a fitted header panel, a Summary table, only-in-HEAD/BASE
  * lines, the 7-column profile table (same `%.1f` percent renderings), the
  * row-level diff table, and the sample-keys table — drawn with box
  * characters instead of the `rich` library (no ANSI state, stable in
  * logs/CI captures). `type_changes` prints as an extra line (documented
  * extension — the reference ignores column types). */
object ConsoleFormatter {

  private def panel(title: String, lines: Seq[String]): String = {
    val w = (title.length + 2) +: lines.map(_.length) reduce math.max
    val top = s"╭─ $title ${"─" * math.max(w - title.length - 2, 0)}╮"
    val body = lines.map(l => s"│ $l${" " * (w - l.length + 1)}│")
    (top +: body :+ s"╰${"─" * (w + 2)}╯").mkString("\n")
  }

  private def table(title: String, headers: Seq[String], rows: Seq[Seq[String]]): String = {
    val widths = headers.indices.map { i =>
      (headers(i).length +: rows.map(_(i).length)).max
    }
    def line(cells: Seq[String], pad: Char = ' '): String =
      cells.zip(widths).map { case (c, w) => c + pad.toString * (w - c.length) }
        .mkString("│ ", " │ ", " │")
    val sep = widths.map("─" * _).mkString("├─", "─┼─", "─┤")
    val top = widths.map("─" * _).mkString("┌─", "─┬─", "─┐")
    val bot = widths.map("─" * _).mkString("└─", "─┴─", "─┘")
    (Seq(title, top, line(headers), sep) ++ rows.map(line(_)) :+ bot).mkString("\n")
  }

  // ANSI styling mirroring the reference's rich_fmt colors (rich_fmt.py:
  // cyan panel, green/red/yellow add/remove/change). Applied to WHOLE lines
  // after layout so escape codes never perturb the box arithmetic; plain
  // output stays the default (tests, logs, CI captures, non-TTY pipes).
  private val Reset = "\u001b[0m"
  private def paint(code: String)(l: String) = s"\u001b[${code}m$l$Reset"
  private def colorize(s: String): String = {
    val endsNl = s.endsWith("\n")
    val out = s.linesIterator.map { l =>
      if (l.startsWith("│ Added rows")) paint("32")(l)                                // green
      else if (l.startsWith("│ Removed rows")) paint("31")(l)                         // red
      else if (l.startsWith("│ Changed rows")) paint("33")(l)                         // yellow
      else if (l.startsWith("╭") || l.startsWith("╰")) paint("36")(l)                 // meta panel border: cyan
      else if (l.startsWith("Type change:") || l.startsWith("Columns only")) paint("35")(l) // magenta
      else if (l.nonEmpty && !"╭╰┌├└│".contains(l.charAt(0))) paint("1")(l)           // table titles: bold
      else l
    }.mkString("\n")
    if (endsNl) out + "\n" else out
  }

  def render(r: DiffResult): String = render(r, color = false)

  def render(r: DiffResult, color: Boolean): String = {
    val plain = renderPlain(r)
    if (color) colorize(plain) else plain
  }

  private def renderPlain(r: DiffResult): String = {
    val sb = new StringBuilder
    val keys = if (r.meta.keys.nonEmpty) r.meta.keys.mkString(", ") else "(none)"
    val sanitize = graft.engine.SnapshotStore.sanitize(_: String)
    val diffSchema = r.meta.diffSchema.getOrElse(
      "dbt_model_diff__" + sanitize(s"${r.meta.model}_${r.meta.baseRef}_${r.meta.headRef}"))
    val (tb, th) = r.meta.tables.getOrElse(
      (s"${sanitize(r.meta.model)}__base", s"${sanitize(r.meta.model)}__head"))
    sb ++= panel("dbt-model-diff", Seq(
      r.meta.model,
      s"mode=${r.meta.mode}",
      s"base=${r.meta.baseRef}  head=${r.meta.headRef}",
      s"keys=$keys",
      s"diff_schema=$diffSchema",
      s"tables: $tb / $th") ++
      r.meta.where.map(w => s"where=$w").toSeq) += '\n'
    sb ++= table("Summary", Seq("Metric", "Value"), Seq(
      Seq("Base rowcount", r.rowcounts.base.toString),
      Seq("Head rowcount", r.rowcounts.head.toString))) += '\n'
    if (r.schemaDiff.onlyInHead.nonEmpty)
      sb ++= s"Columns only in HEAD: ${r.schemaDiff.onlyInHead.mkString(", ")}\n"
    if (r.schemaDiff.onlyInBase.nonEmpty)
      sb ++= s"Columns only in BASE: ${r.schemaDiff.onlyInBase.mkString(", ")}\n"
    r.schemaDiff.typeChanges.foreach { case (c, bt, ht) =>
      sb ++= s"Type change: $c $bt -> $ht\n"
    }
    if (r.columnProfiles.nonEmpty) {
      sb ++= table(s"Column profile (${r.columnProfiles.size} common columns)",
        Seq("Column", "Base null %", "Head null %", "Base distinct", "Head distinct",
          "Base uniq %", "Head uniq %"),
        r.columnProfiles.map(cp => Seq(
          cp.column,
          f"${cp.base.nullPct}%.1f", f"${cp.head.nullPct}%.1f",
          cp.base.distinct.toString, cp.head.distinct.toString,
          f"${cp.base.uniqPct}%.1f", f"${cp.head.uniqPct}%.1f"))) += '\n'
    }
    r.rowDiff.foreach { rd =>
      sb ++= table("Row-level diff", Seq("Metric", "Value"), Seq(
        Seq("Added rows", rd.added.toString),
        Seq("Removed rows", rd.removed.toString),
        Seq("Changed rows", rd.changed.toString))) += '\n'
      if (rd.sampleChangedKeys.nonEmpty)
        sb ++= table(s"Sample changed keys (limit ${rd.sampleChangedKeys.size})",
          r.meta.keys,
          rd.sampleChangedKeys.map(m => r.meta.keys.map(k => m.getOrElse(k, "")))) += '\n'
    }
    r.changedByColumn.foreach { bc =>
      sb ++= table("Changed rows by column", Seq("Column", "Rows changed"),
        bc.map { case (c, n) => Seq(c, n.toString) }) += '\n'
    }
    r.drift.foreach(_.foreach { case (c, rows) =>
      sb ++= table(s"Value drift: $c (top ${rows.size} by TV contribution)",
        Seq("Value", "Base n", "Head n", "TV contrib"),
        rows.map(d => Seq(d.value, d.baseN.toString, d.headN.toString, d.tv.toString))) += '\n'
    })
    r.driftNumeric.foreach(_.foreach { case (c, rows) =>
      sb ++= table(s"Numeric drift: $c (top ${rows.size} bins by TV contribution)",
        Seq("Bin", "Base n", "Head n", "TV contrib"),
        rows.map(d => Seq(d.value, d.baseN.toString, d.headN.toString, d.tv.toString))) += '\n'
    })
    sb.result()
  }
}
