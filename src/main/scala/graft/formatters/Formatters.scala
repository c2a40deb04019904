package graft.formatters

import graft.model._

/** Output renderers mirroring the reference's three formats
  * (cli.py:137-145 → formatters/{json_fmt,markdown_fmt,rich_fmt}.py).
  * JSON keys match formatters/json_fmt.py's document shape (sorted keys,
  * json_fmt.py:28) so golden-JSON parity is testable. */
object JsonFormatter {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def js(s: String): String = "\"" + esc(s) + "\""
  private def jnum(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString + ".0" else d.toString
  private def jarr(xs: Seq[String]): String = xs.mkString("[", ", ", "]")
  private def jobj(fields: Seq[(String, String)]): String =
    fields.sortBy(_._1).map { case (k, v) => s"${js(k)}: $v" }.mkString("{", ", ", "}")

  def render(r: DiffResult): String = {
    val meta = jobj(Seq(
      "model" -> js(r.meta.model),
      "base_ref" -> js(r.meta.baseRef),
      "head_ref" -> js(r.meta.headRef),
      "mode" -> js(r.meta.mode),
      "where" -> r.meta.where.map(js).getOrElse("null"),
      "keys" -> jarr(r.meta.keys.map(js))
    ))
    val rowcounts = jobj(Seq(
      "base" -> r.rowcounts.base.toString,
      "head" -> r.rowcounts.head.toString
    ))
    val schemaDiff = jobj(Seq(
      "common" -> jarr(r.schemaDiff.common.map(js)),
      "only_in_head" -> jarr(r.schemaDiff.onlyInHead.map(js)),
      "only_in_base" -> jarr(r.schemaDiff.onlyInBase.map(js)),
      "type_changes" -> jarr(r.schemaDiff.typeChanges.map { case (c, bt, ht) =>
        jobj(Seq("column" -> js(c), "base_type" -> js(bt), "head_type" -> js(ht)))
      })
    ))
    def side(p: SideProfile): String = jobj(Seq(
      "nulls" -> p.nulls.toString,
      "distinct" -> p.distinct.toString,
      "null_pct" -> jnum(p.nullPct),
      "uniq_pct" -> jnum(p.uniqPct)
    ))
    val profiles = jobj(r.columnProfiles.map { cp =>
      cp.column -> jobj(Seq("base" -> side(cp.base), "head" -> side(cp.head)))
    })
    val rowDiff = r.rowDiff.map { rd =>
      jobj(Seq(
        "added" -> rd.added.toString,
        "removed" -> rd.removed.toString,
        "changed" -> rd.changed.toString,
        "sample_changed_keys" -> jarr(rd.sampleChangedKeys.map(m =>
          jobj(m.toSeq.map { case (k, v) => k -> js(v) })))
      ))
    }.getOrElse("null")
    jobj(Seq(
      "meta" -> meta,
      "rowcounts" -> rowcounts,
      "schema_diff" -> schemaDiff,
      "column_profile" -> profiles,
      "row_diff" -> rowDiff
    ))
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
    sb.result()
  }
}

/** Plain-text console rendition of formatters/rich_fmt.py's sections. */
object ConsoleFormatter {
  def render(r: DiffResult): String = {
    val sb = new StringBuilder
    sb ++= s"== dbt-model-diff: ${r.meta.model} (${r.meta.baseRef} -> ${r.meta.headRef}, ${r.meta.mode}) ==\n"
    sb ++= s"rows: base=${r.rowcounts.base} head=${r.rowcounts.head}\n"
    sb ++= s"schema: common=${r.schemaDiff.common.size} +head=${r.schemaDiff.onlyInHead.mkString(",")} +base=${r.schemaDiff.onlyInBase.mkString(",")}\n"
    r.schemaDiff.typeChanges.foreach { case (c, bt, ht) =>
      sb ++= s"  type change: $c $bt -> $ht\n"
    }
    r.columnProfiles.foreach { cp =>
      sb ++= f"  ${cp.column}%-24s nulls ${cp.base.nulls}/${cp.head.nulls}  distinct ${cp.base.distinct}/${cp.head.distinct}\n"
    }
    r.rowDiff.foreach { rd =>
      sb ++= s"row_diff: added=${rd.added} removed=${rd.removed} changed=${rd.changed}\n"
      if (rd.sampleChangedKeys.nonEmpty)
        sb ++= s"sample_changed_keys: ${rd.sampleChangedKeys.map(_.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("(", ",", ")")).mkString(" ")}\n"
    }
    sb.result()
  }
}
