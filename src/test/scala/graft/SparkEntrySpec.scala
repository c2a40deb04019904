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

  test("bench load guard: trips only on >2x same-input regressions above the jitter floor") {
    // 3x slowdown, same input -> re-measure
    assert(Bench.shouldRerun(3.0, 1.0, 1000L, 1000L))
    // within 2x -> normal variance, no re-run
    assert(!Bench.shouldRerun(1.9, 1.0, 1000L, 1000L))
    // micro-query: 5x but only +40ms — JIT/GC jitter, not load
    assert(!Bench.shouldRerun(0.05, 0.01, 1000L, 1000L))
    // input grew 50%: a real workload change to report, never re-measured away
    assert(!Bench.shouldRerun(3.0, 1.0, 1500L, 1000L))
    // input within the 1% tolerance still counts as unchanged
    assert(Bench.shouldRerun(3.0, 1.0, 1009L, 1000L))
    assert(!Bench.shouldRerun(3.0, 1.0, 1011L, 1000L))
  }

  test("bench guard prior is the best known min, not the last write (de-ratchet, r12)") {
    // The r11 ratchet: q233 published 1.222s = 2.16x its r10 committed min
    // (0.565s) un-rerun, because the intermediate working-tree BENCHOUT it
    // was compared against was itself inflated (1.1s-ish). With bestPrior,
    // the committed best (bench_best.json) keeps the floor at the clean
    // minimum and the same fresh 1.222s DOES trip the guard.
    val best = Some((0.565, 2895050L)) // clean committed minimum
    val doctoredIntermediate = Some((1.1, 2895050L)) // load-inflated last write
    val merged = Bench.bestPrior(best, doctoredIntermediate)
    assert(merged.contains((0.565, 2895050L)))
    assert(Bench.shouldRerun(1.222, merged.get._1, 2895050L, merged.get._2),
      "2.16x over the clean floor must re-measure even when the last write was inflated")
    // the old behavior (prior = last write alone) would NOT have tripped
    assert(!Bench.shouldRerun(1.222, doctoredIntermediate.get._1, 2895050L, 2895050L))
    // a LOWER fresh min always lowers the floor (min only trusts downward)
    assert(Bench.bestPrior(Some((0.5, 1000L)), Some((0.4, 1000L))).contains((0.4, 1000L)))
    assert(Bench.bestPrior(Some((0.4, 1000L)), Some((0.5, 1000L))).contains((0.4, 1000L)))
    // input changed >1%: the newer entry wins outright — an old min for
    // different work must not suppress (or trigger) re-runs
    assert(Bench.bestPrior(Some((0.4, 1000L)), Some((0.9, 2000L))).contains((0.9, 2000L)))
  }

  test("stale-floor valve: three consecutive out-of-window misses rebase, any hit resets") {
    // the q05 shape: a deliberate operator change leaves the old floor
    // permanently unreachable — sweep 1 and 2 count misses, sweep 3 rebases
    assert(Bench.missUpdate(0, Some(true)) == (1, false))
    assert(Bench.missUpdate(1, Some(true)) == (2, false))
    assert(Bench.missUpdate(2, Some(true)) == (0, true)) // rebase now
    // a rerun that got back under the trigger is a load story, not a stale
    // floor: counter resets however high it was
    assert(Bench.missUpdate(2, Some(false)) == (0, false))
    // the guard never fired this sweep (fresh min under threshold): reset
    assert(Bench.missUpdate(2, None) == (0, false))
    assert(Bench.missUpdate(0, None) == (0, false))
    // one-sided cases pass through
    assert(Bench.bestPrior(None, Some((0.7, 10L))).contains((0.7, 10L)))
    assert(Bench.bestPrior(Some((0.7, 10L)), None).contains((0.7, 10L)))
    assert(Bench.bestPrior(None, None).isEmpty)
  }

  test("hot flag: sub-trigger drift over the committed floor is marked in the record (r13)") {
    // the r12 blind spot: q257 published min 3.44 vs clean floor 1.86
    // (1.85x, spread 2.25) — under the 2x rerun trigger, so no `reran`
    // entry, and BENCHOUT alone read as a regression the floors disprove
    assert(Bench.hotEntry(3.4359, 2.2509, Some(1.8600)))
    // q197's shape: 0.30 vs floor 0.18 = 1.67x with clean spread
    assert(Bench.hotEntry(0.30, 1.2, Some(0.18)))
    // clean entry at its floor: not hot
    assert(!Bench.hotEntry(1.90, 1.3, Some(1.86)))
    // 1.5x band needs >0.1s absolute excess — micro-query jitter stays cold
    assert(!Bench.hotEntry(0.09, 1.4, Some(0.05)))
    // spread alone marks heat even with no committed floor (first round)
    assert(Bench.hotEntry(1.0, 2.5, None))
    assert(!Bench.hotEntry(1.0, 1.9, None))
  }

  test("rebase history accumulates in bench_best.json, never overwritten (r13)") {
    val e1 = """{"old_floor":0.36,"new_floor":1.01,"commit":"1a73220"}"""
    // numeric literals in canonical (shortest round-trip) form: the
    // JValue-level append re-renders numbers, so 2.20 would normalize
    // to 2.2 — values, not fixed-point rendering, are the history
    val e2 = """{"old_floor":1.01,"new_floor":2.2,"commit":"deadbee"}"""
    // first rebase opens the array
    assert(Bench.appendRebase(None, Some(e1)).contains(s"[$e1]"))
    // second rebase APPENDS — the prior entry survives (the ADVICE gap:
    // BENCHOUT's `rebased` field lives one round; the history must not)
    assert(Bench.appendRebase(Some(s"[$e1]"), Some(e2)).contains(s"[$e1,$e2]"))
    // no rebase this sweep: history carried verbatim
    assert(Bench.appendRebase(Some(s"[$e1]"), None).contains(s"[$e1]"))
    assert(Bench.appendRebase(None, None).isEmpty)
    // a degenerate empty array never produces malformed JSON
    assert(Bench.appendRebase(Some("[]"), Some(e1)).contains(s"[$e1]"))
    assert(Bench.appendRebase(Some("[]"), None).isEmpty)
    // r13 ADVICE: a hand-edited prior with stray whitespace must append
    // cleanly (the old closing-bracket string surgery emitted "...} ,{...]"
    // -level garbage and the NEXT round's whole-file parse then dropped
    // every floor) — JValue-level append normalizes it
    assert(Bench.appendRebase(Some(s"[ $e1 ]\n"), Some(e2)).contains(s"[$e1,$e2]"))
    // a prior that isn't an array is corruption: throw to the caller's
    // per-file catch rather than silently re-modeling the history
    assertThrows[Exception](Bench.appendRebase(Some("""{"not":"an array"}"""), Some(e1)))
    // r14 advice: rebasesField contains that corruption to ONE query —
    // the bad history is quarantined verbatim (escaped JSON string) and a
    // fresh array starts from this sweep's entry, so the rest of
    // bench_best.json still refreshes instead of aborting the whole write
    val qf = Bench.rebasesField(Some("""{"not":"an array"}"""), Some(e1))
    assert(qf.contains(s""","rebases":[$e1]"""))
    assert(qf.contains(""","rebases_corrupt":"{\"not\":\"an array\"}""""))
    assert(org.json4s.jackson.JsonMethods.parse(s"{${qf.drop(1)}}") != org.json4s.JNothing)
    // unparseable garbage (not even JSON) quarantines the same way
    val qg = Bench.rebasesField(Some("not json at all"), None)
    assert(qg == ""","rebases_corrupt":"not json at all"""")
    // control chars in a torn-write prior are \\u-escaped so the
    // quarantine string itself stays legal JSON (r15 review)
    val torn = "torn write" + "\n" + "here"
    val qc = Bench.rebasesField(Some(torn), None)
    assert(qc == ""","rebases_corrupt":"torn write""" + "\\" + "u000ahere\"")
    assert(org.json4s.jackson.JsonMethods.parse(s"{${qc.drop(1)}}") != org.json4s.JNothing)
    // clean histories pass through identically to appendRebase
    assert(Bench.rebasesField(Some(s"[$e1]"), Some(e2)) == s""","rebases":[$e1,$e2]""")
    assert(Bench.rebasesField(None, None) == "")
  }

  test("rehearsal blocks re-run when an entry drifts >2x its best-known floor (r12)") {
    // The implausibility bar alone let q138 publish 32.0s at 100x while an
    // isolated min-of-3 measured 4.76s (ratio 27 < the 150 bar). With a
    // committed floor the same entry trips the drift guard.
    val best = Map("sf10:q138_trained_langid" -> 4.7623)
    assert(Bench.rehearsalDrifted(Seq("q138_trained_langid" -> 32.05), "sf10", best)
      == Seq("q138_trained_langid"))
    // honest variance below 2x floor: clean
    assert(Bench.rehearsalDrifted(Seq("q138_trained_langid" -> 8.4), "sf10", best).isEmpty)
    // sub-second jitter never re-runs a four-minute block (1s absolute floor)
    assert(Bench.rehearsalDrifted(Seq("q" -> 0.9), "sf10", Map("sf10:q" -> 0.3)).isEmpty)
    assert(Bench.rehearsalDrifted(Seq("q" -> 1.4), "sf10", Map("sf10:q" -> 0.3))
      == Seq("q"))
    // no floor (first round for a new flagship): nothing to compare
    assert(Bench.rehearsalDrifted(Seq("q_new" -> 99.0), "sf10", best).isEmpty)
    // keys are block-scoped: an sf1 floor must not judge an sf10 entry
    assert(Bench.rehearsalDrifted(Seq("q138_trained_langid" -> 32.05), "sf1", best).isEmpty)
  }

  test("a tripped rehearsal block is NEVER published clean, even when its re-run fails (r13)") {
    val fmt = (d: Double) => f"$d%.4f"
    // untripped block: no annotation
    assert(Bench.rehearsalRerunField(tripped = false, 12.0, implausible = false,
      adjacent = false, fmt) == "")
    // tripped + deferred re-run completed
    val ok = Bench.rehearsalRerunField(tripped = true, 12.5, implausible = true,
      adjacent = false, fmt)
    assert(ok.contains("\"reran\":true") && ok.contains("\"rerun_reason\":\"implausible\"")
      && ok.contains("\"rerun_deferred\":true") && ok.contains("\"wall_rerun\":12.5000"))
    // tripped, last-block-only case: adjacency stated, not a later-window claim
    assert(Bench.rehearsalRerunField(tripped = true, 12.5, implausible = false,
      adjacent = true, fmt).contains("\"rerun_adjacent\":true"))
    // tripped but the re-run THREW (wallRerun < 0): the trigger must still
    // surface — the old code emitted nothing and the contaminated first
    // pass read as a clean block
    val failed = Bench.rehearsalRerunField(tripped = true, -1.0, implausible = false,
      adjacent = false, fmt)
    assert(failed.contains("\"rerun_failed\":true") && failed.contains("\"reran\":false")
      && failed.contains("\"rerun_reason\":\"best-min-drift\""))
  }

  test("simulated timeout: the record parses at EVERY incremental flush state (r17 #1)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // the exact fragments Bench assembles: main-sweep base (no braces),
    // rehearsal blocks each starting with ','
    val base = """"metric":"total","value":251.6,"best_total":193.85,"unit":"sec","reps":3,"queries":{"q01":0.1},"detail":{"q01":{"min":0.1,"p50":0.12,"spread":1.2,"in_rows":100,"in_mb":0.5,"shuf_mb":0.0}},"noisy":[],"reran":{},"rebased":{},"load":{"start":"0.4 0.5 0.6","end":"26.0 14.0 8.0","ext_cpu_cores":0.3},"fixtures":{"lineitem":60175}"""
    val sf1 = ""","sf1":{"copies":10,"wall":60.2,"rerun_pending":true,"load":{"start":"1.0 1.0 1.0","end":"9.0 4.0 2.0"},"queries":{"q01":{"sf01":0.1,"sf1":0.5,"ratio":5.0}}}"""
    val sf10 = ""","sf10":{"copies":100,"wall":240.0,"reran":false,"rerun_skipped":"budget","rerun_reason":"best-min-drift","load":{"start":"1.0 1.0 1.0","end":"9.0 4.0 2.0"},"queries":{"q01":{"sf01":0.1,"sf10":1.5,"ratio":15.0}}}"""
    // BENCH_r16 failure mode: a harness timeout at ANY instant must leave
    // a parseable record with whatever blocks completed — cut after the
    // main sweep, after one rehearsal, and after both
    for (blocks <- Seq(Nil, Seq(sf1), Seq(sf1, sf10))) {
      val rec = Bench.assembleRecord(base, blocks, "/root/testdata/sf0.1")
      val parsed = JsonMethods.parse(rec)
      assert(parsed \ "metric" == JString("total"), s"cut at $blocks must parse")
      assert(parsed \ "sf" == JString("/root/testdata/sf0.1"))
    }
    // the two-block record carries both rehearsal states: the pending
    // marker (provisional flush of a tripped block) and the budget skip
    val both = JsonMethods.parse(Bench.assembleRecord(base, Seq(sf1, sf10), "sf"))
    assert(both \ "sf1" \ "rerun_pending" == JBool(true))
    assert(both \ "sf10" \ "rerun_skipped" == JString("budget"))
  }

  test("sub-second floor hygiene: noisy <0.5s-floor queries escalate to 5 reps (r18 #4)") {
    // the r17 exceedance class: floor 0.19, both opening reps ~0.43
    assert(Bench.repTarget(3, Some(0.19), 0.43, 0.41) == 5)
    // clean sub-second query: plain count (and repCut will have cut it anyway)
    assert(Bench.repTarget(3, Some(0.19), 0.2, 0.21) == 3)
    // one fast rep is already evidence the floor is reachable: no escalation
    assert(Bench.repTarget(3, Some(0.19), 0.43, 0.2) == 3)
    // floors >= 0.5s stay on the plain count — the 2x rerun guard owns them
    assert(Bench.repTarget(3, Some(0.8), 2.0, 2.0) == 3)
    // no floor (new query): never escalate
    assert(Bench.repTarget(3, None, 0.43, 0.41) == 3)
    // an explicit higher rep count is never reduced
    assert(Bench.repTarget(7, Some(0.19), 0.43, 0.41) == 7)
  }

  test("clean-priors embed: flagged blocks carry committed decade floors with provenance (r18 #3)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    // no committed floors: the field is ABSENT, not empty-object noise
    assert(Bench.cleanPriorsField(Nil, fmt) == "")
    val cp = Bench.cleanPriorsField(Seq(
      ("q32_dedup_minhash_lsh", 3.1912, "3d76404", "2026-08-12T09:00:00Z"),
      ("q11_diff_summary", 0.842, "3d76404", "2026-08-12T09:00:00Z")), fmt)
    // embeds into a flagged block and the whole record still parses; the
    // judge reads clean floors + commit + ts from BENCH_rN.json alone
    val base = """"metric":"total","value":1.0,"best_total":1.0,"unit":"sec","reps":3,"queries":{},"detail":{},"noisy":[],"reran":{},"rebased":{},"load":{"start":"","end":""},"fixtures":{}"""
    val sf1 = s""","sf1":{"copies":10,"wall":60.2,"reran":false,"rerun_skipped":"budget","rerun_reason":"implausible"$cp,"load":{"start":"","end":""},"queries":{}}"""
    val rec = JsonMethods.parse(Bench.assembleRecord(base, Seq(sf1), "sf"))
    assert(rec \ "sf1" \ "clean_priors" \ "q32_dedup_minhash_lsh" \ "floor" == JDouble(3.1912))
    assert(rec \ "sf1" \ "clean_priors" \ "q11_diff_summary" \ "commit" == JString("3d76404"))
    assert(rec \ "sf1" \ "clean_priors" \ "q11_diff_summary" \ "ts" == JString("2026-08-12T09:00:00Z"))
  }

  test("rep cut: only a committed floor with both reps within 1.5x skips rep 3 (r17 #1c)") {
    // clean query at its floor: cut
    assert(Bench.repCut(Some(1.0), 1.2, 1.1))
    // boundary: exactly 1.5x still cuts
    assert(Bench.repCut(Some(1.0), 1.5, 1.5))
    // either rep over 1.5x: full reps (the guard/hot machinery needs them)
    assert(!Bench.repCut(Some(1.0), 1.51, 1.0))
    assert(!Bench.repCut(Some(1.0), 1.0, 1.51))
    // no floor (new query or changed input): never cut — first
    // measurements of new work keep the full rep count
    assert(!Bench.repCut(None, 0.1, 0.1))
  }

  test("deferred re-run budget: skip past the wall, record says so (r17 #1b)") {
    // elapsed 300s + block 240s fits a 600s budget
    assert(Bench.rerunFitsBudget(300.0, 240.0, 600.0))
    // elapsed 400s + block 240s does not
    assert(!Bench.rerunFitsBudget(400.0, 240.0, 600.0))
    // boundary: exactly on budget still runs
    assert(Bench.rerunFitsBudget(360.0, 240.0, 600.0))
    // the skipped annotation: tripped block, no rerun numbers, explicit
    // budget marker — never publishable as a clean block
    val fmt = (d: Double) => f"$d%.4f"
    val skipped = Bench.rehearsalRerunField(tripped = true, -1.0,
      implausible = true, adjacent = false, fmt, skippedBudget = true)
    assert(skipped.contains("\"rerun_skipped\":\"budget\"")
      && skipped.contains("\"reran\":false")
      && skipped.contains("\"rerun_reason\":\"implausible\""))
    assert(!skipped.contains("rerun_failed"))
  }

  test("rehearsal blocks re-run when a ratio is physically implausible (r12)") {
    // r11's contaminated sf1 block: q88 ratio 43.4x for 10 copies -> trip
    assert(Bench.rehearsalContaminated(Seq(5.2, 43.4, 21.0), 10))
    // r11's honest sf10 block: 5-18x for 100 copies -> clean
    assert(!Bench.rehearsalContaminated(Seq(18.4, 16.8, 7.5, 7.4, 5.1, 9.9), 100))
    // boundary: exactly 1.5x copies is still plausible (linear + overhead)
    assert(!Bench.rehearsalContaminated(Seq(15.0), 10))
    assert(Bench.rehearsalContaminated(Seq(15.01), 10))
    assert(!Bench.rehearsalContaminated(Nil, 10))
  }

  test("q329: a NULL-lang document counts as non-English (group 0), like the oracle's CASE") {
    // ADVICE r9: `(lang === 'en').cast(long)` sent NULL lang to NULL —
    // the row silently left BOTH groups while DuckDB's CASE WHEN bucketed
    // it into group 0. Fixture: en "a b c" (g=1,v=3), de "a b" (g=0,v=2),
    // NULL-lang "a b c d" (g=0,v=4). With the null row in group 0:
    // n1=1, n0=2, U1x2 = 1*(2*1+0) at level 3 = 2, auc = 2e6/(2*1*2).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q329fix").toString
    Seq((1L, "a b c", Option("en")), (2L, "a b", Option("de")),
      (3L, "a b c d", None: Option[String]))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q329_mannwhitney_auc")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 1L, "en group")
    assert(r.getAs[Long]("n0") == 2L, "NULL lang must land in group 0, not vanish")
    assert(r.getAs[Long]("u1_x2") == 2L)
    assert(r.getAs[Long]("auc_fp") == 500000L)
  }
}
