#!/usr/bin/env bash
# Round close-out (VERDICT r12 missing #1; r16 VERDICT #3 rework): the
# judge audits the repo AFTER the build session ends. This script is the
# session's LAST action and now owns the whole closing measurement
# workflow, because four consecutive rounds published load-contaminated
# bench headlines — a workflow bug, not bad luck:
#
#   1. LOADAVG GATE: wait (up to $LOAD_WAIT_MAX s, default 1800) for the
#      1-min load to drop below $LOAD_MAX (default 8 on 32 cpus) before
#      any timing runs; refuse rather than publish a dirty headline
#      (FORCE_LOAD=1 overrides, recorded in the bench's own load field).
#   2. BENCH SWEEP: the full sf0.1 sweep (writes BENCHOUT.json +
#      bench_best.json). SKIP_BENCH=1 skips (e.g. when a clean sweep
#      already ran this session).
#   3. LEAK SCAN: refreshed at the exact state being committed.
#   4. COMMIT the measurement records — so the parity gates below run
#      from a COMMITTED tree and their records attribute cleanly.
#   5. PARITY GATES from the clean tree: sf1 (10x) and sf10 (100x)
#      spot-gates -> SF1GATE.json / SF10GATE.json (SKIP_SF1GATE=1 /
#      SKIP_SF10GATE=1 skip; absent rehearsal data skips with a note).
#   6. COMMIT the gate records (second commit, so the gates' recorded
#      `commit` field stays the hash they actually ran against).
#
# A failure in any stage is REPORTED AND COMMITTED, never allowed to
# leave the tree dirty at judging — the script fails loudly at the end.
set -euo pipefail
cd "$(dirname "$0")/.."

LOAD_MAX=${LOAD_MAX:-8}
LOAD_WAIT_MAX=${LOAD_WAIT_MAX:-1800}

load1() { cut -d' ' -f1 /proc/loadavg; }

wait_for_idle() {
  local waited=0
  while :; do
    local l; l=$(load1)
    if python3 -c "import sys; sys.exit(0 if float('$l') <= float('$LOAD_MAX') else 1)"; then
      echo "closeout: load $l <= $LOAD_MAX, host idle enough for timing"
      return 0
    fi
    if [[ "${FORCE_LOAD:-0}" == "1" ]]; then
      echo "closeout: FORCE_LOAD=1 — benching at load $l (will show in the record's load field)" >&2
      return 0
    fi
    if (( waited >= LOAD_WAIT_MAX )); then
      echo "closeout: REFUSING the bench sweep — load $l > $LOAD_MAX after ${waited}s wait." >&2
      echo "closeout: re-run when idle, or SKIP_BENCH=1 to close out without a sweep, or FORCE_LOAD=1 to override." >&2
      return 1
    fi
    echo "closeout: load $l > $LOAD_MAX — waiting (${waited}/${LOAD_WAIT_MAX}s)"
    sleep 30; waited=$((waited + 30))
  done
}

bench_rc=0
if [[ "${SKIP_BENCH:-0}" != "1" ]]; then
  if wait_for_idle; then
    # in-session sweep: we own the wall here (no harness timeout), so allow
    # deferred re-runs a roomier budget than graft.Bench's driver-run
    # default of 600 s (r17 #1b)
    SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    SPARK_GRAFT_BENCH_BUDGET_S=${SPARK_GRAFT_BENCH_BUDGET_S:-1500} \
      sbt -batch "runMain graft.Bench" > /tmp/closeout_bench.log 2>&1 || bench_rc=$?
    grep '"metric"' /tmp/closeout_bench.log | tail -1 || true
    [[ $bench_rc -ne 0 ]] && echo "closeout: bench sweep FAILED (rc=$bench_rc, see /tmp/closeout_bench.log)" >&2
  else
    bench_rc=4
  fi
fi

# refresh the self-evidencing leak scan at the exact state being committed.
# A hit must NOT abort the close-out (r13 review: set -e would kill the
# script before anything was staged, leaving the tree dirty at judging —
# the exact failure this script exists to prevent). Commit the records,
# hits and all (LEAKCHECK_LOCAL.json carries them, auditable), then fail
# LOUDLY at the end.
leak_rc=0
python3 tools/leakcheck.py || leak_rc=$?

shopt -s nullglob
stage_and_commit() {
  local msg=$1; shift
  local existing=()
  for f in "$@"; do
    [[ -e "$f" ]] && ! git check-ignore -q "$f" && existing+=("$f")
  done
  # bash <4.4 under `set -u` treats an empty-array expansion as unbound
  # (r13 ADVICE) — only expand when non-empty
  if [[ ${#existing[@]} -gt 0 ]]; then
    git add -- "${existing[@]}"
  fi
  if git diff --cached --quiet; then
    echo "closeout: nothing new to commit for: $msg"
  else
    git commit -m "$msg" -m "Staged by tools/closeout.sh so the round's measurement artifacts are
tracked at judging time instead of sitting dirty in the working tree."
  fi
}

# COPYCHECK.json / PROGRESS.jsonl are .gitignore'd by the driver and stay so
stage_and_commit "Round close-out: commit bench/correctness/leak records" \
  BENCHOUT.json bench_best.json LEAKCHECK_LOCAL.json LEAKCHECK.json \
  BENCH_r*.json CORRECTNESS_r*.json ADVICE.md VERDICT.md

# parity gates run AFTER the records commit, from a clean tree (r16
# VERDICT #3: SF1GATE.json recorded dirty:true when the gate ran over
# pending close-out records — the record's value is attribution). Same
# never-abort discipline: failures are reported at the end.
sf1_rc=0
if [[ "${SKIP_SF1GATE:-0}" != "1" ]]; then
  bash tools/sf1gate.sh || sf1_rc=$?
  [[ $sf1_rc -eq 2 ]] && { echo "closeout: sf1 data absent, gate skipped"; sf1_rc=0; }
fi
sf10_rc=0
if [[ "${SKIP_SF10GATE:-0}" != "1" ]]; then
  bash tools/sf10gate.sh || sf10_rc=$?
  [[ $sf10_rc -eq 2 ]] && { echo "closeout: sf10 data absent, gate skipped"; sf10_rc=0; }
fi

stage_and_commit "Round close-out: commit scale-gate records" \
  SF1GATE.json SF10GATE.json

git status --short
rc=0
if [[ $bench_rc -ne 0 ]]; then
  echo "closeout: FAILED — bench sweep did not produce a clean record (rc=$bench_rc)" >&2; rc=$bench_rc
fi
if [[ $leak_rc -ne 0 ]]; then
  echo "closeout: FAILED — leakcheck reported hits (see LEAKCHECK_LOCAL.json, committed above); fix and re-run" >&2; rc=$leak_rc
fi
if [[ $sf1_rc -ne 0 ]]; then
  echo "closeout: FAILED — sf1 spot-gate parity failures (see SF1GATE.json, committed above); fix and re-run" >&2; rc=$sf1_rc
fi
if [[ $sf10_rc -ne 0 ]]; then
  echo "closeout: FAILED — sf10 spot-gate parity failures (see SF10GATE.json, committed above); fix and re-run" >&2; rc=$sf10_rc
fi
exit "$rc"
