#!/usr/bin/env bash
# Round close-out (VERDICT r12 missing #1, third recurrence): the judge
# audits the repo AFTER the build session ends, and three rounds running
# it found the round's record files dirty or untracked — the in-round
# snapshots were committed, but the close-out state wasn't. This script
# is the structural fix: run it as the session's LAST action (and any
# time after a full sweep); its final act is a commit, so `git status`
# is clean for whatever runs next.
#
# What it stages: every measurement/record artifact the verdict reads —
# the rolling bench records (BENCHOUT.json, bench_best.json), the leak
# scans, the copy check, and any driver-written per-round snapshots
# (BENCH_r*.json / CORRECTNESS_r*.json) present at run time. Note the
# driver generates the CURRENT round's snapshots after the session ends;
# those are committed by the next session's first close-out, which is as
# early as anything inside the repo can reach them.
set -euo pipefail
cd "$(dirname "$0")/.."

# refresh the self-evidencing leak scan at the exact state being committed.
# A hit must NOT abort the close-out (r13 review: set -e would kill the
# script before anything was staged, leaving the tree dirty at judging —
# the exact failure this script exists to prevent). Commit the records,
# hits and all (LEAKCHECK_LOCAL.json carries them, auditable), then fail
# LOUDLY at the end.
leak_rc=0
python3 tools/leakcheck.py || leak_rc=$?

# sf1 oracle spot-gate (VERDICT r14 #8): third-scale DuckDB parity for the
# ~20-query certificate/profile subset, recorded in SF1GATE.json and
# committed with the round's records. Same never-abort discipline as the
# leak scan: a parity failure is REPORTED (and fails the script at the
# end), not allowed to leave the tree dirty. SKIP_SF1GATE=1 skips (e.g.
# when sf1 data would have to regenerate mid-closeout).
sf1_rc=0
if [[ "${SKIP_SF1GATE:-0}" != "1" ]]; then
  bash tools/sf1gate.sh || sf1_rc=$?
  [[ $sf1_rc -eq 2 ]] && { echo "closeout: sf1 data absent, gate skipped"; sf1_rc=0; }
fi

shopt -s nullglob
# COPYCHECK.json / PROGRESS.jsonl are .gitignore'd by the driver and stay so
to_add=(BENCHOUT.json bench_best.json LEAKCHECK_LOCAL.json LEAKCHECK.json \
        SF1GATE.json BENCH_r*.json CORRECTNESS_r*.json ADVICE.md VERDICT.md)
existing=()
for f in "${to_add[@]}"; do
  [[ -e "$f" ]] && ! git check-ignore -q "$f" && existing+=("$f")
done
# bash <4.4 under `set -u` treats an empty-array expansion as an unbound
# variable (r13 ADVICE) — an empty list would abort the close-out this
# script exists to guarantee, so only expand when non-empty.
if [[ ${#existing[@]} -gt 0 ]]; then
  git add -- "${existing[@]}"
fi

if git diff --cached --quiet; then
  echo "closeout: records already committed; nothing to do"
else
  git commit -m "Round close-out: commit bench/correctness/leak records

Staged by tools/closeout.sh so the round's measurement artifacts are
tracked at judging time instead of sitting dirty in the working tree."
fi
git status --short
if [[ $leak_rc -ne 0 ]]; then
  echo "closeout: FAILED — leakcheck reported hits (see LEAKCHECK_LOCAL.json, committed above); fix and re-run" >&2
  exit "$leak_rc"
fi
if [[ $sf1_rc -ne 0 ]]; then
  echo "closeout: FAILED — sf1 spot-gate parity failures (see SF1GATE.json, committed above); fix and re-run" >&2
  exit "$sf1_rc"
fi
