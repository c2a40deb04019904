#!/usr/bin/env bash
# sf1 oracle spot-gate (VERDICT r13 #7 / r14 #8): DuckDB parity at a THIRD
# scale for ~20 cheap-to-replay certificate/profile/drift queries over the
# tables the rehearsal set carries (orders, documents, events, lineitem).
# Catches scale-dependent parity drift the sf0.01/sf0.1 gates cannot see —
# its first run caught q240's composite-key stride wrapping on >1e8-spaced
# orderkeys (re-ordering rows out of cents-major order), exactly the
# failure class it exists for. Writes SF1GATE.json (self-evidencing:
# commit, dirty flag, timestamp, per-query status); exit 1 on any FAIL.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1_DIR=${1:-target/testdata-sf1}
OUT=${2:-/tmp/verify_sf1gate}

# the subset: profile/certificate (q03-q06, q13, q23, q324), drift lenses
# (q71/q72/q338), quantiles at a div boundary (q240), and the per-doc text
# passes whose integer algebra could drift with length/count regimes
# (q40/q42/q83/q109/q262/q336/q337/q340/q341). All read only the four
# rehearsal tables; each DuckDB replay costs seconds, not minutes.
QUERIES="q03_rowcount,q04_profile_exact,q05_profile_approx,q06_rowhash,\
q13_where_predicate,q23_profile_melt,q71_categorical_drift,\
q72_changed_partitions,q338_psi_drift,q324_profile_approx_certificate,\
q40_text_tokens,q42_text_langid,q83_gopher_rules,q336_blocklist_filter,\
q337_entropy_halfbit,q340_anchor_text,q341_semantic_chunking,\
q240_global_quantiles,q262_cdc_chunks,q109_compression_ratio"

if [[ ! -e "$SF1_DIR/_REHEARSAL_READY" ]]; then
  echo "sf1gate: no rehearsal data at $SF1_DIR (SPARK_GRAFT_REHEARSAL_COPIES=10 sbt 'runMain graft.tools.ScaleRehearsal')" >&2
  exit 2
fi

SPARK_GRAFT_VERIFY_ONLY="$QUERIES" sbt -batch \
  "runMain graft.Verify $SF1_DIR $OUT" > /tmp/sf1gate_verify.log 2>&1 || {
  echo "sf1gate: Verify failed, see /tmp/sf1gate_verify.log" >&2; exit 3; }

set +e
res=$(python3 tools/selfcheck.py "$SF1_DIR" "$OUT" 2>&1)
rc=$?
set -e
echo "$res"

RES="$res" RC="$rc" SF1_DIR="$SF1_DIR" python3 - <<'PY'
import json, os, subprocess, datetime
res = os.environ["RES"].splitlines()
per = {}
for line in res:
    parts = line.split()
    if len(parts) >= 2 and parts[0].startswith("q"):
        # 'rows-only:' = query without an oracle entry — its own status,
        # NOT a FAIL (selfcheck doesn't count it either; recording it as
        # FAIL beside all_ok:true made the record self-contradictory)
        per[parts[0]] = ("OK" if parts[1] == "OK"
                         else "ROWS_ONLY" if parts[1].startswith("rows-only")
                         else "FAIL")
rec = {
    "commit": subprocess.check_output(["git", "rev-parse", "HEAD"]).decode().strip(),
    "dirty": bool(subprocess.check_output(["git", "status", "--porcelain"]).decode().strip()),
    "ts_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
    "sf_dir": os.environ["SF1_DIR"],
    "n_queries": len(per),
    "n_fail": sum(1 for v in per.values() if v == "FAIL"),
    "queries": per,
    "all_ok": os.environ["RC"] == "0",
}
with open("SF1GATE.json", "w") as f:
    json.dump(rec, f, indent=1, sort_keys=True)
print(f"sf1gate: {rec['n_queries']} queries, {rec['n_fail']} failures -> SF1GATE.json")
PY
exit "$rc"
