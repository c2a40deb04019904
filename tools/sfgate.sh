#!/usr/bin/env bash
# Scale-N oracle spot-gate (generic body; see sf1gate.sh / sf10gate.sh):
# DuckDB parity at a THIRD (and now FOURTH — r16, VERDICT #2) scale for
# ~20 cheap-to-replay certificate/profile/drift queries over the tables
# the rehearsal set carries (orders, documents, events, lineitem).
# Catches scale-dependent parity drift the sf0.01/sf0.1 gates cannot see:
# the sf1 gate's FIRST run caught q240's composite-key stride wrapping on
# >1e8-spaced orderkeys, and the next decade boundary (1e9-scale keys,
# band hashes, DECIMAL widths) only shows at 100x — hence the sf10 form.
# Writes $RECORD (self-evidencing: commit, dirty flag, timestamp,
# per-query status); exit 1 on any FAIL, 2 when the data is absent.
#
# Usage: sfgate.sh <sf_dir> <out_dir> <record_json> <label>
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:?sf_dir}
OUT=${2:?out_dir}
RECORD=${3:?record_json}
LABEL=${4:-sfgate}

# the subset: profile/certificate (q03-q06, q13, q23, q324), drift lenses
# (q71/q72/q338), quantiles at a div boundary (q240), and the per-doc text
# passes whose integer algebra could drift with length/count regimes
# (q40/q42/q83/q109/q262/q336/q337/q340/q341). All read only the four
# rehearsal tables; each DuckDB replay costs seconds at sf1, tens of
# seconds at sf10.
QUERIES="q03_rowcount,q04_profile_exact,q05_profile_approx,q06_rowhash,\
q13_where_predicate,q23_profile_melt,q71_categorical_drift,\
q72_changed_partitions,q338_psi_drift,q324_profile_approx_certificate,\
q40_text_tokens,q42_text_langid,q83_gopher_rules,q336_blocklist_filter,\
q337_entropy_halfbit,q340_anchor_text,q341_semantic_chunking,\
q240_global_quantiles,q262_cdc_chunks,q109_compression_ratio"

if [[ ! -e "$SF_DIR/_REHEARSAL_READY" ]]; then
  echo "$LABEL: no rehearsal data at $SF_DIR (SPARK_GRAFT_REHEARSAL_COPIES=N sbt 'runMain graft.tools.ScaleRehearsal')" >&2
  exit 2
fi

SPARK_GRAFT_VERIFY_ONLY="$QUERIES" sbt -batch \
  "runMain graft.Verify $SF_DIR $OUT" > "/tmp/${LABEL}_verify.log" 2>&1 || {
  echo "$LABEL: Verify failed, see /tmp/${LABEL}_verify.log" >&2; exit 3; }

set +e
res=$(python3 tools/selfcheck.py "$SF_DIR" "$OUT" 2>&1)
rc=$?
set -e
echo "$res"

RES="$res" RC="$rc" SF_DIR="$SF_DIR" RECORD="$RECORD" LABEL="$LABEL" python3 - <<'PY'
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
# dirty = does the CODE tree differ from the recorded commit — the gate
# records themselves are excluded, since gates write them sequentially
# (sf1gate's fresh SF1GATE.json would otherwise mark every subsequent
# sf10gate run dirty, defeating the attribution the flag exists for)
status = subprocess.check_output(
    ["git", "status", "--porcelain", "--", ".",
     ":(exclude)SF1GATE.json", ":(exclude)SF10GATE.json"]).decode().strip()
rec = {
    "commit": subprocess.check_output(["git", "rev-parse", "HEAD"]).decode().strip(),
    "dirty": bool(status),
    "ts_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
    "sf_dir": os.environ["SF_DIR"],
    "n_queries": len(per),
    "n_fail": sum(1 for v in per.values() if v == "FAIL"),
    "queries": per,
    "all_ok": os.environ["RC"] == "0",
}
with open(os.environ["RECORD"], "w") as f:
    json.dump(rec, f, indent=1, sort_keys=True)
print(f"{os.environ['LABEL']}: {rec['n_queries']} queries, {rec['n_fail']} failures -> {os.environ['RECORD']}")
PY
exit "$rc"
