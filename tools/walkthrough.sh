#!/usr/bin/env bash
# Cold-start validation gate: drives the README "Operate the engine"
# walkthrough end-to-end against a testdata sf dir and exits NONZERO on
# any drift — the walkthrough as a regression test, not documentation.
#
#   tools/walkthrough.sh [--sf /root/testdata/sf0.01] [--skip-oracle]
#
# Steps (mirroring README §"Operate the engine"):
#   1. CurateCli batch funnel  → exit 0, datasheet.json + corpus/ exist
#   2. ReconcileCli report     → exit code consistent with issue count
#                                (0 clean / 1 discrepancies, the
#                                reference CLI contract), and
#                                missing_in_target cross-checked against
#                                the actual parquet row counts (DuckDB,
#                                when available)
#   3. JsonStage + two SessionCensusCli runs → chronological staging
#                                (8 parts), cross-run session chaining
#                                (run 2 sees the delta; accumulated
#                                closed_sessions never shrinks), rollup +
#                                state-bound telemetry lines present
#   4. Verify + DuckDB oracle  → ", 0 fail ==" (skippable: --skip-oracle)
#
# Runs the launchers via `java -cp` on the compiled classes + the Spark
# jars — no nested sbt, so a test suite can invoke this script. Requires
# `sbt compile` to have run (the classes dir must exist).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF=/root/testdata/sf0.01
SKIP_ORACLE=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --sf) SF="$2"; shift 2 ;;
    --skip-oracle) SKIP_ORACLE=1; shift ;;
    *) echo "[config] unknown flag '$1'" >&2; exit 10 ;;
  esac
done

CLASSES="$REPO/target/scala-2.13/classes"
[[ -d "$CLASSES" ]] || { echo "FAIL: $CLASSES missing — run 'sbt compile' first" >&2; exit 2; }
CP="$CLASSES:/opt/spark/jars/*"

# Spark 4.x on JDK 17 outside spark-submit (same list as build.sbt)
JOPTS=(-Xmx4g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC)
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JOPTS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
run_class() { java "${JOPTS[@]}" -cp "$CP" "$@"; }

WORK="$(mktemp -d /tmp/graft-walkthrough.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT
fail() { echo "FAIL: $*" >&2; exit 1; }
note() { echo "== $*"; }

# jq-free field extraction from the launchers' JSON lines. Never exits
# nonzero (empty output on a miss): under set -e a failing $(jint ...)
# assignment would kill the script BEFORE the explicit fail-with-
# diagnostic guards that follow each extraction could run.
jint() { grep -o "\"$2\": *-\?[0-9]*" <<<"$1" | head -1 | grep -o -- '-\?[0-9]*$' || true; }

note "step 1: batch curation funnel (CurateCli $SF)"
CURATE_OUT="$(run_class graft.ops.CurateCli "$SF" "$WORK/curated" 0.5 full 2>"$WORK/curate.err")" \
  || fail "CurateCli exited nonzero: $(tail -5 "$WORK/curate.err")"
grep -q '"stage"' <<<"$CURATE_OUT" || fail "no per-stage funnel lines in CurateCli output"
[[ -f "$WORK/curated/datasheet.json" ]] || fail "datasheet.json not written"
ls "$WORK/curated/corpus"/*.parquet >/dev/null 2>&1 || fail "curated corpus/ has no parquet"

note "step 2: reconcile source vs curated corpus (ReconcileCli)"
set +e
RECON_OUT="$(run_class graft.ops.ReconcileCli report \
  --source "$SF/documents.parquet" --target "$WORK/curated/corpus" \
  --keys doc_id 2>"$WORK/recon.err")"
RECON_EXIT=$?
set -e
ISSUES="$(jint "$RECON_OUT" issues)"
[[ -n "$ISSUES" ]] || fail "no issues field in ReconcileCli output: $RECON_OUT"
if [[ "$ISSUES" -gt 0 && "$RECON_EXIT" -ne 1 ]]; then
  fail "ReconcileCli: $ISSUES issues but exit $RECON_EXIT (contract: 1)"
elif [[ "$ISSUES" -eq 0 && "$RECON_EXIT" -ne 0 ]]; then
  fail "ReconcileCli: 0 issues but exit $RECON_EXIT (contract: 0)"
fi
MISSING="$(jint "$RECON_OUT" missing_in_target)"
if command -v python3 >/dev/null && python3 -c 'import duckdb' 2>/dev/null; then
  WANT_MISSING="$(python3 - "$SF/documents.parquet" "$WORK/curated/corpus" <<'PY'
import duckdb, sys
src, tgt = sys.argv[1], sys.argv[2]
# anti-join, not NOT IN: a NULL doc_id on the target side would make
# NOT IN's three-valued logic return zero rows and mask real drift
n = duckdb.sql(f"""
  SELECT count(*) FROM read_parquet('{src}') s
  WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{tgt}/*.parquet') t
                    WHERE t.doc_id = s.doc_id)
""").fetchone()[0]
print(n)
PY
)"
  [[ "$MISSING" == "$WANT_MISSING" ]] \
    || fail "missing_in_target drifted: reported $MISSING, parquet says $WANT_MISSING"
  note "  missing_in_target=$MISSING cross-checked against DuckDB"
else
  note "  (duckdb unavailable — skipping the row-count cross-check)"
fi

note "step 3: chronological staging + restartable session censuses"
STAGE_OUT="$(run_class graft.ops.JsonStage --input "$SF/events.parquet" \
  --output "$WORK/events_all" --order-by ts \
  --select user_id,event_id,ts,event_type --parts 8 2>"$WORK/stage.err")" \
  || fail "JsonStage exited nonzero: $(tail -5 "$WORK/stage.err")"
grep -q '"staged_files": 8' <<<"$STAGE_OUT" || fail "expected 8 staged parts: $STAGE_OUT"
mkdir -p "$WORK/in"
cp -p "$WORK/events_all"/part-0000[0-3]* "$WORK/in/"
census() {
  run_class graft.ops.SessionCensusCli --input "$WORK/in" \
    --sessions "$WORK/sessions" --checkpoint "$WORK/ck" --gap-sec 1800 \
    --paths "$WORK/paths" --transitions "$WORK/transitions" \
    --growth "$WORK/growth" --state-store rocksdb 2>"$WORK/census.err"
}
C1_OUT="$(census)" || fail "census run 1 failed: $(tail -5 "$WORK/census.err")"
C1="$(jint "$C1_OUT" closed_sessions)"
grep -q '"state"' <<<"$C1_OUT" || fail "run 1 printed no state-bound telemetry lines"
cp -p "$WORK/events_all"/part-0000[4-7]* "$WORK/in/"
C2_OUT="$(census)" || fail "census run 2 failed: $(tail -5 "$WORK/census.err")"
C2="$(jint "$C2_OUT" closed_sessions)"
# guard before the numeric compare: an empty extraction would otherwise
# die as an opaque bash integer-expression error instead of a fail()
[[ -n "$C1" && -n "$C2" ]] \
  || fail "census output missing closed_sessions (run1='$C1', run2='$C2')"
[[ "$C2" -gt "$C1" ]] \
  || fail "cross-run chaining drifted: run1 closed=$C1, run2 closed=$C2 (must grow on the delta)"
grep -q '"census"' <<<"$C2_OUT" || fail "run 2 printed no rollup lines"
for d in sessions paths transitions growth; do
  ls "$WORK/$d"/*.parquet >/dev/null 2>&1 || fail "census output $d/ has no parquet"
done
note "  run1 closed_sessions=$C1 → run2 closed_sessions=$C2 (delta chained)"

if [[ "$SKIP_ORACLE" -eq 0 ]]; then
  note "step 4: full oracle gate (Verify + DuckDB compare)"
  run_class graft.Verify "$SF" "$WORK/verify_out" >"$WORK/verify.log" 2>&1 \
    || fail "Verify exited nonzero: $(tail -5 "$WORK/verify.log")"
  ORACLE="$(python3 "$REPO/tools/check_oracle.py" "$SF" "$WORK/verify_out" | tail -1)"
  grep -q ', 0 fail ==' <<<"$ORACLE" || fail "oracle gate: $ORACLE"
  note "  $ORACLE"
else
  note "step 4: skipped (--skip-oracle)"
fi

echo "WALKTHROUGH OK ($SF)"
