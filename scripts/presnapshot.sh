#!/usr/bin/env bash
# Mechanical pre-snapshot gate (VERDICT r5 "Next round" #2).
#
# Round 5 shipped exactly one red row — q_vocab_coverage, an oracle
# typing bug selfcheck.py catches perfectly — because running selfcheck
# on late additions was a CONVENTION, and the convention failed once.
# This script makes it mechanical: run `graft.Verify` at the driver's
# correctness SF, then the driver-strict selfcheck + the non-vacuity
# audit over the FULL declared set, and tee everything into
# SELFCHECK.log (committed with the snapshot as the all-green evidence).
#
# Usage: scripts/presnapshot.sh [sfDir] [verifyOut]
# Exit 0 ⟺ every declared query PASSes selfcheck AND the vacuity audit
# is clean. Any other exit means DO NOT SNAPSHOT.
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
LOG=SELFCHECK.log

# Testdata fingerprint (VERDICT r8 #4): capture the parquet schema hashes
# BEFORE the (slow) Verify run. Re-taken after selfcheck below — if the
# driver regenerated /root/testdata mid-gate (it did between the r8
# commit and the r8 verify run), the two blocks differ and the gate goes
# RED instead of vouching for data that no longer exists.
FP_PRE=$(python3 scripts/tdfingerprint.py "$SF")

rm -rf "$OUT"
if ! sbt -batch "runMain graft.Verify $SF $OUT" >/tmp/presnapshot_verify.log 2>&1; then
  echo "presnapshot: Verify FAILED — see /tmp/presnapshot_verify.log"
  exit 1
fi
# Verify prints per-query failures to stderr without failing the JVM.
# FAIL the gate on any (ADVICE r6): a query that throws in Verify but
# leaves a previous run's parquet in a user-supplied $OUT would
# otherwise be selfchecked against STALE output and could pass.
if grep '\[verify\]' /tmp/presnapshot_verify.log; then
  echo "presnapshot: per-query Verify failures above — gate RED"
  exit 1
fi

{
  echo "# presnapshot gate  sf=$SF  $(date -u +%FT%TZ)  HEAD=$(git rev-parse --short HEAD)"
  python3 scripts/selfcheck.py "$SF" "$OUT"; sc=$?
  echo "--- vacuity audit ---"
  python3 scripts/vacuity_audit.py "$OUT"; va=$?
  # Bench regression triage (VERDICT r7 #6, r10 #7): diff the freshest
  # local bench run against the last driver artifact. >1.5x multiples
  # stay informational (mostly co-tenant noise, r5-r8 record) — EXCEPT
  # the suspect-real signature (flat controls + >2x keys), which the
  # gate now REQUIRES a SCALE.md triage entry for: the r10 closing
  # artifact shipped exactly that shape untriaged.
  last_bench=$(ls BENCH_r*.json 2>/dev/null | sort | tail -1)
  bd=0
  if [ -n "$last_bench" ] && [ -f target/bench.json ]; then
    echo "--- benchdiff vs $last_bench (gated on suspect-real) ---"
    python3 scripts/benchdiff.py --gate "$last_bench" target/bench.json
    bd=$?
  fi
  echo "--- testdata fingerprint ($SF) ---"
  echo "$FP_PRE"
  FP_POST=$(python3 scripts/tdfingerprint.py "$SF")
  if [ "$FP_PRE" != "$FP_POST" ]; then
    echo "FINGERPRINT MISMATCH — testdata changed during the gate run:"
    diff <(echo "$FP_PRE") <(echo "$FP_POST")
    fp=1
  else
    fp=0
  fi
  echo "RESULT selfcheck_exit=$sc vacuity_exit=$va fingerprint_exit=$fp benchdiff_exit=$bd"
  [ "$sc" -eq 0 ] && [ "$va" -eq 0 ] && [ "$fp" -eq 0 ] && [ "$bd" -eq 0 ]
} 2>&1 | tee "$LOG"
status=${PIPESTATUS[0]}
if [ "$status" -eq 0 ]; then
  echo "presnapshot gate GREEN — safe to snapshot (log: $LOG)"
else
  echo "presnapshot gate RED — fix before snapshotting (log: $LOG)"
fi
exit "$status"
