#!/bin/bash
# Round-end certification (VERDICT r17 item 3): run every cheap gate
# against the EXACT tree being snapshotted and print one line that can
# be pasted into the round notes with the commit hash it certified.
#
# The r17 slip shipped because the final two commits ran nothing: a
# live audit mutation sat in Mutations.scala while a commit carried a
# No-Verification-Needed trailer. This script makes "certified at
# <hash>" a single command:
#
#   tools/round_checklist.sh          # lints + full Verify sweep + oracle
#   tools/round_checklist.sh --fast   # lints only (when Verify already ran
#                                     # on this exact tree and you say so)
#
# It does NOT run `sbt test` (20 min) — run that separately after any
# product-source change; this script asserts everything else.
set -u
cd "$(dirname "$0")/.."
FAST=${1:-}
HASH=$(git rev-parse --short HEAD)
DIRTY=$(git status --porcelain)
FAIL=0

step() { echo; echo "== $1"; }

step "mutation-residue lint (gate_sensitivity --lint)"
python3 tools/gate_sensitivity.py --lint || FAIL=1

step "boundary-coverage lint"
python3 tools/boundary_lint.py >/tmp/boundary_lint_out.txt 2>&1 \
  && tail -2 /tmp/boundary_lint_out.txt || { cat /tmp/boundary_lint_out.txt; FAIL=1; }

if [ "$FAST" != "--fast" ]; then
  step "full Verify sweep + DuckDB oracle at sf0.01"
  # Fresh dump dir EVERY run (r18 ADVICE): Verify swallows per-query
  # exceptions and writes nothing for a throwing query, so a stale
  # passing parquet from a prior checklist run — or the entire stale
  # dump if Verify crashes early — would satisfy check_oracle and print
  # a false CERTIFIED. Same fix gate_sensitivity.py got via rmtree.
  rm -rf /tmp/round_checklist_verify
  if ! SPARK_GRAFT_CPUS=8 tools/run_main.sh graft.Verify \
      /root/testdata/sf0.01 /tmp/round_checklist_verify \
      >/tmp/round_checklist_verify.log 2>&1; then
    echo "Verify FAILED (rc != 0) — tail of log:"
    tail -20 /tmp/round_checklist_verify.log
    FAIL=1
  fi
  python3 tools/check_oracle.py /root/testdata/sf0.01 \
    /tmp/round_checklist_verify 2>&1 | tail -1 | tee /tmp/oracle_tail.txt
  # positive pass count required: "== 0 pass, 0 fail ==" (empty or stale
  # oracle_sql.json) must NOT certify (r18 ADVICE)
  grep -Eq "== [1-9][0-9]* pass, 0 fail ==" /tmp/oracle_tail.txt || FAIL=1
fi

echo
if [ -n "$DIRTY" ]; then
  echo "NOTE: working tree dirty — certification applies to the WORKING"
  echo "TREE, not commit $HASH. Commit first, then re-run."
fi
if [ "$FAIL" = 0 ]; then
  echo "CERTIFIED${FAST:+ (fast)}: tree at $HASH${DIRTY:++dirty} — residue lint clean," \
       "boundary lint green$([ "$FAST" != "--fast" ] && echo ', Verify 0 fail')"
else
  echo "CERTIFICATION FAILED at $HASH — do NOT snapshot this tree."
fi
exit $FAIL
