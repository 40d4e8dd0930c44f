#!/bin/bash
# Drift A/B for a single bench row (r14 verdict item 7): measure the
# row with the WORKING TREE code, then with committed HEAD (via git
# stash), and emit both numbers as one JSON line — the §6 protocol that
# separates box-wide streaming drift from real regressions before any
# "regression" is believed or optimized. With a clean tree the two runs
# measure the same code twice, i.e. pure box noise.
#
# Usage: scripts/ab.sh <query> [sfdir]   (default sf0.1)
# Both runs share whatever DumpCache artifacts are already staged, so
# run a warm pass first if cold-staging noise would pollute the compare.
#
# Sentinels (r15 ADVICE + r16 review — all three causes distinct):
#   -1 = Bench RAN and recorded the row as failed (Bench catches a
#        throwing query, emits -1.0, exits 0 — a crash in the QUERY)
#   -2 = the run itself failed: compile error, Bench crash, or output
#        that is not a single numeric token
#   -3 = the row is absent from the bench map (query not registered
#        at that commit)
set -e
cd "$(dirname "$0")/.."
Q="$1"
SF="${2:-/root/testdata/sf0.1}"
[ -n "$Q" ] || { echo "usage: scripts/ab.sh <query> [sfdir]" >&2; exit 2; }

run_once() {
  # errexit is suspended inside a function invoked in a ||-list, so a
  # failed compile must bail EXPLICITLY — otherwise run.sh would
  # measure the STALE classes still on disk and report the number as
  # real (r16 review)
  sbt -batch compile >/dev/null 2>&1 || return 1
  SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CEILING=999 \
    scripts/run.sh graft.Bench 2>/dev/null | grep '"metric"' |
    python3 -c "import json,sys; print(json.loads(sys.stdin.read())['queries'].get('$Q', -3))"
}

# Capture first, then validate the capture is ONE numeric token as a
# WHOLE-STRING match (a per-line grep would bless a multi-line blob
# that merely contains a numeric line — r16 review), else -2.
run_validated() {
  local out
  out=$(run_once) || { echo -2; return 0; }
  if [[ $out =~ ^-?[0-9]+(\.[0-9]+)?$ ]]; then
    echo "$out"
  else
    echo -2
  fi
}

WORK_SEC=$(run_validated)

BEFORE=$(git stash list | wc -l)
git stash push -q --include-untracked -m "ab_sh_tmp" >/dev/null 2>&1 || true
AFTER=$(git stash list | wc -l)
STASHED=false
[ "$AFTER" -gt "$BEFORE" ] && STASHED=true
# restore() clears STASHED as it pops, so latch the answer to "did the
# two runs measure different code?" NOW, while it is still true
# (r15 ADVICE: the old script always printed tree_differed:false).
DIFFERED=$STASHED

# a failing HEAD run (row absent at HEAD, HEAD does not compile, ...)
# must NEVER strand the developer's uncommitted work in the stash:
# restore on ANY exit once the stash exists (r15 review)
restore() {
  if [ "$STASHED" = true ]; then
    git stash pop -q && STASHED=false
    sbt -batch compile >/dev/null 2>&1
  fi
}
trap restore EXIT

HEAD_SEC=$(run_validated)

restore
trap - EXIT

# the A/B line is primary adjudication evidence — append it into the
# repo (bench_raw/) so it survives the box, as well as printing it
# (r16 verdict item 3); GRAFT_ROUND files under bench_raw/r<N>/
RAWDIR="bench_raw/${GRAFT_ROUND:+r$GRAFT_ROUND}"; RAWDIR="${RAWDIR%/}"
mkdir -p "$RAWDIR"
LINE="{\"query\":\"$Q\",\"sf\":\"$SF\",\"worktree_sec\":$WORK_SEC,\"head_sec\":$HEAD_SEC,\"tree_differed\":$DIFFERED}"
echo "$LINE" | tee -a "$RAWDIR/ab.jsonl"
