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
# Sentinels: -1 = row absent from the bench map (e.g. query not
# registered at HEAD); -2 = the run itself failed or printed something
# that is not a single numeric token (compile error, crash, truncated
# output). Distinct on purpose (r15 ADVICE).
set -e
cd "$(dirname "$0")/.."
Q="$1"
SF="${2:-/root/testdata/sf0.1}"
[ -n "$Q" ] || { echo "usage: scripts/ab.sh <query> [sfdir]" >&2; exit 2; }

run_once() {
  sbt -batch compile >/dev/null 2>&1
  SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CEILING=999 \
    scripts/run.sh graft.Bench 2>/dev/null | grep '"metric"' |
    python3 -c "import json,sys; print(json.loads(sys.stdin.read())['queries'].get('$Q', -1))"
}

# run_once may fail mid-print (partial text + a fallback echo would
# break the single-JSON-line contract — r15 ADVICE): capture first,
# then validate the capture is ONE numeric token, else the -2 sentinel.
run_validated() {
  local out
  out=$(run_once) || { echo -2; return 0; }
  if printf '%s' "$out" | grep -qE '^-?[0-9]+([.][0-9]+)?$'; then
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

echo "{\"query\":\"$Q\",\"sf\":\"$SF\",\"worktree_sec\":$WORK_SEC,\"head_sec\":$HEAD_SEC,\"tree_differed\":$DIFFERED}"
