#!/bin/bash
# Interleaved heap/RocksDB state-store A/B (r15 verdict item 2): the
# r14 and r15 cycles measured the two providers in DIFFERENT sessions,
# and the box's session-to-session swing (heap wave-1 moved 44.8 ->
# 69.8 s on identical code) exceeded every steady-state provider delta
# — so the steady-state story flipped between rounds. Running the
# cycles H/R/H/R inside ONE session cancels that confound: each
# provider is measured twice, bracketing the other, so a provider
# delta that survives the interleave is real and one that doesn't is
# box noise.
#
# Protocol per cycle = decades_r15 Section D exactly: DeltaLshCycle,
# 16g driver, minBatchesToRetain=1 (in-harness), 3 waves, TTL 10 s.
# Usage: scripts/cycle_ab.sh [sfdir] [outprefix]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/tmp/graft_sf_100x}"
# raw cycle outputs default INTO the repo so the A/B evidence survives
# the box (r16 verdict item 3); GRAFT_ROUND files under bench_raw/r<N>/
RAWDIR="bench_raw/${GRAFT_ROUND:+r$GRAFT_ROUND}"; RAWDIR="${RAWDIR%/}"
mkdir -p "$RAWDIR"
PREFIX="${2:-$RAWDIR/cycle_ab}"
sbt -batch compile >/dev/null 2>&1
# third arm (r16 verdict item 4): RocksDB + changelog checkpointing —
# the Section B itemization showed the steady-state premium is
# commit-dominated (SST flush/copy/fileSync), the cost class changelog
# checkpointing exists to defer; interleaving it with H and R in ONE
# session answers whether the premium is inherent or configuration
for RUN in h1 r1 c1 h2 r2 c2; do
  case $RUN in
    h*) ENV="" ;;
    r*) ENV="1" ;;
    c*) ENV="changelog" ;;
  esac
  echo "[cycle_ab] run $RUN (rocksdb=${ENV:-0})" >&2
  # `|| true`: if the run crashes before printing ANY wave line, grep
  # exits 1 and set -e would abort with no message — let the WAVES
  # check below report zero-wave runs too (r16 ADVICE)
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_ROCKSDB="$ENV" \
    scripts/run.sh graft.DeltaLshCycle "$SF" 3 10 2>/dev/null |
    grep '"wave"' > "${PREFIX}_${RUN}.txt" || true
  # the pipeline's status is grep's, so a runner that crashed mid-cycle
  # with >=1 wave printed would slip past set -e and poison the
  # interleaved summary with a truncated cycle — verify all 3 waves
  # landed before proceeding (r16 review)
  WAVES=$(wc -l < "${PREFIX}_${RUN}.txt")
  [ "$WAVES" -eq 3 ] || {
    echo "[cycle_ab] run $RUN truncated: $WAVES/3 waves — aborting" >&2
    exit 1
  }
  cat "${PREFIX}_${RUN}.txt"
done
python3 - "$PREFIX" <<'EOF'
import json, sys
p = sys.argv[1]
rows = {}
for run in ("h1", "r1", "c1", "h2", "r2", "c2"):
    rows[run] = [json.loads(l) for l in open(f"{p}_{run}.txt")]
print("run  provider    w1      w2      w3      state_bytes")
for run, ws in rows.items():
    print(f"{run:4} {ws[0]['provider']:10} " +
          " ".join(f"{w['sec']:7.2f}" for w in ws) +
          f"  {ws[-1]['state_bytes']/1e9:.2f} GB")
def steady(runs):
    return [w['sec'] for run in runs for w in rows[run][1:]]
for label, runs in (("heap", ("h1","h2")), ("rocksdb", ("r1","r2")),
                    ("rocksdb_cl", ("c1","c2"))):
    v = steady(runs)
    print(f"steady-state (waves 2-3) {label}: {min(v):.1f}-{max(v):.1f} "
          f"(mean {sum(v)/len(v):.1f})")
EOF
