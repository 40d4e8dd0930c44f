#!/bin/bash
# Calm-box gate for the 100x sweep (r17 verdict item 1): the r17 100x
# map was measured through a box-degradation episode — the warm pass
# lost to its own first pass on identical binaries — so a round's map
# is only COMPARABLE if the box first proves it is running inside the
# r16 reference band. Two probes:
#
#   1. heap-cycle steady mean — graft.DeltaLshCycle, heap arm, 3 waves
#      (the probe whose cross-round record exists: r16 steady mean
#      33.5 s, r17-degraded 85.1 s on identical code). Gate: waves 2-3
#      mean <= GATE_S (default 55 s ~ 1.65x the r16 mean — generous
#      for ordinary drift, far under the 2.5x degradation signature).
#   2. cold/warm sequential-read ratio on the 100x events table —
#      first cat vs second cat of the same bytes; informational
#      (no r16 band exists for it), printed for the record so future
#      rounds accumulate one.
#
# Exit 0 = calm (accept the sweep), 1 = degraded (re-run later; do NOT
# commit the map as a comparable baseline).
# Usage: scripts/boxhealth.sh [sfdir] [gate_seconds]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/tmp/graft_sf_100x}"
GATE_S="${2:-55}"
RAWDIR="bench_raw/${GRAFT_ROUND:+r$GRAFT_ROUND}"; RAWDIR="${RAWDIR%/}"
mkdir -p "$RAWDIR"
# one file per invocation: repeated gate runs in a session must not
# clobber each other's record (the r18 session ran the gate twice and
# run 1's waves survived only in the transcript)
OUT="$RAWDIR/boxhealth_$(date +%H%M%S).txt"
[ -d "$SF" ] || { echo "fixture missing: $SF" >&2; exit 2; }

# probe 2 first (cheap, and it must run before probe 1 warms the file)
EV="$SF/events.parquet"
drop_note="(page cache NOT dropped — no privilege; cold pass may read warm)"
T0=$(date +%s.%N); cat "$EV"/*.parquet >/dev/null 2>&1 || cat "$EV" >/dev/null
T1=$(date +%s.%N); cat "$EV"/*.parquet >/dev/null 2>&1 || cat "$EV" >/dev/null
T2=$(date +%s.%N)
BYTES=$(du -sb "$EV" | cut -f1)
python3 -c "
import sys
b, t0, t1, t2 = float('$BYTES'), $T0, $T1, $T2
c, w = t1-t0, t2-t1
print(f'[boxhealth] read probe: {b/1e9:.2f} GB cold {c:.2f}s ({b/c/1e6:.0f} MB/s) '
      f'warm {w:.2f}s ({b/w/1e6:.0f} MB/s) ratio {c/max(w,1e-9):.2f} $drop_note')
" | tee "$OUT"

sbt -batch compile >/dev/null 2>&1
echo "[boxhealth] heap cycle (3 waves, TTL 10 s) ..." >&2
SPARK_DRIVER_MEM=16g scripts/run.sh graft.DeltaLshCycle "$SF" 3 10 2>/dev/null |
  grep '"wave"' | tee -a "$OUT"
python3 - "$OUT" "$GATE_S" <<'EOF'
import json, sys
waves = [json.loads(l) for l in open(sys.argv[1]) if l.startswith('{')]
gate = float(sys.argv[2])
if len(waves) != 3:
    print(f"[boxhealth] cycle truncated: {len(waves)}/3 waves — DEGRADED")
    sys.exit(1)
steady = [w["sec"] for w in waves[1:]]
mean = sum(steady) / len(steady)
verdict = "CALM" if mean <= gate else "DEGRADED"
print(f"[boxhealth] heap steady mean {mean:.1f} s (waves 2-3: "
      f"{steady[0]:.1f}/{steady[1]:.1f}; r16 band mean 33.5, gate {gate}) "
      f"-> {verdict}")
sys.exit(0 if mean <= gate else 1)
EOF
