#!/usr/bin/env python3
"""Cross-round bench-map diff (dev tool): compare two Bench JSON maps and
report every row that moved more than THRESH x in either direction, plus
added/removed rows and totals. This is the programmatic check behind the
"zero rows >2x" discipline (SURVEY §6 / r16 verdict item 6).

Usage: python3 scripts/diffmap.py prior.json current.json [thresh] [floor]
  thresh: ratio that counts as a move (default 2.0)
  floor:  ignore rows where both values are under this many seconds
          (default 0.3 — sub-floor rows are timer noise)
Exit status: min(movers + removed, 125); 0 = clean diff. Removed rows
gate too — a row silently vanishing from the suite is NOT a clean diff
(r17 ADVICE: sys.exit(len(movers)) alone wraps mod 256 on POSIX, so
256+ movers would read as clean, and removed rows never gated).
"""
import json, sys

prior_f, cur_f = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

prior = json.load(open(prior_f))["queries"]
cur = json.load(open(cur_f))["queries"]

movers = []
for k in sorted(set(prior) & set(cur)):
    a, b = prior[k], cur[k]
    if a < 0 or b < 0:
        movers.append((k, a, b, float("inf")))
        continue
    if a < floor and b < floor:
        continue
    r = b / a if a > 0 else float("inf")
    if r > thresh or r < 1 / thresh:
        movers.append((k, a, b, r))

added = sorted(set(cur) - set(prior))
removed = sorted(set(prior) - set(cur))
ta = sum(v for v in prior.values() if v > 0)
tb = sum(v for v in cur.values() if v > 0)
print(f"prior  {prior_f}: {len(prior)} rows, total {ta:.1f} s")
print(f"current {cur_f}: {len(cur)} rows, total {tb:.1f} s")
print(f"overlap {len(set(prior) & set(cur))} rows; "
      f"movers >{thresh}x (floor {floor}s): {len(movers)}")
for k, a, b, r in sorted(movers, key=lambda m: -m[3]):
    print(f"  {k:32s} {a:8.2f} -> {b:8.2f}  ({r:.2f}x)")
if added:
    print("added:   " + ", ".join(f"{k}={cur[k]:.2f}" for k in added))
if removed:
    print("removed: " + ", ".join(f"{k}={prior[k]:.2f}" for k in removed))
# cap at 125 (POSIX exit codes are mod 256; >125 collides with shell
# signal/exec conventions) so a huge diff can never wrap back to 0
sys.exit(min(len(movers) + len(removed), 125))
