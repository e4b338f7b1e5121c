"""Bench regression gate: compare the latest BENCH_DETAIL.json (written by
bench.py) against the committed BENCH_BASELINE.json.  Flags any query slower
than THRESHOLD x its baseline, and any query MISSING a baseline entry — a
blind spot is itself a failure (r7: a 3x swing on an unbaselined query went
unflagged), so extending the registry requires refreshing the baseline.

Usage: python bench.py && python scripts/bench_regress.py [threshold]
Exit code 1 if any regression or missing baseline entry is found.
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
MIN_SECONDS = 0.5  # ignore sub-half-second jitter

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
detail = json.load(open(os.path.join(repo, "BENCH_DETAIL.json")))
baseline = json.load(open(os.path.join(repo, "BENCH_BASELINE.json")))

regressions, missing = [], []
for name, sec in sorted(detail["queries"].items()):
    base = baseline["queries"].get(name)
    if base is None:
        missing.append(name)
        continue
    if sec < 0:
        continue
    if sec > base * THRESHOLD and sec - base > MIN_SECONDS:
        regressions.append((name, base, sec))

for name, base, sec in regressions:
    print(f"REGRESSION {name}: {base:.2f}s -> {sec:.2f}s ({sec / base:.1f}x)")
for name in missing:
    print(f"MISSING BASELINE {name}: refresh BENCH_BASELINE.json (see its 'runs' note)")
print(
    f"checked {len(detail['queries'])} queries against round-{baseline.get('round', '?')} "
    f"baseline: {len(regressions)} regression(s), {len(missing)} missing, "
    f"total {detail['value']:.1f}s"
)
# a baseline re-pinned to the round it measures makes the headline ratio
# ~1.0 by construction (r8 verdict #7) — surface the honest cross-round
# number recorded at re-pin time alongside it
if baseline.get("cross_round_note"):
    print(f"cross-round: {baseline['cross_round_note']}")
sys.exit(1 if regressions or missing else 0)
