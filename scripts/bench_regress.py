"""Bench regression gate: compare the latest BENCH_DETAIL.json (written by
bench.py) against the committed BENCH_BASELINE.json.  Flags any query slower
than THRESHOLD x its baseline (new queries pass automatically).

Usage: python bench.py && python scripts/bench_regress.py [threshold]
Exit code 1 if any regression is found.
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

regressions = []
for name, sec in sorted(detail["queries"].items()):
    base = baseline["queries"].get(name)
    if base is None or sec < 0:
        continue
    if sec > base * THRESHOLD and sec - base > MIN_SECONDS:
        regressions.append((name, base, sec))

for name, base, sec in regressions:
    print(f"REGRESSION {name}: {base:.2f}s -> {sec:.2f}s ({sec / base:.1f}x)")
print(
    f"checked {len(detail['queries'])} queries against round-{baseline.get('round', '?')} "
    f"baseline: {len(regressions)} regression(s), total {detail['value']:.1f}s"
)
sys.exit(1 if regressions else 0)
