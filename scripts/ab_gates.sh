#!/bin/bash
# Interleaved same-box A/B of the heavy gate family: base tree (arg 1)
# vs this tree, N rounds each (arg 2, default 2), bench_subset methodology.
# Usage: scripts/ab_gates.sh /tmp/r14_base [2] [gate...]
set -u
BASE="$1"; shift
N="${1:-2}"; shift || true
GATES=("$@")
if [ ${#GATES[@]} -eq 0 ]; then
  GATES=(anomaly_stream_equivalence changelog_view_maintenance \
    changelog_view_maintenance_bucketed changelog_view_maintenance_parquet_log \
    changelog_view_maintenance_reordered engine_chain_join_view_maintenance \
    engine_composite_join_view_maintenance engine_partition_view_maintenance \
    wire_join_view_maintenance wire_join_view_maintenance_dual \
    wire_join_view_maintenance_reordered wire_left_join_view_maintenance)
fi
HERE="$(cd "$(dirname "$0")/.." && pwd)"
for i in $(seq 1 "$N"); do
  echo "=== round $i: BASE ($BASE) ==="
  (cd "$BASE" && python scripts/bench_subset.py "${GATES[@]}" 2>/dev/null | grep -v WARN)
  echo "=== round $i: WORK ($HERE) ==="
  (cd "$HERE" && python scripts/bench_subset.py "${GATES[@]}" 2>/dev/null | grep -v WARN)
done
