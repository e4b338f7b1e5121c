"""x10 probe for the ENGINE tier's bucketed join-view state (r11 verdict
ask #2 done condition): per-tick view-state write I/O must scale with the
AFFECTED KEYS, not the view.

Builds fact ⋈ dim at N and 10N fact rows through a real CdcEngine
(register_join_view + two diff-mode poll_once ticks; tick 2 updates a
fixed 8 fact keys), once flat and once with ``fact_buckets`` sized by the
documented discipline (bucket ≈ a fixed row chunk, so n scales with N).
Reports, per scale and layout:

- ``view_bytes``: bytes newly written under the view's state dir by the
  delta tick — the probe's subject.  Flat rewrites the whole view
  (exponent ~1); bucketed rewrites the touched buckets (~0, bar ≤ 0.2).
- ``tick_sec``: the delta tick's wall time — reported honestly: it
  includes the capture diff's O(table) detect/scan and the engine's
  per-tick SNAPSHOT persistence, both table-sized by design (the
  reference's polling model; partition-gated capture bounds them
  separately).  The view-state term is what this layout closes.
- ``snap_bytes``: bytes the tick wrote under snapshots/ — the remaining
  table-sized write term, for the SCALING.md decision record.

Run: python scripts/probe_engine_join_buckets.py [N] [MULT]
(defaults 1_000_000 and 10; one JSON line on stdout)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_lite_spark.engine import CdcEngine  # noqa: E402
from cdc_lite_spark.session import get_spark  # noqa: E402

BATCH_KEYS = 8
ROWS_PER_BUCKET = 50_000
DIM_KEYS = 10_000


def _fact(spark, n, tick2=False):
    df = spark.range(n).select(
        F.col("id").alias("fid"),
        (F.col("id") % DIM_KEYS).alias("fk"),
        (F.col("id") * 1.5).alias("amt"),
    )
    if tick2:
        stride = n // BATCH_KEYS
        df = df.withColumn(
            "amt",
            F.when(F.col("fid") % stride == 0, F.col("amt") + 1).otherwise(
                F.col("amt")
            ),
        )
    return df


def _dim(spark):
    return spark.range(DIM_KEYS).select(
        F.col("id").alias("did"), (F.col("id") % 7).cast("string").alias("label")
    )


def _du(root) -> dict:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            try:
                out[p] = os.path.getsize(p)
            except OSError:
                pass
    return out


def _new_bytes(before: dict, after: dict) -> int:
    return sum(sz for p, sz in after.items() if p not in before)


def probe(spark, n: int, buckets: "int | None") -> dict:
    base = tempfile.mkdtemp(prefix=f"ejprobe_{n}_{buckets}_")
    try:
        eng = CdcEngine(
            spark, output_dir=base + "/log", state_dir=base + "/state",
            emit_schema_changes=False,
        )
        eng.register_join_view(
            "v", "f", "d", "fid", "fk", "did", fact_buckets=buckets
        )
        keys = {"f": ["fid"], "d": ["did"]}
        dim = _dim(spark)
        eng.poll_once({"f": _fact(spark, n), "d": dim}, mode="diff", keys=keys)
        view_dir = eng._view_dir("v")
        snap_dir = base + "/state/snapshots"
        v_before, s_before = _du(view_dir), _du(snap_dir)
        t0 = time.monotonic()
        eng.poll_once(
            {"f": _fact(spark, n, tick2=True), "d": dim}, mode="diff", keys=keys
        )
        sec = time.monotonic() - t0
        return {
            "tick_sec": round(sec, 2),
            "view_bytes": _new_bytes(v_before, _du(view_dir)),
            "snap_bytes": _new_bytes(s_before, _du(snap_dir)),
            "rows": eng.view("v").count(),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("probe_engine_join_buckets", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n": n, "mult": mult, "batch_keys": BATCH_KEYS}
    for label, bk in (("flat", None), ("bucketed", True)):
        per = {}
        for scale in (n, n * mult):
            b = max(8, scale // ROWS_PER_BUCKET) if bk else None
            per[str(scale)] = probe(spark, scale, b)
            if bk:
                per[str(scale)]["buckets"] = b
        lo, hi = per[str(n)], per[str(n * mult)]
        per["exponent_view_bytes"] = round(
            math.log(max(hi["view_bytes"], 1) / max(lo["view_bytes"], 1))
            / math.log(mult), 3,
        )
        per["exponent_tick_sec"] = round(
            math.log(hi["tick_sec"] / lo["tick_sec"]) / math.log(mult), 3
        )
        out[label] = per
    print(json.dumps(out))


if __name__ == "__main__":
    main()
