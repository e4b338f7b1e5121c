"""Whole-EPOCH ×10 probe for the dual-indexed wire-join consumer: one
real micro-batch (a dim-only delta of DIM_DELTA keys) through the actual
``start_changelog_join_view`` machinery, flat vs ``fact_buckets=``, at N
and 10N facts.

The flat epoch pays THREE table-sized terms (fact replica rewrite, join
m_old scan, join rewrite); the dual-indexed epoch prunes all three to
the batch's fan-out (touched PK buckets ∪ posting-referenced buckets),
so its wall time should be ~flat across table sizes (ask's bar:
exponent <= ~0.2) while the flat path's exponent trends to 1.

Base state comes from ``init_changelog_join_view(fact_history=...)`` —
no log replay needed — and the wire log contains ONLY the delta tick,
hand-built in the A8 wire format.  Parity: both drains must converge to
the same join-state fingerprint.

Run: python scripts/probe_dual_epoch.py  (one JSON line on stdout)
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

from cdc_lite_spark.session import get_spark  # noqa: E402
from cdc_lite_spark.sources.changelog import stream_changes  # noqa: E402
from cdc_lite_spark.streaming.view_stream import (  # noqa: E402
    init_changelog_join_view,
    read_changelog_join_view,
    start_changelog_join_view,
)

FACT_DDL = "fid BIGINT, fk BIGINT, amount DOUBLE"
DIM_DDL = "dk BIGINT, label STRING"
FANOUT = 100
DIM_DELTA = 2
ROWS_PER_BUCKET = 50_000


def _facts(spark, n):
    return spark.range(n).select(
        F.col("id").alias("fid"),
        (F.col("id") % (n // FANOUT)).alias("fk"),
        (F.col("id") * 1.5).alias("amount"),
    )


def _dims(spark, n):
    return spark.range(n // FANOUT).select(
        F.col("id").alias("dk"), F.lit("a").alias("label")
    )


def _delta_log(spark, n, log_dir):
    """One wire tick: DIM_DELTA dim keys relabeled (UPDATE records)."""
    (
        spark.range(DIM_DELTA)
        .select(
            F.current_timestamp().alias("timestamp"),
            F.lit("d").alias("table"),
            F.lit("UPDATE").alias("operation"),
            F.create_map(
                F.lit("dk"),
                (F.col("id") * (n // FANOUT // DIM_DELTA)).cast("string"),
                F.lit("label"),
                F.lit("B"),
            ).alias("data"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .json(log_dir)
    )


def _fingerprint(df):
    return tuple(
        df.agg(
            F.count("*"),
            F.sum(F.hash("fid", "fk", "amount", "dk", "label").cast("long")),
        ).collect()[0]
    )


def _drain(spark, n, base, facts, dims, buckets) -> dict:
    tag = f"b{buckets or 0}"
    state = f"{base}/state_{tag}"
    kw = (
        dict(
            fact_buckets=buckets,
            dim_buckets=max(4, n // FANOUT // ROWS_PER_BUCKET),
        )
        if buckets
        else {}
    )
    init_changelog_join_view(
        spark, state, "f", "d", FACT_DDL, DIM_DDL, ["fid"], ["fk"], ["dk"],
        fact_history=facts, dim_history=dims, **kw,
    )
    t0 = time.monotonic()
    q = start_changelog_join_view(
        stream_changes(spark, f"{base}/log"),
        "f", "d", FACT_DDL, DIM_DDL, ["fid"], ["fk"], ["dk"],
        state, f"{base}/ckpt_{tag}", available_now=True, **kw,
    )
    q.awaitTermination()
    sec = time.monotonic() - t0
    return {"sec": sec, "fp": _fingerprint(read_changelog_join_view(spark, state))}


def probe(spark, n: int) -> dict:
    buckets = max(8, n // ROWS_PER_BUCKET)
    base = tempfile.mkdtemp(prefix=f"dualepoch_{n}_")
    try:
        facts = _facts(spark, n).persist()
        dims = _dims(spark, n).persist()
        facts.count(), dims.count()
        _delta_log(spark, n, f"{base}/log")
        flat = _drain(spark, n, base, facts, dims, None)
        dual = _drain(spark, n, base, facts, dims, buckets)
        facts.unpersist(), dims.unpersist()
        return {
            "fact_buckets": buckets,
            "flat_sec": flat["sec"],
            "dual_sec": dual["sec"],
            "parity": flat["fp"] == dual["fp"],
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main():
    spark = get_spark("dual_epoch_probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    n = int(os.environ.get("PROBE_N", 2_000_000))
    probe(spark, max(100_000, n // 10))  # warmup: JIT + streaming machinery
    r1 = probe(spark, n)
    r10 = probe(spark, n * 10)
    print(
        json.dumps(
            {
                "n": n,
                "fanout": FANOUT,
                "dim_delta": DIM_DELTA,
                "r1": r1,
                "r10": r10,
                "flat_exponent": round(
                    math.log10(r10["flat_sec"] / r1["flat_sec"]), 3
                ),
                "dual_exponent": round(
                    math.log10(r10["dual_sec"] / r1["dual_sec"]), 3
                ),
                "parity": r1["parity"] and r10["parity"],
            }
        )
    )


if __name__ == "__main__":
    main()
