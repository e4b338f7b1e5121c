"""x10 probe for the dual-indexed wire-join fact replica (r10 verdict ask
#5 done condition): the DIM-SIDE AFFECTED-FACT lookup — the one fact-
replica read SCALING.md r10 documented as table-shaped on a PK-only
layout — must scale with the batch's fan-out, not the table.

Builds a fact table at N and 10N rows (fixed fan-out: each dim key is
referenced by ~FANOUT facts) plus its PK-bucketed replica and FK posting
index, then times one dim-only delta (DIM_DELTA dim keys ≈ 8·FANOUT affected
facts, CONSTANT across table sizes; best-of-2 timings) through

- the flat lookup: FK semi-join over the whole fact replica
  (operators/incremental.py ``affected_via_dim`` with a flat fact_new);
- the indexed lookup: dim keys → FK-hash posting buckets (pruned read) →
  referenced fact bucket ids → read exactly those PK buckets → the same
  semi-join over that subset (view_stream.py ``_posting_lookup``).

Reports the table-size exponent of each (t ~ N^p, p = log10(t10/t1)):
flat is expected well above 0 (the scan grows with the table); indexed
near 0 (ask's bar: p <= ~0.2).  Parity: both paths must select the SAME
affected-fact row multiset.

The bucket counts follow the sizing discipline (buckets scale with the
table so each stays task-sized); the join-STATE rewrite is outside this
probe's subject — it is table-shaped in both paths and named in
SCALING.md as the stream tier's remaining term.

Run: python scripts/probe_dual_index.py  (one JSON line on stdout)
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
from cdc_lite_spark.streaming.bucketed import BucketedReplica  # noqa: E402
from cdc_lite_spark.streaming.view_stream import (  # noqa: E402
    _posting_build,
    _posting_lookup,
)

FACT_DDL = "fid BIGINT, fk BIGINT, amount DOUBLE"
FANOUT = 100  # facts per dim key, fixed across sizes
DIM_DELTA = 2  # dim keys changed in the probed epoch
ROWS_PER_BUCKET = 50_000


def _facts(spark, n):
    return spark.range(n).select(
        F.col("id").alias("fid"),
        (F.col("id") % (n // FANOUT)).alias("fk"),
        (F.col("id") * 1.5).alias("amount"),
    )


def _dim_keys(spark, n):
    # spread-out changed dim keys — each referenced by ~FANOUT facts
    return spark.range(DIM_DELTA).select(
        (F.col("id") * (n // FANOUT // DIM_DELTA)).alias("fk")
    )


def _best_of_2(df):
    # best-of-2 noop executions: the first run at each scale otherwise
    # absorbs JIT/codegen warmup and reads as a phantom exponent
    times = []
    for _ in range(2):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    return min(times)


def _fingerprint(df):
    return tuple(
        df.agg(
            F.count("*"), F.sum(F.hash("fid", "fk", "amount").cast("long"))
        ).collect()[0]
    )


def probe(spark, n: int) -> dict:
    buckets = max(8, n // ROWS_PER_BUCKET)
    out = {"fact_buckets": buckets}
    base = tempfile.mkdtemp(prefix=f"dualprobe_{n}_")
    try:
        facts = _facts(spark, n).persist()
        dkeys = _dim_keys(spark, n).persist()
        facts.count(), dkeys.count()

        # flat replica: one parquet table
        flat_dir = base + "/flat"
        facts.write.mode("overwrite").parquet(flat_dir)
        flat_rep = spark.read.schema(FACT_DDL).parquet(flat_dir)
        flat_aff = flat_rep.join(F.broadcast(dkeys), ["fk"], "left_semi")
        out["flat_sec"] = _best_of_2(flat_aff)
        out["flat_fp"] = _fingerprint(flat_aff)

        # dual-indexed: PK-bucketed replica + FK posting index
        f_brep = BucketedReplica(spark, base + "/bk", buckets, ["fid"], FACT_DDL)
        f_brep.init(facts)
        p_brep = BucketedReplica(
            spark, base + "/fk", buckets, ["fk"], "fk BIGINT, __fb INT, __cnt BIGINT"
        )
        p_brep.init(_posting_build(facts, f_brep, ["fk"]))
        def _indexed_once():
            posted = _posting_lookup(
                p_brep, p_brep.current_manifest(), dkeys, ["fk"], ["fk"]
            )
            sub = f_brep.read(f_brep.current_manifest(), posted)
            idx_aff = sub.join(F.broadcast(dkeys), ["fk"], "left_semi")
            idx_aff.write.format("noop").mode("overwrite").save()
            return posted, idx_aff

        t0 = time.monotonic()
        posted, idx_aff = _indexed_once()
        s1 = time.monotonic() - t0
        t0 = time.monotonic()
        _indexed_once()
        out["indexed_sec"] = min(s1, time.monotonic() - t0)
        out["posted_buckets"] = len(posted)
        out["indexed_fp"] = _fingerprint(idx_aff)

        out["parity"] = out["flat_fp"] == out["indexed_fp"]
        facts.unpersist(), dkeys.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main():
    spark = get_spark("dual_probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    n = int(os.environ.get("PROBE_N", 4_000_000))
    r1 = probe(spark, n)
    r10 = probe(spark, n * 10)
    res = {
        "n": n,
        "fanout": FANOUT,
        "dim_delta": DIM_DELTA,
        "r1": {k: v for k, v in r1.items() if not k.endswith("_fp")},
        "r10": {k: v for k, v in r10.items() if not k.endswith("_fp")},
        "flat_exponent": round(math.log10(r10["flat_sec"] / r1["flat_sec"]), 3),
        "indexed_exponent": round(
            math.log10(r10["indexed_sec"] / r1["indexed_sec"]), 3
        ),
        "parity": r1["parity"] and r10["parity"],
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
