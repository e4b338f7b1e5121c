"""x10 probe for the bucketed replica layout (r9 verdict ask #5 done
condition): epoch cost must scale with the BATCH, not the table.

Builds a replica at N and 10N rows, then runs one fixed-size (8-key)
epoch through the flat path (full-table commit_version rewrite) and the
bucketed path (touched-bucket read + advance + commit) and reports the
table-size exponent of each: t ~ N^p, p = log10(t_10N / t_N).  Flat is
expected near p=1 (the whole table rewrites); bucketed near p=0 (only
touched buckets rewrite — ask's bar: p <= ~0.2).

The bucket count follows the documented sizing discipline — n scales
with the table so each bucket stays a fixed, task-sized chunk (module
docstring of streaming/bucketed.py); at fixed n a bucket itself grows
with the table and the epoch inherits an O(table/n) term, which is the
layout working as specified, not the probe's subject.

Run: python scripts/probe_bucketed_replica.py  (one JSON line on stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_lite_spark.session import get_spark  # noqa: E402
from cdc_lite_spark.streaming._state import commit_version, fs_for  # noqa: E402
from cdc_lite_spark.streaming.bucketed import BucketedReplica  # noqa: E402

DDL = "id BIGINT, grp STRING, v DOUBLE"
BATCH_KEYS = 8
ROWS_PER_BUCKET = 50_000


def _table(spark, n):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 13).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )


def _batch(spark, n):
    # BATCH_KEYS spread-out keys updated — a delta-sized tick
    return spark.range(BATCH_KEYS).select(
        (F.col("id") * (n // BATCH_KEYS)).alias("id"),
        F.lit("u").alias("grp"),
        F.lit(-1.0).alias("v"),
    )


def probe(spark, n: int) -> dict:
    buckets = max(8, n // ROWS_PER_BUCKET)
    out = {"buckets": buckets}
    base = tempfile.mkdtemp(prefix=f"bkprobe_{n}_")
    try:
        table = _table(spark, n).persist()
        batch = _batch(spark, n).persist()
        table.count(), batch.count()

        # flat: init v0, then one epoch = full-table rewrite
        flat_dir = base + "/flat"
        table.write.mode("overwrite").parquet(flat_dir + "/v0")
        fs = fs_for(flat_dir, spark)
        fs.write_pointer(flat_dir, "v0")
        keys = batch.select("id")
        replica = spark.read.schema(DDL).parquet(flat_dir + "/v0")
        new_flat = replica.join(F.broadcast(keys), ["id"], "left_anti").unionByName(
            batch
        )
        t0 = time.monotonic()
        commit_version(new_flat, flat_dir, 0, fs)
        out["flat_sec"] = time.monotonic() - t0

        # bucketed: init, then one epoch = touched-bucket rewrite
        bk_dir = base + "/bk"
        brep = BucketedReplica(spark, bk_dir, buckets, ["id"], DDL)
        brep.init(table)
        t0 = time.monotonic()
        man = brep.manifest_for_epoch(0)
        touched = brep.touched_ids(batch)
        rep_t = brep.read(man, touched)
        new_t = rep_t.join(F.broadcast(keys), ["id"], "left_anti").unionByName(batch)
        brep.commit(new_t, touched, man, 0)
        out["bucketed_sec"] = time.monotonic() - t0
        out["touched_buckets"] = len(touched)

        # parity of the advanced replica contents
        got = (
            brep.read(brep.current_manifest(), None)
            .orderBy("id")
            .agg(F.count("*"), F.sum(F.hash("id", "grp", "v").cast("long")))
            .collect()[0]
        )
        want = (
            spark.read.schema(DDL)
            .parquet(flat_dir + "/v1")
            .agg(F.count("*"), F.sum(F.hash("id", "grp", "v").cast("long")))
            .collect()[0]
        )
        out["parity"] = tuple(got) == tuple(want)
        table.unpersist(), batch.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main():
    import math

    spark = get_spark("bk_probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    n = int(os.environ.get("PROBE_N", 2_000_000))
    r1 = probe(spark, n)
    r10 = probe(spark, n * 10)
    res = {
        "n": n,
        "r1": r1,
        "r10": r10,
        "flat_exponent": round(math.log10(r10["flat_sec"] / r1["flat_sec"]), 3),
        "bucketed_exponent": round(
            math.log10(r10["bucketed_sec"] / r1["bucketed_sec"]), 3
        ),
        "parity": r1["parity"] and r10["parity"],
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
