"""Profile one registered query: run it through the noop sink with the
Spark event log on, then break its wall time into Spark-job time vs
driver-side gaps (planning, py4j, filesystem protocol work).

Usage: python scripts/profile_query.py <query_name> [sf_dir]

Prints per-job durations (with the first stage name as a hint) and the
gap timeline, so optimization targets the real cost (guide §1: measure
first; §7.3: when nothing runs, the driver is doing something).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    evdir = tempfile.mkdtemp(prefix="spark_events_")

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    from pyspark.sql import SparkSession

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_lite_spark.queries import REGISTRY

    # warm run (JIT, workers) unless --cold
    runs = 2 if "--cold" not in sys.argv else 1
    for i in range(runs):
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        print(f"run {i}: {wall:.2f}s")
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        if i < runs - 1:
            # mark the boundary so the parser can skip warmup events
            spark.sparkContext.setJobDescription(f"__boundary_{i}__")
            spark.range(1).count()
            spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: job spans + gaps (Spark may prefix/suffix the
    # app-id file name — take the newest regular file mentioning the id,
    # else the newest file at all)
    cands = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            cands.append(os.path.join(root, f))
    paths = [p for p in cands if os.path.basename(p).startswith("events")]
    if not paths:
        paths = [max(cands, key=os.path.getmtime)] if cands else []
    jobs = []  # (start_ms, end_ms, desc)
    pending = {}
    for path in sorted(paths):
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    desc = (props.get("spark.job.description") or "").splitlines()
                    desc = desc[0] if desc else ""
                    callsite = props.get("callSite.short", "")
                    pending[ev["Job ID"]] = (
                        ev["Submission Time"], desc or callsite
                    )
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in pending:
                        st, desc = pending.pop(jid)
                        jobs.append((jid, st, ev["Completion Time"], desc))
    jobs.sort(key=lambda j: j[1])

    # find the boundary job, keep everything after it
    cut = 0
    for i, (jid, st, en, desc) in enumerate(jobs):
        if "__boundary_" in desc:
            cut = i + 1
    jobs = jobs[cut:]
    if not jobs:
        print("no jobs captured")
        return

    total_span = (jobs[-1][2] - jobs[0][1]) / 1000.0
    job_time = sum(en - st for _, st, en, _ in jobs) / 1000.0
    print(f"\n=== measured span {total_span:.2f}s, sum(job wall) {job_time:.2f}s, "
          f"jobs {len(jobs)} ===")
    print("\n-- jobs over 100ms --")
    for jid, st, en, desc in jobs:
        d = (en - st) / 1000.0
        if d >= 0.1:
            print(f"  job {jid:4d}  {d:6.2f}s  {desc[:100]}")
    print("\n-- gaps over 100ms (driver-side) --")
    prev_end = jobs[0][1]
    gap_total = 0.0
    for jid, st, en, desc in jobs:
        gap = (st - prev_end) / 1000.0
        if gap >= 0.1:
            print(f"  gap {gap:6.2f}s before job {jid} ({desc[:80]})")
        if gap > 0:
            gap_total += gap
        prev_end = max(prev_end, en)
    # group by description (streaming batches fold to "batch N")
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0.0])

    def _label(desc: str) -> str:
        if desc.startswith("id = "):
            return "stream batch"
        return desc or "(unlabelled)"

    for _jid, st, en, desc in jobs:
        a = agg[_label(desc)]
        a[0] += 1
        a[1] += (en - st) / 1000.0
    print("\n-- job time by label --")
    for lbl, (n, secs) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {secs:7.2f}s  {n:4d} jobs  {lbl[:90]}")

    print(f"\ntotal gap time {gap_total:.2f}s; histogram of job durations:")
    buckets = {"<50ms": 0, "50-150ms": 0, "150-400ms": 0, ">400ms": 0}
    for _, st, en, _ in jobs:
        d = en - st
        if d < 50:
            buckets["<50ms"] += 1
        elif d < 150:
            buckets["50-150ms"] += 1
        elif d < 400:
            buckets["150-400ms"] += 1
        else:
            buckets[">400ms"] += 1
    print("  ", buckets)


if __name__ == "__main__":
    main()
