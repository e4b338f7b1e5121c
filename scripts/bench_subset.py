"""Time a subset of registered queries with bench.py's exact methodology
(alphabetical order, noop sink, persistent-RDD cleanup between queries) —
for before/after comparisons of a family without paying the full 214-query
run.  Usage: python scripts/bench_subset.py <name...>"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sorted(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cdc_lite_spark.queries import REGISTRY
    from cdc_lite_spark.session import get_spark

    spark = get_spark("bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    # the same JVM warmup bench.py does, minus the niche families
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{dt:8.2f}  {name}", flush=True)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    print(f"{total:8.2f}  TOTAL")
    spark.stop()


if __name__ == "__main__":
    main()
