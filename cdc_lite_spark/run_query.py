"""Run any registered query from the command line.

    python -m cdc_lite_spark.run_query <name> [--sf-dir DIR] [--out PATH]
                                              [--format parquet|json|csv]
                                              [--show N] [--explain]
    python -m cdc_lite_spark.run_query --list

Writes the result to ``--out`` (directory, Spark writer semantics) or shows
the first ``--show`` rows; ``--explain`` prints the formatted physical plan
instead of executing.  This is the ad-hoc face of the engine — the same
registry the driver verifies, runnable by hand against any SF directory.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cdc_lite_spark.run_query", description=__doc__)
    p.add_argument("name", nargs="?", help="registered query name")
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    p.add_argument("--out", default=None, help="output path (Spark writer)")
    p.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])
    p.add_argument("--show", type=int, default=20, help="rows to print when no --out")
    p.add_argument("--explain", action="store_true", help="print the plan, don't run")
    args = p.parse_args(argv)

    from cdc_lite_spark.queries import REGISTRY

    if args.list:
        for name, d in REGISTRY.items():
            oracle = "oracle" if d.oracle else "rows-only"
            print(f"{name:36s} [{oracle}] {d.description}")
        return 0

    if not args.name:
        p.error("query name required (or --list)")
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; --list shows the registry", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from cdc_lite_spark.session import get_spark

    # only stop a session we created — a caller's (or test harness's)
    # active session must survive this function
    owns_spark = SparkSession.getActiveSession() is None
    spark = get_spark("cdc_lite_spark_run_query")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.name].builder(spark, args.sf_dir)

    if args.explain:
        from cdc_lite_spark.plans.inspect import explain_str

        print(explain_str(df))
    elif args.out:
        df.write.format(args.format).mode("overwrite").save(args.out)
        print(f"{args.name}: wrote {args.out} ({args.format})")
    else:
        df.show(args.show, truncate=False)
    if owns_spark:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
