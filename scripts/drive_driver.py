"""Driver simulation: run registered queries against their DuckDB oracles at
sf0.01 exactly as the round driver does (rows + sorted columns + value
multiset), plus the entry() smoke check.

Usage:
    python scripts/drive_driver.py                 # first 50 (the driver window)
    python scripts/drive_driver.py q1 q2 ...       # scoped re-verify of named queries
    SPARK_GRAFT_SF_DIR=... python scripts/drive_driver.py

Cell canonicalization delegates to cdc_lite_spark.oracle (arrays recurse;
DuckDB numpy cells and Spark lists must canonicalize identically).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

from cdc_lite_spark.oracle import compare_query, duck_connection  # noqa: E402
from cdc_lite_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("drive_driver", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(sf)

    names = sys.argv[1:] or list(entrymod.queries())[:50]
    oracles = entrymod.oracle_sql()
    fails: list[tuple[str, str]] = []
    for name in names:
        if name not in oracles:
            try:
                n = entrymod.queries()[name](spark, sf).count()
                print(f"{name}: rows-only ({n})")
            except Exception as exc:  # noqa: BLE001
                fails.append((name, f"EXC {exc}"))
            continue
        ok, msg = compare_query(spark, duck, name, sf)
        print(f"{name}: {'OK' if ok else 'FAIL'} ({msg})")
        if not ok:
            fails.append((name, msg))

    df = entrymod.entry(spark)
    print(f"entry(): {df.count()} rows, schema {[f.name for f in df.schema.fields]}")
    print(f"\n{len(names) - len(fails)}/{len(names)} pass")
    for n, m in fails:
        print("FAIL", n, str(m)[:300])
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
