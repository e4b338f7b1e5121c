"""Run one maintenance gate with its temp state dirs KEPT and report the
part-file count per state version dir — the ls evidence for the
small-state file-count fix (r13 verdict item #2: tiny states written at
plan-output partitioning leave up to `cpus` near-empty part files per
version, and every later epoch lists and reads them back).

Usage: python scripts/probe_state_files.py <query_name> [sf_dir]

Works by monkeypatching tempfile.mkdtemp to remember created dirs and
shutil.rmtree to skip them until we've counted.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    import shutil
    import tempfile

    made: list[str] = []
    real_mkdtemp = tempfile.mkdtemp
    real_rmtree = shutil.rmtree

    def fake_mkdtemp(*a, **kw):
        d = real_mkdtemp(*a, **kw)
        made.append(d)
        return d

    def fake_rmtree(path, *a, **kw):
        if any(os.path.abspath(str(path)).startswith(m) for m in made):
            return  # keep for counting; cleaned at the end
        return real_rmtree(path, *a, **kw)

    tempfile.mkdtemp = fake_mkdtemp
    shutil.rmtree = fake_rmtree

    from cdc_lite_spark.queries import REGISTRY
    from cdc_lite_spark.session import get_spark

    spark = get_spark("probe_state_files")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    total_files = 0
    total_dirs = 0
    for root_dir in made:
        for cur, _dirs, files in os.walk(root_dir):
            parts = [f for f in files if f.startswith("part-")]
            if parts:
                total_dirs += 1
                total_files += len(parts)
                sizes = sorted(os.path.getsize(os.path.join(cur, f)) for f in parts)
                rel = os.path.relpath(cur, root_dir)
                print(
                    f"{len(parts):4d} files  min={sizes[0]:>8d}B "
                    f"max={sizes[-1]:>8d}B  {os.path.basename(root_dir)}/{rel}"
                )
    print(f"\nTOTAL {total_files} part files across {total_dirs} data dirs")

    shutil.rmtree = real_rmtree
    for d in made:
        real_rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
