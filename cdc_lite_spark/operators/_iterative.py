"""Block-hygiene helpers for iterative DataFrame operators.

``localCheckpoint`` is the right tool for flattening an iterative plan
(Pregel-style label propagation, Lloyd iterations): it truncates lineage so
iteration *i* doesn't re-derive iterations 0..i-1.  But its storage is an
RDD-level persist that ``DataFrame.unpersist()`` does NOT release (that API
only talks to the SQL CacheManager), so a converged loop leaves every
superseded iteration's blocks pinned in executor memory for the life of the
session.  These helpers release them by RDD id: snapshot the persistent-RDD
ids before the loop, then free everything new except the blocks backing the
returned result (RDD ids are monotonically increasing, so "the result" is
the highest new id).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Snapshot of currently-persisted RDD ids (includes checkpoint blocks)."""
    try:
        return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keys()}
    except Exception:  # pragma: no cover — py4j access is best-effort
        return set()


def free_new_checkpoints(spark: SparkSession, before: set[int], keep_latest: int = 1) -> None:
    """Unpersist persistent RDDs created since the ``before`` snapshot,
    keeping the ``keep_latest`` highest ids (the result's backing blocks)."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        new = sorted(int(k) for k in jmap.keys() if int(k) not in before)
        drop = new[:-keep_latest] if keep_latest > 0 else new
        for rid in drop:
            jmap[rid].unpersist()
    except Exception:  # pragma: no cover
        pass
