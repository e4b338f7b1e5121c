"""Shared versioned-parquet state protocol for foreachBatch-maintained
aggregate tables (the novelty / sketch / anomaly streams).

Contract (documented in full in novelty_stream.py, the original):
- state lives as ``<state_dir>/v{N}`` parquet dirs plus an atomically
  swapped ``_CURRENT`` pointer file;
- epoch ``e`` always merges into the exact version it originally saw —
  ``v{e}`` when it still exists, else the current pointer — so a REPLAYED
  epoch rewrites a bit-identical ``v{e+1}`` instead of double-folding;
- every epoch (including empty ones) must write ``v{e+1}`` or the version
  chain breaks and the replay fallback silently reads post-fold state;
- superseded versions older than the replayable epoch are GC'd.

One implementation so a protocol fix lands everywhere at once (r5 review:
the helpers had been triplicated and the third copy drifted).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def repoint(state_dir: str, version: str) -> None:
    """Atomically swing the ``_CURRENT`` pointer to ``version``."""
    tmp = os.path.join(state_dir, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(state_dir, "_CURRENT"))


def current(state_dir: str) -> str:
    with open(os.path.join(state_dir, "_CURRENT")) as f:
        return f.read().strip()


def read_current(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, current(state_dir)))


def read_for_epoch(spark: SparkSession, state_dir: str, epoch: int) -> DataFrame:
    """The state version epoch ``epoch`` must merge into: ``v{epoch}`` when
    present (replay safety), else whatever ``_CURRENT`` points at."""
    versioned = os.path.join(state_dir, f"v{epoch}")
    if os.path.isdir(versioned):
        return spark.read.parquet(versioned)
    return read_current(spark, state_dir)


def commit_version(state: DataFrame, state_dir: str, epoch: int) -> str:
    """Write epoch ``epoch``'s RESULT as ``v{epoch+1}``, swing the pointer,
    and GC versions a replay of this epoch can no longer read.  Returns the
    new version name."""
    new_version = f"v{epoch + 1}"
    state.write.mode("overwrite").parquet(os.path.join(state_dir, new_version))
    repoint(state_dir, new_version)
    for name in os.listdir(state_dir):
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) < epoch:
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    return new_version


__all__ = ["commit_version", "current", "read_current", "read_for_epoch", "repoint"]
