"""The shared versioned-state protocol (streaming/_state.py) — pointer
atomicity, replay reads, version-chain commits, and GC boundaries, tested
directly (the three streams built on it pin end-to-end behavior; these pin
the protocol itself)."""

from __future__ import annotations

import os

from cdc_lite_spark.streaming._state import (
    commit_version,
    current,
    read_current,
    read_for_epoch,
    repoint,
)


def _df(spark, n):
    return spark.range(n).toDF("v")


def test_pointer_swap_and_reads(spark, tmp_path):
    sd = str(tmp_path)
    _df(spark, 3).write.parquet(os.path.join(sd, "v0"))
    repoint(sd, "v0")
    assert current(sd) == "v0"
    assert read_current(spark, sd).count() == 3
    # epoch 0 reads v0 (versioned hit), epoch 7 falls back to _CURRENT
    assert read_for_epoch(spark, sd, 0).count() == 3
    assert read_for_epoch(spark, sd, 7).count() == 3


def test_commit_chain_and_gc_keeps_replay_version(spark, tmp_path):
    """commit_version(e) writes v{e+1}, repoints, and GCs only versions a
    replay of epoch e can no longer need — v{e} itself must survive so a
    replay of e still reads its original input."""
    sd = str(tmp_path)
    _df(spark, 1).write.parquet(os.path.join(sd, "v0"))
    repoint(sd, "v0")
    for epoch in range(3):
        commit_version(_df(spark, epoch + 2), sd, epoch)
    assert current(sd) == "v3"
    versions = sorted(n for n in os.listdir(sd) if n.startswith("v"))
    # epoch 2 just committed: v2 (its replay input) and v3 survive; v0/v1 GC'd
    assert versions == ["v2", "v3"]
    assert read_for_epoch(spark, sd, 2).count() == 3  # replay of epoch 2 -> v2
    assert read_current(spark, sd).count() == 4


def test_replayed_commit_rewrites_identically(spark, tmp_path):
    """Re-committing the same epoch with the same result overwrites
    v{e+1} in place — the bit-identical-rewrite contract."""
    sd = str(tmp_path)
    _df(spark, 2).write.parquet(os.path.join(sd, "v0"))
    repoint(sd, "v0")
    commit_version(_df(spark, 5), sd, 0)
    first = sorted(r["v"] for r in read_current(spark, sd).collect())
    commit_version(_df(spark, 5), sd, 0)  # replay
    assert current(sd) == "v1"
    assert sorted(r["v"] for r in read_current(spark, sd).collect()) == first
