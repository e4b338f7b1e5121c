"""The shared versioned-state protocol (streaming/_state.py) — pointer
atomicity, replay reads, version-chain commits, and GC boundaries, tested
directly (the three streams built on it pin end-to-end behavior; these pin
the protocol itself).  Every test runs against BOTH filesystem adapters:
the POSIX default and the Hadoop FileSystem one (over Hadoop's local FS
here — the same JVM code path an hdfs:// or s3a:// state dir takes)."""

from __future__ import annotations

import os

import pytest

from cdc_lite_spark.streaming._state import (
    HadoopStateFS,
    LocalStateFS,
    commit_version,
    current,
    fs_for,
    read_current,
    read_for_epoch,
    repoint,
)


def _df(spark, n):
    return spark.range(n).toDF("v")


@pytest.fixture(params=["local", "hadoop"])
def state_fs(request, spark):
    return LocalStateFS() if request.param == "local" else HadoopStateFS(spark)


def test_pointer_swap_and_reads(spark, tmp_path, state_fs):
    sd = str(tmp_path)
    _df(spark, 3).write.parquet(os.path.join(sd, "v0"))
    repoint(sd, "v0", fs=state_fs)
    assert current(sd, fs=state_fs) == "v0"
    assert read_current(spark, sd, fs=state_fs).count() == 3
    # epoch 0 reads v0 (versioned hit), epoch 7 falls back to _CURRENT
    assert read_for_epoch(spark, sd, 0, fs=state_fs).count() == 3
    assert read_for_epoch(spark, sd, 7, fs=state_fs).count() == 3


def test_pointer_overwrite_swap(spark, tmp_path, state_fs):
    """Repointing over an EXISTING pointer must replace it (the Hadoop
    adapter's rename needs the OVERWRITE option for this — a plain
    FileSystem.rename fails when the destination exists)."""
    sd = str(tmp_path)
    repoint(sd, "v0", fs=state_fs)
    repoint(sd, "v1", fs=state_fs)
    assert current(sd, fs=state_fs) == "v1"
    # and the two adapters read each other's pointer files
    other = LocalStateFS() if isinstance(state_fs, HadoopStateFS) else fs_for(sd)
    assert current(sd, fs=other) == "v1"


def test_commit_chain_and_gc_keeps_replay_version(spark, tmp_path, state_fs):
    """commit_version(e) writes v{e+1}, repoints, and GCs only versions a
    replay of epoch e can no longer need — v{e} itself must survive so a
    replay of e still reads its original input."""
    sd = str(tmp_path)
    _df(spark, 1).write.parquet(os.path.join(sd, "v0"))
    repoint(sd, "v0", fs=state_fs)
    for epoch in range(3):
        commit_version(_df(spark, epoch + 2), sd, epoch, fs=state_fs)
    assert current(sd, fs=state_fs) == "v3"
    versions = sorted(n for n in os.listdir(sd) if n.startswith("v"))
    # epoch 2 just committed: v2 (its replay input) and v3 survive; v0/v1 GC'd
    assert versions == ["v2", "v3"]
    assert read_for_epoch(spark, sd, 2, fs=state_fs).count() == 3  # replay of epoch 2 -> v2
    assert read_current(spark, sd, fs=state_fs).count() == 4


def test_replayed_commit_rewrites_identically(spark, tmp_path, state_fs):
    """Re-committing the same epoch with the same result overwrites
    v{e+1} in place — the bit-identical-rewrite contract."""
    sd = str(tmp_path)
    _df(spark, 2).write.parquet(os.path.join(sd, "v0"))
    repoint(sd, "v0", fs=state_fs)
    commit_version(_df(spark, 5), sd, 0, fs=state_fs)
    first = sorted(r["v"] for r in read_current(spark, sd, fs=state_fs).collect())
    commit_version(_df(spark, 5), sd, 0, fs=state_fs)  # replay
    assert current(sd, fs=state_fs) == "v1"
    assert sorted(r["v"] for r in read_current(spark, sd, fs=state_fs).collect()) == first


def test_fs_for_scheme_routing(spark):
    assert isinstance(fs_for("/tmp/x"), LocalStateFS)
    assert isinstance(fs_for("file:///tmp/x"), LocalStateFS)
    assert isinstance(fs_for("hdfs://nn:8020/state", spark), HadoopStateFS)
    assert isinstance(fs_for("s3a://bucket/state", spark), HadoopStateFS)


@pytest.mark.parametrize("prefix", ["file://", "file:"])
def test_protocol_over_file_scheme_uri(spark, tmp_path, prefix):
    """r6 advice (medium): a ``file:`` state dir routes to LocalStateFS,
    which must strip the scheme before POSIX ops — the full protocol
    (pointer swap, replay read, commit chain + GC) over a file: URI."""
    sd = prefix + str(tmp_path)
    _df(spark, 3).write.parquet(sd + "/v0")
    repoint(sd, "v0")
    assert current(sd) == "v0"
    assert read_current(spark, sd).count() == 3
    assert read_for_epoch(spark, sd, 0).count() == 3
    for epoch in range(3):
        commit_version(_df(spark, epoch + 2), sd, epoch)
    assert current(sd) == "v3"
    versions = sorted(n for n in os.listdir(tmp_path) if n.startswith("v"))
    assert versions == ["v2", "v3"]
    assert read_for_epoch(spark, sd, 2).count() == 3


def test_hadoop_read_pointer_empty_file_raises_clearly(spark, tmp_path):
    """r6 advice (low): an empty/truncated _CURRENT must surface as a
    ValueError naming the state dir, not an opaque AttributeError on the
    Java null."""
    sd = str(tmp_path)
    (tmp_path / "_CURRENT").write_text("")
    with pytest.raises(ValueError, match="_CURRENT"):
        HadoopStateFS(spark).read_pointer(sd)


def test_local_read_pointer_empty_file_raises_clearly(tmp_path):
    """r7 review: the same corrupt-pointer guard on the POSIX adapter —
    an empty _CURRENT used to return '' and send spark.read.parquet at
    the state-dir root (opaque schema-inference failure)."""
    (tmp_path / "_CURRENT").write_text("")
    with pytest.raises(ValueError, match="_CURRENT"):
        LocalStateFS().read_pointer(str(tmp_path))


def test_missing_pointer_raises_typed_filenotfound(spark, tmp_path, state_fs):
    """r7 verdict nit: a MISSING _CURRENT pointer is a typed
    ``FileNotFoundError`` on BOTH adapters — the Hadoop one normalizes the
    JVM FileNotFoundException by exception class (never by message text),
    so callers like the engine's view-spec reader branch on the type."""
    with pytest.raises(FileNotFoundError):
        state_fs.read_pointer(str(tmp_path))


def test_hadoop_missing_detection_matches_class_not_message(spark, tmp_path):
    """The class-name walk must not misclassify an unrelated JVM error
    whose MESSAGE happens to mention FileNotFoundException."""

    class FakeJavaExc:
        def __init__(self, name, cause=None):
            self._name, self._cause = name, cause

        def getClass(self):
            outer = self

            class C:
                def getName(self):
                    return outer._name

            return C()

        def getCause(self):
            return self._cause

    class FakeErr(Exception):
        def __init__(self, java_exception):
            self.java_exception = java_exception

    is_missing = HadoopStateFS._is_missing_file
    assert is_missing(FakeErr(FakeJavaExc("java.io.FileNotFoundException")))
    # wrapped one level down the cause chain
    assert is_missing(
        FakeErr(
            FakeJavaExc(
                "java.io.IOException",
                cause=FakeJavaExc("java.io.FileNotFoundException"),
            )
        )
    )
    # message-only mention (class is RuntimeException): NOT missing
    assert not is_missing(FakeErr(FakeJavaExc("java.lang.RuntimeException")))
    assert not is_missing(ValueError("java.io.FileNotFoundException: /x"))


def test_uppercase_file_scheme_is_stripped(tmp_path):
    """r7 review: scheme routing lowercases ('FILE://x' -> LocalStateFS)
    but _local_path's strip was case-sensitive, so the raw URI reached
    open() — the exact failure class the helper exists to prevent."""
    sd = "FILE://" + str(tmp_path)
    assert isinstance(fs_for(sd), LocalStateFS)
    repoint(sd, "v7")
    assert current(sd) == "v7"


def test_schema_passthrough_on_reads(spark, tmp_path):
    sd = str(tmp_path)
    _df(spark, 2).write.parquet(sd + "/v0")
    repoint(sd, "v0")
    got = read_current(spark, sd, schema="v long")
    assert got.schema.simpleString() == "struct<v:bigint>"
    assert read_for_epoch(spark, sd, 0, schema="v long").count() == 2


def test_fs_for_resolves_schemeless_paths_like_spark_does(spark, tmp_path):
    """r8 review: a scheme-less state dir must route the pointer protocol
    to the SAME filesystem Spark's parquet writes resolve to (fs.defaultFS)
    — on a cluster whose defaultFS is HDFS, LocalStateFS would strand every
    pointer on driver-local disk while the state parquet lands on the DFS."""
    conf = spark._jsc.hadoopConfiguration()
    orig = conf.get("fs.defaultFS", "file:///")
    try:
        # local-session default: scheme-less → POSIX fast path
        conf.set("fs.defaultFS", "file:///")
        assert isinstance(fs_for(str(tmp_path), spark), LocalStateFS)
        # cluster shape: defaultFS remote → Hadoop adapter for the same path
        conf.set("fs.defaultFS", "hdfs://nn:8020")
        assert isinstance(fs_for(str(tmp_path), spark), HadoopStateFS)
        # explicit schemes are never re-routed
        assert isinstance(fs_for(f"file://{tmp_path}", spark), LocalStateFS)
        assert isinstance(fs_for("s3a://bucket/state", spark), HadoopStateFS)
    finally:
        conf.set("fs.defaultFS", orig)
