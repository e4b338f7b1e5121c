"""A PySpark Python Data Source for DuckDB database files.

The reference monitors tables inside a ``.duckdb`` file
(/root/reference/pkg/duckdb/duckdb_cdc.go:34-40); this source gives the
Spark engine the same input surface:

    spark.dataSource.register(DuckDBDataSource)
    df = (spark.read.format("duckdb")
          .option("path", "/data/app.duckdb")
          .option("table", "users").load())

Reference-faithful details:

- **Snapshot isolation by file copy** (op A4, duckdb_cdc.go:100-124): DuckDB
  allows one writer OR many readers — a read_only open fails while an
  external process holds the write lock, which is exactly why the reference
  copies the file before every read.  ``snapshot=true`` (default) makes ONE
  copy per scan at plan time; every task reads that same copy, so the scan
  observes a single consistent database state even under a live writer.
  CAVEAT: Spark calls ``partitions()`` once per DataFrame lifetime, so the
  same DataFrame object keeps re-reading its FIRST snapshot copy on every
  later action — it never sees subsequent external writes.  A polling
  consumer must build a fresh DataFrame per tick; ``CdcEngine`` accepts a
  zero-arg factory as the monitored source exactly for this
  (engine.py ``_resolve``, cli.py ``_sources``).
- **Partitioned scan**: rows split into ``partitions`` ranges on DuckDB's
  ``rowid`` pseudo-column bounded by min..max+1 (rowids keep gaps after
  deletes — count-based bounds would truncate), so the scan parallelizes
  across executors; each task opens its own read-only connection to the
  shared snapshot copy.
- **Arrow transport**: each partition yields pyarrow record batches —
  columnar all the way into Spark.

Scale note: this source is for modest operational databases (the
reference's use case — a single-file OLTP-ish DB).  The 100 TB path remains
parquet/lakehouse; the value here is monitoring parity, not bulk IO.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_TYPE_MAP = {
    "BOOLEAN": "boolean",
    "TINYINT": "byte",
    "SMALLINT": "short",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "decimal(38,0)",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BLOB": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}


def _duck_type_to_spark(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t.lower()
    return _TYPE_MAP.get(t, "string")


def _snapshot_copy(path: str) -> str:
    """A4: byte-copy the DB so reads never contend with the writer lock
    (reference naming: ``<src>.tmp.<unixnano>``, duckdb_cdc.go:101)."""
    dst = os.path.join(
        tempfile.gettempdir(), f"{os.path.basename(path)}.tmp.{uuid.uuid4().hex}"
    )
    shutil.copyfile(path, dst)
    return dst


_SNAPSHOT_SUFFIX = ".cdcsnap."


def _sweep_copies(d: str, prefix: str, keep: str | None = None) -> None:
    """Best-effort unlink of every file in ``d`` whose name starts with
    ``prefix``, sparing ``keep`` — the shared GC loop behind both the
    per-plan and the per-tick snapshot copies."""
    for f in os.listdir(d or "."):
        full = os.path.join(d, f)
        if f.startswith(prefix) and full != keep:
            try:
                os.unlink(full)
            except OSError:
                pass


def _plan_snapshot_copy(path: str) -> str:
    """One copy per *scan plan*, made next to the source file so the path
    resolves on every executor when the source sits on a shared filesystem
    (driver-local /tmp would not).  All tasks of the scan read this single
    copy, so the scan observes one consistent database state — the same
    guarantee the reference gets from its single per-tick copy
    (duckdb_cdc.go:100-124).  Stale copies from earlier scans are
    garbage-collected on the next plan (best-effort — a copy still being
    read by a running scan is never older than its own plan); the current
    copy is removed at driver exit."""
    import atexit

    d, base = os.path.split(path)
    _sweep_copies(d, base + _SNAPSHOT_SUFFIX)
    dst = os.path.join(d, f"{base}{_SNAPSHOT_SUFFIX}{uuid.uuid4().hex}")
    shutil.copyfile(path, dst)
    atexit.register(lambda p=dst: os.path.exists(p) and os.unlink(p))
    return dst


class _RowRange(InputPartition):
    def __init__(self, lo: int, hi: int, read_path: str):
        self.lo = lo
        self.hi = hi
        self.read_path = read_path  # the plan-time snapshot copy (or live file)


class DuckDBReader(DataSourceReader):
    def __init__(self, options: dict, schema_ddl: str):
        self.path = options["path"]
        self.table = options["table"]
        self.snapshot = str(options.get("snapshot", "true")).lower() == "true"
        self.n_partitions = int(options.get("partitions", "4"))
        self.schema_ddl = schema_ddl

    def partitions(self):
        """Split on DuckDB's ``rowid`` pseudo-column, bounded by
        min(rowid)..max(rowid)+1 — NOT count(*): rowids are physical and
        keep gaps after DELETEs, so count-based bounds silently truncate
        any table that has ever seen a delete.  Gappy ranges only skew
        partition sizes; they never drop rows."""
        import duckdb

        read_path = _plan_snapshot_copy(self.path) if self.snapshot else self.path
        con = duckdb.connect(read_path, read_only=True)
        try:
            lo, hi = con.execute(
                f'SELECT min(rowid), max(rowid) FROM "{self.table}"'
            ).fetchone()
        finally:
            con.close()
        if lo is None:  # empty table
            return [_RowRange(0, 0, read_path)]
        end = hi + 1
        span = end - lo
        chunk = max(1, (span + self.n_partitions - 1) // self.n_partitions)
        return [
            _RowRange(start, min(start + chunk, end), read_path)
            for start in range(lo, end, chunk)
        ]

    def read(self, partition: _RowRange):
        import duckdb

        con = duckdb.connect(partition.read_path, read_only=True)
        try:
            if partition.hi > partition.lo:
                # every task reads the same plan-time snapshot copy, so the
                # rowid ranges are consistent across the whole scan
                reader = con.execute(
                    f'SELECT * FROM "{self.table}" WHERE rowid >= {partition.lo} '
                    f"AND rowid < {partition.hi}"
                ).fetch_record_batch()
                yield from reader
        finally:
            con.close()


class DuckDBStreamReader(SimpleDataSourceStreamReader):
    """Incremental APPEND-ONLY streaming source: each micro-batch emits the
    rows appended since the last offset (offset = max rowid + 1 observed).

    This is strictly stronger than the reference's whole-table re-emit for
    append-only workloads (event logs, immutable facts): per tick it reads
    only the delta, not O(table).  Updates/deletes still need the
    fingerprint+diff path (CdcEngine) — rowids only grow on append.

    Each poll uses the same A4 snapshot copy, so reads never contend with
    the live writer.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.table = options["table"]

    def _with_connection(self):
        copy = _snapshot_copy(self.path)
        import duckdb

        return duckdb.connect(copy, read_only=True), copy

    def initialOffset(self) -> dict:
        return {"next_rowid": 0}

    def _rows_between(self, lo: int, hi: int | None):
        con, copy = self._with_connection()
        try:
            pred = f"rowid >= {lo}" + (f" AND rowid < {hi}" if hi is not None else "")
            rows = con.execute(
                f'SELECT rowid AS __rid, * FROM "{self.table}" WHERE {pred} ORDER BY rowid'
            ).fetchall()
        finally:
            con.close()
            os.unlink(copy)
        return rows

    def read(self, start: dict):
        rows = self._rows_between(start["next_rowid"], None)
        if not rows:
            return iter([]), start
        next_off = {"next_rowid": rows[-1][0] + 1}
        # a LIST iterator, not a generator: the prefetch wrapper both calls
        # next() on it (so a bare list fails) and pickles it into the input
        # partition (so a generator fails)
        return iter([tuple(r[1:]) for r in rows]), next_off

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = self._rows_between(start["next_rowid"], end["next_rowid"])
        return iter([tuple(r[1:]) for r in rows])


class DuckDBDataSource(DataSource):
    """``format("duckdb")`` — options: path, table, snapshot (default true),
    partitions (default 4).  Batch reads via ``spark.read``; append-only
    incremental streaming via ``spark.readStream``."""

    @classmethod
    def name(cls) -> str:
        return "duckdb"

    def schema(self) -> str:
        import duckdb

        # snapshot=false means the caller vouches the file is immutable /
        # uncontended (e.g. it IS already a tick copy) — probing it
        # directly avoids a second O(db) byte-copy per table per tick
        live = str(self.options.get("snapshot", "true")).lower() == "true"
        copy = _snapshot_copy(self.options["path"]) if live else self.options["path"]
        try:
            con = duckdb.connect(copy, read_only=True)
            try:
                cols = con.execute(f'DESCRIBE "{self.options["table"]}"').fetchall()
            finally:
                # a leaked read-only handle would pin the shared tick copy
                # (or block a writer on a caller-vouched live file)
                con.close()
        finally:
            if live:
                os.unlink(copy)
        fields = ", ".join(f"{c[0]} {_duck_type_to_spark(c[1])}" for c in cols)
        return fields

    def reader(self, schema) -> DuckDBReader:
        return DuckDBReader(self.options, schema)

    def simpleStreamReader(self, schema) -> DuckDBStreamReader:
        return DuckDBStreamReader(self.options)


def register_duckdb_source(spark) -> None:
    spark.dataSource.register(DuckDBDataSource)


def read_duckdb_table(spark, path: str, table: str, partitions: int = 4):
    """Convenience: one monitored DuckDB table as a DataFrame."""
    register_duckdb_source(spark)
    return (
        spark.read.format("duckdb")
        .option("path", path)
        .option("table", table)
        .option("partitions", str(partitions))
        .load()
    )


_TICK_SUFFIX = ".cdctick."


class ConsistentSnapshotSource:
    """One database copy per TICK, shared by every monitored table — the
    reference's cross-table consistency model (duckdb_cdc.go:100-124: the
    monitor loop copies once, then checks ALL tables against that copy).

    Per-table factories (`read_duckdb_table` per tick) are per-SCAN
    snapshots: each table's fingerprint can observe a different database
    version within one tick, so a writer transaction touching two tables
    can be captured half-applied — orders showing a row whose customer the
    same tick's customer snapshot doesn't have yet.  This provider pins
    every table of a tick to the same byte-copy instead.

    Protocol: ``sources(tables)`` returns the per-table factory dict the
    engine expects; each factory carries a ``tick_provider`` attribute and
    ``CdcEngine.poll_once`` calls ``begin_tick()`` once per distinct
    provider at the top of each tick (factories also self-start the first
    tick, so the provider works with a bare manual ``_resolve`` too).

    The copy lands next to the source file (shared-fs visible to
    executors, like the per-plan copy), with the previous tick's copy
    removed on the next ``begin_tick`` and the last one at driver exit;
    copies orphaned by crashed runs are swept on the next ``begin_tick``.
    One provider per database path per host — the orphan sweep assumes any
    tick copy it didn't make is stale (two concurrent monitors of one DB
    file is a deployment error regardless).
    Scale note: as with the rest of this source, this is for modest
    operational databases — the copy is O(db file) per tick by design,
    exactly like the reference."""

    def __init__(self, spark, path: str, partitions: int = 4):
        import atexit
        import threading

        register_duckdb_source(spark)
        self.spark = spark
        self.path = path
        self.partitions = partitions
        self._copy: str | None = None
        # serializes begin_tick against factory self-starts: poll_once with
        # parallelism>1 resolves factories from a thread pool, and after a
        # FAILED advance (which is per-tick isolated, engine.py) several
        # factories would otherwise race begin_tick — one thread's sweep
        # could unlink another's fresh copy, or two tables could bind to
        # two different database versions within one tick
        self._lock = threading.Lock()
        atexit.register(self.close)

    def begin_tick(self) -> str:
        """Make this tick's copy; the previous tick's copy is dropped (any
        in-flight scan of it has already materialized its tasks).  Copies
        orphaned by CRASHED runs (atexit never fired) are swept here too —
        anything with this base's tick suffix that isn't the live copy is
        stale, same discipline as the per-plan copy GC."""
        with self._lock:
            return self._begin_tick_locked()

    def _begin_tick_locked(self) -> str:
        d, base = os.path.split(self.path)
        _sweep_copies(d, base + _TICK_SUFFIX, keep=self._copy)
        dst = os.path.join(d, f"{base}{_TICK_SUFFIX}{uuid.uuid4().hex}")
        shutil.copyfile(self.path, dst)
        old, self._copy = self._copy, dst
        if old is not None:
            try:
                os.unlink(old)
            except OSError:
                pass
        return dst

    def table(self, name: str):
        def factory() -> "DataFrame":  # noqa: F821 — pyspark DataFrame
            with self._lock:
                # self-start double-checked under the lock: the first
                # factory of an unadvanced provider makes the copy, the
                # rest reuse it
                if self._copy is None:
                    self._begin_tick_locked()
            return (
                self.spark.read.format("duckdb")
                .option("path", self._copy)
                .option("table", name)
                # the tick copy is already immutable: read it directly,
                # don't snapshot the snapshot
                .option("snapshot", "false")
                .option("partitions", str(self.partitions))
                .load()
            )

        factory.tick_provider = self
        return factory

    def sources(self, tables: list[str]) -> dict:
        return {t: self.table(t) for t in tables}

    def close(self) -> None:
        with self._lock:
            if self._copy is not None:
                try:
                    os.unlink(self._copy)
                except OSError:
                    pass
                self._copy = None
