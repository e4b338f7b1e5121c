"""Hash-bucketed replica layout: bound the changelog view stream's only
table-sized write (r9 verdict ask #5).

The flat replica rewrites O(table) parquet per changed epoch (view_stream
step 4).  This layout hash-partitions the replica into ``n`` key buckets
(``pmod(xxhash64(key), n)`` — the operators/layout.py bucketing
discipline) so an epoch rewrites ONLY the buckets its batch keys touch:
epoch write cost is ``O(batch + touched_buckets · table/n)`` and the
enrichment READ prunes to the same touched buckets.  With batch ≪ table
and n sized so a bucket fits a task, the epoch cost is batch-proportional
— the probe in scripts/probe_bucketed_replica.py measures the exponent.

Layout under one replica root::

    <dir>/e{K}/__b={b}/part-*.parquet   bucket b's content, written at epoch K-1's commit
    <dir>/m{K}.json                     manifest: epoch K's committed state
    <dir>/_CURRENT                      names the current manifest file

A manifest maps bucket id → the ``e{K}`` dir holding its current content
(absent id = empty bucket).  Commit of epoch ``e`` writes the touched
buckets' NEW content in ONE partitioned job to a NEVER-BEFORE-USED epoch
dir ((max existing e-index)+1 — fresh names can never alias a dir a live
manifest still references, whatever mix of replays and fresh-checkpoint
redrains produced the on-disk state), writes ``m{e+1}.json`` whose
untouched entries carry forward, and atomically repoints ``_CURRENT`` —
the pointer swap is the commit, exactly the versioned-parquet protocol
(streaming/_state.py) with a manifest where the version name used to be.

Exactly-once: epoch ``e`` reads ``m{e}.json`` when it exists (replay
safety — the replayed epoch sees its original basis and rewrites the
SAME state content, under a fresh dir name; ``m{e+1}.json`` is
atomically overwritten to reference it and GC removes the orphan), else
``_CURRENT``.  GC after the pointer swap deletes bucket dirs referenced
by NEITHER ``m{e}`` nor ``m{e+1}`` nor the epoch's basis manifest (the
manifests a replay or in-flight lazy plan can still need), so an
untouched bucket's content lives on in its old ``e{K}`` dir exactly as
long as a manifest names it.

100 TB shape: ``n`` should scale with table size (table/n ≈ a task's
worth, e.g. 128-512 MB).  The touched-bucket read and the rewrite are one
job each; the manifest is O(n) JSON — driver-side but tiny (n ≤ 4096 is
plenty at 100 TB).  Skewed batches degrade gracefully: worst case every
bucket is touched and the epoch costs one flat rewrite, never more.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_lite_spark.streaming._state import fs_for

_BUCKET = "__b"

#: measured break-evens on the reference box (SCALING.md r10/r11 probes):
#: below ~10M rows the manifest/pointer overhead of a bucketed replica
#: exceeds the rewrite it saves; the dual-indexed join family's fixed
#: costs (four manifests, touched-id collects, two-stage pruned reads)
#: cross under the flat scan in the ~100M-fact class.
BREAK_EVEN_REPLICA_ROWS = 10_000_000
BREAK_EVEN_JOIN_FACTS = 100_000_000
#: size buckets as a task's worth of parquet (module docstring): n scales
#: with the table so a bucket stays a fixed chunk, capped at 4096 (the
#: manifest is O(n) driver-side JSON).
TARGET_BUCKET_BYTES = 256 << 20
MAX_BUCKETS = 4096


def suggest_layout(
    row_count: int,
    fan_out: "float | None" = None,
    row_bytes: int = 256,
    dim_rows: "int | None" = None,
) -> dict:
    """Recommend state-layout parameters from table statistics — the
    sizing knowledge of SCALING.md's probes as a callable (r11 verdict
    ask #6), so a 100 TB deployment does not have to excavate break-even
    tables from docs.

    ``row_count`` is the replicated table's rows (the FACT side for a
    join view); ``row_bytes`` its average encoded row width (Spark UI /
    parquet footer; default 256 — a TPC-H-ish wide row).  Pass
    ``fan_out`` (average facts per dim key) to also size the dual-indexed
    join family, and ``dim_rows`` to size the dim replica.

    Returns a dict of keyword-ready recommendations:

    - ``"replica"``: ``{"buckets": n | None, "why": ...}`` — for
      ``init_changelog_view(buckets=)`` and the engine's
      ``register_join_view(fact_buckets=)`` view state (same ~10M-row
      break-even class: both trade a whole-state rewrite for touched
      buckets + manifest IO);
    - ``"join"`` (with ``fan_out``): ``{"fact_buckets", "fk_buckets",
      "dim_buckets", "why"}`` for ``init_changelog_join_view`` — ``None``
      values mean flat is still cheaper at this size.

    All numbers are box-measured defaults, not laws: re-probe with
    ``scripts/probe_bucketed_replica.py`` / ``probe_dual_epoch.py`` /
    ``probe_engine_join_buckets.py`` when the storage or cluster profile
    differs materially."""
    if row_count < 0:
        raise ValueError(f"row_count must be >= 0, got {row_count}")
    if row_bytes <= 0:
        raise ValueError(f"row_bytes must be positive, got {row_bytes}")

    def _n(rows: int, rb: int) -> int:
        return max(8, min(MAX_BUCKETS, -(-rows * rb // TARGET_BUCKET_BYTES)))

    out: dict = {"rows": row_count}
    if row_count < BREAK_EVEN_REPLICA_ROWS:
        out["replica"] = {
            "buckets": None,
            "why": f"below the ~{BREAK_EVEN_REPLICA_ROWS:,}-row break-even "
                   "the manifest overhead exceeds the rewrite saved — flat",
        }
    else:
        out["replica"] = {
            "buckets": _n(row_count, row_bytes),
            "why": f"~{TARGET_BUCKET_BYTES >> 20} MB per bucket at "
                   f"{row_bytes} B/row",
        }
    if fan_out is not None:
        if not fan_out > 0:
            raise ValueError(f"fan_out must be positive, got {fan_out}")
        if row_count < BREAK_EVEN_JOIN_FACTS:
            out["join"] = {
                "fact_buckets": None,
                "fk_buckets": None,
                "dim_buckets": None,
                "why": f"below the ~{BREAK_EVEN_JOIN_FACTS:,}-fact "
                       "break-even the dual index's fixed costs exceed "
                       "the flat scan — flat",
            }
        else:
            postings = int(row_count / fan_out)  # distinct fks, narrow rows
            out["join"] = {
                "fact_buckets": _n(row_count, row_bytes),
                "fk_buckets": _n(max(postings, 1), 32),
                "dim_buckets": (
                    _n(dim_rows, row_bytes)
                    if dim_rows and dim_rows >= BREAK_EVEN_REPLICA_ROWS
                    else None
                ),
                "why": "fact/fk/dim sized independently; None = that side "
                       "stays flat at its size",
            }
    return out


class BucketedReplica:
    """One hash-bucketed replica under ``root`` with ``n`` buckets keyed by
    ``key_cols``.  All methods are driver-side plan builders except the
    tiny manifest/pointer I/O and the ``touched_ids`` collect (≤ n ids)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n: int,
        key_cols: list[str],
        schema_ddl: str,
    ):
        if not n > 0:
            raise ValueError(f"bucket count must be positive, got {n}")
        self.spark = spark
        self.root = root
        self.n = n
        self.key_cols = list(key_cols)
        self.schema_ddl = schema_ddl
        self.fs = fs_for(root, spark)

    # -- bucket id ------------------------------------------------------------

    def bucket_expr(self) -> F.Column:
        """Deterministic bucket of the key tuple.  xxhash64 is stable across
        sessions/partitionings; NULL key components hash via the null-safe
        string rendering so NULL-keyed rows land in one bucket."""
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in self.key_cols
        ]
        return F.pmod(F.xxhash64(F.concat_ws("\x1f", *parts)), F.lit(self.n)).cast(
            "int"
        )

    def touched_ids(self, batch: DataFrame) -> list[int]:
        """The bucket ids this batch's keys land in — one tiny distinct
        over the delta (≤ n rows collected)."""
        return sorted(
            r[0]
            for r in batch.select(self.bucket_expr().alias(_BUCKET))
            .distinct()
            .collect()
        )

    # -- manifests ------------------------------------------------------------

    def _manifest_path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _read_manifest_file(self, name: str) -> dict:
        import os

        from cdc_lite_spark.streaming._state import LocalStateFS, _local_path

        if isinstance(self.fs, LocalStateFS):
            with open(os.path.join(_local_path(self.root), name)) as f:
                return json.loads(f.read())
        # Hadoop adapter: the pointer reader IS a small-file reader — the
        # manifest protocol needs only read/write of tiny named files, so
        # a DFS deployment routes these two methods through it
        raise NotImplementedError(
            "remote manifest reads route through read_pointer-style IO; "
            "wire when a DFS deployment needs bucketed replicas"
        )

    def _write_manifest_file(self, name: str, manifest: dict) -> None:
        import os

        from cdc_lite_spark.streaming._state import LocalStateFS, _local_path

        if not isinstance(self.fs, LocalStateFS):
            raise NotImplementedError(
                "remote manifest writes route through write_pointer-style "
                "IO; wire when a DFS deployment needs bucketed replicas"
            )
        os.makedirs(_local_path(self.root), exist_ok=True)
        tmp = os.path.join(_local_path(self.root), name + ".tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(manifest, sort_keys=True))
        os.replace(tmp, os.path.join(_local_path(self.root), name))

    def manifest_for_epoch(self, epoch: int) -> dict:
        """The manifest epoch ``epoch`` must fold against: ``m{epoch}.json``
        when present (replay), else ``_CURRENT``'s manifest."""
        name = f"m{epoch}.json"
        try:
            return self._read_manifest_file(name)
        except FileNotFoundError:
            pass
        return self.current_manifest()

    def current_manifest(self) -> dict:
        return self._read_manifest_file(self.fs.read_pointer(self.root))

    # -- reads ----------------------------------------------------------------

    def _bucket_path(self, edir: str, b: int) -> str:
        return f"{self.root}/{edir}/{_BUCKET}={b}"

    def read(self, manifest: dict, bucket_ids: "list[int] | None") -> DataFrame:
        """Rows of the given buckets (``None`` = the whole replica) as of
        ``manifest``.  One multi-path parquet scan — no shuffle."""
        ids = (
            [int(b) for b in manifest["buckets"]]
            if bucket_ids is None
            else bucket_ids
        )
        paths = [
            self._bucket_path(manifest["buckets"][str(b)], b)
            for b in ids
            if str(b) in manifest["buckets"]
        ]
        reader = self.spark.read.schema(self.schema_ddl)
        if not paths:
            import pyspark.sql.types as T

            return self.spark.createDataFrame(
                [], T.StructType.fromDDL(self.schema_ddl)
            )
        return reader.parquet(*paths)

    # -- init / commit --------------------------------------------------------

    def init(self, rows: DataFrame) -> None:
        """Lay down epoch-0 state: every row written once, partitioned by
        bucket, under ``e0/``; manifest ``m0.json``; pointer."""
        (
            rows.withColumn(_BUCKET, self.bucket_expr())
            .repartition(_BUCKET)
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(f"{self.root}/e0")
        )
        manifest = {
            "gen": 0,
            "buckets": {str(b): "e0" for b in self._written_buckets("e0")},
        }
        self._write_manifest_file("m0.json", manifest)
        self.fs.write_pointer(self.root, "m0.json")

    def _next_edir(self) -> str:
        """A never-before-used epoch dir name: (max existing e-index)+1.
        One listing; crashed writes count (their names exist on disk), so
        retries never collide with a partial dir either."""
        try:
            names = self.fs.list_names(self.root)
        except FileNotFoundError:
            names = []
        used = [int(n[1:]) for n in names if n.startswith("e") and n[1:].isdigit()]
        return f"e{max(used, default=-1) + 1}"

    def _written_buckets(self, edir: str) -> list[int]:
        try:
            names = self.fs.list_names(f"{self.root}/{edir}")
        except FileNotFoundError:
            return []
        out = []
        for nm in names:
            if nm.startswith(f"{_BUCKET}="):
                try:
                    out.append(int(nm.split("=", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def commit(
        self,
        new_touched: DataFrame,
        touched: list[int],
        manifest: dict,
        epoch: int,
        gc: bool = True,
    ) -> dict:
        """Write the touched buckets' new content as a FRESH epoch dir
        (ONE partitioned job), publish ``m{epoch+1}.json`` with untouched
        entries carried forward, swing the pointer, GC unreferenced
        bucket dirs.  Returns the new manifest.

        The epoch dir name is allocated as (max existing e-index)+1 — a
        name NEVER used before — not derived from the basis manifest's
        generation: deriving it would alias a still-referenced dir
        whenever a fresh-checkpoint redrain's epoch 0 finds a surviving
        ``m0.json`` basis while ``_CURRENT`` references the dir that same
        arithmetic names (a reader mid-overwrite, or a crash before the
        pointer swing, would then see a committed manifest pointing at
        deleted/partial buckets).  Exactly-once needs the replayed
        epoch's STATE to be identical, not its directory name: a replay
        writes the same content under a fresh dir, atomically overwrites
        ``m{epoch+1}.json`` to reference it, and GC removes the orphan."""
        new_manifest = self.write_epoch(new_touched, touched, manifest)
        self.publish_epoch(new_manifest, epoch)
        if gc:
            self.gc(epoch, new_manifest, manifest)
        return new_manifest

    def write_epoch(
        self, new_touched: DataFrame, touched: list[int], manifest: dict
    ) -> dict:
        """Phase 1 of :meth:`commit`: run the partitioned write job into a
        fresh epoch dir and return the manifest that WOULD publish it.
        Until :meth:`publish_epoch` lands ``m{epoch+1}.json`` and the
        pointer, the dir is an orphan no manifest references (a replay
        overwrites, GC removes) — so several replicas' phase-1 writes can
        run concurrently while their publishes keep the protocol's
        dependency order (guide §2.6)."""
        edir = self._next_edir()
        (
            new_touched.withColumn(_BUCKET, self.bucket_expr())
            .repartition(_BUCKET)
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(f"{self.root}/{edir}")
        )
        written = set(self._written_buckets(edir))
        new_buckets = dict(manifest["buckets"])
        for b in touched:
            if b in written:
                new_buckets[str(b)] = edir
            else:
                new_buckets.pop(str(b), None)  # bucket drained empty
        return {"gen": int(edir[1:]), "buckets": new_buckets}

    def publish_epoch(self, new_manifest: dict, epoch: int) -> dict:
        """Phase 2 of :meth:`commit`: atomically publish the manifest and
        swing the pointer.  GC stays a separate call (the caller may have
        lazy plans still reading the basis manifest's bucket dirs)."""
        self._write_manifest_file(f"m{epoch + 1}.json", new_manifest)
        self.fs.write_pointer(self.root, f"m{epoch + 1}.json")
        return new_manifest

    def gc(self, epoch: int, new_manifest: dict, basis: "dict | None" = None) -> None:
        """Delete manifests outside the replayable range and bucket dirs
        referenced by no live manifest: keep ``m{epoch}`` (may still be
        replayed until epoch+1's checkpoint commits) and ``m{epoch+1}``;
        bucket-dir liveness additionally honors the BASIS manifest this
        epoch folded against (a redrain's fallback basis is ``_CURRENT``,
        not ``m{epoch}`` — a caller with lazy plans still referencing it
        passes it here, or calls ``commit(gc=False)`` and runs this after
        those plans executed).

        Manifests with index > epoch+1 are stale leftovers of a LONGER
        prior run whose checkpoint was discarded (fresh-checkpoint
        redrain): the live checkpoint can never reach those epochs before
        overwriting them, but the bucket-dir sweep below doesn't count
        them as live — leaving them on disk would point at dirs this very
        call may delete, making ``manifest_for_epoch`` correctness depend
        on contiguous epoch numbering overwriting each one just in time
        (r10 ADVICE).  Deleting them here removes that hazard and the
        orphan JSON clutter in one pass."""
        live: set[tuple[str, int]] = set()
        for m in (basis,) if basis else ():
            for b, edir in m["buckets"].items():
                live.add((edir, int(b)))
        for name in (f"m{epoch}.json", f"m{epoch + 1}.json"):
            try:
                m = self._read_manifest_file(name)
            except FileNotFoundError:
                continue
            for b, edir in m["buckets"].items():
                live.add((edir, int(b)))
        for name in self.fs.list_names(self.root):
            if (
                name.startswith("m")
                and name.endswith(".json")
                and name[1:-5].isdigit()
                and not epoch <= int(name[1:-5]) <= epoch + 1
            ):
                import os

                from cdc_lite_spark.streaming._state import _local_path

                try:
                    os.remove(os.path.join(_local_path(self.root), name))
                except OSError:
                    pass
            if name.startswith("e") and name[1:].isdigit():
                for b in self._written_buckets(name):
                    if (name, b) not in live:
                        self.fs.remove_dir(self._bucket_path(name, b))
                if not self._written_buckets(name):
                    self.fs.remove_dir(f"{self.root}/{name}")


def touched_ids_multi(pairs: "list[tuple[str, BucketedReplica, DataFrame]]") -> dict:
    """Several replicas' touched-bucket sets in ONE collect: each
    ``(tag, replica, delta)`` contributes its delta's distinct bucket ids
    under its tag, unioned into a single tiny job — the dual-indexed tick
    runs one driver round-trip where it ran one per set (guide §1.2: fewer
    actions on the epoch's critical path).  Returns ``{tag: sorted ids}``
    with every tag present (``[]`` when its delta is empty)."""
    from functools import reduce

    frames = [
        df.select(F.lit(tag).alias("__t"), brep.bucket_expr().alias(_BUCKET))
        for tag, brep, df in pairs
    ]
    # ONE distinct over the union — a single (tag, bucket) shuffle for the
    # whole set instead of one per frame (same multiset: distinct commutes
    # with union here because the tag column separates the frames)
    u = reduce(lambda a, b: a.unionByName(b), frames).distinct()
    out: dict = {tag: [] for tag, _, _ in pairs}
    for r in u.collect():
        out[r["__t"]].append(r[_BUCKET])
    return {t: sorted(v) for t, v in out.items()}


__all__ = ["BucketedReplica", "suggest_layout", "touched_ids_multi"]
