"""Changelog-driven maintained views: fold the A8 wire-format change stream
(sources/changelog.py ``stream_changes``) into persisted aggregate state
DIRECTLY — no CdcEngine required on the consumer side.

This closes the round-8 gap where only the engine's own snapshot diffs
could maintain views: any consumer of the published change log (the
reference's downstream contract, duckdb_cdc.go:259-291) keeps a grouped
aggregate current by reading the wire records the engine already emits.

The wire record carries ``(timestamp, table, operation, data)`` with
CURRENT values only (DELETE rows carry just the key — sources/changelog.py
``WIRE_SCHEMA``), so retractions cannot be derived from the wire alone.
The adapter therefore maintains TWO states under one root:

- ``<state_dir>/replica`` — the latest-per-key table replica the wire
  implies (the same materialization ``Engine.materialize`` computes from
  the log, kept incrementally);
- ``<state_dir>/agg``     — the per-group aggregate state
  (operators/incremental.py shapes), folded from change records ENRICHED
  with previous values looked up in the replica.

Per micro-batch (epoch ``e``):

1. type the batch's records (cast the string map through the declared
   DDL) and collapse to latest-per-key by capture timestamp — a key's
   intermediate values within the batch cancel, so the net fold needs
   only (replica value, latest batch value);
2. prune the replica to the batch's keys (broadcast semi-join — the
   replica scan is map-side, nothing table-sized shuffles) and derive
   diff-shaped records: key present in replica → UPDATE/DELETE with
   ``prev_`` values, absent → INSERT;
3. fold the agg state v{e} → v{e+1} — TOTAL for the abelian kinds
   (``sum_count`` / ``moments`` / ``histogram``); the degrading kinds
   (``min_max`` / ``distinct_count`` / ``freq_items``) fold insert-only
   batches and on a retracting batch REBUILD from the advanced replica
   (it IS the latest-per-key table — one aggregation in the replica
   rewrite's own cost class, the engine's degradation discipline);
4. advance the replica: (replica ∖ batch keys) ∪ latest non-DELETE rows.

State follows the versioned-parquet protocol shared with the novelty /
sketch / anomaly streams (streaming/_state.py): epoch ``e`` always reads
exactly ``v{e}`` and rewrites a bit-identical ``v{e+1}`` on replay, so
state is exactly-once under foreachBatch's at-least-once calls.  The agg
commit lands AFTER the replica commit, so an agg pointer at ``v{e+1}``
implies the replica it was folded against committed.

Scale shape: the enrichment and fold touch |batch| rows (broadcast-pruned
against the replica); the agg merge joins the group-key domain.  The
replica REWRITE is O(table) per changed epoch — the same cost class as
the engine's own per-tick snapshot persistence; a production refinement
is a merge-on-read keyed layout (Delta/Iceberg MERGE), which changes the
write amplification, not this protocol.

Ordering contract: log files must be consumed oldest-first (Structured
Streaming's file source default) so a key's tick-N record never folds
before its tick-(N-1) record; within a batch the timestamp collapse
handles any mix of ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from cdc_lite_spark.envelope import DELETE, INSERT, UPDATE
from cdc_lite_spark.streaming._state import (
    commit_version,
    fs_for,
    read_current,
    read_for_epoch,
    repoint,
)

#: abelian kinds fold TOTAL per batch; the degrading kinds (min_max /
#: distinct_count / freq_items / sample — states that cannot give a value
#: back) fold insert-only batches and REBUILD FROM THE REPLICA on
#: retracting ones: the replica IS the latest-per-key table, so the
#: rebuild is one aggregation over it — the same cost class as the
#: per-epoch replica rewrite, and exactly the engine's degradation
#: discipline.  ``sample`` folds in-group UPDATEs too (membership rides
#: on the key hash, so a changed value patches the sampled payload in
#: place) and retracts only on DELETE / group-moving UPDATE.
_KINDS = (
    "sum_count",
    "moments",
    "histogram",
    "min_max",
    "distinct_count",
    "freq_items",
    "sample",
)
_DEGRADING = ("min_max", "distinct_count", "freq_items", "sample")


def _replica_dir(state_dir: str) -> str:
    return state_dir + "/replica"


def _agg_dir(state_dir: str) -> str:
    return state_dir + "/agg"


def _spec_of(
    schema_ddl: str,
    group_keys: list[str],
    value_col: str,
    kind: str,
    lo: float | None,
    hi: float | None,
    bins: int,
    where: str | None = None,
    lgk: int = 12,
    k: int = 64,
    derive: "dict[str, str] | None" = None,
    pk_cols: "list[str] | None" = None,
    buckets: "int | None" = None,
) -> dict:
    s = {
        "schema_ddl": schema_ddl,
        "group_keys": list(group_keys),
        "value_col": value_col,
        "kind": kind,
    }
    # the replica's identity key is correctness-critical for EVERY kind
    # (a restart with different key_cols would silently collapse/split
    # replica rows — r10 review); pinned only when the caller declares it
    # so pre-r10 states (no key_cols in their JSON) keep matching when
    # started the pre-r10 way
    if pk_cols:
        s["key_cols"] = list(pk_cols)
    if buckets:  # bucketed replica layout: bucket count pinned too
        s["buckets"] = int(buckets)
    if kind == "histogram":  # parameterized kinds pin their parameters
        s.update({"lo": lo, "hi": hi, "bins": bins})
    if kind == "distinct_count":
        s["lgk"] = lgk
    if kind == "freq_items":
        s["k"] = k
    if kind == "sample":  # membership rides on the key hash: pin both
        s["k"] = k
        s["pk_cols"] = list(pk_cols or [])
    if where:  # conditional: states pinned before the field keep matching
        s["where"] = where
    if derive:
        s["derive"] = dict(derive)
    return s


def _pin_spec(spark: SparkSession, state_dir: str, spec: dict) -> None:
    import json

    d = state_dir + "/_spec"
    fs = fs_for(d, spark)
    try:
        fs.write_pointer(d, json.dumps(spec))
    except FileNotFoundError:
        # the POSIX adapter needs the dir to exist first (the Hadoop
        # adapter's create() makes parents itself and never lands here)
        import os

        os.makedirs(d, exist_ok=True)
        fs.write_pointer(d, json.dumps(spec))


def _check_spec(
    spark: SparkSession,
    state_dir: str,
    spec: dict,
    upgradable: tuple = ("key_cols",),
) -> None:
    """Refuse to attach a stream whose parameters mismatch what the state
    on disk was BUILT with (the engine's spec-pin discipline): folding
    moments records into sum_count state, or new bucket edges onto old
    counts, would silently corrupt — fail at start, not mid-batch.

    ``upgradable`` fields may be ABSENT from an older persisted spec (they
    postdate it); when everything else matches, the pin is upgraded in
    place with the new fields so subsequent restarts enforce them too —
    e.g. ``key_cols`` (r10): pinned at init only when the caller declared
    it, always carried by a start, and a restart with DIFFERENT key_cols
    than a pin that has them must fail (it would silently collapse/split
    replica rows)."""
    import json

    d = state_dir + "/_spec"
    fs = fs_for(d, spark)
    if not fs.dir_exists(d):
        return  # pre-r9 state (or hand-built): nothing pinned to check
    try:
        persisted = json.loads(fs.read_pointer(d))
    except FileNotFoundError:
        return
    if persisted != spec:
        missing = set(spec) - set(persisted)
        if (
            missing
            and missing <= set(upgradable)
            and all(
                persisted.get(k2) == v
                for k2, v in spec.items()
                if k2 in persisted
            )
            and set(persisted) <= set(spec)
        ):
            _pin_spec(spark, state_dir, spec)
            return
        raise ValueError(
            f"changelog view state at {state_dir!r} was initialized with "
            f"{persisted}, but the stream was started with {spec} — "
            "re-init under a new state_dir or match the parameters"
        )


def _build_state(
    rows: DataFrame,
    group_keys: list[str],
    value_col: str,
    kind: str,
    lo: float | None,
    hi: float | None,
    bins: int,
    where: str | None = None,
    lgk: int = 12,
    k: int = 64,
    derive: "dict[str, str] | None" = None,
    pk_cols: "list[str] | None" = None,
) -> DataFrame:
    for dn, dsql in (derive or {}).items():
        rows = rows.withColumn(dn, F.expr(dsql))
    if where:
        rows = rows.filter(F.expr(where))
    if kind == "sample":
        from cdc_lite_spark.operators.incremental import sample_state

        return sample_state(rows, group_keys, value_col, pk_cols, k)
    if kind == "sum_count":
        from cdc_lite_spark.operators.incremental import sum_count_state

        return sum_count_state(rows, group_keys, value_col)
    if kind == "moments":
        from cdc_lite_spark.operators.incremental import moments_state

        return moments_state(rows, group_keys, value_col)
    if kind == "min_max":
        from cdc_lite_spark.operators.incremental import min_max_state

        return min_max_state(rows, group_keys, value_col)
    if kind == "distinct_count":
        from cdc_lite_spark.operators.sketches import distinct_sketch_state

        return distinct_sketch_state(rows, group_keys, value_col, lgk)
    if kind == "freq_items":
        from cdc_lite_spark.operators.freq import freq_items_state

        return freq_items_state(rows, group_keys, value_col, k)
    from cdc_lite_spark.operators.histogram import histogram_state

    return histogram_state(rows, group_keys, value_col, lo, hi, bins)


def _fold_state(
    state: DataFrame,
    changes: DataFrame,
    group_keys: list[str],
    value_col: str,
    kind: str,
    lo: float | None,
    hi: float | None,
    bins: int,
    where: str | None = None,
    lgk: int = 12,
    k: int = 64,
    derive: "dict[str, str] | None" = None,
    pk_cols: "list[str] | None" = None,
) -> "DataFrame | None":
    """Fold one batch's diff-shaped records into the agg state.  Returns
    ``None`` when the kind cannot fold THIS delta (a degrading kind saw a
    retraction) — the caller rebuilds from the advanced replica."""
    if derive:
        from cdc_lite_spark.operators.diff import derive_diff

        # extend both row images first — group keys / value / where may
        # all reference derived names (the engine's ordering contract)
        changes = derive_diff(changes, derive)
    if where:
        from cdc_lite_spark.operators.diff import filter_diff

        # re-classify against the predicate subset: an UPDATE crossing the
        # boundary becomes an INSERT into / DELETE from the view's world
        changes = filter_diff(changes, where)
    if kind == "sum_count":
        from cdc_lite_spark.operators.incremental import apply_delta

        return apply_delta(state, changes, group_keys, value_col)
    if kind == "moments":
        from cdc_lite_spark.operators.incremental import apply_moments_delta

        return apply_moments_delta(state, changes, group_keys, value_col)
    if kind in _DEGRADING:
        # sample retracts only on DELETE / group-moving UPDATE — an
        # in-group value change patches the sampled payload in place
        # (engine.py _has_retractions, the same carve-out)
        watched = group_keys if kind == "sample" else [value_col, *group_keys]
        if _has_retractions(changes, watched):
            return None
        if kind == "sample":
            from cdc_lite_spark.operators.incremental import apply_sample_delta

            return apply_sample_delta(
                state, changes, group_keys, value_col, pk_cols, k
            )
        inserts = changes.filter(F.col("operation") == INSERT)
        if kind == "min_max":
            from cdc_lite_spark.operators.incremental import (
                apply_min_max_inserts,
            )

            return apply_min_max_inserts(state, inserts, group_keys, value_col)
        if kind == "freq_items":
            from cdc_lite_spark.operators.freq import fold_freq_inserts

            return fold_freq_inserts(state, inserts, group_keys, value_col, k)
        from cdc_lite_spark.operators.sketches import (
            distinct_sketch_state,
            merge_states,
        )

        delta = distinct_sketch_state(inserts, group_keys, value_col, lgk)
        return merge_states(state, delta, group_keys)
    from cdc_lite_spark.operators.histogram import apply_histogram_delta

    return apply_histogram_delta(
        state, changes, group_keys, value_col, lo, hi, bins
    )


def _has_retractions(changes: DataFrame, watched: list[str]) -> bool:
    """The engine's retraction probe (engine.py _has_retractions) over the
    batch's diff-shaped records: a DELETE, or an UPDATE whose watched
    columns changed (value + group keys for most kinds; group keys only
    for ``sample``).  One limit(1) action over the delta-sized (persisted)
    enrichment."""

    def _prev(c: str):
        return F.col(f"prev_{c}") if f"prev_{c}" in changes.columns else F.col(c)

    moved = F.lit(False)
    for c in watched:
        moved = moved | ~_prev(c).eqNullSafe(F.col(c))
    return (
        changes.filter(
            (F.col("operation") == DELETE)
            | ((F.col("operation") == UPDATE) & moved)
        )
        .limit(1)
        .count()
        > 0
    )


def _typed_latest(
    batch: DataFrame, table: str, schema: T.StructType, key_cols: list[str]
) -> DataFrame:
    """Steps 1 of the batch protocol for one table: cast the wire's string
    map through the declared DDL and collapse to latest-per-key by capture
    timestamp (max_by — no sort); a key's intermediate values within the
    batch cancel in the net fold."""
    non_key = [f.name for f in schema.fields if f.name not in key_cols]
    typed = batch.filter(
        (F.col("table") == table)
        & F.col("operation").isin(INSERT, UPDATE, DELETE)
    ).select(
        "timestamp",
        "operation",
        *[
            F.col("data").getItem(f.name).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ],
    )
    return (
        typed.groupBy(*key_cols)
        .agg(
            F.max_by(F.struct("operation", *non_key), F.col("timestamp")).alias(
                "__r"
            )
        )
        .select(*key_cols, "__r.*")
    )


def _diff_records(
    latest: DataFrame,
    replica: DataFrame,
    key_cols: list[str],
    non_key: list[str],
    dtypes: dict,
) -> DataFrame:
    """Step 2: classify the batch's net rows against the replica into
    diff-shaped records with ``prev_`` values (key in replica →
    UPDATE/DELETE, absent → INSERT; DELETE of an absent key drops).  The
    replica scan is map-side — the batch keys broadcast."""
    bkeys = latest.select(*key_cols)
    hit = replica.join(F.broadcast(bkeys), key_cols, "left_semi").select(
        *key_cols,
        *[F.col(c).alias(f"prev_{c}") for c in non_key],
        F.lit(True).alias("__present"),
    )
    return (
        latest.join(F.broadcast(hit), key_cols, "left_outer")
        .withColumn(
            "operation",
            F.when(
                F.col("operation") == DELETE,
                F.when(F.col("__present"), DELETE),  # else null → drop
            )
            .when(F.col("__present"), F.lit(UPDATE))
            .otherwise(F.lit(INSERT)),
        )
        .filter(F.col("operation").isNotNull())
        .select(
            *key_cols,
            "operation",
            # DELETE rows carry null cur values (the diff contract)
            *[
                F.when(F.col("operation") != DELETE, F.col(c))
                .cast(dtypes[c])
                .alias(c)
                for c in non_key
            ],
            *[F.col(f"prev_{c}") for c in non_key],
        )
    )


def _advance_replica(
    replica: DataFrame, latest: DataFrame, key_cols: list[str], non_key: list[str]
) -> DataFrame:
    """Step 4: (replica ∖ batch keys) ∪ latest non-DELETE rows."""
    bkeys = latest.select(*key_cols)
    kept = replica.join(F.broadcast(bkeys), key_cols, "left_anti")
    return kept.unionByName(
        latest.filter(F.col("operation") != DELETE).select(*key_cols, *non_key)
    )


def init_changelog_view(
    spark: SparkSession,
    state_dir: str,
    schema_ddl: str,
    group_keys: list[str],
    value_col: str,
    kind: str = "sum_count",
    history: DataFrame | None = None,
    lo: float | None = None,
    hi: float | None = None,
    bins: int = 64,
    where: str | None = None,
    lgk: int = 12,
    k: int = 64,
    derive: "dict[str, str] | None" = None,
    key_cols: "list[str] | None" = None,
    buckets: "int | None" = None,
) -> None:
    """Lay down ``v0`` of both states: from ``history`` rows when the
    consumer joins an existing table mid-stream (one O(history) pass), or
    empty — the engine's first capture logs every row as INSERT, so a
    consumer starting from an empty replica converges on the first batch.
    ``kind="sample"`` needs ``key_cols`` (the table's primary key —
    sample membership is a pure function of the key hash) and must match
    the ``key_cols`` later passed to :func:`start_changelog_view`.

    ``buckets=n`` lays the replica out hash-bucketed (streaming/bucketed.py)
    so each epoch rewrites only the buckets its batch touches instead of
    the whole table — requires ``key_cols``; the agg state stays flat."""
    if kind not in _KINDS:
        raise ValueError(f"changelog view kind must be one of {_KINDS}, got {kind!r}")
    if kind == "histogram":
        from cdc_lite_spark.operators.histogram import _check_edges

        if lo is None or hi is None:
            raise ValueError("histogram views need explicit lo/hi bucket edges")
        _check_edges(lo, hi, bins)
    _check_sample_params(kind, key_cols, group_keys, value_col, k)
    _check_bucket_params(buckets, key_cols)
    if where is not None and not str(where).strip():
        raise ValueError("where must be a non-empty SQL boolean expression")
    schema = T.StructType.fromDDL(schema_ddl)
    rows = history if history is not None else spark.createDataFrame([], schema)
    # the replica stays UNFILTERED — it is the latest-per-key table the
    # wire implies, and the prev_-value enrichment needs every key to
    # classify boundary-crossing updates; only the agg applies ``where``
    if buckets:
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        BucketedReplica(
            spark, _replica_dir(state_dir), buckets, key_cols, schema_ddl
        ).init(rows)
    else:
        rows.write.mode("overwrite").parquet(_replica_dir(state_dir) + "/v0")
        repoint(_replica_dir(state_dir), "v0", fs_for(_replica_dir(state_dir), spark))
    agg0 = _build_state(
        rows, group_keys, value_col, kind, lo, hi, bins, where, lgk, k,
        derive, key_cols,
    )
    agg0.write.mode("overwrite").parquet(_agg_dir(state_dir) + "/v0")
    repoint(_agg_dir(state_dir), "v0", fs_for(_agg_dir(state_dir), spark))
    # pin what the state was BUILT with (the engine's _spec discipline) so
    # a later start with mismatched parameters fails fast, not mid-batch
    _pin_spec(
        spark,
        state_dir,
        _spec_of(
            schema_ddl, group_keys, value_col, kind, lo, hi, bins, where, lgk, k,
            derive, key_cols, buckets,
        ),
    )


def _check_bucket_params(buckets: "int | None", key_cols: "list[str] | None") -> None:
    if buckets is None:
        return
    if not buckets > 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    if not key_cols:
        raise ValueError(
            "bucketed replicas need key_cols — the layout hashes the "
            "table's primary key"
        )


def _check_sample_params(
    kind: str,
    key_cols: "list[str] | None",
    group_keys: list[str],
    value_col: str,
    k: int,
) -> None:
    if kind != "sample":
        return
    if not key_cols:
        raise ValueError(
            "sample views need key_cols — membership is a pure function "
            "of the primary-key hash"
        )
    if value_col in group_keys:
        raise ValueError(
            "sample views keep the payload beside the group keys — "
            f"value_col {value_col!r} must not be one of the group keys"
        )
    if not k > 0:
        raise ValueError(f"sample views need k > 0, got {k}")


def read_changelog_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current committed aggregate state (agg pointer — commits last,
    so what it references was folded against a committed replica)."""
    return read_current(spark, _agg_dir(state_dir))


def read_changelog_replica(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current committed latest-per-key replica (flat or bucketed —
    the pinned spec says which)."""
    spec = _read_pinned_spec(spark, state_dir)
    if spec and spec.get("buckets"):
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        brep = BucketedReplica(
            spark,
            _replica_dir(state_dir),
            spec["buckets"],
            spec["key_cols"],
            spec["schema_ddl"],
        )
        return brep.read(brep.current_manifest(), None)
    return read_current(spark, _replica_dir(state_dir))


def _read_pinned_spec(spark: SparkSession, state_dir: str) -> "dict | None":
    import json

    d = state_dir + "/_spec"
    fs = fs_for(d, spark)
    if not fs.dir_exists(d):
        return None
    try:
        return json.loads(fs.read_pointer(d))
    except FileNotFoundError:
        return None


def start_changelog_view(
    stream: DataFrame,
    table: str,
    schema_ddl: str,
    key_cols: list[str],
    group_keys: list[str],
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
    kind: str = "sum_count",
    trigger_seconds: int = 1,
    available_now: bool = False,
    lo: float | None = None,
    hi: float | None = None,
    bins: int = 64,
    where: str | None = None,
    lgk: int = 12,
    k: int = 64,
    derive: "dict[str, str] | None" = None,
    buckets: "int | None" = None,
) -> StreamingQuery:
    """Attach view maintenance to an A8 change stream (``stream_changes``
    output).  ``schema_ddl`` declares the monitored table's columns (the
    wire's string map is cast through it); ``key_cols`` is the table's
    primary key — the same keys the producing engine diffs on.
    ``available_now=True`` drains the log's current contents and stops
    (driver gates / catch-up runs); otherwise a ``trigger_seconds``
    processing-time trigger polls like the engine's own monitor loop.
    ``where`` restricts the AGGREGATE to σ_where(table) (the engine's
    filtered-view semantics); the replica stays unfiltered so boundary-
    crossing updates classify correctly.

    Parameters are validated at START (kind, histogram edges, and the
    pinned init spec) — a mismatch must fail here, not as an opaque
    StreamingQueryException inside the first micro-batch."""
    if kind not in _KINDS:
        raise ValueError(f"changelog view kind must be one of {_KINDS}, got {kind!r}")
    if kind == "histogram":
        from cdc_lite_spark.operators.histogram import _check_edges

        if lo is None or hi is None:
            raise ValueError("histogram views need explicit lo/hi bucket edges")
        _check_edges(lo, hi, bins)
    _check_sample_params(kind, key_cols, group_keys, value_col, k)
    _check_bucket_params(buckets, key_cols)
    spark = stream.sparkSession
    if not fs_for(_replica_dir(state_dir), spark).dir_exists(_replica_dir(state_dir)):
        raise ValueError(
            f"no changelog view state under {state_dir!r} — call "
            "init_changelog_view first (empty init converges from the "
            "log's INSERT-everything first tick)"
        )
    if where is not None and not str(where).strip():
        raise ValueError("where must be a non-empty SQL boolean expression")
    _check_spec(
        spark,
        state_dir,
        _spec_of(
            schema_ddl, group_keys, value_col, kind, lo, hi, bins, where, lgk, k,
            derive, key_cols, buckets,
        ),
    )
    schema = T.StructType.fromDDL(schema_ddl)
    non_key = [f.name for f in schema.fields if f.name not in key_cols]
    dtypes = {f.name: f.dataType for f in schema.fields}

    def _brep(spark):
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        return BucketedReplica(
            spark, _replica_dir(state_dir), buckets, key_cols, schema_ddl
        )

    def _tick(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        # delta-sized — consumed by the enrichment join, the replica
        # advance, and (via enriched) the agg fold.  persist(), not
        # localCheckpoint(): the micro-batch file source is deterministic
        # (a cache miss recomputes the same rows), and unpersist() on a
        # checkpointed frame is a silent no-op (blocks only free on driver
        # GC) — a 1 s-trigger stream would accumulate executor storage
        # between GC cycles (r9 review)
        latest = _typed_latest(batch, table, schema, key_cols).persist()
        try:
            if buckets:
                # bucketed path: the enrichment READS and the advance
                # WRITES only the buckets this batch's keys touch — the
                # epoch's replica cost is O(batch + touched·table/n), the
                # flat path's only table-sized term gone.  The enrichment
                # against the touched subset is exact: a key's replica row
                # lives in its key's bucket by construction.
                brep = _brep(spark)
                man = brep.manifest_for_epoch(epoch)
                touched = brep.touched_ids(latest)
                replica = brep.read(man, touched)
            else:
                rep_fs = fs_for(_replica_dir(state_dir), spark)
                replica = read_for_epoch(
                    spark, _replica_dir(state_dir), epoch, rep_fs, schema=schema_ddl
                )
            enriched = _diff_records(latest, replica, key_cols, non_key, dtypes)
            agg_fs = fs_for(_agg_dir(state_dir), spark)
            agg_prev = read_for_epoch(spark, _agg_dir(state_dir), epoch, agg_fs)
            new_replica = _advance_replica(replica, latest, key_cols, non_key)
            agg_new = _fold_state(
                agg_prev,
                enriched,
                group_keys,
                value_col,
                kind,
                lo,
                hi,
                bins,
                where,
                lgk,
                k,
                derive,
                key_cols,
            )
            if agg_new is None:
                # a degrading kind saw a retraction: rebuild from the
                # ADVANCED replica — it IS the latest-per-key table, so
                # this is one aggregation in the replica rewrite's own
                # cost class (the engine's degradation discipline; replay
                # recomputes the identical state, exactly-once holds).
                # Bucketed: full replica = untouched buckets ∪ the new
                # touched content (a rebuild pays one full scan — the
                # degradation's cost, not the layout's)
                full = (
                    brep.read(
                        man, [b for b in map(int, man["buckets"]) if b not in touched]
                    ).unionByName(new_replica)
                    if buckets
                    else new_replica
                )
                agg_new = _build_state(
                    full,
                    group_keys,
                    value_col,
                    kind,
                    lo,
                    hi,
                    bins,
                    where,
                    lgk,
                    k,
                    derive,
                    key_cols,
                )
            # replica first, agg last: an agg pointer at v{e+1} implies the
            # replica it folded against committed (readers read the agg)
            if buckets:
                # gc AFTER the agg commit: the agg plan lazily reads the
                # basis manifest's bucket paths, which a pre-agg GC could
                # delete on a redrain whose basis fell back to _CURRENT
                new_man = brep.commit(new_replica, touched, man, epoch, gc=False)
                commit_version(agg_new, _agg_dir(state_dir), epoch, agg_fs)
                brep.gc(epoch, new_man, man)
            else:
                commit_version(new_replica, _replica_dir(state_dir), epoch, rep_fs)
                commit_version(agg_new, _agg_dir(state_dir), epoch, agg_fs)
        finally:
            try:
                latest.unpersist()
            except Exception:  # noqa: BLE001 — cleanup best-effort
                pass

    writer = stream.writeStream.foreachBatch(_tick).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


# --- wire-driven JOIN views --------------------------------------------------
#
# A changelog consumer maintaining ``fact ⋈ dim`` WITHOUT the engine: the
# one wire stream carries both tables' records (each wire row names its
# ``table``), so one foreachBatch keeps a latest-per-key replica PER SIDE
# and folds the join state with the same affected-key algebra the engine
# loop uses (operators/incremental.py ``maintain_join``) — a tick's work is
# |Δfact| + the fan-out of the changed dim keys, never a re-join of the
# tables.  This closes for joins the engine-only gap the single-table
# adapter closed for aggregates (the reference's downstream contract:
# consumers see only the wire, duckdb_cdc.go:259-291).
#
# State layout under one root, committed per epoch in dependency order —
# fact replica, dim replica, then the JOIN state LAST — so a join pointer
# at ``v{e+1}`` implies both replicas it was folded against committed
# (readers read the join):
#
# - ``<state_dir>/fact_replica`` / ``<state_dir>/dim_replica`` — the
#   latest-per-key tables the wire implies;
# - ``<state_dir>/join`` — one row per fact key, fact columns first then
#   every dim column (the engine's join-view column contract: names must
#   not collide — TPC-H-style prefixes make this natural).
#
# The affected-key sets fed to maintain_join are just the batches' key
# sets (any batched fact key, plus every fact referencing a batched dim
# key) — the wire consumer never needs prev_-enriched records for the
# join itself, because the fold re-reads refreshed rows from the advanced
# replicas.  Dangling facts re-enter on dim arrival via the fact-side
# semi-join (assume_fk_integrity=False), exactly as in the engine loop.


def _fact_replica_dir(state_dir: str) -> str:
    return state_dir + "/fact_replica"


def _dim_replica_dir(state_dir: str) -> str:
    return state_dir + "/dim_replica"


def _join_dir(state_dir: str) -> str:
    return state_dir + "/join"


def _join_spec_of(
    fact_table: str,
    dim_table: str,
    fact_ddl: str,
    dim_ddl: str,
    fact_key: list[str],
    fact_dim_col: list[str],
    dim_key: list[str],
    how: str = "inner",
) -> dict:
    s = {
        "kind": "join",
        "fact_table": fact_table,
        "dim_table": dim_table,
        "fact_ddl": fact_ddl,
        "dim_ddl": dim_ddl,
        "fact_key": list(fact_key),
        "fact_dim_col": list(fact_dim_col),
        "dim_key": list(dim_key),
    }
    if how != "inner":  # inner states pinned before the field keep matching
        s["how"] = how
    return s


def _norm_join_agg(
    agg: "dict | None",
    fact_key: list[str],
    fschema: "T.StructType",
    dschema: "T.StructType",
) -> "dict | None":
    """Validate + normalize the agg-over-join spec: a dict with
    ``group_keys``/``value_col`` plus the single-table kind parameters
    (the engine's ``register_join_agg_view`` surface).  Sample row
    identity is the join view's unique fact key."""
    if agg is None:
        return None
    a = dict(agg)
    kind = a.setdefault("kind", "sum_count")
    if kind not in _KINDS:
        raise ValueError(f"join agg kind must be one of {_KINDS}, got {kind!r}")
    gk, vc = a.get("group_keys"), a.get("value_col")
    if not gk or not vc:
        raise ValueError("join agg needs group_keys and value_col")
    cols = set(fschema.names) | set(dschema.names) | set(a.get("derive") or {})
    missing = [c for c in [*gk, vc] if c not in cols]
    if missing:
        raise ValueError(f"join agg columns {missing} not in the join view")
    if kind == "histogram":
        from cdc_lite_spark.operators.histogram import _check_edges

        if a.get("lo") is None or a.get("hi") is None:
            raise ValueError("histogram join aggs need explicit lo/hi edges")
        _check_edges(a["lo"], a["hi"], a.setdefault("bins", 64))
    _check_sample_params(kind, fact_key, gk, vc, a.get("k", 64))
    return a


def _check_join_params(
    fact_schema: T.StructType,
    dim_schema: T.StructType,
    fact_key: list[str],
    fact_dim_col: list[str],
    dim_key: list[str],
) -> None:
    if len(fact_dim_col) != len(dim_key):
        raise ValueError(
            f"fact_dim_col {fact_dim_col} and dim_key {dim_key} pair "
            "positionally — lengths must match"
        )
    fcols, dcols = set(fact_schema.names), set(dim_schema.names)
    clash = fcols & dcols
    if clash:
        raise ValueError(
            "join view columns must not collide across the two tables "
            f"(the engine's join-view contract), got {sorted(clash)}"
        )
    for cols, names, label in (
        (fcols, fact_key, "fact_key"),
        (fcols, fact_dim_col, "fact_dim_col"),
        (dcols, dim_key, "dim_key"),
    ):
        missing = [c for c in names if c not in cols]
        if missing:
            raise ValueError(f"{label} {missing} not in the declared schema")


def _initial_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_dim_col: list[str],
    dim_key: list[str],
    how: str = "inner",
) -> DataFrame:
    from cdc_lite_spark.operators.incremental import key_eq

    if how not in ("inner", "left_outer"):
        raise ValueError(f"join view how must be inner or left_outer, got {how!r}")
    return fact.join(
        dim,
        key_eq((fact[f], dim[d]) for f, d in zip(fact_dim_col, dim_key)),
        how,
    )


def init_changelog_join_view(
    spark: SparkSession,
    state_dir: str,
    fact_table: str,
    dim_table: str,
    fact_ddl: str,
    dim_ddl: str,
    fact_key: list[str],
    fact_dim_col: list[str],
    dim_key: list[str],
    fact_history: DataFrame | None = None,
    dim_history: DataFrame | None = None,
    how: str = "inner",
    agg: "dict | None" = None,
) -> None:
    """Lay down ``v0`` of both replicas and the join state: from history
    rows when the consumer joins mid-stream (one O(history) join), or
    empty — the engine's first capture logs every row as INSERT, so an
    empty init converges on the first batch.

    ``agg`` declares a grouped aggregate OVER the join maintained
    alongside it (the engine's ``register_join_agg_view`` surface as a
    dict: ``{"group_keys": [...], "value_col": ..., "kind": ...,`` plus
    kind parameters / ``where`` / ``derive``}) — read it back with
    :func:`read_changelog_join_agg`."""
    fschema = T.StructType.fromDDL(fact_ddl)
    dschema = T.StructType.fromDDL(dim_ddl)
    _check_join_params(fschema, dschema, fact_key, fact_dim_col, dim_key)
    agg = _norm_join_agg(agg, fact_key, fschema, dschema)
    fact = (
        fact_history
        if fact_history is not None
        else spark.createDataFrame([], fschema)
    )
    dim = dim_history if dim_history is not None else spark.createDataFrame([], dschema)
    m0 = _initial_join(fact, dim, fact_dim_col, dim_key, how)
    targets = [
        (_fact_replica_dir(state_dir), fact),
        (_dim_replica_dir(state_dir), dim),
        (_join_dir(state_dir), m0),
    ]
    if agg is not None:
        targets.append((_agg_dir(state_dir), _join_agg_build(m0, agg, fact_key)))
    for d, df in targets:
        df.write.mode("overwrite").parquet(d + "/v0")
        repoint(d, "v0", fs_for(d, spark))
    spec = _join_spec_of(
        fact_table, dim_table, fact_ddl, dim_ddl, fact_key, fact_dim_col,
        dim_key, how,
    )
    if agg is not None:
        spec["agg"] = agg
    _pin_spec(spark, state_dir, spec)


def _join_agg_build(rows: DataFrame, agg: dict, fact_key: list[str]) -> DataFrame:
    return _build_state(
        rows,
        agg["group_keys"],
        agg["value_col"],
        agg["kind"],
        agg.get("lo"),
        agg.get("hi"),
        agg.get("bins", 64),
        agg.get("where"),
        agg.get("lgk", 12),
        agg.get("k", 64),
        agg.get("derive"),
        fact_key,  # sample row identity = the join view's unique fact key
    )


def _join_agg_fold(
    state: DataFrame, changes: DataFrame, agg: dict, fact_key: list[str]
) -> "DataFrame | None":
    return _fold_state(
        state,
        changes,
        agg["group_keys"],
        agg["value_col"],
        agg["kind"],
        agg.get("lo"),
        agg.get("hi"),
        agg.get("bins", 64),
        agg.get("where"),
        agg.get("lgk", 12),
        agg.get("k", 64),
        agg.get("derive"),
        fact_key,
    )


def read_changelog_join_agg(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current committed aggregate-over-join state (commits after the
    join state, so what it references was folded against it)."""
    return read_current(spark, _agg_dir(state_dir))


def read_changelog_join_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current committed join state (join pointer — commits last, so
    what it references was folded against committed replicas)."""
    return read_current(spark, _join_dir(state_dir))


def start_changelog_join_view(
    stream: DataFrame,
    fact_table: str,
    dim_table: str,
    fact_ddl: str,
    dim_ddl: str,
    fact_key: list[str],
    fact_dim_col: list[str],
    dim_key: list[str],
    state_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 1,
    available_now: bool = False,
    hint_broadcast: bool = True,
    how: str = "inner",
    agg: "dict | None" = None,
) -> StreamingQuery:
    """Attach ``fact ⋈ dim`` maintenance to an A8 change stream carrying
    both tables' records.  ``fact_key`` must be unique in the fact table
    (the star fact-PK shape); ``fact_dim_col``/``dim_key`` pair
    positionally.  ``hint_broadcast`` has maintain_join's hot-dim-key
    escape-hatch semantics (a dim key with ~10^8 referencing facts needs
    AQE fallback, not a forced broadcast).

    Per micro-batch (epoch ``e``): collapse each side's wire records to
    net latest-per-key, advance each replica, fold the join state with
    the batches' key sets as the affected sets, then commit fact replica
    → dim replica → join (the join commit is the epoch's externally
    visible barrier).  Replay recomputes bit-identical versions, so state
    is exactly-once under foreachBatch's at-least-once calls."""
    from cdc_lite_spark.operators.incremental import maintain_join_with_changes

    fschema = T.StructType.fromDDL(fact_ddl)
    dschema = T.StructType.fromDDL(dim_ddl)
    _check_join_params(fschema, dschema, fact_key, fact_dim_col, dim_key)
    agg = _norm_join_agg(agg, fact_key, fschema, dschema)
    spark = stream.sparkSession
    if not fs_for(_join_dir(state_dir), spark).dir_exists(_join_dir(state_dir)):
        raise ValueError(
            f"no changelog join state under {state_dir!r} — call "
            "init_changelog_join_view first (empty init converges from "
            "the log's INSERT-everything first tick)"
        )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"join view how must be inner or left_outer, got {how!r}")
    spec = _join_spec_of(
        fact_table, dim_table, fact_ddl, dim_ddl, fact_key, fact_dim_col,
        dim_key, how,
    )
    if agg is not None:
        spec["agg"] = agg
    _check_spec(spark, state_dir, spec)
    f_non_key = [f.name for f in fschema.fields if f.name not in fact_key]
    d_non_key = [f.name for f in dschema.fields if f.name not in dim_key]
    join_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in [*fschema.fields, *dschema.fields]
    )

    def _tick(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        f_latest = _typed_latest(batch, fact_table, fschema, fact_key).persist()
        d_latest = _typed_latest(batch, dim_table, dschema, dim_key).persist()
        handles: list = []
        try:
            f_fs = fs_for(_fact_replica_dir(state_dir), spark)
            d_fs = fs_for(_dim_replica_dir(state_dir), spark)
            j_fs = fs_for(_join_dir(state_dir), spark)
            f_rep = read_for_epoch(
                spark, _fact_replica_dir(state_dir), epoch, f_fs, schema=fact_ddl
            )
            d_rep = read_for_epoch(
                spark, _dim_replica_dir(state_dir), epoch, d_fs, schema=dim_ddl
            )
            m_old = read_for_epoch(
                spark, _join_dir(state_dir), epoch, j_fs, schema=join_ddl
            )
            new_f = _advance_replica(f_rep, f_latest, fact_key, f_non_key)
            new_d = _advance_replica(d_rep, d_latest, dim_key, d_non_key)
            # the affected sets are just the batches' key sets — the fold
            # re-reads refreshed rows from the ADVANCED replicas, so no
            # prev_-enrichment is needed for the join itself.  With an agg
            # riding on the view, the SAME delta evaluation also emits the
            # view-level I/D records the agg fold consumes (the engine's
            # register_join_agg_view composition), with the delta-sized
            # intermediates persisted once across all consuming actions.
            m_new, view_changes, shared = maintain_join_with_changes(
                m_old,
                new_f,
                new_d,
                f_latest,
                d_latest,
                fact_key,
                fact_dim_col,
                dim_key,
                hint_broadcast=hint_broadcast,
                how=how,
                with_changes=agg is not None,
                persist_shared=agg is not None,
            )
            handles.extend(shared)
            agg_new = None
            if agg is not None:
                a_fs = fs_for(_agg_dir(state_dir), spark)
                agg_prev = read_for_epoch(spark, _agg_dir(state_dir), epoch, a_fs)
                agg_new = _join_agg_fold(agg_prev, view_changes, agg, fact_key)
                if agg_new is None:
                    # degrading kind: the I/D encoding always carries
                    # DELETEs on a changed tick — rebuild from the NEW
                    # join state (one aggregation, never a re-join; the
                    # engine's join-agg degradation)
                    agg_new = _join_agg_build(m_new, agg, fact_key)
            # dependency order: replicas → join → agg LAST — each pointer
            # implies everything it folded against committed
            commit_version(new_f, _fact_replica_dir(state_dir), epoch, f_fs)
            commit_version(new_d, _dim_replica_dir(state_dir), epoch, d_fs)
            commit_version(m_new, _join_dir(state_dir), epoch, j_fs)
            if agg_new is not None:
                commit_version(agg_new, _agg_dir(state_dir), epoch, a_fs)
        finally:
            for h in (f_latest, d_latest, *handles):
                try:
                    h.unpersist()
                except Exception:  # noqa: BLE001 — cleanup best-effort
                    pass

    writer = stream.writeStream.foreachBatch(_tick).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def changelog_view_status(spark: SparkSession, state_dir: str) -> dict:
    """Operational status of a changelog-maintained view (single-table or
    join): the pinned spec plus each state's current committed version —
    the wire-consumer twin of ``CdcEngine.view_status()``.  FS reads only
    (pointers + the spec), no parquet opened, no job run."""
    spec = _read_pinned_spec(spark, state_dir)
    out: dict = {"state_dir": state_dir, "spec": spec, "states": {}}
    kind = (spec or {}).get("kind")
    dirs = (
        {
            "fact_replica": _fact_replica_dir(state_dir),
            "dim_replica": _dim_replica_dir(state_dir),
            "join": _join_dir(state_dir),
            "agg": _agg_dir(state_dir),
        }
        if kind == "join"
        else {"replica": _replica_dir(state_dir), "agg": _agg_dir(state_dir)}
    )
    for label, d in dirs.items():
        fs = fs_for(d, spark)
        if not fs.dir_exists(d):
            continue  # e.g. a join view registered without an agg
        try:
            out["states"][label] = fs.read_pointer(d)
        except FileNotFoundError:
            out["states"][label] = None  # dir exists but never committed
    return out


def changelog_view_quantiles(
    spark: SparkSession, state_dir: str, qs: "list[float]"
) -> DataFrame:
    """Quantile estimates from a wire-maintained HISTOGRAM view — the
    bucket edges come from the pinned spec (single-table kind or an
    agg-over-join), and only the state table is read, never the log or
    the replicas.  The wire twin of ``CdcEngine.view_quantiles``."""
    from cdc_lite_spark.operators.histogram import quantiles_from_histogram

    spec = _read_pinned_spec(spark, state_dir)
    if spec is None:
        raise ValueError(f"no pinned spec under {state_dir!r}")
    a = spec.get("agg") if spec.get("kind") == "join" else spec
    if not a or a.get("kind") != "histogram":
        raise ValueError(
            f"state at {state_dir!r} is {(a or {}).get('kind')!r}, not histogram"
        )
    return quantiles_from_histogram(
        read_current(spark, _agg_dir(state_dir)),
        a["group_keys"],
        qs,
        a["lo"],
        a["hi"],
        a.get("bins", 64),
    )


def changelog_heavy_hitters(
    spark: SparkSession, state_dir: str, min_share: "float | None" = None
) -> DataFrame:
    """Heavy-hitter report from a wire-maintained FREQ_ITEMS view —
    ``[count_lo, count_hi]``-bracketed items per group, lower-bound
    filtered by ``min_share`` (no false positives).  The wire twin of
    ``CdcEngine.view_heavy_hitters``; reads only the O(k)-entry state."""
    from cdc_lite_spark.operators.freq import heavy_hitters

    spec = _read_pinned_spec(spark, state_dir)
    if spec is None:
        raise ValueError(f"no pinned spec under {state_dir!r}")
    a = spec.get("agg") if spec.get("kind") == "join" else spec
    if not a or a.get("kind") != "freq_items":
        raise ValueError(
            f"state at {state_dir!r} is {(a or {}).get('kind')!r}, not freq_items"
        )
    return heavy_hitters(
        read_current(spark, _agg_dir(state_dir)), a["group_keys"], min_share
    )
