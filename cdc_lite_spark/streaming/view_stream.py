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

Ordering contract (r11 — the foreign-log guard): the engine's own log is
per-key ordered by construction (per-file ordering, one record per key
per tick) and folds exactly.  For a FOREIGN or replayed producer the
consumers enforce per-key timestamp monotonicity instead of assuming it:
each replica row carries ``__ts``, the key's last-applied capture
timestamp, and a batch record STRICTLY OLDER than its key's ``__ts`` is
dropped before it can advance the replica or fold into any state —
a replayed-with-gaps or reordered log therefore converges to the same
state as the in-order log whose newest-per-key records it contains.
Drops are counted per table (``changelog_stale_dropped`` /
``changelog_view_status``).  Two documented limits: (1) equal-timestamp
rewrites of one key delivered in different batches are inherently
ambiguous on this wire (last-folded wins); (2) by default a DELETE
removes the key's row AND its timestamp, so a record older than the
delete that arrives afterwards resurrects the key.  Opt-in
``tombstone_horizon_s=h`` bounds limit (2): each DELETE's (key, ts) is
retained for ``h`` event-seconds (expiry driven by batch timestamps —
deterministic on replay, never the wall clock), records older than a
live tombstone are dropped like any stale record, and a delete that
arrives BEFORE its key's insert (the out-of-order birth) tombstones the
key so the late insert cannot land.  Beyond the horizon the default
behavior returns — the bound is the contract, sized to the producer's
maximum replay skew; a producer replaying further back should compact
its log first.
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
    publish_version,
    read_current,
    read_for_epoch,
    repoint,
    run_writes,
    write_version,
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
    tombstone_horizon_s: "float | None" = None,
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
    if tombstone_horizon_s is not None:  # delete-tombstone retention pinned
        s["tombstones"] = float(tombstone_horizon_s)
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


def _bump_stale_status(
    spark: SparkSession, state_dir: str, table: str, epoch: int, n: int
) -> None:
    """Cumulative per-table count of guard-dropped stale records (tiny
    JSON pointer under ``_guard``).  Replay-safe: a re-run epoch ≤ the
    recorded one is skipped, so at-least-once foreachBatch calls don't
    double-count.  Operational metadata only — a lost write costs the
    count, never state."""
    import json

    d = state_dir + "/_guard"
    fs = fs_for(d, spark)
    cur: dict = {}
    if fs.dir_exists(d):
        try:
            cur = json.loads(fs.read_pointer(d))
        except FileNotFoundError:
            cur = {}
    ent = cur.get(table, {"dropped": 0, "last_epoch": -1})
    if epoch <= ent["last_epoch"]:
        return
    cur[table] = {"dropped": ent["dropped"] + int(n), "last_epoch": int(epoch)}
    try:
        fs.write_pointer(d, json.dumps(cur, sort_keys=True))
    except FileNotFoundError:
        import os

        from cdc_lite_spark.streaming._state import _local_path

        os.makedirs(_local_path(d), exist_ok=True)
        fs.write_pointer(d, json.dumps(cur, sort_keys=True))


def changelog_stale_dropped(spark: SparkSession, state_dir: str) -> dict:
    """Per-table totals of records the monotonicity guard dropped (a
    replayed-with-gaps or reordered wire log): ``{table: {"dropped": N,
    "last_epoch": E}}``.  Empty when the log has only ever been in order
    — the engine's own log is, by construction (per-file ordering, one
    record per key per tick).  FS read only — no job."""
    import json

    d = state_dir + "/_guard"
    fs = fs_for(d, spark)
    if not fs.dir_exists(d):
        return {}
    try:
        return json.loads(fs.read_pointer(d))
    except FileNotFoundError:
        return {}


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
            # the upgrade path pins caller-supplied values onto a pre-r10
            # state with nothing on disk to cross-check them against, and
            # whatever lands here is ENFORCED on every later start — so
            # sanity-check the one upgradable field before it becomes the
            # pin: key_cols must name real schema columns (r10 ADVICE; a
            # typo'd or partial key would otherwise become the permanent
            # pin and reject every CORRECT restart)
            if "key_cols" in missing and spec.get("schema_ddl"):
                kc = spec.get("key_cols") or []
                schema_cols = {
                    f.name for f in T.StructType.fromDDL(spec["schema_ddl"]).fields
                }
                if not kc or not set(kc) <= schema_cols:
                    raise ValueError(
                        f"cannot upgrade the spec pin at {state_dir!r}: "
                        f"key_cols {kc} is not a non-empty subset of the "
                        f"pinned schema's columns {sorted(schema_cols)}"
                    )
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
    batch cancel in the net fold.  ``__ts`` carries the key's newest
    capture timestamp out of the batch — the replica stores it so the
    cross-batch monotonicity guard (``_classify``) can drop replayed
    stale records."""
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
            ),
            F.max("timestamp").alias("__ts"),
        )
        .select(*key_cols, "__r.*", "__ts")
    )


def _conform(rows: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast caller-supplied history rows through the DECLARED schema — the
    DDL is the state's on-disk contract, and a history frame carrying a
    drifted-but-castable type (e.g. the decimal(19,2) an arithmetic
    expression widens from a declared decimal(18,2)) must not leak a
    different parquet physical layout into v0 that later epochs'
    schema-pinned reads reject (FIXED_LEN_BYTE_ARRAY vs INT64 decimals).
    Missing columns fail here (select), which is the right error."""
    return rows.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])


def _rep_ddl(schema_ddl: str) -> str:
    """The replica's ON-DISK schema: the declared table columns plus the
    per-key last-applied capture timestamp.  Reading a pre-r11 replica
    (no ``__ts`` in its parquet) through this schema null-fills the
    column — the guard treats NULL as "no recorded order", so legacy
    states keep folding exactly as before and pick up timestamps as
    their keys are next written."""
    return schema_ddl + ", __ts timestamp"


#: a batch record is STALE when its key exists in the replica with a
#: NEWER last-applied timestamp — the reordered/replayed-log guard.
#: Equal timestamps apply (the engine's own log emits one record per key
#: per tick; a foreign log with same-second rewrites of one key is
#: inherently ambiguous and documented as such).
def _stale() -> F.Column:
    return (
        F.col("__present").isNotNull()
        & F.col("__prev_ts").isNotNull()
        & (F.col("__ts") < F.col("__prev_ts"))
    ) | (
        # key absent from the replica but covered by a delete tombstone:
        # a record older than the delete must not resurrect the key
        # (__tomb_ts is NULL when tombstones are off or the key has none)
        F.col("__present").isNull()
        & F.col("__tomb_ts").isNotNull()
        & (F.col("__ts") < F.col("__tomb_ts"))
    )


def _classify(
    latest: DataFrame,
    replica: DataFrame,
    key_cols: list[str],
    non_key: list[str],
    tombs: "DataFrame | None" = None,
) -> DataFrame:
    """ONE broadcast join of the batch's net rows against the replica,
    shared by the stale guard, the diff enrichment, and the replica
    advance: each latest row gains its replica ``prev_`` image,
    ``__prev_ts`` (the key's last-applied capture timestamp) and a
    ``__present`` flag — plus ``__tomb_ts`` (the key's live delete
    tombstone, when retention is on).  The replica and tombstone scans
    are map-side — the batch keys broadcast."""
    bkeys = latest.select(*key_cols)
    hit = replica.join(F.broadcast(bkeys), key_cols, "left_semi").select(
        *key_cols,
        *[F.col(c).alias(f"prev_{c}") for c in non_key],
        F.col("__ts").alias("__prev_ts"),
        F.lit(True).alias("__present"),
    )
    joined = latest.join(F.broadcast(hit), key_cols, "left_outer")
    if tombs is None:
        return joined.withColumn("__tomb_ts", F.lit(None).cast("timestamp"))
    th = tombs.join(F.broadcast(bkeys), key_cols, "left_semi").select(
        *key_cols, F.col("__ts").alias("__tomb_ts")
    )
    return joined.join(F.broadcast(th), key_cols, "left_outer")


def _tombs_dir(state_dir: str) -> str:
    return state_dir + "/tombs"


def _tombs_dir_for(state_dir: str, table: "str | None") -> str:
    # the join consumer keeps one tombstone state per side
    return _tombs_dir(state_dir) + (f"_{table}" if table else "")


def _tombs_schema(schema: T.StructType, key_cols: list[str]) -> str:
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in schema.fields
        if f.name in key_cols
    )
    return cols + ", __ts timestamp"


def _advance_tombs(
    tombs: DataFrame,
    fresh: DataFrame,
    key_cols: list[str],
    horizon_s: float,
) -> DataFrame:
    """New tombstone state: drop entries whose key the batch re-applied
    (the replica guard takes over), expire entries older than the batch's
    newest capture timestamp minus the horizon (deterministic on replay —
    "now" is batch content, not the wall clock), and add every fresh
    DELETE's (key, ts) — INCLUDING deletes of keys the replica never had,
    which is exactly the out-of-order delete-before-insert case the
    tombstone closes."""
    applied = fresh.filter(F.col("operation") != DELETE).select(*key_cols)
    dels = fresh.filter(F.col("operation") == DELETE).select(*key_cols, "__ts")
    # the batch's newest capture timestamp rides along as a broadcast
    # 1-row aggregate instead of a per-epoch collect(): the expiry filter
    # folds into the tombstone commit's own job (guide §1.2 — one fewer
    # action per epoch), and a NULL max (empty batch) keeps every entry,
    # exactly the old "skip the filter" branch
    mxf = fresh.agg(F.max("__ts").alias("__mx"))
    kept = tombs.join(F.broadcast(applied), key_cols, "left_anti")
    kept = (
        kept.join(F.broadcast(mxf), F.lit(True), "cross")
        .filter(
            F.col("__mx").isNull()
            | (
                F.col("__ts")
                >= F.col("__mx") - F.expr(f"INTERVAL {float(horizon_s)} SECONDS")
            )
        )
        .drop("__mx")
    )
    # a re-deleted key replaces its tombstone (newest delete wins)
    kept = kept.join(F.broadcast(dels.select(*key_cols)), key_cols, "left_anti")
    return kept.unionByName(dels)


def _diff_records(
    joined: DataFrame,
    key_cols: list[str],
    non_key: list[str],
    dtypes: dict,
) -> DataFrame:
    """Step 2: project the classified (``_classify``, stale-filtered)
    batch rows into diff-shaped records with ``prev_`` values (key in
    replica → UPDATE/DELETE, absent → INSERT; DELETE of an absent key
    drops)."""
    return (
        joined
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
    """Step 4: (replica ∖ batch keys) ∪ latest non-DELETE rows.  ``latest``
    must be the stale-FILTERED net rows (a dropped stale record must
    neither remove nor replace its key's replica row); surviving rows
    carry ``__ts`` into the replica as the key's last-applied capture
    timestamp."""
    bkeys = latest.select(*key_cols)
    kept = replica.join(F.broadcast(bkeys), key_cols, "left_anti")
    return kept.unionByName(
        latest.filter(F.col("operation") != DELETE).select(
            *key_cols, *non_key, "__ts"
        )
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
    tombstone_horizon_s: "float | None" = None,
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
    the whole table — requires ``key_cols``; the agg state stays flat.

    ``tombstone_horizon_s=h`` (requires ``key_cols``) retains each
    DELETE's (key, capture ts) for ``h`` seconds of event time, so a
    reordered or replayed record OLDER than its key's delete cannot
    resurrect the key — the bounded answer to the ordering contract's
    second documented limit.  State cost: the deletes of the last ``h``
    event-seconds; expiry is driven by batch timestamps (deterministic on
    replay), never the wall clock."""
    if kind not in _KINDS:
        raise ValueError(f"changelog view kind must be one of {_KINDS}, got {kind!r}")
    if kind == "histogram":
        from cdc_lite_spark.operators.histogram import _check_edges

        if lo is None or hi is None:
            raise ValueError("histogram views need explicit lo/hi bucket edges")
        _check_edges(lo, hi, bins)
    _check_sample_params(kind, key_cols, group_keys, value_col, k)
    _check_bucket_params(buckets, key_cols)
    _check_tombstone_params(tombstone_horizon_s, key_cols)
    if where is not None and not str(where).strip():
        raise ValueError("where must be a non-empty SQL boolean expression")
    schema = T.StructType.fromDDL(schema_ddl)
    _check_no_reserved(schema)
    rows = (
        _conform(history, schema)
        if history is not None
        else spark.createDataFrame([], schema)
    )
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
    if tombstone_horizon_s is not None:
        t0 = spark.createDataFrame(
            [], T.StructType.fromDDL(_tombs_schema(schema, key_cols))
        )
        t0.write.mode("overwrite").parquet(_tombs_dir(state_dir) + "/v0")
        repoint(_tombs_dir(state_dir), "v0", fs_for(_tombs_dir(state_dir), spark))
    # pin what the state was BUILT with (the engine's _spec discipline) so
    # a later start with mismatched parameters fails fast, not mid-batch
    _pin_spec(
        spark,
        state_dir,
        _spec_of(
            schema_ddl, group_keys, value_col, kind, lo, hi, bins, where, lgk, k,
            derive, key_cols, buckets, tombstone_horizon_s,
        ),
    )


def _check_tombstone_params(
    horizon_s: "float | None", key_cols: "list[str] | None"
) -> None:
    if horizon_s is None:
        return
    if not float(horizon_s) >= 0:
        raise ValueError(
            f"tombstone_horizon_s must be >= 0, got {horizon_s}"
        )
    if not key_cols:
        raise ValueError(
            "tombstone retention needs key_cols — tombstones are keyed "
            "delete markers"
        )


def _check_dim_bucket_params(
    dim_buckets: "int | None", fact_buckets: "int | None", dim_key: list[str]
) -> None:
    if dim_buckets is None:
        return
    _check_bucket_params(dim_buckets, dim_key)
    if not fact_buckets:
        raise ValueError(
            "dim_buckets requires fact_buckets — the pruned dim read "
            "derives its needed-bucket set from the dual-indexed fact "
            "delta machinery"
        )


def _check_no_reserved(*schemas: T.StructType) -> None:
    """``__ts`` is the replica's guard bookkeeping column — a declared
    table column with that name would collide on disk."""
    for schema in schemas:
        if any(f.name == "__ts" for f in schema.fields):
            raise ValueError(
                "column name __ts is reserved for the replica's "
                "last-applied-timestamp bookkeeping — rename the column"
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
    the pinned spec says which).  The guard's bookkeeping column
    (``__ts``, the per-key last-applied capture timestamp) is internal
    and stripped here."""
    spec = _read_pinned_spec(spark, state_dir)
    if spec and spec.get("buckets"):
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        brep = BucketedReplica(
            spark,
            _replica_dir(state_dir),
            spec["buckets"],
            spec["key_cols"],
            _rep_ddl(spec["schema_ddl"]),
        )
        return brep.read(brep.current_manifest(), None).drop("__ts")
    return read_current(spark, _replica_dir(state_dir)).drop("__ts")


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
    tombstone_horizon_s: "float | None" = None,
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
    _check_tombstone_params(tombstone_horizon_s, key_cols)
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
            derive, key_cols, buckets, tombstone_horizon_s,
        ),
    )
    schema = T.StructType.fromDDL(schema_ddl)
    _check_no_reserved(schema)
    non_key = [f.name for f in schema.fields if f.name not in key_cols]
    dtypes = {f.name: f.dataType for f in schema.fields}

    def _brep(spark):
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        return BucketedReplica(
            spark, _replica_dir(state_dir), buckets, key_cols, _rep_ddl(schema_ddl)
        )

    def _tick(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession

        def _phase(p: str) -> None:
            # label the phase's jobs in the UI/event log (guide §1.5);
            # thread-local, reset by the stream runner at each batch start
            spark.sparkContext.setJobDescription(f"vstream {table}: {p}")

        # delta-sized — consumed by the enrichment join, the replica
        # advance, and (via enriched) the agg fold.  persist(), not
        # localCheckpoint(): the micro-batch file source is deterministic
        # (a cache miss recomputes the same rows), and unpersist() on a
        # checkpointed frame is a silent no-op (blocks only free on driver
        # GC) — a 1 s-trigger stream would accumulate executor storage
        # between GC cycles (r9 review)
        latest = _typed_latest(batch, table, schema, key_cols).persist()
        joined = None
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
                    spark, _replica_dir(state_dir), epoch, rep_fs,
                    schema=_rep_ddl(schema_ddl),
                )
            # the foreign-log guard: classify ONCE against the replica
            # (and the delete tombstones, when retained), drop records
            # older than their key's last-applied timestamp (a
            # replayed-with-gaps or reordered producer), and fold only
            # the survivors — replica advance and agg fold must see the
            # SAME filtered batch or they'd diverge
            tombs = None
            if tombstone_horizon_s is not None:
                t_fs = fs_for(_tombs_dir(state_dir), spark)
                tombs = read_for_epoch(
                    spark, _tombs_dir(state_dir), epoch, t_fs,
                    schema=_tombs_schema(schema, key_cols),
                )
            joined = _classify(latest, replica, key_cols, non_key, tombs).persist()
            fresh = joined.filter(~_stale())
            enriched = _diff_records(fresh, key_cols, non_key, dtypes)
            agg_fs = fs_for(_agg_dir(state_dir), spark)
            agg_prev = read_for_epoch(spark, _agg_dir(state_dir), epoch, agg_fs)
            fresh_latest = fresh.select(*key_cols, "operation", *non_key, "__ts")
            new_replica = _advance_replica(replica, fresh_latest, key_cols, non_key)
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
            # two-phase commit: every state's v{e+1} WRITE runs first (an
            # unpublished dir is an orphan no reader trusts, so the writes
            # are independent and run CONCURRENTLY — guide §2.6), then the
            # pointers swing in dependency order: replica first, agg after
            # — an agg pointer at v{e+1} still implies the replica it
            # folded against committed (readers read the agg)
            new_tombs = (
                _advance_tombs(tombs, fresh_latest, key_cols, tombstone_horizon_s)
                if tombs is not None
                else None
            )

            def _labelled(label, fn):
                def task():
                    _phase(label)
                    return fn()

                return (label, task)

            writes = [
                _labelled(
                    "replica write",
                    (lambda: brep.write_epoch(new_replica, touched, man))
                    if buckets
                    else (
                        # rebalance: the advance plan is map-side (anti-join
                        # ∪ batch) with no final shuffle — without it each
                        # version lands as ~shuffle.partitions tiny files
                        lambda: write_version(
                            new_replica, _replica_dir(state_dir), epoch,
                            rebalance=True,
                        )
                    ),
                ),
                _labelled(
                    "agg write",
                    lambda: write_version(agg_new, _agg_dir(state_dir), epoch),
                ),
            ]
            if new_tombs is not None:
                writes.append(
                    _labelled(
                        "tombs write",
                        lambda: write_version(
                            new_tombs, _tombs_dir(state_dir), epoch,
                            rebalance=True,
                        ),
                    )
                )
            done = run_writes(writes)
            if buckets:
                # gc AFTER the agg publish: the agg plan lazily read the
                # basis manifest's bucket paths, which a pre-agg GC could
                # delete on a redrain whose basis fell back to _CURRENT
                new_man = brep.publish_epoch(done["replica write"], epoch)
                publish_version(_agg_dir(state_dir), epoch, agg_fs)
                brep.gc(epoch, new_man, man)
            else:
                publish_version(_replica_dir(state_dir), epoch, rep_fs)
                publish_version(_agg_dir(state_dir), epoch, agg_fs)
            if new_tombs is not None:
                publish_version(_tombs_dir(state_dir), epoch, t_fs)
            # operational counter, AFTER the commit (one cached scan of the
            # batch-sized classify frame; a crash between commit and this
            # write loses only the count, never state)
            _phase("stale count")
            n_stale = joined.filter(_stale()).count()
            if n_stale:
                _bump_stale_status(spark, state_dir, table, epoch, n_stale)
        finally:
            for h in (latest, joined):
                if h is None:
                    continue
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
    fact_buckets: "int | None" = None,
    fk_buckets: "int | None" = None,
    dim_buckets: "int | None" = None,
    tombstone_horizon_s: "float | None" = None,
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
    if fact_buckets:  # dual-indexed layout: both bucket counts pinned
        s["fact_buckets"] = int(fact_buckets)
        s["fk_buckets"] = int(fk_buckets or fact_buckets)
    if dim_buckets:  # bucketed dim replica: pinned too
        s["dim_buckets"] = int(dim_buckets)
    if tombstone_horizon_s is not None:  # delete-tombstone retention pinned
        s["tombstones"] = float(tombstone_horizon_s)
    return s


# --- dual-indexed fact replica (r10 verdict ask #5) --------------------------
#
# With ``fact_buckets=n`` the join consumer's fact replica is PK-bucketed
# (streaming/bucketed.py) AND carries an FK POSTING INDEX: refcounted
# ``(fk…, __fb, __cnt)`` rows — "__cnt facts whose FK is fk live in fact
# bucket __fb" — themselves hash-bucketed BY FK into ``fk_buckets``.  The
# two table-shaped fact terms of the flat tick disappear:
#
# - the fact-side classify/advance reads and rewrites only the PK buckets
#   the batch touches (the single-table bucketed discipline);
# - the dim-side affected-fact lookup — the scan SCALING.md r10 documented
#   as unavoidable on a PK-only layout, because an FK semi-join can't
#   prune PK buckets without missing reinstatements — becomes: dim-delta
#   keys → their FK hash buckets of the posting index (pruned read) →
#   the referenced fact bucket ids → read exactly those PK buckets.
#
# Per epoch the index folds a refcount delta computed from the SAME
# classified batch the replica advance uses (fk membership changes only
# on INSERT/DELETE/fk-moving UPDATE — a fact's bucket is a pure function
# of its immutable PK), so maintenance is O(batch) rows into the touched
# FK buckets.  Worst case (a dim delta whose fks post to every bucket)
# degrades to exactly the flat scan, never more.


def _fk_index_dir(state_dir: str) -> str:
    return state_dir + "/fk_index"


def _join_ddl_of(fschema: T.StructType, dschema: T.StructType) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in [*fschema.fields, *dschema.fields]
    )


def _posting_ddl(fschema: T.StructType, fact_dim_col: list[str]) -> str:
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in fschema.fields
        if f.name in fact_dim_col
    )
    return cols + ", __fb INT, __cnt BIGINT"


def _posting_build(fact_rows: DataFrame, fact_brep, fact_dim_col: list[str]):
    """From-scratch posting rows (init / rebuild): one refcounted row per
    distinct (fk, fact bucket) pair — one aggregation over the facts."""
    return (
        fact_rows.select(*fact_dim_col, fact_brep.bucket_expr().alias("__fb"))
        .groupBy(*fact_dim_col, "__fb")
        .agg(F.count("*").alias("__cnt"))
    )


def _posting_delta(
    fresh: DataFrame,
    fact_brep,
    fact_dim_col: list[str],
    non_key: list[str],
) -> DataFrame:
    """Refcount delta from the classified (stale-filtered) fact batch:
    +1 for each key entering an (fk, bucket) membership, −1 for each key
    leaving one.  A key's bucket never changes (pure function of the PK),
    so membership moves only on INSERT, DELETE, or an fk-moving UPDATE."""

    def _prev(c: str) -> F.Column:
        # an fk column inside the PK can never change for a key
        return F.col(f"prev_{c}") if c in non_key else F.col(c)

    fk_same = F.lit(True)
    for c in fact_dim_col:
        fk_same = fk_same & _prev(c).eqNullSafe(F.col(c))
    fb = fact_brep.bucket_expr().alias("__fb")
    adds = fresh.filter(
        (F.col("operation") != DELETE)
        & (F.col("__present").isNull() | ~fk_same)
    ).select(*fact_dim_col, fb, F.lit(1).cast("bigint").alias("__cnt"))
    subs = fresh.filter(
        F.col("__present").isNotNull()
        & ((F.col("operation") == DELETE) | ~fk_same)
    ).select(
        *[_prev(c).alias(c) for c in fact_dim_col],
        fb,
        F.lit(-1).cast("bigint").alias("__cnt"),
    )
    return adds.unionByName(subs)


def _posting_fold(current: DataFrame, delta: DataFrame, fact_dim_col: list[str]):
    """New content of the touched FK buckets: refcounts sum; zeros drop."""
    return (
        current.unionByName(delta)
        .groupBy(*fact_dim_col, "__fb")
        .agg(F.sum("__cnt").alias("__cnt"))
        .filter(F.col("__cnt") != 0)
    )


def _posting_lookup(
    posting_brep,
    m_p: dict,
    fks: DataFrame,
    fact_dim_col: list[str],
    fkb: list[int],
) -> list[int]:
    """Fact bucket ids containing facts that reference the dim delta's
    fk values ``fks``: prune the posting index to the delta's FK hash
    buckets ``fkb`` (computed by the tick's fused touched-set collect),
    semi-join on the fk values, collect the distinct ``__fb`` ids
    (≤ fact_buckets rows reach the driver)."""
    posted = posting_brep.read(m_p, fkb)
    hits = posted.join(F.broadcast(fks), fact_dim_col, "left_semi")
    return sorted(
        r[0] for r in hits.select("__fb").distinct().collect()
    )


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
    fact_buckets: "int | None" = None,
    fk_buckets: "int | None" = None,
    dim_buckets: "int | None" = None,
    tombstone_horizon_s: "float | None" = None,
) -> None:
    """Lay down ``v0`` of both replicas and the join state: from history
    rows when the consumer joins mid-stream (one O(history) join), or
    empty — the engine's first capture logs every row as INSERT, so an
    empty init converges on the first batch.

    ``agg`` declares a grouped aggregate OVER the join maintained
    alongside it (the engine's ``register_join_agg_view`` surface as a
    dict: ``{"group_keys": [...], "value_col": ..., "kind": ...,`` plus
    kind parameters / ``where`` / ``derive``}) — read it back with
    :func:`read_changelog_join_agg`.

    ``fact_buckets=n`` lays the fact replica out PK-hash-bucketed WITH an
    FK posting index in ``fk_buckets`` (default ``n``) FK-hash buckets —
    the dual-indexed layout whose epoch cost is batch-proportional on
    BOTH fact terms (see the module comment above ``_fk_index_dir``).
    ``dim_buckets=m`` additionally buckets the DIM replica by its key:
    the refresh needs only the dims the delta's fk values name, so the
    dim read AND rewrite prune to those buckets — the dual tick's last
    size-coupled term gone.  Requires ``fact_buckets``."""
    fschema = T.StructType.fromDDL(fact_ddl)
    dschema = T.StructType.fromDDL(dim_ddl)
    _check_no_reserved(fschema, dschema)
    _check_join_params(fschema, dschema, fact_key, fact_dim_col, dim_key)
    _check_bucket_params(fact_buckets, fact_key)
    _check_dim_bucket_params(dim_buckets, fact_buckets, dim_key)
    _check_tombstone_params(tombstone_horizon_s, fact_key)
    agg = _norm_join_agg(agg, fact_key, fschema, dschema)
    fact = (
        _conform(fact_history, fschema)
        if fact_history is not None
        else spark.createDataFrame([], fschema)
    )
    dim = (
        _conform(dim_history, dschema)
        if dim_history is not None
        else spark.createDataFrame([], dschema)
    )
    m0 = _initial_join(fact, dim, fact_dim_col, dim_key, how)
    targets = []
    if dim_buckets:
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        BucketedReplica(
            spark, _dim_replica_dir(state_dir), int(dim_buckets), dim_key,
            _rep_ddl(dim_ddl),
        ).init(dim)
    else:
        targets.append((_dim_replica_dir(state_dir), dim))
    if fact_buckets:
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        f_brep = BucketedReplica(
            spark, _fact_replica_dir(state_dir), int(fact_buckets), fact_key,
            _rep_ddl(fact_ddl),
        )
        f_brep.init(fact)
        BucketedReplica(
            spark, _fk_index_dir(state_dir), int(fk_buckets or fact_buckets),
            fact_dim_col, _posting_ddl(fschema, fact_dim_col),
        ).init(_posting_build(fact, f_brep, fact_dim_col))
        # the join state is keyed by the (unique) fact PK, so it takes the
        # SAME bucket count and key — an epoch's affected rows live in
        # exactly the bucket ids the replica side already computed
        BucketedReplica(
            spark, _join_dir(state_dir), int(fact_buckets), fact_key,
            _join_ddl_of(fschema, dschema),
        ).init(m0)
    else:
        targets.insert(0, (_fact_replica_dir(state_dir), fact))
        targets.append((_join_dir(state_dir), m0))
    if agg is not None:
        targets.append((_agg_dir(state_dir), _join_agg_build(m0, agg, fact_key)))
    if tombstone_horizon_s is not None:
        for tbl, sch, kc in (
            (fact_table, fschema, fact_key),
            (dim_table, dschema, dim_key),
        ):
            targets.append(
                (
                    _tombs_dir_for(state_dir, tbl),
                    spark.createDataFrame(
                        [], T.StructType.fromDDL(_tombs_schema(sch, kc))
                    ),
                )
            )
    for d, df in targets:
        df.write.mode("overwrite").parquet(d + "/v0")
        repoint(d, "v0", fs_for(d, spark))
    spec = _join_spec_of(
        fact_table, dim_table, fact_ddl, dim_ddl, fact_key, fact_dim_col,
        dim_key, how, fact_buckets, fk_buckets, dim_buckets,
        tombstone_horizon_s,
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
    """The current committed join state (join pointer/manifest — commits
    after the replicas, so what it references was folded against
    committed replicas)."""
    spec = _read_pinned_spec(spark, state_dir)
    if spec and spec.get("fact_buckets"):
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        j_brep = BucketedReplica(
            spark, _join_dir(state_dir), spec["fact_buckets"],
            spec["fact_key"],
            _join_ddl_of(
                T.StructType.fromDDL(spec["fact_ddl"]),
                T.StructType.fromDDL(spec["dim_ddl"]),
            ),
        )
        return j_brep.read(j_brep.current_manifest(), None)
    return read_current(spark, _join_dir(state_dir))


def read_changelog_fact_posting(spark: SparkSession, state_dir: str) -> DataFrame:
    """The dual-indexed layout's FK posting index as of its current
    committed manifest: refcounted ``(fk…, __fb, __cnt)`` rows.  An
    operational/debugging reader — the invariant worth checking is that
    it equals a from-scratch ``_posting_build`` over the fact replica."""
    from cdc_lite_spark.streaming.bucketed import BucketedReplica

    spec = _read_pinned_spec(spark, state_dir)
    if not spec or spec.get("kind") != "join" or not spec.get("fact_buckets"):
        raise ValueError(
            f"state at {state_dir!r} is not a dual-indexed join view"
        )
    fschema = T.StructType.fromDDL(spec["fact_ddl"])
    p_brep = BucketedReplica(
        spark, _fk_index_dir(state_dir), spec["fk_buckets"],
        spec["fact_dim_col"], _posting_ddl(fschema, spec["fact_dim_col"]),
    )
    return p_brep.read(p_brep.current_manifest(), None)


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
    fact_buckets: "int | None" = None,
    fk_buckets: "int | None" = None,
    dim_buckets: "int | None" = None,
    tombstone_horizon_s: "float | None" = None,
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
    is exactly-once under foreachBatch's at-least-once calls.

    ``fact_buckets=n`` (must match the init) activates the dual-indexed
    fact layout: the classify/advance reads and the rewrite prune to the
    batch's PK buckets, and the dim-side affected-fact lookup prunes
    through the FK posting index to the referenced buckets — per-epoch
    fact I/O is batch-fan-out-proportional instead of table-sized (see
    the module comment above ``_fk_index_dir``)."""
    from cdc_lite_spark.operators.incremental import maintain_join_with_changes

    fschema = T.StructType.fromDDL(fact_ddl)
    dschema = T.StructType.fromDDL(dim_ddl)
    _check_no_reserved(fschema, dschema)
    _check_join_params(fschema, dschema, fact_key, fact_dim_col, dim_key)
    _check_bucket_params(fact_buckets, fact_key)
    _check_dim_bucket_params(dim_buckets, fact_buckets, dim_key)
    _check_tombstone_params(tombstone_horizon_s, fact_key)
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
        dim_key, how, fact_buckets, fk_buckets, dim_buckets,
        tombstone_horizon_s,
    )
    if agg is not None:
        spec["agg"] = agg
    _check_spec(spark, state_dir, spec)
    f_non_key = [f.name for f in fschema.fields if f.name not in fact_key]
    d_non_key = [f.name for f in dschema.fields if f.name not in dim_key]
    join_ddl = _join_ddl_of(fschema, dschema)

    def _breps(spark):
        from cdc_lite_spark.streaming.bucketed import BucketedReplica

        return (
            BucketedReplica(
                spark, _fact_replica_dir(state_dir), int(fact_buckets),
                fact_key, _rep_ddl(fact_ddl),
            ),
            BucketedReplica(
                spark, _fk_index_dir(state_dir),
                int(fk_buckets or fact_buckets), fact_dim_col,
                _posting_ddl(fschema, fact_dim_col),
            ),
            BucketedReplica(
                spark, _join_dir(state_dir), int(fact_buckets), fact_key,
                join_ddl,
            ),
            BucketedReplica(
                spark, _dim_replica_dir(state_dir), int(dim_buckets), dim_key,
                _rep_ddl(dim_ddl),
            )
            if dim_buckets
            else None,
        )

    def _tick(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        if fact_buckets:
            from cdc_lite_spark.streaming.bucketed import touched_ids_multi

        def _phase(p: str) -> None:
            # label the phase's jobs in the UI/event log (guide §1.5)
            spark.sparkContext.setJobDescription(f"vjoin {fact_table}: {p}")

        f_latest = _typed_latest(batch, fact_table, fschema, fact_key).persist()
        d_latest = _typed_latest(batch, dim_table, dschema, dim_key).persist()
        handles: list = []
        try:
            f_fs = fs_for(_fact_replica_dir(state_dir), spark)
            d_fs = fs_for(_dim_replica_dir(state_dir), spark)
            j_fs = fs_for(_join_dir(state_dir), spark)
            d_brep = None
            if fact_buckets:
                # dual-indexed path: the classify/advance sees only the
                # PK buckets the fact batch touches
                f_brep, p_brep, j_brep, d_brep = _breps(spark)
                m_f = f_brep.manifest_for_epoch(epoch)
                m_p = p_brep.manifest_for_epoch(epoch)
                m_j = j_brep.manifest_for_epoch(epoch)
                _phase("touched sets (replicas)")
                if d_brep is not None:
                    # BOTH sides' touched-bucket sets in one collect
                    # (guide §1.2 — one driver round-trip, not two)
                    _t = touched_ids_multi(
                        [("f", f_brep, f_latest), ("d", d_brep, d_latest)]
                    )
                    touched, touched_d = _t["f"], _t["d"]
                else:
                    touched = f_brep.touched_ids(f_latest)
                f_rep = f_brep.read(m_f, touched)
            else:
                f_rep = read_for_epoch(
                    spark, _fact_replica_dir(state_dir), epoch, f_fs,
                    schema=_rep_ddl(fact_ddl),
                )
                m_old = read_for_epoch(
                    spark, _join_dir(state_dir), epoch, j_fs, schema=join_ddl
                )
            if d_brep is not None:
                # bucketed dim replica: classify/advance prune to the dim
                # batch's buckets (touched_d collected above, fused with
                # the fact side's collect)
                m_d = d_brep.manifest_for_epoch(epoch)
                d_rep = d_brep.read(m_d, touched_d)
            else:
                d_rep = read_for_epoch(
                    spark, _dim_replica_dir(state_dir), epoch, d_fs,
                    schema=_rep_ddl(dim_ddl),
                )
            # foreign-log guard, per side (see the single-table tick):
            # replayed stale records must neither advance a replica nor
            # count as affected keys
            f_tombs = d_tombs = None
            if tombstone_horizon_s is not None:
                ft_fs = fs_for(_tombs_dir_for(state_dir, fact_table), spark)
                dt_fs = fs_for(_tombs_dir_for(state_dir, dim_table), spark)
                f_tombs = read_for_epoch(
                    spark, _tombs_dir_for(state_dir, fact_table), epoch,
                    ft_fs, schema=_tombs_schema(fschema, fact_key),
                )
                d_tombs = read_for_epoch(
                    spark, _tombs_dir_for(state_dir, dim_table), epoch,
                    dt_fs, schema=_tombs_schema(dschema, dim_key),
                )
            f_joined = _classify(
                f_latest, f_rep, fact_key, f_non_key, f_tombs
            ).persist()
            d_joined = _classify(
                d_latest, d_rep, dim_key, d_non_key, d_tombs
            ).persist()
            handles.extend([f_joined, d_joined])
            f_fresh = f_joined.filter(~_stale()).select(
                *fact_key, "operation", *f_non_key, "__ts"
            )
            d_fresh = d_joined.filter(~_stale()).select(
                *dim_key, "operation", *d_non_key, "__ts"
            )
            # both advanced replicas are consumed by SEVERAL actions in this
            # tick — their own state write plus the join-state write (whose
            # plan embeds fact_new/dim_new), and the agg rebuild path —
            # so pin them once (guide §5: persist what multiple actions
            # consume); without this every write re-runs the whole
            # classify/advance subtree including its broadcast builds
            new_f = _advance_replica(f_rep, f_fresh, fact_key, f_non_key).persist()
            new_d = _advance_replica(d_rep, d_fresh, dim_key, d_non_key).persist()
            handles.extend([new_f, new_d])
            p_delta = None
            if fact_buckets:
                # every remaining touched-bucket set of this epoch is a
                # function of the classified batches alone, so collect them
                # ALL in one fused job (guide §1.2): the posting lookup's
                # FK hash buckets, the posting delta's touched FK buckets,
                # and (dim-bucketed) the dim buckets the refresh needs
                fks = d_fresh.select(
                    *[F.col(d).alias(f) for d, f in zip(dim_key, fact_dim_col)]
                ).distinct()
                p_delta = _posting_delta(
                    f_joined.filter(~_stale()), f_brep, fact_dim_col, f_non_key
                )
                pairs = [("fkb", p_brep, fks), ("tfk", p_brep, p_delta)]
                if d_brep is not None:
                    # the refresh only ever joins dims the DELTA names: the
                    # dim batch's own keys plus the fk values of fresh fact
                    # rows (facts re-entering via the posting lookup carry
                    # an fk IN the dim batch by construction)
                    fk_as_dim = f_fresh.select(
                        *[
                            F.col(f).alias(d)
                            for f, d in zip(fact_dim_col, dim_key)
                        ]
                    )
                    pairs.append(
                        (
                            "needed_d",
                            d_brep,
                            d_fresh.select(*dim_key).unionByName(fk_as_dim),
                        )
                    )
                _phase("touched sets (posting/dim)")
                _ids = touched_ids_multi(pairs)
            if d_brep is not None:
                # the dim side handed to the fold is the advanced touched
                # buckets plus exactly the extra buckets the delta's fk
                # values hash to
                extra_d = [
                    b for b in _ids["needed_d"] if b not in set(touched_d)
                ]
                dim_new = new_d.unionByName(d_brep.read(m_d, extra_d))
            else:
                dim_new = new_d
            if fact_buckets:
                # the dim-side affected-fact lookup: posting index →
                # referenced fact bucket ids → read exactly those PK
                # buckets.  fact_new = the advanced touched content ∪ the
                # (untouched this epoch, hence current) posted buckets —
                # a SUPERSET of every fact row the fold can reference, so
                # maintain_join's algebra is unchanged; only its fact
                # scan shrank from the table to the batch's fan-out.
                _phase("posting lookup")
                posted = _posting_lookup(p_brep, m_p, fks, fact_dim_col, _ids["fkb"])
                extra = [b for b in posted if b not in set(touched)]
                fact_new = new_f.unionByName(f_brep.read(m_f, extra))
                # the join state shares the fact-PK bucketing, so EVERY
                # affected view row (batch facts ∪ dim fan-out) lives in
                # exactly these bucket ids: the fold reads them alone and
                # the commit rewrites them alone — the flat path's m_old
                # scan and full join rewrite both become batch-fan-out-
                # sized
                j_touched = sorted(set(touched) | set(posted))
                m_old = j_brep.read(m_j, j_touched)
            else:
                fact_new = new_f
            # the affected sets are just the batches' key sets — the fold
            # re-reads refreshed rows from the ADVANCED replicas, so no
            # prev_-enrichment is needed for the join itself.  With an agg
            # riding on the view, the SAME delta evaluation also emits the
            # view-level I/D records the agg fold consumes (the engine's
            # register_join_agg_view composition), with the delta-sized
            # intermediates persisted once across all consuming actions.
            m_new, view_changes, shared = maintain_join_with_changes(
                m_old,
                fact_new,
                dim_new,
                f_fresh,
                d_fresh,
                fact_key,
                fact_dim_col,
                dim_key,
                hint_broadcast=hint_broadcast,
                how=how,
                with_changes=agg is not None,
                # left_outer persists even without an agg riding the view:
                # its refresh references the pruned facts three times and
                # the dim twice per consuming action (r10 ADVICE)
                persist_shared=agg is not None or how == "left_outer",
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
                    # engine's join-agg degradation).  Bucketed: the new
                    # full state = untouched buckets ∪ the fold's output
                    # (the rebuild pays one full scan — the degradation's
                    # cost, not the layout's)
                    full = (
                        j_brep.read(
                            m_j,
                            [
                                b
                                for b in map(int, m_j["buckets"])
                                if b not in set(j_touched)
                            ],
                        ).unionByName(m_new)
                        if fact_buckets
                        else m_new
                    )
                    agg_new = _join_agg_build(full, agg, fact_key)
            # two-phase commit: every state's v{e+1}/epoch-dir WRITE runs
            # first — an unpublished dir is an orphan no reader trusts, so
            # the up-to-seven writes are independent and run CONCURRENTLY
            # (guide §2.6: one write's task tail no longer serializes the
            # next write's whole job behind it) — then the pointers swing
            # in the protocol's dependency order: replicas (+ posting
            # index) → join → agg LAST, each pointer implying everything
            # it folded against committed
            new_f_tombs = new_d_tombs = None
            if tombstone_horizon_s is not None:
                new_f_tombs = _advance_tombs(
                    f_tombs, f_fresh, fact_key, tombstone_horizon_s
                )
                new_d_tombs = _advance_tombs(
                    d_tombs, d_fresh, dim_key, tombstone_horizon_s
                )

            def _labelled(label, fn):
                def task():
                    _phase(label)
                    return fn()

                return (label, task)

            def _posting_write():
                # the posting fold consumes the SAME classified batch the
                # advance used: O(batch) refcount rows into the touched
                # FK buckets (both precomputed by the fused collect above)
                touched_fk = _ids["tfk"]
                new_p = _posting_fold(
                    p_brep.read(m_p, touched_fk), p_delta, fact_dim_col
                )
                return p_brep.write_epoch(new_p, touched_fk, m_p)

            writes = [
                _labelled(
                    "fact replica write",
                    (lambda: f_brep.write_epoch(new_f, touched, m_f))
                    if fact_buckets
                    else (
                        # rebalance on every flat no-final-shuffle state
                        # write (see write_version): replicas, join state,
                        # tombs; the agg fold ends in its own shuffle
                        lambda: write_version(
                            new_f, _fact_replica_dir(state_dir), epoch,
                            rebalance=True,
                        )
                    ),
                ),
                _labelled(
                    "dim replica write",
                    (lambda: d_brep.write_epoch(new_d, touched_d, m_d))
                    if d_brep is not None
                    else (
                        lambda: write_version(
                            new_d, _dim_replica_dir(state_dir), epoch,
                            rebalance=True,
                        )
                    ),
                ),
                _labelled(
                    "join state write",
                    # m_new is exactly the affected buckets' new content —
                    # the join rewrite prunes to them
                    (lambda: j_brep.write_epoch(m_new, j_touched, m_j))
                    if fact_buckets
                    else (
                        lambda: write_version(
                            m_new, _join_dir(state_dir), epoch, rebalance=True
                        )
                    ),
                ),
            ]
            if fact_buckets:
                writes.append(_labelled("posting index write", _posting_write))
            if agg_new is not None:
                writes.append(
                    _labelled(
                        "agg write",
                        lambda: write_version(
                            agg_new, _agg_dir(state_dir), epoch
                        ),
                    )
                )
            if new_f_tombs is not None:
                writes.append(
                    _labelled(
                        "fact tombs write",
                        lambda: write_version(
                            new_f_tombs,
                            _tombs_dir_for(state_dir, fact_table), epoch,
                            rebalance=True,
                        ),
                    )
                )
                writes.append(
                    _labelled(
                        "dim tombs write",
                        lambda: write_version(
                            new_d_tombs,
                            _tombs_dir_for(state_dir, dim_table), epoch,
                            rebalance=True,
                        ),
                    )
                )
            done = run_writes(writes)
            if fact_buckets:
                new_m_f = f_brep.publish_epoch(done["fact replica write"], epoch)
                new_m_p = p_brep.publish_epoch(done["posting index write"], epoch)
            else:
                publish_version(_fact_replica_dir(state_dir), epoch, f_fs)
            if d_brep is not None:
                new_m_d = d_brep.publish_epoch(done["dim replica write"], epoch)
            else:
                publish_version(_dim_replica_dir(state_dir), epoch, d_fs)
            if fact_buckets:
                new_m_j = j_brep.publish_epoch(done["join state write"], epoch)
            else:
                publish_version(_join_dir(state_dir), epoch, j_fs)
            if agg_new is not None:
                publish_version(_agg_dir(state_dir), epoch, a_fs)
            if new_f_tombs is not None:
                publish_version(_tombs_dir_for(state_dir, fact_table), epoch, ft_fs)
                publish_version(_tombs_dir_for(state_dir, dim_table), epoch, dt_fs)
            if fact_buckets:
                # gc AFTER the downstream publishes: their lazy plans read
                # the basis manifests' bucket paths
                f_brep.gc(epoch, new_m_f, m_f)
                p_brep.gc(epoch, new_m_p, m_p)
                j_brep.gc(epoch, new_m_j, m_j)
                if d_brep is not None:
                    d_brep.gc(epoch, new_m_d, m_d)
            _phase("stale count")
            # ONE job for both sides' counters (the frames are cached):
            # two sequential counts were two driver round-trips per epoch
            counts = {
                r["t"]: r["n"]
                for r in f_joined.filter(_stale())
                .select(F.lit(fact_table).alias("t"))
                .unionByName(
                    d_joined.filter(_stale()).select(F.lit(dim_table).alias("t"))
                )
                .groupBy("t")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            for tbl in (fact_table, dim_table):
                n_stale = counts.get(tbl, 0)
                if n_stale:
                    _bump_stale_status(spark, state_dir, tbl, epoch, n_stale)
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


def changelog_view_status(
    spark: SparkSession, state_dir: str, with_tombstones: bool = False
) -> dict:
    """Operational status of a changelog-maintained view (single-table or
    join): the pinned spec plus each state's current committed version —
    the wire-consumer twin of ``CdcEngine.view_status()``.  FS reads only
    (pointers + the spec), no parquet opened, no job run — EXCEPT with
    ``with_tombstones=True``, which additionally runs one tiny aggregation
    per tombstone state (count + max retained delete timestamp; the states
    are bounded by the horizon's event-seconds of deletes) and reports it
    under ``"tombstones"`` (see :func:`changelog_tombstone_status`)."""
    spec = _read_pinned_spec(spark, state_dir)
    out: dict = {
        "state_dir": state_dir,
        "spec": spec,
        "states": {},
        # per-table totals the monotonicity guard dropped (foreign /
        # replayed-with-gaps logs); {} for an always-in-order log
        "stale_dropped": changelog_stale_dropped(spark, state_dir),
    }
    if with_tombstones:
        out["tombstones"] = changelog_tombstone_status(spark, state_dir)
    kind = (spec or {}).get("kind")
    dirs = (
        {
            "fact_replica": _fact_replica_dir(state_dir),
            "dim_replica": _dim_replica_dir(state_dir),
            "fk_index": _fk_index_dir(state_dir),  # dual-indexed layouts
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
    # bucketed layouts: report bucket count vs occupancy (one tiny
    # manifest-JSON read per layout) so a mis-sized layout — every bucket
    # occupied and growing, or thousands sitting empty — is visible to
    # operators without opening any parquet (r11 verdict ask #6 bonus)
    lay: dict = {}
    if kind == "join":
        for field, label in (
            ("fact_buckets", "fact_replica"),
            ("fact_buckets", "join"),  # join state shares the fact-PK layout
            ("fk_buckets", "fk_index"),
            ("dim_buckets", "dim_replica"),
        ):
            n = (spec or {}).get(field)
            if n:
                lay[label] = _layout_occupancy(spark, dirs[label], n)
    elif (spec or {}).get("buckets"):
        lay["replica"] = _layout_occupancy(
            spark, _replica_dir(state_dir), spec["buckets"]
        )
    if lay:
        out["layout"] = lay
    return out


def _layout_occupancy(spark: SparkSession, root: str, n: int) -> dict:
    """``{"buckets": n, "occupied": k, "gen": g}`` from the layout's
    current manifest — FS reads only."""
    from cdc_lite_spark.streaming.bucketed import BucketedReplica

    rep = BucketedReplica(spark, root, n, [], "")
    try:
        man = rep.current_manifest()
    except FileNotFoundError:
        return {"buckets": n, "occupied": None, "gen": None}  # never committed
    return {
        "buckets": n,
        "occupied": len(man["buckets"]),
        "gen": man.get("gen"),
    }


def changelog_tombstone_status(spark: SparkSession, state_dir: str) -> dict:
    """Live delete-tombstone observability (r11 verdict ask #7): per
    tombstone state, how many delete markers are currently retained and
    the newest retained delete's capture timestamp (the horizon's current
    watermark — entries expire once the stream's event time passes
    ``watermark + horizon_s``).  ``{"horizon_s": h, "states": {label:
    {"live": N, "watermark": ts-or-None}}}``; ``horizon_s`` is ``None``
    and ``states`` empty when retention was never enabled.  Cost: one
    count+max aggregation per state over the horizon-bounded tombstone
    parquet — never the replica or the log."""
    spec = _read_pinned_spec(spark, state_dir)
    horizon = (spec or {}).get("tombstones")
    out: dict = {"horizon_s": horizon, "states": {}}
    if horizon is None:
        return out
    if (spec or {}).get("kind") == "join":
        dirs = {
            t: _tombs_dir_for(state_dir, t)
            for t in (spec["fact_table"], spec["dim_table"])
        }
    else:
        dirs = {"replica": _tombs_dir(state_dir)}
    for label, d in dirs.items():
        if not fs_for(d, spark).dir_exists(d):
            continue  # retention pinned but no epoch committed yet
        row = (
            read_current(spark, d)
            .agg(F.count("*").alias("live"), F.max("__ts").alias("wm"))
            .collect()[0]
        )
        out["states"][label] = {
            "live": int(row["live"]),
            "watermark": row["wm"].isoformat() if row["wm"] is not None else None,
        }
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
