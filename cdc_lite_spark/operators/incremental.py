"""Incremental aggregate maintenance from change records.

The CDC payoff: a grouped aggregate over a 100 TB table maintained by
applying the CHANGE records (+new, −old) to the previous aggregate instead
of rescanning the table per tick.  Works for any abelian-group aggregate
(sum, count; avg as sum/count) — the class that distributes over inserts
and retractions.

    new_agg = old_agg ⊕ Σ(cur values of INSERT/UPDATE) ⊖ Σ(prev values of
              UPDATE/DELETE)

Scale shape: the delta aggregation touches |changes| rows, not |table|;
the merge with the old aggregate is a join on the (small) group key domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nullsafe_merge(state: DataFrame, delta: DataFrame, keys: list[str]):
    """Full-outer state⊕delta merge that treats NULL group keys as ONE
    group: a plain column-list join never matches NULL==NULL, so a
    NULL-keyed group would split into two state rows with divided totals
    (r8 review).  Returns ``(joined, key_cols)`` where ``key_cols`` are the
    coalesced output key columns — callers select state/delta columns by
    NAME (unambiguous: only the join keys exist on both sides)."""
    from functools import reduce

    # dataset aliases, not DataFrame column refs: state and delta often
    # share lineage (both derive from the same table), and qualified refs
    # on a self-join trip Spark's ambiguity check
    s, d = state.alias("__state"), delta.alias("__delta")
    # backtick-quote the key names: a qualified ref parses dots as struct
    # access, so an unquoted key named "a.b" would fail to resolve.
    # Seeded with TRUE so keys=[] (a GLOBAL aggregate view) merges the two
    # one-row states instead of raising on reduce-of-empty (r8 review)
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"__state.`{k}`").eqNullSafe(F.col(f"__delta.`{k}`"))
            for k in keys
        ],
        F.lit(True),
    )
    joined = s.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"__state.`{k}`"), F.col(f"__delta.`{k}`")).alias(k)
        for k in keys
    ]
    return joined, key_cols


def sum_count_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """The maintainable aggregate state: per-key sum + count (avg derives).

    ``agg_count`` counts non-null values (SQL COUNT(col)); ``agg_rows``
    counts rows (COUNT(*)) and is what decides key liveness — a key whose
    values are all null still exists."""
    return df.groupBy(*keys).agg(
        F.sum(value_col).alias("agg_sum"),
        F.count(value_col).alias("agg_count"),
        F.count("*").alias("agg_rows"),
    )


def apply_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Fold diff records (``include_prev=True`` shape: operation, <cur
    cols>, prev_<cols>) into the aggregate state.

    INSERT contributes +cur; DELETE contributes −prev; UPDATE both.
    Groups whose count reaches zero drop out (key fully deleted).

    ``value_col`` may be one of the diff's KEY columns (e.g. summing or
    counting the PK per group): the diff emits no ``prev_`` twin for keys
    because a key cannot change — the current column doubles as the
    previous value (DELETE rows carry coalesced keys).
    """
    # Two contribution streams so an UPDATE that MOVES a row across groups
    # retracts from the old group and adds to the new one (and DELETE rows,
    # whose cur-side columns are null, retract under their prev-side keys):
    def _prev(c: str):
        return F.col(f"prev_{c}") if f"prev_{c}" in changes.columns else F.col(c)

    # __dn mirrors F.count(value_col) in sum_count_state, which skips nulls —
    # a null-valued insert/retraction must contribute 0 to the count or the
    # maintained agg_count drifts from the recomputed state (ADVICE r01) and
    # keys can be dropped/retained incorrectly by the agg_count > 0 filter.
    adds = changes.filter(F.col("operation").isin("INSERT", "UPDATE")).select(
        *[F.col(k).alias(k) for k in keys],
        F.col(value_col).alias("__dv"),
        F.when(F.col(value_col).isNotNull(), 1).otherwise(0).alias("__dn"),
        F.lit(1).alias("__dr"),
    )
    retracts = changes.filter(F.col("operation").isin("DELETE", "UPDATE")).select(
        *[_prev(k).alias(k) for k in keys],
        (-_prev(value_col)).alias("__dv"),
        F.when(_prev(value_col).isNotNull(), -1).otherwise(0).alias("__dn"),
        F.lit(-1).alias("__dr"),
    )
    delta = (
        adds.unionByName(retracts)
        .groupBy(*keys)
        .agg(
            F.sum("__dv").alias("d_sum"),
            F.sum("__dn").alias("d_count"),
            F.sum("__dr").alias("d_rows"),
        )
    )
    new_count = F.coalesce("agg_count", F.lit(0)) + F.coalesce("d_count", F.lit(0))
    new_sum = F.coalesce("agg_sum", F.lit(0)) + F.coalesce("d_sum", F.lit(0))
    joined, key_cols = nullsafe_merge(state, delta, keys)
    merged = joined.select(
        *key_cols,
        # SQL SUM over zero non-null values is NULL, not 0
        F.when(new_count > 0, new_sum).alias("agg_sum"),
        new_count.alias("agg_count"),
        (F.coalesce("agg_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0))).alias(
            "agg_rows"
        ),
    )
    # liveness by row count, not value count: all-null keys must survive
    return merged.filter(F.col("agg_rows") > 0)


def min_max_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key min/max/count state — the maintainable extrema aggregate.
    Monotone under inserts (each new value can only lower the min or raise
    the max), which is what makes the insert-only fold exact; a retraction
    may remove the current extremum, which no state smaller than the full
    value multiset can repair — callers rebuild on deleting ticks
    (engine.py documents the degradation)."""
    return df.groupBy(*keys).agg(
        F.min(value_col).alias("agg_min"),
        F.max(value_col).alias("agg_max"),
        F.count(value_col).alias("agg_count"),
        F.count("*").alias("agg_rows"),
    )


def apply_min_max_inserts(
    state: DataFrame, inserts: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Fold INSERT-only change records into min/max state exactly:
    new_min = least(old, delta), new_max = greatest(old, delta) — Spark's
    least/greatest skip nulls, so a brand-new key takes the delta's extrema
    and an all-null insert batch leaves them unchanged.  Touches |inserts|
    rows; the merge joins on the group-key domain."""
    delta = inserts.groupBy(*keys).agg(
        F.min(value_col).alias("__d_min"),
        F.max(value_col).alias("__d_max"),
        F.count(value_col).alias("__d_count"),
        F.count("*").alias("__d_rows"),
    )
    joined, key_cols = nullsafe_merge(state, delta, keys)
    return joined.select(
        *key_cols,
        F.least("agg_min", "__d_min").alias("agg_min"),
        F.greatest("agg_max", "__d_max").alias("agg_max"),
        (
            F.coalesce("agg_count", F.lit(0)) + F.coalesce("__d_count", F.lit(0))
        ).alias("agg_count"),
        (
            F.coalesce("agg_rows", F.lit(0)) + F.coalesce("__d_rows", F.lit(0))
        ).alias("agg_rows"),
    )


def moments_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key second-moment state: Σv, Σv², count, rows — the maintainable
    form of mean/variance/stddev.  Like sums and counts (and unlike extrema
    or sketches), both moments are abelian-group aggregates, so the state is
    EXACTLY retractable: a tick folds +cur/−prev and the maintained state
    stays bit-equal to a from-scratch rebuild — use DECIMAL value columns so
    Σ and Σv² are exact regardless of fold order.  Mean/variance derive from
    state alone (see ``engine.CdcEngine.view_moments``); the reference
    recomputes every statistic per poll (duckdb_cdc.go:175-183) — this is
    the O(delta) path for the drift-monitoring statistics a 100 TB corpus
    cannot rescan per tick.

    Scale shape: one partial-aggregable shuffle on the group keys for the
    build; a tick aggregates |changes| rows map-side and merges on the
    group-key domain."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.sum(v).alias("agg_sum"),
        F.sum(v * v).alias("agg_sum2"),
        F.count(v).alias("agg_count"),
        F.count("*").alias("agg_rows"),
    )


def apply_moments_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Fold diff records (``include_prev=True`` shape) into moments state:
    INSERT contributes (+v, +v²), DELETE (−prev, −prev²) under the PREV-side
    keys, UPDATE both — rows moving across groups retract from the old group
    and add to the new one, exactly :func:`apply_delta`'s algebra extended
    with the second moment.  Groups whose row count reaches zero drop out;
    a group left with zero non-null values carries NULL moments (matching
    SQL SUM-over-empty)."""

    def _prev(c: str):
        return F.col(f"prev_{c}") if f"prev_{c}" in changes.columns else F.col(c)

    cur_v, prev_v = F.col(value_col), _prev(value_col)
    adds = changes.filter(F.col("operation").isin("INSERT", "UPDATE")).select(
        *[F.col(k).alias(k) for k in keys],
        cur_v.alias("__dv"),
        (cur_v * cur_v).alias("__dv2"),
        F.when(cur_v.isNotNull(), 1).otherwise(0).alias("__dn"),
        F.lit(1).alias("__dr"),
    )
    retracts = changes.filter(F.col("operation").isin("DELETE", "UPDATE")).select(
        *[_prev(k).alias(k) for k in keys],
        (-prev_v).alias("__dv"),
        (-(prev_v * prev_v)).alias("__dv2"),
        F.when(prev_v.isNotNull(), -1).otherwise(0).alias("__dn"),
        F.lit(-1).alias("__dr"),
    )
    delta = (
        adds.unionByName(retracts)
        .groupBy(*keys)
        .agg(
            F.sum("__dv").alias("d_sum"),
            F.sum("__dv2").alias("d_sum2"),
            F.sum("__dn").alias("d_count"),
            F.sum("__dr").alias("d_rows"),
        )
    )
    new_count = F.coalesce("agg_count", F.lit(0)) + F.coalesce("d_count", F.lit(0))
    new_sum = F.coalesce("agg_sum", F.lit(0)) + F.coalesce("d_sum", F.lit(0))
    new_sum2 = F.coalesce("agg_sum2", F.lit(0)) + F.coalesce("d_sum2", F.lit(0))
    joined, key_cols = nullsafe_merge(state, delta, keys)
    merged = joined.select(
        *key_cols,
        # SQL SUM over zero non-null values is NULL, not 0
        F.when(new_count > 0, new_sum).alias("agg_sum"),
        F.when(new_count > 0, new_sum2).alias("agg_sum2"),
        new_count.alias("agg_count"),
        (F.coalesce("agg_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0))).alias(
            "agg_rows"
        ),
    )
    return merged.filter(F.col("agg_rows") > 0)


# --- incremental join-view maintenance --------------------------------------


def _cols(x: "str | list[str]") -> list[str]:
    """Normalize a key argument: every join-maintenance entry point accepts
    a single column name or a composite-key column list (r8 verdict: TPC-H
    lineitem's (l_orderkey, l_linenumber) PK is the commonest real fact
    shape).  Key columns are assumed non-null (primary/foreign keys), the
    same contract ``snapshot_diff`` keys carry."""
    return [x] if isinstance(x, str) else list(x)


def key_eq(pairs) -> "F.Column":
    """ONE multi-column equality predicate builder for every composite-key
    join site (fold path and the engine's initial build) — plain ``==``,
    matching the non-null PK/FK contract above; a future change (e.g.
    null-safe keys) lands once here instead of drifting across call sites.
    ``pairs`` is an iterable of (left Column, right Column)."""
    from functools import reduce

    return reduce(lambda a, b: a & b, [left == right for left, right in pairs])


def maintain_join(
    m_old: DataFrame,
    fact_new: DataFrame,
    dim_new: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_key: "str | list[str]",
    fact_dim_col: "str | list[str]",
    dim_key: "str | list[str]",
    assume_fk_integrity: bool = False,
    hint_broadcast: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Maintain a materialized many-to-one inner join ``M = fact ⋈ dim``
    from change records instead of re-joining the full tables.

    ``how="left_outer"`` maintains the LEFT-OUTER join instead: facts with
    dangling FKs stay in the view with null dim payloads, flip to joined
    rows when their dim key arrives, and flip back on dim delete.  The
    affected-key algebra is UNCHANGED — a dangling fact is affected
    exactly when its key (or its referenced dim key) is in a delta — so
    only the refresh join's type differs; the delete/insert fold and every
    scale property carry over verbatim.

    Every key argument takes one column name or a composite-key list:
    ``fact_key=["l_orderkey", "l_linenumber"]`` maintains a view over a
    composite-PK fact, and ``fact_dim_col``/``dim_key`` pair positionally
    for multi-column FKs (their lengths must match).

    ``m_old`` is the previous materialization (one row per ``fact_key``;
    the fact key must be unique — the usual fact-PK ⋈ dim-PK star shape).
    ``fact_changes`` / ``dim_changes`` are ``snapshot_diff`` outputs keyed
    by ``fact_key`` / ``dim_key`` (the diff coalesces keys, so DELETE rows
    still carry their key).  The affected-key set is

        keys(Δfact)  ∪  {facts referencing a key of Δdim}

    and the new view is

        M_new = (M_old ∖ affected)  ∪  ((fact_new ⋉ affected) ⋈ dim_new)

    so a tick's work is AFFECTED-sized — |Δfact| plus the fan-out of the
    changed dim keys into the fact table.  With ``hint_broadcast=True``
    (default) every join against the delta/affected set BROADCASTS it (no
    shuffle of M_old or fact_new; both sides are pruned map-side) — right
    whenever the fan-out is dimension-like (affected ≪ fact).  A HOT dim
    key (one dim row referenced by ~10^8 facts) makes ``affected``
    fan-out-sized, and a forced broadcast of it would abort the tick at
    the 8 GB broadcast cap instead of degrading; for such workloads pass
    ``hint_broadcast=False`` — the joins fall back to Catalyst/AQE
    strategy choice (broadcast when runtime stats allow, shuffle join
    otherwise), slower but completing.  The delta-key sets themselves
    (``keys(Δfact)``, ``keys(Δdim)``) are bounded by the change feed and
    are always safe to broadcast.  With ``assume_fk_integrity=True`` the dim-side
    affected facts are found in M_old (every live fact already joined —
    O(|M| filter));  the default finds them in ``fact_new`` instead, which
    additionally surfaces facts whose dim row did not exist before a
    dim-INSERT (dangling facts re-entering the inner join) at the cost of
    one broadcast-semi-join filter pass over the fact scan — still
    shuffle-free, and partition/bucket pruning on ``fact_dim_col`` keeps
    it sub-scan where the fact table is laid out for it.

    The reference engine re-emits whole tables per tick
    (duckdb_cdc.go:197-208); this is the O(delta) refinement for views
    that JOIN two captured tables.
    """
    state, _, _ = maintain_join_with_changes(
        m_old,
        fact_new,
        dim_new,
        fact_changes,
        dim_changes,
        fact_key,
        fact_dim_col,
        dim_key,
        assume_fk_integrity=assume_fk_integrity,
        hint_broadcast=hint_broadcast,
        with_changes=False,
        how=how,
    )
    return state


def affected_join_keys(
    fact_new: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_key: "str | list[str]",
    fact_dim_col: "str | list[str]",
    dim_key: "str | list[str]",
    hint_broadcast: bool = True,
) -> DataFrame:
    """The affected-fact-key set of a join-view tick — ``keys(Δfact) ∪
    {facts referencing a key of Δdim}`` — as a standalone plan, so a
    caller that needs it BEFORE the fold (the bucketed state layout
    derives its touched-bucket set from it, then reads only those buckets
    of the old view state) computes it once and injects it back via
    ``maintain_join_with_changes(affected=...)``.  Same plan shape as the
    internal computation: the delta-key sets broadcast, the fact scan is
    one map-side semi-join, nothing shuffles."""
    fk, fdc, dk = _cols(fact_key), _cols(fact_dim_col), _cols(dim_key)
    fact_keys = fact_changes.select(*fk).distinct()
    dim_keys = dim_changes.select(*dk).distinct()
    dkeys = F.broadcast(dim_keys) if hint_broadcast else dim_keys
    affected_via_dim = fact_new.join(
        dkeys,
        key_eq((fact_new[f], dim_keys[d]) for f, d in zip(fdc, dk)),
        "left_semi",
    ).select(*fk)
    return fact_keys.unionByName(affected_via_dim).distinct()


def _join_maintenance_parts(
    m_old: DataFrame,
    fact_new: DataFrame,
    dim_new: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_key: "str | list[str]",
    fact_dim_col: "str | list[str]",
    dim_key: "str | list[str]",
    assume_fk_integrity: bool,
    hint_broadcast: bool = True,
    how: str = "inner",
    persist_shared: bool = False,
    affected: "DataFrame | None" = None,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """(affected fact keys, refreshed view rows in ``m_old`` column order,
    persisted handles) — the shared delta machinery behind
    :func:`maintain_join` and :func:`join_view_changes`.  ``how`` is the
    refresh join's type: with ``left_outer`` an affected fact with no dim
    match re-enters null-extended instead of dropping.

    ``persist_shared=True`` additionally persists the left-outer branch's
    delta-bounded intermediates (the pruned fact side and the hit dim
    keys) and returns the handles: the outer refresh references the
    pruned facts THREE times (inner leg, fk projection, anti leg) and the
    dim table twice (inner leg, semi pass), so without pinning, every
    consuming action multiplies the fact/dim scan cost (r10 ADVICE).  The
    caller unpersists the handles when its actions are done."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"join view how must be inner or left_outer, got {how!r}")
    fk, fdc, dk = _cols(fact_key), _cols(fact_dim_col), _cols(dim_key)
    if len(fdc) != len(dk):
        raise ValueError(
            f"fact_dim_col {fdc} and dim_key {dk} pair positionally — "
            "lengths must match"
        )
    if affected is None:
        fact_keys = fact_changes.select(*fk).distinct()
        dim_keys = dim_changes.select(*dk).distinct()
        ref_side = m_old if assume_fk_integrity else fact_new
        affected_via_dim = (
            ref_side.join(
                F.broadcast(dim_keys),
                key_eq((ref_side[f], dim_keys[d]) for f, d in zip(fdc, dk)),
                "left_semi",
            ).select(*fk)
        )
        affected = fact_keys.unionByName(affected_via_dim).distinct()
    # prefix-rename the dim side before joining: the change sets share
    # lineage with dim_new/fact_new (they come from the same snapshots), so
    # qualified column refs would trip Spark's ambiguous-self-join check,
    # and a natural-join key can exist under the same name on both sides
    dim_pfx = dim_new.select(
        *[F.col(c).alias(f"__dim_{c}") for c in dim_new.columns]
    )
    # the pruned fact side is ≤ |affected| rows (fact_key unique) — Spark's
    # post-semi-join stats can't see that, so hint the broadcast: the
    # refresh never shuffles the dim table either.  Both hints are gated on
    # hint_broadcast: |affected| is fan-out-bounded, not delta-bounded, so
    # hot-dim-key workloads must be able to fall back to AQE strategy choice
    aff = F.broadcast(affected) if hint_broadcast else affected
    pruned_fact = fact_new.join(aff, fk, "left_semi")
    handles: list[DataFrame] = []
    if persist_shared and how == "left_outer":
        # ≤ |affected| rows (fact_key unique) — the three-way reuse below
        # re-scans fact_new per reference otherwise
        pruned_fact = pruned_fact.persist()
        handles.append(pruned_fact)
    refreshed = (
        F.broadcast(pruned_fact) if hint_broadcast else pruned_fact
    ).join(
        dim_pfx,
        key_eq((F.col(f), F.col(f"__dim_{d}")) for f, d in zip(fdc, dk)),
        "inner",
    )
    out_cols = [
        F.col(c) if c in fact_new.columns else F.col(f"__dim_{c}").alias(c)
        for c in m_old.columns
    ]
    refreshed = refreshed.select(*out_cols)
    if how == "left_outer":
        # a LeftOuter BroadcastHashJoin can only BUILD ITS RIGHT side, so
        # the delta-bounded fact broadcast is unusable in a direct outer
        # refresh — Spark would fall back to shuffling BOTH the pruned
        # fact and the whole dim table (observed SortMergeJoin).  Express
        # the outer refresh as inner ∪ null-extended-unmatched instead.
        # The unmatched set comes from a dim-key semi pass (NOT from the
        # inner refresh's output — that would re-evaluate the whole join
        # subtree once more per consuming action): dim keys referenced by
        # the pruned facts are delta-bounded (dim_key unique), so both
        # the semi and the anti build on broadcast delta sets, the dim is
        # scanned narrow/map-side, and nothing shuffles.
        fk_vals = pruned_fact.select(*fdc).distinct()
        fkv = F.broadcast(fk_vals) if hint_broadcast else fk_vals
        dim_hit = dim_pfx.join(
            fkv,
            key_eq(
                (F.col(f"__dim_{d}"), fk_vals[f]) for f, d in zip(fdc, dk)
            ),
            "left_semi",
        ).select(*[F.col(f"__dim_{d}") for d in dk])
        if persist_shared:
            # delta-bounded (dim_key unique among the referenced keys) —
            # pins the dim table's ONE narrow semi scan per tick so the
            # anti leg and repeated actions never re-read the dim
            dim_hit = dim_hit.persist()
            handles.append(dim_hit)
        dh = F.broadcast(dim_hit) if hint_broadcast else dim_hit
        dim_types = {f.name: f.dataType for f in dim_new.schema.fields}
        null_ext = pruned_fact.join(
            dh,
            key_eq((F.col(f), F.col(f"__dim_{d}")) for f, d in zip(fdc, dk)),
            "left_anti",
        ).select(
            *[
                F.col(c)
                if c in fact_new.columns
                else F.lit(None).cast(dim_types[c]).alias(c)
                for c in m_old.columns
            ]
        )
        refreshed = refreshed.unionByName(null_ext)
    return affected, refreshed, handles


def join_view_changes(
    m_old: DataFrame,
    fact_new: DataFrame,
    dim_new: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_key: "str | list[str]",
    fact_dim_col: "str | list[str]",
    dim_key: "str | list[str]",
    assume_fk_integrity: bool = False,
    hint_broadcast: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Change records FOR THE JOIN VIEW itself, delta-sized: every affected
    key emits a DELETE of its old view row (prev\\_-side values) and/or an
    INSERT of its new one — the ``snapshot_diff(include_prev=True)`` shape
    that :func:`apply_delta` folds, so an aggregate OVER the join is
    maintained end-to-end in O(delta) without ever materializing the new
    view or re-joining the tables.  A key present on both sides emits
    DELETE+INSERT rather than UPDATE; the apply_delta adds/retracts
    algebra treats the two encodings identically.

    Same scale shape as :func:`maintain_join` minus the M_old anti-join:
    both legs are broadcast-pruned; nothing wider than the delta shuffles.
    ``hint_broadcast`` has the same hot-dim-key escape-hatch semantics as
    :func:`maintain_join`.
    """
    _, changes, _ = maintain_join_with_changes(
        m_old,
        fact_new,
        dim_new,
        fact_changes,
        dim_changes,
        fact_key,
        fact_dim_col,
        dim_key,
        assume_fk_integrity=assume_fk_integrity,
        hint_broadcast=hint_broadcast,
        how=how,
    )
    return changes


def maintain_join_with_changes(
    m_old: DataFrame,
    fact_new: DataFrame,
    dim_new: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_key: "str | list[str]",
    fact_dim_col: "str | list[str]",
    dim_key: "str | list[str]",
    assume_fk_integrity: bool = False,
    hint_broadcast: bool = True,
    persist_shared: bool = False,
    with_changes: bool = True,
    how: str = "inner",
    affected: "DataFrame | None" = None,
) -> tuple[DataFrame, DataFrame | None, list[DataFrame]]:
    """Both fold outputs from ONE delta evaluation:
    ``(new_view, view_changes, persisted_handles)``.

    :func:`maintain_join` and :func:`join_view_changes` are thin wrappers;
    a caller that needs BOTH (the engine loop maintains the join state AND
    folds aggregates from its change records) uses this form with
    ``persist_shared=True`` so the delta-sized intermediates —
    ``affected`` fact keys, ``refreshed`` view rows, ``removed`` old rows —
    materialize once and every consuming action (the state write, each
    aggregate's state write) reuses them instead of re-running the
    affected-set computation and the pruned refresh join per action (r8
    review).  The caller unpersists the returned handles when its actions
    are done.  ``with_changes=False`` skips BUILDING the change-record
    plan entirely (returns ``None``): the I/D projection requires the
    view to have no ``operation``/``prev_``-prefixed columns, and a
    state-only caller must not fail that requirement for records it never
    consumes."""
    from cdc_lite_spark.envelope import DELETE, INSERT

    fk = _cols(fact_key)
    # a caller-provided affected set (affected_join_keys) is owned by the
    # caller: never re-persisted here, never handed back as a handle
    owns_affected = affected is None
    affected, refreshed, handles = _join_maintenance_parts(
        m_old,
        fact_new,
        dim_new,
        fact_changes,
        dim_changes,
        fact_key,
        fact_dim_col,
        dim_key,
        assume_fk_integrity,
        hint_broadcast,
        how,
        persist_shared=persist_shared,
        affected=affected,
    )
    try:
        if persist_shared:
            # only the affected persist is gated on ownership — a caller-
            # provided affected set is already persisted by the caller, but
            # ``refreshed`` is built HERE and must materialize once however
            # the affected set arrived, or every consuming action (state
            # commit + each agg fold) re-runs the pruned refresh join
            if owns_affected:
                affected = affected.persist()
                handles.append(affected)
            refreshed = refreshed.persist()
            handles.append(refreshed)
        aff = F.broadcast(affected) if hint_broadcast else affected
        kept = m_old.join(aff, fk, "left_anti")
        state = kept.unionByName(refreshed)
        if not with_changes:
            return state, None, handles
        removed = m_old.join(aff, fk, "left_semi")
        if persist_shared:
            removed = removed.persist()
            handles.append(removed)
        other = [c for c in m_old.columns if c not in fk]
        dtypes = {f.name: f.dataType for f in m_old.schema.fields}
        ins = refreshed.select(
            *[F.col(k) for k in fk],
            F.lit(INSERT).alias("operation"),
            *[F.col(c) for c in other],
            *[F.lit(None).cast(dtypes[c]).alias(f"prev_{c}") for c in other],
        )
        dels = removed.select(
            *[F.col(k) for k in fk],
            F.lit(DELETE).alias("operation"),
            *[F.lit(None).cast(dtypes[c]).alias(c) for c in other],
            *[F.col(c).alias(f"prev_{c}") for c in other],
        )
        return state, ins.unionByName(dels), handles
    except Exception:
        # plan construction failed after persists registered: release the
        # handles here — the caller never received them (r8 review: they
        # would otherwise leak in the cache manager for the session's life)
        for df in handles:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
        raise


# --- incremental retrieval-index statistics ---------------------------------


def dfreq_state(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The maintainable retrieval-index statistics: per-term document
    frequency plus the corpus doc count carried on every row (the pair
    TF-IDF/BM25 idf reads).  One explode over DISTINCT per-doc terms +
    one hash-agg.  ``id_col`` is unused (df is a per-term count of docs,
    which array_distinct already guarantees per row) and kept only for
    signature stability."""
    from cdc_lite_spark.operators.text import tokens

    terms = docs.select(
        F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    df_counts = terms.groupBy("term").agg(F.count("*").alias("df_count"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return df_counts.crossJoin(F.broadcast(n))


def apply_text_delta(
    state: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    cur_col: str = "text",
    prev_col: str = "prev_text",
) -> DataFrame:
    """Fold document change records (operation, id, cur text, prev text —
    the ``include_prev=True`` diff shape) into the df/N state: an INSERT
    adds each distinct new term, a DELETE retracts each distinct old term,
    an UPDATE does both — so a term's df moves only when membership
    actually changes.  Terms whose df reaches zero drop out.

    This is the CDC payoff applied to the TEXT tier: the 100 TB corpus's
    retrieval statistics stay current by touching |changed docs| tokens
    per tick, never rescanning the corpus.  Cost: one explode over changed
    docs + a vocabulary-keyed merge join.

    Representation caveat: ``n_docs`` rides on the term rows, so a state
    with ZERO term rows (an all-termless corpus) cannot carry a non-zero
    doc count — folding onto such a state restarts ``n_docs`` from this
    delta's net inserts.  Rebuild from the current corpus instead when the
    state is empty (the engine's ``term_df`` view kind does exactly that,
    engine.py ``_fold_agg_state``)."""
    from cdc_lite_spark.operators.text import tokens

    adds = changes.filter(F.col("operation").isin("INSERT", "UPDATE")).select(
        F.explode(F.array_distinct(tokens(cur_col))).alias("term"),
        F.lit(1).alias("__d"),
    )
    retracts = changes.filter(F.col("operation").isin("DELETE", "UPDATE")).select(
        F.explode(F.array_distinct(tokens(prev_col))).alias("term"),
        F.lit(-1).alias("__d"),
    )
    delta = adds.unionByName(retracts).groupBy("term").agg(F.sum("__d").alias("d"))
    dn = changes.agg(
        F.sum(
            F.when(F.col("operation") == "INSERT", 1)
            .when(F.col("operation") == "DELETE", -1)
            .otherwise(0)
        ).alias("dn")
    )
    merged = (
        state.drop("n_docs")
        .join(delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df_count", F.lit(0)) + F.coalesce("d", F.lit(0))).alias(
                "df_count"
            ),
        )
        .filter(F.col("df_count") > 0)
    )
    n_old = state.agg(F.max("n_docs").alias("n_prev"))
    n_new = n_old.crossJoin(dn).select(
        # coalesce(n_prev): an initially-empty corpus has an empty state
        # table, so max() is NULL
        (F.coalesce("n_prev", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_docs")
    )
    return merged.crossJoin(F.broadcast(n_new))


# -- maintained deterministic sample (bottom-k by key hash) -------------------
#
# A per-group uniform sample maintained from change records: keep the k rows
# whose PRIMARY-KEY hash is smallest (the KMV / bottom-k sketch construction
# — Bar-Yossef et al., "Counting distinct elements in a data stream",
# RANDOM'02 — applied to row identity instead of value identity).  Hashing
# the key makes membership a PURE function of row identity: deterministic
# across ticks, partitionings, and engines — and uniformly random in the
# hash's randomness, so the sample is an unbiased row sample per group.
#
# Fold algebra (the min_max family, one refinement):
# - INSERT: bottom-k(state ∪ inserts) — exact, because state already holds
#   the k smallest of the previous rows (monotone under inserts).
# - UPDATE that keeps the group: the row's hash — and so its MEMBERSHIP —
#   is unchanged (keys cannot change); if it is in the sample, its payload
#   is replaced in place.  Exact, |updates|-sized.
# - DELETE / UPDATE that moves groups: may evict a sampled row, and no
#   state smaller than the group's full row set can name the (k+1)-th —
#   callers rebuild (the engine degradation shared with min_max).


def _pk_string(pk_cols: "list[str]"):
    """The canonical string rendering of the key tuple: US-separated,
    NULL components as NUL.  THE single definition — sample_state,
    apply_sample_delta, and _sample_hash must all hash/join on the exact
    same bytes or row identities silently split."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in pk_cols]
    return F.concat_ws("\x1f", *parts)


def _sample_hash(pk_cols: "list[str]"):
    """Deterministic 60-bit hash of the key tuple (DuckDB-reproducible —
    functions/hashes.py portable_hash64 over the _pk_string rendering).
    Key columns have no prev_ twins in diff records (a key cannot
    change), so the same expression reads both row images."""
    from cdc_lite_spark.functions.hashes import portable_hash64

    return portable_hash64(_pk_string(pk_cols))


def bottom_k(df: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Keep each group's k smallest ``(__h, __pk)`` rows — THE single
    definition of sample ordering (total order: hash, then key string).
    sample_state, apply_sample_delta, and the engine's partition-sample
    merge (view_merged) must all rank identically or maintained samples
    silently diverge from rebuilds — one helper, not three copies (the
    _pk_string lesson, r9 ADVICE)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("__h"), F.col("__pk"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_state(
    df: DataFrame, keys: list[str], value_col: str, pk_cols: list[str], k: int
) -> DataFrame:
    """Per-group bottom-k sample state: ``(keys..., __pk, __h, value_col)``
    — the k rows with the smallest key hash per group, ties broken by the
    key string (total order: membership is deterministic).  One shuffle on
    the group keys; Spark rewrites the rank filter to a WindowGroupLimit
    partial, so only k rows per group survive each input partition before
    the shuffle."""
    from pyspark.sql import Window

    pk_str = _pk_string(pk_cols)
    if value_col in keys:
        raise ValueError(
            "sample state keeps the payload beside the group keys — "
            f"value_col {value_col!r} must not be one of the group keys"
        )
    return bottom_k(
        df.select(
            *keys,
            pk_str.alias("__pk"),
            _sample_hash(pk_cols).alias("__h"),
            F.col(value_col),
        ),
        keys,
        k,
    )


def apply_sample_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    pk_cols: list[str],
    k: int,
) -> DataFrame:
    """Fold a delta WITHOUT retractions (no DELETE, no group-moving
    UPDATE — the engine probes and rebuilds on those) into bottom-k sample
    state exactly: in-group updates replace the payload of sampled rows in
    place (membership rides on the key hash, which cannot change), then
    inserts re-rank against the survivors.  Touches |changes| rows; the
    re-rank shuffles O(k)-per-group state rows, never the table."""
    from pyspark.sql import Window

    upd = changes.filter(F.col("operation") == "UPDATE").select(
        _pk_string(pk_cols).alias("__pk"),
        F.col(value_col).alias("__new_v"),
        # explicit hit marker: NULL payloads must patch THROUGH — a bare
        # coalesce(__new_v, old) would silently keep the stale value when
        # an update sets the value column to NULL
        F.lit(True).alias("__hit"),
    )
    # broadcast the delta-sized update map against the O(groups·k) state
    patched = (
        state.join(F.broadcast(upd), "__pk", "left_outer")
        .withColumn(
            value_col,
            F.when(F.col("__hit").isNotNull(), F.col("__new_v")).otherwise(
                F.col(value_col)
            ),
        )
        .drop("__new_v", "__hit")
    )
    ins = changes.filter(F.col("operation") == "INSERT")
    delta = ins.select(
        *keys,
        _pk_string(pk_cols).alias("__pk"),
        _sample_hash(pk_cols).alias("__h"),
        F.col(value_col),
    )
    return bottom_k(
        patched.select(*keys, "__pk", "__h", value_col).unionByName(delta),
        keys,
        k,
    )
