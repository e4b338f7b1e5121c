"""Mergeable frequent-items summaries (Misra-Gries / SpaceSaving family).

The maintained ``sum_count`` view + ``view_topk`` already give EXACT
heavy hitters — but their state is one row per (group, item), which is
only viable while the item domain fits (statuses, segments, hosts).  The
LLM-corpus cases that matter — frequent n-grams, URLs, near-duplicate
shingles over 100 TB — have unbounded domains where even the partial
aggregation's shuffle carries |domain| rows.  This module bounds BOTH the
state and the shuffle at O(k) per group with the classic Misra-Gries
guarantee over a group of n rows:

    every item with true count > n/(k+1) is present in the summary, and
    each stored weight satisfies   wt ≤ true_count ≤ wt + deficit
    where deficit = the group's cumulative decrement mass ≤ n/(k+1).

Spark shape (the 100 TB design point):

1. ``mapInPandas`` builds one MG summary PER PARTITION per group and
   emits it as ONE array-valued row ``(keys..., items, wts, deficit,
   n_rows)`` — O(|groups|) rows out of each task regardless of input
   size, and the one-row-per-source representation makes the merge's
   deficit/count bookkeeping exact by construction (no riding totals to
   double-count);
2. one shuffle on the group keys carries only those bounded rows;
3. ``applyInPandas`` merges the partials per group — Agarwal et al.,
   "Mergeable Summaries" (PODS'12): weights of shared items add, then
   one decrement round (subtract the (k+1)-th largest, drop ≤ 0)
   restores capacity; deficits add, so the εn bound is additive.

Both Python hops are Arrow-batched (no per-row UDFs); the merge input is
one row per group per source, never the data.  The same merge is the
INSERT-only maintenance fold — summarize the batch, merge into state —
with the bracket widening by the batch's deficit only.  Retractions
cannot be folded out (the decremented mass is gone): deleting ticks
rebuild, the ``distinct_count``/``min_max`` degradation discipline.

Determinism note: stored weights depend on partition boundaries (every
distributed MG's do).  The GUARANTEES are deterministic — presence of
every true-heavy item and the [wt, wt + deficit] bracket — so oracle
gates assert those as flags against exact recomputes (the HLL-gate
pattern), and tests pin exactness when k ≥ |distinct items| (deficit 0,
weights equal true counts).

Reference scope note: the reference engine (duckdb_cdc.go) has no
approximate tier at all — this extends the X-tier sketch family
(sketches.py HLL, histogram.py quantiles) with the frequency axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _compress(counters: dict, k: int) -> tuple[dict, int]:
    """One Misra-Gries decrement round: subtract the (k+1)-th largest
    weight from every counter and drop non-positive — restores ≤ k
    entries.  Returns (compressed counters, decrement mass)."""
    if len(counters) <= k:
        return counters, 0
    cut = sorted(counters.values())[len(counters) - k - 1]
    return {i: w - cut for i, w in counters.items() if w - cut > 0}, cut


def _state_schema(key_fields: list, item_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            *key_fields,
            T.StructField("items", T.ArrayType(item_type, False), False),
            T.StructField("wts", T.ArrayType(T.LongType(), False), False),
            T.StructField("deficit", T.LongType(), False),
            T.StructField("n_rows", T.LongType(), False),
        ]
    )


def _merge_rows(keys: list[str], k: int):
    """applyInPandas body: merge one group's summary rows (one row per
    source) into a single compressed row."""

    def merge(pdf):
        import pandas as pd

        counters: dict = {}
        deficit = 0
        n = 0
        for items, wts, dfc, nn in zip(
            pdf["items"], pdf["wts"], pdf["deficit"], pdf["n_rows"]
        ):
            for item, wt in zip(items, wts):
                counters[item] = counters.get(item, 0) + int(wt)
            deficit += int(dfc)
            n += int(nn)
        counters, cut = _compress(counters, k)
        deficit += cut
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                (
                    *[first[c] for c in keys],
                    list(counters.keys()),
                    [int(w) for w in counters.values()],
                    deficit,
                    n,
                )
            ],
            columns=[*keys, "items", "wts", "deficit", "n_rows"],
        )

    return merge


def freq_items_state(
    df: DataFrame, keys: list[str], item_col: str, k: int = 64
) -> DataFrame:
    """Per-group Misra-Gries summary of ``item_col``: ONE row per group
    ``(keys..., items, wts, deficit, n_rows)`` with ≤ k (item, weight)
    pairs.  ``n_rows`` counts non-null items (the multiset the guarantee
    speaks about).

    Scale shape: each input task emits ≤ |groups| bounded rows
    (mapInPandas, Arrow-batched); ONE shuffle on the group keys carries
    those partials; the per-group merge reads one row per task.  The item
    domain itself never shuffles — the property exact counting cannot
    have."""
    if not k > 0:
        raise ValueError(f"k must be positive, got {k}")
    fields = {f.name: f for f in df.schema.fields}
    missing = [c for c in [*keys, item_col] if c not in fields]
    if missing:
        raise ValueError(f"columns {missing} not in frame ({list(fields)})")
    schema = _state_schema([fields[c] for c in keys], fields[item_col].dataType)

    def _partial(batches):
        import pandas as pd

        state: dict = {}  # group tuple -> [counters dict, deficit, n]
        for pdf in batches:
            sub_iter = (
                pdf.groupby(list(keys), dropna=False, sort=False)
                if keys
                else [((), pdf)]
            )
            for gk, sub in sub_iter:
                g = gk if isinstance(gk, tuple) else (gk,)
                st = state.setdefault(g, [{}, 0, 0])
                vals = sub[item_col].dropna()
                for item, cnt in vals.value_counts().items():
                    st[0][item] = st[0].get(item, 0) + int(cnt)
                    if len(st[0]) > 2 * k:  # amortize compression
                        st[0], cut = _compress(st[0], k)
                        st[1] += cut
                st[2] += int(len(vals))
        rows = []
        for g, (counters, deficit, n) in state.items():
            counters, cut = _compress(counters, k)
            rows.append(
                (
                    *g,
                    list(counters.keys()),
                    [int(w) for w in counters.values()],
                    deficit + cut,
                    n,
                )
            )
        yield pd.DataFrame(rows, columns=[*keys, "items", "wts", "deficit", "n_rows"])

    partials = df.select(*keys, item_col).mapInPandas(_partial, schema)
    if not keys:
        # global summary: applyInPandas needs a grouping — use a constant
        return (
            partials.withColumn("__g", F.lit(0))
            .groupBy("__g")
            .applyInPandas(_merge_rows(["__g"], k), _state_schema(
                [T.StructField("__g", T.IntegerType(), False)],
                fields[item_col].dataType,
            ))
            .drop("__g")
        )
    return partials.groupBy(*keys).applyInPandas(_merge_rows(keys, k), schema)


def merge_grouped_freq(
    state: DataFrame, keys: list[str], k: int = 64
) -> DataFrame:
    """N-way merge: collapse MULTIPLE summary rows per group (one per
    source / partition) into one — weights of shared items add, one
    decrement round restores capacity, deficits and row counts add, so
    the ``wt ≤ true ≤ wt + deficit`` bracket holds for the union with
    deficit ≤ Σnᵢ/(k+1).  Input is one row per (group, source) — state
    arithmetic, never the data."""
    schema = _state_schema(
        [f for f in state.schema.fields if f.name in keys],
        state.schema["items"].dataType.elementType,
    )
    if not keys:
        return (
            state.withColumn("__g", F.lit(0))
            .groupBy("__g")
            .applyInPandas(_merge_rows(["__g"], k), _state_schema(
                [T.StructField("__g", T.IntegerType(), False)],
                state.schema["items"].dataType.elementType,
            ))
            .drop("__g")
        )
    return state.groupBy(*keys).applyInPandas(_merge_rows(keys, k), schema)


def merge_freq_states(
    a: DataFrame, b: DataFrame, keys: list[str], k: int = 64
) -> DataFrame:
    """Merge two summaries in the ``freq_items_state`` shape (each one row
    per group) — the two-source special case of
    :func:`merge_grouped_freq`."""
    return merge_grouped_freq(a.unionByName(b), keys, k)


def fold_freq_inserts(
    state: DataFrame,
    inserts: DataFrame,
    keys: list[str],
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """INSERT-only maintenance fold: summarize the batch (O(batch) work,
    bounded output) and merge it into the state — the presence guarantee
    holds for the grown total, the bracket widens by the batch's deficit
    only.  A tick with DELETEs or item-changing UPDATEs rebuilds (the
    decremented mass cannot be given back), the sketch-tier degradation
    discipline."""
    return merge_freq_states(
        state, freq_items_state(inserts, keys, item_col, k), keys, k
    )


def heavy_hitters(
    state: DataFrame, keys: list[str], min_share: float | None = None
) -> DataFrame:
    """Report rows from a summary: one row per surviving item with its
    count bracket ``[count_lo, count_hi]``.  With ``min_share``, keep
    items whose LOWER bound clears ``min_share·n_rows`` — no false
    positives from the bracket (an exact-count item at the threshold may
    be withheld; tighten k to shrink the bracket).  State-only: reads the
    ≤ k-entry arrays, never the data."""
    exploded = state.select(
        *keys,
        F.explode(F.arrays_zip(F.col("items").alias("item"), F.col("wts").alias("wt"))).alias("e"),
        "deficit",
        "n_rows",
    ).select(
        *keys,
        F.col("e.item").alias("item"),
        F.col("e.wt").alias("count_lo"),
        (F.col("e.wt") + F.col("deficit")).alias("count_hi"),
        "n_rows",
    )
    if min_share is not None:
        exploded = exploded.filter(
            F.col("count_lo") >= F.lit(min_share) * F.col("n_rows")
        )
    return exploded
