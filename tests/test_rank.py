"""PageRank / TextRank (operators/rank.py): fixed-point trajectory
properties and hand-checked toy graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.rank import (
    RANK_ITERS,
    UNIT,
    pagerank,
    textrank_keywords,
)


def test_pagerank_two_node_symmetric(spark):
    """A symmetric 2-node graph is already stationary: every iteration
    maps score 1.0 -> 0.15 + 0.85·1.0 = 1.0 exactly (in units: the floor
    divisions are exact here), so both nodes end at exactly UNIT."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, w long"
    )
    out = {r["term"]: r["units"] for r in pagerank(edges, k=4).collect()}
    assert out == {"a": UNIT, "b": UNIT}


def test_pagerank_hub_outranks_leaf(spark):
    """Star graph: the hub receives every leaf's full mass and must end
    strictly above 1.0; leaves split the hub's mass and end below."""
    leaves = ["l1", "l2", "l3"]
    rows = [("hub", l, 1) for l in leaves] + [(l, "hub", 1) for l in leaves]
    edges = spark.createDataFrame(rows, "src string, dst string, w long")
    out = {r["term"]: r["score"] for r in pagerank(edges).collect()}
    assert out["hub"] > 1.0
    for l in leaves:
        assert out[l] < 1.0
    # leaves are symmetric — identical scores, bit-exact
    assert len({out[l] for l in leaves}) == 1


def test_pagerank_deterministic_rerun(spark):
    """Fixed-point arithmetic: two runs agree to the exact unit."""
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("b", "a", 1), ("a", "c", 1), ("c", "b", 5)],
        "src string, dst string, w long",
    )
    a = {r["term"]: r["units"] for r in pagerank(edges).collect()}
    b = {r["term"]: r["units"] for r in pagerank(edges).collect()}
    assert a == b


def test_textrank_repeated_word_ranks_highest(spark):
    """The word adjacent to everything (highest-degree co-occurrence node)
    must take the top TextRank score."""
    docs = spark.createDataFrame(
        [
            (1, "spark joins spark windows spark shuffles"),
            (2, "spark aggregates spark scans"),
            (3, "windows lag lead"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r["score"] for r in textrank_keywords(docs).collect()}
    top = max(out, key=out.get)
    assert top == "spark"
    # self-loops excluded: a doc of one repeated word contributes no edge
    solo = spark.createDataFrame([(9, "x x x")], "doc_id long, text string")
    assert textrank_keywords(solo).count() == 0


def test_textrank_iterations_fixed(spark):
    """k is a contract: differing iteration counts give different
    trajectories (guards against an accidental convergence early-exit)."""
    docs = spark.createDataFrame(
        [(1, "a b c a b d e a")], "doc_id long, text string"
    )
    k1 = {r["term"]: r["units"] for r in textrank_keywords(docs, k=1).collect()}
    k8 = {r["term"]: r["units"] for r in textrank_keywords(docs, k=RANK_ITERS).collect()}
    assert k1.keys() == k8.keys()
    assert k1 != k8


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; a path graph has none; duplicate/reversed
    input edges collapse to one canonical edge."""
    from cdc_lite_spark.operators.rank import triangle_count

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    edges = spark.createDataFrame(k4 + [("b", "a"), ("a", "b")], "a string, b string")
    r = triangle_count(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)

    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "a string, b string"
    )
    assert triangle_count(path).collect()[0]["n_triangles"] == 0


def test_triangle_count_hub_plus_rim(spark):
    """Wheel graph W5 (hub + 5-cycle rim): 5 rim triangles through the
    hub plus 0 rim-only — exactly 5; exercises the degree orientation
    (hub degree 5 vs rim degree 3)."""
    from cdc_lite_spark.operators.rank import triangle_count

    rim = ["r1", "r2", "r3", "r4", "r5"]
    edges = [("hub", r) for r in rim] + [
        (rim[i], rim[(i + 1) % 5]) for i in range(5)
    ]
    df = spark.createDataFrame(edges, "a string, b string")
    assert triangle_count(df).collect()[0]["n_triangles"] == 5
