"""CDC with maintained aggregate AND join views, end to end — runnable:

    python examples/maintained_views.py [workdir]

Creates a DuckDB database, monitors it in diff mode with seven registered
views plus an aggregate pair OVER the join (a per-group sum/count,
moments for mean/variance, a fixed-edge
histogram, a per-group HLL distinct count, per-term document frequency
of a text column, a fact⋈dim join view, and an aggregate OVER that join
view), mutates the database between
polls like an external application would, and prints the view states
plus interpolated quantiles after each tick.  Each tick folds ONLY the
change records into the persisted state — the tables are never re-joined
or rescanned after the initial build (except the documented HLL
degradation on deleting ticks), which is the shape that holds at 100 TB.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
# the DuckDB source is a Python DataSource — its worker processes import
# cdc_lite_spark too, so the repo must be on PYTHONPATH, not just sys.path
os.environ["PYTHONPATH"] = _repo + os.pathsep + os.environ.get("PYTHONPATH", "")

import duckdb

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.session import get_spark
from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource


def show(title, df, limit=10):
    print(f"-- {title}")
    for r in df.limit(limit).collect():
        print("  ", tuple(r))


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cdc_views_")
    db = os.path.join(work, "app.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE orders(id BIGINT, status VARCHAR, amount DECIMAL(18,2), "
        "memo VARCHAR)"
    )
    con.execute(
        "INSERT INTO orders SELECT range, ['open','paid','void'][1 + range % 3], "
        "(range % 900) * 1.25, 'order ' || ['rush','standard','bulk'][1 + range % 3] "
        "FROM range(5000)"
    )
    con.execute("CREATE TABLE status_dim(code VARCHAR, team VARCHAR)")
    con.execute(
        "INSERT INTO status_dim VALUES ('open','sales'), ('paid','finance'), "
        "('void','support')"
    )
    con.execute("CREATE TABLE team_dim(team_code VARCHAR, org VARCHAR)")
    con.execute(
        "INSERT INTO team_dim VALUES ('sales','field'), ('finance','hq'), "
        "('support','field')"
    )
    con.close()

    spark = get_spark("maintained_views_example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    eng = CdcEngine(
        spark, output_dir=f"{work}/changes", state_dir=f"{work}/state"
    )
    # exact sum/count per status (DECIMAL amounts: fold-order-free)
    eng.register_agg_view("revenue", "orders", ["status"], "amount")
    # quantile state: fixed edges survive every tick; out-of-range clamps
    eng.register_agg_view(
        "amount_hist", "orders", ["status"], "amount",
        kind="histogram", lo=0.0, hi=1200.0, bins=24,
    )
    # distinct amounts per status: KB-sized HLL state, lossless merges on
    # insert-only ticks, rebuild on deleting ticks (HLLs don't retract)
    eng.register_agg_view(
        "distinct_amounts", "orders", ["status"], "amount", kind="distinct_count"
    )
    # moments: Σv/Σv² — maintained mean/variance/stddev, fold TOTAL even
    # on deleting/moving ticks (abelian, exactly retractable)
    eng.register_agg_view(
        "amount_moments", "orders", ["status"], "amount", kind="moments"
    )
    # per-term document frequency of the memo text — the retrieval-index
    # statistics (df/N behind TF-IDF/BM25) folded from changed rows only
    eng.register_agg_view("memo_vocab", "orders", [], "memo", kind="term_df")
    # FILTERED view (r9): the predicate subset is maintained O(delta) too —
    # updates crossing the 500 boundary become inserts/deletes of the
    # view's world (filter_diff), never a rescan
    eng.register_agg_view(
        "big_revenue", "orders", ["status"], "amount", where="amount > 500"
    )
    # deterministic SAMPLE (r9): k example rows per status, membership by
    # key hash — inserts fold, in-group updates patch the payload in place
    eng.register_agg_view(
        "examples", "orders", ["status"], "memo", kind="sample", k=3
    )
    # DERIVED columns (r9): group by an expression bucket, aggregate an
    # expression value — the maintained Q1-style rollup
    eng.register_agg_view(
        "banded_net", "orders", ["band"], "net",
        derive={
            "band": "CAST(FLOOR(amount / 250) AS INT)",
            "net": "amount * CAST(0.9 AS DECIMAL(3,2))",
        },
    )
    # the join view: orders ⋈ status_dim kept current from BOTH sides'
    # change records — affected keys only, never a full re-join
    eng.register_join_view(
        "orders_teams",
        fact_table="orders",
        dim_table="status_dim",
        fact_key="id",
        fact_dim_col="status",
        dim_key="code",
    )
    # ...and an aggregate OVER the join view, folded from view-level
    # change records — the capstone: join+group-by current in O(delta)
    eng.register_join_agg_view("team_rev", "orders_teams", ["team"], "amount")
    # ...and maintained variance over the same join view (agg_kind moments)
    eng.register_join_agg_view(
        "team_spread", "orders_teams", ["team"], "amount", agg_kind="moments"
    )
    # ...and maintained QUANTILES over the join (agg_kind histogram, r9):
    # bucket counts retract exactly, so the fold is TOTAL like moments
    eng.register_join_agg_view(
        "team_hist", "orders_teams", ["team"], "amount",
        agg_kind="histogram", lo=0.0, hi=1200.0, bins=24,
    )
    # SNOWFLAKE CHAIN (r9): the join view itself is the fact of a second
    # join view — orders ⋈ status_dim ⋈ team_dim, every hop folding
    # O(delta) from the upstream fold's own change records
    eng.register_join_view(
        "orders_orgs",
        fact_table="orders_teams",
        dim_table="team_dim",
        fact_key="id",
        fact_dim_col="team",
        dim_key="team_code",
    )
    # BUCKETED STATE (r12): the same join, but the view state lives under
    # the fact-PK-bucketed manifest layout — a tick rewrites only the
    # buckets its affected keys touch instead of the whole view.  Worth it
    # above ~10M view rows; size with suggest_layout:
    #   from cdc_lite_spark.streaming.bucketed import suggest_layout
    #   suggest_layout(row_count=2_000_000_000, row_bytes=180)
    #   # -> {"replica": {"buckets": 1342, ...}, ...}
    # (4 here only so the example runs visibly at toy scale)
    eng.register_join_view(
        "orders_teams_bucketed",
        fact_table="orders",
        dim_table="status_dim",
        fact_key="id",
        fact_dim_col="status",
        dim_key="code",
        fact_buckets=4,
    )
    srcs = ConsistentSnapshotSource(spark, db).sources(
        ["orders", "status_dim", "team_dim"]
    )
    keys = {"orders": ["id"], "status_dim": ["code"], "team_dim": ["team_code"]}

    eng.poll_once(srcs, mode="diff", keys=keys)
    show("tick 1: revenue by status", eng.view("revenue"))
    show("tick 1: median/p95 amount", eng.view_quantiles("amount_hist", [0.5, 0.95]))
    show("tick 1: distinct amounts", eng.view_distinct_counts("distinct_amounts"))
    show("tick 1: mean/stddev amount", eng.view_moments("amount_moments"))
    show("tick 1: top memo terms", eng.view("memo_vocab").orderBy("term"), limit=4)
    show("tick 1: joined view (first rows)", eng.view("orders_teams"), limit=3)

    # an external writer mutates BOTH tables between polls
    con = duckdb.connect(db)
    con.execute("DELETE FROM orders WHERE id % 10 = 0")
    con.execute("UPDATE orders SET amount = amount * 2 WHERE status = 'paid'")
    con.execute(
        "INSERT INTO orders VALUES (90001, 'open', 9999.00, 'order expedite')"
    )  # amount clamps into the top histogram bucket; 'expedite' enters the vocab
    con.execute("UPDATE status_dim SET team = 'treasury' WHERE code = 'paid'")
    # the renamed team dangles in the chain until its leaf-dim row lands —
    # this INSERT makes the chained view re-surface all 'paid' orders
    con.execute("INSERT INTO team_dim VALUES ('treasury','hq')")
    con.close()

    captured = eng.poll_once(srcs, mode="diff", keys=keys)
    print(f"tick 2 captured: {captured} (views folded from change records only)")
    show("tick 2: revenue by status", eng.view("revenue"))
    show("tick 2: median/p95 amount", eng.view_quantiles("amount_hist", [0.5, 0.95]))
    show("tick 2: distinct amounts", eng.view_distinct_counts("distinct_amounts"))
    show("tick 2: mean/stddev amount", eng.view_moments("amount_moments"))
    show("tick 2: top-2 heaviest statuses", eng.view_topk("revenue", 2, []))
    show("tick 2: top memo terms", eng.view("memo_vocab").orderBy("term"), limit=5)
    show("tick 2: revenue WHERE amount > 500 (filtered view)", eng.view("big_revenue"))
    show("tick 2: 3 sampled memos per status", eng.view_sample("examples"))
    show(
        "tick 2: net revenue by derived price band",
        eng.view("banded_net").orderBy("band"),
    )
    teams = eng.view("orders_teams").groupBy("team").count()
    show("tick 2: joined view rows per team", teams)
    show("tick 2: maintained revenue per team", eng.view("team_rev"))
    show("tick 2: maintained amount spread per team", eng.view_moments("team_spread"))
    show(
        "tick 2: maintained median amount per team (quantiles over the join)",
        eng.view_quantiles("team_hist", [0.5]),
    )
    orgs = eng.view("orders_orgs").groupBy("org").count()
    show("tick 2: chained view (orders ⋈ status ⋈ team_dim) rows per org", orgs)
    # the bucketed twin serves identical rows — layout never changes
    # answers; view_status shows its manifest occupancy
    bkt = eng.view("orders_teams_bucketed")
    assert bkt.count() == eng.view("orders_teams").count()
    [occ] = [
        r["layout"] for r in eng.view_status()
        if r["name"] == "orders_teams_bucketed"
    ]
    print(f"-- bucketed twin: {bkt.count()} rows, layout {occ}")

    # CHANGELOG-DRIVEN consumer (r9): a downstream process — no engine —
    # folds the published A8 wire records into its own maintained view
    from cdc_lite_spark.sources.changelog import stream_changes
    from cdc_lite_spark.streaming.view_stream import (
        init_changelog_view,
        read_changelog_view,
        start_changelog_view,
    )

    ddl = "id BIGINT, status STRING, amount DECIMAL(18,2), memo STRING"
    init_changelog_view(spark, f"{work}/sub", ddl, ["status"], "amount")
    q = start_changelog_view(
        stream_changes(spark, f"{work}/changes", max_files_per_trigger=8),
        "orders", ddl, ["id"], ["status"], "amount",
        f"{work}/sub", f"{work}/sub_ckpt", available_now=True,
    )
    q.awaitTermination()
    show(
        "changelog consumer: revenue by status (engine-less, from the wire)",
        read_changelog_view(spark, f"{work}/sub"),
    )

    if len(sys.argv) <= 1:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
