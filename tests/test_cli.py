"""CLI driver test (reference: cmd/cdc-lite/main.go) — run the monitor for a
bounded duration over a parquet source dir, then check the log."""

from __future__ import annotations

from cdc_lite_spark.cli import main
from cdc_lite_spark.sources.changelog import read_changes


def test_cli_monitors_and_stops(spark, sf_dir, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region,nation",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
        ],
        spark=spark,
    )
    assert rc == 0
    log = read_changes(spark, out)
    assert log.filter("table = 'region'").count() == 5
    assert log.filter("table = 'nation'").count() == 25


def test_cli_diff_mode_with_keys(spark, sf_dir, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--mode", "diff",
            "--keys", "region=r_regionkey",
        ],
        spark=spark,
    )
    assert rc == 0
    log = read_changes(spark, out, table="region")
    assert log.count() == 5
    assert log.filter("operation = 'INSERT'").count() == 5


def test_run_query_list_and_execute(tmp_path, capsys):
    from cdc_lite_spark import run_query

    assert run_query.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "cdc_table_checksums" in out and "[oracle]" in out

    dest = str(tmp_path / "out")
    rc = run_query.main(
        ["pricing_summary", "--sf-dir", "/root/testdata/sf0.001", "--out", dest]
    )
    assert rc == 0
    import glob

    assert glob.glob(dest + "/part-*")


def test_run_query_unknown_name_errors():
    from cdc_lite_spark import run_query

    assert run_query.main(["no_such_query"]) == 2


def test_cli_monitors_csv_tables(spark, tmp_path):
    """A directory of <table>.csv files is a valid --source: the CLI
    resolves per-table files by extension and the monitor captures them."""
    src_dir = tmp_path / "srcs"
    src_dir.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(
        1
    ).write.option("header", "true").csv(str(src_dir / "items.csv"))

    from cdc_lite_spark.cli import main as cli_main

    rc = cli_main(
        [
            "--source", str(src_dir),
            "--tables", "items",
            "--output-dir", str(tmp_path / "out"),
            "--state-dir", str(tmp_path / "state"),
            "--interval", "1",
            "--duration", "6",
        ],
        spark=spark,
    )
    assert rc == 0
    from cdc_lite_spark.sources.changelog import read_changes

    log = read_changes(spark, str(tmp_path / "out"), "items")
    assert log.count() >= 2


def test_cli_rejects_conflicting_partition_and_key_specs(spark, tmp_path):
    """Malformed or conflicting capture specs fail at argument parsing,
    not as a per-tick error loop: multi-column partition specs, unknown
    tables, and a table in both --keys and --partition-cols."""
    import pytest

    from cdc_lite_spark.cli import main

    base = [
        "--source", str(tmp_path),
        "--tables", "events",
        "--output-dir", str(tmp_path / "o"),
        "--state-dir", str(tmp_path / "s"),
        "--duration", "0.1",
    ]
    with pytest.raises(SystemExit):
        main(base + ["--partition-cols", "events=event_type,region"], spark=spark)
    with pytest.raises(SystemExit):
        main(base + ["--partition-cols", "unknown=c"], spark=spark)
    with pytest.raises(SystemExit):
        main(base + ["--schema", "unknown=id long"], spark=spark)
    with pytest.raises(SystemExit):
        main(
            base
            + ["--keys", "events=event_id", "--partition-cols", "events=event_type"],
            spark=spark,
        )


def test_cli_agg_view_maintained_and_validated(spark, sf_dir, tmp_path):
    """--agg-view registers a maintained sum/count view that the monitor
    folds per tick; malformed/keyless specs fail at parse time."""
    import pytest

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--mode", "diff",
            "--keys", "region=r_regionkey",
            "--agg-view", "rk=region:r_name:r_regionkey",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_agg_view("rk", "region", ["r_name"], "r_regionkey")
    view = eng.view("rk")
    assert view.count() == 5  # one group per region name
    assert view.filter("agg_rows != 1").count() == 0

    base = [
        "--source", sf_dir,
        "--tables", "region",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
    ]
    with pytest.raises(SystemExit):  # malformed spec
        main(base + ["--mode", "diff", "--keys", "region=r_regionkey",
                     "--agg-view", "rk=region:r_name"], spark=spark)
    with pytest.raises(SystemExit):  # snapshot mode has no change records
        main(base + ["--agg-view", "rk=region:r_name:r_regionkey"], spark=spark)
    with pytest.raises(SystemExit):  # keyed but UNMONITORED table: the view
        # would silently never materialize
        main(
            base
            + ["--mode", "diff", "--keys", "region=r_regionkey,orders=o_orderkey",
               "--agg-view", "rev=orders:o_orderstatus:o_totalprice"],
            spark=spark,
        )


def test_cli_join_view_maintained_and_validated(spark, sf_dir, tmp_path):
    """--join-view registers a maintained fact⋈dim view the monitor folds
    per tick from both tables' change records; malformed or
    partially-monitored specs fail at parse time."""
    import pytest

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "nation,region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--mode", "diff",
            "--keys", "nation=n_nationkey,region=r_regionkey",
            "--join-view", "nr=nation:region:n_nationkey:n_regionkey:r_regionkey",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_join_view(
        "nr",
        fact_table="nation",
        dim_table="region",
        fact_key="n_nationkey",
        fact_dim_col="n_regionkey",
        dim_key="r_regionkey",
    )
    view = eng.view("nr")
    assert view.count() == 25  # every nation joins its region
    assert set(view.columns) >= {"n_nationkey", "n_regionkey", "r_regionkey", "r_name"}

    base = [
        "--source", sf_dir,
        "--tables", "nation,region",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
        "--mode", "diff",
        "--keys", "nation=n_nationkey,region=r_regionkey",
    ]
    with pytest.raises(SystemExit):  # malformed spec (4 fields)
        main(base + ["--join-view", "nr=nation:region:n_nationkey:n_regionkey"],
             spark=spark)
    with pytest.raises(SystemExit):  # dim not monitored
        main(["--source", sf_dir, "--tables", "nation",
              "--output-dir", out, "--state-dir", state,
              "--duration", "0.1", "--mode", "diff",
              "--keys", "nation=n_nationkey",
              "--join-view", "nr=nation:region:n_nationkey:n_regionkey:r_regionkey"],
             spark=spark)
    with pytest.raises(SystemExit):  # bad how suffix
        main(base + [
            "--join-view",
            "nr2=nation:region:n_nationkey:n_regionkey:r_regionkey:full_outer",
        ], spark=spark)
    # the optional 6th :how segment parses and registers (r10 left_outer)
    rc = main(base + [
        "--join-view",
        "nr2=nation:region:n_nationkey:n_regionkey:r_regionkey:left_outer",
    ], spark=spark)
    assert rc == 0
    # the optional 7th :buckets segment opts the state into the bucketed
    # manifest layout (r12) — registers, folds, reads back identically
    rc = main(base + [
        "--duration", "6", "--interval", "0.5",
        "--join-view",
        "nrb=nation:region:n_nationkey:n_regionkey:r_regionkey:inner:4",
    ], spark=spark)
    assert rc == 0
    engb = CdcEngine(spark, output_dir=out, state_dir=state)
    engb.register_join_view(
        "nrb", fact_table="nation", dim_table="region",
        fact_key="n_nationkey", fact_dim_col="n_regionkey",
        dim_key="r_regionkey", fact_buckets=4,
    )
    assert engb.view("nrb").count() == 25
    with pytest.raises(SystemExit):  # bad buckets suffix
        main(base + [
            "--join-view",
            "nrx=nation:region:n_nationkey:n_regionkey:r_regionkey:inner:0",
        ], spark=spark)


def test_cli_agg_view_kind_suffix(spark, sf_dir, tmp_path):
    """The optional 4th spec segment routes kinds: moments views fold and
    read back through view_moments; term_df takes an empty key segment;
    bad kinds and histogram (needs edges) fail at parse time."""
    import pytest

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--mode", "diff",
            "--keys", "region=r_regionkey",
            "--agg-view", "mom=region:r_name:r_regionkey:moments",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_agg_view("mom", "region", ["r_name"], "r_regionkey", kind="moments")
    m = eng.view_moments("mom")
    assert m.count() == 5 and m.filter("agg_rows != 1").count() == 0

    base = [
        "--source", sf_dir,
        "--tables", "region",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
        "--mode", "diff",
        "--keys", "region=r_regionkey",
    ]
    with pytest.raises(SystemExit):  # unknown kind
        main(base + ["--agg-view", "x=region:r_name:r_regionkey:nope"], spark=spark)
    with pytest.raises(SystemExit):  # histogram needs edges: API-only
        main(
            base + ["--agg-view", "x=region:r_name:r_regionkey:histogram"],
            spark=spark,
        )
    with pytest.raises(SystemExit):  # term_df with group keys
        main(
            base + ["--agg-view", "x=region:r_name:r_comment:term_df"], spark=spark
        )


def test_cli_partition_view_maintained_and_validated(spark, sf_dir, tmp_path):
    """--partition-view registers a partition-granular view that the
    monitor folds per tick over a --partition-cols table; specs on
    non-partition-captured tables and bad kinds fail at parse time."""
    import pytest

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--partition-cols", "region=r_regionkey",
            "--partition-view", "rn=region:r_name:r_regionkey",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_partition_agg_view(
        "rn", "region", "r_regionkey", ["r_name"], "r_regionkey"
    )
    merged = eng.view_merged("rn")
    assert merged.count() == 5 and merged.filter("agg_rows != 1").count() == 0

    base = [
        "--source", sf_dir,
        "--tables", "region",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
    ]
    with pytest.raises(SystemExit):  # table not partition-captured
        main(base + ["--partition-view", "x=region:r_name:r_regionkey"], spark=spark)
    with pytest.raises(SystemExit):  # unknown kind
        main(
            base
            + ["--partition-cols", "region=r_regionkey",
               "--partition-view", "x=region:r_name:r_regionkey:nope"],
            spark=spark,
        )


def test_cli_join_agg_view_and_chain_specs(spark, sf_dir, tmp_path):
    """r9 CLI surface: '+'-composite keys parse, a --join-view side may
    name an EARLIER --join-view (chain), and --join-agg-view maintains an
    aggregate over a declared join view; unknown upstream names, empty
    key components, and histogram-without-edges fail at parse time."""
    import pytest

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "nation,region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            # a tick is ~10 s on this box and a transiently-errored capture
            # tick is retried, not fatal — leave room for two real ticks
            "--duration", "12",
            "--mode", "diff",
            "--keys", "nation=n_nationkey,region=r_regionkey",
            "--join-view", "nr=nation:region:n_nationkey:n_regionkey:r_regionkey",
            "--join-agg-view", "per_region=nr:r_name:n_nationkey",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_join_view(
        "nr", fact_table="nation", dim_table="region",
        fact_key="n_nationkey", fact_dim_col="n_regionkey",
        dim_key="r_regionkey",
    )
    eng.register_join_agg_view("per_region", "nr", ["r_name"], "n_nationkey")
    agg = {r["r_name"]: r["agg_rows"] for r in eng.view("per_region").collect()}
    assert sum(agg.values()) == 25 and len(agg) == 5

    base = [
        "--source", sf_dir,
        "--tables", "nation,region",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
        "--mode", "diff",
        "--keys", "nation=n_nationkey,region=r_regionkey",
    ]
    with pytest.raises(SystemExit):  # agg over an undeclared join view
        main(base + ["--join-agg-view", "x=nope:r_name:n_nationkey"], spark=spark)
    with pytest.raises(SystemExit):  # empty composite-key component
        main(base + [
            "--join-view",
            "nr=nation:region:n_nationkey+:n_regionkey:r_regionkey",
        ], spark=spark)
    with pytest.raises(SystemExit):  # histogram needs edges (API only)
        main(base + [
            "--join-view", "nr=nation:region:n_nationkey:n_regionkey:r_regionkey",
            "--join-agg-view", "h=nr:r_name:n_nationkey:histogram",
        ], spark=spark)
    # chain parse: the second --join-view references the first — the spec
    # is accepted and registered (fold correctness is engine-tested); the
    # key constraint (chain key == upstream fact_key) is enforced
    with pytest.raises(SystemExit):
        main(base + [
            "--join-view",
            "nr=nation:region:n_nationkey:n_regionkey:r_regionkey,"
            "bad=nr:region:r_regionkey:n_regionkey:r_regionkey",
        ], spark=spark)


def test_cli_view_where(spark, sf_dir, tmp_path):
    """--view-where attaches a predicate to a declared view (read back as
    the filtered aggregate); unknown names, duplicates, and malformed
    entries fail at parse time."""
    import pytest
    from pyspark.sql import functions as F

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main
    from cdc_lite_spark.sources.tables import load_table

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "nation",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--mode", "diff",
            "--keys", "nation=n_nationkey",
            "--agg-view", "nk=nation:n_regionkey:n_nationkey",
            "--view-where", "nk=n_nationkey >= 10",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_agg_view(
        "nk", "nation", ["n_regionkey"], "n_nationkey",
        where="n_nationkey >= 10",
    )
    got = {
        r["n_regionkey"]: r["agg_rows"] for r in eng.view("nk").collect()
    }
    want = {
        r["n_regionkey"]: r["n"]
        for r in load_table(spark, sf_dir, "nation")
        .filter("n_nationkey >= 10")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want

    base = [
        "--source", sf_dir,
        "--tables", "nation",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
        "--mode", "diff",
        "--keys", "nation=n_nationkey",
        "--agg-view", "nk=nation:n_regionkey:n_nationkey",
    ]
    with pytest.raises(SystemExit):  # names no declared view
        main(base + ["--view-where", "typo=n_nationkey >= 10"], spark=spark)
    with pytest.raises(SystemExit):  # duplicate
        main(base + ["--view-where", "nk=x > 1", "--view-where", "nk=x > 2"],
             spark=spark)
    with pytest.raises(SystemExit):  # malformed (no '=')
        main(base + ["--view-where", "nk"], spark=spark)


def test_cli_view_derive(spark, sf_dir, tmp_path):
    """--view-derive attaches expression columns a view's keys/value/where
    may reference; malformed entries and unknown names fail at parse."""
    import pytest
    from pyspark.sql import functions as F

    from cdc_lite_spark import CdcEngine
    from cdc_lite_spark.cli import main
    from cdc_lite_spark.sources.tables import load_table

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "nation",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "8",
            "--mode", "diff",
            "--keys", "nation=n_nationkey",
            "--agg-view", "nk=nation:n_regionkey:doubled",
            "--view-derive", "nk=doubled=n_nationkey * 2",
        ],
        spark=spark,
    )
    assert rc == 0
    eng = CdcEngine(spark, output_dir=out, state_dir=state)
    eng.register_agg_view(
        "nk", "nation", ["n_regionkey"], "doubled",
        derive={"doubled": "n_nationkey * 2"},
    )
    got = {r["n_regionkey"]: r["agg_sum"] for r in eng.view("nk").collect()}
    want = {
        r["n_regionkey"]: r["s"]
        for r in load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.sum(F.col("n_nationkey") * 2).alias("s"))
        .collect()
    }
    assert got == want

    base = [
        "--source", sf_dir,
        "--tables", "nation",
        "--output-dir", out,
        "--state-dir", state,
        "--duration", "0.1",
        "--mode", "diff",
        "--keys", "nation=n_nationkey",
        "--agg-view", "nk=nation:n_regionkey:doubled",
    ]
    with pytest.raises(SystemExit):  # undeclared view name
        main(base + ["--view-derive", "typo=doubled=n_nationkey * 2"], spark=spark)
    with pytest.raises(SystemExit):  # malformed (missing expr)
        main(base + ["--view-derive", "nk=doubled"], spark=spark)
    with pytest.raises(SystemExit):  # repeated column for one view
        main(base + ["--view-derive", "nk=d=1", "--view-derive", "nk=d=2"],
             spark=spark)
