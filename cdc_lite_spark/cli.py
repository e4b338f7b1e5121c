"""Command-line entry point — parity with the reference's CLI driver
(/root/reference/cmd/cdc-lite/main.go):

    python -m cdc_lite_spark \
        --source /data/app.duckdb --tables users \
        --output-dir ./cdc_output --state-dir ./cdc_state \
        --interval 1.0

Monitors the named tables (from a ``.duckdb`` file or a directory of
``<table>.parquet`` / ``.csv`` / ``.jsonl`` files), appends change records
to the JSONL log, and stops gracefully on SIGINT/SIGTERM (main.go:31-38)
or after ``--duration``.
"""

from __future__ import annotations

import argparse
import signal
import threading

from pyspark.sql import DataFrame, SparkSession


def _sources(spark: SparkSession, source: str, tables: list[str]):
    if source.endswith(".duckdb") or source.endswith(".db"):
        from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource

        # factories, not DataFrames: a DuckDB-source DataFrame freezes at
        # its first action (the plan-time snapshot copy is reused), so a
        # DataFrame built once at startup would never see external writes.
        # The provider gives every table of a tick the SAME copy — the
        # reference's one-copy-per-tick consistency (duckdb_cdc.go:100-124)
        return ConsistentSnapshotSource(spark, source).sources(tables)
    # a directory of per-table files — re-read per tick via the path form
    # (the engine's resolve step sniffs the format from the extension)
    import os

    out = {}
    for t in tables:
        for ext in (".parquet", ".orc", ".csv", ".tsv", ".jsonl", ".json"):
            cand = f"{source}/{t}{ext}"
            if os.path.exists(cand):
                out[t] = cand
                break
        else:
            # default to the parquet name: a missing table surfaces as that
            # table's per-tick error (H6 isolation), not a startup crash
            out[t] = f"{source}/{t}.parquet"
    return out


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    p = argparse.ArgumentParser(prog="cdc_lite_spark", description=__doc__)
    p.add_argument("--source", required=True, help=".duckdb file or a dir of <table>.parquet/.csv/.jsonl")
    p.add_argument("--tables", required=True, help="comma-separated table names")
    p.add_argument("--output-dir", default="./cdc_output")
    p.add_argument("--state-dir", default="./cdc_state")
    p.add_argument("--interval", type=float, default=1.0, help="poll seconds")
    p.add_argument("--mode", choices=["snapshot", "diff"], default="snapshot")
    p.add_argument("--keys", default="", help="table=col1+col2,... (diff mode)")
    p.add_argument("--duration", type=float, default=None, help="stop after N seconds")
    p.add_argument(
        "--parallelism",
        type=int,
        default=1,
        help="overlap the per-table detection scans inside a tick "
        "(the reference polls sequentially, duckdb_cdc.go:114-120)",
    )
    p.add_argument(
        "--schema",
        default="",
        help="table=DDL;table2=DDL — explicit schema for CSV/JSON sources "
        "(skips the per-tick inference scan and pins column types; "
        "e.g. users='id long,name string')",
    )
    p.add_argument(
        "--partition-cols",
        default="",
        help="table=col,... — partition-gated capture for the named tables: "
        "only drifted partition values re-emit per tick (poll_partitions)",
    )
    p.add_argument(
        "--log-format",
        choices=["json", "parquet", "orc"],
        default="json",
        help="change-log files: json (JSONL, reference parity), parquet, or orc (columnar scale layouts)",
    )
    p.add_argument(
        "--agg-view",
        default="",
        help="name=table:key1+key2:valuecol[:kind],... — maintain an "
        "aggregate view from each tick's change records (diff mode only; "
        "read it back with CdcEngine.view(name)).  kind defaults to "
        "sum_count; also: moments (Σv/Σv² → view_moments), min_max, "
        "distinct_count (HLL), term_df (per-term document frequency of a "
        "text column — pass an empty key segment), freq_items "
        "(Misra-Gries heavy hitters → view_heavy_hitters), sample "
        "(deterministic bottom-k-by-key-hash row sample → view_sample; "
        "k defaults to 64 — size it via the API).  histogram "
        "views need explicit bucket edges — register those via the "
        "register_agg_view API",
    )
    p.add_argument(
        "--partition-view",
        default="",
        help="name=table:key1+key2:valuecol[:kind],... — maintain a "
        "partition-granular aggregate view over a --partition-cols table: "
        "each tick re-aggregates only drifted partitions and replaces "
        "their state rows (kinds: sum_count default, moments, min_max, "
        "distinct_count, freq_items; histogram needs edges — use the "
        "register_partition_agg_view API).  Read back with "
        "CdcEngine.view_merged(name)",
    )
    p.add_argument(
        "--join-view",
        default="",
        help="name=fact:dim:fact_key:fact_dim_col:dim_key[:how[:buckets]],"
        "... — maintain a materialized fact⋈dim join view from both "
        "tables' change records (diff mode only; both tables must be "
        "monitored with keys; read it back with CdcEngine.view(name)).  "
        "Composite keys are '+'-separated "
        "(fact_key=l_orderkey+l_linenumber); fact or dim may name an "
        "EARLIER --join-view entry to chain (snowflake: "
        "v2=v1:customer:...); how is inner (default) or left_outer "
        "(danglers carried with null dim payloads); buckets opts the view "
        "STATE into the fact-PK-bucketed manifest layout so a tick "
        "rewrites only the touched buckets — worth it above ~10M view "
        "rows, size via cdc_lite_spark.streaming.bucketed.suggest_layout "
        "(bucketed views cannot be chain sides)",
    )
    p.add_argument(
        "--join-agg-view",
        default="",
        help="name=joinview:key1+key2:valuecol[:kind],... — maintain a "
        "grouped aggregate OVER a --join-view entry, folded from the join "
        "fold's own change records in O(delta) (kinds: sum_count default, "
        "moments, min_max, distinct_count, freq_items, sample; histogram "
        "needs bucket edges — "
        "use the register_join_agg_view API).  Read back with "
        "CdcEngine.view(name)",
    )
    p.add_argument(
        "--view-where",
        action="append",
        default=[],
        metavar="NAME=SQLEXPR",
        help="restrict a declared view to a predicate subset: NAME matches "
        "an --agg-view / --partition-view / --join-agg-view entry and "
        "SQLEXPR is a SQL boolean over the table's (or join view's) "
        "columns, e.g. --view-where 'rev=o_totalprice > 1000'.  Repeatable "
        "(one flag per view; the expression may contain commas/colons).  "
        "Folds stay O(delta): updates crossing the predicate become "
        "inserts into / deletes from the view's world",
    )
    p.add_argument(
        "--view-derive",
        action="append",
        default=[],
        metavar="NAME=COL=SQLEXPR",
        help="extend a declared view's rows with a derived expression "
        "column before grouping: NAME matches an --agg-view / "
        "--partition-view / --join-agg-view entry, COL is the new column "
        "name, SQLEXPR a row-local deterministic SQL expression — e.g. "
        "--view-derive 'rev=revenue=o_totalprice * 0.9'.  The view's key "
        "list, value column, and --view-where may reference COL.  "
        "Repeatable (several per view allowed); folds stay O(delta)",
    )
    p.add_argument(
        "--retention-minutes",
        type=float,
        default=None,
        help="arm change-log GC: fold change files wholly older than this "
        "into one latest-per-key segment (keyed tables; keyless tables are "
        "compacted verbatim) — bounds log growth for always-on monitors",
    )
    p.add_argument(
        "--expire-every-ticks",
        type=int,
        default=60,
        help="how many poll ticks between retention GC passes",
    )
    args = p.parse_args(argv)

    owns_spark = spark is None
    if spark is None:
        from cdc_lite_spark.session import get_spark

        spark = get_spark("cdc_lite_spark_cli")

    from cdc_lite_spark.engine import CdcEngine

    tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    keys = {
        t: cols.split("+")
        for t, _, cols in (kv.partition("=") for kv in args.keys.split(",") if kv)
    }
    eng = CdcEngine(spark, args.output_dir, args.state_dir, log_format=args.log_format)
    sources = _sources(spark, args.source, tables)
    schemas = {
        t: ddl
        for t, _, ddl in (kv.partition("=") for kv in args.schema.split(";") if kv)
    }
    for t, ddl in schemas.items():
        src = sources.get(t)
        if isinstance(src, str):
            eng.set_source_schema(src, ddl)
    partition_cols = {
        t: col
        for t, _, col in (kv.partition("=") for kv in args.partition_cols.split(",") if kv)
    }
    # fail fast on malformed specs instead of erroring every tick forever
    for t, col in partition_cols.items():
        if t not in tables or not col:
            p.error(
                f"--partition-cols entry {t!r}={col!r}: table must be one of "
                f"--tables and the column non-empty (one column per table; "
                f"multi-column partition capture is not supported)"
            )
    for t in schemas:
        if t not in tables:
            p.error(f"--schema entry for unknown table {t!r} (not in --tables)")
    def _parse_view_spec(flag: str, kv: str) -> tuple[str, str, list[str], str, str]:
        """Shared grammar of --agg-view and --partition-view entries:
        name=table:key1+key2:valuecol[:kind].  The key segment may be empty
        (term_df state is keyed by term; partition views may aggregate the
        whole partition); every other segment must be non-empty, and
        histogram views need bucket edges only the API can carry."""
        name, _, spec = kv.partition("=")
        parts = spec.split(":")
        if (
            not name
            or len(parts) not in (3, 4)
            or not all(parts[:1] + parts[2:])
        ):
            p.error(
                f"{flag} entry {kv!r}: expected "
                f"name=table:key1+key2:valuecol[:kind]"
            )
        vtable, gk, vcol = parts[:3]
        kind = parts[3] if len(parts) == 4 else "sum_count"
        if kind == "histogram":
            p.error(
                f"{flag} {name!r}: histogram views need explicit lo/hi "
                f"bucket edges — register via the engine API"
            )
        if gk and not all(gk.split("+")):
            # a typo like 'a++b' or a trailing 'a+' must not silently
            # change the view's grouping (r8 ADVICE)
            p.error(
                f"{flag} {name!r}: key list {gk!r} has empty components"
            )
        return name, vtable, [k for k in gk.split("+") if k], vcol, kind

    wheres: dict[str, str] = {}
    for kv in args.view_where:
        wname, sep, wexpr = kv.partition("=")
        if not wname or not sep or not wexpr.strip():
            p.error(f"--view-where entry {kv!r}: expected NAME=SQLEXPR")
        if wname in wheres:
            p.error(f"--view-where {wname!r} given more than once")
        wheres[wname] = wexpr

    derives: dict[str, dict[str, str]] = {}
    for kv in args.view_derive:
        dname, sep1, rest = kv.partition("=")
        dcol, sep2, dexpr = rest.partition("=")
        if not dname or not sep1 or not dcol.strip() or not sep2 or not dexpr.strip():
            p.error(f"--view-derive entry {kv!r}: expected NAME=COL=SQLEXPR")
        if dcol.strip() in derives.get(dname, {}):
            p.error(f"--view-derive {dname!r}: column {dcol.strip()!r} repeated")
        derives.setdefault(dname, {})[dcol.strip()] = dexpr

    for kv in (s for s in args.agg_view.split(",") if s):
        name, vtable, gk, vcol, kind = _parse_view_spec("--agg-view", kv)
        if vtable not in tables or args.mode != "diff" or vtable not in keys:
            p.error(
                f"--agg-view {name!r}: views fold change records, so "
                f"{vtable!r} must be monitored (--tables) in --mode diff "
                f"with a --keys entry"
            )
        try:
            eng.register_agg_view(
                name, vtable, gk, vcol, kind=kind,
                where=wheres.pop(name, None), derive=derives.pop(name, None),
            )
        except ValueError as exc:  # unknown kind, term_df with keys, ...
            p.error(f"--agg-view {name!r}: {exc}")
    for kv in (s for s in args.partition_view.split(",") if s):
        name, vtable, gk, vcol, kind = _parse_view_spec("--partition-view", kv)
        if vtable not in partition_cols:
            p.error(
                f"--partition-view {name!r}: {vtable!r} must be "
                f"partition-captured (--partition-cols) — keyed-diff "
                f"tables take --agg-view instead"
            )
        try:
            eng.register_partition_agg_view(
                name,
                vtable,
                partition_cols[vtable],
                gk,
                vcol,
                kind=kind,
                where=wheres.pop(name, None),
                derive=derives.pop(name, None),
            )
        except ValueError as exc:
            p.error(f"--partition-view {name!r}: {exc}")
    join_view_names: set[str] = set()
    for kv in (s for s in args.join_view.split(",") if s):
        name, _, spec = kv.partition("=")
        parts = spec.split(":")
        if not name or len(parts) not in (5, 6, 7) or not all(parts):
            p.error(
                f"--join-view entry {kv!r}: expected "
                f"name=fact:dim:fact_key:fact_dim_col:dim_key[:how[:buckets]] "
                f"(composite keys '+'-separated; fact/dim may name an "
                f"EARLIER --join-view entry to chain; how is inner or "
                f"left_outer; buckets = fact-PK-bucketed state layout)"
            )
        fact, dim, fkey, fdc, dkey = parts[:5]
        how = parts[5] if len(parts) >= 6 else "inner"
        fbk = None
        if len(parts) == 7:
            if not parts[6].isdigit() or int(parts[6]) <= 0:
                p.error(
                    f"--join-view {name!r}: buckets must be a positive "
                    f"integer, got {parts[6]!r}"
                )
            fbk = int(parts[6])
        key_lists = [k.split("+") for k in (fkey, fdc, dkey)]
        if any(not all(ks) for ks in key_lists):
            p.error(f"--join-view {name!r}: a key list has empty components")
        # a side is either a diff-monitored keyed table or an earlier
        # --join-view entry (snowflake chaining)
        bad = [
            t
            for t in (fact, dim)
            if t not in join_view_names and (t not in tables or t not in keys)
        ]
        if bad or args.mode != "diff":
            p.error(
                f"--join-view {name!r}: views fold change records, so both "
                f"{fact!r} and {dim!r} must be monitored (--tables) in "
                f"--mode diff with --keys entries, or an earlier --join-view"
            )
        if fact == dim:
            # would fail the column-overlap check on every tick forever —
            # fail at startup like every other malformed spec
            p.error(f"--join-view {name!r}: fact and dim must be different tables")
        try:
            eng.register_join_view(
                name, fact_table=fact, dim_table=dim,
                fact_key=key_lists[0], fact_dim_col=key_lists[1],
                dim_key=key_lists[2], how=how, fact_buckets=fbk,
            )
        except ValueError as exc:  # e.g. name collides with an --agg-view
            p.error(f"--join-view {name!r}: {exc}")
        join_view_names.add(name)
    for kv in (s for s in args.join_agg_view.split(",") if s):
        name, jview, gk, vcol, kind = _parse_view_spec("--join-agg-view", kv)
        if jview not in join_view_names:
            p.error(
                f"--join-agg-view {name!r}: {jview!r} must be declared by "
                f"an earlier --join-view entry"
            )
        try:
            eng.register_join_agg_view(
                name, jview, gk, vcol, agg_kind=kind,
                where=wheres.pop(name, None), derive=derives.pop(name, None),
            )
        except ValueError as exc:
            p.error(f"--join-agg-view {name!r}: {exc}")
    if wheres or derives:
        # a --view-where/--view-derive naming no declared view is a typo
        # that would silently register the view unfiltered/underived
        bad = sorted(set(wheres) | set(derives))
        p.error(
            f"--view-where/--view-derive for undeclared view(s): {bad} — "
            f"names must match an --agg-view / --partition-view / "
            f"--join-agg-view entry"
        )
    overlap = set(partition_cols) & set(keys)
    if overlap:
        # retention GC's latest-per-key folding would mangle a
        # partition-snapshot log (PARTITION_DELETE markers collapse under a
        # null key; per-key folding breaks latest-capture-wins) — the two
        # capture modes are mutually exclusive per table
        p.error(
            f"tables {sorted(overlap)} appear in both --keys and "
            f"--partition-cols; a table is either key-diffed or "
            f"partition-captured, not both"
        )
    query = eng.monitor(
        sources,
        interval_seconds=args.interval,
        mode=args.mode,
        keys=keys or None,
        parallelism=args.parallelism,
        retention_minutes=args.retention_minutes,
        expire_every_ticks=args.expire_every_ticks,
        partition_cols=partition_cols or None,
    )

    stop = threading.Event()

    def _graceful(_sig, _frame):  # reference: ctx cancel on SIGINT/SIGTERM
        stop.set()

    try:
        signal.signal(signal.SIGINT, _graceful)
        signal.signal(signal.SIGTERM, _graceful)
    except ValueError:
        pass  # not on the main thread (tests)

    stop.wait(timeout=args.duration)
    query.stop()
    query.awaitTermination(60)
    try:
        from pyspark.sql import functions as F

        summary = (
            eng.metrics()
            .groupBy("table_name")
            .agg(
                F.count("*").alias("ticks"),
                F.sum(F.col("captured").cast("int")).alias("captures"),
                F.round(F.avg("detect_secs"), 3).alias("avg_detect_s"),
                F.sum((F.col("error").isNotNull()).cast("int")).alias("errors"),
            )
            .collect()
        )
        for r in summary:
            print(
                f"cdc_lite_spark: {r['table_name']}: {r['ticks']} ticks, "
                f"{r['captures']} captures, avg detect {r['avg_detect_s']}s, "
                f"{r['errors']} errors"
            )
        # maintained-view health: a view still lagging at shutdown means
        # its fold kept failing — surface it next to the tick summary
        for v in eng.view_status():
            state = "LAGGING" if v["lagging"] else "current"
            print(
                f"cdc_lite_spark: view {v['name']} ({v['kind']} over "
                f"{'+'.join(v['tables'])}): {state}, "
                f"state v={v['state_version']}"
            )
    except Exception:  # noqa: BLE001 — summary is best-effort
        pass
    if owns_spark:
        spark.stop()
    return 0
