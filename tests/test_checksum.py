"""Checksum / fingerprint operator tests (SURVEY.md §2 C1-C3).

Mirrors the reference's change-detection contract: same multiset of rows →
same digest, regardless of order; any row change → different digest
(/root/reference/pkg/duckdb/duckdb_cdc.go:169-199).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cdc_lite_spark.operators.checksum import (
    partition_checksums,
    table_checksum,
    table_checksum_sql,
    table_checksum_value,
)


def test_checksum_deterministic(tables):
    nation = tables["nation"]
    a = table_checksum_value(nation)
    b = table_checksum_value(nation)
    assert a == b
    assert len(a) == 32  # md5 hex


def test_checksum_order_insensitive(tables):
    nation = tables["nation"]
    shuffled = nation.orderBy(F.rand(seed=1)).repartition(7)
    assert table_checksum_value(nation) == table_checksum_value(shuffled)


def test_checksum_detects_change(tables):
    nation = tables["nation"]
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 0, F.lit("MUTATED")).otherwise(F.col("n_name")),
    )
    assert table_checksum_value(nation) != table_checksum_value(mutated)
    # row removal also detected
    assert table_checksum_value(nation) != table_checksum_value(
        nation.filter("n_nationkey != 3")
    )


def test_checksum_matches_duckdb_oracle(spark, tables, sf_dir):
    """The portable (md5-based) digest must be bit-identical in DuckDB —
    this is the §7.4 cross-engine parity requirement."""
    nation = tables["nation"]
    spark_sum = table_checksum(nation, fast=False).collect()[0]["checksum"]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_dir}/nation.parquet')"
    )
    sql = table_checksum_sql("nation", nation.dtypes)
    duck = con.execute(sql).fetchone()[0]
    assert spark_sum == duck


def test_checksum_detects_sub_resolution_changes(spark):
    """ADVICE r01: %.6f floats and millisecond timestamps let tiny updates
    hash identically.  The canonical rendering is now full-precision: a
    1-ulp double change or a 1-microsecond timestamp change must flip the
    digest (reference casts full-precision VARCHAR, duckdb_cdc.go:171)."""
    import datetime
    import math

    base = 1.0000001
    a = spark.createDataFrame([(1, base)], "id int, v double")
    b = spark.createDataFrame([(1, math.nextafter(base, 2.0))], "id int, v double")
    assert table_checksum_value(a) != table_checksum_value(b)

    t = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    ta = spark.createDataFrame([(1, t)], "id int, ts timestamp")
    tb = spark.createDataFrame(
        [(1, t + datetime.timedelta(microseconds=1))], "id int, ts timestamp"
    )
    assert table_checksum_value(ta) != table_checksum_value(tb)


def test_canonical_float_cross_engine_fuzz(spark):
    """The canonical float rendering must be bit-identical across engines
    for realistic value classes (money, unit floats, specials, magnitudes
    up to 1e15).  Known caveat (documented in hashes.py): pre-JDK-19
    Double.toString emits a non-minimal digit for ~0.3% of doubles with
    ≥16 significant digits — excluded here, unreachable for real data."""
    import random

    import duckdb

    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    rng = random.Random(7)
    vals = [
        0.0, -0.0, 1.0, -2.5, 0.1, 1234.56, 1e7, 9999999.9, 1e15, 2.5e-5,
        0.001, 0.0001, 1e-300, 1e300, 0.30000000000000004, None,
        float("nan"), float("inf"), float("-inf"),
    ]
    vals += [round(rng.uniform(-1e6, 1e6), 2) for _ in range(500)]
    vals += [rng.random() for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r[0] for r in df.select(F.coalesce(canonical_col("x", "double"), F.lit("∅"))).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT COALESCE({canonical_col_sql('x', 'double')}, '∅') FROM t"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_partition_checksums(tables):
    events = tables["events"]
    by_type = partition_checksums(events, "event_type", fast=True)
    rows = {r["part"]: r for r in by_type.collect()}
    assert sum(r["n_rows"] for r in rows.values()) == events.count()
    # mutating one partition changes only that partition's digest
    mutated = events.withColumn(
        "value",
        F.when(F.col("event_type") == "click", F.col("value") + 1).otherwise(F.col("value")),
    )
    rows2 = {r["part"]: r for r in partition_checksums(mutated, "event_type", fast=True).collect()}
    changed = [p for p in rows if rows[p]["checksum"] != rows2[p]["checksum"]]
    assert changed == ["click"]


def test_canonical_string_injective_and_oracle_parity(spark):
    """Regression for the reference's fingerprint defect (duckdb_cdc.go:171-173,
    VERDICT r05 "What's wrong" #1/#2): ''↔NULL flips and comma shifts across
    adjacent string columns must produce DIFFERENT canonical strings, and the
    DuckDB twin must render the identical bytes."""
    import duckdb

    from cdc_lite_spark.functions.hashes import canonical_row_sql, canonical_row_string

    rows = [
        ("", "x"), (None, "x"),            # '' vs NULL
        ("a,b", "c"), ("a", "b,c"),        # comma shift
        ("a\\", ",b"), ("a\\,", "b"),      # escape-char adjacency
        ("\\N", "q"), (None, "q"),         # value forging the NULL sentinel
        ("", ""), (None, None),
    ]
    df = spark.createDataFrame(rows, "s1 string, s2 string")
    cols = [("s1", "string"), ("s2", "string")]
    got = [r[0] for r in df.select(canonical_row_string(cols).alias("c")).collect()]
    assert len(set(got)) == len(got), f"canonical collision: {got}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s1 VARCHAR, s2 VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = [r[0] for r in con.execute(f"SELECT {canonical_row_sql(cols)} FROM t").fetchall()]
    assert got == oracle


def test_checksum_detects_empty_to_null_flip(spark):
    """A table whose ONLY change is ''→NULL (or a comma shift) must change the
    fingerprint — the class the reference's gate misses silently."""
    before = spark.createDataFrame([(1, ""), (2, "a,b|c")], "id int, v string")
    for after_rows in [[(1, None), (2, "a,b|c")], [(1, ""), (2, "a|b,c")]]:
        after = spark.createDataFrame(
            after_rows, "id int, v string"
        ).withColumn("v", F.col("v"))
        a = table_checksum(before).collect()[0]["checksum"]
        b = table_checksum(after).collect()[0]["checksum"]
        assert a != b, f"fingerprint blind to change {after_rows}"
        # and the fast (engine-internal xxhash64) family must see it too
        af = table_checksum(before, fast=True).collect()[0]["checksum"]
        bf = table_checksum(after, fast=True).collect()[0]["checksum"]
        assert af != bf


def test_fixed_alphabet_escape_skip_is_byte_identical(spark):
    """r6 verdict ask #1: int/date columns skip the separator escape.  The
    skip must be a pure plan optimization — the escaped and unescaped
    renderings are byte-identical for these dtypes (their alphabet is
    [0-9-]), so fingerprints are unchanged vs r6."""
    import datetime

    from cdc_lite_spark.functions.hashes import (
        NULL_SENTINEL,
        _escape_reserved,
        canonical_col,
        canonical_col_sql,
    )

    rows = [
        (-(2**31), -(2**63), -128, -32768, datetime.date(1970, 1, 1)),
        (2**31 - 1, 2**63 - 1, 127, 32767, datetime.date(2099, 12, 31)),
        (0, 0, 0, 0, datetime.date(2024, 2, 29)),
        (None, None, None, None, None),
    ]
    schema = "i int, l bigint, t tinyint, s smallint, d date"
    df = spark.createDataFrame(rows, schema)
    for col, dtype in df.dtypes:
        got = [
            r[0] for r in df.select(canonical_col(col, dtype).alias("c")).collect()
        ]
        escaped = [
            r[0]
            for r in df.select(
                F.coalesce(
                    _escape_reserved(F.col(col).cast("string")), F.lit(NULL_SENTINEL)
                ).alias("c")
            ).collect()
        ]
        assert got == escaped, f"{dtype}: escape skip changed bytes"
        # and the SQL twin skips the replace()s too, with identical output
        assert "replace" not in canonical_col_sql(col, dtype)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, l BIGINT, t TINYINT, s SMALLINT, d DATE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    for col, dtype in df.dtypes:
        got = [r[0] for r in df.select(canonical_col(col, dtype)).collect()]
        oracle = [
            r[0]
            for r in con.execute(
                f"SELECT {canonical_col_sql(col, dtype)} FROM t"
            ).fetchall()
        ]
        assert got == oracle, f"{dtype}: cross-engine mismatch"


def test_wide_decimal_injective_past_2_53(spark):
    """r6 verdict ask #5: decimal(p>15) must not collide where binary64
    loses integer resolution.  Neighbors of 2^53 spaced 1e-10 apart all
    round to the same double — the exact decimal rendering keeps them
    distinct, bit-identically in both engines."""
    from decimal import Decimal

    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    base = Decimal(2**53)
    step = Decimal(1) / Decimal(10**10)
    vals = [base + k * step for k in range(8)]
    vals += [-v for v in vals[:3]] + [Decimal(0), None]
    # sanity: these genuinely collide as doubles (the old rendering's defect)
    assert len({float(v) for v in vals[:8]}) < 8

    df = spark.createDataFrame([(v,) for v in vals], "x decimal(38,10)")
    got = [
        r[0]
        for r in df.select(
            F.coalesce(canonical_col("x", "decimal(38,10)"), F.lit("∅"))
        ).collect()
    ]
    non_null = [g for g in got if g != "∅"]
    assert len(set(non_null)) == len(non_null), f"wide-decimal collision: {got}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DECIMAL(38,10))")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    oracle = [
        r[0]
        for r in con.execute(
            f"SELECT COALESCE({canonical_col_sql('x', 'decimal(38,10)')}, '∅') FROM t"
        ).fetchall()
    ]
    assert got == oracle
    # narrow decimals keep the r2-r6 double-canonical bytes (no format break)
    ndf = spark.createDataFrame([(Decimal("1234.56"),)], "x decimal(15,2)")
    (narrow,) = [r[0] for r in ndf.select(canonical_col("x", "decimal(15,2)")).collect()]
    assert narrow == "1234.56"


def test_partition_checksum_detects_empty_to_null_flip(spark):
    before = spark.createDataFrame([("p1", ""), ("p2", "z")], "part string, v string")
    after = spark.createDataFrame([("p1", None), ("p2", "z")], "part string, v string")
    b = {r["part"]: r["checksum"] for r in partition_checksums(before, "part").collect()}
    a = {r["part"]: r["checksum"] for r in partition_checksums(after, "part").collect()}
    assert b["p1"] != a["p1"] and b["p2"] == a["p2"]


def test_array_canonicalization_injective_and_cross_engine(spark):
    """r7: arrays canonicalize STRUCTURALLY (len prefix + escaped elements),
    so the r6-advice collision class (['a, b'] vs ['a', ' b'] both rendering
    '[a, b]') is gone, and the rendering is byte-identical in DuckDB."""
    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    rows = [
        (1, ["a, b"]), (2, ["a", " b"]),          # the advice collision pair
        (3, []), (4, None), (5, [""]),            # empty vs NULL vs ['']
        (6, [None]), (7, ["\\N"]),                # NULL element vs forged sentinel
        (8, ["a\\", ",b"]), (9, ["a\\,", "b"]),   # escape-char adjacency
        (10, ["x"]), (11, ["x", None]),
    ]
    df = spark.createDataFrame(rows, "id int, arr array<string>")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_col("arr", "array<string>").alias("c")).collect()
    }
    assert len(set(got.values())) == len(got), f"array canonical collision: {got}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, arr VARCHAR[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = dict(
        con.execute(
            f"SELECT id, {canonical_col_sql('arr', 'array<string>')} FROM t"
        ).fetchall()
    )
    assert got == oracle


def test_array_numeric_and_nested_cross_engine(spark):
    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    rows = [
        (1, [1.5, None, -0.25], [1, 2], [[1, 2], [3]]),
        (2, [0.1, 2.5e-5], [], [[], [None]]),
        (3, None, None, None),
        (4, [float("nan"), float("inf")], [-(2**62)], [[7]]),
    ]
    schema = "id int, d array<double>, l array<bigint>, n array<array<int>>"
    df = spark.createDataFrame(rows, schema)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, d DOUBLE[], l BIGINT[], n INT[][])")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows[:3])
    # duckdb's Python LIST binding converts NaN -> NULL (a load-side
    # artifact, not a rendering difference) — insert row 4 as a SQL literal
    con.execute(
        "INSERT INTO t VALUES (4, ['nan'::DOUBLE, 'infinity'::DOUBLE], "
        f"[{-(2**62)}], [[7]])"
    )
    for col, dtype in [("d", "array<double>"), ("l", "array<bigint>"), ("n", "array<array<int>>")]:
        got = {
            r["id"]: r["c"]
            for r in df.select("id", canonical_col(col, dtype).alias("c")).collect()
        }
        oracle = dict(
            con.execute(
                f"SELECT id, {canonical_col_sql(col, dtype)} FROM t"
            ).fetchall()
        )
        assert got == oracle, f"{dtype} cross-engine mismatch"
    # and the fingerprint sees a 1-ulp change inside an array element
    import math

    a = spark.createDataFrame([(1, [0.1])], "id int, v array<double>")
    b = spark.createDataFrame([(1, [math.nextafter(0.1, 1.0)])], "id int, v array<double>")
    assert table_checksum_value(a) != table_checksum_value(b)


def test_struct_canonicalization_injective_and_cross_engine(spark):
    """r7b: structs render as a nested row (per-field canonical renderings
    joined by ',', escaped for position) — injective where the native
    rendering collides ('a,b',1) vs ('a','b,1'), NULL struct distinct from
    all-NULL-fields struct, and byte-identical in DuckDB."""
    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    dtype = "struct<s:string,n:int>"
    rows = [
        (1, ("a,b", 1)),
        (2, ("a", None)),
        (3, (None, None)),  # all-NULL fields ...
        (4, None),          # ... vs NULL struct
        (5, ("\\N", 7)),    # forged sentinel in a field
        (6, ("a\\", 1)),
        (7, ("a", 1)),
    ]
    df = spark.createDataFrame(rows, f"id int, st {dtype}")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_col("st", dtype).alias("c")).collect()
    }
    assert len(set(got.values())) == len(got), f"struct canonical collision: {got}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, st STRUCT(s VARCHAR, n INT))")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, None if st is None else {"s": st[0], "n": st[1]}) for i, st in rows],
    )
    oracle = dict(
        con.execute(f"SELECT id, {canonical_col_sql('st', dtype)} FROM t").fetchall()
    )
    assert got == oracle


def test_map_canonicalization_order_insensitive_and_cross_engine(spark):
    """r7b: maps render as the SORTED array of 'key,value' entry strings —
    entry order never matters, distinct maps always render distinctly,
    and the bytes match DuckDB's twin."""
    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    dtype = "map<string,string>"
    rows = [
        (1, {"k1": "v1", "k2": "v,2"}),
        (2, {"k2": "v,2", "k1": "v1"}),  # same entries, other order
        (3, {}),
        (4, None),
        (5, {"k,1": None}),
        (6, {"k": "1,x"}),
        (7, {"k": "1", "x": None}),      # vs a comma inside row 6's value
        (8, {"é": "u"}),                 # non-ASCII key exercises binary sort
        (9, {"Z": "u", "a": "b"}),       # 'Z' < 'a' in binary order
    ]
    df = spark.createDataFrame(rows, f"id int, mp {dtype}")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_col("mp", dtype).alias("c")).collect()
    }
    assert got[1] == got[2]
    rest = {k: v for k, v in got.items() if k != 2}
    assert len(set(rest.values())) == len(rest), f"map canonical collision: {got}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, mp MAP(VARCHAR, VARCHAR))")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [
            (
                i,
                None
                if mp is None
                else {"key": list(mp.keys()), "value": list(mp.values())},
            )
            for i, mp in rows
        ],
    )
    oracle = dict(
        con.execute(f"SELECT id, {canonical_col_sql('mp', dtype)} FROM t").fetchall()
    )
    assert got == oracle


def test_nested_struct_map_array_cross_engine(spark):
    """The canonical scheme is closed under nesting: struct containing an
    array and a double, inside an array, round-trips bit-identically."""
    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    dtype = "array<struct<a:array<int>,d:double>>"
    rows = [
        (1, [([1, 2], 0.5), (None, None)]),
        (2, [([], 2.5e-5)]),
        (3, None),
        (4, [None]),
    ]
    df = spark.createDataFrame(rows, f"id int, v {dtype}")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_col("v", dtype).alias("c")).collect()
    }
    assert len(set(got.values())) == len(got)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, v STRUCT(a INT[], d DOUBLE)[])")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [
            (
                i,
                None
                if v is None
                else [None if e is None else {"a": e[0], "d": e[1]} for e in v],
            )
            for i, v in rows
        ],
    )
    oracle = dict(
        con.execute(f"SELECT id, {canonical_col_sql('v', dtype)} FROM t").fetchall()
    )
    assert got == oracle


def test_struct_field_case_preserved_and_case_sensitive(spark):
    """Struct field names keep their ORIGINAL case through canonicalization:
    getField must resolve under spark.sql.caseSensitive=true (r7 review
    finding — the dtype string used to be lowercased wholesale before
    parsing, so 'myField' became an unresolvable 'myfield').  DuckDB treats
    struct entry names case-insensitively, so case-VARIANT duplicate fields
    stay out of oracle scope; mixed-case names are the contract."""
    from cdc_lite_spark.functions.hashes import canonical_col, canonical_col_sql

    dtype = "struct<myField:int,OtherName:string>"
    rows = [(1, (7, "a")), (2, (7, "b")), (3, None)]
    df = spark.createDataFrame(rows, f"id int, s {dtype}")
    old = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        got = {
            r["id"]: r["c"]
            for r in df.select("id", canonical_col("s", dtype).alias("c")).collect()
        }
    finally:
        spark.conf.set("spark.sql.caseSensitive", old)
    assert len(set(got.values())) == len(got)

    con = duckdb.connect()
    con.execute('CREATE TABLE t(id INT, s STRUCT("myField" INT, "OtherName" VARCHAR))')
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [
            (i, None if s is None else {"myField": s[0], "OtherName": s[1]})
            for i, s in rows
        ],
    )
    oracle = dict(
        con.execute(f"SELECT id, {canonical_col_sql('s', dtype)} FROM t").fetchall()
    )
    assert got == oracle
