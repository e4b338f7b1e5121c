"""Engine-portable hashing and row canonicalization.

The reference fingerprints tables with DuckDB-internal ``hash()`` (64-bit,
engine-specific constants — /root/reference/pkg/duckdb/duckdb_cdc.go:178).
Our correctness oracle runs in DuckDB while the engine runs in Spark, so any
hash that participates in an oracle-checked result must be computable
*bit-identically in both engines* (SURVEY.md §7.4).

The portable hash here is: ``md5(s)`` → first 15 hex chars → parse base-16 →
a 60-bit non-negative BIGINT.  Both engines share md5 exactly; 15 hex digits
(60 bits) fits signed 64-bit in both.  Each helper has a Spark Column form
and a DuckDB SQL-string form that produce identical values.

Scale note: md5 is ~3x slower than xxhash64 but still JVM-side,
whole-stage-codegen'd, and embarrassingly parallel — it never shuffles.
Production deployments that don't need a cross-engine oracle can swap
``portable_hash64`` for ``F.xxhash64`` via the ``fast=`` flag.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_PREFIX_LEN = 15  # 60 bits < 2^63, safe in signed BIGINT for both engines

# Canonicalization must be INJECTIVE per SCALAR column: the reference's
# ``COALESCE(CAST(c AS VARCHAR),'')`` + ``','`` join (duckdb_cdc.go:171-173)
# maps distinct rows to identical strings in two classes —
# (a) '' vs NULL in any column, (b) a comma shifting across adjacent string
# columns (('a,b','c') vs ('a','b,c')).  Either one silently suppresses a
# change: the fingerprint stays equal, so no capture fires and snapshot_diff
# misses the UPDATE.  SURVEY.md §7.4 policy is "do not reproduce known
# defects", so we escape instead: '\'→'\\' and ','→'\,' inside any rendering
# that can contain them, and NULL renders as the sentinel '\N' (unforgeable —
# an escaped value can only contain '\' as '\\' or '\,').  Oracle parity is
# preserved because the DuckDB twin applies the identical escaping and both
# engines hash the same canonical bytes.
#
# Scope (r6 advice, upgraded r7): the injectivity guarantee covers SCALAR
# columns and (recursively) ARRAY, STRUCT, and MAP columns.  Arrays are
# canonicalized STRUCTURALLY — ``len:`` prefix + per-element canonical
# rendering, each element escaped before the ',' join, NULL elements as the
# bare ``\N`` sentinel (unforgeable among escaped strings) — so ``['a, b']``
# renders ``1:a\, b`` while ``['a', ' b']`` renders ``2:a, b``: distinct
# arrays always render distinctly, and the engines' native (non-injective,
# engine-specific) list renderings are never consulted.  Structs render as
# a nested row (per-field canonical renderings joined by ',', the whole
# escaped for its position; a NULL struct renders the bare sentinel, which
# an all-NULL-fields struct — whose rendering is escaped — cannot forge).
# Maps render as the sorted array of ``key,value`` entry strings (sorted
# unescaped, binary order in both engines; keys are unique so the order is
# total), making the rendering ORDER-INSENSITIVE over entries, injective
# over the entry multiset, and independent of either engine's native map
# rendering.  Struct field names must be plain identifiers (no ':', ','
# or '<' in names) — Spark's simpleString form is what gets parsed, with
# the ORIGINAL case preserved (only type tokens are compared lowercased),
# so field resolution works under spark.sql.caseSensitive=true and for
# case-variant field names.
#
# Escape SKIPPING (r6 verdict ask #1): dtypes whose rendering alphabet
# provably excludes ',' and '\' skip the two replaces entirely — the
# escape is a byte-level no-op there, so output (and oracle parity) is
# unchanged by construction while the checksum hot loop drops two string
# rewrites per column.  Fixed-alphabet dtypes: integers and date render
# ``[0-9-]``; timestamps ``[0-9 :.-]``; booleans ``0|1``; doubles via
# _canon_float ``[0-9.e-]``/nan/inf; decimals render full-scale plain
# ``[0-9.-]`` in BOTH engines (probed: Spark and DuckDB both emit
# '0.0000001000' for decimal(38,10), never scientific notation).
#
# FINGERPRINT FORMAT HISTORY (bump when canonical bytes change):
# - r6 (commit 87ed583): NULL sentinel + separator escaping introduced —
#   every row hash / table checksum changed; persisted pre-r6 checksum
#   state registers one spurious capture per table on upgrade.
# - r7: decimal(p>15,s) switched from cast-to-double (collides past 2^53)
#   to the exact full-scale decimal string, and array columns switched
#   from the escaped native '[a, b]' rendering (which collided across
#   element boundaries) to the structural len-prefixed form — checksums
#   over wide-decimal or array columns change (one spurious capture per
#   affected table on upgrade); p<=15 decimals, doubles, and every other
#   scalar dtype are byte-identical to r6.
# - r7b: struct and map columns switched from the escaped native rendering
#   (engine-specific, non-injective) to structural forms (see scope note)
#   — checksums over struct/map columns change on upgrade; all other
#   dtypes unchanged.
NULL_SENTINEL = "\\N"

#: decimal precision up to which binary64 round-trips every value exactly
#: (15 significant digits), so the double rendering stays injective
_DECIMAL_DOUBLE_SAFE_P = 15


def _decimal_precision(dtype_lower: str) -> int:
    """Precision p from 'decimal(p,s)' (Spark's default is decimal(10,0))."""
    inside = dtype_lower.partition("(")[2].partition(")")[0]
    return int(inside.split(",")[0]) if inside else 10


def _split_top_level(params: str) -> list[str]:
    """Split a type-parameter list on top-level commas only — nested
    ``<...>`` (array/struct/map) and ``(...)`` (decimal) keep their commas."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in params:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _struct_fields(dl: str) -> list[tuple[str, str]]:
    """``[(name, dtype), ...]`` from ``struct<a:int,b:...>`` (Spark's
    simpleString form; names must be plain identifiers)."""
    return [
        (f.partition(":")[0], f.partition(":")[2])
        for f in _split_top_level(dl[len("struct<") : -1])
    ]


def _escape_reserved(rendered: Column) -> Column:
    """Escape '\\' then ',' so the join separator and NULL sentinel are
    unforgeable.  Literal (non-regex) replaces — whole-stage codegen'd."""
    return F.replace(
        F.replace(rendered, F.lit("\\"), F.lit("\\\\")), F.lit(","), F.lit("\\,")
    )


def _escape_reserved_sql(rendered: str) -> str:
    """DuckDB SQL mirror of :func:`_escape_reserved` (same replace order)."""
    return f"replace(replace({rendered}, '\\', '\\\\'), ',', '\\,')"


def portable_hash64(col: Column | str, seed: str | None = None, fast: bool = False) -> Column:
    """60-bit deterministic hash of a string column, DuckDB-reproducible.

    ``seed`` namespaces hash families (MinHash needs k independent hashes).
    ``fast=True`` swaps in xxhash64 — NOT oracle-comparable, use only for
    engine-internal fingerprints where no DuckDB parity is needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(seed + "\x1f"), c)
    if fast:
        return F.xxhash64(c)
    return F.conv(F.substring(F.md5(c), 1, HEX_PREFIX_LEN), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: str | None = None) -> str:
    """DuckDB SQL producing the same value as :func:`portable_hash64`."""
    if seed is not None:
        expr = f"(chr(31) || {expr})"
        expr = f"('{seed}' || {expr})"
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_PREFIX_LEN}) AS BIGINT)"


def _canon_float(d: Column) -> Column:
    """Full-precision, engine-portable rendering of a DOUBLE.

    Both Spark (Java ``Double.toString``) and DuckDB render doubles with the
    *shortest digit string that round-trips* — only the notation differs
    (``1.0E-4`` vs ``0.0001`` vs ``1e+300``).  This normalizes either
    notation to one canonical scientific form (``-1.23456e3``, zero →
    ``0``), so two doubles render identically **iff they are the same
    binary64** — a 1-ulp update always changes the checksum, unlike any
    fixed-precision ``printf`` (ADVICE r01: %.6f masked sub-resolution
    updates).  Pure JVM string ops — stays in whole-stage codegen.

    Caveat: pre-JDK-19 ``Double.toString`` is round-trip-exact but not
    always minimal-length; for such values (≈16-17 significant digits) the
    Spark and DuckDB digit strings can differ.  Detection (Spark-vs-Spark)
    is unaffected; only oracle parity on pathological literals would notice.
    """
    # no regexes in this pipeline — the fingerprint renders every float of
    # every row, and split_part/ltrim/rtrim stay in whole-stage codegen at a
    # fraction of a regex engine's cost (r02 bench: regex form was 5-7x
    # slower on the checksum family)
    s = d.cast("string")  # Java notation: [-]ddd.ddd or [-]d.dddE[-]XX
    sign = F.when(s.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    body = F.call_function("ltrim", F.lit("-"), s)
    mant = F.split_part(body, F.lit("E"), F.lit(1))
    exp = F.coalesce(F.split_part(body, F.lit("E"), F.lit(2)).try_cast("int"), F.lit(0))
    intpart = F.split_part(mant, F.lit("."), F.lit(1))
    frac = F.split_part(mant, F.lit("."), F.lit(2))
    digits = F.concat(intpart, frac)
    stripped = F.call_function("ltrim", F.lit("0"), digits)
    lead_zeros = F.length(digits) - F.length(stripped)
    e_norm = exp + F.length(intpart) - lead_zeros - F.lit(1)
    dnorm = F.call_function("rtrim", F.lit("0"), stripped)
    mantissa = F.concat(
        F.substring(dnorm, 1, 1),
        F.when(
            F.length(dnorm) > 1, F.concat(F.lit("."), F.substring(dnorm, 2, 1024))
        ).otherwise(F.lit("")),
    )
    norm = F.when(stripped == "", F.concat(sign, F.lit("0"))).otherwise(
        F.concat(sign, mantissa, F.lit("e"), e_norm.cast("string"))
    )
    # fast path: for 1e-3 <= |x| < 1e7 (and zero) BOTH engines already render
    # the identical plain shortest form ("1234.56") — one cast, no string
    # pipeline.  Real-world numeric columns live almost entirely in-range, so
    # the normalization above only runs on the stragglers.
    in_plain_range = (d == 0) | ((F.abs(d) >= 0.001) & (F.abs(d) < 1e7))
    return (
        F.when(F.isnan(d), F.lit("nan"))
        .when(d == F.lit(float("inf")), F.lit("inf"))
        .when(d == F.lit(float("-inf")), F.lit("-inf"))
        .when(in_plain_range, s)
        .otherwise(norm)
    )


def _canon_float_sql(col: str) -> str:
    """DuckDB SQL mirror of :func:`_canon_float` (same algorithm over
    DuckDB's own shortest-round-trip VARCHAR rendering)."""
    d = f"CAST({col} AS DOUBLE)"
    body = f"ltrim(CAST({d} AS VARCHAR), '-')"
    sign = f"CASE WHEN CAST({d} AS VARCHAR) LIKE '-%' THEN '-' ELSE '' END"
    mant = f"split_part({body}, 'e', 1)"
    exp = f"COALESCE(TRY_CAST(split_part({body}, 'e', 2) AS INT), 0)"
    intpart = f"split_part({mant}, '.', 1)"
    frac = f"split_part({mant}, '.', 2)"
    digits = f"({intpart} || {frac})"
    stripped = f"ltrim({digits}, '0')"
    lead_zeros = f"(length({digits}) - length({stripped}))"
    e_norm = f"({exp} + length({intpart}) - {lead_zeros} - 1)"
    dnorm = f"rtrim({stripped}, '0')"
    mantissa = (
        f"(substring({dnorm}, 1, 1) || CASE WHEN length({dnorm}) > 1 "
        f"THEN '.' || substring({dnorm}, 2, 1024) ELSE '' END)"
    )
    return (
        f"CASE WHEN {d} IS NULL THEN NULL "
        f"WHEN isnan({d}) THEN 'nan' "
        f"WHEN {d} = 'infinity'::DOUBLE THEN 'inf' "
        f"WHEN {d} = '-infinity'::DOUBLE THEN '-inf' "
        f"WHEN {d} = 0 OR (abs({d}) >= 0.001 AND abs({d}) < 10000000.0) "
        f"THEN CAST({d} AS VARCHAR) "
        f"WHEN {stripped} = '' THEN {sign} || '0' "
        f"ELSE {sign} || {mantissa} || 'e' || CAST({e_norm} AS VARCHAR) END"
    )


def canonical_col(col: str, dtype: str) -> Column:
    """One column rendered to a canonical string, identically in both engines.

    Mirrors the reference's full-precision ``COALESCE(CAST(c AS VARCHAR), '')``
    (duckdb_cdc.go:171) but pins formats where Spark/DuckDB defaults diverge:
    timestamps → microsecond pattern (Spark's native precision), floats →
    shortest-round-trip canonical scientific form (:func:`_canon_float` —
    full binary64 precision, so no update can hash identically), booleans
    → 0/1 — and, diverging from the reference's known defect (see
    ``NULL_SENTINEL``), NULL renders as ``'\\N'`` and free-form renderings
    are separator-escaped so the per-row canonical string is injective.
    """
    return F.coalesce(_canon_rendered(F.col(col), dtype), F.lit(NULL_SENTINEL))


def _canon_rendered(c: Column, dt: str) -> Column:
    """Escaped-or-fixed-alphabet canonical rendering of one VALUE of dtype
    ``dt`` (NULL propagates as NULL — the caller supplies the sentinel).
    The same function canonicalizes row columns and array elements, so the
    injectivity argument recurses: every branch returns a string whose
    bare ``,`` count equals its logical separator count and which cannot
    contain the bare ``\\N`` sentinel.

    Type DISPATCH compares the lowercased string, but nested field names /
    element types are sliced from the ORIGINAL ``dt`` so struct field case
    survives (getField under spark.sql.caseSensitive=true needs it)."""
    dl = dt.lower()
    if dl.startswith("timestamp"):
        # fixed alphabet [0-9 :.-], can never contain ',' or '\' — no escape
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if dl in ("double", "float"):
        return _canon_float(c.cast("double"))
    if dl.startswith("decimal"):
        if _decimal_precision(dl) <= _DECIMAL_DOUBLE_SAFE_P:
            # p<=15 round-trips through binary64 exactly — share the float
            # canonical form (keeps r2-r6 fingerprint bytes for these)
            return _canon_float(c.cast("double"))
        # wide decimals exceed binary64 (distinct values past 2^53 can
        # collide as doubles) — render the exact full-scale decimal
        # string, byte-identical in both engines (see format note above)
        return c.cast("string")
    if dl == "boolean":
        return c.cast("int").cast("string")
    if dl in ("tinyint", "smallint", "int", "integer", "bigint", "long", "date"):
        # fixed alphabet [0-9-] — escape would be a byte-level no-op, skip it
        return c.cast("string")
    if dl.startswith("array<"):
        # structural: len-prefix + escaped per-element canonical renderings
        # joined by ','; NULL element → bare '\N' (unforgeable).  The whole
        # array string is then escaped for ITS position (row column or
        # parent array element), keeping the scheme closed under nesting.
        ed = dt[6:-1]
        inner = F.concat_ws(
            ",",
            F.transform(
                c, lambda x: F.coalesce(_canon_rendered(x, ed), F.lit(NULL_SENTINEL))
            ),
        )
        return _escape_reserved(
            F.concat(F.size(c).cast("string"), F.lit(":"), inner)
        )
    if dl.startswith("struct<"):
        # nested row: per-field canonical renderings joined by ',', the
        # whole escaped for its position — same injectivity argument as
        # the top-level row join, recursively
        inner = F.concat_ws(
            ",",
            *[
                F.coalesce(_canon_rendered(c.getField(n), t), F.lit(NULL_SENTINEL))
                for n, t in _struct_fields(dt)
            ],
        )
        # concat_ws never yields NULL, so NULL-struct vs all-NULL-fields
        # needs an explicit guard (both engines agree struct(NULL,..) is
        # NOT NULL); the escaped all-NULL rendering '\\N,...' cannot forge
        # the caller's bare '\N' sentinel
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            _escape_reserved(inner)
        )
    if dl.startswith("map<"):
        # sorted array of 'key,value' entry strings: entries render as
        # 2-column rows (injective), sort UNESCAPED in binary order (keys
        # are unique, so the order is total and identical in both engines),
        # then each entry is escaped as a free-form array element — the
        # rendering is order-insensitive over entries and injective over
        # the entry multiset
        kt, vt = _split_top_level(dt[len("map<") : -1])
        entries = F.map_entries(c)
        entry_strs = F.array_sort(
            F.transform(
                entries,
                lambda e: F.concat_ws(
                    ",",
                    F.coalesce(
                        _canon_rendered(e.getField("key"), kt), F.lit(NULL_SENTINEL)
                    ),
                    F.coalesce(
                        _canon_rendered(e.getField("value"), vt), F.lit(NULL_SENTINEL)
                    ),
                ),
            )
        )
        inner = F.concat_ws(",", F.transform(entry_strs, _escape_reserved))
        # size(NULL map) is NULL -> concat propagates -> caller's sentinel
        return _escape_reserved(
            F.concat(F.size(entries).cast("string"), F.lit(":"), inner)
        )
    # strings / anything free-form may contain ',' or '\'
    return _escape_reserved(c.cast("string"))


def canonical_col_sql(col: str, dtype: str) -> str:
    """DuckDB SQL mirror of :func:`canonical_col`."""
    return f"COALESCE({_canon_rendered_sql(col, dtype)}, '{NULL_SENTINEL}')"


def _canon_rendered_sql(expr: str, dt: str, depth: int = 0) -> str:
    """DuckDB SQL mirror of :func:`_canon_rendered`.  ``depth`` names the
    lambda variable per nesting level so nested arrays don't shadow.
    Like the Spark twin, dispatch lowercases but field names / element
    types keep the original case."""
    dl = dt.lower()
    if dl.startswith("timestamp"):
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S.%f')"
    if dl in ("double", "float"):
        return _canon_float_sql(expr)
    if dl.startswith("decimal"):
        if _decimal_precision(dl) <= _DECIMAL_DOUBLE_SAFE_P:
            return _canon_float_sql(expr)
        return f"CAST({expr} AS VARCHAR)"
    if dl == "boolean":
        return f"CAST(CAST({expr} AS INT) AS VARCHAR)"
    if dl in ("tinyint", "smallint", "int", "integer", "bigint", "long", "date"):
        return f"CAST({expr} AS VARCHAR)"
    if dl.startswith("array<"):
        ed = dt[6:-1]
        var = f"__e{depth}"
        elem = _canon_rendered_sql(var, ed, depth + 1)
        # DuckDB's array_to_string returns NULL for empty lists — coalesce
        # to '' to match Spark's concat_ws; a NULL LIST still renders NULL
        # because len(NULL) is NULL and '||' propagates it
        inner = (
            f"COALESCE(array_to_string(list_transform({expr}, "
            f"{var} -> COALESCE({elem}, '{NULL_SENTINEL}')), ','), '')"
        )
        return _escape_reserved_sql(
            f"(CAST(len({expr}) AS VARCHAR) || ':' || {inner})"
        )
    if dl.startswith("struct<"):
        rendered = ", ".join(
            "COALESCE("
            + _canon_rendered_sql(f"struct_extract({expr}, '{n}')", t, depth + 1)
            + f", '{NULL_SENTINEL}')"
            for n, t in _struct_fields(dt)
        )
        inner = f"concat_ws(',', {rendered})"
        return (
            f"CASE WHEN {expr} IS NULL THEN NULL "
            f"ELSE {_escape_reserved_sql(inner)} END"
        )
    if dl.startswith("map<"):
        kt, vt = _split_top_level(dt[len("map<") : -1])
        var = f"__me{depth}"
        entry = (
            f"concat_ws(',', "
            f"COALESCE({_canon_rendered_sql(f'''struct_extract({var}, 'key')''', kt, depth + 1)}, '{NULL_SENTINEL}'), "
            f"COALESCE({_canon_rendered_sql(f'''struct_extract({var}, 'value')''', vt, depth + 1)}, '{NULL_SENTINEL}'))"
        )
        svar = f"__ms{depth}"
        escaped = (
            f"list_transform(list_sort(list_transform(map_entries({expr}), "
            f"{var} -> {entry})), {svar} -> {_escape_reserved_sql(svar)})"
        )
        # array_to_string(NULL or empty) -> COALESCE '' like the array twin;
        # cardinality(NULL map) is NULL so '||' propagates the NULL
        inner = f"COALESCE(array_to_string({escaped}, ','), '')"
        return _escape_reserved_sql(
            f"(CAST(cardinality({expr}) AS VARCHAR) || ':' || {inner})"
        )
    return _escape_reserved_sql(f"CAST({expr} AS VARCHAR)")


def canonical_row_string(cols_with_types: Sequence[tuple[str, str]]) -> Column:
    """All columns joined into one canonical row string (reference's checksum
    row-repr, duckdb_cdc.go:169-173: per-col canonical strings joined by ',')."""
    return F.concat_ws(",", *[canonical_col(c, t) for c, t in cols_with_types])


def canonical_row_sql(cols_with_types: Sequence[tuple[str, str]]) -> str:
    """DuckDB SQL mirror of :func:`canonical_row_string`."""
    parts = [canonical_col_sql(c, t) for c, t in cols_with_types]
    return "concat_ws(',', " + ", ".join(parts) + ")"
