"""IPv4 / CIDR support for the query surface (VERDICT r10 #5).

ES stores ``ip``-typed fields as numbers and lets consumers write CIDR
blocks in ``term``/``terms`` and dotted-quads in ``range``; the engine's
tables carry IPs as plain strings, so these helpers parse dotted-quad →
uint32 IN CODEGEN (split + integer arithmetic, no UDF) and turn a CIDR
block into a [lo, hi] range compare computed at plan-build time in
Python.  The DSL compiler auto-detects the shapes ES's mapping would
resolve (``_is_cidr`` in term values, all-dotted-quad bounds in range)
— without this, a lexicographic string compare would order "9.0.0.0"
AFTER "10.0.0.0" and silently return wrong rows.

IPv6 rejects loudly (no uint128 arithmetic worth faking in doubles);
malformed values in DATA become NULL through the cast chain = no match,
the same NULL discipline as every other clause.  Octets > 255 in data
are not validated (ES validates at index time; the engine's tables are
assumed ES-loadable).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "is_ip_literal", "is_cidr_literal", "cidr_bounds", "ip_to_long",
    "ip_to_long_sql", "ip_literal_value", "ip_from_long",
    "ip_from_long_sql", "ip_to_long_spark", "ip_from_long_spark",
]

_IP_RE = re.compile(r"^\d{1,3}(?:\.\d{1,3}){3}$")
_CIDR_RE = re.compile(r"^\d{1,3}(?:\.\d{1,3}){3}/\d{1,2}$")


def _check_v6(s: str) -> None:
    if ":" in s:
        raise ValueError(
            f"IPv6 value {s!r} is not supported (IPv4 only)")


def is_ip_literal(s) -> bool:
    """STRICT: shape AND octet range.  The DSL's auto-detection keys off
    this, so a value like "300.1.1.1" must fall back to plain string
    semantics rather than detect-then-crash (code-review r11)."""
    return (isinstance(s, str) and bool(_IP_RE.match(s))
            and all(int(p) <= 255 for p in s.split(".")))


def is_cidr_literal(s) -> bool:
    if not (isinstance(s, str) and bool(_CIDR_RE.match(s))):
        return False
    base, _, bits = s.partition("/")
    return is_ip_literal(base) and int(bits) <= 32


def ip_literal_value(s: str) -> int:
    """Dotted-quad string → uint32, validated (driver-side literals)."""
    _check_v6(s)
    parts = s.split(".")
    if len(parts) != 4 or any(not p.isdigit() or int(p) > 255
                              for p in parts):
        raise ValueError(f"not a valid IPv4 address: {s!r}")
    a, b, c, d = (int(p) for p in parts)
    return (a << 24) | (b << 16) | (c << 8) | d


def cidr_bounds(block: str) -> tuple[int, int]:
    """``a.b.c.d/n`` → inclusive (lo, hi) uint32 bounds of the block."""
    _check_v6(block)
    base, _, bits = block.partition("/")
    n = int(bits)
    if not 0 <= n <= 32:
        raise ValueError(f"CIDR prefix length out of range: {block!r}")
    host = (1 << (32 - n)) - 1
    lo = ip_literal_value(base) & ~host & 0xFFFFFFFF
    return lo, lo | host


def ip_to_long(c: Column) -> Column:
    """Dotted-quad COLUMN → uint32 as BIGINT — pure codegen (split +
    integer arithmetic); malformed or short values yield NULL.  The
    casts are try_cast: under ANSI mode (Spark 4's default) a plain cast
    of a garbage octet like "0/8" THROWS mid-query instead of nulling
    (code-review r11 follow-up — the CIDR-vs-keyword hedge feeds such
    values through this parser by design)."""
    p = F.split(c, r"\.")
    # a 5+-part value must NOT silently use only the first 4 octets
    four = F.when(F.size(p) == 4, p)
    return (
        F.element_at(four, 1).try_cast("bigint") * F.lit(16777216)
        + F.element_at(four, 2).try_cast("bigint") * F.lit(65536)
        + F.element_at(four, 3).try_cast("bigint") * F.lit(256)
        + F.element_at(four, 4).try_cast("bigint")
    )


def ip_from_long(c: Column) -> Column:
    """uint32 BIGINT → dotted-quad string — the render twin of
    :func:`ip_to_long` (pure codegen shifts; NULL propagates through
    concat_ws' typed casts via the shiftrightunsigned/NULL arithmetic).
    Callers guarantee the value is within [0, 2^32) — the ES|QL
    IP_PREFIX masks before rendering."""
    return F.concat_ws(
        ".",
        F.shiftrightunsigned(c, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftrightunsigned(c, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftrightunsigned(c, 8).bitwiseAND(F.lit(255)).cast("string"),
        c.bitwiseAND(F.lit(255)).cast("string"),
    )


def ip_from_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`ip_from_long` for oracle SQL."""
    return (
        f"(CAST(({expr} >> 24) & 255 AS VARCHAR) || '.' || "
        f"CAST(({expr} >> 16) & 255 AS VARCHAR) || '.' || "
        f"CAST(({expr} >> 8) & 255 AS VARCHAR) || '.' || "
        f"CAST({expr} & 255 AS VARCHAR))"
    )


def ip_to_long_spark(expr: str) -> str:
    """Spark-SQL string twin of :func:`ip_to_long` — the SAME analyzed
    expression, rendered as text so hot plan builders parse it in one
    ``F.expr`` call instead of ~10 py4j round trips (the round-15/16
    expression-string pattern).  Twin discipline: any change here must
    change :func:`ip_to_long` identically (pinned by
    tests/test_ip.py's twin equality)."""
    p = f"split({expr}, '\\\\.')"
    four = f"(CASE WHEN (size({p}) = 4) THEN {p} END)"
    return (
        f"((((TRY_CAST(element_at({four}, 1) AS BIGINT) * 16777216)"
        f" + (TRY_CAST(element_at({four}, 2) AS BIGINT) * 65536))"
        f" + (TRY_CAST(element_at({four}, 3) AS BIGINT) * 256))"
        f" + TRY_CAST(element_at({four}, 4) AS BIGINT))"
    )


def ip_from_long_spark(expr: str) -> str:
    """Spark-SQL string twin of :func:`ip_from_long` (see
    :func:`ip_to_long_spark` for the twin discipline)."""
    return (
        "concat_ws('.', "
        f"CAST((shiftrightunsigned({expr}, 24) & 255) AS STRING), "
        f"CAST((shiftrightunsigned({expr}, 16) & 255) AS STRING), "
        f"CAST((shiftrightunsigned({expr}, 8) & 255) AS STRING), "
        f"CAST(({expr} & 255) AS STRING))"
    )


def ip_to_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`ip_to_long` for oracle SQL (1-indexed list
    access; TRY_CAST mirrors Spark's NULL-on-malformed cast)."""
    p = f"string_split({expr}, '.')"
    four = f"(CASE WHEN len({p}) = 4 THEN {p} END)"
    return (
        f"(TRY_CAST({four}[1] AS BIGINT) * 16777216"
        f" + TRY_CAST({four}[2] AS BIGINT) * 65536"
        f" + TRY_CAST({four}[3] AS BIGINT) * 256"
        f" + TRY_CAST({four}[4] AS BIGINT))"
    )
