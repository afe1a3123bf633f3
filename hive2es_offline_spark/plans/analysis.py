"""The analysis chain: text → token stream, shared by every query/score
surface (match, BM25, suggesters, highlight, significant_text,
``_analyze``).

The reference's generated mappings declare string fields ``not_analyzed``
(``PAHive2ES.scala:126-159``), but the alias its loader publishes serves
ordinary consumers (``ESClient.java:154-170``) who type queries against
REAL text — and ES's default ``standard`` analyzer splits on
punctuation/Unicode word boundaries, not spaces.  Rounds 1-8 used
lowercase + whitespace split everywhere, so ``match: "world"`` missed
``"world!"``; this module makes the chain punctuation-aware and keeps one
definition of "token" across all three execution contexts:

- **Spark column side** (``analyze_col``): ``regexp_extract_all`` with a
  UAX#29-flavored token pattern — plain codegen, no UDF, so match/BM25
  tokenization stays inside WholeStageCodegen at any scale.
- **Driver/Python side** (``analyze_text``): the same pattern via ``re``
  for query strings, highlight term lists, and suggester inputs.
- **Oracle side** (``DUCKDB_TOKEN_RE``): the same pattern in RE2 syntax
  for DuckDB parity SQL.

Token grammar (the ``standard`` analyzer, a documented approximation of
UAX#29 word segmentation): maximal runs of letters / digits / underscore,
where a single apostrophe or dot BETWEEN two such runs joins them —
``"don't"`` → ``don't``, ``"2.5"`` → ``2.5``, ``"u.s.a."`` → ``u.s.a``,
``"foo_bar"`` → ``foo_bar`` (UAX#29 MidLetter / MidNumLet / ExtendNumLet
rules), while every other punctuation run splits.  Tokens are lowercased
(the standard analyzer's lowercase filter).

``whitespace`` remains as the fallback analyzer with the historical
semantics (lowercase + split on space runs) for corpora indexed that way.

The default is process-wide-per-plan-build (``using()`` context manager /
the ``analyzer=`` option on the public entry points): the analyzer
resolves at PLAN BUILD time on the driver, so no executor ever reads this
module's state.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "analyze_col", "analyze_text", "using", "current_analyzer",
    "DUCKDB_TOKEN_RE", "ANALYZERS",
]

#: Java regex (Spark side).  \p{L}/\p{N} are Unicode general categories.
_JAVA_TOKEN = r"[\p{L}\p{N}_]+(?:['.][\p{L}\p{N}_]+)*"
#: Python re: \w == [letter, digit, underscore, …] under str patterns.
_PY_TOKEN = re.compile(r"\w+(?:['.]\w+)*")
#: RE2 (DuckDB regexp_extract_all) — same classes as the Java pattern.
DUCKDB_TOKEN_RE = r"[\p{L}\p{N}_]+(?:['.][\p{L}\p{N}_]+)*"

ANALYZERS = ("standard", "whitespace")

_default = "standard"


def current_analyzer() -> str:
    return _default


@contextmanager
def using(analyzer: str | None):
    """Scope the default analyzer for a plan build.  ``None`` keeps the
    current default (lets entry points forward an optional kwarg
    unconditionally).

    CONCURRENCY: this swaps a process-global default — two threads
    building plans concurrently with different ``using(...)`` scopes
    would cross-contaminate each other's token grammar.  Plan builds are
    driver-side and ordinarily single-threaded; callers who build plans
    from multiple threads must instead pass ``analyzer=`` explicitly
    through the entry points (es_search / es_scored_search / es_suggest
    all accept it), which is the only concurrency-safe form."""
    global _default
    if analyzer is None:
        yield
        return
    if analyzer not in ANALYZERS:
        raise ValueError(
            f"unsupported analyzer: {analyzer!r} (standard | whitespace)"
        )
    prev = _default
    _default = analyzer
    try:
        yield
    finally:
        _default = prev


def analyze_col(col: Column, analyzer: str | None = None) -> Column:
    """Token array for a text column — codegen only (regexp_extract_all /
    split), empty tokens dropped.  NULL input stays NULL (callers that
    aggregate coalesce to the empty array themselves)."""
    a = analyzer or _default
    if a == "standard":
        return F.regexp_extract_all(F.lower(col), F.lit(_JAVA_TOKEN), 0)
    if a == "whitespace":
        return F.filter(F.split(F.lower(col), " +"), lambda t: t != "")
    raise ValueError(f"unsupported analyzer: {a!r} (standard | whitespace)")


def analyze_text(text: str, analyzer: str | None = None) -> list[str]:
    """Driver-side twin of ``analyze_col`` for query strings: identical
    token grammar, so a query tokenizes exactly like the corpus."""
    a = analyzer or _default
    if a == "standard":
        return [m.group(0).lower() for m in _PY_TOKEN.finditer(text or "")]
    if a == "whitespace":
        return [t for t in (text or "").lower().split() if t]
    raise ValueError(f"unsupported analyzer: {a!r} (standard | whitespace)")


def analyze_with_offsets(
    text: str, analyzer: str | None = None
) -> list[tuple[str, int, int, int]]:
    """(token, position, start_offset, end_offset) rows for ``_analyze``."""
    a = analyzer or _default
    out: list[tuple[str, int, int, int]] = []
    if a == "standard":
        for pos, m in enumerate(_PY_TOKEN.finditer(text or "")):
            out.append((m.group(0).lower(), pos, m.start(), m.end()))
        return out
    if a == "whitespace":
        pos = offset = 0
        for raw in (text or "").split(" "):
            if raw:
                out.append((raw.lower(), pos, offset, offset + len(raw)))
                pos += 1
            offset += len(raw) + 1
        return out
    raise ValueError(f"unsupported analyzer: {a!r} (standard | whitespace)")


def duckdb_tokens(expr: str, analyzer: str = "standard") -> str:
    """SQL fragment producing the token LIST for ``expr`` in DuckDB —
    oracle-side twin of ``analyze_col`` (single-quote in the pattern is
    doubled for SQL literal quoting)."""
    if analyzer == "standard":
        pat = DUCKDB_TOKEN_RE.replace("'", "''")
        return f"regexp_extract_all(lower({expr}), '{pat}')"
    if analyzer == "whitespace":
        return (f"list_filter(string_split_regex(lower({expr}), ' +'), "
                "t -> t != '')")
    raise ValueError(f"unsupported analyzer: {analyzer!r}")
