"""KQL (Kibana Query Language) → query-DSL compiler.

Public grammar (Elastic's "Kibana Query Language" docs, ES|QL's
``KQL("…")`` full-text function, 8.17+): ``field:value`` terms, quoted
phrases, ``field:(a or b)`` value groups, ``and`` / ``or`` / ``not``
boolean operators (case-insensitive; ``or`` binds loosest, then
``and``, ``not`` tightest), parentheses, comparison ranges
(``field > v``, ``>=``, ``<``, ``<=``), trailing-``*`` wildcards and
the bare ``field:*`` existence check, with ``\\``-escapes for the
special characters.

``parse_kql`` returns a query-DSL dict (the same shape
``plans/query_dsl.compile_query`` consumes), so KQL rides the
already-audited filter compilers — one semantics, two query grammars
(the Lucene query-string parser in ``plans/query_string.py`` is the
other).  Honest-subset policy, consistent with the rest of the engine:

* **Bare terms reject loudly.**  Live Kibana falls back to every
  indexed field via the index mapping; a flat frame has no mapping to
  enumerate, so unqualified terms raise (the QSTR rule,
  ``plans/esql.py``).
* **Field wildcards (``machine*:value``) reject loudly** for the same
  reason — expansion needs a mapping, not a frame.
* **Nested field queries (``level1:{ a:b }``) reject loudly** with a
  pointer at the DSL ``nested`` clause, which implements true
  per-element semantics.
* **Value typing is literal-shaped**: a numeric literal compiles to a
  ``term`` equality (what live KQL's ``match`` does on a numeric
  field, where no analyzer applies), everything else to an analyzed
  ``match``; quoted values are ``match_phrase``.  A mapping would make
  this per-field; the literal's shape is the deterministic stand-in —
  documented divergence.

Reference provenance: the reference loader (hive2es-offline) exposes no
query language at all; KQL parity is judged against Elastic's public
KQL docs and the ES|QL ``kql()`` function semantics.
"""

from __future__ import annotations

import re

__all__ = ["parse_kql"]

#: characters that end an unquoted word (specials + whitespace);
#: ``{`` / ``}`` are included so a nested-field query is caught as a
#: structural token, not silently glued into a term
_WORD_END = set('():<>"{}')

_KEYWORDS = {"and", "or", "not"}


def _err(msg: str, pos: int) -> ValueError:
    return ValueError(f"KQL: {msg} (at offset {pos})")


def _lex(s: str) -> list[tuple[str, str, int]]:
    """Tokens: ``("op", "(" | ")" | ":" | "<" | "<=" | ">" | ">=", pos)``,
    ``("word", text, pos)`` (backslash-escapes resolved, raw ``*`` kept),
    ``("quoted", text, pos)``.  Keywords stay words here; the parser
    decides by position (KQL requires escaping them to use literally —
    an escaped keyword arrives with ``had_escape`` marking it a term)."""
    toks: list[tuple[str, str, int]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            toks.append(("op", c, i))
            i += 1
            continue
        if c == ":":
            toks.append(("op", ":", i))
            i += 1
            continue
        if c in "<>":
            if i + 1 < n and s[i + 1] == "=":
                toks.append(("op", c + "=", i))
                i += 2
            else:
                toks.append(("op", c, i))
                i += 1
            continue
        if c in "{}":
            raise _err(
                "nested field queries (`field:{ … }`) are not supported "
                "— use the query-DSL `nested` clause for per-element "
                "semantics", i)
        if c == '"':
            j = i + 1
            buf: list[str] = []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n:
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            if j >= n:
                raise _err("unterminated quoted string", i)
            toks.append(("quoted", "".join(buf), i))
            i = j + 1
            continue
        # unquoted word (field name, value, or keyword)
        start = i
        buf = []
        escaped = False
        while i < n and not s[i].isspace() and s[i] not in _WORD_END:
            if s[i] == "\\":
                if i + 1 >= n:
                    raise _err("dangling backslash", i)
                buf.append(s[i + 1])
                escaped = True
                i += 2
            else:
                buf.append(s[i])
                i += 1
        word = "".join(buf)
        if not word:
            raise _err(f"unexpected character {s[i]!r}", i)
        kind = "eword" if escaped else "word"
        toks.append((kind, word, start))
    return toks


#: strict ASCII numeric literal — Python's int()/float() accept
#: underscores, unicode digits and inf/nan spellings a query language
#: must not silently re-type
_NUM_RE = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def _as_number(v: str):
    """Numeric-literal detection for the term/match split (and range
    bounds): int preferred, float fallback, None for non-numbers."""
    if not _NUM_RE.fullmatch(v):
        return None
    try:
        return int(v)
    except ValueError:
        return float(v)


def _value_clause(field: str, kind: str, value: str, pos: int) -> dict:
    """One ``field:value`` atom → DSL clause (see module docstring for
    the typing policy)."""
    if kind == "quoted":
        return {"match_phrase": {field: value}}
    if value == "*":
        return {"exists": {"field": field}}
    if "*" in value:
        return {"wildcard": {field: {"value": value}}}
    if kind == "word":  # escaped words are always plain terms
        num = _as_number(value)
        if num is not None:
            return {"term": {field: num}}
    return {"match": {field: value}}


class _Parser:
    def __init__(self, toks: list[tuple[str, str, int]], src: str):
        self.toks = toks
        self.i = 0
        self.src = src

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("KQL: unexpected end of query")
        self.i += 1
        return t

    def _is_kw(self, t, kw: str) -> bool:
        return t is not None and t[0] == "word" and t[1].lower() == kw

    # expr := and_expr ("or" and_expr)*
    def expr(self) -> dict:
        parts = [self.and_expr()]
        while self._is_kw(self.peek(), "or"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts}}

    # and_expr := not_expr ("and" not_expr)*
    def and_expr(self) -> dict:
        parts = [self.not_expr()]
        while self._is_kw(self.peek(), "and"):
            self.next()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"must": parts}}

    # not_expr := "not" not_expr | atom
    def not_expr(self) -> dict:
        if self._is_kw(self.peek(), "not"):
            self.next()
            return {"bool": {"must_not": [self.not_expr()]}}
        return self.atom()

    def atom(self) -> dict:
        t = self.next()
        if t[:2] == ("op", "("):
            inner = self.expr()
            c = self.next()
            if c[:2] != ("op", ")"):
                raise _err(f"expected ')', got {c[1]!r}", c[2])
            return inner
        if t[0] == "op":
            raise _err(f"unexpected {t[1]!r}", t[2])
        if t[0] == "quoted":
            raise _err(
                f"bare term {t[1]!r} — live Kibana searches every mapped "
                "field; a flat frame has no mapping, so terms must be "
                "field-qualified (field:\"…\")", t[2])
        field = t[1]
        nxt = self.peek()
        if nxt is not None and nxt[0] == "op" and nxt[1] == ":":
            self.next()
            if "*" in field:
                raise _err(
                    f"field wildcards ({field!r}) need an index mapping "
                    "to expand — name the column", t[2])
            return self.value_part(field)
        if nxt is not None and nxt[0] == "op" and nxt[1] in ("<", "<=",
                                                            ">", ">="):
            self.next()
            if "*" in field:
                raise _err(
                    f"field wildcards ({field!r}) need an index mapping "
                    "to expand — name the column", t[2])
            return self.range_clause(field, nxt[1], nxt[2])
        raise _err(
            f"bare term {field!r} — live Kibana searches every mapped "
            "field; a flat frame has no mapping, so terms must be "
            "field-qualified (field:value)", t[2])

    def range_clause(self, field: str, op: str, pos: int) -> dict:
        v = self.next()
        if v[0] == "op":
            raise _err(f"expected a range value, got {v[1]!r}", v[2])
        if v[0] == "word" and v[1].lower() in _KEYWORDS:
            raise _err(
                f"expected a range value, got keyword {v[1]!r} "
                "(escape it to compare literally)", v[2])
        value = v[1]
        if v[0] != "quoted":
            num = _as_number(value)
            if num is not None:
                value = num
        key = {"<": "lt", "<=": "lte", ">": "gt", ">=": "gte"}[op]
        return {"range": {field: {key: value}}}

    # value_part := "*" | scalar | "(" value_expr ")"
    def value_part(self, field: str) -> dict:
        t = self.peek()
        if t is not None and t[:2] == ("op", "("):
            self.next()
            clause = self.value_expr(field)
            c = self.next()
            if c[:2] != ("op", ")"):
                raise _err(f"expected ')', got {c[1]!r}", c[2])
            return clause
        return self.value_scalar(field)

    def value_scalar(self, field: str) -> dict:
        v = self.next()
        if v[0] == "op":
            raise _err(f"expected a value after ':', got {v[1]!r}", v[2])
        if v[0] == "word" and v[1].lower() in _KEYWORDS:
            raise _err(
                f"expected a value, got keyword {v[1]!r} (escape it to "
                "match literally)", v[2])
        return _value_clause(field, v[0], v[1], v[2])

    # value_expr := value_and ("or" value_and)*   — same precedence as
    # the top level, each scalar bound to the shared field
    def value_expr(self, field: str) -> dict:
        parts = [self.value_and(field)]
        while self._is_kw(self.peek(), "or"):
            self.next()
            parts.append(self.value_and(field))
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts}}

    def value_and(self, field: str) -> dict:
        parts = [self.value_not(field)]
        while self._is_kw(self.peek(), "and"):
            self.next()
            parts.append(self.value_not(field))
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"must": parts}}

    def value_not(self, field: str) -> dict:
        if self._is_kw(self.peek(), "not"):
            self.next()
            return {"bool": {"must_not": [self.value_not(field)]}}
        t = self.peek()
        if t is not None and t[:2] == ("op", "("):
            self.next()
            inner = self.value_expr(field)
            c = self.next()
            if c[:2] != ("op", ")"):
                raise _err(f"expected ')', got {c[1]!r}", c[2])
            return inner
        return self.value_scalar(field)


def parse_kql(s: str) -> dict:
    """Parse a KQL string into a query-DSL dict (see module docstring).

    >>> parse_kql('lang:en and n_chars >= 100')
    {'bool': {'must': [{'match': {'lang': 'en'}}, \
{'range': {'n_chars': {'gte': 100}}}]}}
    """
    if not isinstance(s, str) or not s.strip():
        raise ValueError("KQL: query must be a non-empty string")
    toks = _lex(s)
    p = _Parser(toks, s)
    out = p.expr()
    t = p.peek()
    if t is not None:
        raise _err(f"trailing input {t[1]!r}", t[2])
    return out
