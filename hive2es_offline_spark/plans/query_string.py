"""Lucene ``query_string`` / ``simple_query_string`` mini-syntax parser.

The reference publishes its loaded index behind an alias
(``ESClient.java:154-170``) where consumers type Lucene query strings into
Kibana / the ``q=`` parameter — the single most-used ES entry point.  This
module parses that syntax into the ES query-DSL dict shapes that
``plans/query_dsl.py`` already compiles, so a query string costs exactly
what the equivalent structured body costs (one boolean Column, Catalyst
pushdown intact) and needs zero new execution machinery.

Supported ``query_string`` syntax:

- ``field:value`` term lookup (analyzed containment → ``match``), bare
  values against ``default_field`` / ``fields``
- quoted phrases ``field:"a b"`` → ``match_phrase``
- ``AND`` / ``OR`` / ``NOT`` (and ``&&`` / ``||`` / ``!``), parentheses,
  with Lucene precedence (OR lowest, then AND, then NOT)
- ``+required`` / ``-prohibited`` prefixes
- wildcards ``te?t`` / ``tes*`` → ``wildcard``; fuzzy ``term~`` /
  ``term~1`` → ``fuzzy``; boosts ``term^2`` (recorded in the clause for
  the scored path, ignored in filter context like every boost)
- ranges ``[a TO b]`` / ``{a TO b}`` (mixed brackets, ``*`` = unbounded)
  and one-sided ``field:>5`` / ``>=`` / ``<`` / ``<=``
- ``_exists_:field``

Unsupported Lucene constructs raise ``ValueError`` naming the construct
(``/regex/`` literals, proximity ``"a b"~2``, group boosts) — loud
rejection, never silent misparse.

``simple_query_string`` is the reduced grammar: ``+`` (AND), ``|`` (OR),
``-`` (negate), quoted phrases, trailing ``*`` (prefix), parentheses —
no field:term syntax (fields come from the ``fields`` option), no ranges.
"""

from __future__ import annotations

import re

__all__ = ["parse_query_string", "parse_simple_query_string"]

# ---------------------------------------------------------------------------
# lexer (shared): char-level so quotes/brackets bind tighter than whitespace
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s+                                   # whitespace (dropped)
  | "(?P<phrase>(?:[^"\\]|\\.)*)"         # quoted phrase
  | \[(?P<brange>[^\]]*)\]                # inclusive range body
  | \{(?P<crange>[^}]*)\}                 # exclusive range body
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<op>&&|\|\||[+\-!|])               # operators
  | (?P<word>(?:[^\s()\[\]{}"+\-!|^~:\\/]|\\.)    # bare word: '-' is the
             (?:[^\s()\[\]{}"+!|^~:\\/]|\\.)*)    # prohibit operator only at
                                                  # term START (Lucene) — a
                                                  # mid-word '-' (2024-01-01,
                                                  # foo-bar) stays in the term.
                                                  # \-escapes kept; / excluded:
                                                  # regex literal delimiter,
                                                  # unsupported
  | (?P<colon>:)
  | (?P<boost>\^\d+(?:\.\d+)?)
  | (?P<fuzz>~\d*(?:\.\d+)?)
  | (?P<bad>.)
    """,
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    for m in _TOKEN_RE.finditer(s):
        kind = m.lastgroup
        if kind is None:
            continue  # whitespace
        text = m.group(kind)
        if kind == "bad":
            raise ValueError(
                f"query_string: unsupported character {text!r} at offset "
                f"{m.start()} (regex literals /…/ and escapes beyond \\x are "
                "not supported)"
            )
        toks.append((kind, text))
    return toks


def _unescape(w: str) -> str:
    return re.sub(r"\\(.)", r"\1", w)


def _range_bounds(body: str) -> tuple[str, str]:
    parts = re.split(r"\s+TO\s+", body.strip())
    if len(parts) != 2:
        raise ValueError(f"query_string: malformed range [{body}] — need 'lo TO hi'")
    return parts[0].strip(), parts[1].strip()


def _num_or_str(v: str):
    """Range endpoints: numbers stay numeric so Catalyst compares
    numerically; everything else (dates, words) stays a string."""
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return _unescape(v)


# ---------------------------------------------------------------------------
# query_string recursive-descent parser
# ---------------------------------------------------------------------------


class _QSParser:
    def __init__(self, toks: list[tuple[str, str]], default_fields: list,
                 default_operator: str):
        self.toks = toks
        self.i = 0
        self.default_fields = default_fields
        self.default_op = default_operator.lower()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # grammar: or_expr := and_expr ((OR| '|') and_expr)*
    #          and_expr := seq (AND seq)*
    #          seq := prefixed+            # adjacency -> default_operator
    #          prefixed := [+|-|NOT|!] primary
    #          primary := '(' or_expr ')' | clause
    def parse(self) -> dict:
        out = self.or_expr()
        if self.peek()[0] is not None:
            raise ValueError(
                f"query_string: unexpected trailing token {self.peek()[1]!r}"
            )
        return out

    def or_expr(self) -> dict:
        parts = [self.and_expr()]
        while self._eat_kw("OR") or self._eat_op("||"):
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    def and_expr(self) -> dict:
        parts = [self.seq()]
        while self._eat_kw("AND") or self._eat_op("&&"):
            parts.append(self.seq())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"must": parts}}

    def seq(self) -> dict:
        """Adjacent clauses with no explicit operator: Lucene groups them
        into one bool — ``+``/``-`` prefixes force must/must_not, the rest
        follow ``default_operator`` (should for OR, must for AND)."""
        items: list[tuple[str, dict]] = [self.prefixed()]
        while True:
            kind, text = self.peek()
            if kind == "word" and text in ("AND", "OR"):
                break  # explicit operators end the adjacency run
            if kind in ("phrase", "brange", "crange", "lparen", "word") or (
                kind == "op" and text in ("+", "-", "!")
            ):
                items.append(self.prefixed())
            else:
                break
        if len(items) == 1 and items[0][0] == "plain":
            return items[0][1]
        must, must_not, should = [], [], []
        for mode, clause in items:
            if mode == "must":
                must.append(clause)
            elif mode == "must_not":
                must_not.append(clause)
            elif self.default_op == "and":
                must.append(clause)
            else:
                should.append(clause)
        b: dict = {}
        if must:
            b["must"] = must
        if must_not:
            b["must_not"] = must_not
        if should:
            b["should"] = should
            # Lucene: bare should terms are optional once a +must exists,
            # required-one otherwise — same default the bool compiler uses,
            # but pin it so prohibit-only queries ({-a b} shapes) match ES
            b["minimum_should_match"] = 0 if must else 1
        return {"bool": b}

    def prefixed(self) -> tuple[str, dict]:
        kind, text = self.peek()
        if kind == "op" and text == "+":
            self.next()
            return ("must", self.primary())
        if kind == "op" and text in ("-", "!"):
            self.next()
            return ("must_not", self.primary())
        if kind == "word" and text == "NOT":
            self.next()
            return ("must_not", self.primary())
        return ("plain", self.primary())

    def _eat_kw(self, kw: str) -> bool:
        kind, text = self.peek()
        if kind == "word" and text == kw:
            self.next()
            return True
        return False

    def _eat_op(self, op: str) -> bool:
        kind, text = self.peek()
        if kind == "op" and text == op:
            self.next()
            return True
        return False

    def primary(self) -> dict:
        kind, text = self.next()
        if kind == "lparen":
            inner = self.or_expr()
            k2, _ = self.next()
            if k2 != "rparen":
                raise ValueError("query_string: unbalanced parenthesis")
            if self.peek()[0] == "boost":
                raise ValueError(
                    "query_string: boost on a group (…)^n is not supported"
                )
            return inner
        if kind == "word":
            # field:value?
            if self.peek()[0] == "colon":
                self.next()
                field = _unescape(text)
                if field == "_exists_":
                    k2, v2 = self.next()
                    if k2 != "word":
                        raise ValueError("query_string: _exists_: needs a field name")
                    return {"exists": {"field": _unescape(v2)}}
                if self.peek()[0] == "lparen":
                    # field-scoped group: field:(a OR "b c" -d) — every bare
                    # value inside targets `field` (Lucene's field scoping)
                    self.next()
                    saved = self.default_fields
                    self.default_fields = [field]
                    try:
                        inner = self.or_expr()
                    finally:
                        self.default_fields = saved
                    k2, _ = self.next()
                    if k2 != "rparen":
                        raise ValueError("query_string: unbalanced parenthesis")
                    return inner
                return self.value_clause([field])
            # bare value against the default field(s)
            self.i -= 1
            if not self.default_fields:
                raise ValueError(
                    "query_string: bare term with no default_field/fields "
                    f"option: {text!r}"
                )
            return self.value_clause(list(self.default_fields))
        if kind in ("phrase", "brange", "crange"):
            self.i -= 1
            if not self.default_fields:
                raise ValueError(
                    "query_string: bare value with no default_field/fields option"
                )
            return self.value_clause(list(self.default_fields))
        raise ValueError(f"query_string: unexpected token {text!r}")

    def value_clause(self, fields: list) -> dict:
        """One value (term/phrase/range/comparison) against ``fields``,
        with trailing ``^boost`` / ``~fuzziness`` modifiers."""
        kind, text = self.next()
        clause: dict | None = None
        fuzz_ok = False
        if kind == "phrase":
            phrase = _unescape(text)
            if self.peek()[0] == "fuzz":
                raise ValueError(
                    'query_string: phrase proximity "…"~n is not supported'
                )
            clause = self._per_field(
                fields, lambda f, b: {"match_phrase": {f: {"query": phrase, **b}}}
            )
        elif kind in ("brange", "crange"):
            lo, hi = _range_bounds(text)
            lo_op = "gte" if kind == "brange" else "gt"
            hi_op = "lte" if kind == "brange" else "lt"
            spec = {}
            if lo != "*":
                spec[lo_op] = _num_or_str(lo)
            if hi != "*":
                spec[hi_op] = _num_or_str(hi)
            if not spec:
                raise ValueError("query_string: range [* TO *] is empty")
            clause = self._per_field(fields, lambda f, b: {"range": {f: {**spec, **b}}})
        elif kind == "word":
            value = text
            # one-sided comparison: field:>5, field:<=2024-01-01
            m = re.match(r"^(>=|<=|>|<)(.+)$", value)
            if m:
                op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[m.group(1)]
                clause = self._per_field(
                    fields,
                    lambda f, b: {"range": {f: {op: _num_or_str(m.group(2)), **b}}},
                )
            elif re.search(r"(?<!\\)[*?]", value):  # unescaped wildcard chars
                pat = _unescape(value)
                clause = self._per_field(
                    fields, lambda f, b: {"wildcard": {f: {"value": pat, **b}}}
                )
            else:
                word = _unescape(value)
                fuzz_ok = True
                if self.peek()[0] == "fuzz":
                    _, ftext = self.next()
                    fz = ftext[1:]
                    fuzziness = "AUTO" if fz == "" else int(float(fz))
                    clause = self._per_field(
                        fields,
                        lambda f, b: {
                            "fuzzy": {f: {"value": word, "fuzziness": fuzziness, **b}}
                        },
                    )
                else:
                    clause = self._per_field(
                        fields, lambda f, b: {"match": {f: {"query": word, **b}}}
                    )
        else:
            raise ValueError(f"query_string: unexpected value token {text!r}")
        if self.peek()[0] == "boost":
            _, btext = self.next()
            clause = _with_boost(clause, float(btext[1:]))
        if self.peek()[0] == "fuzz" and not fuzz_ok:
            raise ValueError(
                "query_string: ~fuzziness applies to bare terms only"
            )
        return clause

    @staticmethod
    def _per_field(fields: list, make) -> dict:
        clauses = []
        for f in fields:
            f = str(f)
            boost = {}
            if "^" in f:  # fields option per-field boost: ["title^2"]
                f, _, b = f.partition("^")
                boost = {"boost": float(b)}
            clauses.append(make(f, boost))
        if len(clauses) == 1:
            return clauses[0]
        return {"bool": {"should": clauses, "minimum_should_match": 1}}


def _with_boost(clause: dict, boost: float) -> dict:
    (kind, body), = clause.items()
    if kind == "bool":  # multi-field expansion: boost each leaf
        return {
            "bool": {
                **body,
                "should": [_with_boost(c, boost) for c in body.get("should", [])],
            }
        }
    (field, spec), = body.items()
    if not isinstance(spec, dict):
        spec = {"value": spec}
    # a term-level ^n COMPOSES with a per-field boost from the fields
    # option (ES multiplies them: `term^3` against `title^2` scores 6x) —
    # overwriting dropped the field boost (ADVICE r8)
    return {kind: {field: {**spec,
                           "boost": float(spec.get("boost", 1.0)) * boost}}}


def parse_query_string(spec: dict) -> dict:
    """``{"query": "...", "default_field"/"fields", "default_operator"}``
    → an ES query-DSL dict for ``compile_query``."""
    q = spec["query"]
    fields = spec.get("fields") or (
        [spec["default_field"]] if spec.get("default_field") else []
    )
    parser = _QSParser(
        _lex(q), fields, str(spec.get("default_operator", "or"))
    )
    return parser.parse()


# ---------------------------------------------------------------------------
# simple_query_string
# ---------------------------------------------------------------------------


class _SQSParser(_QSParser):
    """Reduced grammar, matching ES's SimpleQueryParser semantics: ``+``
    is the INFIX AND operator (``a + b`` requires both — it is NOT a
    Lucene must-prefix), ``|`` is infix OR, ``-`` prefixes a negation
    (lifted to its group like Lucene's MUST_NOT), quoted phrases,
    trailing ``*`` = prefix query (``*``/``?`` anywhere else are LITERAL
    characters in SQS), parentheses.  No field:value, no ranges, no
    fuzzy/boost modifiers.  Whitespace joins operands with
    ``default_operator`` at that operator's precedence level (``+``
    binds tighter than ``|``)."""

    def or_expr(self) -> dict:
        groups = [self.and_group()]
        while True:
            if self._eat_op("|"):
                groups.append(self.and_group())
            elif self.default_op == "or" and self._at_operand():
                groups.append(self.and_group())
            else:
                break
        if len(groups) == 1:
            mode, clause = groups[0]
            if mode == "plain":
                return clause
            return {"bool": {"must_not": [clause]}}
        should = [c for m, c in groups if m == "plain"]
        must_not = [c for m, c in groups if m == "must_not"]
        b: dict = {}
        if should:
            b["should"] = should
            b["minimum_should_match"] = 1
        if must_not:
            b["must_not"] = must_not
        return {"bool": b}

    def and_group(self) -> tuple[str, dict]:
        """Operands joined by ``+`` (or whitespace under
        default_operator=and); returns (mode, clause) — mode 'must_not'
        when the whole group is a single negation, so the caller lifts it
        to ITS bool (Lucene's MUST_NOT placement)."""
        items = [self.operand()]
        while True:
            if self._eat_op("+"):
                items.append(self.operand())
            elif self.default_op == "and" and self._at_operand():
                items.append(self.operand())
            else:
                break
        if len(items) == 1:
            return items[0]
        must = [c for m, c in items if m == "plain"]
        must_not = [c for m, c in items if m == "must_not"]
        b: dict = {}
        if must:
            b["must"] = must
        if must_not:
            b["must_not"] = must_not
        return ("plain", {"bool": b})

    def _at_operand(self) -> bool:
        kind, text = self.peek()
        return kind in ("phrase", "lparen", "word") or (
            kind == "op" and text == "-"
        )

    def operand(self) -> tuple[str, dict]:
        kind, text = self.peek()
        while kind == "op" and text == "+":
            # dangling '+' (leading, or doubled): SQS degrades gracefully
            # rather than erroring — skip it
            self.next()
            kind, text = self.peek()
        if kind == "op" and text == "-":
            self.next()
            return ("must_not", self.primary())
        return ("plain", self.primary())

    def primary(self) -> dict:
        kind, text = self.next()
        if kind == "lparen":
            inner = self.or_expr()
            k2, _ = self.next()
            if k2 != "rparen":
                raise ValueError("simple_query_string: unbalanced parenthesis")
            return inner
        if kind == "phrase":
            phrase = _unescape(text)
            return self._per_field(
                self.default_fields,
                lambda f, b: {"match_phrase": {f: {"query": phrase, **b}}},
            )
        if kind == "word":
            if self.peek()[0] == "colon":
                raise ValueError(
                    "simple_query_string has no field:value syntax — use the "
                    "'fields' option"
                )
            if text.endswith("*") and not text.endswith(r"\*"):
                # ONLY a trailing * is special in SQS; */? anywhere else
                # are literal characters (unlike query_string)
                stem = _unescape(text[:-1])
                return self._per_field(
                    self.default_fields,
                    lambda f, b: {"prefix": {f: {"value": stem, **b}}},
                )
            word = _unescape(text)
            return self._per_field(
                self.default_fields,
                lambda f, b: {"match": {f: {"query": word, **b}}},
            )
        raise ValueError(f"simple_query_string: unexpected token {text!r}")


def parse_simple_query_string(spec: dict) -> dict:
    """``{"query": "...", "fields": [...], "default_operator"}`` → ES
    query-DSL dict."""
    fields = spec.get("fields")
    if not fields:
        raise ValueError("simple_query_string needs the 'fields' option")
    parser = _SQSParser(
        _lex(spec["query"]), list(fields),
        str(spec.get("default_operator", "or")),
    )
    return parser.parse()
