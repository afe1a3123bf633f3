"""ES query rules: the ``_query_rules`` management API and the ``rule``
query (ES 8.10+, ``x-pack`` search business rules; public API docs —
the reference repo at hive2es-offline has no query language, so parity
here is with live Elasticsearch, same as the rest of the DSL).

Semantics implemented:

- ``put_query_ruleset(ruleset_id, rules)`` stores a validated ruleset
  (the PUT ``_query_rules/<ruleset_id>`` shape): each rule is
  ``{rule_id, type: pinned|exclude, criteria: [...], actions: {ids |
  docs}}``.
- the ``rule`` query: ``{"rule": {"organic": Q, "ruleset_ids": [...],
  "match_criteria": {...}}}`` — criteria are evaluated against the
  query's literal ``match_criteria`` map, matched pinned rules promote
  their ids above every organic hit (in ruleset order, first occurrence
  wins), matched exclude rules remove their ids entirely.
- criteria types: ``always``, ``exact``, ``fuzzy`` (AUTO edit distance
  over OSA, the Lucene fuzziness ladder: <3 → 0, 3..5 → 1, >5 → 2),
  ``prefix``, ``suffix``, ``contains``, ``lt``/``lte``/``gt``/``gte``
  (numeric).  A rule matches when ALL its criteria match; a criterion
  matches when the metadata value matches ANY of its ``values``.

Spark-first shape — the load-bearing design point: rule evaluation
never touches the data.  ``match_criteria`` and the ruleset are literals
at plan-build time, so matching is pure driver-side Python, and the
``rule`` query REWRITES to the machinery that already exists:
``pinned`` (plans/scoring.py — constant scores above every BM25 value)
over a ``bool.must_not ids`` exclusion.  Zero new plan nodes, zero
shuffles, and at 100 TB the cost is identical to the organic query it
wraps.

Documented divergences from live ES (COVERAGE.md consolidated list):
- a doc that is both pinned and excluded by different matched rules is
  EXCLUDED (live ES applies rules in order with pinned-then-exclude
  interleaving that the public docs leave unspecified; exclusion
  winning is the conservative, deterministic reading).
- ``actions.docs`` entries pin by ``_id`` only (one frame per search
  here — there is no multi-index routing to disambiguate ``_index``).
"""
from __future__ import annotations

__all__ = [
    "put_query_ruleset", "get_query_ruleset", "delete_query_ruleset",
    "list_query_rulesets", "expand_rule_queries", "matched_rule_ids",
]

#: ruleset registry — cluster state stand-in, same pattern as the
#: analyzer registry (plans/analysis.py register_analyzer)
_RULESETS: dict[str, list[dict]] = {}

_RULE_TYPES = ("pinned", "exclude")
_CRITERIA_TYPES = ("always", "exact", "fuzzy", "prefix", "suffix",
                   "contains", "lt", "lte", "gt", "gte")
#: ES caps pinned docs per query at 100 and rulesets per rule query at 10
_MAX_PINNED = 100
_MAX_RULESETS = 10


def put_query_ruleset(ruleset_id: str, rules: list[dict]) -> None:
    """PUT ``_query_rules/<ruleset_id>`` — validate and store."""
    if not ruleset_id or not isinstance(ruleset_id, str):
        raise ValueError("ruleset_id must be a non-empty string")
    if not isinstance(rules, list) or not rules:
        raise ValueError("rules must be a non-empty list")
    seen_ids: set[str] = set()
    validated = []
    for rule in rules:
        unknown = set(rule) - {"rule_id", "type", "criteria", "actions"}
        if unknown:
            raise ValueError(f"unknown rule key(s): {sorted(unknown)}")
        rid = rule.get("rule_id")
        if not rid or not isinstance(rid, str):
            raise ValueError("every rule needs a string rule_id")
        if rid in seen_ids:
            raise ValueError(f"duplicate rule_id {rid!r}")
        seen_ids.add(rid)
        rtype = rule.get("type")
        if rtype not in _RULE_TYPES:
            raise ValueError(
                f"rule {rid!r}: type must be one of {_RULE_TYPES}, "
                f"got {rtype!r}")
        crits = rule.get("criteria")
        if not isinstance(crits, list) or not crits:
            raise ValueError(f"rule {rid!r}: criteria must be a "
                             "non-empty list")
        for c in crits:
            bad = set(c) - {"type", "metadata", "values"}
            if bad:
                raise ValueError(
                    f"rule {rid!r}: unknown criteria key(s): "
                    f"{sorted(bad)}")
            ctype = c.get("type")
            if ctype not in _CRITERIA_TYPES:
                raise ValueError(
                    f"rule {rid!r}: criteria type must be one of "
                    f"{_CRITERIA_TYPES}, got {ctype!r}")
            if ctype == "always":
                continue
            if not c.get("metadata"):
                raise ValueError(
                    f"rule {rid!r}: {ctype} criteria need a metadata key")
            vals = c.get("values")
            if not isinstance(vals, list) or not vals:
                raise ValueError(
                    f"rule {rid!r}: {ctype} criteria need a non-empty "
                    "values list")
            if ctype in ("lt", "lte", "gt", "gte"):
                for v in vals:
                    float(v)  # raises loudly on a non-numeric bound
        actions = rule.get("actions") or {}
        if set(actions) == {"ids"}:
            if not isinstance(actions["ids"], (list, tuple)):
                # a bare string would iterate character-by-character
                # into per-char doc ids (round-14 review)
                raise ValueError(
                    f"rule {rid!r}: actions.ids must be a list")
            ids = [str(v) for v in actions["ids"]]
        elif set(actions) == {"docs"}:
            if not isinstance(actions["docs"], (list, tuple)):
                raise ValueError(
                    f"rule {rid!r}: actions.docs must be a list")
            ids = [str(d["_id"]) for d in actions["docs"]]
        else:
            raise ValueError(
                f"rule {rid!r}: actions must hold exactly one of "
                "'ids' or 'docs'")
        if not ids:
            raise ValueError(f"rule {rid!r}: actions resolve to no ids")
        validated.append({"rule_id": rid, "type": rtype,
                          "criteria": crits, "_ids": ids})
    _RULESETS[ruleset_id] = validated


def get_query_ruleset(ruleset_id: str) -> list[dict]:
    if ruleset_id not in _RULESETS:
        raise KeyError(f"unknown query ruleset {ruleset_id!r}")
    return [{k: v for k, v in r.items()} for r in _RULESETS[ruleset_id]]


def delete_query_ruleset(ruleset_id: str) -> None:
    if ruleset_id not in _RULESETS:
        raise KeyError(f"unknown query ruleset {ruleset_id!r}")
    del _RULESETS[ruleset_id]


def list_query_rulesets() -> list[str]:
    return sorted(_RULESETS)


def _osa_distance(a: str, b: str, cap: int) -> int:
    """Optimal-string-alignment edit distance (the Lucene fuzzy metric:
    insert/delete/substitute/adjacent-transpose each cost 1), banded —
    returns cap+1 as soon as the distance must exceed ``cap``.  Literal
    vs literal at plan-build time; never runs against data."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev2: list[int] = []
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and ca == b[j - 2] and cb == a[i - 2]):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        if min(cur) > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[len(b)]


def _auto_fuzz(s: str) -> int:
    """Lucene AUTO fuzziness ladder (public docs): 0 for terms shorter
    than 3 chars, 1 for 3–5, 2 above."""
    n = len(s)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def _criterion_matches(c: dict, match_criteria: dict) -> bool:
    ctype = c["type"]
    if ctype == "always":
        return True
    key = c["metadata"]
    if key not in match_criteria:
        return False
    meta = match_criteria[key]
    vals = c["values"]
    if ctype in ("lt", "lte", "gt", "gte"):
        try:
            m = float(meta)
        except (TypeError, ValueError):
            return False
        ops = {"lt": m.__lt__, "lte": m.__le__,
               "gt": m.__gt__, "gte": m.__ge__}
        return any(ops[ctype](float(v)) for v in vals)
    m = str(meta).lower()
    svals = [str(v).lower() for v in vals]
    if ctype == "exact":
        return m in svals
    if ctype == "prefix":
        return any(m.startswith(v) for v in svals)
    if ctype == "suffix":
        return any(m.endswith(v) for v in svals)
    if ctype == "contains":
        return any(v in m for v in svals)
    # fuzzy — AUTO ladder keyed on the CRITERIA value (the "known" term)
    return any(
        _osa_distance(m, v, _auto_fuzz(v)) <= _auto_fuzz(v) for v in svals)


def matched_rule_ids(ruleset_ids, match_criteria,
                     what: str = "rule query",
                     ) -> tuple[list[str], list[str]]:
    """Evaluate the named rulesets against a literal ``match_criteria``
    map → ``(pinned_ids, excluded_ids)``, deduplicated in ruleset/rule
    order, exclusion winning over pinning, pinned capped at
    ``_MAX_PINNED`` (ES's pinned-query ceiling).  Pure driver-side
    Python — shared by the ``rule`` query rewrite and the ``rule``
    retriever (ES 8.16) so the two surfaces cannot drift."""
    if not ruleset_ids or not isinstance(ruleset_ids, list):
        raise ValueError(f"{what} needs a non-empty ruleset_ids list")
    if len(ruleset_ids) > _MAX_RULESETS:
        raise ValueError(
            f"{what} allows at most {_MAX_RULESETS} rulesets, "
            f"got {len(ruleset_ids)}")
    if not isinstance(match_criteria, dict) or not match_criteria:
        raise ValueError(f"{what} needs a non-empty match_criteria map")
    pinned: list[str] = []
    excluded: list[str] = []
    for rsid in ruleset_ids:
        if rsid not in _RULESETS:
            raise ValueError(f"unknown query ruleset {rsid!r}")
        for rule in _RULESETS[rsid]:
            if not all(_criterion_matches(c, match_criteria)
                       for c in rule["criteria"]):
                continue
            sink = pinned if rule["type"] == "pinned" else excluded
            for i in rule["_ids"]:
                if i not in sink:
                    sink.append(i)
    pinned = [i for i in pinned if i not in excluded][:_MAX_PINNED]
    return pinned, excluded


def _expand_one(spec: dict) -> dict:
    unknown = set(spec) - {"organic", "ruleset_ids", "ruleset_id",
                           "match_criteria"}
    if unknown:
        raise ValueError(f"unknown rule query key(s): {sorted(unknown)}")
    if "organic" not in spec:
        raise ValueError("rule query needs an organic query")
    # ES 8.10 shipped singular ruleset_id; 8.15 the ruleset_ids list
    rsids = spec.get("ruleset_ids")
    if rsids is None:
        rsids = [spec["ruleset_id"]] if "ruleset_id" in spec else None
    pinned, excluded = matched_rule_ids(rsids, spec.get("match_criteria"))

    organic = spec["organic"]
    if excluded:
        organic = {"bool": {"must": [organic],
                            "must_not": [{"ids": {"values": excluded}}]}}
    if pinned:
        return {"pinned": {"ids": pinned, "organic": organic}}
    return organic


def expand_rule_queries(q):
    """Recursive pre-pass over a query tree: replace every ``rule``
    node with its pinned/bool rewrite.  Pure dict→dict at plan-build
    time; called from both search entries before any compiler walks the
    tree, so neither walker ever sees the ``rule`` kind."""
    if isinstance(q, list):
        return [expand_rule_queries(c) for c in q]
    if not isinstance(q, dict):
        return q
    if len(q) == 1 and "rule" in q:
        return expand_rule_queries(_expand_one(q["rule"]))
    return {k: expand_rule_queries(v) for k, v in q.items()}
