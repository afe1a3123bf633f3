"""Relevance-scored search: a ``_score`` pipeline over the query DSL.

The reference loads a live index consumers query with RANKED searches
(``ESClient.java:154-170`` — the alias serves ordinary ``match`` queries,
which Lucene scores with BM25).  ``plans/query_dsl.py`` is filter-context
only; this module adds the score context on top of the same clause
compilers:

- ``match`` / ``multi_match`` / ``match_phrase`` score with Lucene's BM25
  (the exact formula of ``operators/retrieval.py:38``; multi_match is
  best_fields — max over per-field scores + ``tie_breaker``; match_phrase
  scores its terms gated on the phrase actually matching — live ES uses
  position-aware phrase freq, a documented approximation),
- ``term`` scores idf (the exact BM25 value for a keyword posting:
  tf=1, dl=avgdl ⇒ score = idf),
- match/multi_match ``fuzziness`` widens the HIT SET (the predicate
  fuzzy-matches) but scoring stays exact-term BM25: a doc matched only
  fuzzily is a hit with score 0.0 and ranks last — a documented
  approximation (live ES scales BM25 by edit distance per fuzzy
  expansion, which needs per-expansion df the flat frame doesn't
  carry),
- structural clauses (``range`` / ``exists`` / ``wildcard`` / ``prefix``
  / ``ids`` / ``fuzzy`` / ``regexp`` / geo) contribute the constant 1.0
  exactly like live ES's filter-to-query rewrite,
- ``bool`` sums must + matching should (filter / must_not contribute 0),
- ``constant_score`` yields its boost, ``dis_max`` the max of child
  scores plus ``tie_breaker`` times the rest,
- ``function_score`` transforms the inner score: ``field_value_factor``
  (all ES modifiers), ``gauss``/``exp``/``linear`` decay on
  numeric/date/geo fields, seeded ``random_score``, and ``weight``
  functions with optional per-function ``filter``, combined by
  ``score_mode`` and applied by ``boost_mode``,
- ``boosting`` demotes (never excludes) negative-query matches by
  ``negative_boost``,
- ``script_score`` (query and function_score function) computes the
  score from the Painless arithmetic subset (doc refs, params, Math.*)
  with ``_score`` bound to the inner query's score — all codegen,
- ``rescore`` re-ranks the top window with a second query (corpus-wide
  stats for both, TakeOrderedAndProject window cut),
- a body with ``knn`` retrieves the UNION of query matches and the
  exact-cosine top-k, summing BM25 and ``(1 + cos) / 2`` (ES 8 combined
  retrieval; knn-only bodies return exactly the top-k).

Scale shape (100 TB corpus): ONE tokenize+explode pass per scored text
field, filtered to the query's terms map-side before the only full-width
shuffle (the per-(doc, term) tf aggregate — carries query-term hits only);
corpus stats (N, avgdl, per-term df, per-keyword-leaf df) reduce to
broadcast-size frames; per-doc term partials come back as ONE map column
per field (one shuffle join on the id), and the whole score expression
tree is then plain codegen over that map.  No per-clause scans, no Python.

Determinism: per-(doc, term) partials are rounded to 6 decimals (same as
``bm25_topk``), fixed-shape expression sums, final ``_score`` rounded to
6 — an ANSI-SQL oracle reproduces the exact values.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import analyze_col
from .analysis import analyze_text as _analyze_terms
from .query_dsl import compile_query

__all__ = ["es_scored_search", "es_retriever_search", "score_frame",
           "with_shared_analysis", "sparse_tf_vector"]


def sparse_tf_vector(text, analyzer: str | None = None):
    """Term-frequency sparse vector (``map<token,double>``) from a text
    column — the honest doc-side encoder for the ``sparse_vector``
    query when the corpus has no model-produced (ELSER) expansions:
    weight(t) = tf(t) over the analyzed stream.

    Scale shape: the analyzed token array is LET-BOUND so the analysis
    chain evaluates ONCE per row (the r13 slice-in-HOF lesson), then
    the map builds via array_distinct + a counting filter — all codegen
    higher-order functions, no UDF, no shuffle; O(distinct × len)
    comparisons per row on in-register tokens."""
    from .analysis import let_cols

    toks = analyze_col(text,
                       analyzer)
    return let_cols([toks], lambda ts: F.map_from_entries(
        F.transform(
            F.array_distinct(ts[0]),
            lambda t: F.struct(
                t.alias("key"),
                F.size(F.filter(ts[0], lambda x: x == t))
                .cast("double").alias("value")))))

#: clauses that score as the constant 1.0 when they match (ES's
#: filter-to-query rewrite wraps them in a constant score)
_CONSTANT_ONE_KINDS = {
    "range", "exists", "wildcard", "prefix", "ids", "fuzzy", "regexp",
    "terms", "terms_set", "geo_distance", "geo_bounding_box", "nested",
    "match_phrase_prefix", "intervals",
    "span_term", "span_or", "span_near", "span_first", "span_not",
}


def _normalize(q: dict) -> dict:
    """Expand query_string/simple_query_string into plain clause trees so
    the collector and the score builder see one grammar."""
    (kind, body), = q.items()
    if kind == "wrapper":
        import base64 as _b64
        import json as _json

        raw = body["query"] if isinstance(body, dict) else body
        return _normalize(_json.loads(_b64.b64decode(str(raw))))
    if kind == "query_string":
        from .query_string import parse_query_string

        return _normalize(parse_query_string(body))
    if kind == "simple_query_string":
        from .query_string import parse_simple_query_string

        return _normalize(parse_simple_query_string(body))
    if kind == "bool":
        out = {}
        for sec in ("must", "filter", "should", "must_not"):
            subs = body.get(sec)
            if subs is None:
                continue
            subs = subs if isinstance(subs, list) else [subs]
            out[sec] = [_normalize(c) for c in subs]
        for k in ("minimum_should_match",):
            if k in body:
                out[k] = body[k]
        return {"bool": out}
    if kind == "constant_score":
        return {"constant_score": {**body, "filter": _normalize(body["filter"])}}
    if kind == "dis_max":
        return {"dis_max": {**body, "queries": [_normalize(c) for c in body["queries"]]}}
    if kind == "function_score":
        out = dict(body)
        out["query"] = _normalize(body.get("query", {"match_all": {}}))
        return {"function_score": out}
    if kind == "pinned":
        return {"pinned": {**body, "organic": _normalize(body["organic"])}}
    if kind == "boosting":
        return {"boosting": {**body,
                             "positive": _normalize(body["positive"]),
                             "negative": _normalize(body["negative"])}}
    if kind == "script_score":
        return {"script_score": {
            **body, "query": _normalize(body.get("query", {"match_all": {}}))}}
    return q


class _ScoreCompiler:
    """Two-pass walk of a normalized query tree: ``collect`` gathers the
    BM25 text-field terms and keyword-idf leaves; after the caller joins
    the per-field term-score maps and the idf stats row, ``build`` emits
    the score Column."""

    def __init__(self, id_field: str):
        self.id_field = id_field
        self.field_terms: dict[str, set[str]] = {}   # text field -> terms
        self.term_leaves: list[tuple[str, object]] = []  # (field, value)
        #: cross_fields groups: (fields-tuple, sorted-terms-tuple) — each
        #: gets blended-df maps ``_xfmap_<gi>_<field>`` from score_frame
        self.xf_groups: list[tuple[tuple[str, ...], tuple[str, ...]]] = []
        #: combined_fields groups: (fields, boosts, sorted terms) — each
        #: gets ONE BM25F map ``_cfmap_<gi>`` from score_frame
        self.cf_groups: list[
            tuple[tuple[str, ...], tuple[float, ...], tuple[str, ...]]
        ] = []

    # -- pass 1 -------------------------------------------------------------
    def collect(self, q: dict) -> None:
        (kind, body), = q.items()
        if kind in ("match", "match_phrase"):
            field, raw = next(iter(body.items()))
            query = raw["query"] if isinstance(raw, dict) else raw
            self.field_terms.setdefault(field, set()).update(
                _analyze_terms(str(query))
            )
        elif kind == "multi_match":
            mm_type = str(body.get("type", "best_fields"))
            terms = _analyze_terms(str(body["query"]))
            if mm_type == "cross_fields":
                # term-centric: one blended-df map group, not per-field
                # plain maps (per-field idf would break cross-field
                # score comparability — the point of df blending)
                from .query_dsl import _split_field_boosts

                flds = tuple(_split_field_boosts(body["fields"])[0])
                key = (flds, tuple(sorted(set(terms))))
                if key[1] and key not in self.xf_groups:
                    self.xf_groups.append(key)
            elif mm_type == "bool_prefix":
                # only the full terms score BM25; the trailing prefix is
                # a constant-score clause (Lucene prefix rewrite).  A
                # search_as_you_type shingle subfield collects SHINGLE
                # terms (its own "analyzer"), round 13
                from .analysis import sayt_subfield, shingle_terms

                for f in body["fields"]:
                    fname = str(f).partition("^")[0]
                    sub = sayt_subfield(fname)
                    ft = (shingle_terms(terms, sub[1]) if sub is not None
                          else terms)
                    full = list(dict.fromkeys(ft[:-1])) if ft else []
                    self.field_terms.setdefault(fname, set()).update(full)
            else:
                for f in body["fields"]:
                    self.field_terms.setdefault(
                        str(f).partition("^")[0], set()).update(terms)
        elif kind == "match_bool_prefix":
            from .analysis import sayt_subfield, shingle_terms

            field, raw = next(iter(body.items()))
            query = raw["query"] if isinstance(raw, dict) else raw
            terms = _analyze_terms(str(query))
            sub = sayt_subfield(field)
            if sub is not None:
                terms = shingle_terms(terms, sub[1])
            if len(terms) > 1:
                self.field_terms.setdefault(field, set()).update(terms[:-1])
        elif kind == "combined_fields":
            from .query_dsl import _split_field_boosts

            flds, boosts = _split_field_boosts(body["fields"], min_boost=1.0)
            terms = tuple(sorted(set(_analyze_terms(str(body["query"])))))
            key = (tuple(flds), tuple(boosts), terms)
            if terms and key not in self.cf_groups:
                self.cf_groups.append(key)
        elif kind == "term":
            field, raw = next(iter(body.items()))
            value = raw["value"] if isinstance(raw, dict) else raw
            if (field, value) not in self.term_leaves:
                self.term_leaves.append((field, value))
        elif kind == "bool":
            for sec in ("must", "should"):
                for c in body.get(sec, []):
                    self.collect(c)
            # filter / must_not never contribute score — nothing to collect
        elif kind == "constant_score":
            pass  # inner filter scores 0; only the boost surfaces
        elif kind == "dis_max":
            for c in body["queries"]:
                self.collect(c)
        elif kind == "function_score":
            self.collect(body["query"])
        elif kind == "script_score":
            self.collect(body["query"])
        elif kind == "pinned":
            self.collect(body["organic"])
        elif kind == "boosting":
            self.collect(body["positive"])
            # the negative query is only a gate — its own score is unused
        elif kind == "knn":
            raise ValueError(
                "knn has its own scored path in es_search — not valid here"
            )

    # -- pass 2 -------------------------------------------------------------
    def build(self, q: dict) -> Column:
        (kind, body), = q.items()
        pred = F.coalesce(compile_query(q, self.id_field), F.lit(False))
        if kind == "match_all":
            return F.lit(float(body.get("boost", 1.0)))
        if kind == "match":
            field, raw = next(iter(body.items()))
            spec = raw if isinstance(raw, dict) else {"query": raw}
            boost = float(spec.get("boost", 1.0))
            return F.when(pred, self._bm25(field, str(spec["query"])) * boost
                          ).otherwise(F.lit(0.0))
        if kind == "match_phrase":
            field, raw = next(iter(body.items()))
            spec = raw if isinstance(raw, dict) else {"query": raw}
            boost = float(spec.get("boost", 1.0))
            return F.when(pred, self._bm25(field, str(spec["query"])) * boost
                          ).otherwise(F.lit(0.0))
        if kind == "match_bool_prefix":
            # bool of term queries + trailing prefix: the full terms sum
            # their BM25 partials; the prefix clause contributes the
            # constant 1.0 when it matches (Lucene's constant-score
            # prefix rewrite), all gated on the clause's own predicate
            from .analysis import (
                preanalyzed_stream,
                sayt_subfield,
                shingle_col,
                shingle_terms,
            )

            field, raw = next(iter(body.items()))
            spec = raw if isinstance(raw, dict) else {"query": raw}
            boost = float(spec.get("boost", 1.0))
            terms = _analyze_terms(str(spec["query"]))
            sub = sayt_subfield(field)
            if sub is not None:
                # search_as_you_type shingle subfield (round 13): both
                # the scored terms and the prefix clause read shingles
                terms = shingle_terms(terms, sub[1])
            if not terms:
                return F.when(pred, F.lit(boost)).otherwise(F.lit(0.0))
            full = list(dict.fromkeys(terms[:-1]))
            root = sub[0] if sub is not None else field
            pre = preanalyzed_stream(root)
            toks = F.coalesce(
                pre if pre is not None else analyze_col(root),
                F.lit([]).cast("array<string>"))
            if sub is not None:
                toks = shingle_col(toks, sub[1])
            last = terms[-1]
            prefix = F.exists(toks, lambda x: x.startswith(last))
            score = (self._bm25_terms(field, full)
                     + F.when(prefix, F.lit(1.0)).otherwise(F.lit(0.0)))
            return F.when(pred, score * boost).otherwise(F.lit(0.0))
        if kind == "multi_match":
            boost = float(body.get("boost", 1.0))
            tie = float(body.get("tie_breaker", 0.0))
            mm_type = str(body.get("type", "best_fields"))
            if mm_type == "cross_fields":
                # term-centric scoring over the blended-df maps: per term,
                # dismax across the group's fields (+ tie_breaker times
                # the rest, per-field boosts applied to each field's
                # score), then the per-term contributions sum — rounded
                # to 6 and DECIMAL-added so the total is order-
                # independent and oracle-reproducible
                from .query_dsl import _split_field_boosts

                flds, boosts = _split_field_boosts(body["fields"])
                terms = sorted(set(_analyze_terms(str(body["query"]))))
                if not terms:
                    return F.when(pred, F.lit(boost)).otherwise(F.lit(0.0))
                gi = self.xf_groups.index((tuple(flds), tuple(terms)))
                total: Column = F.lit(0).cast("decimal(28,6)")
                for t in terms:
                    per_f = [
                        F.coalesce(
                            F.col(f"_xfmap_{gi}_{f}").getItem(t), F.lit(0.0)
                        ) * F.lit(fb)
                        for f, fb in zip(flds, boosts)
                    ]
                    best = F.greatest(*per_f) if len(per_f) > 1 else per_f[0]
                    if tie and len(per_f) > 1:
                        tsum = per_f[0]
                        for p in per_f[1:]:
                            tsum = tsum + p
                        best = best + F.lit(tie) * (tsum - best)
                    total = total + F.round(best, 6).cast("decimal(28,6)")
                return F.when(pred, total.cast("double") * F.lit(boost)
                              ).otherwise(F.lit(0.0))
            per = []
            for f in body["fields"]:
                f2, _, fb = str(f).partition("^")
                fboost = float(fb) if fb else 1.0
                if mm_type in ("best_fields", "most_fields"):
                    spec = {"query": body["query"],
                            "operator": body.get("operator", "or"),
                            "boost": fboost}
                    for k in ("minimum_should_match", "fuzziness",
                              "zero_terms_query"):
                        if k in body:
                            spec[k] = body[k]
                    sub = {"match": {f2: spec}}
                elif mm_type == "phrase":
                    spec = {"query": body["query"], "boost": fboost}
                    if "slop" in body:
                        spec["slop"] = body["slop"]
                    sub = {"match_phrase": {f2: spec}}
                elif mm_type == "phrase_prefix":
                    # constant-one clause (ES scores prefix phrases with
                    # position data the engine approximates away)
                    sub = {"match_phrase_prefix": {f2: {"query": body["query"],
                                                        "boost": fboost}}}
                elif mm_type == "bool_prefix":
                    spec = {"query": body["query"],
                            "operator": body.get("operator", "or"),
                            "boost": fboost}
                    if "minimum_should_match" in body:
                        spec["minimum_should_match"] = body["minimum_should_match"]
                    sub = {"match_bool_prefix": {f2: spec}}
                else:
                    raise ValueError(
                        f"unsupported multi_match type: {mm_type!r} "
                        "(best_fields | most_fields | phrase | phrase_prefix"
                        " | cross_fields | bool_prefix)"
                    )
                per.append(self.build(sub))
            if mm_type in ("most_fields", "bool_prefix"):
                # most_fields and bool_prefix SUM the per-field scores
                # (ES's Type enum groups both with tieBreaker 1.0);
                # tie_breaker applies to the best_fields family only
                total = per[0]
                for p in per[1:]:
                    total = total + p
                return total * F.lit(boost)
            best = F.greatest(*per) if len(per) > 1 else per[0]
            if tie and len(per) > 1:
                total = per[0]
                for p in per[1:]:
                    total = total + p
                best = best + F.lit(tie) * (total - best)
            return best * F.lit(boost)
        if kind == "term":
            field, raw = next(iter(body.items()))
            value = raw["value"] if isinstance(raw, dict) else raw
            boost = float(raw.get("boost", 1.0)) if isinstance(raw, dict) else 1.0
            i = self.term_leaves.index((field, value))
            return F.when(pred, F.col(f"_idf_{i}") * boost).otherwise(F.lit(0.0))
        if kind == "bool":
            parts: list[Column] = []
            for c in body.get("must", []):
                parts.append(self.build(c))
            for c in body.get("should", []):
                parts.append(self.build(c))  # build() is already pred-gated
            if not parts:
                # filter/must_not-only bool: constant 1.0 like ES's
                # ConstantScore(…) rewrite of a pure-filter query
                return F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0))
            out = parts[0]
            for p in parts[1:]:
                out = out + p
            # gate on the bool's OWN match predicate: a nested bool whose
            # must/must_not/minimum_should_match fails scores ZERO even
            # when individual should-children match (code-review r8: the
            # ungated sum leaked a non-matching inner bool's child scores
            # into a matching outer should)
            return F.when(pred, out).otherwise(F.lit(0.0))
        if kind == "constant_score":
            return F.when(pred, F.lit(float(body.get("boost", 1.0)))
                          ).otherwise(F.lit(0.0))
        if kind == "dis_max":
            subs = [self.build(c) for c in body["queries"]]
            tie = float(body.get("tie_breaker", 0.0))
            best = F.greatest(*subs) if len(subs) > 1 else subs[0]
            if tie and len(subs) > 1:
                total = subs[0]
                for s in subs[1:]:
                    total = total + s
                best = best + F.lit(tie) * (total - best)
            return best
        if kind == "script":
            # constant-scored like every structural clause, but script's
            # boost is a SIBLING of the "script" key (the generic
            # constant-kind extraction would read the inner spec and
            # silently drop it — code-review r10)
            boost = float(body.get("boost", 1.0))
            return F.when(pred, F.lit(boost)).otherwise(F.lit(0.0))
        if kind == "pinned":
            # ES pinned: the listed ids sort ABOVE every organic hit, in
            # list order — live ES pins with scores descending from
            # Float.MAX_VALUE; the engine uses 1e10 - position, far
            # above any BM25 value and oracle-expressible
            ids = [str(v) for v in body["ids"]]
            organic = self.build(body["organic"])
            idc = F.col(self.id_field).cast("string")
            out = organic
            for i in range(len(ids) - 1, -1, -1):
                out = F.when(idc == ids[i], F.lit(1e10 - i)).otherwise(out)
            # the query-level boost multiplies pinned constants and
            # organic scores alike (code-review r10: it validated as an
            # allowed key but was silently dropped)
            return out * F.lit(float(body.get("boost", 1.0)))
        if kind == "combined_fields":
            # BM25F over the combined field (Lucene CombinedFieldQuery):
            # tf and dl are per-field values weighted by the field
            # boosts and SUMMED into one synthetic field; df counts docs
            # where the term appears in ANY field.  Per-term partials
            # come from the group's single ``_cfmap_<gi>`` map; terms
            # sum decimal-rounded like every BM25 family member
            from .query_dsl import _split_field_boosts

            flds, boosts = _split_field_boosts(body["fields"], min_boost=1.0)
            terms = tuple(sorted(set(_analyze_terms(str(body["query"])))))
            if not terms:
                return F.when(pred, F.lit(float(body.get("boost", 1.0)))
                              ).otherwise(F.lit(0.0))
            gi = self.cf_groups.index((tuple(flds), tuple(boosts), terms))
            m = F.col(f"_cfmap_{gi}")
            total: Column = F.lit(0).cast("decimal(28,6)")
            for t in terms:
                total = total + F.coalesce(
                    m.getItem(t), F.lit(0.0)).cast("decimal(28,6)")
            boost = float(body.get("boost", 1.0))
            return F.when(pred, total.cast("double") * F.lit(boost)
                          ).otherwise(F.lit(0.0))
        if kind == "rank_feature":
            # ES rank_feature: a monotonic function of a positive
            # numeric feature field — saturation x/(x+pivot) (pivot
            # REQUIRED here: live ES defaults to the index's mean
            # feature value, which a deterministic engine must not
            # guess), log ln(sf + x), sigmoid x^e/(x^e + pivot^e),
            # linear x.  All closed-form codegen
            fns = [k for k in ("saturation", "log", "sigmoid", "linear")
                   if k in body]
            unknown = set(body) - {"field", "boost", "saturation", "log",
                                   "sigmoid", "linear"}
            if unknown or len(fns) > 1:
                raise ValueError(
                    f"bad rank_feature options: {sorted(unknown) or fns}")
            boost = float(body.get("boost", 1.0))
            x = F.col(body["field"]).cast("double")
            fn = fns[0] if fns else "saturation"
            spec_f = body.get(fn) or {}
            if fn == "saturation":
                if "pivot" not in spec_f:
                    raise ValueError(
                        "rank_feature saturation needs an explicit pivot "
                        "(live ES derives one from index statistics — "
                        "pass it for deterministic scores)")
                if float(spec_f["pivot"]) <= 0:
                    raise ValueError("rank_feature pivot must be positive")
                s = x / (x + F.lit(float(spec_f["pivot"])))
            elif fn == "log":
                if float(spec_f["scaling_factor"]) <= 0:
                    raise ValueError(
                        "rank_feature scaling_factor must be positive")
                s = F.log(F.lit(float(spec_f["scaling_factor"])) + x)
            elif fn == "sigmoid":
                pv = float(spec_f["pivot"])
                ex = float(spec_f["exponent"])
                if pv <= 0 or ex <= 0:
                    raise ValueError(
                        "rank_feature sigmoid pivot/exponent must be "
                        "positive")
                s = F.pow(x, F.lit(ex)) / (F.pow(x, F.lit(ex))
                                           + F.lit(pv ** ex))
            else:
                s = x
            return F.when(pred, F.round(s * F.lit(boost), 6)
                          ).otherwise(F.lit(0.0))
        if kind == "distance_feature":
            # ES distance_feature: boost * pivot / (pivot + distance)
            # from origin — geo (haversine meters) or date
            # (milliseconds); closed-form codegen like the decay family
            unknown = set(body) - {"field", "origin", "pivot", "boost"}
            if unknown:
                raise ValueError(
                    f"unsupported distance_feature option(s): "
                    f"{sorted(unknown)}")
            boost = float(body.get("boost", 1.0))
            origin, pivot = body["origin"], body["pivot"]
            if isinstance(origin, dict):
                from .query_dsl import haversine_meters

                pv = _parse_distance_m(pivot)
                if pv is None:
                    raise ValueError(
                        f"bad distance_feature pivot: {pivot!r}")
                fld = F.col(body["field"])
                dist = haversine_meters(
                    fld["lat"], fld["lon"],
                    float(origin["lat"]), float(origin["lon"]))
            else:
                pv = _parse_duration_ms(pivot)
                if pv is None:
                    raise ValueError(
                        f"bad distance_feature pivot: {pivot!r} "
                        "(date pivots are ES time units, e.g. '7d')")
                # validate the origin DRIVER-SIDE: a bad string cast to
                # timestamp is NULL in Spark and would silently poison
                # every _score (code-review r10).  Epoch-millis numbers
                # are ES-legal; "now" needs the engine's pinned-clock
                # rule — reject with the fix spelled out
                if isinstance(origin, (int, float)) and not isinstance(
                        origin, bool):
                    ocol = F.timestamp_millis(F.lit(int(origin)))
                else:
                    o = str(origin)
                    if o.strip().lower().startswith("now"):
                        raise ValueError(
                            "distance_feature origin 'now' is "
                            "nondeterministic — pass an explicit "
                            "timestamp (pinned-clock convention)")
                    import datetime as _dt

                    try:
                        _dt.datetime.fromisoformat(o.replace(" ", "T"))
                    except ValueError:
                        raise ValueError(
                            f"bad distance_feature origin: {origin!r} "
                            "(ISO timestamp or epoch millis)") from None
                    ocol = F.lit(o).cast("timestamp")
                dist = F.abs(
                    F.unix_millis(F.col(body["field"]).cast("timestamp"))
                    - F.unix_millis(ocol)
                ).cast("double")
            s = F.lit(float(pv)) / (F.lit(float(pv)) + dist)
            return F.when(pred, F.round(s * F.lit(boost), 6)
                          ).otherwise(F.lit(0.0))
        if kind == "max_sim":
            # late-interaction maxSim (ES rank_vectors
            # maxSimDotProduct): Σ over QUERY vectors of the best dot
            # product against any doc vector.  The query side is a
            # plan literal (ColBERT queries are ≤ dozens of vectors),
            # so the sum unrolls like the sparse_vector dot product;
            # the doc side is one transform+array_max per query vector
            # — all codegen higher-order functions, zero shuffle, zero
            # UDF.  Each per-query max rounds to 6 decimals before
            # DECIMAL(28,6) addition (the BM25-family convention), so
            # a DuckDB oracle replays the sum hash-identically via
            # list_dot_product/list_max.
            doc = F.col(body["field"])

            def _dot_with(lit_q):
                # closure factory, NOT a default-arg lambda — a
                # two-param callable looks BINARY to F.transform and
                # receives the element INDEX as its second argument
                # (the analysis.py _drop_rule rule)
                def dot(d):
                    return F.aggregate(
                        F.zip_with(d, lit_q,
                                   lambda a, b: a.cast("double") * b),
                        F.lit(0.0), lambda acc, x: acc + x)
                return dot

            # a doc vector of the wrong dimension would zip_with into
            # NULL products that array_max skips and coalesce turns
            # into a silent 0 score (round-14 review) — reject loudly
            # at runtime instead, the engine's anti-silent policy
            dim = len(body["query_vectors"][0])
            bad_dim = F.exists(doc, lambda d: F.size(d) != F.lit(dim))
            total: Column = F.lit(0).cast("decimal(28,6)")
            for qv in body["query_vectors"]:
                lit_q = F.lit([float(x) for x in qv])
                best = F.array_max(F.transform(doc, _dot_with(lit_q)))
                total = total + F.round(F.coalesce(best, F.lit(0.0)),
                                        6).cast("decimal(28,6)")
            boost = float(body.get("boost", 1.0))
            score = total.cast("double") * F.lit(boost)
            return F.when(
                pred,
                F.when(bad_dim, F.raise_error(F.concat(
                    F.lit(f"max_sim: doc vector dimension != {dim} "
                          f"(query_vectors dimension) on field "),
                    F.lit(str(body["field"])))).cast("double"))
                .otherwise(score)
            ).otherwise(F.lit(0.0))
        if kind == "semantic":
            # semantic_text stand-in: the standard analysis chain IS
            # the "inference" — distinct query tokens at weight 1.0,
            # rewritten onto sparse_vector (validation in the filter
            # branch, which compile_query already ran).  NOTE: use the
            # module-level _analyze_terms (= analysis.analyze_text,
            # identical to query_dsl's wrapper) — a local import here
            # would shadow the name for the WHOLE method and break the
            # earlier combined_fields/_bm25 call sites with
            # UnboundLocalError.
            toks = sorted(set(_analyze_terms(str(body["query"]))))
            return self.build({"sparse_vector": {
                "field": body["field"],
                "query_vector": {t: 1.0 for t in toks},
                **({"boost": body["boost"]} if "boost" in body else {})}})
        if kind == "weighted_tokens":
            # field-keyed precursor of sparse_vector — rewrite and
            # recurse (validation lives in the filter branch, which
            # compile_query already ran for this clause's predicate)
            from .query_dsl import _field_spec

            field, spec = _field_spec(body)
            return self.build({"sparse_vector": {
                "field": field, "query_vector": spec["tokens"],
                **({"boost": spec["boost"]} if "boost" in spec else {})}})
        if kind == "sparse_vector":
            # learned-sparse dot product: Σ_t qv[t] * doc_map[t] over
            # the QUERY vector's tokens — the query expansion is small
            # (ELSER prunes to ~dozens of tokens), so the sum unrolls
            # into codegen plan literals exactly like the classifier's
            # map shape (operators/classify.py): zero shuffle, zero UDF,
            # the score rides the scan.  Per-term products round to 6
            # decimals before DECIMAL(28,6) addition, so the sum is
            # order-exact and an ANSI oracle replays it hash-identically
            # (the BM25-family convention).  Validation in
            # plans/query_dsl.py's filter branch.
            m = F.col(body["field"])
            qv = body["query_vector"]
            total: Column = F.lit(0).cast("decimal(28,6)")
            for t in sorted(qv):
                total = total + F.round(
                    F.coalesce(m.getItem(str(t)), F.lit(0.0))
                    * F.lit(float(qv[t])), 6).cast("decimal(28,6)")
            boost = float(body.get("boost", 1.0))
            return F.when(pred, total.cast("double") * F.lit(boost)
                          ).otherwise(F.lit(0.0))
        if kind == "function_score":
            return self._function_score(body)
        if kind == "script_score":
            # ES script_score QUERY: hits = inner query's, score = the
            # script's value with _score bound to the inner score.  Its
            # min_score param EXCLUDES hits — a score-driven hit-set
            # change the filter compiler can't see, so reject it loudly
            # rather than return wrong hit counts (use the body-level
            # min_score, which es_scored_search applies to the hit set)
            if "min_score" in body:
                raise ValueError(
                    "script_score's min_score param is not supported — "
                    "use the search body's top-level min_score"
                )
            inner = self.build(body["query"])
            v = _script_score(body, inner)
            return F.when(pred, F.round(v * F.lit(float(body.get("boost", 1.0))),
                                        6)).otherwise(F.lit(0.0))
        if kind == "boosting":
            # ES boosting: positive score, multiplied by negative_boost
            # when the negative query matches (demotion, never exclusion)
            pos = self.build(body["positive"])
            neg = F.coalesce(
                compile_query(body["negative"], self.id_field), F.lit(False)
            )
            nb = float(body.get("negative_boost", 0.5))
            return F.when(neg, pos * F.lit(nb)).otherwise(pos)
        if kind in _CONSTANT_ONE_KINDS:
            spec = next(iter(body.values()))
            boost = float(spec.get("boost", 1.0)) if isinstance(spec, dict) else 1.0
            return F.when(pred, F.lit(boost)).otherwise(F.lit(0.0))
        raise ValueError(f"unsupported clause in score context: {kind}")

    def _bm25(self, field: str, query: str) -> Column:
        """Sum of the per-term partials from this doc's term-score map for
        ``field`` (joined in by es_scored_search as ``_tsmap_<field>``)."""
        return self._bm25_terms(field, sorted(set(_analyze_terms(query))))

    def _bm25_terms(self, field: str, terms: list[str]) -> Column:
        m = F.col(_tsmap_name(field))
        # partials are rounded to 6 decimals, so DECIMAL(28,6) addition is
        # exact and order-independent — same convention as bm25_topk, and
        # what lets an ANSI-SQL oracle reproduce the sum bit-for-bit
        out: Column = F.lit(0).cast("decimal(28,6)")
        for t in terms:
            out = out + F.coalesce(m.getItem(t), F.lit(0.0)).cast("decimal(28,6)")
        return out.cast("double")

    # -- function_score ------------------------------------------------------
    def _function_score(self, body: dict) -> Column:
        base = self.build(body["query"])
        fn_kinds = ("field_value_factor", "gauss", "exp", "linear",
                    "random_score", "script_score")
        known_body = {"query", "functions", "score_mode", "boost_mode",
                      "max_boost", "weight", "filter", *fn_kinds}
        unknown_body = set(body) - known_body
        if unknown_body:
            # loud rejection in the SHORTHAND path too — pre-fix, a
            # top-level script_score was silently dropped and hits got
            # plain query scores (code-review r8)
            raise ValueError(
                f"unsupported function_score function(s): {sorted(unknown_body)}"
            )
        funcs = body.get("functions")
        if funcs is None:
            # single-function shorthand at the top level
            funcs = [{k: v for k, v in body.items()
                      if k in (*fn_kinds, "weight", "filter")}]
            funcs = [f for f in funcs if set(f) - {"filter"}]
        vals: list[Column] = []
        matched: list[Column] = []
        null_poison: Column | None = None
        for fn in funcs:
            unsupported = set(fn) - {"filter", "weight", *fn_kinds}
            if unsupported:
                raise ValueError(
                    f"unsupported function_score function(s): {sorted(unsupported)}"
                )
            if sum(k in fn for k in fn_kinds) > 1:
                raise ValueError(
                    "one scoring function per functions[] entry "
                    f"(got {sorted(set(fn) & set(fn_kinds))})"
                )
            v: Column = F.lit(1.0)
            if "field_value_factor" in fn:
                v = _field_value_factor(fn["field_value_factor"])
            for dk in ("gauss", "exp", "linear"):
                if dk in fn:
                    v = _decay_column(dk, fn[dk])
            if "random_score" in fn:
                v = _random_score(fn["random_score"])
            if "script_score" in fn:
                # inside function_score, the script sees _score = the
                # INNER QUERY's score (ES semantics)
                v = _script_score(fn["script_score"], base)
            if "weight" in fn:
                v = v * F.lit(float(fn["weight"]))
            if "filter" in fn:
                gate = F.coalesce(
                    compile_query(fn["filter"], self.id_field), F.lit(False)
                )
            else:
                gate = F.lit(True)
            vals.append(F.when(gate, v))          # NULL when not matched
            matched.append(gate.cast("int"))
            # a function that MATCHED but produced a NULL factor (missing
            # field without `missing`, out-of-domain modifier input) must
            # not be silently coalesced into the neutral element — it
            # poisons the whole score to NULL (ADVICE r8, documented in
            # _field_value_factor)
            poison = gate & v.isNull()
            null_poison = (poison if null_poison is None
                           else (null_poison | poison))
        score_mode = str(body.get("score_mode", "multiply"))
        if not vals:
            fscore = F.lit(1.0)
        elif score_mode == "multiply":
            fscore = F.coalesce(vals[0], F.lit(1.0))
            for v in vals[1:]:
                fscore = fscore * F.coalesce(v, F.lit(1.0))
        elif score_mode == "sum":
            fscore = F.coalesce(vals[0], F.lit(0.0))
            for v in vals[1:]:
                fscore = fscore + F.coalesce(v, F.lit(0.0))
        elif score_mode == "max":
            fscore = F.coalesce(F.greatest(*vals) if len(vals) > 1 else vals[0],
                                F.lit(1.0))
        elif score_mode == "min":
            fscore = F.coalesce(F.least(*vals) if len(vals) > 1 else vals[0],
                                F.lit(1.0))
        elif score_mode == "avg":
            total = F.coalesce(vals[0], F.lit(0.0))
            n = matched[0]
            for v, m in zip(vals[1:], matched[1:]):
                total = total + F.coalesce(v, F.lit(0.0))
                n = n + m
            fscore = F.when(n > 0, total / n).otherwise(F.lit(1.0))
        elif score_mode == "first":
            fscore = F.coalesce(*vals, F.lit(1.0))
        else:
            raise ValueError(f"unsupported score_mode: {score_mode}")
        if "max_boost" in body:
            # least() skips NULLs, so cap before the poison wrap
            fscore = F.least(fscore, F.lit(float(body["max_boost"])))
        boost_mode = str(body.get("boost_mode", "multiply"))
        combiners = {
            "multiply": lambda: base * fscore,
            "sum": lambda: base + fscore,
            "replace": lambda: fscore,
            "max": lambda: F.greatest(base, fscore),
            "min": lambda: F.least(base, fscore),
            "avg": lambda: (base + fscore) / F.lit(2.0),
        }
        if boost_mode not in combiners:
            raise ValueError(f"unsupported boost_mode: {boost_mode}")
        out = combiners[boost_mode]()
        if null_poison is not None:
            # applied AFTER the boost_mode combine: greatest/least would
            # otherwise skip the NULL factor and leak the base score
            out = F.when(null_poison, F.lit(None).cast("double")
                         ).otherwise(out)
        return out


def _field_value_factor(spec: dict) -> Column:
    """ES ``field_value_factor``: modifier(factor * field), with
    ``missing`` substituted for NULL — every modifier is codegen math.

    NULL semantics (documented divergence, ADVICE r8): a NULL field value
    with no ``missing`` param — or a modifier input outside its domain
    (log/ln of a non-positive, sqrt of a negative, reciprocal of zero) —
    yields a NULL factor and therefore a NULL ``_score`` that sorts LAST
    under the default ``_score desc`` ordering.  Live ES raises a search
    error for the same inputs; a distributed engine cannot fail one row's
    query, so the row is deterministically demoted instead (pass
    ``missing`` to restore ES behavior).  The domain guards are explicit
    ``when()`` gates so every modifier returns NULL — never NaN or
    ±Infinity, which would poison the sort order."""
    v = F.coalesce(
        F.col(spec["field"]).cast("double"),
        F.lit(float(spec["missing"])) if "missing" in spec else F.lit(None),
    ) * F.lit(float(spec.get("factor", 1.0)))
    modifier = str(spec.get("modifier", "none"))
    mods = {
        "none": lambda c: c,
        "log": lambda c: F.when(c > 0, F.log10(c)),
        "log1p": lambda c: F.when(c > -1, F.log10(c + 1.0)),
        "log2p": lambda c: F.when(c > -2, F.log10(c + 2.0)),
        "ln": lambda c: F.when(c > 0, F.log(c)),
        "ln1p": lambda c: F.when(c > -1, F.log(c + 1.0)),
        "ln2p": lambda c: F.when(c > -2, F.log(c + 2.0)),
        "sqrt": lambda c: F.when(c >= 0, F.sqrt(c)),
        "square": lambda c: c * c,
        "reciprocal": lambda c: F.when(c != 0, F.lit(1.0) / c),
    }
    if modifier not in mods:
        raise ValueError(f"unsupported field_value_factor modifier: {modifier}")
    return F.round(mods[modifier](v), 6)


_DURATION_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                "H": 3_600_000, "d": 86_400_000, "w": 604_800_000}
_DISTANCE_M = {"mm": 0.001, "cm": 0.01, "m": 1.0, "km": 1000.0,
               "mi": 1609.344, "yd": 0.9144, "ft": 0.3048, "nmi": 1852.0}


def _parse_duration_ms(s) -> float | None:
    """``"10d"`` → milliseconds, or None if not an ES time unit string."""
    import re as _re

    m = _re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h|H|d|w)", str(s).strip())
    return float(m.group(1)) * _DURATION_MS[m.group(2)] if m else None


def _parse_distance_m(s) -> float | None:
    """``"10km"`` → meters, or None if not an ES distance string (a bare
    number means meters, like ES)."""
    import re as _re

    m = _re.fullmatch(r"(\d+(?:\.\d+)?)(mm|cm|m|km|mi|yd|ft|nmi)?",
                      str(s).strip())
    if not m:
        return None
    return float(m.group(1)) * _DISTANCE_M[m.group(2) or "m"]


def _decay_column(kind: str, body: dict) -> Column:
    """ES ``function_score`` decay functions ``gauss`` / ``exp`` /
    ``linear`` over numeric, date, or geo-point fields — closed-form
    codegen math over the scored frame (VERDICT r8 #3):

    - adjusted distance ``d = max(0, |value - origin| - offset)``,
    - ``gauss``:  ``exp(ln(decay) · d² / scale²)``
      (ES's ``exp(-d²/2σ²)`` with ``σ² = -scale²/(2·ln decay)``),
    - ``exp``:    ``exp(ln(decay) · d / scale)``,
    - ``linear``: ``max(0, (s - d)/s)`` with ``s = scale/(1 - decay)``.

    Field kind is inferred from the spec: a ``{lat, lon}`` origin is geo
    (haversine distance, ES distance-unit strings), a time-unit ``scale``
    ("10d") is a date field (origin is a date / date-math expression —
    ``now`` anchors need the engine's pinned-clock extension key ``now``
    in the spec, same determinism rule as range date math), anything else
    is numeric.  A NULL field value scores 1.0, exactly ES's documented
    decay behavior for missing fields.  Rounded to 6 like every factor."""
    spec = dict(body)
    now = spec.pop("now", None)
    (field, fspec), = spec.items()
    fspec = dict(fspec)
    if "multi_value_mode" in fspec:
        raise ValueError("multi_value_mode is not supported (single-valued "
                         "fields only)")
    origin, scale = fspec["origin"], fspec["scale"]
    offset = fspec.get("offset", 0)
    decay = float(fspec.get("decay", 0.5))
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if isinstance(origin, dict):  # geo point
        from .query_dsl import haversine_meters

        # explicit NULL gate: haversine's trig pipeline does not propagate
        # NULL coordinates, and ES scores missing fields 1.0 (the final
        # coalesce handles that once dist is properly NULL)
        dist = F.when(
            F.col(field)["lat"].isNotNull() & F.col(field)["lon"].isNotNull(),
            haversine_meters(
                F.col(field)["lat"], F.col(field)["lon"],
                float(origin["lat"]), float(origin["lon"]),
            ),
        )
        scale_v = _parse_distance_m(scale)
        offset_v = _parse_distance_m(offset)
        if scale_v is None or offset_v is None:
            raise ValueError(f"bad geo decay scale/offset: {scale!r}/{offset!r}")
    elif _parse_duration_ms(scale) is not None:  # date field
        from datetime import datetime

        from .query_dsl import parse_date_math

        o = str(origin)
        if isinstance(now, str):
            now, _ = parse_date_math(now if "||" in now else now + "||")
        anchor, _ = parse_date_math(
            o if ("||" in o or o.startswith("now")) else o + "||", now=now)
        origin_ms = (anchor - datetime(1970, 1, 1)).total_seconds() * 1000.0
        dist = F.abs(
            F.unix_millis(F.col(field).cast("timestamp")).cast("double")
            - F.lit(origin_ms)
        )
        scale_v = _parse_duration_ms(scale)
        offset_v = (_parse_duration_ms(offset) if offset != 0 else 0.0)
        if offset_v is None:
            raise ValueError(f"bad date decay offset: {offset!r}")
    else:  # numeric
        dist = F.abs(F.col(field).cast("double") - F.lit(float(origin)))
        scale_v, offset_v = float(scale), float(offset)
    if scale_v <= 0:
        raise ValueError(f"decay scale must be positive, got {scale!r}")
    import math as _math

    # greatest() would silently skip a NULL distance and hand the decay a
    # 0 — keep NULL flowing so the final coalesce applies ES's missing→1.0
    d = F.when(dist.isNotNull(),
               F.greatest(dist - F.lit(float(offset_v)), F.lit(0.0)))
    ln_decay = _math.log(decay)
    if kind == "gauss":
        out = F.exp(d * d * F.lit(ln_decay / (scale_v * scale_v)))
    elif kind == "exp":
        out = F.exp(d * F.lit(ln_decay / scale_v))
    else:  # linear
        s = scale_v / (1.0 - decay)
        # same NULL guard as d: greatest's zero floor must not swallow a
        # missing-field NULL before the coalesce
        out = F.when(d.isNotNull(),
                     F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0)))
    # ES: documents missing the field get a decay factor of 1.0
    return F.round(F.coalesce(out, F.lit(1.0)), 6)


def _script_score(spec: dict, score: Column) -> Column:
    """ES ``script_score``: the Painless arithmetic subset
    (``query_dsl._script_column`` — doc refs, params, Math.* calls)
    with ``_score`` bound to the inner query's score.  Same codegen
    class as every other score function; anything outside the subset
    rejects loudly."""
    import re as _re

    from .query_dsl import _script_column

    raw = spec.get("script")
    if isinstance(raw, dict):
        src = raw.get("source", "")
        params = {k: F.lit(v) for k, v in (raw.get("params") or {}).items()}
    else:
        src, params = str(raw), {}
    if not src:
        raise ValueError("script_score needs a script source")
    src = _re.sub(r"(?<![\w.])_score(?![\w.])", "params.__score", src)
    params["__score"] = score
    return F.round(_script_column(src, params, columns="*"), 6)


def _random_score(spec: dict) -> Column:
    """ES ``random_score`` with ``seed`` + ``field``: deterministic
    pseudo-random [0, 1) per document from a 64-bit hash of (field value,
    seed).  ES requires exactly this pair for reproducible scores; the
    unseeded form would be nondeterministic across retries/speculative
    tasks, so it rejects loudly (same determinism convention as date
    math's pinned now)."""
    spec = spec or {}
    if "seed" not in spec or "field" not in spec:
        raise ValueError(
            "random_score needs both seed and field for deterministic "
            "scores (ES's own reproducibility requirement)"
        )
    seed = int(spec["seed"])
    mod = F.lit(1_048_576.0)
    h = F.pmod(F.xxhash64(F.col(str(spec["field"])), F.lit(seed)),
               mod.cast("long")).cast("double")
    return F.round(h / mod, 6)


#: marker prefix for materialized shared-analysis token columns; the
#: full column name carries the analyzer the stream was BUILT under —
#: ``__analyzed__<analyzer>__<field>`` — so a consumer compiling with a
#: different grammar can never silently read stale tokens (code-review
#: r12: a name without the analyzer made the staleness guard
#: unenforceable)
ANALYZED_PREFIX = "__analyzed__"


def _analyzed_col_name(field: str) -> str:
    from .analysis import current_analyzer

    return f"{ANALYZED_PREFIX}{current_analyzer()}__{field}"



def _tsmap_name(field: str) -> str:
    """Join-column name for a field's term-score map.  Dots in
    search_as_you_type subfield names (``text._2gram``) would parse as
    struct access inside ``F.col`` — mangle them out of the name."""
    return "_tsmap_" + field.replace(".", "__")

def _toks_expr(frame: DataFrame, field: str) -> Column:
    """Full-chain token stream for ``field`` over ``frame`` — reads the
    materialized shared-analysis column when the frame carries one
    built under the ACTIVE analyzer (``with_shared_analysis``), else
    tokenizes inline.  NULL text coalesces to the empty token list
    either way — F.size(NULL) is -1, which would poison avgdl for the
    whole corpus.

    A search_as_you_type shingle subfield (``root._2gram`` /
    ``root._3gram``, round 13) derives from the ROOT's stream — which
    keeps reading the materialized root column when one exists — so
    BM25 tf/df/dl over shingle "terms" costs one extra codegen
    transform, never a second tokenization."""
    from .analysis import sayt_subfield, shingle_col

    sub = sayt_subfield(field)
    if sub is not None:
        root, n = sub
        return shingle_col(_toks_expr(frame, root), n)
    pre = _analyzed_col_name(field)
    base = (F.col(pre) if pre in frame.columns
            else analyze_col(field))
    return F.coalesce(base, F.lit([]).cast("array<string>"))


def with_shared_analysis(df: DataFrame, fields) -> DataFrame:
    """Materialize each field's analyzed token stream ONCE as a
    ``__analyzed__<field>`` column and localCheckpoint the frame — the
    multi-query tokenize-sharing surface (VERDICT r11 #7): N scored
    searches over the same corpus each re-tokenize every scored field,
    and higher-order let-binding cannot share work across separate
    aggregates.  Checkpointing trades memory (token arrays ≈ corpus
    text size, spillable) for tokenizing each field exactly once no
    matter how many score trees read it; the term-map builders pick the
    columns up via ``_toks_expr``.  Build it under the SAME analyzer
    scope as the queries that will consume it."""
    out = df
    for f in sorted(set(fields)):
        out = out.withColumn(_analyzed_col_name(f), analyze_col(f))
    return out.localCheckpoint(eager=False)


#: cross-query term-map cache, active inside ``shared_tsmaps()`` —
#: multiple bodies in one scored _msearch often score the SAME terms on
#: the SAME field (best_fields vs most_fields differ only in how the
#: partials combine), and without sharing each body rebuilds the
#: identical aggregate+join frame
_tsmap_cache: dict | None = None
#: per-cache-key build locks + their registry guard (r15): es_msearch
#: compiles its bodies on driver threads, and two arms wanting the SAME
#: term map must end up sharing ONE frame (sequential-build plan shape)
#: rather than racing to build duplicates.  The guard only protects the
#: tiny dict operations; the expensive plan build runs under the per-key
#: lock so distinct keys still build concurrently.
_tsmap_guard = threading.Lock()
_tsmap_locks: dict | None = None


@contextmanager
def shared_tsmaps():
    """Scope a cache of ``_term_score_map`` frames across several scored
    plan builds (es_msearch) — multiple bodies often score the SAME
    terms on the SAME field, and without sharing each body rebuilds the
    identical aggregate+join frame (the duplicate subtrees then also
    defeat Catalyst exchange reuse heuristics and bloat the plan).
    Thread-safe: builders of the same key serialize on a per-key lock,
    so the multi-threaded es_msearch build reuses one frame exactly
    like the sequential build did."""
    global _tsmap_cache, _tsmap_locks
    prev, prev_locks = _tsmap_cache, _tsmap_locks
    _tsmap_cache, _tsmap_locks = {}, {}
    try:
        yield
    finally:
        _tsmap_cache, _tsmap_locks = prev, prev_locks


def _term_score_map(df: DataFrame, id_field: str, field: str,
                    terms: set[str], k1: float, b: float,
                    stats_over: DataFrame | None = None) -> DataFrame:
    """Per-doc BM25 term partials for one text field, as
    ``(id, _tsmap_<field>: map<term, double>)`` — the single-pass,
    filter-before-shuffle shape of ``retrieval.bm25_topk``.

    ``stats_over`` (rescore, VERDICT r8 #4): compute the CORPUS statistics
    (N, avgdl, per-term df) over that frame while tf/dl — and therefore
    the tsmap rows the caller joins back — come from ``df`` only.  Lucene
    rescores window docs against index-wide stats; with ``df`` = the
    window frame, the corpus contributes ONE 1-row broadcast aggregate
    (N, avgdl, and each query term's doc frequency as array_contains
    sums) and the per-doc join is ≤ window rows."""
    from .analysis import current_analyzer

    if _tsmap_cache is not None and stats_over is None:
        # id(df) anchors the key to the SOURCE FRAME (ADVICE r12): a
        # shared_tsmaps() scope spanning scored searches over two
        # different DataFrames must never serve frame A's term map for
        # frame B.  The cache value pins df, so its id() cannot be
        # recycled while the scope lives.
        cache_key = (id(df), id_field, field, tuple(sorted(terms)), k1, b,
                     current_analyzer())
        with _tsmap_guard:
            hit = _tsmap_cache.get(cache_key)
            if hit is not None:
                return hit[1]
            klock = _tsmap_locks.setdefault(cache_key, threading.Lock())
        with klock:
            # double-checked: a concurrent arm may have built this key
            # while we waited; reuse its frame so the plan shape matches
            # the sequential build exactly
            with _tsmap_guard:
                hit = _tsmap_cache.get(cache_key)
            if hit is not None:
                return hit[1]
            out = _term_score_map_build(df, id_field, field, terms, k1, b,
                                        None)
            with _tsmap_guard:
                # the entry PINS df (value is (df, out)): the id(df) key
                # component stays valid for the scope's lifetime —
                # CPython cannot recycle the address of an object the
                # cache itself keeps alive
                _tsmap_cache[cache_key] = (df, out)
            return out
    return _term_score_map_build(df, id_field, field, terms, k1, b,
                                 stats_over)


def _sqs(s: str) -> str:
    """Spark-SQL single-quoted string literal (expression-string builders
    below — each py4j round trip costs ~0.5 ms, r15)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bm25_partial_sql(k1: float, b: float) -> str:
    """The BM25 per-(doc, term) partial as ONE SQL expression over the
    ``_tf``/``_dl``/``_df``/``_n_docs``/``_avgdl`` columns — float
    literals pre-folded in Python exactly like the Column rendering did
    (``k1 + 1.0`` / ``1.0 - b`` were Python-side constants there too)."""
    return (
        "round(ln(1.0D + (_n_docs - _df + 0.5D) / (_df + 0.5D))"
        f" * (_tf * {k1 + 1.0!r}D)"
        f" / (_tf + {k1!r}D * ({1.0 - b!r}D + {b!r}D * _dl / _avgdl)), 6)"
    )


def _term_score_map_build(df: DataFrame, id_field: str, field: str,
                          terms: set[str], k1: float, b: float,
                          stats_over: DataFrame | None) -> DataFrame:
    """Uncached plan build behind :func:`_term_score_map`."""
    toks = _toks_expr(df, field)
    base = df.select(
        F.col(id_field).alias("_did"), toks.alias("_toks")
    ).selectExpr("_did", "_toks", "CAST(size(_toks) AS DOUBLE) AS _dl")
    in_list = ", ".join(_sqs(t) for t in sorted(terms))
    hits = (
        base.selectExpr("_did", "_dl", "explode(_toks) AS _term")
        .where(F.expr(f"_term IN ({in_list})") if terms else F.lit(False))
    )
    tf = hits.groupBy("_did", "_term").agg(
        F.expr("CAST(count(1) AS DOUBLE) AS _tf"),
        F.expr("first(_dl) AS _dl"),
    )
    if stats_over is None:
        stats = base.agg(
            F.expr("CAST(count(1) AS DOUBLE) AS _n_docs"),
            F.expr("avg(_dl) AS _avgdl"),
        )
        dfreq = tf.groupBy("_term").agg(
            F.expr("CAST(count(1) AS DOUBLE) AS _df"))
    else:
        # corpus stats in ONE pass and ONE row: N, avgdl, and every
        # query term's document frequency as array_contains sums — no
        # second scan, no vocab shuffle; the row broadcasts
        sterms = sorted(terms)
        stats_base = stats_over.select(
            _toks_expr(stats_over, field).alias("_toks")).selectExpr(
            "_toks", "CAST(size(_toks) AS DOUBLE) AS _dl"
        )
        corpus = stats_base.agg(
            F.expr("CAST(count(1) AS DOUBLE) AS _n_docs"),
            F.expr("avg(_dl) AS _avgdl"),
            *[
                F.expr(
                    "CAST(sum(CAST(array_contains(_toks, "
                    f"{_sqs(t)}) AS INT)) AS DOUBLE) AS _df_{i}")
                for i, t in enumerate(sterms)
            ],
        )
        stats = corpus.select("_n_docs", "_avgdl")
        dfreq = corpus.selectExpr(
            "explode(map_from_arrays("
            f"array({', '.join(_sqs(t) for t in sterms)}), "
            f"array({', '.join(f'_df_{i}' for i in range(len(sterms)))})"
            ")) AS (_term, _df)"
        )
    partial = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .selectExpr("_did", "_term", f"{_bm25_partial_sql(k1, b)} AS _p")
    )
    # sort the entries: collect_list order follows shuffle arrival, and
    # a nondeterministic key order would leak into the _explanation JSON
    # (map lookups themselves are order-independent)
    out = partial.groupBy("_did").agg(
        F.expr(
            "map_from_entries(array_sort(collect_list(struct(_term, _p))))"
            f" AS `{_tsmap_name(field)}`")
    ).withColumnRenamed("_did", id_field)
    # cached WITHOUT checkpointing (when the shared_tsmaps wrapper stores
    # this frame): the consumers union into ONE query, where the
    # identical (same object = structurally equal) subplan reuses the
    # first copy's shuffle via ReusedExchange — a checkpoint would
    # materialize each map as its own serial job and cost more than it
    # saves (measured)
    return out


def _xf_term_score_maps(
    df: DataFrame, id_field: str, fields: tuple[str, ...], terms: set[str],
    k1: float, b: float, gi: int, stats_over: DataFrame | None = None,
) -> list[DataFrame]:
    """Blended-df BM25 partials for one multi_match ``cross_fields``
    group: one ``(id, _xfmap_<gi>_<field>: map<term, double>)`` frame per
    field.  Lucene's BlendedTermQuery makes per-field scores comparable
    by rewriting each term's document frequency to the MAX across the
    group's fields; tf, dl and avgdl stay per-field (N is the corpus
    count, identical across fields of one index).

    Scale shape: per field, the same single tokenize+explode pass as
    ``_term_score_map`` filtered to the query's terms before the
    per-(doc, term) shuffle; the corpus statistics — N, avgdl, AND every
    term's per-field df — reduce to ONE 1-row aggregate per field whose
    union (|fields| × |terms| rows) is the blended-df broadcast.  No
    extra corpus pass for the blend."""
    sterms = sorted(terms)
    in_list = ", ".join(_sqs(t) for t in sterms)
    per_field: list[tuple[DataFrame, DataFrame]] = []
    dfreqs: list[DataFrame] = []
    for f in fields:
        toks = _toks_expr(df, f)
        base = df.select(
            F.col(id_field).alias("_did"), toks.alias("_toks")
        ).selectExpr("_did", "_toks", "CAST(size(_toks) AS DOUBLE) AS _dl")
        hits = (
            base.selectExpr("_did", "_dl", "explode(_toks) AS _term")
            .where(F.expr(f"_term IN ({in_list})") if sterms else F.lit(False))
        )
        tf = hits.groupBy("_did", "_term").agg(
            F.expr("CAST(count(1) AS DOUBLE) AS _tf"),
            F.expr("first(_dl) AS _dl"),
        )
        src = stats_over if stats_over is not None else df
        stats_base = src.select(_toks_expr(src, f).alias("_toks")).selectExpr(
            "_toks", "CAST(size(_toks) AS DOUBLE) AS _dl")
        corpus = stats_base.agg(
            F.expr("CAST(count(1) AS DOUBLE) AS _n_docs"),
            F.expr("avg(_dl) AS _avgdl"),
            *[
                F.expr(
                    "CAST(sum(CAST(array_contains(_toks, "
                    f"{_sqs(t)}) AS INT)) AS DOUBLE) AS _df_{i}")
                for i, t in enumerate(sterms)
            ],
        )
        per_field.append((tf, corpus.select("_n_docs", "_avgdl")))
        dfreqs.append(corpus.selectExpr(
            "explode(map_from_arrays("
            f"array({', '.join(_sqs(t) for t in sterms)}), "
            f"array({', '.join(f'_df_{i}' for i in range(len(sterms)))})"
            ")) AS (_term, _df)"
        ))
    blended = dfreqs[0]
    for d2 in dfreqs[1:]:
        blended = blended.unionByName(d2)
    blended = blended.groupBy("_term").agg(F.max("_df").alias("_df"))
    maps: list[DataFrame] = []
    for f, (tf, stats) in zip(fields, per_field):
        partial = (
            tf.join(F.broadcast(blended), "_term")
            .crossJoin(F.broadcast(stats))
            .selectExpr("_did", "_term",
                        f"{_bm25_partial_sql(k1, b)} AS _p")
        )
        maps.append(
            partial.groupBy("_did").agg(
                F.expr(
                    "map_from_entries(array_sort("
                    "collect_list(struct(_term, _p))))"
                    f" AS `_xfmap_{gi}_{f}`")
            ).withColumnRenamed("_did", id_field)
        )
    return maps


def _cf_term_score_map(
    df: DataFrame, id_field: str, fields: tuple[str, ...],
    boosts: tuple[float, ...], terms: tuple[str, ...],
    k1: float, b: float, gi: int, stats_over: DataFrame | None = None,
) -> DataFrame:
    """BM25F partials for one ``combined_fields`` group, as ONE
    ``(id, _cfmap_<gi>: map<term, double>)`` frame.  Lucene's
    CombinedFieldQuery scores a synthetic field whose term frequency is
    the boost-weighted SUM of the per-field tfs and whose length is the
    boost-weighted sum of the per-field lengths; document frequency
    counts docs carrying the term in ANY field.

    Scale shape: ONE tokenize pass over all the group's fields together
    (each row emits its weighted token stream, term-filtered before the
    per-(doc, term) shuffle); corpus stats reduce to a 1-row broadcast
    aggregate exactly like the plain and blended map builders."""
    sterms = sorted(terms)

    def _frame_toks(frame):
        return [_toks_expr(frame, f) for f in fields]

    def _frame_dl(tcols):
        dl: Column = F.lit(0.0)
        for tc, w in zip(tcols, boosts):
            dl = dl + F.size(tc).cast("double") * F.lit(float(w))
        return dl

    toks_cols = _frame_toks(df)
    dl_c = _frame_dl(toks_cols)

    def _tag(w: float):
        # closure factory: a default-arg lambda would look binary to
        # F.transform and receive the element INDEX as the second arg
        return lambda x: F.struct(x.alias("_t"), F.lit(float(w)).alias("_w"))

    weighted = F.flatten(F.array(*[
        F.transform(tc, _tag(w)) for tc, w in zip(toks_cols, boosts)
    ]))
    base = df.select(
        F.col(id_field).alias("_did"), dl_c.alias("_dl"),
        weighted.alias("_tw"),
    )
    hits = (
        base.select("_did", "_dl", F.explode("_tw").alias("_e"))
        .where(F.col("_e._t").isin(sterms))
    )
    tf = hits.groupBy("_did", F.col("_e._t").alias("_term")).agg(
        F.sum("_e._w").alias("_tf"),
        F.first("_dl").alias("_dl"),
    )
    src = stats_over if stats_over is not None else df
    src_toks = _frame_toks(src)
    corpus = src.select(_frame_dl(src_toks).alias("_dl"), *[
        tc.alias(f"_tk_{i}") for i, tc in enumerate(src_toks)
    ]).agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum(
                _any_tk_contains(len(fields), t)
            ).cast("double").alias(f"_df_{i}")
            for i, t in enumerate(sterms)
        ],
    )
    stats = corpus.select("_n_docs", "_avgdl")
    dfreq = corpus.select(
        F.explode(
            F.map_from_arrays(
                F.lit(sterms),
                F.array(*[F.col(f"_df_{i}") for i in range(len(sterms))]),
            )
        ).alias("_term", "_df")
    )
    partial = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .select(
            "_did", "_term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("_n_docs") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1.0))
                / (F.col("_tf")
                   + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))),
                6,
            ).alias("_p"),
        )
    )
    return partial.groupBy("_did").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_term", "_p")))
        ).alias(f"_cfmap_{gi}")
    ).withColumnRenamed("_did", id_field)


def _any_tk_contains(n_fields: int, term: str) -> Column:
    """OR of array_contains over the projected ``_tk_<i>`` token columns
    (combined-field document frequency), as an int for summation."""
    c = F.array_contains(F.col("_tk_0"), term)
    for i in range(1, n_fields):
        c = c | F.array_contains(F.col(f"_tk_{i}"), term)
    return c.cast("int")


def _apply_query_rescore(
    top: DataFrame, rspec: dict, id_field: str, *,
    k1: float, b: float, stats_over: DataFrame | None,
) -> DataFrame:
    """Lucene QueryRescorer.combine over a bounded window frame ``top``
    that carries ``_score0`` (the first-pass score) plus the doc
    columns: score the rescore query against index-wide stats
    (``stats_over``), blend per ``score_mode``, and let a window doc
    the rescore query does NOT match keep ``query_weight * original``
    — the secondary score is omitted, not treated as 0 (which would
    zero the doc under multiply/min and halve it under avg).  ONE
    construction shared by the search-body ``rescore`` and the
    ``rescorer`` retriever (the one-grammar lockstep rule)."""
    top = score_frame(
        top, rspec["rescore_query"], id_field, k1=k1, b=b,
        stats_over=stats_over,
    ).withColumnRenamed("_score", "_rescore")
    qw = F.lit(float(rspec.get("query_weight", 1.0)))
    rqw = F.lit(float(rspec.get("rescore_query_weight", 1.0)))
    a, b_ = qw * F.col("_score0"), rqw * F.col("_rescore")
    mode = str(rspec.get("score_mode", "total"))
    blend = {
        "total": a + b_,
        "multiply": a * b_,
        "avg": (a + b_) / F.lit(2.0),
        "max": F.greatest(a, b_),
        "min": F.least(a, b_),
    }.get(mode)
    if blend is None:
        raise ValueError(f"unsupported rescore score_mode: {mode}")
    rpred = F.coalesce(
        compile_query(_normalize(rspec["rescore_query"]), id_field),
        F.lit(False),
    )
    return top.withColumn(
        "_score", F.round(F.when(rpred, blend).otherwise(a), 6)
    ).drop("_score0", "_rescore")


def score_frame(
    df: DataFrame,
    query: dict,
    id_field: str = "_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    stats_over: DataFrame | None = None,
    explain: bool = False,
) -> DataFrame:
    """``df`` + a ``_score`` column for ``query`` (score context), rounded
    to 6 decimals.  Rows are NOT filtered — callers apply the filter
    predicate separately (``es_scored_search`` does both).

    ``explain`` adds an ``_explanation`` JSON column per row: the final
    value, the BM25 parameters, the normalized clause tree, each scored
    text field's per-term partial map, and each keyword term leaf's idf —
    the numbers a consumer needs to audit a score.  (Live ES renders a
    Lucene explanation TREE; this compact object form is the documented
    equivalent for a flat frame.)"""
    q = _normalize(query)
    comp = _ScoreCompiler(id_field)
    comp.collect(q)
    out = df
    for field, terms in sorted(comp.field_terms.items()):
        if not terms:
            continue
        out = out.join(
            _term_score_map(df, id_field, field, terms, k1, b, stats_over),
            id_field, "left",
        )
    for gi, (flds, terms) in enumerate(comp.xf_groups):
        for m in _xf_term_score_maps(df, id_field, flds, set(terms),
                                     k1, b, gi, stats_over):
            out = out.join(m, id_field, "left")
    for gi, (flds, boosts, terms) in enumerate(comp.cf_groups):
        out = out.join(
            _cf_term_score_map(df, id_field, flds, boosts, terms,
                               k1, b, gi, stats_over),
            id_field, "left",
        )
    if comp.term_leaves:
        # exact-keyword idf per term leaf, all in ONE 1-row aggregate,
        # broadcast back (score = idf: tf=1 and dl=avgdl for a keyword)
        n = F.count(F.lit(1)).cast("double")
        aggs = []
        for i, (field, value) in enumerate(comp.term_leaves):
            dfc = F.sum((F.col(field) == F.lit(value)).cast("int")).cast("double")
            aggs.append(
                F.round(
                    F.log(F.lit(1.0) + (n - dfc + 0.5) / (dfc + 0.5)), 6
                ).alias(f"_idf_{i}")
            )
        out = out.crossJoin(F.broadcast(
            (stats_over if stats_over is not None else df).agg(*aggs)))
    score = F.round(comp.build(q), 6)
    out = out.withColumn("_score", score)
    if explain:
        import json as _json

        fields = [f for f in sorted(comp.field_terms) if comp.field_terms[f]]
        expl = F.to_json(F.struct(
            F.col("_score").alias("value"),
            F.lit(f"score(k1={k1}, b={b}), clause tree: "
                  + _json.dumps(q, sort_keys=True, default=str)
                  ).alias("description"),
            *[F.col(_tsmap_name(f)).alias(f"bm25_partials_{f}")
              for f in fields],
            *[F.col(f"_idf_{i}").alias(
                "idf_" + "".join(ch if ch.isalnum() else "_"
                                 for ch in f"{fld}_{val}"))
              for i, (fld, val) in enumerate(comp.term_leaves)],
        ))
        out = out.withColumn("_explanation", expl)
    drop = [c for c in out.columns
            if c.startswith(("_tsmap_", "_idf_", "_xfmap_", "_cfmap_"))]
    return out.drop(*drop)


def es_retriever_search(
    df: DataFrame,
    body: dict,
    id_field: str = "_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str | None = None,
    rerank_models: "dict[str, dict] | None" = None,
) -> DataFrame:
    """ES 8.14 ``retriever`` search API (round 12): a retriever TREE in
    place of ``query`` — ``standard`` (a query-DSL retriever, ranked by
    BM25 ``_score``, optional ``filter``), ``knn`` (exact cosine top-k
    via the canonical rounded-before-rank helper, optional ``filter``
    pre-restricting candidates), ``rrf`` (reciprocal-rank fusion of
    child retrievers with ``rank_constant`` / ``rank_window_size``),
    ``linear`` (ES 8.18: weighted sum of per-child normalized
    scores — minmax / l2_norm / none — fused as union + one groupBy,
    round 14 second batch), and ``text_similarity_reranker`` (ES 8.15:
    rerank the child's top window with the deterministic linear model
    named by ``inference_id`` in ``rerank_models=`` — round 15, see
    the branch comment for the scoring contract).

    A single (non-rrf) root returns the retriever's REAL score —
    ``_score`` (BM25 or rounded cosine) plus ``rank``; an ``rrf`` root
    returns the fused ``rrf_score`` plus ``rank``.  Either way the
    body's ``_source`` columns join back onto the ≤ size result (a
    broadcast join).  Unknown body keys and unknown retriever options
    reject loudly (the validate_body_keys contract), as do
    ``query``-beside-``retriever`` and ``rank_window_size < size``.

    Scale shape: each child retriever is its own pushed-down top-window
    (TakeOrderedAndProject); the fusion unions the tiny ranked frames
    (operators/retrieval.py::rrf_fuse) — the heavy work happened inside
    each retriever, exactly ES's per-shard rank-then-fuse layout."""
    from pyspark.sql.window import Window

    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import cosine_topk

    unknown = set(body) - {"retriever", "size", "_source"}
    if unknown:
        raise ValueError(
            "unsupported retriever body key(s): "
            f"{sorted(unknown)} (a `query` beside `retriever` is the "
            "mutually-exclusive form ES rejects too)")
    spec = body.get("retriever")
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError("retriever body needs exactly one retriever root")
    size = int(body.get("size", 10))

    def ranked(node: dict, window: int) -> DataFrame:
        """(id, _score, rank) for one child retriever."""
        if not isinstance(node, dict) or len(node) != 1:
            raise ValueError("each retriever needs exactly one type key")
        (rkind, rbody), = node.items()
        if rkind == "standard":
            unk = set(rbody) - {"query", "filter"}
            if unk:
                raise ValueError(
                    f"unsupported standard retriever option(s): "
                    f"{sorted(unk)}")
            q = rbody["query"]
            if "filter" in rbody:
                q = {"bool": {"must": [q], "filter": [rbody["filter"]]}}
            sub = {"query": q, "size": window, "_source": [id_field]}
            hits = es_scored_search(df, sub, id_field,
                                    k1=k1, b=b, analyzer=analyzer)
            w = Window.orderBy(F.col("_score").desc(),
                               F.col(id_field).asc())
            return hits.select(id_field, "_score",
                               F.row_number().over(w).alias("rank"))
        if rkind == "knn":
            unk = set(rbody) - {"field", "query_vector", "k", "filter",
                                "num_candidates"}
            if unk:
                raise ValueError(
                    f"unsupported knn retriever option(s): {sorted(unk)}")
            cand = df
            if "filter" in rbody:
                from .query_dsl import compile_query, expand_lookups

                inner = expand_lookups(df, rbody["filter"], id_field)
                cand = cand.where(F.coalesce(
                    compile_query(inner, id_field), F.lit(False)))
            kk = min(int(rbody.get("k", window)), window)
            # canonical rounded-before-rank exact cosine (the engine-
            # stable ordering rule every knn surface follows)
            top = cosine_topk(cand, [float(x) for x in
                                     rbody["query_vector"]],
                              k=kk, id_col=id_field,
                              vec_col=rbody["field"])
            w = Window.orderBy(F.col("score").desc(),
                               F.col(id_field).asc())
            return top.select(
                id_field, F.col("score").alias("_score"),
                F.row_number().over(w).alias("rank"))
        if rkind == "text_similarity_reranker":
            # ES 8.15 semantic reranker retriever (round 15, VERDICT
            # r14 #5): fetch the child's top rank_window_size, rescore
            # each (inference_text, doc field) pair with the model
            # behind inference_id, re-order by the new score.  Live ES
            # calls an inference endpoint (usually LLM-backed); an
            # offline engine cannot serve those, so inference_id must
            # name a DETERMINISTIC linear model supplied via the
            # rerank_models= parameter — {"weights": {term: w},
            # "default_weight": dw, "bias": b, "analyzer": a} — scored
            # as sigmoid(bias + Σ over doc-token occurrences that
            # appear in the analyzed inference_text of weights[token])
            # through the SAME fold/sigmoid sites as the quality
            # classifier (operators/classify.py — one rounding rule,
            # oracle-replayable).  Query terms not in the weight table
            # take default_weight, so a bare model is tf-weighted
            # query-term overlap.  Unknown inference ids reject loudly.
            unk = set(rbody) - {"retriever", "field", "inference_id",
                                "inference_text", "rank_window_size",
                                "min_score"}
            if unk:
                raise ValueError(
                    "unsupported text_similarity_reranker option(s): "
                    f"{sorted(unk)}")
            for req in ("retriever", "field", "inference_id",
                        "inference_text"):
                if req not in rbody:
                    raise ValueError(
                        f"text_similarity_reranker needs {req!r}")
            mid = rbody["inference_id"]
            models = rerank_models or {}
            if mid not in models:
                raise ValueError(
                    f"unknown rerank inference_id {mid!r} — this "
                    "engine serves only deterministic linear models "
                    "passed via rerank_models= (available: "
                    f"{sorted(models)}); remote/LLM-backed inference "
                    "endpoints are not servable offline")
            model = models[mid]
            munk = set(model) - {"weights", "default_weight", "bias",
                                 "analyzer"}
            if munk:
                raise ValueError(
                    f"unsupported rerank model option(s): {sorted(munk)} "
                    "(weights | default_weight | bias | analyzer)")
            from ..operators.classify import (
                _sigmoid_col,
                _weight_lookup,
                _weighted_fold,
            )

            child_window = int(rbody.get("rank_window_size",
                                         max(window, 10)))
            if child_window < window:
                raise ValueError(
                    f"rank_window_size ({child_window}) must be >= the "
                    f"consuming window ({window})")
            if child_window > 10_000:
                # the window ids are COLLECTED to push the text-fetch
                # In filter, so the window must stay bounded — live ES
                # enforces the same ceiling (index.max_result_window,
                # default 10000) on rank_window_size
                raise ValueError(
                    f"rank_window_size ({child_window}) exceeds 10000 "
                    "(the index.max_result_window ceiling live ES "
                    "applies; the rerank window is collected driver-"
                    "side to push the text-fetch filter)")
            child = ranked(rbody["retriever"], child_window)
            m_an = model.get("analyzer")
            qtoks = _analyze_terms(str(rbody["inference_text"]), m_an)
            if not qtoks:
                raise ValueError(
                    "text_similarity_reranker inference_text analyzed "
                    "to no tokens")
            weights = model.get("weights") or {}
            dw = float(model.get("default_weight", 1.0))
            eff = {t: float(weights.get(t, dw))
                   for t in dict.fromkeys(qtoks)}
            field = rbody["field"]
            # the child frame is <= child_window rows (a bounded,
            # user-set window) — collect its ids and push an In filter
            # into the corpus scan, so the text fetch prunes row groups
            # instead of re-scanning the whole text column (a broadcast
            # semi-join still paid a corpus-sized column read — probed
            # +1.0 s at 1M docs, tools/probe_round15.py #4).  Same
            # bounded-collect shape as the terms-lookup and rescore
            # windows.
            win_ids = [r[0] for r in child.select(id_field).collect()]
            docs = df.select(id_field, field).where(
                F.col(id_field).isin(win_ids))
            score = _sigmoid_col(
                _weighted_fold(analyze_col(field, m_an),
                               _weight_lookup(eff)),
                float(model.get("bias", 0.0)))
            scored = docs.select(id_field, score.alias("_score"))
            if "min_score" in rbody:
                scored = scored.where(
                    F.col("_score") >= float(rbody["min_score"]))
            w = Window.orderBy(F.col("_score").desc(),
                               F.col(id_field).asc())
            return (scored
                    .select(id_field, "_score",
                            F.row_number().over(w).alias("rank"))
                    .where(F.col("rank") <= window))
        if rkind == "pinned":
            # ES 8.18 pinned retriever: the named docs rank FIRST in
            # their given order, then the child retriever's organic
            # results with the pinned ids removed — the same
            # descending-1e10 pin scores and dedup the rule retriever's
            # pin path uses (one mechanism, two surfaces).
            unk = set(rbody) - {"retriever", "ids", "docs",
                                "rank_window_size"}
            if unk:
                raise ValueError(
                    f"unsupported pinned retriever option(s): "
                    f"{sorted(unk)}")
            if ("ids" in rbody) == ("docs" in rbody):
                raise ValueError(
                    "pinned retriever needs exactly one of ids | docs")
            if "docs" in rbody:
                pinned = []
                for d in rbody["docs"]:
                    dunk = set(d) - {"_id", "_index"}
                    if dunk or "_id" not in d:
                        raise ValueError(
                            "pinned docs entries take _id (+ optional "
                            f"_index), got {sorted(d)}")
                    pinned.append(str(d["_id"]))
            else:
                pinned = [str(i) for i in rbody["ids"]]
            if not pinned:
                raise ValueError("pinned retriever needs >= 1 pin")
            if len(set(pinned)) != len(pinned):
                raise ValueError("pinned ids must be distinct")
            child_window = int(rbody.get("rank_window_size",
                                         max(window, 10)))
            if child_window < window:
                raise ValueError(
                    f"rank_window_size ({child_window}) must be >= "
                    f"the consuming window ({window})")
            child = ranked(rbody["retriever"], child_window)
            idc = F.col(id_field).cast("string")
            child = child.where(~idc.isin(pinned))
            score = F.lit(None).cast("double")
            for i in range(len(pinned) - 1, -1, -1):
                score = F.when(idc == pinned[i],
                               F.lit(1e10 - i)).otherwise(score)
            pins = (df.where(idc.isin(pinned))
                    .select(id_field, score.alias("_score"),
                            F.lit(0).alias("rank")))
            merged = child.select(id_field, "_score", "rank") \
                .unionByName(pins)
            w = Window.orderBy(F.col("_score").desc(),
                               F.col(id_field).asc())
            return (merged
                    .select(id_field, "_score",
                            F.row_number().over(w).alias("rank"))
                    .where(F.col("rank") <= window))
        if rkind == "rescorer":
            # ES 8.18 rescorer retriever: apply a query rescore to the
            # child retriever's top window — the SAME
            # _apply_query_rescore construction as the search body's
            # ``rescore`` (score_frame against index-wide stats,
            # score_mode blend, Lucene's non-matching combine), so the
            # two surfaces cannot drift.  The window ids are collected
            # (bounded by the same 10 000 max_result_window ceiling as
            # the reranker) to push an In filter into the doc fetch.
            unk = set(rbody) - {"retriever", "rescore",
                                "rank_window_size"}
            if unk:
                raise ValueError(
                    f"unsupported rescorer retriever option(s): "
                    f"{sorted(unk)}")
            for req in ("retriever", "rescore"):
                if req not in rbody:
                    raise ValueError(f"rescorer retriever needs {req!r}")
            rescore = rbody["rescore"]
            if isinstance(rescore, list):
                if len(rescore) != 1:
                    raise ValueError("only a single rescorer is "
                                     "supported")
                rescore = rescore[0]
            runk = set(rescore) - {"query", "window_size"}
            if runk:
                raise ValueError(
                    f"unsupported rescore option(s): {sorted(runk)}")
            rspec = dict(rescore["query"])
            child_window = int(rescore.get(
                "window_size", int(rbody.get("rank_window_size",
                                             max(window, 10)))))
            if child_window < window:
                raise ValueError(
                    f"rescore window_size ({child_window}) must be >= "
                    f"the consuming window ({window})")
            if child_window > 10_000:
                raise ValueError(
                    f"rescore window_size ({child_window}) exceeds "
                    "10000 (the index.max_result_window ceiling; the "
                    "window is collected driver-side to push the doc-"
                    "fetch filter)")
            from .query_dsl import expand_lookups

            rspec["rescore_query"] = expand_lookups(
                df, rspec["rescore_query"], id_field)
            child = ranked(rbody["retriever"], child_window)
            # materialize the ≤window child frame ONCE (the body-
            # rescore LocalRelation rule): collecting only the ids and
            # re-referencing the child plan would re-run its whole
            # scoring pipeline at every downstream consumer
            win_plan = child.select(id_field,
                                    F.col("_score").alias("_score0"))
            win_rows = win_plan.collect()
            win = df.sparkSession.createDataFrame(
                win_rows, win_plan.schema)
            win_ids = [r[0] for r in win_rows]
            top = df.where(F.col(id_field).isin(win_ids)) \
                .join(F.broadcast(win), id_field)
            rescored = _apply_query_rescore(
                top, rspec, id_field, k1=k1, b=b, stats_over=df)
            w = Window.orderBy(F.col("_score").desc(),
                               F.col(id_field).asc())
            return (rescored
                    .select(id_field, "_score",
                            F.row_number().over(w).alias("rank"))
                    .where(F.col("rank") <= window))
        if rkind == "rule":
            # ES 8.16 rule retriever: apply query rules on top of a
            # child retriever.  Rule evaluation is pure driver-side
            # Python over plan literals (plans/rules.matched_rule_ids —
            # the SAME matcher the `rule` query rewrite uses, so the
            # two surfaces cannot drift): matched exclude rules drop
            # their ids from the child window, matched pinned rules
            # inject their ids ABOVE every organic hit with the pinned
            # query's score rule (1e10 - position — one constant, both
            # surfaces).  Pinned docs are injected even when the child
            # window missed them (the pinned-query semantics: promoted
            # docs need not match the organic query) — that fetch is an
            # isin over <= 100 ids, pruned at the scan.  The re-rank is
            # one tiny global window over <= rank_window_size + 100
            # rows.
            unk = set(rbody) - {"retriever", "ruleset_ids",
                                "match_criteria", "rank_window_size"}
            if unk:
                raise ValueError(
                    f"unsupported rule retriever option(s): "
                    f"{sorted(unk)}")
            for req in ("retriever", "ruleset_ids", "match_criteria"):
                if req not in rbody:
                    raise ValueError(f"rule retriever needs {req!r}")
            from .rules import matched_rule_ids

            pinned, excluded = matched_rule_ids(
                rbody["ruleset_ids"], rbody["match_criteria"],
                what="rule retriever")
            child_window = int(rbody.get("rank_window_size",
                                         max(window, 10)))
            if child_window < window:
                raise ValueError(
                    f"rank_window_size ({child_window}) must be >= "
                    f"the consuming window ({window})")
            child = ranked(rbody["retriever"], child_window)
            idc = F.col(id_field).cast("string")
            if excluded:
                child = child.where(~idc.isin(excluded))
            if pinned:
                child = child.where(~idc.isin(pinned))
                score = F.lit(None).cast("double")
                for i in range(len(pinned) - 1, -1, -1):
                    score = F.when(idc == pinned[i],
                                   F.lit(1e10 - i)).otherwise(score)
                pins = (df.where(idc.isin(pinned))
                        .select(id_field, score.alias("_score"),
                                F.lit(0).alias("rank")))
                child = child.select(id_field, "_score", "rank") \
                    .unionByName(pins)
            w = Window.orderBy(F.col("_score").desc(),
                               F.col(id_field).asc())
            return (child
                    .select(id_field, "_score",
                            F.row_number().over(w).alias("rank"))
                    .where(F.col("rank") <= window))
        raise ValueError(
            f"unsupported retriever: {rkind!r} "
            "(standard | knn | rrf | linear | rule | pinned | "
            "rescorer | text_similarity_reranker)")

    (kind, spec_body), = spec.items()
    if kind == "linear":
        # ES 8.18 linear retriever: weighted sum of per-child
        # NORMALIZED scores — each child entry is {"retriever": node,
        # "weight": w, "normalizer": "minmax"|"l2_norm"|"none"}.  A doc
        # absent from a child's top window contributes 0 from that
        # child (ES's convention).  Documented edge: a degenerate
        # minmax window (max == min) normalizes every member to 1.0 —
        # they are jointly the child's best hits; ES leaves this case
        # unspecified.  Scale shape identical to rrf: the heavy work is
        # inside each child's pushed-down top-window; normalization is
        # one tiny global-window pass per ≤window-row child frame and
        # the fusion is a union + ONE groupBy on the id.
        from pyspark.sql.window import Window as _W

        unknown = set(spec_body) - {"retrievers", "rank_window_size"}
        if unknown:
            raise ValueError(
                f"unsupported linear option(s): {sorted(unknown)}")
        window = int(spec_body.get("rank_window_size", max(size, 10)))
        if window < size:
            raise ValueError(
                f"rank_window_size ({window}) must be >= size ({size})")
        entries = spec_body.get("retrievers") or []
        if len(entries) < 2:
            raise ValueError("linear needs at least two child retrievers")
        parts = []
        for ent in entries:
            unk = set(ent) - {"retriever", "weight", "normalizer"}
            if unk:
                raise ValueError(
                    "unsupported linear child option(s): "
                    f"{sorted(unk)}")
            norm = str(ent.get("normalizer", "none"))
            if norm not in ("minmax", "l2_norm", "none"):
                raise ValueError(
                    f"unsupported linear normalizer {norm!r} "
                    "(minmax | l2_norm | none)")
            child = ranked(ent["retriever"], window)
            wall = _W.partitionBy(F.lit(1))
            s = F.col("_score")
            if norm == "minmax":
                mn = F.min(s).over(wall)
                mx = F.max(s).over(wall)
                ns = F.when(mx == mn, F.lit(1.0)).otherwise(
                    (s - mn) / (mx - mn))
            elif norm == "l2_norm":
                l2 = F.sqrt(F.sum(s * s).over(wall))
                ns = F.when(l2 == 0, F.lit(0.0)).otherwise(s / l2)
            else:
                ns = s
            w = float(ent.get("weight", 1.0))
            parts.append(child.select(
                id_field,
                F.round(ns * F.lit(w), 6).alias("_part")))
        uni = parts[0]
        for prt in parts[1:]:
            uni = uni.unionByName(prt)
        fused = (
            uni.groupBy(id_field)
            .agg(F.round(F.sum("_part"), 6).alias("linear_score"))
            .orderBy(F.col("linear_score").desc(), F.col(id_field).asc())
            .limit(size)
        )
        fw = _W.orderBy(F.col("linear_score").desc(),
                        F.col(id_field).asc())
        fused = fused.withColumn("rank", F.row_number().over(fw))
        score_col = "linear_score"
    elif kind == "rrf":
        unknown = set(spec_body) - {"retrievers", "rank_constant",
                                    "rank_window_size"}
        if unknown:
            raise ValueError(
                f"unsupported rrf option(s): {sorted(unknown)}")
        window = int(spec_body.get("rank_window_size", max(size, 10)))
        if window < size:
            raise ValueError(
                f"rank_window_size ({window}) must be >= size ({size})")
        children = [ranked(r, window).drop("_score")
                    for r in spec_body["retrievers"]]
        if len(children) < 2:
            raise ValueError("rrf needs at least two child retrievers")
        fused = rrf_fuse(children, id_col=id_field,
                         k=int(spec_body.get("rank_constant", 60)),
                         top_k=size)
        score_col = "rrf_score"
    else:
        fused = ranked({kind: spec_body}, size)
        score_col = "_score"
    src = body.get("_source")
    if not src:
        return fused
    return (
        df.select(id_field, *[c for c in src if c != id_field])
        .join(F.broadcast(fused), id_field)
        .select(id_field, score_col, "rank",
                *[c for c in src if c != id_field])
    )


def es_scored_search(
    df: DataFrame,
    body: dict,
    id_field: str = "_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str | None = None,
) -> DataFrame:
    """Public entry: scopes the analysis chain (``analyzer`` — standard
    default / whitespace fallback, ``plans/analysis.py``) around the plan
    build, then delegates.  Full semantics on ``_es_scored_search_impl``.

    NOTE (eager plan build): a body with ``rescore`` runs a bounded
    Spark job AT PLAN-BUILD TIME — the ≤ ``window_size`` top-window
    frame is collected once so the rescore corpus reduces to a 1-row
    broadcast aggregate (VERDICT r8 #4).  Every other body shape is
    fully lazy; callers scheduling actions should expect the rescore
    case to touch the cluster before the returned DataFrame is acted
    on."""
    from .analysis import preanalyzed, using
    from .query_dsl import validate_body_keys
    from .rules import expand_rule_queries

    validate_body_keys(body)
    if body.get("query"):
        # query-rules pre-pass (round 14): ``rule`` nodes rewrite to
        # pinned/bool over literals before any compiler walks the tree
        body = {**body, "query": expand_rule_queries(body["query"])}
    with using(analyzer):
        from .analysis import current_analyzer

        # only columns built under THIS search's analyzer are eligible —
        # the grammar is part of the column name, so a frame shared
        # across analyzers simply falls back to inline tokenizing for
        # the mismatched one (code-review r12)
        want = f"{ANALYZED_PREFIX}{current_analyzer()}__"
        pre = {c[len(want):]: c for c in df.columns
               if c.startswith(want)}
        if pre:
            # the frame carries materialized shared-analysis streams
            # (with_shared_analysis / es_msearch scored) — let every
            # compile site read them instead of re-tokenizing
            with preanalyzed(pre):
                return _es_scored_search_impl(df, body, id_field,
                                              k1=k1, b=b)
        return _es_scored_search_impl(df, body, id_field, k1=k1, b=b)


def _es_scored_search_impl(
    df: DataFrame,
    body: dict,
    id_field: str = "_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES search in SCORE context: filter by the query, rank by BM25
    ``_score`` (or the body's explicit ``sort``, where ``_score`` is a
    legal key), apply ``min_score`` / ``from`` / ``size``, project
    ``_source`` + ``_score``.

    ``rescore`` re-ranks the top ``window_size`` hits with a second query
    (scored AFTER the window cut against corpus-wide statistics — the
    window cut is a TakeOrderedAndProject, never a global sort), blended
    by ``score_mode`` total/multiply/avg/max/min with query_weight /
    rescore_query_weight.  ``collapse`` keeps the best hit per field value
    (WindowGroupLimit); ``highlight`` wraps the query's terms (the query
    is normalized first, so query_string bodies highlight too).

    Top-k compiles to TakeOrderedAndProject over the scored frame — the
    only data-scale shuffles are the term-partial aggregate (query-term
    hits only) and one id join per scored text field."""
    from .query_dsl import (
        _strip_names,
        apply_slice,
        expand_lookups,
        named_queries_column,
    )

    # sliced scored exports partition BEFORE scoring (ADVICE r12: "slice"
    # was whitelisted in _BODY_KEYS but only the filter-context path
    # consumed it, silently duplicating the full corpus per worker).  The
    # slice predicate restricts the HIT SET only; everything INDEX-WIDE
    # stays on the pre-slice frame — corpus statistics (stats_over),
    # plan-build data lookups (terms lookup / more_like_this must see
    # the referenced doc even when it lands in another slice), and the
    # knn top-k (each slice exports "global top-k ∩ slice", so the
    # union of slices is exactly the unsliced hit set) — matching ES
    # where slices share shard-level state (code-review r13: expanding
    # against the sliced frame silently dropped hits from slices not
    # containing the lookup doc)
    _pre_slice = df
    df, body = apply_slice(df, body, id_field)
    _slice_stats = _pre_slice if df is not _pre_slice else None
    knn = body.get("knn")
    knn_only = knn is not None and "query" not in body
    query = body.get("query", {"match_all": {}})

    query = expand_lookups(_pre_slice, query, id_field)
    # named queries ride the scored path too: the column is computed on
    # the input frame (flows through every downstream join/cut) and the
    # compile/score tree sees the stripped body
    mq = named_queries_column(query, id_field) if "query" in body else None
    # stripped unconditionally: a _name the collector's walk misses must
    # still never reach the positional spec compilers (code-review r9)
    query = _strip_names(query)
    extra_named: list[str] = []
    if mq is not None:
        df = df.withColumn("matched_queries", mq)
        extra_named.append("matched_queries")
    want_explain = bool(body.get("explain"))
    if want_explain and (knn is not None or body.get("rescore") is not None):
        # the knn/rescore blends rewrite _score AFTER score_frame stamps
        # the explanation, which would break the value == _score contract
        # (code-review r9) — reject loudly rather than explain stale math
        raise ValueError(
            "explain is not supported together with knn or rescore"
        )
    if knn_only:
        # a knn-only body returns exactly the top-k — no match_all
        # baseline score, no non-knn hits (and nothing to explain)
        if want_explain:
            raise ValueError("explain is not supported for knn-only bodies")
        scored = df.withColumn("_score", F.lit(0.0))
    else:
        scored = score_frame(df, query, id_field, k1=k1, b=b,
                             stats_over=_slice_stats,
                             explain=want_explain)
    if knn is not None:
        # ES 8 combined retrieval: the hit set is the UNION of the query's
        # matches and the kNN top-k, and _score SUMS both contributions —
        # this is the true hybrid shape (es_search's filter-context knn
        # treats `query` as a hard pre-filter instead, documented there).
        # The top-k cut is a TakeOrderedAndProject on exact cosine; the
        # k-row id frame broadcasts back, so the knn side adds no shuffle.
        from ..operators.similarity import _cosine_to_literal

        field, qv = knn["field"], [float(x) for x in knn["query_vector"]]
        k = int(knn.get("k", 10))
        qarr = F.array(*[F.lit(x) for x in qv])
        sim = F.round(
            (F.lit(1.0) + _cosine_to_literal(F.col(field), qarr, qv))
            / F.lit(2.0), 6,
        )
        # top-k over the PRE-SLICE frame: the slice intersects below via
        # the join against the (sliced) scored frame, so slices union to
        # exactly the unsliced knn hit set (code-review r13)
        cand = _pre_slice
        if "filter" in knn:
            cand = cand.where(
                F.coalesce(compile_query(
                    expand_lookups(_pre_slice, knn["filter"], id_field),
                    id_field),
                    F.lit(False))
            )
        top_ids = (
            cand.select(F.col(id_field).alias("_knn_id"),
                        sim.alias("_knn_score"))
            .orderBy(F.col("_knn_score").desc(), F.col("_knn_id").asc())
            .limit(k)
        )
        scored = scored.join(
            F.broadcast(top_ids),
            scored[id_field] == top_ids["_knn_id"], "left",
        ).drop("_knn_id")
        scored = scored.withColumn(
            "_score",
            F.round(F.col("_score") + F.coalesce("_knn_score", F.lit(0.0)), 6),
        )
    rescore = body.get("rescore")
    if isinstance(rescore, list):
        # ES accepts a list of rescorers; one is supported — reject the
        # chained form loudly instead of a TypeError deep in the dict walk
        if len(rescore) != 1:
            raise ValueError("only a single rescorer is supported")
        rescore = rescore[0]
    if rescore is not None:
        # the rescore query's own scoring is DEFERRED until after the
        # window cut (VERDICT r8 #4): only the corpus-wide statistics
        # need a full pass — the per-doc tsmap join happens on the
        # ≤ window_size frame below
        rspec = dict(rescore["query"])
        rspec["rescore_query"] = expand_lookups(
            _pre_slice, rspec["rescore_query"], id_field)
        scored = scored.withColumnRenamed("_score", "_score0")
    # hit-set filter: query matches, or with knn the UNION of query
    # matches and the top-k.  The predicate stays RAW in the plain WHERE
    # (NULL rows drop exactly like false, and a coalesce() wrapper blocks
    # ALL parquet PushedFilters — the r8 bool-pushdown fix; this path had
    # kept the wrapper, so every scored search read every row group).
    # Only the knn-union OR needs NULL→false coalescing (a NULL qpred
    # would poison the disjunction for knn-only hits).
    if knn_only:
        qpred = F.lit(False)
    else:
        qpred = compile_query(_normalize(query), id_field)
    if knn is not None:
        scored = scored.where(
            F.coalesce(qpred, F.lit(False)) | F.col("_knn_score").isNotNull()
        ).drop("_knn_score")
    else:
        scored = scored.where(qpred)
    if body.get("post_filter"):
        # hits narrow further AFTER scoring (scores/aggs are
        # post_filter-blind, like ES); applies to the knn-union hit set
        # too.  The rescore window's interplay with post_filter is
        # unspecified in ES's docs — reject the combination rather than
        # pick silently.
        if rescore is not None:
            raise ValueError("post_filter cannot combine with rescore")
        scored = scored.where(compile_query(
            _strip_names(expand_lookups(
                _pre_slice, body["post_filter"], id_field)),
            id_field))
    if "min_score" in body:
        mcol = "_score0" if rescore is not None else "_score"
        scored = scored.where(F.col(mcol) >= F.lit(float(body["min_score"])))
    sort_spec = body.get("sort")
    if rescore is not None:
        if sort_spec:
            raise ValueError("rescore cannot be combined with an explicit sort")
        window_size = int(rescore.get("window_size", 10))
        offset0 = int(body.get("from", 0))
        size0 = int(body.get("size", 10))
        if offset0 + size0 > window_size:
            raise ValueError(
                f"rescore window_size {window_size} must cover from+size "
                f"{offset0 + size0} (hits beyond the window keep their "
                "original order and never reach this page)"
            )
        # the window frame has TWO consumers below (the blend projection
        # and the rescore tf/tsmap subtree) — materialize its ≤
        # window_size rows once into a LocalRelation so the first-pass
        # pipeline executes exactly once and nothing stays cached after
        # the call (code-review r9: persist() leaked one cached frame per
        # rescore query).  The bounded collect is the same driver-work
        # class as the suggesters' candidate frames; it does make the
        # rescore path eager at plan-build time.
        top_plan = scored.orderBy(
            F.col("_score0").desc(), F.col(id_field).asc()
        ).limit(window_size)
        top = df.sparkSession.createDataFrame(
            top_plan.collect(), top_plan.schema)
        # Lucene rescores WINDOW docs against INDEX-wide stats: tf/dl and
        # the tsmap join cover the ≤ window_size frame only, while
        # stats_over=df contributes N/avgdl/per-term-df as ONE 1-row
        # broadcast corpus aggregate — no full-corpus id shuffle
        # (VERDICT r8 #4; plan-asserted in tests/test_scoring.py,
        # measured in tools/probe_round9.py)
        scored = _apply_query_rescore(
            top, rspec, id_field, k1=k1, b=b, stats_over=_pre_slice)
    if sort_spec:
        # reuse es_search's _sort_columns (missing/mode/_geo_distance
        # handling identical between the filter and scored paths, ADVICE
        # r8) — only the _score default direction differs: ES defaults
        # _score to DESC where every plain field defaults to ASC, so
        # bare/unordered _score entries are normalized before delegating
        # (_score is an ordinary column of the scored frame by now)
        from .query_dsl import _sort_columns

        norm = []
        for s in sort_spec:
            if s == "_score":
                norm.append({"_score": {"order": "desc"}})
            elif isinstance(s, dict) and set(s) == {"_score"}:
                fspec = s["_score"]
                order = (fspec.get("order") if isinstance(fspec, dict)
                         else fspec) or "desc"
                norm.append({"_score": {"order": order}})
            else:
                norm.append(s)
        cols = _sort_columns(norm)
    else:
        cols = [F.col("_score").desc(), F.col(id_field).asc()]
    if body.get("collapse"):
        # best hit per distinct field value by the effective sort —
        # WindowGroupLimit, same shape as the filter-context path
        from pyspark.sql.window import Window

        cw = Window.partitionBy(body["collapse"]["field"]).orderBy(*cols)
        scored = (
            scored.withColumn("_collapse_rank", F.row_number().over(cw))
            .where(F.col("_collapse_rank") == 1)
            .drop("_collapse_rank")
        )
    offset = int(body.get("from", 0))
    size = int(body.get("size", 10))
    scored = scored.orderBy(*cols).limit(offset + size)
    if offset:
        from pyspark.sql.window import Window

        w = Window.orderBy(*cols)
        scored = (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > offset).drop("_rn")
        )
    extra_cols: list[str] = []
    if body.get("highlight"):
        from .query_dsl import _apply_highlight

        # normalize first so query_string / simple_query_string bodies
        # contribute their parsed terms to the highlighter
        scored, extra_cols = _apply_highlight(
            scored, {**body, "query": _normalize(query)}
        )
    from .query_dsl import _apply_response_fields

    expl_cols = (["_explanation"]
                 if "_explanation" in scored.columns else [])
    return _apply_response_fields(
        scored, body, ["_score", *extra_cols, *extra_named, *expl_cols])
