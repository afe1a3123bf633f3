"""Property test: random ES bool-query trees compiled by query_dsl must
agree with a direct Python evaluator on every row of a fixed corpus.

One Spark evaluation per example would cost ~100 ms each; instead all
hypothesis-generated trees are COLLECTED first, compiled into one wide
select (one boolean column per tree), and evaluated in a single Spark
pass — the property stays per-tree, the Spark cost stays O(1).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hive2es_offline_spark.plans.query_dsl import compile_query

ROWS = [
    {"id": 0, "s": "alpha", "n": 5.0, "txt": "quick brown fox"},
    {"id": 1, "s": "beta", "n": 15.0, "txt": "lazy dog"},
    {"id": 2, "s": "gamma", "n": 25.0, "txt": "quick red fox"},
    {"id": 3, "s": "alpha", "n": 35.0, "txt": "brown bear"},
    {"id": 4, "s": "delta", "n": None, "txt": "quick"},
]

STRINGS = ["alpha", "beta", "gamma", "delta", "omega"]
TOKENS = ["quick", "brown", "fox", "lazy", "dog", "bear"]


def leaf_clauses():
    return st.one_of(
        st.just({"match_all": {}}),
        st.sampled_from(STRINGS).map(lambda v: {"term": {"s": v}}),
        st.lists(st.sampled_from(STRINGS), min_size=1, max_size=3).map(
            lambda vs: {"terms": {"s": vs}}
        ),
        st.tuples(
            st.sampled_from(["gt", "gte", "lt", "lte"]),
            st.sampled_from([0.0, 10.0, 20.0, 30.0, 40.0]),
        ).map(lambda t: {"range": {"n": {t[0]: t[1]}}}),
        st.just({"exists": {"field": "n"}}),
        st.sampled_from(["al", "be", "ga", "x"]).map(lambda p: {"prefix": {"s": p}}),
        st.sampled_from(TOKENS).map(lambda t: {"match": {"txt": t}}),
        st.lists(st.sampled_from([0, 1, 2, 3, 4]), min_size=1, max_size=3).map(
            lambda ids: {"ids": {"values": ids}}
        ),
    )


def bool_trees(depth):
    if depth == 0:
        return leaf_clauses()
    sub = st.lists(bool_trees(depth - 1), min_size=0, max_size=2)
    return st.one_of(
        leaf_clauses(),
        st.fixed_dictionaries(
            {},
            optional={
                "must": sub,
                "filter": sub,
                "must_not": sub,
                "should": sub,
            },
        ).map(lambda b: {"bool": b}),
    )


def py_eval(q, row):
    """Reference evaluator with ES's TWO-valued semantics: a clause over a
    missing field does not match (never SQL-NULL)."""
    (kind, body), = q.items()
    if kind == "match_all":
        return True
    if kind == "term":
        return row["s"] == body["s"]
    if kind == "terms":
        return row["s"] in body["s"]
    if kind == "range":
        (op, v), = body["n"].items()
        if row["n"] is None:
            return False  # missing field: clause does not match
        return {"gt": row["n"] > v, "gte": row["n"] >= v,
                "lt": row["n"] < v, "lte": row["n"] <= v}[op]
    if kind == "exists":
        return row[body["field"]] is not None
    if kind == "prefix":
        return row["s"].startswith(body["s"])
    if kind == "match":
        return body["txt"] in row["txt"].lower().split()
    if kind == "ids":
        return row["id"] in body["values"]
    if kind == "bool":
        ok = all(py_eval(c, row) for c in body.get("must", []) + body.get("filter", []))
        ok = ok and not any(py_eval(c, row) for c in body.get("must_not", []))
        should = body.get("should", [])
        if should:
            msm = 0 if (body.get("must") or body.get("filter")) else 1
            if msm > 0:
                ok = ok and sum(py_eval(c, row) for c in should) >= msm
        return ok
    raise AssertionError(kind)


COLLECTED = []


@settings(max_examples=150, deadline=None)
@given(bool_trees(2))
def test_collect_trees(q):
    COLLECTED.append(q)


def test_compiled_trees_match_python_eval(spark):
    assert COLLECTED, "hypothesis collection must run first"
    df = spark.createDataFrame(
        [(r["id"], r["s"], r["n"], r["txt"]) for r in ROWS],
        "id long, s string, n double, txt string",
    )
    cols = [
        compile_query(q, "id").alias(f"q{i}") for i, q in enumerate(COLLECTED)
    ]
    got = df.select(F.col("id"), *cols).orderBy("id").collect()
    for i, q in enumerate(COLLECTED):
        for row_idx, r in enumerate(ROWS):
            expected = py_eval(q, r)
            # a top-level NULL filters the row exactly like False does, so
            # they are WHERE-equivalent; inside bool the compiler coalesces
            actual = bool(got[row_idx][f"q{i}"])
            assert actual == expected, (
                f"tree {q} row {r}: spark={actual} python={expected}"
            )
