"""Property test: random ES bool-query trees compiled by query_dsl must
agree with a direct Python evaluator on every row of a fixed corpus.

One Spark evaluation per tree would cost ~100 ms each; instead 200
seeded-random trees compile into ONE wide select (one boolean column per
tree) evaluated in a single Spark pass — the property stays per-tree, the
Spark cost stays O(1).  The generator is a plain ``random.Random(seed)``
recursion (not hypothesis's two-phase collect) so the test is order- and
selection-independent: it can run alone, sharded, or shuffled.
"""

import random

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


def random_leaf(rng: random.Random) -> dict:
    pick = rng.randrange(8)
    if pick == 0:
        return {"match_all": {}}
    if pick == 1:
        return {"term": {"s": rng.choice(STRINGS)}}
    if pick == 2:
        return {"terms": {"s": rng.sample(STRINGS, rng.randint(1, 3))}}
    if pick == 3:
        return {"range": {"n": {rng.choice(["gt", "gte", "lt", "lte"]):
                                rng.choice([0.0, 10.0, 20.0, 30.0, 40.0])}}}
    if pick == 4:
        return {"exists": {"field": "n"}}
    if pick == 5:
        return {"prefix": {"s": rng.choice(["al", "be", "ga", "x"])}}
    if pick == 6:
        return {"match": {"txt": rng.choice(TOKENS)}}
    return {"ids": {"values": rng.sample([0, 1, 2, 3, 4], rng.randint(1, 3))}}


def random_tree(rng: random.Random, depth: int) -> dict:
    if depth == 0 or rng.random() < 0.4:
        return random_leaf(rng)
    body = {}
    for section in ("must", "filter", "must_not", "should"):
        if rng.random() < 0.5:
            body[section] = [
                random_tree(rng, depth - 1) for _ in range(rng.randint(0, 2))
            ]
    return {"bool": body}


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


def test_compiled_trees_match_python_eval(spark):
    rng = random.Random(20260814)
    trees = [random_tree(rng, 2) for _ in range(200)]
    df = spark.createDataFrame(
        [(r["id"], r["s"], r["n"], r["txt"]) for r in ROWS],
        "id long, s string, n double, txt string",
    )
    cols = [compile_query(q, "id").alias(f"q{i}") for i, q in enumerate(trees)]
    got = df.select(F.col("id"), *cols).orderBy("id").collect()
    for i, q in enumerate(trees):
        for row_idx, r in enumerate(ROWS):
            expected = py_eval(q, r)
            # a top-level NULL filters the row exactly like False does, so
            # they are WHERE-equivalent; inside bool the compiler coalesces
            actual = bool(got[row_idx][f"q{i}"])
            assert actual == expected, (
                f"tree {q} row {r}: spark={actual} python={expected}"
            )
