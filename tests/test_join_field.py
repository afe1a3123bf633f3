"""Parent-child join-field queries: has_child / has_parent / parent_id
filter semantics, bool composability, and scored has_child score_mode."""

import math

import pytest

from hive2es_offline_spark.plans.join_field import es_parent_child

ROWS = [
    (1, "question", None, "spark streaming guide", 100),
    (2, "question", None, "batch processing", 500),
    (3, "answer", 1, "use merge and stream operators", 50),
    (4, "answer", 1, "merge works well", 60),
    (5, "answer", 2, "try merge", 70),
    (6, "comment", 1, "nice merge", 10),
    (7, "answer", None, "orphan merge", 5),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "id long, relation string, parent_id long, text string, n long"
    )


def _ids(res):
    return sorted(r["id"] for r in res.collect())


def test_has_child_returns_matching_parents(df):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": "merge"}}}},
        "size": 10, "_source": ["id"]}
    # doc 7 matches but has no parent; doc 6 matches but is a comment
    assert _ids(es_parent_child(df, body, id_field="id")) == [1, 2]


def test_has_child_min_max_children(df):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": "merge"}},
        "min_children": 2}},
        "size": 10, "_source": ["id"]}
    assert _ids(es_parent_child(df, body, id_field="id")) == [1]
    body["query"]["has_child"]["max_children"] = 1
    del body["query"]["has_child"]["min_children"]
    assert _ids(es_parent_child(df, body, id_field="id")) == [2]


def test_has_parent_returns_children_of_matching_parents(df):
    body = {"query": {"has_parent": {
        "parent_type": "question", "query": {"range": {"n": {"gte": 400}}}}},
        "size": 10, "_source": ["id"]}
    assert _ids(es_parent_child(df, body, id_field="id")) == [5]


def test_parent_id_checks_relation_and_parent(df):
    body = {"query": {"parent_id": {"type": "answer", "id": 1}},
            "size": 10, "_source": ["id"]}
    # doc 6 shares the parent but is a comment, not an answer
    assert _ids(es_parent_child(df, body, id_field="id")) == [3, 4]


def test_parent_child_composes_inside_bool(df):
    body = {"query": {"bool": {
        "must": [{"has_child": {"type": "answer",
                                "query": {"match": {"text": "merge"}}}}],
        "filter": [{"range": {"n": {"gte": 400}}}],
    }},
        "size": 10, "_source": ["id"]}
    assert _ids(es_parent_child(df, body, id_field="id")) == [2]
    body = {"query": {"bool": {
        "must": [{"term": {"relation": "answer"}}],
        "must_not": [{"has_parent": {
            "parent_type": "question",
            "query": {"range": {"n": {"gte": 400}}}}}],
    }},
        "size": 10, "_source": ["id"]}
    # answers NOT under a big-n question: 3, 4 (parent 1) and orphan 7
    assert _ids(es_parent_child(df, body, id_field="id")) == [3, 4, 7]


def _bm25(term, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, _, _, t, _ in ROWS}
    n = float(len(toks))
    avgdl = sum(len(v) for v in toks.values()) / n
    df_t = float(sum(1 for v in toks.values() if term in v))
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
    out = {}
    for i, v in toks.items():
        tf = float(v.count(term))
        if tf:
            dl = float(len(v))
            out[i] = round(
                idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)
    return out


@pytest.mark.parametrize("mode", ["sum", "max", "avg", "min"])
def test_scored_has_child_aggregates_child_bm25(df, mode):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": "merge"}},
        "score_mode": mode}},
        "size": 10, "_source": ["id"]}
    rows = {r["id"]: r["_score"]
            for r in es_parent_child(df, body, id_field="id").collect()}
    s = _bm25("merge")
    combine = {
        "sum": lambda a: round(sum(a), 6),
        "max": max,
        "min": min,
        "avg": lambda a: round(sum(a) / len(a), 6),
    }[mode]
    assert rows[1] == pytest.approx(combine([s[3], s[4]]), abs=2e-6)
    assert rows[2] == pytest.approx(combine([s[5]]), abs=2e-6)
    assert set(rows) == {1, 2}


def test_score_mode_rejected_in_nested_position(df):
    body = {"query": {"bool": {"must": [{"has_child": {
        "type": "answer", "query": {"match_all": {}},
        "score_mode": "sum"}}]}},
        "size": 10, "_source": ["id"]}
    with pytest.raises(ValueError, match="score_mode"):
        es_parent_child(df, body, id_field="id")


def test_has_parent_score_true_rejected(df):
    body = {"query": {"has_parent": {
        "parent_type": "question", "query": {"match_all": {}},
        "score": True}},
        "size": 10, "_source": ["id"]}
    with pytest.raises(ValueError, match="score"):
        es_parent_child(df, body, id_field="id")


def test_unknown_has_child_option_rejected(df):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match_all": {}},
        "inner_hits": {}}},
        "size": 10, "_source": ["id"]}
    with pytest.raises(ValueError, match="has_child option"):
        es_parent_child(df, body, id_field="id")


def test_has_child_inner_filter_pushes_to_parquet(spark, tmp_path):
    # the child query's range conjunct must reach PushedFilters — a
    # coalesce(pred, false) wrapper would block it (the r8 bool trap,
    # re-found here by the r10 plan audit)
    path = str(tmp_path / "pc_docs")
    spark.createDataFrame(
        [(i, "answer" if i % 5 else "question",
          None if i % 5 == 0 else i - i % 5, i * 10)
         for i in range(1, 60)],
        "id long, relation string, parent_id long, n long",
    ).write.parquet(path)
    df = spark.read.parquet(path)
    out = es_parent_child(df, {
        "query": {"has_child": {"type": "answer",
                                "query": {"range": {"n": {"gte": 300}}}}},
        "sort": [{"id": "asc"}], "size": 10, "_source": ["id"],
    }, id_field="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(n,300)" in plan, plan


def test_multi_key_query_object_rejected(df):
    # VERDICT r10 #9: a two-key query dict used to fall through the
    # single-key unpack and smuggle has_child past the rewriter
    body = {"query": {"has_child": {"type": "answer",
                                    "query": {"match_all": {}}},
                      "term": {"relation": "question"}},
            "size": 10, "_source": ["id"]}
    with pytest.raises(ValueError, match="exactly one key"):
        es_parent_child(df, body, id_field="id")


# --- round 11: children / parent aggregations --------------------------------


def test_children_agg(df):
    # context switch: from the matched QUESTION (text: spark) to its
    # answer children; doc_count + a max sub-metric in one pass
    body = {"query": {"bool": {"filter": [
                {"term": {"relation": "question"}},
                {"match": {"text": "spark"}}]}},
            "size": 0,
            "aggs": {"to_answers": {
                "children": {"type": "answer"},
                "aggs": {"max_n": {"max": {"field": "n"}}}}}}
    out = es_parent_child(df, body, id_field="id").collect()
    assert len(out) == 1
    # question 1 matches; its answer children are docs 3 and 4
    assert out[0]["doc_count"] == 2
    assert out[0]["max_n"] == 60


def test_parent_agg(df):
    # from matched answers (n >= 60) to their distinct parents
    body = {"query": {"range": {"n": {"gte": 60}}},
            "size": 0,
            "aggs": {"to_questions": {"parent": {"type": "answer"}}}}
    out = es_parent_child(df, body, id_field="id").collect()
    # answers 4 (parent 1) and 5 (parent 2) -> two distinct parents;
    # the matching QUESTION rows (1, 2 by n) are not answers and the
    # orphan answer 7 has n < 60
    assert out[0]["doc_count"] == 2


def test_children_agg_validation(df):
    body = {"size": 0, "aggs": {
        "a": {"children": {"type": "answer"}},
        "b": {"terms": {"field": "tag"}}}}
    with pytest.raises(ValueError, match="only top-level"):
        es_parent_child(df, body, id_field="id")
    with pytest.raises(ValueError, match="size: 0"):
        es_parent_child(df, {"aggs": {"a": {
            "children": {"type": "answer"}}}}, id_field="id")
