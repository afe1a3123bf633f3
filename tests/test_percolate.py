"""Percolate (plans/percolate.py): stored queries matched against
candidate documents in one scan — VERDICT r10 #3."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.plans.percolate import es_percolate


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "urgent outage in region east", "ops", 120),
            (2, "routine maintenance window", "ops", 80),
            (3, "customer praised the new feature", "feedback", 45),
            (4, "outage resolved, postmortem pending", "ops", 200),
            (5, None, "ops", 10),
        ],
        "id long, text string, channel string, n long",
    )


QUERIES = {
    "alert-outage": {"match": {"text": "outage"}},
    "ops-long": {"bool": {
        "filter": [{"term": {"channel": "ops"}},
                   {"range": {"n": {"gte": 100}}}]}},
    "praise": {"match_phrase": {"text": "praised the new"}},
    "never": {"term": {"channel": "nope"}},
}


def pairs(out):
    return sorted((r["id"], r["query_id"]) for r in out.collect())


def test_percolate_pairs(df):
    out = es_percolate(df, QUERIES, id_field="id")
    assert pairs(out) == [
        (1, "alert-outage"), (1, "ops-long"),
        (3, "praise"),
        (4, "alert-outage"), (4, "ops-long"),
    ]
    assert out.columns == ["id", "query_id"]


def test_percolate_single_doc_shape(spark):
    # the classic ES use: percolate ONE document against the stored set
    doc = spark.createDataFrame(
        [(99, "an outage just started", "ops", 500)],
        "id long, text string, channel string, n long")
    out = es_percolate(doc, QUERIES, id_field="id")
    assert pairs(out) == [(99, "alert-outage"), (99, "ops-long")]


def test_percolate_null_is_no_match(df):
    # doc 5 has NULL text: match-NULL must be "no match", not a crash or
    # a phantom row
    out = es_percolate(df, {"m": {"match": {"text": "outage"}}},
                       id_field="id")
    assert pairs(out) == [(1, "m"), (4, "m")]


def test_percolate_rejects_score_context(df):
    with pytest.raises(ValueError, match="score-only"):
        es_percolate(df, {"q": {"function_score": {
            "query": {"match_all": {}}}}}, id_field="id")
    # nested inside bool / constant_score is found too
    with pytest.raises(ValueError, match="score-only"):
        es_percolate(df, {"q": {"bool": {"must": [
            {"script_score": {"query": {"match_all": {}},
                              "script": {"source": "1"}}}]}}},
            id_field="id")
    with pytest.raises(ValueError, match="score-only"):
        es_percolate(df, {"q": {"constant_score": {"filter": {
            "rank_feature": {"field": "n"}}}}}, id_field="id")


def test_percolate_input_validation(df):
    with pytest.raises(ValueError, match="at least one"):
        es_percolate(df, {}, id_field="id")
    with pytest.raises(ValueError, match="duplicate"):
        es_percolate(df, [("a", {"match_all": {}}),
                          ("a", {"match_all": {}})], id_field="id")


def test_percolate_one_scan(df):
    # the N-queries-one-pass scale claim: a single Project over one scan,
    # no Join anywhere in the plan
    out = es_percolate(df, QUERIES, id_field="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_percolate_analyzer_scoped(spark):
    df = spark.createDataFrame([(1, "The engines were running")],
                               "id long, text string")
    q = {"stem": {"match": {"text": "run"}}}
    assert pairs(es_percolate(df, q, id_field="id",
                              analyzer="english")) == [(1, "stem")]
    assert pairs(es_percolate(df, q, id_field="id")) == []


def test_percolate_rejects_score_context_in_any_container(df):
    # code-review r11: boosting / nested wrappers used to slip through
    with pytest.raises(ValueError, match="score-only"):
        es_percolate(df, {"q": {"boosting": {
            "positive": {"script_score": {
                "query": {"match_all": {}},
                "script": {"source": "1"}}},
            "negative": {"match_all": {}},
            "negative_boost": 0.5}}}, id_field="id")
    with pytest.raises(ValueError, match="score-only"):
        es_percolate(df, {"q": {"nested": {
            "path": "items",
            "query": {"function_score": {"query": {"match_all": {}}}}}}},
            id_field="id")
    # a FIELD literally named like a score clause must NOT false-reject
    # (channel stands in: a term spec whose inner dict key is a field
    # name, plus a real field literally named "knn")
    import pyspark.sql.functions as F

    df2 = df.withColumn("knn", F.col("n"))
    out = es_percolate(df2, {"q": {"term": {"knn": 120}}}, id_field="id")
    assert [r["id"] for r in out.collect()] == [1]
