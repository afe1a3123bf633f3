"""End-to-end consumer journey: the sequence of ES API calls a real user
of the reference's loaded index runs in a session, all against the same
documents table — the 'switch to this repo and run every query you run
today' claim exercised as one flow."""

import json

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from hive2es_offline_spark.plans.query_dsl import (
    es_count,
    es_mget,
    es_search,
)
from hive2es_offline_spark.plans.scoring import es_scored_search
from hive2es_offline_spark.plans.suggest import es_suggest
from hive2es_offline_spark.plans.templates import render_search_template


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_full_consumer_session(docs):
    # 1. the user types a Lucene query string into the search box
    hits = es_search(docs, {
        "query": {"query_string": {
            "query": "text:(merge OR stream) AND n_chars:[100 TO *]"}},
        "sort": [{"doc_id": {"order": "asc"}}], "size": 5,
        "_source": ["doc_id", "n_chars"],
    }, id_field="doc_id").collect()
    assert 0 < len(hits) <= 5
    assert all(r["n_chars"] >= 100 for r in hits)

    # 2. they want RANKED results, not filter order
    ranked = es_scored_search(docs, {
        "query": {"query_string": {"query": "merge stream",
                                   "default_field": "text"}},
        "size": 5, "_source": ["doc_id"],
    }, id_field="doc_id").collect()
    scores = [r["_score"] for r in ranked]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0

    # 3. they check how many docs match in total
    (count_row,) = es_count(docs, {
        "query": {"match": {"text": "merge"}}}, id_field="doc_id").collect()
    assert count_row["count"] > len(ranked)

    # 4. they fetch two specific docs (one bogus id) by _mget
    got = es_mget(docs, {"ids": [int(ranked[0]["doc_id"]), 10**9],
                         "_source": ["text"]}, id_field="doc_id").collect()
    assert [r["found"] for r in got] == [True, False]

    # 5. they mistype a term and ask the suggester
    sugg = es_suggest(docs, {"suggest": {"fix": {
        "text": "mrege", "term": {"field": "text", "size": 1}}}},
    ).collect()
    assert sugg[0]["suggestion"] == "merge"

    # 6. an analyst runs the saved template with fresh params
    body = render_search_template(
        {"source": json.dumps({
            "size": 0,
            "aggs": {"by_src": {
                "terms": {"field": "source", "size": "{{n}}"},
                "aggs": {"chars": {"avg": {"field": "n_chars"}}}}},
         }), "params": {"n": 3}})
    buckets = es_search(docs, body, id_field="doc_id").collect()
    assert len(buckets) == 3
    assert all(b["chars"] > 0 for b in buckets)

    # 7. the dashboard's date-free drill-down: filter agg + global agg
    (gated,) = es_search(docs, {
        "query": {"term": {"source": "src3"}}, "size": 0,
        "aggs": {"all_docs": {"global": {}, "aggs": {
            "n": {"value_count": {"field": "doc_id"}}}}},
    }, id_field="doc_id").collect()
    assert gated["n"] == docs.count()  # global escaped the src3 filter
