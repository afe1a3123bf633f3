"""Round-13 response shaping: post_filter (aggs-blind hit narrowing),
fields (modern retrieval option), script_fields (Painless-subset
computed fields) — on BOTH the filter-context and scored search paths
(the ADVICE r12 slice lesson: a _BODY_KEYS key must never be consumed
by only one path)."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.plans.query_dsl import es_search
from hive2es_offline_spark.plans.scoring import es_scored_search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "fast merge stream", "a", 10.0, 2),
        (2, "slow merge stream", "b", 20.0, 3),
        (3, "merge stream again", "a", 30.0, 4),
        (4, "nothing relevant", "b", 40.0, 5),
        (5, "merge merge stream", "a", 50.0, 6),
    ]
    return spark.createDataFrame(
        rows, "id long, text string, cat string, price double, qty int")


# ------------------------------------------------------------- post_filter

class TestPostFilter:
    def test_hits_narrow_but_aggs_do_not(self, docs):
        base = {"query": {"match": {"text": "merge"}},
                "sort": [{"id": "asc"}], "size": 10}
        full = es_search(docs, base, id_field="id").collect()
        assert [r["id"] for r in full] == [1, 2, 3, 5]
        pf = es_search(docs, {**base, "post_filter": {
            "term": {"cat": "a"}}}, id_field="id").collect()
        assert [r["id"] for r in pf] == [1, 3, 5]
        # aggs (size 0) see the PRE-post_filter result set
        aggs = es_search(docs, {
            "query": {"match": {"text": "merge"}},
            "post_filter": {"term": {"cat": "a"}},
            "size": 0,
            "aggs": {"n": {"value_count": {"field": "id"}}},
        }, id_field="id").first()
        assert aggs["n"] == 4

    def test_scored_path_narrows_and_scores_are_stable(self, docs):
        base = {"query": {"match": {"text": "merge stream"}}, "size": 10,
                "_source": ["id"]}
        full = {r["id"]: r["_score"]
                for r in es_scored_search(docs, base, id_field="id").collect()}
        pf = {r["id"]: r["_score"]
              for r in es_scored_search(docs, {**base, "post_filter": {
                  "term": {"cat": "a"}}}, id_field="id").collect()}
        assert set(pf) == {1, 3, 5}
        for i, s in pf.items():
            # post_filter must not perturb BM25 (corpus stats stay
            # index-wide; only the hit list narrows)
            assert s == full[i]

    def test_knn_filter_context_rejects(self, docs):
        emb = docs.withColumn(
            "v", F.array(F.col("price"), F.lit(1.0)))
        with pytest.raises(ValueError, match="post_filter"):
            es_search(emb, {
                "knn": {"field": "v", "query_vector": [1.0, 0.0], "k": 2},
                "post_filter": {"term": {"cat": "a"}},
            }, id_field="id")

    def test_rescore_rejects(self, docs):
        with pytest.raises(ValueError, match="post_filter"):
            es_scored_search(docs, {
                "query": {"match": {"text": "merge"}},
                "rescore": {"window_size": 10, "query": {
                    "rescore_query": {"match": {"text": "stream"}}}},
                "post_filter": {"term": {"cat": "a"}},
            }, id_field="id").collect()


# ------------------------------------------------------------------ fields

class TestFields:
    def test_fields_alone_projects(self, docs):
        out = es_search(docs, {
            "query": {"term": {"cat": "a"}},
            "sort": [{"id": "asc"}],
            "fields": ["id", {"field": "price"}],
        }, id_field="id")
        assert out.columns == ["id", "price"]
        assert [r["id"] for r in out.collect()] == [1, 3, 5]

    def test_fields_union_with_source(self, docs):
        out = es_search(docs, {
            "query": {"term": {"cat": "a"}},
            "sort": [{"id": "asc"}],
            "_source": ["id", "cat"],
            "fields": ["price", "id"],
        }, id_field="id")
        assert out.columns == ["id", "cat", "price"]

    def test_scored_path_keeps_score(self, docs):
        out = es_scored_search(docs, {
            "query": {"match": {"text": "merge"}},
            "fields": ["id"],
            "size": 3,
        }, id_field="id")
        assert out.columns == ["id", "_score"]

    def test_format_rejects(self, docs):
        with pytest.raises(ValueError, match="plain names only"):
            es_search(docs, {
                "query": {"term": {"cat": "a"}},
                "fields": [{"field": "price", "format": "0.0"}],
            }, id_field="id").collect()

    def test_wildcard_rejects(self, docs):
        with pytest.raises(ValueError, match="wildcard"):
            es_search(docs, {
                "query": {"term": {"cat": "a"}},
                "fields": ["pri*"],
            }, id_field="id").collect()


# ----------------------------------------------------------- script_fields

class TestScriptFields:
    def test_computed_field_with_params(self, docs):
        out = es_search(docs, {
            "query": {"term": {"cat": "a"}},
            "sort": [{"id": "asc"}],
            "_source": ["id"],
            "script_fields": {"total": {"script": {
                "source": "doc['price'].value * doc['qty'].value "
                          "* params.fx",
                "params": {"fx": 2.0}}}},
        }, id_field="id")
        assert out.columns == ["id", "total"]
        assert [r["total"] for r in out.collect()] == [40.0, 240.0, 600.0]

    def test_script_fields_alone_suppress_source(self, docs):
        out = es_search(docs, {
            "query": {"term": {"cat": "b"}},
            "sort": [{"id": "asc"}],
            "script_fields": {"double_qty": {
                "script": "doc['qty'].value * 2"}},
        }, id_field="id")
        # ES: requesting script_fields without _source returns only them
        assert out.columns == ["double_qty"]
        assert [r["double_qty"] for r in out.collect()] == [6, 10]

    def test_scored_path(self, docs):
        out = es_scored_search(docs, {
            "query": {"match": {"text": "merge"}},
            "_source": ["id"],
            "size": 2,
            "script_fields": {"p2": {"script": {
                "source": "doc['price'].value + 1"}}},
        }, id_field="id")
        assert out.columns == ["id", "p2", "_score"]
        for r in out.collect():
            assert r["p2"] == pytest.approx(
                {1: 11.0, 2: 21.0, 3: 31.0, 5: 51.0}[r["id"]])

    def test_unknown_option_rejects(self, docs):
        with pytest.raises(ValueError, match="script_fields option"):
            es_search(docs, {
                "query": {"term": {"cat": "a"}},
                "script_fields": {"x": {"script": {"source": "1"},
                                        "ignore_failure": True}},
            }, id_field="id").collect()

    def test_non_painless_lang_rejects(self, docs):
        with pytest.raises(ValueError, match="painless"):
            es_search(docs, {
                "query": {"term": {"cat": "a"}},
                "script_fields": {"x": {"script": {
                    "source": "1", "lang": "expression"}}},
            }, id_field="id").collect()
