"""Edge inputs: empty frames, empty strings, single tokens — operators must
degrade gracefully, not throw (ANSI mode makes sloppy expressions fatal)."""

from pyspark.sql import functions as F

from hive2es_offline_spark.operators import dedup, document, routing, similarity, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_text_stats_empty_and_tiny(spark):
    df = _docs(spark, [(1, ""), (2, "x"), (3, "   ")])
    out = {r["doc_id"]: r for r in text.text_stats(df, "text").collect()}
    assert out[1]["n_tokens"] == 1  # split('') -> ['']
    assert out[1]["quality"] is not None
    assert out[2]["lang_guess"] == "und"


def test_minhash_empty_corpus(spark):
    df = _docs(spark, []).where("doc_id > 0")
    assert dedup.dedup_minhash(df, "doc_id", "text").count() == 0


def test_simhash_single_token(spark):
    df = _docs(spark, [(1, "solo"), (2, "solo")])
    pairs = dedup.dedup_simhash(df, "doc_id", "text", max_hamming=0).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_document_pipeline_empty_input(spark):
    df = spark.createDataFrame([], "id long, name string, ts timestamp")
    out = document.to_documents(
        document.scrub_nulls(document.normalize_types(df)), id_col="id"
    )
    assert out.count() == 0
    assert routing.with_shard(out, "_routing", 3).count() == 0


def test_scrub_whitespace_only_and_mixed_case_null(spark):
    df = spark.createDataFrame(
        [(1, "  "), (2, "NULL"), (3, "Null "), (4, "ok")], "id long, v string"
    )
    out = {r["id"]: r["v"] for r in document.scrub_nulls(df).collect()}
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] == "ok"


def test_cosine_topk_with_zero_vector_rows(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = similarity.cosine_topk(df, [1.0, 0.0], k=3).collect()
    ids = [r["vec_id"] for r in rows]
    assert ids[0] == 1  # exact match first; zero vector scores NULL (last)


def test_connected_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(pairs).count() == 0


def test_es_knn_clause_filter_and_small_corpus(spark):
    from hive2es_offline_spark.plans.query_dsl import es_search

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    body = {
        "knn": {"field": "embedding", "query_vector": [1.0, 0.0], "k": 10,
                "filter": {"range": {"vec_id": {"lte": 3}}}},
    }
    rows = es_search(df, body, id_field="vec_id").collect()
    # k > candidates: every filtered row returned, scored, ranked
    assert [r["vec_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["_score"] == 1.0          # identical vector: (1+1)/2
    assert abs(rows[2]["_score"] - 0.5) < 1e-9  # orthogonal: (1+0)/2
    # _source projection keeps _score
    body["_source"] = ["vec_id"]
    assert es_search(df, body, id_field="vec_id").columns == ["vec_id", "_score"]
