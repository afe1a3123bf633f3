"""Model-based quality classification (operators/classify.py): codegen
linear scorer (map + join shapes), deterministic logreg trainer."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.operators.classify import (
    score_linear, sigmoid, train_logreg,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "clean prose with facts and structure", 1),
        (2, "buy cheap pills now click here", 0),
        (3, "structured facts and clean analysis", 1),
        (4, "click now cheap cheap pills", 0),
        (5, "facts facts facts", 1),
        (6, "here now click buy", 0),
    ]
    return spark.createDataFrame(rows, "id long, text string, label int")


class TestScoreLinear:
    W = {"facts": 1.5, "clean": 1.0, "cheap": -2.0, "click": -1.0}

    def test_hand_computed_map_scores(self, docs):
        out = {r["id"]: r["score"] for r in score_linear(
            docs, "text", self.W, bias=0.25).collect()}
        # doc 5: facts x3 -> sigmoid(0.25 + 4.5)
        assert out[5] == pytest.approx(round(sigmoid(4.75), 6))
        # doc 4: click + cheap x2 -> sigmoid(0.25 - 5.0)
        assert out[4] == pytest.approx(round(sigmoid(-4.75), 6))
        # doc 6 has click(-1) only; the rest are out-of-vocab zeros
        assert out[6] == pytest.approx(round(sigmoid(0.25 - 1.0), 6))

    def test_join_shape_matches_map_shape(self, docs):
        a = {r["id"]: r["score"] for r in score_linear(
            docs, "text", self.W, bias=0.25, method="map").collect()}
        b = {r["id"]: r["score"] for r in score_linear(
            docs, "text", self.W, bias=0.25, method="join",
            id_field="id").collect()}
        assert a == b

    def test_join_keeps_docs_with_no_vocab_hits(self, spark):
        df = spark.createDataFrame([(1, "totally unrelated words")],
                                   "id long, text string")
        r = score_linear(df, "text", {"facts": 1.0}, bias=0.0,
                         method="join", id_field="id").first()
        assert r["score"] == pytest.approx(0.5)

    def test_rejects(self, docs):
        with pytest.raises(ValueError, match="non-empty"):
            score_linear(docs, "text", {})
        with pytest.raises(ValueError, match="map | join"):
            score_linear(docs, "text", self.W, method="hash")
        with pytest.raises(ValueError, match="id_field"):
            score_linear(docs, "text", self.W, method="join")


class TestTrainLogreg:
    def test_learns_separable_labels(self, docs):
        w, b = train_logreg(docs, "text", "label",
                            vocab_size=64, iters=40, lr=1.0)
        scored = score_linear(docs, "text", w, b).collect()
        for r in scored:
            assert (r["score"] > 0.5) == (r["label"] == 1), (
                r["id"], r["score"])
        # discriminative tokens got signed weights
        assert w["facts"] > 0 and w["cheap"] < 0

    def test_bit_identical_across_runs(self, docs):
        a = train_logreg(docs, "text", "label", vocab_size=32, iters=10)
        b = train_logreg(docs, "text", "label", vocab_size=32, iters=10)
        assert a == b

    def test_repartitioned_input_same_weights(self, docs):
        a = train_logreg(docs, "text", "label", vocab_size=32, iters=5)
        b = train_logreg(docs.repartition(7), "text", "label",
                         vocab_size=32, iters=5)
        assert a == b

    def test_empty_and_bad_args_reject(self, spark, docs):
        with pytest.raises(ValueError, match="iters"):
            train_logreg(docs, "text", "label", iters=0)
        empty = spark.createDataFrame([], "id long, text string, label int")
        with pytest.raises(ValueError, match="non-empty"):
            train_logreg(empty, "text", "label", iters=1)


class TestPlanShape:
    def test_map_shape_adds_no_shuffle(self, docs):
        plan = score_linear(docs, "text", TestScoreLinear.W) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # the filter rides the scan


class TestNullTextContract:
    def test_null_text_scores_sigmoid_bias_in_both_shapes(self, spark):
        # analyze_col propagates NULL; an unguarded aggregate turned it
        # into a NULL score in the map shape only (code-review r13)
        df = spark.createDataFrame([(1, None)], "id long, text string")
        w = {"x": 1.0}
        a = score_linear(df, "text", w, bias=2.0, method="map").first()
        b = score_linear(df, "text", w, bias=2.0, method="join",
                         id_field="id").first()
        assert a["score"] == b["score"] == pytest.approx(
            round(sigmoid(2.0), 6))

    def test_trainer_tolerates_null_text(self, spark):
        df = spark.createDataFrame(
            [(1, "good text facts", 1), (2, None, 0),
             (3, "bad spam spam", 0), (4, "facts good", 1)],
            "id long, text string, label int")
        w, b = train_logreg(df, "text", "label", vocab_size=16, iters=5)
        assert "facts" in w  # trains through the NULL row

    def test_vocab_cap_rejects(self, docs):
        with pytest.raises(ValueError, match="capped"):
            train_logreg(docs, "text", "label", vocab_size=100_000)
