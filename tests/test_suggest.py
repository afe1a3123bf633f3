"""ES term suggester (plans/suggest.py): vocabulary corrections ranked by
edit distance then document frequency."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.plans.suggest import es_suggest, term_suggest


@pytest.fixture()
def corpus(spark):
    rows = (
        [("stream processing engine",)] * 5
        + [("streams of data",)] * 2
        + [("steam locomotive",)] * 3
        + [("merge the queue",)] * 4
    )
    return spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(rows)], "doc_id long, text string"
    )


def test_missing_mode_suggests_for_typos_only(corpus):
    out = term_suggest(corpus, "stream mrege", "text").collect()
    # "stream" IS in the vocabulary -> no suggestions (missing mode);
    # "mrege" is not -> corrected to "merge" (lev distance 2)
    assert {r["input_term"] for r in out} == {"mrege"}
    top = out[0]
    assert (top["suggestion"], top["dist"], top["freq"], top["rank"]) == (
        "merge", 2, 4, 1)
    assert top["score"] == pytest.approx(1 - 2 / 5)


def test_ranking_distance_then_freq_and_always_mode(corpus):
    out = term_suggest(
        corpus, "strean", "text", suggest_mode="always", size=5
    ).collect()
    # dist 1: "stream"(5); dist 2: "streams"(2), "steam"(3)
    got = [(r["suggestion"], r["dist"], r["freq"], r["rank"]) for r in out]
    assert got[0] == ("stream", 1, 5, 1)
    # dist-2 candidates: score 1-2/6 vs 1-2/7 — "streams" (longer) scores
    # higher because the denominator is max(len_in, len_cand)
    assert [g[0] for g in got[1:]] == ["streams", "steam"]


def test_popular_mode_requires_higher_freq(corpus):
    # "steam" IS in the vocab (freq 3); popular -> only candidates with
    # freq > 3 survive: "stream" (5), not "streams" (2)
    out = term_suggest(corpus, "steam", "text", suggest_mode="popular").collect()
    assert [(r["suggestion"], r["freq"]) for r in out] == [("stream", 5)]


def test_prefix_and_length_guards(corpus):
    # prefix_length=1 (default): "qerge" shares no first letter with
    # "merge" -> no candidates; prefix_length=0 lifts the guard
    assert term_suggest(corpus, "qerge", "text").collect() == []
    out = term_suggest(corpus, "qerge", "text", prefix_length=0).collect()
    assert out[0]["suggestion"] == "merge"
    # min_word_length drops short tokens entirely
    with pytest.raises(ValueError, match="length >= 4"):
        term_suggest(corpus, "the of", "text")


def test_damerau_distance_counts_transposition_as_one(corpus):
    # "straem" -> "stream" is one adjacent transposition: damerau dist 1,
    # levenshtein dist 2 — the damerau option must rank it at distance 1
    lev = term_suggest(corpus, "straem", "text", suggest_mode="always").collect()
    dam = term_suggest(corpus, "straem", "text", suggest_mode="always",
                       string_distance="damerau").collect()
    assert lev[0]["dist"] == 2
    assert dam[0]["suggestion"] == "stream" and dam[0]["dist"] == 1


def test_es_suggest_body_shape(corpus):
    body = {"suggest": {"fix_spelling": {
        "text": "mrege", "term": {"field": "text", "size": 2}}}}
    out = es_suggest(corpus, body).collect()
    assert out[0]["suggest_name"] == "fix_spelling"
    assert out[0]["suggestion"] == "merge"
    # completion bodies dispatch since r9 — a truly unknown suggester
    # still rejects loudly
    with pytest.raises(ValueError, match="term.*phrase.*completion"):
        es_suggest(corpus, {"suggest": {"x": {"text": "a",
                                              "context": {"field": "text"}}}})
    with pytest.raises(ValueError, match="suggest_mode"):
        term_suggest(corpus, "mrege", "text", suggest_mode="sometimes")
    with pytest.raises(ValueError, match="max_edits"):
        term_suggest(corpus, "mrege", "text", max_edits=3)


def test_phrase_suggest_corrects_whole_phrase(corpus):
    from hive2es_offline_spark.plans.suggest import phrase_suggest

    out = phrase_suggest(corpus, "steam procesing", "text").collect()
    # "steam" is a real word (freq 3) but the BIGRAM "stream processing"
    # (freq 5) dominates the LM — the whole-phrase correction wins where
    # per-token suggest_mode=missing would never touch "steam"
    assert out[0]["suggestion"] == "stream processing"
    assert out[0]["rank"] == 1
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # the identity phrase is never suggested
    assert "steam procesing" not in [r["suggestion"] for r in out]


def test_phrase_suggest_lm_math(spark):
    """Hand-computed add-alpha bigram LM on a tiny corpus."""
    import math

    from hive2es_offline_spark.plans.suggest import phrase_suggest

    df = spark.createDataFrame(
        [(0, "good morning"), (1, "good morning"), (2, "good evening")],
        "doc_id long, text string",
    )
    out = phrase_suggest(
        df, "good morninh", "text", size=10, max_candidates=2
    ).collect()
    # vocab = {good, morning, evening}: V=3; c(good)=3,
    # c(good morning)=2, c(good evening)=1, alpha=0.5
    top = out[0]
    assert top["suggestion"] == "good morning"
    exp = round(math.log((2 + 0.5) / (3 + 0.5 * 3)), 6)
    assert top["score"] == pytest.approx(exp)


def test_phrase_suggest_input_bounds(corpus):
    from hive2es_offline_spark.plans.suggest import phrase_suggest

    with pytest.raises(ValueError, match="2..6"):
        phrase_suggest(corpus, "single", "text")


def test_es_suggest_phrase_body(corpus):
    body = {"suggest": {"fix": {
        "text": "steam procesing", "phrase": {"field": "text", "size": 2}}}}
    out = es_suggest(corpus, body).collect()
    assert out[0]["suggest_name"] == "fix"
    assert out[0]["suggestion"] == "stream processing"


def test_phrase_suggest_survives_short_and_empty_docs(spark):
    """Docs with < 2 tokens have no bigrams — they must not crash the
    bigram pass (code-review r8: sequence(1, size-1) indexed out of
    bounds on 1-token docs)."""
    from hive2es_offline_spark.plans.suggest import phrase_suggest

    df = spark.createDataFrame(
        [(0, "good morning"), (1, "good morning"), (2, "single"), (3, "")],
        "doc_id long, text string",
    )
    out = phrase_suggest(df, "good morninh", "text").collect()
    assert out[0]["suggestion"] == "good morning"


def test_completion_suggester_prefix_topk(spark):
    """completion suggester (VERDICT r8 #5): prefix autocomplete ranked by
    weight desc / text asc, skip_duplicates, weight_field."""
    from hive2es_offline_spark.plans.suggest import completion_suggest, es_suggest

    df = spark.createDataFrame(
        [(1, "stream processing", 10), (2, "stream processing", 3),
         (3, "streaming joins", 7), (4, "stream windows", 5),
         (5, "batch jobs", 99), (6, None, 1)],
        "id long, sugg string, w long",
    )
    # default weight = doc count per suggestion text
    out = completion_suggest(df, "stre", "sugg", size=3).collect()
    assert [(r["suggestion"], r["weight"], r["rank"]) for r in out] == [
        ("stream processing", 2.0, 1), ("stream windows", 1.0, 2),
        ("streaming joins", 1.0, 3)]
    # explicit weight field: max weight wins per deduped text
    out = completion_suggest(df, "stream", "sugg", size=10,
                             weight_field="w").collect()
    assert [(r["suggestion"], r["weight"]) for r in out] == [
        ("stream processing", 10.0), ("streaming joins", 7.0),
        ("stream windows", 5.0)]
    # prefix is case-insensitive (completion analyzer lowercases)
    assert completion_suggest(df, "STREAM", "sugg").count() == 3
    with pytest.raises(ValueError, match="non-empty prefix"):
        completion_suggest(df, "", "sugg")
    # es_suggest dispatches completion bodies (ES shape: prefix + field)
    out = es_suggest(df, {"suggest": {"ac": {
        "prefix": "stream", "completion": {"field": "sugg", "size": 2}}}},
        id_col="id").collect()
    assert [(r["suggest_name"], r["suggestion"], r["rank"]) for r in out] == [
        ("ac", "stream processing", 1), ("ac", "stream windows", 2)]


def test_phrase_suggest_two_corpus_passes(spark):
    """VERDICT r8 #6: phrase_suggest folds vocab_n + unigram counts into
    the shared vocabulary frame — the LM results are unchanged and the
    vocab frame computes doc-freq and totals in one aggregation."""
    from hive2es_offline_spark.plans.suggest import vocab_frame

    df = spark.createDataFrame(
        [(1, "stream processing wins"), (2, "stream processing"),
         (3, "steam processing wins wins")],
        "doc_id long, text string",
    )
    rows = {r["term"]: (r["freq"], r["total"])
            for r in vocab_frame(df, "text").collect()}
    assert rows == {"stream": (2, 2), "processing": (3, 3),
                    "wins": (2, 3), "steam": (1, 1)}


def test_suggest_and_completion_plan_shape(spark, tmp_path):
    """Scale-shape guards for the round-9 window rows: the term
    suggester's corpus work is one explode + vocab-sized aggregate with
    the candidate ranking window over candidates only; the completion
    suggester cuts with TakeOrderedAndProject; neither plans a Python
    evaluator."""
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"stream merge vector doc{i}", f"src{i % 7}")
         for i in range(200)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    df = spark.read.parquet(src)
    from hive2es_offline_spark.plans.suggest import (
        completion_suggest,
        term_suggest,
    )

    plan = (term_suggest(df, "stremaing mrege", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # the ranking window partitions by input_term (candidate-bounded),
    # never a global single-partition window over corpus rows
    assert "partitionBy" not in plan or "input_term" in plan
    plan = (completion_suggest(df, "src", "source")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


# --- completion fuzzy + contexts (round 10) ---------------------------------


@pytest.fixture()
def completions(spark):
    return spark.createDataFrame(
        [
            (1, "spark", "en"), (2, "spark", "en"), (3, "spark", "de"),
            (4, "shark", "en"), (5, "spur", "en"), (6, "park", "en"),
        ],
        "id long, term string, lang string",
    )


def test_completion_fuzzy_matches_one_edit_prefixes(completions):
    from hive2es_offline_spark.plans.suggest import completion_suggest

    out = completion_suggest(
        completions, "spar", "term", fuzzy={"fuzziness": 1})
    rows = {r["suggestion"]: r["weight"] for r in out.collect()}
    # spark: exact prefix; shark: 'shar' is one edit from 'spar';
    # spur: 'spur' one edit ('a'->'u', with the trailing r aligned via
    # length-3 candidate 'spu' needing 2 -> length-4 'spur' = 1);
    # park fails prefix_length=1 ('p' != 's') despite one-edit distance
    assert rows == {"spark": 3.0, "shark": 1.0, "spur": 1.0}


def test_completion_fuzzy_min_length_keeps_short_prefixes_exact(completions):
    from hive2es_offline_spark.plans.suggest import completion_suggest

    out = completion_suggest(
        completions, "sh", "term", fuzzy={"fuzziness": 1, "min_length": 3})
    assert [r["suggestion"] for r in out.collect()] == ["shark"]


def test_completion_contexts_gate_before_aggregate(completions):
    from hive2es_offline_spark.plans.suggest import completion_suggest

    out = completion_suggest(
        completions, "spa", "term", contexts={"lang": ["en"]})
    rows = {r["suggestion"]: r["weight"] for r in out.collect()}
    assert rows == {"spark": 2.0}  # the de doc is gated out of the weight


def test_completion_contexts_reject_boosted_entries(completions):
    from hive2es_offline_spark.plans.suggest import completion_suggest

    with pytest.raises(ValueError, match="contexts"):
        completion_suggest(
            completions, "spa", "term",
            contexts={"lang": [{"context": "en", "boost": 2}]})


def test_completion_fuzzy_unknown_option_rejected(completions):
    from hive2es_offline_spark.plans.suggest import completion_suggest

    with pytest.raises(ValueError, match="fuzzy option"):
        completion_suggest(
            completions, "spa", "term", fuzzy={"fuzzyness": 1})
