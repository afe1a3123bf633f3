"""Search-template rendering (plans/templates.py)."""

import pytest

from hive2es_offline_spark.plans.templates import render_search_template


def test_exact_placeholder_preserves_type():
    t = {"query": {"match": {"text": "{{q}}"}}, "size": "{{size}}",
         "sort": [{"{{sort_field}}": {"order": "asc"}}]}
    # dict KEYS are not templated (same as ES mustache over the JSON text
    # would be, but key templating is rare — value positions cover usage)
    out = render_search_template(
        {"query": t["query"], "size": t["size"]}, {"q": "merge", "size": 5})
    assert out == {"query": {"match": {"text": "merge"}}, "size": 5}
    assert isinstance(out["size"], int)


def test_inline_interpolation_and_tojson():
    t = {"query": {"query_string": {"query": "source:{{src}} AND text:{{term}}"}},
         "knn_vec": "{{#toJson}}vec{{/toJson}}"}
    out = render_search_template(t, {"src": "web", "term": "merge",
                                     "vec": [1.0, 2.0]})
    assert out["query"]["query_string"]["query"] == "source:web AND text:merge"
    assert out["knn_vec"] == [1.0, 2.0]


def test_default_value_idiom():
    t = {"size": "{{size}}{{^size}}10{{/size}}"}
    assert render_search_template(t, {}) == {"size": "10"}
    assert render_search_template(t, {"size": 25}) == {"size": 25}


def test_envelope_and_json_string_forms():
    env = {"source": '{"query": {"term": {"lang": "{{lang}}"}}, "size": "{{n}}"}',
           "params": {"lang": "en", "n": 3}}
    out = render_search_template(env)
    assert out == {"query": {"term": {"lang": "en"}}, "size": 3}
    # explicit params win over envelope params
    out = render_search_template(env, {"lang": "fr", "n": 7})
    assert out["query"]["term"]["lang"] == "fr"


def test_missing_param_rules():
    with pytest.raises(ValueError, match="missing param 'q'"):
        render_search_template({"query": {"match": {"t": "{{q}}"}}}, {})
    # inline interpolation of a missing param renders empty (ES behavior)
    out = render_search_template({"q": "a {{gone}} b"}, {})
    assert out == {"q": "a  b"}


def test_rendered_body_runs_end_to_end(spark):
    from hive2es_offline_spark.plans.query_dsl import es_search

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20), (3, "en", 30)], "id long, lang string, n long")
    body = render_search_template(
        {"query": {"bool": {"must": [
            {"term": {"lang": "{{lang}}"}},
            {"range": {"n": {"gte": "{{min_n}}"}}},
        ]}}, "sort": [{"id": {"order": "asc"}}], "size": "{{size}}",
         "_source": ["id"]},
        {"lang": "en", "min_n": 20, "size": 10},
    )
    assert [r["id"] for r in es_search(df, body, id_field="id").collect()] == [3]


def test_inline_non_string_params_render_json_text():
    out = render_search_template(
        {"q": "flag:{{b}} n:{{n}} tags:{{t}}"},
        {"b": True, "n": 2.5, "t": ["a", "b"]})
    assert out == {"q": 'flag:true n:2.5 tags:["a", "b"]'}


def test_embedded_tojson_interpolates_inline():
    # {{#toJson}}var{{/toJson}} inside a longer string renders its JSON in
    # place instead of leaking literal mustache text (ADVICE r8)
    out = render_search_template(
        {"q": "tags in {{#toJson}}tags{{/toJson}} now"},
        {"tags": ["a", "b"]})
    assert out == {"q": 'tags in ["a", "b"] now'}


def test_unrecognized_mustache_section_raises():
    # an unknown {{#section}} must raise loudly, not leak into the query
    # (ADVICE r8 — the module's loud-rejection convention)
    with pytest.raises(ValueError, match="unrecognized mustache section"):
        render_search_template({"q": "x {{#join}}v{{/join}} y"}, {"v": 1})
    # embedded inverted-section (default idiom only valid as a whole
    # string) now raises instead of leaking
    with pytest.raises(ValueError, match="unrecognized mustache section"):
        render_search_template({"q": "x {{v}}{{^v}}d{{/v}} y"}, {"v": "a"})
    # embedded toJson with a missing param still raises the missing error
    with pytest.raises(ValueError, match="missing param 'gone'"):
        render_search_template({"q": "x {{#toJson}}gone{{/toJson}}"}, {})
