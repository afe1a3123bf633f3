"""Lucene query_string / simple_query_string parser: dict shapes, loud
rejection of unsupported syntax, and end-to-end filtering through
compile_query/es_search."""

import pytest

from hive2es_offline_spark.plans.query_string import (
    parse_query_string,
    parse_simple_query_string,
)


def qs(q, **opts):
    return parse_query_string({"query": q, **opts})


def test_field_term_and_phrase():
    assert qs("status:active") == {"match": {"status": {"query": "active"}}}
    assert qs('title:"data lake"') == {
        "match_phrase": {"title": {"query": "data lake"}}
    }


def test_default_field_and_bare_term_requires_one():
    assert qs("merge", default_field="text") == {
        "match": {"text": {"query": "merge"}}
    }
    with pytest.raises(ValueError, match="default_field"):
        qs("merge")


def test_boolean_operators_and_precedence():
    # OR binds loosest: a AND b OR c == (a AND b) OR c
    out = qs("status:a AND kind:b OR kind:c")
    assert out == {
        "bool": {
            "should": [
                {"bool": {"must": [
                    {"match": {"status": {"query": "a"}}},
                    {"match": {"kind": {"query": "b"}}},
                ]}},
                {"match": {"kind": {"query": "c"}}},
            ],
            "minimum_should_match": 1,
        }
    }
    assert qs("status:a && kind:b") == qs("status:a AND kind:b")
    assert qs("status:a || kind:b") == qs("status:a OR kind:b")


def test_not_and_prefix_operators():
    assert qs("NOT status:a") == {
        "bool": {"must_not": [{"match": {"status": {"query": "a"}}}]}
    }
    out = qs("+status:a -kind:b other:c")
    assert out == {
        "bool": {
            "must": [{"match": {"status": {"query": "a"}}}],
            "must_not": [{"match": {"kind": {"query": "b"}}}],
            "should": [{"match": {"other": {"query": "c"}}}],
            "minimum_should_match": 0,
        }
    }


def test_default_operator_and():
    out = qs("a b", default_field="text", default_operator="and")
    assert out == {"bool": {"must": [
        {"match": {"text": {"query": "a"}}},
        {"match": {"text": {"query": "b"}}},
    ]}}


def test_ranges_inclusive_exclusive_one_sided():
    assert qs("n:[5 TO 10]") == {"range": {"n": {"gte": 5, "lte": 10}}}
    assert qs("n:{5 TO 10}") == {"range": {"n": {"gt": 5, "lt": 10}}}
    assert qs("n:[5 TO *]") == {"range": {"n": {"gte": 5}}}
    assert qs("n:>5") == {"range": {"n": {"gt": 5}}}
    assert qs("n:<=2.5") == {"range": {"n": {"lte": 2.5}}}
    assert qs("d:[2024-01-01 TO 2024-02-01]") == {
        "range": {"d": {"gte": "2024-01-01", "lte": "2024-02-01"}}
    }


def test_wildcard_fuzzy_exists_boost():
    assert qs("name:te?t*") == {"wildcard": {"name": {"value": "te?t*"}}}
    assert qs("name:smith~") == {
        "fuzzy": {"name": {"value": "smith", "fuzziness": "AUTO"}}
    }
    assert qs("name:smith~1") == {
        "fuzzy": {"name": {"value": "smith", "fuzziness": 1}}
    }
    assert qs("_exists_:email") == {"exists": {"field": "email"}}
    assert qs("name:kim^2") == {
        "match": {"name": {"query": "kim", "boost": 2.0}}
    }


def test_multi_field_expansion():
    out = qs("merge", fields=["title^2", "body"])
    assert out == {"bool": {"should": [
        {"match": {"title": {"query": "merge", "boost": 2.0}}},
        {"match": {"body": {"query": "merge"}}},
    ], "minimum_should_match": 1}}


def test_parens_group():
    out = qs("status:a AND (kind:b OR kind:c)")
    assert out["bool"]["must"][1]["bool"]["minimum_should_match"] == 1


def test_loud_rejection():
    with pytest.raises(ValueError, match="character '/'"):
        qs("name:/sm.th/")
    with pytest.raises(ValueError, match="proximity"):
        qs('text:"a b"~2')
    with pytest.raises(ValueError, match="boost on a group"):
        qs("(status:a)^2")
    with pytest.raises(ValueError, match="unbalanced"):
        qs("(status:a")
    with pytest.raises(ValueError, match="TO"):
        qs("n:[5 10]")


def test_escaping():
    assert qs(r"path:a\:b") == {"match": {"path": {"query": "a:b"}}}
    assert qs(r"text:a\*b") == {"match": {"text": {"query": "a*b"}}}


def test_simple_query_string_shapes():
    sqs = lambda q, **o: parse_simple_query_string(
        {"query": q, "fields": ["text"], **o}
    )
    assert sqs("merge") == {"match": {"text": {"query": "merge"}}}
    assert sqs('"data lake"') == {
        "match_phrase": {"text": {"query": "data lake"}}
    }
    assert sqs("merg*") == {"prefix": {"text": {"value": "merg"}}}
    assert sqs("a | b") == {"bool": {"should": [
        {"match": {"text": {"query": "a"}}},
        {"match": {"text": {"query": "b"}}},
    ], "minimum_should_match": 1}}
    # '+' is the INFIX AND operator in SQS (not a must-prefix): a + b
    # requires both, even under the OR default
    assert sqs("a + b") == {"bool": {"must": [
        {"match": {"text": {"query": "a"}}},
        {"match": {"text": {"query": "b"}}},
    ]}}
    # '+' binds tighter than '|': the code-review case — a doc with only
    # 'that' must NOT match 'this + (that | thus)'
    out = sqs("this + (that | thus)")
    assert out == {"bool": {"must": [
        {"match": {"text": {"query": "this"}}},
        {"bool": {"should": [
            {"match": {"text": {"query": "that"}}},
            {"match": {"text": {"query": "thus"}}},
        ], "minimum_should_match": 1}},
    ]}}
    # '-' negations lift to the group (Lucene MUST_NOT placement)
    assert sqs("a -b") == {"bool": {
        "should": [{"match": {"text": {"query": "a"}}}],
        "minimum_should_match": 1,
        "must_not": [{"match": {"text": {"query": "b"}}}],
    }}
    assert sqs("a b", default_operator="and") == {"bool": {"must": [
        {"match": {"text": {"query": "a"}}},
        {"match": {"text": {"query": "b"}}},
    ]}}
    # only a TRAILING * is special in SQS — '?' and mid-word '*' are
    # literal characters (unlike query_string)
    assert sqs("te?t") == {"match": {"text": {"query": "te?t"}}}
    assert sqs("a*b") == {"match": {"text": {"query": "a*b"}}}
    with pytest.raises(ValueError, match="fields"):
        parse_simple_query_string({"query": "a"})
    with pytest.raises(ValueError, match="field:value"):
        parse_simple_query_string({"query": "text:a", "fields": ["text"]})


def test_end_to_end_filtering(spark):
    from hive2es_offline_spark.plans.query_dsl import es_search

    df = spark.createDataFrame(
        [
            (1, "web", "merge the stream now", 800),
            (2, "web", "vector index build", 300),
            (3, "api", "merge request queue", 900),
            (4, "web", "stream of vectors", 1200),
        ],
        "id long, source string, text string, n long",
    )
    body = {
        "query": {"query_string": {
            "query": "source:web AND (text:merge OR text:stream) AND n:[500 TO *]",
        }},
        "sort": [{"id": {"order": "asc"}}], "size": 10, "_source": ["id"],
    }
    assert [r["id"] for r in es_search(df, body, id_field="id").collect()] == [1, 4]
    body["query"] = {"query_string": {
        "query": 'merge -"merge request"', "default_field": "text"}}
    assert [r["id"] for r in es_search(df, body, id_field="id").collect()] == [1]
    body["query"] = {"simple_query_string": {
        "query": "vec* | merge", "fields": ["text"]}}
    # prefix semantics are keyword (whole-value), matching the reference's
    # not_analyzed mapping: doc 2 STARTS with "vector...", doc 4 does not
    assert [r["id"] for r in es_search(df, body, id_field="id").collect()] == [1, 2, 3]


def test_field_scoped_group():
    """Lucene field scoping: field:(a OR b) targets every inner value."""
    assert qs("text:(merge OR stream)") == qs("text:merge OR text:stream")
    assert qs('status:(active "on hold")', default_operator="and") == {
        "bool": {"must": [
            {"match": {"status": {"query": "active"}}},
            {"match_phrase": {"status": {"query": "on hold"}}},
        ]}
    }
    # scope pops after the group: the bare term falls back to default_field
    out = qs("status:(a OR b) c", default_field="text")
    assert out["bool"]["should"][1] == {"match": {"text": {"query": "c"}}}
    with pytest.raises(ValueError, match="unbalanced"):
        qs("status:(a OR b")


def test_hyphen_inside_word_is_not_an_operator():
    """Lucene: '-' is the prohibit operator only at term START; a
    mid-word hyphen (dates, foo-bar identifiers) is part of the term —
    pre-fix this silently misparsed field:2024-01-01 as match 2024 plus
    a prohibited bare term."""
    assert qs("d:2024-01-01") == {"match": {"d": {"query": "2024-01-01"}}}
    assert qs("name:foo-bar") == {"match": {"name": {"query": "foo-bar"}}}
    assert qs("n:>-5") == {"range": {"n": {"gt": -5}}}
    assert qs("n:[-10 TO -5]") == {"range": {"n": {"gte": -10, "lte": -5}}}
    # '-' at term start is still the operator
    assert qs("-name:foo", default_field="t") == {
        "bool": {"must_not": [{"match": {"name": {"query": "foo"}}}]}
    }
    assert qs("a -b", default_field="t") == {"bool": {
        "should": [{"match": {"t": {"query": "a"}}}],
        "must_not": [{"match": {"t": {"query": "b"}}}],
        "minimum_should_match": 1,
    }}


def test_term_boost_multiplies_field_boost():
    # ES multiplies a term-level ^n into the fields-option per-field boost
    # (term^3 against title^2 scores 6x) — overwriting dropped the field
    # boost (ADVICE r8)
    out = qs("merge^3", fields=["title^2", "body"])
    assert out == {"bool": {"should": [
        {"match": {"title": {"query": "merge", "boost": 6.0}}},
        {"match": {"body": {"query": "merge", "boost": 3.0}}},
    ], "minimum_should_match": 1}}
