"""KQL grammar units (plans/kql.py): each production compiles to the
documented query-DSL shape, and the honest-subset rejects are loud.

The DSL dicts asserted here are consumed by the already-audited
plans/query_dsl.compile_query — end-to-end behavior is covered by
tests/test_esql.py::TestFullTextRoundOut.
"""

import pytest

from hive2es_offline_spark.plans.kql import parse_kql


class TestAtoms:
    def test_field_value_is_match(self):
        assert parse_kql("lang:en") == {"match": {"lang": "en"}}

    def test_spaces_around_colon(self):
        assert parse_kql("lang : en") == {"match": {"lang": "en"}}

    def test_numeric_value_is_term(self):
        assert parse_kql("status:200") == {"term": {"status": 200}}
        assert parse_kql("ratio:1.5") == {"term": {"ratio": 1.5}}

    def test_quoted_value_is_phrase(self):
        assert parse_kql('msg:"quick brown fox"') == \
            {"match_phrase": {"msg": "quick brown fox"}}

    def test_star_value_is_exists(self):
        assert parse_kql("lang:*") == {"exists": {"field": "lang"}}

    def test_wildcard_value(self):
        assert parse_kql("name:mer*ge") == \
            {"wildcard": {"name": {"value": "mer*ge"}}}

    def test_ranges(self):
        assert parse_kql("n > 5") == {"range": {"n": {"gt": 5}}}
        assert parse_kql("n >= 5") == {"range": {"n": {"gte": 5}}}
        assert parse_kql("n < 5") == {"range": {"n": {"lt": 5}}}
        assert parse_kql("n <= 5") == {"range": {"n": {"lte": 5}}}

    def test_range_accepts_quoted_string_bound(self):
        # date-style bounds stay strings (the range compiler handles
        # typed columns)
        assert parse_kql('ts >= "2021-01-01"') == \
            {"range": {"ts": {"gte": "2021-01-01"}}}

    def test_escaped_keyword_is_a_term(self):
        assert parse_kql("lang:\\and") == {"match": {"lang": "and"}}

    def test_escaped_number_is_still_numeric_shape(self):
        # escapes mark the value a deliberate term — no numeric re-type
        assert parse_kql("v:\\200") == {"match": {"v": "200"}}


class TestBooleans:
    def test_and(self):
        assert parse_kql("a:1 and b:2") == {"bool": {"must": [
            {"term": {"a": 1}}, {"term": {"b": 2}}]}}

    def test_or_binds_loosest(self):
        out = parse_kql("a:1 or b:2 and c:3")
        assert out == {"bool": {"should": [
            {"term": {"a": 1}},
            {"bool": {"must": [{"term": {"b": 2}}, {"term": {"c": 3}}]}}]}}

    def test_not_binds_tightest(self):
        out = parse_kql("not a:1 and b:2")
        assert out == {"bool": {"must": [
            {"bool": {"must_not": [{"term": {"a": 1}}]}},
            {"term": {"b": 2}}]}}

    def test_parens_override(self):
        out = parse_kql("(a:1 or b:2) and c:3")
        assert out == {"bool": {"must": [
            {"bool": {"should": [{"term": {"a": 1}}, {"term": {"b": 2}}]}},
            {"term": {"c": 3}}]}}

    def test_keywords_case_insensitive(self):
        assert parse_kql("a:1 AND b:2") == parse_kql("a:1 and b:2")
        assert parse_kql("NOT a:1") == parse_kql("not a:1")


class TestValueGroups:
    def test_or_group(self):
        assert parse_kql("lang:(en or de)") == {"bool": {"should": [
            {"match": {"lang": "en"}}, {"match": {"lang": "de"}}]}}

    def test_and_group_with_not(self):
        out = parse_kql("tag:(x and not y)")
        assert out == {"bool": {"must": [
            {"match": {"tag": "x"}},
            {"bool": {"must_not": [{"match": {"tag": "y"}}]}}]}}

    def test_nested_group_parens(self):
        out = parse_kql("tag:((a or b) and c)")
        assert out == {"bool": {"must": [
            {"bool": {"should": [{"match": {"tag": "a"}},
                                 {"match": {"tag": "b"}}]}},
            {"match": {"tag": "c"}}]}}


class TestRejects:
    @pytest.mark.parametrize("bad,msg", [
        ("loose", "bare term"),
        ('"loose phrase"', "bare term"),
        ("machine*:x", "field wildcards"),
        ("machine* > 3", "field wildcards"),
        ("lang:{ a:b }", "nested field"),
        ("lang:", "unexpected end"),
        ("lang:en or", "unexpected end"),
        ("(lang:en", "unexpected end"),
        ("lang:en)", "trailing input"),
        ("lang:en extra:2", "trailing input"),
        ('msg:"unterminated', "unterminated"),
        ("n > and", "keyword"),
        ("lang:and", "keyword"),
        ("", "non-empty"),
        ("   ", "non-empty"),
        ("lang:en \\", "dangling backslash"),
    ])
    def test_loud(self, bad, msg):
        with pytest.raises(ValueError, match=msg):
            parse_kql(bad)

    def test_numbers_are_strict_ascii(self):
        # Python's int() would accept these spellings; the grammar
        # must not silently re-type them
        assert parse_kql("v:1_0") == {"match": {"v": "1_0"}}
        assert parse_kql("v:nan") == {"match": {"v": "nan"}}
        assert parse_kql("v:inf") == {"match": {"v": "inf"}}
