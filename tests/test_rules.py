"""Query rules (round 14): the ``_query_rules`` registry + the ``rule``
query rewrite (plans/rules.py) — pinned/exclude actions, the criteria
type set, and the search-path integration on both filter and score
context."""
import pytest

from hive2es_offline_spark.plans.rules import (
    _osa_distance,
    delete_query_ruleset,
    expand_rule_queries,
    get_query_ruleset,
    list_query_rulesets,
    put_query_ruleset,
)


@pytest.fixture()
def promo_ruleset():
    put_query_ruleset("promo", [
        {"rule_id": "pin-pugs", "type": "pinned",
         "criteria": [{"type": "exact", "metadata": "user_query",
                       "values": ["pugs", "puggles"]}],
         "actions": {"ids": ["d1", "d2"]}},
        {"rule_id": "pin-fuzzy", "type": "pinned",
         "criteria": [{"type": "fuzzy", "metadata": "user_query",
                       "values": ["puggles"]}],
         "actions": {"ids": ["d3"]}},
        {"rule_id": "drop-cheap", "type": "exclude",
         "criteria": [{"type": "contains", "metadata": "user_query",
                       "values": ["cheap"]}],
         "actions": {"ids": ["d2"]}},
    ])
    yield "promo"
    delete_query_ruleset("promo")


class TestRegistry:
    def test_put_get_delete(self):
        put_query_ruleset("tmp", [
            {"rule_id": "a", "type": "pinned",
             "criteria": [{"type": "always"}],
             "actions": {"ids": ["x"]}}])
        assert "tmp" in list_query_rulesets()
        assert get_query_ruleset("tmp")[0]["rule_id"] == "a"
        delete_query_ruleset("tmp")
        assert "tmp" not in list_query_rulesets()
        with pytest.raises(KeyError):
            get_query_ruleset("tmp")
        with pytest.raises(KeyError):
            delete_query_ruleset("tmp")

    def test_docs_actions_pin_by_id(self):
        put_query_ruleset("tmp", [
            {"rule_id": "a", "type": "pinned",
             "criteria": [{"type": "always"}],
             "actions": {"docs": [{"_index": "i", "_id": "7"}]}}])
        try:
            out = expand_rule_queries({"rule": {
                "organic": {"match_all": {}},
                "ruleset_ids": ["tmp"], "match_criteria": {"q": "x"}}})
            assert out == {"pinned": {"ids": ["7"],
                                      "organic": {"match_all": {}}}}
        finally:
            delete_query_ruleset("tmp")

    @pytest.mark.parametrize("bad,msg", [
        ([{"rule_id": "a", "type": "boost",
           "criteria": [{"type": "always"}], "actions": {"ids": ["x"]}}],
         "type"),
        ([{"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "regex", "metadata": "q",
                         "values": ["x"]}], "actions": {"ids": ["x"]}}],
         "criteria type"),
        ([{"rule_id": "a", "type": "pinned", "criteria": [],
           "actions": {"ids": ["x"]}}], "criteria"),
        ([{"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "exact", "values": ["x"]}],
           "actions": {"ids": ["x"]}}], "metadata"),
        ([{"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "always"}],
           "actions": {"ids": ["x"], "docs": []}}], "actions"),
        ([{"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "lt", "metadata": "n",
                         "values": ["abc"]}],
           "actions": {"ids": ["x"]}}], "could not convert"),
        ([{"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "always"}], "actions": {"ids": ["x"]},
           "extra": 1}], "unknown rule key"),
        ([{"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "always"}], "actions": {"ids": ["x"]}},
          {"rule_id": "a", "type": "pinned",
           "criteria": [{"type": "always"}], "actions": {"ids": ["y"]}}],
         "duplicate"),
    ])
    def test_put_rejects_loudly(self, bad, msg):
        with pytest.raises(ValueError, match=msg):
            put_query_ruleset("bad", bad)
        assert "bad" not in list_query_rulesets()


class TestCriteria:
    def _expand(self, rules, match_criteria):
        put_query_ruleset("crit", rules)
        try:
            return expand_rule_queries({"rule": {
                "organic": {"match_all": {}}, "ruleset_ids": ["crit"],
                "match_criteria": match_criteria}})
        finally:
            delete_query_ruleset("crit")

    def _pin_if(self, criteria, match_criteria):
        out = self._expand(
            [{"rule_id": "r", "type": "pinned", "criteria": criteria,
              "actions": {"ids": ["p"]}}], match_criteria)
        return out == {"pinned": {"ids": ["p"],
                                  "organic": {"match_all": {}}}}

    def test_exact_case_insensitive(self):
        c = [{"type": "exact", "metadata": "q", "values": ["Pugs"]}]
        assert self._pin_if(c, {"q": "pugs"})
        assert not self._pin_if(c, {"q": "pug"})

    def test_prefix_suffix_contains(self):
        assert self._pin_if(
            [{"type": "prefix", "metadata": "q", "values": ["pug"]}],
            {"q": "puggles"})
        assert self._pin_if(
            [{"type": "suffix", "metadata": "q", "values": ["les"]}],
            {"q": "puggles"})
        assert self._pin_if(
            [{"type": "contains", "metadata": "q", "values": ["ggl"]}],
            {"q": "puggles"})
        assert not self._pin_if(
            [{"type": "prefix", "metadata": "q", "values": ["les"]}],
            {"q": "puggles"})

    def test_fuzzy_auto_ladder(self):
        c = [{"type": "fuzzy", "metadata": "q", "values": ["puggles"]}]
        assert self._pin_if(c, {"q": "puggles"})    # d=0
        assert self._pin_if(c, {"q": "puggle"})     # d=1
        assert self._pin_if(c, {"q": "pugles"})     # d=1
        assert self._pin_if(c, {"q": "pugglse"})    # transpose, d=1
        assert not self._pin_if(c, {"q": "pug"})    # d=4
        # short criteria value → AUTO 0: only exact matches
        c2 = [{"type": "fuzzy", "metadata": "q", "values": ["ab"]}]
        assert self._pin_if(c2, {"q": "ab"})
        assert not self._pin_if(c2, {"q": "ax"})

    def test_numeric_bounds(self):
        gte = [{"type": "gte", "metadata": "n", "values": [5]}]
        assert self._pin_if(gte, {"n": 5})
        assert self._pin_if(gte, {"n": "7.5"})
        assert not self._pin_if(gte, {"n": 4})
        lt = [{"type": "lt", "metadata": "n", "values": [5]}]
        assert self._pin_if(lt, {"n": 4})
        assert not self._pin_if(lt, {"n": 5})
        # non-numeric metadata fails the criterion, not the query
        assert not self._pin_if(gte, {"n": "many"})

    def test_all_criteria_must_match(self):
        c = [{"type": "exact", "metadata": "q", "values": ["pugs"]},
             {"type": "gte", "metadata": "n", "values": [5]}]
        assert self._pin_if(c, {"q": "pugs", "n": 9})
        assert not self._pin_if(c, {"q": "pugs", "n": 1})
        assert not self._pin_if(c, {"q": "pugs"})  # missing key → no match

    def test_always(self):
        assert self._pin_if([{"type": "always"}], {"q": "anything"})


class TestExpansion:
    def test_pin_order_and_dedup(self, promo_ruleset):
        out = expand_rule_queries({"rule": {
            "organic": {"match": {"t": "dogs"}},
            "ruleset_ids": ["promo"],
            "match_criteria": {"user_query": "puggles"}}})
        # pin-pugs (d1,d2) then pin-fuzzy (d3); no exclusion matched
        assert out == {"pinned": {
            "ids": ["d1", "d2", "d3"],
            "organic": {"match": {"t": "dogs"}}}}

    def test_exclude_wins_over_pin(self, promo_ruleset):
        out = expand_rule_queries({"rule": {
            "organic": {"match": {"t": "dogs"}},
            "ruleset_ids": ["promo"],
            "match_criteria": {"user_query": "cheap pugs"}}})
        # "cheap pugs" contains cheap → d2 excluded; exact criterion
        # needs the WHOLE metadata value == "pugs", so no pins
        assert out == {"bool": {
            "must": [{"match": {"t": "dogs"}}],
            "must_not": [{"ids": {"values": ["d2"]}}]}}

    def test_no_rule_matched_returns_organic(self, promo_ruleset):
        out = expand_rule_queries({"rule": {
            "organic": {"match": {"t": "dogs"}},
            "ruleset_ids": ["promo"],
            "match_criteria": {"user_query": "cats"}}})
        assert out == {"match": {"t": "dogs"}}

    def test_nested_inside_bool(self, promo_ruleset):
        out = expand_rule_queries({"bool": {"must": [
            {"rule": {"organic": {"match": {"t": "dogs"}},
                      "ruleset_ids": ["promo"],
                      "match_criteria": {"user_query": "pugs"}}},
            {"term": {"k": "v"}}]}})
        assert out["bool"]["must"][1] == {"term": {"k": "v"}}
        assert "pinned" in out["bool"]["must"][0]

    def test_singular_ruleset_id_accepted(self, promo_ruleset):
        out = expand_rule_queries({"rule": {
            "organic": {"match_all": {}}, "ruleset_id": "promo",
            "match_criteria": {"user_query": "pugs"}}})
        assert out["pinned"]["ids"] == ["d1", "d2"]

    def test_rejects_loudly(self, promo_ruleset):
        with pytest.raises(ValueError, match="unknown query ruleset"):
            expand_rule_queries({"rule": {
                "organic": {"match_all": {}}, "ruleset_ids": ["nope"],
                "match_criteria": {"q": "x"}}})
        with pytest.raises(ValueError, match="match_criteria"):
            expand_rule_queries({"rule": {
                "organic": {"match_all": {}},
                "ruleset_ids": ["promo"]}})
        with pytest.raises(ValueError, match="organic"):
            expand_rule_queries({"rule": {
                "ruleset_ids": ["promo"], "match_criteria": {"q": "x"}}})
        with pytest.raises(ValueError, match="unknown rule query key"):
            expand_rule_queries({"rule": {
                "organic": {"match_all": {}}, "ruleset_ids": ["promo"],
                "match_criteria": {"q": "x"}, "boost": 2}})


class TestOsaDistance:
    def test_vectors(self):
        assert _osa_distance("", "", 2) == 0
        assert _osa_distance("abc", "abc", 2) == 0
        assert _osa_distance("abc", "abd", 2) == 1
        assert _osa_distance("abc", "acb", 2) == 1   # transpose
        assert _osa_distance("abc", "ab", 2) == 1
        assert _osa_distance("abcd", "badc", 2) == 2
        # band cap: returns cap+1 once it must exceed
        assert _osa_distance("abcdef", "zyxwvu", 2) == 3
        assert _osa_distance("short", "muchlongerstring", 2) == 3


class TestSearchIntegration:
    def test_filter_context(self, spark, promo_ruleset):
        from hive2es_offline_spark.plans.query_dsl import es_search

        df = spark.createDataFrame(
            [("d1", "cats"), ("d2", "dogs"), ("d3", "dogs"),
             ("d4", "dogs fetch")],
            "id string, t string")
        body = {"query": {"rule": {
            "organic": {"match": {"t": "dogs"}},
            "ruleset_ids": ["promo"],
            "match_criteria": {"user_query": "pugs"}}},
            "_source": ["id"], "size": 10}
        got = sorted(r["id"] for r in
                     es_search(df, body, id_field="id").collect())
        # organic dogs docs (d2,d3,d4) + pinned d1; d2 pinned too
        assert got == ["d1", "d2", "d3", "d4"]

    def test_scored_pins_sort_first(self, spark, promo_ruleset):
        from hive2es_offline_spark.plans.scoring import es_scored_search

        df = spark.createDataFrame(
            [("d1", "cats"), ("d2", "dogs"), ("d3", "dogs"),
             ("d4", "dogs dogs dogs")],
            "id string, t string")
        body = {"query": {"rule": {
            "organic": {"match": {"t": "dogs"}},
            "ruleset_ids": ["promo"],
            "match_criteria": {"user_query": "puggles"}}},
            "sort": [{"_score": "desc"}, {"id": "asc"}],
            "_source": ["id"], "size": 10}
        got = [r["id"] for r in
               es_scored_search(df, body, id_field="id").collect()]
        # pins in rule order (d1, d2, d3) above the organic d4
        assert got == ["d1", "d2", "d3", "d4"]

    def test_scored_exclude(self, spark, promo_ruleset):
        from hive2es_offline_spark.plans.scoring import es_scored_search

        df = spark.createDataFrame(
            [("d1", "dogs"), ("d2", "dogs"), ("d3", "dogs")],
            "id string, t string")
        body = {"query": {"rule": {
            "organic": {"match": {"t": "dogs"}},
            "ruleset_ids": ["promo"],
            "match_criteria": {"user_query": "cheap dogs"}}},
            "sort": [{"id": "asc"}], "_source": ["id"], "size": 10}
        got = [r["id"] for r in
               es_scored_search(df, body, id_field="id").collect()]
        assert got == ["d1", "d3"]


class TestReviewFixes:
    """Round-14 review pins: loud rejects for malformed rulesets."""

    def test_ids_string_rejects(self):
        with pytest.raises(ValueError, match="must be a list"):
            put_query_ruleset("bad", [
                {"rule_id": "a", "type": "pinned",
                 "criteria": [{"type": "always"}],
                 "actions": {"ids": "317"}}])
        assert "bad" not in list_query_rulesets()

    def test_unknown_criteria_key_rejects(self):
        with pytest.raises(ValueError, match="unknown criteria key"):
            put_query_ruleset("bad", [
                {"rule_id": "a", "type": "pinned",
                 "criteria": [{"type": "exact", "metadata": "q",
                               "values": ["x"], "case_sensitive": True}],
                 "actions": {"ids": ["1"]}}])
