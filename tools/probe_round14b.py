#!/usr/bin/env python3
"""Round-14 second-batch scale probes (1M-row, local[32]) — bound each
new surface against its plain-query floor, the per-round discipline
SCALE.md records.

Probes:
  1. dutch match at 1M docs vs a plain standard match (the chain's
     three-step stemmer through the same fold-first/prefix-guard
     machinery as the other languages)
  2. rule query vs its organic query alone (the rewrite is driver-side;
     the plan cost must be the pinned/bool composition's, ~1.0x)
  3. ES|QL SAMPLE 0.2 + STATS vs the same STATS unsampled (the LCG gate
     rides the scan; downstream rows scale by p)
  4. ES|QL CATEGORIZE STATS vs the categorize_text agg on the same
     corpus (same signature expression + groupBy; CATEGORIZE carries no
     max_buckets guard pass, so it reads at or below the agg)
  5. ES|QL CHANGE_POINT over a reduced 40-row series (fixed O(buckets)
     overhead: detector windows + 1-row broadcast annotate)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from hive2es_offline_spark.session import get_spark  # noqa: E402


def t(fn, runs=2):
    fn()  # warm
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    spark = get_spark("probe-r14b")
    from hive2es_offline_spark.plans.esql import esql
    from hive2es_offline_spark.plans.query_dsl import es_search
    from hive2es_offline_spark.plans.rules import (
        delete_query_ruleset,
        put_query_ruleset,
    )

    n = 1_000_000
    nl_words = ("katten boeken mogelijkheden huisjes jongens vogels "
                "twee vrije zonder kat regering fietsen").split()
    en_words = ("merge stream run data quality reads scan write batch "
                "index shard node").split()

    def text_col(vocab):
        return F.concat_ws(" ", *[
            F.element_at(F.lit(vocab),
                         ((F.col("id") * m + a) % 12).cast("int") + 1)
            for m, a in ((1, 0), (7, 3), (13, 5), (29, 11))])

    base = spark.range(n)

    # 1. dutch vs standard match -------------------------------------
    def match_probe(vocab, analyzer, q):
        d = base.withColumn("text", text_col(vocab))
        body = {"query": {"match": {"text": q}},
                "sort": [{"id": "asc"}], "size": 50, "_source": ["id"]}
        return lambda: es_search(d, body, id_field="id",
                                 analyzer=analyzer).collect()

    std = t(match_probe(en_words, "standard", "merge data"))
    nl = t(match_probe(nl_words, "dutch", "kat mogelijkheid"))
    print(f"match 1M: standard={std:.2f}s dutch={nl:.2f}s "
          f"(x{nl / std:.1f})")

    # 2. rule query vs organic ----------------------------------------
    put_query_ruleset("probe", [
        {"rule_id": "p1", "type": "pinned",
         "criteria": [{"type": "exact", "metadata": "q",
                       "values": ["kat"]}],
         "actions": {"ids": ["5", "17"]}},
        {"rule_id": "x1", "type": "exclude",
         "criteria": [{"type": "always"}],
         "actions": {"ids": ["99"]}},
    ])
    d = base.withColumn("text", text_col(nl_words))
    organic = {"match": {"text": "kat mogelijkheid"}}
    b_org = {"query": organic, "sort": [{"id": "asc"}], "size": 50,
             "_source": ["id"]}
    b_rule = {"query": {"rule": {"organic": organic,
                                 "ruleset_ids": ["probe"],
                                 "match_criteria": {"q": "kat"}}},
              "sort": [{"id": "asc"}], "size": 50, "_source": ["id"]}
    org_s = t(lambda: es_search(d, b_org, id_field="id",
                                analyzer="dutch").collect())
    rule_s = t(lambda: es_search(d, b_rule, id_field="id",
                                 analyzer="dutch").collect())
    delete_query_ruleset("probe")
    print(f"rule query 1M: organic={org_s:.2f}s rule={rule_s:.2f}s "
          f"(x{rule_s / org_s:.1f})")

    # 3. ES|QL SAMPLE --------------------------------------------------
    ev = base.select(F.col("id").alias("event_id"),
                     (F.col("id") % 7).cast("string").alias("etype"),
                     (F.col("id") % 100).cast("double").alias("value"))
    full = t(lambda: esql(
        {"e": ev},
        "FROM e | STATS n = COUNT(*), s = SUM(value) BY etype"
    ).collect())
    samp = t(lambda: esql(
        {"e": ev},
        "FROM e | SAMPLE 0.2 event_id "
        "| STATS n = COUNT(*), s = SUM(value) BY etype"
    ).collect())
    print(f"esql STATS 1M: full={full:.2f}s sample0.2={samp:.2f}s "
          f"(x{samp / full:.1f})")

    # 4. ES|QL CATEGORIZE vs categorize_text agg -----------------------
    logs = base.withColumn(
        "msg",
        F.concat(F.element_at(
            F.lit(["Connected to host", "Connection error at",
                   "User login from", "Disk usage warning on"]),
            (F.col("id") % 4).cast("int") + 1),
            F.lit(" 10.0.0."), (F.col("id") % 255).cast("string")))
    agg_s = t(lambda: es_search(
        logs, {"size": 0, "aggs": {"cats": {"categorize_text": {
            "field": "msg", "size": 10}}}}, id_field="id").collect())
    esq_s = t(lambda: esql(
        {"l": logs},
        "FROM l | STATS n = COUNT(*) BY cat = CATEGORIZE(msg) "
        "| SORT n DESC, cat ASC | LIMIT 10").collect())
    print(f"categorize 1M: agg={agg_s:.2f}s esql={esq_s:.2f}s "
          f"(x{esq_s / agg_s:.1f})")

    # 5. ES|QL CHANGE_POINT fixed overhead ------------------------------
    series = base.select(
        (F.col("id") % 40).alias("k"),
        F.when(F.col("id") % 40 >= 25, 6.0).otherwise(1.0).alias("v"))
    red = t(lambda: esql(
        {"s": series},
        "FROM s | STATS va = AVG(v) BY k | SORT k ASC").collect())
    cp = t(lambda: esql(
        {"s": series},
        "FROM s | STATS va = AVG(v) BY k | CHANGE_POINT va ON k "
        "| SORT k ASC").collect())
    print(f"change_point 1M→40: stats={red:.2f}s +detector={cp:.2f}s "
          f"(x{cp / red:.1f})")

    spark.stop()


if __name__ == "__main__":
    main()
