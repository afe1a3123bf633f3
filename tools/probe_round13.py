#!/usr/bin/env python3
"""Round-13 scale probes (1M-row, local[32]) — bound every new surface
against its plain-query floor, the per-round discipline SCALE.md records.

Probes:
  1. german / spanish match at 1M docs vs a plain standard match (new
     chains through the same fold + prefix-guard machinery)
  2. categorize_text over 1M log lines vs a plain terms agg (signature
     is codegen; the groupBy key is just longer)
  3. change_point over a date_histogram series vs the bare histogram
     (O(buckets) window math must be ~free)
  4. search_as_you_type: _2gram/_3gram bool_prefix filter + the full
     scored multi_match vs a plain match (shingle transform cost)
  5. variable_width_histogram vs a plain terms agg over the same values
     (distinct reduce + two reduced-frame windows)
  6. bounded vs unbounded geo_line at an oversized bucket (the r12
     buffering caveat's fix: state capped at `size` per bucket)
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
    spark = get_spark("probe-r13")
    from hive2es_offline_spark.plans.query_dsl import es_search
    from hive2es_offline_spark.plans.scoring import es_scored_search

    n = 1_000_000
    de_words = ("die kinder spielten in den gärten über der straße "
                "das kleinste haus filme schnellsten bücher wagen "
                "merge stream run data quality reads").split()
    df = (spark.range(n)
          .withColumn("text", F.concat_ws(" ", *[
              F.element_at(F.lit(de_words),
                           ((F.col("id") * (3 + i)) % len(de_words) + 1)
                           .cast("int"))
              for i in range(12)]))
          .withColumn("msg", F.concat(
              F.lit("connection from host-"), F.col("id").cast("string"),
              F.lit(" failed after "), (F.col("id") % 7).cast("string"),
              F.lit(" retries")))
          .withColumn("d", F.date_add(F.lit("2020-01-01").cast("date"),
                                      (F.col("id") % 900).cast("int")))
          .withColumn("v", (F.col("id") % 1000).cast("double")
                      + F.when(F.col("id") % 900 >= 600, 5000.0)
                      .otherwise(0.0))
          .withColumn("g", (F.col("id") % 64).cast("string"))
          .withColumn("lat", ((F.col("id") % 160) - 80 + 0.5).cast("double"))
          .withColumn("lon", ((F.col("id") * 7 % 360) - 180 + 0.5)
                      .cast("double"))
          .withColumn("loc", F.struct("lat", "lon"))
          .localCheckpoint())
    df.count()

    def match(analyzer, q):
        body = {"query": {"match": {"text": q}}, "size": 0,
                "aggs": {"n": {"value_count": {"field": "id"}}}}
        return es_search(df, body, id_field="id", analyzer=analyzer).count()

    std = t(lambda: match(None, "merge stream"))
    print(f"standard match floor                  {std:6.2f}s")
    de = t(lambda: match("german", "kindern straße"))
    print(f"german match (fold+stem)              {de:6.2f}s  x{de/std:.1f}")
    es_m = t(lambda: match("spanish", "luces niños"))
    print(f"spanish match (fold+stem)             {es_m:6.2f}s  x{es_m/std:.1f}")

    terms_agg = t(lambda: es_search(df, {
        "size": 0, "aggs": {"a": {"terms": {"field": "g", "size": 64}}}},
        id_field="id").count())
    cat = t(lambda: es_search(df, {
        "size": 0, "aggs": {"c": {"categorize_text": {
            "field": "msg", "size": 10}}}}, id_field="id").count())
    print(f"terms floor {terms_agg:.2f}s | categorize_text  {cat:6.2f}s  "
          f"x{cat/terms_agg:.1f}")

    dh = t(lambda: es_search(df, {
        "size": 0, "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"s": {"sum": {"field": "v"}}}}}},
        id_field="id").count())
    cp = t(lambda: es_search(df, {
        "size": 0, "aggs": {
            "m": {"date_histogram": {"field": "d",
                                     "calendar_interval": "month"},
                  "aggs": {"s": {"sum": {"field": "v"}}}},
            "cp": {"change_point": {"buckets_path": "m>s"}}}},
        id_field="id").count())
    print(f"date_hist+sum floor {dh:.2f}s | +change_point   {cp:6.2f}s  "
          f"x{cp/dh:.1f}")

    g2 = t(lambda: es_search(df, {
        "query": {"match_bool_prefix": {"text._2gram": "merge strea"}},
        "size": 0, "aggs": {"n": {"value_count": {"field": "id"}}}},
        id_field="id").count())
    print(f"sayt _2gram bool_prefix filter        {g2:6.2f}s  x{g2/std:.1f}")
    scored_floor = t(lambda: es_scored_search(df, {
        "query": {"match": {"text": "merge stream"}}, "size": 10},
        id_field="id").count())
    sayt_scored = t(lambda: es_scored_search(df, {
        "query": {"multi_match": {
            "query": "merge stream run", "type": "bool_prefix",
            "fields": ["text", "text._2gram", "text._3gram"]}},
        "size": 10}, id_field="id").count())
    print(f"scored match floor {scored_floor:.2f}s | sayt 3 fields "
          f"{sayt_scored:6.2f}s  x{sayt_scored/scored_floor:.1f}")

    vw = t(lambda: es_search(df, {
        "size": 0, "aggs": {"b": {"variable_width_histogram": {
            "field": "v", "buckets": 12}}}}, id_field="id").count())
    print(f"terms floor {terms_agg:.2f}s | variable_width   {vw:6.2f}s  "
          f"x{vw/terms_agg:.1f}")

    def gline(extra):
        return es_search(df, {
            "size": 0, "aggs": {"tr": {
                "terms": {"field": "g", "size": 64},
                "aggs": {"line": {"geo_line": {
                    "point": {"field": "loc"}, "sort": {"field": "id"},
                    "size": 100, **extra}}}}}}, id_field="id").count()

    gl_u = t(lambda: gline({}))
    gl_b = t(lambda: gline({"bounded": True}))
    print(f"geo_line unbounded {gl_u:6.2f}s | bounded {gl_b:6.2f}s  "
          f"x{gl_b/gl_u:.2f}")


if __name__ == "__main__":
    main()
