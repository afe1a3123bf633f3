#!/usr/bin/env python3
"""Round-13 scale probes, second batch (1M-row, local[32]) — bound the
aggregation-tail surfaces against their plain-query floors.

Probes:
  1. extended_stats_bucket beside a date_histogram+avg vs the bare
     histogram (ONE extra reduce-phase aggregate + broadcast crossJoin —
     must be ~free)
  2. cumulative_cardinality vs the bare histogram+cardinality (adds a
     value-keyed groupBy — the distinct shuffle class — plus a
     broadcast join on <= #buckets rows)
  3. random_sampler p=0.5 / p=0.1 vs the unsampled aggregate (the hash
     gate is a codegen filter riding the scan: LESS work than the
     floor, approaching p× as p shrinks)
  4. hex_grid vs geotile_grid at the same precision (same one-groupBy
     shape; axial/cube-round math is a few more codegen ops per row)
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
    spark = get_spark("probe-r13b")
    from hive2es_offline_spark.plans.query_dsl import compile_aggs

    n = 1_000_000
    df = (spark.range(n)
          .withColumn("ts", F.to_timestamp(F.date_add(
              F.lit("2020-01-01").cast("date"),
              (F.col("id") % 365).cast("int"))))
          .withColumn("v", (F.col("id") % 997).cast("double") / 7.0)
          .withColumn("user", (F.col("id") % 50_000))
          .withColumn("lat", ((F.col("id") % 160) - 80 + 0.5).cast("double"))
          .withColumn("lon", ((F.col("id") * 7 % 360) - 180 + 0.5)
                      .cast("double"))
          .withColumn("loc", F.struct("lat", "lon"))
          .localCheckpoint())
    df.count()

    hist = {"h": {"date_histogram": {"field": "ts",
                                     "calendar_interval": "day"},
                  "aggs": {"va": {"avg": {"field": "v"}}}}}
    floor_h = t(lambda: compile_aggs(df, hist, id_field="id").count())
    print(f"date_histogram+avg floor              {floor_h:6.2f}s")

    esb = {**hist, "es": {"extended_stats_bucket": {"buckets_path": "h>va"}}}
    t_esb = t(lambda: compile_aggs(df, esb, id_field="id").count())
    print(f"+ extended_stats_bucket               {t_esb:6.2f}s"
          f"  (x{t_esb / floor_h:.2f})")

    card = {"h": {"date_histogram": {"field": "ts",
                                     "calendar_interval": "day"},
                  "aggs": {"users": {"cardinality": {"field": "user"}}}}}
    floor_c = t(lambda: compile_aggs(df, card, id_field="id").count())
    print(f"date_histogram+cardinality floor      {floor_c:6.2f}s")

    cum = {"h": {**card["h"],
                 "aggs": {**card["h"]["aggs"],
                          "cum": {"cumulative_cardinality": {
                              "buckets_path": "users"}}}}}
    t_cum = t(lambda: compile_aggs(df, cum, id_field="id").count())
    print(f"+ cumulative_cardinality              {t_cum:6.2f}s"
          f"  (x{t_cum / floor_c:.2f})")

    plain = {"s": {"sum": {"field": "v"}},
             "m": {"avg": {"field": "v"}}}
    floor_s = t(lambda: compile_aggs(df, plain, id_field="id").count())
    print(f"unsampled sum+avg floor               {floor_s:6.2f}s")

    for p in (0.5, 0.1):
        samp = {"smp": {"random_sampler": {"probability": p, "seed": 7,
                                           "field": "id"},
                        "aggs": plain}}
        t_s = t(lambda: compile_aggs(df, samp, id_field="id").count())
        print(f"random_sampler p={p:<4}                 {t_s:6.2f}s"
              f"  (x{t_s / floor_s:.2f})")

    from hive2es_offline_spark.plans.query_dsl import es_search

    it_words = ("figlie figlia figlio l'amico dell'acqua città ragazzi "
                "ragazzo veloci libri amiche isola").split()
    pt_words = ("limões limão animais animal papéis papel livros livro "
                "flores flor casas coração").split()
    txt = df
    for name, words in (("it", it_words), ("pt", pt_words)):
        txt = txt.withColumn(name, F.concat_ws(" ", *[
            F.element_at(F.lit(words),
                         ((F.col("id") * (3 + i)) % len(words) + 1)
                         .cast("int"))
            for i in range(12)]))
    txt = txt.localCheckpoint()
    txt.count()

    def match(col, analyzer, q):
        body = {"query": {"match": {col: q}}, "size": 0,
                "aggs": {"n": {"value_count": {"field": "id"}}}}
        return es_search(txt, body, id_field="id",
                         analyzer=analyzer).count()

    floor_m = t(lambda: match("it", None, "figlio amiche"))
    print(f"standard match floor                  {floor_m:6.2f}s")
    t_it = t(lambda: match("it", "italian", "figlio l'amico"))
    print(f"italian match                         {t_it:6.2f}s"
          f"  (x{t_it / floor_m:.2f})")
    t_pt = t(lambda: match("pt", "portuguese", "limões flores"))
    print(f"portuguese match                      {t_pt:6.2f}s"
          f"  (x{t_pt / floor_m:.2f})")

    from hive2es_offline_spark.operators.classify import score_linear

    w = {wd: (0.3 if i % 2 else -0.4) for i, wd in enumerate(it_words)}
    floor_t = t(lambda: txt.where(F.length("it") > 10).count())
    print(f"plain text-filter floor               {floor_t:6.2f}s")
    t_cls = t(lambda: score_linear(txt, "it", w, bias=0.1)
              .where(F.col("score") >= 0.5).count())
    print(f"linear classifier (map shape)         {t_cls:6.2f}s"
          f"  (x{t_cls / floor_t:.2f})")

    tile = {"g": {"geotile_grid": {"field": "loc", "precision": 6,
                                   "size": 10_000}}}
    floor_g = t(lambda: compile_aggs(df, tile, id_field="id").count())
    print(f"geotile_grid floor                    {floor_g:6.2f}s")

    hexg = {"g": {"hex_grid": {"field": "loc", "precision": 6,
                               "size": 10_000}}}
    t_x = t(lambda: compile_aggs(df, hexg, id_field="id").count())
    print(f"hex_grid                              {t_x:6.2f}s"
          f"  (x{t_x / floor_g:.2f})")

    spark.stop()


if __name__ == "__main__":
    main()
