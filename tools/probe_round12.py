#!/usr/bin/env python3
"""Round-12 scale probes (1M-row, local[32]) — bound every new surface
against its plain-query floor, the per-round discipline SCALE.md records.

Probes:
  1. french/folded match + phrase at 1M docs vs a plain standard match
     (does the char-filter + prefix-guard machinery hold the r11 bound?)
  2. geo_shape multipolygon-with-hole vs a plain range filter (codegen
     ray cast scaling)
  3. ip_prefix aggregation vs a plain terms agg
  4. rate+normalize vs a plain date_histogram+sum
  5. geo_line per-bucket collect vs a plain groupBy sum (state bound =
     bucket size — the documented caveat)
  6. image_dedup throughput on 20k synthesized PNGs (Python decode path)
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
    spark = get_spark("probe-r12")
    from hive2es_offline_spark.plans.analysis import register_analyzer
    from hive2es_offline_spark.plans.query_dsl import es_search

    register_analyzer("folded_fr_probe", elision=True, asciifolding=True,
                      stopwords="_french_", stemmer="french")

    n = 1_000_000
    words = ("les café châteaux chevaux de l'été étaient généreux "
             "merge stream run sorted rows scanner reads data quality "
             "voiture maison fromage personne chanteuse rien").split()
    df = (spark.range(n)
          .withColumn("text", F.concat_ws(" ", *[
              F.element_at(F.lit(words),
                           ((F.col("id") * (3 + i)) % len(words) + 1)
                           .cast("int"))
              for i in range(12)]))
          .withColumn("lat", ((F.col("id") % 160) - 80 + 0.5).cast("double"))
          .withColumn("lon", ((F.col("id") * 7 % 360) - 180 + 0.5)
                      .cast("double"))
          .withColumn("loc", F.struct("lat", "lon"))
          .withColumn("ip", F.concat_ws(
              ".", (10 + F.col("id") % 5).cast("string"),
              ((F.col("id") * 7) % 256).cast("string"),
              ((F.col("id") * 13) % 256).cast("string"),
              (F.col("id") % 256).cast("string")))
          .withColumn("d", F.date_add(F.lit("2020-01-01").cast("date"),
                                      (F.col("id") % 900).cast("int")))
          .withColumn("v", (F.col("id") % 1000).cast("double"))
          .withColumn("g", (F.col("id") % 64).cast("string"))
          .localCheckpoint())
    df.count()

    floor = t(lambda: df.where(F.coalesce(
        F.array_contains(F.split(F.lower("text"), " "), "merge"),
        F.lit(False))).count())
    print(f"floor: whitespace-contains match      {floor:6.2f}s")

    def match(analyzer, q):
        body = {"query": {"match": {"text": q}}, "size": 0,
                "aggs": {"n": {"value_count": {"field": "id"}}}}
        return es_search(df, body, id_field="id", analyzer=analyzer).count()

    std = t(lambda: match(None, "merge stream"))
    print(f"standard match                        {std:6.2f}s")
    fr = t(lambda: match("french", "chevaux"))
    print(f"french match (stem+elide)             {fr:6.2f}s  x{fr/std:.1f}")
    fold = t(lambda: match("folded_fr_probe", "cafe château"))
    print(f"folded-french match                   {fold:6.2f}s  x{fold/std:.1f}")

    phr_body = {"query": {"match_phrase": {"text": "café châteaux"}},
                "size": 0, "aggs": {"n": {"value_count": {"field": "id"}}}}
    phr = t(lambda: es_search(df, phr_body, id_field="id",
                              analyzer="folded_fr_probe").count())
    print(f"folded-french phrase                  {phr:6.2f}s  x{phr/std:.1f}")

    rng = t(lambda: df.where(
        (F.col("lat") > -40) & (F.col("lat") < 60)).count())
    shape = {"type": "multipolygon", "coordinates": [
        [[[-60, -40], [-20, 50], [60, 60], [40, -30], [-60, -40]],
         [[0, 0], [20, 0], [20, 20], [0, 20], [0, 0]]],
        [[[100, -70], [140, -70], [140, -40], [100, -40], [100, -70]]],
    ]}
    gs = t(lambda: es_search(df, {
        "query": {"geo_shape": {"loc": {"shape": shape}}}, "size": 0,
        "aggs": {"n": {"value_count": {"field": "id"}}}},
        id_field="id").count())
    print(f"range floor {rng:.2f}s | geo_shape mp+hole {gs:6.2f}s  x{gs/rng:.1f}")

    terms_agg = t(lambda: es_search(df, {
        "size": 0, "aggs": {"a": {"terms": {"field": "g", "size": 64}}}},
        id_field="id").count())
    ipp = t(lambda: es_search(df, {
        "size": 0, "aggs": {"a": {"ip_prefix": {
            "field": "ip", "prefix_length": 12}}}}, id_field="id").count())
    print(f"terms floor {terms_agg:.2f}s | ip_prefix /12    {ipp:6.2f}s  "
          f"x{ipp/terms_agg:.1f}")

    dh = t(lambda: es_search(df, {
        "size": 0, "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"s": {"sum": {"field": "v"}}}}}},
        id_field="id").count())
    rn = t(lambda: es_search(df, {
        "size": 0, "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"s": {"sum": {"field": "v"}},
                     "r": {"rate": {"field": "v", "unit": "day"}},
                     "p": {"normalize": {"buckets_path": "s",
                                         "method": "percent_of_sum"}}}}}},
        id_field="id").count())
    print(f"date_hist+sum floor {dh:.2f}s | +rate+normalize {rn:6.2f}s  "
          f"x{rn/dh:.1f}")

    gsum = t(lambda: df.groupBy("g").agg(F.sum("v")).count())
    gline = t(lambda: es_search(df, {
        "size": 0, "aggs": {"tr": {
            "terms": {"field": "g", "size": 64},
            "aggs": {"line": {"geo_line": {
                "point": {"field": "loc"}, "sort": {"field": "id"},
                "size": 100}}}}}}, id_field="id").count())
    print(f"groupBy-sum floor {gsum:.2f}s | geo_line 64x15k pts {gline:6.2f}s"
          f"  x{gline/gsum:.1f}  (collect state = bucket size pre-slice)")

    # image path throughput
    from hive2es_offline_spark.operators.dedup import image_dedup

    def synth(batches):
        import numpy as np
        import pandas as pd

        from hive2es_offline_spark.operators.multimodal import encode_png

        for pdf in batches:
            payloads = []
            for did in pdf["id"]:
                g = int(did) % 500
                ramp = (np.linspace(5 + g % 40, 250 - g % 30, 24)
                        .astype(np.uint8))
                px = np.tile(ramp, (24, 1))
                payloads.append(encode_png(
                    np.stack([px, np.roll(px, g % 7, axis=1), px], axis=2)))
            yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"),
                                "payload": payloads})

    imgs = (spark.range(20_000)
            .mapInPandas(synth, "doc_id long, payload binary"))
    t0 = time.perf_counter()
    out = image_dedup(imgs)
    n_comp = out.select("component").distinct().count()
    dt = time.perf_counter() - t0
    print(f"image_dedup 20k PNGs: {dt:6.2f}s  ({20_000/dt:,.0f} imgs/s, "
          f"{n_comp} components)")

    spark.stop()


if __name__ == "__main__" and "--knn" not in sys.argv:
    main()


def probe_knn_surfaces():
    """Addendum: knn query clause + retriever fusion at 1M embeddings."""
    import time as _t

    from pyspark.sql import functions as F

    from hive2es_offline_spark.plans.query_dsl import es_search
    from hive2es_offline_spark.plans.scoring import es_retriever_search
    from hive2es_offline_spark.session import get_spark

    spark = get_spark("probe-r12-knn")
    n = 1_000_000
    df = (spark.range(n)
          .withColumn("text", F.concat_ws(
              " ", F.lit("doc"),
              F.when(F.col("id") % 9 == 0, F.lit("merge stream"))
               .otherwise(F.lit("other words here"))))
          .withColumn("emb", F.array(*[
              ((F.col("id") * (i + 3)) % 97).cast("double")
              for i in range(8)]))
          .localCheckpoint())
    df.count()

    def t(fn):
        fn()
        t0 = _t.perf_counter()
        fn()
        return _t.perf_counter() - t0

    floor = t(lambda: df.where(F.col("id") % 9 == 0).count())
    knnq = t(lambda: es_search(df, {
        "query": {"bool": {
            "must": [{"knn": {"field": "emb",
                              "query_vector": [5.0] * 8, "k": 50}}],
            "filter": [{"range": {"id": {"gte": 0}}}]}},
        "size": 50, "_source": ["id"]}, id_field="id").count())
    rrf = t(lambda: es_retriever_search(df, {
        "retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "merge"}}}},
            {"knn": {"field": "emb", "query_vector": [5.0] * 8,
                     "k": 50}}],
            "rank_window_size": 50}},
        "size": 20, "_source": ["id"]}, id_field="id").count())
    print(f"filter floor {floor:.2f}s | knn clause (expand+search) "
          f"{knnq:6.2f}s x{knnq/floor:.1f} | retriever rrf "
          f"{rrf:6.2f}s x{rrf/floor:.1f}")
    spark.stop()


if __name__ == "__main__" and "--knn" in sys.argv:
    probe_knn_surfaces()
