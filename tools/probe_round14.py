#!/usr/bin/env python3
"""Round-14 scale probes (1M-row, local[32]) — bound every new surface
against its plain-query floor, the per-round discipline SCALE.md records.

Probes:
  1. sparse_vector (tf encoder + 8-token plan-literal expansion) at 1M
     docs vs the BM25 scored-match floor (VERDICT r13 #4's done bar)
  2. russian / cjk match at 1M docs vs a plain standard match (the new
     chains through the same fold/prefix-guard + bigram machinery)
  3. ES|QL BUCKET hourly STATS vs the hand-written date_trunc groupBy
     (must be ~1.0x — the compiler adds no plan nodes)
  4. ES|QL INLINESTATS BY vs the groupBy+broadcast-join rewrite of the
     same computation (one window shuffle vs agg+join)
  5. ES|QL ENRICH vs a plain broadcast left join (~1.0x)
  6. categorize_text / variable_width_histogram with the r14 guard
     (the broadcast scalar-count pass) vs their r13 floors
  7. video_dedup per-video pricing at 500 real MJPEG-AVI videos
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
    spark = get_spark("probe-r14")
    from hive2es_offline_spark.plans.esql import esql
    from hive2es_offline_spark.plans.query_dsl import es_search
    from hive2es_offline_spark.plans.scoring import (
        es_scored_search,
        sparse_tf_vector,
    )

    n = 1_000_000
    words = ("merge stream run data quality reads scan write batch "
             "index shard node").split()
    ru_words = ("книгами книгах красного красный истории цвета дома "
                "ничего ещё мир поле слово").split()
    cj_words = ("東京都 京都は 大阪 日本語 ひらがな カタカナ 한국어 "
                "中 tokyo 漢字テスト 書店 電車で").split()

    def text_col(vocab):
        return F.concat_ws(" ", *[
            F.element_at(F.lit(vocab),
                         ((F.col("id") * (3 + i)) % len(vocab) + 1)
                         .cast("int"))
            for i in range(12)])

    df = (spark.range(n)
          .withColumn("text", text_col(words))
          .withColumn("rtext", text_col(ru_words))
          .withColumn("ctext", text_col(cj_words))
          .withColumn("ts", F.timestamp_seconds(
              F.lit(1700000000) + F.col("id") % 604800))
          .withColumn("v", (F.col("id") % 1000).cast("double"))
          .withColumn("g", (F.col("id") % 64).cast("string"))
          .withColumn("k", (F.col("id") % 1000).cast("long"))
          .withColumn("msg", F.concat(
              F.lit("connection from host-"), F.col("id").cast("string"),
              F.lit(" failed after "), (F.col("id") % 7).cast("string"),
              F.lit(" retries")))
          .localCheckpoint())
    df.count()

    # 1. sparse_vector vs BM25 scored-match floor
    bm25 = t(lambda: es_scored_search(df, {
        "query": {"match": {"text": "merge stream"}}, "size": 10},
        id_field="id").count())
    qv = {w: 0.4 + 0.1 * i for i, w in enumerate(words[:8])}
    spv_df = df.withColumn("tok_w", sparse_tf_vector("text"))
    spv = t(lambda: es_scored_search(spv_df, {
        "query": {"sparse_vector": {"field": "tok_w",
                                    "query_vector": qv}},
        "size": 10}, id_field="id").count())
    print(f"BM25 scored-match floor               {bm25:6.2f}s")
    print(f"sparse_vector (tf enc + 8-tok qv)     {spv:6.2f}s  "
          f"x{spv/bm25:.1f}")
    # the encoder is the dominant cost when the map is built inline —
    # price the pre-materialized-map case too (the ELSER-shaped corpus)
    mat = spv_df.select("id", "tok_w").localCheckpoint()
    mat.count()
    spv_pre = t(lambda: es_scored_search(mat, {
        "query": {"sparse_vector": {"field": "tok_w",
                                    "query_vector": qv}},
        "size": 10}, id_field="id").count())
    print(f"sparse_vector over stored map         {spv_pre:6.2f}s  "
          f"x{spv_pre/bm25:.1f}")

    # 2. russian / cjk chains vs plain match
    def match(col, analyzer, q):
        body = {"query": {"match": {col: q}}, "size": 0,
                "aggs": {"n": {"value_count": {"field": "id"}}}}
        return es_search(df, body, id_field="id",
                         analyzer=analyzer).count()

    std = t(lambda: match("text", None, "merge stream"))
    ru = t(lambda: match("rtext", "russian", "красный книга"))
    cj = t(lambda: match("ctext", "cjk", "東京都"))
    print(f"standard match floor                  {std:6.2f}s")
    print(f"russian match (fold+stop+stem)        {ru:6.2f}s  "
          f"x{ru/std:.1f}")
    print(f"cjk match (script runs -> bigrams)    {cj:6.2f}s  "
          f"x{cj/std:.1f}")

    # 3. ES|QL BUCKET vs hand-written date_trunc groupBy
    cat = {"t": df}
    hand = t(lambda: df.groupBy(F.date_trunc("hour", "ts").alias("h"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("v").cast("decimal(28,6)")).cast("double")
                  .alias("total")).count())
    bq = t(lambda: esql(cat, '''
        FROM t | STATS n = COUNT(*), total = SUM(v)
        BY h = BUCKET(ts, 1 hour)''').count())
    print(f"date_trunc groupBy floor {hand:.2f}s | ES|QL BUCKET "
          f"{bq:6.2f}s  x{bq/hand:.1f}")

    # 4. INLINESTATS BY vs groupBy + broadcast-join rewrite
    gb = t(lambda: df.join(
        df.groupBy("g").agg(
            F.sum(F.col("v").cast("decimal(28,6)")).cast("double")
            .alias("gt")), "g").where(F.col("v") > F.col("gt") / 2000)
        .count())
    inl = t(lambda: esql(cat, '''
        FROM t | INLINESTATS gt = SUM(v) BY g
        | WHERE v > gt / 2000''').count())
    print(f"groupBy+join rewrite {gb:.2f}s | INLINESTATS window "
          f"{inl:6.2f}s  x{inl/gb:.1f}")

    # 5. ENRICH vs plain broadcast left join
    lk = spark.range(64).select(
        F.col("id").cast("string").alias("g"),
        (F.col("id") * 10).alias("grank"))
    cat2 = {"t": df, "pol": lk}
    bj = t(lambda: df.join(F.broadcast(lk), "g", "left").count())
    en = t(lambda: esql(cat2, '''
        FROM t | ENRICH pol ON g WITH grank''').count())
    print(f"broadcast join floor {bj:.2f}s | ES|QL ENRICH "
          f"{en:6.2f}s  x{en/bj:.1f}")

    # 6. r14 guards: categorize_text / variable_width with the scalar
    # count pass (r13 floors: 0.73 s / 0.44 s on this same shape)
    cat_g = t(lambda: es_search(df, {
        "size": 0, "aggs": {"c": {"categorize_text": {
            "field": "msg", "size": 10}}}}, id_field="id").count())
    vw_g = t(lambda: es_search(df, {
        "size": 0, "aggs": {"b": {"variable_width_histogram": {
            "field": "v", "buckets": 12}}}}, id_field="id").count())
    print(f"categorize_text w/ max_buckets guard  {cat_g:6.2f}s")
    print(f"variable_width w/ distinct guard      {vw_g:6.2f}s")

    # 7. video_dedup per-video pricing at 500 real videos
    from hive2es_offline_spark.operators import video
    from hive2es_offline_spark.operators.dedup import video_dedup

    vids = video.with_avi_payload(
        spark.range(500).withColumnRenamed("id", "doc_id"),
        n_frames=4, style="textured").localCheckpoint()
    vids.count()
    vd = t(lambda: video_dedup(vids, num_frames=4,
                               min_matching_frames=3).count(), runs=1)
    print(f"video_dedup 500 videos x 4 frames     {vd:6.2f}s  "
          f"({vd/500*1000:.1f} ms/video)")


if __name__ == "__main__":
    main()
