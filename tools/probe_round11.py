#!/usr/bin/env python3
"""Round-11 scaling probes (results recorded in SCALE.md).

1. english analysis chain at 1M docs: a match under the stemmed chain
   adds possessive strip + stop filter + SIX per-step stemmer
   transforms over every token array.  Measured against a plain
   standard-chain match over the same corpus, plus the phrase path
   (positions engine) under both chains — quantifies the documented
   "~4x a plain match" claim and proves the per-step transform layout
   doesn't blow up at volume.
2. percolate at 1M docs x {4, 32} stored queries: the one-scan claim —
   cost should grow far sublinearly in the number of stored queries
   (each query is a boolean column in one projection, not a pass).
3. url_dedup at 1M urls: canonicalization is a per-row regex pipeline +
   ONE hash shuffle; compared against dedup_exact on the same column as
   the shuffle-cost floor.
4. exact BPE (with_exact_bpe) at 100k docs vs the codegen regex count
   at 1M docs: the documented cost split, measured.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hive2es_offline_spark.operators.bpe import learn_bpe, with_exact_bpe
from hive2es_offline_spark.operators.web import url_dedup
from hive2es_offline_spark.plans.percolate import es_percolate
from hive2es_offline_spark.plans.query_dsl import es_search

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:7.2f} s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # 200x the 5k corpus -> 1M docs, deterministic variants
    big = (
        docs.crossJoin(spark.range(200).withColumnRenamed("id", "v"))
        .select(
            (F.col("doc_id") * 200 + F.col("v")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" variant "),
                     F.col("v").cast("string")).alias("text"),
            "source", "n_chars",
        )
    ).persist()
    n = big.count()
    print(f"corpus: {n} docs")

    # --- 1. english chain vs standard on the match path ------------------
    def match(analyzer):
        body = {"query": {"match": {"text": "merging streams"}},
                "size": 0, "aggs": {"n": {"value_count": {
                    "field": "doc_id"}}}}
        noop(es_search(big, body, id_field="doc_id", analyzer=analyzer))

    t_std = timed("match standard (tokenize only), 1M docs",
                  lambda: match("standard"))
    t_en = timed("match english (possessive+stop+6-step stem)",
                 lambda: match("english"))
    print(f"  -> english chain overhead: x{t_en / t_std:.2f}")

    def phrase(analyzer):
        body = {"query": {"match_phrase": {"text": "merging streams"}},
                "size": 0, "aggs": {"n": {"value_count": {
                    "field": "doc_id"}}}}
        noop(es_search(big, body, id_field="doc_id", analyzer=analyzer))

    t_pstd = timed("phrase standard (regex fast path)",
                   lambda: phrase("standard"))
    t_pen = timed("phrase english (positions engine over chain)",
                  lambda: phrase("english"))
    print(f"  -> chain phrase vs fast path: x{t_pen / t_pstd:.2f}")

    # --- 2. percolate: 4 vs 32 stored queries, one scan ------------------
    def perc(nq):
        queries = {}
        words = ["merge", "stream", "scan", "sort", "row", "fast",
                 "slow", "data"]
        for i in range(nq):
            w = words[i % len(words)]
            queries[f"q{i}"] = {"bool": {"filter": [
                {"match": {"text": w}},
                {"range": {"n_chars": {"gte": 100 + i}}}]}}
        noop(es_percolate(big, queries, id_field="doc_id"))

    t4 = timed("percolate 1M docs x 4 stored queries", lambda: perc(4))
    t32 = timed("percolate 1M docs x 32 stored queries", lambda: perc(32))
    print(f"  -> 8x queries costs x{t32 / t4:.2f} (one-scan claim)")

    # --- 3. url_dedup at 1M urls vs dedup_exact shuffle floor ------------
    k = F.col("doc_id")
    urls = big.select(
        "doc_id",
        F.concat(
            F.when(k % 3 == 0, F.lit("HTTPS://")).otherwise(F.lit("http://")),
            F.lit("Site"), (k % 1000).cast("string"), F.lit(".com"),
            F.lit("/p/"), (k % 50).cast("string"),
            F.when(k % 2 == 0, F.lit("?utm_source=x&id=")).otherwise(
                F.lit("?id=")),
            (k % 7).cast("string"),
        ).alias("url"),
    ).persist()
    urls.count()
    t_url = timed("url_dedup 1M urls (canonicalize + 1 shuffle)",
                  lambda: noop(url_dedup(urls, "url", id_col="doc_id")))
    t_exact = timed(
        "dedup_exact floor (groupBy url, keep max id)",
        lambda: noop(urls.groupBy("url").agg(F.max("doc_id"))))
    print(f"  -> canonicalization overhead vs exact: x{t_url / t_exact:.2f}")

    # --- 4. exact BPE vs codegen regex count ------------------------------
    merges = learn_bpe(["the quick brown fox merge stream sorted runs "
                        "lower lowest newest widest tokens training"], 48)
    sub = big.limit(100_000).persist()
    sub.count()
    t_bpe = timed("with_exact_bpe 100k docs (Arrow mapInPandas)",
                  lambda: noop(with_exact_bpe(sub, merges)))
    from hive2es_offline_spark.operators.text import bpe_token_count

    t_rgx = timed("regex token count 1M docs (codegen)",
                  lambda: noop(big.select(bpe_token_count(F.col("text")))))
    print(f"  -> exact BPE per-doc cost ~{t_bpe / 100_000 * 1e6:.0f} us; "
          f"regex ~{t_rgx / n * 1e6:.1f} us")


if __name__ == "__main__":
    main()
