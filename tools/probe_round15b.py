#!/usr/bin/env python3
"""Round-15 third-batch scale probes (1M-row, local[32]) — bound each
new surface against its plain-query floor, the per-round discipline
SCALE.md records.

Probes:
  1. MEDIAN_ABSOLUTE_DEVIATION aggregate at 1M rows / 10 groups vs the
     plain exact MEDIAN (both carry an O(group) buffer — the MAD adds
     one sorted-deviations pass on the reduced group arrays; the
     quadratic per-element-median bug this batch fixed read 100.8 s at
     sf0.1 before the array_repeat binding)
  2. FIRST/LAST struct-min aggregates at 1M rows vs plain MIN/MAX
     (same agg exchange; the struct wrap must be near-free)
  3. TO_VERSION ordering key at 1M synthesized versions vs a plain
     string sort (the key is ~6 string ops/row, then the same
     TakeOrderedAndProject)
  4. semantic query at 1M docs vs the identical hand-written
     sparse_vector (the rewrite must add nothing — same plan)
  5. bucket_count_ks_test at 1M rows vs the bare terms agg (the KS
     CDFs run on the 8-row bucket frame — the delta must be
     bucket-sized, not corpus-sized)
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("probe-r15b")
    from hive2es_offline_spark.plans.esql import esql
    from hive2es_offline_spark.plans.query_dsl import es_search
    from hive2es_offline_spark.plans.scoring import es_scored_search

    n = 1_000_000
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") % 997).cast("double").alias("x"),
        F.concat(
            (F.col("id") % 30).cast("string"), F.lit("."),
            (F.col("id") % 12).cast("string"), F.lit("."),
            (F.col("id") % 7).cast("string"),
        ).alias("ver"),
    ).localCheckpoint()

    # 1. MAD vs MEDIAN
    mad = t(lambda: noop(esql(
        {"t": base},
        "FROM t | STATS m = MEDIAN_ABSOLUTE_DEVIATION(x) BY g")))
    med = t(lambda: noop(esql(
        {"t": base}, "FROM t | STATS m = MEDIAN(x) BY g")))
    print(f"1. MAD 1M/10g: {mad:.2f} s vs exact MEDIAN {med:.2f} s "
          f"(x{mad / med:.2f})")

    # 2. FIRST/LAST vs MIN/MAX
    fl = t(lambda: noop(esql(
        {"t": base},
        "FROM t | STATS f = FIRST(x, id), l = LAST(x, id) BY g")))
    mm = t(lambda: noop(esql(
        {"t": base}, "FROM t | STATS f = MIN(x), l = MAX(x) BY g")))
    print(f"2. FIRST/LAST 1M: {fl:.2f} s vs MIN/MAX {mm:.2f} s "
          f"(x{fl / mm:.2f})")

    # 3. TO_VERSION key sort vs plain string sort
    tv = t(lambda: noop(esql(
        {"t": base},
        "FROM t | EVAL k = TO_VERSION(ver) | SORT k ASC | KEEP ver "
        "| LIMIT 50")))
    pv = t(lambda: noop(esql(
        {"t": base}, "FROM t | SORT ver ASC | KEEP ver | LIMIT 50")))
    print(f"3. TO_VERSION top-50 1M: {tv:.2f} s vs plain sort "
          f"{pv:.2f} s (x{tv / pv:.2f})")

    # 4. semantic vs hand-written sparse_vector (same docs frame)
    docs = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("doc "), (F.col("id") % 100).cast("string"),
                 F.when(F.col("id") % 3 == 0, F.lit(" merge stream"))
                 .otherwise(F.lit(" other text"))).alias("text"),
    ).localCheckpoint()
    from hive2es_offline_spark.plans.scoring import sparse_tf_vector
    enc = docs.withColumn("tok_w", sparse_tf_vector("text"))
    sem = t(lambda: noop(es_scored_search(enc, {
        "query": {"semantic": {"field": "tok_w",
                               "query": "Merge STREAM"}},
        "size": 25, "_source": ["id"]}, id_field="id")))
    spv = t(lambda: noop(es_scored_search(enc, {
        "query": {"sparse_vector": {
            "field": "tok_w",
            "query_vector": {"merge": 1.0, "stream": 1.0}}},
        "size": 25, "_source": ["id"]}, id_field="id")))
    print(f"4. semantic 1M: {sem:.2f} s vs sparse_vector {spv:.2f} s "
          f"(x{sem / spv:.2f})")

    # 5. KS test vs bare terms agg
    ks = t(lambda: noop(es_search(base.withColumn(
        "k8", (F.col("id") % 8).cast("int")), {
        "size": 0, "aggs": {
            "m": {"terms": {"field": "k8", "size": 8}},
            "ks": {"bucket_count_ks_test": {
                "buckets_path": "m>_count"}}}}, id_field="id")))
    tr = t(lambda: noop(es_search(base.withColumn(
        "k8", (F.col("id") % 8).cast("int")), {
        "size": 0, "aggs": {
            "m": {"terms": {"field": "k8", "size": 8}}}},
        id_field="id")))
    print(f"5. bucket_count_ks_test 1M: {ks:.2f} s vs bare terms "
          f"{tr:.2f} s (x{ks / tr:.2f})")


if __name__ == "__main__":
    main()
