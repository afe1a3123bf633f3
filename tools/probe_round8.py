#!/usr/bin/env python3
"""Round-8 scaling probes (results recorded in SCALE.md).

1. BM25 scored search (`plans/scoring.py::es_scored_search`) on a 1M-doc
   corpus: the score pipeline's only data-scale costs are the tokenize +
   term-filtered explode and ONE id-keyed map join — wall time should
   track the bm25_topk operator (same machinery) plus the score tree.
2. The bool-pushdown fix, A/B: a selective range conjunction on a
   5M-row parquet sorted by the filter column (tight row-group stats).
   The r8 compile shape (raw conjuncts → PushedFilters) vs the pre-r8
   shape (coalesce-wrapped → DataFilters only) measures what the
   coalesce wrapper was costing at scan time.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive2es_offline_spark.operators.retrieval import bm25_topk
from hive2es_offline_spark.plans.scoring import es_scored_search
from hive2es_offline_spark.session import get_spark

spark = get_spark("round8-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

# --- probe 1: scored search at 1M docs -----------------------------------
N = 1_000_000
docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("document body filler words common text"),
            F.when(F.col("id") % 11 == 0, F.lit("merge")).otherwise(F.lit("alpha")),
            F.when(F.col("id") % 7 == 0, F.lit("stream pipeline")).otherwise(
                F.concat(F.lit("word"), F.col("id") % 1000)
            ),
            F.when(F.col("id") % 3 == 0, F.lit("vector")).otherwise(F.lit("beta")),
        ).alias("text"),
        (F.col("id") % 20).cast("string").alias("source"),
        (F.col("id") % 997).alias("n_chars"),
    )
    .persist()
)
docs.count()  # materialize outside the clock

body = {
    "query": {"bool": {
        "must": [{"match": {"text": "merge stream vector"}}],
        "should": [
            {"term": {"source": "3"}},
            {"constant_score": {"filter": {"range": {"n_chars": {"gte": 500}}},
                                "boost": 0.5}},
        ],
    }},
    "size": 10,
    "_source": ["doc_id"],
}
for label, fn in [
    ("es_scored_search", lambda: es_scored_search(docs, body, id_field="doc_id")),
    ("bm25_topk       ", lambda: bm25_topk(docs, "merge stream vector",
                                           id_col="doc_id", text_col="text")),
]:
    fn().write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    print(f"{label} 1M docs: wall={time.perf_counter() - t0:.2f}s")
top = es_scored_search(docs, body, id_field="doc_id").collect()
print("top-3:", [(r["doc_id"], r["_score"]) for r in top[:3]])
docs.unpersist()

# --- probe 2: pushdown A/B on a sorted 5M-row parquet --------------------
d = tempfile.mkdtemp(prefix="probe8_")
path = os.path.join(d, "sorted.parquet")
(
    spark.range(5_000_000)
    .select(F.col("id"), (F.col("id")).alias("n"),
            (F.col("id") % 5).cast("string").alias("lang"))
    .orderBy("n")
    .coalesce(8)
    .write.mode("overwrite").parquet(path)
)
t = spark.read.parquet(path)
sel = 4_990_000  # selects the last ~0.2% — row-group stats prune the rest

pushed_pred = (F.col("n") >= sel) & (F.col("lang") == "3")          # r8 shape
wrapped_pred = (
    F.coalesce(F.col("n") >= sel, F.lit(False))
    & F.coalesce(F.col("lang") == "3", F.lit(False))                # pre-r8 shape
)
for label, pred in [("pushed (r8) ", pushed_pred), ("coalesced   ", wrapped_pred)]:
    q = t.where(pred)
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    q.count()  # warm-up (page cache equalized for both)
    t0 = time.perf_counter()
    n = q.count()
    print(f"{label} wall={time.perf_counter() - t0:.3f}s rows={n} "
          f"PushedFilters=[{(m.group(1) if m else '')[:60]}]")
