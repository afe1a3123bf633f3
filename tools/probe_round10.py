#!/usr/bin/env python3
"""Round-10 scaling probes (results recorded in SCALE.md).

1. multi_match cross_fields at 1M docs, two fields: the blended-df
   machinery claims ONE tokenize+explode pass per field plus
   broadcast-size df unions — so the scored search should cost about
   the same as a best_fields search over the same fields (which builds
   one plain tsmap per field).  Measured side by side.
2. has_child at 1M docs (90% children): the claimed shape is one
   child-side filtered aggregate (shuffle carries only matching
   children) joined back on the id — filter context and the scored
   score_mode=sum path, both timed end-to-end.
3. geotile_grid over 1M points: one codegen key groupBy +
   TakeOrderedAndProject; the partial aggregate means the shuffle
   carries at most (cells x partitions) rows.
4. es_scroll page 1 vs page 40: keyset paging claims page N == page 1
   cost (the strict-after predicate prunes, no offset scan).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive2es_offline_spark.plans.join_field import es_parent_child
from hive2es_offline_spark.plans.query_dsl import es_scroll, es_search
from hive2es_offline_spark.plans.scoring import es_scored_search
from hive2es_offline_spark.session import get_spark

spark = get_spark("round10-probe",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

N = 1_000_000
docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the quick engine scans tables"),
            F.concat(F.lit("word"), (F.col("id") % 10000)),
            F.when(F.col("id") % 11 == 0, F.lit("streaming merge"))
            .otherwise(F.concat(F.lit("tok"), F.col("id") % 997)),
        ).alias("title"),
        F.concat_ws(
            " ",
            F.lit("vector index build"),
            F.concat(F.lit("term"), (F.col("id") % 7000)),
            F.when(F.col("id") % 13 == 0, F.lit("merge queue"))
            .otherwise(F.concat(F.lit("val"), F.col("id") % 991)),
        ).alias("body"),
        (F.col("id") % 160 - 80 + 0.5).cast("double").alias("lat"),
        (F.col("id") * 7 % 360 - 180 + 0.5).cast("double").alias("lon"),
        F.when(F.col("id") % 10 == 0, F.lit("question"))
        .otherwise(F.lit("answer")).alias("relation"),
        F.when(F.col("id") % 10 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") - F.col("id") % 10).alias("parent_id"),
    )
    .persist()
)
docs.count()  # materialize outside the clock

results = {"n_docs": N}

# --- probe 1: cross_fields vs best_fields ---------------------------------
for mm_type, key in (("best_fields", "best_fields_sec"),
                     ("cross_fields", "cross_fields_sec")):
    body = {"query": {"multi_match": {
        "query": "streaming merge queue", "fields": ["title", "body"],
        "type": mm_type}},
        "size": 10, "_source": ["doc_id"]}
    t0 = time.time()
    n = es_scored_search(docs, body, id_field="doc_id").count()
    results[key] = round(time.time() - t0, 3)
    results[key.replace("_sec", "_rows")] = n

# --- probe 2: has_child filter + scored -----------------------------------
body = {"query": {"has_child": {
    "type": "answer", "query": {"match": {"title": "merge"}},
    "min_children": 2}},
    "size": 10, "_source": ["doc_id"]}
t0 = time.time()
n = es_parent_child(docs, body, id_field="doc_id").count()
results["has_child_filter_sec"] = round(time.time() - t0, 3)
results["has_child_filter_rows"] = n

body["query"]["has_child"]["score_mode"] = "sum"
t0 = time.time()
n = es_parent_child(docs, body, id_field="doc_id").count()
results["has_child_scored_sec"] = round(time.time() - t0, 3)
results["has_child_scored_rows"] = n

# --- probe 3: geotile_grid over 1M points ---------------------------------
pts = docs.select("doc_id", F.struct("lat", "lon").alias("loc"))
t0 = time.time()
cells = es_search(pts, {"size": 0, "aggs": {"g": {"geotile_grid": {
    "field": "loc", "precision": 7, "size": 100}}}},
    id_field="doc_id").count()
results["geotile_sec"] = round(time.time() - t0, 3)
results["geotile_cells"] = cells

# --- probe 4: scroll page 1 vs page 40 ------------------------------------
body = {"sort": [{"doc_id": "asc"}], "size": 500,
        "_source": ["doc_id"], "scroll": "1m"}
t0 = time.time()
page, sid = es_scroll(docs, body, id_field="doc_id")
page.count()
results["scroll_page1_sec"] = round(time.time() - t0, 3)
for _ in range(39):
    page, sid = es_scroll(docs, body, id_field="doc_id", scroll_id=sid)
t0 = time.time()
page, sid = es_scroll(docs, body, id_field="doc_id", scroll_id=sid)
page.count()
results["scroll_page41_sec"] = round(time.time() - t0, 3)

print(json.dumps(results))
