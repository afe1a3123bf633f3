#!/usr/bin/env python3
"""Round-7 scaling probes (results recorded in SCALE.md).

1. Exact-substring dedup (`repeated_ngram_scrub`) on a 200k-doc corpus
   with a planted 12-token passage in 10% of docs plus a boilerplate
   passage in 2%: window volume is O(total tokens) and the df join must
   stay bounded — no suffix array, no driver state.
2. HTTP bulk transport throughput: 500k docs through `bulk_write_http`
   against the in-process stub `/_bulk` (32 concurrent partitions, real
   sockets) vs the no-op-transport `bulk_write_stats` baseline — the
   price of actually doing the HTTP round-trips.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive2es_offline_spark.operators import dedup
from hive2es_offline_spark.session import get_spark
from hive2es_offline_spark.sinks import es_bulk
from hive2es_offline_spark.sinks.stub_es import StubES

spark = get_spark("round7-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

# --- probe 1: substring dedup at 200k docs -------------------------------
N = 200_000
PASSAGE = "shared planted passage tokens one two three four five six seven eight"
BOILER = "subscribe to our newsletter for more great content every single day"
docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("doc"), F.col("id")),
            F.when(F.col("id") % 10 == 0, F.lit(PASSAGE)).otherwise(
                F.concat(F.lit("unique filler text number "), F.col("id"))
            ),
            F.when(F.col("id") % 50 == 0, F.lit(BOILER)).otherwise(
                F.concat(F.lit("tail words "), F.col("id") * 7)
            ),
            F.lit("closing words common enough"),
        ).alias("text"),
    )
)
t0 = time.perf_counter()
out = dedup.repeated_ngram_scrub(docs, "doc_id", "text", k=8, min_df=2)
affected, removed = out.agg(
    F.sum((F.col("repeated_windows") > 0).cast("long")),
    F.sum("tokens_removed"),
).collect()[0]
dt = time.perf_counter() - t0
print(f"substring_dedup 200k docs: wall={dt:.2f}s affected={affected} tokens_removed={removed}")

# --- probe 2: HTTP bulk throughput ---------------------------------------
M = 500_000
payload_docs = (
    spark.range(M)
    .select(
        F.col("id").cast("string").alias("_id"),
        F.col("id").cast("string").alias("_routing"),
        F.to_json(F.struct(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))).alias("doc"),
    )
    .repartition(32)
)
t0 = time.perf_counter()
base = es_bulk.bulk_write_stats(payload_docs, "idx").agg(F.sum("doc_count")).collect()
dt_noop = time.perf_counter() - t0
with StubES() as server:
    t0 = time.perf_counter()
    stats = es_bulk.bulk_write_http(payload_docs, "idx", server.url).agg(
        F.sum("doc_count"), F.sum("batch_count"), F.sum("failed_actions")
    ).collect()[0]
    dt_http = time.perf_counter() - t0
    landed = len(server.docs)
print(
    f"bulk noop: {M} docs wall={dt_noop:.2f}s ({M/dt_noop/1000:.0f}k docs/s); "
    f"bulk http: wall={dt_http:.2f}s ({M/dt_http/1000:.0f}k docs/s) "
    f"batches={stats[1]} failed={stats[2]} landed={landed}"
)
spark.stop()
