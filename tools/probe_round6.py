#!/usr/bin/env python3
"""Round-6 scaling probes (results recorded in SCALE.md).

Validates the round-6 partitioner fix beyond harness SFs:
  1. ESHashPartitioner parity: `repartition_for_shards` must put each ES
     shard's rows in `multiple` Spark tasks (r5 shape: one task per
     shard — a straggler scale-killer on hot shards), with every task
     shard-pure, and beat the r5 shape end-to-end through the bulk
     batching sink.
  2. Probe-key search cost at production partition counts (1000 shards x
     multiple 10): driver-side murmur3 probing must stay sub-second.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive2es_offline_spark.functions.es_hash import es_shard
from hive2es_offline_spark.operators import routing
from hive2es_offline_spark.session import get_spark
from hive2es_offline_spark.sinks import es_bulk

spark = get_spark("round6-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

N = 2_000_000
SHARDS, MULTIPLE = 3, 10

docs = (
    spark.range(N)
    .select(F.concat(F.lit("user-"), F.col("id")).alias("_routing"))
    .withColumn("_id", F.col("_routing"))
    .withColumn("doc", F.to_json(F.struct(F.col("_routing").alias("k"))))
)


def run(df, label):
    t0 = time.perf_counter()
    stats = es_bulk.bulk_write_stats(df, "idx").collect()
    dt = time.perf_counter() - t0
    nonempty = [s for s in stats if s["doc_count"] > 0]
    print(
        f"{label}: wall={dt:.2f}s nonempty_tasks={len(nonempty)} "
        f"max_task_docs={max(s['doc_count'] for s in nonempty)}"
    )


# r5 shape: hash-repartition on the shard id — every shard in ONE task
old = docs.withColumn("_shard", es_shard("_routing", SHARDS)).repartition(
    SHARDS * MULTIPLE, F.col("_shard")
)
# r6 shape: partition index == pmod(es_hash(routing), shards*multiple)
new = routing.repartition_for_shards(docs, "_routing", SHARDS, multiple=MULTIPLE)

for label, df in (("old(shard-col)", old), ("new(slot)", new)):
    run(df, label + " cold")
    run(df, label + " warm")

# shard purity + oversubscription assertions (same as tests/test_routing.py,
# at 2M rows)
sample = (
    new.withColumn("pid", F.spark_partition_id())
    .groupBy("pid")
    .agg(F.countDistinct("_shard").alias("n_shards"))
    .collect()
)
assert all(r["n_shards"] == 1 for r in sample), "partition mixes shards"
per_shard = (
    new.withColumn("pid", F.spark_partition_id())
    .groupBy("_shard")
    .agg(F.countDistinct("pid").alias("n_tasks"))
    .collect()
)
print("tasks per shard:", sorted((r["_shard"], r["n_tasks"]) for r in per_shard))
assert all(r["n_tasks"] > 1 for r in per_shard), "shard not oversubscribed"

# probe-key search cost at production scale (1000 shards x 10)
t0 = time.perf_counter()
keys = routing._probe_keys(10_000)
print(f"probe_keys(10000): {time.perf_counter() - t0:.2f}s, {len(set(keys))} distinct")

spark.stop()


# ---------------------------------------------------------------------------
# PQ probe: 200k x 64 synthetic (adversarial oscillatory manifold), m=16
# ---------------------------------------------------------------------------
import numpy as np

from hive2es_offline_spark.operators import pq
from hive2es_offline_spark.operators.similarity import cosine_topk

spark = get_spark("round6-probe-pq", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
N, D = 200_000, 64
vecs = (
    spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(D)),
            lambda i: F.sin(F.col("id") * i * 0.7 + i * i * 0.13),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
)
t0 = time.perf_counter()
books = pq.pq_train(vecs, num_subspaces=16, bits=8, sample_size=10_000)
t1 = time.perf_counter()
codes = pq.pq_encode(vecs, books).localCheckpoint(eager=True)
codes.count()
t2 = time.perf_counter()
qv = [
    float(x)
    for x in np.sin(np.arange(1, D + 1) * 7 * 0.7 + np.arange(1, D + 1) ** 2 * 0.13)
]
pq.pq_search(codes, books, qv, k=10).collect()  # warm-up
t3 = time.perf_counter()
adc = pq.pq_search(codes, books, qv, k=10).collect()
t4 = time.perf_counter()
brute = cosine_topk(vecs, qv, k=10).collect()
t5 = time.perf_counter()
recall = len({r["vec_id"] for r in adc} & {r["vec_id"] for r in brute}) / 10
print(
    f"pq(m=16,b=8): train={t1-t0:.2f}s encode={t2-t1:.2f}s "
    f"adc_warm={t4-t3:.2f}s brute={t5-t4:.2f}s recall@10={recall:.2f}"
)
spark.stop()
