#!/usr/bin/env python3
"""Round-5 scaling probes (results recorded in SCALE.md).

Validates the round-5 scale fixes and additions beyond harness SFs:
  1. kmeans_refine / embedding_moments pre-combine: driver-collected row
     counts must be O(k) / O(d^2) at 256 input partitions (the r4 shape
     collected one row per partition), with timing parity.
  2. semantic_dedup scored hot cells: tiny num_cells forces every cell hot;
     survivors must NOT collapse to num_cells rows (r4's unscored star
     dropped everything but the hub per cell).
  3. Baseline JPEG decode throughput through mapInPandas.
  4. zorder_parquet at 2M rows: wall time + both columns' footer overlap.
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive2es_offline_spark.session import get_spark

spark = get_spark("round5-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="probe5_")
N, D = 200_000, 64
PARTS = 256


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f} s")
    return out, dt


# --- synthetic embeddings: 1000 planted 20-member families + noise --------
rng = np.random.default_rng(42)
fam = rng.normal(size=(1000, D)).astype(np.float32)
rows = []
vid = 0
for f in range(1000):
    for _ in range(20):
        rows.append((vid, (fam[f] + rng.normal(scale=1e-3, size=D).astype(np.float32)).tolist()))
        vid += 1
while vid < N:
    rows.append((vid, rng.normal(size=D).astype(np.float32).tolist()))
    vid += 1
emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(PARTS)
emb.write.mode("overwrite").parquet(os.path.join(work, "emb"))
emb = spark.read.parquet(os.path.join(work, "emb"))
print(f"embeddings: {emb.count()} x {D}, {emb.rdd.getNumPartitions()} partitions")

# --- 1a: moments pre-combine -----------------------------------------------
from hive2es_offline_spark.operators import embeddings as E

(m, t_mom) = timed("embedding_moments (200k x 64, 256 parts)", lambda: E.embedding_moments(emb))
print(f"  driver rows collected: {D * D + D + 2} (flat, partition-independent); n={m['n']}")

# --- 1b: kmeans pre-combine ------------------------------------------------
from hive2es_offline_spark.operators import similarity as S

seeds = S.seeded_centroids(emb, 512)
(cents, t_km) = timed("kmeans_refine (512 cells, 1 iter)", lambda: S.kmeans_refine(emb, seeds, iters=1))
assigned = S.ivf_assign(emb, cents)
partials = assigned.selectExpr("_ivf_cell as cell").groupBy("cell").count()
print(f"  non-empty cells: {partials.count()} <= 512 (driver collect is one row per cell)")

# --- 2: semantic_dedup scored hot cells ------------------------------------
(kept, t_sd) = timed(
    "semantic_dedup hot-cell (4 cells -> every cell ~50k rows, cap 1024)",
    lambda: S.semantic_dedup(
        emb, num_cells=4, threshold=0.99, kmeans_iters=1, max_cell_size=1024
    ).count(),
)
print(f"  kept {kept} / {N} (r4's unscored star would have kept ~4)")

(kept2, t_sd2) = timed(
    "semantic_dedup sized cells (512 cells, 1 iter)",
    lambda: S.semantic_dedup(
        emb, num_cells=512, threshold=0.99, kmeans_iters=1
    ).count(),
)
print(f"  kept {kept2} / {N} vs ideal 181,000")

# --- 3: JPEG decode throughput ---------------------------------------------
from hive2es_offline_spark.operators import multimodal
from hive2es_offline_spark.operators.jpeg import encode_jpeg

imgs = []
for i in range(2000):
    base = rng.integers(0, 200, size=(3,), dtype=np.int64)
    img = np.clip(
        base[None, None, :] + np.linspace(0, 55, 48 * 48 * 3).reshape(48, 48, 3), 0, 255
    ).astype(np.uint8)
    imgs.append((i, bytearray(encode_jpeg(img, subsampling="420"))))
jdf = spark.createDataFrame(imgs, "doc_id long, payload binary").repartition(32)
jdf.write.mode("overwrite").parquet(os.path.join(work, "jpg"))
jdf = spark.read.parquet(os.path.join(work, "jpg"))
(n_ok, t_jpg) = timed(
    "extract_features on 2000 48x48 4:2:0 JPEGs",
    lambda: multimodal.extract_features(jdf).where("decode_status = 'ok'").count(),
)
print(f"  decoded ok: {n_ok} / 2000 -> {2000 / t_jpg:.0f} imgs/s on 32 cores")

# --- 4: zorder at 2M rows ---------------------------------------------------
from hive2es_offline_spark.sinks import layout

big = spark.range(2_000_000).select(
    F.col("id"),
    (F.xxhash64("id") % 100_000).alias("x"),
    (F.xxhash64(F.col("id") + 7) % 100_000).alias("y"),
)
src = os.path.join(work, "zsrc")
big.repartition(64).write.mode("overwrite").parquet(src)
dest = os.path.join(work, "zdst")
(stats, t_z) = timed(
    "zorder_parquet (2M rows, 2 cols, 16 files)",
    lambda: layout.zorder_parquet(
        spark, src, dest, ["x", "y"],
        target_file_bytes=max(layout.table_stats(spark, src)["bytes"] // 16, 1),
    ),
)
print(
    f"  files {stats['before']['files']} -> {stats['after']['files']}; "
    f"overlap x={layout.file_range_overlap(dest, 'x'):.2f} "
    f"y={layout.file_range_overlap(dest, 'y'):.2f} (src: ~1.00 both)"
)

shutil.rmtree(work, ignore_errors=True)
spark.stop()
