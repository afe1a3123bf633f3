#!/usr/bin/env python3
"""Round-4 scaling probes (results recorded in SCALE.md).

Probes the new operators well beyond harness SF sizes:
  1. embed_pca: moments + whitened projection over 200k x 64 vectors
  2. semantic_dedup: 200k vectors, 64 cells, planted duplicate families
  3. compact_parquet: 1024-file fragmented table -> range-clustered rewrite
  4. snapshot upsert: 1M-row 20-partition table, single-partition update
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

spark = get_spark("round4-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="probe4_")
N, D = 200_000, 64

# synthetic embeddings: 1000 planted families of 20 near-dups + 180k singles
t0 = time.time()
rng = np.random.default_rng(3)
fam_bases = rng.normal(size=(1000, D)).astype(np.float32)
fams = np.repeat(fam_bases, 20, axis=0) + rng.normal(scale=1e-3, size=(20_000, D)).astype(np.float32)
singles = rng.normal(size=(N - 20_000, D)).astype(np.float32)
mat = np.vstack([fams, singles])
import pandas as pd

pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64), "embedding": list(mat)})
emb_path = os.path.join(work, "emb.parquet")
pdf.to_parquet(emb_path)
emb = spark.read.parquet(emb_path)
emb = emb.withColumn("embedding", F.col("embedding").cast("array<float>")).repartition(32).cache()
emb.count()
print(f"setup: {time.time()-t0:.1f}s")

from hive2es_offline_spark.operators.embeddings import pca_fit, pca_transform

t0 = time.time()
model = pca_fit(emb, k=16)
t_fit = time.time() - t0
t0 = time.time()
pca = pca_transform(emb, model, whiten=True)
pca.write.format("noop").mode("overwrite").save()
t_proj = time.time() - t0
print(f"embed_pca: fit {t_fit:.1f}s, project {t_proj:.1f}s "
      f"(n={model['n']}, top ratio {model['explained_ratio'][0]:.4f})")

from hive2es_offline_spark.operators.similarity import semantic_dedup

t0 = time.time()
kept = semantic_dedup(emb, num_cells=512, threshold=0.99, kmeans_iters=1,
                      max_cell_size=8192)
n_kept = kept.count()
t_sem = time.time() - t0
print(f"semantic_dedup: {t_sem:.1f}s, kept {n_kept}/{N} "
      f"(expect ~{N - 20_000 + 1000})")

from hive2es_offline_spark.sinks import layout

t0 = time.time()
frag = os.path.join(work, "frag")
(
    spark.range(2_000_000)
    .select(F.col("id"), F.md5(F.col("id").cast("string")).alias("payload"))
    .repartition(1024)
    .write.parquet(frag)
)
t_frag = time.time() - t0
before = layout.table_stats(spark, frag)
t0 = time.time()
stats = layout.compact_parquet(
    spark, frag, os.path.join(work, "compact"),
    target_file_bytes=before["bytes"] // 8, sort_cols=["id"], mode="range",
)
t_comp = time.time() - t0
overlap = layout.file_range_overlap(os.path.join(work, "compact"), "id")
print(f"compact: fragment write {t_frag:.1f}s ({before['files']} files), "
      f"compact {t_comp:.1f}s -> {stats['after']['files']} files, "
      f"range overlap {overlap:.3f}")

from hive2es_offline_spark.sinks import snapshot as S

t0 = time.time()
base = spark.range(1_000_000).select(
    F.col("id"),
    (F.col("id") % 20).cast("string").alias("part"),
    F.md5(F.col("id").cast("string")).alias("val"),
)
snap_root = os.path.join(work, "snap")
os.makedirs(snap_root)
S.upsert_snapshot(spark, snap_root, base, ["id"], "part")
t_pub = time.time() - t0
updates = base.where(F.col("part") == "7").limit(5000).withColumn(
    "val", F.lit("edited")
)
t0 = time.time()
m = S.upsert_snapshot(spark, snap_root, updates, ["id"], "part")
t_up = time.time() - t0
t0 = time.time()
n = S.read_snapshot(spark, snap_root).count()
t_read = time.time() - t0
print(f"snapshot: initial publish {t_pub:.1f}s, single-partition upsert "
      f"{t_up:.1f}s (rewrote {m['rewritten']}), read-back {t_read:.1f}s ({n} rows)")

shutil.rmtree(work)
spark.stop()
