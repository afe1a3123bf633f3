"""Behavioral tests for the dedup family on planted near-duplicates (the
synthetic corpus has no guaranteed near-dups, so the harness rows-only check
can't prove recall — these can)."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and writes parquet files to disk"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-token edit
FAR = (
    "completely different text about embeddings vectors similarity search "
    "and approximate nearest neighbor indexes built with random hyperplanes"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)]  # 3 == exact dup of 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_keeps_first(spark, corpus):
    out = dedup.dedup_exact(corpus, ["text"], ["doc_id"]).select("doc_id").collect()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 1, 2]  # doc 3 dropped, min-id survivor kept


def test_minhash_finds_near_dup(spark, corpus):
    pairs = dedup.dedup_minhash(corpus, "doc_id", "text", threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in found  # exact dup: jaccard estimate 1.0
    assert (0, 1) in found or (1, 3) in found  # near dup found via banding
    far_pairs = {p for p in found if 2 in p}
    assert not far_pairs  # unrelated doc not paired


def test_minhash_signature_deterministic(spark, corpus):
    s1 = dedup.minhash_signatures(corpus, "doc_id").collect()
    s2 = dedup.minhash_signatures(corpus, "doc_id").collect()
    assert {r["doc_id"]: r["signature"] for r in s1} == {
        r["doc_id"]: r["signature"] for r in s2
    }


def test_simhash_blocks_near_dup(spark, corpus):
    pairs = dedup.dedup_simhash(corpus, "doc_id", "text", max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(0, 3)] == 0  # identical text -> identical fingerprint
    near = found.get((0, 1))
    assert near is not None and near <= 10


def test_ngram_jaccard_exact_scores(spark, corpus):
    pairs = dedup.ngram_jaccard_pairs(
        corpus, "doc_id", "text", shingle_k=3, threshold=0.1, max_shingle_df=10
    ).collect()
    scores = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert scores[(0, 3)] == 1.0
    assert 0.5 < scores[(0, 1)] < 1.0  # one token edit in a 23-token doc
    assert not any(2 in p for p in scores)


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "two words")], "doc_id long, text string")
    out = df.select(dedup.shingles(F.col("text"), 3).alias("s")).first()["s"]
    assert out == ["two words"]  # shorter than k -> single whole-text shingle
