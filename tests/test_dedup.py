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


# ---------------------------------------------------------------------------
# incremental (batch-vs-corpus) dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def batches(spark):
    seen = spark.createDataFrame(
        [(100, BASE), (101, FAR)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (0, BASE),            # exact dup of seen 100 -> dropped
            (1, "  " + BASE.upper() + "  "),  # canonical-form dup -> dropped (exact)
            (2, NEAR),            # near-dup of seen 100 -> survives exact, dropped by minhash
            (3, "fresh document about streaming watermarks and state stores"),
            (4, "fresh document about streaming watermarks and state stores"),
        ],
        "doc_id long, text string",
    )
    return new, seen


def test_incremental_exact_drops_seen_and_in_batch(spark, batches):
    new, seen = batches
    kept = sorted(
        r["doc_id"]
        for r in dedup.incremental_dedup_exact(new, seen).select("doc_id").collect()
    )
    # 0 and 1 match seen fingerprints; 4 is an in-batch dup of 3 (keep-first);
    # 2 is only a NEAR dup, exact keeps it
    assert kept == [2, 3]


def test_incremental_exact_idempotent(spark, batches):
    new, seen = batches
    once = dedup.incremental_dedup_exact(new, seen)
    again = dedup.incremental_dedup_exact(once, seen.unionByName(once))
    assert again.count() == 0


def test_incremental_minhash_drops_near_dup(spark, batches):
    new, seen = batches
    kept = sorted(
        r["doc_id"]
        for r in dedup.incremental_dedup_minhash(
            new, seen, threshold=0.5
        ).select("doc_id").collect()
    )
    # 0 (exact) and 2 (one-token edit) both collide with seen 100; the
    # uppercase variant 1 shingles differently (minhash is case-sensitive)
    assert 0 not in kept and 2 not in kept
    assert 3 in kept and 4 in kept


def test_incremental_minhash_accepts_precomputed_signatures(spark, batches):
    new, seen = batches
    sigs = dedup.minhash_signatures(seen, "doc_id")
    out = dedup.incremental_dedup_minhash(
        new, seen_df=None, seen_signatures=sigs, threshold=0.5
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert 0 not in kept and 2 not in kept


def test_incremental_minhash_signatures_from_snapshot_store(spark, batches, tmp_path):
    """Steady-state daily-batch loop: signatures persisted via the snapshot
    sink, read back from storage, fed to the banding join — planted dups
    still drop."""
    from hive2es_offline_spark.sinks import snapshot as S

    new, seen = batches
    root = str(tmp_path / "sig_store")
    S.upsert_snapshot(spark, root, dedup.minhash_signatures(seen, "doc_id"), ["doc_id"])
    stored = S.read_snapshot(spark, root)
    out = dedup.incremental_dedup_minhash(
        new, seen_df=None, seen_signatures=stored, threshold=0.5
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert 0 not in kept and 2 not in kept
    assert 3 in kept and 4 in kept
    # day 2: upsert the surviving batch's signatures into the same store,
    # then the batch filtered against the grown store drops everything
    S.upsert_snapshot(spark, root, dedup.minhash_signatures(out, "doc_id"), ["doc_id"])
    grown = S.read_snapshot(spark, root)
    again = dedup.incremental_dedup_minhash(
        out, seen_df=None, seen_signatures=grown, threshold=0.5
    )
    assert again.count() == 0


def test_repeated_ngram_scrub_removes_cross_doc_passages(spark):
    """Exact-substring dedup (Lee et al. 2022): a >=k-token passage shared
    by two docs is removed from BOTH; unique text is untouched."""
    from hive2es_offline_spark.operators import dedup

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + passage + " gamma delta"),
            (2, "start " + passage + " end words here"),
            (3, "nothing shared at all in this one document"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.repeated_ngram_scrub(df, "doc_id", "text", k=8, min_df=2).collect()}
    # 10-token passage -> 3 overlapping 8-token windows, 10 tokens covered
    assert out[1]["repeated_windows"] == 3 and out[1]["tokens_removed"] == 10
    assert out[1]["text_clean"] == "alpha beta gamma delta"
    assert out[2]["text_clean"] == "start end words here"
    assert out[3]["tokens_removed"] == 0
    assert out[3]["text_clean"] == out[3]["text"]
    assert out[4]["repeated_windows"] == 0  # shorter than k: no windows


def test_repeated_ngram_scrub_within_doc_repeat_not_flagged(spark):
    """min_df counts DISTINCT documents: a passage repeated twice inside
    ONE doc is not cross-document duplication."""
    from hive2es_offline_spark.operators import dedup

    p = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, p + " x " + p), (2, "totally different words everywhere here now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.repeated_ngram_scrub(df, "doc_id", "text", k=8, min_df=2).collect()}
    assert out[1]["tokens_removed"] == 0
