"""Skew utilities + connected-components dedup resolution."""

from pyspark.sql import functions as F

from hive2es_offline_spark.operators import dedup
from hive2es_offline_spark.operators.skew import salted_agg, salted_left_join, with_salt


def test_salted_agg_matches_plain_agg(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    salted = salted_agg(
        df,
        ["k"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_v": (F.sum(F.col("v").cast("decimal(18,2)")).cast("double"),
                      F.sum(F.col("sum_v").cast("decimal(18,2)")).cast("double")),
            "max_v": (F.max("v"), F.max("max_v")),
        },
        factor=8,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sum_v"),
        F.max("v").alias("max_v"),
    )
    s = {r["k"]: (r["n"], r["sum_v"], r["max_v"]) for r in salted.collect()}
    p = {r["k"]: (r["n"], r["sum_v"], r["max_v"]) for r in plain.collect()}
    assert s == p


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(200)], "id int, v string")
    a = {r["id"]: r["_salt"] for r in with_salt(df, 16).collect()}
    b = {r["id"]: r["_salt"] for r in with_salt(df, 16).collect()}
    assert a == b
    assert len(set(a.values())) > 1  # actually spreads


def test_salted_left_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(10)],
        "k string, payload int",
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, label string")
    salted = salted_left_join(big, small, "k", factor=4).select("k", "payload", "label")
    plain = big.join(small, "k").select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_connected_components_chain_and_islands(spark):
    # components: {1,2,3,4} via chain, {10,11}, isolated nodes absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: (r["component"], r["keep"]) for r in dedup.connected_components(pairs).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4] == (1, False)
    assert out[10] == (10, True)
    assert out[11] == (10, False)


def test_minhash_to_components_end_to_end(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [(0, base), (1, base), (2, base.replace("kappa", "lambda")), (3, "unrelated text entirely different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.dedup_minhash(df, "doc_id", "text", threshold=0.5)
    decisions = dedup.connected_components(pairs)
    kept = {r["id"] for r in decisions.where("keep").collect()}
    dropped = {r["id"] for r in decisions.where("NOT keep").collect()}
    assert 0 in kept  # min-id survivor of the dup cluster
    assert 1 in dropped
    assert 3 not in kept | dropped  # never paired -> not in decision set


def test_connected_components_probe_rides_checkpoint(spark, monkeypatch):
    # r15: the convergence probe is an observe() metric on the round's own
    # eager-checkpoint job — the loop must issue NO separate driver count
    # job (the old probe was a .limit(1).count() every check_every rounds).
    # The loop materializes inside the call (eager checkpoints), so poisoning
    # DataFrame.count during the call proves no probe job exists.
    from pyspark.sql import DataFrame

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )

    def _boom(self):
        raise AssertionError(
            "convergence probe must ride the checkpoint job, not a count()")

    monkeypatch.setattr(DataFrame, "count", _boom)
    out = dedup.connected_components(pairs)
    monkeypatch.undo()
    rows = {r["id"]: r["component"] for r in out.collect()}
    assert rows == {i: 0 for i in range(9)}


def test_connected_components_deep_chain_converges_log_rounds(spark):
    # 64-node chain: pointer jumping must resolve within the default
    # 20-round cap (log2(64)+slack), with the free per-round probe exiting
    # at the first no-change round — no RuntimeWarning may escape.
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = dedup.connected_components(pairs)
        comps = {r["component"] for r in out.collect()}
    assert comps == {0}


def test_connected_components_warns_when_iteration_capped(spark):
    import pytest

    # a 12-node chain needs ~11 propagation rounds; cap at 2 -> must warn
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="max_iterations"):
        dedup.connected_components(pairs, max_iterations=2).collect()


def test_minhash_oversized_bucket_star_bounds_pairs(spark):
    # 30 identical docs: unbounded LSH emits 30*29/2 = 435 pairs; the star
    # route emits only the 29 hub-and-spoke pairs, and components still
    # collapse the family to a single keeper
    fam = [(i, "the same exact duplicated document text " * 5) for i in range(30)]
    other = [(100, "completely different words about another topic entirely")]
    df = spark.createDataFrame(fam + other, "doc_id long, text string")
    pairs = dedup.dedup_minhash(
        df, "doc_id", "text", threshold=0.5, max_bucket_size=8, oversized="star"
    )
    got = pairs.collect()
    assert 1 <= len(got) <= 29  # star, not all-pairs
    assert all(r["id_a"] == 0 for r in got)  # hub is the bucket min
    decisions = dedup.connected_components(pairs)
    assert {r["id"] for r in decisions.where("keep").collect()} == {0}
    assert {r["id"] for r in decisions.where("NOT keep").collect()} == set(range(1, 30))


def test_minhash_star_edge_survives_subthreshold_hub_similarity(spark):
    # the r2 recall hole: a hot-bucket member whose signature agreement with
    # the HUB specifically is below threshold used to lose its only edge and
    # split off from the duplicate family.  Star pairs are connectivity
    # edges and must bypass the threshold cut.
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon"
    )
    toks = base.split()
    variant = " ".join(toks[:-4] + ["zz0", "zz1", "zz2", "zz3"])
    df = spark.createDataFrame(
        [(i, base) for i in range(12)] + [(12, variant)],
        "doc_id long, text string",
    )
    pairs = dedup.dedup_minhash(df, "doc_id", "text", threshold=0.9, max_bucket_size=8)
    edge = [r for r in pairs.collect() if r["id_b"] == 12]
    assert len(edge) == 1 and edge[0]["is_star"]
    assert edge[0]["est_jaccard"] < 0.9  # genuinely sub-threshold, kept anyway
    decisions = dedup.connected_components(pairs)
    # whole family (including the drifted member) collapses to one keeper
    assert {r["id"] for r in decisions.where("keep").collect()} == {0}
    assert {r["id"] for r in decisions.where("NOT keep").collect()} == set(range(1, 13))


def test_oversized_mode_is_validated(spark):
    import pytest as _pytest

    from hive2es_offline_spark.operators import similarity

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="oversized"):
        dedup.dedup_minhash(df, "doc_id", "text", oversized="Star")
    vecs = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="oversized"):
        similarity.cosine_self_pairs(vecs, max_bucket_size=4, oversized="DROP")


def test_minhash_star_equals_unbounded_on_small_buckets(spark):
    # when no bucket exceeds the cap, the capped plan is pair-for-pair
    # identical to the unbounded one
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta " * 3),
        (1, "alpha beta gamma delta epsilon zeta eta theta " * 3),
        (2, "one two three four five six seven eight nine ten " * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.dedup_minhash(df, "doc_id", "text", threshold=0.5, max_bucket_size=64)
    unbounded = dedup.dedup_minhash(df, "doc_id", "text", threshold=0.5, max_bucket_size=None)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, unbounded.collect()))
