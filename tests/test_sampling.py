"""Deterministic splits + stratified sampling."""

from pyspark.sql import functions as F

from hive2es_offline_spark.operators.sampling import hash_split, stratified_sample
from hive2es_offline_spark.sources import read_table

from conftest import SF_SMOKE


def test_hash_split_distribution_and_determinism(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.90) < 0.02
    assert abs(counts["val"] / 20_000 - 0.05) < 0.01
    assert abs(counts["test"] / 20_000 - 0.05) < 0.01
    # stable across runs AND across repartitioning
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b


def test_hash_split_salt_gives_independent_split(spark):
    df = spark.range(5_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", salt="epoch2").collect()}
    assert a != b  # different salt -> different assignment
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 500  # substantially re-drawn, not a near-copy


def test_hash_split_normalizes_weights(spark):
    df = spark.range(2_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", weights={"a": 3, "b": 1})  # 75/25
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["a"] / 2_000 - 0.75) < 0.03


def test_stratified_sample_rates(spark):
    d = read_table(spark, "documents", SF_SMOKE).select("doc_id", "lang")
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    fractions = {lg: (0.5 if i % 2 == 0 else 1.0) for i, lg in enumerate(langs)}
    sampled = stratified_sample(d, "lang", fractions)
    base = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lg, frac in fractions.items():
        if frac == 1.0:
            assert got.get(lg, 0) == base[lg]  # kept whole
        else:
            assert 0 < got.get(lg, 0) < base[lg]  # genuinely downsampled
    # deterministic under the same seed
    again = {r["lang"]: r["n"] for r in stratified_sample(d, "lang", fractions)
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == again


def test_mix_rates_binding_stratum_and_proportions():
    from hive2es_offline_spark.operators.sampling import mix_rates

    # wiki is binding: 100 rows must be 30% of the output -> T = 333.3,
    # web keeps 333.3*0.5/1000 = 1/6, books keeps 333.3*0.2/500 = 2/15
    rates = mix_rates(
        {"web": 1000, "wiki": 100, "books": 500},
        {"web": 0.5, "wiki": 0.3, "books": 0.2},
    )
    assert rates["wiki"] == 1.0
    assert abs(rates["web"] - 1 / 6) < 1e-12
    assert abs(rates["books"] - 2 / 15) < 1e-12
    # expected kept counts hit the target mix exactly
    kept = {s: n * rates[s] for s, n in {"web": 1000, "wiki": 100, "books": 500}.items()}
    total = sum(kept.values())
    assert abs(kept["web"] / total - 0.5) < 1e-12
    # strata missing from targets get no rate
    assert "books2" not in mix_rates({"books2": 5, "wiki": 1}, {"wiki": 1.0})


def test_source_mix_filters_to_target_mix(spark):
    from hive2es_offline_spark.operators.sampling import source_mix

    # 2000/200/1000 rows; targets 50/30/20 -> src1 binding (kept whole)
    rows = (
        [(i, "src0") for i in range(2000)]
        + [(10_000 + i, "src1") for i in range(200)]
        + [(20_000 + i, "src2") for i in range(1000)]
        + [(30_000 + i, "other") for i in range(100)]
    )
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_mix(d, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}, "doc_id")
    got = {r["source"]: r["n"]
           for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["src1"] == 200              # binding stratum kept whole
    assert "other" not in got              # untargeted stratum dropped
    # hash sampling is approximate: ±15% of the expected kept counts
    expected0 = (200 / 0.3) * 0.5
    expected2 = (200 / 0.3) * 0.2
    assert abs(got["src0"] - expected0) / expected0 < 0.15
    assert abs(got["src2"] - expected2) / expected2 < 0.15
    # deterministic: same input -> identical selection
    again = {r["source"]: r["n"]
             for r in source_mix(d, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}, "doc_id")
             .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == again


def test_cap_per_group_semantics_and_plan(spark):
    from hive2es_offline_spark.operators.sampling import cap_per_group

    rows = [(g, i, float(100 - i)) for g in ("a", "b") for i in range(50)]
    rows += [("c", 99, 1.0)]  # under-cap group kept whole
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    out = cap_per_group(df, "grp", [F.col("score").desc(), F.col("id")], 10)
    pdf = out.toPandas()
    assert pdf.groupby("grp").size().to_dict() == {"a": 10, "b": 10, "c": 1}
    # best-first: the 10 highest scores survive per group
    assert sorted(pdf[pdf.grp == "a"]["id"]) == list(range(10))
    # rank exposure
    ranked = cap_per_group(df, "grp", [F.col("score").desc(), F.col("id")], 3, rank_col="r")
    assert set(ranked.toPandas()["r"]) == {1, 2, 3}
    # the rank<=n filter must plan as WindowGroupLimit (partial per-partition
    # top-n below the exchange), not a full per-group sort + filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_quantile_filter_exact_and_approx(spark):
    from hive2es_offline_spark.operators.sampling import quantile_filter

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 97).alias("score"))
    kept = quantile_filter(df, "score", 0.2, exact=True)
    n = kept.count()
    # >= threshold keeps at least 20%, ties may add a little
    assert 200 <= n <= 240
    assert kept.agg(F.min("score")).first()[0] >= 77
    approx = quantile_filter(df, "score", 0.2).count()
    assert abs(approx - n) <= 25
    # degenerate inputs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_filter(df, "score", 0.0)
    assert quantile_filter(df.where(F.lit(False)), "score", 0.5).count() == 0


def test_epoch_shuffle_deterministic_and_epoch_independent(spark, tmp_path):
    from hive2es_offline_spark.operators.sampling import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    k0 = epoch_shuffle(df, "doc_id", 0).orderBy("doc_id").toPandas()
    k0b = epoch_shuffle(df.repartition(7), "doc_id", 0).orderBy("doc_id").toPandas()
    k1 = epoch_shuffle(df, "doc_id", 1).orderBy("doc_id").toPandas()
    assert (k0["shuffle_key"] == k0b["shuffle_key"]).all()  # layout-stable
    assert (k0["shuffle_key"] != k1["shuffle_key"]).any()  # new permutation
    # materialized range write: shards are globally ordered by key
    out = str(tmp_path / "ep0")
    (
        epoch_shuffle(df, "doc_id", 0)
        .repartitionByRange(4, "shuffle_key")
        .sortWithinPartitions("shuffle_key")
        .write.parquet(out)
    )
    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        keys = pq.read_table(f, columns=["shuffle_key"])["shuffle_key"].to_pylist()
        assert keys == sorted(keys)
        if keys:
            ranges.append((keys[0], keys[-1]))
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint, ascending shard ranges


def test_temperature_targets_limits_and_flattening():
    import pytest

    from hive2es_offline_spark.operators.sampling import (
        mix_rates, temperature_targets)

    counts = {"web": 8000, "wiki": 1000, "books": 1000}
    # T=1: natural proportions
    nat = temperature_targets(counts, 1.0)
    assert abs(nat["web"] - 0.8) < 1e-12
    # T>1 flattens: small sources gain share, order preserved
    t3 = temperature_targets(counts, 3.0)
    assert nat["web"] > t3["web"] > 1 / 3
    assert t3["wiki"] > nat["wiki"]
    # huge T -> ~uniform
    tu = temperature_targets(counts, 1e9)
    assert all(abs(v - 1 / 3) < 1e-6 for v in tu.values())
    assert abs(sum(t3.values()) - 1.0) < 1e-12
    with pytest.raises(ValueError):
        temperature_targets(counts, 0)
    # composes with mix_rates: binding stratum keeps rate 1.0
    rates = mix_rates(counts, t3)
    assert max(rates.values()) == 1.0 and all(0 < r <= 1 for r in rates.values())


def test_sampling_gate_negative_ids_replay_in_ansi_sql(spark):
    """Round-15 review (ADVICE r14): Spark pmod is non-negative while SQL
    ``%`` is sign-preserving, so a ``%``-based oracle replay keeps EVERY
    negative id.  The documented replay — first round spelled
    ``((id % P) + P) % P`` — must match sampling_gate exactly on a frame
    that is mostly negative ids."""
    import duckdb

    from hive2es_offline_spark.plans.query_dsl import sampling_gate

    df = spark.range(-1_999, 2_000).withColumnRenamed("id", "doc_id")
    kept = sorted(
        r["doc_id"]
        for r in df.where(sampling_gate(F.col("doc_id"), 0.2)).collect())
    assert kept, "gate kept nothing — fixture broken"
    # negatives must be genuinely gated, not all-pass (the % bug kept all)
    n_neg = sum(1 for k in kept if k < 0)
    assert 0 < n_neg < 1_999

    con = duckdb.connect()
    oracle = [r[0] for r in con.execute("""
        SELECT doc_id FROM range(-1999, 2000) t(doc_id)
        WHERE ((((doc_id % 1000000007) + 1000000007) % 1000000007
                * 387420489 + 12345)
               % 1000000007 * 387420489 + 987654323)
              % 1000000007 < 200000001
        ORDER BY doc_id
    """).fetchall()]
    assert kept == oracle
