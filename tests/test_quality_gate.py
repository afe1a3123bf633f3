"""observe-based quality gates: metrics ride the action, no extra pass."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.operators.quality import GateViolation, quality_gate


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, None, 25), (3, "c", 40), (4, "d", 55)],
        "id long, name string, v long",
    )


def test_gate_passes_and_reports_metrics(spark, tmp_path):
    gated, check = quality_gate(
        _df(spark),
        "ok_gate",
        min_rows=4,
        max_rows=4,
        max_null_frac={"name": 0.25},
        bounds={"v": (0, 100)},
    )
    gated.write.format("noop").mode("overwrite").save()
    assert check() == []


def test_gate_raises_with_details(spark):
    gated, check = quality_gate(
        _df(spark),
        "bad_gate",
        min_rows=10,
        max_null_frac={"name": 0.0},
        bounds={"v": (20, None)},
    )
    gated.write.format("noop").mode("overwrite").save()
    with pytest.raises(GateViolation) as ei:
        check()
    checks = {c for c, _, _ in ei.value.violations}
    assert checks == {"min_rows", "null_frac[name]", "min[v]"}
    # non-strict returns the same list
    assert len(check(strict=False)) == 3


def test_gate_single_pass(spark):
    # the gate must not add a job: metrics piggyback on the one action
    sc = spark.sparkContext
    sc.setJobGroup("gate_one_pass", "single-pass gate check")
    try:
        gated, check = quality_gate(
            _df(spark).where(F.col("v") > 0), "one_pass", min_rows=1
        )
        gated.write.format("noop").mode("overwrite").save()
        check()
        jobs = sc.statusTracker().getJobIdsForGroup("gate_one_pass")
        assert len(jobs) == 1
    finally:
        sc.setJobGroup(None, None)


def test_gate_empty_frame(spark):
    gated, check = quality_gate(
        _df(spark).where(F.lit(False)), "empty", min_rows=1,
        max_null_frac={"name": 0.5},
    )
    gated.write.format("noop").mode("overwrite").save()
    bad = check(strict=False)
    assert bad == [("min_rows", 0, 1)]


def test_column_drift_identical_distributions_zero_psi(spark):
    from hive2es_offline_spark.operators.quality import column_drift

    df = spark.createDataFrame([(i, float(i % 50)) for i in range(500)], "id long, v double")
    rows = column_drift(df, df, "v", bins=5).collect()
    assert abs(sum(r["psi_term"] for r in rows)) < 1e-9
    assert all(r["p_old"] == r["p_new"] for r in rows)


def test_column_drift_detects_shift_and_handles_nulls(spark):
    from hive2es_offline_spark.operators.quality import column_drift

    old = spark.createDataFrame([(i, float(i % 100)) for i in range(1000)], "id long, v double")
    # new: shifted mass + out-of-range values (clamp) + NULLs (bin -1)
    rows_new = [(i, float(50 + i % 100)) for i in range(900)]
    rows_new += [(9000 + i, None) for i in range(100)]
    new = spark.createDataFrame(rows_new, "id long, v double")
    out = {r["bin"]: r for r in column_drift(old, new, "v", bins=4).collect()}
    psi = sum(r["psi_term"] for r in out.values())
    assert psi > 0.25  # clear shift
    assert out[-1]["n_old"] == 0 and out[-1]["n_new"] == 100  # NULL bin
    assert out[3]["n_new"] > out[3]["n_old"]  # clamped top bin gained mass


def test_column_drift_constant_reference_degrades(spark):
    from hive2es_offline_spark.operators.quality import column_drift

    old = spark.createDataFrame([(i, 7.0) for i in range(10)], "id long, v double")
    new = spark.createDataFrame([(i, 7.0 + i) for i in range(10)], "id long, v double")
    rows = column_drift(old, new, "v", bins=3).collect()
    assert len(rows) >= 1  # degenerate [min,max] widens to one sane grid


def test_ks_drift_hand_computed(spark):
    from hive2es_offline_spark.operators.quality import ks_drift

    old = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    new = spark.createDataFrame([(2.0,), (3.0,), (3.0,), (4.0,)], "v double")
    r = ks_drift(old, new, "v").collect()[0]
    # F_old = 1/3, 2/3, 1, 1; F_new = 0, 1/4, 3/4, 1 at v in (1,2,3,4)
    # -> sup |diff| = |2/3 - 1/4| = 5/12 at v = 2
    assert (r["n_old"], r["n_new"]) == (3, 4)
    assert r["ks"] == pytest.approx(round(5 / 12, 6), abs=2e-6)
    assert r["at_value"] == 2.0


def test_ks_drift_identical_distributions_zero(spark):
    from hive2es_offline_spark.operators.quality import ks_drift

    df = spark.createDataFrame([(float(i % 7),) for i in range(70)],
                               "v double")
    r = ks_drift(df, df, "v").collect()[0]
    assert r["ks"] == 0.0


def test_ks_drift_precision_rounds_values(spark):
    from hive2es_offline_spark.operators.quality import ks_drift

    old = spark.createDataFrame([(1.0001,), (2.0002,)], "v double")
    new = spark.createDataFrame([(1.0003,), (2.0001,)], "v double")
    r = ks_drift(old, new, "v", precision=2).collect()[0]
    assert r["ks"] == 0.0  # identical after rounding
