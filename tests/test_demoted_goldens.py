"""Queries demoted below the driver's 50-entry CORRECTNESS window keep
their DuckDB parity coverage here (same canonical compare as
test_oracle_parity, run locally only)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from conftest import duck_con
from test_oracle_parity import PARITY_SF, _canon

DEMOTED = sorted(entry_mod.demoted_goldens())


def test_demoted_are_declared_but_outside_window():
    names = list(entry_mod.queries())
    for name in DEMOTED:
        assert name in names
        assert names.index(name) >= 50, f"{name} is inside the driver window"
        assert name not in entry_mod.oracle_sql()


@pytest.mark.parametrize("name", DEMOTED)
def test_demoted_matches_golden(spark, name):
    sdf = entry_mod.queries()[name](spark, PARITY_SF).toPandas()
    con = duck_con(PARITY_SF)  # keep the connection alive until .df()
    ddf = con.sql(entry_mod.demoted_goldens()[name]).df()
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert s_rows == d_rows, f"{name}: value mismatch"
