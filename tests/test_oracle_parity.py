"""Local replica of the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` twin must match DuckDB on row count, sorted column
names, and (order-insensitively) values.  Floats must match to ~1e-9 — the
production queries are engineered (decimal-routed sums, per-row IEEE
arithmetic, explicit rounding) to make that hold exactly.
"""

from __future__ import annotations

import math

import os

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE, duck_con

# default smoke SF for speed; run with PARITY_SF_DIR=/root/testdata/sf0.01 to
# replicate the driver's correctness gate exactly
PARITY_SF = os.environ.get("PARITY_SF_DIR", SF_SMOKE)

ORACLED = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


def _canon(df):
    """pandas frame -> (sorted col names, sorted row tuples with canonical
    scalars)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            else:
                canon_row.append(v)
        out.append(tuple(canon_row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, out


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, name):
    sdf = entry_mod.queries()[name](spark, PARITY_SF).toPandas()
    con = duck_con(PARITY_SF)
    ddf = con.sql(entry_mod.oracle_sql()[name]).df()
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} rows vs oracle {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = entry_mod.queries()[name](spark, PARITY_SF)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.schema.fields) > 0


def test_every_oracled_query_is_inside_driver_window():
    """The driver's CORRECTNESS run evaluates exactly the first 50 entries
    of queries() in dict order — every oracle-backed query and every
    rows-only contract entry must sit inside that window."""
    names = list(entry_mod.queries())
    window = set(names[:50])
    missing = set(entry_mod.oracle_sql()) - window
    assert not missing, f"oracled queries outside the 50-entry window: {missing}"
    for contract_rows_only in (
        "es_routing", "partition_counts", "dedup_minhash", "dedup_components",
        "bulk_write",
    ):
        assert contract_rows_only in window


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"_id", "_routing", "doc", "_shard"}
