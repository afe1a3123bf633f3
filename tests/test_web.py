"""URL canonicalization + URL dedup (operators/web.py) — VERDICT r10 #6."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.operators.web import (
    canonicalize_url,
    canonicalize_url_sql,
    url_dedup,
)

CASES = [
    # scheme/host case-fold, default port, fragment, tracking params
    ("HTTP://Example.COM:80/Path?utm_source=x&id=3#frag",
     "http://example.com/Path?id=3"),
    ("https://Site.com:443/", "https://site.com/"),
    # non-default port kept; param order sorts; bare tracking param drops
    ("http://a.com:8080/x?b=2&a=1&fbclid", "http://a.com:8080/x?a=1&b=2"),
    # empty path after host normalizes to /
    ("http://a.com", "http://a.com/"),
    ("http://a.com?id=1", "http://a.com/?id=1"),
    # userinfo preserved (case-significant), host still folds
    ("ftp://User:Pw@Host.Com/f", "ftp://User:Pw@host.com/f"),
    # :80 on https is NOT default -> kept
    ("https://a.com:80/x", "https://a.com:80/x"),
    # utm_* family, all of it
    ("http://a.com/x?utm_medium=a&utm_campaign=b&q=1", "http://a.com/x?q=1"),
    # query that becomes empty drops the '?'
    ("http://a.com/x?utm_source=1", "http://a.com/x"),
    # ref_counted is NOT a tracking param (anchored name match)
    ("http://a.com/x?ref_counted=1", "http://a.com/x?ref_counted=1"),
    # no scheme: returned trimmed-but-unchanged
    ("  not a url  ", "not a url"),
    ("example.com/path?utm_source=x", "example.com/path?utm_source=x"),
]


def test_canonicalize_vectors(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = [r["c"] for r in df.select(
        canonicalize_url(F.col("url")).alias("c")).orderBy("i").collect()]
    for (u, want), g in zip(CASES, got):
        assert g == want, (u, g, want)


def test_canonicalize_null(spark):
    df = spark.createDataFrame([(1, None)], "i long, url string")
    assert df.select(canonicalize_url(F.col("url")).alias("c")
                     ).collect()[0]["c"] is None


def test_duckdb_twin_parity(spark):
    import duckdb

    con = duckdb.connect()
    frag = canonicalize_url_sql("$1")
    for u, want in CASES:
        got = con.execute(f"select {frag}", {"1": u}).fetchone()[0]
        assert got == want, (u, got, want)


def test_url_dedup_keeps_latest(spark):
    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_source=1", 10),
            (2, "http://a.com/x", 20),            # same canonical, later
            (3, "http://a.com/x#top", 15),        # same canonical
            (4, "http://b.com/y", 5),
        ],
        "id long, url string, ts long",
    )
    out = url_dedup(df, "url", order_col="ts", id_col="id")
    rows = {r["canonical_url"]: (r["id"], r["url_dup_count"])
            for r in out.collect()}
    assert rows == {"http://a.com/x": (2, 3), "http://b.com/y": (4, 1)}
    with pytest.raises(ValueError, match="deterministic"):
        url_dedup(df, "url")


def test_url_dedup_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "http://a.com/x", 1)], "id long, url string, ts long")
    out = url_dedup(df, "url", order_col="ts", id_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # rank + group-size share one exchange on the canonical key
    assert plan.count("Exchange") == 1, plan


def test_url_dedup_null_urls_all_survive(spark):
    # code-review r11: NULL canonical keys used to collapse to ONE
    # survivor, mass-dropping url-less documents
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "http://a.com/x", 5)],
        "id long, url string, ts long")
    out = url_dedup(df, "url", order_col="ts", id_col="id")
    rows = sorted((r["id"], r["canonical_url"], r["url_dup_count"])
                  for r in out.collect())
    assert rows == [(1, None, 1), (2, None, 1), (3, "http://a.com/x", 1)]


def test_url_dedup_null_urls_order_col_only_collisions(spark):
    # (ADVICE r11) with order_col-only usage (or NULL ids) a
    # value-derived surrogate collides across rows sharing the order
    # value, silently re-introducing the mass drop — the surrogate is
    # now per-row unique, so ALL url-less rows survive regardless
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 10), (3, None, 10),
         (4, "http://a.com/x", 5)],
        "id long, url string, ts long")
    out = url_dedup(df, "url", order_col="ts")
    rows = sorted((r["id"], r["canonical_url"], r["url_dup_count"])
                  for r in out.collect())
    assert rows == [(1, None, 1), (2, None, 1), (3, None, 1),
                    (4, "http://a.com/x", 1)]
