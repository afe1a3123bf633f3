"""URL canonicalization + URL-level dedup (VERDICT r10 #6) — the web-
crawl half of the dedup family: training pipelines dedup documents BY
CANONICAL URL before any content hashing, because the same page arrives
as ``http://Site.com/a?utm_source=x#top`` and ``http://site.com/a``.

``canonicalize_url`` is pure codegen (regexp extract/replace + array
ops, no UDF): scheme and host case-fold, userinfo preserved, default
port stripped (``:80`` http / ``:443`` https), fragment stripped,
tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
``msclkid``, ``mc_cid``/``mc_eid``, ``igshid``), remaining query params
SORTED (param order is not semantic, and sorting conflates
``?a=1&b=2`` with ``?b=2&a=1``), and an empty path after a host
normalizes to ``/``.  A value without a ``scheme://`` is returned
trimmed-but-unchanged (canonicalization is defined on absolute URLs);
NULL stays NULL.

``canonicalize_url_sql`` renders the SAME pipeline as a DuckDB fragment
(every pattern is lookaround-free, portable between Java regex and RE2)
so oracles cannot drift — the one-grammar rule the analyzer module
established.

``url_dedup`` keeps ONE row per canonical URL (latest by an ordering
column, ties broken by the id) — one hash shuffle on the canonical key,
composing with ``dedup_exact`` for the content pass that follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "canonicalize_url_sql", "url_dedup",
           "TRACKING_PARAMS_RE"]

#: tracking parameters dropped during canonicalization (matched against
#: the whole `name=value` token, so `utm_source=x` and bare `fbclid` both
#: strip; `id=3` or `ref_counted=1` do not)
TRACKING_PARAMS_RE = (
    r"^(?:utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid)(?:=.*)?$"
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(c: Column) -> Column:
    u = F.trim(c)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    # userinfo (kept verbatim, case-significant) vs host (case-folded)
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    host = F.lower(F.regexp_replace(authority, r"^.*@", ""))
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).otherwise(host)
    tail = F.regexp_replace(  # path + query + fragment
        F.regexp_replace(rest, r"^[^/?#]*", ""),
        r"#.*$", "")          # fragment stripped
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS_RE),
    ))
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), userinfo, host, path, qpart)
    return F.when(scheme == "", u).otherwise(canon)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB rendering of :func:`canonicalize_url` (same steps, same
    patterns; RE2 `regexp_matches` is partial-match like rlike)."""
    u = f"trim({expr})"
    scheme_pat = _SCHEME_RE.replace("'", "''")
    scheme = f"lower(regexp_extract({u}, '{scheme_pat}', 1))"
    rest = f"regexp_replace({u}, '{scheme_pat}', '')"
    authority = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    userinfo = f"regexp_extract({authority}, '^(.*@)', 1)"
    host0 = f"lower(regexp_replace({authority}, '^.*@', ''))"
    host = (
        f"(CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
        f"THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
        f"THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END)")
    tail = (f"regexp_replace(regexp_replace({rest}, '^[^/?#]*', ''), "
            "'#.*$', '')")
    path0 = f"regexp_extract({tail}, '^([^?]*)', 1)"
    path = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    query = f"regexp_extract({tail}, '\\?(.*)$', 1)"
    track = TRACKING_PARAMS_RE.replace("'", "''")
    params = (f"list_sort(list_filter(string_split({query}, '&'), "
              f"p -> p != '' AND NOT regexp_matches(p, '{track}')))")
    qpart = (f"(CASE WHEN len({params}) > 0 "
             f"THEN '?' || array_to_string({params}, '&') ELSE '' END)")
    canon = f"({scheme} || '://' || {userinfo} || {host} || {path} || {qpart})"
    return f"(CASE WHEN {scheme} = '' THEN {u} ELSE {canon} END)"


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    order_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL — the row with the greatest
    ``order_col`` (ties, or no order column, broken by ``id_col``)
    survives, carrying ``canonical_url`` and ``url_dup_count`` (group
    size).  Scale shape: one hash shuffle on the canonical key (window
    rank + count over the same partitioning — Catalyst reuses the single
    exchange); no collect, no join."""
    from pyspark.sql import Window

    if order_col is None and id_col is None:
        raise ValueError("url_dedup needs order_col and/or id_col for a "
                         "deterministic survivor")
    canon = canonicalize_url(F.col(url_col))
    keys = [F.col(order_col).desc()] if order_col else []
    if id_col:
        keys.append(F.col(id_col).desc())
    # NULL urls are NOT duplicates of each other: partitionBy groups all
    # NULL keys together and row_number would keep ONE survivor, mass-
    # dropping every other url-less document (code-review r11) — give
    # each NULL row its own partition via a per-row surrogate key
    # (canonical_url itself stays NULL).  The surrogate must be unique
    # PER ROW, not per tiebreak value: with order_col-only usage (or NULL
    # ids) a value-derived surrogate collides and re-introduces the mass
    # drop (ADVICE r11) — monotonically_increasing_id() guarantees
    # per-row uniqueness, and because every NULL-url row survives as its
    # own partition the output SET is deterministic even though the id
    # itself varies run to run.
    surrogate = F.concat(
        F.lit("\x00"), F.monotonically_increasing_id().cast("string"))
    # materialize the key as a NAMED column: two windows over the same
    # column name share one Exchange, while two structurally-equal
    # expression keys plan two
    w = Window.partitionBy("__pkey").orderBy(*keys)
    return (
        df.withColumn("canonical_url", canon)
        .withColumn("__pkey", F.coalesce(F.col("canonical_url"), surrogate))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("url_dup_count",
                    F.count(F.lit(1)).over(Window.partitionBy("__pkey")))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__pkey")
    )
