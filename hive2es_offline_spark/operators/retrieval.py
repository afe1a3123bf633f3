"""Full-text relevance retrieval (BM25) as pure DataFrame ops.

The reference ships rows into Elasticsearch precisely so users can run
relevance-ranked ``match`` queries over them (the generated mapping at
``PAHive2ES.scala:126-159`` is what Lucene's BM25 similarity scores
against).  This operator reproduces that capability engine-side: score a
corpus against a query string with Lucene's BM25 formula and return the
top-k — no index required, one bounded-width shuffle.

Scale shape (100 TB corpus, q query terms):

- the corpus is tokenized and exploded, but *filtered to the q query terms
  inside the same stage* — the only full-width exchange carries
  (doc, term, tf, dl) rows for matching terms only, a tiny fraction of the
  token stream (predicate applied pre-shuffle, map-side).
- corpus stats (N, avgdl) are a 1-row aggregate, broadcast back.
- per-term document frequencies are a q-row aggregate, broadcast back.
- final ranking is sum-per-doc + top-k (TakeOrderedAndProject heaps, no
  global sort).

Determinism: per-(doc,term) partial scores are rounded to 6 decimals and
summed as DECIMAL(28,6) — decimal addition is associative, so partition
order can't flip low-order float bits, and an ANSI-SQL oracle reproduces
the exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_topk"]



def bm25_topk(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-k documents for ``query`` under Lucene-style BM25.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))          (always > 0)
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Returns (id_col, score, rank) ordered by score desc, id asc.  ``avgdl``
    is the corpus mean token count (Lucene semantics), computed in the same
    1-row aggregate as N.
    """
    # analysis chain shared with plans/query_dsl.py (standard analyzer
    # by default — plans/analysis.py)
    from ..plans.analysis import analyze_col, analyze_text

    terms = sorted(set(analyze_text(query)))
    if not terms:
        raise ValueError("query has no terms after analysis")

    toks = analyze_col(text_col)
    base = docs.select(
        F.col(id_col).alias("_did"),
        toks.alias("_toks"),
    ).select("_did", "_toks", F.size("_toks").cast("double").alias("_dl"))

    # 1-row corpus stats, folded back in via broadcast nested-loop (1 row).
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )

    # Explode → filter to query terms BEFORE any shuffle: the exchange for
    # the (doc, term) tf aggregate only ever carries query-term hits.
    hits = (
        base.select("_did", "_dl", F.explode("_toks").alias("_term"))
        .where(F.col("_term").isin(terms))
    )
    tf = hits.groupBy("_did", "_term").agg(
        F.count(F.lit(1)).cast("double").alias("_tf"),
        F.first("_dl").alias("_dl"),
    )

    # Document frequency per query term: ≤ q rows, broadcast back.
    dfreq = tf.groupBy("_term").agg(F.count(F.lit(1)).cast("double").alias("_df"))

    scored = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .select(
            "_did",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1.0))
                / (
                    F.col("_tf")
                    + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
                ),
                6,
            ).cast("decimal(28,6)").alias("_partial"),
        )
    )
    ranked = (
        scored.groupBy("_did")
        .agg(F.sum("_partial").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col("_did").asc())
        .limit(top_k)
    )
    # rank over the k collected rows only (single tiny partition)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score").desc(), F.col("_did").asc())
    return ranked.select(
        F.col("_did").alias(id_col),
        "score",
        F.row_number().over(w).alias("rank"),
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked result lists (the standard hybrid
    lexical+vector retrieval combiner — Cormack et al. 2009, the same
    formula behind ES's ``rrf`` rank mode):
    ``rrf_score(d) = Σ_lists 1 / (k + rank_list(d))``, with a list that
    does not contain ``d`` contributing 0.

    Each input carries (id_col, rank_col); inputs are typically already
    tiny top-k frames (bm25_topk, an es_search knn result ranked by
    ``_score``), so the union + groupBy is a trivially small aggregation —
    the heavy lifting happened inside each retriever.  ``k`` dampens the
    head (rank 1 vs 2 differs by ~1/3700 at k=60, so no single list
    dominates); ties break on id for engine-stable output."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked input")
    parts = [
        df.select(
            F.col(id_col).alias("_did"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias("_c"),
        )
        for df in ranked
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = (
        allc.groupBy("_did")
        .agg(F.round(F.sum("_c"), 9).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("_did").asc())
        .limit(top_k)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("rrf_score").desc(), F.col("_did").asc())
    return fused.select(
        F.col("_did").alias(id_col),
        "rrf_score",
        F.row_number().over(w).alias("rank"),
    )
