"""ES ``suggest`` API: the term suggester ("did you mean") over a corpus.

The reference's loaded index serves the suggest API like any other
consumer query (``ESClient.java:154-170`` alias).  The term suggester
proposes per-token corrections from the INDEX VOCABULARY ranked by edit
distance then document frequency — exactly reproducible engine-side:

Scale shape (100 TB corpus, q input tokens):

- the vocabulary is ONE tokenize + per-doc-distinct explode + groupBy
  (output is vocabulary-sized, orders of magnitude below the corpus; the
  same class of pass as significant_text / bm25 corpus stats),
- every input token joins against the vocab in the SAME scan via a
  literal-array explode (one vocab pass total, not one per token), with
  the cheap guards (length window, prefix match) ahead of the edit
  distance so codegen prunes before the DP,
- ranking is a per-input window over candidate rows only (bounded by
  vocab size x q).

Distance semantics: ``string_distance="levenshtein"`` (the ES option)
runs Spark's codegen thresholded ``levenshtein`` and is what the DuckDB
oracle reproduces exactly.  ES's default "internal" distance is
Damerau-flavored; ``string_distance="damerau"`` here runs the same OSA
DP the fuzzy clause uses (Arrow-batched, behind the codegen guards) —
unit-tested, no SQL oracle (OSA's restricted transpositions diverge from
full Damerau on pathological short strings).

Score matches the suggester's shape: ``1 - distance / max(len(input),
len(candidate))``, rounded to 6; order score desc, freq desc, term asc.
``suggest_mode``: ``missing`` (default — suggest only for tokens absent
from the vocabulary), ``popular`` (only candidates more frequent than
the input token), ``always``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["term_suggest", "es_suggest"]


def _distance_col(cand: Column, inp: Column, max_edits: int,
                  string_distance: str) -> Column:
    """Edit distance capped at ``max_edits`` (rows beyond return NULL —
    callers filter on isNotNull)."""
    if string_distance == "levenshtein":
        # thresholded codegen DP: returns -1 when the distance exceeds
        # the threshold
        d = F.levenshtein(cand, inp, max_edits)
        return F.when(d >= 0, d)
    if string_distance == "damerau":
        from .query_dsl import osa_distance

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        cap = max_edits

        def _osa(a, b):
            return pd.Series(
                [
                    None if (x is None or y is None)
                    else osa_distance(x, y, cap)
                    for x, y in zip(a, b)
                ],
                dtype="object",
            )

        _osa.__annotations__ = {"a": pd.Series, "b": pd.Series,
                                "return": pd.Series}
        osa = pandas_udf(_osa, "int")
        d = osa(cand, inp)
        return F.when(d <= max_edits, d)
    raise ValueError(
        f"unsupported string_distance: {string_distance!r} "
        "(levenshtein | damerau)"
    )


def term_suggest(
    df: DataFrame,
    text: str,
    field: str,
    *,
    id_col: str = "doc_id",
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    min_word_length: int = 4,
    suggest_mode: str = "missing",
    string_distance: str = "levenshtein",
) -> DataFrame:
    """Per-token corrections for ``text`` from ``field``'s vocabulary.

    Returns ``(input_term, suggestion, dist, freq, score, rank)`` —
    ``freq`` is DOCUMENT frequency (a token counts once per doc, like the
    suggester reading the term dictionary), ``rank`` is 1-based per input
    term."""
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"unsupported suggest_mode: {suggest_mode!r}")
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2 (ES's own bound)")
    terms = sorted({
        t for t in text.lower().split()
        if t and len(t) >= int(min_word_length)
    })
    if not terms:
        raise ValueError(
            f"no input tokens of length >= {min_word_length} in {text!r}"
        )

    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(field)), " +"), lambda t: t != "")
    )
    vocab = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # one vocab pass for ALL input terms: literal-array explode, cheap
    # guards (length window + shared prefix) ahead of the edit-distance DP
    cand = vocab.select(
        "term", "freq", F.explode(F.lit(terms)).alias("input_term")
    ).where(
        F.abs(F.length("term") - F.length("input_term")) <= max_edits
    )
    if prefix_length:
        cand = cand.where(
            F.substring("term", 1, int(prefix_length))
            == F.substring("input_term", 1, int(prefix_length))
        )
    cand = cand.withColumn(
        "dist",
        _distance_col(F.col("term"), F.col("input_term"), int(max_edits),
                      string_distance),
    ).where(F.col("dist").isNotNull())

    from pyspark.sql.window import Window

    w = Window.partitionBy("input_term")
    # the input's own vocab row (dist 0) decides suggest_mode without a
    # second corpus pass
    cand = cand.withColumn(
        "_self_freq",
        F.max(F.when(F.col("dist") == 0, F.col("freq"))).over(w),
    )
    if suggest_mode == "missing":
        cand = cand.where(F.col("_self_freq").isNull())
    elif suggest_mode == "popular":
        cand = cand.where(
            F.col("freq") > F.coalesce(F.col("_self_freq"), F.lit(0))
        )
    cand = cand.where(F.col("dist") > 0)  # never suggest the input itself

    score = F.round(
        F.lit(1.0)
        - F.col("dist") / F.greatest(F.length("input_term"), F.length("term")),
        6,
    )
    ranked = cand.select(
        "input_term",
        F.col("term").alias("suggestion"),
        "dist",
        "freq",
        score.alias("score"),
    )
    ow = Window.partitionBy("input_term").orderBy(
        F.col("score").desc(), F.col("freq").desc(), F.col("suggestion").asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(ow))
        .where(F.col("rank") <= int(size))
        .orderBy("input_term", "rank")
    )


def es_suggest(df: DataFrame, body: dict, id_col: str = "doc_id") -> DataFrame:
    """The ES ``suggest`` body shape: ``{"suggest": {"<name>": {"text":
    ..., "term": {"field": ..., options}}}}`` (or the same dict without
    the outer "suggest" key).  One named term suggester per body; the
    result rows carry the suggester name."""
    spec = body.get("suggest", body)
    if len(spec) != 1:
        raise ValueError("exactly one named suggester per body")
    (name, s), = spec.items()
    if "term" not in s:
        raise ValueError("only the `term` suggester is supported")
    t = s["term"]
    out = term_suggest(
        df,
        s["text"],
        t["field"],
        id_col=id_col,
        size=int(t.get("size", 5)),
        max_edits=int(t.get("max_edits", 2)),
        prefix_length=int(t.get("prefix_length", 1)),
        min_word_length=int(t.get("min_word_length", 4)),
        suggest_mode=str(t.get("suggest_mode", "missing")),
        string_distance=str(t.get("string_distance", "levenshtein")),
    )
    return out.select(F.lit(name).alias("suggest_name"), "*")
