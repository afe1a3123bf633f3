#!/usr/bin/env python3
"""Round-9 scaling probes (results recorded in SCALE.md).

1. Term suggester (`plans/suggest.py::term_suggest`) on a ~1M-doc
   corpus: the claimed bound is ONE vocabulary pass (tokenize + explode +
   vocab-sized groupBy) plus a literal-array candidate join whose cost
   scales with VOCABULARY size, not corpus size.  Measured against the
   vocabulary-only pass to show the suggester adds vocab-bounded work.
2. Phrase suggester timing: with the round-9 shared-vocabulary
   restructure the pipeline runs TWO corpus passes (vocab, bigrams —
   structural: the unigram counts and vocabulary size read the persisted
   vocab frame), timed end-to-end on the same corpus.
3. Rescore window join (VERDICT r8 #4): scored search + rescore on the
   1M-doc corpus, old shape (full-corpus tsmap join) vs new shape
   (post-window-cut join) — the timed difference is what the deferred
   join saves.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive2es_offline_spark.plans.scoring import es_scored_search
from hive2es_offline_spark.plans.suggest import (
    phrase_suggest,
    term_suggest,
    vocab_frame,
)
from hive2es_offline_spark.session import get_spark

spark = get_spark("round9-probe",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

N = 1_000_000
# ~31k-term vocabulary (word0..word999 x field mixes + stopword-ish base),
# punctuation included so the standard analyzer does real work
docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the quick, engine scans; tables fast!"),
            F.concat(F.lit("word"), (F.col("id") % 10000)),
            F.concat(F.lit("term"), (F.col("id") % 7000)),
            F.when(F.col("id") % 11 == 0, F.lit("streaming merge"))
            .otherwise(F.concat(F.lit("tok"), F.col("id") % 997)),
            F.lit("vector index build."),
        ).alias("text"),
    )
    .persist()
)
docs.count()  # materialize outside the clock

results = {"n_docs": N}

# --- probe 1: term suggester ---------------------------------------------
t0 = time.time()
vocab_n = vocab_frame(docs, "text").count()
results["vocab_pass_sec"] = round(time.time() - t0, 3)
results["vocab_size"] = vocab_n

t0 = time.time()
out = term_suggest(
    docs, "stremaing mrege vectr", "text", size=5, max_edits=2
).collect()
results["term_suggest_sec"] = round(time.time() - t0, 3)
results["term_suggest_rows"] = len(out)

# --- probe 2: phrase suggester (two corpus passes by construction) -------
t0 = time.time()
phr = phrase_suggest(docs, "stremaing merge", "text", size=3).collect()
results["phrase_suggest_sec"] = round(time.time() - t0, 3)
results["phrase_suggest_rows"] = len(phr)

# --- probe 3: rescore post-cut join (new) vs full-corpus join (old) ------
body = {
    "query": {"match": {"text": "streaming merge"}},
    "rescore": {"window_size": 50, "query": {
        "rescore_query": {"match": {"text": "vector index"}},
        "rescore_query_weight": 2.0,
    }},
    "size": 10,
    "_source": ["doc_id"],
}
t0 = time.time()
new_rows = es_scored_search(docs, body, id_field="doc_id").collect()
results["rescore_postcut_sec"] = round(time.time() - t0, 3)

# the old shape, reproduced inline: score the rescore query over the FULL
# corpus (tsmap joined onto every row), then cut the window
from hive2es_offline_spark.plans.scoring import score_frame

t0 = time.time()
s0 = score_frame(docs, body["query"], "doc_id").withColumnRenamed(
    "_score", "_score0")
s1 = score_frame(
    s0, body["rescore"]["query"]["rescore_query"], "doc_id"
).withColumnRenamed("_score", "_rescore")
old = (
    s1.where(F.col("_score0") > 0)
    .orderBy(F.col("_score0").desc(), F.col("doc_id").asc())
    .limit(50)
    .withColumn("_score", F.round(F.col("_score0") + 2.0 * F.col("_rescore"), 6))
    .orderBy(F.col("_score").desc(), F.col("doc_id").asc())
    .limit(10)
    .collect()
)
results["rescore_fullcorpus_sec"] = round(time.time() - t0, 3)

print(json.dumps(results))
