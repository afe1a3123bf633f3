"""Exact BPE (operators/bpe.py): learner, encoder, Spark pass —
VERDICT r10 #7."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.operators.bpe import (
    BPEncoder,
    learn_bpe,
    with_exact_bpe,
)

#: hand-computed merges: applied in order to "lowest" —
#: l o w e s t </w> -> (e,s): l o w es t -> (es,t): l o w est
#: -> (l,o): lo w est -> (lo,w): low est   => [low, est, </w>]
MERGES = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_encode_hand_computed():
    enc = BPEncoder(MERGES)
    assert enc.encode_word("lowest") == ["low", "est", "</w>"]
    assert enc.encode_word("low") == ["low", "</w>"]
    # 'est' inside a word merges the same way; unknown chars stay single
    assert enc.encode_word("best") == ["b", "est", "</w>"]
    assert enc.encode_word("zq") == ["z", "q", "</w>"]
    assert enc.encode("low lowest") == ["low", "</w>", "low", "est", "</w>"]
    assert enc.count("low lowest") == 5
    assert enc.count(None) == 0 and enc.count("") == 0


def test_merge_priority_not_greedy_position():
    # rank decides, not left-to-right position: with (s,t) ranked above
    # (e,s), "est" must become e st, never es t
    enc = BPEncoder([("s", "t"), ("e", "s")])
    assert enc.encode_word("est") == ["e", "st", "</w>"]


def test_learn_bpe_classic_corpus():
    # the Sennrich running example: the est</w> suffix dominates.  The
    # 9-count round-1 tie {(e,s), (s,t), (t,</w>)} breaks by the
    # documented lexicographic-max rule -> (t,</w>) first, and the
    # suffix still assembles to est</w> over the next two rounds.
    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges = learn_bpe([" ".join(corpus)], 4)
    assert merges[0] == ("t", "</w>")    # 9 occurrences
    assert merges[1] == ("s", "t</w>")   # still 9
    assert merges[2] == ("e", "st</w>")  # 9
    assert merges[3] == ("o", "w")       # 7
    enc = BPEncoder(merges)
    assert enc.encode_word("newest") == ["n", "e", "w", "est</w>"]
    # determinism: same corpus, same merges
    assert merges == learn_bpe([" ".join(corpus)], 4)


def test_merges_file_round_trip(tmp_path):
    p = str(tmp_path / "merges.txt")
    BPEncoder.save(MERGES, p)
    enc = BPEncoder.load(p)
    assert enc.encode_word("lowest") == ["low", "est", "</w>"]
    with pytest.raises(ValueError, match="malformed"):
        bad = str(tmp_path / "bad.txt")
        with open(bad, "w") as f:
            f.write("a b c\n")
        BPEncoder.load(bad)


def test_with_exact_bpe_spark(spark):
    df = spark.createDataFrame(
        [(1, "low lowest"), (2, "best zq"), (3, None), (4, "")],
        "id long, text string")
    out = {r["id"]: r["n_bpe_exact"] for r in
           with_exact_bpe(df, MERGES).collect()}
    # python-twin parity by construction
    enc = BPEncoder(MERGES)
    assert out == {1: enc.count("low lowest"), 2: enc.count("best zq"),
                   3: 0, 4: 0}
    assert out[1] == 5 and out[2] == 6


def test_with_exact_bpe_no_shuffle(spark):
    df = spark.createDataFrame([(1, "low")], "id long, text string")
    plan = with_exact_bpe(df, MERGES)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
