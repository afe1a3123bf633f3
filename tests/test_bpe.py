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


class TestUnigram:
    """SentencePiece-style unigram-LM segmentation (VERDICT r11 #6) —
    hand-computed Viterbi goldens + the Spark broadcast pass."""

    def test_viterbi_hand_computed(self):
        import math

        from hive2es_offline_spark.operators.bpe import UnigramEncoder

        v = {"hello": math.log(0.30), "hell": math.log(0.10),
             "he": math.log(0.10), "llo": math.log(0.20),
             "o": math.log(0.10), "l": math.log(0.05),
             "h": math.log(0.02), "e": math.log(0.02)}
        enc = UnigramEncoder(v)
        # log(0.30) = -1.20 beats he+llo = -2.30+-1.61 = -3.91
        assert enc.encode_word("hello") == ["hello"]
        assert enc.encode_word("helloo") == ["hello", "o"]
        # unknown char falls back to the UNK penalty, never fails
        assert enc.encode_word("xhello") == ["x", "hello"]
        assert enc.encode("hello hello") == ["hello", "hello"]
        assert enc.count("hello helloo x") == 4
        assert enc.count(None) == 0

    def test_viterbi_prefers_higher_logprob_not_fewer_pieces(self):
        import math

        from hive2es_offline_spark.operators.bpe import UnigramEncoder

        # "ab" exists but is so improbable that a+b scores higher:
        # log(.001) = -6.9 < log(.4)+log(.4) = -1.83
        v = {"ab": math.log(0.001), "a": math.log(0.4), "b": math.log(0.4)}
        assert UnigramEncoder(v).encode_word("ab") == ["a", "b"]
        # and the reverse when the piece is probable
        v2 = {"ab": math.log(0.5), "a": math.log(0.1), "b": math.log(0.1)}
        assert UnigramEncoder(v2).encode_word("ab") == ["ab"]

    def test_rejects_bad_vocab(self):
        import math

        import pytest as _pytest

        from hive2es_offline_spark.operators.bpe import UnigramEncoder

        with _pytest.raises(ValueError, match="empty"):
            UnigramEncoder({})
        with _pytest.raises(ValueError, match="logprob"):
            UnigramEncoder({"a": 0.5})
        with _pytest.raises(ValueError, match="logprob"):
            UnigramEncoder({"": math.log(0.5)})

    def test_learn_unigram_segments_its_corpus(self):
        from hive2es_offline_spark.operators.bpe import (
            UnigramEncoder,
            learn_unigram,
        )

        corpus = ["the cat sat on the mat", "the cat ran to the mat"]
        vocab = learn_unigram(corpus, 24)
        enc = UnigramEncoder(vocab)
        # frequent whole words become single pieces
        assert enc.encode_word("the") == ["the"]
        assert enc.encode_word("cat") == ["cat"]
        # learner is deterministic
        assert vocab == learn_unigram(corpus, 24)

    def test_spark_pass_matches_driver_counts(self, spark):
        from hive2es_offline_spark.operators.bpe import (
            UnigramEncoder,
            learn_unigram,
            with_exact_unigram,
        )

        corpus = ["streams merge into sorted runs",
                  "the scanner reads rows"]
        vocab = learn_unigram(corpus, 48)
        enc = UnigramEncoder(vocab)
        rows = [(i, t) for i, t in enumerate(
            corpus + ["unseen words zz", None, ""])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["n_unigram_exact"]
               for r in with_exact_unigram(df, vocab).collect()}
        for i, t in rows:
            assert got[i] == enc.count(t), (i, t)


# --- round 13: byte-level BPE (GPT-2/tiktoken regime) ------------------------


class TestByteBPE:
    def test_byte_table_is_bijective_and_printable(self):
        from hive2es_offline_spark.operators.bpe import bytes_to_unicode

        t = bytes_to_unicode()
        assert len(t) == 256 and len(set(t.values())) == 256
        assert t[ord("a")] == "a" and t[ord("!")] == "!"
        # non-printable bytes shift to 256+ (never control chars)
        assert ord(t[0]) >= 256 and ord(t[32]) >= 256

    def test_hand_computed_encoding_ascii(self):
        from hive2es_offline_spark.operators.bpe import ByteBPEncoder

        # merges learned by hand: l+o -> lo, lo+w -> low
        enc = ByteBPEncoder([("l", "o"), ("lo", "w")])
        assert enc.encode_word("low") == ["low"]
        assert enc.encode_word("lower") == ["low", "e", "r"]
        assert enc.encode_word("slow") == ["s", "low"]
        # no end-of-word marker, no UNK: any byte sequence segments
        assert enc.encode_word("zz") == ["z", "z"]
        assert enc.count("low lower") == 4

    def test_hand_computed_multibyte_utf8(self):
        from hive2es_offline_spark.operators.bpe import (
            ByteBPEncoder,
            bytes_to_unicode,
        )

        t = bytes_to_unicode()
        # "é" is 2 UTF-8 bytes (0xc3 0xa9): unmerged it counts 2 symbols
        c3, a9 = t[0xC3], t[0xA9]
        enc = ByteBPEncoder([])
        assert enc.encode_word("é") == [c3, a9]
        assert enc.count("é") == 2
        # one merge fuses the character; decode round-trips exactly
        enc2 = ByteBPEncoder([(c3, a9)])
        assert enc2.encode_word("café") == ["c", "a", "f", c3 + a9]
        assert enc2.decode(enc2.encode("café")) == "café"
        # 3-byte CJK and 4-byte emoji round-trip through byte fallback
        for s in ["日本", "a🙂b"]:
            assert enc.decode(enc.encode(s)) == s
        assert enc.count("日本") == 6      # 2 chars x 3 bytes
        assert enc.count("🙂") == 4        # 4-byte emoji

    def test_learner_merges_frequent_pairs_deterministically(self):
        from hive2es_offline_spark.operators.bpe import (
            ByteBPEncoder,
            learn_byte_bpe,
        )

        corpus = ["the the the cat", "the mat the"]
        merges = learn_byte_bpe(corpus, 2)
        # "th"+"e" dominate: first merge t+h, then th+e
        assert merges[0] == ("t", "h") and merges[1] == ("th", "e")
        enc = ByteBPEncoder(merges)
        assert enc.encode_word("the") == ["the"]
        # multi-byte frequent pairs merge like any other
        m2 = learn_byte_bpe(["ééé ééé"], 1)
        from hive2es_offline_spark.operators.bpe import bytes_to_unicode
        t = bytes_to_unicode()
        assert m2[0] == (t[0xC3], t[0xA9])

    def test_with_exact_byte_bpe_spark_pass(self, spark):
        from hive2es_offline_spark.operators.bpe import (
            learn_byte_bpe,
            with_exact_byte_bpe,
        )

        df = spark.createDataFrame(
            [(1, "low lower"), (2, "café"), (3, None)],
            "id long, text string")
        merges = learn_byte_bpe(["low low lower"], 3)
        # tie at freq 3 breaks lexicographically: (o,w) then (l,ow);
        # (low,e) has freq 1 < 2 so learning stops at two merges
        assert merges == [("o", "w"), ("l", "ow")]
        out = {r["id"]: r["n_byte_bpe_exact"] for r in
               with_exact_byte_bpe(df, merges).collect()}
        assert out[1] == 1 + 3             # "low" -> [low]; "lower" -> [low, e, r]
        assert out[2] == 5                 # c a f + 2 bytes of é (no merges hit)
        assert out[3] == 0
