"""Document chunking + sequence packing."""

from pyspark.sql import functions as F

from hive2es_offline_spark.operators.packing import pack_sequences
from hive2es_offline_spark.operators.text import chunk_documents
from hive2es_offline_spark.sources import read_table

from conftest import SF_SMOKE


def test_chunk_documents_covers_all_tokens_with_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(250))), (2, "a b c")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=100, overlap=20).collect(),
        key=lambda r: (r["doc_id"], r["chunk_index"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert [r["chunk_start"] for r in d1] == [0, 80, 160]
    assert [r["n_chunk_tokens"] for r in d1] == [100, 100, 90]
    # consecutive chunks overlap by exactly `overlap` tokens
    assert d1[0]["chunk_text"].split()[80:] == d1[1]["chunk_text"].split()[:20]
    # final token is covered
    assert d1[-1]["chunk_text"].split()[-1] == "t249"
    # short doc -> one whole chunk
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c"


def test_chunk_documents_on_corpus_is_narrow(spark):
    d = read_table(spark, "documents", SF_SMOKE)
    chunked = chunk_documents(d, chunk_tokens=50, overlap=10)
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row explode: no shuffle
    assert chunked.count() >= d.count()  # every doc yields >= 1 chunk


def test_pack_sequences_budget_and_coverage(spark):
    rows = [(i, 100 + (i * 37) % 900) for i in range(500)]  # 100..999 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, budget=2048).collect()
    all_ids = [d for r in packed for d in r["doc_ids"]]
    assert sorted(all_ids) == list(range(500))  # every doc exactly once
    assert all(r["total_tokens"] <= 2048 for r in packed)
    total_tokens = sum(n for _, n in rows)
    avg_fill = total_tokens / (len(packed) * 2048)
    assert avg_fill > 0.75  # FFD packs tightly


def test_pack_sequences_oversized_doc_is_own_pack(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, budget=2048).collect()
    solo = [r for r in packed if r["doc_ids"] == [1]]
    assert len(solo) == 1 and solo[0]["total_tokens"] == 5000


def test_pii_scrub_redacts_and_counts(spark):
    from hive2es_offline_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "contact john.doe@example.com or +1 (555) 123-4567 today"),
            (2, "ssn 123-45-6789 leaked"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert "@" not in out[1]["text_clean"] and "[REDACTED]" in out[1]["text_clean"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["n_ssn"] == 1 and "123-45-6789" not in out[2]["text_clean"]
    assert out[3]["text_clean"] == "clean text with no pii at all"
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ssn"] == 0


def test_contamination_check_finds_planted_overlap(spark):
    from hive2es_offline_spark.operators.text import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over the lazy dog tonight copied"),
            (2, "completely unrelated content about databases and query planning"),
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_contaminated_shingles"]
            for r in contamination_check(corpus, bench, shingle_k=5).collect()}
    assert hits.get(1, 0) > 0  # contaminated doc flagged
    assert 2 not in hits  # clean doc absent


def test_repetition_stats_flags_repeated_text(spark):
    from hive2es_offline_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now " * 50),                      # pathological repetition
            (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
        ],
        "doc_id long, text string",
    )
    df = df.withColumn("text", df.text.substr(1, 10_000))
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["distinct_ratio"] < 0.1
    assert out[1]["top_bigram_share"] > 0.4  # "now buy"/"buy now" dominate
    assert out[2]["distinct_ratio"] == 1.0
    assert out[2]["top_token_share"] == 0.01


def test_unigram_lm_score_oov_floor_and_vocab_cut(spark):
    import math

    from hive2es_offline_spark.operators.text import unigram_lm_score

    # corpus: "the" x 6, "cat" x 2, "dog" x 1, "zzz" x 1 -> N = 10.
    # vocab_size=2 keeps {the, cat} (count desc, token asc); dog/zzz are OOV.
    df = spark.createDataFrame(
        [(1, "the the the cat"), (2, "the the the cat"), (3, "dog zzz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_lm_score(df, vocab_size=2).collect()}
    n = 10.0
    in_vocab_avg = (3 * math.log(6 / n) + math.log(2 / n)) / 4
    oov_avg = math.log(0.5 / n)
    assert out[1]["avg_logp"] == round(in_vocab_avg, 6)
    assert out[1]["oov_ratio"] == 0.0
    assert out[3]["avg_logp"] == round(oov_avg, 6)  # both tokens take the floor
    assert out[3]["oov_ratio"] == 1.0
    # typical text scores strictly higher than all-OOV text
    assert out[1]["avg_logp"] > out[3]["avg_logp"]


def test_unigram_lm_score_vocab_tie_break_deterministic(spark):
    from hive2es_offline_spark.operators.text import unigram_lm_score

    # four tokens all with count 1: vocab_size=2 must keep the two
    # lexicographically smallest ("aa", "bb") on the count tie
    df = spark.createDataFrame([(1, "aa bb"), (2, "cc dd")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_lm_score(df, vocab_size=2).collect()}
    assert out[1]["oov_ratio"] == 0.0
    assert out[2]["oov_ratio"] == 1.0


def test_boilerplate_scrub_removes_cross_doc_lines(spark):
    from hive2es_offline_spark.operators.text import boilerplate_scrub

    banner = "accept cookies to continue"
    docs = [(i, f"unique content {i}\n{banner}\nmore text {i}") for i in range(5)]
    docs.append((99, banner))  # a doc that is ONLY boilerplate
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_scrub(df, max_df=3).collect()}
    # the banner (df=6 > 3) is scrubbed from every doc, order preserved
    assert out[0]["text_clean"] == "unique content 0\nmore text 0"
    assert out[0]["n_segments_kept"] == 2
    # the all-boilerplate doc drops out entirely
    assert 99 not in out
    # unique lines (df=1) all survive
    assert all(out[i]["n_segments_kept"] == 2 for i in range(5))


def test_boilerplate_scrub_literal_separator_not_regex(spark):
    from hive2es_offline_spark.operators.text import boilerplate_scrub

    # '.' must split literally, not as regex-any-char
    df = spark.createDataFrame(
        [(1, "keep me.boiler"), (2, "other text.boiler"), (3, "third bit.boiler")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text_clean"]
           for r in boilerplate_scrub(df, sep=".", max_df=2).collect()}
    assert out[1] == "keep me"


def test_hash_embed_deterministic_and_normalized(spark):
    import math

    from hive2es_offline_spark.operators.text import hash_embed

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b a c"), (3, "z z z"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in hash_embed(df, "doc_id", dim=16).collect()}
    # identical text -> identical vector
    assert out[1] == out[2]
    # unit norm for non-empty docs
    for did in (1, 3):
        assert abs(math.sqrt(sum(v * v for v in out[did])) - 1.0) < 1e-9
    # "z z z" concentrates all mass in one bucket
    assert sorted(out[3])[-1] == 1.0
    # raw counts mode: "a b a c" has 4 tokens, a counted twice
    raw = {r["doc_id"]: r["embedding"]
           for r in hash_embed(df, "doc_id", dim=16, l2_normalize=False).collect()}
    assert sum(raw[1]) == 4.0 and max(raw[1]) == 2.0
    # empty text still yields a row ('' splits to one empty token)
    assert 4 in raw and sum(raw[4]) == 1.0


def test_hash_embed_feeds_embedding_operators(spark):
    from hive2es_offline_spark.operators.similarity import cosine
    from hive2es_offline_spark.operators.text import hash_embed
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "spark engine for large tables"),
         (2, "spark engine for large tables"),
         (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    emb = hash_embed(df, "doc_id", dim=32)
    a, b = emb.alias("a"), emb.alias("b")
    sims = {
        (r["ia"], r["ib"]): r["s"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("s"),
        )
        .collect()
    }
    assert sims[(1, 2)] == 1.0
    assert sims[(1, 3)] < 0.5


def test_hash_embed_preserves_null_text_rows(spark):
    # row-preservation contract: NULL/empty-text docs must appear in the
    # output with a zero vector, not vanish through the token explode
    from hive2es_offline_spark.operators.text import hash_embed

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in hash_embed(df, "doc_id", dim=8).collect()}
    assert set(out) == {1, 2, 3}
    assert all(v == 0.0 for v in out[2])  # NULL text -> zero vector
    # empty string tokenizes to [""] (split semantics shared with the DuckDB
    # oracles: n_tokens('') == 1), so doc 3 gets the one-hot ''-token vector
    assert abs(sum(v * v for v in out[3]) - 1.0) < 1e-9


def test_bigram_lm_score_penalizes_shuffled_word_order(spark):
    """The bigram scorer's reason to exist: shuffled text keeps its unigram
    distribution but loses its bigrams."""
    from hive2es_offline_spark.operators.text import bigram_lm_score, unigram_lm_score

    normal = "the quick brown fox jumps over the lazy dog"
    rows = [(i, normal) for i in range(20)]
    rows.append((100, "dog the lazy over jumps fox brown quick the"))  # shuffled
    rows.append((101, "x"))  # single token: no word order to judge
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r for r in bigram_lm_score(df, vocab_size=8).collect()}
    assert len(out) == 22
    # shuffled doc: all its bigrams are rare/OOV -> far lower avg_logp
    assert out[100]["avg_logp"] < out[0]["avg_logp"] - 1.0
    assert out[100]["oov_ratio"] > out[0]["oov_ratio"]
    # unigram scorer CANNOT tell them apart (same token multiset)
    uni = {r["doc_id"]: r for r in unigram_lm_score(df, vocab_size=64).collect()}
    assert abs(uni[100]["avg_logp"] - uni[0]["avg_logp"]) < 1e-6
    # single-token doc keeps its row with no score
    assert out[101]["n_bigrams"] == 0 and out[101]["avg_logp"] is None
