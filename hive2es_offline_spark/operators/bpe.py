"""Exact BPE token counting (VERDICT r10 #7).

``operators/text.py`` counts tokens two cheap ways — whitespace and a
BPE-ish regex (``BPE_TOKEN_PATTERN``), both pure codegen.  Those are the
right default for bulk filtering, but a training-data budget wants the
EXACT subword count under a real merges table.  This module adds:

- :func:`learn_bpe` — the classic byte-pair-encoding learner (Sennrich
  et al. 2016, "Neural Machine Translation of Rare Words with Subword
  Units"): count word frequencies, start from characters plus an
  end-of-word symbol, repeatedly merge the most frequent adjacent pair
  (ties broken lexicographically for determinism).  Driver-side, meant
  for fixtures and smallish reference corpora.
- :class:`BPEncoder` — applies a merges table (lowest rank first, all
  occurrences per pass) with an LRU word cache; loads/saves the standard
  one-merge-per-line text format.
- :func:`with_exact_bpe` — the Spark surface: the merges table
  BROADCASTS once, each executor builds one cached encoder, and an
  Arrow-batched ``mapInPandas`` pass adds the exact count column.

Cost split (documented, measured at sf0.01): the codegen regex count is
~free (rides the existing projection); the exact encoder is a Python
pass over every word — use it for the FINAL budget accounting, not for
per-row hot-path filters.  At 100 TB the pass is embarrassingly
parallel (no shuffle; merges table ~100 KB broadcast) but still
Python-rate, so gate it behind sampling or run it on the already-
filtered corpus.

Pre-tokenization is whitespace splitting (the subword-nmt convention);
``</w>`` marks word end as its own symbol, so "low" encodes to at least
``[l, o, w, </w>]`` before merges.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling operators)
from pyspark.sql import types as T

__all__ = ["learn_bpe", "BPEncoder", "with_exact_bpe",
           "learn_unigram", "UnigramEncoder", "with_exact_unigram",
           "bytes_to_unicode", "learn_byte_bpe", "ByteBPEncoder",
           "with_exact_byte_bpe"]

_EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (_EOW,)


def learn_bpe(texts, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from an iterable of texts.
    Deterministic: the most frequent pair wins each round, frequency
    ties break lexicographically.  Stops early when no pair repeats."""
    words = Counter()
    for t in texts:
        words.update((t or "").split())
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): n for w, n in words.items()}
    return _learn_merges(vocab, n_merges)


def _learn_merges(
    vocab: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over an already-symbolized word-frequency
    vocab — shared by the char-level and byte-level learners."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _apply_merges(syms: list[str], ranks: dict) -> list[str]:
    """Apply a ranked merges table to a symbol list: lowest rank first,
    every occurrence of the winning pair per pass — shared by the
    char-level and byte-level encoders (the applier twin of
    ``_learn_merges``)."""
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        out = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BPEncoder:
    """Apply a merges table.  ``merges`` is an ordered list of symbol
    pairs (earlier = higher priority, the standard merges-file order)."""

    def __init__(self, merges: list[tuple[str, str]],
                 cache_size: int = 65536):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        if len(self.ranks) != len(merges):
            raise ValueError("duplicate merge rule in table")
        self._cache: dict[str, int] = {}
        self._cache_size = cache_size

    @classmethod
    def load(cls, path: str) -> "BPEncoder":
        """Standard merges file: one ``left right`` pair per line;
        ``#``-prefixed lines (the subword-nmt version header) skipped."""
        merges = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, _, b = line.partition(" ")
                if not b or " " in b:
                    raise ValueError(f"malformed merges line: {line!r}")
                merges.append((a, b))
        return cls(merges)

    @staticmethod
    def save(merges: list[tuple[str, str]], path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write("#version: bpe merges\n")
            for a, b in merges:
                f.write(f"{a} {b}\n")

    def encode_word(self, word: str) -> list[str]:
        return _apply_merges(list(_word_symbols(word)), self.ranks)

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in (text or "").split():
            out.extend(self.encode_word(w))
        return out

    def count_word(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(self.encode_word(word))
            if len(self._cache) < self._cache_size:
                self._cache[word] = n
        return n

    def count(self, text) -> int:
        if text is None:
            return 0
        return sum(self.count_word(w) for w in str(text).split())


def with_exact_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_exact",
) -> DataFrame:
    """Add the exact BPE token count of ``text_col`` as ``out_col``.

    The merges TABLE broadcasts (the encoder object rebuilds per
    executor from it — small, pickle-stable); encoding runs in ONE
    Arrow-batched ``mapInPandas`` pass with a per-executor word cache,
    no shuffle.  This is the deliberate Python path: built-ins cannot
    express the merge loop, and an Arrow batch per ~10k rows amortizes
    the crossing (the documented cost split vs the codegen regex
    count)."""
    sc = df.sparkSession.sparkContext
    b_merges = sc.broadcast(list(merges))
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())])

    def encode_batches(it):
        enc = BPEncoder(b_merges.value)
        for pdf in it:
            pdf[out_col] = [enc.count(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(encode_batches, schema)


# ---------------------------------------------------------------------------
# unigram-LM (SentencePiece-style) exact token counting — VERDICT r11 #6
# ---------------------------------------------------------------------------


class UnigramEncoder:
    """SentencePiece-style unigram language-model segmentation (Kudo
    2018, "Subword Regularization"): given a piece vocabulary with log
    probabilities, Viterbi-segment each word into its maximum-log-prob
    piece sequence.  Deterministic tie-break: on equal scores the LONGER
    last piece wins (then the lexicographically smaller one), so corpus
    and budget counts never depend on dict order.  Unknown single
    characters fall back to ``unk_logp`` so every word is segmentable —
    the SentencePiece UNK convention.  Pre-tokenization is whitespace
    splitting like :class:`BPEncoder` (no ``▁`` word-boundary marker:
    counts are per-word exact and words rejoin by construction)."""

    def __init__(self, vocab: dict[str, float], unk_logp: float = -20.0,
                 cache_size: int = 65536):
        if not vocab:
            raise ValueError("unigram vocab is empty")
        bad = [p for p, lp in vocab.items() if not p or lp > 0.0]
        if bad:
            raise ValueError(
                f"unigram vocab pieces must be non-empty with logprob <= 0: "
                f"{bad[:3]!r}")
        self.vocab = dict(vocab)
        self.unk_logp = float(unk_logp)
        self.max_len = max(len(p) for p in vocab)
        self._cache: dict[str, list[str]] = {}
        self._cache_size = cache_size

    def encode_word(self, word: str) -> list[str]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        n = len(word)
        NEG = float("-inf")
        # best[i] = (score, start_of_last_piece) for word[:i]
        best: list[tuple[float, int]] = [(NEG, -1)] * (n + 1)
        best[0] = (0.0, 0)
        for i in range(1, n + 1):
            bscore, bj = NEG, -1
            for j in range(max(0, i - self.max_len), i):
                prev = best[j][0]
                if prev == NEG:
                    continue
                piece = word[j:i]
                lp = self.vocab.get(piece)
                if lp is None:
                    if i - j > 1:
                        continue
                    lp = self.unk_logp
                score = prev + lp
                # strict > : among equal scores the SMALLEST j (longest
                # last piece) wins because j ascends and we keep the first
                if score > bscore:
                    bscore, bj = score, j
            best[i] = (bscore, bj)
        out: list[str] = []
        i = n
        while i > 0:
            j = best[i][1]
            out.append(word[j:i])
            i = j
        out.reverse()
        if len(self._cache) < self._cache_size:
            self._cache[word] = out
        return out

    def encode(self, text) -> list[str]:
        pieces: list[str] = []
        for w in str(text or "").split():
            pieces.extend(self.encode_word(w))
        return pieces

    def count(self, text) -> int:
        if text is None:
            return 0
        return sum(len(self.encode_word(w)) for w in str(text).split())


def learn_unigram(
    texts,
    vocab_size: int,
    max_piece_len: int = 8,
    em_rounds: int = 2,
) -> dict[str, float]:
    """Learn a unigram piece vocabulary with log probabilities —
    deliberately the SIMPLE hard-EM variant (real SentencePiece runs
    soft EM with forward-backward expectations and iterative pruning;
    this keeps the same interface and determinism for fixtures and
    reference corpora): seed with every substring up to
    ``max_piece_len`` weighted by frequency x length, then alternate
    Viterbi-segment (E) / re-estimate piece log-frequencies (M),
    pruning to ``vocab_size`` while ALWAYS keeping single characters
    (segmentability guarantee).  Deterministic: ties break on (count,
    piece) everywhere."""
    import math

    words = Counter()
    for t in texts:
        words.update(str(t or "").split())
    if not words:
        raise ValueError("empty corpus")
    chars = {c for w in words for c in w}
    cand: Counter = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            for L in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i:i + L]] += n
    # seed scores: frequency x length favors long reusable pieces
    seed = sorted(cand.items(),
                  key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    keep = {p for p, _ in seed[:max(vocab_size * 3, len(chars))]} | chars
    total = sum(cand[p] for p in keep)
    vocab = {p: math.log(cand[p] / total) for p in keep}
    for _ in range(max(em_rounds, 1)):
        enc = UnigramEncoder(vocab)
        use: Counter = Counter()
        for w, n in words.items():
            for piece in enc.encode_word(w):
                use[piece] += n
        ranked = sorted(use.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = [p for p, _ in ranked if p in vocab][:vocab_size]
        kept_set = set(kept) | chars
        tot = sum(use.get(p, 1) for p in kept_set)
        vocab = {p: math.log(use.get(p, 1) / tot) for p in kept_set}
    return vocab


def with_exact_unigram(
    df: DataFrame,
    vocab: dict[str, float],
    text_col: str = "text",
    out_col: str = "n_unigram_exact",
    unk_logp: float = -20.0,
) -> DataFrame:
    """Add the exact unigram-LM token count of ``text_col`` as
    ``out_col`` — the same scale shape as :func:`with_exact_bpe`: the
    vocab+logprob table broadcasts once (~100 KB), one executor-cached
    encoder, ONE Arrow-batched ``mapInPandas`` pass with the per-word
    LRU, no shuffle.  Same documented cost split: final budget
    accounting, not a hot-path gate."""
    sc = df.sparkSession.sparkContext
    b_vocab = sc.broadcast(dict(vocab))
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())])

    def encode_batches(it):
        enc = UnigramEncoder(b_vocab.value, unk_logp=unk_logp)
        for pdf in it:
            pdf[out_col] = [enc.count(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(encode_batches, schema)


# ---------------------------------------------------------------------------
# byte-level BPE (GPT-2 / tiktoken style) — round 13, VERDICT r12 #7
# ---------------------------------------------------------------------------


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's bijective byte↔unicode table (Radford et al. 2019; the
    public gpt-2 ``encoder.py`` convention every byte-level tokenizer
    since has reused): printable Latin-1 bytes map to themselves, the
    remaining bytes shift into codepoints 256+, so arbitrary binary
    round-trips through strings and merge rules stay printable text."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()


def _byte_symbols(word: str) -> tuple[str, ...]:
    """A word as its UTF-8 byte alphabet symbols — the byte-fallback
    property: EVERY string is segmentable from the 256-symbol base, so
    byte-level BPE has no UNK and no end-of-word marker (GPT-2 marks
    word starts with a leading-space byte instead; with the repo's
    whitespace pre-tokenization, word boundaries are already exact)."""
    return tuple(_B2U[b] for b in word.encode("utf-8"))


def learn_byte_bpe(texts, n_merges: int) -> list[tuple[str, str]]:
    """Byte-level twin of :func:`learn_bpe`: the same deterministic
    Sennrich merge loop over UTF-8 byte symbols (GPT-2's regime) —
    multi-byte UTF-8 characters start as 2-4 symbols and earn merges
    like any other frequent pair."""
    words = Counter()
    for t in texts:
        words.update(str(t or "").split())
    vocab: dict[tuple[str, ...], int] = {
        _byte_symbols(w): n for w, n in words.items()}
    return _learn_merges(vocab, n_merges)


class ByteBPEncoder(BPEncoder):
    """Apply a byte-level merges table.  Reuses :class:`BPEncoder`'s
    lowest-rank-first merge loop and LRU word cache; only the
    symbolization differs (UTF-8 bytes through the GPT-2 table, no
    end-of-word symbol).  ``decode`` inverts the byte table, so
    ``decode(encode_word(w)) == w`` for EVERY word — the byte-fallback
    guarantee char-BPE cannot make.  Whole-text round-trips are
    per-word only: the whitespace pre-tokenizer consumes separators, so
    ``decode(encode("a b"))`` is ``"ab"`` (counting, not
    reconstruction, is this module's contract)."""

    _U2B = {u: b for b, u in _B2U.items()}

    def encode_word(self, word: str) -> list[str]:
        return _apply_merges(list(_byte_symbols(word)), self.ranks)

    def decode(self, pieces: list[str]) -> str:
        data = bytes(self._U2B[u] for piece in pieces for u in piece)
        return data.decode("utf-8")


def with_exact_byte_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_byte_bpe_exact",
) -> DataFrame:
    """Add the exact byte-level BPE token count of ``text_col`` as
    ``out_col`` — the same scale shape as :func:`with_exact_bpe`: the
    merges table broadcasts once, one executor-cached encoder, ONE
    Arrow-batched ``mapInPandas`` pass with the per-word LRU, no
    shuffle.  The tokenizer family most published checkpoints budget
    with (GPT-2/tiktoken regime)."""
    sc = df.sparkSession.sparkContext
    b_merges = sc.broadcast(list(merges))
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())])

    def encode_batches(it):
        enc = ByteBPEncoder(b_merges.value)
        for pdf in it:
            pdf[out_col] = [enc.count(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(encode_batches, schema)
