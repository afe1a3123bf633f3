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

__all__ = ["learn_bpe", "BPEncoder", "with_exact_bpe"]

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
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge every occurrence of the winning pair in one pass
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
