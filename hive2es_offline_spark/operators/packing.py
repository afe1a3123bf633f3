"""Sequence packing: group documents into fixed token-budget bins.

Training pipelines pack short documents together so every training sequence
fills the context window (otherwise padding burns FLOPs).  Exact bin
packing is NP-hard and inherently sequential, so the scalable shape is
greedy first-fit INSIDE each partition over a stream of
sorted-descending documents (first-fit-decreasing, the classic 11/9·OPT
heuristic), with a bounded number of open bins so memory is O(max_open),
not O(partition).

Per-partition packing wastes at most one partial bin per partition versus
a global pack — negligible at real partition counts — and keeps the
operator embarrassingly parallel: no shuffle beyond the initial
sort-within-partitions, no driver involvement, deterministic output for a
deterministic input partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "pack_id long, doc_ids array<long>, n_docs int, total_tokens long, fill_ratio double"
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    max_open_bins: int = 1000,
) -> DataFrame:
    """Pack (id, token_count) rows into bins of at most ``budget`` tokens.

    First-fit-decreasing per partition, Arrow-batched.  Documents larger
    than the budget are emitted as single-doc over-budget packs (the caller
    decides whether to truncate or split them — see
    ``text.chunk_documents``).  ``pack_id`` is partition-prefixed so ids
    are globally unique without coordination.
    """
    import pandas as pd
    from pyspark import TaskContext

    work = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(token_col).cast("long").alias("_n"),
    ).sortWithinPartitions(F.col("_n").desc(), F.col("_id"))

    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        open_bins: list[list] = []  # [remaining, ids, total]
        done: list[tuple] = []

        def close(b) -> None:
            done.append((b[1], b[2]))

        for pdf in batches:
            for did, n in zip(pdf["_id"], pdf["_n"]):
                did, n = int(did), int(n)
                if n >= budget:
                    done.append(([did], n))  # over/exact budget: own pack
                    continue
                placed = False
                for b in open_bins:
                    if b[0] >= n:
                        b[0] -= n
                        b[1].append(did)
                        b[2] += n
                        placed = True
                        if b[0] == 0:
                            open_bins.remove(b)
                            close(b)
                        break
                if not placed:
                    if len(open_bins) >= max_open_bins:
                        # evict the fullest open bin (least remaining):
                        # it is the least likely to ever fit another doc
                        fullest = min(open_bins, key=lambda b: b[0])
                        open_bins.remove(fullest)
                        close(fullest)
                    open_bins.append([budget - n, [did], n])
        for b in open_bins:
            close(b)
        if not done:  # empty partition: emit nothing (an empty frame's
            return    # untyped doc_ids column breaks Arrow list conversion)
        yield pd.DataFrame(
            {
                "pack_id": [pid * 1_000_000_000 + i for i in range(len(done))],
                "doc_ids": [ids for ids, _ in done],
                "n_docs": [len(ids) for ids, _ in done],
                "total_tokens": [t for _, t in done],
                "fill_ratio": [round(t / budget, 4) for _, t in done],
            }
        )

    return work.mapInPandas(pack, PACKED_SCHEMA)
