"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real pipelines carry image/audio/video as binary columns next to typed
metadata, and decode/feature-extract with Arrow-batched Python
(``mapInPandas``) because codecs don't live in the JVM.  The decode libs are
not in this container, so ``decode_image_meta`` is a clearly-marked
deterministic fake — but the Spark-side plumbing (schema, batch iterator
shape, partitioning, column pruning through mapInPandas) is real and tested.

Scale notes: binary payloads dominate row size, so (a) the mapInPandas
schema declares only the columns the stage needs — Spark prunes the rest of
the scan; (b) batches stream through the Python worker (iterator in/out),
never materializing a partition; (c) downstream ops should immediately drop
the payload column and keep the extracted features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes int, sha1 string, width int, height int, format string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary column from text (test stand-in for a real
    image/audio payload column)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload"))


def _fake_decode(payload: bytes) -> tuple[str, int, int, str]:
    """Deterministic stand-in for an image decoder.

    A real implementation opens the bytes with PIL/ffmpeg; stub dimensions
    are derived from the content hash so tests are stable.  Raise instead if
    strict behavior is wanted: ``raise NotImplementedError``.
    """
    sha = hashlib.sha1(payload).hexdigest()
    width = 64 + int(sha[:4], 16) % 1024
    height = 64 + int(sha[4:8], 16) % 1024
    fmt = ["png", "jpeg", "webp"][int(sha[8:10], 16) % 3]
    return sha, width, height, fmt


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode: binary payload -> typed metadata row.

    The canonical multimodal operator shape — swap ``_fake_decode`` for a
    real codec and the plan/schema/partitioning are unchanged.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "sha1": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "format": [m[3] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_META_SCHEMA)
