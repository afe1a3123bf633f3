"""Shared RIFF container primitives (WAV = RIFF/WAVE, AVI = RIFF/AVI )."""

from __future__ import annotations

import struct
from collections.abc import Iterator

__all__ = ["walk_chunks"]


def walk_chunks(buf: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(chunk_id, body_start, body_end)`` for each RIFF chunk in
    ``buf[pos:end]``: 4-byte id, little-endian u32 size, word-aligned
    advance, body clamped to ``end`` for truncated files."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (csize,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        yield cid, pos + 8, min(pos + 8 + csize, end)
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
