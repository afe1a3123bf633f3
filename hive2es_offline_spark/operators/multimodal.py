"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real pipelines carry image/audio/video as binary columns next to typed
metadata, and decode/feature-extract with Arrow-batched Python
(``mapInPandas``) because codecs don't live in the JVM.
``decode_image_meta`` parses PNG/JPEG/GIF/WebP dimensions for REAL from
the header bytes (``parse_image_header``); pixel paths are REAL codecs
for PNG (``decode_png_pixels``/``encode_png``: zlib + filter
reconstruction per the PNG spec), GIF (``decode_gif_frames``/
``encode_gif``: variable-width LZW, color tables, interlace, frame
compositing per GIF89a) and JPEG (``jpeg.decode_jpeg_pixels``: baseline
AND progressive DCT incl. successive approximation, ITU-T T.81) — resize
and featurize operate on actual pixels for all three.  Payloads with no
pixel decoder (WebP, CMYK JPEG, video containers, unknown) follow the
``on_undecodable``/``frame_status`` policies: NULL plus a reason by
default, fakes only on request.  The Spark-side plumbing (schema, batch
iterator shape, partitioning, column pruning through mapInPandas) is
real and tested throughout.

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
    "doc_id long, n_bytes int, sha1 string, width int, height int, "
    "format string, decode_status string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary column from text (test stand-in for a real
    image/audio payload column)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload"))


def with_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL (decodable) PNG payload per row, deterministically
    derived from the id — a harness stand-in for an actual image column
    that, unlike ``with_binary_payload``, exercises the genuine pixel path
    (header parse succeeds, ``decode_png_pixels`` round-trips).  Sizes and
    pixel patterns vary by id so downstream features differ per doc."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                h, w = 8 + did % 5, 8 + (did // 5) % 5
                px = ((np.arange(h * w * 3) * (did % 251 + 1)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(F.col(id_col)).mapInPandas(
        synth, f"{id_col} long, payload binary"
    )


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """REAL (pure-stdlib) image dimension parse from header bytes for the
    common container formats — no codec library needed:

    * PNG: 8-byte magic, then the IHDR chunk carries width/height as
      big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
    * JPEG: scan marker segments for a start-of-frame marker (SOF0-15 minus
      DHT/JPG/DAA); height/width are big-endian u16 at segment offset +3/+5
      (ITU T.81 §B.2.2).
    * GIF: 6-byte signature, then logical-screen width/height as
      little-endian u16 (GIF89a spec §18).
    * WebP: RIFF container; dims from the first chunk by flavor — VP8
      (lossy: u14 LE at frame-header +6 after the 3-byte start code), VP8L
      (lossless: 14+14 bits packed LE after the 0x2F signature byte), VP8X
      (extended: u24 LE canvas-minus-one at +4/+7) (public WebP container
      and VP8/VP8L bitstream specs).

    Returns None for anything unrecognized (the caller's ``on_undecodable``
    policy decides what happens)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return w, h, "png"
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return w, h, "jpeg"
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return w, h, "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP" and len(payload) >= 30:
        chunk = payload[12:16]
        if chunk == b"VP8 ":
            # lossy: 3-byte frame tag, 3-byte start code 9D 01 2A, then
            # 14-bit width/height (little-endian u16, low 14 bits)
            if payload[23:26] == b"\x9d\x01\x2a":
                w = int.from_bytes(payload[26:28], "little") & 0x3FFF
                h = int.from_bytes(payload[28:30], "little") & 0x3FFF
                return w, h, "webp"
        elif chunk == b"VP8L":
            if payload[20] == 0x2F:
                bits = int.from_bytes(payload[21:25], "little")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                return w, h, "webp"
        elif chunk == b"VP8X":
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return w, h, "webp"
        return None
    return None


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decode — pure stdlib (zlib) + numpy, no codec lib.

    Supports 8-bit grayscale/RGB/RGBA, non-interlaced, all five PNG filter
    types (None/Sub/Up/Average/Paeth, spec §9).  Returns an
    ``np.ndarray[h, w, channels]`` (uint8) or None for unsupported/other
    formats.  Filters Sub/Average/Paeth carry a left-pixel dependency, so
    those rows reconstruct byte-sequentially — fine for thumbnails and
    tests; wire PIL/opencv here for production-size rasters.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    width = height = color_type = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                return None
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        return None
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    bpp = channels  # bytes per pixel at bit depth 8
    stride = width * channels
    raw = zlib.decompress(idat)
    if len(raw) < height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up (uint8 addition wraps mod 256, per spec)
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left dependency
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def encode_png(arr) -> bytes:
    """REAL PNG encode (filter 0 rows, one zlib IDAT) for an
    ``np.ndarray[h, w, channels]`` uint8 array — the write half of the
    stdlib codec, so resize/re-encode round-trips without any image
    library."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-flavor LZW decode (spec appendix F): variable code width starting
    at ``min_code_size + 1``, growing to 12 bits, little-endian bit packing,
    clear/end control codes, and the KwKwK self-reference case.  Returns the
    color-index stream, truncated/padded semantics left to the caller."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    stream = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    pos = 0
    while pos + code_size <= total_bits and len(out) < expected:
        code = (stream >> pos) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code:  # KwKwK: code defined by this very step
            entry = prev + prev[:1]
            if next_code < 4096:
                table[next_code] = entry
                next_code += 1
        else:
            break  # corrupt stream
        out += entry
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW encode — the exact inverse of ``_lzw_decode``
    (emit-then-define order, so the encoder bumps its code width one step
    after the decoder's next_code would)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    acc = 0
    nbits = 0
    buf = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for ch in indices:
        if ch >= clear:
            raise ValueError(f"index {ch} needs more than {min_code_size} bits")
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # decoder defines this entry one code LATER, so its width grows one
        # emission after ours would naively: bump at threshold + 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4096:  # table full: reset both sides
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


#: interlaced GIFs store rows in four passes (spec §20)
_GIF_INTERLACE_PASSES = ((8, 0), (8, 4), (4, 2), (2, 1))


def _gif_interlace_order(height: int) -> list[int]:
    return [row for step, off in _GIF_INTERLACE_PASSES for row in range(off, height, step)]


def decode_gif_frames(payload: bytes):
    """REAL GIF pixel decode — pure stdlib LZW + numpy, no codec lib.

    Handles global/local color tables, multiple frames with canvas
    compositing (disposal: leave / restore-background / restore-previous),
    per-frame transparency, and interlaced images.  Returns a list of
    ``np.ndarray[h, w, 3]`` uint8 RGB canvases (one per rendered frame) or
    None for non-GIF/corrupt payloads."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    frames: list = []
    transparent: int | None = None
    disposal = 0
    try:
        while pos < len(payload):
            block = payload[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: GCE carries disposal/transparency
                label = payload[pos + 1]
                pos += 2
                if label == 0xF9:
                    flags = payload[pos + 1]
                    disposal = (flags >> 2) & 7
                    transparent = payload[pos + 4] if flags & 1 else None
                while payload[pos] != 0:  # skip sub-blocks (incl. GCE body)
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if block != 0x2C:  # unknown block: stop cleanly
                break
            left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
            top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
            w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            ipacked = payload[pos + 9]
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 ** ((ipacked & 7) + 1)
                table = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if table is None:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                size = payload[pos]
                data += payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            raw = _lzw_decode(bytes(data), min_code, w * h)
            if len(raw) < w * h:
                return None
            idx = np.frombuffer(raw, np.uint8).reshape(h, w)
            if ipacked & 0x40:  # interlaced: data rows are in pass order
                deinterlaced = np.empty_like(idx)
                deinterlaced[_gif_interlace_order(h)] = idx
                idx = deinterlaced
            before = canvas.copy()
            region = canvas[top : top + h, left : left + w]
            rgb = table[np.minimum(idx, len(table) - 1)]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore background
                canvas[top : top + h, left : left + w] = (
                    gct[bg_index] if gct is not None and bg_index < len(gct) else 0
                )
            elif disposal == 3:  # restore previous
                canvas = before
            transparent, disposal = None, 0
    except (IndexError, ValueError):  # truncated payload or out-of-canvas frame rect
        return frames or None
    return frames or None


def encode_gif(frames, delay_cs: int = 10, interlace: bool = False) -> bytes:
    """REAL GIF89a encode (global palette, real LZW) for a list of same-size
    ``np.ndarray[h, w, 3]`` uint8 frames — the write half of the stdlib GIF
    codec, so decode/resize round-trips stay GIFs.  The palette is the set
    of distinct colors across frames (> 256 raises — quantization is a
    production concern, not a codec one)."""
    import struct

    import numpy as np

    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if len(colors) > 256:
        raise ValueError(f"encode_gif needs <=256 distinct colors, got {len(colors)}")
    bits = max(1, (len(colors) - 1).bit_length())
    palette = np.zeros((1 << bits, 3), np.uint8)
    palette[: len(colors)] = colors
    lookup = {tuple(int(x) for x in c): i for i, c in enumerate(colors)}
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += palette.tobytes()
    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0)  # GCE
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        rows = frame[_gif_interlace_order(h)] if interlace else frame
        idx = bytes(lookup[tuple(int(x) for x in px)] for px in rows.reshape(-1, 3))
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


#: valid ``on_undecodable`` policies for the pixel/meta operators
_UNDECODABLE_POLICIES = ("null", "fake", "raise")


def _check_policy(on_undecodable: str) -> None:
    if on_undecodable not in _UNDECODABLE_POLICIES:
        raise ValueError(
            f"on_undecodable must be one of {_UNDECODABLE_POLICIES}, "
            f"got {on_undecodable!r}"
        )


def _fake_decode(payload: bytes) -> tuple[str, int, int, str]:
    """Decode with REAL header parsing for PNG/JPEG/GIF (see
    ``parse_image_header``); unrecognized payloads fall back to a
    deterministic stand-in whose dimensions derive from the content hash so
    tests are stable.  Reached only under ``on_undecodable="fake"`` — the
    default policy ("null") never fabricates values.
    """
    sha = hashlib.sha1(payload).hexdigest()
    parsed = parse_image_header(payload)
    if parsed is not None:
        return sha, parsed[0], parsed[1], parsed[2]
    width = 64 + int(sha[:4], 16) % 1024
    height = 64 + int(sha[4:8], 16) % 1024
    fmt = ["png", "jpeg", "webp"][int(sha[8:10], 16) % 3]
    return sha, width, height, fmt


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_undecodable: str = "null",
) -> DataFrame:
    """Arrow-batched decode: binary payload -> typed metadata row.

    The canonical multimodal operator shape — header metadata (PNG/JPEG/GIF
    dimensions) is parsed for real from the binary bytes.  Unrecognized
    formats follow ``on_undecodable``: ``"null"`` (default) emits NULL
    width/height/format plus a ``decode_status`` reason, so fabricated
    metadata can never silently flow downstream; ``"fake"`` opts into the
    deterministic content-hash stand-in (status ``"fake"``); ``"raise"``
    fails the job on the first unrecognized payload.
    """
    _check_policy(on_undecodable)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, sha1s = [], []
            widths, heights, fmts, status = [], [], [], []
            for p in pdf[payload_col]:
                raw = bytes(p)  # materialize ONCE per payload
                n_bytes.append(len(raw))
                sha1s.append(hashlib.sha1(raw).hexdigest())
                parsed = parse_image_header(raw)
                if parsed is not None:
                    widths.append(parsed[0])
                    heights.append(parsed[1])
                    fmts.append(parsed[2])
                    status.append("ok")
                elif on_undecodable == "fake":
                    _, w, h, f = _fake_decode(raw)
                    widths.append(w)
                    heights.append(h)
                    fmts.append(f)
                    status.append("fake")
                elif on_undecodable == "raise":
                    raise NotImplementedError(
                        "unrecognized image payload (no PNG/JPEG/GIF header); "
                        "on_undecodable='raise' requested strict behavior"
                    )
                else:
                    widths.append(None)
                    heights.append(None)
                    fmts.append(None)
                    status.append("undecodable")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "sha1": sha1s,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "format": fmts,
                    "decode_status": status,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_META_SCHEMA)


FEATURE_SCHEMA = "doc_id long, feature array<float>, decode_status string"


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 16,
    on_undecodable: str = "null",
) -> DataFrame:
    """Binary payload -> dense feature vector (Arrow-batched).

    The histogram is computed over REAL decoded pixel values for PNG
    (``decode_png_pixels``), GIF (every frame, ``decode_gif_frames``) and
    baseline AND progressive JPEG (``jpeg.decode_jpeg_pixels`` —
    stdlib+numpy ITU-T T.81 incl. successive approximation).  Payloads
    with no pixel decoder (WebP, CMYK JPEG, unknown) follow
    ``on_undecodable``: ``"null"`` (default) emits a NULL
    feature plus a ``decode_status`` reason — a quality filter computed on
    fabricated pixels is garbage, so fakes must be asked for, never
    defaulted into; ``"fake"`` opts into the deterministic byte-histogram
    stand-in (status ``"fake"``); ``"raise"`` fails the job.  Output shape
    matches the ``embeddings`` table convention (``array<float>``) so the
    similarity operators compose directly: decode -> features ->
    ``cosine_topk`` / ``cosine_self_pairs``.
    """
    _check_policy(on_undecodable)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def hist_of(arr):
            if len(arr) == 0:
                return [0.0] * dim
            h = np.bincount(arr % dim, minlength=dim).astype("float32")
            return (h / max(len(arr), 1)).tolist()

        from .jpeg import decode_jpeg_pixels

        for pdf in batches:
            feats, status = [], []
            for p in pdf[payload_col]:
                raw = bytes(p)
                pixels = decode_png_pixels(raw)
                if pixels is None:
                    gif = decode_gif_frames(raw)
                    if gif is not None:
                        pixels = np.concatenate([f.reshape(-1) for f in gif])
                if pixels is None:
                    pixels = decode_jpeg_pixels(raw)  # REAL baseline decoder
                if pixels is not None:
                    feats.append(hist_of(pixels.reshape(-1)))
                    status.append("ok")
                elif on_undecodable == "fake":
                    feats.append(hist_of(np.frombuffer(raw, dtype=np.uint8)))
                    status.append("fake")
                elif on_undecodable == "raise":
                    raise NotImplementedError(
                        "no pixel decoder for payload (JPEG/WebP/unknown); "
                        "on_undecodable='raise' requested strict behavior"
                    )
                else:
                    feats.append(None)
                    status.append("undecodable")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(featurize, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, payload binary, decode_status string"
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_undecodable: str = "null",
) -> DataFrame:
    """Binary image -> resized binary image (Arrow-batched).

    PNG payloads are REALLY resized: decode (``decode_png_pixels``) ->
    nearest-neighbor resample (numpy index grid) -> re-encode
    (``encode_png``), so the output is a valid PNG at the target size.
    GIFs resize every frame and re-encode as GIF (``decode_gif_frames`` /
    ``encode_gif``) — format-preserving, animation included.  Baseline
    and progressive JPEGs decode/resample/re-encode through the real
    codec (``jpeg.decode_jpeg_pixels`` / ``jpeg.encode_jpeg``; output is
    baseline).  Formats with no pixel decoder (WebP, CMYK JPEG, unknown)
    follow ``on_undecodable``: ``"null"``
    (default) emits a NULL payload plus a ``decode_status`` reason;
    ``"fake"`` opts into the byte-budget stub (status ``"fake"``; a
    production path swaps in PIL/opencv); ``"raise"`` fails the job.
    """
    _check_policy(on_undecodable)
    budget = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def resample(pixels):
            h, w = pixels.shape[:2]
            ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
            xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
            return pixels[ys][:, xs]

        from .jpeg import decode_jpeg_pixels, encode_jpeg

        for pdf in batches:
            out, status = [], []
            for p in pdf[payload_col]:
                raw = bytes(p)
                pixels = decode_png_pixels(raw)
                if pixels is not None:
                    out.append(encode_png(resample(pixels)))
                    status.append("ok")
                    continue
                gif = decode_gif_frames(raw)
                jpg = None if gif is not None else decode_jpeg_pixels(raw)
                if gif is not None:
                    out.append(encode_gif([resample(f) for f in gif]))
                    status.append("ok")
                elif jpg is not None:
                    # format-preserving: decode -> resample -> re-encode JPEG
                    out.append(encode_jpeg(resample(jpg)))
                    status.append("ok")
                elif on_undecodable == "fake":
                    out.append(raw[:budget].ljust(budget, b"\0"))
                    status.append("fake")
                elif on_undecodable == "raise":
                    raise NotImplementedError(
                        "no pixel decoder for payload (JPEG/unknown); "
                        "on_undecodable='raise' requested strict behavior"
                    )
                else:
                    out.append(None)
                    status.append("undecodable")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                    "decode_status": status,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_index int, frame binary, frame_status string"


def sample_frames(
    df: DataFrame,
    num_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Moving-image payload -> N evenly-spaced frames (one output row per
    frame — a flatMap-shaped mapInPandas; output batches are
    ``num_frames`` x input rows).

    Animated GIFs sample REAL frames: ``decode_gif_frames`` decodes the
    whole animation, N evenly-spaced frames are picked, and each is
    re-encoded as a standalone PNG (``frame_status="ok"``) — a valid image
    per row, ready for ``extract_features``/``resize_images``.  Payloads
    with no frame decoder (video containers — a production path seeks with
    pyav/ffmpeg) fall back to even-offset byte slices, loudly marked
    ``frame_status="byte_slice"`` so fabricated frames can never pass as
    decoded media downstream.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, frames, status = [], [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                gif = decode_gif_frames(raw)
                if gif is not None and len(gif) > 0:
                    # evenly-spaced REAL frames (repeats when the clip is
                    # shorter than num_frames — fixed output arity)
                    picks = np.linspace(0, len(gif) - 1, num_frames).round().astype(int)
                    for i, fi in enumerate(picks):
                        ids.append(int(did))
                        idxs.append(i)
                        frames.append(encode_png(gif[fi]))
                        status.append("ok")
                    continue
                step = max(len(raw) // num_frames, 1)
                for i in range(num_frames):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(raw[i * step : (i + 1) * step])
                    status.append("byte_slice")
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "frame": frames,
                 "frame_status": status}
            )

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)


DHASH_SCHEMA = "doc_id long, dhash long, decode_status string"


def dhash64(pixels) -> int:
    """64-bit difference hash (dHash) of a decoded pixel array: luma
    grayscale → block-MEAN thumbnails (area averaging, not point
    sampling, so single-pixel codec noise — JPEG quality changes,
    PNG↔JPEG re-encodes — averages out) → 32 HORIZONTAL gradient bits
    (4×9 grid, set when the right neighbor is brighter) followed by 32
    VERTICAL gradient bits (9×4 grid, set when the lower neighbor is
    brighter).  The classic dHash is horizontal-only, which hashes every
    vertically-striped image to the same value as a solid color — the
    combined variant keeps both axes distinctive at the same 64-bit
    budget.  Returned as a SIGNED 64-bit int so the value fits a Spark
    ``long`` column (bit patterns unchanged; hamming via
    ``bit_count(a ^ b)`` is sign-agnostic)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim == 3:
        if arr.shape[2] >= 3:
            g = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                 + 0.114 * arr[:, :, 2])
        else:
            g = arr[:, :, 0]
    else:
        g = arr
    h, w = g.shape

    def block_means(rows: int, cols: int):
        cells = np.empty((rows, cols))
        for i in range(rows):
            # block bounds; for images smaller than the grid the block
            # degenerates to one (repeated) pixel row/column, never empty
            y0 = (i * h) // rows
            y1 = max(((i + 1) * h) // rows, y0 + 1)
            for j in range(cols):
                x0 = (j * w) // cols
                x1 = max(((j + 1) * w) // cols, x0 + 1)
                cells[i, j] = g[y0:y1, x0:x1].mean()
        return cells

    ch = block_means(4, 9)
    cv = block_means(9, 4)
    import itertools
    v = 0
    for bit in itertools.chain((ch[:, 1:] > ch[:, :-1]).flatten(),
                               (cv[1:, :] > cv[:-1, :]).flatten()):
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, 64-bit perceptual dHash, decode_status) per image payload —
    one Arrow-batched ``mapInPandas`` pass through the real stdlib codecs
    (PNG / first GIF frame / baseline+progressive JPEG).  Payloads with
    no pixel decoder emit a NULL hash with ``decode_status
    "undecodable"`` (the anti-fake policy: a fabricated hash could
    cluster unrelated images).  The projection keeps only (id, payload),
    so the scan prunes every other column before the payload bytes move.
    """

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg_pixels

        for pdf in batches:
            hashes: list[int | None] = []
            status: list[str] = []
            for p in pdf[payload_col]:
                raw = bytes(p) if p is not None else b""
                pixels = decode_png_pixels(raw)
                if pixels is None:
                    frames = decode_gif_frames(raw)
                    pixels = (frames[0] if frames else
                              decode_jpeg_pixels(raw))
                if pixels is None:
                    hashes.append(None)
                    status.append("undecodable")
                else:
                    hashes.append(dhash64(pixels))
                    status.append("ok")
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "dhash": pd.array(hashes, dtype="Int64"),
                "decode_status": status,
            })

    return df.select(id_col, payload_col).mapInPandas(
        hash_batches, DHASH_SCHEMA)
