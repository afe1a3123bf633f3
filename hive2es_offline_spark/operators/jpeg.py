"""Baseline JPEG codec (pure stdlib + numpy, public ITU-T T.81 spec).

Completes the multimodal pixel surface: PNG and GIF already decode for real
(``multimodal.decode_png_pixels`` / ``decode_gif_frames``); this module adds
baseline sequential DCT JPEG (SOF0) so ``extract_features`` /
``resize_images`` compute on REAL pixels for the dominant web image format
instead of refusing (``on_undecodable="null"``) or faking.

Scope — the baseline profile that covers the overwhelming majority of real
JPEGs:

* baseline sequential DCT (SOF0), 8-bit samples
* grayscale (1 component) and YCbCr (3 components)
* any sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0, 4:4:0)
* restart intervals (DRI / RSTn)

Progressive (SOF2), arithmetic coding, and 12-bit return None — the caller's
``on_undecodable`` policy decides what happens (never a silent fake).

The encoder exists for round-trip testing and resize re-encode: baseline,
4:4:4, standard Annex K quantization/Huffman tables.  Round-trip tests pair
it with analytic fixtures (solid-color images decode to exact DC values
independent of DCT convention) so encoder/decoder bugs can't cancel out.

Reference parity note: the reference system (hive2es-offline) has no image
path at all — this is engine surface for multimodal training data, cited as
an extension in SURVEY.md §2.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

#: zigzag order: index i of the scan -> (row, col) flat index in the 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: standard luminance / chrominance quantization tables (Annex K, quality 50)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables (Annex K): (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: C[u, x] = a(u) cos((2x+1)uπ/16).
    Forward block transform = C @ f @ C.T; inverse = C.T @ F @ C."""
    x = np.arange(8)
    u = x[:, None]
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5  # a(u): sqrt(1/8) for u=0, sqrt(2/8) otherwise


_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical JPEG code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code)."""
    return {v: k for k, v in _build_decode_table(bits, values).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; restart markers are handled by the caller via ``sync``."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return self.nbits > 0  # restart marker: stop at boundary
                else:
                    return self.nbits > 0  # EOI / next segment
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8
        return True

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            before = self.nbits
            self._fill()
            if self.nbits == before:
                raise ValueError("truncated entropy stream")
        self.nbits -= n
        out = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return out

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Drop partial bits and consume one RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _extend(value: int, nbits: int) -> int:
    """JPEG signed magnitude extension (spec F.2.2.1)."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG to an ``np.ndarray[h, w, 3]`` uint8 RGB image
    (grayscale replicates into 3 channels, matching the PNG decoder's
    contract).  Returns None for non-JPEG or unsupported profiles
    (progressive/arithmetic/12-bit) — the caller's ``on_undecodable``
    policy takes over, never a fake."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — skip them or a legal file mis-parses as a bogus segment
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    q = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = q  # de-zigzag
                qtables[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) would silently decode its
                # first 3 planes as YCbCr — wrong colors marked "ok"; refuse
                # so the caller's on_undecodable policy applies instead
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical: unsupported
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0x0F})
            return _decode_scan(
                data, pos + seglen, frame, scan, qtables, htables, restart_interval
            )
        pos += seglen
    return None


def _decode_scan(data, start, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
    reader = _BitReader(data, start)
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                dc_tbl = htables[(0, c["dc"])]
                ac_tbl = htables[(1, c["ac"])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.read_bits(t), t)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coef  # de-zigzag
                        blk = block.reshape(8, 8) * q
                        pix = _C.T @ blk @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample each plane to full MCU-padded resolution, then crop
    full = []
    for c in scan:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the color path — truncation would bias every
        # grayscale sample down by ~0.5 LSB
        y = np.clip(full[0], 0, 255).round()
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, standard tables) — for tests and resize re-encode
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _encode_block(bw, block, q, dc_enc, ac_enc, pred):
    coef = _C @ (block - 128.0) @ _C.T
    quant = np.round(coef / q).astype(np.int32)
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    mag = abs(diff)
    nbits = mag.bit_length()
    length, code = dc_enc[nbits]
    bw.write(code, length)
    if nbits:
        bw.write(diff if diff >= 0 else diff + (1 << nbits) - 1, nbits)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run > 15:
            length, code = ac_enc[0xF0]
            bw.write(code, length)  # ZRL
            run -= 16
        v = int(zz[k])
        mag = abs(v)
        nbits = mag.bit_length()
        length, code = ac_enc[(run << 4) | nbits]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << nbits) - 1, nbits)
        k += 1
    if last_nz < 63:
        length, code = ac_enc[0x00]
        bw.write(code, length)  # EOB
    return int(zz[0])


def _pad_plane(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    padded = np.empty((ph, pw))
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """Encode ``np.ndarray[h, w]`` uint8 grayscale as a 1-component baseline
    JPEG (luma tables only) — exists so the decoder's grayscale path is
    round-trip-testable without third-party encoders."""
    img = np.ascontiguousarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = _pad_plane(img, ph, pw)
    lq = STD_LUMA_Q.reshape(8, 8)
    dc_enc = _build_encode_table(*STD_DC_LUMA)
    ac_enc = _build_encode_table(*STD_AC_LUMA)
    out = bytearray(b"\xFF\xD8")
    zz = STD_LUMA_Q.reshape(-1)[ZIGZAG].astype(np.uint8)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + zz.tobytes()
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for tc_th, (bits, values) in (((0x00,), STD_DC_LUMA), ((0x10,), STD_AC_LUMA)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values))
        out += bytes(tc_th) + bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3F\x00"
    bw = _BitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            pred = _encode_block(bw, blk, lq, dc_enc, ac_enc, pred)
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg(
    img: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode ``np.ndarray[h, w, 3]`` uint8 RGB as a baseline JPEG with the
    standard Annex K tables (≈quality 50).  ``subsampling`` is ``"444"``
    (1x1 chroma) or ``"420"`` (2x2 luma MCUs, box-filtered chroma — the
    dominant real-world layout); ``restart_interval`` > 0 emits DRI/RSTn
    every N MCUs.  Both exist so the decoder's subsampled and restart
    paths are testable without third-party encoders."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    img = np.ascontiguousarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    luma_hv = (2, 2) if subsampling == "420" else (1, 1)
    mcu_px = 8 * luma_hv[0]
    mcux, mcuy = -(-w // mcu_px), -(-h // mcu_px)
    yp = _pad_plane(y, mcuy * 8 * luma_hv[1], mcux * 8 * luma_hv[0])
    if subsampling == "420":
        # box-filter downsample on the padded plane (even dims guaranteed)
        cbp = _pad_plane(cb, mcuy * 16, mcux * 16)
        crp = _pad_plane(cr, mcuy * 16, mcux * 16)
        cbp = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp = _pad_plane(cb, mcuy * 8, mcux * 8)
        crp = _pad_plane(cr, mcuy * 8, mcux * 8)
    lq, cq = STD_LUMA_Q.reshape(8, 8), STD_CHROMA_Q.reshape(8, 8)
    comps = [
        (yp, luma_hv, lq, _build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_AC_LUMA)),
        (cbp, (1, 1), cq, _build_encode_table(*STD_DC_CHROMA), _build_encode_table(*STD_AC_CHROMA)),
        (crp, (1, 1), cq, _build_encode_table(*STD_DC_CHROMA), _build_encode_table(*STD_AC_CHROMA)),
    ]

    out = bytearray(b"\xFF\xD8")  # SOI
    for tq, q in ((0, STD_LUMA_Q), (1, STD_CHROMA_Q)):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (hs, vs), tq in ((1, luma_hv, 0), (2, (1, 1), 1), (3, (1, 1), 1)):
        out += bytes([cid, (hs << 4) | vs, tq])
    for tc_th, (bits, values) in (
        ((0x00,), STD_DC_LUMA), ((0x10,), STD_AC_LUMA),
        ((0x01,), STD_DC_CHROMA), ((0x11,), STD_AC_CHROMA),
    ):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values))
        out += bytes(tc_th) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tt])
    out += b"\x00\x3F\x00"  # Ss=0 Se=63 Ah/Al=0
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0, 0, 0]
            for ci, (plane, (hs, vs), q, dc_enc, ac_enc) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(bw, blk, q, dc_enc, ac_enc, preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
