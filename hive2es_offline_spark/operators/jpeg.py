"""Baseline JPEG codec (pure stdlib + numpy, public ITU-T T.81 spec).

Completes the multimodal pixel surface: PNG and GIF already decode for real
(``multimodal.decode_png_pixels`` / ``decode_gif_frames``); this module adds
baseline sequential DCT JPEG (SOF0) so ``extract_features`` /
``resize_images`` compute on REAL pixels for the dominant web image format
instead of refusing (``on_undecodable="null"``) or faking.

Scope — the two DCT profiles that cover essentially all real JPEGs:

* baseline sequential DCT (SOF0), 8-bit samples
* PROGRESSIVE DCT (SOF2): spectral selection AND successive approximation
  (T.81 F.2/G.1 — DC/AC first passes, DC/AC refinement with EOB-run
  correction bits), interleaved DC + non-interleaved AC scans
* grayscale (1 component) and YCbCr (3 components)
* any sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0, 4:4:0)
* restart intervals (DRI / RSTn)

Arithmetic coding, 12-bit, lossless/hierarchical, and 4-component CMYK
return None — the caller's ``on_undecodable`` policy decides what happens
(never a silent fake).

The encoders exist for round-trip testing and resize re-encode: baseline
(``encode_jpeg``/``encode_jpeg_gray``, Annex K tables) and progressive
(``encode_jpeg_progressive``, with and without successive approximation).
Round-trip tests pair them with analytic fixtures (solid colors are
DC-only: exact decode independent of DCT convention) and with the
baseline path as an independent oracle — a progressive file built from the
same quantized coefficients must decode bit-identical to its baseline
encoding, so mirrored encoder/decoder bugs can't cancel out.

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
    """Decode a JPEG to an ``np.ndarray[h, w, 3]`` uint8 RGB image
    (grayscale replicates into 3 channels, matching the PNG decoder's
    contract).  Baseline SOF0/SOF1 (interleaved or one-SOS-per-component)
    and progressive SOF2 (spectral selection + successive approximation)
    are fully decoded.  Returns None for non-JPEG input or the genuinely
    unsupported profiles — arithmetic coding, 12-bit precision,
    lossless/hierarchical, 4-component (CMYK/YCCK) — so the caller's
    ``on_undecodable`` policy takes over, never a fake."""
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
    coef_store: dict[int, np.ndarray] | None = None
    scanned_comps: set[int] = set()  # component ids covered by baseline scans
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            # per-component coefficient store over the MCU-padded block
            # grid, accumulated across scans.  Both profiles use it:
            # progressive by definition, and baseline because T.81 allows
            # one SOS per component (non-interleaved) — returning after the
            # first scan would ship the Y plane alone as gray RGB marked ok
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            coef_store = {
                c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical: unsupported
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
            if not frame["progressive"]:
                end = _decode_baseline_scan(
                    data, pos + seglen, frame, scan, htables, restart_interval,
                    coef_store,
                )
                scanned_comps.update(c["id"] for c in scan)
            else:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
                end = _decode_progressive_scan(
                    data, pos + seglen, frame, scan, htables, restart_interval,
                    coef_store, ss, se, ah, al,
                )
            # resume the marker walk at the next marker after the scan data
            pos = end
            continue
        pos += seglen
    if frame is None or coef_store is None:
        return None
    if not frame["progressive"] and scanned_comps != {
        c["id"] for c in frame["comps"]
    }:
        # baseline frame whose scans never covered every declared component
        # (truncated / corrupt): refuse rather than render missing planes
        # as flat gray
        return None
    return _reconstruct(frame, qtables, coef_store)


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker's 0xFF at/after ``pos`` (skipping
    entropy bytes, 0xFF00 stuffing, fill bytes, and RSTn)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _decode_progressive_scan(
    data, start, frame, scan, htables, restart_interval, coef_store, ss, se, ah, al
):
    """One progressive SOS (T.81 F.2 / G.1 decoder): spectral selection
    [ss, se] at successive-approximation bit position ``al`` (``ah`` == 0
    for a first pass, else a refinement pass).  Updates ``coef_store`` in
    place; returns the stream position of the next marker."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    w, h = frame["w"], frame["h"]
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    reader = _BitReader(data, start)
    state = {"eobrun": 0}

    def refine_nonzero(coef, idx, p1):
        # transmitted correction bit for a history-nonzero coefficient
        if reader.read_bits(1) and (coef[idx] & p1) == 0:
            coef[idx] += p1 if coef[idx] > 0 else -p1

    def decode_dc_first(coef, c, pred):
        t = reader.decode_symbol(htables[(0, c["dc"])])
        diff = _extend(reader.read_bits(t), t)
        pred[c["id"]] += diff
        coef[0] = pred[c["id"]] << al
        return pred

    def decode_dc_refine(coef):
        if reader.read_bits(1):
            coef[0] |= 1 << al  # two's-complement OR appends the bit

    def decode_ac_first(coef, ac_tbl):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index out of band")
            coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
            k += 1

    def decode_ac_refine(coef, ac_tbl):
        # T.81 G.1.2.3 (the libjpeg decode_mcu_AC_refine control flow)
        p1 = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(ac_tbl)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        # refinement EOB run is (1<<r)+bits — NO -1: the
                        # current block still consumes correction bits for
                        # its remaining nonzero-history positions below,
                        # then the decrement accounts for it
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        break
                    val = 0  # ZRL in refinement: 16 zero-history coeffs
                else:
                    if s != 1:
                        raise ValueError("invalid refinement magnitude")
                    val = p1 if reader.read_bits(1) else -p1
                # advance past r zero-history coeffs, correcting nonzero ones
                while k <= se:
                    idx = ZIGZAG[k]
                    if coef[idx] != 0:
                        refine_nonzero(coef, idx, p1)
                    else:
                        if r == 0:
                            if val != 0:
                                coef[idx] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if state["eobrun"] > 0:
            while k <= se:
                idx = ZIGZAG[k]
                if coef[idx] != 0:
                    refine_nonzero(coef, idx, p1)
                k += 1
            state["eobrun"] -= 1

    pred = {c["id"]: 0 for c in scan}
    unit = 0

    def maybe_restart():
        nonlocal pred
        if restart_interval and unit and unit % restart_interval == 0:
            reader.sync_restart()
            pred = {c["id"]: 0 for c in scan}
            state["eobrun"] = 0

    if len(scan) > 1:
        # interleaved (multi-component DC scans): MCU order over the
        # full-frame grid; single-component scans are ALWAYS non-interleaved
        if ss != 0 or se != 0:
            raise ValueError(
                "progressive interleaved scans must be DC-only (Ss=Se=0)"
            )
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for c in scan:
                    store = coef_store[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = store[my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                decode_dc_first(coef, c, pred)
                            else:
                                decode_dc_refine(coef)
                unit += 1
    else:
        # non-interleaved: the single component's OWN block grid
        c = scan[0]
        store = coef_store[c["id"]]
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        bw, bh = -(-cw // 8), -(-ch_ // 8)
        ac_tbl = htables.get((1, c["ac"]))
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                coef = store[by, bx]
                if ss == 0:
                    if ah == 0:
                        decode_dc_first(coef, c, pred)
                    else:
                        decode_dc_refine(coef)
                elif ah == 0:
                    decode_ac_first(coef, ac_tbl)
                else:
                    decode_ac_refine(coef, ac_tbl)
                unit += 1
    return _next_marker(data, reader.pos)


def _reconstruct(frame, qtables, coef_store):
    """Dequantize + IDCT the accumulated coefficient store (one batched
    einsum over all blocks — no per-block Python loop), then upsample and
    color-convert.  Shared by the baseline and progressive paths: both
    accumulate entropy-decoded coefficients into the same store layout."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    full = []
    for c in frame["comps"]:
        store = coef_store[c["id"]]  # natural (row-major) coefficient order
        bh, bw = store.shape[:2]
        q = qtables[c["tq"]]
        # batched IDCT over all blocks at once (one BLAS einsum, no
        # per-block Python loop), then scatter the 8x8 tiles into place
        blocks = store.reshape(bh * bw, 8, 8).astype(np.float64) * q[None, :, :]
        pix = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).round()
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)


def _decode_baseline_scan(
    data, start, frame, scan, htables, restart_interval, coef_store
):
    """One baseline SOS entropy-decoded into the coefficient store.

    Supports both the common interleaved scan (every frame component in one
    SOS, MCU order) and non-interleaved scans covering a subset — T.81
    permits one single-component SOS per component, and some encoders emit
    exactly that for color images.  Returns the position of the next marker
    after the scan's entropy data."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    reader = _BitReader(data, start)
    pred = {c["id"]: 0 for c in scan}

    def decode_block(c, coef, dc_tbl, ac_tbl):
        t = reader.decode_symbol(dc_tbl)
        diff = _extend(reader.read_bits(t), t)
        pred[c["id"]] += diff
        zz = np.zeros(64, dtype=np.int32)
        zz[0] = pred[c["id"]]
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
            zz[k] = _extend(reader.read_bits(s), s)
            k += 1
        coef[ZIGZAG] = zz  # de-zigzag into natural order

    unit = 0
    if len(scan) > 1:
        # interleaved: MCU order over the frame grid
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.sync_restart()
                    pred.update({c["id"]: 0 for c in scan})
                for c in scan:
                    dc_tbl = htables[(0, c["dc"])]
                    ac_tbl = htables[(1, c["ac"])]
                    store = coef_store[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                c,
                                store[my * c["v"] + by, mx * c["h"] + bx],
                                dc_tbl,
                                ac_tbl,
                            )
                unit += 1
    else:
        # non-interleaved: the single component's own (unpadded) block grid
        c = scan[0]
        store = coef_store[c["id"]]
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        bw, bh = -(-cw // 8), -(-ch_ // 8)
        dc_tbl = htables[(0, c["dc"])]
        ac_tbl = htables[(1, c["ac"])]
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.sync_restart()
                    pred[c["id"]] = 0
                decode_block(c, store[by, bx], dc_tbl, ac_tbl)
                unit += 1
    return _next_marker(data, reader.pos)


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
    img: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
    interleaved: bool = True,
) -> bytes:
    """Encode ``np.ndarray[h, w, 3]`` uint8 RGB as a baseline JPEG with the
    standard Annex K tables (≈quality 50).  ``subsampling`` is ``"444"``
    (1x1 chroma), ``"420"`` (2x2 luma MCUs — the dominant real-world
    layout), ``"422"`` (2x1: horizontal-only chroma downsample) or
    ``"440"`` (1x2: vertical-only); chroma is box-filtered on the padded
    plane.  ``restart_interval`` > 0 emits DRI/RSTn every N MCUs.
    ``interleaved=False`` emits one single-component SOS per component
    (legal per T.81, produced by some encoders) instead of one interleaved
    scan — exists to test the decoder's multi-scan baseline path.  All
    exist so the decoder's subsampled and restart paths are testable
    without third-party encoders."""
    luma_by_mode = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in luma_by_mode:
        raise ValueError(
            f"subsampling must be one of {sorted(luma_by_mode)}, got {subsampling!r}"
        )
    if restart_interval and not interleaved:
        raise ValueError("restart markers are only supported for interleaved scans")
    img = np.ascontiguousarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    luma_hv = luma_by_mode[subsampling]
    fx, fy = luma_hv[0], luma_hv[1]  # chroma downsample factors
    mcux, mcuy = -(-w // (8 * fx)), -(-h // (8 * fy))
    yp = _pad_plane(y, mcuy * 8 * fy, mcux * 8 * fx)
    # box-filter chroma on the padded plane (dims divisible by fx/fy)
    cbp = _pad_plane(cb, mcuy * 8 * fy, mcux * 8 * fx)
    crp = _pad_plane(cr, mcuy * 8 * fy, mcux * 8 * fx)
    if fx > 1 or fy > 1:
        cbp = cbp.reshape(mcuy * 8, fy, mcux * 8, fx).mean(axis=(1, 3))
        crp = crp.reshape(mcuy * 8, fy, mcux * 8, fx).mean(axis=(1, 3))
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
    if not interleaved:
        # one SOS per component over its own (spec, unpadded-ceil) block
        # grid; DC prediction resets per scan (T.81 non-interleaved layout)
        fmax_h, fmax_v = luma_hv
        for ci, (cid, tt) in enumerate(((1, 0x00), (2, 0x11), (3, 0x11))):
            plane, (hs, vs), q, dc_enc, ac_enc = comps[ci]
            out += b"\xFF\xDA" + struct.pack(">HB", 8, 1)
            out += bytes([cid, tt]) + b"\x00\x3F\x00"
            cw = -(-(w * hs) // fmax_h)
            ch_ = -(-(h * vs) // fmax_v)
            bw_n, bh_n = -(-cw // 8), -(-ch_ // 8)
            bw = _BitWriter()
            pred = 0
            for by in range(bh_n):
                for bx in range(bw_n):
                    blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    pred = _encode_block(bw, blk, q, dc_enc, ac_enc, pred)
            bw.flush()
            out += bw.buf
        out += b"\xFF\xD9"  # EOI
        return bytes(out)
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


# uniform 8-bit Huffman tables for the progressive TEST encoder: every
# (run, size) symbol the scans may emit gets an 8-bit code (176/256 < 1
# satisfies Kraft; legal, merely non-optimal) — needed because the Annex K
# AC tables lack the EOB_n run symbols progressive AC scans use
_PROG_DC_TBL = ([0, 0, 0, 0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_PROG_AC_TBL = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _zz_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(bh*bw, 64) quantized coefficients in ZIGZAG order for a padded
    plane (the encoder-side block store)."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    out = np.zeros((bh * bw, 64), np.int32)
    for i in range(bh * bw):
        by, bx = divmod(i, bw)
        blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        coefq = np.round((_C @ (blk - 128.0) @ _C.T) / q).astype(np.int32)
        out[i] = coefq.reshape(-1)[ZIGZAG]
    return out


def _pt(v: int, al: int) -> int:
    """AC point transform: integer divide by 2^al truncated toward zero."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _ProgScanWriter:
    """Entropy writer for one progressive scan: EOB-run accumulation plus
    the refinement correction-bit buffering (G.1.2.2-3 encoder side)."""

    def __init__(self, ac_enc):
        self.bw = _BitWriter()
        self.ac_enc = ac_enc
        self.eobrun = 0
        self.be: list[int] = []  # correction bits buffered under the EOB run

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            length, code = self.ac_enc[(nbits << 4) | 0]
            self.bw.write(code, length)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.be:
            self.bw.write(b, 1)
        self.be = []

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.bw.flush()
        return bytes(self.bw.buf)


def encode_jpeg_progressive(
    img: np.ndarray, successive: bool = False, subsampling: str = "444"
) -> bytes:
    """Encode uint8 RGB as a PROGRESSIVE (SOF2) JPEG — test harness for the
    progressive decoder.  ``successive=False``: spectral selection only
    (DC scan + one full AC scan per component, Al=0 — coefficients
    identical to the baseline encoding, so decode must match
    ``encode_jpeg`` on the visible pixels).  ``successive=True``: DC and
    AC first passes at Al=1 followed by AC refinement (Ah=1, Al=0) and a
    DC refinement scan — exercises every successive-approximation decode
    path including EOB-run correction bits.  ``subsampling="420"`` uses
    2x2 luma MCUs with box-filtered chroma (interleaved DC over the MCU
    grid, non-interleaved AC over each component's own used-block grid —
    the dominant real-world progressive layout)."""
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
        cbp = _pad_plane(cb, mcuy * 16, mcux * 16)
        crp = _pad_plane(cr, mcuy * 16, mcux * 16)
        cbp = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp = _pad_plane(cb, mcuy * 8, mcux * 8)
        crp = _pad_plane(cr, mcuy * 8, mcux * 8)
    lq, cq = STD_LUMA_Q.reshape(8, 8), STD_CHROMA_Q.reshape(8, 8)
    hvs = [luma_hv, (1, 1), (1, 1)]
    # per-component block stores shaped (bh, bw, 64) on the padded MCU grid
    comps = []
    for plane, q, (hs, vs) in zip((yp, cbp, crp), (lq, cq, cq), hvs):
        flat = _zz_blocks(plane, q)
        comps.append(flat.reshape(mcuy * vs, mcux * hs, 64))
    # used (non-dummy) block dims per component for non-interleaved AC scans
    used = []
    for hs, vs in hvs:
        cw = -(-(w * hs) // luma_hv[0])
        ch_ = -(-(h * vs) // luma_hv[1])
        used.append((-(-ch_ // 8), -(-cw // 8)))
    dc_enc = _build_encode_table(*_PROG_DC_TBL)
    ac_enc = _build_encode_table(*_PROG_AC_TBL)
    al1 = 1 if successive else 0

    out = bytearray(b"\xFF\xD8")
    for tq, q in ((0, STD_LUMA_Q), (1, STD_CHROMA_Q)):
        zzq = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + zzq.tobytes()
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    for cid, (hs, vs), tq in ((1, luma_hv, 0), (2, (1, 1), 1), (3, (1, 1), 1)):
        out += bytes([cid, (hs << 4) | vs, tq])
    for tc_th, (bits, values) in (((0x00,), _PROG_DC_TBL), ((0x10,), _PROG_AC_TBL)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values))
        out += bytes(tc_th) + bytes(bits) + bytes(values)

    def sos(comp_specs, ss, se, ah, al):
        o = bytearray(b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(comp_specs), len(comp_specs)))
        for cid, tt in comp_specs:
            o += bytes([cid, tt])
        o += bytes([ss, se, (ah << 4) | al])
        return o

    # scan 1: interleaved DC first pass (MCU order over the padded grid)
    out += sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, al1)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(hvs):
                for by in range(vs):
                    for bx in range(hs):
                        zz0 = int(comps[ci][my * vs + by, mx * hs + bx, 0])
                        v = zz0 >> al1  # DC point transform: arith shift
                        diff = v - preds[ci]
                        preds[ci] = v
                        mag = abs(diff)
                        nbits = mag.bit_length()
                        length, code = dc_enc[nbits]
                        bw.write(code, length)
                        if nbits:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << nbits) - 1,
                                nbits,
                            )
    bw.flush()
    out += bw.buf

    # scans 2-4: per-component AC first pass (spectral 1..63) over the
    # component's USED block grid (dummy MCU-padding blocks excluded —
    # exactly what the non-interleaved decoder iterates)
    for ci in range(3):
        out += sos([(ci + 1, 0x00)], 1, 63, 0, al1)
        ws = _ProgScanWriter(ac_enc)
        ubh, ubw = used[ci]
        for i in (by * ubw + bx for by in range(ubh) for bx in range(ubw)):
            zz = comps[ci][i // ubw, i % ubw]
            vals = [_pt(int(zz[k]), al1) for k in range(64)]
            last = max((k for k in range(1, 64) if vals[k] != 0), default=0)
            if last == 0:
                ws.eobrun += 1
                if ws.eobrun == 0x7FFF:
                    ws.flush_eobrun()
                continue
            run = 0
            for k in range(1, last + 1):
                v = vals[k]
                if v == 0:
                    run += 1
                    continue
                ws.flush_eobrun()
                while run > 15:
                    length, code = ac_enc[0xF0]
                    ws.bw.write(code, length)
                    run -= 16
                mag = abs(v)
                nbits = mag.bit_length()
                length, code = ac_enc[(run << 4) | nbits]
                ws.bw.write(code, length)
                ws.bw.write(v if v >= 0 else v + (1 << nbits) - 1, nbits)
                run = 0
            if last < 63:
                ws.eobrun += 1
                if ws.eobrun == 0x7FFF:
                    ws.flush_eobrun()
        out += ws.finish()

    if successive:
        # scans 5-7: per-component AC refinement (Ah=1 -> Al=0)
        for ci in range(3):
            out += sos([(ci + 1, 0x00)], 1, 63, 1, 0)
            ws = _ProgScanWriter(ac_enc)
            ubh, ubw = used[ci]
            for i in (by * ubw + bx for by in range(ubh) for bx in range(ubw)):
                zz = comps[ci][i // ubw, i % ubw]
                absv = [abs(int(zz[k])) for k in range(64)]
                eob = max((k for k in range(1, 64) if absv[k] == 1), default=0)
                run = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        ws.flush_eobrun()
                        length, code = ac_enc[0xF0]
                        ws.bw.write(code, length)
                        run -= 16
                        for bit in br:
                            ws.bw.write(bit, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)  # history-nonzero: correction bit
                        continue
                    ws.flush_eobrun()
                    length, code = ac_enc[(run << 4) | 1]
                    ws.bw.write(code, length)
                    ws.bw.write(0 if int(zz[k]) < 0 else 1, 1)
                    for bit in br:
                        ws.bw.write(bit, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    ws.eobrun += 1
                    ws.be.extend(br)
                    if ws.eobrun == 0x7FFF:
                        ws.flush_eobrun()
            out += ws.finish()
        # scan 8: interleaved DC refinement — one raw bit per block
        out += sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs) in enumerate(hvs):
                    for by in range(vs):
                        for bx in range(hs):
                            bw.write(
                                int(comps[ci][my * vs + by, mx * hs + bx, 0]) & 1, 1
                            )
        bw.flush()
        out += bw.buf

    out += b"\xFF\xD9"
    return bytes(out)
