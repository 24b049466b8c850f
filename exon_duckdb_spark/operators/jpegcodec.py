"""Baseline sequential JPEG codec (ITU-T T.81 / JFIF) in pure numpy.

The container ships no codec library, so — like the BMP/PNG/GIF codec in
:mod:`imagecodec` — this implements the public spec directly: DQT/DHT/SOF0/
SOS segment parsing, canonical Huffman entropy coding, zigzag + uniform
quantization, a vectorized 8x8 DCT-II/III (exact matrix form, not a fast
butterfly — numpy einsum over all blocks at once is the fast path here),
JFIF YCbCr<->RGB, and 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling with
box-average down- and nearest-repeat up-sampling. No reference analog —
the reference (wheretrue/exon-duckdb) has no media surface at all.

Scope: baseline sequential (SOF0/1) AND progressive (SOF2, Annex G —
spectral selection + successive approximation, EOB-runs, refinement
correction bits) on decode; the encoder emits either layout (progressive
via a fixed scan script, one successive-approximation level). Arithmetic
coding (SOF9+), 12-bit precision and hierarchical modes raise ValueError
with the mode named, so a 100 TB sweep reports its undecodable tail
precisely. Restart markers (DRI/RSTn) are supported on sequential decode
and in progressive scans.

Correctness story (test_imagecodec.py):
- the entropy layer is proven LOSSLESS: decoder-recovered quantized
  coefficients == encoder-emitted quantized coefficients bit-for-bit
  (huffman+RLE+DC-prediction is invertible; only quantization loses data);
- the DCT pair is proven orthonormal (idct(dct(x)) ~= x at 1e-10) and the
  decoder's IDCT is checked against a direct O(N^4) DCT-III sum;
- roundtrip error on smooth images is bounded by the quantization step;
- DC-only images (constant 8x8 blocks, even offsets from 128 at quality
  50) roundtrip EXACTLY — the property the driver oracle query relies on
  (see __spark_entry__ q75 image pipeline: the SQL recomputes those pixels
  arithmetically).

Arrays are (height, width, channels) uint8 like the rest of the codec
stack; grayscale decodes to channels=1.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# ---------------------------------------------------------------------------
# constant tables (T.81 Annex K)

# K.1 base quantization tables, natural (row-major) order
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.int32,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.int32,
)

# zigzag scan: _ZIGZAG[k] = natural index of the k-th zigzag coefficient
_ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)  # natural index -> zigzag position inverse map

# K.3 typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8-point DCT-II basis: _DCT[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
# Orthonormal, so the inverse is the transpose — one matrix serves both
# directions and the pair is exact to float64 precision.
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT-II over a stack of (n, 8, 8) blocks at once."""
    return np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT, optimize=True)


def _idct(coefs: np.ndarray) -> np.ndarray:
    """Inverse (DCT-III) over a stack of (n, 8, 8) coefficient blocks."""
    return np.einsum("xu,nuv,yv->nxy", _DCT.T, coefs, _DCT.T, optimize=True)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 50 -> base tables, 100 -> all-ones (lossless-ish),
    1 -> maximum coarseness. Clamped to [1, 255] (8-bit DQT entries)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# canonical Huffman code construction (T.81 Annex C)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with codes assigned in increasing order per
    length — the canonical construction both sides of the codec share."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """mincode/maxcode/valptr decode tables (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops (and records the marker) at any non-stuffing marker byte."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # pad past the last marker, per F.2.2.5
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker (decoder restart path)."""
        self.nbits = 0
        self.acc = 0
        d = self.data
        # skip to the marker we already hit, or scan forward for one
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("truncated JPEG: missing restart marker")

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            code = (code << 1) | self.read_bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: invalid Huffman code")
        return table.vals[table.valptr[length] + code - table.mincode[length]]


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline sequential (SOF0/1) or progressive (SOF2)
    JFIF/JPEG blob to (h, w, c) uint8 — c=3 RGB for color scans, c=1 for
    grayscale. Progressive scans (spectral selection + successive
    approximation, T.81 Annex G) accumulate into per-component coefficient
    stores across multiple SOS segments before one shared dequant + IDCT.
    Raises ValueError (with the mode named) on arithmetic/lossless/12-bit
    streams."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG file (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) with comps = [(cid, H, V, tq), ...]
    progressive = False
    prog_stores = None  # per-component zigzag coefficient grids, SOF2 only
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        seg_len = struct.unpack_from(">H", b, i + 2)[0]
        payload = b[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    t = np.frombuffer(payload, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    t = np.frombuffer(payload, ">u2", 64, p).astype(np.int32)
                    p += 128
                nat = np.empty(64, np.int32)
                nat[_ZIGZAG] = t  # DQT stores zigzag order
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                p += 17 + nv
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (baseline is 8-bit)")
            if h == 0 or w == 0:
                # checked here so BOTH entropy layouts reject it — the
                # progressive path would otherwise return an empty pixel
                # array as a "successful" decode
                raise ValueError("corrupt JPEG: zero dimension")
            comps = []
            for ci in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", payload, 6 + 3 * ci)
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}): "
                "sequential/progressive huffman decoder"
            )
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = payload[0]
            scan = []
            for si in range(ns):
                cs, tables = payload[1 + 2 * si], payload[2 + 2 * si]
                scan.append((cs, tables >> 4, tables & 0x0F))
            if not progressive:
                return _decode_scan(
                    b, i, frame, scan, qtables, huff_dc, huff_ac, restart_interval
                )
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            if prog_stores is None:
                prog_stores = _alloc_stores(frame)
            i = _progressive_scan(
                b, i, frame, scan, ss, se, ahal >> 4, ahal & 0x0F,
                prog_stores, huff_dc, huff_ac, restart_interval,
            )
        # APPn/COM/others: skipped
    if progressive and prog_stores is not None:
        h, w, comps = frame
        meta = [(ch, cv, tq) for _cid, ch, cv, tq in comps]
        return _reconstruct(h, w, meta, prog_stores, qtables)
    raise ValueError("corrupt JPEG: no SOS marker")


def _decode_scan(b, pos, frame, scan, qtables, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("corrupt JPEG: zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # per scan component: coefficient store (zigzag order) + table refs
    stores, meta = [], []
    for cs, td, ta in scan:
        cid, ch, cv, tq = by_id[cs]
        stores.append(np.zeros((mcuy * cv, mcux * ch, 64), np.int32))
        meta.append((ch, cv, huff_dc[td], huff_ac[ta], tq))
    reader = _BitReader(b, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(scan)
            for ci, (ch, cv, dc_t, ac_t, _tq) in enumerate(meta):
                store = stores[ci]
                for v in range(cv):
                    for u in range(ch):
                        blk = store[my * cv + v, mx * ch + u]
                        # DC
                        s = reader.decode_symbol(dc_t)
                        diff = _extend(reader.receive(s), s)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        # AC
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overrun")
                            blk[k] = _extend(reader.receive(size), size)
                            k += 1
            mcu_count += 1
    return _reconstruct(
        h, w, [(ch, cv, tq) for ch, cv, _d, _a, tq in meta], stores, qtables
    )


def _reconstruct(h, w, meta, stores, qtables):
    """Shared dequant + IDCT + upsample + color-convert tail: per-component
    zigzag coefficient grids (by, bx, 64) → (h, w, c) uint8. Used by both
    the sequential single-scan path and the progressive accumulator."""
    hmax = max(c[0] for c in meta)
    vmax = max(c[1] for c in meta)
    planes = []
    for ci, (ch, cv, tq) in enumerate(meta):
        qt_zz = qtables[tq].reshape(64)[_ZIGZAG]  # natural -> zigzag order
        coefs = stores[ci].reshape(-1, 64) * qt_zz
        nat = coefs[:, _UNZIGZAG]  # zigzag -> natural
        blocks = _idct(nat.reshape(-1, 8, 8).astype(np.float64))
        by, bx = stores[ci].shape[:2]
        plane = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        plane = plane[:chh, :cw]
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0] + 128.0), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = (p + 128.0 for p in planes)
    cb -= 128.0
    cr -= 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G): each SOS carries one spectral band at
# one bit of successive approximation; coefficients accumulate across scans


def _frame_geometry(frame):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_stores(frame):
    """One zigzag-order coefficient grid per component, MCU-padded like the
    sequential path so interleaved DC scans can address padded blocks."""
    _h, _w, comps = frame
    _hmax, _vmax, mcux, mcuy = _frame_geometry(frame)
    return [
        np.zeros((mcuy * cv, mcux * ch, 64), np.int32)
        for _cid, ch, cv, _tq in comps
    ]


def _next_marker(b: bytes, pos: int) -> int:
    """Position of the next real marker at/after pos (skips entropy bytes,
    0xFF00 stuffing, 0xFF fill bytes, and stray RSTn)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF:
            nxt = b[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker between/after scans
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _progressive_scan(
    b, pos, frame, scan, ss, se, ah, al, stores, huff_dc, huff_ac, restart_interval
):
    """Decode one progressive SOS into the coefficient stores; returns the
    byte offset of the next marker. DC scans (Ss=0) may interleave several
    components (MCU order); AC scans are single-component in raster order
    over the component's REAL block grid (not the MCU-padded one). First
    passes (Ah=0) decode magnitudes shifted left by Al; refinement passes
    (Ah>0) add one bit of precision per coefficient, with the EOB-run and
    correction-bit protocol of G.1.2.3."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    comp_idx = {c[0]: i for i, c in enumerate(comps)}
    reader = _BitReader(b, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("corrupt progressive JPEG: DC scan with Se != 0")
        members = []  # (store, dc_table_or_None)
        for cs, td, _ta in scan:
            ci = comp_idx[cs]
            members.append((stores[ci], comps[ci][1], comps[ci][2],
                            huff_dc[td] if ah == 0 else None))
        preds = [0] * len(members)
        mcu_count = 0
        if len(scan) == 1:
            store, ch, cv, dc_t = members[0]
            cbx = -(-(-(-w * ch // hmax)) // 8)
            cby = -(-(-(-h * cv // vmax)) // 8)
            grid = [(0, byi, bxi) for byi in range(cby) for bxi in range(cbx)]
        else:
            grid = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for mi, (_s, ch, cv, _t) in enumerate(members):
                        for v in range(cv):
                            for u in range(ch):
                                grid.append((mi, my * cv + v, mx * ch + u))
        per_mcu = (
            1 if len(scan) == 1 else sum(ch * cv for _s, ch, cv, _t in members)
        )
        for gi, (mi, byi, bxi) in enumerate(grid):
            if (
                restart_interval
                and gi
                and gi % (restart_interval * per_mcu) == 0
            ):
                reader.align_restart()
                preds = [0] * len(members)
            store, _ch, _cv, dc_t = members[mi]
            blk = store[byi, bxi]
            if ah == 0:
                s = reader.decode_symbol(dc_t)
                diff = _extend(reader.receive(s), s)
                preds[mi] += diff
                blk[0] = preds[mi] << al
            elif reader.read_bit():
                blk[0] |= 1 << al
    else:
        if len(scan) != 1:
            raise ValueError("corrupt progressive JPEG: interleaved AC scan")
        if se > 63 or ss > se:
            raise ValueError("corrupt progressive JPEG: bad spectral band")
        cs, _td, ta = scan[0]
        ci = comp_idx[cs]
        _cid, ch, cv, _tq = comps[ci]
        store = stores[ci]
        ac_t = huff_ac[ta]
        cbx = -(-(-(-w * ch // hmax)) // 8)
        cby = -(-(-(-h * cv // vmax)) // 8)
        eobrun = 0
        p1, m1 = 1 << al, -1 << al
        blocks = 0
        for byi in range(cby):
            for bxi in range(cbx):
                if restart_interval and blocks and blocks % restart_interval == 0:
                    reader.align_restart()
                    eobrun = 0
                blocks += 1
                blk = store[byi, bxi]
                if ah == 0:  # first pass for this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("corrupt JPEG: AC band overrun")
                        blk[k] = _extend(reader.receive(s), s) << al
                        k += 1
                else:  # refinement pass (G.1.2.3, libjpeg structure)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            newval = 0
                            if s == 0:
                                if r < 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.receive(r)
                                    break
                                # r == 15: skip 16 zero-history coefficients
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "corrupt JPEG: refinement amplitude != 1"
                                    )
                                newval = p1 if reader.read_bit() else m1
                            while k <= se:
                                coef = int(blk[k])
                                if coef:
                                    if reader.read_bit() and not (coef & p1):
                                        blk[k] = coef + (p1 if coef >= 0 else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k <= se:
                                blk[k] = newval
                            k += 1
                    if eobrun:
                        while k <= se:
                            coef = int(blk[k])
                            if coef and reader.read_bit() and not (coef & p1):
                                blk[k] = coef + (p1 if coef >= 0 else m1)
                            k += 1
                        eobrun -= 1
    return _next_marker(b, reader.pos)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill, per spec


def _encode_blocks(
    writer: _BitWriter,
    zz: np.ndarray,
    order: np.ndarray,
    dc_codes: list[dict[int, tuple[int, int]]],
    ac_codes: list[dict[int, tuple[int, int]]],
    comp_of: np.ndarray,
    blocks_per_mcu: int = 1,
    restart_interval: int = 0,
) -> None:
    """Emit quantized zigzag blocks (n, 64) in `order`, with per-block
    component ids selecting tables and DC predictors. With a restart
    interval, byte-align and emit RSTn every `restart_interval` MCUs and
    reset the predictors (T.81 E.1.4)."""
    preds = [0] * (int(comp_of.max()) + 1 if comp_of.size else 1)
    rst = 0
    for mi, bi in enumerate(order):
        if (
            restart_interval
            and mi
            and mi % (restart_interval * blocks_per_mcu) == 0
        ):
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(preds)
        blk = zz[bi]
        ci = int(comp_of[bi])
        dct, act = dc_codes[ci], ac_codes[ci]
        diff = int(blk[0]) - preds[ci]
        preds[ci] = int(blk[0])
        mag = diff if diff >= 0 else -diff
        size = mag.bit_length()
        code, length = dct[size]
        writer.write(code, length)
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = act[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            mag = v if v >= 0 else -v
            size = mag.bit_length()
            code, length = act[(run << 4) | size]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last < 63:
            code, length = act[0x00]  # EOB
            writer.write(code, length)


def _emit_dc_first(writer, zz, order, comp_of, dc_codes, al):
    """Progressive DC first scan: diff-code (DC >> Al) in MCU order (the
    point transform for DC is an arithmetic shift, G.1.2.1)."""
    preds = [0] * (int(comp_of.max()) + 1 if comp_of.size else 1)
    for bi in order:
        ci = int(comp_of[bi])
        v = int(zz[bi, 0]) >> al
        diff = v - preds[ci]
        preds[ci] = v
        size = abs(diff).bit_length()
        code, length = dc_codes[ci][size]
        writer.write(code, length)
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _emit_dc_refine(writer, zz, order, al):
    for bi in order:
        writer.write((int(zz[bi, 0]) >> al) & 1, 1)


def _emit_ac_first(writer, zz, block_ids, ac, ss, se, al):
    """Progressive AC first scan over one band: run-length code the point
    transformed values sign*(|v| >> Al); trailing zeros close with EOB
    (EOB-run of 1 — the K.3 tables carry no longer run symbols)."""
    for bi in block_ids:
        band = zz[bi, ss : se + 1]
        run = 0
        nz = np.nonzero(band)[0]
        vals = []
        if nz.size:
            for off in nz:
                v = int(band[off])
                t = (abs(v) >> al) * (1 if v >= 0 else -1)
                vals.append((int(off), t))
        last = -1
        prev = -1
        for off, t in vals:
            if t == 0:
                continue
            run = off - prev - 1
            prev = off
            while run > 15:
                code, length = ac[0xF0]
                writer.write(code, length)
                run -= 16
            mag = abs(t)
            size = mag.bit_length()
            code, length = ac[(run << 4) | size]
            writer.write(code, length)
            writer.write(t if t >= 0 else t + (1 << size) - 1, size)
            last = off
        if last < se - ss:
            code, length = ac[0x00]  # EOB (run of 1)
            writer.write(code, length)


def _emit_ac_refine(writer, zz, block_ids, ac, ss, se, al):
    """Progressive AC refinement (G.1.2.3, the libjpeg structure): newly
    significant coefficients emit (run<<4)|1 + sign, already-nonzero ones
    queue correction bits that flush after the next symbol; trailing state
    closes with EOB + its buffered bits. EOB-runs never span blocks (run of
    1 each), matching the K.3 table's symbol set."""
    p1 = 1 << al
    for bi in block_ids:
        band = zz[bi, ss : se + 1]
        absv = np.abs(band.astype(np.int64)) >> al
        newly = np.nonzero(absv == 1)[0]
        eob = int(newly[-1]) if newly.size else -1
        r = 0
        br: list[int] = []
        for k in range(band.shape[0]):
            t = int(absv[k])
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                code, length = ac[0xF0]
                writer.write(code, length)
                r -= 16
                for bit in br:
                    writer.write(bit, 1)
                br = []
            if t > 1:  # nonzero history: correction bit only
                br.append(t & 1)
                continue
            code, length = ac[(r << 4) | 1]
            writer.write(code, length)
            writer.write(1 if int(band[k]) >= 0 else 0, 1)
            for bit in br:
                writer.write(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            code, length = ac[0x00]  # EOB closes the trailing run
            writer.write(code, length)
            for bit in br:
                writer.write(bit, 1)


def _plane_to_zz(plane: np.ndarray, qt: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Level-shift, pad to 8-multiples (edge replicate), DCT, quantize,
    zigzag. Returns (blocks_zz (by*bx, 64) int32, by, bx)."""
    h, w = plane.shape
    by, bx = -(-h // 8), -(-w // 8)
    padded = np.empty((by * 8, bx * 8), np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    )
    coefs = _fdct(blocks)
    q = np.round(coefs / qt[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG], by, bx


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 50,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 as a
    baseline sequential JFIF/JPEG with the K.3 typical Huffman tables.
    ``subsampling``: '444' (no chroma subsampling, default — deterministic
    and simplest for oracle replay) or '420' (2x2 box-average chroma).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs.
    ``progressive`` emits SOF2 with a fixed scan script — interleaved DC
    first at Al=1, per-component AC bands (1-5, 6-63) first at Al=1, then
    DC and AC refinements to Al=0 — exercising spectral selection AND one
    level of successive approximation; quantized coefficients are
    identical to the sequential stream (same DCT/quant path), only the
    entropy layout differs. Progressive + restart_interval is rejected.
    Deterministic byte-for-byte for a given argument tuple."""
    if progressive and restart_interval:
        raise ValueError("progressive encoder does not emit restart markers")
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w[, 1]) gray or (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r} ('444'|'420')")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("image dimensions out of JPEG range")
    qt_l, qt_c = _quality_tables(quality)
    arr = arr.astype(np.float64)
    if gray:
        planes = [arr]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        r, g, bl = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * bl)
        cb = np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl)
        cr = np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl)
        cb = np.clip(cb, 0, 255)
        cr = np.clip(cr, 0, 255)
        if subsampling == "420":
            # pad to even dims (edge replicate) then 2x2 box average
            eh, ew = (h + 1) & ~1, (w + 1) & ~1
            def _down(p):
                q = np.empty((eh, ew))
                q[:h, :w] = p
                q[h:, :w] = p[-1:, :]
                q[:, w:] = q[:, w - 1 : w]
                return np.round(
                    (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2])
                    / 4.0
                )
            planes = [y, _down(cb), _down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # per-component quantized zigzag blocks; 420 luma must pad its block
    # grid to the MCU grid (2x2 luma blocks per MCU)
    zz_all, comp_of, grids = [], [], []
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    offset = 0
    offsets = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        need_bx, need_by = mcux * sh, mcuy * sv
        zz, by, bx = _plane_to_zz(plane, qts[ci])
        if (by, bx) != (need_by, need_bx):
            grid = np.zeros((need_by, need_bx, 64), np.int32)
            grid[:by, :bx] = zz.reshape(by, bx, 64)
            # replicate edge blocks so padded blocks cost ~nothing and DC
            # prediction stays smooth
            if need_by > by:
                grid[by:, :bx] = grid[by - 1 : by, :bx]
            if need_bx > bx:
                grid[:, bx:] = grid[:, bx - 1 : bx]
            zz = grid.reshape(-1, 64)
            by, bx = need_by, need_bx
        zz_all.append(zz)
        comp_of.append(np.full(zz.shape[0], ci, np.int64))
        grids.append((by, bx))
        offsets.append(offset)
        offset += zz.shape[0]
    zz = np.concatenate(zz_all, 0)
    comp_of = np.concatenate(comp_of, 0)
    # MCU-interleaved block order (T.81 A.2.3); non-interleaved for 1 comp
    order: list[int] = []
    if len(planes) == 1:
        order = list(range(zz.shape[0]))
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    _by, bx = grids[ci]
                    for v in range(sv):
                        for u in range(sh):
                            order.append(
                                offsets[ci] + (my * sv + v) * bx + (mx * sh + u)
                            )
    # tables: luma for comp 0, chroma for comps 1/2
    dc_codes = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        dc_codes += [dc_c, dc_c]
        ac_codes += [ac_c, ac_c]
    # ---- containers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    def _dqt(tid, tbl):
        return (
            b"\xff\xdb"
            + struct.pack(">HB", 67, tid)
            + bytes(int(x) for x in tbl.reshape(64)[_ZIGZAG])
        )
    out += _dqt(0, qt_l)
    if not gray:
        out += _dqt(1, qt_c)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    def _dht(tc, th, bits, vals):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    out += _dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if not progressive:
        writer = _BitWriter()
        blocks_per_mcu = 1 if len(planes) == 1 else sum(sh * sv for sh, sv in samp)
        _encode_blocks(
            writer,
            zz,
            np.asarray(order, np.int64),
            dc_codes,
            ac_codes,
            comp_of,
            blocks_per_mcu,
            restart_interval,
        )
        writer.flush()
        if restart_interval:
            out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        sos = bytes([nc])
        for ci in range(nc):
            sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
        sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += writer.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    # ---- progressive scan script
    order_arr = np.asarray(order, np.int64)

    def _real_blocks(ci: int) -> list[int]:
        # AC scans are non-interleaved over the component's REAL block
        # grid; the MCU-padding blocks exist only for interleaved DC scans
        sh, sv = samp[ci]
        cw = -(-w * sh // hmax)
        chh = -(-h * sv // vmax)
        cbx, cby = -(-cw // 8), -(-chh // 8)
        _need_by, need_bx = grids[ci]
        return [
            offsets[ci] + byi * need_bx + bxi
            for byi in range(cby)
            for bxi in range(cbx)
        ]

    def _sos(scomps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(scomps)])
        for cid, td, ta in scomps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1) for ci in range(nc)]
    scans = []  # (sos_header, emit_fn)
    w1 = _BitWriter()
    _emit_dc_first(w1, zz, order_arr, comp_of, dc_codes, 1)
    scans.append((_sos(all_comps, 0, 0, 0, 1), w1))
    for ci in range(nc):
        blocks = _real_blocks(ci)
        act = ac_codes[ci]
        for ss_b, se_b in ((1, 5), (6, 63)):
            wb = _BitWriter()
            _emit_ac_first(wb, zz, blocks, act, ss_b, se_b, 1)
            scans.append((_sos([all_comps[ci]], ss_b, se_b, 0, 1), wb))
    wd = _BitWriter()
    _emit_dc_refine(wd, zz, order_arr, 0)
    scans.append((_sos(all_comps, 0, 0, 1, 0), wd))
    for ci in range(nc):
        blocks = _real_blocks(ci)
        act = ac_codes[ci]
        for ss_b, se_b in ((1, 5), (6, 63)):
            wb = _BitWriter()
            _emit_ac_refine(wb, zz, blocks, act, ss_b, se_b, 0)
            scans.append((_sos([all_comps[ci]], ss_b, se_b, 1, 0), wb))
    for sos_hdr, wb in scans:
        wb.flush()
        out += sos_hdr
        out += wb.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
