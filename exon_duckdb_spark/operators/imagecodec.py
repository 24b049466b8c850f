"""Pure-Python image codec: BMP, PNG (sequential + Adam7), GIF, and TIFF.

The container ships no codec library (PIL/opencv), but the multimodal
contract (SURVEY "beyond-reference" §multimodal; no reference analog — the
reference has no media surface at all) needs a REAL pixel path, not a stub.
These two formats are decodable from their public specs with nothing but
``struct``, ``zlib`` (stdlib) and numpy:

- BMP: Windows BITMAPINFOHEADER layout — 24/32-bit uncompressed (BI_RGB),
  bottom-up or top-down, 4-byte row padding, BGR(A) channel order; 8-bit
  palettized, uncompressed or BI_RLE8 (runs, absolute mode, EOL/EOB/delta
  escapes).
- PNG: RFC 2083 — color types 0 (gray), 2 (RGB), 3 (palette + optional
  tRNS alpha), 4 (gray+alpha), 6 (RGBA); bit depths 1/2/4/8 where the
  spec allows them and 16 with a documented high-byte reduction (the
  decode contract is uint8); all five scanline filters; sequential AND
  Adam7-interlaced streams (7 reduced images, per-pass filtering —
  encode + decode roundtrip-pinned; the encoder emits 8-bit types
  0/2/4/6).
- GIF: 87a/89a first frame — full variable-width LZW decode (incl. the
  KwKwK case and interlaced row order); the encoder uses the fixed-width
  clear-code LZW trick and a sorted distinct-color palette (≤256 colors);
  full multi-frame animations via :func:`decode_gif_frames` (GCE delays,
  transparency, disposal 0/1/2/3 compositing).
- TIFF: baseline 6.0 — either byte order, first IFD, 8-bit gray (both
  photometric polarities) and RGB, chunky config, uncompressed /
  PackBits / LZW strips (MSB-first variable-width codes with the spec's
  early width change; optional horizontal predictor);
  :func:`encode_tiff` muxes the little-endian form.

Arrays are (height, width, channels) uint8, row-major, top-down, RGB(A) —
the layout every downstream feature extractor expects.

Deployments with PIL/opencv can swap these per-format functions out; the
DataFrame-level operators in :mod:`multimodal` only depend on the
``decode_blob`` / ``encode_blob`` dispatch surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_bmp",
    "encode_bmp",
    "decode_png",
    "encode_png",
    "decode_gif",
    "encode_gif",
    "decode_gif_frames",
    "encode_gif_frames",
    "decode_tiff",
    "encode_tiff",
    "decode_blob",
    "encode_blob",
    "resize_nearest",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# BMP


def _bmp_rle8_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8 (Windows GDI): pairs (count, index) for runs; escape
    0,0 = end of line, 0,1 = end of bitmap, 0,2 = delta (dx, dy jump),
    0,n≥3 = n absolute indices (word-aligned). Rows are bottom-up in the
    stream like any BMP; returns TOP-DOWN (h, w) indices."""
    out = np.zeros((height, width), np.uint8)
    x = y = 0  # y counts bottom-up rows
    i = 0
    while i + 1 < len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:  # run
            out[y, x : min(x + n, width)] = v
            x = min(x + n, width)
        elif v == 0:  # EOL
            x, y = 0, y + 1
            if y >= height:
                break
        elif v == 1:  # EOB
            break
        elif v == 2:  # delta
            if i + 1 >= len(data):
                raise ValueError("truncated BMP RLE8 delta")
            x = min(x + data[i], width)
            y = y + data[i + 1]
            i += 2
            if y >= height:
                break
        else:  # absolute mode: v literal indices, padded to a word
            if i + v > len(data):
                raise ValueError("truncated BMP RLE8 absolute run")
            take = min(v, width - x)
            out[y, x : x + take] = np.frombuffer(data, np.uint8, take, i)
            x += take
            i += v + (v & 1)
    return out[::-1]  # bottom-up → top-down


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode a BMP to (h, w, 3|4) uint8 RGB(A): uncompressed 24/32-bit
    (BI_RGB), and 8-bit palettized — uncompressed or BI_RLE8 (the color
    table between the DIB header and the pixel data maps indices to
    BGRA quads)."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", b, 18)
    bitcount = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    top_down = height < 0
    height = abs(height)
    if bitcount == 8 and compression in (0, 1):
        n_colors = struct.unpack_from("<I", b, 46)[0] or 256
        pal_off = 14 + hdr_size
        quads = np.frombuffer(b, np.uint8, n_colors * 4, pal_off).reshape(
            n_colors, 4
        )
        palette = quads[:, [2, 1, 0]]  # BGRA -> RGB
        if compression == 1:  # BI_RLE8
            if top_down:
                raise ValueError("top-down RLE8 BMP is invalid")
            idx = _bmp_rle8_decode(b[data_off:], width, height)
        else:
            stride = (width + 3) & ~3
            if len(b) < data_off + stride * height:
                raise ValueError("truncated BMP pixel data")
            rows = np.frombuffer(b, np.uint8, stride * height, data_off)
            idx = rows.reshape(height, stride)[:, :width]
            if not top_down:
                idx = idx[::-1]
        if idx.max(initial=0) >= n_colors:
            raise ValueError("BMP palette index outside color table")
        return np.ascontiguousarray(palette[idx])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bitcount not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bitcount}")
    bpp = bitcount // 8
    stride = (width * bpp + 3) & ~3
    need = data_off + stride * height
    if len(b) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b, np.uint8, stride * height, data_off)
    rows = rows.reshape(height, stride)[:, : width * bpp]
    img = rows.reshape(height, width, bpp)
    if not top_down:
        img = img[::-1]
    # BGR(A) -> RGB(A)
    if bpp == 3:
        img = img[:, :, ::-1]
    else:
        img = img[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(img)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit bottom-up BI_RGB BMP.

    Deterministic byte-for-byte: fixed headers, zero padding bytes."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_bmp expects (h, w, 3|4)")
    h, w = arr.shape[:2]
    rgb = arr[:, :, :3]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    pix = rows[::-1].tobytes()  # bottom-up
    data_off = 14 + 40
    file_size = data_off + len(pix)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return hdr + dib + pix


# ---------------------------------------------------------------------------
# PNG

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, height: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering. ``raw`` is the inflated stream of
    height * (1 + rowbytes) bytes; ``bpp`` is the filter's byte stride
    (ceil(depth/8) * channels — PNG filters operate on BYTES, so sub-byte
    depths use bpp=1 and 16-bit uses 2·channels). Filters 0/1/2 are fully
    vectorized (Sub is a per-column cumsum mod 256); 3/4 carry a true
    sequential dependency along x and run a per-pixel loop."""
    raw = raw.reshape(height, 1 + rowbytes)
    ftypes = raw[:, 0]
    data = raw[:, 1:]
    out = np.zeros((height, rowbytes), np.uint8)
    prev = np.zeros(rowbytes, np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # Sub: cumsum over x within each byte lane
            cur = (
                row.reshape(rowbytes // bpp, bpp).astype(np.uint32).cumsum(axis=0)
                % 256
            ).astype(np.uint8).reshape(rowbytes)
        elif f == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            cur = np.zeros(rowbytes, np.uint8)
            for i in range(rowbytes):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = np.zeros(rowbytes, np.uint8)
            for i in range(rowbytes):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out


# Adam7 pass grid: (x_start, y_start, x_step, y_step), ISO/IEC 15948 §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_rows_to_pixels(
    rows: np.ndarray, width: int, lanes: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline BYTES → (h, width, lanes) uint8 samples.
    depth 8 is a reshape; depth 16 keeps the high byte (documented 8-bit
    reduction — the decode contract is uint8 arrays); depths 1/2/4 unpack
    MSB-first bit groups (lanes == 1 for those color types)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * lanes].reshape(h, width, lanes)
    if depth == 16:
        return rows[:, : width * lanes * 2].reshape(h, width, lanes, 2)[..., 0]
    bits = np.unpackbits(rows, axis=1)[:, : width * depth]
    grp = bits.reshape(h, width, depth)
    vals = np.zeros((h, width), np.uint8)
    for k in range(depth):
        vals = (vals << 1) | grp[:, :, k]
    return vals[:, :, None]


def decode_png(b: bytes) -> np.ndarray:
    """Decode a PNG (sequential or Adam7-interlaced) to (h, w, channels)
    uint8. Coverage: color types 0 (gray), 2 (RGB), 3 (palette + optional
    tRNS alpha → RGB/RGBA), 4 (gray+alpha), 6 (RGBA); bit depths 1/2/4/8
    where the spec allows them, and 16 with a documented high-byte
    reduction (the decode contract is uint8 arrays). Adam7 streams are 7
    consecutive reduced images in one zlib stream — each pass filters its
    own scanlines independently, then scatters onto the output grid."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG file")
    i = len(_PNG_SIG)
    width = height = lanes = depth = ctype = None
    interlace = 0
    idat = []
    plte = trns = None
    while i + 8 <= len(b):
        length, typ = struct.unpack_from(">I4s", b, i)
        payload = b[i + 8 : i + 8 + length]
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            allowed = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                       4: (8, 16), 6: (8, 16)}
            if ctype not in allowed:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if depth not in allowed[ctype]:
                raise ValueError(
                    f"invalid PNG bit depth {depth} for color type {ctype}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            lanes = 1 if ctype == 3 else _PNG_CHANNELS[ctype]
        elif typ == b"PLTE":
            plte = np.frombuffer(payload, np.uint8)[
                : (length // 3) * 3
            ].reshape(-1, 3)
        elif typ == b"tRNS" and ctype == 3:
            trns = np.frombuffer(payload, np.uint8)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        i += 12 + length  # len + type + payload + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    bpp = max(1, depth // 8) * lanes

    def rowbytes(w: int) -> int:
        return (w * depth * lanes + 7) // 8

    if not interlace:
        expect = height * (1 + rowbytes(width))
        if raw.size != expect:
            raise ValueError(f"PNG data size {raw.size} != expected {expect}")
        out = _png_rows_to_pixels(
            _unfilter(raw, height, rowbytes(width), bpp), width, lanes, depth
        )
    else:
        out = np.zeros((height, width, lanes), np.uint8)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(width - x0) // dx))
            ph = max(0, -(-(height - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            need = ph * (1 + rowbytes(pw))
            if at + need > raw.size:
                raise ValueError("PNG interlaced data truncated")
            sub = _png_rows_to_pixels(
                _unfilter(raw[at : at + need], ph, rowbytes(pw), bpp),
                pw, lanes, depth,
            )
            out[y0::dy, x0::dx] = sub
            at += need
        if at != raw.size:
            raise ValueError(f"PNG data size {raw.size} != expected {at}")
    if ctype == 3:
        idx = out[:, :, 0]
        if idx.max(initial=0) >= len(plte):
            raise ValueError("PNG palette index outside PLTE")
        rgb = plte[idx]
        if trns is None:
            return np.ascontiguousarray(rgb)
        alpha = np.full(len(plte), 255, np.uint8)
        alpha[: len(trns)] = trns
        return np.ascontiguousarray(
            np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        )
    if ctype == 0 and depth < 8:
        # scale sub-byte gray to full range (0..2^d-1 → 0..255)
        out = (out.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return out


def _chunk(typ: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def _filter_rows(flat: np.ndarray, ch: int, filter_type: int) -> bytes:
    """Filter an (h, w*ch) int16 image into PNG scanline bytes (one
    filter byte + filtered row each), rows filtered against the previous
    row of the SAME image — shared by the sequential and per-Adam7-pass
    encoders."""
    h, wch = flat.shape
    lines = []
    prev = np.zeros(wch, np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = (cur - left) % 256
        elif filter_type == 2:
            enc = (cur - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) % 256
        elif filter_type == 4:
            enc = np.zeros(wch, np.int16)
            for i in range(wch):
                left = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                enc[i] = (int(cur[i]) - _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def encode_png(
    arr: np.ndarray, filter_type: int = 0, level: int = 6, interlace: bool = False
) -> bytes:
    """Encode (h, w[, c]) uint8 as an 8-bit PNG.

    ``filter_type`` applies one filter to every scanline (0 for the
    deterministic fixture path; 1-4 exist so tests can exercise the
    decoder's unfiltering). ``interlace=True`` writes the Adam7 pass
    sequence (each reduced image filtered independently, one zlib
    stream)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(
                _filter_rows(
                    sub.reshape(sub.shape[0], -1).astype(np.int16),
                    ch,
                    filter_type,
                )
            )
        body = b"".join(parts)
    else:
        body = _filter_rows(arr.reshape(h, w * ch).astype(np.int16), ch, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    idat = zlib.compress(body, level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# dispatch + resize


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): n in 0..127 copies
    n+1 literal bytes, n in 129..255 repeats the next byte 257-n times,
    128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first codes, 9→12-bit widths with the
    spec's EARLY width change (bump at table size 2^w - 1, one code
    before GIF's convention), Clear=256, EOI=257, first entry 258."""
    out = bytearray()
    arr = np.frombuffer(data, np.uint8)
    bitpos = 0
    nbits = len(arr) * 8
    width = 9
    table: list[bytes] = []
    prev = b""

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return 257  # ran off the end → treat as EOI
        val = 0
        for k in range(width):
            byte = arr[(bitpos + k) >> 3]
            val = (val << 1) | ((byte >> (7 - ((bitpos + k) & 7))) & 1)
        bitpos += width
        return val

    while len(out) < expect:
        code = read_code()
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = b""
            continue
        if code == 257:  # EOI
            break
        if not table:
            raise ValueError("TIFF LZW stream did not start with Clear")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW code")
        if prev:
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    if len(out) < expect:
        raise ValueError("truncated TIFF LZW strip")
    return bytes(out[:expect])


def decode_tiff(b: bytes) -> np.ndarray:
    """Decode a baseline TIFF 6.0 (the document-corpus staple) to
    (h, w, channels) uint8: either byte order, first IFD, 8 bits per
    sample, Photometric 0/1/2 (gray either polarity, RGB), chunky planar
    config, uncompressed / PackBits / LZW strips (LZW optionally with
    the horizontal-differencing predictor, tag 317 = 2)."""
    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF file")
    bo = "<" if b[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", b, 2)
    if magic != 42:
        raise ValueError("not a TIFF file (bad magic)")
    n_tags = struct.unpack_from(bo + "H", b, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    TYPE_SIZE = {1: 1, 3: 2, 4: 4}
    for t in range(n_tags):
        at = ifd_off + 2 + t * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", b, at)
        if typ not in TYPE_SIZE:
            continue
        total = TYPE_SIZE[typ] * count
        voff = at + 8 if total <= 4 else struct.unpack_from(bo + "I", b, at + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + fmt * count, b, voff))

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    planar = one(284, 1)
    predictor = one(317, 1)
    if any(x != 8 for x in bits):
        raise ValueError(f"unsupported TIFF bits per sample {bits}")
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if planar != 1:
        raise ValueError("unsupported TIFF planar configuration")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    offs = tags.get(273)
    counts = tags.get(279)
    if not offs or not counts or len(offs) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rps = one(278, height)
    parts = []
    row_bytes = width * spp
    for k, (o, c) in enumerate(zip(offs, counts)):
        rows = min(rps, height - k * rps)
        expect = rows * row_bytes
        strip = b[o : o + c]
        if comp == 32773:
            raw = _packbits_decode(strip, expect)
        elif comp == 5:
            raw = _tiff_lzw_decode(strip, expect)
        else:
            raw = strip[:expect]
        if predictor == 2:
            # horizontal differencing: cumsum along x per channel lane
            d = np.frombuffer(raw, np.uint8).reshape(rows, width, spp)
            raw = (
                d.astype(np.uint32).cumsum(axis=1) % 256
            ).astype(np.uint8).tobytes()
        parts.append(raw)
    data = b"".join(parts)
    if len(data) != height * row_bytes:
        raise ValueError("TIFF strip data size mismatch")
    img = np.frombuffer(data, np.uint8).reshape(height, width, spp)
    if photo == 0:  # WhiteIsZero
        img = 255 - img
    return np.ascontiguousarray(img)


def encode_tiff(
    arr: np.ndarray, packbits: bool = False, rows_per_strip: int | None = None
) -> bytes:
    """Encode (h, w[, c]) uint8 as a minimal little-endian baseline TIFF
    (8 bits/sample, BlackIsZero or RGB, chunky, one or more strips;
    ``packbits`` selects compression 32773 with a greedy literal/run
    packer). Deterministic byte-for-byte."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("encode_tiff expects 1 or 3 channels")
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        raw = arr[y0 : y0 + rps].tobytes()
        if not packbits:
            strips.append(raw)
            continue
        out = bytearray()
        i = 0
        while i < len(raw):
            run = 1
            while (
                run < 128 and i + run < len(raw) and raw[i + run] == raw[i]
            ):
                run += 1
            if run >= 2:
                out += bytes([257 - run, raw[i]])
                i += run
            else:
                j = i + 1
                while (
                    j < len(raw) and j - i < 128
                    and not (j + 1 < len(raw) and raw[j] == raw[j + 1])
                ):
                    j += 1
                out += bytes([j - i - 1]) + raw[i:j]
                i = j
        strips.append(bytes(out))
    n_strips = len(strips)
    # layout: header(8) + IFD + value arrays + strip data
    tag_list = [256, 257, 258, 259, 262, 273, 277, 278, 279]
    ifd_off = 8
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = ifd_off + ifd_size

    def arr_or_inline(values, typ):
        size = {3: 2, 4: 4}[typ]
        fmt = {3: "H", 4: "I"}[typ]
        if len(values) * size <= 4:
            raw = struct.pack("<" + fmt * len(values), *values)
            return raw + b"\x00" * (4 - len(raw)), None
        off = extra_base + len(extra)
        extra.extend(struct.pack("<" + fmt * len(values), *values))
        return struct.pack("<I", off), off

    # reserve space for strip offsets after we know data start
    entries = {}
    entries[256] = (3, 1, struct.pack("<HH", w, 0))
    entries[257] = (3, 1, struct.pack("<HH", h, 0))
    bits_v, _ = arr_or_inline([8] * ch, 3)
    entries[258] = (3, ch, bits_v)
    entries[259] = (3, 1, struct.pack("<HH", 32773 if packbits else 1, 0))
    entries[262] = (3, 1, struct.pack("<HH", 2 if ch == 3 else 1, 0))
    entries[277] = (3, 1, struct.pack("<HH", ch, 0))
    entries[278] = (3, 1, struct.pack("<HH", rps, 0))
    counts_v, _ = arr_or_inline([len(s) for s in strips], 4)
    entries[279] = (4, n_strips, counts_v)
    data_start = extra_base + len(extra) + (4 * n_strips if n_strips > 1 else 0)
    offsets = []
    at = data_start
    for s in strips:
        offsets.append(at)
        at += len(s)
    if n_strips > 1:
        off = extra_base + len(extra)
        extra.extend(struct.pack("<" + "I" * n_strips, *offsets))
        entries[273] = (4, n_strips, struct.pack("<I", off))
    else:
        entries[273] = (4, 1, struct.pack("<I", offsets[0]))
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(tag_list))
    for tag in tag_list:
        typ, count, val = entries[tag]
        out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def decode_blob(b: bytes) -> np.ndarray:
    """Decode a BMP, PNG, GIF, TIFF or JPEG (baseline or progressive)
    blob by magic; raises ValueError on other formats (and on
    arithmetic-coded/lossless/12-bit JPEG, with the mode named)."""
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b.startswith(_PNG_SIG):
        return decode_png(b)
    if b[:4] == b"GIF8":
        return decode_gif(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(b)
    if b[:3] == b"\xff\xd8\xff":
        from exon_duckdb_spark.operators import jpegcodec

        return jpegcodec.decode_jpeg(b)
    raise ValueError(
        "unsupported image format (supported here: BMP, PNG, GIF, TIFF, JPEG)"
    )


def encode_blob(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "image/bmp":
        return encode_bmp(arr)
    if fmt == "image/png":
        return encode_png(arr)
    if fmt == "image/gif":
        return encode_gif(arr)
    if fmt == "image/tiff":
        return encode_tiff(arr)
    if fmt == "image/jpeg":
        from exon_duckdb_spark.operators import jpegcodec

        return jpegcodec.encode_jpeg(arr)
    raise ValueError(f"unsupported encode format {fmt!r}")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor index map
    ``src = (dst * src_extent) // dst_extent`` — fully deterministic, so
    oracle queries can recompute results arithmetically."""
    sh, sw = arr.shape[:2]
    ys = (np.arange(height) * sh) // height
    xs = (np.arange(width) * sw) // width
    return np.ascontiguousarray(arr[ys[:, None], xs[None, :]])


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW decode + palette encode — pure Python from the public
# GIF spec. First frame only; transparency index (89a GCE) is ignored, the
# palette's RGB is emitted as-is.


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Standard GIF variable-width LZW: codes grow 3..12 bits, CLEAR resets
    the table, EOI terminates. Emits exactly n_pixels palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("truncated GIF pixel data")
    return out[:n_pixels]


def decode_gif(b: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (h, w, 3) uint8 RGB."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    sw, sh, packed = struct.unpack_from("<HHB", b, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, i + 1)
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = b[i]
            i += 1
            chunks = []
            while i < len(b) and b[i]:
                size = b[i]
                chunks.append(b[i + 1 : i + 1 + size])
                i += 1 + size
            idx = np.frombuffer(
                bytes(_gif_lzw_decode(b"".join(chunks), min_code_size, w * h)),
                np.uint8,
            )
            if idx.max(initial=0) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            img = pal[idx].reshape(h, w, 3)
            if ipacked & 0x40:  # Adam-style GIF interlace: 4 passes
                rows = np.empty(h, np.int64)
                order = [r for r in range(0, h, 8)]
                order += [r for r in range(4, h, 8)]
                order += [r for r in range(2, h, 4)]
                order += [r for r in range(1, h, 2)]
                rows[order] = np.arange(h)
                img = img[rows]
            return np.ascontiguousarray(img)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB with ≤256 distinct colors as GIF89a.

    Deterministic: palette is the sorted distinct colors; the LZW stream
    uses the fixed-width clear-code trick (a CLEAR before the table could
    outgrow the code width), trading bytes for simplicity — every decoder,
    including :func:`decode_gif`, reads it."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3)")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <=256 distinct colors, got {len(colors)}")
    # palette size: power of two >= max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[: len(colors)] = colors
    min_code_size = max(2, bits)
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # fixed-width stream: CLEAR, then pixel codes, re-CLEAR each time the
    # (never-used) table would force a width bump
    bitbuf = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bitbuf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << width) - eoi - 2  # codes until the width would grow
    for px in inverse:
        if budget == 0:
            emit(clear)
            budget = (1 << width) - eoi - 2
        emit(int(px))
        budget -= 1
    emit(eoi)
    if nbits:
        bitbuf.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(min_code_size)
    for off in range(0, len(bitbuf), 255):
        chunk = bitbuf[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_frames(b: bytes) -> tuple[list[int], list[np.ndarray]]:
    """Decode EVERY frame of an animated GIF87a/89a with compositing:
    returns (delays_cs, frames) where each frame is the full
    (screen_h, screen_w, 3) canvas AFTER that image renders, and
    delays_cs are the Graphic Control Extension delay times
    (centiseconds; 0 when absent).

    Compositing follows the GIF89a spec: sub-rectangle images paint at
    (left, top); a transparency index leaves the underlying canvas pixel;
    disposal 0/1 keeps the canvas, 2 restores the painted region to the
    background color, 3 restores the previous canvas. The canvas starts
    as the logical-screen background color (global-palette lookup; black
    when there is no global table)."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, bg_idx = struct.unpack_from("<HHBB", b, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    bg = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct)
        else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
    delays: list[int] = []
    frames: list[np.ndarray] = []
    disposal = 0
    transparent = None
    delay = 0
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension
            label = b[i + 1] if i + 1 < len(b) else 0
            i += 2
            subs = []
            while i < len(b) and b[i]:
                subs.append(b[i + 1 : i + 1 + b[i]])
                i += 1 + b[i]
            i += 1
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                gce = subs[0]
                disposal = (gce[0] >> 2) & 0x7
                delay = struct.unpack_from("<H", gce, 1)[0]
                transparent = gce[3] if gce[0] & 1 else None
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, i + 1)
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = b[i]
            i += 1
            chunks = []
            while i < len(b) and b[i]:
                size = b[i]
                chunks.append(b[i + 1 : i + 1 + size])
                i += 1 + size
            i += 1  # block terminator
            idx = np.frombuffer(
                bytes(_gif_lzw_decode(b"".join(chunks), min_code_size, w * h)),
                np.uint8,
            )
            if idx.max(initial=0) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            idx = idx.reshape(h, w)
            if ipacked & 0x40:  # 4-pass GIF interlace
                rows = np.empty(h, np.int64)
                order = [r for r in range(0, h, 8)]
                order += [r for r in range(4, h, 8)]
                order += [r for r in range(2, h, 4)]
                order += [r for r in range(1, h, 2)]
                rows[order] = np.arange(h)
                idx = idx[rows]
            prev_canvas = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            rgb = pal[idx[: region.shape[0], : region.shape[1]]]
            if transparent is not None:
                mask = idx[: region.shape[0], : region.shape[1]] != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:
                canvas[top : top + h, left : left + w] = bg
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
            disposal = 0
            transparent = None
            delay = 0
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return delays, frames


def encode_gif_frames(
    frames: list[np.ndarray], delay_cs: int = 10, loop: bool = True
) -> bytes:
    """Encode full-canvas RGB frames (each ≤256 distinct colors) as an
    animated GIF89a: NETSCAPE2.0 loop extension, one Graphic Control
    Extension (delay, disposal=1) + full-frame image with a LOCAL sorted
    palette per frame, the same deterministic fixed-width LZW stream as
    :func:`encode_gif`."""
    if not frames:
        raise ValueError("need at least one frame")
    arrs = [np.asarray(f, np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    for f in arrs:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must be (h, w, 3) and equally sized")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global table
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for arr in arrs:
        flat = arr.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"GIF frame needs <=256 colors, got {len(colors)}")
        bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
        pal = np.zeros((1 << bits, 3), np.uint8)
        pal[: len(colors)] = colors
        min_code_size = max(2, bits)
        clear = 1 << min_code_size
        eoi = clear + 1
        width_bits = min_code_size + 1
        bitbuf = bytearray()
        acc = 0
        nbits = 0

        def emit(code: int):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width_bits
            while nbits >= 8:
                bitbuf.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        budget = (1 << width_bits) - eoi - 2
        for px in inverse:
            if budget == 0:
                emit(clear)
                budget = (1 << width_bits) - eoi - 2
            emit(int(px))
            budget -= 1
        emit(eoi)
        if nbits:
            bitbuf.append(acc & 0xFF)
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delay_cs, 0, 0)
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | ((bits - 1) & 7)
        )
        out += pal.tobytes()
        out.append(min_code_size)
        for off in range(0, len(bitbuf), 255):
            chunk = bitbuf[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
