"""Pure-Python image codec: uncompressed BMP and (non-interlaced) PNG.

The container ships no codec library (PIL/opencv), but the multimodal
contract (SURVEY "beyond-reference" §multimodal; no reference analog — the
reference has no media surface at all) needs a REAL pixel path, not a stub.
These two formats are decodable from their public specs with nothing but
``struct``, ``zlib`` (stdlib) and numpy:

- BMP: Windows BITMAPINFOHEADER layout — 24/32-bit uncompressed (BI_RGB),
  bottom-up or top-down, 4-byte row padding, BGR(A) channel order.
- PNG: RFC 2083 — 8-bit depth, color types 0 (gray), 2 (RGB), 4
  (gray+alpha), 6 (RGBA), non-interlaced, all five scanline filters.

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
    "decode_blob",
    "encode_blob",
    "resize_nearest",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# BMP


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to (h, w, 3|4) uint8 RGB(A)."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", b, 18)
    bitcount = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bitcount not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bitcount}")
    top_down = height < 0
    height = abs(height)
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


def _unfilter(raw: np.ndarray, height: int, width: int, ch: int) -> np.ndarray:
    """Undo PNG scanline filtering. ``raw`` is the inflated stream of
    height * (1 + width*ch) bytes. Filters 0/1/2 are fully vectorized
    (Sub is a per-column cumsum mod 256); 3/4 carry a true sequential
    dependency along x and run a per-pixel loop."""
    rowlen = width * ch
    raw = raw.reshape(height, 1 + rowlen)
    ftypes = raw[:, 0]
    data = raw[:, 1:]
    out = np.zeros((height, rowlen), np.uint8)
    prev = np.zeros(rowlen, np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # Sub: cumsum over x within each channel lane
            cur = (
                row.reshape(width, ch).astype(np.uint32).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(rowlen)
        elif f == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            cur = np.zeros(rowlen, np.uint8)
            for i in range(rowlen):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = np.zeros(rowlen, np.uint8)
            for i in range(rowlen):
                left = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (int(row[i]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out


def decode_png(b: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w, channels) uint8."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG file")
    i = len(_PNG_SIG)
    width = height = ch = None
    idat = []
    while i + 8 <= len(b):
        length, typ = struct.unpack_from(">I4s", b, i)
        payload = b[i + 8 : i + 8 + length]
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if interlace:
                raise ValueError("Adam7 interlacing not supported")
            ch = _PNG_CHANNELS[ctype]
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        i += 12 + length  # len + type + payload + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    expect = height * (1 + width * ch)
    if raw.size != expect:
        raise ValueError(f"PNG data size {raw.size} != expected {expect}")
    out = _unfilter(raw, height, width, ch)
    return out.reshape(height, width, ch)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode (h, w[, c]) uint8 as an 8-bit non-interlaced PNG.

    ``filter_type`` applies one filter to every scanline (0 for the
    deterministic fixture path; 1-4 exist so tests can exercise the
    decoder's unfiltering)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(np.int16)
    lines = []
    prev = np.zeros(w * ch, np.int16)
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
            enc = np.zeros(w * ch, np.int16)
            for i in range(w * ch):
                left = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                enc[i] = (int(cur[i]) - _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# dispatch + resize


def decode_blob(b: bytes) -> np.ndarray:
    """Decode a BMP or PNG blob by magic; raises ValueError on other formats
    (JPEG etc. need a codec library this container doesn't ship)."""
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b.startswith(_PNG_SIG):
        return decode_png(b)
    raise ValueError("unsupported image format (supported here: BMP, PNG)")


def encode_blob(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "image/bmp":
        return encode_bmp(arr)
    if fmt == "image/png":
        return encode_png(arr)
    raise ValueError(f"unsupported encode format {fmt!r}")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor index map
    ``src = (dst * src_extent) // dst_extent`` — fully deterministic, so
    oracle queries can recompute results arithmetically."""
    sh, sw = arr.shape[:2]
    ys = (np.arange(height) * sh) // height
    xs = (np.arange(width) * sw) // width
    return np.ascontiguousarray(arr[ys[:, None], xs[None, :]])
