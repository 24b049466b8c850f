"""BGZF block layer shared by the BAM reader and BGZF text formats
(.vcf.gz written by bgzip).

BGZF (SAM spec §4.1) is a series of independently-deflated gzip members
whose compressed size is recorded in a BC extra subfield — so a byte range
of the COMPRESSED file can align itself to a block boundary and decompress
just its part, which is what makes these formats cluster-splittable.

Also here: the binning-scheme helpers shared by BAI and tabix index pruning
(same reg2bins scheme, SAM spec §5.3).
"""

from __future__ import annotations

import struct
import zlib
from bisect import bisect_right

from exon_duckdb_spark.sources.splits import FileSplit

BGZF_MAGIC = b"\x1f\x8b\x08\x04"

__all__ = [
    "BGZF_MAGIC",
    "bgzf_bsize",
    "bgzf_block",
    "bgzf_compress",
    "block_at",
    "find_block",
    "is_bgzf",
    "BgzfBuf",
    "parse_bgzf_lines_split",
    "reg2bins",
    "merge_voffset_ranges",
    "prune_splits_to_ranges",
]

DEFAULT_BGZF_BLOCK_BYTES = 60_000  # < 64 KiB decompressed, the spec ceiling


def bgzf_block(data: bytes) -> bytes:
    """One BGZF block: a gzip member with the BC/BSIZE extra subfield
    (SAM spec §4.1). ``data`` must be < 64 KiB."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    total = 18 + len(comp) + 8
    header = (
        BGZF_MAGIC + b"\x00" * 4 + b"\x00\xff"
        + struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2)
        + struct.pack("<H", total - 1)
    )
    return header + comp + struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF)


def bgzf_compress(payload: bytes, block_bytes: int = DEFAULT_BGZF_BLOCK_BYTES) -> bytes:
    """Payload → BGZF stream (fixed-size blocks + the empty EOF block)."""
    out = bytearray()
    for i in range(0, len(payload), block_bytes):
        out += bgzf_block(payload[i : i + block_bytes])
    out += bgzf_block(b"")
    return bytes(out)


def bgzf_bsize(head: bytes) -> int | None:
    """Compressed block size if ``head`` begins a BGZF block, else None."""
    if head[:4] != BGZF_MAGIC or len(head) < 12:
        return None
    xlen = int.from_bytes(head[10:12], "little")
    if len(head) < 12 + xlen:
        return None
    p, endx = 12, 12 + xlen
    while p + 4 <= endx:
        si1, si2 = head[p], head[p + 1]
        slen = int.from_bytes(head[p + 2 : p + 4], "little")
        if si1 == 66 and si2 == 67 and slen == 2 and p + 6 <= endx:
            bsize = int.from_bytes(head[p + 4 : p + 6], "little") + 1
            return bsize if bsize >= 12 + xlen + 8 else None
        p += 4 + slen
    return None


def block_at(f, coffset: int, file_size: int) -> int | None:
    """bsize if a chain-verified BGZF block starts at coffset, else None."""
    f.seek(coffset)
    head = f.read(min(4096, file_size - coffset))
    bsize = bgzf_bsize(head)
    if bsize is None or coffset + bsize > file_size:
        return None
    if coffset + bsize == file_size:
        return bsize
    f.seek(coffset + bsize)
    nxt = f.read(min(4096, file_size - coffset - bsize))
    return bsize if bgzf_bsize(nxt) is not None else None


def find_block(f, start: int, file_size: int) -> int | None:
    """Compressed offset of the first chain-verified block at-or-after start."""
    pos = start
    overlap = len(BGZF_MAGIC) - 1
    while pos < file_size:
        f.seek(pos)
        window = f.read(min(1 << 20, file_size - pos))
        i = 0
        while True:
            i = window.find(BGZF_MAGIC, i)
            if i < 0:
                break
            if block_at(f, pos + i, file_size) is not None:
                return pos + i
            i += 1
        pos += len(window) - overlap
        if len(window) <= overlap:
            break
    return None


def is_bgzf(path: str) -> bool:
    from exon_duckdb_spark.sources.splits import file_size, open_binary

    size = file_size(path)
    with open_binary(path) as f:
        return block_at(f, 0, size) is not None


class BgzfBuf:
    """Sequential decompressed view over BGZF blocks from a start offset,
    tracking which compressed block each decompressed position came from."""

    def __init__(self, f, coffset: int, file_size: int):
        self.f = f
        self.file_size = file_size
        self.next_coffset = coffset
        self.buf = bytearray()
        self.base = 0  # absolute decompressed index of buf[0]
        self.marks: list[int] = []  # abs decompressed start per block
        self.mark_coffsets: list[int] = []
        self.eof = False

    def _load_block(self) -> bool:
        while True:
            if self.next_coffset >= self.file_size:
                self.eof = True
                return False
            bsize = block_at(self.f, self.next_coffset, self.file_size)
            if bsize is None:
                raise ValueError(f"corrupt BGZF stream at offset {self.next_coffset}")
            self.f.seek(self.next_coffset)
            raw = self.f.read(bsize)
            data = zlib.decompress(raw, wbits=31)
            coffset = self.next_coffset
            self.next_coffset += bsize
            if not data:
                continue  # EOF marker / empty block — keep going
            self.marks.append(self.base + len(self.buf))
            self.mark_coffsets.append(coffset)
            self.buf.extend(data)
            return True

    def get(self, abs_pos: int, n: int) -> bytes | None:
        """n bytes at absolute decompressed position, or None past EOF."""
        while self.base + len(self.buf) < abs_pos + n:
            if not self._load_block():
                return None
        lo = abs_pos - self.base
        return bytes(self.buf[lo : lo + n])

    def find(self, needle: bytes, abs_pos: int) -> int:
        """Absolute position of needle at-or-after abs_pos, or -1 at EOF."""
        while True:
            i = self.buf.find(needle, max(abs_pos - self.base, 0))
            if i >= 0:
                return self.base + i
            if not self._load_block():
                return -1

    def end_abs(self) -> int:
        return self.base + len(self.buf)

    def block_coffset_of(self, abs_pos: int) -> int:
        """Compressed offset of the block containing abs_pos (must be loaded)."""
        i = bisect_right(self.marks, abs_pos) - 1
        return self.mark_coffsets[i]

    def is_block_start(self, abs_pos: int) -> bool:
        i = bisect_right(self.marks, abs_pos) - 1
        return 0 <= i < len(self.marks) and self.marks[i] == abs_pos

    def first_block_coffset_at_or_after(self, coffset: int) -> int | None:
        """First (non-empty) loaded block with compressed offset >= coffset."""
        from bisect import bisect_left

        i = bisect_left(self.mark_coffsets, coffset)
        return self.mark_coffsets[i] if i < len(self.mark_coffsets) else None

    def drop_before(self, abs_pos: int) -> None:
        # NEVER advance base past the loaded end: callers skip over bytes
        # they don't read (BCF l_indiv genotype blocks), so abs_pos may
        # point into NOT-YET-LOADED data — setting base there would record
        # the next loaded block at a wrong absolute position and the skip
        # would land mid-genotype, yielding garbage records (silent
        # corruption; only triggered once >1 MiB accumulated, so small
        # test files never tripped it). The unloaded tail is dropped by a
        # later call once it has streamed through.
        abs_pos = min(abs_pos, self.base + len(self.buf))
        cut = abs_pos - self.base
        if cut > 1 << 20:
            keep = bisect_right(self.marks, abs_pos) - 1
            self.marks = self.marks[keep:]
            self.mark_coffsets = self.mark_coffsets[keep:]
            del self.buf[:cut]
            self.base = abs_pos


def parse_bgzf_lines_split(split: FileSplit):
    """Lines of a BGZF text file owned by this compressed byte range —
    the TextInputFormat convention lifted to blocks:

    - a non-first split skips up to and including the first newline in its
      region (the spanning line belongs to the previous split);
    - a split owns lines starting in blocks with coffset in [start, end);
    - PLUS the line starting exactly at the first byte of the first block
      at-or-after ``end`` (mirror of the skip rule — the next split always
      discards its first line, even a complete one).

    Yields {"value": line} with the newline stripped, file order preserved.
    """
    from exon_duckdb_spark.sources.splits import file_size as _fsize
    from exon_duckdb_spark.sources.splits import open_binary

    file_size = _fsize(split.path)
    end = split.start + split.length
    with open_binary(split.path) as f:
        if split.start == 0:
            anchor = 0
        else:
            anchor = find_block(f, split.start, file_size)
            if anchor is None or anchor >= end:
                return
        buf = BgzfBuf(f, anchor, file_size)
        if split.start == 0:
            pos = 0
            if buf.get(0, 1) is None:
                return
        else:
            nl = buf.find(b"\n", 0)
            if nl < 0:
                return
            pos = nl + 1

        boundary_line_taken = False
        while True:
            if buf.get(pos, 1) is None:
                return  # EOF (a final unterminated line would have yielded below)
            cpos = buf.block_coffset_of(pos)
            if cpos >= end:
                # Past our range. The one exception: a line starting exactly
                # at the first byte of the FIRST block past end — the next
                # split anchors there and unconditionally discards its first
                # line, so it's ours. Lines at later block starts are found
                # by the next split's newline skip and must NOT be taken.
                if (
                    boundary_line_taken
                    or not buf.is_block_start(pos)
                    or cpos != buf.first_block_coffset_at_or_after(end)
                ):
                    return
                boundary_line_taken = True
            nl = buf.find(b"\n", pos)
            if nl < 0:
                line = buf.get(pos, buf.end_abs() - pos)
                if line:
                    yield {"value": line.decode("utf-8", "replace")}
                return
            yield {"value": buf.get(pos, nl - pos).decode("utf-8", "replace").rstrip("\r")}
            pos = nl + 1
            buf.drop_before(pos)


# ---------------------------------------------------------------------------
# Binning-index helpers (shared by BAI and tabix)
# ---------------------------------------------------------------------------


def reg2bins(beg: int, end: int) -> list[int]:
    """Bins overlapping 0-based half-open [beg, end) — binning scheme from
    the public SAM/BAM spec (section 5.3 pseudo-code)."""
    end -= 1
    bins = [0]
    for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
    return bins


def merge_voffset_ranges(chunks: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Virtual-offset chunks → merged compressed byte ranges."""
    ranges = sorted((vbeg >> 16, (vend >> 16) + 1) for vbeg, vend in chunks)
    if not ranges:
        return []
    merged = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def prune_splits_to_ranges(splits, ranges: list[tuple[int, int]]):
    """Splits overlapping any compressed range, PLUS each kept split's
    immediate file-order predecessor. The predecessor rule is a
    correctness requirement for record boundary ownership (round-5
    review): a record starting exactly at byte 0 of a kept split's anchor
    block is YIELDED by the previous split (the next-split-discards-its-
    first-record convention), and that anchor is by definition the first
    block at-or-after the predecessor's end — so pruning the predecessor
    while keeping its successor would silently drop the boundary record.
    One extra split per contiguous kept run buys the guarantee. (The
    post-scan exact filters keep pruning correctness-neutral for every
    record a kept split YIELDS — this rule guards which split yields it
    at all.)"""
    ordered = sorted(splits, key=lambda s: s.start)
    keep_idx = {
        i
        for i, s in enumerate(ordered)
        if any(lo < s.start + s.length and s.start < hi for lo, hi in ranges)
    }
    keep_idx |= {i - 1 for i in keep_idx if i > 0}
    return [s for i, s in enumerate(ordered) if i in keep_idx]


def read_binning_index(f, n_ref: int) -> list[dict[int, list[tuple[int, int]]]]:
    """Per-reference {bin → chunks} from an open binary stream positioned at
    the first reference entry (shared layout of BAI and tabix)."""
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack("<i", f.read(4))
        bins: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            bin_id, n_chunk = struct.unpack("<Ii", f.read(8))
            bins[bin_id] = [struct.unpack("<QQ", f.read(16)) for _ in range(n_chunk)]
        (n_intv,) = struct.unpack("<i", f.read(4))
        f.read(8 * n_intv)  # linear index unused — bins bound both ends
        refs.append(bins)
    return refs
