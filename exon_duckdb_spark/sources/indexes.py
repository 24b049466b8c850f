"""Index builders: .bai (BAM), .tbi (tabix, bgzip'd VCF), .csi (BCF).

The reference consumes these indexes for its region-query TVFs
(rust/src/bam_query_reader.rs:63, vcf_query_reader.rs:31-86); samtools/
tabix normally produce them. Building one is a sequential walk of a single
file — the same cost profile as ``samtools index`` — so these run
driver-side (or one executor per file via a simple map over paths); the
payoff is the split pruning in plan_{bam,vcf,bcf}_query_splits.

Formats follow the public hts-specs (SAMv1 §5.2 BAI layout, tabix.tex,
csi.tex). Only bins are emitted (no linear index / loffset hints): our
readers bound both chunk ends from the bins alone, and the empty linear
index is valid per spec.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from bisect import bisect_right

from exon_duckdb_spark.sources.bgzf import BGZF_MAGIC, bgzf_bsize

__all__ = ["index_bam", "index_vcf", "index_bcf", "reg2bin"]


def reg2bin(beg: int, end: int) -> int:
    """Smallest bin containing 0-based half-open [beg, end) (SAM spec §5.3)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def _csi_bin(beg: int, end: int, min_shift: int = 14, depth: int = 5) -> int:
    """CSI bin via level walk — with (14, 5) this equals BAI's reg2bin."""
    end -= 1
    levels = [(min_shift + 3 * i, ((1 << 3 * (depth - i)) - 1) // 7)
              for i in range(depth + 1)]
    for shift, offset in levels:
        if beg >> shift == end >> shift:
            return offset + (beg >> shift)
    return 0


class _BgzfPayload:
    """Sequential whole-file BGZF decompress with voffset lookup."""

    def __init__(self, path: str):
        self.payload = bytearray()
        self.ustarts: list[int] = []
        self.coffsets: list[int] = []
        from exon_duckdb_spark.sources.splits import open_binary

        with open_binary(path) as f:
            data = f.read()
        pos = 0
        while pos < len(data):
            if data[pos : pos + 4] != BGZF_MAGIC:
                raise ValueError(f"{path}: not BGZF at offset {pos}")
            bsize = bgzf_bsize(data[pos : pos + 64])
            if bsize is None:
                raise ValueError(f"{path}: corrupt BGZF header at {pos}")
            chunk = zlib.decompress(data[pos : pos + bsize], wbits=31)
            if chunk:
                self.ustarts.append(len(self.payload))
                self.coffsets.append(pos)
                self.payload.extend(chunk)
            pos += bsize

    def voffset(self, upos: int) -> int:
        i = bisect_right(self.ustarts, upos) - 1
        i = max(i, 0)
        return (self.coffsets[i] << 16) | (upos - self.ustarts[i])


def _pack_bins(bins: dict[int, list[tuple[int, int]]], csi: bool) -> bytes:
    out = struct.pack("<i", len(bins))
    for bin_id in sorted(bins):
        chunks = bins[bin_id]
        if csi:
            # loffset hint: smallest chunk start (readers may ignore it)
            out += struct.pack("<IQi", bin_id, min(c[0] for c in chunks), len(chunks))
        else:
            out += struct.pack("<Ii", bin_id, len(chunks))
        for beg, end in chunks:
            out += struct.pack("<QQ", beg, end)
    return out


def _add_chunk(bins: dict, bin_id: int, vbeg: int, vend: int) -> None:
    chunks = bins.setdefault(bin_id, [])
    if chunks and chunks[-1][1] >= vbeg:
        chunks[-1] = (chunks[-1][0], max(chunks[-1][1], vend))
    else:
        chunks.append((vbeg, vend))


_REF_CONSUMING = {0, 2, 3, 7, 8}  # M, D, N, =, X


def index_bam(path: str, out_path: str | None = None) -> str:
    """Build a .bai for a BGZF BAM file (mapped records only, bins without
    linear index). Returns the index path."""
    pay = _BgzfPayload(path)
    buf = bytes(pay.payload)
    if buf[:4] != b"BAM\x01":
        raise ValueError(f"{path}: not a BAM file")
    (l_text,) = struct.unpack_from("<i", buf, 4)
    pos = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", buf, pos)
        pos += 4 + l_name + 4
    refs: list[dict[int, list[tuple[int, int]]]] = [{} for _ in range(n_ref)]
    while pos + 4 <= len(buf):
        (block_size,) = struct.unpack_from("<i", buf, pos)
        rec_end = pos + 4 + block_size
        ref_id, p0, l_read_name, _mq, _bin, n_cigar = struct.unpack_from(
            "<iiBBHH", buf, pos + 4
        )
        if ref_id >= 0 and p0 >= 0:
            cig_off = pos + 4 + 32 + l_read_name
            reflen = 0
            for c in struct.unpack_from(f"<{n_cigar}I", buf, cig_off):
                if (c & 0xF) in _REF_CONSUMING:
                    reflen += c >> 4
            end0 = p0 + max(reflen, 1)
            _add_chunk(
                refs[ref_id], reg2bin(p0, end0), pay.voffset(pos), pay.voffset(rec_end)
            )
        pos = rec_end
    out = out_path or path + ".bai"
    with open(out, "wb") as f:
        f.write(b"BAI\x01" + struct.pack("<i", n_ref))
        for bins in refs:
            f.write(_pack_bins(bins, csi=False))
            f.write(struct.pack("<i", 0))  # empty linear index
    return out


def index_vcf(path: str, out_path: str | None = None) -> str:
    """Build a tabix .tbi for a bgzip'd VCF. Returns the index path."""
    pay = _BgzfPayload(path)
    buf = bytes(pay.payload)
    names: list[str] = []
    name_ids: dict[str, int] = {}
    refs: list[dict[int, list[tuple[int, int]]]] = []
    pos = 0
    while pos < len(buf):
        nl = buf.find(b"\n", pos)
        line_end = len(buf) if nl < 0 else nl + 1
        line = buf[pos : line_end if nl < 0 else nl]
        if line and not line.startswith(b"#"):
            fields = line.split(b"\t")
            chrom = fields[0].decode()
            p1 = int(fields[1])
            ref = fields[3] if len(fields) > 3 else b"N"
            rid = name_ids.get(chrom)
            if rid is None:
                rid = len(names)
                name_ids[chrom] = rid
                names.append(chrom)
                refs.append({})
            beg0 = p1 - 1
            _add_chunk(
                refs[rid],
                reg2bin(beg0, beg0 + max(len(ref), 1)),
                pay.voffset(pos),
                pay.voffset(line_end),
            )
        pos = line_end
    nm = b"".join(n.encode() + b"\x00" for n in names)
    out = out_path or path + ".tbi"
    body = b"TBI\x01" + struct.pack(
        "<8i", len(names), 2, 1, 2, 0, ord("#"), 0, len(nm)
    ) + nm
    for bins in refs:
        body += _pack_bins(bins, csi=False)
        body += struct.pack("<i", 0)  # empty linear index
    with gzip.open(out, "wb") as f:
        f.write(body)
    return out


def index_bcf(
    path: str, out_path: str | None = None, min_shift: int = 14, depth: int = 5
) -> str:
    """Build a .csi for a BGZF BCF file. Returns the index path."""
    pay = _BgzfPayload(path)
    buf = bytes(pay.payload)
    if buf[:3] != b"BCF":
        raise ValueError(f"{path}: not a BCF file")
    (l_text,) = struct.unpack_from("<I", buf, 5)
    pos = 9 + l_text
    n_contigs = buf[9 : 9 + l_text].count(b"##contig=<ID=")
    refs: list[dict[int, list[tuple[int, int]]]] = [{} for _ in range(n_contigs)]
    while pos + 8 <= len(buf):
        l_shared, l_indiv = struct.unpack_from("<II", buf, pos)
        rec_end = pos + 8 + l_shared + l_indiv
        rid, p0, rlen = struct.unpack_from("<iii", buf, pos + 8)
        if 0 <= rid < n_contigs and p0 >= 0:
            _add_chunk(
                refs[rid],
                _csi_bin(p0, p0 + max(rlen, 1), min_shift, depth),
                pay.voffset(pos),
                pay.voffset(rec_end),
            )
        pos = rec_end
    out = out_path or path + ".csi"
    body = b"CSI\x01" + struct.pack("<3i", min_shift, depth, 0)
    body += struct.pack("<i", n_contigs)
    for bins in refs:
        body += _pack_bins(bins, csi=True)
    with gzip.open(out, "wb") as f:
        f.write(body)
    return out
