"""Pure-Python image codec (BMP/PNG) + the DataFrame-level decode/resize
operators. No reference analog — the reference has no media surface; these
back the beyond-reference multimodal contract (q75/q76)."""

import numpy as np
import pytest

from exon_duckdb_spark.operators import decode_image, resize_image
from exon_duckdb_spark.operators import imagecodec as ic


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


class TestBmp:
    @pytest.mark.parametrize("shape", [(1, 1, 3), (5, 4, 3), (16, 19, 3), (7, 2, 3)])
    def test_roundtrip_24bit(self, shape):
        # widths chosen so row padding (stride % 4) varies
        a = _rand(shape)
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(a)), a)

    def test_decode_32bit_and_topdown(self):
        import struct

        h, w = 3, 2
        bgra = _rand((h, w, 4), seed=3)
        # top-down: negative height, rows in natural order
        pix = bgra.tobytes()
        hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(pix), 0, 0, 0, 0)
        d = ic.decode_bmp(hdr + dib + pix)
        assert np.array_equal(d, bgra[:, :, [2, 1, 0, 3]])

    def test_rejects_compressed_and_garbage(self):
        with pytest.raises(ValueError):
            ic.decode_bmp(b"nonsense")
        a = bytearray(ic.encode_bmp(_rand((4, 4, 3))))
        a[30] = 1  # BI_RLE8
        with pytest.raises(ValueError, match="compression"):
            ic.decode_bmp(bytes(a))


class TestPng:
    @pytest.mark.parametrize("shape", [(7, 5), (7, 5, 2), (7, 5, 3), (7, 5, 4)])
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_roundtrip_all_color_types_and_filters(self, shape, ft):
        a = _rand(shape, seed=ft)
        out = ic.decode_png(ic.encode_png(a, filter_type=ft))
        exp = a if a.ndim == 3 else a[:, :, None]
        assert np.array_equal(out, exp)

    def test_deterministic_bytes(self):
        a = _rand((6, 6, 3), seed=9)
        assert ic.encode_png(a) == ic.encode_png(a)
        assert ic.encode_bmp(a) == ic.encode_bmp(a)

    def test_rejects_interlaced_and_bad_depth(self):
        import struct
        import zlib

        def chunk(t, p):
            return (
                struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
            )

        # Adam7 (interlace=1) is SUPPORTED since round 8 — an unknown
        # interlace method must still be rejected, as must a stream with
        # no IDAT even when the header is valid
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)  # method 2: bogus
        blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        with pytest.raises(ValueError, match="interlace method"):
            ic.decode_png(blob)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
        blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        with pytest.raises(ValueError, match="IDAT"):
            ic.decode_png(blob)


class TestResize:
    def test_floor_index_map(self):
        a = _rand((10, 12, 3), seed=1)
        r = ic.resize_nearest(a, 5, 4)
        assert r.shape == (4, 5, 3)
        for y in range(4):
            for x in range(5):
                assert np.array_equal(r[y, x], a[(y * 10) // 4, (x * 12) // 5])

    def test_upscale(self):
        a = _rand((2, 2, 3), seed=2)
        r = ic.resize_nearest(a, 4, 4)
        assert np.array_equal(r[0, 0], a[0, 0]) and np.array_equal(r[3, 3], a[1, 1])


class TestDataFrameOps:
    def test_decode_image_mixed_formats(self, spark):
        a = _rand((4, 6, 3), seed=5)
        rows = [
            (1, bytearray(ic.encode_bmp(a))),
            (2, bytearray(ic.encode_png(a, filter_type=3))),
            (3, bytearray(b"\xff\xd8\xff\xe0\x00\x04 truncated jpeg")),
        ]
        df = spark.createDataFrame(rows, "id long, content binary")
        got = {r["id"]: r for r in decode_image(df).collect()}
        for i in (1, 2):
            r = got[i]
            assert (r["width"], r["height"], r["channels"]) == (6, 4, 3)
            assert r["error"] is None
            assert np.array_equal(
                np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(4, 6, 3), a
            )
        assert got[3]["pixels"] is None and "JPEG" in got[3]["error"]

    def test_resize_image_preserves_format(self, spark):
        a = _rand((9, 7, 3), seed=6)
        df = spark.createDataFrame(
            [(1, bytearray(ic.encode_bmp(a))), (2, bytearray(ic.encode_png(a)))],
            "id long, content binary",
        )
        out = {r["id"]: r for r in resize_image(df, width=3, height=4).collect()}
        exp = ic.resize_nearest(a, 3, 4)
        b1 = bytes(out[1]["content"])
        b2 = bytes(out[2]["content"])
        assert b1[:2] == b"BM" and b2.startswith(b"\x89PNG")
        assert np.array_equal(ic.decode_bmp(b1), exp)
        assert np.array_equal(ic.decode_png(b2), exp)


class TestWavCodec:
    def test_roundtrip_16bit(self, spark):
        from exon_duckdb_spark.operators.multimodal import decode_wav, encode_wav

        s = (np.arange(100, dtype=np.int64) * 997 % 65536 - 32768).astype(np.int16)
        rate, ch, got = decode_wav(encode_wav(s, 44100, channels=2))
        assert (rate, ch) == (44100, 2)
        assert np.array_equal(got, s)

    def test_8bit_pcm_widens(self):
        import struct

        from exon_duckdb_spark.operators.multimodal import decode_wav

        data = bytes([0, 128, 255])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, s = decode_wav(blob)
        assert list(s) == [(-128) << 8, 0, 127 << 8]

    def test_rejects_non_pcm(self):
        import struct

        from exon_duckdb_spark.operators.multimodal import decode_wav

        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # mp3-in-wav
        body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", 0)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="G.711 only"):
            decode_wav(blob)

    def test_decode_audio_dataframe_op(self, spark):
        from exon_duckdb_spark.operators import decode_audio
        from exon_duckdb_spark.operators.multimodal import encode_wav

        s = (np.arange(40, dtype=np.int64) * 31 % 65536 - 32768).astype(np.int16)
        rows = [
            (1, bytearray(encode_wav(s, 16000))),
            (2, bytearray(b"RIFF garbage not wave")),
        ]
        df = spark.createDataFrame(rows, "id long, content binary")
        got = {r["id"]: r for r in decode_audio(df).collect()}
        assert got[1]["sample_rate"] == 16000 and got[1]["n_samples"] == 40
        assert np.array_equal(
            np.frombuffer(bytes(got[1]["samples"]), np.dtype("<i2")), s
        )
        assert got[2]["samples"] is None and got[2]["error"] is not None


class TestGif:
    @staticmethod
    def _paletted(shape, n_colors=37, seed=11):
        rng = np.random.RandomState(seed)
        palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        return palette[rng.randint(0, n_colors, shape)]

    @pytest.mark.parametrize("shape", [(1, 1), (7, 9), (16, 16), (31, 3)])
    def test_roundtrip(self, shape):
        a = self._paletted(shape)
        assert np.array_equal(ic.decode_gif(ic.encode_gif(a)), a)

    def test_lzw_table_growth_path(self):
        # enough repeated runs that the decoder's table-building (incl.
        # width bumps past 2^width entries in the decode table) is exercised
        a = np.tile(self._paletted((4, 4), n_colors=200, seed=3), (16, 16, 1))
        assert np.array_equal(ic.decode_gif(ic.encode_gif(a)), a)

    def test_interlaced_decode(self):
        # store rows in GIF interlace pass order, flip the interlace bit,
        # and expect the decoder to restore display order
        a = self._paletted((13, 5), seed=7)
        h = a.shape[0]
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        blob = bytearray(ic.encode_gif(a[order]))
        import struct

        packed = blob[10]
        gct_len = 3 * (2 << (packed & 7))
        ipacked_off = 13 + gct_len + 9
        assert blob[13 + gct_len] == 0x2C
        blob[ipacked_off] |= 0x40
        assert np.array_equal(ic.decode_gif(bytes(blob)), a)

    def test_too_many_colors_rejected(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)  # ~1024 colors
        with pytest.raises(ValueError, match="256"):
            ic.encode_gif(a)

    def test_dataframe_decode_and_resize(self, spark):
        a = self._paletted((10, 8), seed=9)
        df = spark.createDataFrame(
            [(1, bytearray(ic.encode_gif(a)))], "id long, content binary"
        )
        r = decode_image(df).collect()[0]
        assert (r["width"], r["height"], r["channels"]) == (8, 10, 3)
        assert np.array_equal(
            np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(10, 8, 3), a
        )
        rs = resize_image(df, width=4, height=5).collect()[0]
        out = bytes(rs["content"])
        assert out[:4] == b"GIF8"
        assert np.array_equal(ic.decode_gif(out), ic.resize_nearest(a, 4, 5))


class TestJpeg:
    """Baseline JPEG codec (jpegcodec.py). Correctness strategy: the
    entropy layer is proven lossless against a no-entropy simulation, the
    IDCT against a direct O(N^4) DCT-III sum, and DC-only images (constant
    8x8 blocks, even offsets from 128 at quality 50) roundtrip EXACTLY —
    the property the driver oracle (q75 image pipeline) relies on."""

    @staticmethod
    def _dc_only(h, w, salt=0):
        img = np.zeros((h, w), np.uint8)
        for by in range(-(-h // 8)):
            for bx in range(-(-w // 8)):
                v = 128 + 2 * ((bx * 5 + by * 11 + salt) % 60 - 30)
                img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
        return img

    def test_dc_only_exact_roundtrip(self):
        from exon_duckdb_spark.operators import jpegcodec as J

        for h, w, salt in ((24, 32, 0), (16, 16, 7), (8, 40, 13)):
            img = self._dc_only(h, w, salt)
            dec = J.decode_jpeg(J.encode_jpeg(img, quality=50))
            assert dec.shape == (h, w, 1)
            assert np.array_equal(dec[:, :, 0], img)

    def test_entropy_layer_lossless(self):
        # decode(encode(x)) must equal dequant(quant(dct(x)))+idct exactly:
        # huffman+RLE+DC-prediction is invertible; only quantization loses.
        from exon_duckdb_spark.operators import jpegcodec as J

        rng = np.random.RandomState(11)
        for q in (10, 50, 90, 100):
            img = rng.randint(0, 256, (29, 37)).astype(np.uint8)
            dec = J.decode_jpeg(J.encode_jpeg(img, q))[:, :, 0]
            qt, _ = J._quality_tables(q)
            zz, by, bx = J._plane_to_zz(img.astype(np.float64), qt)
            nat = (zz * qt.reshape(64)[J._ZIGZAG])[:, J._UNZIGZAG]
            blocks = J._idct(nat.reshape(-1, 8, 8).astype(np.float64))
            plane = (
                blocks.reshape(by, bx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(by * 8, bx * 8)
            )
            sim = np.clip(
                np.round(plane[: img.shape[0], : img.shape[1]] + 128), 0, 255
            ).astype(np.uint8)
            assert np.array_equal(dec, sim), f"entropy layer lossy at q={q}"

    def test_idct_matches_direct_sum(self):
        from exon_duckdb_spark.operators import jpegcodec as J

        rng = np.random.RandomState(5)
        blk = rng.standard_normal((1, 8, 8)) * 50
        ref = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                        cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                        s += (
                            0.25
                            * cu
                            * cv
                            * blk[0, u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                ref[x, y] = s
        assert np.abs(J._idct(blk)[0] - ref).max() < 1e-10
        assert np.abs(J._idct(J._fdct(blk))[0] - blk[0]).max() < 1e-10

    def test_smooth_roundtrip_error_bounded(self):
        from exon_duckdb_spark.operators import jpegcodec as J

        x, y = np.arange(40), np.arange(56)
        sm = (128 + 50 * np.sin(x[None, :] / 8.0) * np.cos(y[:, None] / 9.0)).astype(
            np.uint8
        )
        dec = J.decode_jpeg(J.encode_jpeg(sm, 90))[:, :, 0]
        assert np.abs(dec.astype(int) - sm.astype(int)).max() <= 4

    def test_color_444_and_420(self):
        from exon_duckdb_spark.operators import jpegcodec as J

        c = np.zeros((19, 21, 3), np.uint8)  # odd dims exercise padding/crop
        c[:, :, 0] = (np.arange(21)[None, :] * 3 + 40) % 200
        c[:, :, 1] = 100
        c[:, :, 2] = (np.arange(19)[:, None] * 5 + 30) % 200
        for sub in ("444", "420"):
            dec = J.decode_jpeg(J.encode_jpeg(c, 85, subsampling=sub))
            assert dec.shape == (19, 21, 3)
            assert np.abs(dec.astype(int) - c.astype(int)).max() <= 16

    def test_restart_markers_decode_identically(self):
        from exon_duckdb_spark.operators import jpegcodec as J

        rng = np.random.RandomState(3)
        g = (
            128
            + 40 * np.sin(np.arange(48)[None, :] / 5) * np.cos(np.arange(40)[:, None] / 7)
        ).astype(np.uint8)
        assert np.array_equal(
            J.decode_jpeg(J.encode_jpeg(g, 80)),
            J.decode_jpeg(J.encode_jpeg(g, 80, restart_interval=3)),
        )
        c = rng.randint(0, 256, (33, 41, 3)).astype(np.uint8)
        assert np.array_equal(
            J.decode_jpeg(J.encode_jpeg(c, 75, "420")),
            J.decode_jpeg(J.encode_jpeg(c, 75, "420", restart_interval=2)),
        )

    def test_progressive_decodes_identical_to_sequential(self):
        """SOF2 spectral selection + one level of successive approximation:
        the quantized coefficients are the same as the sequential stream,
        so decoded pixels must match bit-for-bit across gray/color, odd
        dims, both subsamplings, and a quality sweep."""
        from exon_duckdb_spark.operators import jpegcodec as J

        rng = np.random.RandomState(11)
        cases = [
            (rng.randint(0, 256, (16, 24)).astype(np.uint8), "444", 50),
            (rng.randint(0, 256, (9, 13)).astype(np.uint8), "444", 90),
            (rng.randint(0, 256, (22, 31, 3)).astype(np.uint8), "444", 75),
            (rng.randint(0, 256, (21, 19, 3)).astype(np.uint8), "420", 60),
        ]
        for img, sub, q in cases:
            seq = J.decode_jpeg(J.encode_jpeg(img, q, subsampling=sub))
            pro = J.decode_jpeg(J.encode_jpeg(img, q, subsampling=sub, progressive=True))
            assert np.array_equal(seq, pro), (img.shape, sub, q)

    def test_progressive_dc_exact_plant(self):
        """The DC-exact plant family (constant 8x8 blocks, even offsets at
        quality 50) must roundtrip EXACTLY through the progressive layout
        too — DC first at Al=1 plus one refinement bit reassembles the
        full DC value."""
        from exon_duckdb_spark.operators import jpegcodec as J

        img = self._dc_only(32, 24)
        dec = J.decode_jpeg(J.encode_jpeg(img, 50, progressive=True))
        assert np.array_equal(dec[:, :, 0], img)

    def test_progressive_restart_markers_reset_state(self):
        """Hand-assembled SOF2 stream with DRI=2: RSTn between MCU pairs in
        BOTH the DC scan (predictor must reset — without the reset blk2's
        DC becomes 6 and its pixels decode 129, not 128) and the AC scan
        (eobrun must reset). Discriminating by construction."""
        import struct as st

        from exon_duckdb_spark.operators import jpegcodec as J

        def seg(marker, body):
            return bytes([0xFF, marker]) + st.pack(">H", 2 + len(body)) + body

        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes([1] * 64))
        out += seg(0xC2, st.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
        out += seg(0xC4, bytes([0x00]) + bytes([0, 3] + [0] * 14) + bytes([0, 1, 2]))
        out += seg(0xC4, bytes([0x10]) + bytes([0, 3] + [0] * 14) + bytes([0x00, 0x10, 0x01]))
        out += seg(0xDD, st.pack(">H", 2))  # restart interval 2
        # DC scan: per half, blk diff=3 (sym 2 = code '10', bits '11') then
        # diff=0 (sym 0 = '00'); predictor resets at RST0
        half = "10" + "11" + "00"
        pad = (8 - len(half) % 8) % 8
        ec = int(half + "1" * pad, 2).to_bytes((len(half) + pad) // 8, "big")
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
        out += ec + b"\xff\xd0" + ec
        # AC scan: 2 EOBs per half, RST1 between
        acb = "0000"
        pad = (8 - len(acb) % 8) % 8
        eca = int(acb + "1" * pad, 2).to_bytes((len(acb) + pad) // 8, "big")
        out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
        out += eca + b"\xff\xd1" + eca
        out += b"\xff\xd9"
        dec = J.decode_jpeg(bytes(out))
        assert dec.shape == (8, 32, 1)
        # DC=3 everywhere (quant 1): 128 + 3/8 -> 128 in every block; a
        # missed predictor reset yields DC=6 -> 129 in the second half
        assert set(np.unique(dec)) == {128}

    def test_progressive_eobrun_spans_blocks(self):
        """Hand-assembled SOF2 stream with a custom AC table carrying the
        EOBRUN-length-2 symbol (0x10), covering the eobrun>1 decode path
        the in-repo encoder never emits (K.3 tables stop at EOB)."""
        import struct as st

        from exon_duckdb_spark.operators import jpegcodec as J

        def seg(marker, body):
            return bytes([0xFF, marker]) + st.pack(">H", 2 + len(body)) + body

        # all-ones quant table (zigzag order = natural for constant 1s)
        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes([1] * 64))
        # SOF2: 8-bit, 24 high, 16 wide, 1 comp (id 1, 1x1 sampling, qt 0)
        out += seg(0xC2, st.pack(">BHHB", 8, 24, 16, 1) + bytes([1, 0x11, 0]))
        # DC table: symbols 0..2 at length 2 (canonical)
        out += seg(0xC4, bytes([0x00]) + bytes([0, 3] + [0] * 14) + bytes([0, 1, 2]))
        # AC table: symbols {0x00 EOB, 0x10 EOBRUN2-3, 0x01 run0/size1} at len 2
        out += seg(0xC4, bytes([0x10]) + bytes([0, 3] + [0] * 14) + bytes([0x00, 0x10, 0x01]))
        # DC first scan (Al=0): six blocks (3x2 grid), all diffs 0 -> DC=0.
        # Canonical codes at length 2 for 3 symbols: 00->sym0, 01->sym1, 10->sym2.
        dc_bits = "00" * 6
        pad = (8 - len(dc_bits) % 8) % 8
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
        out += int(dc_bits + "1" * pad, 2).to_bytes((len(dc_bits) + pad) // 8, "big")
        # AC first scan (Ss=1 Se=63 Al=0): block0 coef k=1 -> +1;
        # then EOBRUN symbol 0x10 + 1 appended bit '1' -> run of 3 blocks;
        # then block4 coef k=1 -> -1; block5 EOB (0x00).
        # codes: 00=EOB(0x00), 01=0x10, 10=0x01
        ac_bits = (
            "10" + "1"          # blk0: (run0,size1) value bit 1 -> +1, k=2
            + "00"              #       EOB closes blk0
            + "01" + "1"        # EOBRUN: (1<<1) + 1 = 3 blocks (blk1..3)
            + "10" + "0"        # blk4: (run0,size1) value bit 0 -> -1
            + "00"              #       EOB closes blk4
            + "00"              # blk5: EOB (empty)
        )
        pad = (8 - len(ac_bits) % 8) % 8
        out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
        out += int(ac_bits + "1" * pad, 2).to_bytes((len(ac_bits) + pad) // 8, "big")
        out += b"\xff\xd9"
        dec = J.decode_jpeg(bytes(out))
        assert dec.shape == (24, 16, 1)
        # rebuild expectation: per block, zigzag coef 1 (natural (0,1)) = v
        blocks = {0: 1, 4: -1}  # block index (row-major 3 rows x 2 cols) -> coef
        coefs = np.zeros((6, 64), np.int64)
        for bi, v in blocks.items():
            coefs[bi, 1] = v
        nat = coefs[:, J._UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        px = J._idct(nat)
        want = (
            px.reshape(3, 2, 8, 8).transpose(0, 2, 1, 3).reshape(24, 16)
        )
        want = np.clip(np.round(want + 128.0), 0, 255).astype(np.uint8)
        assert np.array_equal(dec[:, :, 0], want)

    def test_deterministic_bytes(self):
        from exon_duckdb_spark.operators import jpegcodec as J

        rng = np.random.RandomState(9)
        c = rng.randint(0, 256, (12, 14, 3)).astype(np.uint8)
        assert J.encode_jpeg(c, 70) == J.encode_jpeg(c, 70)

    def test_dataframe_decode_and_resize(self, spark):
        from exon_duckdb_spark.operators import jpegcodec as J

        img = self._dc_only(16, 24, salt=4)
        df = spark.createDataFrame(
            [(1, bytearray(J.encode_jpeg(img, 50)))], "id long, content binary"
        )
        r = decode_image(df).collect()[0]
        assert (r["width"], r["height"], r["channels"]) == (24, 16, 1)
        assert r["error"] is None
        assert np.array_equal(
            np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(16, 24), img
        )
        rs = resize_image(df, width=12, height=8).collect()[0]
        out = bytes(rs["content"])
        assert out[:3] == b"\xff\xd8\xff"  # format preserved
        # resize of a DC-only image keeps 8x8-constant blocks only by
        # accident; assert the lossy re-encode stays near the true resample
        exp = ic.resize_nearest(img[:, :, None], 12, 8)[:, :, 0]
        got = ic.decode_blob(out)[:, :, 0]
        assert np.abs(got.astype(int) - exp.astype(int)).max() <= 12


class TestAdam7:
    """Adam7-interlaced PNG (round 8 stub→real): the decoder reassembles
    the 7 reduced images scattered on the ISO 15948 §8.2 grid; the
    encoder writes the matching pass sequence so roundtrips pin both."""

    def test_interlaced_roundtrip_all_filters_and_shapes(self):
        import numpy as np

        from exon_duckdb_spark.operators import imagecodec as ic

        rng = np.random.default_rng(5)
        # shapes straddle every pass-emptiness case: 1x1 only touches
        # pass 1; 3x2/9x13 leave several passes empty or 1-wide
        for shape in [(1, 1, 1), (7, 5, 3), (16, 16, 4), (9, 13, 2), (3, 2, 1)]:
            arr = rng.integers(0, 256, shape, dtype=np.uint8)
            for ft in (0, 1, 2, 3, 4):
                blob = ic.encode_png(arr, filter_type=ft, interlace=True)
                assert blob[8 + 8 + 12] == 1  # IHDR interlace byte set
                back = ic.decode_blob(blob)
                assert np.array_equal(back, arr), (shape, ft)

    def test_interlaced_differs_from_sequential_stream_same_pixels(self):
        import numpy as np

        from exon_duckdb_spark.operators import imagecodec as ic

        arr = (np.arange(8 * 8 * 3, dtype=np.uint8)).reshape(8, 8, 3)
        seq = ic.encode_png(arr)
        inter = ic.encode_png(arr, interlace=True)
        assert seq != inter  # genuinely different wire layout
        assert np.array_equal(ic.decode_blob(seq), ic.decode_blob(inter))

    def test_truncated_interlaced_data_rejected(self):
        import struct
        import zlib

        import numpy as np

        from exon_duckdb_spark.operators import imagecodec as ic

        arr = np.zeros((8, 8, 1), np.uint8)
        blob = ic.encode_png(arr, interlace=True)
        # shrink the zlib payload: re-deflate a truncated raw stream
        i = 8
        parts = {}
        while i + 8 <= len(blob):
            length, typ = struct.unpack_from(">I4s", blob, i)
            parts[typ] = blob[i + 8 : i + 8 + length]
            i += 12 + length
        raw = zlib.decompress(parts[b"IDAT"])
        bad = (
            blob[:8]
            + blob[8 : 8 + 12 + 13]  # IHDR chunk intact
        )
        crc = zlib.crc32
        short = zlib.compress(raw[: len(raw) - 5])
        bad += (
            struct.pack(">I", len(short)) + b"IDAT" + short
            + struct.pack(">I", crc(b"IDAT" + short) & 0xFFFFFFFF)
        )
        bad += struct.pack(">I", 0) + b"IEND" + struct.pack(">I", crc(b"IEND") & 0xFFFFFFFF)
        with pytest.raises(ValueError):
            ic.decode_png(bad)


class TestGifAnimation:
    """Animated-GIF compositing (round 8): multi-frame decode with GCE
    delay/transparency/disposal semantics, pinned against a hand-built
    animation whose expected canvases are computed by hand."""

    @staticmethod
    def _lzw(indices, min_code_size):
        clear = 1 << min_code_size
        eoi = clear + 1
        width = min_code_size + 1
        buf = bytearray()
        acc = nbits = 0

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                buf.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        budget = (1 << width) - eoi - 2
        for px in indices:
            if budget == 0:
                emit(clear)
                budget = (1 << width) - eoi - 2
            emit(int(px))
            budget -= 1
        emit(eoi)
        if nbits:
            buf.append(acc & 0xFF)
        return bytes(buf)

    def _build(self):
        """4x4 screen, global 4-color palette (bg=idx3=white):
        frame1: full 4x4 of color 0 (disposal 3, delay 5)
        frame2: 2x2 patch at (1,1) color 1 with idx2 transparent holes
                (disposal 2, delay 8)
        frame3: 1x1 at (0,0) color 2 (disposal 0, delay 0)
        """
        import struct as st

        pal = bytes([10, 0, 0,  0, 20, 0,  0, 0, 30,  255, 255, 255])
        out = bytearray(b"GIF89a")
        out += st.pack("<HHBBB", 4, 4, 0x80 | 1, 3, 0)  # GCT 4 colors, bg=3
        out += pal

        def gce(disposal, delay, transp=None):
            flags = (disposal << 2) | (1 if transp is not None else 0)
            return st.pack("<BBBBHBB", 0x21, 0xF9, 4, flags, delay,
                           transp if transp is not None else 0, 0)

        def img(left, top, w, h, idxs):
            o = st.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
            o += bytes([2])  # min code size
            data = self._lzw(idxs, 2)
            for off in range(0, len(data), 255):
                chunk = data[off : off + 255]
                o += bytes([len(chunk)]) + chunk
            return o + b"\x00"

        out += gce(3, 5) + img(0, 0, 4, 4, [0] * 16)
        out += gce(2, 8, transp=2) + img(1, 1, 2, 2, [1, 2, 2, 1])
        out += gce(0, 0) + img(0, 0, 1, 1, [2])
        out += b"\x3b"
        return bytes(out)

    def test_compositing_disposal_transparency(self):
        import numpy as np

        from exon_duckdb_spark.operators import imagecodec as ic

        delays, frames = ic.decode_gif_frames(self._build())
        assert delays == [5, 8, 0]
        W = [255, 255, 255]
        C0, C1, C2 = [10, 0, 0], [0, 20, 0], [0, 0, 30]
        # frame1: full C0
        assert np.array_equal(frames[0], np.array([[C0] * 4] * 4, np.uint8))
        # frame1 had disposal 3 (restore previous = white canvas), so
        # frame2 composites onto WHITE: patch at (1,1): (0,0)=C1,
        # (1,1)=C1, the idx-2 holes stay white
        want2 = np.array([[W] * 4] * 4, np.uint8)
        want2[1][1] = C1
        want2[2][2] = C1
        assert np.array_equal(frames[1], want2)
        # frame2 had disposal 2 (region -> bg=white, a no-op on white);
        # frame3 paints one C2 pixel at the origin
        want3 = np.array([[W] * 4] * 4, np.uint8)
        want3[0][0] = C2
        assert np.array_equal(frames[2], want3)

    def test_animation_roundtrip(self):
        import numpy as np

        from exon_duckdb_spark.operators import imagecodec as ic

        rng = np.random.default_rng(11)
        frames = [
            (rng.integers(0, 4, (6, 5, 1)).repeat(3, axis=2) * 60).astype(np.uint8)
            for _ in range(4)
        ]
        blob = ic.encode_gif_frames(frames, delay_cs=7)
        delays, back = ic.decode_gif_frames(blob)
        assert delays == [7] * 4 and len(back) == 4
        for a, b in zip(frames, back):
            assert np.array_equal(a, b)
        # the single-frame decoder still reads frame 0 of an animation
        assert np.array_equal(ic.decode_gif(blob), frames[0])


class TestPngDepthsAndPalette:
    """Round-8 PNG coverage extension: palette color type 3 (+ tRNS
    alpha), sub-byte gray/palette depths 1/2/4, and 16-bit with the
    documented high-byte reduction — all hand-built streams, so the
    decoder is pinned against the spec layout rather than the encoder."""

    @staticmethod
    def _png(ihdr, chunks):
        import struct
        import zlib

        def chunk(t, p):
            return (
                struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
            )

        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + b"".join(chunk(t, p) for t, p in chunks)
            + chunk(b"IEND", b"")
        )

    def test_palette8_with_and_without_trns(self):
        import struct
        import zlib

        import numpy as np

        rng = np.random.default_rng(2)
        h, w = 5, 6
        pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        idx = rng.integers(0, 7, (h, w), dtype=np.uint8)
        rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        blob = self._png(ihdr, [
            (b"PLTE", pal.tobytes()), (b"tRNS", bytes([10, 20, 30])),
            (b"IDAT", zlib.compress(rows)),
        ])
        out = ic.decode_png(blob)
        assert out.shape == (h, w, 4)
        want_a = np.full(7, 255, np.uint8)
        want_a[:3] = [10, 20, 30]
        assert np.array_equal(out[:, :, :3], pal[idx])
        assert np.array_equal(out[:, :, 3], want_a[idx])
        rgb = ic.decode_png(self._png(ihdr, [
            (b"PLTE", pal.tobytes()), (b"IDAT", zlib.compress(rows))]))
        assert rgb.shape == (h, w, 3) and np.array_equal(rgb, pal[idx])
        with pytest.raises(ValueError, match="PLTE"):
            ic.decode_png(self._png(ihdr, [(b"IDAT", zlib.compress(rows))]))

    def test_palette4_and_gray1_bit_unpacking(self):
        import struct
        import zlib

        import numpy as np

        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        idx4 = rng.integers(0, 7, (3, 5), dtype=np.uint8)
        rows = []
        for y in range(3):
            bits = np.unpackbits(idx4[y][:, None], axis=1)[:, 4:]
            flat = np.concatenate(bits)
            flat = np.concatenate([flat, np.zeros((-len(flat)) % 8, np.uint8)])
            rows.append(b"\x00" + np.packbits(flat).tobytes())
        ihdr = struct.pack(">IIBBBBB", 5, 3, 4, 3, 0, 0, 0)
        out = ic.decode_png(self._png(ihdr, [
            (b"PLTE", pal.tobytes()),
            (b"IDAT", zlib.compress(b"".join(rows)))]))
        assert np.array_equal(out, pal[idx4])

        g = rng.integers(0, 2, (4, 10), dtype=np.uint8)
        rows1 = []
        for y in range(4):
            flat = np.concatenate([g[y], np.zeros((-10) % 8, np.uint8)])
            rows1.append(b"\x00" + np.packbits(flat).tobytes())
        ihdr1 = struct.pack(">IIBBBBB", 10, 4, 1, 0, 0, 0, 0)
        out1 = ic.decode_png(self._png(ihdr1, [
            (b"IDAT", zlib.compress(b"".join(rows1)))]))
        assert np.array_equal(out1[:, :, 0], g * 255)  # full-range scale

    def test_16bit_high_byte_reduction(self):
        import struct
        import zlib

        import numpy as np

        rng = np.random.default_rng(4)
        a16 = rng.integers(0, 65536, (3, 4, 3), dtype=np.uint16)
        rows = b"".join(
            b"\x00" + a16[y].astype(">u2").tobytes() for y in range(3)
        )
        ihdr = struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0)
        out = ic.decode_png(self._png(ihdr, [(b"IDAT", zlib.compress(rows))]))
        assert np.array_equal(out, (a16 >> 8).astype(np.uint8))

    def test_invalid_depth_combo_rejected(self):
        import struct

        ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # RGB depth 4
        with pytest.raises(ValueError, match="bit depth"):
            ic.decode_png(self._png(ihdr, []))


class TestTiff:
    """Baseline TIFF 6.0 (round 8): either byte order, 8-bit gray/RGB,
    uncompressed or PackBits strips, WhiteIsZero inversion. The encoder
    is the repo's own minimal muxer, so a hand-built big-endian stream
    pins the decoder against the spec rather than the muxer."""

    def test_roundtrip_strips_and_packbits(self):
        rng = np.random.RandomState(6)
        for shape in [(5, 7, 3), (4, 9, 1), (1, 1, 3), (16, 3, 1)]:
            a = rng.randint(0, 256, shape).astype(np.uint8)
            for pb in (False, True):
                for rps in (None, 2):
                    blob = ic.encode_tiff(a, packbits=pb, rows_per_strip=rps)
                    assert np.array_equal(ic.decode_blob(blob), a), (shape, pb, rps)
        flat = np.full((20, 20, 1), 7, np.uint8)
        assert len(ic.encode_tiff(flat, packbits=True)) < len(ic.encode_tiff(flat))

    def test_big_endian_white_is_zero(self):
        import struct

        g = np.array([[0, 100], [200, 255]], np.uint8)
        data = g.tobytes()
        # hand-built MM stream: gray 2x2, Photometric 0 (WhiteIsZero)
        def entry(tag, typ, count, val4):
            return struct.pack(">HHI", tag, typ, count) + val4

        ifd = struct.pack(">H", 7)
        ifd += entry(256, 3, 1, struct.pack(">HH", 2, 0))
        ifd += entry(257, 3, 1, struct.pack(">HH", 2, 0))
        ifd += entry(259, 3, 1, struct.pack(">HH", 1, 0))
        ifd += entry(262, 3, 1, struct.pack(">HH", 0, 0))  # WhiteIsZero
        data_off = 8 + 2 + 7 * 12 + 4
        ifd += entry(273, 4, 1, struct.pack(">I", data_off))
        ifd += entry(278, 3, 1, struct.pack(">HH", 2, 0))
        ifd += entry(279, 4, 1, struct.pack(">I", len(data)))
        ifd += struct.pack(">I", 0)
        blob = b"MM\x00*" + struct.pack(">I", 8) + ifd + data
        out = ic.decode_tiff(blob)
        assert np.array_equal(out[:, :, 0], 255 - g)

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError):
            ic.decode_tiff(b"II+\x00\x08\x00\x00\x00")  # BigTIFF magic 43
        a = np.zeros((2, 2, 3), np.uint8)
        blob = bytearray(ic.encode_tiff(a))
        # flip compression tag (259) value to 7 (TIFF-JPEG, unsupported;
        # 5=LZW became supported in round 8) — entry order is fixed by
        # the encoder: tag index 3
        off = 8 + 2 + 3 * 12 + 8
        blob[off] = 7
        with pytest.raises(ValueError, match="compression"):
            ic.decode_tiff(bytes(blob))


def test_tiff_through_dataframe_ops(spark):
    """TIFF rides the same decode/resize operators as the other formats:
    mime sniffed, pixels decoded, resize re-encodes as TIFF."""
    a = _rand((6, 8, 3), seed=9)
    df = spark.createDataFrame(
        [(1, bytearray(ic.encode_tiff(a, packbits=True)))],
        "id long, content binary",
    )
    got = decode_image(df).collect()[0]
    assert (got["width"], got["height"], got["channels"]) == (8, 6, 3)
    assert np.array_equal(
        np.frombuffer(bytes(got["pixels"]), np.uint8).reshape(6, 8, 3), a
    )
    out = resize_image(df, width=4, height=3).collect()[0]
    blob = bytes(out["content"])
    assert blob[:4] == b"II*\x00"
    assert np.array_equal(ic.decode_tiff(blob), ic.resize_nearest(a, 4, 3))


class TestBmpPaletteRle:
    """8-bit palettized BMP, uncompressed and BI_RLE8 (round 8): runs,
    absolute mode with word padding, EOL/EOB escapes, delta jumps."""

    @staticmethod
    def _bmp8(width, height, palette, body, compression):
        import struct

        pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in palette)
        data_off = 14 + 40 + len(pal)
        hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 8, compression,
            len(body), 0, 0, len(palette), 0,
        )
        return hdr + dib + pal + body

    def test_uncompressed_palette(self):
        pal = [(10, 0, 0), (0, 20, 0), (0, 0, 30), (9, 9, 9)]
        idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
        stride_rows = []
        for y in (1, 0):  # bottom-up
            row = idx[y].tobytes()
            stride_rows.append(row + b"\x00" * ((-len(row)) % 4))
        blob = self._bmp8(3, 2, pal, b"".join(stride_rows), 0)
        out = ic.decode_bmp(blob)
        assert np.array_equal(out, np.array(pal, np.uint8)[idx])

    def test_rle8_runs_absolute_delta(self):
        pal = [(i, 2 * i, 3 * i) for i in range(8)]
        # 6x3 image, bottom-up rows:
        # stream row0 (image bottom): run 4x idx1, abs [2,3] (padded), EOL
        # stream row1: delta (2,0) skips 2 → abs [4,5,6] pad, run 1x7, EOL
        # stream row2: run 6x idx0, EOB
        body = bytes(
            [4, 1, 1, 2, 1, 3, 0, 0]        # row 0: run 4x1, 1x2, 1x3
            + [0, 2, 2, 0, 0, 3, 4, 5, 6, 0, 1, 7, 0, 0]  # row 1
            + [6, 0, 0, 1]                   # row 2 + EOB
        )
        out = ic.decode_bmp(self._bmp8(6, 3, pal, body, 1))
        palv = np.array(pal, np.uint8)
        want_idx = np.array(
            [[0, 0, 0, 0, 0, 0],       # top (stream row 2)
             [0, 0, 4, 5, 6, 7],       # middle (delta skipped 2 → zeros)
             [1, 1, 1, 1, 2, 3]],      # bottom (stream row 0)
            np.uint8,
        )
        assert np.array_equal(out, palv[want_idx])


class TestTiffLzw:
    """TIFF LZW (compression 5): MSB-first variable-width codes with the
    spec's EARLY width change, per-strip streams, optional horizontal
    predictor. Streams are hand-encoded so the decoder is pinned against
    the spec, including a real table-growth stream."""

    @staticmethod
    def _lzw_real(raw: bytes) -> bytes:
        bits = []
        width = [9]

        def emit(code):
            for k in range(width[0] - 1, -1, -1):
                bits.append((code >> k) & 1)

        table = {bytes([i]): i for i in range(256)}
        nxt = [258]
        emit(256)
        w = b""
        for ch in raw:
            c = bytes([ch])
            if w + c in table:
                w = w + c
                continue
            emit(table[w])
            table[w + c] = nxt[0]
            nxt[0] += 1
            if nxt[0] == (1 << width[0]) - 1 and width[0] < 12:
                width[0] += 1  # early change
            if nxt[0] >= 4094:
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                nxt[0] = 258
                width[0] = 9
            w = c
        if w:
            emit(table[w])
        emit(257)
        while len(bits) % 8:
            bits.append(0)
        return np.packbits(np.array(bits, np.uint8)).tobytes()

    @staticmethod
    def _tiff(width, height, spp, strip, extra_tags=()):
        import struct

        def entry(tag, typ, count, val4):
            return struct.pack("<HHI", tag, typ, count) + val4

        tags = [
            entry(256, 3, 1, struct.pack("<HH", width, 0)),
            entry(257, 3, 1, struct.pack("<HH", height, 0)),
            entry(259, 3, 1, struct.pack("<HH", 5, 0)),
            entry(262, 3, 1, struct.pack("<HH", 2 if spp == 3 else 1, 0)),
            entry(277, 3, 1, struct.pack("<HH", spp, 0)),
            entry(278, 3, 1, struct.pack("<HH", height, 0)),
            entry(279, 4, 1, struct.pack("<I", len(strip))),
        ] + list(extra_tags)
        n = len(tags) + 1  # + strip offset entry
        data_off = 8 + 2 + n * 12 + 4
        tags.append(entry(273, 4, 1, struct.pack("<I", data_off)))
        return (
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", n)
            + b"".join(sorted(tags)) + struct.pack("<I", 0) + strip
        )

    def test_variable_width_table_growth(self):
        big = (np.arange(4000) % 7).astype(np.uint8).tobytes()
        blob = self._tiff(100, 40, 1, self._lzw_real(big))
        out = ic.decode_tiff(blob)
        assert out.shape == (40, 100, 1) and out.tobytes() == big

    def test_rgb_and_horizontal_predictor(self):
        import struct

        rng = np.random.RandomState(8)
        a = rng.randint(0, 256, (7, 9, 3)).astype(np.uint8)
        blob = self._tiff(9, 7, 3, self._lzw_real(a.tobytes()))
        assert np.array_equal(ic.decode_tiff(blob), a)
        diff = a.astype(np.int16)
        diff[:, 1:, :] = (a[:, 1:, :].astype(np.int16)
                          - a[:, :-1, :].astype(np.int16)) % 256
        pred_tag = (
            struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0),
        )
        blob2 = self._tiff(
            9, 7, 3, self._lzw_real(diff.astype(np.uint8).tobytes()),
            extra_tags=pred_tag,
        )
        assert np.array_equal(ic.decode_tiff(blob2), a)
