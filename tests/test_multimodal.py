"""Multimodal operator tests: codec fallback, decode/resize math,
frame sampling topology, Arrow batch plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from dbm_nca_ph_etl_spark.operators.multimodal import (
    FakeGrayscaleDecoder,
    PILImageDecoder,
    byte_stats,
    resize_images,
    sample_frames,
    synthesize_assets,
)


class TestCodecs:
    def test_pil_unavailable_fails_fast(self):
        with pytest.raises(NotImplementedError):
            PILImageDecoder()

    def test_fake_decode_pad_and_truncate(self):
        d = FakeGrayscaleDecoder()
        meta = {"width": 4, "height": 2}
        px = d.decode(bytes(range(6)), meta)  # 6 bytes into 4x2 → pad 2
        assert px.shape == (2, 4)
        assert px[1].tolist() == [4, 5, 0, 0]
        px2 = d.decode(bytes(range(100)), meta)  # truncate
        assert px2[1].tolist() == [4, 5, 6, 7]
        assert d.encode(px) == bytes([0, 1, 2, 3, 4, 5, 0, 0])


def docs_df(spark):
    texts = [
        (0, "a" * 64),           # image (0 % 3 == 0)
        (1, "bc" * 40),          # audio
        (2, "".join(chr(65 + i % 26) for i in range(256))),  # video
    ]
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t)) for i, t in texts]
    )


class TestOperators:
    def test_synthesize_schema(self, spark):
        a = synthesize_assets(docs_df(spark))
        got = {r.asset_id: r for r in a.collect()}
        assert got[0].modality == "image" and got[0].fmt == "fakegray"
        assert got[2].modality == "video"
        assert bytes(got[0].content) == b"a" * 64
        assert got[0].meta.width == 16 and got[0].meta.height == 4
        assert got[2].meta.n_frames == 4

    def test_byte_stats(self, spark):
        s = {r.asset_id: r for r in byte_stats(synthesize_assets(docs_df(spark))).collect()}
        assert s[0].n_bytes == 64
        assert s[0].mean_byte_micro == ord("a") * 1_000_000
        assert s[0].n_distinct_bytes == 1
        assert s[1].max_byte == ord("c")

    def test_resize_nearest_neighbor(self, spark):
        out = resize_images(synthesize_assets(docs_df(spark)), 8, 8).collect()
        assert len(out) == 1  # only the image asset
        r = out[0]
        assert (r.width, r.height) == (8, 8) and len(bytes(r.content)) == 64
        assert bytes(r.content) == b"a" * 64

    def test_sample_frames(self, spark):
        out = sample_frames(synthesize_assets(docs_df(spark)), every_n=4).collect()
        # only video (asset 2): 4 frames of 64 bytes, every 4th → frame 0
        assert [(r.asset_id, r.frame_idx, r.n_frame_bytes) for r in out] == [(2, 0, 64)]
        frame = "".join(chr(65 + i % 26) for i in range(64)).encode()
        assert out[0].frame_mean_micro == sum(frame) * 1_000_000 // 64


def test_pcm_window_energy_partial_last_frame(spark):
    """A blob whose length is not a multiple of the frame size emits a
    short final frame with the correct sample count and energy."""
    from pyspark.sql import Row

    from dbm_nca_ph_etl_spark.operators.multimodal import pcm_window_energy

    content = bytes([128] * 64 + [130] * 10)  # frame0 silent, frame1 partial
    assets = spark.createDataFrame(
        [Row(asset_id=1, modality="audio", content=content)]
    )
    rows = {r.frame_idx: r for r in pcm_window_energy(assets).collect()}
    assert rows[0].n_samples == 64 and rows[0].energy == 0
    assert rows[1].n_samples == 10 and rows[1].energy == 10 * 4


class TestBmpCodec:
    """REAL image format in-container: the stdlib BMP codec drives
    the same decode → resize → encode pipeline the PIL path would,
    on genuine 24-bit BMP bytes (the minipdf precedent, applied to
    the image leg)."""

    def test_decode_matches_encoded_grid(self):
        import numpy as np

        from dbm_nca_ph_etl_spark.operators.multimodal import BmpDecoder

        d = BmpDecoder()
        g = (np.arange(7 * 5, dtype=np.uint8).reshape(5, 7) * 9) % 256
        assert (d.decode(d.encode(g), None) == g).all()

    def test_rejects_non_bmp_and_unsupported(self):
        import pytest as _pytest

        from dbm_nca_ph_etl_spark.operators.multimodal import BmpDecoder

        with _pytest.raises(ValueError, match="not a BMP"):
            BmpDecoder().decode(b"PNGxxxx", None)

    def test_luma_is_integer_itu601(self):
        import numpy as np
        import struct

        from dbm_nca_ph_etl_spark.operators.multimodal import BmpDecoder

        # hand-build a 1x1 24-bit BMP with B,G,R = (10, 200, 50)
        body = bytes([10, 200, 50, 0])  # one padded row
        header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, len(body), 0, 0, 0, 0)
        px = BmpDecoder().decode(header + info + body, None)
        assert px.shape == (1, 1)
        assert px[0, 0] == (299 * 50 + 587 * 200 + 114 * 10) // 1000

    def test_spark_resize_on_real_bmp_blobs(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from dbm_nca_ph_etl_spark.operators.multimodal import (
            BmpDecoder,
            resize_images,
        )

        d = BmpDecoder()
        grids = {
            1: np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1)),   # 8x8 ramp
            2: (np.arange(16, dtype=np.uint8).reshape(4, 4) * 16),
        }
        assets = spark.createDataFrame(
            [
                Row(
                    asset_id=k,
                    modality="image",
                    fmt="bmp",
                    content=bytearray(d.encode(g)),
                    meta=Row(width=g.shape[1], height=g.shape[0],
                             channels=1, sample_rate=0, n_frames=0),
                )
                for k, g in grids.items()
            ]
        )
        out = {
            r.asset_id: r
            for r in resize_images(assets, 2, 2, decoder=d).collect()
        }
        for k, g in grids.items():
            got = d.decode(bytes(out[k].content), None)
            ys = (np.arange(2) * g.shape[0] / 2).astype(int)
            xs = (np.arange(2) * g.shape[1] / 2).astype(int)
            assert (got == g[np.ix_(ys, xs)]).all(), k


class TestWavAudio:
    """Real RIFF/WAV decode in-container via the stdlib wave module."""

    @staticmethod
    def _wav(samples, width=2, channels=1, rate=8000):
        import io
        import wave

        import numpy as np

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(channels)
            wf.setsampwidth(width)
            wf.setframerate(rate)
            if width == 2:
                wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
            else:
                wf.writeframes(bytes(samples))
        return buf.getvalue()

    def test_16bit_energy_exact(self, spark):
        from pyspark.sql import Row

        from dbm_nca_ph_etl_spark.operators.multimodal import wav_window_energy

        samples = [0] * 64 + [100, -100] * 5  # frame0 silent, frame1 partial
        assets = spark.createDataFrame(
            [Row(asset_id=1, modality="audio", content=bytearray(self._wav(samples)))]
        )
        rows = {r.frame_idx: r for r in wav_window_energy(assets).collect()}
        assert rows[0].n_samples == 64 and rows[0].energy == 0
        assert rows[1].n_samples == 10 and rows[1].energy == 10 * 100 * 100

    def test_8bit_and_stereo_channel0(self, spark):
        from pyspark.sql import Row

        from dbm_nca_ph_etl_spark.operators.multimodal import wav_window_energy

        mono8 = self._wav([128, 130, 126, 128], width=1)
        # stereo 16-bit: ch0 = 7, ch1 = -9 interleaved
        stereo = self._wav([7, -9] * 8, width=2, channels=2)
        assets = spark.createDataFrame(
            [
                Row(asset_id=1, modality="audio", content=bytearray(mono8)),
                Row(asset_id=2, modality="audio", content=bytearray(stereo)),
            ]
        )
        rows = {
            (r.asset_id, r.frame_idx): r
            for r in wav_window_energy(assets, frame_size=8).collect()
        }
        assert rows[(1, 0)].n_samples == 4 and rows[(1, 0)].energy == 4 + 4
        assert rows[(2, 0)].n_samples == 8 and rows[(2, 0)].energy == 8 * 49

class TestPngCodec:
    """Second real image format: stdlib PNG (zlib chunks, all five
    scanline filters) interchangeable pixel-for-pixel with the BMP
    codec on the same content."""

    def _rgb_png(self, rgb, filters):
        """Hand-assemble an 8-bit RGB PNG using a chosen filter type
        per row — exercises the unfilter recurrences the encoder
        (which always emits filter 0) never produces."""
        import struct
        import zlib

        import numpy as np

        h, w, _ = rgb.shape
        prev = np.zeros(w * 3, dtype=np.int32)
        raw = b""
        for y in range(h):
            line = rgb[y].reshape(-1).astype(np.int32)
            ft = filters[y % len(filters)]
            out = np.zeros(w * 3, dtype=np.int32)
            for x in range(w * 3):
                a = int(line[x - 3]) if x >= 3 else 0
                b = int(prev[x])
                c = int(prev[x - 3]) if x >= 3 else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (line[x] - pred) % 256
            raw += bytes([ft]) + out.astype(np.uint8).tobytes()
            prev = line

        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def test_grayscale_round_trip(self):
        import numpy as np

        from dbm_nca_ph_etl_spark.operators.multimodal import PngDecoder

        d = PngDecoder()
        g = (np.arange(9 * 6, dtype=np.uint8).reshape(6, 9) * 7) % 256
        assert (d.decode(d.encode(g), None) == g).all()

    def test_all_filters_unfilter_exactly(self):
        import numpy as np

        from dbm_nca_ph_etl_spark.operators.multimodal import PngDecoder

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            blob = self._rgb_png(rgb, filters)
            got = PngDecoder().decode(blob, None)
            r, g, b = (rgb[..., i].astype(np.int64) for i in range(3))
            want = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
            assert (got == want).all(), filters

    def test_cross_codec_pixel_parity_with_bmp(self):
        import numpy as np

        from dbm_nca_ph_etl_spark.operators.multimodal import BmpDecoder, PngDecoder

        g = (np.arange(5 * 8, dtype=np.uint8).reshape(8, 5) * 11) % 256
        via_bmp = BmpDecoder().decode(BmpDecoder().encode(g), None)
        via_png = PngDecoder().decode(PngDecoder().encode(g), None)
        assert (via_bmp == via_png).all()

    def test_rejects_non_png_and_unsupported(self):
        import pytest as _pytest

        from dbm_nca_ph_etl_spark.operators.multimodal import PngDecoder

        with _pytest.raises(ValueError, match="not a PNG"):
            PngDecoder().decode(b"BMxxxxxxxx", None)

    def test_spark_resize_on_real_png_blobs(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from dbm_nca_ph_etl_spark.operators.multimodal import (
            PngDecoder,
            resize_images,
        )

        d = PngDecoder()
        g = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
        assets = spark.createDataFrame(
            [
                Row(
                    asset_id=1,
                    modality="image",
                    fmt="png",
                    content=bytearray(d.encode(g)),
                    meta=Row(width=8, height=8, channels=1,
                             sample_rate=0, n_frames=0),
                )
            ]
        )
        out = resize_images(assets, 2, 2, decoder=d).collect()
        got = d.decode(bytes(out[0].content), None)
        ys = (np.arange(2) * 8 / 2).astype(int)
        assert (got == g[np.ix_(ys, ys)]).all()


# -- independent reference JFIF encoder (test-side) ----------------------
# Written separately from the engine decoder so an encode/decode pair
# bug cannot cancel out: its DCT comes from the explicit DCT-II sum
# (not the engine's matrix product), it builds its own huffman tables,
# and it supports the features the engine encoder does not emit
# (color 4:2:0 scans, restart intervals).

_REF_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _ref_dct_block(b):
    """Direct DCT-II double sum (T.81 A.3.3) — O(64²), test-only."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        b[y, x]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


class _RefJfifEncoder:
    """Minimal baseline JFIF writer: grayscale or YCbCr 4:2:0, flat
    quant table (single value), one shared huffman pair, optional
    restart interval."""

    def __init__(self, qval=8, restart=0):
        self.q = qval
        self.restart = restart

    def _tables(self):
        dc = list(range(12))
        ac = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]

        def book(vals):
            ln = 1
            while (1 << ln) <= len(vals):
                ln += 1
            counts = [0] * 16
            counts[ln - 1] = len(vals)
            b, code = {}, 0
            for sym in vals:
                b[sym] = (ln, code)
                code += 1
            return counts, vals, b

        return book(dc), book(ac)

    def encode(self, y_plane, cb=None, cr=None):
        import struct

        (dc_counts, dc_vals, dc_book), (ac_counts, ac_vals, ac_book) = self._tables()
        color = cb is not None
        h, w = y_plane.shape
        out = bytearray()
        bits = [0, 0]  # acc, n

        def put(code, ln):
            bits[0] = (bits[0] << ln) | code
            bits[1] += ln
            while bits[1] >= 8:
                bits[1] -= 8
                byte = (bits[0] >> bits[1]) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0)

        def flush_and_restart(i):
            if bits[1]:
                put((1 << (8 - bits[1])) - 1, 8 - bits[1])
            out.append(0xFF)
            out.append(0xD0 + (i % 8))

        def code_block(blk, pred):
            C = _ref_dct_block(blk - 128.0)
            zz = np.array([C.reshape(-1)[_REF_ZZ[i]] for i in range(64)])
            qz = np.floor(zz / self.q + 0.5).astype(int)
            dc = int(qz[0])
            diff = dc - pred
            t = abs(diff).bit_length()
            ln, code = dc_book[t]
            put(code, ln)
            if t:
                put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            nz = np.nonzero(qz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            run = 0
            for k in range(1, last + 1):
                v = int(qz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_book[0xF0]
                    put(code, ln)
                    run -= 16
                t = abs(v).bit_length()
                ln, code = ac_book[(run << 4) | t]
                put(code, ln)
                put(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if last < 63:
                ln, code = ac_book[0x00]
                put(code, ln)
            return dc

        hdr = bytearray(b"\xff\xd8")
        qzz = bytes([self.q] * 64)
        hdr += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qzz
        if color:
            hdr += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            hdr += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
        else:
            hdr += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
        hdr += (
            b"\xff\xc4" + struct.pack(">H", 19 + len(dc_vals)) + b"\x00"
            + bytes(dc_counts) + bytes(dc_vals)
        )
        hdr += (
            b"\xff\xc4" + struct.pack(">H", 19 + len(ac_vals)) + b"\x10"
            + bytes(ac_counts) + bytes(ac_vals)
        )
        if self.restart:
            hdr += b"\xff\xdd" + struct.pack(">HH", 4, self.restart)
        if color:
            hdr += b"\xff\xda" + struct.pack(">HB", 12, 3)
            hdr += bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0])
            mcux, mcuy = -(-w // 16), -(-h // 16)
            yp = np.zeros((mcuy * 16, mcux * 16))
            yp[:h, :w] = y_plane
            yp[h:, :w] = y_plane[-1:, :]
            yp[:, w:] = yp[:, w - 1 : w]
            ch2, cw2 = mcuy * 8, mcux * 8
            cbp = np.zeros((ch2, cw2)); crp = np.zeros((ch2, cw2))
            cbp[: cb.shape[0], : cb.shape[1]] = cb
            crp[: cr.shape[0], : cr.shape[1]] = cr
            preds = {1: 0, 2: 0, 3: 0}
            mcu_i = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if self.restart and mcu_i and mcu_i % self.restart == 0:
                        flush_and_restart(mcu_i // self.restart - 1)
                        preds = {1: 0, 2: 0, 3: 0}
                    mcu_i += 1
                    for by in range(2):
                        for bx in range(2):
                            blk = yp[my * 16 + by * 8 : my * 16 + by * 8 + 8,
                                     mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
                            preds[1] = code_block(blk, preds[1])
                    preds[2] = code_block(
                        cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], preds[2]
                    )
                    preds[3] = code_block(
                        crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], preds[3]
                    )
        else:
            hdr += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
            mcux, mcuy = -(-w // 8), -(-h // 8)
            yp = np.zeros((mcuy * 8, mcux * 8))
            yp[:h, :w] = y_plane
            yp[h:, :w] = y_plane[-1:, :]
            yp[:, w:] = yp[:, w - 1 : w]
            pred = 0
            mcu_i = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if self.restart and mcu_i and mcu_i % self.restart == 0:
                        flush_and_restart(mcu_i // self.restart - 1)
                        pred = 0
                    mcu_i += 1
                    pred = code_block(
                        yp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], pred
                    )
        if bits[1]:
            put((1 << (8 - bits[1])) - 1, 8 - bits[1])
        return bytes(hdr) + bytes(out) + b"\xff\xd9"


class TestJpegCodec:
    def _gradient(self, h, w, k=1):
        y, x = np.mgrid[0:h, 0:w]
        return np.clip(40 + y * 3 * k + x * 2 * k, 0, 255).astype(np.uint8)

    def test_idct_inverts_reference_dct(self):
        from dbm_nca_ph_etl_spark.operators.multimodal import _jpeg_dct_matrix

        rng = np.random.default_rng(3)
        blk = rng.uniform(-120, 120, (8, 8))
        C = _ref_dct_block(blk)  # reference forward (explicit sum)
        A = _jpeg_dct_matrix()   # engine inverse (matrix product)
        back = A.T @ C @ A
        assert np.abs(back - blk).max() < 1e-9

    def test_decode_external_grayscale(self):
        from dbm_nca_ph_etl_spark.operators.multimodal import JpegDecoder

        img = self._gradient(24, 33)
        blob = _RefJfifEncoder(qval=4).encode(img.astype(np.float64))
        dec = JpegDecoder().decode(blob, None)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 1.0 and err.max() <= 6, (err.mean(), err.max())

    def test_decode_external_with_restart_markers(self):
        from dbm_nca_ph_etl_spark.operators.multimodal import JpegDecoder

        img = self._gradient(24, 40)
        plain = JpegDecoder().decode(_RefJfifEncoder(qval=4).encode(img.astype(float)), None)
        with_rst = JpegDecoder().decode(
            _RefJfifEncoder(qval=4, restart=2).encode(img.astype(float)), None
        )
        assert (plain == with_rst).all(), "restart intervals changed pixels"

    def test_decode_external_color_420_luma(self):
        from dbm_nca_ph_etl_spark.operators.multimodal import JpegDecoder

        yp = self._gradient(32, 48).astype(np.float64)
        cb = np.full((16, 24), 128.0)  # neutral chroma
        cr = np.full((16, 24), 140.0)
        blob = _RefJfifEncoder(qval=4).encode(yp, cb=cb, cr=cr)
        dec = JpegDecoder().decode(blob, None)
        assert dec.shape == (32, 48)
        err = np.abs(dec.astype(int) - yp.astype(int))
        assert err.mean() < 1.0 and err.max() <= 6, (err.mean(), err.max())

    def test_engine_roundtrip_and_determinism(self):
        from dbm_nca_ph_etl_spark.operators.multimodal import JpegDecoder

        d = JpegDecoder(quality=90)
        img = self._gradient(24, 33)
        b1, b2 = d.encode(img), d.encode(img)
        assert b1 == b2, "encode must be byte-deterministic"
        dec = d.decode(b1, None)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 1.5 and err.max() <= 10, (err.mean(), err.max())
        flat = np.full((16, 16), 77, dtype=np.uint8)
        assert (d.decode(d.encode(flat), None) == 77).all()

    def test_rejects_non_baseline(self):
        import pytest

        from dbm_nca_ph_etl_spark.operators.multimodal import JpegDecoder

        d = JpegDecoder()
        with pytest.raises(ValueError, match="not a JPEG"):
            d.decode(b"\x89PNG\r\n", None)
        # progressive SOF2 marker stream
        blob = bytes.fromhex("ffd8ffc2000b08001000100100110000")
        with pytest.raises(ValueError, match="SOF0"):
            d.decode(blob, None)

    def test_spark_resize_on_real_jpeg_blobs(self, spark):
        """The Arrow/mapInPandas plumbing runs the REAL jpeg codec
        end-to-end: encode in the driver, decode+resize on executors."""
        from pyspark.sql import Row

        from dbm_nca_ph_etl_spark.operators.multimodal import (
            FakeGrayscaleDecoder,
            JpegDecoder,
            resize_images,
        )

        d = JpegDecoder(quality=95)
        img = self._gradient(32, 32)
        assets = spark.createDataFrame(
            [
                Row(
                    asset_id=1,
                    modality="image",
                    fmt="jpeg",
                    content=bytearray(d.encode(img)),
                    meta=Row(
                        width=32, height=32, channels=1, sample_rate=0, n_frames=1
                    ),
                )
            ]
        )

        class JpegIn:
            """decode jpeg, re-encode raw bytes for easy assertion."""

            def decode(self, content, meta):
                return JpegDecoder().decode(bytes(content), meta)

            def encode(self, pixels):
                return FakeGrayscaleDecoder().encode(pixels)

        out = resize_images(assets, 8, 8, decoder=JpegIn()).collect()
        assert len(out) == 1 and out[0].width == 8
        got = np.frombuffer(bytes(out[0].content), dtype=np.uint8).reshape(8, 8)
        ys = (np.arange(8) * 32 / 8).astype(int)
        want = JpegDecoder().decode(d.encode(img), None)[np.ix_(ys, ys)]
        assert (got == want).all()


class TestAudioFingerprint:
    """audio_band_energy + hk_fingerprints: known-signal bit math,
    frame/band geometry, first-frame drop, end-to-end clip match."""

    def _asset(self, spark, samples: bytes, asset_id=1):
        return spark.createDataFrame(
            [(asset_id, "audio", "pcm8", samples)],
            "asset_id long, modality string, fmt string, content binary",
        )

    def test_band_energy_geometry_and_values(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import audio_band_energy

        # 2 full frames of 32 + 5 leftover samples (dropped).
        # frame 0: band 0 = four samples of +2 → e=16; rest 0.
        # frame 1: band 7 = four samples of -3 → e=36; rest 0.
        f0 = bytes([130] * 4 + [128] * 28)
        f1 = bytes([128] * 28 + [125] * 4)
        rows = audio_band_energy(self._asset(spark, f0 + f1 + b"\x00" * 5)).collect()
        assert len(rows) == 2
        by = {r.frame_idx: r.e for r in rows}
        assert by[0] == [16, 0, 0, 0, 0, 0, 0, 0]
        assert by[1] == [0, 0, 0, 0, 0, 0, 0, 36]

    def test_fingerprint_bits_known_signal(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import (
            audio_band_energy,
            hk_fingerprints,
        )

        # frame 0 silent; frame 1 puts energy 16 in band 0 only:
        # d(f1) = [16, 0, 0, 0, 0, 0, 0] per adjacent-band diff is
        # [16-0, 0, ...] → delta vs silent frame 0 is +16 in bit 0
        # only → fp = 1.
        f0 = bytes([128] * 32)
        f1 = bytes([130] * 4 + [128] * 28)
        fp = hk_fingerprints(audio_band_energy(self._asset(spark, f0 + f1)))
        rows = fp.collect()
        assert len(rows) == 1  # first frame emits no fp
        assert rows[0].frame_idx == 1 and rows[0].fp == 1

    def test_fingerprint_band2_sets_bits_1_and_2(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import (
            audio_band_energy,
            hk_fingerprints,
        )

        # energy E in band 2 only: d = [0-0, 0-E, E-0, 0...] →
        # delta bits: bit1 negative (no), bit2 positive (yes) → fp=4? 
        # d[b]=e[b]-e[b+1]: d1 = e1-e2 = -E (bit 1 clear),
        # d2 = e2-e3 = +E (bit 2 set) → fp = 1<<2 = 4.
        f0 = bytes([128] * 32)
        f1 = bytes([128] * 8 + [132] * 4 + [128] * 20)
        fp = hk_fingerprints(audio_band_energy(self._asset(spark, f0 + f1)))
        assert fp.first().fp == 4

    def test_gain_shift_invariance_of_bits(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import (
            audio_band_energy,
            hk_fingerprints,
        )

        # doubling amplitude scales every band energy 4x — all the
        # sign comparisons, hence the fingerprint, are unchanged.
        quiet = bytes([128] * 32) + bytes([129] * 4 + [128] * 24 + [127] * 4)
        loud = bytes([128] * 32) + bytes([130] * 4 + [128] * 24 + [126] * 4)
        a = hk_fingerprints(audio_band_energy(self._asset(spark, quiet))).first().fp
        b = hk_fingerprints(audio_band_energy(self._asset(spark, loud))).first().fp
        assert a == b

    def test_short_blob_no_rows(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import audio_band_energy

        assert audio_band_energy(self._asset(spark, b"\x80" * 31)).count() == 0


class TestSceneCuts:
    def _asset(self, spark, blob: bytes, nf: int, asset_id=1):
        return spark.createDataFrame(
            [(asset_id, "video", "rawvideo", blob,
              {"width": 16, "height": 1, "channels": 1,
               "sample_rate": 0, "n_frames": nf})],
            "asset_id long, modality string, fmt string, content binary, "
            "meta struct<width:int, height:int, channels:int, "
            "sample_rate:int, n_frames:int>",
        )

    def test_known_sad_values(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import scene_cut_stats

        # 3 frames of 4 bytes: f0=10s, f1=10s (sad 0), f2=30s (sad 80)
        blob = bytes([10] * 4 + [10] * 4 + [30] * 4)
        got = sorted(
            (r.boundary, r.sad, r.n_frame_bytes)
            for r in scene_cut_stats(self._asset(spark, blob, 3)).collect()
        )
        assert got == [(1, 0, 4), (2, 80, 4)]

    def test_trailing_remainder_ignored(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import scene_cut_stats

        # 2 frames of 3 bytes + 1 leftover byte (len 7, nf 2 → fs 3)
        blob = bytes([0, 0, 0, 9, 9, 9, 255])
        got = scene_cut_stats(self._asset(spark, blob, 2)).collect()
        assert [(r.boundary, r.sad, r.n_frame_bytes) for r in got] == [(1, 27, 3)]

    def test_single_frame_no_rows(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import scene_cut_stats

        assert scene_cut_stats(self._asset(spark, bytes(64), 1)).count() == 0


class TestFpBigrams:
    def test_bigram_values_and_last_frame_drop(self, spark):
        from dbm_nca_ph_etl_spark.operators.multimodal import fp_bigrams

        fp = spark.createDataFrame(
            [(1, 1, 5), (1, 2, 7), (1, 3, 0), (2, 1, 3)],
            "asset_id long, frame_idx int, fp long",
        )
        got = sorted(
            (r.asset_id, r.frame_idx, r.bg) for r in fp_bigrams(fp).collect()
        )
        # 5*128+7, 7*128+0; track 2's single frame has no bigram
        assert got == [(1, 1, 647), (1, 2, 896)]


class TestDhash:
    def _assets(self, spark, blobs):
        return spark.createDataFrame(
            [(i, "image", bytes(b)) for i, b in enumerate(blobs)],
            "asset_id long, modality string, content binary",
        )

    def test_brightness_shift_invariance_and_edit_locality(self, spark):
        import random

        from dbm_nca_ph_etl_spark.operators.multimodal import dhash_images

        random.seed(11)
        base = [random.randint(0, 200) for _ in range(63)]
        brighter = [min(b + 40, 255) for b in base]  # monotone tone map
        edited = list(base)
        edited[30] = 255 - edited[30]  # one-pixel edit
        rows = dhash_images(
            self._assets(spark, [base, brighter, edited])
        ).collect()
        h = {r.asset_id: r.dhash for r in rows}
        assert h[0] == h[1]  # gradient signs survive the shift
        diff = bin(h[0] ^ h[2]).count("1")
        assert 0 < diff <= 4  # an edit flips only local bits

    def test_near_dup_banding_finds_close_pairs_only(self, spark):
        import random

        from dbm_nca_ph_etl_spark.operators.multimodal import (
            dhash_images,
            dhash_near_dup,
        )

        random.seed(5)
        a = [random.randint(0, 255) for _ in range(63)]
        b = list(a)
        b[10], b[40] = 255 - b[10], 255 - b[40]  # near-dup of a
        c = [random.randint(0, 255) for _ in range(63)]  # unrelated
        got = dhash_near_dup(
            dhash_images(self._assets(spark, [a, b, c])), max_hamming=10
        ).collect()
        pairs = {(r.asset_a, r.asset_b) for r in got}
        assert (0, 1) in pairs
        assert all(2 not in p for p in pairs)

    def test_short_blob_skipped_and_guard(self, spark):
        import pytest

        from dbm_nca_ph_etl_spark.operators.multimodal import (
            dhash_images,
            dhash_near_dup,
        )

        df = self._assets(spark, [[1, 2, 3]])
        assert dhash_images(df).count() == 0
        with pytest.raises(ValueError):
            dhash_images(df, rows=8, cols=9)  # 64 bits: sign overflow
        with pytest.raises(ValueError):
            dhash_near_dup(dhash_images(df), n_bits=56, bands=5)
