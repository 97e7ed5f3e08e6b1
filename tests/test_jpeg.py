"""Baseline JPEG codec (pulsar_spark/functions/jpeg.py) — roundtrip,
bitstream-feature, and malformed-payload tests, plus the Spark decode
stage integration. The exactness cases (constant 8x8 blocks + flat
quant carry only an integer DC coefficient) are the foundation of the
``media_decode_jpeg`` driver oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pulsar_spark.functions.jpeg import (
    FLAT_QUANT,
    STD_LUMA_QUANT,
    decode_jpeg,
    encode_jpeg,
)


class TestJpegRoundtrip:
    def test_constant_gray_exact(self):
        for v in (0, 1, 127, 128, 200, 255):
            img = np.full((16, 24), v, np.uint8)
            out = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT))
            assert out.shape == (16, 24, 3)
            assert (out == v).all()

    def test_per_block_constant_gray_exact(self):
        rng = np.random.RandomState(7)
        blocks = rng.randint(0, 256, (4, 5), np.int64)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT))
        assert (out[:, :, 0] == img).all()
        assert (out[:, :, 1] == img).all()

    def test_random_gray_flat_quant_near_exact(self):
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (32, 40)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT))
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1

    def test_rgb_444_std_tables_bounded_error(self):
        rng = np.random.RandomState(3)
        img = np.repeat(
            np.repeat(rng.randint(0, 256, (3, 4, 3), np.int64), 8, 0), 8, 1
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant=STD_LUMA_QUANT))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    def test_achromatic_420_exact(self):
        # r=g=b -> Cb=Cr=128 exactly, surviving 4:2:0 averaging: the
        # exactness property the driver oracle's color rows rely on
        for v in (0, 77, 128, 255):
            img = np.full((32, 16, 3), v, np.uint8)
            out = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT, subsampling="420"))
            assert (out == v).all(), v

    def test_chromatic_420_bounded_error(self):
        rng = np.random.RandomState(5)
        img = np.tile(
            rng.randint(0, 256, (2, 2, 1, 1, 3), np.int64), (1, 1, 16, 16, 1)
        ).transpose(0, 2, 1, 3, 4).reshape(32, 32, 3).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT, subsampling="420"))
        # YCbCr roundtrip rounding only — flat quant adds <=0.5/coeff
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_restart_markers_exact(self):
        rng = np.random.RandomState(13)
        img = np.repeat(
            np.repeat(rng.randint(0, 256, (5, 7), np.int64), 8, 0), 8, 1
        ).astype(np.uint8)
        for dri in (1, 2, 3):
            out = decode_jpeg(encode_jpeg(img, quant=FLAT_QUANT, restart_interval=dri))
            assert (out[:, :, 0] == img).all(), dri


class TestJpegBitstream:
    def test_non_multiple_of_8_dims_cropped(self):
        # the decoder crops the MCU grid to the SOF dims; craft a file
        # with declared 13x11 by patching the SOF of a 16x16 encode
        img = np.full((16, 16), 99, np.uint8)
        data = bytearray(encode_jpeg(img, quant=FLAT_QUANT))
        i = data.find(b"\xff\xc0")
        # SOF payload: len(2) prec(1) H(2) W(2)
        struct.pack_into(">HH", data, i + 5, 11, 13)
        out = decode_jpeg(bytes(data))
        assert out.shape == (11, 13, 3)
        assert (out == 99).all()

    def test_byte_stuffing_in_stream(self):
        # values chosen so the entropy stream is long and varied enough
        # to contain stuffed 0xFF00 sequences with high probability
        rng = np.random.RandomState(17)
        img = rng.randint(0, 256, (40, 40)).astype(np.uint8)
        payload = encode_jpeg(img, quant=FLAT_QUANT)
        assert b"\xff\x00" in payload[2:-2]
        out = decode_jpeg(payload)
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1

    def test_progressive_rejected(self):
        img = np.full((8, 8), 5, np.uint8)
        data = bytearray(encode_jpeg(img, quant=FLAT_QUANT))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="progressive"):
            decode_jpeg(bytes(data))

    def test_truncated_raises(self):
        img = np.full((8, 8), 5, np.uint8)
        payload = encode_jpeg(img, quant=FLAT_QUANT)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) - 6])

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG1234")

    def test_dimension_bomb_guard(self):
        img = np.full((8, 8), 5, np.uint8)
        data = bytearray(encode_jpeg(img, quant=FLAT_QUANT))
        i = data.find(b"\xff\xc0")
        struct.pack_into(">HH", data, i + 5, 65000, 65000)
        with pytest.raises(ValueError, match="cap"):
            decode_jpeg(bytes(data))

    def test_app_and_comment_segments_skipped(self):
        img = np.full((8, 8), 42, np.uint8)
        payload = encode_jpeg(img, quant=FLAT_QUANT)
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" + b"\x00" * 7
        com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
        patched = payload[:2] + app0 + com + payload[2:]
        assert (decode_jpeg(patched) == 42).all()


class TestJpegSparkStage:
    def test_decode_media_jpeg_strict(self, spark):
        from pulsar_spark.functions.multimodal import decode_media

        imgs = {
            1: np.full((8, 16), 10, np.uint8),
            2: np.full((16, 16, 3), 200, np.uint8),
        }
        rows = [
            (i, "image", "jpeg", encode_jpeg(px, quant=FLAT_QUANT))
            for i, px in imgs.items()
        ] + [(3, "image", "jpg", encode_jpeg(imgs[1], quant=FLAT_QUANT))]
        media = spark.createDataFrame(
            rows, "media_id bigint, modality string, codec string, payload binary"
        )
        out = {r["media_id"]: r for r in decode_media(media, strict=True).collect()}
        assert out[1]["width"] == 16 and out[1]["height"] == 8
        assert out[2]["width"] == 16 and out[2]["height"] == 16
        assert all(r["decode_ok"] for r in out.values())
        assert round(out[3]["feature"][0] * 765) == 30  # 3 x gray 10

    def test_decode_media_malformed_jpeg_is_data(self, spark):
        from pulsar_spark.functions.multimodal import decode_media

        media = spark.createDataFrame(
            [(1, "image", "jpeg", b"\xff\xd8garbage")],
            "media_id bigint, modality string, codec string, payload binary",
        )
        row = decode_media(media, strict=True).collect()[0]
        assert row["decode_ok"] is False
        assert row["width"] is None

    def test_resize_jpeg_reencodes_jpeg(self, spark):
        from pulsar_spark.functions.multimodal import attach_media, resize_media

        payload = encode_jpeg(np.full((32, 32, 3), 120, np.uint8), quant=FLAT_QUANT)
        media = attach_media(
            spark.createDataFrame([(1, payload)], "id bigint, data binary"),
            "data", "image", "jpeg", "id",
        )
        row = resize_media(media, 16, 16).collect()[0]
        assert row["codec"] == "jpeg"
        assert (row["width"], row["height"]) == (16, 16)
        px = decode_jpeg(bytes(row["payload"]))
        assert px.shape == (16, 16, 3)
        assert np.abs(px.astype(int) - 120).max() <= 3

    def test_resize_jpeg_non_x8_upcasts_to_png(self, spark):
        from pulsar_spark.functions.multimodal import (
            _decode_png,
            attach_media,
            resize_media,
        )

        payload = encode_jpeg(np.full((32, 32, 3), 64, np.uint8), quant=FLAT_QUANT)
        media = attach_media(
            spark.createDataFrame([(1, payload)], "id bigint, data binary"),
            "data", "image", "jpeg", "id",
        )
        row = resize_media(media, 10, 10).collect()[0]
        assert row["codec"] == "png"
        px = _decode_png(bytes(row["payload"]))
        assert px.shape == (10, 10, 3)


class TestProgressiveJpeg:
    """Progressive (SOF2, T.81 Annex G) codec: the progressive encoder
    produces IDENTICAL quantized coefficients to the baseline encoder,
    so decode(progressive) must equal decode(baseline) bit-for-bit."""

    def test_roundtrip_matches_baseline_across_configs(self):
        import numpy as np

        from pulsar_spark.functions.jpeg import (
            FLAT_QUANT,
            STD_LUMA_QUANT,
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(42)
        configs = [
            (0, 0, ((1, 63),)),          # spectral selection only
            (1, 1, ((1, 5), (6, 63))),   # one SA level, two bands
            (2, 2, ((1, 2), (3, 20), (21, 63))),  # deep SA, three bands
            (0, 2, ((1, 63),)),          # AC-only successive approximation
            (3, 1, ((1, 10), (11, 63))),  # deep DC SA
        ]
        for trial in range(6):
            h = int(rng.choice([8, 16, 24]))
            w = int(rng.choice([8, 16, 32]))
            gray = trial % 2 == 0
            img = rng.integers(
                0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8
            )
            for quant in (FLAT_QUANT, STD_LUMA_QUANT):
                base = decode_jpeg(encode_jpeg(img, quant=quant))
                for dc_al, ac_al, bands in configs:
                    prog = decode_jpeg(
                        encode_jpeg_progressive(
                            img, quant=quant, dc_al=dc_al, ac_al=ac_al, bands=bands
                        )
                    )
                    assert np.array_equal(base, prog), (
                        trial, gray, dc_al, ac_al, bands,
                    )

    def test_solid_color_flat_quant_exact(self):
        import numpy as np

        from pulsar_spark.functions.jpeg import (
            FLAT_QUANT,
            decode_jpeg,
            encode_jpeg_progressive,
        )

        img = np.full((16, 16, 3), 0, np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 200, 55, 30
        got = decode_jpeg(encode_jpeg_progressive(img, quant=FLAT_QUANT))
        # solid color: within YCbCr round-trip rounding of the original
        # (same +-1 the baseline encoder shows on these values), and the
        # whole image is one constant pixel
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 1
        assert (got == got[0, 0]).all()

    def test_block_refine_eob_at_band_end(self):
        # the regression the round-trip caught: a block whose last
        # newly-significant coefficient sits exactly at Se must not
        # join the encoder's EOB run (decoder has nothing left to read)
        import numpy as np

        from pulsar_spark.functions.jpeg import (
            FLAT_QUANT,
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (8, 32), dtype=np.uint8)
        from pulsar_spark.functions.jpeg import STD_LUMA_QUANT

        base = decode_jpeg(encode_jpeg(img, quant=STD_LUMA_QUANT))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quant=STD_LUMA_QUANT, dc_al=1, ac_al=1, bands=((1, 5), (6, 63))
            )
        )
        assert np.array_equal(base, prog)

    def test_progressive_flows_through_media_decode(self, spark):
        import numpy as np

        from pulsar_spark.functions.jpeg import FLAT_QUANT, encode_jpeg_progressive
        from pulsar_spark.functions.multimodal import attach_media, decode_media

        payload = encode_jpeg_progressive(
            np.full((16, 8, 3), 90, np.uint8), quant=FLAT_QUANT
        )
        media = attach_media(
            spark.createDataFrame([(1, payload)], "id bigint, data binary"),
            "data", "image", "jpeg", "id",
        )
        row = decode_media(media, strict=True).collect()[0]
        assert (row["width"], row["height"]) == (8, 16)
        assert row["decode_ok"]

    def test_bad_bands_rejected(self):
        import numpy as np
        import pytest as _pytest

        from pulsar_spark.functions.jpeg import encode_jpeg_progressive

        img = np.zeros((8, 8), np.uint8)
        for bands in (((2, 63),), ((1, 30),), ((1, 30), (32, 63))):
            with _pytest.raises(ValueError):
                encode_jpeg_progressive(img, bands=bands)
