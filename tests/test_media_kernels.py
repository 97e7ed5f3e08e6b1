"""Round-8 media kernels: GIF (real LZW), G.711 telephony WAV, Y4M
uncompressed video — unit + property tests for the pure-numpy codecs
plus the Spark integration paths (decode_media strict tier,
sample_video_frames codec dispatch, resize_media container upcasts)."""

from __future__ import annotations

import numpy as np
import pytest

from pulsar_spark.functions.audio import (
    alaw_decode_table,
    decode_wav_g711,
    encode_wav_g711,
    ulaw_decode_table,
)
from pulsar_spark.functions.gif import decode_gif, encode_gif, lzw_decode, lzw_encode
from pulsar_spark.functions.video import encode_y4m, parse_y4m


# ------------------------------------------------------------------ GIF


class TestLZW:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for mcs in (2, 4, 8):
            n_sym = 1 << mcs
            data = bytes(rng.integers(0, n_sym, 5000, dtype=np.uint8))
            assert bytes(lzw_decode(lzw_encode(data, mcs), mcs, len(data))) == data

    def test_cscsc_case(self):
        # 'ababab...' forces the code == len(table) special case
        s = bytes([0, 1] * 50)
        assert bytes(lzw_decode(lzw_encode(s, 2), 2, len(s))) == s

    def test_table_growth_and_clear_reset(self):
        # enough distinct phrases to hit 4096 entries -> CLEAR + rebuild
        idx = bytes((i * 7 + (i * i) % 251) % 256 for i in range(200_000))
        enc = lzw_encode(idx, 8)
        assert bytes(lzw_decode(enc, 8, len(idx))) == idx

    def test_truncated_stream_returns_partial(self):
        s = bytes([3] * 100)
        enc = lzw_encode(s, 2)
        out = lzw_decode(enc[: len(enc) // 2], 2, 100)
        assert bytes(out) == s[: len(out)] and len(out) < 100


class TestGif:
    def test_roundtrip_property(self):
        rng = np.random.default_rng(42)
        for trial in range(25):
            h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
            ncol = int(rng.integers(1, 20))
            pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
            nf = int(rng.integers(1, 4))
            frames = [pal[rng.integers(0, ncol, (h, w))] for _ in range(nf)]
            delays = [int(rng.integers(0, 600)) for _ in range(nf)]
            d = decode_gif(
                encode_gif(frames, delays_cs=delays, interlace=bool(trial % 2))
            )
            assert (d["width"], d["height"]) == (w, h)
            assert d["delays_cs"] == delays
            for a, b in zip(d["frames"], frames):
                assert np.array_equal(a, b)

    def test_interlace_permutes_distinct_rows(self):
        # vertical ramp: every row distinct, so a wrong pass order is
        # guaranteed to misplace rows
        h, w = 13, 4
        px = np.repeat(
            np.arange(h, dtype=np.uint8)[:, None, None], 3, axis=2
        ).repeat(w, axis=1)
        plain = encode_gif(px, interlace=False)
        inter = encode_gif(px, interlace=True)
        assert plain != inter  # actually reordered on the wire
        assert np.array_equal(decode_gif(inter)["frames"][0], px)

    def test_256_colors(self):
        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        img = pal[np.tile(np.arange(256, dtype=np.uint8), (8, 1))]
        assert np.array_equal(decode_gif(encode_gif(img))["frames"][0], img)
        with pytest.raises(ValueError, match="exceed"):
            rgb = np.zeros((20, 20, 3), np.uint8)
            rgb[..., 0] = np.arange(400).reshape(20, 20) % 256
            rgb[..., 1] = np.arange(400).reshape(20, 20) // 2 % 256
            encode_gif(rgb)

    def test_netscape_loop_block(self):
        frames = [np.zeros((2, 2, 3), np.uint8), np.ones((2, 2, 3), np.uint8)]
        d = decode_gif(encode_gif(frames, loop=5))
        assert d["loop_count"] == 5

    def _assemble(self, w, h, gct, blocks, bg=0):
        """Hand-build a GIF container around library LZW data so the
        decode-only paths (sub-rect frames, disposal, transparency,
        local color tables) are exercised independently of encode_gif."""
        import struct

        gct_bits = max(1, (len(gct) - 1).bit_length())
        out = bytearray(b"GIF89a")
        out += struct.pack("<HH", w, h)
        out.append(0x80 | (gct_bits - 1))
        out += bytes((bg, 0))
        table = np.zeros((1 << gct_bits, 3), np.uint8)
        table[: len(gct)] = gct
        out += table.tobytes()
        for b in blocks:
            out += b
        out.append(0x3B)
        return bytes(out)

    @staticmethod
    def _frame_block(left, top, fw, fh, indices, mcs=2, gce=None, lct=None):
        import struct

        out = bytearray()
        if gce is not None:
            fields, delay, tindex = gce
            out += b"\x21\xf9\x04" + bytes((fields,))
            out += struct.pack("<H", delay) + bytes((tindex, 0))
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        if lct is not None:
            bits = max(1, (len(lct) - 1).bit_length())
            out.append(0x80 | (bits - 1))
            table = np.zeros((1 << bits, 3), np.uint8)
            table[: len(lct)] = lct
            out += table.tobytes()
        else:
            out.append(0x00)
        out.append(mcs)
        data = lzw_encode(bytes(indices), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        return bytes(out)

    def test_subrect_transparency_disposal(self):
        gct = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        # frame 1: full 4x4 of color 1 (disposal 1 keep)
        f1 = self._frame_block(0, 0, 4, 4, [1] * 16, gce=(0x04, 10, 0))
        # frame 2: 2x2 sub-rect at (1,1), color 2 with transparent
        # index 3 in a checker -> transparent pixels keep color 1
        f2 = self._frame_block(
            1, 1, 2, 2, [2, 3, 3, 2], gce=(0x04 | 0x01, 10, 3)
        )
        d = decode_gif(self._assemble(4, 4, gct, [f1, f2]))
        assert len(d["frames"]) == 2
        fr2 = d["frames"][1]
        assert tuple(fr2[1, 1]) == (0, 255, 0)  # painted
        assert tuple(fr2[1, 2]) == (255, 0, 0)  # transparent: shows f1
        assert tuple(fr2[2, 2]) == (0, 255, 0)

    def test_disposal_restore_background(self):
        gct = np.array([[9, 9, 9], [255, 255, 255]], np.uint8)
        # frame 1 paints white with disposal=2 (restore bg after)
        f1 = self._frame_block(0, 0, 2, 2, [1] * 4, gce=(0x08, 5, 0))
        f2 = self._frame_block(0, 0, 1, 1, [1], gce=(0x04, 5, 0))
        d = decode_gif(self._assemble(2, 2, gct, [f1, f2], bg=0))
        fr2 = d["frames"][1]
        assert tuple(fr2[0, 0]) == (255, 255, 255)  # repainted
        assert tuple(fr2[1, 1]) == (9, 9, 9)  # restored to background

    def test_disposal_restore_previous(self):
        gct = np.array([[1, 2, 3], [200, 200, 200]], np.uint8)
        f1 = self._frame_block(0, 0, 2, 2, [0] * 4, gce=(0x04, 5, 0))
        # frame 2: disposal=3 (restore previous after)
        f2 = self._frame_block(0, 0, 2, 2, [1] * 4, gce=(0x0C, 5, 0))
        f3 = self._frame_block(0, 0, 1, 1, [1], gce=(0x04, 5, 0))
        d = decode_gif(self._assemble(2, 2, gct, [f1, f2, f3]))
        fr3 = d["frames"][2]
        assert tuple(fr3[0, 0]) == (200, 200, 200)
        assert tuple(fr3[1, 1]) == (1, 2, 3)  # frame 2 undone

    def test_local_color_table_overrides_global(self):
        gct = np.array([[0, 0, 0], [10, 10, 10]], np.uint8)
        lct = np.array([[50, 60, 70], [80, 90, 100]], np.uint8)
        f = self._frame_block(0, 0, 2, 1, [0, 1], lct=lct)
        d = decode_gif(self._assemble(2, 1, gct, [f]))
        assert tuple(d["frames"][0][0, 0]) == (50, 60, 70)
        assert tuple(d["frames"][0][0, 1]) == (80, 90, 100)

    def test_malformed_rejected(self):
        with pytest.raises(ValueError):
            decode_gif(b"NOTAGIF")
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a\x02\x00\x01\x00\x00\x00\x00\x3b")  # no frames


# ---------------------------------------------------------------- G.711


class TestG711:
    def test_landmarks(self):
        ut, at = ulaw_decode_table(), alaw_decode_table()
        assert int(ut.max()) == 32124 and int(ut.min()) == -32124
        assert int(at.max()) == 32256 and int(at.min()) == -32256
        assert ut[0xFF] == 0 and ut[0x7F] == 0  # the two mu-law zeros
        assert int(np.abs(at).min()) == 8  # A-law has no true zero

    def test_every_code_roundtrip(self):
        for law, tab in (("ulaw", ulaw_decode_table()), ("alaw", alaw_decode_table())):
            pcm = tab.astype(np.int16)
            out, rate = decode_wav_g711(encode_wav_g711(pcm, 8000, law))
            assert rate == 8000
            assert np.array_equal(out, pcm), law

    def test_closed_form_formulas(self):
        # the formulas the oracle SQL uses must equal the tables
        ut, at = ulaw_decode_table(), alaw_decode_table()
        for c in range(128):
            seg, man = (c >> 4) & 7, c & 15
            assert ut[(~c) & 0xFF] == (((man << 3) + 0x84) << seg) - 0x84
            expect = (
                (man << 4) + 8 if seg == 0 else ((man << 4) + 0x108) << (seg - 1)
            )
            assert at[(0x80 | c) ^ 0x55] == expect

    def test_nearest_code_bound(self):
        rng = np.random.default_rng(1)
        x = rng.integers(-32768, 32768, 4000).astype(np.int32)
        for law, tab in (("ulaw", ulaw_decode_table()), ("alaw", alaw_decode_table())):
            out, _ = decode_wav_g711(encode_wav_g711(x, 8000, law))
            max_step = np.diff(np.sort(tab.astype(np.int32))).max()
            assert np.abs(out.astype(np.int32) - x).max() <= max_step

    def test_wav_dispatch(self):
        # _decode_wav must route G.711 tags without breaking PCM or IMA
        from pulsar_spark.functions.multimodal import _decode_wav
        from pulsar_spark.functions.video import encode_wav_ima

        pcm = np.full(800, 1000, np.int16)
        x, rate, nch = _decode_wav(encode_wav_g711(pcm, 8000, "ulaw"))
        assert rate == 8000 and len(x) == 800
        expected, _ = decode_wav_g711(encode_wav_g711(pcm[:1], 8000, "ulaw"))
        assert abs(float(x[0]) * 32768 - float(expected[0])) < 1e-6
        x2, rate2, _ = _decode_wav(encode_wav_ima(pcm, 8000))
        assert rate2 == 8000 and len(x2) >= 800

    def test_odd_sample_count_pads(self):
        # odd data size forces the RIFF pad byte; fact chunk trims it
        pcm = ulaw_decode_table()[:33].astype(np.int16)
        out, _ = decode_wav_g711(encode_wav_g711(pcm, 8000, "ulaw"))
        assert len(out) == 33 and np.array_equal(out, pcm)

    def test_bad_inputs(self):
        with pytest.raises(ValueError):
            decode_wav_g711(b"RIFFxxxxNOPE")
        with pytest.raises(ValueError):
            encode_wav_g711(np.zeros(4, np.int16), 8000, "g728")


# ------------------------------------------------------------------ Y4M


class TestY4M:
    def test_mono_roundtrip(self):
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, (5, 7), dtype=np.uint8) for _ in range(4)]
        d = parse_y4m(encode_y4m(frames, 30, 1, "mono"))
        assert (d["width"], d["height"], d["fps_num"]) == (7, 5, 30)
        assert len(d["frames"]) == 4
        for a, b in zip(d["frames"], frames):
            assert np.array_equal(a[..., 0], b)
            assert np.array_equal(a[..., 1], b)

    def test_achromatic_exact_through_chroma(self):
        rng = np.random.default_rng(4)
        g = rng.integers(0, 256, (6, 8), dtype=np.uint8)
        fr = np.stack([g] * 3, -1)
        for cs in ("444", "420jpeg", "420mpeg2"):
            d = parse_y4m(encode_y4m([fr], 25, 1, cs))
            assert np.array_equal(d["frames"][0], fr), cs

    def test_color_444_tolerance(self):
        rng = np.random.default_rng(5)
        fr = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        d = parse_y4m(encode_y4m([fr], colorspace="444"))
        assert np.abs(d["frames"][0].astype(int) - fr.astype(int)).max() <= 2

    def test_header_defaults_and_fps(self):
        fr = np.zeros((2, 2), np.uint8)
        p = encode_y4m([fr], 30000, 1001, "mono")
        d = parse_y4m(p)
        assert (d["fps_num"], d["fps_den"]) == (30000, 1001)

    def test_errors(self):
        with pytest.raises(ValueError):
            parse_y4m(b"nope")
        with pytest.raises(ValueError, match="even"):
            encode_y4m([np.zeros((3, 3, 3), np.uint8)], colorspace="420jpeg")
        good = encode_y4m([np.zeros((2, 2), np.uint8)], colorspace="mono")
        with pytest.raises(ValueError, match="truncated"):
            parse_y4m(good[:-2])


# ------------------------------------------------------- Spark plumbing


@pytest.fixture(scope="module")
def media_mixed(spark):
    """One row per container family, encoded driver-side."""
    from pulsar_spark.functions.audio import encode_wav_g711
    from pulsar_spark.functions.gif import encode_gif
    from pulsar_spark.functions.video import encode_avi_mjpeg, encode_y4m

    gif_frames = [np.full((4, 4, 3), v, np.uint8) for v in (10, 20, 30)]
    y4m_frames = [np.full((4, 6), v, np.uint8) for v in (50, 60)]
    avi_frames = [np.full((16, 24, 3), 90, np.uint8) for _ in range(4)]
    pcm = np.full(800, ulaw_decode_table()[(~40) & 0xFF], np.int16)
    rows = [
        (1, "image", "gif", bytearray(encode_gif(gif_frames[0]))),
        (2, "video", "gif", bytearray(encode_gif(gif_frames, delays_cs=[2, 3, 4]))),
        (3, "video", "y4m", bytearray(encode_y4m(y4m_frames, 10, 1, "mono"))),
        (4, "video", "avi", bytearray(encode_avi_mjpeg(avi_frames, fps=5))),
        (5, "audio", "wav", bytearray(encode_wav_g711(pcm, 8000, "ulaw"))),
    ]
    return spark.createDataFrame(
        rows, "media_id bigint, modality string, codec string, payload binary"
    )


class TestSparkIntegration:
    def test_decode_media_strict(self, media_mixed):
        from pulsar_spark.functions.multimodal import decode_media

        out = {
            r["media_id"]: r
            for r in decode_media(media_mixed, strict=True).collect()
        }
        assert all(r["decode_ok"] for r in out.values())
        assert (out[1]["width"], out[1]["n_frames"]) == (4, 1)
        assert out[1]["duration_ms"] is None
        assert (out[2]["n_frames"], out[2]["duration_ms"]) == (3, 90)
        assert (out[3]["width"], out[3]["n_frames"], out[3]["duration_ms"]) == (6, 2, 200)
        assert out[5]["duration_ms"] == 100

    def test_sample_video_frames_dispatch(self, media_mixed):
        from pulsar_spark.functions.video import sample_video_frames

        vids = media_mixed.where("modality = 'video'")
        rows = sample_video_frames(vids, every_n=2).collect()
        by_media = {}
        for r in rows:
            by_media.setdefault(r["media_id"], []).append(r)
        # gif animation: frames 0, 2 of 3; means are the solid values
        gif = sorted(by_media[2], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in gif] == [0, 2]
        assert [r["mean_luma_q"] for r in gif] == [10, 30]
        # y4m: frame 0 of 2, exact mean
        y4m = by_media[3]
        assert [(r["frame_idx"], r["mean_luma_q"]) for r in y4m] == [(0, 50)]
        assert (y4m[0]["width"], y4m[0]["height"]) == (6, 4)
        # avi still works
        assert [r["frame_idx"] for r in sorted(by_media[4], key=lambda r: r["frame_idx"])] == [0, 2]

    def test_resize_media_upcasts(self, spark, media_mixed):
        from pulsar_spark.functions.multimodal import (
            _decode_png,
            decode_media,
            resize_media,
        )

        vis = media_mixed.where("media_id in (1, 2, 3)")
        out = {
            r["media_id"]: r
            for r in resize_media(vis, 8, 8, strict=True).collect()
        }
        assert out[1]["codec"] == "png"  # still gif -> png
        px = _decode_png(bytes(out[1]["payload"]))
        assert px.shape == (8, 8, 3)
        assert out[2]["codec"] == "y4m"  # animated gif -> y4m video
        info = parse_y4m(bytes(out[2]["payload"]))
        assert len(info["frames"]) == 3
        assert info["frames"][0].shape == (8, 8, 3)
        assert out[3]["codec"] == "y4m"
        # resized containers stay strict-tier decodable
        d2 = decode_media(
            spark.createDataFrame(
                [(2, "video", "y4m", bytearray(out[2]["payload"]))],
                "media_id bigint, modality string, codec string, payload binary",
            ),
            strict=True,
        )
        assert d2.collect()[0]["decode_ok"]


# ------------------------------------------- stored schema policies


class TestSchemaPolicies:
    """Schema governance from the DURABLE policy registry —
    Namespaces.setSchemaCompatibilityStrategy /
    setIsAllowAutoUpdateSchema / setSchemaValidationEnforced."""

    @staticmethod
    def _schemas():
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        v0 = StructType([
            StructField("a", LongType(), False),
            StructField("b", StringType(), False),
        ])
        # drops the NON-nullable b: BACKWARD-compatible (the new
        # reader ignores the old field) but FORWARD-incompatible (an
        # old reader cannot default the missing required field)
        v1 = StructType([StructField("a", LongType(), False)])
        return v0, v1

    def test_register_resolves_stored_strategy(self, tmp_path):
        from pulsar_spark.schema_registry import (
            IncompatibleSchemaError,
            SchemaRegistry,
        )
        from pulsar_spark.sources.policies import set_policy

        v0, v1 = self._schemas()
        topic = str(tmp_path / "ns" / "t1")
        import os

        os.makedirs(topic)
        reg = SchemaRegistry(str(tmp_path / "registry"))
        reg.register("t1", v0, strategy=None, policy_dir=topic)
        # default FULL refuses the drop...
        with pytest.raises(IncompatibleSchemaError):
            reg.register("t1", v1, strategy=None, policy_dir=topic)
        # ...but a stored BACKWARD policy admits it — and survives a
        # fresh registry instance (restart)
        set_policy(topic, "schema_compatibility_strategy", "BACKWARD")
        reg2 = SchemaRegistry(str(tmp_path / "registry"))
        assert reg2.register("t1", v1, strategy=None, policy_dir=topic) == 1

    def test_namespace_policy_overlaid_by_topic(self, tmp_path):
        from pulsar_spark.schema_registry import SchemaRegistry
        from pulsar_spark.sources.policies import set_policy

        import os

        ns = tmp_path / "ns"
        topic = ns / "t2"
        os.makedirs(topic)
        set_policy(str(ns), "schema_compatibility_strategy", "BACKWARD")
        assert SchemaRegistry.stored_strategy(str(topic)) == "BACKWARD"
        set_policy(str(topic), "schema_compatibility_strategy", "ALWAYS_COMPATIBLE")
        assert SchemaRegistry.stored_strategy(str(topic)) == "ALWAYS_COMPATIBLE"

    def test_auto_update_disabled_rejects_new_schema(self, tmp_path):
        from pulsar_spark.schema_registry import (
            IncompatibleSchemaError,
            SchemaRegistry,
        )
        from pulsar_spark.sources.policies import set_policy

        import os

        v0, v1 = self._schemas()
        topic = str(tmp_path / "ns" / "t3")
        os.makedirs(topic)
        reg = SchemaRegistry(str(tmp_path / "registry"))
        assert reg.auto_register("t3", v0, policy_dir=topic) == 0
        set_policy(topic, "is_allow_auto_update_schema", False)
        # a known schema still connects
        assert reg.auto_register("t3", v0, policy_dir=topic) == 0
        with pytest.raises(IncompatibleSchemaError, match="auto_update"):
            reg.auto_register("t3", v1, policy_dir=topic)

    def test_validation_enforced_gates_schemaless_produce(self, spark, tmp_path):
        from pulsar_spark.schema_registry import (
            IncompatibleSchemaError,
            SchemaRegistry,
        )
        from pulsar_spark.sources.policies import set_policy
        from pulsar_spark.sources.topics import produce

        import os

        topic = str(tmp_path / "ns" / "t4")
        os.makedirs(topic)
        reg = SchemaRegistry(str(tmp_path / "registry"))
        df = spark.range(3).selectExpr("id AS a", "CAST(id AS STRING) AS b")
        # no policy: schema-less topics accept anything
        produce(df, topic, num_partitions=2, registry=reg)
        set_policy(topic, "schema_validation_enforced", True)
        with pytest.raises(IncompatibleSchemaError, match="enforces schema"):
            produce(df, topic, num_partitions=2, registry=reg)
        # registering the schema unblocks the enforced produce
        reg.register(os.path.normpath(topic), df.schema)
        produce(df, topic, num_partitions=2, registry=reg)


class TestGifPhash:
    def test_phash_sees_gif_pixels(self, spark):
        # the perceptual-hash pixel entry (_decode_pixels) dispatches
        # gif to the real LZW kernel: a GIF and a BMP of the SAME
        # pixels must produce the SAME perceptual hashes
        from pulsar_spark.functions.gif import encode_gif
        from pulsar_spark.functions.multimodal import _encode_bmp
        from pulsar_spark.functions.phash import perceptual_hash_media

        rng = np.random.default_rng(11)
        pal = rng.integers(0, 256, (12, 3), dtype=np.uint8)
        px = pal[rng.integers(0, 12, (24, 32))]
        media = spark.createDataFrame(
            [
                (1, "image", "gif", bytearray(encode_gif(px))),
                (2, "image", "bmp", bytearray(_encode_bmp(px))),
            ],
            "media_id bigint, modality string, codec string, payload binary",
        )
        rows = {r.media_id: r for r in perceptual_hash_media(media).collect()}
        assert rows[1].phash == rows[2].phash
        assert rows[1].dhash == rows[2].dhash
        assert (rows[1].width, rows[1].height) == (32, 24)
