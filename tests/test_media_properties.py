"""Property-based tests for the round-8 media kernels — hypothesis
drives the GIF/FLAC/G.711/Y4M codecs through arbitrary inputs and
adversarial byte mutations. The invariants:

1. roundtrip: decode(encode(x)) == x for every valid input;
2. totality: a mutated/truncated payload either decodes (mutations can
   land in slack bits) or raises ValueError — never returns garbage
   silently mislabeled as success, never hangs, never raises anything
   else.

Pure-Python: no SparkSession (Spark integration is covered in
test_media_kernels / test_flac).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_spark.functions.audio import decode_wav_g711, encode_wav_g711
from pulsar_spark.functions.flac import decode_flac, encode_flac
from pulsar_spark.functions.gif import decode_gif, encode_gif
from pulsar_spark.functions.video import encode_y4m, parse_y4m


@st.composite
def small_frames(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    ncol = draw(st.integers(1, 8))
    nf = draw(st.integers(1, 3))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return [pal[rng.integers(0, ncol, (h, w))] for _ in range(nf)]


class TestGifProperties:
    @settings(max_examples=40, deadline=None)
    @given(frames=small_frames(), interlace=st.booleans())
    def test_roundtrip(self, frames, interlace):
        d = decode_gif(encode_gif(frames, interlace=interlace))
        assert len(d["frames"]) == len(frames)
        for a, b in zip(d["frames"], frames):
            assert np.array_equal(a, b)

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        pos=st.integers(0, 200),
        bit=st.integers(0, 7),
        cut=st.integers(0, 60),
    )
    def test_mutation_totality(self, seed, pos, bit, cut):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 4, (6, 6), dtype=np.uint8)
        pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
        payload = bytearray(encode_gif(pal[px]))
        payload[pos % len(payload)] ^= 1 << bit
        data = bytes(payload[: len(payload) - cut % len(payload)])
        try:
            decode_gif(data)
        except ValueError:
            pass  # the only acceptable failure mode


class TestFlacProperties:
    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n=st.integers(0, 3000),
        mode=st.sampled_from(["noise", "smooth", "const"]),
        block=st.sampled_from([256, 1024, 4096]),
    )
    def test_roundtrip(self, seed, n, mode, block):
        rng = np.random.default_rng(seed)
        if mode == "noise":
            sig = rng.integers(-32768, 32768, n).astype(np.int16)
        elif mode == "smooth":
            sig = (6000 * np.sin(np.arange(n) * 0.02 + seed % 7)).astype(np.int16)
        else:
            sig = np.full(n, rng.integers(-32768, 32768), np.int16)
        dec, rate = decode_flac(encode_flac(sig, 8000, block_size=block))
        assert rate == 8000
        assert np.array_equal(dec, sig.astype(np.int32))

    @settings(max_examples=60, deadline=None)
    @given(
        pos=st.integers(0, 500),
        bit=st.integers(0, 7),
        cut=st.integers(0, 80),
    )
    def test_mutation_totality(self, pos, bit, cut):
        sig = (np.arange(400) * 13 % 2048 - 1024).astype(np.int16)
        payload = bytearray(encode_flac(sig, 8000, block_size=256))
        payload[pos % len(payload)] ^= 1 << bit
        data = bytes(payload[: len(payload) - cut % len(payload)])
        try:
            decode_flac(data)
        except ValueError:
            pass


class TestG711Properties:
    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n=st.integers(1, 2000),
        law=st.sampled_from(["ulaw", "alaw"]),
        rate=st.sampled_from([8000, 16000]),
    )
    def test_double_encode_is_stable(self, seed, n, law, rate):
        # companding is idempotent past one pass: decode(encode(x))
        # is a codebook value, so re-encoding it is lossless
        rng = np.random.default_rng(seed)
        x = rng.integers(-32768, 32768, n).astype(np.int32)
        once, r = decode_wav_g711(encode_wav_g711(x, rate, law))
        twice, _ = decode_wav_g711(encode_wav_g711(once, rate, law))
        assert r == rate
        assert np.array_equal(once, twice)

    @settings(max_examples=40, deadline=None)
    @given(pos=st.integers(0, 300), bit=st.integers(0, 7))
    def test_mutation_totality(self, pos, bit):
        payload = bytearray(
            encode_wav_g711(np.arange(500, dtype=np.int16), 8000, "ulaw")
        )
        payload[pos % len(payload)] ^= 1 << bit
        try:
            decode_wav_g711(bytes(payload))
        except ValueError:
            pass


class TestY4MProperties:
    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        nf=st.integers(1, 4),
    )
    def test_mono_roundtrip(self, seed, h, w, nf):
        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(nf)]
        d = parse_y4m(encode_y4m(frames, 30, 1, "mono"))
        assert len(d["frames"]) == nf
        for a, b in zip(d["frames"], frames):
            assert np.array_equal(a[..., 0], b)

    @settings(max_examples=40, deadline=None)
    @given(pos=st.integers(0, 120), bit=st.integers(0, 7), cut=st.integers(0, 40))
    def test_mutation_totality(self, pos, bit, cut):
        frames = [np.full((4, 4), 50, np.uint8), np.full((4, 4), 90, np.uint8)]
        payload = bytearray(encode_y4m(frames, 10, 1, "mono"))
        payload[pos % len(payload)] ^= 1 << bit
        data = bytes(payload[: len(payload) - cut % len(payload)])
        try:
            parse_y4m(data)
        except ValueError:
            pass
