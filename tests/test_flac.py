"""FLAC codec (functions/flac.py): roundtrip properties for the
encoder tier plus hand-assembled streams for the decode-only paths —
LPC subframes, multi-partition rice, escape codes, stereo
decorrelation, wasted bits, CRC rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pulsar_spark.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_code,
    _zigzag,
    decode_flac,
    encode_flac,
)


class TestRoundtrip:
    def test_signal_families(self):
        rng = np.random.default_rng(0)
        for sig in (
            rng.integers(-32768, 32768, 5000).astype(np.int16),
            (9000 * np.sin(np.arange(12000) * 0.013)).astype(np.int16),
            np.arange(-4000, 4000, 2, dtype=np.int16),
            np.full(6000, 31000, np.int16),
            np.array([-32768], np.int16),
        ):
            dec, rate = decode_flac(encode_flac(sig, 16000))
            assert rate == 16000
            assert np.array_equal(dec, sig.astype(np.int32))

    def test_block_boundaries(self):
        rng = np.random.default_rng(1)
        for n in (4095, 4096, 4097, 8192, 1):
            sig = rng.integers(-1000, 1000, n).astype(np.int16)
            dec, _ = decode_flac(encode_flac(sig, 8000, block_size=4096))
            assert np.array_equal(dec, sig.astype(np.int32)), n

    def test_compresses_smooth_signals(self):
        sig = (8000 * np.sin(np.arange(40000) * 0.01)).astype(np.int16)
        assert len(encode_flac(sig, 8000)) < 0.3 * sig.nbytes

    def test_rejects_garbage_and_corruption(self):
        with pytest.raises(ValueError):
            decode_flac(b"not a flac stream")
        good = bytearray(encode_flac(np.arange(100, dtype=np.int16), 8000))
        good[-3] ^= 0x40  # flip a bit inside the last frame body
        # depending on where the flip lands the decoder sees either a
        # CRC mismatch or a mis-framed (truncated/desynced) bitstream —
        # both must surface as ValueError, never garbage samples
        with pytest.raises(ValueError, match="CRC|truncated|sync"):
            decode_flac(bytes(good))


def _streaminfo(rate=8000, channels=1, bits=16, total=0, block=4096) -> bytes:
    si = _BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes((0x80,)) + len(body).to_bytes(3, "big") + body


def _frame(bs: int, subframe_bits, ch_code: int = 0, bits_code: int = 0b100) -> bytes:
    """Assemble one frame around caller-provided subframe writer(s)."""
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)
    hdr.write(0b0111, 4)  # 16-bit block size at end of header
    hdr.write(0b0000, 4)  # rate from STREAMINFO
    hdr.write(ch_code, 4)
    hdr.write(bits_code, 3)
    hdr.write(0, 1)
    hdr.align()
    head = hdr.bytes() + _utf8_code(0) + struct.pack(">H", bs - 1)
    head += bytes((_crc8(head),))
    body = _BitWriter()
    for write_subframe in subframe_bits:
        write_subframe(body)
    body.align()
    frame = head + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _constant(value: int, bits: int = 16, wasted: int = 0):
    def w(bw: _BitWriter):
        bw.write(0, 1)
        bw.write(0b000000, 6)
        if wasted:
            bw.write(1, 1)
            bw.write(1, wasted)  # unary: (wasted-1) zeros then a 1
        else:
            bw.write(0, 1)
        bw.write(value & ((1 << (bits - wasted)) - 1), bits - wasted)

    return w


class TestDecodeOnlyPaths:
    def test_lpc_subframe(self):
        # x[i] = 2 x[i-1] - x[i-2] exactly (a line): LPC order 2,
        # coefficients [2, -1], shift 0 -> all-zero residuals
        bs = 64
        sig = [100 + 3 * i for i in range(bs)]

        def lpc(bw: _BitWriter):
            bw.write(0, 1)
            bw.write(0b100000 | (2 - 1), 6)  # LPC, order 2
            bw.write(0, 1)  # no wasted bits
            bw.write(sig[0] & 0xFFFF, 16)
            bw.write(sig[1] & 0xFFFF, 16)
            bw.write(5 - 1, 4)  # coefficient precision 5 bits
            bw.write(0, 5)  # shift 0
            bw.write(2 & 0x1F, 5)   # c0 = 2
            bw.write(-1 & 0x1F, 5)  # c1 = -1
            bw.write(0b00, 2)  # rice method
            bw.write(0, 4)  # partition order 0
            bw.write(0, 4)  # k = 0
            for _ in range(bs - 2):
                bw.write_unary(0)  # zigzag(0) = 0

        payload = _streaminfo(total=bs) + _frame(bs, [lpc])
        dec, _ = decode_flac(payload)
        assert dec.tolist() == sig

    def test_lpc_with_shift(self):
        # quantized coefficients: c=[3] with shift 1 -> pred = (3*prev)>>1
        bs = 16
        out = [1000]
        residuals = [7, -3, 5, 2, -8, 1, 0, 4, -6, 2, 3, -1, 9, -2, 5]
        for r in residuals:
            out.append(r + ((3 * out[-1]) >> 1))

        def lpc(bw: _BitWriter):
            bw.write(0, 1)
            bw.write(0b100000 | 0, 6)  # LPC order 1
            bw.write(0, 1)
            bw.write(out[0] & 0xFFFF, 16)
            bw.write(4 - 1, 4)
            bw.write(1, 5)  # shift 1
            bw.write(3, 4)  # c0 = 3
            bw.write(0b00, 2)
            bw.write(0, 4)
            bw.write(2, 4)  # k = 2
            for r in residuals:
                u = _zigzag(r)
                bw.write_unary(u >> 2)
                bw.write(u, 2)

        payload = _streaminfo(total=bs) + _frame(bs, [lpc])
        dec, _ = decode_flac(payload)
        assert dec.tolist() == out

    def test_rice_partitions_and_escape(self):
        # FIXED order 1, partition order 1: two partitions with
        # different parameters, the second using the ESCAPE code
        # (unencoded 6-bit residuals)
        bs = 32
        res = [3, -2, 1, 0, -1, 2, 4, -3, 1, 1, -2, 0, 3, -1, 2, -4,
               17, -25, 9, -30, 22, 5, -11, 30, -17, 8, 25, -9, 14, -22, 6, -27]
        res = res[: bs - 1]
        out = [500]
        for r in res:
            out.append(r + out[-1])

        def fixed(bw: _BitWriter):
            bw.write(0, 1)
            bw.write(0b001000 | 1, 6)  # FIXED order 1
            bw.write(0, 1)
            bw.write(out[0] & 0xFFFF, 16)
            bw.write(0b00, 2)
            bw.write(1, 4)  # partition order 1 -> 2 partitions
            # partition 1: (bs/2 - order) residuals, k = 2
            bw.write(2, 4)
            for r in res[: bs // 2 - 1]:
                u = _zigzag(r)
                bw.write_unary(u >> 2)
                bw.write(u, 2)
            # partition 2: bs/2 residuals, escape -> raw 7-bit signed
            bw.write(0b1111, 4)
            bw.write(7, 5)
            for r in res[bs // 2 - 1 :]:
                bw.write(r & 0x7F, 7)

        payload = _streaminfo(total=bs) + _frame(bs, [fixed])
        dec, _ = decode_flac(payload)
        assert dec.tolist() == out

    def test_stereo_decorrelation_modes(self):
        bs = 8
        left, right = 1000, 760
        side = left - right
        mid = (left + right) >> 1
        for ch_code, subs in (
            (1, [_constant(left), _constant(right)]),          # independent
            (8, [_constant(left), _constant(side, bits=17)]),  # left/side
            (9, [_constant(side, bits=17), _constant(right)]),  # right/side
            (10, [_constant(mid), _constant(side, bits=17)]),  # mid/side
        ):
            payload = _streaminfo(channels=2, total=bs) + _frame(
                bs, subs, ch_code=ch_code
            )
            dec, _ = decode_flac(payload)
            assert dec.shape == (bs, 2), ch_code
            assert dec[0].tolist() == [left, right], ch_code

    def test_wasted_bits(self):
        bs = 8
        # stored value 300 with 2 wasted bits -> samples 300 << 2
        payload = _streaminfo(total=bs) + _frame(
            bs, [_constant(300, bits=16, wasted=2)]
        )
        dec, _ = decode_flac(payload)
        assert dec.tolist() == [1200] * bs

    def test_fixed_orders_3_and_4(self):
        # cubic signal: order-3 prediction leaves constant residuals,
        # order-4 leaves zeros; both must reconstruct exactly
        bs = 32
        sig = [((i - 7) ** 3) // 8 for i in range(bs)]
        for order in (3, 4):
            res = list(sig)
            for _ in range(order):
                res = [res[i] - res[i - 1] for i in range(1, len(res))]

            def fixed(bw: _BitWriter, order=order, res=res):
                bw.write(0, 1)
                bw.write(0b001000 | order, 6)
                bw.write(0, 1)
                for v in sig[:order]:
                    bw.write(v & 0xFFFF, 16)
                bw.write(0b00, 2)
                bw.write(0, 4)
                k = 3
                bw.write(k, 4)
                for r in res:
                    u = _zigzag(r)
                    bw.write_unary(u >> k)
                    bw.write(u, k)

            payload = _streaminfo(total=bs) + _frame(bs, [fixed])
            dec, _ = decode_flac(payload)
            assert dec.tolist() == sig, order


class TestSparkIntegrationFlac:
    def test_decode_media_strict(self, spark):
        from pulsar_spark.functions.multimodal import decode_media

        sig = np.full(800, 12345, np.int16)
        media = spark.createDataFrame(
            [(1, "audio", "flac", bytearray(encode_flac(sig, 8000)))],
            "media_id bigint, modality string, codec string, payload binary",
        )
        out = decode_media(media, strict=True).collect()[0]
        assert out["decode_ok"] and out["duration_ms"] == 100
        assert out["n_frames"] == 800
        assert round(out["feature"][2] * 32768) == 12345


class TestReviewFindingsFlac:
    def test_long_clip_frame_numbers_past_127(self):
        # frame index >= 128 exercises the multi-byte UTF-8-style
        # frame-number coding (the lead-byte pattern regression)
        rng = np.random.default_rng(7)
        sig = rng.integers(-500, 500, 256 * 130).astype(np.int16)
        dec, _ = decode_flac(encode_flac(sig, 8000, block_size=256))
        assert np.array_equal(dec, sig.astype(np.int32))

    def test_utf8_code_is_real_utf8(self):
        # for values in the Unicode range the coding IS UTF-8
        for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000):
            assert _utf8_code(n) == chr(n).encode("utf-8"), hex(n)

    def test_empty_signal_roundtrips_empty(self):
        dec, rate = decode_flac(encode_flac(np.array([], np.int16), 8000))
        assert rate == 8000 and len(dec) == 0

    def test_truncation_after_header_is_valueerror(self):
        enc = encode_flac(np.arange(100, dtype=np.int16), 8000)
        for cut in range(40, len(enc)):
            try:
                decode_flac(enc[:cut])
            except ValueError:
                pass  # every truncation point must surface as ValueError
