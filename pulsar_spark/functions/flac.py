"""FLAC codec — REAL lossless compressed-audio kernels, pure Python.

FLAC (the public Xiph format, RFC 9639) carries everything a decoder
needs inside the stream — predictor coefficients, rice parameters,
block sizes — so unlike MP3 (whose Huffman/window tables are the
library-bound blocker documented in multimodal.py) a complete subset
decoder needs NO external tables:

Decode: STREAMINFO metadata walk, frame sync + header (block size /
sample rate / channel assignment codes, UTF-8-coded frame index,
CRC-8), subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC (any
order, quantized coefficients from the stream), rice-coded residuals
(4-bit RICE and 5-bit RICE2 partition methods, escape code 0b11111 /
0b1111 = unencoded k-bit residuals), wasted-bits shifts, left/right /
right/left / mid-side stereo decorrelation, frame CRC-16 verification.

Encode (fixture tier, what the oracle + property tests mint): 16-bit
MONO, fixed block size, per-block best-of FIXED orders 0-2 vs
VERBATIM with a single rice partition (parameter from the mean-abs
residual estimate) — a genuine rice-entropy-coded FLAC stream any
conforming decoder reads.

CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) are generated
programmatically — no embedded tables anywhere in this module.

Reference parity: media payloads are opaque binary columns in the
reference (SURVEY §2 multimodal rows); this promotes ``flac`` into
``functions/multimodal.REAL_CODECS``, the same tier as GIF/G.711/
IMA-ADPCM, shrinking the stub surface to mp3 + inter-coded video.
"""

from __future__ import annotations

import struct

__all__ = ["encode_flac", "decode_flac"]

_FIXED_COEFFS = {
    # order: prediction = sum(c * prior) — the spec's fixed predictors
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        if width == 0:
            return
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, width: int) -> int:
        out = 0
        while width > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(width, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            width -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")
        return q

    def read_signed(self, width: int) -> int:
        v = self.read(width)
        return v - (1 << width) if v & (1 << (width - 1)) else v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(x: int) -> int:
    return (x << 1) if x >= 0 else ((-x << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (plain UTF-8 over the
    integer, extended past U+10FFFF by the same pattern). An
    ``nbytes``-byte sequence has a lead byte of ``nbytes`` ones then a
    zero (capacity ``5*nbytes + 1`` payload bits)."""
    if n < 0x80:
        return bytes((n,))
    nbytes = 2
    while n.bit_length() > 5 * nbytes + 1:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out = [lead | (n >> shift)]
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_code(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2:
        raise ValueError("malformed FLAC frame number")
    n = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("malformed FLAC frame number continuation")
        n = (n << 6) | (cont & 0x3F)
    return n


# --------------------------------------------------------------- encode


def _best_fixed_order(block, max_order: int = 2) -> int:
    """Pick the fixed predictor order minimizing the mean |residual|."""
    best, best_cost = 0, None
    cur = list(block)
    for order in range(0, max_order + 1):
        if order > 0:
            if len(cur) <= 1:
                break
            cur = [cur[i] - cur[i - 1] for i in range(1, len(cur))]
        cost = sum(abs(x) for x in cur) / max(1, len(cur))
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(residuals) -> int:
    if not residuals:
        return 0
    mean = sum(abs(r) for r in residuals) / len(residuals)
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def encode_flac(samples, rate: int = 8000, block_size: int = 4096) -> bytes:
    """int16 mono samples -> a genuine FLAC stream (fLaC marker +
    STREAMINFO, rice-entropy-coded FIXED/VERBATIM frames)."""
    import numpy as np

    x = [int(v) for v in np.asarray(samples, dtype=np.int16)]
    n = len(x)

    # STREAMINFO (34 bytes): min/max block, min/max frame (0 = unknown),
    # rate(20) ch-1(3) bits-1(5) total(36), md5 zeros (unset is legal)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # 1 channel
    si.write(15, 5)  # 16 bits
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes((0x80,)) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for frame_idx, start in enumerate(range(0, n, block_size)):
        block = x[start : start + block_size]
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed block size stream
        hdr.write(0b0111, 4)  # block size: 16-bit at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0, 4)  # channels: mono
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_code(frame_idx) + struct.pack(">H", bs - 1)
        head += bytes((_crc8(head),))

        body = _BitWriter()
        order = _best_fixed_order(block) if bs > 4 else 0
        const = all(v == block[0] for v in block)
        if const:
            body.write(0, 1)  # subframe header: zero pad bit
            body.write(0b000000, 6)  # CONSTANT
            body.write(0, 1)  # no wasted bits
            body.write(block[0] & 0xFFFF, 16)
        else:
            residuals = list(block)
            for _ in range(order):
                residuals = [
                    residuals[i] - residuals[i - 1]
                    for i in range(1, len(residuals))
                ]
            k = _rice_param(residuals)
            rice_bits = sum(
                (_zigzag(r) >> k) + 1 + k for r in residuals
            ) + order * 16
            if rice_bits >= 16 * bs:  # VERBATIM is cheaper
                body.write(0, 1)
                body.write(0b000001, 6)  # VERBATIM
                body.write(0, 1)
                for v in block:
                    body.write(v & 0xFFFF, 16)
            else:
                body.write(0, 1)
                body.write(0b001000 | order, 6)  # FIXED, order
                body.write(0, 1)
                for v in block[:order]:  # warmup samples
                    body.write(v & 0xFFFF, 16)
                body.write(0b00, 2)  # residual method: RICE (4-bit)
                body.write(0, 4)  # partition order 0
                body.write(k, 4)
                for r in residuals:
                    u = _zigzag(r)
                    body.write_unary(u >> k)
                    body.write(u, k)
        body.align()
        frame = head + body.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# --------------------------------------------------------------- decode

_BLOCK_SIZE_CODES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_RATE_CODES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BITS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _read_subframe(br: _BitReader, bs: int, bits: int):
    if br.read(1) != 0:
        raise ValueError("invalid subframe padding bit")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count - 1 follows
        wasted = br.read_unary() + 1
    eff = bits - wasted

    if sf_type == 0b000000:  # CONSTANT
        out = [br.read_signed(eff)] * bs
    elif sf_type == 0b000001:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(bs)]
    elif 0b001000 <= sf_type <= 0b001100:  # FIXED 0-4
        order = sf_type & 0x07
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residuals(br, bs, order)
        coeffs = _FIXED_COEFFS[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append(r + pred)
    elif sf_type >= 0b100000:  # LPC, order = low 5 bits + 1
        order = (sf_type & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residuals(br, bs, order)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {sf_type:#08b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _read_residuals(br: _BitReader, bs: int, order: int):
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if bs % n_parts:
        raise ValueError("block size not divisible by partition count")
    if n_parts > 1 and (bs >> part_order) <= order:
        raise ValueError("FLAC partition order leaves no residuals in partition 0")
    out = []
    for p in range(n_parts):
        count = (bs >> part_order) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            width = br.read(5)
            out += [br.read_signed(width) if width else 0 for _ in range(count)]
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                out.append(_unzigzag(u))
    return out


def decode_flac(payload: bytes):
    """FLAC bytes -> (int32 numpy sample array [n, channels] squeezed
    to 1-D for mono, sample_rate). Verifies every frame's CRC-16."""
    import numpy as np

    buf = bytes(payload)
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = channels = bits = None
    total = None
    while True:  # metadata blocks
        if pos + 4 > len(buf):
            raise ValueError("truncated FLAC metadata")
        last = buf[pos] & 0x80
        btype = buf[pos] & 0x7F
        size = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16); br.read(16); br.read(24); br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
        pos += 4 + size
        if last:
            break
    if rate is None:
        raise ValueError("FLAC stream missing STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(buf):
        frame_start = pos
        br = _BitReader(buf, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        bits_code = br.read(3)
        br.read(1)
        _read_utf8_code(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code in _BLOCK_SIZE_CODES:
            bs = _BLOCK_SIZE_CODES[bs_code]
        else:
            raise ValueError("reserved block size code")
        if rate_code == 0b1100:
            br.read(8)
        elif rate_code in (0b1101, 0b1110):
            br.read(16)
        if bits_code == 0:
            fbits = bits
        elif bits_code in _BITS_CODES:
            fbits = _BITS_CODES[bits_code]
        else:
            # 0b011 is reserved (RFC 9639 §9.1.4) — must hold the
            # total-ValueError contract, not leak a KeyError
            raise ValueError("reserved FLAC bits-per-sample code")
        br.align()
        if br.byte >= len(buf):
            raise ValueError("truncated FLAC frame header")
        header_crc = buf[br.byte]
        if _crc8(buf[frame_start : br.byte]) != header_crc:
            raise ValueError("FLAC frame header CRC mismatch")
        br.byte += 1

        if ch_code < 8:
            n_ch = ch_code + 1
            sub = [_read_subframe(br, bs, fbits) for _ in range(n_ch)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(br, bs, fbits)
            side = _read_subframe(br, bs, fbits + 1)
            sub = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _read_subframe(br, bs, fbits + 1)
            right = _read_subframe(br, bs, fbits)
            sub = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(br, bs, fbits)
            side = _read_subframe(br, bs, fbits + 1)
            sub = [
                [(2 * m + (s & 1) + s) >> 1 for m, s in zip(mid, side)],
                [(2 * m + (s & 1) - s) >> 1 for m, s in zip(mid, side)],
            ]
        else:
            raise ValueError("reserved channel assignment")
        if len(sub) != channels:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        br.align()
        if br.byte + 2 > len(buf):
            raise ValueError("truncated FLAC frame (CRC-16 missing)")
        crc = struct.unpack_from(">H", buf, br.byte)[0]
        if _crc16(buf[frame_start : br.byte]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte + 2
        for c, s in zip(chans, sub):
            c += s

    arr = np.array(chans, dtype=np.int64).T
    if total:
        arr = arr[:total]
    if channels == 1:
        arr = arr[:, 0]
    return arr.astype(np.int32), int(rate)
