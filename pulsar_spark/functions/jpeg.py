"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib.

The reference treats compressed images as opaque payloads flowing
through topics; this repo's media stage decodes them into pixels
(functions/multimodal.py). BMP/PNM/PNG/WAV kernels are implemented
there; this module adds the remaining mainstream raster codec, baseline
sequential JPEG, so real crawl corpora (overwhelmingly jpeg/png) decode
for real in this container:

- ``decode_jpeg``: baseline DCT sequential (SOF0/SOF1) AND progressive
  (SOF2, T.81 Annex G: spectral selection + successive approximation,
  EOB-run coding, DC/AC refinement scans, interleaved DC +
  non-interleaved AC block grids), grayscale or YCbCr with sampling
  factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers
  (DRI/RSTn), multi-segment DQT/DHT, APPn/COM skip -> HxWx3 uint8 RGB.
  Arithmetic coding, 12-bit precision and hierarchical modes raise
  ValueError (stub tier — rare in crawl data and genuinely separate
  decoders).
- ``encode_jpeg``: the matching baseline encoder (grayscale 1x1 or
  YCbCr 4:4:4, standard Annex K Huffman tables, caller-supplied
  quantization), used by tests and the in-flight oracle payload
  builder. With a flat all-ones quant table, constant 8x8 blocks
  round-trip EXACTLY (only the DC coefficient is nonzero and it is an
  integer), which is what makes the driver oracle closed-form.
- ``encode_jpeg_progressive``: progressive encoder (spectral bands +
  successive approximation over identical quantized coefficients), so
  round-trip tests can assert progressive decode == baseline decode
  pixel-for-pixel on the same input.

Everything here is public knowledge: the JPEG interchange format and
the Annex K example tables are in the freely published T.81 spec.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` stages
(multimodal.decode_media); the per-block Huffman loop is Python but the
dequant + IDCT runs as one batched einsum over all blocks of an image.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

#: zig-zag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: T.81 Annex K.1 example luminance quantization table (raster order)
STD_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.uint16)

#: flat table: lossless-for-DC-only-blocks configuration used by tests
FLAT_QUANT = np.ones(64, dtype=np.uint16)

# T.81 Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: AC table for PROGRESSIVE scans: the Annex K example tables carry no
#: EOBn symbols (0x10..0xE0 — end-of-band runs longer than 1 exist only
#: in progressive mode, T.81 G.1.2.2), so a progressive encoder needs
#: its own table. This one holds every possible RS byte: 254 symbols at
#: 8 bits + 2 at 9 bits (canonical code space 2^8 = 256 → 254 leaves
#: one 8-bit prefix = two 9-bit codes; the all-ones code stays unused).
#: Deliberately flat — it exists for correctness tests/oracles, not
#: compression ratio.
_AC_FULL = (
    [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)

#: orthonormal 8-point DCT-II basis; fdct = T @ B @ T.T, idct = T.T @ F @ T
_T = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment -> {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Inverse map {(length, code): symbol} for the bit-serial decoder."""
    return {(length, code): sym for sym, (code, length) in _huff_codes(bits, vals).items()}


def _category(v: int) -> int:
    """DC/AC magnitude category (number of magnitude bits, T.81 F.1.2)."""
    return int(abs(v)).bit_length()


# ------------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits per spec


def _encode_coeff_bits(v: int) -> tuple[int, int]:
    """Signed value -> (category, magnitude bits) per T.81 F.1.2.1/F.1.4."""
    s = _category(v)
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of one component plane -> (nby, nbx, 64) quantized
    zig-zag coefficients. ``plane`` dims must be multiples of 8."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coeffs = np.einsum("ux,byxz,vz->byuv", _T, blocks, _T)
    q = np.round(coeffs.reshape(h // 8, w // 8, 64) / quant.reshape(8, 8).reshape(64))
    return q[:, :, ZIGZAG].astype(np.int64)


def _encode_blocks(
    writer: _BitWriter,
    zz: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Huffman-encode one component's (n, 64) zig-zag blocks; returns the
    final DC predictor."""
    for blk in zz:
        s, bits_ = _encode_coeff_bits(int(blk[0]) - pred)
        pred = int(blk[0])
        code, ln = dc_codes[s]
        writer.put(code, ln)
        if s:
            writer.put(bits_, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.put(code, ln)
                run -= 16
            s, bits_ = _encode_coeff_bits(v)
            code, ln = ac_codes[(run << 4) | s]
            writer.put(code, ln)
            writer.put(bits_, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.put(code, ln)
    return pred


def _dht_segment(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, vals = table
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, quant: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(quant[z]) for z in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray = STD_LUMA_QUANT,
    chroma_quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB, encoded as YCbCr) uint8 ->
    baseline SOF0 JPEG bytes with Annex K Huffman tables.

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (chroma averaged 2x2; MCU = 4 Y + Cb + Cr). ``restart_interval``
    emits DRI + RSTn markers every N MCUs. Dimensions must be multiples
    of 8 ('444') / 16 ('420') — no edge replication; the encoder exists
    for tests/oracles, the decoder handles arbitrary dims."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    mcu_mult = 16 if (subsampling == "420" and not gray) else 8
    if h % mcu_mult or w % mcu_mult:
        raise ValueError(f"encode_jpeg requires dims that are multiples of {mcu_mult}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    ys, cs = (0x22, 0x11) if (subsampling == "420" and not gray) else (0x11, 0x11)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, quant)
    comps = [(1, ys, 0)]  # (id, sampling h<<4|v, quant table)
    if not gray:
        cq = chroma_quant if chroma_quant is not None else quant
        out += _dqt_segment(1, cq)
        comps += [(2, cs, 1), (3, cs, 1)]
    # SOF0
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, samp, tq in comps:
        body += bytes([cid, samp, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    body = bytes([len(comps)])
    for cid, _, tq in comps:
        body += bytes([cid, (tq << 4) | tq])  # dc table tq, ac table tq
    body += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    if gray:
        planes = [(arr.astype(np.float64), quant, 0)]
    else:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        cq = chroma_quant if chroma_quant is not None else quant
        if subsampling == "420":
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        planes = [(y, quant, 0), (cb, cq, 1), (cr, cq, 1)]

    # per-component (nby, nbx, 64) zig-zag grids
    zz = [_fdct_quant(np.clip(np.round(p), 0, 255), q) for p, q, _ in planes]
    samp = [(c[1] >> 4, c[1] & 0xF) for c in comps]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    dc_maps = [_huff_codes(*t) for t in (_DC_LUMA, _DC_CHROMA)]
    ac_maps = [_huff_codes(*t) for t in (_AC_LUMA, _AC_CHROMA)]
    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()
                writer.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for c, (_, _, tid) in enumerate(planes):
                hs, vs = samp[c]
                for v in range(vs):
                    for u in range(hs):
                        blk = zz[c][my * vs + v, mx * hs + u]
                        preds[c] = _encode_blocks(
                            writer, blk[None, :], dc_maps[tid], ac_maps[tid], preds[c]
                        )
            mcu_index += 1
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------------- progressive encoder


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating TOWARD ZERO
    (T.81 G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


class _EobState:
    """End-of-band run accumulator for progressive AC scans, plus the
    correction bits deferred behind the next emitted symbol
    (refinement scans only)."""

    def __init__(self, writer: _BitWriter, ac_codes: dict) -> None:
        self.writer = writer
        self.ac = ac_codes
        self.run = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.run > 0:
            cat = self.run.bit_length() - 1
            code, ln = self.ac[cat << 4]
            self.writer.put(code, ln)
            if cat:
                self.writer.put(self.run - (1 << cat), cat)
            self.run = 0
        for b in self.pending:
            self.writer.put(b, 1)
        self.pending = []

    def add_block(self, bits: list[int]) -> None:
        self.run += 1
        self.pending.extend(bits)
        if self.run == 0x7FFF:  # EOBRUN cap (T.81 G.1.2.2)
            self.flush()


def _enc_ac_first(writer, blocks, ss, se, al, ac_codes, eob: _EobState) -> None:
    """AC first scan (Ah=0) for one component band, EOB-run coded."""
    for blk in blocks:
        r = 0
        emitted = False
        for k in range(ss, se + 1):
            v = _pt(int(blk[k]), al)
            if v == 0:
                r += 1
                continue
            eob.flush()
            while r > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.put(code, ln)
                r -= 16
            s, bits_ = _encode_coeff_bits(v)
            code, ln = ac_codes[(r << 4) | s]
            writer.put(code, ln)
            writer.put(bits_, s)
            r = 0
            emitted = True
        if r > 0 or not emitted:
            eob.add_block([])


def _enc_ac_refine(writer, blocks, ss, se, al, ac_codes, eob: _EobState) -> None:
    """AC refinement scan (Ah=Al+1): one correction bit per
    already-nonzero coefficient, newly-significant values as ±1 with
    deferred correction bits (T.81 G.1.2.3)."""
    for blk in blocks:
        vt = [_pt(int(blk[k]), al) for k in range(ss, se + 1)]
        mag = [abs(v) for v in vt]
        last_new = -1
        for idx, m in enumerate(mag):
            if m == 1:
                last_new = idx
        r = 0
        held: list[int] = []  # correction bits inside the current run
        for idx in range(last_new + 1):
            m = mag[idx]
            if m == 0:
                r += 1
                continue
            # ZRL must be emitted at the FIRST nonzero coefficient once
            # the zero-history run exceeds 15 — history or new alike —
            # so that the correction bits buffered so far are exactly
            # the ones the decoder's 16-zero walk will pass (emitting
            # at the newly-significant coefficient only would strand a
            # history bit beyond the walk's span)
            while r > 15:
                eob.flush()
                code, ln = ac_codes[0xF0]
                writer.put(code, ln)
                r -= 16
                for b in held:
                    writer.put(b, 1)
                held = []
            if m > 1:  # history coefficient: one correction bit, deferred
                held.append(m & 1)
                continue
            # newly significant (magnitude exactly 1 at this precision)
            eob.flush()
            code, ln = ac_codes[(r << 4) | 1]
            writer.put(code, ln)
            writer.put(1 if vt[idx] > 0 else 0, 1)
            for b in held:
                writer.put(b, 1)
            held = []
            r = 0
        # the trailing region joins the EOB run, with history correction
        # bits riding along — but ONLY if the block's coded content
        # ended before Se: when the last newly-significant coefficient
        # sits exactly at the band end, the decoder leaves the block
        # with nothing left to signal and an EOB here would desync it
        # onto the NEXT block
        if last_new < len(mag) - 1:
            tail_bits = held + [
                mag[i] & 1 for i in range(last_new + 1, len(mag)) if mag[i] > 1
            ]
            eob.add_block(tail_bits)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quant: np.ndarray = STD_LUMA_QUANT,
    chroma_quant: np.ndarray | None = None,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB as YCbCr 4:4:4) uint8 ->
    progressive SOF2 JPEG (T.81 Annex G): spectral selection over
    ``bands`` plus successive approximation (``dc_al``/``ac_al`` extra
    precision scans; 0 = spectral selection only). Quantized
    coefficients are identical to :func:`encode_jpeg`'s for the same
    input, so the two encodings decode to IDENTICAL pixels — which is
    what the round-trip tests assert. Dimensions must be multiples
    of 8 (encoder exists for tests/oracles; the decoder handles
    arbitrary dims)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_progressive requires dims that are multiples of 8")
    lo = 0
    for ss, se in bands:
        if ss != lo + 1 or se < ss or se > 63:
            raise ValueError("AC bands must contiguously cover [1, 63]")
        lo = se
    if lo != 63:
        raise ValueError("AC bands must contiguously cover [1, 63]")
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, quant)
    comps = [(1, 0x11, 0)]
    if not gray:
        cq = chroma_quant if chroma_quant is not None else quant
        out += _dqt_segment(1, cq)
        comps += [(2, 0x11, 1), (3, 0x11, 1)]
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, samp, tq in comps:
        body += bytes([cid, samp, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(body)) + body  # SOF2
    # DC uses the Annex K tables; AC uses the full progressive table
    # (EOBn symbols are absent from the example tables — see _AC_FULL)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_FULL)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_FULL)

    if gray:
        planes = [(arr.astype(np.float64), quant)]
    else:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        cq = chroma_quant if chroma_quant is not None else quant
        planes = [(y, quant), (cb, cq), (cr, cq)]
    zz = [
        _fdct_quant(np.clip(np.round(p), 0, 255), q).reshape(-1, 64)
        for p, q in planes
    ]
    nbx, nby = w // 8, h // 8
    dc_maps = [_huff_codes(*t) for t in (_DC_LUMA, _DC_CHROMA)]
    _full = _huff_codes(*_AC_FULL)
    ac_maps = [_full, _full]

    def sos_header(comp_idxs: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_idxs)])
        for c in comp_idxs:
            cid, _, tq = comps[c]
            body += bytes([cid, (tq << 4) | tq])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # scan 1: DC first, interleaved, point transform dc_al
    out += sos_header(list(range(len(comps))), 0, 0, 0, dc_al)
    writer = _BitWriter()
    preds = [0] * len(comps)
    for my in range(nby):
        for mx in range(nbx):
            for c in range(len(comps)):
                tid = comps[c][2]
                v = int(zz[c][my * nbx + mx][0]) >> dc_al  # arithmetic shift
                s, bits_ = _encode_coeff_bits(v - preds[c])
                preds[c] = v
                code, ln = dc_maps[tid][s]
                writer.put(code, ln)
                if s:
                    writer.put(bits_, s)
    writer.flush()
    out += writer.buf

    # DC refinement scans: one raw bit per block per precision level
    for al in range(dc_al - 1, -1, -1):
        out += sos_header(list(range(len(comps))), 0, 0, al + 1, al)
        writer = _BitWriter()
        for my in range(nby):
            for mx in range(nbx):
                for c in range(len(comps)):
                    writer.put((int(zz[c][my * nbx + mx][0]) >> al) & 1, 1)
        writer.flush()
        out += writer.buf

    # AC scans: per component, per spectral band — first pass at ac_al,
    # then refinement passes down to full precision
    for c in range(len(comps)):
        tid = comps[c][2]
        for ss, se in bands:
            out += sos_header([c], ss, se, 0, ac_al)
            writer = _BitWriter()
            eob = _EobState(writer, ac_maps[tid])
            _enc_ac_first(writer, zz[c], ss, se, ac_al, ac_maps[tid], eob)
            eob.flush()
            writer.flush()
            out += writer.buf
    for al in range(ac_al - 1, -1, -1):
        for c in range(len(comps)):
            tid = comps[c][2]
            for ss, se in bands:
                out += sos_header([c], ss, se, al + 1, al)
                writer = _BitWriter()
                eob = _EobState(writer, ac_maps[tid])
                _enc_ac_refine(writer, zz[c], ss, se, al, ac_maps[tid], eob)
                eob.flush()
                writer.flush()
                out += writer.buf

    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker (returns it via
    ``marker``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d, i = self.data, self.pos
        if i >= len(d):
            return False
        b = d[i]
        if b == 0xFF:
            if i + 1 < len(d) and d[i + 1] == 0x00:
                self.pos = i + 2
            else:
                self.marker = d[i + 1] if i + 1 < len(d) else None
                return False
        else:
            self.pos = i + 1
        # mask the accumulator so consumed high bits never accumulate
        # into an ever-growing Python int (n stays <= 24 by the fill
        # discipline, so 32 valid bits always suffice)
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.n += 8
        return True

    def bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise ValueError("JPEG entropy stream truncated")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        # bulk extraction: one shift/mask instead of k bit() calls —
        # this and _decode_huff are the per-coefficient hot loop
        if k == 0:
            return 0
        while self.n < k:
            if not self._fill():
                raise ValueError("JPEG entropy stream truncated")
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def align_to_marker(self) -> int | None:
        """Skip to the next marker (for RSTn); returns the marker byte."""
        self.acc = 0
        self.n = 0
        d = self.data
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and d[i + 1] != 0x00:
                self.pos = i + 2
                self.marker = d[i + 1]
                return self.marker
            i += 1
        self.pos = len(d)
        return None


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    # the entropy-decode hot loop: keep the accumulator in locals and
    # write it back only on fill/return — the per-bit method-call form
    # dominated the whole decode profile (350k bit() calls per 64x64)
    r = reader
    acc, n = r.acc, r.n
    get = table.get
    code = 0
    length = 0
    while length < 16:
        if n == 0:
            r.acc, r.n = acc, n
            if not r._fill():
                raise ValueError("JPEG entropy stream truncated")
            acc, n = r.acc, r.n
        n -= 1
        code = (code << 1) | ((acc >> n) & 1)
        length += 1
        sym = get((length, code))
        if sym is not None:
            r.acc, r.n = acc, n
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> HxWx3 uint8 RGB (grayscale is
    replicated across channels, matching the other raster kernels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    prog_state: dict | None = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = payload[i + 1]
        if m == 0xFF:  # T.81 B.1.1.2: fill bytes before a marker code
            i += 1
            continue
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # TEM / RSTn: no length
            i += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if m == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported (stub tier)")
                t = np.zeros(64, dtype=np.uint16)
                t[ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                quant[tq] = t
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decode_map(bits, vals)
                j += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit precision JPEG is real-decoded")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
            progressive = m == 0xC2
            if progressive:
                prog_state = _init_component_state(frame)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("arithmetic/hierarchical/lossless JPEG is stub-tier")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tabs >> 4, tabs & 0xF))
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                a = seg[3 + 2 * ns]
                i = _decode_progressive_scan(
                    payload, i, frame, scan, ss, se, a >> 4, a & 0xF,
                    prog_state, dc_tabs, ac_tabs, restart_interval,
                )
                continue  # more scans (or EOI) follow
            if ns != len(frame[2]):
                # per-component sequential scans would need a
                # component-specific (non-interleaved) MCU grid;
                # refuse rather than decode the first scan as
                # grayscale and report silently-wrong pixels
                raise ValueError(
                    "non-interleaved multi-scan baseline JPEG is stub-tier"
                )
            return _decode_scan(
                payload, i, frame, scan, quant, dc_tabs, ac_tabs, restart_interval
            )
        elif m == 0xD9:  # EOI — single exit below (a trailing EOI at
            break         # end-of-payload exits via the loop bound anyway)
        # else: APPn / COM / DNL — skipped
    if progressive and prog_state is not None:
        # EOI reached (or stream ended without one — tolerated):
        # reconstruct from the accumulated coefficient stores
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        return _reconstruct(
            h, w, hmax, vmax, [prog_state[cid] for cid, _, _, _ in comps], quant
        )
    raise ValueError("JPEG has no scan data")


def _decode_scan(
    payload, pos, frame, scan, quant, dc_tabs, ac_tabs, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    if h <= 0 or w <= 0 or h * w > 64 * 1024 * 1024:
        raise ValueError(f"JPEG dimensions {w}x{h} exceed the decode cap")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors beyond 2x2 are stub-tier")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    # per-scan-component state: coefficient store sized to the MCU grid
    state = []
    for cs, td, ta in scan:
        hs, vs, tq = by_id[cs]
        nbx, nby = mcux * hs, mcuy * vs
        state.append({
            "coeff": np.zeros((nby * nbx, 64), dtype=np.int32),
            "hs": hs, "vs": vs, "tq": tq, "td": td, "ta": ta,
            "nbx": nbx, "pred": 0,
        })
    reader = _BitReader(payload, pos)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                for st in state:
                    st["pred"] = 0
            for st in state:
                for v in range(st["vs"]):
                    for u in range(st["hs"]):
                        blk = st["coeff"][
                            (my * st["vs"] + v) * st["nbx"] + mx * st["hs"] + u
                        ]
                        s = _decode_huff(reader, dc_tabs[st["td"]])
                        diff = _extend(reader.bits(s), s) if s else 0
                        st["pred"] += diff
                        blk[0] = st["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tabs[st["ta"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            blk[k] = _extend(reader.bits(s), s)
                            k += 1
            mcu_index += 1
    return _reconstruct(h, w, hmax, vmax, state, quant)


def _init_component_state(frame) -> dict:
    """Per-component persistent coefficient stores for a progressive
    frame (T.81 Annex G): scans accumulate into these; reconstruction
    happens once, at EOI. The store is the MCU-padded grid (interleaved
    DC scans address it in MCU order); non-interleaved AC scans address
    the component's own ceil(size/8) block raster inside it."""
    h, w, comps = frame
    if h <= 0 or w <= 0 or h * w > 64 * 1024 * 1024:
        raise ValueError(f"JPEG dimensions {w}x{h} exceed the decode cap")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors beyond 2x2 are stub-tier")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    state = {}
    for cid, hs, vs, tq in comps:
        nbx, nby = mcux * hs, mcuy * vs
        # non-interleaved (single-component) scans cover the component's
        # OWN block grid, not the MCU-padded one (T.81 A.2.2):
        # ceil(ceil(dim * s / smax) / 8)
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        state[cid] = {
            "coeff": np.zeros((nby * nbx, 64), dtype=np.int32),
            "hs": hs, "vs": vs, "tq": tq, "nbx": nbx, "nby": nby,
            "cbw": -(-cw // 8),
            "cbh": -(-ch // 8),
            "pred": 0,
        }
    state["_mcu"] = (mcux, mcuy)
    return state


def _decode_progressive_scan(
    payload, pos, frame, scan, ss, se, ah, al,
    state, dc_tabs, ac_tabs, restart_interval,
) -> int:
    """Decode ONE progressive scan (T.81 Annex G.2) into the persistent
    component stores; returns the stream position of the next marker.

    - DC scans (Ss=0, interleaved or single): first pass (Ah=0) decodes
      Huffman-coded point-transformed diffs, storing ``pred << Al``;
      refinement (Ah>0) reads one raw bit per block and ORs in
      ``1 << Al`` (two's complement — consistent with the encoder
      emitting ``(v >> Al) & 1``).
    - AC scans (Ss>0, always single-component): first pass uses EOB-run
      coding (EOBn symbols, r magnitude bits); refinement walks the
      band correcting already-nonzero coefficients by one magnitude bit
      and placing newly-significant ±(1 << Al) values.
    """
    h, w, comps = frame
    mcux, mcuy = state["_mcu"]
    reader = _BitReader(payload, pos)
    eobrun = 0

    def check_restart(index: int) -> None:
        nonlocal eobrun
        if restart_interval and index and index % restart_interval == 0:
            m = reader.align_to_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError("expected JPEG restart marker")
            for cid, _, _ in scan:
                state[cid]["pred"] = 0
            eobrun = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        unit = 0
        order = []
        if len(scan) > 1:  # interleaved: MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    order.append((my, mx))
            for my, mx in order:
                check_restart(unit)
                for cs, td, _ in scan:
                    st = state[cs]
                    for v in range(st["vs"]):
                        for u in range(st["hs"]):
                            blk = st["coeff"][
                                (my * st["vs"] + v) * st["nbx"] + mx * st["hs"] + u
                            ]
                            _dc_unit(reader, blk, st, dc_tabs.get(td), ah, al)
                unit += 1
        else:  # single component: its own block raster
            cs, td, _ = scan[0]
            st = state[cs]
            for by in range(st["cbh"]):
                for bx in range(st["cbw"]):
                    check_restart(unit)
                    blk = st["coeff"][by * st["nbx"] + bx]
                    _dc_unit(reader, blk, st, dc_tabs.get(td), ah, al)
                    unit += 1
    else:  # AC scan: exactly one component (T.81 G.1.1.1)
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cs, _, ta = scan[0]
        st = state[cs]
        table = ac_tabs[ta]
        unit = 0
        for by in range(st["cbh"]):
            for bx in range(st["cbw"]):
                check_restart(unit)
                blk = st["coeff"][by * st["nbx"] + bx]
                if ah == 0:
                    eobrun = _ac_first_block(reader, blk, ss, se, al, table, eobrun)
                else:
                    eobrun = _ac_refine_block(reader, blk, ss, se, al, table, eobrun)
                unit += 1
    # skip the padding bits to the marker that ends this scan's entropy
    # segment (a stale RSTn in reader.marker is cleared first — the
    # loop above consumed complete restart intervals, so scanning
    # forward from the current position finds the real scan-end marker)
    reader.marker = None
    m = reader.align_to_marker()
    return reader.pos - 2 if m is not None else len(payload)


def _dc_unit(reader, blk, st, table, ah, al) -> None:
    if ah == 0:
        s = _decode_huff(reader, table)
        diff = _extend(reader.bits(s), s) if s else 0
        st["pred"] += diff
        blk[0] = st["pred"] << al
    else:
        if reader.bit():
            blk[0] |= 1 << al


def _ac_first_block(reader, blk, ss, se, al, table, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            # EOBn: run of (1 << r) + extension blocks ending here
            return (1 << r) - 1 + (reader.bits(r) if r else 0)
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, blk, ss, se, al, table, eobrun) -> int:
    """One block of an AC successive-approximation refinement scan
    (T.81 G.2; the correction-bit walk libjpeg's decode_mcu_AC_refine
    implements): already-nonzero coefficients consume one correction
    bit each as they are passed; zero-history runs count only zero
    coefficients; newly-significant values are ±(1 << Al)."""
    p1, m1 = 1 << al, -1 << al

    def correct(coef: int) -> int:
        # append one magnitude bit if the encoder says so and the bit
        # isn't already set at this precision
        if reader.bit() and (coef & p1) == 0:
            return coef + (p1 if coef >= 0 else m1)
        return coef

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, table)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.bits(r) if r else 0)
                    break  # remaining coeffs handled by the EOB sweep
                # ZRL: r stays 15 -> skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                newval = p1 if reader.bit() else m1
            # advance r zero-history positions, correcting history coeffs
            while k <= se:
                if blk[k] != 0:
                    blk[k] = correct(int(blk[k]))
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        # EOB region: every remaining nonzero coefficient still gets its
        # correction bit
        while k <= se:
            if blk[k] != 0:
                blk[k] = correct(int(blk[k]))
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(h, w, hmax, vmax, state, quant) -> np.ndarray:
    """Dequantize + batched IDCT per component state, upsample to full
    resolution, color-convert. Shared by the sequential one-scan path
    and the progressive multi-scan path (which calls it at EOI)."""
    planes = []
    for st in state:
        q = quant[st["tq"]].astype(np.float64)
        deq = np.zeros((st["coeff"].shape[0], 64))
        deq[:, ZIGZAG] = st["coeff"] * q[ZIGZAG]
        blocks = deq.reshape(-1, 8, 8)
        px = np.einsum("xu,buv,vy->bxy", _T.T, blocks, _T) + 128.0
        nby = blocks.shape[0] // st["nbx"]
        plane = (
            px.reshape(nby, st["nbx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, st["nbx"] * 8)
        )
        # upsample subsampled chroma by pixel replication to hmax/vmax grid
        ry, rx = vmax // st["vs"], hmax // st["hs"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
