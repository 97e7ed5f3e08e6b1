"""G.711 companded audio — REAL μ-law / A-law WAV kernels.

ITU-T G.711 (public, 1972/1988) defines the two 8-bit logarithmic PCM
codings used by telephony WAV files: μ-law (WAVE format tag 0x0007)
and A-law (tag 0x0006). The stdlib ``wave`` module rejects both, so
— like the IMA-ADPCM kernel in functions/video.py — the RIFF walk and
the expansion math live here, pure numpy, vectorized over the whole
payload (a 256-entry table lookup per sample, no Python loop).

The expansion formulas below are the G.711 tables in closed form
(identical to the classic public-domain CCITT reference ``g711.c``):

  μ-law:  u' = ~u;  seg = (u' >> 4) & 7;  man = u' & 15
          |x| = ((man << 3) + 0x84) << seg) - 0x84          (max 32124)
  A-law:  a' = a ^ 0x55;  seg = (a' >> 4) & 7;  man = a' & 15
          seg 0: |x| = (man << 4) + 8
          seg 1: |x| = (man << 4) + 0x108
          else : |x| = ((man << 4) + 0x108) << (seg - 1)    (max 32256)

Encode (for fixture minting + tests) is the exact inverse search over
the 256-entry decode table, so decode(encode(x)) == nearest codebook
value and decode(encode(decode(c))) == decode(c) for every code c.

Reference parity: media payloads are opaque binary columns in the
reference (SURVEY §2 multimodal rows); this promotes telephony-WAV into
``functions/multimodal.REAL_CODECS`` territory via ``_decode_wav``.
"""

from __future__ import annotations

import struct

__all__ = [
    "ulaw_decode_table",
    "alaw_decode_table",
    "encode_wav_g711",
    "decode_wav_g711",
]


def ulaw_decode_table():
    """All 256 μ-law codes -> int16 linear, vectorized closed form."""
    import numpy as np

    u = np.arange(256, dtype=np.int32) ^ 0xFF  # complemented domain
    seg = (u >> 4) & 7
    man = u & 15
    mag = (((man << 3) + 0x84) << seg) - 0x84
    sign = np.where(u & 0x80, -1, 1)
    return (sign * mag).astype(np.int16)


def alaw_decode_table():
    """All 256 A-law codes -> int16 linear, vectorized closed form."""
    import numpy as np

    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a >> 4) & 7
    man = a & 15
    mag = np.where(
        seg == 0,
        (man << 4) + 8,
        np.where(seg == 1, (man << 4) + 0x108, ((man << 4) + 0x108) << np.maximum(seg - 1, 0)),
    )
    sign = np.where(a & 0x80, 1, -1)  # bit set = positive in A-law
    return (sign * mag).astype(np.int16)


def _encode_table(law: str):
    """int16 -> nearest-code lookup built by inverting the decode table."""
    import numpy as np

    dec = ulaw_decode_table() if law == "ulaw" else alaw_decode_table()
    order = np.argsort(dec.astype(np.int32), kind="stable")
    sorted_vals = dec[order].astype(np.int32)
    return dec, order, sorted_vals


def encode_wav_g711(samples, rate: int = 8000, law: str = "ulaw") -> bytes:
    """int16 mono samples -> a genuine G.711 WAV (format tag 7 or 6).

    Each sample maps to the nearest codebook value (ties to the lower
    code), so fixtures minted from codebook values roundtrip exactly.
    """
    import numpy as np

    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    x = np.asarray(samples, dtype=np.int32)
    dec, order, sorted_vals = _encode_table(law)
    pos = np.searchsorted(sorted_vals, x)
    pos = np.clip(pos, 0, len(sorted_vals) - 1)
    # nearest of the two neighbors
    lo = np.clip(pos - 1, 0, len(sorted_vals) - 1)
    take_lo = np.abs(sorted_vals[lo] - x) <= np.abs(sorted_vals[pos] - x)
    codes = order[np.where(take_lo, lo, pos)].astype(np.uint8)

    tag = 7 if law == "ulaw" else 6
    data = codes.tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    fact = struct.pack("<I", len(codes))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(payload: bytes):
    """G.711 WAV -> (int16 numpy array, sample_rate). Walks the RIFF
    chunks (fmt/fact/data, same shape as video.decode_wav_ima) and
    expands via one table lookup over the whole byte array. Total over
    arbitrary bytes: malformed payloads raise ValueError only."""
    try:
        return _decode_wav_g711(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt G.711 WAV: {exc}") from exc


def _decode_wav_g711(payload: bytes):
    import numpy as np

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, tag, rate, nch, data = 12, None, None, 1, None
    n_samples = None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, nch, rate = struct.unpack_from("<HHI", body, 0)
        elif cid == b"fact":
            n_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if tag not in (6, 7):
        raise ValueError(f"not a G.711 WAV (format tag {tag})")
    if data is None or rate is None:
        raise ValueError("G.711 WAV missing fmt/data chunks")
    table = ulaw_decode_table() if tag == 7 else alaw_decode_table()
    codes = np.frombuffer(data, np.uint8)
    if n_samples is not None:
        codes = codes[: n_samples * nch]
    pcm = table[codes]
    if nch > 1:
        pcm = pcm.reshape(-1, nch).astype(np.int32).mean(axis=1).astype(np.int16)
    return pcm, int(rate)
