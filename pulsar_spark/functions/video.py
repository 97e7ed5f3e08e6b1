"""Real video-container kernels: MJPEG-in-AVI parse, frame sampling
with REAL per-frame decode, plus IMA-ADPCM compressed audio in WAV.

This closes most of the multimodal "video/compressed audio are
stubbed" gap with pure-stdlib/numpy kernels, the same correctness-spec
tier as the image codecs (functions/jpeg.py, multimodal.py): an AVI is
a RIFF container (Microsoft "AVI RIFF File Reference"; RIFF chunks are
word-aligned, frames live as ``00dc``/``00db`` chunks inside the
``movi`` LIST), and MJPEG frames are ordinary baseline JPEGs — so the
repo's existing JPEG codec does the per-frame work. Inter-coded
codecs (h264 and friends) remain documented stubs in multimodal.py:
those genuinely need a native library; a container parse does not.

IMA/DVI ADPCM (WAV format tag 0x0011; IMA "Recommended Practices for
Enhancing Digital Audio Compatibility", 1992) is 4-bit predictive
audio — pure integer math with published step tables, deterministic to
the bit, which is what makes the exact-grouping oracle possible.

Scale shape: container parse + frame decode run FUSED in one
mapInPandas pass (compressed bytes shuffle once into the executor,
pixels never shuffle at all — the same contract as perceptual_hash_
media); frame selection happens INSIDE the pass so unsampled frames
are never even JPEG-decoded.
"""
from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ AVI

_AVIH = struct.Struct("<IIIIIIIIIIIIII")


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """HxW(x3) uint8 frame list -> MJPEG AVI bytes (RIFF 'AVI ' with
    hdrl/avih + one 'vids'/'MJPG' stream + movi '00dc' chunks, each a
    baseline JPEG from functions/jpeg.py; chunks word-aligned)."""
    import numpy as np

    from pulsar_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    jpegs = [encode_jpeg(np.asarray(f)) for f in frames]
    avih = _AVIH.pack(
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (HASINDEX-less)
        len(jpegs), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(jpegs),
        0, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)  # BITMAPINFOHEADER, 'MJPG'
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def parse_avi(payload: bytes) -> dict:
    """Walk the RIFF tree and return
    ``{"frames": [jpeg_bytes...], "width", "height", "n_frames",
    "us_per_frame"}``. Lenient: any ``00dc``/``00db`` chunk anywhere
    under the movi LIST counts as a frame (some muxers nest 'rec '
    LISTs); chunks are word-aligned per the RIFF spec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' magic missing)")
    out = {"frames": [], "width": None, "height": None,
           "n_frames": None, "us_per_frame": None}

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start, body_end = pos + 8, pos + 8 + size
            if fourcc == b"LIST":
                kind = buf[body_start:body_start + 4]
                # a truncated LIST still yields its intact children —
                # recurse into whatever survives (lenient tail handling)
                walk(buf, body_start + 4, min(body_end, end),
                     in_movi or kind == b"movi")
                if body_end > end:
                    break
            elif body_end > end:
                break  # truncated leaf chunk: keep what we have
            elif fourcc == b"avih":
                vals = _AVIH.unpack_from(buf, body_start)
                out["us_per_frame"] = vals[0]
                out["n_frames"] = vals[4]
                out["width"], out["height"] = vals[8], vals[9]
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                out["frames"].append(buf[body_start:body_end])
            pos = body_end + (size & 1)  # word alignment

    walk(payload, 12, len(payload), False)
    return out


def sample_video_frames(
    media: DataFrame,
    every_n: int = 2,
    batch_rows: int = 16,
) -> DataFrame:
    """REAL frame sampling over MJPEG AVIs: parse the container, decode
    ONLY frames 0, n, 2n, ... with the repo's JPEG kernel, and emit one
    row per sampled frame:

    ``(media_id, frame_idx, n_frames, width, height, mean_luma_q)``

    with ``mean_luma_q`` the decoded frame's mean gray value rounded to
    an int (JPEG is lossy but deterministic: same bytes -> same pixels
    -> same mean on every engine/run). Fused parse+decode in one Arrow
    pass; unsampled frames are never entropy-decoded."""
    out_schema = ("media_id bigint, frame_idx int, n_frames int, "
                  "width int, height int, mean_luma_q bigint")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pulsar_spark.functions.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                info = parse_avi(bytes(payload))
                frames = info["frames"]
                for idx in range(0, len(frames), every_n):
                    px = decode_jpeg(frames[idx])
                    arr = np.asarray(px, dtype=np.float64)
                    if arr.ndim == 3:
                        arr = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                               + 0.114 * arr[..., 2])
                    rows.append(
                        (int(media_id), idx, len(frames),
                         int(arr.shape[1]), int(arr.shape[0]),
                         int(round(float(arr.mean()))))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "n_frames",
                               "width", "height", "mean_luma_q"],
            )

    cols = [c for c in ("media_id", "payload") if c in media.columns]
    return media.select(*cols).mapInPandas(run, out_schema)


# ------------------------------------------------------ IMA ADPCM (WAV)

_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ima_decode_nibble(nibble: int, state: list) -> int:
    """One IMA ADPCM step: state = [predictor, index], both mutated.
    Integer math exactly per the IMA 1992 recommended practice."""
    step = _IMA_STEP_TABLE[state[1]]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, state[0] + diff))
    idx = max(0, min(88, state[1] + _IMA_INDEX_TABLE[nibble & 7]))
    state[0], state[1] = pred, idx
    return pred


def _ima_encode_nibble(sample: int, state: list) -> int:
    step = _IMA_STEP_TABLE[state[1]]
    diff = sample - state[0]
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    _ima_decode_nibble(nibble, state)  # track the decoder's predictor
    return nibble


def encode_wav_ima(samples, rate: int = 8000, block_samples: int = 505) -> bytes:
    """Mono int16 samples -> WAV bytes with format tag 0x0011 (IMA
    ADPCM), block-structured: each block = 4-byte header (initial
    predictor int16, step index u8, reserved u8) + packed nibbles, two
    samples per byte, low nibble first."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64).clip(-32768, 32767)
    if block_samples % 2 == 0:
        raise ValueError("block_samples must be odd (header sample + pairs)")
    block_align = 4 + (block_samples - 1) // 2
    blocks, state = [], [0, 0]
    for start in range(0, len(x), block_samples):
        blk = x[start:start + block_samples]
        state[0] = int(blk[0])
        blocks.append(struct.pack("<hBB", state[0], state[1], 0))
        nibbles = []
        for s in blk[1:]:
            nibbles.append(_ima_encode_nibble(int(s), state))
        if len(nibbles) % 2:
            nibbles.append(0)
        blocks.append(bytes((nibbles[i] | (nibbles[i + 1] << 4))
                            for i in range(0, len(nibbles), 2)))
    data = b"".join(blocks)
    n_samples = len(x)
    fmt = struct.pack("<HHIIHHHH", 0x0011, 1, rate,
                      rate * block_align // block_samples, block_align, 4,
                      2, block_samples)
    fact = struct.pack("<I", n_samples)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_ima(payload: bytes):
    """WAV/IMA-ADPCM (format tag 0x0011, mono) -> (int16 numpy array,
    sample_rate). Bit-exact integer decode — the property the
    exact-grouping oracle relies on."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, end = 12, len(payload)
    fmt = data = None
    n_samples = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, nch, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x0011:
        raise ValueError(f"not IMA ADPCM (format tag {tag:#x})")
    if nch != 1 or bits != 4:
        raise ValueError("only mono 4-bit IMA ADPCM is real-decoded")
    out = []
    for start in range(0, len(data), block_align):
        blk = data[start:start + block_align]
        if len(blk) < 4:
            break
        pred, idx, _ = struct.unpack_from("<hBB", blk, 0)
        state = [pred, min(88, max(0, idx))]
        out.append(pred)
        for b in blk[4:]:
            out.append(_ima_decode_nibble(b & 0x0F, state))
            out.append(_ima_decode_nibble(b >> 4, state))
    # the fact chunk carries the true sample count: a short final
    # block pads its last byte with a zero nibble the decoder must
    # not surface as a sample
    if n_samples is not None:
        out = out[:n_samples]
    return np.asarray(out, dtype=np.int16), rate


def adpcm_exact_groups(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode IMA-ADPCM clips and group by the md5 of the DECODED
    sample stream — the exact-grouping contract (phash_exact_groups
    pattern): identical source signals must decode to identical
    samples, so a wrong/nondeterministic decode splits planted groups
    and fails the oracle. One fused decode pass + one hash window."""
    out_schema = f"{id_col} bigint, pcm_md5 string, n_samples int, rate int"

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf["payload"]):
                pcm, rate = decode_wav_ima(bytes(payload))
                rows.append((int(media_id),
                             hashlib.md5(pcm.tobytes()).hexdigest(),
                             int(pcm.size), int(rate)))
            yield pd.DataFrame(rows, columns=[id_col, "pcm_md5",
                                              "n_samples", "rate"])

    from pyspark.sql.window import Window

    hashed = media.select(id_col, "payload").mapInPandas(run, out_schema)
    w = Window.partitionBy("pcm_md5")
    return hashed.select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
        "n_samples",
        "rate",
    )
