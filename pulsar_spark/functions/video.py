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
    """REAL frame sampling over the video containers with real kernels
    — MJPEG AVI (default), animated GIF, and Y4M, dispatched on the
    ``codec`` column when present. Only frames 0, n, 2n, ... are
    pixel-decoded; one output row per sampled frame:

    ``(media_id, frame_idx, n_frames, width, height, mean_luma_q)``

    with ``mean_luma_q`` the decoded frame's mean gray value rounded to
    an int (the codecs are deterministic: same bytes -> same pixels ->
    same mean on every engine/run). Fused parse+decode in one Arrow
    pass; for AVI, unsampled frames are never entropy-decoded (GIF's
    LZW is inherently sequential and Y4M is uncompressed, so "skip"
    there saves only the RGB conversion)."""
    out_schema = ("media_id bigint, frame_idx int, n_frames int, "
                  "width int, height int, mean_luma_q bigint")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pulsar_spark.functions.gif import decode_gif
        from pulsar_spark.functions.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            codecs = (
                pdf["codec"] if "codec" in pdf.columns
                else ["avi"] * len(pdf)
            )
            for media_id, payload, codec in zip(
                pdf["media_id"], pdf["payload"], codecs
            ):
                codec = (codec or "avi").lower()
                if codec == "gif":
                    frames = decode_gif(bytes(payload))["frames"]
                    decode = None
                elif codec == "y4m":
                    frames = parse_y4m(bytes(payload))["frames"]
                    decode = None
                else:
                    frames = parse_avi(bytes(payload))["frames"]
                    decode = decode_jpeg
                for idx in range(0, len(frames), every_n):
                    px = decode(frames[idx]) if decode else frames[idx]
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

    cols = [c for c in ("media_id", "payload", "codec") if c in media.columns]
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


# ------------------------------------------------------------------ Y4M

#: BT.601 full-range RGB<->YCbCr (the matrix JFIF uses) — gray input
#: (R=G=B) maps to U=V=128 exactly, so achromatic fixtures roundtrip
#: bit-exact through every chroma layout.
_Y4M_SPACES = ("mono", "444", "420", "420jpeg", "420mpeg2", "420paldv")


def encode_y4m(frames, fps_num: int = 25, fps_den: int = 1,
               colorspace: str = "444") -> bytes:
    """HxW (gray) or HxWx3 uint8 frame list -> YUV4MPEG2 bytes.

    Y4M (the mjpegtools public interchange format) is an UNCOMPRESSED
    video container: one plain-text stream header
    (``YUV4MPEG2 W.. H.. F<num>:<den> Ip A0:0 C<space>``) then
    ``FRAME\\n`` + raw planar YUV per frame. ``mono`` stores luma only;
    ``444`` full-res chroma; ``420*`` variants 2x2-subsampled chroma
    (encoded here by plain 2x2 averaging; the tag only differs in siting
    metadata, which a decoder without resampling treats identically).
    """
    import numpy as np

    if colorspace not in _Y4M_SPACES:
        raise ValueError(f"colorspace must be one of {_Y4M_SPACES}")
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = frames[0].shape[:2]
    if colorspace.startswith("420") and (h % 2 or w % 2):
        raise ValueError("420 colorspaces need even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A0:0 C{colorspace}\n"
    out = bytearray(head.encode("ascii"))
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        out += b"FRAME\n"
        if colorspace == "mono":
            gray = f if f.ndim == 2 else np.round(
                0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
            ).astype(np.uint8)
            out += gray.tobytes()
            continue
        rgb = np.stack([f] * 3, axis=-1) if f.ndim == 2 else f
        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, u, v = (np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, u, v))
        if colorspace != "444":
            u = np.round(
                u.reshape(h // 2, 2, w // 2, 2).astype(np.float64).mean(axis=(1, 3))
            ).astype(np.uint8)
            v = np.round(
                v.reshape(h // 2, 2, w // 2, 2).astype(np.float64).mean(axis=(1, 3))
            ).astype(np.uint8)
        out += y.tobytes() + u.tobytes() + v.tobytes()
    return bytes(out)


def parse_y4m(payload: bytes) -> dict:
    """YUV4MPEG2 bytes -> ``{"width", "height", "fps_num", "fps_den",
    "colorspace", "frames": [HxWx3 uint8 ...]}`` with YCbCr converted
    back to RGB (BT.601 full-range; 420 chroma upsampled by 2x2
    replication — exact for achromatic content). Total over arbitrary
    bytes: malformed payloads raise ValueError only."""
    try:
        return _parse_y4m(payload)
    except (IndexError, KeyError) as exc:
        raise ValueError(f"truncated or corrupt Y4M: {exc}") from exc


def _parse_y4m(payload: bytes) -> dict:
    import numpy as np

    buf = bytes(payload)
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"  # spec default
    for tok in buf[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps_num, fps_den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            colorspace = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    space = colorspace.lower()
    base = "mono" if space == "mono" else ("444" if space.startswith("444") else "420")
    if base == "420" and not space.startswith("420"):
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    ysz = w * h
    csz = 0 if base == "mono" else (ysz if base == "444" else (w // 2) * (h // 2))
    frames = []
    pos = nl + 1
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or buf[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        pos = fnl + 1
        need = ysz + 2 * csz
        if pos + need > len(buf):
            raise ValueError("truncated Y4M frame data")
        y = np.frombuffer(buf, np.uint8, ysz, pos).reshape(h, w)
        if base == "mono":
            frames.append(np.stack([y] * 3, axis=-1))
            pos += need
            continue
        u = np.frombuffer(buf, np.uint8, csz, pos + ysz)
        v = np.frombuffer(buf, np.uint8, csz, pos + ysz + csz)
        if base == "444":
            u, v = u.reshape(h, w), v.reshape(h, w)
        else:
            u = u.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
            v = v.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
        yf, uf, vf = (p.astype(np.float64) for p in (y, u, v))
        r = yf + 1.402 * (vf - 128.0)
        g = yf - 0.344136 * (uf - 128.0) - 0.714136 * (vf - 128.0)
        b = yf + 1.772 * (uf - 128.0)
        rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
        frames.append(rgb)
        pos += need
    if not frames:
        raise ValueError("Y4M contained no frames")
    return {
        "width": int(w),
        "height": int(h),
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "frames": frames,
    }
