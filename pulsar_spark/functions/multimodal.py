"""Multimodal columns — image/audio/video as opaque binary + metadata.

A large-scale training pipeline treats media as ``binary`` payloads
with typed metadata (modality, codec, dims, duration) and runs
decode / feature-extraction / resize / frame-sampling as Arrow-batched
pandas stages over ``mapInPandas``.

Decode kernels come in two tiers:

- REAL (numpy/stdlib only, fully implemented + tested): raster images
  (``jpeg`` baseline sequential AND progressive — SOF0/SOF2 Huffman+
  IDCT incl. spectral selection / successive approximation, in
  functions/jpeg.py — ``png`` 8-bit gray/RGB/palette/alpha via stdlib
  ``zlib`` + numpy scanline unfiltering, ``bmp`` BI_RGB 24/32-bit,
  ``ppm`` P6, ``pgm`` P5) and PCM audio (``wav`` 8/16-bit via the
  stdlib ``wave`` module), including a real bilinear resize for the
  raster formats.
- STUBBED: codecs that genuinely need external libraries (mp3/h264
  ...); those rows run ``_decode_stub`` (deterministic fake derived
  from the bytes) or raise NotImplementedError under ``strict=True``.
  The Spark-side plumbing (schema, batching, partition sizing) is
  identical for both tiers.

Scale notes: media rows are large — ``media_repartition`` sizes
partitions by estimated bytes, not row count, so a 100 TB scan doesn't
put 2 GiB of frames in one task; metadata-only queries never touch the
binary column (column pruning), which is why metadata lives in plain
columns instead of inside a struct with the payload.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, modality string, codec string, payload binary, "
    "width int, height int, duration_ms int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id bigint, modality string, width int, height int, "
    "duration_ms int, n_frames int, feature array<double>, decode_ok boolean"
)


def attach_media(
    df: DataFrame, payload_col: str, modality: str, codec: str, id_col: str
) -> DataFrame:
    """Wrap an existing binary column into the canonical media schema
    (metadata minted as unknown until decode)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(codec).alias("codec"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit(None).cast("int").alias("n_frames"),
    )


# ------------------------------------------------- real kernels (numpy/stdlib)


def _decode_bmp(payload: bytes):
    """Uncompressed BI_RGB 24/32-bit BMP -> HxWx3 uint8 (RGB). Raises on
    compressed or exotic variants (those are stub-tier)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError("only uncompressed 24/32-bit BMP is real-decoded")
    flipped = h > 0
    h = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=stride * h)
    px = px.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if flipped:
        px = px[::-1]
    # BMP stores BGR(A); return RGB
    return px[:, :, 2::-1].copy()


def _encode_bmp(arr) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit BI_RGB BMP bytes (row-padded,
    bottom-up) — the exact inverse of ``_decode_bmp``."""
    import struct

    import numpy as np

    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    body = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def _decode_pnm(payload: bytes):
    """P6 (RGB) / P5 (gray) binary PNM -> HxWx3 uint8."""
    import numpy as np

    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PNM")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM is stub-tier")
    ch = 3 if payload[:2] == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, offset=i, count=w * h * ch)
    px = px.reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px.copy()


def _encode_ppm(arr) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: decode cap for untrusted payloads: 64M pixels = ~192 MB of RGB —
#: above it, reject before allocating (decompression-bomb guard)
_PNG_MAX_PIXELS = 64 * 1024 * 1024


def _decode_png(payload: bytes):
    """8-bit non-interlaced PNG -> HxWx3 uint8 RGB, stdlib zlib + numpy
    only (PNG spec, RFC 2083): chunk walk with CRC verification, IDAT
    concatenation + inflate, per-scanline unfiltering (None/Sub/Up/
    Average/Paeth), then color-type normalization (gray/palette/alpha
    -> RGB). 16-bit and Adam7-interlaced files raise (stub tier)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, ihdr, plte, idat = 8, None, None, []
    while i + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, i)
        data = payload[i + 8 : i + 8 + ln]
        if len(data) != ln or i + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({typ!r})")
        i += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG is real-decoded")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None or (ctype == 3 and plte is None):
        raise ValueError(f"unsupported PNG color type {ctype}")
    # Decompression-bomb guard for untrusted crawl payloads: reject
    # declared dimensions beyond the pixel cap BEFORE inflating, and
    # bound the inflate itself to the declared scanline size so a tiny
    # crafted IDAT can never allocate beyond expected+1 bytes (the +1
    # detects oversized streams without materializing them).
    if w <= 0 or h <= 0 or w * h > _PNG_MAX_PIXELS:
        raise ValueError(f"PNG dimensions {w}x{h} exceed the decode cap")
    stride = w * ch
    expected = (stride + 1) * h
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected + 1)
    extra = b"" if dec.eof else dec.decompress(dec.unconsumed_tail, 1)
    if len(raw) != expected or extra:
        raise ValueError("PNG scanline data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, rows = arr[:, 0], arr[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(h):
        f, cur = int(filters[y]), rows[y]
        if f == 0:  # None
            line = cur.copy()
        elif f == 1:  # Sub: add left pixel — cumsum mod 256 per channel
            line = (
                np.cumsum(cur.reshape(w, bpp).astype(np.uint32), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            line = cur + prev  # uint8 wraps mod 256 natively
        elif f == 3:  # Average: sequential left-dependency
            line = np.zeros(stride, dtype=np.uint8)
            c32, p32 = cur.astype(np.int32), prev.astype(np.int32)
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (c32[x] + ((left + p32[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential left-dependency
            line = np.zeros(stride, dtype=np.uint8)
            c32, p32 = cur.astype(np.int32), prev.astype(np.int32)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(p32[x])
                cc = int(p32[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                line[x] = (c32[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px.copy()
    if ctype == 3:
        return plte[px[:, :, 0]]
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA: drop alpha


def _encode_png(arr) -> bytes:
    """HxWx3 uint8 RGB -> 8-bit color-type-2 PNG (filter 0 scanlines,
    one zlib-compressed IDAT) — the exact inverse of ``_decode_png``."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].astype("uint8").tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_wav(payload: bytes):
    """WAV -> (mono float32 array in [-1, 1], sample_rate,
    n_channels). PCM (8/16-bit) via the stdlib ``wave`` module;
    IMA-ADPCM (format tag 0x0011, which ``wave`` rejects) via the
    real integer decoder in functions/video.py."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            rate, nch, sw = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except wave.Error:
        # non-PCM format tags the stdlib rejects: G.711 mu/A-law
        # (tags 7/6, functions/audio.py) then IMA-ADPCM (tag 0x11,
        # functions/video.py) — all REAL integer kernels
        from pulsar_spark.functions.audio import decode_wav_g711

        try:
            pcm, rate = decode_wav_g711(bytes(payload))
            return pcm.astype(np.float32) / 32768.0, rate, 1
        except ValueError:
            pass
        from pulsar_spark.functions.video import decode_wav_ima

        pcm, rate = decode_wav_ima(bytes(payload))
        return pcm.astype(np.float32) / 32768.0, rate, 1
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError("only 8/16-bit PCM WAV is real-decoded")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate, nch


def _feature_image(px) -> list[float]:
    """16-dim image descriptor, all components in [0, 1]: gray
    mean/std, RGB means, 8-bin gray histogram, normalized dims, aspect."""
    import numpy as np

    gray = px.mean(axis=2) / 255.0
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    hist = hist / max(1, gray.size)
    h, w = gray.shape
    return [
        float(gray.mean()),
        float(gray.std()),
        float(px[:, :, 0].mean() / 255.0),
        float(px[:, :, 1].mean() / 255.0),
        float(px[:, :, 2].mean() / 255.0),
        *[float(v) for v in hist],
        float(min(w, 4096) / 4096.0),
        float(min(h, 4096) / 4096.0),
        float(min(w / max(h, 1), 8.0) / 8.0),
    ]


def _feature_audio(x, rate: int, nch: int) -> list[float]:
    """16-dim audio descriptor: rms, zero-cross rate, peak, mean-abs, 8
    log-ish FFT band energies (normalized), channels, rate, duration."""
    import numpy as np

    n = len(x)
    if n == 0:
        return [0.0] * 16
    rms = float(np.sqrt(np.mean(x**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x[: min(n, 1 << 16)]))
    total = spec.sum() or 1.0
    edges = np.unique(
        np.round(np.geomspace(1, len(spec), num=9)).astype(int)
    )
    bands = [float(spec[a:b].sum() / total) for a, b in zip(edges, edges[1:])]
    bands += [0.0] * (8 - len(bands))
    return [
        rms,
        zcr,
        float(np.max(np.abs(x))),
        float(np.mean(np.abs(x))),
        *bands[:8],
        float(min(nch, 8) / 8.0),
        float(min(rate, 96000) / 96000.0),
        float(min(n / rate, 600.0) / 600.0),
        1.0,
    ]


#: codecs with REAL decode kernels in this container
REAL_CODECS = (
    "jpeg", "jpg", "png", "bmp", "ppm", "pgm", "gif",
    "wav", "flac", "avi", "y4m",
)


def _decode_pixels(payload: bytes, codec: str):
    """Image payload -> pixel array (HxWx3 uint8, or HxW for grayscale
    codecs) through the REAL kernels. The one shared pixel entry point
    for feature extraction and perceptual hashing (functions/phash.py)."""
    if codec in ("ppm", "pgm"):
        return _decode_pnm(payload)
    if codec in ("jpeg", "jpg"):
        from pulsar_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if codec == "png":
        return _decode_png(payload)
    if codec == "bmp":
        return _decode_bmp(payload)
    if codec == "gif":
        from pulsar_spark.functions.gif import decode_gif

        return decode_gif(bytes(payload))["frames"][0]
    raise ValueError(f"no real pixel kernel for codec {codec}")


def _decode_real(payload: bytes, codec: str) -> dict:
    if codec == "wav":
        x, rate, nch = _decode_wav(payload)
        return {
            "width": None,
            "height": None,
            "duration_ms": int(round(len(x) / rate * 1000)),
            "n_frames": len(x),
            "feature": _feature_audio(x, rate, nch),
        }
    if codec == "flac":
        # real lossless compressed audio (functions/flac.py: rice
        # entropy decode, FIXED/LPC prediction, CRC-verified frames)
        import numpy as np

        from pulsar_spark.functions.flac import decode_flac

        pcm, rate = decode_flac(payload)
        if pcm.ndim > 1:
            nch = pcm.shape[1]
            x = pcm.astype(np.float32).mean(axis=1) / 32768.0
        else:
            nch = 1
            x = pcm.astype(np.float32) / 32768.0
        return {
            "width": None,
            "height": None,
            "duration_ms": int(round(len(x) / rate * 1000)),
            "n_frames": len(x),
            "feature": _feature_audio(x, rate, nch),
        }
    if codec == "avi":
        # MJPEG-in-AVI (functions/video.py): real container parse +
        # first-frame JPEG decode for the features; duration from the
        # container clock
        from pulsar_spark.functions.jpeg import decode_jpeg
        from pulsar_spark.functions.video import parse_avi

        info = parse_avi(bytes(payload))
        px = decode_jpeg(info["frames"][0])
        n = len(info["frames"])
        return {
            "width": int(info["width"]),
            "height": int(info["height"]),
            "duration_ms": int(round(n * (info["us_per_frame"] or 0) / 1000)),
            "n_frames": n,
            "feature": _feature_image(px),
        }
    if codec == "y4m":
        # uncompressed YUV4MPEG2 (functions/video.py): duration from
        # the header frame rate, features from the first frame
        from pulsar_spark.functions.video import parse_y4m

        info = parse_y4m(bytes(payload))
        n = len(info["frames"])
        return {
            "width": int(info["width"]),
            "height": int(info["height"]),
            "duration_ms": int(round(n * 1000 * info["fps_den"] / info["fps_num"])),
            "n_frames": n,
            "feature": _feature_image(info["frames"][0]),
        }
    if codec == "gif":
        # real LZW decode (functions/gif.py); a 1-frame GIF is an
        # image (duration null), an animation reports the GCE clock
        from pulsar_spark.functions.gif import decode_gif

        info = decode_gif(bytes(payload))
        n = len(info["frames"])
        return {
            "width": info["width"],
            "height": info["height"],
            "duration_ms": (
                int(sum(info["delays_cs"]) * 10) if n > 1 else None
            ),
            "n_frames": n,
            "feature": _feature_image(info["frames"][0]),
        }
    px = _decode_pixels(payload, codec)
    if px.ndim == 2:
        import numpy as np

        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    return {
        "width": w,
        "height": h,
        "duration_ms": None,
        "n_frames": 1,
        "feature": _feature_image(px),
    }


def _resize_bilinear(px, width: int, height: int):
    """Real bilinear resize, pure numpy (HxWx3 uint8 -> height x width x 3)."""
    import numpy as np

    h, w = px.shape[:2]
    ys = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    xs = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, h - 1)
    x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    p = px.astype(np.float32)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def _decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic fake decode: derives stable pseudo-metadata and a
    16-dim feature vector from the bytes. Replace with PIL/ffmpeg/
    torchaudio kernels in a container that has them."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    dims = [int.from_bytes(h[i : i + 2], "big") for i in range(0, 32, 2)]
    return {
        "width": 16 + dims[0] % 4080 if modality in ("image", "video") else None,
        "height": 16 + dims[1] % 4080 if modality in ("image", "video") else None,
        "duration_ms": dims[2] * 10 if modality in ("audio", "video") else None,
        "n_frames": 1 if modality == "image" else dims[3] % 1000,
        "feature": [d / 65535.0 for d in dims],
    }


def decode_media(
    media: DataFrame,
    strict: bool = False,
    batch_rows: int = 64,
    kernel: str = "auto",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Rows whose ``codec`` is in ``REAL_CODECS`` (jpeg/png/bmp/ppm/pgm/
    gif for images; wav — PCM, G.711 mu/A-law, IMA-ADPCM — and flac
    for audio; avi/y4m/gif for video) run the REAL numpy/stdlib kernels — actual
    pixel/sample decode, actual features; a malformed payload yields
    ``decode_ok=false`` with null metadata (bad bytes are data, not
    exceptions, in a 100 TB crawl). Other codecs run the deterministic
    stub, or raise NotImplementedError under ``strict=True`` — the
    marker that a compressed-codec kernel must be dropped in.

    ``kernel`` selects the decode tier (functions/native_codecs.py):
    ``"auto"`` (default) consults the native-adapter registry first and
    falls back to the pure kernels on a miss or adapter failure — with
    no library present (this container) auto IS the pure tier;
    ``"pure"`` never consults adapters (the oracle/verification tier);
    ``"native"`` requires an adapter per codec and raises
    NotImplementedError otherwise. Adapters also cover codecs the pure
    tier cannot (mp3/h264), retiring the strict-tier stub when the
    deployment provides a library.
    """
    if kernel not in ("auto", "pure", "native"):
        raise ValueError(f"kernel must be auto|pure|native, got {kernel!r}")
    # snapshot the DRIVER's adapter registry into the closure: the
    # mapInPandas workers are separate processes whose own registry is
    # empty, and plan-build-time capture also pins which adapters a
    # given plan uses (cloudpickle ships the callables)
    if kernel == "pure":
        adapters: dict = {}
    else:
        from pulsar_spark.functions.native_codecs import _REGISTRY

        adapters = dict(_REGISTRY)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from pulsar_spark.functions.native_codecs import (
            finalize_adapter_result,
        )

        cols = [
            "media_id", "modality", "width", "height",
            "duration_ms", "n_frames", "feature", "decode_ok",
        ]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                # frames without a codec column (e.g. the thumbnailer
                # example's bare media bytes) are stub-tier
                codec = (r.get("codec") or "").lower()
                d = None
                ok = True
                adapter = adapters.get(codec)
                if adapter is not None:
                    try:
                        d = finalize_adapter_result(
                            adapter(bytes(r["payload"] or b"")), r["modality"]
                        )
                    except Exception:
                        if kernel == "native":
                            d = dict.fromkeys(
                                ("width", "height", "duration_ms",
                                 "n_frames", "feature")
                            )
                            ok = False
                        # auto: fall through to the pure tier below
                elif kernel == "native":
                    raise NotImplementedError(
                        f"kernel='native' but no adapter registered for "
                        f"{codec!r}; see functions/native_codecs.py "
                        "detect_native_kernels()"
                    )
                if d is not None:
                    out.append(
                        {
                            "media_id": r["media_id"],
                            "modality": r["modality"],
                            "width": d["width"],
                            "height": d["height"],
                            "duration_ms": d["duration_ms"],
                            "n_frames": d["n_frames"],
                            "feature": d["feature"],
                            "decode_ok": ok,
                        }
                    )
                    continue
                if codec in REAL_CODECS:
                    try:
                        d = _decode_real(bytes(r["payload"] or b""), codec)
                        ok = True
                    except Exception:
                        d = dict.fromkeys(
                            ("width", "height", "duration_ms", "n_frames", "feature")
                        )
                        ok = False
                elif strict:
                    raise NotImplementedError(
                        f"no codec library for {codec!r} in this container; "
                        "real kernels cover " + "/".join(REAL_CODECS)
                    )
                else:
                    d = _decode_stub(r["payload"], r["modality"])
                    ok = True
                out.append(
                    {
                        "media_id": r["media_id"],
                        "modality": r["modality"],
                        "width": d["width"],
                        "height": d["height"],
                        "duration_ms": d["duration_ms"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                        "decode_ok": ok,
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Resize stage for visual media (image / video): re-encode the
    payload at ``width x height`` and stamp the new dims. Non-visual
    rows (audio) pass through untouched.

    jpeg/png/bmp/ppm/pgm rows get a REAL bilinear resize (pure numpy)
    and are re-encoded in their own container format (pgm upcasts to
    ppm — the resized raster is RGB; png re-encodes as color-type-2
    RGB; jpeg re-encodes as baseline 4:4:4 when the target dims are
    multiples of 8 and upcasts to png otherwise — the pure-numpy
    encoder has no edge-replication path). gif/y4m rows resize every
    frame: bilinear output breaks GIF's palette invariant, so a still
    GIF upcasts to png and an animation to y4m (uncompressed video);
    y4m re-encodes as full-chroma y4m. Library-bound codecs (h264 ...)
    take the stub path (deterministic bytes; swap in ffmpeg where
    available) or raise under ``strict=True``."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        from pulsar_spark.functions.jpeg import decode_jpeg, encode_jpeg

        dim_tag = f"{width}x{height}".encode()
        jpeg_ok = width % 8 == 0 and height % 8 == 0
        # codec tables are fixed per task — build once, not per row
        decoders = {
            "png": _decode_png, "bmp": _decode_bmp,
            "jpeg": decode_jpeg, "jpg": decode_jpeg,
        }
        encoders = {"png": _encode_png, "bmp": _encode_bmp}
        if jpeg_ok:
            encoders["jpeg"] = encoders["jpg"] = encode_jpeg
        else:  # jpeg -> png container upcast (see docstring)
            encoders["jpeg"] = encoders["jpg"] = _encode_png

        def one(payload, codec):
            """-> (new_payload, resized?, new_codec|None). Malformed
            real-codec bytes are data, not exceptions (same contract as
            decode_media): the row passes through untouched with
            resized=False."""
            codec = (codec or "").lower()
            if codec in ("jpeg", "jpg", "png", "bmp", "ppm", "pgm"):
                try:
                    px = decoders.get(codec, _decode_pnm)(bytes(payload))
                    resized = _resize_bilinear(px, width, height)
                except Exception:
                    return payload, False, None
                return encoders.get(codec, _encode_ppm)(resized), True, None
            if codec in ("gif", "y4m"):
                # bilinear interpolation breaks GIF's <=256-color
                # palette invariant, so resized GIFs container-upcast:
                # stills to PNG, animations to Y4M (uncompressed RGB
                # video); Y4M re-encodes as full-chroma Y4M.
                from pulsar_spark.functions.gif import decode_gif
                from pulsar_spark.functions.video import encode_y4m, parse_y4m

                try:
                    if codec == "gif":
                        info = decode_gif(bytes(payload))
                        # preserve the clip clock: n_frames per
                        # total-delay centiseconds
                        fps = (
                            100 * len(info["frames"]),
                            max(sum(info["delays_cs"]), 1),
                        )
                    else:
                        info = parse_y4m(bytes(payload))
                        fps = (info["fps_num"], info["fps_den"])
                    frames = [
                        _resize_bilinear(f, width, height)
                        for f in info["frames"]
                    ]
                except Exception:
                    return payload, False, None
                if codec == "gif" and len(frames) == 1:
                    return _encode_png(frames[0]), True, "png"
                return encode_y4m(frames, fps[0], fps[1], "444"), True, "y4m"
            if strict:
                raise NotImplementedError(
                    f"no codec library for {codec!r}; real resize covers "
                    "jpeg/png/bmp/ppm/pgm/gif/y4m"
                )
            return (
                hashlib.sha256(bytes(payload or b"") + dim_tag).digest(),
                True,
                None,
            )

        for pdf in batches:
            pdf = pdf.copy()
            visual = pdf["modality"].isin(["image", "video"])
            codecs = (
                pdf.loc[visual, "codec"]
                if "codec" in pdf.columns
                else [""] * int(visual.sum())
            )
            results = [
                one(p, c) for p, c in zip(pdf.loc[visual, "payload"], codecs)
            ]
            pdf.loc[visual, "payload"] = [p for p, _, _ in results]
            ok = pdf.index[visual][[s for _, s, _ in results]]
            pdf.loc[ok, "width"] = width
            pdf.loc[ok, "height"] = height
            if "codec" in pdf.columns:
                # container upcasts decided per row (gif -> png/y4m)
                upcast = {
                    i: nc
                    for i, (_, s, nc) in zip(pdf.index[visual], results)
                    if s and nc
                }
                if upcast:
                    pdf.loc[list(upcast), "codec"] = list(upcast.values())
                # pgm re-encodes as ppm (RGB container)
                pgm_ok = pdf.index.isin(ok) & (pdf["codec"].str.lower() == "pgm")
                pdf.loc[pgm_ok, "codec"] = "ppm"
                if not jpeg_ok:  # jpeg upcast to png at non-x8 target dims
                    j = pdf.index.isin(ok) & pdf["codec"].str.lower().isin(
                        ["jpeg", "jpg"]
                    )
                    pdf.loc[j, "codec"] = "png"
            yield pdf

    return media.mapInPandas(run, media.schema)


def media_repartition(media: DataFrame, target_bytes_per_partition: int = 128 << 20) -> DataFrame:
    """Partition by estimated payload bytes, not row count — media rows
    are wildly variable; byte-balanced tasks avoid stragglers/OOM."""
    total = media.select(F.sum(F.length("payload"))).head()[0] or 0
    n = max(1, int(total / target_bytes_per_partition) + 1)
    return media.repartition(n)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video: explode frame indexes 0, n, 2n...
    of n_frames (metadata-only — decode of the selected frames is the
    stubbed kernel). Shows the fan-out shape a real sampler uses."""
    return media.where(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
