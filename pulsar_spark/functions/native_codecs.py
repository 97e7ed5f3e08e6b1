"""Optional native codec adapters behind the ``decode_media`` interface.

The engine's pure-Python/numpy media kernels (jpeg.py, gif.py, flac.py,
audio.py, video.py) are the CORRECTNESS-SPEC tier: offline-verifiable,
oracle-pinned, hypothesis-fuzzed. At 100 TB corpus scale the decode
throughput wants a native library doing the same work behind the same
interface — this module is that seam, kept strictly optional:

- ``register_adapter(codec, fn)`` installs a callable
  ``payload -> raw decode result`` for a codec; ``decode_media``'s
  ``kernel="auto"`` tier consults the registry FIRST and falls back to
  the pure kernels on a miss or adapter failure, so outputs stay
  inside the same schema and failure contract.
- ``detect_native_kernels()`` probes the usual suspects (PIL for
  images, soundfile for wav/flac, PyAV for mp3/h264/containers) and
  registers adapters for whatever imports. In a container without
  them (like this one) it returns ``{}`` and ``auto`` degrades to the
  pure tier — the documented state, not a failure. This is also the
  only sanctioned path to mp3/h264: the strict-tier stubs stay
  (hand-rolling mp3's Huffman/window tables is not offline-verifiable)
  but a registered adapter makes those codecs decodable without
  touching any call site.

Adapter result contract (raw arrays, NOT the output dict — the shared
feature/metadata finalization below guarantees adapter outputs land in
exactly the shape the pure kernels produce):

- image:  ``{"pixels": HxWx3 uint8 ndarray}``
- audio:  ``{"samples": 1-D float ndarray in [-1, 1], "rate": int,
  "nch": int}``
- video:  ``{"pixels": first-frame HxWx3 uint8, "n_frames": int,
  "duration_ms": int}``

Equivalence note: for lossless formats (png/gif/y4m/wav/flac) a
correct native adapter is pixel/sample-exact, so features match the
pure tier bit-for-bit; for lossy ones (jpeg/mp3) decoders may legally
differ in low-order bits — deployments that need cross-tier hash
parity keep the pure tier for oracle runs, which is why ``kernel=
"pure"`` exists as an explicit override.
"""

from __future__ import annotations

from typing import Callable

#: codec -> adapter callable (payload bytes -> raw-result dict)
_REGISTRY: dict[str, Callable] = {}


def register_adapter(codec: str, fn: Callable) -> None:
    """Install a native decode adapter for ``codec`` (lowercased)."""
    _REGISTRY[codec.lower()] = fn


def unregister_adapter(codec: str) -> bool:
    return _REGISTRY.pop(codec.lower(), None) is not None


def adapter_for(codec: str) -> Callable | None:
    return _REGISTRY.get((codec or "").lower())


def registered() -> dict[str, str]:
    """codec -> adapter qualname, for observability/tests."""
    return {c: getattr(f, "__qualname__", repr(f)) for c, f in sorted(_REGISTRY.items())}


def finalize_adapter_result(raw: dict, modality: str) -> dict:
    """Raw adapter arrays -> the exact ``decode_media`` output dict,
    through the SAME feature functions the pure kernels use — the seam
    that keeps both tiers schema- and semantics-identical."""
    from pulsar_spark.functions.multimodal import _feature_audio, _feature_image

    if "samples" in raw:
        x, rate, nch = raw["samples"], int(raw["rate"]), int(raw.get("nch", 1))
        return {
            "width": None,
            "height": None,
            "duration_ms": int(round(len(x) / rate * 1000)),
            "n_frames": len(x),
            "feature": _feature_audio(x, rate, nch),
        }
    px = raw["pixels"]
    h, w = px.shape[:2]
    n = int(raw.get("n_frames", 1))
    return {
        "width": int(w),
        "height": int(h),
        "duration_ms": int(raw["duration_ms"]) if raw.get("duration_ms") is not None
        else (None if modality == "image" else 0),
        "n_frames": n,
        "feature": _feature_image(px),
    }


# --------------------------------------------------------------- detection

def detect_native_kernels() -> dict[str, str]:
    """Probe optional native libraries and register adapters for every
    codec a found library covers. Returns the resulting registry map
    (empty when no library imports — the pure tier remains the only
    tier, which is this container's documented state)."""
    try:  # pillow: still images
        from PIL import Image  # noqa: F401

        for c in ("jpeg", "png", "bmp", "gif"):
            register_adapter(c, _pil_image)
    except ImportError:
        pass
    try:  # soundfile/libsndfile: lossless + telephony audio
        import soundfile  # noqa: F401

        for c in ("wav", "flac"):
            register_adapter(c, _soundfile_audio)
    except ImportError:
        pass
    try:  # PyAV/ffmpeg: compressed audio/video — the only mp3/h264 path
        import av  # noqa: F401

        for c in ("mp3",):
            register_adapter(c, _av_audio)
        for c in ("h264", "avi", "y4m"):
            register_adapter(c, _av_video)
    except ImportError:
        pass
    return registered()


def _pil_image(payload: bytes) -> dict:
    import io

    import numpy as np
    from PIL import Image, ImageSequence

    with Image.open(io.BytesIO(payload)) as im:
        n = getattr(im, "n_frames", 1)
        duration_ms = None
        if n > 1:
            # animated: sum the per-frame GCE delays so duration_ms
            # matches the pure GIF kernel instead of flipping to NULL
            duration_ms = int(
                sum(
                    int(frame.info.get("duration", 0))
                    for frame in ImageSequence.Iterator(im)
                )
            )
            im.seek(0)
        return {
            "pixels": np.asarray(im.convert("RGB"), dtype=np.uint8),
            "n_frames": n,
            "duration_ms": duration_ms,
        }


def _soundfile_audio(payload: bytes) -> dict:
    import io

    import numpy as np
    import soundfile as sf

    x, rate = sf.read(io.BytesIO(payload), dtype="float32", always_2d=True)
    nch = x.shape[1]
    return {"samples": np.ascontiguousarray(x.mean(axis=1)), "rate": int(rate),
            "nch": int(nch)}


def _av_audio(payload: bytes) -> dict:
    import io

    import av
    import numpy as np

    with av.open(io.BytesIO(payload)) as container:
        stream = container.streams.audio[0]
        parts = [f.to_ndarray() for f in container.decode(stream)]
    x = np.concatenate(parts, axis=-1)
    nch = x.shape[0] if x.ndim > 1 else 1
    mono = x.mean(axis=0) if x.ndim > 1 else x
    return {"samples": mono.astype("float32"), "rate": int(stream.rate),
            "nch": int(nch)}


def _av_video(payload: bytes) -> dict:
    import io

    import av
    import numpy as np

    with av.open(io.BytesIO(payload)) as container:
        stream = container.streams.video[0]
        first, n = None, 0
        for frame in container.decode(stream):
            if first is None:
                first = frame.to_ndarray(format="rgb24").astype(np.uint8)
            n += 1
        if stream.duration:
            dur = int(round(float(stream.duration * stream.time_base) * 1000))
        elif stream.average_rate:
            # container clock fallback, like the pure AVI/Y4M kernels
            dur = int(round(n * 1000 / float(stream.average_rate)))
        else:
            dur = 0
    return {"pixels": first, "n_frames": n, "duration_ms": dur}
