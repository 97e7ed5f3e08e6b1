"""Multimodal columns — image/audio/video as opaque binary + metadata.

A large-scale training pipeline treats media as ``binary`` payloads
with typed metadata (modality, codec, dims, duration) and runs
decode / feature-extraction / resize / frame-sampling as Arrow-batched
pandas stages over ``mapInPandas``. The media codec libraries are NOT
in this container, so the decode kernels are STUBBED behind
``_decode_stub`` (deterministic fake derived from the bytes) or raise
NotImplementedError when ``strict=True`` — the Spark-side plumbing
(schema, batching, partition sizing) is real and tested.

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


def decode_media(media: DataFrame, strict: bool = False, batch_rows: int = 64) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    ``strict=True`` raises NotImplementedError — the marker that a real
    codec kernel must be dropped in; default mode runs the deterministic
    stub so the distributed plumbing is exercised end-to-end.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if strict:
            raise NotImplementedError(
                "media codecs not available in this container; "
                "replace _decode_stub with a real decode kernel"
            )
        cols = [
            "media_id", "modality", "width", "height",
            "duration_ms", "n_frames", "feature", "decode_ok",
        ]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                d = _decode_stub(r["payload"], r["modality"])
                out.append(
                    {
                        "media_id": r["media_id"],
                        "modality": r["modality"],
                        "width": d["width"],
                        "height": d["height"],
                        "duration_ms": d["duration_ms"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                        "decode_ok": True,
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Resize stage for visual media (image / video): re-encode the
    payload at ``width x height`` and stamp the new dims. Non-visual
    rows (audio) pass through untouched. Same contract as
    ``decode_media``: the resize KERNEL is the stub (deterministic
    bytes derived from input payload + target dims — swap in
    PIL.Image.resize / ffmpeg scale in a container that has them);
    the Spark plumbing — Arrow batching, schema preservation, visual/
    non-visual routing — is real and tested."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        if strict:
            raise NotImplementedError(
                "media codecs not available in this container; "
                "replace the resize stub with a real scale kernel"
            )
        dim_tag = f"{width}x{height}".encode()
        for pdf in batches:
            pdf = pdf.copy()
            visual = pdf["modality"].isin(["image", "video"])
            pdf.loc[visual, "payload"] = [
                hashlib.sha256(bytes(p or b"") + dim_tag).digest()
                for p in pdf.loc[visual, "payload"]
            ]
            pdf.loc[visual, "width"] = width
            pdf.loc[visual, "height"] = height
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
