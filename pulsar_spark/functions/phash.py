"""Perceptual image hashing and Hamming-banded image near-dup joins.

The multimodal analog of the text near-dup family (functions/dedupe.py):
a 100 TB image corpus is deduplicated by a compact per-image fingerprint
that is STABLE under re-encoding and mild perturbation, never by
comparing pixels pairwise. Two public 64-bit hashes:

- **pHash** (DCT hash; Zauner 2010, "Implementation and Benchmarking of
  Perceptual Image Hash Functions"): luma -> 32x32 resize -> 2-D DCT-II
  -> the low-frequency 8x8 corner -> each bit is coefficient > median
  of the 63 AC coefficients. Robust to resize / re-encode / brightness.
- **dHash** (difference hash): luma -> 9x8 resize -> bit per horizontal
  gradient sign. Cheaper, slightly less robust; kept as the
  cross-check hash (near-dups under BOTH hashes are high precision).

Both are integer and fully deterministic (pure numpy float64 on exact
uint8 inputs), so exact-equality grouping is oracle-checkable, and the
banded join mirrors the MinHash LSH machinery: candidates must share
one 16-bit band of the 64-bit hash, so a pair within Hamming distance k
< 16/... is found whenever any band is clean (never an all-pairs join).

Scale shape: hashing is one fused decode+hash ``mapInPandas`` pass
(Arrow batches, no pixel arrays ever shuffle); exact grouping is one
hash-agg; the banded join explodes 4 rows per image and joins on the
16-bit band value with a mega-bucket star guard — identical plan family
to ``minhash_near_dups``.

The reference repo has no image operators (it is a messaging system);
this module is part of the training-data-pipeline extension, built on
the repo's own real codecs (functions/multimodal.py, functions/jpeg.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: luma weights (ITU-R BT.601), the same convention the JPEG kernel uses
_LUMA = (0.299, 0.587, 0.114)


def _luma32(px, width: int, height: int):
    """Pixels (HxW or HxWx3 uint8) -> height x width float64 luma."""
    import numpy as np

    from pulsar_spark.functions.multimodal import _resize_bilinear

    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    small = _resize_bilinear(px, width, height).astype(np.float64)
    r, g, b = small[:, :, 0], small[:, :, 1], small[:, :, 2]
    return _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (the JPEG transform at size n).
    Cached per size (r12, guide §4.5): ``phash64`` runs per image
    inside the Arrow batch loop, and rebuilding the constant 32x32
    basis cost ~31 µs of the ~300 µs hash — the module-level cache
    survives task boundaries on reused Python workers."""
    import numpy as np

    t = _DCT_CACHE.get(n)
    if t is None:
        k = np.arange(n)[:, None].astype(np.float64)
        x = np.arange(n)[None, :].astype(np.float64)
        t = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
        t[0] *= np.sqrt(1.0 / n)
        t[1:] *= np.sqrt(2.0 / n)
        t.setflags(write=False)
        _DCT_CACHE[n] = t
    return t


_DCT_CACHE: dict = {}


def _pack_bits(bits) -> int:
    """Row-major bool sequence -> signed 64-bit int (Spark LongType)."""
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h - (1 << 64) if h >= 1 << 63 else h


def phash64(px) -> int:
    """64-bit DCT perceptual hash of a pixel array. Bit i (row-major
    over the low-frequency 8x8 DCT corner) is coefficient > median of
    the 63 AC coefficients; the DC coefficient contributes a bit but is
    excluded from the median so overall brightness cannot shift the
    threshold."""
    import numpy as np

    g = _luma32(px, 32, 32)
    t = _dct_matrix(32)
    d = t @ g @ t.T
    block = d[:8, :8].ravel()
    med = float(np.median(block[1:]))
    return _pack_bits(block > med)


def dhash64(px) -> int:
    """64-bit difference hash: bit per horizontal luma gradient sign on
    a 9x8 thumbnail (8 comparisons per row, 8 rows)."""
    g = _luma32(px, 9, 8)
    return _pack_bits((g[:, 1:] > g[:, :-1]).ravel())


def perceptual_hash_media(media: DataFrame) -> DataFrame:
    """Fused decode + perceptual-hash pass over the canonical media
    frame (``media_id, modality, codec, payload``): one Arrow-batched
    ``mapInPandas`` stage computes pHash and dHash straight off the
    decoded pixels — pixel arrays live only inside the batch, never in
    a shuffle. Image codecs only (the real kernels: bmp/ppm/pgm/png/
    jpeg/gif); non-image rows raise, like decode_media(strict=True).

    Returns ``(media_id bigint, codec string, width int, height int,
    phash bigint, dhash bigint)``.
    """
    out_schema = (
        "media_id bigint, codec string, width int, height int, "
        "phash bigint, dhash bigint"
    )

    def run(batches):
        import pandas as pd

        from pulsar_spark.functions.multimodal import _decode_pixels

        for pdf in batches:
            rows = []
            for media_id, codec, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                px = _decode_pixels(bytes(payload), str(codec))
                h, w = px.shape[:2]
                rows.append(
                    (int(media_id), str(codec), int(w), int(h),
                     phash64(px), dhash64(px))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "codec", "width", "height", "phash", "dhash"],
            )

    cols = [c for c in ("media_id", "codec", "payload") if c in media.columns]
    return media.select(*cols).mapInPandas(run, out_schema)


def phash_exact_groups(
    hashed: DataFrame, id_col: str = "media_id", hash_col: str = "phash"
) -> DataFrame:
    """Exact perceptual-dup grouping: every image mapped to the
    smallest id sharing its hash (the keep-one canonical form the text
    dedup family uses). One hash-partitioned window — the 100 TB shape
    for exact-hash image dedup.

    Returns ``(media_id, canonical_id, group_size, is_dup)``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(hash_col)
    return hashed.select(
        F.col(id_col).alias("media_id"),
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )


def phash_near_dups(
    hashed: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_bucket: int = 2000,
    n_bands: int = 4,
) -> DataFrame:
    """Hamming-banded LSH join over 64-bit perceptual hashes: split
    each hash into ``n_bands`` equal bands; a candidate pair must agree
    on at least one band, then verify ``bit_count(a XOR b) <=
    max_hamming`` JVM-side (exact — banding only affects which pairs
    are CONSIDERED). By pigeonhole the banding is COMPLETE for Hamming
    distance <= ``n_bands - 1`` and best-effort above it (high recall
    in practice, since real near-dup bit flips cluster rather than
    spreading one per band); a ``max_hamming`` past the complete range
    warns so the recall bound is never silent. Pass ``n_bands=8``
    (8-bit bands, complete to distance 7) when the default threshold
    must be exhaustive — the trade-off at corpus scale is band
    cardinality: 16-bit bands hash into 65k buckets (collisions are
    mostly true near-dups), 8-bit bands into only 256 (every bucket
    ~N/256, so the star guard sheds more and candidate volume grows
    roughly quadratically with corpus size). At 100 TB prefer the
    default 4x16 banding and treat distances 4-6 as best-effort, or
    run the 8-band pass on a sampled/sharded slice.

    Never an all-pairs join; buckets larger than ``max_bucket`` (a
    degenerate constant-image flood) are dropped by the same star
    guard the MinHash path uses — exact grouping (phash_exact_groups)
    already covers identical images, so the guard only sheds quadratic
    candidate work, not exact dups.

    Lingering-cache note: the narrow ``(id, hash)`` core below is
    ``persist()``-ed (it feeds the bucket-size aggregate and BOTH join
    sides) and stays registered after this call returns — the same
    contract as ``minhash_near_duplicates``' candidate frames. A
    long-lived driver that re-runs the pipeline over fresh data should
    ``spark.catalog.clearCache()`` between slices, or the CacheManager's
    plan canonicalization will serve the previous slice's cache to any
    plan-identical rebuild (this is exactly why bench.py clears the
    cache between x8 runs as of r12).

    Returns distinct ``(media_id_a, media_id_b, hamming)`` with a < b.
    """
    if n_bands not in (2, 4, 8, 16):
        raise ValueError(f"n_bands must divide 64 into byte-ish bands, got {n_bands}")
    if max_hamming > n_bands - 1:
        import warnings

        if max_hamming <= 15:
            # smallest supported band count whose completeness bound
            # (n_bands - 1) covers the threshold
            fix = next(b for b in (2, 4, 8, 16) if b - 1 >= max_hamming)
            hint = f"Pass n_bands={fix} for a complete scan."
        else:
            hint = ("No complete 64-bit banding exists past distance 15 "
                    "(16 bands of 4 bits bound at 15).")
        warnings.warn(
            f"max_hamming={max_hamming} exceeds the {n_bands}-band "
            f"completeness bound ({n_bands - 1}): pairs at distance "
            f"{n_bands}..{max_hamming} are best-effort. {hint}",
            stacklevel=2,
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    # persist the narrow (id, hash) core: the bucket-size aggregate and
    # BOTH sides of the band join consume it, and its upstream is the
    # fused decode+hash Arrow stage — unpersisted, that stage re-ran
    # once per branch (measured ~2x the whole x8 wall). The frame is
    # FLAT and two columns, so the nested-array cache slowness that
    # keeps MinHash signatures uncached does not apply; same lingering-
    # cache contract as minhash_near_duplicates' candidate frames.
    core = hashed.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    ).persist()
    bands = [
        F.shiftrightunsigned(F.col("_h"), width * i)
        .bitwiseAND(F.lit(mask))
        .cast("bigint")
        .alias(f"b{i}")
        for i in range(n_bands)
    ]
    stack_args = ", ".join(f"{i}, b{i}" for i in range(n_bands))
    banded = (
        core.select("_id", "_h", *bands)
        .selectExpr(
            "_id", "_h",
            f"stack({n_bands}, {stack_args}) AS (band_idx, band_val)",
        )
    )
    # The count-agg + join-back shape is DELIBERATE (r12 A/B'd two
    # alternatives, both output-identical on the sf0.1 fixture):
    # (a) a window count over (band_idx, band_val) reads 9 jobs/272
    # tasks vs this shape's 13/402 and ~1.19x the local min — REJECTED
    # because a window funnels a degenerate flood bucket onto ONE
    # unsplittable task (AQE skew-split applies to joins only, not
    # windows; this join-back shape lets AQE split the flood partition
    # and the partial-agg count never concentrates it), and shedding
    # exactly that flood is this guard's purpose; (b) broadcasting the
    # over-cap bucket list into a left_anti (provably bounded at
    # n_bands x 2^width keys for width <= 16) reads the same 13 jobs/
    # 402 tasks and equal wall — no structural win to buy.
    sizes = banded.groupBy("band_idx", "band_val").agg(F.count("*").alias("_n"))
    banded = (
        banded.join(sizes, ["band_idx", "band_val"])
        .where(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    a = banded.select(
        "band_idx", "band_val",
        F.col("_id").alias("media_id_a"), F.col("_h").alias("_ha"),
    )
    b = banded.select(
        "band_idx", "band_val",
        F.col("_id").alias("media_id_b"), F.col("_h").alias("_hb"),
    )
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("media_id_a") < F.col("media_id_b"))
        .select(
            "media_id_a",
            "media_id_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# ------------------------------------------------- audio fingerprinting


def audio_fingerprint64(samples, rate: int) -> int:
    """64-bit audio perceptual fingerprint (Haitsma & Kalker 2002, "A
    Highly Robust Audio Fingerprinting System", reduced to one 64-bit
    block): the mono signal is split into 9 equal frames; each frame's
    magnitude spectrum is pooled into 9 log-spaced bands; bit (f, b) is
    the sign of the band-energy DOUBLE difference
    ``(E[f,b] - E[f,b+1]) - (E[f-1,b] - E[f-1,b+1])`` — 8 frame deltas
    x 8 band deltas = 64 bits. Sign-of-difference bits are invariant to
    uniform amplitude scaling and robust to small additive noise; pure
    deterministic numpy float64, so exact grouping is oracle-checkable
    like pHash."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.size < 18:
        x = np.pad(x, (0, 18 - x.size))
    n_frames, n_bands = 9, 9
    frame_len = x.size // n_frames
    energies = np.zeros((n_frames, n_bands))
    # log-spaced band edges over the frame spectrum (DC excluded)
    n_bins = frame_len // 2
    edges = np.unique(
        np.round(np.logspace(0, np.log10(max(n_bins, 2)), n_bands + 1)).astype(int)
    )
    while edges.size < n_bands + 1:  # tiny frames: pad with the top bin
        edges = np.append(edges, edges[-1] + 1)
    for f in range(n_frames):
        frame = x[f * frame_len: (f + 1) * frame_len]
        mag = np.abs(np.fft.rfft(frame))
        for b in range(n_bands):
            lo, hi = edges[b], edges[b + 1]
            energies[f, b] = float(np.sum(mag[lo:hi] ** 2))
    d = energies[:, :-1] - energies[:, 1:]       # 9 frames x 8 band deltas
    dd = d[1:, :] - d[:-1, :]                    # 8 frame deltas x 8
    return _pack_bits((dd > 0).ravel())


def audio_fingerprint_media(media: DataFrame) -> DataFrame:
    """Fused decode + fingerprint pass over the canonical media frame
    for wav payloads — the audio sibling of ``perceptual_hash_media``;
    sample arrays live only inside the Arrow batch. Returns
    ``(media_id bigint, codec string, n_samples int, afp bigint)``.
    Near-dup joins reuse ``phash_near_dups(hash_col="afp")`` — the
    Hamming banding is hash-agnostic."""
    out_schema = "media_id bigint, codec string, n_samples int, afp bigint"

    def run(batches):
        import pandas as pd

        from pulsar_spark.functions.multimodal import _decode_wav

        for pdf in batches:
            rows = []
            for media_id, codec, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                if str(codec) != "wav":
                    raise ValueError(
                        f"audio_fingerprint_media: no real kernel for {codec}"
                    )
                x, rate, _ = _decode_wav(bytes(payload))
                rows.append(
                    (int(media_id), str(codec), int(x.size),
                     audio_fingerprint64(x, rate))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "codec", "n_samples", "afp"]
            )

    cols = [c for c in ("media_id", "codec", "payload") if c in media.columns]
    return media.select(*cols).mapInPandas(run, out_schema)
