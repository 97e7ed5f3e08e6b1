"""Deduplication for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design:
- Exact dedup is a hash aggregate on a fingerprint — one shuffle of one
  row per distinct document.
- MinHash signatures are computed entirely JVM-side (``hash(shingle,
  seed)`` + ``array_min`` per permutation — no Python UDF), then LSH
  banding turns the quadratic all-pairs problem into an equi-join on
  (band_id, band_hash): only documents sharing a band bucket are
  compared. At 100 TB the band join is the only shuffle and its keys
  are uniformly distributed by construction (hashes).
- SimHash packs a document into one 64-bit int; near-dup = hamming
  distance via ``bit_count(a ^ b)`` on LSH-prefix-bucketed candidates.
- ``ngram_jaccard_pairs`` is the exact (quadratic) verifier used on
  candidate pairs and in tests as ground truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text fingerprint."""
    from pulsar_spark.functions.text import fingerprint

    cols = docs.columns
    return (
        docs.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_d"))
        .select("_d.*")
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a document (JVM-side)."""
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(grams)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    k: int = 3,
) -> DataFrame:
    """(id, shingles, signature array<int>[num_perm]).

    Permutation i's hash of a shingle is Murmur3 ``hash(shingle, i)``;
    the signature element is the min over shingles — standard MinHash,
    no Python in the loop.
    """
    # NB: lambdas passed to F.transform/F.filter must be unary — a second
    # parameter (even a defaulted one) is interpreted as the array index.
    def perm_hash(i: int):
        return lambda s: F.hash(s, F.lit(i))

    sh = shingles(F.col(text_col), k)
    sig = F.array(
        *[F.array_min(F.transform(F.col("shingles"), perm_hash(i))) for i in range(num_perm)]
    )
    return docs.select(F.col(id_col), sh.alias("shingles")).withColumn("signature", sig)


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Candidate pairs via LSH banding: explode each signature into
    ``bands`` (band_id, band_hash) keys and self-join. Returns distinct
    (id_a, id_b) with id_a < id_b."""
    banded = sigs.select(
        F.col(id_col),
        F.col("shingles"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(
                            *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "shingles", "band.band_id", "band.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("shingles_a"),
            F.col("b.shingles").alias("shingles_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    k: int = 3,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard
    over shingle sets. Returns (id_a, id_b, jaccard)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_perm, k)
    cand = minhash_lsh_candidates(sigs, id_col, bands, rows_per_band)
    inter = F.size(F.array_intersect("shingles_a", "shingles_b"))
    union = F.size("shingles_a") + F.size("shingles_b") - inter
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash of the token multiset, entirely JVM-side:
    bit b of the result is set iff more token-hashes have bit b set
    than not."""
    # NB: unary lambdas only — a second (defaulted) param would be bound to
    # the array index by F.filter.
    def bit_test(m: int):
        return lambda h: h.bitwiseAND(F.lit(m)) != 0

    toks = F.filter(F.split(text, " "), lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)
    bit_exprs = []
    for b in range(bits):
        # bit-test via mask AND (shift functions don't accept lambda vars);
        # b == 63 is the sign bit, whose int64 mask is negative.
        mask = (1 << b) if b < 63 else -(1 << 63)
        ones = F.size(F.filter(hashes, bit_test(mask)))
        bit_exprs.append(
            F.when(ones * 2 >= n, F.lit(mask).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out.bitwiseOR(e)
    return out


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dups by SimHash: candidates share a ``prefix_bits`` bucket
    (cheap LSH on the high bits), verified by ``bit_count(xor) <=
    max_hamming``. Returns (id_a, id_b, hamming)."""
    hashed = docs.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash")).withColumn(
        "bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits)
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))))
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over ALL pairs — the quadratic ground truth
    (use only on bounded inputs; LSH variants are the scale path).
    Returns (id_a, id_b, jaccard >= threshold)."""
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size("a.sh") + F.size("b.sh") - inter
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "jaccard",
        )
    )
