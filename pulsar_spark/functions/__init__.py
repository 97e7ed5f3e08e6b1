from pulsar_spark.functions.text import (
    tokenize,
    token_count,
    quality_metrics,
    language_id,
    fingerprint,
)
from pulsar_spark.functions.dedupe import (
    exact_dedup,
    shingles,
    with_shingles,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    simhash,
    with_simhash,
    simhash_near_duplicates,
    ngram_jaccard_pairs,
)
from pulsar_spark.functions.similarity import (
    cosine_topk,
    cosine_all_pairs_topk,
    lsh_bucket_topk,
)

__all__ = [
    "tokenize",
    "token_count",
    "quality_metrics",
    "language_id",
    "fingerprint",
    "exact_dedup",
    "shingles",
    "with_shingles",
    "with_simhash",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "simhash",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "cosine_all_pairs_topk",
    "lsh_bucket_topk",
]
