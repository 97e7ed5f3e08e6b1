"""The v4 curation recipe as ONE library function, shared by the
oracle-verified driver query (`pretraining_pipeline_v4`) and the
`curate` CLI so the two surfaces cannot drift: Gopher rule gate ->
trained logistic-regression quality gate (fit on the gated corpus
itself) -> temperature mixture sampling -> deterministic shuffle ->
packed trainer shards.

Seeds: `mix_seed` and `shuffle_seed` MUST differ. Both stages hash
``md5("{seed}:" + doc_id)``; with one seed the within-shard shuffle
order IS the sampling uniform, so every downsampled source clusters at
the head of every shard and shard tails hold only full-rate sources —
a trainer reading sequentially sees a non-stationary mix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    *,
    total_rows: int,
    label: Column | None = None,
    temperature: float = 2.0,
    mix_seed: int = 17,
    shuffle_seed: int = 19,
    num_shards: int = 4,
    seq_len: int = 256,
    classifier_iters: int = 2,
    lr: float = 4.0,
) -> DataFrame:
    """corpus (doc_id, text, source, n_chars) -> packed shard bins
    (shard, bin_id, shard_text, n_docs, sum_tokens)."""
    from pulsar_spark.functions.classifier import logreg_fit_predict
    from pulsar_spark.functions.packing import materialize_packed_shards
    from pulsar_spark.functions.sampling import (
        deterministic_shuffle,
        temperature_mix,
    )
    from pulsar_spark.functions.text import gopher_rules

    if mix_seed == shuffle_seed:
        raise ValueError(
            "curate_corpus: mix_seed and shuffle_seed must differ — a shared "
            "seed makes the shuffle order equal the sampling hash (see module "
            "docstring)"
        )
    if label is None:
        label = F.col("n_chars") >= 400
    # (r11: a fan_out repartition of `docs` was tried here and REJECTED
    # by interleaved A/B — min 2.55 s with the gate checkpoint alone vs
    # 2.86 s adding the repartition: the Gopher/classifier stages feed
    # aggregations quickly enough that the exchange costs more than the
    # single-task map work it parallelizes at bench scale.)
    # Materialize the gate's id set once (r11): `gated` feeds the
    # classifier feature build, the mixture-model count collect and the
    # final selection plan — three separately-executed actions that
    # each re-ran the Gopher tokenization pass over the whole corpus.
    # The checkpoint pins the NARROW id list (8 bytes/doc — the guide
    # §8 "decide on a proxy" shape), so Gopher runs once and the
    # consumers re-attach it to the corpus scan with a broadcast-able
    # join. localCheckpoint, not persist: a fresh run recomputes from
    # the parquet inputs (no CacheManager plan-matching across runs).
    gate = gopher_rules(docs).where("gopher_pass").select("doc_id").localCheckpoint()
    gated = docs.join(gate, "doc_id")
    scored = logreg_fit_predict(gated, label, iters=classifier_iters, lr=lr)
    kept = gated.join(scored.where("pred").select("doc_id"), "doc_id")
    mixed = temperature_mix(
        kept, temperature=temperature, total_rows=total_rows, seed=mix_seed
    )
    shuffled = deterministic_shuffle(
        mixed.select("doc_id", "text"),
        key_col="doc_id",
        seed=shuffle_seed,
        num_shards=num_shards,
    )
    return materialize_packed_shards(
        shuffled, seq_len=seq_len, shard_col="shard", id_col="position"
    )
