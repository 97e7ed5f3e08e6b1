"""Deterministic sampling operators for training-data pipelines.

Large-scale pretraining pipelines subsample and re-weight corpora by
domain/source before training ("data mixing"). The reference has no
analog (it is a log engine), so these are part of the extended
LLM-pipeline surface (SURVEY.md §7 step 11 / BASELINE north star).

Design constraints, in order:

1. **Deterministic** — the keep/drop decision is a pure function of
   (seed, key), so re-running the pipeline on new hardware, a different
   partition count, or after a failure selects the SAME rows.
   ``df.sample()`` is seeded per-partition and therefore NOT stable
   under repartitioning; we hash instead.
2. **Shuffle-free** — the per-row decision is a filter over a
   column-local expression: no exchange, fully pushed into the scan
   stage, trivially scales to 100 TB. ``domain_mix`` adds one
   broadcast join against a tiny per-group rate table.
3. **Oracle-checkable** — the hash is md5 (identical hex output in
   Spark and DuckDB), so the driver's DuckDB oracle reproduces the
   exact selected set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pulsar_spark.functions.materialize import materialize

__all__ = [
    "uniform_hash",
    "hash_sample",
    "domain_mix",
    "temperature_mix",
    "mixture_schedule",
    "per_group_cap",
    "deterministic_shuffle",
    "dsir_select",
]

# 2^32: the hash prefix is 8 hex chars = 32 bits.
_HASH_SPACE = float(1 << 32)


def uniform_hash(key: Column | str, seed: int = 0) -> Column:
    """A deterministic uniform double in [0, 1) from (seed, key).

    ``md5(seed ':' key)`` first 8 hex chars -> 32-bit int -> /2^32.
    Stays entirely in JVM expressions (md5/conv/substring are
    codegen'd); the DuckDB mirror is
    ``(('0x' || substr(md5(seed || ':' || key), 1, 8))::UBIGINT) /
    4294967296.0``.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)).alias(
        "u"
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per key.

    Bernoulli sampling by hash threshold: ``uniform_hash(key) <
    fraction``. Same key + same seed => same decision everywhere, so
    the sample is reproducible across runs, partitionings and engines
    (unlike ``DataFrame.sample``). Pure narrow filter — at 100 TB this
    is a scan-stage predicate with no shuffle.
    """
    return df.where(uniform_hash(key_col, seed) < F.lit(float(fraction)))


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    total_rows: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic domain re-weighting ("data mixing") by downsampling.

    Each group g present in the data gets a row budget
    ``weight(g) / sum(weights of present groups) * total_rows`` and is
    hash-sampled at ``rate(g) = min(1, budget(g) / count(g))``. Groups
    absent from ``weights`` use ``default_weight``. Rates cap at 1 —
    this operator only downsamples (upsampling is a repeat-read
    concern, not a selection concern).

    Scale shape: ONE groupBy(group) count over the corpus whose result
    is the bounded per-group model (collected driver-side like kmeans
    centroids; the old shape recomputed it for the weight total), then
    a **broadcast** literal-rate join back onto the rows — the
    row-level pass stays a narrow filter with zero corpus shuffles in
    the returned plan. The expected mix is exact in expectation; actual
    counts deviate by O(sqrt(n)) like any Bernoulli sampler.

    Rate math runs driver-side with the same IEEE operation sequence
    the SQL twin writes. Weights are quantized to integer micro-units
    (half-up ``floor(w*1e6+0.5)`` == Spark HALF_UP == DuckDB
    half-away-from-zero for positive doubles) BEFORE the cross-group
    sum, exactly like :func:`temperature_mix` — an integer sum is
    order-independent, so non-integer user weights (0.1, 0.3, ...)
    stay bit-identical across engines and partition orders; a plain
    double sum would depend on addend order in the last ulp. Weights
    below 5e-7 quantize to zero (rate 0 for that group); if EVERY
    present group quantizes to zero the call raises — rescale the
    weights, only their ratios matter.
    """
    import math

    rows = df.groupBy(group_col).agg(F.count("*").alias("_cnt")).collect()
    spark = df.sparkSession
    if not rows:
        rates_df = spark.createDataFrame([], f"{group_col} string, _rate double")
    else:
        counts = {r[group_col]: int(r["_cnt"]) for r in rows}
        raw = {g: float(weights.get(g, default_weight)) for g in counts}
        if min(raw.values()) < 0:
            # check the RAW weight: a tiny negative like -1e-7 would
            # quantize to 0 and slip past a post-quantization check
            raise ValueError("domain_mix weights must be non-negative")
        wu = {g: int(math.floor(w * 1_000_000.0 + 0.5)) for g, w in raw.items()}
        wsum = sum(wu.values())
        if wsum == 0:
            # every present group's weight quantized to zero micro-units
            # (all < 5e-7): no meaningful mixture exists at the supported
            # precision — refuse rather than divide by zero (weights are
            # ratios; callers can rescale, e.g. x1e6)
            raise ValueError(
                "domain_mix weights all quantize to zero at 1e-6 precision; "
                "rescale the weights (only their ratios matter)"
            )
        rates_df = spark.createDataFrame(
            [
                (g, min(1.0, (wu[g] / wsum * float(total_rows)) / counts[g]))
                for g in counts
            ],
            f"{group_col} string, _rate double",
        )
    return (
        df.join(F.broadcast(rates_df), group_col)
        .where(uniform_hash(key_col, seed) < F.col("_rate"))
        .drop("_rate")
    )


def temperature_mix(
    df: DataFrame,
    temperature: float,
    total_rows: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-LM /
    data-mixture recipe, arXiv:1901.07291 §3.1): a group with corpus
    share ``s_g = n_g / N`` gets mixture probability
    ``q_g = s_g^(1/T) / sum_h s_h^(1/T)`` — T=1 reproduces the natural
    distribution, T→inf flattens toward uniform, so minority domains
    are boosted relative to their share. Each group's row budget is
    ``q_g * total_rows``, hash-sampled at ``min(1, budget / n_g)``
    (downsample-only, like :func:`domain_mix`).

    Determinism/oracle notes: the tempered weights are quantized to
    integer micro-units BEFORE normalization so the cross-group sum is
    order-independent (double summation is not); ``T == 2`` uses
    ``sqrt`` — IEEE-correctly-rounded in Python, Spark AND DuckDB — so
    the driver oracle is bit-exact, while other T go through ``pow``
    (within 1 ulp; the micro-unit rounding absorbs it away from
    boundaries). The rate math runs driver-side on the collected
    per-group counts with the exact same IEEE operation sequence the
    SQL twin writes (int/int -> double division, sqrt, *1e6,
    half-up round via floor(x+0.5), int sum, division chain left to
    right), so the literal rates are bit-identical to engine-computed
    ones.

    Scale shape: ONE corpus groupBy count whose result is the bounded
    per-group model (collected driver-side like kmeans centroids),
    then a broadcast literal-rate join — the row-level pass is a
    narrow filter that rides the scan; the returned plan has zero
    corpus shuffles.
    """
    import math

    inv_t = 1.0 / float(temperature)
    rows = df.groupBy(group_col).agg(F.count("*").alias("_cnt")).collect()
    spark = df.sparkSession
    if not rows:
        rates_df = spark.createDataFrame([], f"{group_col} string, _rate double")
        return (
            df.join(F.broadcast(rates_df), group_col)
            .where(uniform_hash(key_col, seed) < F.col("_rate"))
            .drop("_rate")
        )
    counts = {r[group_col]: int(r["_cnt"]) for r in rows}
    n = sum(counts.values())
    # half-up on a positive double == both engines' round(x, 0)
    pu = {
        g: int(math.floor((math.sqrt(c / n) if float(temperature) == 2.0
                           else math.pow(c / n, inv_t)) * 1_000_000.0 + 0.5))
        for g, c in counts.items()
    }
    psum = sum(pu.values())
    rates = [
        (g, min(1.0, (pu[g] / psum * float(total_rows)) / counts[g]))
        for g in counts
    ]
    rates_df = spark.createDataFrame(rates, f"{group_col} string, _rate double")
    return (
        df.join(F.broadcast(rates_df), group_col)
        .where(uniform_hash(key_col, seed) < F.col("_rate"))
        .drop("_rate")
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_col: str | Column | None = None,
    descending: bool = True,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, preferring the highest
    ``order_col`` (quality score) with a deterministic ``tiebreak_col``
    — the per-domain cap step of a crawl-style corpus pipeline (no
    single source may dominate the training mix).

    Scale shape: one window partitioned by the group key — parallel
    across groups, no global sort. Skewed mega-groups put their rows in
    one task's sort; at 100 TB pre-aggregate extreme hosts (or raise
    spark.sql.shuffle.partitions) — the window itself never broadens
    past the group.
    """
    from pyspark.sql import Window

    order = F.col(order_col) if isinstance(order_col, str) else order_col
    keys = []
    if order is not None:
        keys.append(order.desc() if descending else order.asc())
    keys.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*keys)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def mixture_schedule(
    df: DataFrame,
    phases: list[dict],
    group_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Multi-phase data schedule (curriculum / mid-training anneal):
    each phase is an independent temperature mixture over the corpus —
    e.g. a long T=2 "diverse" pretraining phase followed by a short
    T=1 "natural-distribution" anneal — returned as one frame tagged
    with the phase name, in phase order. The schedule a trainer reads
    phase by phase.

    ``phases``: list of ``{"name", "temperature", "total_rows",
    "seed"}``. Seeds MUST be pairwise distinct: the per-phase selection
    hash is ``md5(seed ':' key)``, so equal seeds make later phases
    select the same head of the hash order as earlier ones instead of
    independent samples (the same degeneracy ``curate_corpus`` rejects
    between mixing and shuffling).

    Determinism: each phase rides :func:`temperature_mix`'s driver-side
    bounded rate model (micro-unit quantization; T=2 on the IEEE-exact
    sqrt path, T=1 exact via ``pow(x, 1) == x``). Scale shape: one
    corpus groupBy count PER PHASE collected as a bounded model, then a
    union of narrow broadcast-rate filters — zero corpus shuffles in
    the returned plan.
    """
    if not phases:
        raise ValueError("mixture_schedule needs at least one phase")
    seeds = [int(p["seed"]) for p in phases]
    if len(set(seeds)) != len(seeds):
        raise ValueError(
            "mixture_schedule phase seeds must be pairwise distinct — a "
            "shared seed reuses the same selection hash order across phases"
        )
    out = None
    for p in phases:
        sel = temperature_mix(
            df,
            temperature=float(p["temperature"]),
            total_rows=int(p["total_rows"]),
            group_col=group_col,
            key_col=key_col,
            seed=int(p["seed"]),
        ).withColumn("phase", F.lit(str(p["name"])))
        out = sel if out is None else out.unionByName(sel)
    return out


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    num_shards: int = 64,
) -> DataFrame:
    """Reproducible pseudo-random global training order WITHOUT a
    global sort — the "shuffle the corpus before training" step.

    Every row gets ``(shard, position)``: shard = 32-bit md5 prefix of
    (seed, key) mod ``num_shards``; position = rank of the full digest
    within its shard. Emitting shards in ``(shard, position)`` order is
    a deterministic permutation of the corpus that is stable across
    partitionings, cluster sizes and engines (same md5-everywhere
    argument as ``uniform_hash``; a training job re-run after a failure
    reads the identical order).

    Scale shape: the only wide op is one hash-partitioned window
    ranking ``corpus / num_shards`` rows per task — parallelism =
    ``num_shards`` and no task ever holds more than one shard. Set
    ``num_shards`` ~ 4x executor count at 100 TB; an epoch reader then
    consumes shard files independently (position is the in-shard read
    order), so the "global" order needs no global machine.
    """
    digest = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    from pyspark.sql import Window

    shard = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % num_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_digest", key_col)
    return (
        df.withColumn("_digest", digest)
        .withColumn("shard", shard)
        .withColumn("position", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_digest")
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    buckets: int = 64,
    tau: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    score every document by how much its hashed-unigram distribution
    looks like a TARGET subset of the corpus versus the raw corpus,
    then select docs above ``tau``.

    Per token bucket ``b`` (md5-hashed into ``buckets`` bins, same
    engine-portable hash as ``uniform_hash``), the importance weight is
    the add-one-smoothed log-likelihood ratio::

        w_b = ln((tgt_b + 1) / (tgt_total + B)) -
              ln((raw_b + 1) / (raw_total + B))

    and a document's score is its mean token weight. The paper samples
    with Gumbel noise; this deterministic variant thresholds instead
    (``selected = score >= tau``), keeping the whole operator a pure
    function of the corpus.

    Determinism contract: weights are quantized to integer MICRO-UNITS
    (``round(w * 1e6)`` as bigint) before the per-document sum, so the
    distributed aggregate is exact and order-independent; the <=1-ulp
    ``ln`` divergence between engines is absorbed by the rounding (see
    functions/classifier.py for the same trick on gradients).

    Scale shape: one explode -> groupBy(bucket) aggregate whose output
    is B rows (the model — bounded, broadcastable), then one
    broadcast join of the weights back onto the exploded tokens and a
    per-document sum with map-side partial aggregation. Two shuffles
    total, both keyed; no collect of data (the B-row weight table never
    touches the driver).
    """
    from pulsar_spark.functions.text import tokenize

    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    # persist: the exploded+hashed token relation feeds both the bucket
    # counts and the weight join — without it the tokenize/explode/md5
    # pipeline (the expensive stage) runs twice over the corpus
    base = (
        docs.select(
            F.col(id_col),
            target.cast("int").alias("_t"),
            F.explode(tokenize(F.col(text_col))).alias("tok"),
        )
        .select(id_col, "_t", bucket.alias("b"))
        .persist()
    )
    counts = base.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_n"), F.sum("_t").alias("tgt_n")
    )
    totals = counts.agg(
        F.sum("raw_n").alias("raw_tot"), F.sum("tgt_n").alias("tgt_tot")
    )
    bf = float(buckets)
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            (
                F.log((F.col("tgt_n") + 1.0) / (F.col("tgt_tot") + bf))
                - F.log((F.col("raw_n") + 1.0) / (F.col("raw_tot") + bf))
            )
            * 1000000.0,
            0,
        )
        .cast("bigint")
        .alias("w_int"),
    )
    score = F.round((F.sum("w_int") / F.lit(1000000.0)) / F.count(F.lit(1)), 6)
    out = (
        base.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(score.alias("score"))
        .select(id_col, "score", (F.col("score") >= tau).alias("selected"))
    )
    # materialize the small per-doc result so the token cache can be
    # released now (same rationale as clustering.semantic_dedup)
    out = materialize(out)
    base.unpersist()
    return out
