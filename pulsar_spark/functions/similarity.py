"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force scan against one query vector — the
  exact baseline. The query is a literal array (broadcast by value into
  the plan); dot/norm are ``aggregate``/``zip_with`` built-ins, so the
  whole scan stays in whole-stage codegen. One pass, no shuffle except
  the final top-k (which Spark executes as per-partition top-k + merge).
- ``cosine_all_pairs_topk``: exact k-NN join for bounded inputs (test
  oracle / reranker).
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (sign bits of dot products with fixed seeded hyperplanes), candidates
  only within a bucket. Hyperplanes are deterministic (numpy seed), so
  results are reproducible.
- ``embedding_near_duplicates`` / ``embedding_near_duplicates_lsh``:
  cosine-threshold near-duplicate pairs — exact (quadratic ground
  truth, DuckDB-oracle-checkable) and LSH-candidate (scale) variants.
- ``ivf_fit`` / ``ivf_assign`` / ``ivf_topk``: IVF index — Lloyd
  k-means over DataFrame aggregates, centroids held driver-side (tiny:
  n_centroids x dim floats, broadcast into the plan), probe-limited
  search. Assignment is a vectorized numpy matmul-argmax pandas UDF:
  one (batch x dim) @ (dim x n_centroids) per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    Returns (id, cosine) ordered by (cosine desc, id) — cosine rounded
    to 6dp so ordering is engine-stable.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def cosine_all_pairs_topk(
    embeddings: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact k-NN join: for every vector, its top-k neighbors by cosine.
    Quadratic — bounded inputs / ground truth only."""
    a = embeddings.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"))
    pairs = a.join(b, F.col("id_a") != F.col("id_b")).withColumn(
        "cosine", F.round(_dot("va", "vb") / (_norm(F.col("va")) * _norm(F.col("vb"))), 6)
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.col("id_b"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("id_a", "id_b", "cosine", F.col("_rn").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket_assignment(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multi-table random-hyperplane LSH (OR-construction).

    Each of ``n_tables`` tables hashes a vector to a sign-bit bucket of
    ``n_planes`` independent hyperplanes; a neighbor pair is a candidate
    if it collides in ANY table. Adds an exploded (lsh_table,
    lsh_bucket) pair per row — n_tables rows per vector.
    """
    planes = _hyperplanes(dim, n_planes * n_tables, seed)
    v = _as_double(F.col(vec_col))
    table_buckets = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("bigint")
        for i in range(n_planes):
            pl = F.array(*[F.lit(float(x)) for x in planes[t * n_planes + i]])
            bit = F.when(_dot(v, pl) >= 0, F.lit(1 << i).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            bucket = bucket.bitwiseOR(bit)
        table_buckets.append(
            F.struct(F.lit(t).alias("lsh_table"), bucket.alias("lsh_bucket"))
        )
    return embeddings.withColumn("_tb", F.explode(F.array(*table_buckets))).select(
        "*", "_tb.lsh_table", "_tb.lsh_bucket"
    ).drop("_tb")


def lsh_bucket_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN: exact cosine only over LSH candidate pairs.

    The (table, bucket) equi-join replaces the quadratic cross join — at
    scale the shuffle keys are uniformly distributed hashes. Recall is
    tuned by (n_planes, n_tables): fewer planes -> bigger buckets,
    more tables -> more chances to collide (recall ~= 1-(1-p^b)^L).
    """
    bucketed = lsh_bucket_assignment(embeddings, dim, n_planes, n_tables, vec_col, seed)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"),
        "lsh_table", "lsh_bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"),
        "lsh_table", "lsh_bucket",
    )
    pairs = (
        a.join(b, on=["lsh_table", "lsh_bucket"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine", F.round(_dot("va", "vb") / (_norm(F.col("va")) * _norm(F.col("vb"))), 6)
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.col("id_b"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("id_a", "id_b", "cosine", F.col("_rn").alias("rank"))
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold. Quadratic — the ground truth / oracle form;
    ``embedding_near_duplicates_lsh`` is the scale path."""
    a = embeddings.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(_dot("va", "vb") / (_norm(F.col("va")) * _norm(F.col("vb"))), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_duplicates_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.45,
    n_planes: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs at scale: exact cosine evaluated only on
    LSH-bucket-colliding candidates (OR over ``n_tables`` tables). The
    quadratic pair space becomes an equi-join on (table, bucket); miss
    probability for a pair at cosine c is (1-p^n_planes)^n_tables with
    p = 1 - arccos(c)/pi."""
    bucketed = lsh_bucket_assignment(embeddings, dim, n_planes, n_tables, vec_col, seed)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"),
        "lsh_table", "lsh_bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"),
        "lsh_table", "lsh_bucket",
    )
    return (
        a.join(b, on=["lsh_table", "lsh_bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine", F.round(_dot("va", "vb") / (_norm(F.col("va")) * _norm(F.col("vb"))), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------------------------ IVF

def _normalize_rows(m: "np.ndarray") -> "np.ndarray":
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _assign_udf(centroids: "np.ndarray"):
    """Pandas UDF: vec -> nearest centroid id by cosine (matmul argmax).

    ``centroids`` rides to executors inside the serialized UDF closure —
    the same mechanics as a broadcast variable, appropriate because the
    index is n_centroids x dim floats (KBs)."""
    cn = _normalize_rows(centroids.astype(np.float64)).T  # (dim, k)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        return pd.Series((m @ cn).argmax(axis=1).astype(np.int32))

    return assign


def ivf_fit(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "np.ndarray":
    """Lloyd k-means producing the IVF coarse quantizer (centroid
    matrix, driver-side). Deterministic: init = the ``n_centroids``
    lowest-id vectors; ties in assignment resolve to the lowest
    centroid id (numpy argmax takes the first maximum).

    Each iteration is one distributed pass: vectorized assign UDF +
    per-dimension ``avg`` aggregate (dim x n_centroids partial aggs,
    map-side combined — the shuffle carries n_centroids rows)."""
    init = (
        embeddings.orderBy(id_col).limit(n_centroids).select(_as_double(F.col(vec_col)).alias("v")
        ).collect()
    )
    centroids = np.array([r["v"] for r in init], dtype=np.float64)
    dim_avgs = None
    for _ in range(iters):
        assigned = embeddings.withColumn("_cid", _assign_udf(centroids)(F.col(vec_col)))
        if dim_avgs is None:
            v = _as_double(F.col(vec_col))
            dim_avgs = [F.avg(v[i]).alias(f"d{i}") for i in range(dim)]
        rows = assigned.groupBy("_cid").agg(*dim_avgs).collect()
        new = centroids.copy()  # empty clusters keep their previous centroid
        for r in rows:
            new[r["_cid"]] = [r[f"d{i}"] for i in range(dim)]
        centroids = new
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: "np.ndarray",
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Attach the IVF list (nearest-centroid id) to every row. At rest a
    100 TB corpus stores this as a partition column so probes prune
    whole partitions instead of filtering rows."""
    return embeddings.withColumn(out_col, _assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """Approximate top-k: search only the ``n_probe`` inverted lists
    whose centroids are nearest the query. Recall is tuned by
    n_probe/n_centroids; cost drops from N to ~N*n_probe/n_centroids
    row comparisons, and with ``centroid_id`` as a storage partition
    column the non-probed lists are never read at all."""
    if centroids is None:
        centroids = ivf_fit(embeddings, dim, n_centroids, iters, vec_col, id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(_normalize_rows(centroids.astype(np.float64)) @ qn))[:n_probe]
    assigned = ivf_assign(embeddings, centroids, vec_col)
    shortlist = assigned.where(F.col("centroid_id").isin([int(p) for p in probe]))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = shortlist.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), qlit), 6).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def ivf_write_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: bool = False,
) -> "np.ndarray":
    """Materialize an IVF index as a parquet store hive-partitioned by
    ``centroid_id``, with the centroid matrix saved alongside. At 100 TB
    this is THE layout: a probe of n_probe lists touches only those
    directories — partition pruning at the storage layer, not a row
    filter — so query cost is ~n_probe/n_centroids of the corpus
    regardless of corpus size. Returns the centroids.

    ``quantize=True`` stores int8-quantized vectors (``q_embedding`` +
    ``q_scale`` via :func:`quantize_embeddings`) instead of the float
    column — the two scale levers compose: partition pruning cuts WHICH
    lists are read, quantization cuts the BYTES per list read, for a
    combined ~4x(n_centroids/n_probe) I/O reduction per probe.
    ``ivf_topk_indexed`` detects the store flavor automatically.
    """
    centroids = ivf_fit(embeddings, dim, n_centroids, iters, vec_col, id_col)
    assigned = ivf_assign(embeddings, centroids, vec_col)
    if quantize:
        assigned = quantize_embeddings(assigned, vec_col=vec_col, id_col=id_col).drop(
            vec_col
        )
    assigned.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(path.rstrip("/") + "/vectors")
    spark = embeddings.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "centroid_id int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/centroids")
    return centroids


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Probe a materialized IVF store: rank centroids driver-side (the
    centroid table is KBs), scan ONLY the probed ``centroid_id=``
    partitions (check .explain: PartitionFilters prunes the rest), exact
    cosine top-k within. A quantized store (written with
    ``ivf_write_index(quantize=True)``) is detected from its columns and
    dequantized on the fly inside the scan expression."""
    crows = spark.read.parquet(path.rstrip("/") + "/centroids").collect()
    cents = np.zeros((len(crows), len(crows[0]["centroid"])), dtype=np.float64)
    for r in crows:
        cents[r["centroid_id"]] = r["centroid"]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = [int(p) for p in np.argsort(-(_normalize_rows(cents) @ qn))[:n_probe]]

    vectors = spark.read.parquet(path.rstrip("/") + "/vectors")
    shortlist = vectors.where(F.col("centroid_id").isin(probe))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    # cosine is invariant to the per-vector positive scale, so the
    # quantized store scores RAW int8 values (no dequantize multiply,
    # no q_scale column read in the probe hot path); the zero vector
    # yields null either way
    vec = (
        F.col("q_embedding").cast("array<double>")
        if "q_embedding" in vectors.columns
        else F.col(vec_col)
    )
    scored = shortlist.select(
        F.col(id_col),
        F.round(cosine_similarity(vec, qlit), 6).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column:
    ``scale = max(|x|) / 127``, ``q_i = round(x_i / scale)`` in
    [-127, 127].

    The 100 TB lever for the ANN store: a 64-dim float32 corpus drops
    4x in storage/shuffle/scan I/O (the dominant ANN cost is bytes
    moved, not arithmetic), at a recall cost measured in tenths of a
    percent for cosine ranking. Pure built-in array expressions — no
    Python, rides whole-stage codegen; keeps every other column.
    Zero vectors get scale 0 and quantize to all-zero (dequantizes to
    the same zero vector).
    """
    v = _as_double(F.col(vec_col))
    # quantize against the float32-ROUNDED scale — that is the value a
    # reader will dequantize with (q_scale is stored as float), so using
    # it here keeps round-trip error minimal and reproducible
    scale = (
        (F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0))
        .cast("float")
        .cast("double")
    )
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return emb.withColumn("q_embedding", q).withColumn(
        "q_scale", scale.cast("float")
    )


def dequantize_col(q_col: Column, scale_col: Column) -> Column:
    """Inverse of :func:`quantize_embeddings` as a column expression:
    ``x_i ~ q_i * scale`` (array<double>)."""
    return F.transform(q_col, lambda x: x.cast("double") * scale_col.cast("double"))


def cosine_topk_quantized(
    emb_q: DataFrame,
    query_vec: list[float],
    k: int = 10,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k over a QUANTIZED corpus (the int8 store
    from :func:`quantize_embeddings`): same plan shape as
    ``cosine_topk`` but reading a quarter of the bytes. Cosine is
    invariant to the per-vector positive scale, so the int8 values are
    scored RAW — no dequantize multiply and no scale-column read in the
    scan. Use as the shortlist stage of a two-phase (quantized scan ->
    float rerank) pipeline at scale."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb_q.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(q_col).cast("array<double>"), qlit), 6).alias(
            "cosine"
        ),
    )
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
