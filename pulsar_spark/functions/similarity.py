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
"""

from __future__ import annotations

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
