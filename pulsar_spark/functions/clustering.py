"""Embedding clustering — deterministic Lloyd k-means over an
``array<float>`` column, the grouping stage of corpus curation
(SemDeDup-style semantic dedup, domain discovery, IVF coarse
quantizers; functions/similarity.py ``ivf_fit`` is the numpy sibling
used for ANN indexing — this one is the fully-distributed, oracle-
checkable variant).

Determinism contract (what makes a closed-form DuckDB oracle possible):

- seeds = the vectors of the ``k`` smallest ids (no RNG);
- a FIXED iteration count (no convergence epsilon);
- centroid means are rounded to ``round_dp`` decimals after every
  update, so both engines feed bit-identical centroid literals into
  the next assignment pass;
- squared-L2 distance is computed via the dot-product identity
  ``|a|^2 + |c|^2 - 2 a.c`` with sequential left-to-right summation on
  both engines (Spark ``aggregate(zip_with(..))`` == DuckDB
  ``list_dot_product``), and argmin ties break on the smaller cluster
  id.

Scale shape: each iteration is ONE narrow map (k broadcast centroid
literals, JVM-side expressions, no Python) plus ONE (cluster, dim)
aggregation shuffle whose output is k x dim rows — the collect is
bounded by the model size, never the data. Total cost for 100 TB =
``iters + 1`` scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared sequential left-to-right dot product — the summation-order
# determinism contract lives in ONE place (similarity.py)
from pulsar_spark.functions.similarity import _dot


def _assign(vecs: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Add ``cluster`` (argmin squared-L2, ties -> smaller id) and
    ``dist`` columns against literal centroids."""
    v = F.col(vec_col).cast("array<double>")
    self_dot = _dot(v, v)
    cands = []
    for j, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        c_dot = sum(x * x for x in c)  # python fp64, sequential like the SQL twin
        d = self_dot + F.lit(c_dot) - 2.0 * _dot(v, lit)
        cands.append(F.struct(d.alias("dist"), F.lit(j).alias("cluster")))
    best = F.array_min(F.array(*cands))
    return vecs.withColumn("cluster", best["cluster"]).withColumn("dist", best["dist"])


def kmeans_fit_predict(
    embeddings: DataFrame,
    k: int = 10,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic k-means; returns (id, cluster, dist) with ``dist``
    the squared L2 distance to the final centroid, rounded."""
    seeds = (
        embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    if not centroids:
        raise ValueError("kmeans_fit_predict: input has no rows")
    # fewer rows than k: degrade to n clusters (ids stay 0..n-1) instead
    # of indexing past the seed list in the empty-cluster carry-over
    k = len(centroids)
    for _ in range(iters):
        assigned = _assign(embeddings, centroids, vec_col)
        cent_rows = (
            assigned.select(
                "cluster",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
            )
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("x"), round_dp).alias("m"))
            .collect()  # bounded: k x dim model rows
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cent_rows:
            by_cluster.setdefault(r["cluster"], {})[r["i"]] = r["m"]
        # a cluster that lost every member keeps its previous centroid
        # (cluster ids are stable; same rule in the SQL twin)
        centroids = [
            [by_cluster[j][i] for i in sorted(by_cluster[j])]
            if j in by_cluster
            else centroids[j]
            for j in range(k)
        ]
    return _assign(embeddings, centroids, vec_col).select(
        id_col, "cluster", F.round("dist", round_dp).alias("dist")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 10,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then prune near-duplicates WITHIN each cluster —
    a vector is a duplicate if a smaller-id vector in the same cluster
    has cosine similarity >= ``threshold`` (similarity rounded to
    ``round_dp`` so the comparison is engine-stable). Returns
    (id, cluster, is_dup).

    Scale shape: the quadratic pair scan is bounded PER CLUSTER — at
    corpus scale you raise ``k`` until clusters fit a task (the paper
    runs k=50k on LAION), so the self-join shuffles once on the
    cluster key and never goes globally quadratic. The clustering pass
    itself is ``iters + 1`` scans (see ``kmeans_fit_predict``).
    """
    from pulsar_spark.functions.similarity import cosine_similarity

    assign = kmeans_fit_predict(
        embeddings, k, iters, id_col, vec_col, round_dp
    ).select(id_col, "cluster")
    t = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        )
        .join(assign, id_col)
        .cache()  # reused by both sides of the pair join + the output
    )
    dups = (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .where(
            F.round(cosine_similarity(F.col("a._v"), F.col("b._v")), round_dp)
            >= threshold
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    out = t.join(dups, id_col, "left").select(
        id_col, "cluster", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
    )
    # materialize the (small: id, cluster, bool) result so the cached
    # join can be released NOW instead of pinning executor storage for
    # the session lifetime; the eager job is in character — kmeans
    # above already ran collect()-per-iteration jobs
    out = out.localCheckpoint(eager=True)
    t.unpersist()
    return out
