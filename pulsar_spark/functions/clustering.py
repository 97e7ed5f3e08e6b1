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
from pulsar_spark.functions.materialize import materialize


def _assign(vecs: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Add ``cluster`` (argmin squared-L2, ties -> smaller id) and
    ``dist`` columns against literal centroids."""
    best = _argmin_code(F.col(vec_col).cast("array<double>"), centroids)
    return vecs.withColumn("cluster", best["code"]).withColumn("dist", best["dist"])


def _fit_centroids(
    vecs: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    round_dp: int,
) -> list[list[float]]:
    """The Lloyd loop of :func:`kmeans_fit_predict`, returning the
    final centroid list (the model) under the same determinism
    contract: smallest-id seeds, fixed ``iters``, per-update rounding,
    empty clusters keep their previous centroid."""
    seeds = (
        vecs.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    if not centroids:
        raise ValueError("kmeans: input has no rows")
    # fewer rows than k: degrade to n clusters (ids stay 0..n-1) instead
    # of indexing past the seed list in the empty-cluster carry-over
    k = len(centroids)
    for _ in range(iters):
        assigned = _assign(vecs, centroids, vec_col)
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
    return centroids


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
    centroids = _fit_centroids(embeddings, k, iters, id_col, vec_col, round_dp)
    return _assign(embeddings, centroids, vec_col).select(
        id_col, "cluster", F.round("dist", round_dp).alias("dist")
    )


def _argmin_code(sv, centroids: list[list[float]]):
    """(dist, code) struct of the nearest centroid to expression ``sv``
    (squared L2 via the dot-product identity, ties -> smaller code)."""
    self_dot = _dot(sv, sv)
    cands = []
    for j, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        c_dot = sum(x * x for x in c)  # python fp64, sequential like the SQL twin
        d = self_dot + F.lit(c_dot) - 2.0 * _dot(sv, lit)
        cands.append(F.struct(d.alias("dist"), F.lit(j).alias("code")))
    return F.array_min(F.array(*cands))


def product_quantize(
    embeddings: DataFrame,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split each D-dim vector into ``m``
    contiguous D/m-dim subvectors and learn an independent ``codes``-
    entry codebook per subspace with the deterministic Lloyd loop
    (:func:`_fit_centroids` — same smallest-id seeding / fixed-iters /
    rounded-update contract as :func:`kmeans_fit_predict`, so the
    DuckDB oracle is closed-form). Returns per vector the ``m`` code
    assignments (``code_0..code_{m-1}``) and ``recon_error`` — the
    squared L2 distance between the vector and its reconstruction,
    i.e. the sum of per-subspace quantization errors (summed left to
    right, rounded).

    This is the compression layer real 100 TB ANN stacks run on: a
    64-dim float vector (256 B) becomes ``m`` small codes (``m`` bytes
    at codes<=256), an ~64x storage cut, searched via asymmetric
    distance (:func:`pq_topk`) without ever decoding.

    Scale shape: training runs on the bounded subspace model
    (m x (iters+1) scans, each one narrow map + one (code, dim) agg
    whose output is codes x D/m rows); encoding is ONE narrow
    codegen'd projection over broadcast literal codebooks — no
    shuffle, no Python.
    """
    books, subdim = _pq_books(embeddings, m, codes, iters, id_col, vec_col, round_dp)
    return _pq_encode(embeddings, books, subdim, id_col, vec_col, round_dp)


def _pq_books(
    embeddings: DataFrame,
    m: int,
    codes: int,
    iters: int,
    id_col: str,
    vec_col: str,
    round_dp: int,
) -> tuple[list[list[list[float]]], int]:
    """Train the ``m`` per-subspace codebooks; returns (books, subdim)."""
    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("product quantization: input has no rows")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"product quantization: dim {dim} not divisible by m={m}")
    subdim = dim // m
    v = F.col(vec_col).cast("array<double>")
    books = [
        _fit_centroids(
            embeddings.select(id_col, F.slice(v, j * subdim + 1, subdim).alias("_sv")),
            codes,
            iters,
            id_col,
            "_sv",
            round_dp,
        )
        for j in range(m)
    ]
    return books, subdim


def _pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    subdim: int,
    id_col: str,
    vec_col: str,
    round_dp: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One narrow codegen'd projection: (id, [extra_cols,]
    code_0..code_{m-1}, recon_error) against literal codebooks."""
    v = F.col(vec_col).cast("array<double>")
    cols: list = [F.col(id_col), *[F.col(c) for c in extra_cols]]
    err = None
    for j, cents in enumerate(books):
        best = _argmin_code(F.slice(v, j * subdim + 1, subdim), cents)
        cols.append(best["code"].alias(f"code_{j}"))
        err = best["dist"] if err is None else err + best["dist"]
    return embeddings.select(*cols, F.round(err, round_dp).alias("recon_error"))


def pq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 5,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes: the query
    stays un-quantized; per subspace its squared distance to each of
    the ``codes`` codebook entries forms a tiny lookup table, and a
    database vector's approximate distance is the sum of its ``m``
    table entries — computed here by re-deriving each vector's code
    per subspace and summing the matching table literal (CASE ladder
    over ``codes`` entries), left to right, rounded. Returns
    (rank, vec_id, adc_dist) for the ``k`` nearest (ties -> smaller
    id).

    At scale the codes are materialized once by
    :func:`product_quantize` and the scan reads m bytes per vector;
    the top-k is a TakeOrdered (no global sort)."""
    # reject a malformed query BEFORE the distributed codebook training
    first = embeddings.select(vec_col).first()
    if first is not None and len(query) != len(first[0]):
        raise ValueError(f"pq_topk: query dim {len(query)} != {len(first[0])}")
    books, subdim = _pq_books(embeddings, m, codes, iters, id_col, vec_col, round_dp)
    v = F.col(vec_col).cast("array<double>")
    adc = None
    for j, cents in enumerate(books):
        table = _adc_table(query[j * subdim : (j + 1) * subdim], cents)
        code = _argmin_code(F.slice(v, j * subdim + 1, subdim), cents)["code"]
        lookup = F.element_at(F.array(*[F.lit(t) for t in table]), code + 1)
        adc = lookup if adc is None else adc + lookup
    scored = embeddings.select(
        F.col(id_col), F.round(adc, round_dp).alias("adc_dist")
    )
    return _rank_topk(scored, k, id_col)


def _adc_table(q_sub: list[float], cents: list[list[float]]) -> list[float]:
    """Python fp64 lookup table ||q_sub - c||^2 per codebook entry, via
    the same sequential dot-product identity as the SQL twin."""
    return [
        sum(x * x for x in q_sub)
        + sum(x * x for x in c)
        - 2.0 * sum(a * b for a, b in zip(q_sub, c))
        for c in cents
    ]


def _rank_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """(rank, id, adc_dist) for the k nearest — pre-trim with a
    TakeOrdered-shaped limit so the single-partition row_number window
    only ever sees k rows, not the corpus."""
    from pyspark.sql import Window

    w_cols = [F.col("adc_dist").asc(), F.col(id_col).asc()]
    w = Window.orderBy(*w_cols)
    cands = scored.orderBy(*w_cols).limit(k)
    return cands.select(F.row_number().over(w).alias("rank"), id_col, "adc_dist")


def pq_write_index(
    embeddings: DataFrame,
    path: str,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> list[list[list[float]]]:
    """Materialize a PQ index: the per-vector codes as a parquet store
    (``<path>/codes``) plus the codebooks alongside
    (``<path>/codebooks``: subspace, code, centroid). Returns the
    codebooks.

    At 100 TB this is the PQ payoff made physical: a search through
    :func:`pq_topk_indexed` reads ONLY the m small code columns — the
    float vectors are never touched again — so scan bytes drop ~64x
    versus the raw store, and the codebook side stays KBs regardless of
    corpus size. Composes with the IVF store (partition pruning cuts
    WHICH rows are read; PQ codes cut the BYTES per row)."""
    books, subdim = _pq_books(embeddings, m, codes, iters, id_col, vec_col, round_dp)
    enc = _pq_encode(embeddings, books, subdim, id_col, vec_col, round_dp)
    enc.write.mode("overwrite").parquet(path.rstrip("/") + "/codes")
    spark = embeddings.sparkSession
    rows = [
        (j, c, [float(x) for x in cent])
        for j, book in enumerate(books)
        for c, cent in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/codebooks")
    return books


def pq_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """ADC top-k against a materialized PQ store: load the KB-sized
    codebook table driver-side, build the per-subspace distance tables,
    and scan the code store reading ONLY (id, code_*) columns — check
    ``.explain``: ReadSchema carries no vector or recon_error column.
    Same ranking contract as :func:`pq_topk` (ties -> smaller id)."""
    books, subdim = _load_codebooks(spark, path)
    if len(query) != len(books) * subdim:
        raise ValueError(
            f"pq_topk_indexed: query dim {len(query)} != {len(books) * subdim}"
        )
    codes_df = spark.read.parquet(path.rstrip("/") + "/codes")
    adc = _adc_lookup_expr(query, books, subdim)
    scored = codes_df.select(F.col(id_col), F.round(adc, round_dp).alias("adc_dist"))
    return _rank_topk(scored, k, id_col)


def _load_codebooks(spark, path: str) -> tuple[list[list[list[float]]], int]:
    """Load a store's KB-sized codebook table driver-side; returns
    (books — per subspace the code-ordered centroid list, subdim)."""
    cb = spark.read.parquet(path.rstrip("/") + "/codebooks").collect()
    by_sub: dict[int, dict[int, list[float]]] = {}
    for r in cb:
        by_sub.setdefault(r["subspace"], {})[r["code"]] = list(r["centroid"])
    books = [
        [by_sub[j][c] for c in sorted(by_sub[j])] for j in sorted(by_sub)
    ]
    return books, len(books[0][0])


def _adc_lookup_expr(query: list[float], books, subdim: int):
    """The ADC accumulation over stored code columns: per subspace the
    ``query`` slice's distance table as literals, indexed by ``code_j``,
    summed left to right."""
    adc = None
    for j, cents in enumerate(books):
        table = _adc_table(query[j * subdim : (j + 1) * subdim], cents)
        lookup = F.element_at(
            F.array(*[F.lit(t) for t in table]), F.col(f"code_{j}") + 1
        )
        adc = lookup if adc is None else adc + lookup
    return adc


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
    out = materialize(out)
    t.unpersist()
    return out


def ivfpq_write_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 8,
    ivf_iters: int = 2,
    m: int = 4,
    codes: int = 8,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
):
    """IVFADC (Jégou et al. 2011 §IV): the composed 100 TB ANN layout.
    A coarse IVF quantizer partitions the corpus into inverted lists;
    each vector's RESIDUAL against its list centroid is product-
    quantized; the store is parquet hive-partitioned by ``centroid_id``
    carrying only the m codes. A probe therefore prunes at BOTH axes:
    partition pruning cuts WHICH lists are read (~n_probe/n_centroids
    of the rows), the code columns cut the BYTES per row read (~64x) —
    together the scan for one query is ~n_probe/(n_centroids*64) of
    the raw store. Returns (centroids, codebooks).

    Residual encoding (not raw-vector PQ) is what makes the codebooks
    sharp: within a list the residual cloud is centered, so the same
    ``codes`` budget spends its resolution near the data."""
    from pulsar_spark.functions.similarity import ivf_assign, ivf_fit

    centroids = ivf_fit(embeddings, dim, n_centroids, ivf_iters, vec_col, id_col)
    assigned = ivf_assign(embeddings, centroids, vec_col)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in centroids]
    )
    v = F.col(vec_col).cast("array<double>")
    resid = F.zip_with(
        v, F.element_at(cent_lit, F.col("centroid_id") + 1), lambda a, b: a - b
    )
    rdf = assigned.select(
        F.col(id_col), F.col("centroid_id"), resid.alias("_resid")
    ).persist()
    try:
        books, subdim = _pq_books(rdf, m, codes, pq_iters, id_col, "_resid", round_dp)
        enc = _pq_encode(
            rdf, books, subdim, id_col, "_resid", round_dp, extra_cols=("centroid_id",)
        )
        enc.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(path.rstrip("/") + "/codes")
    finally:
        rdf.unpersist()
    spark = embeddings.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "centroid_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in cent])
            for j, book in enumerate(books)
            for c, cent in enumerate(book)
        ],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/codebooks")
    return centroids, books


def ivfpq_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """IVFADC search: rank the KB-sized centroid table driver-side
    (cosine, same probe order as ``ivf_topk``), then for each probed
    list build the ADC tables from the RESIDUAL query (q - centroid)
    and scan only that list's partition reading only the code columns.
    Check ``.explain``: PartitionFilters prunes non-probed lists AND
    ReadSchema carries no vector column. Ranking ties -> smaller id."""
    import numpy as np

    if int(n_probe) < 1:
        raise ValueError(f"ivfpq_topk: n_probe must be >= 1, got {n_probe}")
    cent_rows = spark.read.parquet(path.rstrip("/") + "/centroids").collect()
    centroids = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["centroid_id"])],
        dtype=np.float64,
    )
    books, subdim = _load_codebooks(spark, path)
    if len(query) != len(books) * subdim:
        raise ValueError(
            f"ivfpq_topk: query dim {len(query)} != {len(books) * subdim}"
        )
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    probe = np.argsort(-((centroids / norms[:, None]) @ qn))[: int(n_probe)]
    codes_df = spark.read.parquet(path.rstrip("/") + "/codes")
    scored = None
    for cid in probe:
        rq = [float(x) for x in (q - centroids[int(cid)])]
        adc = _adc_lookup_expr(rq, books, subdim)
        part = codes_df.where(F.col("centroid_id") == int(cid)).select(
            F.col(id_col), F.round(adc, round_dp).alias("adc_dist")
        )
        scored = part if scored is None else scored.unionAll(part)
    return _rank_topk(scored, k, id_col)


def ivfpq_topk_rerank(
    spark,
    path: str,
    raw: DataFrame,
    query: list[float],
    k: int = 5,
    k_prime: int = 20,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """IVFADC search with exact re-ranking (Jegou et al. 2011 §V:
    re-rank the ADC shortlist with exact distances): ``ivfpq_topk``
    ranks a shortlist of ``k_prime`` >> k candidates from the
    compressed store (partition + column pruning), then ONE narrow
    broadcast semi-join pulls exactly those ``k_prime`` raw vectors —
    the candidate id list is the broadcast side, the raw store scans
    only (id, vector) columns — and exact cosine re-scores them.
    Quantization error in the final order is thereby bounded by
    shortlist membership, not by code resolution: the top-k is exact
    whenever the true neighbors make the shortlist (recall vs the
    brute-force path is asserted in tests).

    At 100 TB the raw store is touched only by this k'-row probe; the
    heavy pruning stays in the compressed index. Returns
    ``(id, cosine, adc_dist)`` ordered by (cosine desc, id).
    """
    from pulsar_spark.functions.similarity import cosine_similarity

    if k_prime < k:
        raise ValueError(f"k_prime ({k_prime}) must be >= k ({k})")
    shortlist = ivfpq_topk(
        spark, path, query, k=k_prime, n_probe=n_probe,
        id_col=id_col, round_dp=round_dp,
    ).select(id_col, "adc_dist")
    q = F.array(*[F.lit(float(x)) for x in query])
    rescored = (
        raw.select(id_col, vec_col)
        .join(F.broadcast(shortlist), id_col)
        .select(
            id_col,
            F.round(cosine_similarity(F.col(vec_col), q), round_dp).alias("cosine"),
            "adc_dist",
        )
    )
    return rescored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
