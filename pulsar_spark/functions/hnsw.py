"""HNSW — Hierarchical Navigable Small World graphs (Malkov &
Yashunin 2016, arXiv:1603.09320) — as the COARSE ROUTER of an IVF
index, the high-recall complement to the PQ/IVFADC family in
functions/clustering.py.

Spark-first scale story: an HNSW graph over the CORPUS would be a
driver-side structure over data-sized input — wrong at 100 TB. The
graph here is built over the BOUNDED centroid model only (``nlist``
entries — the same bounded-model contract as the k-means codebooks we
already broadcast), and replaces the linear ``argmin over nlist``
centroid scan with an O(ef·log nlist) graph descent when picking the
``nprobe`` cells to read. That is exactly the FAISS ``IVFx,HNSW``
coarse-quantizer pattern: at nlist ~ 1e5-1e6 (where a 100 TB corpus
wants its cell count) the router is the difference between
milliseconds and seconds per query batch, while the corpus-side read
stays the partition-pruned IVF scan.

Determinism contract (this engine's standard): node levels derive
from md5(seed, node_id) — no RNG state; neighbor selection breaks
distance ties by smaller id; insertion order is the caller's list
order. Same inputs -> identical graph on every build.
"""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_l2(a: list[float], b: list[float]) -> float:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


class HnswIndex:
    """Deterministic in-memory HNSW over a bounded model (centroids).

    ``M`` neighbors per node on upper layers (2M on layer 0, per the
    paper's M_max0 recommendation), ``ef_construction`` candidates
    during insertion. Distances are squared L2 — the same metric the
    IVF assignment (`clustering._assign`) uses, so routing and cell
    assignment agree."""

    def __init__(self, m: int = 8, ef_construction: int = 64, seed: int = 7):
        if m < 2:
            raise ValueError("M must be >= 2")
        self.m = int(m)
        self.m0 = 2 * int(m)
        self.efc = int(ef_construction)
        self.seed = int(seed)
        self.ml = 1.0 / math.log(m)
        self.vecs: dict[int, list[float]] = {}
        #: node -> level -> sorted list of neighbor ids
        self.links: dict[int, list[list[int]]] = {}
        self.entry: int | None = None
        self.max_level = -1

    # -------------------------------------------------------- internals

    def _level(self, node_id: int) -> int:
        """floor(-ln(u) * mL) with u a deterministic uniform in (0,1)
        from md5(seed, id) — the paper's exponential level draw without
        RNG state."""
        h = hashlib.md5(f"{self.seed}:{node_id}".encode()).digest()
        u = (int.from_bytes(h[:8], "big") + 1) / float(1 << 64)
        return int(-math.log(u) * self.ml)

    def _search_layer(
        self, q: list[float], eps: list[int], ef: int, level: int
    ) -> list[tuple[float, int]]:
        """Best-first beam search on one layer (Algorithm 2). Returns
        up to ``ef`` (dist, id) pairs sorted ascending."""
        import heapq

        visited = set(eps)
        cand = [(_sq_l2(q, self.vecs[e]), e) for e in eps]
        heapq.heapify(cand)
        found = sorted(cand)[: ef]
        best = list(found)
        while cand:
            d, c = heapq.heappop(cand)
            if best and d > best[-1][0] and len(best) >= ef:
                break
            for nb in self.links[c][level] if level < len(self.links[c]) else []:
                if nb in visited:
                    continue
                visited.add(nb)
                dn = _sq_l2(q, self.vecs[nb])
                if len(best) < ef or dn < best[-1][0]:
                    heapq.heappush(cand, (dn, nb))
                    best.append((dn, nb))
                    best.sort()
                    del best[ef:]
        return best

    def _select(self, cands: list[tuple[float, int]], m: int) -> list[int]:
        """Top-m by (distance, id) — the paper's simple selection; the
        id tiebreak keeps builds deterministic."""
        return [i for _, i in sorted(cands)[:m]]

    # ------------------------------------------------------------- API

    def add(self, node_id: int, vec: list[float]) -> None:
        node_id = int(node_id)
        if node_id in self.vecs:
            raise ValueError(f"duplicate node {node_id}")
        vec = [float(x) for x in vec]
        level = self._level(node_id)
        self.vecs[node_id] = vec
        self.links[node_id] = [[] for _ in range(level + 1)]
        if self.entry is None:
            self.entry = node_id
            self.max_level = level
            return
        ep = [self.entry]
        # greedy descent through layers above the node's level
        for lv in range(self.max_level, level, -1):
            ep = [self._search_layer(vec, ep, 1, lv)[0][1]]
        # insert with ef_construction candidates on each shared layer
        for lv in range(min(level, self.max_level), -1, -1):
            cands = self._search_layer(vec, ep, self.efc, lv)
            m = self.m0 if lv == 0 else self.m
            nbs = self._select(cands, m)
            self.links[node_id][lv] = list(nbs)
            for nb in nbs:
                lnk = self.links[nb][lv]
                lnk.append(node_id)
                if len(lnk) > m:
                    # prune the over-full neighbor back to its m closest
                    pruned = self._select(
                        [(_sq_l2(self.vecs[nb], self.vecs[x]), x) for x in lnk], m
                    )
                    self.links[nb][lv] = pruned
            ep = [i for _, i in cands]
        if level > self.max_level:
            self.max_level = level
            self.entry = node_id

    def search(self, q: list[float], k: int, ef: int | None = None) -> list[tuple[float, int]]:
        """Top-k (squared-L2 distance, id) for a query vector
        (Algorithm 5: greedy descent, then a beam of ef on layer 0)."""
        if self.entry is None:
            return []
        q = [float(x) for x in q]
        ef = max(int(ef or self.efc), k)
        ep = [self.entry]
        for lv in range(self.max_level, 0, -1):
            ep = [self._search_layer(q, ep, 1, lv)[0][1]]
        return self._search_layer(q, ep, ef, 0)[:k]


def build_hnsw(centroids: list[list[float]], m: int = 8,
               ef_construction: int = 64, seed: int = 7) -> HnswIndex:
    """Index a centroid list (node id = centroid index, matching the
    ``cluster`` codes the IVF stores are partitioned by)."""
    idx = HnswIndex(m=m, ef_construction=ef_construction, seed=seed)
    for i, c in enumerate(centroids):
        idx.add(i, c)
    return idx


def hnsw_ivf_topk(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ef: int = 64,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF top-k with an HNSW coarse router: fit ``nlist`` centroids
    (the bounded model), route the query through the centroid graph to
    pick ``nprobe`` cells, then exact cosine top-k over ONLY those
    cells' rows. The cell filter is a literal IN-list riding the scan
    (over a materialized store it would be a partition filter, as in
    ``ivfpq_topk``); nothing data-sized ever reaches the driver."""
    from pulsar_spark.functions.clustering import _assign, _fit_centroids
    from pulsar_spark.functions.similarity import cosine_similarity

    cents = _fit_centroids(vecs, nlist, iters, id_col, vec_col, round_dp=6)
    router = build_hnsw(cents, m=m, seed=7)
    probe = sorted(i for _, i in router.search(query_vec, nprobe, ef=ef))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (
        _assign(vecs, cents, vec_col)
        .where(F.col("cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
    )
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
