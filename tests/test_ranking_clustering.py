"""BM25 ranking (functions/text.py) and k-means / SemDeDup clustering
(functions/clustering.py) — closed-form value checks on tiny corpora
plus contract tests. Cross-engine parity runs in tools/verify_oracle.py
(doc_bm25 / embedding_kmeans / embedding_semantic_dedup)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pulsar_spark.functions.clustering import kmeans_fit_predict, semantic_dedup
from pulsar_spark.functions.text import bm25_scores


def _docs(spark):
    from pulsar_spark.sources import load_table

    from tests.conftest import SF_DIR

    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "cat dog cat"),
            (1, "dog dog dog dog"),
            (2, "cat fish"),
            (3, "bird"),
        ],
        "doc_id bigint, text string",
    )


class TestBM25:
    def test_hand_computed_scores(self, tiny_docs):
        # corpus: N=4, dls = [3,4,2,1], avgdl = 2.5
        # 'cat': df=2 -> idf = ln(1 + 2.5/2.5) = ln 2
        # doc0 tf=2 dl=3: 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2.5))
        rows = {
            (r["query_id"], r["doc_id"]): r
            for r in bm25_scores(tiny_docs, [("q", ["cat"])], top_k=None).collect()
        }
        k1, b = 1.2, 0.75
        idf = math.log(2.0)

        def expect(tf, dl):
            return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 2.5)), 6)

        assert rows[("q", 0)]["score"] == pytest.approx(expect(2, 3), abs=1e-9)
        assert rows[("q", 2)]["score"] == pytest.approx(expect(1, 2), abs=1e-9)
        assert ("q", 1) not in rows  # no 'cat' in doc1
        assert ("q", 3) not in rows

    def test_rank_order_and_ties(self, tiny_docs):
        out = bm25_scores(tiny_docs, [("q", ["cat", "dog"])]).collect()
        by_rank = sorted(out, key=lambda r: r["rank"])
        scores = [r["score"] for r in by_rank]
        assert scores == sorted(scores, reverse=True)
        # equal scores must rank by doc_id ascending
        for a, c in zip(by_rank, by_rank[1:]):
            if a["score"] == c["score"]:
                assert a["doc_id"] < c["doc_id"]

    def test_top_k_limits(self, tiny_docs):
        out = bm25_scores(tiny_docs, [("q", ["cat", "dog", "fish"])], top_k=2).collect()
        assert len(out) == 2
        assert {r["rank"] for r in out} == {1, 2}

    def test_multi_query_independent(self, tiny_docs):
        out = bm25_scores(
            tiny_docs, [("qc", ["cat"]), ("qd", ["dog"])], top_k=None
        ).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], set()).add(r["doc_id"])
        assert per_q == {"qc": {0, 2}, "qd": {0, 1}}


@pytest.fixture(scope="module")
def two_blob_vecs(spark):
    # two tight blobs around (0,0) and (10,10); ids 0/1 are the seeds
    rows = [
        (0, [0.0, 0.1]), (1, [10.0, 10.1]),
        (2, [0.2, 0.0]), (3, [9.9, 10.0]),
        (4, [0.1, 0.2]), (5, [10.1, 9.8]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestKMeans:
    def test_separated_blobs_cluster_cleanly(self, two_blob_vecs):
        out = {r["vec_id"]: r for r in
               kmeans_fit_predict(two_blob_vecs, k=2, iters=2).collect()}
        assert {out[i]["cluster"] for i in (0, 2, 4)} == {0}
        assert {out[i]["cluster"] for i in (1, 3, 5)} == {1}
        # dist is squared L2 to the final centroid: small within a blob
        assert all(out[i]["dist"] < 1.0 for i in out)

    def test_fixed_iters_deterministic(self, two_blob_vecs):
        a = sorted(map(tuple, kmeans_fit_predict(two_blob_vecs, k=2, iters=2).collect()))
        b = sorted(map(tuple, kmeans_fit_predict(two_blob_vecs, k=2, iters=2).collect()))
        assert a == b

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # seed 1 is a far outlier duplicated nowhere: after iter 1 it
        # keeps only itself; drop it from the data via ids>=2 all near
        # seed 0 -> cluster 1 = exactly the outlier, never empty-crashes
        rows = [(0, [0.0, 0.0]), (1, [100.0, 100.0])] + [
            (i, [0.01 * i, 0.0]) for i in range(2, 8)
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = {r["vec_id"]: r["cluster"] for r in
               kmeans_fit_predict(df, k=2, iters=3).collect()}
        assert out[1] == 1
        assert all(out[i] == 0 for i in out if i != 1)


class TestSemanticDedup:
    def test_within_cluster_dup_flagged_smaller_id_kept(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),   # seeds
            (2, [1.0, 0.001, 0.0]),   # near-parallel to id 0 -> dup
            (3, [0.0, 1.0, 0.9]),     # same cluster as 1, cos ~0.74 < 0.95
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = {r["vec_id"]: r for r in
               semantic_dedup(df, k=2, iters=1, threshold=0.95).collect()}
        assert out[0]["is_dup"] is False  # smallest id in its group kept
        assert out[2]["is_dup"] is True
        assert out[1]["is_dup"] is False
        assert out[3]["is_dup"] is False

    def test_cross_cluster_parallel_not_compared(self, spark):
        # identical vectors forced into different clusters are NOT
        # flagged: the pair scan is cluster-bounded by design
        rows = [
            (0, [1.0, 0.0]), (1, [-1.0, 0.05]),
            (2, [-1.0, 0.05]),  # identical to 1 -> same cluster, dup
            (3, [1.0, 0.001]),  # joins cluster 0, near-parallel to 0 -> dup
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = {r["vec_id"]: r["is_dup"] for r in
               semantic_dedup(df, k=2, iters=1, threshold=0.99).collect()}
        assert out == {0: False, 1: False, 2: True, 3: True}


class TestLogregClassifier:
    """functions/classifier.py — distributed full-batch logistic
    regression (fixed iterations, integer-quantized gradients)."""

    def test_learns_learnable_label(self, spark):
        from pulsar_spark.functions.classifier import logreg_fit_predict

        docs = _docs(spark)
        out = logreg_fit_predict(docs, F.col("n_chars") >= 250, iters=2, lr=4.0)
        rows = out.collect()
        base = sum(r.label for r in rows) / len(rows)
        acc = sum((r.pred == (r.label == 1)) for r in rows) / len(rows)
        # the token-count feature carries the length label: the trained
        # model must beat always-predict-majority by a real margin
        assert acc > max(base, 1 - base) + 0.1

    def test_deterministic_across_runs(self, spark):
        from pulsar_spark.functions.classifier import fitted_weights

        docs = _docs(spark)
        w1 = fitted_weights(docs, F.col("n_chars") >= 250, iters=2, lr=4.0)
        w2 = fitted_weights(
            docs.repartition(7), F.col("n_chars") >= 250, iters=2, lr=4.0
        )
        # bit-identical even under a different partitioning — the
        # micro-unit gradient sum is order-independent
        assert w1 == w2

    def test_zero_weights_give_half_probability(self, spark):
        from pulsar_spark.functions.classifier import doc_features, fitted_weights

        docs = _docs(spark)
        w = fitted_weights(docs, F.col("n_chars") >= 250, iters=0)
        assert w == [0.0] * 5

    def test_empty_input_raises(self, spark):
        from pulsar_spark.functions.classifier import logreg_fit_predict

        empty = spark.createDataFrame(
            [], "doc_id bigint, text string, n_chars bigint"
        )
        with pytest.raises(ValueError):
            logreg_fit_predict(empty, F.col("n_chars") >= 250)

    def test_null_label_trains_as_negative(self, spark):
        from pulsar_spark.functions.classifier import logreg_fit_predict

        docs = spark.createDataFrame(
            [
                (0, "long long long long text here", 300),
                (1, "short words", 100),
                (2, "null label doc", None),  # n_chars NULL -> label NULL
            ],
            "doc_id bigint, text string, n_chars bigint",
        )
        rows = {
            r.doc_id: r
            for r in logreg_fit_predict(
                docs, F.col("n_chars") >= 250, iters=1
            ).collect()
        }
        # the SQL twin's CASE ... ELSE 0.0: NULL trains (and reports) as
        # 0, never as a silently dropped gradient row or a NULL label
        assert rows[2].label == 0
        assert all(r.label is not None and r.score is not None for r in rows.values())

    def test_gradient_matches_numpy(self, spark):
        import math

        from pulsar_spark.functions.classifier import doc_features, fitted_weights

        docs = _docs(spark)
        label = F.col("n_chars") >= 250
        feats = doc_features(docs, label).collect()
        n = len(feats)
        # iteration 1 by hand: p = 0.5, integer micro-unit gradient
        names = ("x0", "x1", "x2", "x3", "x4")
        def q(v):
            # Spark/DuckDB ROUND = half away from zero, NOT python's
            # half-even (ratios like 3/64 make exactly-representable
            # fp halves here)
            return int(v + 0.5) if v >= 0 else -int(-v + 0.5)

        g = [sum(q((0.5 - r.y) * r[x] * 1e6) for r in feats) for x in names]
        expect = [round(0.0 - 4.0 * ((gi / 1e6) / n), 6) for gi in g]
        assert fitted_weights(docs, label, iters=1, lr=4.0) == expect


class TestDsirSelect:
    """functions/sampling.py dsir_select — hashed-unigram importance
    log-ratio scoring (DSIR, arXiv:2302.03169)."""

    def test_target_token_scores_positive(self, spark):
        from pulsar_spark.functions.sampling import dsir_select

        # target docs say only "aaa"; raw-only docs say only "bbb":
        # the weight of the aaa bucket must be positive and bbb negative
        rows = [(i, "aaa aaa aaa", "en") for i in range(5)] + [
            (i + 5, "bbb bbb bbb", "de") for i in range(5)
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
        out = {
            r.doc_id: (r.score, r.selected)
            for r in dsir_select(docs, F.col("lang") == "en").collect()
        }
        assert all(out[i][0] > 0 and out[i][1] for i in range(5))
        assert all(out[i][0] < 0 and not out[i][1] for i in range(5, 10))

    def test_deterministic_under_repartition(self, spark):
        from pulsar_spark.functions.sampling import dsir_select

        docs = _docs(spark)
        a = sorted(
            (r.doc_id, r.score)
            for r in dsir_select(docs, F.col("lang") == "en").collect()
        )
        b = sorted(
            (r.doc_id, r.score)
            for r in dsir_select(
                docs.repartition(13), F.col("lang") == "en"
            ).collect()
        )
        assert a == b

    def test_tau_moves_selection(self, spark):
        from pulsar_spark.functions.sampling import dsir_select

        docs = _docs(spark)
        loose = dsir_select(docs, F.col("lang") == "en", tau=-10.0)
        tight = dsir_select(docs, F.col("lang") == "en", tau=10.0)
        n_loose = loose.where("selected").count()
        n_tight = tight.where("selected").count()
        assert n_loose == loose.count() and n_tight == 0


class TestBpeLearnMerges:
    """functions/text.py bpe_learn_merges — distributed BPE tokenizer
    training."""

    @staticmethod
    def _canonical(word_counts, num_merges):
        vocab = {tuple(w): c for w, c in word_counts.items()}
        out = []
        for step in range(1, num_merges + 1):
            counts = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + c
            if not counts:
                break
            (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((step, l, r, l + r, c))
            new = {}
            for syms, cnt in vocab.items():
                ns, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        ns.append(l + r)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                new[tuple(ns)] = new.get(tuple(ns), 0) + cnt
            vocab = new
        return out

    def test_matches_canonical_bpe_with_cascade(self, spark):
        from pulsar_spark.functions.text import bpe_learn_merges

        # 'lower' x4, 'lowest' x3, 'low' x2: merge 1 = (l,o); merge 2
        # = (lo,w) — a CASCADE, the merged symbol feeds the next round
        docs = spark.createDataFrame(
            [(0, "lower lower lower lower lowest lowest lowest low low")],
            "doc_id bigint, text string",
        )
        got = [tuple(r) for r in bpe_learn_merges(docs, num_merges=3).collect()]
        want = self._canonical({"lower": 4, "lowest": 3, "low": 2}, 3)
        assert got == want
        assert got[0][1:4] == ("l", "o", "lo")
        assert got[1][1:4] == ("lo", "w", "low")

    def test_matches_canonical_on_corpus(self, spark):
        from pulsar_spark.functions.text import bpe_learn_merges

        docs = _docs(spark)
        got = [tuple(r) for r in bpe_learn_merges(docs, num_merges=3).collect()]
        counts: dict = {}
        for row in docs.select("text").collect():
            for w in row.text.split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        assert got == self._canonical(counts, 3)

    def test_deterministic_under_repartition(self, spark):
        from pulsar_spark.functions.text import bpe_learn_merges

        docs = _docs(spark)
        a = [tuple(r) for r in bpe_learn_merges(docs, num_merges=2).collect()]
        b = [
            tuple(r)
            for r in bpe_learn_merges(docs.repartition(11), num_merges=2).collect()
        ]
        assert a == b

    def test_exhausted_vocab_stops_early(self, spark):
        from pulsar_spark.functions.text import bpe_learn_merges

        # single 2-char word: one merge possible, then no pairs remain
        docs = spark.createDataFrame([(0, "ab ab")], "doc_id bigint, text string")
        rows = [tuple(r) for r in bpe_learn_merges(docs, num_merges=5).collect()]
        assert rows == [(1, "a", "b", "ab", 2)]


class TestBpeEncodeCounts:
    """functions/text.py bpe_encode_counts — corpus encoding with a
    learned merge table (second half of train -> encode)."""

    def test_hand_computed_counts(self, spark):
        from pulsar_spark.functions.text import bpe_encode_counts

        # merges: (l,o) then (lo,w). 'lower' = l o w e r -> lo w e r ->
        # low e r = 3 syms; 'low' -> 1 sym; 'cat' untouched = 3 syms.
        docs = spark.createDataFrame(
            [(0, "lower low"), (1, "cat low low")],
            "doc_id bigint, text string",
        )
        rows = {
            r.doc_id: r
            for r in bpe_encode_counts(docs, [("l", "o"), ("lo", "w")]).collect()
        }
        assert rows[0].n_char_tokens == 8 and rows[0].n_bpe_tokens == 4
        assert rows[1].n_char_tokens == 9 and rows[1].n_bpe_tokens == 5
        assert rows[0].compression == round(4 / 8, 6)
        assert rows[1].compression == round(5 / 9, 6)

    def test_empty_merge_table_is_char_tokenizer(self, spark):
        from pulsar_spark.functions.text import bpe_encode_counts

        docs = spark.createDataFrame(
            [(0, "ab cde"), (1, "")], "doc_id bigint, text string"
        )
        rows = bpe_encode_counts(docs, []).collect()
        # doc 1 has no tokens and is excluded, matching training
        assert len(rows) == 1
        assert rows[0].n_char_tokens == 5 and rows[0].n_bpe_tokens == 5
        assert rows[0].compression == 1.0

    def test_roundtrip_with_learned_merges(self, spark):
        from pulsar_spark.functions.text import (
            bpe_encode_counts,
            bpe_learn_merges,
        )

        docs = _docs(spark).limit(100)
        merges = [
            (r.left_sym, r.right_sym)
            for r in bpe_learn_merges(docs, num_merges=3).collect()
        ]
        assert len(merges) == 3
        out = bpe_encode_counts(docs, merges)
        agg = out.agg(
            F.sum("n_bpe_tokens").alias("b"), F.sum("n_char_tokens").alias("c")
        ).first()
        # merges strictly compress a natural corpus, never expand it
        assert 0 < agg.b < agg.c
        assert out.where("n_bpe_tokens > n_char_tokens").count() == 0


class TestProductQuantization:
    """functions/clustering.py product_quantize / pq_topk."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        from pulsar_spark.sources import load_table

        from tests.conftest import SF_DIR

        return load_table(spark, SF_DIR, "embeddings").cache()

    def test_codes_in_range_and_one_row_per_vector(self, emb):
        from pulsar_spark.functions.clustering import product_quantize

        out = product_quantize(emb, m=4, codes=8, iters=1)
        n = emb.count()
        assert out.count() == n
        for j in range(4):
            bad = out.where(f"code_{j} < 0 OR code_{j} >= 8").count()
            assert bad == 0
        assert out.where("recon_error < 0").count() == 0

    def test_more_codes_reduce_reconstruction_error(self, emb):
        from pyspark.sql import functions as F

        from pulsar_spark.functions.clustering import product_quantize

        e8 = product_quantize(emb, m=4, codes=8, iters=1).agg(
            F.sum("recon_error")
        ).first()[0]
        e32 = product_quantize(emb, m=4, codes=32, iters=1).agg(
            F.sum("recon_error")
        ).first()[0]
        assert e32 < e8

    def test_m1_degenerates_to_kmeans(self, emb):
        from pulsar_spark.functions.clustering import (
            kmeans_fit_predict,
            product_quantize,
        )

        pq = {
            r.vec_id: (r.code_0, r.recon_error)
            for r in product_quantize(emb, m=1, codes=10, iters=2).collect()
        }
        km = {
            r.vec_id: (r.cluster, r.dist)
            for r in kmeans_fit_predict(emb, k=10, iters=2).collect()
        }
        assert pq == km

    def test_pq_topk_self_is_rank_one(self, emb):
        from pulsar_spark.functions.clustering import pq_topk

        qrow = emb.orderBy("vec_id").first()
        out = pq_topk(
            emb, [float(x) for x in qrow.embedding], k=5, m=4, codes=8, iters=1
        ).collect()
        assert [r.rank for r in out] == [1, 2, 3, 4, 5]
        # ADC distance of the query to its own codes is the global
        # minimum (per-subspace table minima), and it has the smallest id
        assert out[0].vec_id == qrow.vec_id
        dists = [r.adc_dist for r in out]
        assert dists == sorted(dists)


class TestPQStore:
    """pq_write_index / pq_topk_indexed — the materialized PQ layout."""

    def test_indexed_matches_inline_and_prunes_columns(self, spark, tmp_path):
        from pulsar_spark.functions.clustering import (
            pq_topk,
            pq_topk_indexed,
            pq_write_index,
        )
        from pulsar_spark.sources import load_table

        from tests.conftest import SF_DIR

        emb = load_table(spark, SF_DIR, "embeddings")
        q = [float(x) for x in emb.orderBy("vec_id").first().embedding]
        path = str(tmp_path / "pqidx")
        books = pq_write_index(emb, path, m=4, codes=8, iters=1)
        assert len(books) == 4 and all(len(b) == 8 for b in books)

        inline = [tuple(r) for r in pq_topk(emb, q, k=5, m=4, codes=8, iters=1).collect()]
        indexed_df = pq_topk_indexed(spark, path, q, k=5)
        indexed = [tuple(r) for r in indexed_df.collect()]
        assert indexed == inline

        # the search plan reads ONLY id + code columns from the store
        plan = indexed_df._jdf.queryExecution().executedPlan().toString()
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read and "recon_error" not in read[0]
        assert "code_0" in read[0] and "vec_id" in read[0]

    def test_store_roundtrips_codes(self, spark, tmp_path):
        from pulsar_spark.functions.clustering import (
            product_quantize,
            pq_write_index,
        )
        from pulsar_spark.sources import load_table

        from tests.conftest import SF_DIR

        emb = load_table(spark, SF_DIR, "embeddings")
        path = str(tmp_path / "pqidx2")
        pq_write_index(emb, path, m=4, codes=8, iters=1)
        stored = {
            r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
            for r in spark.read.parquet(path + "/codes").collect()
        }
        live = {
            r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
            for r in product_quantize(emb, m=4, codes=8, iters=1).collect()
        }
        assert stored == live


class TestIVFPQ:
    """ivfpq_write_index / ivfpq_topk — the composed IVFADC layout."""

    @pytest.fixture(scope="class")
    def store(self, spark, tmp_path_factory):
        from pulsar_spark.functions.clustering import ivfpq_write_index
        from pulsar_spark.sources import load_table

        from tests.conftest import SF_DIR

        emb = load_table(spark, SF_DIR, "embeddings").cache()
        path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
        centroids, books = ivfpq_write_index(
            emb, path, dim=64, n_centroids=8, ivf_iters=2, m=4, codes=8
        )
        return emb, path, centroids, books

    def test_store_layout_and_full_probe_contains_self(self, spark, store):
        from pulsar_spark.functions.clustering import ivfpq_topk

        emb, path, centroids, books = store
        assert len(centroids) == 8 and len(books) == 4
        qrow = emb.orderBy("vec_id").first()
        out = ivfpq_topk(
            spark, path, [float(x) for x in qrow.embedding], k=5, n_probe=8
        ).collect()
        assert [r.rank for r in out] == [1, 2, 3, 4, 5]
        # the query's own row survives residual quantization into top-k
        assert qrow.vec_id in {r.vec_id for r in out}
        dists = [r.adc_dist for r in out]
        assert dists == sorted(dists)

    def test_probe_prunes_partitions_and_columns(self, spark, store):
        from pulsar_spark.functions.clustering import ivfpq_topk

        emb, path, _, _ = store
        q = [float(x) for x in emb.orderBy("vec_id").first().embedding]
        df = ivfpq_topk(spark, path, q, k=5, n_probe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "centroid_id" in plan
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read and all("recon_error" not in ln for ln in read)
        # narrower probe returns a subset-quality result with k rows
        assert df.count() == 5

    def test_residual_beats_raw_reconstruction(self, spark, store):
        from pyspark.sql import functions as F

        from pulsar_spark.functions.clustering import product_quantize

        emb, path, _, _ = store
        # residual-PQ recon error (stored) vs raw-vector PQ at the same
        # code budget: centering per list must not be worse overall
        resid_err = (
            spark.read.parquet(path + "/codes").agg(F.sum("recon_error")).first()[0]
        )
        raw_err = (
            product_quantize(emb, m=4, codes=8, iters=1)
            .agg(F.sum("recon_error"))
            .first()[0]
        )
        assert resid_err < raw_err

    def test_rerank_recall_vs_exact_and_plan(self, spark, store):
        from pulsar_spark.functions.clustering import ivfpq_topk, ivfpq_topk_rerank
        from pulsar_spark.functions.similarity import cosine_topk

        emb, path, _, _ = store
        hits_rr = hits_adc = 0
        n_queries, k = 8, 5
        qrows = emb.orderBy("vec_id").limit(n_queries).collect()
        for qrow in qrows:
            q = [float(x) for x in qrow.embedding]
            exact = {r.vec_id for r in cosine_topk(emb, q, k=k).collect()}
            rr = ivfpq_topk_rerank(
                spark, path, emb, q, k=k, k_prime=60, n_probe=8
            )
            got = rr.collect()
            # exact rescoring: descending cosine, k rows, adc carried
            assert len(got) == k
            cos = [r.cosine for r in got]
            assert cos == sorted(cos, reverse=True)
            hits_rr += len(exact & {r.vec_id for r in got})
            adc = ivfpq_topk(spark, path, q, k=k, n_probe=8).collect()
            hits_adc += len(exact & {r.vec_id for r in adc})
        # the exact re-rank can only improve on raw ADC ordering, and
        # at full probe with a 12x shortlist it should be near-exact
        # (m=4 x 8-code residual PQ alone sits around 70-80% here)
        assert hits_rr >= hits_adc
        assert hits_rr >= int(0.9 * n_queries * k)

    def test_rerank_plan_broadcasts_shortlist(self, spark, store):
        from pulsar_spark.functions.clustering import ivfpq_topk_rerank

        emb, path, _, _ = store
        q = [float(x) for x in emb.orderBy("vec_id").first().embedding]
        df = ivfpq_topk_rerank(spark, path, emb, q, k=5, k_prime=20, n_probe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_rerank_rejects_bad_shortlist_size(self, spark, store):
        from pulsar_spark.functions.clustering import ivfpq_topk_rerank

        emb, path, _, _ = store
        with pytest.raises(ValueError, match="k_prime"):
            ivfpq_topk_rerank(spark, path, emb, [0.0] * 64, k=10, k_prime=5)
