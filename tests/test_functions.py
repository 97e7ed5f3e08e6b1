"""Tests for the LLM-pipeline function surface: text analysis, dedup
families (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search. LSH variants are validated against exact ground truth computed
in-Spark (recall thresholds), since approximation is the point."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestText:
    def test_token_count_matches_python(self, documents):
        from pulsar_spark.functions import token_count

        rows = documents.select("doc_id", "text", token_count(F.col("text")).alias("n")).collect()
        for r in rows[:50]:
            assert r["n"] == len([t for t in r["text"].split(" ") if t])

    def test_quality_metrics_bounds(self, documents):
        from pulsar_spark.functions import quality_metrics

        q = quality_metrics(documents)
        bad = q.where(
            (F.col("distinct_ratio") < 0) | (F.col("distinct_ratio") > 1)
            | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
            | (F.col("n_tokens") <= 0)
        )
        assert bad.count() == 0

    def test_gopher_rules_fire_individually(self, spark):
        from pulsar_spark.functions.text import gopher_rules

        ok_words = ("the is " + "word " * 60).strip()  # 62 words, 2 stopwords
        docs = spark.createDataFrame(
            [
                (0, ok_words),  # passes every rule
                (1, "the is too short"),  # <50 words
                (2, ("the is " + "# " * 60).strip()),  # symbol-heavy + non-alpha
                (3, ("xx yy " + "word " * 60).strip()),  # <2 distinct stopwords
                (4, ("the is " + "ab " * 60).strip()),  # mean word len < 3
            ],
            "doc_id bigint, text string",
        )
        rows = {r.doc_id: r for r in gopher_rules(docs).collect()}
        assert rows[0].gopher_pass
        assert not rows[1].gopher_pass and rows[1].n_words < 50
        assert not rows[2].gopher_pass
        assert rows[2].symbol_ratio >= 0.1 and rows[2].alpha_frac < 0.8
        assert not rows[3].gopher_pass and rows[3].n_stop_distinct < 2
        assert not rows[4].gopher_pass and rows[4].mean_word_len < 3.0

    def test_gopher_rules_ellipsis_counts(self, spark):
        from pulsar_spark.functions.text import gopher_rules

        docs = spark.createDataFrame(
            [(0, "... ... word here now")], "doc_id bigint, text string"
        )
        r = gopher_rules(docs).first()
        # 2 ellipses over 5 words = 0.4
        assert r.symbol_ratio == 0.4

    def test_fingerprint_stable_under_case_and_padding(self, spark):
        from pulsar_spark.functions import fingerprint

        df = spark.createDataFrame(
            [("Hello World",), ("  hello world ",), ("different",)], ["text"]
        ).select(fingerprint(F.col("text")).alias("fp"))
        fps = [r["fp"] for r in df.collect()]
        assert fps[0] == fps[1] != fps[2]


class TestDedupe:
    def test_exact_dedup_on_injected_dups(self, spark, documents):
        from pulsar_spark.functions import exact_dedup

        dup = documents.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
        with_dups = documents.unionByName(dup)
        out = exact_dedup(with_dups)
        assert out.count() == documents.count()
        # representative is the min doc_id -> originals survive
        assert out.where(F.col("doc_id") >= 100000).count() == 0

    def test_minhash_recall_against_exact_jaccard(self, documents):
        from pulsar_spark.functions import minhash_near_duplicates, ngram_jaccard_pairs

        truth = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(documents, 0.6).collect()
        }
        found = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_duplicates(documents, threshold=0.6).collect()
        }
        # LSH verification step computes exact jaccard, so no false positives
        assert found <= truth
        if truth:
            recall = len(found & truth) / len(truth)
            assert recall >= 0.8, f"recall {recall} over {len(truth)} true pairs"

    def test_mega_bucket_star_guard_preserves_clusters(self, spark):
        from pulsar_spark.functions import minhash_near_duplicates, near_dup_clusters

        # 30 identical docs -> one LSH bucket of 30. Uncapped: 435
        # pairs; capped at 5: star of 29 pairs, same single cluster.
        docs = spark.createDataFrame(
            [(i, "the same exact boilerplate text repeated here") for i in range(30)]
            + [(100, "something else entirely different words")],
            "doc_id long, text string",
        )
        full = minhash_near_duplicates(docs, threshold=0.9)
        starred = minhash_near_duplicates(docs, threshold=0.9, max_bucket_size=5)
        assert full.count() == 30 * 29 // 2
        assert starred.count() == 29  # linear, not quadratic
        clusters = near_dup_clusters(starred)
        got = {r["id"]: r["cluster_id"] for r in clusters.collect()}
        assert got == {i: 0 for i in range(30)}  # connectivity intact

    def test_simhash_star_guard(self, spark):
        from pulsar_spark.functions import simhash_near_duplicates

        docs = spark.createDataFrame(
            [(i, "the same exact boilerplate text repeated here") for i in range(20)],
            "doc_id long, text string",
        )
        full = simhash_near_duplicates(docs, max_hamming=0)
        starred = simhash_near_duplicates(docs, max_hamming=0, max_bucket_size=5)
        assert full.count() == 20 * 19 // 2
        assert starred.count() == 19  # star of the mega-bucket

    def test_near_dup_clusters_connected_components(self, spark):
        from pulsar_spark.functions import near_dup_clusters

        # components: {1,2,3,4} (chain via 2), {7,9}, singletons absent
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (7, 9)], "id_a long, id_b long"
        )
        got = {
            r["id"]: (r["cluster_id"], r["cluster_size"])
            for r in near_dup_clusters(pairs).collect()
        }
        assert got == {
            1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
            7: (7, 2), 9: (7, 2),
        }

    def test_near_dup_clusters_matches_union_find(self, spark):
        import random

        from pulsar_spark.functions import near_dup_clusters

        rng = random.Random(7)
        edges = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(45)})
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")

        parent = {v: v for e in edges for v in e}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        want_label = {v: min(u for u in parent if find(u) == find(v)) for v in parent}

        got = {r["id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()}
        assert got == want_label

    def test_dedup_keep_representatives(self, spark):
        from pulsar_spark.functions import dedup_keep_representatives

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(1, 4), (4, 5)], "id_a long, id_b long")
        kept = sorted(
            r["doc_id"] for r in dedup_keep_representatives(docs, pairs).collect()
        )
        assert kept == [0, 1, 2, 3]  # 4 and 5 fold into representative 1

    def test_simhash_identical_docs_distance_zero(self, spark):
        from pulsar_spark.functions import simhash

        df = spark.createDataFrame(
            [("a b c d e f g h",), ("a b c d e f g h",), ("x y z w v u t s",)], ["text"]
        ).select(simhash(F.col("text")).alias("h"))
        h = [r["h"] for r in df.collect()]
        assert h[0] == h[1]
        assert bin(h[0] ^ h[2]).count("1") > 10


class TestSimilarity:
    def test_cosine_topk_matches_numpy(self, embeddings):
        import numpy as np

        from pulsar_spark.functions import cosine_topk

        rows = embeddings.collect()
        vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
        q = vecs[0]
        sims = {
            i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            for i, v in vecs.items()
            if i != 0
        }
        expected = sorted(sims, key=lambda i: (-round(sims[i], 6), i))[:10]
        got = [r["vec_id"] for r in cosine_topk(embeddings, list(q), 10, exclude_id=0).collect()]
        assert got == expected

    def test_lsh_knn_recall(self, embeddings):
        from pulsar_spark.functions import cosine_all_pairs_topk, lsh_bucket_topk

        exact = {
            (r["id_a"], r["id_b"]) for r in cosine_all_pairs_topk(embeddings, k=1).collect()
        }
        approx = {
            (r["id_a"], r["id_b"])
            for r in lsh_bucket_topk(embeddings, dim=64, k=1, n_planes=4, n_tables=8).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6, f"nearest-neighbor recall {recall}"

    def test_ivf_topk_recall_vs_exact(self, embeddings):
        from pulsar_spark.functions import cosine_topk, ivf_topk

        q = list(embeddings.where("vec_id = 0").select("embedding").head()[0])
        exact = [r["vec_id"] for r in cosine_topk(embeddings, q, 10, exclude_id=0).collect()]
        approx = [
            r["vec_id"]
            for r in ivf_topk(
                embeddings, q, dim=64, k=10, n_centroids=16, n_probe=4, exclude_id=0
            ).collect()
        ]
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.5, f"IVF top-10 recall {recall}"
        # probing ALL lists must reproduce the exact result
        full = [
            r["vec_id"]
            for r in ivf_topk(
                embeddings, q, dim=64, k=10, n_centroids=16, n_probe=16, exclude_id=0
            ).collect()
        ]
        assert full == exact

    def test_ivf_assign_covers_all_rows(self, embeddings):
        from pulsar_spark.functions import ivf_assign, ivf_fit

        cents = ivf_fit(embeddings, dim=64, n_centroids=8, iters=2)
        assert cents.shape == (8, 64)
        assigned = ivf_assign(embeddings, cents)
        n = embeddings.count()
        assert assigned.where("centroid_id >= 0 AND centroid_id < 8").count() == n

    def test_embedding_near_dup_lsh_subset_of_exact(self, embeddings):
        from pulsar_spark.functions import (
            embedding_near_duplicates,
            embedding_near_duplicates_lsh,
        )

        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(embeddings, threshold=0.4).collect()
        }
        approx = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates_lsh(embeddings, dim=64, threshold=0.4).collect()
        }
        assert approx <= exact
        if exact:
            recall = len(approx) / len(exact)
            assert recall >= 0.5, f"LSH near-dup recall {recall}"

    def test_ngram_jaccard_identical_docs(self, spark):
        from pulsar_spark.functions import ngram_jaccard_pairs

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "completely different words here entirely now"),
            ],
            "doc_id int, text string",
        )
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                 ngram_jaccard_pairs(df, threshold=0.9).collect()}
        assert pairs == {(1, 2): 1.0}


    def test_ivf_indexed_store_prunes_and_matches(self, spark, embeddings, tmp_path):
        from pulsar_spark.functions import ivf_topk, ivf_topk_indexed, ivf_write_index

        path = str(tmp_path / "ivf")
        cents = ivf_write_index(embeddings, path, dim=64, n_centroids=8, iters=2)
        q = list(embeddings.where("vec_id = 0").select("embedding").head()[0])

        indexed = ivf_topk_indexed(spark, path, q, k=10, n_probe=2, exclude_id=0)
        # probe scan must prune partitions at the source, not post-filter
        from pulsar_spark.plans import partition_filters

        assert any("centroid_id" in f for f in partition_filters(indexed))

        inline = ivf_topk(
            embeddings, q, dim=64, k=10, n_centroids=8, n_probe=2,
            exclude_id=0, centroids=cents,
        )
        got = [(r["vec_id"], r["cosine"]) for r in indexed.collect()]
        want = [(r["vec_id"], r["cosine"]) for r in inline.collect()]
        assert got == want

    def test_ivf_quantized_store(self, spark, embeddings, tmp_path):
        # quantize=True composes the two scale levers: partition pruning
        # picks the lists, int8 storage quarters the bytes per list; the
        # probe auto-detects the store flavor and top-k recall vs the
        # float store stays >= 8/10
        from pulsar_spark.functions import ivf_topk_indexed, ivf_write_index
        from pulsar_spark.plans import partition_filters

        fpath, qpath = str(tmp_path / "ivf_f"), str(tmp_path / "ivf_q")
        ivf_write_index(embeddings, fpath, dim=64, n_centroids=8, iters=2)
        ivf_write_index(embeddings, qpath, dim=64, n_centroids=8, iters=2, quantize=True)
        cols = spark.read.parquet(qpath + "/vectors").columns
        assert "q_embedding" in cols and "embedding" not in cols
        q = list(embeddings.where("vec_id = 0").select("embedding").head()[0])

        qtop = ivf_topk_indexed(spark, qpath, q, k=10, n_probe=2, exclude_id=0)
        assert any("centroid_id" in f for f in partition_filters(qtop))
        ftop = ivf_topk_indexed(spark, fpath, q, k=10, n_probe=2, exclude_id=0)
        fids = {r["vec_id"] for r in ftop.collect()}
        qids = {r["vec_id"] for r in qtop.collect()}
        assert len(fids & qids) >= 8


class TestBpeAndRollingHash:
    def test_bpe_tokenize_splits_contractions_and_runs(self, spark):
        from pulsar_spark.functions import bpe_tokenize
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("It's 2024, v2.0-beta!",)], "t string")
        toks = df.select(bpe_tokenize(F.col("t")).alias("x")).head()["x"]
        assert toks == ["It", "'s", "2024", ",", "v", "2", ".", "0", "-", "beta", "!"]

    def test_rolling_fingerprint_order_sensitive(self, spark):
        from pulsar_spark.functions import rolling_fingerprint
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("ab",), ("ba",), ("",), ("ab",)], "t string")
        vals = [r["h"] for r in df.select(rolling_fingerprint(F.col("t")).alias("h")).collect()]
        assert vals[0] != vals[1]  # order-sensitive, unlike set hashing
        assert vals[2] == 0
        assert vals[0] == vals[3]  # deterministic
        # matches the arithmetic definition
        assert vals[0] == (ord("a") * 31 + ord("b")) % 1_000_000_007


class TestSampling:
    """functions/sampling.py — deterministic hash sampling + domain mix."""

    def test_hash_sample_stable_under_repartition(self, documents):
        from pulsar_spark.functions import hash_sample

        base = {r.doc_id for r in hash_sample(documents, 0.25, seed=42).collect()}
        rep = {
            r.doc_id
            for r in hash_sample(documents.repartition(13), 0.25, seed=42).collect()
        }
        assert base == rep  # unlike df.sample(), partitioning-independent
        n = documents.count()
        assert 0.15 * n < len(base) < 0.35 * n  # ~Bernoulli(0.25)

    def test_hash_sample_seed_changes_selection(self, documents):
        from pulsar_spark.functions import hash_sample

        a = {r.doc_id for r in hash_sample(documents, 0.25, seed=1).collect()}
        b = {r.doc_id for r in hash_sample(documents, 0.25, seed=2).collect()}
        assert a != b

    def test_domain_mix_shifts_composition(self, spark, documents):
        from pyspark.sql import functions as F

        from pulsar_spark.functions import domain_mix

        n = documents.count()
        mixed = domain_mix(
            documents, weights={"src0": 8.0}, total_rows=n // 2, seed=3
        )
        rates = {
            r["source"]: r["rate"]
            for r in mixed.groupBy("source")
            .count()
            .join(documents.groupBy("source").agg(F.count("*").alias("tot")), "source")
            .selectExpr("source", "count / tot AS rate")
            .collect()
        }
        # the over-weighted source keeps (nearly) everything; the
        # default-weight sources are sampled well below it
        others = [v for k, v in rates.items() if k != "src0"]
        assert rates["src0"] > max(others)

    def test_domain_mix_rate_caps_at_one(self, documents):
        from pulsar_spark.functions import domain_mix

        n = documents.count()
        # budget >> corpus: every row survives (no upsampling)
        assert domain_mix(documents, weights={}, total_rows=n * 10).count() == n

    def test_domain_mix_fractional_weights_scale_invariant(self, documents):
        # micro-unit quantization makes fractional weights exact:
        # {0.1, 0.3} must select the SAME rows as {1.0, 3.0} (only the
        # weight RATIOS matter). With plain double sums 0.1/0.4 !=
        # 1.0/4.0 in the last ulp and boundary keys could flip.
        from pulsar_spark.functions import domain_mix

        kw = dict(total_rows=200, seed=5, default_weight=0.2)
        a = {
            r.doc_id
            for r in domain_mix(
                documents, weights={"src0": 0.1, "src1": 0.3}, **kw
            ).collect()
        }
        kw2 = dict(total_rows=200, seed=5, default_weight=2.0)
        b = {
            r.doc_id
            for r in domain_mix(
                documents, weights={"src0": 1.0, "src1": 3.0}, **kw2
            ).collect()
        }
        assert a == b and len(a) > 0

    def test_domain_mix_negative_weight_rejected(self, documents):
        import pytest as _pytest

        from pulsar_spark.functions import domain_mix

        with _pytest.raises(ValueError):
            domain_mix(documents, weights={"src0": -1.0}, total_rows=100).count()
        # a tiny negative that would quantize to 0 must be caught too
        with _pytest.raises(ValueError):
            domain_mix(
                documents, weights={"src0": -1e-7}, total_rows=100
            ).count()

    def test_domain_mix_all_zero_quantized_weights_rejected(self, documents):
        import pytest as _pytest

        from pulsar_spark.functions import domain_mix

        # every weight below the 1e-6 quantum -> no mixture exists at the
        # supported precision; must raise, not divide by zero
        with _pytest.raises(ValueError, match="quantize to zero"):
            domain_mix(
                documents, weights={}, total_rows=100, default_weight=1e-7
            ).count()

    def test_mixture_schedule_phases_independent(self, documents):
        from pulsar_spark.functions import mixture_schedule

        out = mixture_schedule(
            documents,
            phases=[
                {"name": "pre", "temperature": 2.0, "total_rows": 300, "seed": 23},
                {"name": "anneal", "temperature": 1.0, "total_rows": 100, "seed": 29},
            ],
        )
        rows = out.collect()
        by_phase = {}
        for r in rows:
            by_phase.setdefault(r.phase, set()).add(r.doc_id)
        assert set(by_phase) == {"pre", "anneal"}
        # distinct seeds -> the anneal is NOT just a head-subset of the
        # pretraining selection (the degeneracy the seed check prevents)
        assert not by_phase["anneal"] <= by_phase["pre"]
        assert len(by_phase["anneal"]) < len(by_phase["pre"])

    def test_mixture_schedule_rejects_shared_seeds(self, documents):
        import pytest as _pytest

        from pulsar_spark.functions import mixture_schedule

        with _pytest.raises(ValueError, match="distinct"):
            mixture_schedule(
                documents,
                phases=[
                    {"name": "a", "temperature": 2.0, "total_rows": 100, "seed": 1},
                    {"name": "b", "temperature": 1.0, "total_rows": 50, "seed": 1},
                ],
            )

    def test_temperature_mix_flattens_toward_uniform(self, spark):
        from pulsar_spark.functions import temperature_mix

        # 9:1 skewed corpus — the sf tables have uniform sources, which
        # would make temperature a no-op
        tot = {"big": 1800, "small": 200}
        rows = [(i, "big" if i < 1800 else "small") for i in range(2000)]
        docs = spark.createDataFrame(rows, "doc_id bigint, source string")
        budget = 600

        def mix_share(t):
            out = temperature_mix(docs, temperature=t, total_rows=budget, seed=5)
            c = {
                r["source"]: r["count"]
                for r in out.groupBy("source").count().collect()
            }
            n = sum(c.values())
            return c.get("small", 0) / n, c.get("big", 0) / n

        nat_min = tot["small"] / 2000
        min_t1, _ = mix_share(1.0)
        min_t8, maj_t8 = mix_share(8.0)
        # T=1 ~ natural share; high T boosts the minority toward uniform
        assert abs(min_t1 - nat_min) < 0.05
        assert min_t8 > min_t1 + 0.1
        assert maj_t8 < tot["big"] / 2000

    def test_temperature_mix_stable_under_repartition(self, documents):
        from pulsar_spark.functions import temperature_mix

        a = {
            r.doc_id
            for r in temperature_mix(
                documents, temperature=2.0, total_rows=200, seed=9
            ).collect()
        }
        b = {
            r.doc_id
            for r in temperature_mix(
                documents.repartition(17), temperature=2.0, total_rows=200, seed=9
            ).collect()
        }
        assert a == b and 100 < len(a) < 300

    def test_deterministic_shuffle_is_a_stable_permutation(self, documents):
        from pulsar_spark.functions import deterministic_shuffle

        out = deterministic_shuffle(documents, seed=7, num_shards=16)
        rows = out.select("doc_id", "shard", "position").collect()
        n = documents.count()
        # a permutation: every row exactly once, (shard, position) unique
        assert len(rows) == n
        assert len({(r.shard, r.position) for r in rows}) == n
        # positions dense per shard starting at 0
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.position)
        for ps in by_shard.values():
            assert sorted(ps) == list(range(len(ps)))
        # spread: most shards populated, none dominates wildly
        assert len(by_shard) >= 12
        # stability under repartitioning (the df.sample() failure mode)
        rep = {
            (r.doc_id, r.shard, r.position)
            for r in deterministic_shuffle(
                documents.repartition(13), seed=7, num_shards=16
            ).collect()
        }
        assert rep == {(r.doc_id, r.shard, r.position) for r in rows}
        # a different seed is a different permutation
        other = {
            (r.doc_id, r.shard, r.position)
            for r in deterministic_shuffle(documents, seed=8, num_shards=16).collect()
        }
        assert other != rep


class TestChunking:
    """operators/chunking.py — split/reassemble round trip."""

    def test_round_trip_is_lossless(self, documents):
        from pyspark.sql import functions as F

        from pulsar_spark.operators.chunking import assemble_chunks, split_into_chunks

        chunks = split_into_chunks(
            documents, payload_col="text", id_col="doc_id", chunk_size=37
        )
        # adversarial delivery order: scramble chunk rows across
        # partitions before reassembly (ConsumerImpl buffers unordered
        # chunks too)
        scrambled = chunks.repartition(11).sortWithinPartitions(F.md5(F.col("chunk")))
        out = assemble_chunks(scrambled).withColumnRenamed("payload", "text2")
        joined = documents.join(out, "doc_id")
        assert joined.where("text != text2").count() == 0
        assert joined.where(
            "n_chunks != cast(ceil(length(text) / 37.0) AS INT)"
        ).count() == 0


class TestPiiRedaction:
    def test_redact_pii_scrubs_all_shapes(self, spark):
        from pyspark.sql import functions as F

        from pulsar_spark.functions import redact_pii

        df = spark.createDataFrame(
            [
                ("mail bob.smith+x@corp.example.co early", "mail [EMAIL] early"),
                ("host 192.168.001.255 up", "host [IP] up"),
                ("call 555-0199 now", "call [PHONE] now"),
                ("a@b.io 10.0.0.1 555-1234", "[EMAIL] [IP] [PHONE]"),
                ("no pii here", "no pii here"),
            ],
            "raw STRING, want STRING",
        )
        bad = df.withColumn("got", redact_pii(F.col("raw"))).where("got != want")
        assert bad.count() == 0


class TestPacking:
    """functions/packing.py — streaming-fill sequence packing."""

    def test_bins_fill_contiguously_per_shard(self, spark):
        from pulsar_spark.functions import pack_sequences

        rows = [(i, "s", "w " * 10) for i in range(10)]  # 10 tokens each
        docs = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")
        got = {
            r.doc_id: (r.start_token, r.bin_id)
            for r in pack_sequences(docs, seq_len=25).collect()
        }
        # doc i starts at 10*i; bin = floor(start/25)
        assert got == {i: (10 * i, (10 * i) // 25) for i in range(10)}

    def test_shards_pack_independently(self, documents):
        from pyspark.sql import functions as F

        from pulsar_spark.functions import pack_sequences

        packed = pack_sequences(documents, seq_len=512)
        # every shard's first doc starts at token 0
        firsts = (
            packed.groupBy("source").agg(F.min("start_token").alias("st")).collect()
        )
        assert all(r.st == 0 for r in firsts)
        # start_token is the cumsum of preceding docs (spot-check ordering)
        bad = packed.where("start_token < 0 OR bin_id < 0").count()
        assert bad == 0


class TestContamination:
    def test_flags_only_docs_sharing_benchmark_grams(self, spark):
        from pulsar_spark.functions import contamination_check

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id INT, text STRING",
        )
        corpus = spark.createDataFrame(
            [
                (1, "x alpha beta gamma delta epsilon y"),  # shares a 5-gram
                (2, "totally different words here now ok"),  # clean
                (3, "too short"),  # < 5 grams -> absent
            ],
            "doc_id INT, text STRING",
        )
        got = {r.doc_id: (r.n_hits, r.contaminated) for r in
               contamination_check(corpus, bench, n=5).collect()}
        assert got[1][1] is True and got[1][0] >= 1
        assert got[2] == (0, False)
        assert 3 not in got


class TestChunkDedupAndSourceCap:
    def test_chunk_dedup_removes_shared_chunks(self, spark):
        from pulsar_spark.functions import remove_duplicated_chunks

        # chunk size 3: docs 1 and 2 share their first chunk verbatim;
        # each has a unique tail chunk
        docs = spark.createDataFrame(
            [
                (1, "the same shared head unique tail one"),
                (2, "the same shared head unique tail two"),
                (3, "completely different words here now friend"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in remove_duplicated_chunks(docs, chunk_words=3).collect()}
        # chunks [the same shared] and [head unique tail] occur in both
        # docs 1 and 2 -> removed from both; only the tails survive
        assert out[1]["text"] == "one"
        assert out[2]["text"] == "two"
        assert out[1]["n_removed"] == 2 and out[1]["n_chunks"] == 3
        # doc 3 untouched
        assert out[3]["text"] == "completely different words here now friend"
        assert out[3]["n_removed"] == 0

    def test_chunk_dedup_can_empty_a_doc(self, spark):
        from pulsar_spark.functions import remove_duplicated_chunks

        docs = spark.createDataFrame(
            [(1, "exact copy text"), (2, "exact copy text")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in remove_duplicated_chunks(docs, chunk_words=3).collect()}
        assert out[1]["text"] == "" and out[2]["text"] == ""
        assert out[1]["n_removed"] == 1
        # both input docs still present (caller decides on empties)
        assert set(out) == {1, 2}

    def test_chunk_order_preserved_on_reassembly(self, spark):
        from pulsar_spark.functions import remove_duplicated_chunks

        # doc 1: [shared][u1][shared2][u2]; chunks 1 and 3 duplicated
        # via docs 2/3 -> survivors u1, u2 must keep original order
        docs = spark.createDataFrame(
            [
                (1, "a a a first unique gap b b b second unique tip"),
                (2, "a a a x y z"),
                (3, "b b b q w e"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["text"] for r in remove_duplicated_chunks(docs, chunk_words=3).collect()}
        assert out[1] == "first unique gap second unique tip"

    def test_per_group_cap(self, spark):
        from pulsar_spark.functions import per_group_cap

        df = spark.createDataFrame(
            [(i, "s" + str(i % 2), i * 10) for i in range(10)],
            "doc_id long, source string, n_chars long",
        )
        out = per_group_cap(df, "source", cap=2, order_col="n_chars", tiebreak_col="doc_id")
        got = {(r["source"], r["doc_id"]) for r in out.collect()}
        # top-2 by n_chars within each source
        assert got == {("s0", 8), ("s0", 6), ("s1", 9), ("s1", 7)}

    def test_per_group_cap_deterministic_ties(self, spark):
        from pulsar_spark.functions import per_group_cap

        df = spark.createDataFrame(
            [(i, "s", 100) for i in range(5)], "doc_id long, source string, n_chars long"
        )
        out = per_group_cap(df, "source", cap=3, order_col="n_chars")
        assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2]


class TestSketchStats:
    """functions/text.py HLL sketch distinct counts — approximate but
    bounded error, and mergeable without re-scanning."""

    def test_estimates_within_tolerance_of_exact(self, spark, documents):
        from pyspark.sql import functions as F

        from pulsar_spark.functions import sketch_token_stats, tokenize

        got = {
            r.source: (r.total_tokens, r.approx_distinct_tokens)
            for r in sketch_token_stats(documents, group_col="source").collect()
        }
        toks = documents.select(
            "source", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        exact = {
            r.source: (r.total, r.distinct)
            for r in toks.groupBy("source")
            .agg(
                F.count("*").alias("total"),
                F.countDistinct("tok").alias("distinct"),
            )
            .collect()
        }
        assert set(got) == set(exact)
        for src, (total, approx) in got.items():
            assert total == exact[src][0]  # totals are exact
            rel = abs(approx - exact[src][1]) / max(exact[src][1], 1)
            assert rel < 0.05, f"{src}: approx {approx} vs exact {exact[src][1]}"

    def test_union_rolls_up_without_rescan(self, spark, documents):
        from pyspark.sql import functions as F

        from pulsar_spark.functions import (
            sketch_token_stats,
            sketch_union_distinct,
            tokenize,
        )

        per_group = sketch_token_stats(documents, group_col="source")
        total = sketch_union_distinct(per_group).collect()[0][0]
        exact = (
            documents.select(F.explode(tokenize(F.col("text"))).alias("tok"))
            .agg(F.countDistinct("tok"))
            .collect()[0][0]
        )
        assert abs(total - exact) / exact < 0.05
        # union of per-group sketches >= any single group's estimate
        mx = max(
            r.approx_distinct_tokens for r in per_group.collect()
        )
        assert total >= mx


class TestPackMaterialize:
    def test_blobs_reconstruct_plan_order(self, documents):
        from pulsar_spark.functions import materialize_packed_shards, pack_sequences

        plan = pack_sequences(documents, seq_len=512).collect()
        blobs = materialize_packed_shards(documents, seq_len=512, separator="|SEP|")
        got = {
            (r.source, r.bin_id): r.shard_text.split("|SEP|")
            for r in blobs.collect()
        }
        want: dict[tuple, list] = {}
        for r in sorted(plan, key=lambda r: (r.source, r.bin_id, r.start_token)):
            want.setdefault((r.source, r.bin_id), []).append(r.text)
        assert got == want
        # totals line up with the manifest
        stats = {
            (r.source, r.bin_id): (r.n_docs, r.sum_tokens) for r in blobs.collect()
        }
        for key, texts in want.items():
            assert stats[key][0] == len(texts)


class TestPerplexity:
    """functions/text.py unigram LM scoring — the CCNet quality proxy."""

    def test_rare_vocab_scores_worse_than_common(self, spark, documents):
        from pulsar_spark.functions import perplexity_scores, unigram_model

        model = unigram_model(documents, max_vocab=500)
        probe = spark.createDataFrame(
            [
                (1_000_001, "the and of to in is it the and of"),
                (1_000_002, "zqxj vproth klmnop wxyzab qrstuv hjklzx"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.nll for r in perplexity_scores(probe, model=model).collect()}
        # pure-stopword text is far more likely under the corpus LM
        # than pure-OOV garbage
        assert got[1_000_001] < got[1_000_002]

    def test_min_count_path_has_no_global_sort(self, spark, documents):
        from pulsar_spark.functions import unigram_model

        plan = (
            unigram_model(documents, min_count=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Sort [" in line:
                assert ", false, 0" in line, f"global sort in plan: {line.strip()}"

    def test_scores_deterministic_under_repartition(self, spark, documents):
        from pulsar_spark.functions import perplexity_scores

        a = {r.doc_id: r.nll for r in perplexity_scores(documents, max_vocab=500).collect()}
        b = {
            r.doc_id: r.nll
            for r in perplexity_scores(documents.repartition(13), max_vocab=500).collect()
        }
        assert a == b

    def test_empty_docs_kept_with_null_score(self, spark, documents):
        from pulsar_spark.functions import perplexity_scores, unigram_model

        model = unigram_model(documents, max_vocab=500)
        probe = spark.createDataFrame(
            [(1, "the and of"), (2, ""), (3, "   ")], "doc_id long, text string"
        )
        rows = {r.doc_id: (r.nll, r.n_tokens) for r in perplexity_scores(probe, model=model).collect()}
        assert set(rows) == {1, 2, 3}  # empties present, not dropped
        assert rows[2] == (None, 0) and rows[3] == (None, 0)
        assert rows[1][0] is not None and rows[1][1] == 3

    def test_oov_is_true_count_zero_probability(self, spark, documents):
        import math

        from pyspark.sql import functions as F

        from pulsar_spark.functions import perplexity_scores, tokenize, unigram_model

        model = unigram_model(documents, max_vocab=500)
        oov = model.select(F.max("oov_logprob")).collect()[0][0]
        toks = documents.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        total = toks.count()
        v = toks.distinct().count()
        assert oov == round(math.log(0.5 / (total + 0.5 * (v + 1))), 6)
        # a pure-OOV doc's nll is exactly -oov
        probe = spark.createDataFrame([(9, "zzqqxxjj wwvvkk")], "doc_id long, text string")
        nll = perplexity_scores(probe, model=model).collect()[0].nll
        assert abs(nll - (-oov)) < 1e-6


class TestIncrementalDedup:
    """Rolling-crawl dedup vs the all-time fingerprint store."""

    def test_cross_batch_dedup_via_store(self, spark, documents, tmp_path):
        from pulsar_spark.functions import incremental_exact_dedup

        store = str(tmp_path / "fps")
        b1 = documents.limit(200)
        out1 = incremental_exact_dedup(b1, store)
        n1 = out1.count()
        assert 0 < n1 <= 200

        # batch 2 = 100 repeats of batch 1 (new ids) + 100 fresh docs
        repeats = b1.limit(100).withColumn("doc_id", F.col("doc_id") + 1_000_000)
        fresh = documents.orderBy(F.col("doc_id").desc()).limit(100)
        out2 = incremental_exact_dedup(repeats.unionByName(fresh), store)
        got = {r.doc_id for r in out2.select("doc_id").collect()}
        assert not {d for d in got if d >= 1_000_000}, "historical repeats survived"
        # the fresh docs survive (unless their text collides with batch 1)
        fresh_ids = {r.doc_id for r in fresh.select("doc_id").collect()}
        assert got <= fresh_ids and len(got) > 0

        # a third replay of everything is fully suppressed
        out3 = incremental_exact_dedup(
            repeats.unionByName(fresh).withColumn("doc_id", F.col("doc_id") + 2_000_000),
            store,
        )
        assert out3.count() == 0

    def test_dry_run_leaves_store_untouched(self, spark, documents, tmp_path):
        from pulsar_spark.functions import incremental_exact_dedup

        store = str(tmp_path / "fps")
        incremental_exact_dedup(documents.limit(50), store)
        n_before = spark.read.parquet(store).count()
        out = incremental_exact_dedup(
            documents.limit(120).withColumn("doc_id", F.col("doc_id") + 5_000_000),
            store,
            update_store=False,
        )
        assert out.count() > 0  # docs 50..119 pass the filter
        assert spark.read.parquet(store).count() == n_before

    def test_null_text_dedupes_and_two_phase_commit(self, spark, tmp_path):
        from pulsar_spark.functions import commit_fingerprints, incremental_exact_dedup

        store = str(tmp_path / "fps2")
        b1 = spark.createDataFrame(
            [(1, None), (2, "hello world"), (3, None)], "doc_id long, text string"
        )
        out1 = incremental_exact_dedup(b1, store)
        assert out1.count() == 2  # null-text rows collapse within batch
        # a later batch's null-text doc matches the stored fingerprint
        b2 = spark.createDataFrame([(10, None), (11, "fresh")], "doc_id long, text string")
        out2 = incremental_exact_dedup(b2, store)
        assert [r.doc_id for r in out2.collect()] == [11]

        # two-phase flow: filter only, persist downstream, then commit
        b3 = spark.createDataFrame([(20, "late commit")], "doc_id long, text string")
        out3 = incremental_exact_dedup(b3, store, update_store=False)
        assert out3.count() == 1
        # not committed yet: a replay still passes the filter
        assert incremental_exact_dedup(b3, store, update_store=False).count() == 1
        commit_fingerprints(out3, store)
        assert incremental_exact_dedup(b3, store, update_store=False).count() == 0


class TestRandomizedReferenceChecks:
    """Randomized (fixed-seed) corpora checked row-for-row against pure
    Python reference implementations — one Spark job per test, many
    generated cases inside it."""

    def test_remove_duplicated_spans_match_python_reference(self, spark):
        import random

        from pulsar_spark.functions import remove_duplicated_spans

        rng = random.Random(20260816)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        shared = " ".join(rng.choice(vocab) for _ in range(8))  # a planted dup span
        for i in range(120):
            m = rng.choice([0, 2, 4, 5, 6, 20, rng.randint(1, 40)])
            body = " ".join(rng.choice(vocab) for _ in range(m))
            if i % 3 == 0:  # plant the shared span into every third doc
                body = f"{body} {shared}".strip()
            docs.append((i, body))
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {r.doc_id: r for r in remove_duplicated_spans(df, n=5).collect()}

        # pure-Python reference
        n = 5
        toks = {i: [w for w in t.split(" ") if w] for i, t in docs}
        gram_docs: dict[tuple, set] = {}
        for i, ws in toks.items():
            for p in range(len(ws) - n + 1):
                gram_docs.setdefault(tuple(ws[p : p + n]), set()).add(i)
        for i, ws in toks.items():
            covered = set()
            for p in range(len(ws) - n + 1):
                if len(gram_docs[tuple(ws[p : p + n])]) > 1:
                    covered.update(range(p, p + n))
            kept = [w for j, w in enumerate(ws) if j not in covered]
            r = got[i]
            assert r.text_clean == " ".join(kept), i
            assert r.n_tokens_before == len(ws), i
            assert r.n_tokens_removed == len(ws) - len(kept), i
        # the planted span is gone everywhere it was shared
        planted = [i for i in toks if i % 3 == 0 and len(toks[i]) >= 8]
        assert sum(got[i].n_tokens_removed for i in planted) >= 8 * (len(planted) - 1)

    def test_gopher_rules_match_python_reference(self, spark):
        import random

        from pulsar_spark.functions.text import STOPWORDS, gopher_rules

        rng = random.Random(20260815)
        vocab = ["word", "ab", "x", "longishtoken", "the", "a", "of", "#", "...",
                 "99", "mixed9", "zz#zz"]
        docs = []
        for i in range(300):
            n = rng.choice([0, 3, 49, 50, 51, 120, rng.randint(1, 200)])
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {r.doc_id: r for r in gopher_rules(df).collect()}
        # empty docs are dropped (no denominators), never crash the job
        assert set(got) == {i for i, t in docs if [w for w in t.split(" ") if w]}

        for doc_id, text in docs:
            words = [w for w in text.split(" ") if w]
            if not words:
                continue  # dropped row, asserted above
            n = len(words)
            mean_len = round(sum(len(w) for w in words) / n, 6)
            alpha = round(sum(1 for w in words if any(c.isalpha() and c.isascii() for c in w)) / n, 6)
            n_hash = text.count("#")
            n_ell = text.count("...")
            symbol = round((n_hash + n_ell) / n, 6)
            n_stop = len(set(words) & set(STOPWORDS))
            expect_pass = (
                50 <= n <= 100_000
                and 3.0 <= mean_len <= 10.0
                and symbol < 0.1
                and alpha >= 0.8
                and n_stop >= 2
            )
            r = got[doc_id]
            assert r.n_words == n
            assert r.mean_word_len == mean_len
            assert r.alpha_frac == alpha
            assert r.symbol_ratio == symbol
            assert r.n_stop_distinct == n_stop
            assert r.gopher_pass == expect_pass, (doc_id, text)

    def test_temperature_mix_matches_python_reference(self, spark):
        import hashlib
        import math
        import random

        from pulsar_spark.functions import temperature_mix

        rng = random.Random(7)
        sources = {"s0": 900, "s1": 300, "s2": 60, "s3": 7}
        rows, i = [], 0
        for src, cnt in sources.items():
            for _ in range(cnt):
                rows.append((i, src))
                i += 1
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "doc_id bigint, source string")
        total, seed = 400, 23
        got = {r.doc_id for r in temperature_mix(df, 2.0, total, seed=seed).collect()}

        # independent reference: same rate math + md5 hash, pure python
        n = sum(sources.values())
        pu = {g: math.floor(math.sqrt(c / n) * 1e6 + 0.5) for g, c in sources.items()}
        psum = sum(pu.values())
        rate = {g: min(1.0, (pu[g] / psum * float(total)) / sources[g]) for g in sources}
        expect = set()
        for doc_id, src in rows:
            h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
            if int(h[:8], 16) / 4294967296.0 < rate[src]:
                expect.add(doc_id)
        assert got == expect

    def test_bpe_encode_matches_python_reference(self, spark):
        import random

        from pulsar_spark.functions.text import (
            BPE_SEP,
            bpe_encode_counts,
            bpe_learn_merges,
        )

        rng = random.Random(99)
        vocab = ["low", "lower", "lowest", "new", "newer", "wide", "ab", "a"]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(150)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        merges = [
            (r.left_sym, r.right_sym)
            for r in bpe_learn_merges(df, num_merges=4).collect()
        ]
        got = {r.doc_id: r for r in bpe_encode_counts(df, merges).collect()}

        def ref(text):
            words = [w for w in text.split(" ") if w and BPE_SEP not in w]
            nchar, nbpe = 0, 0
            for w in words:
                nchar += len(w)
                s = BPE_SEP + BPE_SEP.join(w) + BPE_SEP
                for l, r in merges:
                    pat = BPE_SEP + l + BPE_SEP + r + BPE_SEP
                    rep = BPE_SEP + l + r + BPE_SEP
                    s = s.replace(pat, rep).replace(pat, rep)
                nbpe += len([x for x in s.split(BPE_SEP) if x])
            return nchar, nbpe

        for doc_id, text in docs:
            nchar, nbpe = ref(text)
            assert got[doc_id].n_char_tokens == nchar, (doc_id, text)
            assert got[doc_id].n_bpe_tokens == nbpe, (doc_id, text)
            assert got[doc_id].compression == round(nbpe / nchar, 6)
