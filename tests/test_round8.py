"""Round 8: replicator hardening (one-hop, pre-created destinations,
torn-write replay, lane-sort plan shape) and banding completeness."""
import os

import pytest
from pyspark.sql import functions as F


class TestReplicatorOneHop:
    def _produce_local(self, spark, topic, ids, origin=None):
        from pulsar_spark.sources.topics import create_topic, produce

        rows = spark.createDataFrame(
            [(str(i), i, origin) for i in ids],
            "key string, event_id bigint, replicated_from string",
        )
        if not os.path.isdir(topic):
            create_topic(topic, 2)
        produce(rows, topic, key_col="key")

    def test_three_cluster_mesh_no_double_delivery(self, spark, tmp_path):
        """A->B->C plus A->C (the full-mesh deployment): C must get A's
        rows exactly once, via the DIRECT path only — B's replicator
        must not forward A-origin rows (one-hop,
        GeoPersistentReplicator.java:207)."""
        from pulsar_spark.streaming.replication import replicate_batch

        a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
        self._produce_local(spark, a, range(10))
        self._produce_local(spark, b, range(100, 105))
        # A -> B, then B -> C (forwards ONLY B-local rows), then A -> C
        replicate_batch(spark.read.parquet(a), b, "A", "B")
        replicate_batch(spark.read.parquet(b), c, "B", "C")
        replicate_batch(spark.read.parquet(a), c, "A", "C")
        out = spark.read.parquet(c)
        assert out.where("replicated_from = 'A'").count() == 10
        assert out.where("replicated_from = 'B'").count() == 5
        assert out.count() == 15
        # replaying every leg converges (presence dedup)
        replicate_batch(spark.read.parquet(b), c, "B", "C")
        replicate_batch(spark.read.parquet(a), c, "A", "C")
        assert spark.read.parquet(c).count() == 15

    def test_precreated_empty_destination(self, spark, tmp_path):
        """A destination pre-created via create_topic holds only
        _topic.json — the watermark read must treat it like a missing
        destination, not crash the first epoch."""
        from pulsar_spark.sources.topics import create_topic
        from pulsar_spark.streaming.replication import (
            replicate_batch,
            replicated_high_watermarks,
        )

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        self._produce_local(spark, src, range(6))
        create_topic(dst, 2)
        assert replicated_high_watermarks(spark, dst) == {}
        replicate_batch(spark.read.parquet(src), dst, "east", "west")
        assert spark.read.parquet(dst).where(
            "replicated_from = 'east'"
        ).count() == 6

    def test_torn_remote_write_replay_backfills(self, spark, tmp_path):
        """If a failed epoch left only the HIGHER offsets of a source
        partition visible at the remote, the replay must still forward
        the missing lower ones — presence dedup, not a MAX watermark
        (which would skip them forever)."""
        from pulsar_spark.streaming.replication import replicate_batch

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        self._produce_local(spark, src, range(12))
        batch = spark.read.parquet(src)
        # simulate the torn write: only offsets >= 3 of each source
        # partition made it to the remote
        replicate_batch(batch.where("offset >= 3"), dst, "east", "west")
        partial = spark.read.parquet(dst)
        assert partial.where("src_offset < 3").count() == 0
        n_partial = partial.count()
        # full replay: the lost lower offsets land, nothing duplicates
        replicate_batch(batch, dst, "east", "west")
        out = spark.read.parquet(dst)
        assert out.count() == 12
        assert out.where("src_offset < 3").count() == 12 - n_partial
        assert (
            out.groupBy("replicated_from", "src_partition", "src_offset")
            .count()
            .where("count > 1")
            .count()
            == 0
        )

    def test_payload_plan_has_no_global_sort(self, spark, tmp_path):
        """The per-batch ordering is per-source-partition lanes:
        hash repartition + sortWithinPartitions, never a range
        exchange (a global sort would serialize every replay epoch)."""
        from pulsar_spark.streaming.replication import _prepare_payload

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        self._produce_local(spark, src, range(8))
        payload = _prepare_payload(
            spark.read.parquet(src), dst, "east", "west"
        )
        plan = payload._jdf.queryExecution().toString().lower()
        assert "rangepartitioning" not in plan
        assert "hashpartitioning(src_partition" in plan

    def test_replicate_to_restriction_flows_through_batch(self, spark, tmp_path):
        """A replicate_to list on the envelope gates the forward per
        message (GeoPersistentReplicator.java:216)."""
        from pulsar_spark.sources.topics import create_topic, produce
        from pulsar_spark.streaming.replication import replicate_batch

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        create_topic(src, 2)
        rows = spark.createDataFrame(
            [(str(i), i, ["west"] if i % 2 == 0 else None) for i in range(10)],
            "key string, event_id bigint, replicate_to array<string>",
        )
        produce(rows, src, key_col="key")
        replicate_batch(spark.read.parquet(src), dst, "east", "north")
        # only the unrestricted (NULL-list) half reaches 'north'
        out = spark.read.parquet(dst)
        assert out.count() == 5
        assert out.where("event_id % 2 = 0").count() == 0


class TestPhashBanding:
    def test_eight_bands_complete_to_distance_seven(self, spark):
        """Adversarial spread: 7 flipped bits placed one per 8-bit band
        (defeats 4x16 banding's guarantee range) must still pair under
        n_bands=8 — pigeonhole leaves one agreeing band."""
        from pulsar_spark.functions.phash import phash_near_dups

        base = 0x123456789ABCDEF0
        # flip the low bit of 7 DIFFERENT 8-bit bands
        spread = base
        for i in range(7):
            spread ^= 1 << (8 * i)
        df = spark.createDataFrame(
            [(1, base), (2, spread)], "media_id bigint, phash long"
        )
        got = phash_near_dups(df, max_hamming=7, n_bands=8).collect()
        assert [(r.media_id_a, r.media_id_b, r.hamming) for r in got] == [(1, 2, 7)]

    def test_default_banding_warns_past_completeness_bound(self, spark):
        import warnings

        from pulsar_spark.functions.phash import phash_near_dups

        df = spark.createDataFrame([(1, 7)], "media_id bigint, phash long")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            phash_near_dups(df, max_hamming=6)  # default 4 bands
            assert any("completeness" in str(x.message) for x in w)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            phash_near_dups(df, max_hamming=3)
            phash_near_dups(df, max_hamming=6, n_bands=8)
            assert not w

    def test_bad_band_count_rejected(self, spark):
        from pulsar_spark.functions.phash import phash_near_dups

        df = spark.createDataFrame([(1, 7)], "media_id bigint, phash long")
        with pytest.raises(ValueError):
            phash_near_dups(df, n_bands=3)


def _mk_scalable(spark, tmp_path, name="t", n_segments=2, n_rows=100):
    from pulsar_spark.sources.scalable import (
        create_scalable_topic,
        produce_scalable,
    )

    d = str(tmp_path / name)
    create_scalable_topic(d, num_initial_segments=n_segments)
    payload = spark.range(n_rows).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    produce_scalable(payload, d, key_col="k", deterministic_mod=True)
    return d


class TestDeleteScalableTopic:
    def test_refuses_with_subscriptions_then_force(self, spark, tmp_path):
        from pulsar_spark.sources import (
            create_subscription,
            delete_scalable_topic,
        )

        d = _mk_scalable(spark, tmp_path)
        create_subscription(d, "subA")
        with pytest.raises(ValueError, match="subA"):
            delete_scalable_topic(d)
        assert os.path.isdir(d)
        assert delete_scalable_topic(d, force=True)
        assert not os.path.isdir(d)

    def test_clean_topic_deletes_everything(self, spark, tmp_path):
        from pulsar_spark.sources import autoscale_tick, delete_scalable_topic

        d = _mk_scalable(spark, tmp_path)
        # populate auxiliary sidecars (load samples + autoscale state)
        autoscale_tick(spark, d, window_s=float(2**32), now_ms=10_000_000_000)
        assert delete_scalable_topic(d)
        assert not os.path.isdir(d)

    def test_missing_or_plain_topic_returns_false(self, spark, tmp_path):
        from pulsar_spark.sources import delete_scalable_topic
        from pulsar_spark.sources.topics import create_topic

        assert not delete_scalable_topic(str(tmp_path / "nope"))
        plain = str(tmp_path / "plain")
        create_topic(plain, 2)
        assert not delete_scalable_topic(plain)
        assert os.path.isdir(plain)

    def test_consumers_dropped_first(self, spark, tmp_path):
        from pulsar_spark.sources import (
            SubscriptionCoordinator,
            delete_scalable_topic,
        )
        from pulsar_spark.sources.scalable import scalable_metadata

        d = _mk_scalable(spark, tmp_path)
        coord = SubscriptionCoordinator("sub", d, layout=scalable_metadata(d))
        coord.register_consumer("c1")
        assert delete_scalable_topic(d, coordinator=coord)
        assert not coord.sessions


class TestAutoScalePolicyOverride:
    def test_set_get_remove_roundtrip(self, spark, tmp_path):
        from pulsar_spark.sources import (
            AutoScalePolicyOverride,
            get_autoscale_policy,
            remove_autoscale_policy,
            set_autoscale_policy,
        )

        d = _mk_scalable(spark, tmp_path)
        assert get_autoscale_policy(d) is None
        ov = AutoScalePolicyOverride(split_msg_rate_in=1e-9, max_segments=8)
        set_autoscale_policy(d, ov)
        assert get_autoscale_policy(d) == ov
        assert remove_autoscale_policy(d)
        assert get_autoscale_policy(d) is None
        assert not remove_autoscale_policy(d)

    def test_resolve_overlay_order(self):
        from pulsar_spark.sources import (
            AutoScaleConfig,
            AutoScalePolicyOverride,
            resolve_autoscale_config,
        )

        ns = AutoScalePolicyOverride(max_segments=16, min_segments=2)
        top = AutoScalePolicyOverride(max_segments=4)
        cfg = resolve_autoscale_config(AutoScaleConfig(), ns, top)
        assert cfg.max_segments == 4       # topic wins
        assert cfg.min_segments == 2       # namespace falls through
        assert cfg.enabled                 # default falls through

    def test_invalid_resolution_disables(self):
        from pulsar_spark.sources import (
            AutoScalePolicyOverride,
            resolve_autoscale_config,
        )

        # maxSegments < minSegments is invalid -> auto-scale disabled,
        # not an exception (ScalableTopicController.java:400 catch)
        cfg = resolve_autoscale_config(
            None, None, AutoScalePolicyOverride(max_segments=1, min_segments=5)
        )
        assert not cfg.enabled
        # invalid threshold via override, same story
        cfg2 = resolve_autoscale_config(
            None, AutoScalePolicyOverride(split_msg_rate_in=0.0), None
        )
        assert not cfg2.enabled

    def test_unknown_field_rejected(self):
        from pulsar_spark.sources import AutoScalePolicyOverride

        with pytest.raises(ValueError, match="unknown"):
            AutoScalePolicyOverride.from_dict({"splitMsgRateIn": 1.0})

    def test_tick_honors_persisted_override_fresh_process(self, spark, tmp_path):
        """An operator-tuned override survives a controller restart:
        a tick WITHOUT an explicit config resolves the persisted
        policy — here a hair-trigger split threshold that the default
        config would never fire at this load."""
        from pulsar_spark.sources import (
            AutoScalePolicyOverride,
            autoscale_tick,
            set_autoscale_policy,
        )

        d = _mk_scalable(spark, tmp_path, n_segments=1)
        set_autoscale_policy(
            d, AutoScalePolicyOverride(split_msg_rate_in=1e-9, max_segments=8)
        )
        # fresh "process": a new tick with config=None (the CLI default)
        out = autoscale_tick(
            spark, d, window_s=float(2**32), apply=False,
            now_ms=10_000_000_000,
        )
        assert out["decision"] == "split"
        # removing the override reverts to defaults -> no split at this load
        from pulsar_spark.sources import remove_autoscale_policy

        remove_autoscale_policy(d)
        out2 = autoscale_tick(
            spark, d, window_s=float(2**32), apply=False,
            now_ms=10_000_000_000,
        )
        assert out2["decision"] == "none"

    def test_namespace_policy_applies_and_topic_overrides(self, spark, tmp_path):
        from pulsar_spark.sources import (
            AutoScalePolicyOverride,
            resolve_topic_autoscale_config,
            set_autoscale_policy,
        )
        from pulsar_spark.sources.policies import set_policy

        d = _mk_scalable(spark, tmp_path)
        ns = str(tmp_path)
        set_policy(ns, "scalable_auto_scale_policy", {"max_segments": 32})
        cfg = resolve_topic_autoscale_config(d)
        assert cfg.max_segments == 32
        set_autoscale_policy(d, AutoScalePolicyOverride(max_segments=4))
        assert resolve_topic_autoscale_config(d).max_segments == 4


class TestPolicyRegistry:
    def test_set_get_remove_and_unknown_key(self, tmp_path):
        from pulsar_spark.sources import policies as P

        t = str(tmp_path / "t")
        os.makedirs(t)
        P.set_policy(t, "message_ttl_seconds", 3600)
        assert P.get_policies(t) == {"message_ttl_seconds": 3600}
        with pytest.raises(ValueError, match="unknown policy key"):
            P.set_policy(t, "no_such_policy", 1)
        assert P.remove_policy(t, "message_ttl_seconds")
        assert not P.remove_policy(t, "message_ttl_seconds")

    def test_effective_overlay(self, tmp_path):
        from pulsar_spark.sources import policies as P

        ns = str(tmp_path)
        t = str(tmp_path / "t")
        os.makedirs(t)
        P.set_policy(ns, "message_ttl_seconds", 3600)
        P.set_policy(ns, "deduplication_enabled", True)
        P.set_policy(t, "message_ttl_seconds", 60)
        eff = P.effective_policies(t)
        assert eff["message_ttl_seconds"] == 60       # topic wins
        assert eff["deduplication_enabled"] is True   # namespace falls through

    def test_apply_policies_enforces_stored_config(self, spark, tmp_path):
        from pulsar_spark.sources import policies as P
        from pulsar_spark.sources.topics import create_topic, produce

        t = str(tmp_path / "t")
        create_topic(t, 2)
        rows = spark.createDataFrame(
            [(str(i), i, f"2024-01-{1 + i % 20:02d} 00:00:00", "x" * 50)
             for i in range(40)],
            "key string, event_id bigint, et string, props string",
        ).withColumn("et", F.col("et").cast("timestamp"))
        produce(rows, t, key_col="key", event_time_col="et")
        # publish_time is produce wall-clock; TTL against a far-future
        # now expires everything, a permissive one keeps everything
        P.set_policy(t, "message_ttl_seconds", 1)
        out = P.apply_policies(spark, t, "2100-01-01 00:00:00")
        assert out["visible"].count() == 0
        P.set_policy(t, "message_ttl_seconds", 10**9)
        out = P.apply_policies(spark, t, "2030-01-01 00:00:00")
        assert out["visible"].count() == 40
        # retention: tiny size budget -> newest-first survival only
        P.set_policy(t, "retention", {"minutes": -1, "size_bytes": 120})
        out = P.apply_policies(spark, t, "2030-01-01 00:00:00")
        plan = out["retention_plan"]
        kept = plan.where("NOT deletable").count()
        assert 0 < kept < 40
        # compaction threshold: per-partition due flags
        P.set_policy(t, "compaction_threshold_bytes", 1)
        out = P.apply_policies(spark, t, "2030-01-01 00:00:00")
        assert out["compaction_due"].where("due").count() == 2
        assert out["policies"]["retention"]["size_bytes"] == 120

    def test_restart_persistence(self, spark, tmp_path):
        """The file IS the state: a fresh reader (new 'process') sees
        the stored policy and enforces it identically."""
        from pulsar_spark.sources import policies as P

        t = str(tmp_path / "t")
        os.makedirs(t)
        P.set_policy(t, "retention", {"minutes": 30, "size_mb": 10})
        P.set_policy(t, "backlog_quota",
                     {"limit_rows": 5, "policy": "consumer_backlog_eviction"})
        # simulate restart: re-read from disk only
        fresh = P.get_policies(t)
        assert fresh["retention"]["minutes"] == 30
        assert fresh["backlog_quota"]["limit_rows"] == 5


class TestCorpusReportSketch:
    def test_rank_error_bound(self, spark):
        """GK guarantee: every approx pNN is an actual stored length
        whose rank is within n/accuracy of the target rank."""
        from pulsar_spark.functions import corpus_report_sketch
        from pulsar_spark.sources import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        acc = 100
        got = {
            r.source: r
            for r in corpus_report_sketch(docs, accuracy=acc).collect()
        }
        exact = {}
        for r in docs.select("source", F.length("text").alias("l")).collect():
            exact.setdefault(r.source, []).append(r.l)
        for src, lens in exact.items():
            lens.sort()
            n = len(lens)
            row = got[src]
            assert row.n_docs == n
            for p, name in ((0.25, "p25_chars"), (0.50, "p50_chars"),
                            (0.75, "p75_chars"), (0.90, "p90_chars")):
                v = getattr(row, name)
                assert v in lens, (src, name, v)
                # rank window: target rank +- n/accuracy (+1 slack for
                # the rank convention at the boundary)
                import bisect

                lo = bisect.bisect_left(lens, v)
                hi = bisect.bisect_right(lens, v) - 1
                target = p * n
                eps = n / acc + 1
                assert lo - eps <= target <= hi + eps, (src, name, v, lo, hi, target)

    def test_matches_exact_at_high_accuracy(self, spark):
        """accuracy >> n collapses the sketch to exact ranks: each pNN
        equals a nearest-rank quantile within one position."""
        from pulsar_spark.functions import corpus_report_sketch

        rows = [(f"s", int(i)) for i in range(1, 101)]
        docs = spark.createDataFrame(
            [(s, "x" * l) for s, l in rows], "source string, text string"
        )
        got = corpus_report_sketch(docs, accuracy=10_000).collect()[0]
        assert abs(got.p50_chars - 50) <= 1
        assert abs(got.p90_chars - 90) <= 1


class TestHnsw:
    def _grid(self, n=200, dim=8, seed=3):
        import numpy as np

        rs = np.random.RandomState(seed)
        return [list(map(float, v)) for v in rs.rand(n, dim)]

    def test_router_exact_vs_linear_scan(self):
        """With ef = nlist the graph search must return the true
        nearest centroids (beam covers the whole graph)."""
        from pulsar_spark.functions.hnsw import _sq_l2, build_hnsw

        cents = self._grid(128)
        idx = build_hnsw(cents)
        q = [0.5] * 8
        got = [i for _, i in idx.search(q, 10, ef=128)]
        want = sorted(range(128), key=lambda i: (_sq_l2(q, cents[i]), i))[:10]
        assert got == want

    def test_deterministic_build(self):
        from pulsar_spark.functions.hnsw import build_hnsw

        cents = self._grid(64)
        a, b = build_hnsw(cents), build_hnsw(cents)
        assert a.links == b.links and a.entry == b.entry

    def test_recall_beats_probe_fraction(self, spark):
        """hnsw_ivf_topk at nprobe=8/nlist=32 must recall most of the
        exact top-10 (cells cluster neighbors together, so recall far
        exceeds the 25% of corpus scanned)."""
        from pulsar_spark.functions import cosine_topk, hnsw_ivf_topk
        from pulsar_spark.sources import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qvec = list(emb.where(F.col("vec_id") == 0).select("embedding").head()[0])
        exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10, exclude_id=0).collect()}
        got = {r.vec_id for r in
               hnsw_ivf_knn_rows(emb, qvec)}
        assert len(exact & got) >= 7

    def test_duplicate_node_rejected(self):
        from pulsar_spark.functions.hnsw import HnswIndex

        idx = HnswIndex()
        idx.add(1, [0.0, 1.0])
        with pytest.raises(ValueError):
            idx.add(1, [0.0, 2.0])


def hnsw_ivf_knn_rows(emb, qvec):
    from pulsar_spark.functions import hnsw_ivf_topk

    return hnsw_ivf_topk(emb, qvec, k=10, nlist=32, nprobe=8, exclude_id=0).collect()


class TestReviewFindingsRound8:
    """Regression tests for the round-8 code-review findings."""

    def test_apply_policies_empty_topic_noops(self, spark, tmp_path):
        from pulsar_spark.sources import policies as P
        from pulsar_spark.sources.topics import create_topic

        t = str(tmp_path / "t")
        create_topic(t, 2)
        P.set_policy(t, "message_ttl_seconds", 3600)
        out = P.apply_policies(spark, t, "2030-01-01 00:00:00")
        assert out["empty"] is True and "visible" not in out

    def test_size_policy_without_props_raises_clearly(self, spark, tmp_path):
        from pulsar_spark.sources import policies as P
        from pulsar_spark.sources.topics import create_topic, produce

        t = str(tmp_path / "t")
        create_topic(t, 2)
        produce(spark.createDataFrame([("a", 1)], "key string, v bigint"),
                t, key_col="key")
        P.set_policy(t, "compaction_threshold_bytes", 10)
        with pytest.raises(ValueError, match="size_expr"):
            P.apply_policies(spark, t, "2030-01-01 00:00:00")
        # explicit size_expr unblocks it
        out = P.apply_policies(spark, t, "2030-01-01 00:00:00",
                               size_expr=F.lit(100))
        assert out["compaction_due"].where("due").count() == 1

    def test_time_only_retention_without_props(self, spark, tmp_path):
        from pulsar_spark.sources import policies as P
        from pulsar_spark.sources.topics import create_topic, produce

        t = str(tmp_path / "t")
        create_topic(t, 2)
        produce(spark.createDataFrame([(str(i), i) for i in range(6)],
                                      "key string, v bigint"),
                t, key_col="key")
        P.set_policy(t, "retention", {"minutes": -1})  # keep forever
        out = P.apply_policies(spark, t, "2030-01-01 00:00:00")
        assert out["retention_plan"].where("deletable").count() == 0

    def test_controller_on_precreated_empty_topic(self, spark, tmp_path):
        from pulsar_spark.sources.topics import create_topic
        from pulsar_spark.streaming.replicated_subscriptions import (
            ReplicatedSubscriptionsController,
        )

        t, w = str(tmp_path / "t"), str(tmp_path / "w")
        create_topic(t, 2)
        c = ReplicatedSubscriptionsController(spark, t, "east", {"west": w})
        c.tick(now_ms=1_000)  # must not crash: no data yet anywhere
        assert c.process_markers(now_ms=2_000) == 0

    def test_snapshot_cache_is_bounded(self, spark, tmp_path):
        import os as _os

        from pulsar_spark.sources.topics import create_topic, produce
        from pulsar_spark.streaming.replicated_subscriptions import (
            ReplicatedSubscriptionsController,
        )

        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        for topic, ids in ((east, range(4)), (west, range(100, 103))):
            create_topic(topic, 2)
            produce(spark.createDataFrame([(str(i), i) for i in ids],
                                          "key string, event_id bigint"),
                    topic, key_col="key")
        ce = ReplicatedSubscriptionsController(
            spark, east, "east", {"west": west}, max_cached_snapshots=2)
        cw = ReplicatedSubscriptionsController(
            spark, west, "west", {"east": east})
        for i in range(3):
            # new data each round so the no-new-data guard never skips
            produce(spark.createDataFrame([(f"x{i}", 1000 + i)],
                                          "key string, event_id bigint"),
                    east, key_col="key")
            assert ce.start_snapshot(now_ms=1_000 + i) is not None
            ce.replicate_out()
            cw.tick(now_ms=2_000 + i)
            ce.process_markers(now_ms=3_000 + i)
        st = ce._load()
        assert len(st["snapshots"]) == 2
        seqs = [s["seq"] for s in st["snapshots"]]
        assert seqs == sorted(seqs)  # newest kept

    def test_phash_warning_hint_is_actionable(self, spark):
        import warnings

        from pulsar_spark.functions.phash import phash_near_dups

        df = spark.createDataFrame([(1, 7)], "media_id bigint, phash long")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            phash_near_dups(df, max_hamming=12)  # default 4 bands
            assert any("n_bands=16" in str(x.message) for x in w)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            phash_near_dups(df, max_hamming=20, n_bands=16)
            assert any("No complete" in str(x.message) for x in w)


class TestVideoAvi:
    def _frames(self, grays, w=24, h=16):
        import numpy as np

        return [np.full((h, w, 3), g, dtype=np.uint8) for g in grays]

    def test_container_round_trip(self):
        from pulsar_spark.functions.video import encode_avi_mjpeg, parse_avi

        avi = encode_avi_mjpeg(self._frames([10, 100, 200]), fps=5)
        info = parse_avi(avi)
        assert len(info["frames"]) == 3 == info["n_frames"]
        assert (info["width"], info["height"]) == (24, 16)
        assert info["us_per_frame"] == 200_000

    def test_truncated_tail_is_lenient_and_bad_magic_raises(self):
        from pulsar_spark.functions.video import encode_avi_mjpeg, parse_avi

        avi = encode_avi_mjpeg(self._frames([10, 100, 200]), fps=5)
        assert len(parse_avi(avi[:-30])["frames"]) >= 2
        with pytest.raises(ValueError, match="RIFF"):
            parse_avi(b"nonsense")

    def test_sampled_frame_means_match_planting(self, spark, tmp_path):
        """JPEG is lossy but deterministic: each solid sampled frame's
        decoded mean must sit within DC-quantization distance of the
        planted gray."""
        import numpy as np

        from pulsar_spark.functions.video import (
            encode_avi_mjpeg,
            sample_video_frames,
        )

        grays = [16, 64, 128, 200, 240]
        df = spark.createDataFrame(
            [(1, bytearray(encode_avi_mjpeg(self._frames(grays), fps=5)))],
            "media_id bigint, payload binary",
        )
        rows = {r.frame_idx: r for r in sample_video_frames(df, every_n=2).collect()}
        assert sorted(rows) == [0, 2, 4]
        for idx, r in rows.items():
            assert abs(r.mean_luma_q - grays[idx]) <= 4, (idx, r.mean_luma_q)
            assert (r.width, r.height, r.n_frames) == (24, 16, 5)

    def test_decode_media_real_tier_handles_avi(self, spark):
        from pulsar_spark.functions.multimodal import decode_media
        from pulsar_spark.functions.video import encode_avi_mjpeg

        df = spark.createDataFrame(
            [(7, "video", "avi",
              bytearray(encode_avi_mjpeg(self._frames([50, 60]), fps=10)))],
            "media_id bigint, modality string, codec string, payload binary",
        )
        r = decode_media(df, strict=True).collect()[0]
        assert (r.width, r.height, r.n_frames) == (24, 16, 2)
        assert r.duration_ms == 200


class TestAdpcm:
    def _sig(self, n=6000, seed=1):
        import numpy as np

        t = np.arange(n)
        return (9000 * np.sin(2 * np.pi * 440 * t / 8000)
                + 4000 * np.sin(2 * np.pi * 1100 * t / 8000)).astype(np.int64)

    def test_round_trip_snr_and_determinism(self):
        import numpy as np

        from pulsar_spark.functions.video import decode_wav_ima, encode_wav_ima

        sig = self._sig()
        wav = encode_wav_ima(sig, 8000)
        assert wav == encode_wav_ima(sig, 8000)
        pcm, rate = decode_wav_ima(wav)
        assert rate == 8000 and len(pcm) == len(sig)
        err = pcm.astype(np.float64) - sig
        # 4-bit ADPCM on a two-tone signal: assert the codec-quality
        # contract (steady-state SNR), not a per-sample bound — the
        # high-slew composite legitimately quantizes coarser than a
        # single tone
        rms_sig = float(np.sqrt((sig[200:] ** 2).mean()))
        rms_err = float(np.sqrt((err[200:] ** 2).mean()))
        assert rms_err / rms_sig < 0.08, rms_err / rms_sig

    def test_fact_chunk_trims_pad_sample(self):
        from pulsar_spark.functions.video import decode_wav_ima, encode_wav_ima

        # 506 samples = one full 505 block + 1 header sample in block 2;
        # and a mid-block even remainder that forces a pad nibble
        for n in (506, 700):
            sig = self._sig(n)
            pcm, _ = decode_wav_ima(encode_wav_ima(sig, 8000))
            assert len(pcm) == n

    def test_wav_decoder_falls_back_to_ima(self, spark):
        """multimodal._decode_wav: stdlib wave rejects format 0x0011;
        the real IMA decoder takes over transparently, so
        decode_media(strict=True) works on compressed audio."""
        from pulsar_spark.functions.multimodal import decode_media
        from pulsar_spark.functions.video import encode_wav_ima

        df = spark.createDataFrame(
            [(3, "audio", "wav", bytearray(encode_wav_ima(self._sig(4000), 8000)))],
            "media_id bigint, modality string, codec string, payload binary",
        )
        r = decode_media(df, strict=True).collect()[0]
        assert r.n_frames == 4000
        assert r.duration_ms == 500

    def test_exact_groups_split_on_signal_change(self, spark):
        import numpy as np

        from pulsar_spark.functions.video import (
            adpcm_exact_groups,
            encode_wav_ima,
        )

        def clip(g):
            t = np.arange(1011)
            return bytearray(encode_wav_ima(
                (5000 * np.sin(2 * np.pi * (100 + g * 50) * t / 8000)).astype(np.int64),
                8000))

        df = spark.createDataFrame(
            [(i, clip(i % 3)) for i in range(9)], "media_id bigint, payload binary"
        )
        got = {r.media_id: r for r in adpcm_exact_groups(df).collect()}
        for i in range(9):
            assert got[i].canonical_id == i % 3
            assert got[i].group_size == 3
            assert got[i].n_samples == 1011
