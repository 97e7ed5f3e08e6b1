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
