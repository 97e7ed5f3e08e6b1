"""Round-4 additions: multi-topic scalable consumers, namespace watch,
ProcessingTimeoutPolicy, stale-layout lineage routing.

Reference parity targets:
- pulsar-client-v5/.../v5/MultiTopicStreamConsumer.java,
  MultiTopicQueueConsumer.java — combined position vector across topics
- pulsar-client-v5/.../v5/ScalableTopicsWatcher.java,
  DagWatchClient.java — namespace watch snapshot/diff, mid-stream pickup
- pulsar-client-api-v5/.../v5/config/ProcessingTimeoutPolicy.java,
  BackoffPolicy.java — timeout -> backoff redelivery composition
- pulsar-client-v5/.../v5/ClientSegmentLayout.java — stale-cache route
  resolution through segment lineage
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _payload(spark, n=200, base=0):
    return (
        spark.range(base, base + n)
        .selectExpr("CAST(id % 40 AS STRING) AS k", "id AS v")
    )


class TestMultiCheckpoint:
    def test_bytes_roundtrip_and_canonical(self):
        from pulsar_spark.sources import Checkpoint, MultiCheckpoint

        mc = MultiCheckpoint(
            {"b": Checkpoint({1: 5, 0: 2}), "a": Checkpoint({3: 7})}
        )
        blob = mc.to_bytes()
        back = MultiCheckpoint.from_bytes(blob)
        assert back.topics["b"].offsets == {1: 5, 0: 2}
        assert back.topics["a"].offsets == {3: 7}
        # canonical: serialization is insertion-order independent
        mc2 = MultiCheckpoint(
            {"a": Checkpoint({3: 7}), "b": Checkpoint({0: 2, 1: 5})}
        )
        assert mc2.to_bytes() == blob

    def test_two_topics_across_split_no_dup_no_loss(self, spark, tmp_path):
        """The VERDICT item-4 'done' case: consume TWO scalable topics
        from a single combined checkpoint, split a segment of one
        mid-way — resume delivers exactly the post-checkpoint rows."""
        from pulsar_spark.sources import (
            MultiCheckpoint,
            create_scalable_topic,
            produce_scalable,
            read_namespace_from_checkpoint,
            split_segment,
        )

        ns = str(tmp_path / "ns")
        ta, tb = os.path.join(ns, "orders"), os.path.join(ns, "clicks")
        create_scalable_topic(ta, num_initial_segments=2)
        create_scalable_topic(tb, num_initial_segments=1)
        batch1 = _payload(spark, 200)
        produce_scalable(batch1, ta, key_col="k")
        produce_scalable(batch1, tb, key_col="k")

        df1, ck1 = read_namespace_from_checkpoint(
            spark, ns, MultiCheckpoint.earliest()
        )
        assert df1.count() == 400
        assert set(r.topic_name for r in df1.select("topic_name").distinct().collect()) == {
            "orders",
            "clicks",
        }

        # split one topic's segment between checkpoints, then append to both
        split_segment(ta, 0)
        batch2 = _payload(spark, 150, base=1000)
        produce_scalable(batch2, ta, key_col="k")
        produce_scalable(batch2, tb, key_col="k")

        # resume THROUGH serialized bytes (the caller-held vector)
        ck1 = MultiCheckpoint.from_bytes(ck1.to_bytes())
        df2, ck2 = read_namespace_from_checkpoint(spark, ns, ck1)
        got = sorted(
            (r.topic_name, r.v) for r in df2.select("topic_name", "v").collect()
        )
        want = sorted(
            [("orders", v) for v in range(1000, 1150)]
            + [("clicks", v) for v in range(1000, 1150)]
        )
        assert got == want, "resume must deliver exactly batch2, no dup no loss"

        # a third read from the advanced vector is empty
        df3, _ = read_namespace_from_checkpoint(spark, ns, ck2)
        assert df3.count() == 0

    def test_topic_created_between_reads_is_picked_up(self, spark, tmp_path):
        from pulsar_spark.sources import (
            MultiCheckpoint,
            create_scalable_topic,
            produce_scalable,
            read_namespace_from_checkpoint,
        )

        ns = str(tmp_path / "ns")
        ta = os.path.join(ns, "orders")
        create_scalable_topic(ta, num_initial_segments=2)
        produce_scalable(_payload(spark, 100), ta, key_col="k")
        _, ck = read_namespace_from_checkpoint(spark, ns, MultiCheckpoint.earliest())

        # new topic appears AFTER the checkpoint: consumed from its start
        tb = os.path.join(ns, "clicks")
        create_scalable_topic(tb, num_initial_segments=1)
        produce_scalable(_payload(spark, 60, base=500), tb, key_col="k")
        df, _ = read_namespace_from_checkpoint(spark, ns, ck)
        rows = df.select("topic_name", "v").collect()
        assert len(rows) == 60 and all(r.topic_name == "clicks" for r in rows)

    def test_removed_topic_slice_retained_not_acked(self, spark, tmp_path):
        """MultiTopicStreamConsumer.closeTopic: a topic leaving the
        match set detaches without acking; its slice survives in the
        vector so a later re-add resumes, at-least-once."""
        from pulsar_spark.sources import (
            MultiCheckpoint,
            create_scalable_topic,
            produce_scalable,
            read_namespace_from_checkpoint,
        )

        ns = str(tmp_path / "ns")
        ta = os.path.join(ns, "orders")
        create_scalable_topic(ta, num_initial_segments=1, properties={"team": "x"})
        produce_scalable(_payload(spark, 50), ta, key_col="k")
        _, ck = read_namespace_from_checkpoint(
            spark, ns, MultiCheckpoint.earliest(), property_filters={"team": "x"}
        )
        assert "orders" in ck.topics and ck.topics["orders"].offsets

        # narrower filter: topic no longer matches, slice must survive
        df, ck2 = read_namespace_from_checkpoint(
            spark, ns, ck, property_filters={"team": "y"}
        )
        assert df.count() == 0
        assert ck2.topics["orders"].offsets == ck.topics["orders"].offsets


class TestScalableWatch:
    def test_snapshot_filters_and_diff(self, tmp_path):
        from pulsar_spark.sources import (
            create_scalable_topic,
            scalable_watch_diff,
            scalable_watch_snapshot,
        )

        ns = str(tmp_path / "ns")
        create_scalable_topic(os.path.join(ns, "a"), properties={"team": "x"})
        create_scalable_topic(os.path.join(ns, "b"), properties={"team": "y"})
        snap0 = scalable_watch_snapshot(ns)
        assert snap0 == ["a", "b"]
        assert scalable_watch_snapshot(ns, {"team": "x"}) == ["a"]

        create_scalable_topic(os.path.join(ns, "c"), properties={"team": "x"})
        snap1 = scalable_watch_snapshot(ns)
        added, removed = scalable_watch_diff(snap0, snap1)
        assert added == ["c"] and removed == []


class TestScalablePatternStream:
    def test_mid_stream_topic_and_split_pickup(self, spark, tmp_path):
        """A topic created mid-stream AND a segment split mid-stream
        are both consumed on the next trigger, no restart (watcher
        onDiff + DAG update, rendered as the file source's re-list)."""
        from pulsar_spark.sources import (
            create_scalable_topic,
            produce_scalable,
            split_segment,
        )
        from pulsar_spark.streaming import run_to_end, subscribe_scalable_pattern

        ns = str(tmp_path / "ns")
        ta = os.path.join(ns, "orders")
        create_scalable_topic(ta, num_initial_segments=2)
        produce_scalable(_payload(spark, 100), ta, key_col="k")
        ckpt = str(tmp_path / "ckpt")
        glob = f"{ns}/*"

        seen: list[tuple[str, str, int, int]] = []

        def sink(run):
            def _each(df, bid):
                for r in df.groupBy("topic_name", "segment").count().collect():
                    seen.append((run, r.topic_name, r.segment, r["count"]))

            return _each

        run_to_end(
            subscribe_scalable_pattern(spark, glob)
            .writeStream.foreachBatch(sink("r1"))
            .option("checkpointLocation", ckpt)
        )
        assert sum(n for run, *_, n in seen if run == "r1") == 100

        # mid-stream: split a segment of the existing topic AND create a
        # brand-new topic, then produce to both
        split_segment(ta, 0)
        produce_scalable(_payload(spark, 80, base=1000), ta, key_col="k")
        tb = os.path.join(ns, "clicks")
        create_scalable_topic(tb, num_initial_segments=1)
        produce_scalable(_payload(spark, 40, base=2000), tb, key_col="k")

        run_to_end(
            subscribe_scalable_pattern(spark, glob)
            .writeStream.foreachBatch(sink("r2"))
            .option("checkpointLocation", ckpt)
        )
        r2 = [(t, s, n) for run, t, s, n in seen if run == "r2"]
        assert sum(n for *_, n in r2) == 120, f"got {r2}"
        assert {t for t, *_ in r2} == {"orders", "clicks"}
        # post-split rows landed in the children (ids 2,3), not parent 0
        orders_segs = {s for t, s, _ in r2 if t == "orders"}
        assert 0 not in orders_segs and orders_segs & {2, 3}


class TestProcessingTimeoutPolicy:
    NOW = "2024-01-20 00:00:00"

    def _m(self, messages):
        return messages.withColumn(
            "redelivery_count", (F.col("event_id") % 4).cast("int")
        )

    def test_timeout_detection_and_backoff_schedule(self, spark, messages):
        from pulsar_spark.operators import (
            BackoffPolicy,
            ProcessingTimeoutPolicy,
            processing_timeout_redelivery,
        )

        now = F.lit(self.NOW).cast("timestamp")
        pol = ProcessingTimeoutPolicy(
            timeout_s=3600, redelivery_backoff=BackoffPolicy(4.0, 60.0, 2.0)
        )
        acked = F.col("event_id") % 7 != 0
        out = processing_timeout_redelivery(self._m(messages), acked, pol, now=now)
        rows = out.select("event_id", "redelivery_count", "deliver_at", "publish_time").collect()
        assert rows, "fixture must contain stalled deliveries"
        import datetime as dt

        now_py = dt.datetime(2024, 1, 20)
        cutoff = now_py - dt.timedelta(seconds=3600)
        for r in rows:
            assert r.event_id % 7 == 0  # only unacked
            assert r.publish_time < cutoff  # only stalled past the timeout
            n = r.redelivery_count  # already incremented
            assert 1 <= n <= 4
            expect = min(4.0 * 2.0 ** (n - 1), 60.0)
            assert r.deliver_at == now_py + dt.timedelta(seconds=expect)

    def test_none_backoff_redelivers_immediately(self, spark, messages):
        from pulsar_spark.operators import (
            ProcessingTimeoutPolicy,
            processing_timeout_redelivery,
        )

        now = F.lit(self.NOW).cast("timestamp")
        out = processing_timeout_redelivery(
            self._m(messages),
            F.col("event_id") % 7 != 0,
            ProcessingTimeoutPolicy.of(3600),
            now=now,
        )
        import datetime as dt

        vals = {r.deliver_at for r in out.select("deliver_at").distinct().collect()}
        assert vals == {dt.datetime(2024, 1, 20)}

    def test_zero_timeout_disables(self, spark, messages):
        from pulsar_spark.operators import (
            ProcessingTimeoutPolicy,
            processing_timeout_redelivery,
        )

        out = processing_timeout_redelivery(
            self._m(messages), F.lit(False), ProcessingTimeoutPolicy.of(0)
        )
        assert out.count() == 0

    def test_jitter_bounded_and_deterministic(self, spark, messages):
        from pulsar_spark.operators import (
            BackoffPolicy,
            ProcessingTimeoutPolicy,
            processing_timeout_redelivery,
        )

        now = F.lit(self.NOW).cast("timestamp")
        pol = ProcessingTimeoutPolicy(
            3600, BackoffPolicy(10.0, 10.0, 1.0, jitter_percent=20.0)
        )
        kw = dict(now=now, jitter_col=F.col("event_id"))
        a = processing_timeout_redelivery(
            self._m(messages), F.col("event_id") % 7 != 0, pol, **kw
        )
        import datetime as dt

        now_py = dt.datetime(2024, 1, 20)
        secs = [
            (r.deliver_at - now_py).total_seconds()
            for r in a.select("deliver_at").collect()
        ]
        # ±jitter/2 band around the 10s base
        assert all(9.0 <= s <= 11.0 for s in secs)
        assert len(set(secs)) > 1, "jitter should vary across rows"
        # deterministic: the same rows get the same delays on a re-run
        b = processing_timeout_redelivery(
            self._m(messages), F.col("event_id") % 7 != 0, pol, **kw
        )
        assert sorted(secs) == sorted(
            (r.deliver_at - now_py).total_seconds()
            for r in b.select("deliver_at").collect()
        )

    def test_validation(self):
        from pulsar_spark.operators import BackoffPolicy, ProcessingTimeoutPolicy

        with pytest.raises(ValueError):
            ProcessingTimeoutPolicy(-1)
        with pytest.raises(ValueError):
            BackoffPolicy(1, 2, multiplier=0.5)
        with pytest.raises(ValueError):
            BackoffPolicy(1, 2, jitter_percent=150)


class TestSubscriptionInitialPosition:
    def test_latest_skips_stored_backlog(self, spark, tmp_path):
        """SubscriptionInitialPosition.Latest: a new subscription's
        cursor starts past the current last message — the stored
        backlog is never delivered, rows appended after subscribe are."""
        from pulsar_spark.sources.topics import produce
        from pulsar_spark.streaming import run_to_end, subscribe

        topic = str(tmp_path / "t")
        payload = spark.range(100).selectExpr("CAST(id AS STRING) k", "id v")
        produce(payload, topic, key_col="k", num_partitions=4, mode="overwrite")

        seen: list[int] = []

        def sink(df, bid):
            seen.extend(r.v for r in df.select("v").collect())

        ckpt = str(tmp_path / "ckpt")
        stream = subscribe(spark, topic, initial_position="latest")
        run_to_end(
            stream.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt)
        )
        assert seen == []  # backlog skipped

        produce(
            spark.range(1000, 1050).selectExpr("CAST(id AS STRING) k", "id v"),
            topic,
            key_col="k",
        )
        # resume from the SAME checkpoint with the default position: the
        # checkpoint IS the cursor (initialPosition only applies at
        # subscription creation in the reference too), and the backlog
        # files were already marked seen by run 1
        stream2 = subscribe(spark, topic)
        run_to_end(
            stream2.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt)
        )
        assert sorted(seen) == list(range(1000, 1050))

    def test_invalid_position_rejected(self, spark, tmp_path):
        from pulsar_spark.sources.topics import produce
        from pulsar_spark.streaming import subscribe

        topic = str(tmp_path / "t2")
        produce(
            spark.range(5).selectExpr("CAST(id AS STRING) k", "id v"),
            topic,
            key_col="k",
            mode="overwrite",
        )
        with pytest.raises(ValueError):
            subscribe(spark, topic, initial_position="middle")


class TestAutoScalePolicy:
    """AutoScalePolicyEvaluator.decide port (AutoScalePolicyEvaluator
    .java:64): pure decision function, at most one action per tick."""

    NOW = 10_000_000

    def _meta(self, tmp_path, n=2, name="t"):
        from pulsar_spark.sources.scalable import (
            create_scalable_topic,
            scalable_metadata,
        )

        d = str(tmp_path / name)
        create_scalable_topic(d, num_initial_segments=n)
        return d, scalable_metadata(d)

    def _sample(self, mi=0.0, bi=0.0, mo=0.0, bo=0.0, age_s=10_000):
        from pulsar_spark.sources import SegmentLoadSample, SegmentLoadStats

        return SegmentLoadSample(
            SegmentLoadStats(mi, bi, mo, bo), self.NOW - age_s * 1000
        )

    def test_disabled_and_cooldowns(self, tmp_path):
        from pulsar_spark.sources import AutoScaleConfig, auto_scale_decide

        _, meta = self._meta(tmp_path)
        hot = {0: self._sample(mi=1e6), 1: self._sample()}
        off = AutoScaleConfig(enabled=False)
        assert auto_scale_decide(meta, hot, {}, off, self.NOW).kind == "none"
        cfg = AutoScaleConfig(split_msg_rate_in=100.0, split_cooldown_s=30)
        # within cooldown of a prior split: no action even when hot
        d = auto_scale_decide(
            meta, hot, {}, cfg, self.NOW, last_split_at_ms=self.NOW - 10_000
        )
        assert d.kind == "none"

    def test_consumer_driven_split_picks_busiest(self, tmp_path):
        from pulsar_spark.sources import AutoScaleConfig, auto_scale_decide

        _, meta = self._meta(tmp_path)
        load = {0: self._sample(mi=5.0), 1: self._sample(mi=50.0)}
        d = auto_scale_decide(
            meta, load, {"subA": 3}, AutoScaleConfig(), self.NOW
        )
        assert (d.kind, d.segment_id, d.reason) == ("split", 1, "consumer-count")

    def test_load_driven_split_highest_overload_ratio(self, tmp_path):
        from pulsar_spark.sources import AutoScaleConfig, auto_scale_decide

        _, meta = self._meta(tmp_path)
        cfg = AutoScaleConfig(split_msg_rate_in=100.0, split_bytes_rate_out=1000.0)
        # seg0 is 2x over on msgRateIn; seg1 is 5x over on bytesRateOut
        load = {0: self._sample(mi=200.0), 1: self._sample(bo=5000.0)}
        d = auto_scale_decide(meta, load, {}, cfg, self.NOW)
        assert (d.kind, d.segment_id, d.reason) == ("split", 1, "bytesRateOut")
        # at-threshold (ratio == 1.0) must NOT split — strictly over only
        d2 = auto_scale_decide(
            meta, {0: self._sample(mi=100.0)}, {}, cfg, self.NOW
        )
        assert d2.kind == "none" or d2.kind == "merge"

    def test_merge_requires_durable_cold_and_adjacency(self, tmp_path):
        from pulsar_spark.sources import AutoScaleConfig, auto_scale_decide

        _, meta = self._meta(tmp_path, n=4)
        cfg = AutoScaleConfig(merge_window_s=600, min_segments=1)
        cold = lambda age: self._sample(mi=1.0, age_s=age)
        # all cold and old: coldest adjacent pair merges
        load = {i: cold(10_000) for i in range(4)}
        d = auto_scale_decide(meta, load, {}, cfg, self.NOW)
        assert d.kind == "merge" and d.merge_with == d.segment_id + 1
        # a too-fresh sample on one side blocks that pair
        load2 = {0: cold(10), 1: cold(10_000), 2: cold(10), 3: cold(10)}
        d2 = auto_scale_decide(meta, load2, {}, cfg, self.NOW)
        assert d2.kind == "none"
        # missing sample = no evidence of cold = ineligible
        d3 = auto_scale_decide(meta, {}, {}, cfg, self.NOW)
        assert d3.kind == "none"

    def test_merge_respects_min_segments_and_split_wins(self, tmp_path):
        from pulsar_spark.sources import AutoScaleConfig, auto_scale_decide

        _, meta = self._meta(tmp_path)
        cold = {0: self._sample(mi=1.0), 1: self._sample(mi=1.0)}
        d = auto_scale_decide(
            meta, cold, {}, AutoScaleConfig(min_segments=2), self.NOW
        )
        assert d.kind == "none"
        # a split decision preempts any merge (one action per tick)
        cfg = AutoScaleConfig(split_msg_rate_in=10.0, min_segments=1)
        hot_and_cold = {0: self._sample(mi=100.0), 1: self._sample(mi=1.0)}
        d2 = auto_scale_decide(meta, hot_and_cold, {}, cfg, self.NOW)
        assert d2.kind == "split"

    def test_merge_depth_gate(self, tmp_path):
        from pulsar_spark.sources import AutoScaleConfig, auto_scale_decide, merge_depth
        from pulsar_spark.sources.scalable import merge_segments, scalable_metadata

        d, meta = self._meta(tmp_path, n=4)
        # merge 0+1 -> a merge node; its child has depth 1
        child = merge_segments(d, 0, 1)
        meta = scalable_metadata(d)
        assert merge_depth(meta, child) == 1
        assert merge_depth(meta, 2) == 0
        cfg = AutoScaleConfig(max_dag_depth=1, min_segments=1)
        cold = {s["segment_id"]: self._sample(mi=1.0) for s in meta["segments"].values()}
        dec = auto_scale_decide(meta, cold, {}, cfg, self.NOW)
        # the merged child is at the cap; only the 2+3 pair remains
        assert (dec.kind, dec.segment_id, dec.merge_with) == ("merge", 2, 3)

    def test_load_reporter_material_change_and_mtime(self, tmp_path):
        """SegmentLoadReporter.reportIfChanged: in-band samples are
        skipped WITHOUT touching the record (the mtime is the merge
        window's 'cold since' clock); off-zero moves always write."""
        import os
        import time

        from pulsar_spark.sources import (
            SegmentLoadStats,
            is_material_change,
            load_samples,
            report_if_changed,
        )

        d = str(tmp_path / "t")
        os.makedirs(d)
        s100 = SegmentLoadStats(msg_rate_in=100.0)
        assert report_if_changed(d, 0, s100) is True
        rec = os.path.join(d, "_segment_load", "0.json")
        t0 = os.path.getmtime(rec)
        time.sleep(0.05)
        # +20% is inside the ±25% band: skipped, mtime keeps aging
        assert report_if_changed(d, 0, SegmentLoadStats(msg_rate_in=120.0)) is False
        assert os.path.getmtime(rec) == t0
        # +30% is material: written
        assert report_if_changed(d, 0, SegmentLoadStats(msg_rate_in=130.0)) is True
        assert os.path.getmtime(rec) > t0
        # zero crossings are always material; staying at zero is not
        assert is_material_change(SegmentLoadStats(), SegmentLoadStats(msg_rate_out=0.1))
        assert not is_material_change(SegmentLoadStats(), SegmentLoadStats())
        samples = load_samples(d)
        assert samples[0].stats.msg_rate_in == 130.0
        assert samples[0].modified_at_ms > 0

    def test_reporter_feeds_evaluator_end_to_end(self, tmp_path):
        """The full PIP-483 loop: report -> load_samples ->
        auto_scale_decide sees the mtime-aged record as durably cold."""
        import os

        from pulsar_spark.sources import (
            AutoScaleConfig,
            SegmentLoadStats,
            auto_scale_decide,
            load_samples,
            report_if_changed,
        )
        from pulsar_spark.sources.scalable import (
            create_scalable_topic,
            scalable_metadata,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        for sid in (0, 1):
            report_if_changed(d, sid, SegmentLoadStats(msg_rate_in=1.0))
        samples = load_samples(d)
        now_ms = max(s.modified_at_ms for s in samples.values())
        cfg = AutoScaleConfig(merge_window_s=600, min_segments=1)
        # records are fresh: not yet durably cold
        assert auto_scale_decide(
            scalable_metadata(d), samples, {}, cfg, now_ms
        ).kind == "none"
        # same records evaluated 10 merge-windows later: merge fires
        dec = auto_scale_decide(
            scalable_metadata(d), samples, {}, cfg, now_ms + 6_000_000
        )
        assert (dec.kind, dec.segment_id, dec.merge_with) == ("merge", 0, 1)

    def test_segment_load_stats_rates(self, spark, tmp_path):
        from pulsar_spark.sources import segment_load_stats
        from pulsar_spark.sources.scalable import (
            create_scalable_topic,
            produce_scalable,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        produce_scalable(_payload(spark, 120), d, key_col="k")
        rates = segment_load_stats(
            spark, d, window_s=60.0, bytes_expr=F.octet_length("k")
        )
        assert set(rates) == {0, 1}
        assert abs(sum(r.msg_rate_in for r in rates.values()) - 2.0) < 1e-9
        assert all(r.bytes_rate_in > 0 for r in rates.values())
        assert all(r.msg_rate_out == 0.0 for r in rates.values())


def _bmp_bytes(arr):
    from pulsar_spark.functions.multimodal import _encode_bmp

    return _encode_bmp(arr)


def _wav_bytes(samples, rate=8000):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.asarray(samples) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


class TestRealMediaKernels:
    """bmp/ppm/pgm/wav decode + resize are REAL (numpy/stdlib) — exact
    pixel and sample math, not the deterministic stub."""

    def test_bmp_roundtrip_exact(self):
        import numpy as np

        from pulsar_spark.functions.multimodal import _decode_bmp, _encode_bmp

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
        assert (_decode_bmp(_encode_bmp(px)) == px).all()

    def test_ppm_roundtrip_and_pgm_gray(self):
        import numpy as np

        from pulsar_spark.functions.multimodal import _decode_pnm, _encode_ppm

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        assert (_decode_pnm(_encode_ppm(px)) == px).all()
        gray = b"P5\n# comment\n3 2\n255\n" + bytes(range(6))
        g = _decode_pnm(gray)
        assert g.shape == (2, 3, 3)
        assert (g[:, :, 0] == g[:, :, 1]).all()

    def test_decode_media_real_image_and_audio(self, spark):
        import numpy as np

        docs = [
            (1, "image", "bmp", bytearray(_bmp_bytes(np.full((8, 4, 3), 128, np.uint8)))),
            (2, "audio", "wav", bytearray(_wav_bytes(np.zeros(8000)))),
            (3, "image", "bmp", bytearray(b"not a bmp at all")),
        ]
        from pulsar_spark.functions.multimodal import decode_media

        media = spark.createDataFrame(
            docs, "media_id long, modality string, codec string, payload binary"
        ).selectExpr(
            "media_id", "modality", "codec", "payload",
            "CAST(NULL AS INT) width", "CAST(NULL AS INT) height",
            "CAST(NULL AS INT) duration_ms", "CAST(NULL AS INT) n_frames",
        )
        rows = {r.media_id: r for r in decode_media(media).collect()}
        img = rows[1]
        assert img.decode_ok and (img.width, img.height) == (4, 8)
        assert abs(img.feature[0] - 128 / 255) < 1e-6  # real gray mean
        aud = rows[2]
        assert aud.decode_ok and aud.duration_ms == 1000 and aud.n_frames == 8000
        assert aud.feature[0] == 0.0  # rms of silence
        bad = rows[3]
        assert bad.decode_ok is False and bad.width is None

    def test_strict_mode_still_runs_real_codecs(self, spark):
        import numpy as np

        from pulsar_spark.functions.multimodal import decode_media

        media = spark.createDataFrame(
            [(1, "image", "bmp", bytearray(_bmp_bytes(np.zeros((2, 2, 3), np.uint8))))],
            "media_id long, modality string, codec string, payload binary",
        )
        assert decode_media(media, strict=True).count() == 1

    def test_resize_real_bilinear(self, spark):
        import numpy as np

        from pulsar_spark.functions.multimodal import (
            _decode_bmp,
            attach_media,
            resize_media,
        )

        solid = np.full((10, 10, 3), (10, 200, 30), np.uint8)
        media = spark.createDataFrame(
            [(1, bytearray(_bmp_bytes(solid)))], "media_id long, payload binary"
        )
        media = attach_media(media, "payload", "image", "bmp", "media_id")
        out = resize_media(media, 4, 6).collect()[0]
        assert (out.width, out.height) == (4, 6)
        resized = _decode_bmp(bytes(out.payload))
        assert resized.shape == (6, 4, 3)
        # a solid image stays exactly solid under real bilinear resize
        assert (resized == solid[0, 0]).all()

    def test_resize_malformed_payload_passes_through(self, spark):
        """Bad bytes are data: a corrupt bmp row survives resize with
        its payload and dims untouched instead of killing the stage."""
        import numpy as np

        from pulsar_spark.functions.multimodal import (
            attach_media,
            resize_media,
        )

        good = _bmp_bytes(np.zeros((3, 3, 3), np.uint8))
        rows = [(1, bytearray(good)), (2, bytearray(b"corrupt"))]
        media = attach_media(
            spark.createDataFrame(rows, "media_id long, payload binary"),
            "payload",
            "image",
            "bmp",
            "media_id",
        )
        out = {r.media_id: r for r in resize_media(media, 2, 2).collect()}
        assert (out[1].width, out[1].height) == (2, 2)
        assert bytes(out[2].payload) == b"corrupt"
        assert out[2].width is None  # dims not stamped on a failed row

    def test_resize_gradient_preserves_structure(self):
        import numpy as np

        from pulsar_spark.functions.multimodal import _resize_bilinear

        # horizontal gradient: downscale keeps monotonicity along x
        grad = np.tile(np.linspace(0, 255, 32, dtype=np.uint8), (8, 1))
        px = np.stack([grad] * 3, axis=2)
        small = _resize_bilinear(px, 8, 4).astype(int)
        row = small[0, :, 0]
        assert (np.diff(row) > 0).all()
        assert small[:, 0, 0].std() == 0  # columns stay constant


class TestStaleLayoutRouting:
    def _route_scalar(self, h, meta):
        for s in meta["segments"].values():
            if s["state"] == "ACTIVE" and s["start"] <= h <= s["end"]:
                return s["segment_id"]
        raise AssertionError("active segments must cover the space")

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_stale_route_resolves_to_current_active(self, tmp_path, seed):
        """ClientSegmentLayout.java:38: route against a CACHED layout,
        resolve through lineage — every hash lands in exactly the
        ACTIVE segment the current layout owns it with."""
        import random

        from pulsar_spark.sources import resolve_segment_lineage
        from pulsar_spark.sources.scalable import (
            active_segments,
            create_scalable_topic,
            merge_segments,
            scalable_metadata,
            split_segment,
        )

        rng = random.Random(seed)
        d = str(tmp_path / f"t{seed}")
        create_scalable_topic(d, num_initial_segments=2)
        stale = scalable_metadata(d)  # the client's cached layout

        # evolve the topic past the cache: random split/merge sequence
        for _ in range(6):
            segs = active_segments(scalable_metadata(d))
            if len(segs) > 1 and rng.random() < 0.4:
                # merge two adjacent actives if possible
                by_start = sorted(segs, key=lambda s: s["start"])
                pairs = [
                    (a, b)
                    for a, b in zip(by_start, by_start[1:])
                    if a["end"] + 1 == b["start"]
                ]
                if pairs:
                    a, b = rng.choice(pairs)
                    merge_segments(d, a["segment_id"], b["segment_id"])
                    continue
            splittable = [s for s in segs if s["end"] > s["start"]]
            if splittable:
                split_segment(d, rng.choice(splittable)["segment_id"])
        current = scalable_metadata(d)

        for h in rng.sample(range(0x10000), 300):
            stale_seg = self._route_scalar(h, stale)
            resolved = resolve_segment_lineage(stale_seg, h, current)
            assert resolved == self._route_scalar(h, current)

    def test_non_numeric_keys_route_deterministically(self, spark, tmp_path):
        """Non-numeric keys under deterministic_mod hash via crc32
        instead of crashing (ANSI cast) or vanishing into the NULL
        hive partition — every row lands in a real active segment, and
        the two pseudo-rings (segment + entry bucket) stay total."""
        from pulsar_spark.sources import (
            create_scalable_topic,
            key_shared_buckets,
            produce_scalable,
            read_scalable,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=4)
        payload = spark.createDataFrame(
            [(f"user-{i}",) for i in range(100)] + [(None,)], "k string"
        )
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        got = read_scalable(spark, d)
        assert got.count() == 101
        assert got.where(F.col("segment").isNull()).count() == 0
        same_key = got.where(F.col("key") == "user-7").select("segment").distinct()
        assert same_key.count() == 1  # same key -> same segment, always

        bucketed = key_shared_buckets(
            got.where(F.col("key").isNotNull()),
            splits=[16384, 32768],
            deterministic_mod=True,
        )
        assert bucketed.where(F.col("bucket").isNull()).count() == 0

    def test_unknown_segment_raises(self, tmp_path):
        from pulsar_spark.sources import SegmentGoneError, resolve_segment_lineage
        from pulsar_spark.sources.scalable import create_scalable_topic, scalable_metadata

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=1)
        with pytest.raises(SegmentGoneError):
            resolve_segment_lineage(99, 5, scalable_metadata(d))
