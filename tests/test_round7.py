"""Round-7 tests: ADVICE fixes (atomic subscription registry, latest
sentinel guard, PR-curve NULL scores), per-segment admin verbs,
perceptual image hashing, and the other round-7 operators."""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- ADVICE fixes


class TestAtomicSubscriptionRegistry:
    def _mk_topic(self, spark, tmp_path):
        from pulsar_spark.sources.scalable import create_scalable_topic

        topic = str(tmp_path / "topic")
        create_scalable_topic(topic, num_initial_segments=2)
        return topic

    def test_write_is_atomic_no_temp_leftovers(self, spark, tmp_path):
        from pulsar_spark.sources.scalable import (
            _read_subscriptions,
            _write_subscriptions,
        )

        topic = self._mk_topic(spark, tmp_path)
        _write_subscriptions(topic, {"a": {"type": "Stream"}})
        assert _read_subscriptions(topic) == {"a": {"type": "Stream"}}
        leftovers = [f for f in os.listdir(topic) if f.startswith("_subs_")]
        assert leftovers == []

    def test_failed_write_keeps_previous_registry(self, spark, tmp_path):
        from pulsar_spark.sources.scalable import (
            _read_subscriptions,
            _write_subscriptions,
        )

        topic = self._mk_topic(spark, tmp_path)
        _write_subscriptions(topic, {"a": {"type": "Stream"}})

        class Boom:  # not JSON-serializable -> json.dump raises mid-write
            pass

        with pytest.raises(TypeError):
            _write_subscriptions(topic, {"b": Boom()})
        # the durable store is untouched and no temp files leak
        assert _read_subscriptions(topic) == {"a": {"type": "Stream"}}
        leftovers = [f for f in os.listdir(topic) if f.startswith("_subs_")]
        assert leftovers == []
        # and the registry file is still valid JSON
        with open(os.path.join(topic, "_subscriptions.json")) as fh:
            json.load(fh)


class TestCheckpointStartFilterLatestGuard:
    def test_latest_sentinel_raises(self, spark):
        from pulsar_spark.sources.scalable import Checkpoint, checkpoint_start_filter

        df = spark.range(3).select(
            F.col("id").cast("int").alias("segment"), F.col("id").alias("offset")
        )
        with pytest.raises(ValueError, match="LATEST sentinel"):
            checkpoint_start_filter(df, Checkpoint.latest())

    def test_empty_earliest_still_full(self, spark):
        from pulsar_spark.sources.scalable import Checkpoint, checkpoint_start_filter

        df = spark.range(3).select(
            F.col("id").cast("int").alias("segment"), F.col("id").alias("offset")
        )
        assert checkpoint_start_filter(df, Checkpoint.earliest()).count() == 3


class TestPrCurveNullScores:
    def test_null_score_positive_label_is_false_negative(self, spark):
        from pulsar_spark.functions.classifier import pr_curve

        scored = spark.createDataFrame(
            [(0.9, 1), (0.9, 0), (None, 1), (None, 0)],
            "score double, label int",
        )
        row = {
            r["threshold"]: r
            for r in pr_curve(scored, thresholds=(0.5,)).collect()
        }[0.5]
        # NULL scores never predict positive; the NULL-score y=1 row
        # lands in fn so recall's denominator stays tp+fn = all positives
        assert row["n_pred_pos"] == 2
        assert row["tp"] == 1
        assert row["fp"] == 1
        assert row["fn"] == 1
        assert row["recall"] == 0.5


class TestSubscribeAssignedEmptyAssignment:
    def test_empty_assignment_is_false_predicate(self, spark, tmp_path):
        """An empty assignment must be a false filter (works in any
        output mode), not a streaming global limit(0)."""
        from pulsar_spark.sources.coordinator import ConsumerAssignment
        from pulsar_spark.sources.scalable import (
            create_scalable_topic,
            produce_scalable,
        )
        from pulsar_spark.streaming.subscribe import subscribe_assigned

        topic = str(tmp_path / "topic")
        create_scalable_topic(topic, num_initial_segments=2)
        rows = spark.createDataFrame(
            [(str(i), f"v{i}") for i in range(8)], "key string, value string"
        )
        produce_scalable(rows, topic)
        stream = subscribe_assigned(
            spark, topic, ConsumerAssignment(layout_epoch=1, segments=())
        )
        assert stream.isStreaming
        # limit(0) would appear as GlobalLimit in the logical plan
        plan = stream._jdf.queryExecution().logical().toString()
        assert "GlobalLimit" not in plan

    def test_calibration_bins_exported(self):
        import pulsar_spark.functions as pf

        assert hasattr(pf, "calibration_bins")
        assert "calibration_bins" in pf.__all__
