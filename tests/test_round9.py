"""Round-9 units: stored OffloadPolicies (Namespaces.setOffloadPolicies
Namespaces.java:4232), sidecar survival through the tiered rewrite, and
the ADVICE-r8 codec/ingestion hardening."""
import json
import os

import pytest
from pyspark.sql import functions as F

from pulsar_spark.sources import policies as P


def _topic(spark, tmp_path, n=40):
    from pulsar_spark.sources.topics import produce

    t = str(tmp_path / "events")
    rows = spark.createDataFrame(
        [(str(i), i, f"2024-01-{10 + i % 10:02d} 00:00:00") for i in range(n)],
        "key string, event_id bigint, ts string",
    ).withColumn("event_time", F.col("ts").cast("timestamp")).drop("ts")
    produce(rows, t, key_col="key", num_partitions=4, event_time_col="event_time")
    # rebase publish_time onto the deterministic event_time so age
    # policies are testable (produce mints wall-clock publish_time)
    df = spark.read.parquet(t).withColumn("publish_time", F.col("event_time"))
    df.write.mode("overwrite").partitionBy("partition").parquet(t + "_fixed")
    return t + "_fixed"


class TestOffloadPolicy:
    def test_enforcement_from_stored_policy(self, spark, tmp_path):
        t = _topic(spark, tmp_path)
        cold = str(tmp_path / "cold")
        P.set_policy(t, "offload_policies", {"cold_path": cold, "age_seconds": 5 * 86400})
        stats = P.run_offload_policy(spark, t, "2024-01-20 00:00:00")
        # rows with publish_time < 2024-01-15 are cold: i % 10 in 0..4
        assert stats["offloaded"] == 20
        assert spark.read.parquet(cold).count() == 20
        assert spark.read.parquet(t).count() == 20

    def test_policy_survives_the_rewrite_and_restart(self, spark, tmp_path):
        """The offload rewrite swaps the topic directory — every
        sidecar (_policies.json included) must survive, and a fresh
        process (re-read from disk) still sees the policy."""
        t = _topic(spark, tmp_path)
        cold = str(tmp_path / "cold")
        P.set_policy(t, "offload_policies", {"cold_path": cold, "age_seconds": 5 * 86400})
        P.set_policy(t, "message_ttl_seconds", 60)
        P.run_offload_policy(spark, t, "2024-01-20 00:00:00")
        pol = P.get_policies(t)
        assert pol["offload_policies"]["cold_path"] == cold
        assert pol["message_ttl_seconds"] == 60
        # second pass is a no-op, not a crash or a re-offload
        stats2 = P.run_offload_policy(spark, t, "2024-01-20 00:00:00")
        assert stats2["offloaded"] == 0

    def test_threshold_bytes_gates_the_pass(self, spark, tmp_path):
        t = _topic(spark, tmp_path)
        cold = str(tmp_path / "cold")
        P.set_policy(
            t,
            "offload_policies",
            {"cold_path": cold, "age_seconds": 5 * 86400, "threshold_bytes": 1 << 40},
        )
        stats = P.run_offload_policy(spark, t, "2024-01-20 00:00:00")
        assert stats["skipped"] and stats["hot_bytes"] < (1 << 40)
        assert not os.path.exists(cold)
        # above-threshold topics offload
        P.set_policy(
            t,
            "offload_policies",
            {"cold_path": cold, "age_seconds": 5 * 86400, "threshold_bytes": 10},
        )
        assert P.run_offload_policy(spark, t, "2024-01-20 00:00:00")["offloaded"] == 20

    def test_no_policy_returns_none(self, spark, tmp_path):
        t = _topic(spark, tmp_path)
        assert P.run_offload_policy(spark, t, "2024-01-20 00:00:00") is None

    def test_apply_policies_exposes_offload_plan(self, spark, tmp_path):
        t = _topic(spark, tmp_path)
        P.set_policy(t, "offload_policies", {"cold_path": str(tmp_path / "c"),
                                             "age_seconds": 5 * 86400})
        out = P.apply_policies(spark, t, "2024-01-20 00:00:00")
        assert out["offload_candidates"].count() == 20

    def test_unknown_key_still_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="unknown policy key"):
            P.set_policy(str(tmp_path), "offload_polices", {})
