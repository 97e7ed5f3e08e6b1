"""Round-5 additions: autoscale tick composition (cooldown clocks),
segment_load_stats `now` pinning, and the CLI autoscale path.

Reference: pulsar-broker/.../service/scalable/ScalableTopicController.java
persists lastSplitAt/lastMergeAt per topic so the evaluator's cooldowns
coalesce actions ACROSS ticks; AutoScalePolicyEvaluator.decide itself is
pure and takes the clocks as inputs.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

NOW = 10_000_000_000  # fixed epoch-ms clock for deterministic cooldown math


def _mk_topic(spark, tmp_path, n_rows=200, n_segments=1, name="t"):
    from pulsar_spark.sources.scalable import create_scalable_topic, produce_scalable

    d = str(tmp_path / name)
    create_scalable_topic(d, num_initial_segments=n_segments)
    payload = spark.range(n_rows).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    produce_scalable(payload, d, key_col="k", deterministic_mod=True)
    return d


class TestSegmentLoadStatsNow:
    """Regression for the `now` parameter: `col or default` invoked
    Column.__bool__ (always raises in PySpark), so every non-None `now`
    crashed. All three input kinds must work."""

    def test_str_now_pinned(self, spark, tmp_path):
        from pulsar_spark.sources import segment_load_stats

        d = _mk_topic(spark, tmp_path)
        # far-future now, 60 s window: every row aged out -> zero rates
        out = segment_load_stats(spark, d, window_s=60.0, now="2100-01-01 00:00:00")
        assert set(out) == {0}
        assert out[0].msg_rate_in == 0.0

    def test_str_now_wide_window_exact(self, spark, tmp_path):
        from pulsar_spark.sources import segment_load_stats

        d = _mk_topic(spark, tmp_path, n_rows=256)
        # 2^32 s window back from 2100 covers any produce time, and the
        # power-of-two denominator keeps count/window exact in binary
        out = segment_load_stats(
            spark, d, window_s=float(2**32), now="2100-01-01 00:00:00"
        )
        assert out[0].msg_rate_in == 256 / float(2**32)

    def test_column_now(self, spark, tmp_path):
        from pulsar_spark.sources import segment_load_stats

        d = _mk_topic(spark, tmp_path)
        out = segment_load_stats(
            spark,
            d,
            window_s=float(2**32),
            now=F.lit("2100-01-01 00:00:00").cast("timestamp"),
        )
        assert out[0].msg_rate_in > 0.0


class TestAutoscaleTickCooldowns:
    """autoscale_tick persists the action clock; the next tick within
    splitCooldown/mergeCooldown must be suppressed even though the load
    still warrants action (ScalableTopicController tick coalescing)."""

    def _cfg(self):
        from pulsar_spark.sources import AutoScaleConfig

        return AutoScaleConfig(
            split_msg_rate_in=1e-9, split_cooldown_s=30.0, max_segments=8
        )

    def test_tick_twice_split_suppressed(self, spark, tmp_path):
        from pulsar_spark.sources import autoscale_tick, load_autoscale_state

        # Two initial segments, both hot: after tick 1 splits the hottest,
        # the OTHER segment still warrants a split — only the persisted
        # cooldown clock can suppress tick 2 (split children start empty,
        # so a 1-segment fixture would go quiet for the wrong reason).
        d = _mk_topic(spark, tmp_path, n_segments=2)
        cfg = self._cfg()
        win = float(2**32)
        out1 = autoscale_tick(
            spark, d, window_s=win, config=cfg, apply=True, now_ms=NOW
        )
        assert out1["decision"] == "split" and len(out1["children"]) == 2
        first_target = out1["segment"]
        assert load_autoscale_state(d)["last_split_at_ms"] == NOW

        # 10 s later: the other original segment is still hot, but the
        # tick is inside the 30 s cooldown -> none
        out2 = autoscale_tick(
            spark, d, window_s=win, config=cfg, apply=True, now_ms=NOW + 10_000
        )
        assert out2["decision"] == "none"
        # clock untouched by a no-op tick
        assert load_autoscale_state(d)["last_split_at_ms"] == NOW

        # 40 s later: cooldown expired, the other hot segment splits
        out3 = autoscale_tick(
            spark, d, window_s=win, config=cfg, apply=True, now_ms=NOW + 40_000
        )
        assert out3["decision"] == "split"
        assert out3["segment"] != first_target
        assert load_autoscale_state(d)["last_split_at_ms"] == NOW + 40_000

    def test_merge_cooldown_persisted(self, spark, tmp_path):
        from pulsar_spark.sources import (
            load_autoscale_state,
            record_autoscale_action,
        )

        d = _mk_topic(spark, tmp_path)
        record_autoscale_action(d, "merge", NOW)
        st = load_autoscale_state(d)
        assert st["last_merge_at_ms"] == NOW and st["last_split_at_ms"] is None
        record_autoscale_action(d, "split", NOW + 5)
        st = load_autoscale_state(d)
        assert st["last_merge_at_ms"] == NOW and st["last_split_at_ms"] == NOW + 5
        with pytest.raises(ValueError):
            record_autoscale_action(d, "nonsense", NOW)


class TestAutoscaleCLI:
    """Tick-twice through the CLI path: the second --apply invocation
    must be suppressed by splitCooldown via the persisted state file."""

    def test_cli_tick_twice(self, spark, tmp_path, capsys):
        from pulsar_spark.__main__ import main

        d = _mk_topic(spark, tmp_path, name="cli")
        argv = [
            "autoscale", d,
            "--window", str(float(2**32)),
            "--split-msg-rate", "1e-9",
            "--apply",
        ]
        main(argv)
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["decision"] == "split"
        # immediately again: wall clock is well inside the 30 s cooldown
        main(argv)
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["decision"] == "none"
