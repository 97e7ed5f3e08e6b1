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


def _layout(tmp_path, n=4, name="coord"):
    from pulsar_spark.sources.scalable import create_scalable_topic, scalable_metadata

    d = str(tmp_path / name)
    create_scalable_topic(d, num_initial_segments=n)
    return d, scalable_metadata(d)


def _seg_ids(assignment):
    return sorted(s.segment_id for s in assignment.segments)


class TestSubscriptionCoordinator:
    """SubscriptionCoordinator port (SubscriptionCoordinator.java:66),
    mirrored on SubscriptionCoordinatorTest.java's cases."""

    def _coord(self, tmp_path, n=4, name="coord", **kw):
        from pulsar_spark.sources import SubscriptionCoordinator

        d, meta = _layout(tmp_path, n, name)
        return d, SubscriptionCoordinator("test-sub", d, layout=meta, **kw)

    def test_single_consumer_gets_all_segments(self, tmp_path):
        _, c = self._coord(tmp_path)
        r = c.register_consumer("c1", 1)
        assert _seg_ids(r["c1"]) == [0, 1, 2, 3]
        assert r["c1"].layout_epoch == 0

    def test_balanced_and_disjoint(self, tmp_path):
        _, c = self._coord(tmp_path)
        c.register_consumer("c1", 1)
        r = c.register_consumer("c2", 2)
        all_ids = _seg_ids(r["c1"]) + _seg_ids(r["c2"])
        assert sorted(all_ids) == [0, 1, 2, 3] and len(set(all_ids)) == 4
        assert len(r["c1"].segments) == 2 and len(r["c2"].segments) == 2

    def test_three_consumers_four_segments(self, tmp_path):
        _, c = self._coord(tmp_path)
        for i, n in enumerate(["c1", "c2", "c3"]):
            r = c.register_consumer(n, i)
        total = sum(len(a.segments) for a in r.values())
        assert total == 4
        ids = [s.segment_id for a in r.values() for s in a.segments]
        assert len(set(ids)) == 4  # no double assignment

    def test_unregister_rebalances(self, tmp_path):
        _, c = self._coord(tmp_path)
        c.register_consumer("c1", 1)
        c.register_consumer("c2", 2)
        r = c.unregister_consumer("c2")
        assert set(r) == {"c1"} and len(r["c1"].segments) == 4

    def test_layout_change_no_checker_assigns_all(self, tmp_path):
        from pulsar_spark.sources.scalable import scalable_metadata, split_segment

        d, c = self._coord(tmp_path)
        c.register_consumer("c1", 1)
        split_segment(d, 0)
        r = c.on_layout_change(scalable_metadata(d))
        # no drain checker: 5 active + 1 sealed = 6 (DAG replay)
        assert len(r["c1"].segments) == 6
        assert r["c1"].layout_epoch == 1

    def test_active_children_blocked_until_parent_drained(self, tmp_path):
        from pulsar_spark.sources import SubscriptionCoordinator
        from pulsar_spark.sources.scalable import scalable_metadata, split_segment

        d, meta = _layout(tmp_path, 4, "gated")
        drained = set()
        checker = lambda seg: int(seg["segment_id"]) in drained
        c = SubscriptionCoordinator("test-sub", d, layout=meta, drain_checker=checker)
        c.register_consumer("c1", 1)
        split_segment(d, 0)  # -> children 4, 5; parent 0 sealed
        r = c.on_layout_change(scalable_metadata(d))
        got = set(_seg_ids(r["c1"]))
        assert {0, 1, 2, 3} <= got, got
        assert 4 not in got and 5 not in got  # blocked: parent not drained
        # the drain poll discovers the drain and triggers rebalance
        drained.add(0)
        newly = c.poll_drain_status()
        assert newly == {0}
        r2 = c.compute_assignment()
        assert set(_seg_ids(r2["c1"])) == {0, 1, 2, 3, 4, 5}

    def test_drain_backoff_grows_and_resets_on_progress(self, tmp_path):
        from pulsar_spark.sources import SubscriptionCoordinator
        from pulsar_spark.sources.scalable import scalable_metadata, split_segment

        d, meta = _layout(tmp_path, 2, "backoff")
        drained = set()
        c = SubscriptionCoordinator(
            "s", d, layout=meta,
            drain_checker=lambda seg: int(seg["segment_id"]) in drained,
            drain_initial_delay_s=2.0, drain_max_delay_s=16.0,
        )
        c.register_consumer("c1", 1)
        split_segment(d, 0)
        c.on_layout_change(scalable_metadata(d))
        assert c.next_drain_delay_s() == 2.0  # progress event reset it
        for expect in (4.0, 8.0, 16.0, 16.0):  # no-progress polls double, cap
            c.poll_drain_status()
            assert c.next_drain_delay_s() == expect
        drained.add(0)
        c.poll_drain_status()  # progress: reset to initial
        assert c.next_drain_delay_s() == 2.0
        # fully drained topic: nothing left to check — the reference
        # RESETS the backoff when toCheck is empty (java:430); an idle
        # topic must not drift toward drain_max_delay_s
        for _ in range(4):
            assert c.poll_drain_status() == set()
            assert c.next_drain_delay_s() == 2.0

    def test_assignment_determinism(self, tmp_path):
        _, c1 = self._coord(tmp_path, name="det1")
        _, c2 = self._coord(tmp_path, name="det2")
        for c in (c1, c2):
            c.register_consumer("consumer-a", 1)
            c.register_consumer("consumer-b", 2)
        a1, a2 = c1.compute_assignment(), c2.compute_assignment()
        assert _seg_ids(a1["consumer-a"]) == _seg_ids(a2["consumer-a"])
        assert _seg_ids(a1["consumer-b"]) == _seg_ids(a2["consumer-b"])

    def test_reconnect_within_grace_preserves_assignment(self, tmp_path):
        _, c = self._coord(tmp_path, grace_period_s=60.0)
        c.register_consumer("c1", 1)
        before = c.register_consumer("c2", 2)
        c.on_consumer_disconnect("c1", now_ms=1000)
        assert set(c.sessions) == {"c1", "c2"}  # tracked during grace
        assert c.evict_expired(now_ms=30_000) == []  # inside grace
        after = c.register_consumer("c1", 99)  # reconnect cancels the grace timer
        assert _seg_ids(after["c1"]) == _seg_ids(before["c1"])
        assert c.sessions["c1"].connected and c.sessions["c1"].consumer_id == 99

    def test_expired_session_evicted_after_grace(self, tmp_path):
        _, c = self._coord(tmp_path, grace_period_s=60.0)
        c.register_consumer("c1", 1)
        c.register_consumer("c2", 2)
        c.on_consumer_disconnect("c1", now_ms=1000)
        assert c.evict_expired(now_ms=61_001) == ["c1"]
        assert set(c.sessions) == {"c2"}
        assert len(c.compute_assignment()["c2"].segments) == 4

    def test_restore_consumers_disconnected_with_fresh_grace(self, tmp_path):
        _, c = self._coord(tmp_path, grace_period_s=60.0)
        r = c.restore_consumers(["c1", "c2"], now_ms=1_000_000)
        assert set(r) == {"c1", "c2"}
        assert all(not s.connected for s in c.sessions.values())
        # fresh grace clock from restore time, regardless of prior downtime
        assert c.evict_expired(now_ms=1_000_000 + 59_000) == []
        # reconnect resumes the same assignment
        r2 = c.register_consumer("c1", 42)
        assert _seg_ids(r2["c1"]) == _seg_ids(r["c1"])
        assert c.sessions["c1"].connected
        # the never-reconnected one expires
        assert c.evict_expired(now_ms=1_000_000 + 61_000) == ["c2"]

    def test_install_drain_checker_after_restore(self, tmp_path):
        from pulsar_spark.sources import SubscriptionCoordinator
        from pulsar_spark.sources.scalable import scalable_metadata, split_segment

        d, meta = _layout(tmp_path, 2, "install")
        split_segment(d, 0)
        meta = scalable_metadata(d)
        c = SubscriptionCoordinator("s", d, layout=meta)  # restore path: no checker
        c.register_consumer("c1", 1)
        assert len(c.compute_assignment()["c1"].segments) == 4  # no gating
        c.install_drain_checker(lambda seg: False)
        got = set(_seg_ids(c.compute_assignment()["c1"]))
        assert 2 not in got and 3 not in got  # gating now binds
        c.install_drain_checker(None)  # no-op, never downgrade
        assert c.drain_checker is not None


class TestCoordinatorBuckets:
    """PIP-486 'segments first, entry-buckets absorb the surplus'
    (SubscriptionCoordinator.java:582, EntryBucketSplits.java)."""

    def _bucketed(self, tmp_path, name="bkt"):
        from pulsar_spark.sources import SubscriptionCoordinator, assign_entry_buckets
        from pulsar_spark.sources.scalable import scalable_metadata

        d, _ = _layout(tmp_path, 1, name)
        assign_entry_buckets(d, budget=4)  # one segment, N=4 buckets
        return d, SubscriptionCoordinator("s", d, layout=scalable_metadata(d))

    def test_entry_bucket_helpers(self):
        from pulsar_spark.sources import (
            bucket_ranges,
            buckets_for_budget,
            equal_width_splits,
        )

        assert buckets_for_budget(4, 1) == 4
        assert buckets_for_budget(7, 2) == 3
        assert buckets_for_budget(1, 8) == 1
        assert equal_width_splits(1) == []
        assert equal_width_splits(4) == [0x4000, 0x8000, 0xC000]
        assert bucket_ranges([]) == [(0, 0xFFFF)]
        assert bucket_ranges([0x4000, 0x8000, 0xC000]) == [
            (0, 0x3FFF), (0x4000, 0x7FFF), (0x8000, 0xBFFF), (0xC000, 0xFFFF)
        ]

    def test_lone_consumer_owns_bucketed_segment_whole(self, tmp_path):
        _, c = self._bucketed(tmp_path)
        r = c.register_consumer("c1", 1)
        assert len(r["c1"].segments) == 1
        assert r["c1"].segments[0].bucket_ranges == ()

    def test_surplus_fans_out_with_full_boundary_list(self, tmp_path):
        _, c = self._bucketed(tmp_path, "bkt2")
        c.register_consumer("c1", 1)
        r = c.register_consumer("c2", 2)
        for a in r.values():
            assert len(a.segments) == 1
            assert a.segments[0].segment_id == 0
            assert a.segments[0].bucket_ranges == (
                (0, 0x3FFF), (0x4000, 0x7FFF), (0x8000, 0xBFFF), (0xC000, 0xFFFF)
            )

    def test_fanout_caps_at_bucket_count_rest_idle(self, tmp_path):
        _, c = self._bucketed(tmp_path, "bkt3")
        for i in range(1, 6):
            r = c.register_consumer(f"c{i}", i)
        sharers = [n for n, a in r.items() if len(a.segments) == 1]
        idle = [n for n, a in r.items() if not a.segments]
        assert len(sharers) == 4 and len(idle) == 1

    def test_single_bucket_segments_have_no_ranges(self, tmp_path):
        from pulsar_spark.sources import SubscriptionCoordinator
        from pulsar_spark.sources.scalable import scalable_metadata

        d, _ = _layout(tmp_path, 2, "nobkt")
        c = SubscriptionCoordinator("s", d, layout=scalable_metadata(d))
        c.register_consumer("c1", 1)
        c.register_consumer("c2", 2)
        c.register_consumer("c3", 3)  # 3 consumers > 2 segments, N=1 each
        r = c.compute_assignment()
        owning = [a for a in r.values() if a.segments]
        assert len(owning) == 2  # capacity = 2 buckets total, one idles
        for a in owning:
            assert a.segments[0].bucket_ranges == ()


class TestDrainGatedOrderingAcrossSplit:
    """Two stream consumers attached across a split: per-key order is
    preserved because the child segment is withheld until the parent is
    drained for the subscription (SegmentDrainChecker.java:18 javadoc).
    The drain signal is the real one — a caller-held Checkpoint whose
    cursor reaches the sealed parent's end."""

    def test_children_gated_then_released_by_real_drain(self, spark, tmp_path):
        from pulsar_spark.sources import (
            SubscriptionCoordinator,
            checkpoint_drain_checker,
        )
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            create_scalable_topic,
            produce_scalable,
            read_from_checkpoint,
            scalable_metadata,
            split_segment,
        )

        d = str(tmp_path / "ordering")
        create_scalable_topic(d, num_initial_segments=2)
        payload = spark.range(300).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        split_segment(d, 0)  # children 2, 3
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        meta = scalable_metadata(d)

        # consumer cursor at the beginning: parent 0 NOT drained
        coord = SubscriptionCoordinator(
            "sub", d, layout=meta,
            drain_checker=checkpoint_drain_checker(spark, d, Checkpoint.earliest()),
        )
        coord.register_consumer("reader-a", 1)
        coord.register_consumer("reader-b", 2)
        coord.poll_drain_status()
        a = coord.compute_assignment()
        assigned = {s.segment_id for x in a.values() for s in x.segments}
        assert 0 in assigned and 1 in assigned  # sealed parent + sibling flow
        assert 2 not in assigned and 3 not in assigned  # gated children
        # 1:1 stream discipline: no segment on two consumers
        ids = [s.segment_id for x in a.values() for s in x.segments]
        assert len(ids) == len(set(ids))

        # the subscription drains the parent (cursor to end), checker
        # flips, poll discovers it, children become assignable
        _, consumed = read_from_checkpoint(spark, d, Checkpoint.earliest())
        coord.drain_checker = checkpoint_drain_checker(spark, d, consumed)
        newly = coord.poll_drain_status()
        assert 0 in newly
        a2 = coord.compute_assignment()
        assigned2 = {s.segment_id for x in a2.values() for s in x.segments}
        assert assigned2 == {0, 1, 2, 3}
        # per-key safety invariant: at no point was a child assigned
        # while its parent held unread rows for this subscription
        ids2 = [s.segment_id for x in a2.values() for s in x.segments]
        assert len(ids2) == len(set(ids2))

    def test_checkpoint_drain_checker_empty_and_partial(self, spark, tmp_path):
        from pulsar_spark.sources import checkpoint_drain_checker
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            create_scalable_topic,
            produce_scalable,
        )

        d = str(tmp_path / "drainck")
        create_scalable_topic(d, num_initial_segments=2)
        # never-produced topic: everything trivially drained
        chk = checkpoint_drain_checker(spark, d, Checkpoint.earliest())
        assert chk({"segment_id": 0}) and chk({"segment_id": 1})
        payload = spark.range(100).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        # cursor mid-segment: not drained; cursor past the end: drained
        chk2 = checkpoint_drain_checker(spark, d, Checkpoint({0: 1}))
        assert not chk2({"segment_id": 0})
        chk3 = checkpoint_drain_checker(spark, d, Checkpoint({0: 10_000}))
        assert chk3({"segment_id": 0})


class TestPngKernel:
    """Real PNG decode (multimodal.py _decode_png: stdlib zlib + numpy
    unfiltering, CRC-verified chunks) — moves png out of the stub tier
    to the same bar as the bmp/wav kernels."""

    def _chunk(self, typ, data):
        import struct
        import zlib

        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def _png(self, w, h, ctype, raw, extra=b""):
        import struct
        import zlib

        from pulsar_spark.functions.multimodal import _PNG_SIG

        return (
            _PNG_SIG
            + self._chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + extra
            + self._chunk(b"IDAT", zlib.compress(raw))
            + self._chunk(b"IEND", b"")
        )

    def test_roundtrip_random_rgb(self):
        import numpy as np

        from pulsar_spark.functions.multimodal import _decode_png, _encode_png

        px = np.random.RandomState(11).randint(0, 256, (13, 17, 3), dtype=np.uint8)
        assert np.array_equal(_decode_png(_encode_png(px)), px)

    def test_all_five_filters_unfilter_correctly(self):
        import numpy as np

        from pulsar_spark.functions.multimodal import _decode_png

        rng = np.random.RandomState(3)
        h, w, bpp = 5, 6, 3
        img = rng.randint(0, 256, (h, w, bpp), dtype=np.uint8)
        lines, prev = [], np.zeros(w * bpp, dtype=np.int32)
        for y, f in enumerate([0, 1, 2, 3, 4]):
            cur = img[y].reshape(-1).astype(np.int32)
            filt = np.zeros_like(cur)
            for x in range(len(cur)):
                a = cur[x - bpp] if x >= bpp else 0
                b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[x] = (cur[x] - pred) % 256
            lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
            prev = cur
        png = self._png(w, h, 2, b"".join(lines))
        assert np.array_equal(_decode_png(png), img)

    def test_gray_palette_rgba_normalize_to_rgb(self):
        import numpy as np

        from pulsar_spark.functions.multimodal import _decode_png

        rng = np.random.RandomState(5)
        g = rng.randint(0, 256, (4, 4, 1), dtype=np.uint8)
        png = self._png(4, 4, 0, b"".join(b"\x00" + g[y].tobytes() for y in range(4)))
        assert np.array_equal(_decode_png(png), np.repeat(g, 3, axis=2))
        pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
        idx = rng.randint(0, 8, (3, 5, 1), dtype=np.uint8)
        png = self._png(
            5, 3, 3,
            b"".join(b"\x00" + idx[y].tobytes() for y in range(3)),
            extra=self._chunk(b"PLTE", pal.tobytes()),
        )
        assert np.array_equal(_decode_png(png), pal[idx[:, :, 0]])
        rgba = rng.randint(0, 256, (4, 4, 4), dtype=np.uint8)
        png = self._png(4, 4, 6, b"".join(b"\x00" + rgba[y].tobytes() for y in range(4)))
        assert np.array_equal(_decode_png(png), rgba[:, :, :3])

    def test_crc_and_malformed_rejected(self):
        import numpy as np
        import pytest as _pytest

        from pulsar_spark.functions.multimodal import _decode_png, _encode_png

        px = np.zeros((2, 2, 3), np.uint8)
        good = bytearray(_encode_png(px))
        good[20] ^= 0xFF  # corrupt IHDR payload -> CRC mismatch
        with _pytest.raises(ValueError):
            _decode_png(bytes(good))
        with _pytest.raises(ValueError):
            _decode_png(b"nonsense")

    def test_decode_media_strict_png_and_resize(self, spark):
        import numpy as np

        from pulsar_spark.functions.multimodal import (
            _decode_png,
            _encode_png,
            attach_media,
            decode_media,
            resize_media,
        )

        px = np.full((6, 8, 3), (10, 200, 30), np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(_encode_png(px)))], "id bigint, payload binary"
        )
        media = attach_media(df, "payload", "image", "png", "id")
        row = decode_media(media, strict=True).collect()[0]
        assert (row.width, row.height, row.decode_ok) == (8, 6, True)
        assert round(row.feature[0] * 765) == 240  # channel sum via gray mean
        rrow = resize_media(media, 4, 3, strict=True).collect()[0]
        assert (rrow.width, rrow.height) == (4, 3)
        rpx = _decode_png(bytes(rrow.payload))
        assert rpx.shape == (3, 4, 3)
        assert np.array_equal(rpx[0, 0], [10, 200, 30])  # solid stays solid

    def test_corrupt_png_is_data_not_task_failure(self, spark):
        from pulsar_spark.functions.multimodal import attach_media, decode_media

        df = spark.createDataFrame(
            [(1, bytearray(b"\x89PNG\r\n\x1a\njunk"))], "id bigint, payload binary"
        )
        out = decode_media(attach_media(df, "payload", "image", "png", "id")).collect()
        assert out[0].decode_ok is False


class TestQueueRedeliveryLoop:
    """Iterated queue-consumer discipline (capi-v5 ProcessingTimeout
    sweep composed round after round): sweep -> redelivered frame ->
    ack -> next sweep. Attempt counts are monotone (+1 per sweep), the
    backoff schedule min(4*2^(n-1), 300)s binds exactly, and rows that
    exhaust maxRedeliverCount land in the DLQ via dlq_split — nothing
    is lost, nothing is double-counted."""

    def test_iterated_sweep_to_dlq(self, spark):
        from pulsar_spark.operators import (
            BackoffPolicy,
            ProcessingTimeoutPolicy,
            dlq_split,
            processing_timeout_redelivery,
        )

        n, max_redeliver = 80, 3
        base = "2024-01-01 00:00:00"
        pending = spark.range(n).selectExpr(
            "id AS event_id",
            "CAST(0 AS INT) AS redelivery_count",
            f"CAST('{base}' AS TIMESTAMP) AS publish_time",
        )
        pol = ProcessingTimeoutPolicy(
            timeout_s=60, redelivery_backoff=BackoffPolicy(4.0, 300.0, 2.0)
        )
        acked_total = 0
        for k in range(1, max_redeliver + 1):
            now = F.lit(base).cast("timestamp") + F.make_interval(
                hours=F.lit(k)
            )
            # processor acks event_id % 4 == k-1 this round; %4==3 is stuck
            ack = F.col("event_id") % 4 == (k - 1)
            n_before = pending.count()
            n_acked = pending.where(ack).count()
            acked_total += n_acked
            swept = processing_timeout_redelivery(
                pending, ack, pol, now=now
            ).cache()
            rows = swept.collect()
            # conservation: every unacked pending row is redelivered
            assert len(rows) == n_before - n_acked
            # attempt counts monotone: exactly k after the k-th sweep
            assert {r.redelivery_count for r in rows} == {k}
            # exact closed-form backoff: deliver_at = now + min(4*2^(k-1), 300)
            expected_delay = min(4.0 * 2 ** (k - 1), 300.0)
            now_val = spark.range(1).select(now.alias("t")).collect()[0].t
            for r in rows:
                assert (r.deliver_at - now_val).total_seconds() == expected_delay
            # next round: the redelivery becomes the new delivery —
            # its publish_time is the redelivered deliver_at
            pending = swept.withColumn("publish_time", F.col("deliver_at")).select(
                "event_id", "redelivery_count", "publish_time"
            )
        # rows that exhausted maxRedeliverCount go to the DLQ
        delivered, dlq = dlq_split(
            pending, F.col("redelivery_count") >= max_redeliver, max_redeliver
        )
        assert delivered.count() == 0  # everything left is exhausted
        dlq_rows = dlq.collect()
        assert all(r.event_id % 4 == 3 for r in dlq_rows)
        assert all(r.redelivery_count == max_redeliver for r in dlq_rows)
        # conservation across the whole loop: acked + DLQ == initial
        assert acked_total + len(dlq_rows) == n

    def test_timeout_zero_disables_sweep(self, spark):
        from pulsar_spark.operators import (
            ProcessingTimeoutPolicy,
            processing_timeout_redelivery,
        )

        pending = spark.range(10).selectExpr(
            "id AS event_id",
            "CAST(0 AS INT) AS redelivery_count",
            "CAST('2024-01-01' AS TIMESTAMP) AS publish_time",
        )
        pol = ProcessingTimeoutPolicy(timeout_s=0, redelivery_backoff=None)
        out = processing_timeout_redelivery(pending, F.lit(False), pol)
        assert out.count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("register"), st.integers(0, 5)),
        st.tuples(st.just("disconnect"), st.integers(0, 5)),
        st.tuples(st.just("evict"), st.integers(0, 200)),
        st.tuples(st.just("unregister"), st.integers(0, 5)),
        st.tuples(st.just("split"), st.integers(0, 3)),
        st.tuples(st.just("drain"), st.integers(0, 12)),
    ),
    min_size=1,
    max_size=25,
)


class TestCoordinatorProperties:
    """Property suite over the ConsumerSession/SubscriptionCoordinator
    state machine (stretch item: lifecycle feeding the assignment
    function). Invariants hold under ANY operation interleaving:
    determinism, 1:1 stream discipline, the parent-drain gate, and
    grace-period eviction correctness."""

    @settings(max_examples=40, deadline=None)
    @given(ops=_OPS)
    def test_lifecycle_invariants(self, ops, tmp_path_factory):
        from pulsar_spark.sources import SubscriptionCoordinator
        from pulsar_spark.sources.scalable import (
            create_scalable_topic,
            scalable_metadata,
            split_segment,
        )

        d = str(tmp_path_factory.mktemp("prop") / "t")
        create_scalable_topic(d, num_initial_segments=2)
        drained: set[int] = set()
        c = SubscriptionCoordinator(
            "s",
            d,
            layout=scalable_metadata(d),
            grace_period_s=60.0,
            drain_checker=lambda seg: int(seg["segment_id"]) in drained,
        )
        clock = 0
        for op, arg in ops:
            clock += 1000
            if op == "register":
                c.register_consumer(f"c{arg}", arg)
            elif op == "disconnect":
                c.on_consumer_disconnect(f"c{arg}", now_ms=clock)
            elif op == "evict":
                clock += arg * 1000
                evicted = c.evict_expired(now_ms=clock)
                for name in evicted:  # only grace-expired sessions go
                    assert name not in c.sessions
            elif op == "unregister":
                c.unregister_consumer(f"c{arg}")
            elif op == "split":
                meta = c.layout
                actives = [
                    s for s in meta["segments"].values()
                    if s["state"] == "ACTIVE" and s["end"] - s["start"] + 1 >= 2
                ]
                if actives:
                    target = actives[arg % len(actives)]
                    split_segment(d, target["segment_id"])
                    c.on_layout_change(scalable_metadata(d))
            elif op == "drain":
                drained.add(arg)
                c.poll_drain_status()

            # --- invariants after every step ---
            a1 = c.compute_assignment()
            a2 = c.compute_assignment()
            assert a1 == a2  # deterministic
            seg_owners: dict[int, int] = {}
            for assignment in a1.values():
                for s in assignment.segments:
                    if s.bucket_ranges == ():  # whole-segment assignment
                        seg_owners[s.segment_id] = seg_owners.get(s.segment_id, 0) + 1
            assert all(v == 1 for v in seg_owners.values())  # 1:1 discipline
            # parent-drain gate: an assigned ACTIVE segment never has an
            # undrained in-layout parent
            layout_ids = {
                int(s["segment_id"]) for s in c.layout["segments"].values()
            }
            by_id = {int(s["segment_id"]): s for s in c.layout["segments"].values()}
            for sid in seg_owners:
                seg = by_id[sid]
                if seg["state"] == "ACTIVE":
                    for pid in seg["parent_ids"]:
                        assert int(pid) not in layout_ids or int(pid) in drained
            # sessions tracked during grace, never negative state
            for s in c.sessions.values():
                assert s.connected or s.disconnected_at_ms is not None


class TestReviewFixesRound5:
    """Regressions for the round-5 code-review findings."""

    def test_latest_checkpoint_is_drained_everywhere(self, spark, tmp_path):
        # SegmentDrainChecker.java:33-35: a Latest cursor is created at
        # the end of every segment, so the drain check completes
        # immediately — split children must not be gated forever.
        from pulsar_spark.sources import (
            SubscriptionCoordinator,
            checkpoint_drain_checker,
        )
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            scalable_metadata,
            split_segment,
        )

        d = _mk_topic(spark, tmp_path, name="latest")
        split_segment(d, 0)
        chk = checkpoint_drain_checker(spark, d, Checkpoint.latest())
        assert chk({"segment_id": 0})  # sealed parent with data: drained
        c = SubscriptionCoordinator(
            "s", d, layout=scalable_metadata(d), drain_checker=chk
        )
        c.register_consumer("c1", 1)
        c.poll_drain_status()
        got = {s.segment_id for a in c.compute_assignment().values() for s in a.segments}
        assert got == {0, 1, 2}  # children assignable immediately

    def test_shared_highs_reused_by_checker(self, spark, tmp_path):
        from pulsar_spark.sources import checkpoint_drain_checker
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            segment_high_watermarks,
        )

        d = _mk_topic(spark, tmp_path, n_rows=50, name="highs")
        highs = segment_high_watermarks(spark, d)
        assert highs == {0: 49}
        consumed = Checkpoint({sid: hi + 1 for sid, hi in highs.items()})
        chk = checkpoint_drain_checker(spark, d, consumed, highs=highs)
        assert chk({"segment_id": 0})

    def test_png_decompression_bomb_rejected(self):
        import struct
        import zlib

        import pytest as _pytest

        from pulsar_spark.functions.multimodal import _PNG_SIG, _decode_png

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        # declared 20000x20000 with a tiny IDAT: rejected BEFORE inflate
        bomb = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError, match="decode cap"):
            _decode_png(bomb)
        # honest small dims but an oversized deflate stream: bounded
        # inflate detects without materializing
        over = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 100_000))
            + chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError, match="length mismatch"):
            _decode_png(over)

    def test_autoscale_pinned_clock_merge_coherent(self, spark, tmp_path):
        # autoscale_tick with a pinned now_ms must not let wall-clock
        # sample mtimes corrupt the merge-window math: a freshly hot
        # pair is NOT "durably cold" under a future-pinned clock.
        from pulsar_spark.sources import AutoScaleConfig, autoscale_tick

        d = _mk_topic(spark, tmp_path, n_segments=2, name="pin")
        cfg = AutoScaleConfig(
            split_msg_rate_in=1e12,  # never split
            merge_msg_rate_in=1e12,  # any load counts as cold by RATE
            merge_window_s=600.0,
            min_segments=1,
        )
        far_future = 4_000_000_000_000  # ~2096, way past any wall clock
        out = autoscale_tick(
            spark, d, window_s=float(2**32), config=cfg, apply=False,
            now_ms=far_future,
        )
        # samples were written THIS tick: wall-age ~0s < mergeWindow, so
        # no merge despite the pinned clock being far in the future
        assert out["decision"] == "none"


class TestSealedSegmentGC:
    """Sealed-segment GC (ScalableTopicController.runGcTickAsync,
    ScalableTopicController.java:1125 + SegmentLayout.pruneSegment:250):
    sealed past retention + drained by EVERY subscription -> pruned from
    the DAG in one coalesced sidecar write, backing storage deleted."""

    def test_gc_prunes_drained_sealed_segment(self, spark, tmp_path):
        import os

        from pulsar_spark.sources import gc_sealed_segments, segment_high_watermarks
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            scalable_metadata,
            split_segment,
        )

        d = _mk_topic(spark, tmp_path, n_segments=2, name="gc")
        split_segment(d, 0)  # seals 0 -> children 2, 3
        # retain-forever: no GC
        assert gc_sealed_segments(spark, d, None) == []
        # undrained subscription blocks the prune
        subs = {"s1": Checkpoint.earliest()}
        assert gc_sealed_segments(spark, d, 0, subs) == []
        assert "0" in scalable_metadata(d)["segments"]
        # opaque CHECKPOINT subscription (position invisible) blocks too
        consumed = Checkpoint(
            {sid: hi + 1 for sid, hi in segment_high_watermarks(spark, d).items()}
        )
        assert gc_sealed_segments(spark, d, 0, {"s1": consumed, "s2": None}) == []
        # fully drained everywhere: pruned
        epoch_before = scalable_metadata(d)["epoch"]
        assert gc_sealed_segments(spark, d, 0, {"s1": consumed}) == [0]
        meta = scalable_metadata(d)
        assert "0" not in meta["segments"]
        assert meta["epoch"] == epoch_before + 1
        # children's parent edges rewritten -> coordinator treats them
        # as unblocked (pruned parent == drained)
        for cid in ("2", "3"):
            assert meta["segments"][cid]["parent_ids"] == []
        assert not os.path.exists(os.path.join(d, "segment=0"))
        # idempotent: second tick finds nothing
        assert gc_sealed_segments(spark, d, 0, {"s1": consumed}) == []

    def test_gc_latest_cursor_counts_as_drained(self, spark, tmp_path):
        from pulsar_spark.sources import gc_sealed_segments
        from pulsar_spark.sources.scalable import Checkpoint, split_segment

        d = _mk_topic(spark, tmp_path, name="gclatest")
        split_segment(d, 0)
        assert gc_sealed_segments(spark, d, 0, {"s1": Checkpoint.latest()}) == [0]

    def test_gc_dataless_sealed_segment_prunes_without_drain(self, spark, tmp_path):
        from pulsar_spark.sources import gc_sealed_segments
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            create_scalable_topic,
            split_segment,
        )

        d = str(tmp_path / "gcempty")
        create_scalable_topic(d, num_initial_segments=1)
        split_segment(d, 0)  # sealed parent never held data
        assert gc_sealed_segments(spark, d, 0, {"s1": Checkpoint.earliest()}) == [0]

    def test_retention_window_gates_gc(self, spark, tmp_path):
        from pulsar_spark.sources import gc_sealed_segments
        from pulsar_spark.sources.scalable import Checkpoint, split_segment

        d = _mk_topic(spark, tmp_path, name="gcret")
        split_segment(d, 0)
        # 1-hour retention, clock just after the seal: not yet eligible
        assert (
            gc_sealed_segments(spark, d, 3_600_000, {"s": Checkpoint.latest()}) == []
        )


class TestCooldownSeeding:
    """seedAutoScaleCooldownsFromLayout (ScalableTopicController.java:207):
    with no persisted tick state, the clocks seed from segment lineage so
    a fresh controller does not re-split right after a manual split."""

    def test_seed_from_layout(self, tmp_path):
        from pulsar_spark.sources import seed_cooldowns_from_layout
        from pulsar_spark.sources.scalable import (
            create_scalable_topic,
            merge_segments,
            scalable_metadata,
            split_segment,
        )

        d = str(tmp_path / "seed")
        create_scalable_topic(d, num_initial_segments=2)
        assert seed_cooldowns_from_layout(scalable_metadata(d)) == {
            "last_split_at_ms": None,
            "last_merge_at_ms": None,
        }
        split_segment(d, 0)  # children 2, 3 (1 parent each)
        seeded = seed_cooldowns_from_layout(scalable_metadata(d))
        assert seeded["last_split_at_ms"] is not None
        assert seeded["last_merge_at_ms"] is None
        merge_segments(d, 2, 3)  # child 4 (2 parents)
        seeded = seed_cooldowns_from_layout(scalable_metadata(d))
        assert seeded["last_merge_at_ms"] is not None

    def test_fresh_tick_respects_lineage_cooldown(self, spark, tmp_path):
        # Wall frame: the lineage stamp's AGE is what gates the tick (a
        # pinned clock preserves wall-age by design, so fast-forwarding
        # now_ms cannot skip a cooldown — only real elapsed time can).
        from pulsar_spark.sources import AutoScaleConfig, autoscale_tick
        from pulsar_spark.sources.scalable import (
            _write_meta,
            scalable_metadata,
            split_segment,
        )

        d = _mk_topic(spark, tmp_path, n_segments=2, name="seedtick")
        split_segment(d, 1)  # a manual split moments ago; NO state file
        cfg = AutoScaleConfig(split_msg_rate_in=1e-9, split_cooldown_s=30.0)
        out = autoscale_tick(spark, d, window_s=float(2**32), config=cfg)
        # segment 0 is still hot, but the lineage-seeded split clock is
        # ~now, so the tick is inside the cooldown
        assert out["decision"] == "none"
        # age the split lineage past the cooldown (stand-in for waiting)
        meta = scalable_metadata(d)
        for s in meta["segments"].values():
            if len(s["parent_ids"]) == 1:
                s["created_at_ms"] -= 40_000
        _write_meta(d, meta)
        out2 = autoscale_tick(spark, d, window_s=float(2**32), config=cfg)
        assert out2["decision"] == "split"


class TestCumulativeAckVector:
    """Cross-segment cumulative ack (ScalableStreamConsumer position
    vectors): acking message k advances every segment to the latest
    position delivered before it — and the plan is TakeOrdered (top-k),
    not a global sort."""

    def test_vector_matches_manual_interleave(self, spark, messages):
        from pulsar_spark.sources import cumulative_ack_vector

        rows = sorted(
            messages.select("partition", "offset").collect(),
            key=lambda r: (r.offset, r.partition),
        )
        k = 137
        expected = {}
        for r in rows[:k]:
            expected[r.partition] = max(expected.get(r.partition, -1), r.offset)
        got = {
            r.partition: r.acked_offset
            for r in cumulative_ack_vector(messages, k, segment_col="partition").collect()
        }
        assert got == expected

    def test_plan_is_take_ordered_not_global_sort(self, spark, messages):
        from pulsar_spark.sources import cumulative_ack_vector

        plan = cumulative_ack_vector(
            messages, 100, segment_col="partition"
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_ack_zero_and_past_end(self, spark, messages):
        from pulsar_spark.sources import cumulative_ack_vector

        assert cumulative_ack_vector(messages, 0, segment_col="partition").count() == 0
        n = messages.count()
        full = cumulative_ack_vector(messages, n, segment_col="partition")
        per_seg = messages.groupBy("partition").agg(F.max("offset").alias("m"))
        assert {
            (r.partition, r.acked_offset) for r in full.collect()
        } == {(r.partition, r.m) for r in per_seg.collect()}


class TestReadAssignment:
    """read_assignment: a consumer scans exactly its assigned segments,
    and the segment membership filter reaches the scan as storage
    PARTITION PRUNING (the distribution property the reference gets
    from per-segment topics)."""

    def test_scan_covers_exactly_assignment_and_prunes(self, spark, tmp_path):
        from pulsar_spark.sources import SubscriptionCoordinator, read_assignment
        from pulsar_spark.sources.scalable import scalable_metadata

        d = _mk_topic(spark, tmp_path, n_rows=400, n_segments=4, name="readassign")
        c = SubscriptionCoordinator("s", d, layout=scalable_metadata(d))
        c.register_consumer("c1", 1)
        r = c.register_consumer("c2", 2)
        seen = {}
        for name in ("c1", "c2"):
            df = read_assignment(spark, d, r[name])
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "PartitionFilters" in plan and "segment" in plan
            for row in df.select("segment", "offset", "key").collect():
                seen.setdefault((row.segment, row.offset), []).append(name)
            got_segs = {x.segment for x in df.select("segment").distinct().collect()}
            assert got_segs <= {s.segment_id for s in r[name].segments}
        # the two consumers' views partition the log: no row twice, none lost
        from pulsar_spark.sources.scalable import read_scalable

        total = read_scalable(spark, d).count()
        assert len(seen) == total
        assert all(len(v) == 1 for v in seen.values())

    def test_empty_assignment_reads_nothing(self, spark, tmp_path):
        from pulsar_spark.sources import ConsumerAssignment, read_assignment

        d = _mk_topic(spark, tmp_path, name="readempty")
        assert read_assignment(spark, d, ConsumerAssignment(0, ())).count() == 0


class TestRagChunking:
    """chunk_documents: overlapping token windows with stable identity;
    coverage and overlap invariants, no UDFs in the plan."""

    def test_windows_cover_and_overlap(self, spark):
        from pulsar_spark.functions import chunk_documents

        text = " ".join(f"w{i}" for i in range(150))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=64, overlap_tokens=16).collect(),
            key=lambda r: r.chunk_index,
        )
        # starts at 0, 48, 96 -> 3 chunks; the 144-start window (6
        # tokens, all inside chunk 2's 16-token overlap reach) is a
        # strict sub-span of chunk 2 and is dropped, not re-indexed
        assert [r.chunk_index for r in rows] == [0, 1, 2]
        assert [r.n_chunk_tokens for r in rows] == [64, 64, 54]
        # consecutive chunks share exactly the overlap
        t0 = rows[0].chunk_text.split(" ")
        t1 = rows[1].chunk_text.split(" ")
        assert t0[-16:] == t1[:16]
        # concatenating stride-sized prefixes reconstructs the doc
        recon = []
        for r in rows[:-1]:
            recon.extend(r.chunk_text.split(" ")[:48])
        recon.extend(rows[-1].chunk_text.split(" "))
        assert recon == text.split(" ")

    def test_empty_and_short_docs(self, spark):
        from pulsar_spark.functions import chunk_documents

        df = spark.createDataFrame(
            [(1, ""), (2, "only three tokens")], "doc_id bigint, text string"
        )
        rows = chunk_documents(df, chunk_tokens=64, overlap_tokens=16).collect()
        assert len(rows) == 1  # empty doc yields nothing
        assert rows[0].doc_id == 2 and rows[0].n_chunk_tokens == 3

    def test_rejects_degenerate_stride(self, spark):
        import pytest as _pytest

        from pulsar_spark.functions import chunk_documents

        df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        with _pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=8, overlap_tokens=8)

    def test_no_python_udf_in_plan(self, spark, documents):
        from pulsar_spark.functions import chunk_documents

        plan = chunk_documents(documents)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCheckpointAcrossGC:
    """V5CheckpointConsumerSkipDeletedSegmentTest mirror: a checkpoint
    holding a position for a segment that GC has since pruned resumes
    silently — no error, no rows from the deleted segment, no loss on
    the surviving segments."""

    def test_resume_skips_pruned_segment(self, spark, tmp_path):
        from pulsar_spark.sources import gc_sealed_segments, segment_high_watermarks
        from pulsar_spark.sources.scalable import (
            Checkpoint,
            create_scalable_topic,
            produce_scalable,
            read_from_checkpoint,
            split_segment,
        )

        d = str(tmp_path / "ckgc")
        create_scalable_topic(d, num_initial_segments=2)
        payload = spark.range(200).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        # a consumer checkpoints mid-log: segment 0 at its end, segment 1
        # partially read
        highs = segment_high_watermarks(spark, d)
        ck = Checkpoint({0: highs[0] + 1, 1: 5})
        split_segment(d, 0)
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        # GC prunes the drained sealed parent (this subscription drained it)
        consumed_everything = Checkpoint(
            {sid: hi + 1 for sid, hi in segment_high_watermarks(spark, d).items()}
        )
        assert gc_sealed_segments(spark, d, 0, {"s": consumed_everything}) == [0]
        # resume from the PRE-GC checkpoint: the stale segment-0 entry is
        # ignored (its data is gone), the rest resumes exactly
        df, advanced = read_from_checkpoint(spark, d, ck)
        segs = {r.segment for r in df.select("segment").distinct().collect()}
        assert 0 not in segs
        assert df.where("segment = 1").where("offset < 5").count() == 0  # no re-read
        # every surviving row past the vector is delivered (children from 0)
        assert df.where("segment = 2").count() > 0 or df.where("segment = 3").count() > 0
        # the advanced vector is usable: next resume returns nothing new
        df2, _ = read_from_checkpoint(spark, d, advanced)
        assert df2.count() == 0


class TestPretrainingPipelineV4:
    """Capstone v4 — gopher gate -> trained classifier gate ->
    temperature mix -> packed shards. Value parity runs in
    tools/verify_oracle.py / test_oracle_parity; these are the
    structural invariants."""

    def test_stagewise_containment_and_bins(self, spark):
        from pyspark.sql import functions as F

        import __spark_entry__ as e
        from pulsar_spark.sources import load_table
        from pulsar_spark.functions.text import gopher_rules

        from tests.conftest import SF_DIR

        out = e.queries()["pretraining_pipeline_v4"](spark, SF_DIR)
        rows = out.collect()
        assert rows, "pipeline produced no shards"
        # bin ids contiguous from 0 per shard; every bin non-empty
        by_shard: dict = {}
        for r in rows:
            assert r.n_docs > 0 and r.sum_tokens > 0 and r.shard_text
            by_shard.setdefault(r.shard, []).append(r.bin_id)
        for bins in by_shard.values():
            assert sorted(bins) == list(range(len(bins)))
        assert set(by_shard) <= set(range(4))
        # the packed corpus is a subset of the gopher-passing corpus
        docs = load_table(spark, SF_DIR, "documents")
        n_gate = gopher_rules(docs).where("gopher_pass").count()
        total_docs = sum(r.n_docs for r in rows)
        assert 0 < total_docs <= n_gate


class TestCurateCLI:
    """`python -m pulsar_spark curate` — thin shim over the v4 recipe."""

    def test_curate_end_to_end(self, spark, tmp_path, capsys):
        from pulsar_spark.__main__ import main

        from tests.conftest import SF_DIR

        out_dir = str(tmp_path / "curated")
        main(
            [
                "curate", f"{SF_DIR}/documents.parquet",
                "--out", out_dir,
                "--shards", "4", "--seq-len", "256", "--total-rows", "150",
            ]
        )
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["docs_in"] == 500
        assert 0 < stats["docs_packed"] <= stats["docs_in"]
        assert stats["bins"] > 0 and stats["tokens"] > 0
        written = spark.read.parquet(out_dir)
        # hive-partitioned by shard; bins carry the packed text
        assert "shard" in written.columns and "shard_text" in written.columns
        assert written.where("n_docs <= 0").count() == 0


class TestCurateCorpusSeeds:
    def test_shared_seed_rejected(self, spark):
        from pulsar_spark.functions.curation import curate_corpus

        docs = spark.createDataFrame(
            [(0, "a b c", "s", 5)], "doc_id bigint, text string, source string, n_chars bigint"
        )
        with pytest.raises(ValueError, match="must differ"):
            curate_corpus(docs, total_rows=10, mix_seed=7, shuffle_seed=7)

    def test_cli_same_seed_override_rejected(self, spark, tmp_path):
        from pulsar_spark.__main__ import main

        from tests.conftest import SF_DIR

        with pytest.raises(ValueError, match="must differ"):
            main(
                [
                    "curate", f"{SF_DIR}/documents.parquet",
                    "--out", str(tmp_path / "x"),
                    "--seed", "5", "--shuffle-seed", "5",
                ]
            )
