"""Round-6 additions: subscription lifecycle (create/clearBacklog/
delete, ScalableTopicController.java:851/:870/:941), the classifier
PR-curve sweep, and the corpus_report dataset card."""

import pytest
from pyspark.sql import functions as F


class TestSubscriptionLifecycle:
    def _topic(self, spark, tmp_path, n=200, segments=2):
        from pulsar_spark.sources import create_scalable_topic, produce_scalable

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=segments)
        payload = spark.range(n).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        return d, payload

    def test_create_is_idempotent(self, spark, tmp_path):
        from pulsar_spark.sources import create_subscription, list_subscriptions

        d, _ = self._topic(spark, tmp_path)
        assert create_subscription(d, "s") is True
        assert create_subscription(d, "s") is False  # AlreadyExists no-op
        assert list_subscriptions(d) == ["s"]

    def test_create_requires_scalable_topic(self, tmp_path):
        from pulsar_spark.sources import create_subscription

        with pytest.raises(ValueError):
            create_subscription(str(tmp_path / "nope"), "s")

    def test_backlog_and_clear(self, spark, tmp_path):
        from pulsar_spark.sources import (
            clear_backlog,
            create_subscription,
            produce_scalable,
            subscription_backlog,
        )

        d, payload = self._topic(spark, tmp_path, n=200)
        create_subscription(d, "s")
        total = sum(r.backlog for r in subscription_backlog(spark, d, "s").collect())
        assert total == 200
        clear_backlog(spark, d, "s")
        rows = subscription_backlog(spark, d, "s").collect()
        # explicit zero rows for every layout segment
        assert len(rows) == 2 and all(r.backlog == 0 for r in rows)
        # only NEW rows backlog after a further produce
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        total2 = sum(r.backlog for r in subscription_backlog(spark, d, "s").collect())
        assert total2 == 200

    def test_delete_drops_entry_and_consumers(self, spark, tmp_path):
        from pulsar_spark.sources import (
            SubscriptionCoordinator,
            create_subscription,
            delete_subscription,
            list_subscriptions,
            subscription_checkpoint,
        )

        d, _ = self._topic(spark, tmp_path)
        create_subscription(d, "a")
        create_subscription(d, "b")
        coord = SubscriptionCoordinator("a", d)
        coord.register_consumer("c1", 1)
        coord.register_consumer("c2", 2)
        assert delete_subscription(d, "a", coordinator=coord) is True
        assert coord.sessions == {}  # dropAllConsumers ran first
        assert list_subscriptions(d) == ["b"]
        assert delete_subscription(d, "a") is False
        with pytest.raises(ValueError):
            subscription_checkpoint(d, "a")
        # subscription "b" untouched
        assert subscription_checkpoint(d, "b").offsets == {}

    def test_clear_mid_split_regates_children(self, spark, tmp_path):
        """The VERDICT ordering case: a sealed parent with backlog gates
        its children; clearBacklog computed AFTER the split covers the
        children too and lifts the drain gate for this subscription."""
        from pulsar_spark.sources import (
            SubscriptionCoordinator,
            checkpoint_drain_checker,
            clear_backlog,
            create_subscription,
            split_segment,
            subscription_backlog,
            subscription_checkpoint,
        )

        d, _ = self._topic(spark, tmp_path, n=200)
        create_subscription(d, "s")
        split_segment(d, 0)  # seals 0 -> children; subscription has backlog on 0

        def seg_ids(coord):
            coord.poll_drain_status()
            a = coord.compute_assignment()["c1"]
            return {s.segment_id for s in a.segments}

        before = SubscriptionCoordinator(
            "s", d,
            drain_checker=checkpoint_drain_checker(
                spark, d, subscription_checkpoint(d, "s")
            ),
        )
        before.register_consumer("c1", 1)
        got = seg_ids(before)
        assert 0 in got and not {2, 3} <= got  # children gated

        vec = clear_backlog(spark, d, "s")
        # the post-split vector covers the children as well
        assert set(vec.offsets) == {0, 1, 2, 3}
        rows = subscription_backlog(spark, d, "s").collect()
        assert len(rows) == 4 and all(r.backlog == 0 for r in rows)

        after = SubscriptionCoordinator(
            "s", d, drain_checker=checkpoint_drain_checker(spark, d, vec)
        )
        after.register_consumer("c1", 1)
        assert {0, 1, 2, 3} <= seg_ids(after)  # gate lifted

    def test_noop_delete_keeps_consumers_connected(self, spark, tmp_path):
        # a delete of a nonexistent subscription must not tear down the
        # live coordinator sessions (review finding)
        from pulsar_spark.sources import (
            SubscriptionCoordinator,
            create_subscription,
            delete_subscription,
        )

        d, _ = self._topic(spark, tmp_path)
        create_subscription(d, "real")
        coord = SubscriptionCoordinator("real", d)
        coord.register_consumer("c1", 1)
        assert delete_subscription(d, "typo", coordinator=coord) is False
        assert set(coord.sessions) == {"c1"}  # untouched

    def test_subscribe_assigned_latest_sentinel(self, spark, tmp_path):
        # Checkpoint.latest() must mean "nothing stored delivered",
        # matching read_from_checkpoint — not "read from earliest"
        from pulsar_spark.sources import Checkpoint, SubscriptionCoordinator, produce_scalable
        from pulsar_spark.streaming import run_to_end, subscribe_assigned

        d, payload = self._topic(spark, tmp_path, n=50)
        coord = SubscriptionCoordinator("s", d)
        a = coord.register_consumer("c1", 1)["c1"]
        got = []

        def sink(batch, _bid):
            got.extend(batch.select("offset", "segment").collect())

        from pulsar_spark.sources import segment_high_watermarks

        stream = subscribe_assigned(spark, d, a, start_checkpoint=Checkpoint.latest())
        run_to_end(stream.writeStream.foreachBatch(sink))
        assert got == []  # backlog skipped
        # positive leg: rows appended AFTER the snapshot ARE delivered
        # when resuming from the snapshot's vector (so the filter was
        # the high watermark, not a deliver-nothing limit(0))
        snap = Checkpoint(
            {sid: hi + 1 for sid, hi in segment_high_watermarks(spark, d).items()}
        )
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        got2 = []

        def sink2(batch, _bid):
            got2.extend(batch.collect())

        run_to_end(
            subscribe_assigned(spark, d, a, start_checkpoint=snap)
            .writeStream.foreachBatch(sink2)
        )
        assert len(got2) == 50  # exactly the post-snapshot batch
        # and a FRESH latest snapshot skips them again
        got3 = []

        def sink3(batch, _bid):
            got3.extend(batch.collect())

        run_to_end(
            subscribe_assigned(spark, d, a, start_checkpoint=Checkpoint.latest())
            .writeStream.foreachBatch(sink3)
        )
        assert got3 == []

    def test_seek_subscription_window_dispatch(self, spark, tmp_path):
        """seekSubscription's per-segment lifetime dispatch
        (ScalableTopicController.seekSubscriptionOnSegment): sealed-
        before-ts segments skip-all with NO scan, created-after-ts go to
        earliest with NO scan, only straddling segments pay a
        publish_time aggregate — and the resume delivers exactly the
        rows published after the seek point."""
        import time as _time

        from pulsar_spark.sources import (
            create_subscription,
            produce_scalable,
            read_from_checkpoint,
            seek_subscription,
            split_segment,
        )

        d, payload = self._topic(spark, tmp_path, n=100)
        create_subscription(d, "s")
        _time.sleep(0.05)
        split_segment(d, 0)  # seals 0 with a sealed_at_ms stamp
        _time.sleep(0.05)
        from datetime import datetime, timezone

        ts = datetime.now(timezone.utc).replace(tzinfo=None)
        seek_at = ts.strftime("%Y-%m-%d %H:%M:%S.%f")
        _time.sleep(0.05)
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)

        vec = seek_subscription(spark, d, "s", seek_at)
        # sealed parent 0: skip-all (cursor past its high watermark > 0);
        # children/active: first post-ts offset
        assert vec.offsets[0] > 0
        batch, _ = read_from_checkpoint(spark, d, vec)
        # delivers exactly the second produce (first batch predates ts)
        assert batch.count() == 100
        assert batch.where("segment = 0").count() == 0  # sealed pre-ts

    def test_seek_subscription_before_creation_is_scan_free(self, tmp_path):
        """A seek to a timestamp before the topic existed classifies
        EVERY segment as created-after -> earliest; prove no Spark job
        runs by passing spark=None."""
        from pulsar_spark.sources import (
            create_scalable_topic,
            create_subscription,
            seek_subscription,
            subscription_checkpoint,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=3)
        create_subscription(d, "s")
        vec = seek_subscription(None, d, "s", "2000-01-01 00:00:00")
        assert vec.offsets == {0: 0, 1: 0, 2: 0}
        assert subscription_checkpoint(d, "s").offsets == vec.offsets

    def test_saved_checkpoint_resumes_reads(self, spark, tmp_path):
        from pulsar_spark.sources import (
            create_subscription,
            read_from_checkpoint,
            save_subscription_checkpoint,
            subscription_checkpoint,
        )

        d, payload = self._topic(spark, tmp_path, n=100)
        create_subscription(d, "s")
        batch, nxt = read_from_checkpoint(spark, d, subscription_checkpoint(d, "s"))
        assert batch.count() == 100
        save_subscription_checkpoint(d, "s", nxt)
        batch2, _ = read_from_checkpoint(spark, d, subscription_checkpoint(d, "s"))
        assert batch2.count() == 0  # acked position persisted


class TestSubscriptionCLI:
    def test_full_lifecycle_through_cli(self, spark, tmp_path, capsys):
        import json

        from pulsar_spark.__main__ import main
        from pulsar_spark.sources import create_scalable_topic, produce_scalable

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        payload = spark.range(60).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)

        def run(*argv):
            main(list(argv))
            return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

        assert run("subscription", d, "create", "--name", "s")["created"] is True
        assert run("subscription", d, "create", "--name", "s")["created"] is False
        assert run("subscription", d, "list")["subscriptions"] == ["s"]
        bl = run("subscription", d, "backlog", "--name", "s")["backlog"]
        assert sum(bl.values()) == 60
        out = run("subscription", d, "clear-backlog", "--name", "s")
        assert out["cleared"] is True
        bl2 = run("subscription", d, "backlog", "--name", "s")["backlog"]
        assert sum(bl2.values()) == 0
        seek = run("subscription", d, "seek", "--name", "s",
                   "--timestamp", "2000-01-01 00:00:00")
        assert all(v == 0 for v in seek["cursor"].values())  # pre-creation -> earliest
        assert run("subscription", d, "delete", "--name", "s")["deleted"] is True
        assert run("subscription", d, "list")["subscriptions"] == []


class TestStreamingCoordinator:
    def test_split_mid_stream_with_two_consumers(self, spark, tmp_path):
        """End-to-end composition (VERDICT r5 stretch): two consumers
        drain a scalable topic through live streams under coordinator
        assignments; a split lands mid-stream, sendAssignmentUpdate
        fires, both consumers re-open under the new assignment resuming
        from the SUBSCRIPTION cursor (segment handover re-delivers
        nothing), and per-key order holds end-to-end: every key's
        parent-segment rows are delivered before its child-segment rows
        and offsets rise within a segment."""
        from pulsar_spark.sources import (
            Checkpoint,
            SubscriptionCoordinator,
            checkpoint_drain_checker,
            create_scalable_topic,
            create_subscription,
            produce_scalable,
            save_subscription_checkpoint,
            segment_high_watermarks,
            split_segment,
            subscription_checkpoint,
        )
        from pulsar_spark.sources.scalable import scalable_metadata
        from pulsar_spark.streaming import run_to_end, subscribe_assigned

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        payload = spark.range(300).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        create_subscription(d, "s")
        coord = SubscriptionCoordinator("s", d)
        a = coord.register_consumer("c1", 1)
        a = coord.register_consumer("c2", 2)
        assert set(a) == {"c1", "c2"}

        received: dict[str, list] = {"c1": [], "c2": []}

        def drain(consumer: str, assignment, phase: int) -> None:
            stream = subscribe_assigned(
                spark, d, assignment,
                start_checkpoint=subscription_checkpoint(d, "s"),
            )

            def sink(batch, _bid, _c=consumer, _p=phase):
                for r in batch.select("key", "segment", "offset").collect():
                    received[_c].append((_p, r.key, int(r.segment), int(r.offset)))

            run_to_end(stream.writeStream.foreachBatch(sink))

        for c in ("c1", "c2"):
            drain(c, a[c], phase=1)
        n1 = len(received["c1"]) + len(received["c2"])
        assert n1 == 300
        # exclusive ownership in phase 1: no (segment, offset) seen twice
        seen1 = [(s, o) for rows in received.values() for (_, _, s, o) in rows]
        assert len(seen1) == len(set(seen1))

        # advance the subscription cursor past everything delivered
        save_subscription_checkpoint(
            d, "s",
            Checkpoint({sid: hi + 1 for sid, hi in segment_high_watermarks(spark, d).items()}),
        )

        # --- the split lands mid-stream ---
        split_segment(d, 0)
        coord.install_drain_checker(
            checkpoint_drain_checker(spark, d, subscription_checkpoint(d, "s"))
        )
        coord.on_layout_change(scalable_metadata(d))
        coord.poll_drain_status()  # parent 0 is drained -> children assignable
        updated = coord._rebalance_and_notify()
        # sendAssignmentUpdate reached both live sessions with the new epoch
        for c in ("c1", "c2"):
            assert coord.sessions[c].pushed, c
            assert coord.sessions[c].pushed[-1].layout_epoch == 1
        new_ids = {c: {s.segment_id for s in updated[c].segments} for c in updated}
        assert new_ids["c1"] | new_ids["c2"] == {0, 1, 2, 3}

        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        for c in ("c1", "c2"):
            drain(c, updated[c], phase=2)

        allrows = received["c1"] + received["c2"]
        # nothing re-delivered across the handover (segment 0 moved
        # owners but its cursor was past-the-end), everything delivered
        assert len(allrows) == 600
        assert len({(s, o) for (_, _, s, o) in allrows}) == 600
        # phase 2 delivered only post-split rows: none from sealed seg 0
        assert all(s != 0 for (p, _, s, o) in allrows if p == 2)
        # per-key order: parent rows (phase 1) precede child rows
        # (phase 2); within a (key, segment), offsets strictly rise in
        # delivery order
        bykey: dict[str, list] = {}
        for c in ("c1", "c2"):
            for row in received[c]:
                bykey.setdefault(row[1], []).append(row)
        for k, rows in bykey.items():
            phases = [p for (p, _, _, _) in rows]
            assert phases == sorted(phases), k  # parent before child
            per_seg: dict[int, list] = {}
            for (p, _, s, o) in rows:
                per_seg.setdefault(s, []).append(o)
            for s, offs in per_seg.items():
                assert offs == sorted(offs), (k, s)


class TestPrCurve:
    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id string, score double, label int")

    def test_known_confusion_counts(self, spark):
        from pulsar_spark.functions import pr_curve

        scored = self._scored(
            spark,
            [("a", 0.9, 1), ("b", 0.7, 1), ("c", 0.4, 0), ("d", 0.2, 1)],
        )
        row = {
            r.threshold: r for r in pr_curve(scored, thresholds=(0.5,)).collect()
        }[0.5]
        assert (row.tp, row.fp, row.fn, row.n_pred_pos) == (2, 0, 1, 2)
        assert row.precision == 1.0
        assert row.recall == round(2 / 3, 6)
        assert row.f1 == 0.8  # 2*2 / (4 + 0 + 1)

    def test_zero_denominators_are_null(self, spark):
        from pulsar_spark.functions import pr_curve

        # no predicted positives at 0.99; no actual positives at all
        scored = self._scored(spark, [("a", 0.3, 0), ("b", 0.1, 0)])
        rows = {r.threshold: r for r in pr_curve(scored, thresholds=(0.99,)).collect()}
        r = rows[0.99]
        assert r.precision is None and r.recall is None and r.f1 is None

    def test_monotone_predicted_positives(self, spark, documents):
        from pulsar_spark.functions import pr_curve
        from pulsar_spark.functions.classifier import logreg_fit_predict

        scored = logreg_fit_predict(documents, F.col("n_chars") >= 250)
        rows = pr_curve(scored).orderBy("threshold").collect()
        counts = [r.n_pred_pos for r in rows]
        assert counts == sorted(counts, reverse=True)  # higher cut, fewer positives


class TestCalibrationBins:
    def test_known_bins(self, spark):
        from pulsar_spark.functions.classifier import calibration_bins

        scored = spark.createDataFrame(
            [
                ("a", 0.05, 0), ("b", 0.08, 0),   # bin 0
                ("c", 0.55, 1), ("d", 0.52, 0),   # bin 5
                ("e", 1.0, 1),                     # score 1.0 -> top bin
            ],
            "doc_id string, score double, label int",
        )
        rows = {r.bin: r for r in calibration_bins(scored, n_bins=10).collect()}
        assert set(rows) == {0, 5, 9}
        b0 = rows[0]
        assert (b0.n, b0.n_pos) == (2, 0)
        assert b0.mean_score == round((0.05 + 0.08) / 2, 6)
        assert b0.pos_rate == 0.0 and b0.bin_lo == 0.0
        b5 = rows[5]
        assert (b5.n, b5.n_pos, b5.pos_rate) == (2, 1, 0.5)
        assert b5.bin_lo == 0.5
        assert rows[9].n == 1 and rows[9].mean_score == 1.0

    def test_calibrated_gate_bins_track_scores(self, spark, documents):
        # a trained model's bins: counts conserve and rates are valid
        from pyspark.sql import functions as F

        from pulsar_spark.functions.classifier import (
            calibration_bins,
            logreg_fit_predict,
        )

        scored = logreg_fit_predict(documents, F.col("n_chars") >= 250)
        bins = calibration_bins(scored).collect()
        assert sum(r.n for r in bins) == scored.count()
        for r in bins:
            assert 0.0 <= r.pos_rate <= 1.0
            assert r.bin_lo <= r.mean_score <= r.bin_lo + 0.100001 or r.bin == 9


class TestCorpusReport:
    def test_known_corpus(self, spark):
        from pulsar_spark.functions import corpus_report

        docs = spark.createDataFrame(
            [
                (1, "a b", "en", "srcA"),
                (2, "a b", "en", "srcA"),
                (3, "c", "es", "srcA"),
                (4, "x y z", "de", "srcB"),
            ],
            "doc_id bigint, text string, lang string, source string",
        )
        rows = {r.source: r for r in corpus_report(docs).collect()}
        a = rows["srcA"]
        assert (a.n_docs, a.n_tokens, a.total_chars) == (3, 5, 7)
        # lengths sorted [1, 3, 3]: p25 idx (2*25)//100=0 -> 1; p50/p75/p90 idx 1 -> 3
        assert (a.p25_chars, a.p50_chars, a.p75_chars, a.p90_chars) == (1, 3, 3, 3)
        assert a.top_lang == "en" and a.top_lang_frac == round(2 / 3, 6)
        assert a.n_langs == 2
        assert a.dup_rate == round(1 / 3, 6)  # "a b" twice -> 1 redundant copy
        b = rows["srcB"]
        assert b.n_docs == 1 and b.dup_rate == 0.0 and b.p90_chars == 5

    def test_report_composes_with_curation(self, spark, documents):
        """The dataset-card-of-what-I-built composition (VERDICT r5 #3):
        run the v4 gates + temperature mix, then corpus_report over the
        curated selection — the card a release pipeline publishes."""
        from pyspark.sql import functions as F

        from pulsar_spark.functions import corpus_report, temperature_mix
        from pulsar_spark.functions.text import gopher_rules

        gate = gopher_rules(documents).where("gopher_pass").select("doc_id")
        kept = documents.join(gate, "doc_id")
        mixed = temperature_mix(kept, temperature=2.0, total_rows=200, seed=17)
        card = {r.source: r for r in corpus_report(mixed).collect()}
        orig = {r.source: r for r in corpus_report(documents).collect()}
        assert card and set(card) <= set(orig)
        for src, row in card.items():
            assert 0 < row.n_docs <= orig[src].n_docs
            assert row.n_tokens <= orig[src].n_tokens
            assert 0.0 <= row.dup_rate <= 1.0
            # quantiles of a subset stay within the source's range
            assert orig[src].p25_chars <= row.p90_chars
        # total selected docs is in the mix's ballpark (downsample-only)
        assert sum(r.n_docs for r in card.values()) <= documents.count()

    def test_top_lang_tiebreak_lexicographic(self, spark):
        from pulsar_spark.functions import corpus_report

        docs = spark.createDataFrame(
            [(1, "q", "fr", "s"), (2, "r", "de", "s")],
            "doc_id bigint, text string, lang string, source string",
        )
        r = corpus_report(docs).collect()[0]
        assert r.top_lang == "de"  # tie 1-1 -> lexicographically smallest
