"""Scalable topics: hash-range segments, split/merge, checkpoint
consumers, migration.

Golden semantics: pulsar-common/.../scalable/HashRange.java (16-bit
inclusive ranges, halving split, adjacency merge),
ScalableTopicHashing.java (segment hash = murmur high 16 bits),
client/impl/v5/SegmentRouter.java (range route, keyless round-robin),
capi-v5/Checkpoint.java + CheckpointConsumer.java (caller-held
serializable position vector, earliest/latest sentinels),
client/admin/ScalableTopics.java (create/split/merge/stats/migrate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _payload(spark, n=400, key_mod=83, shift=0):
    return spark.range(n).selectExpr(
        f"CAST(id % {key_mod} AS STRING) AS k", f"id + {shift} AS v"
    )


class TestScalableLifecycle:
    def test_create_covers_full_space(self, tmp_path):
        from pulsar_spark.sources import create_scalable_topic, scalable_metadata
        from pulsar_spark.sources.scalable import MAX_HASH, active_segments

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=3)
        meta = scalable_metadata(d)
        segs = active_segments(meta)
        assert len(segs) == 3
        assert segs[0]["start"] == 0 and segs[-1]["end"] == MAX_HASH
        for a, b in zip(segs, segs[1:]):
            assert a["end"] + 1 == b["start"]  # contiguous, non-overlapping

        with pytest.raises(ValueError):
            create_scalable_topic(d)  # already exists

    def test_produce_routes_by_range_and_reads_back(self, spark, tmp_path):
        from pulsar_spark.sources import (
            create_scalable_topic,
            produce_scalable,
            read_scalable,
            scalable_metadata,
        )
        from pulsar_spark.sources.scalable import active_segments, segment_hash

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=4)
        produce_scalable(_payload(spark), d, key_col="k")
        got = read_scalable(spark, d)
        assert got.count() == 400
        # every row sits in the segment owning its hash
        ranges = {
            s["segment_id"]: (s["start"], s["end"])
            for s in active_segments(scalable_metadata(d))
        }
        rows = got.withColumn("h", segment_hash(F.col("key"))).select(
            "segment", "h"
        ).collect()
        for r in rows:
            lo, hi = ranges[r.segment]
            assert lo <= r.h <= hi
        # offsets dense per segment
        per = got.groupBy("segment").agg(F.max("offset").alias("mx"), F.count("*").alias("c"))
        assert all(r.mx == r.c - 1 for r in per.collect())

    def test_keyless_round_robin(self, spark, tmp_path):
        from pulsar_spark.sources import create_scalable_topic, produce_scalable, read_scalable

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=4)
        produce_scalable(_payload(spark).drop("k"), d)
        counts = {r.segment: r.c for r in read_scalable(spark, d).groupBy("segment").count().withColumnRenamed("count", "c").collect()}
        assert set(counts) == {0, 1, 2, 3}
        assert max(counts.values()) <= 2 * min(counts.values())


class TestSplitMerge:
    def test_split_seals_parent_and_reroutes(self, spark, tmp_path):
        from pulsar_spark.sources import (
            create_scalable_topic,
            produce_scalable,
            read_scalable,
            scalable_metadata,
            split_segment,
        )
        from pulsar_spark.sources.scalable import SegmentGoneError

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        produce_scalable(_payload(spark), d, key_col="k")
        before = {r.segment for r in read_scalable(spark, d).select("segment").distinct().collect()}
        assert before == {0, 1}

        c1, c2 = split_segment(d, 0)
        meta = scalable_metadata(d)
        assert meta["segments"]["0"]["state"] == "SEALED"
        assert meta["segments"]["0"]["child_ids"] == [c1, c2]
        k0 = meta["segments"]["0"]
        assert meta["segments"][str(c1)]["start"] == k0["start"]
        assert meta["segments"][str(c2)]["end"] == k0["end"]
        assert meta["segments"][str(c1)]["end"] + 1 == meta["segments"][str(c2)]["start"]

        # a second split of the sealed parent is refused
        with pytest.raises(SegmentGoneError):
            split_segment(d, 0)

        # new appends route over children; nothing new lands in the parent
        produce_scalable(_payload(spark, shift=1000), d, key_col="k")
        after = read_scalable(spark, d)
        assert after.count() == 800
        new_rows = after.where(F.col("v") >= 1000)
        assert {r.segment for r in new_rows.select("segment").distinct().collect()} & {0} == set()
        # full key history intact
        assert after.select("key").distinct().count() == 83

    def test_per_key_order_is_segment_then_offset(self, spark, tmp_path):
        from pulsar_spark.sources import create_scalable_topic, produce_scalable, read_scalable, split_segment

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        # v encodes send order per key: id, then id+1000 after the split
        produce_scalable(_payload(spark), d, key_col="k")
        split_segment(d, 0)
        split_segment(d, 1)
        produce_scalable(_payload(spark, shift=1000), d, key_col="k")

        rows = read_scalable(spark, d).select("key", "segment", "offset", "v").collect()
        by_key: dict[str, list] = {}
        for r in rows:
            by_key.setdefault(r.key, []).append(r)
        for key, rs in by_key.items():
            ordered = sorted(rs, key=lambda r: (r.segment, r.offset))
            vs = [r.v for r in ordered]
            assert vs == sorted(vs), f"key {key}: (segment, offset) order != send order"

    def test_merge_requires_adjacency_and_fuses_ranges(self, spark, tmp_path):
        from pulsar_spark.sources import create_scalable_topic, merge_segments, scalable_metadata, split_segment

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=4)
        with pytest.raises(ValueError):
            merge_segments(d, 0, 2)  # not adjacent
        cid = merge_segments(d, 1, 2)
        meta = scalable_metadata(d)
        child = meta["segments"][str(cid)]
        assert child["start"] == meta["segments"]["1"]["start"]
        assert child["end"] == meta["segments"]["2"]["end"]
        assert meta["segments"]["1"]["state"] == meta["segments"]["2"]["state"] == "SEALED"
        # split then merge round-trips the range partitioning invariant
        from pulsar_spark.sources.scalable import MAX_HASH, active_segments

        segs = active_segments(meta)
        assert segs[0]["start"] == 0 and segs[-1]["end"] == MAX_HASH
        for a, b in zip(segs, segs[1:]):
            assert a["end"] + 1 == b["start"]


class TestCheckpointConsumer:
    def test_checkpoint_resume_no_dups_no_loss(self, spark, tmp_path):
        from pulsar_spark.sources import (
            Checkpoint,
            create_scalable_topic,
            produce_scalable,
            read_from_checkpoint,
            split_segment,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        produce_scalable(_payload(spark), d, key_col="k")

        batch1, ck = read_from_checkpoint(spark, d, Checkpoint.earliest())
        seen = {r.v for r in batch1.select("v").collect()}
        assert len(seen) == 400

        # externally store + restore the checkpoint (Flink-state style),
        # surviving a split in between
        restored = Checkpoint.from_bytes(ck.to_bytes())
        split_segment(d, 0)
        produce_scalable(_payload(spark, shift=1000), d, key_col="k")
        batch2, ck2 = read_from_checkpoint(spark, d, restored)
        new = {r.v for r in batch2.select("v").collect()}
        assert new == {i + 1000 for i in range(400)}  # exactly the new rows
        # and the advanced checkpoint is drained
        batch3, _ = read_from_checkpoint(spark, d, ck2)
        assert batch3.count() == 0

    def test_latest_sentinel_skips_backlog(self, spark, tmp_path):
        from pulsar_spark.sources import (
            Checkpoint,
            create_scalable_topic,
            produce_scalable,
            read_from_checkpoint,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        produce_scalable(_payload(spark), d, key_col="k")
        none_yet, ck = read_from_checkpoint(spark, d, Checkpoint.latest())
        assert none_yet.count() == 0
        produce_scalable(_payload(spark, shift=1000), d, key_col="k")
        fresh, _ = read_from_checkpoint(spark, d, ck)
        assert fresh.count() == 400
        assert fresh.agg(F.min("v")).collect()[0][0] == 1000


class TestMigrationAndAutoScale:
    def test_migrate_partitioned_topic(self, spark, tmp_path):
        from pulsar_spark.sources import migrate_to_scalable, read_scalable
        from pulsar_spark.sources.topics import produce

        src = str(tmp_path / "classic")
        produce(_payload(spark), src, key_col="k", num_partitions=4, mode="overwrite")
        dest = str(tmp_path / "scalable")
        migrate_to_scalable(spark, src, dest, num_segments=4)
        got = read_scalable(spark, dest)
        assert got.count() == 400
        assert {r.v for r in got.select("v").collect()} == set(range(400))
        assert "partition" not in got.columns and "segment" in got.columns

    def test_auto_scale_flags_hot_segments(self, spark, tmp_path):
        from pulsar_spark.sources import (
            auto_scale_plan,
            create_scalable_topic,
            produce_scalable,
            scalable_stats,
            split_segment,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        # all rows share one key -> one segment takes everything
        hot = _payload(spark, key_mod=1)
        produce_scalable(hot, d, key_col="k")
        plan = auto_scale_plan(spark, d, max_msgs_per_segment=100)
        assert len(plan) == 1
        split_segment(d, plan[0])
        stats = {r.segment: r.state for r in scalable_stats(spark, d).collect()}
        assert stats[plan[0]] == "SEALED"
        assert auto_scale_plan(spark, d, max_msgs_per_segment=100) == []


class TestStreamingAcrossSplit:
    def test_subscription_survives_split(self, spark, tmp_path):
        """The DagWatchClient layout-change analog: a streaming
        subscription on a scalable topic keeps consuming across a
        splitSegment on the SAME checkpoint — new segment directories
        are discovered by the per-trigger file listing, exactly like
        consumer autoUpdatePartitions on classic topics."""
        from pulsar_spark.sources import create_scalable_topic, produce_scalable, split_segment
        from pulsar_spark.streaming import run_to_end, subscribe

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        produce_scalable(_payload(spark), d, key_col="k")
        ckpt = str(tmp_path / "ckpt")

        seen: list[tuple[str, int, int]] = []

        def sink(run):
            def _each(df, bid):
                for r in df.groupBy("segment").count().collect():
                    seen.append((run, r["segment"], r["count"]))

            return _each

        run_to_end(
            subscribe(spark, d).writeStream.foreachBatch(sink("r1")).option(
                "checkpointLocation", ckpt
            )
        )
        assert sum(n for run, _, n in seen if run == "r1") == 400
        assert {s for run, s, _ in seen if run == "r1"} == {0, 1}

        c1, c2 = split_segment(d, 0)
        produce_scalable(_payload(spark, shift=1000), d, key_col="k")
        run_to_end(
            subscribe(spark, d).writeStream.foreachBatch(sink("r2")).option(
                "checkpointLocation", ckpt
            )
        )
        r2 = [(s, n) for run, s, n in seen if run == "r2"]
        assert sum(n for _, n in r2) == 400  # only the new rows
        assert {s for s, _ in r2} & {c1, c2}, "no rows consumed from child segments"


class TestNullKeyRouting:
    def test_null_keys_round_robin_not_null_partition(self, spark, tmp_path):
        """NULL keys must route like keyless messages — never into a
        NULL hive partition (the deterministic-mod hash of a NULL key
        is NULL, which would fall through every range CASE branch)."""
        from pulsar_spark.sources import create_scalable_topic, produce_scalable, read_scalable

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=4)
        payload = spark.range(100).selectExpr(
            "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS STRING) END AS k",
            "id AS v",
        )
        produce_scalable(payload, d, key_col="k", deterministic_mod=True)
        got = read_scalable(spark, d)
        assert got.count() == 100
        assert got.where(F.col("segment").isNull()).count() == 0
        # keyless rows spread across several segments
        assert got.where(F.col("key").isNull()).select("segment").distinct().count() > 1

    def test_payload_seg_hash_column_not_clobbered(self, spark, tmp_path):
        """The routing temp column must not collide with a payload column
        of the same name — the guard picks a fresh internal name, so a
        user column named __ps_seg_hash__ survives the produce."""
        from pulsar_spark.sources.scalable import _null_safe_segment, scalable_metadata
        from pulsar_spark.sources import create_scalable_topic

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        meta = scalable_metadata(d)
        payload = spark.range(10).selectExpr(
            "CAST(id AS STRING) AS k", "id AS __ps_seg_hash__"
        )
        out = _null_safe_segment(payload, "k", meta, F.lit(0), True)
        assert "__ps_seg_hash__" in out.columns and "segment" in out.columns
        vals = {r["__ps_seg_hash__"] for r in out.collect()}
        assert vals == set(range(10))  # untouched user values


class TestScalableAdmin:
    def test_list_by_properties(self, tmp_path):
        from pulsar_spark.sources import create_scalable_topic, list_scalable_topics

        base = str(tmp_path / "ns")
        create_scalable_topic(f"{base}/a", 2, properties={"team": "ml", "tier": "gold"})
        create_scalable_topic(f"{base}/b", 2, properties={"team": "ml"})
        create_scalable_topic(f"{base}/c", 2, properties={"team": "web"})
        all_topics = list_scalable_topics(base)
        assert [t.rsplit("/", 1)[1] for t in all_topics] == ["a", "b", "c"]
        ml = list_scalable_topics(base, {"team": "ml"})
        assert [t.rsplit("/", 1)[1] for t in ml] == ["a", "b"]
        gold_ml = list_scalable_topics(base, {"team": "ml", "tier": "gold"})
        assert [t.rsplit("/", 1)[1] for t in gold_ml] == ["a"]
        assert list_scalable_topics(base, {"team": "nope"}) == []

    def test_checkpoint_at_timestamp_seeks(self, spark, tmp_path):
        import time

        from pulsar_spark.sources import (
            checkpoint_at_timestamp,
            create_scalable_topic,
            produce_scalable,
            read_from_checkpoint,
            read_scalable,
        )

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=2)
        produce_scalable(_payload(spark), d, key_col="k")
        # capture the wall-clock boundary between the two batches
        boundary = (
            read_scalable(spark, d).agg(F.max("publish_time")).collect()[0][0]
        )
        time.sleep(1.2)
        produce_scalable(_payload(spark, shift=1000), d, key_col="k")

        # seek strictly between the two batches (batch 1 shares one
        # current_timestamp; the 1.2 s sleep guarantees separation)
        import datetime

        mid = boundary + datetime.timedelta(milliseconds=600)
        ck = checkpoint_at_timestamp(spark, d, str(mid))
        batch, _ = read_from_checkpoint(spark, d, ck)
        got = {r.v for r in batch.select("v").collect()}
        assert got == {i + 1000 for i in range(400)}

        # a far-future timestamp seeks to the end
        far = checkpoint_at_timestamp(spark, d, "2100-01-01 00:00:00")
        rest, _ = read_from_checkpoint(spark, d, far)
        assert rest.count() == 0


class TestLayoutProperty:
    def test_random_split_merge_always_partitions_the_space(self, tmp_path):
        """Property: after ANY sequence of splits and (adjacent) merges,
        the active segments exactly partition [0x0000, 0xFFFF] —
        contiguous, non-overlapping, full coverage — and lineage stays
        consistent (every sealed segment's children are live ids)."""
        import random

        from pulsar_spark.sources import create_scalable_topic, merge_segments, scalable_metadata, split_segment
        from pulsar_spark.sources.scalable import MAX_HASH, active_segments

        rng = random.Random(421)
        for trial in range(5):
            d = str(tmp_path / f"t{trial}")
            create_scalable_topic(d, num_initial_segments=rng.randint(1, 5))
            for _ in range(rng.randint(5, 25)):
                meta = scalable_metadata(d)
                segs = active_segments(meta)
                if rng.random() < 0.7 or len(segs) < 2:
                    cand = [s for s in segs if s["end"] - s["start"] + 1 >= 2]
                    if cand:
                        split_segment(d, rng.choice(cand)["segment_id"])
                else:
                    i = rng.randrange(len(segs) - 1)
                    merge_segments(d, segs[i]["segment_id"], segs[i + 1]["segment_id"])

            meta = scalable_metadata(d)
            segs = active_segments(meta)
            assert segs[0]["start"] == 0 and segs[-1]["end"] == MAX_HASH
            for a, b in zip(segs, segs[1:]):
                assert a["end"] + 1 == b["start"], (a, b)
            for s in meta["segments"].values():
                if s["state"] == "SEALED":
                    assert s["child_ids"], f"sealed {s['segment_id']} with no children"
                    for c in s["child_ids"]:
                        assert str(c) in meta["segments"]
                    assert s["sealed_at_epoch"] <= meta["epoch"]


class TestEntryBuckets:
    """PIP-486 entry-bucketing: the low 16 bits of the key's murmur
    drive an independent per-segment bucket ring."""

    def test_bucket_of_matches_reference_loop(self, spark):
        from pulsar_spark.sources import bucket_of

        splits = [100, 5000, 60000]

        def ref(h):  # EntryBucketBatchContainer.bucketOf
            idx = 0
            for s in splits:
                if s <= h:
                    idx += 1
                else:
                    break
            return idx

        df = spark.range(0, 65536, 997).selectExpr("CAST(id AS INT) AS h")
        got = {r.h: r.b for r in df.withColumn("b", bucket_of(F.col("h"), splits)).collect()}
        assert got == {h: ref(h) for h in got}
        assert set(got.values()) == {0, 1, 2, 3}

    def test_segment_and_bucket_hashes_are_independent_halves(self, spark):
        from pulsar_spark.sources import entry_bucket_hash
        from pulsar_spark.sources.scalable import segment_hash

        keys = spark.range(2000).selectExpr("CAST(id AS STRING) AS k")
        rows = keys.select(
            F.hash("k").alias("murmur"),
            segment_hash(F.col("k")).alias("seg"),
            entry_bucket_hash(F.col("k")).alias("bkt"),
        ).collect()
        for r in rows:
            assert r.seg == (r.murmur >> 16) & 0xFFFF
            assert r.bkt == r.murmur & 0xFFFF
        # both halves individually spread over their space
        assert len({r.seg for r in rows}) > 1000
        assert len({r.bkt for r in rows}) > 1000

    def test_per_key_bucket_is_stable(self, spark):
        from pulsar_spark.sources import key_shared_buckets

        msgs = spark.range(1000).selectExpr(
            "CAST(id % 50 AS STRING) AS key", "id AS v"
        )
        out = key_shared_buckets(msgs, splits=[16384, 32768, 49152])
        per_key = out.groupBy("key").agg(F.countDistinct("bucket").alias("nb"))
        assert per_key.where(F.col("nb") != 1).count() == 0  # per-key order holds
        assert out.select("bucket").distinct().count() > 1


class TestLoadAwareSplit:
    def test_arbitrary_split_point(self, tmp_path):
        """PIP-468 load-aware split: the controller picks a traffic-
        balancing boundary instead of the hash-width midpoint."""
        from pulsar_spark.sources import create_scalable_topic, scalable_metadata, split_segment

        d = str(tmp_path / "t")
        create_scalable_topic(d, num_initial_segments=1)  # [0, 65535]
        c1, c2 = split_segment(d, 0, at=1000)
        meta = scalable_metadata(d)
        assert (meta["segments"][str(c1)]["start"], meta["segments"][str(c1)]["end"]) == (0, 1000)
        assert (meta["segments"][str(c2)]["start"], meta["segments"][str(c2)]["end"]) == (1001, 65535)
        # boundary must leave both children non-empty
        import pytest as _pytest

        with _pytest.raises(ValueError):
            split_segment(d, c2, at=65535)
        with _pytest.raises(ValueError):
            split_segment(d, c2, at=1000)


class TestCheckpointProperties:
    def test_checkpoint_bytes_round_trip_property(self):
        """Property: any offsets vector survives the byte round-trip
        exactly (the Flink-state/S3 storage contract)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pulsar_spark.sources import Checkpoint

        @settings(max_examples=200, deadline=None)
        @given(
            offsets=st.dictionaries(
                st.integers(min_value=0, max_value=10**6),
                st.integers(min_value=0, max_value=2**62),
                max_size=32,
            ),
            latest=st.booleans(),
        )
        def check(offsets, latest):
            ck = Checkpoint(offsets, latest=latest)
            back = Checkpoint.from_bytes(ck.to_bytes())
            assert back.offsets == ck.offsets and back.latest == ck.latest
            # serialization is canonical: equal checkpoints -> equal bytes
            assert back.to_bytes() == ck.to_bytes()

        check()

    def test_bucket_of_property_vs_reference(self, spark):
        """Property: the column expression matches the reference
        bucketOf loop for arbitrary ordered split vectors."""
        import random

        from pyspark.sql import functions as F

        from pulsar_spark.sources import bucket_of

        rng = random.Random(99)
        hashes = spark.range(0, 65536, 311).selectExpr("CAST(id AS INT) AS h")
        for _ in range(6):
            splits = sorted(rng.sample(range(65536), rng.randint(0, 6)))

            def ref(h):
                idx = 0
                for s in splits:
                    if s <= h:
                        idx += 1
                    else:
                        break
                return idx

            got = {
                r.h: r.b
                for r in hashes.withColumn("b", bucket_of(F.col("h"), splits)).collect()
            }
            assert got == {h: ref(h) for h in got}, splits

        check_empty = hashes.withColumn("b", bucket_of(F.col("h"), [])).collect()
        assert all(r.b == 0 for r in check_empty)


class TestEndToEndLifecycle:
    def test_classic_to_scalable_full_journey(self, spark, tmp_path):
        """Integration: a classic partitioned topic migrates to
        scalable, a checkpoint consumer drains it, the topic splits
        and keeps ingesting, the consumer resumes exactly once, and a
        merge restores a coarser layout — every stage on the same data
        with no loss or duplication anywhere."""
        from pulsar_spark.sources import (
            Checkpoint,
            check_topic_consistency,
            merge_segments,
            migrate_to_scalable,
            produce_scalable,
            read_from_checkpoint,
            read_scalable,
            scalable_metadata,
            split_segment,
        )
        from pulsar_spark.sources.scalable import active_segments
        from pulsar_spark.sources.topics import create_topic, produce

        classic = str(tmp_path / "classic")
        create_topic(classic, num_partitions=4)
        payload = spark.range(300).selectExpr("CAST(id % 61 AS STRING) AS k", "id AS v")
        produce(payload, classic, key_col="k")
        assert check_topic_consistency(spark, classic)["ok"]

        scal = str(tmp_path / "scal")
        migrate_to_scalable(spark, classic, scal, num_segments=4)
        assert read_scalable(spark, scal).count() == 300

        # drain via checkpoint consumer, store the position externally
        b1, ck = read_from_checkpoint(spark, scal, Checkpoint.earliest())
        assert {r.v for r in b1.select("v").collect()} == set(range(300))
        blob = ck.to_bytes()

        # layout evolves while the consumer is away
        hot = active_segments(scalable_metadata(scal))[0]["segment_id"]
        split_segment(scal, hot)
        produce_scalable(
            payload.selectExpr("k", "v + 1000 AS v"), scal, key_col="k"
        )

        b2, ck2 = read_from_checkpoint(spark, scal, Checkpoint.from_bytes(blob))
        assert {r.v for r in b2.select("v").collect()} == {i + 1000 for i in range(300)}
        drained, _ = read_from_checkpoint(spark, scal, ck2)
        assert drained.count() == 0

        # merge two adjacent actives; data still fully readable and
        # per-key history still ordered by (segment, offset)
        segs = active_segments(scalable_metadata(scal))
        merge_segments(scal, segs[0]["segment_id"], segs[1]["segment_id"])
        allrows = read_scalable(spark, scal)
        assert allrows.count() == 600
        one_key = sorted(
            (r.segment, r.offset, r.v)
            for r in allrows.where(F.col("key") == "7").collect()
        )
        assert [t[2] for t in one_key] == sorted(t[2] for t in one_key)
