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

    def test_cli_offload_from_policy(self, spark, tmp_path, capsys):
        from pulsar_spark.__main__ import main

        t = _topic(spark, tmp_path)
        cold = str(tmp_path / "cold")
        P.set_policy(t, "offload_policies", {"cold_path": cold, "age_seconds": 5 * 86400})
        rc = main(["offload", t, "--from-policy", "--before", "2024-01-20 00:00:00"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["offloaded"] == 20
        # explicit mode still demands both args
        with pytest.raises(SystemExit):
            main(["offload", t, "--cold", cold])


class TestReplsubPolicyAndCLI:
    """replicated_subscriptions_enabled policy key (the
    Namespaces.setReplicatedSubscriptionStatus analog) + the replsub
    CLI lifecycle."""

    def _mesh(self, spark, tmp_path):
        from pulsar_spark.sources.topics import create_topic, produce
        from pulsar_spark.streaming.replicated_subscriptions import (
            ReplicatedSubscriptionsController,
        )

        east, west = str(tmp_path / "ns" / "east"), str(tmp_path / "ns" / "west")
        for t, base in ((east, 0), (west, 100)):
            create_topic(t, 2)
            produce(
                spark.createDataFrame(
                    [(str(i), i) for i in range(base, base + 8)],
                    "key string, event_id bigint",
                ),
                t, key_col="key",
            )
        ce = ReplicatedSubscriptionsController(spark, east, "east", {"west": west})
        cw = ReplicatedSubscriptionsController(spark, west, "west", {"east": east})
        return east, west, ce, cw

    def test_policy_disables_controller(self, spark, tmp_path):
        east, west, ce, cw = self._mesh(spark, tmp_path)
        P.set_policy(east, "replicated_subscriptions_enabled", False)
        assert not ce.enabled()
        assert ce.start_snapshot(now_ms=1_000) is None
        assert ce.tick(now_ms=2_000) == {"markers": 0, "forwarded": {},
                                         "disabled": True}
        # nothing reached west
        assert cw.process_markers(now_ms=3_000) == 0
        # namespace-level disable covers both topics; topic-level
        # re-enable overrides it (defaults < namespace < topic)
        P.remove_policy(east, "replicated_subscriptions_enabled")
        ns = str(tmp_path / "ns")
        P.set_policy(ns, "replicated_subscriptions_enabled", False)
        assert not ce.enabled() and not cw.enabled()
        P.set_policy(east, "replicated_subscriptions_enabled", True)
        assert ce.enabled() and not cw.enabled()

    def test_cli_lifecycle(self, spark, tmp_path, capsys):
        import json as _json

        from pulsar_spark.__main__ import main

        east, west, ce, cw = self._mesh(spark, tmp_path)

        def run(*argv):
            rc = main(list(argv))
            assert rc == 0
            return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

        out = run("replsub", east, "snapshot", "--cluster", "east",
                  "--remote", f"west={west}")
        assert out["snapshot_id"]
        run("replsub", east, "tick", "--cluster", "east",
            "--remote", f"west={west}")
        run("replsub", west, "tick", "--cluster", "west",
            "--remote", f"east={east}")
        run("replsub", east, "tick", "--cluster", "east",
            "--remote", f"west={west}")
        st = run("replsub", east, "status", "--cluster", "east",
                 "--remote", f"west={west}")
        assert st["enabled"] and st["completed_snapshots"] == 1
        assert not st["pending"]
        # sync requires --subscription (argparse usage error)
        with pytest.raises(SystemExit) as ei:
            main(["replsub", east, "sync"])
        assert ei.value.code == 2
        capsys.readouterr()
        from pulsar_spark.sources import cursors
        from pulsar_spark.streaming.replicated_subscriptions import (
            high_watermarks,
        )

        cursors.create_subscription(east, "s", replicated=True)
        cursors.ack_cumulative(east, "s", high_watermarks(spark, east))
        out = run("replsub", east, "sync", "--cluster", "east",
                  "--remote", f"west={west}", "--subscription", "s")
        assert out["snapshot"] is not None


class TestNativeCodecAdapters:
    """functions/native_codecs.py — the optional library-backed decode
    tier behind decode_media (VERDICT r8 missing #2). No native library
    exists in this container, so the seam is proven with FAKE adapters
    wrapping the pure kernels: plumbing, fallback, and tier-equality
    are all testable without the libraries."""

    @pytest.fixture(autouse=True)
    def _clean_registry(self):
        from pulsar_spark.functions import native_codecs as nc

        saved = dict(nc._REGISTRY)
        nc._REGISTRY.clear()
        yield
        nc._REGISTRY.clear()
        nc._REGISTRY.update(saved)

    def _media(self, spark):
        import numpy as np

        from pulsar_spark.functions.gif import encode_gif
        from pulsar_spark.functions.multimodal import _encode_png

        rows = [
            (0, "image", "png",
             _encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))),
            (1, "video", "gif",
             encode_gif([np.full((4, 4, 3), 7, np.uint8)], delays_cs=[5])),
        ]
        return spark.createDataFrame(
            rows, "media_id bigint, modality string, codec string, payload binary"
        )

    def test_detection_empty_in_this_container(self):
        from pulsar_spark.functions.native_codecs import detect_native_kernels

        assert detect_native_kernels() == {}

    def test_auto_without_adapters_equals_pure(self, spark):
        from pulsar_spark.functions.multimodal import decode_media

        m = self._media(spark)
        auto = decode_media(m, kernel="auto").collect()
        pure = decode_media(m, kernel="pure").collect()
        assert sorted(map(str, auto)) == sorted(map(str, pure))

    def test_fake_adapter_is_tier_equal(self, spark):
        """An adapter returning the pure kernel's pixels must produce
        EXACTLY the pure tier's rows — the finalize seam shares the
        feature functions, so equality is bit-for-bit."""
        from pulsar_spark.functions import native_codecs as nc
        from pulsar_spark.functions.multimodal import _decode_png, decode_media

        nc.register_adapter("png", lambda p: {"pixels": _decode_png(p)})
        m = self._media(spark).where("codec = 'png'")
        native = decode_media(m, kernel="auto").collect()
        pure = decode_media(m, kernel="pure").collect()
        assert list(map(str, native)) == list(map(str, pure))

    def test_adapter_retires_the_mp3_stub(self, spark):
        """A registered mp3 adapter makes strict-mode decode work — the
        documented path that closes the stub surface when a deployment
        has a library."""
        import numpy as np

        from pulsar_spark.functions import native_codecs as nc
        from pulsar_spark.functions.multimodal import decode_media

        m = spark.createDataFrame(
            [(9, "audio", "mp3", b"\xff\xfb fake-mp3-bytes")],
            "media_id bigint, modality string, codec string, payload binary",
        )
        # without an adapter the strict tier still raises (unchanged)
        with pytest.raises(Exception, match="no codec library"):
            decode_media(m, strict=True, kernel="pure").collect()
        nc.register_adapter(
            "mp3",
            lambda p: {"samples": np.zeros(800, np.float32), "rate": 8000,
                       "nch": 1},
        )
        row = decode_media(m, strict=True, kernel="auto").collect()[0]
        assert row.decode_ok and row.duration_ms == 100 and row.n_frames == 800

    def test_auto_falls_back_on_adapter_failure(self, spark):
        from pulsar_spark.functions import native_codecs as nc
        from pulsar_spark.functions.multimodal import decode_media

        def broken(payload):
            raise RuntimeError("native decoder segfault analog")

        nc.register_adapter("png", broken)
        m = self._media(spark).where("codec = 'png'")
        row = decode_media(m, kernel="auto").collect()[0]
        assert row.decode_ok and row.width == 4  # pure tier answered
        # native mode surfaces the failure as decode_ok=false instead
        row = decode_media(m, kernel="native").collect()[0]
        assert not row.decode_ok

    def test_native_without_adapter_raises(self, spark):
        from pulsar_spark.functions.multimodal import decode_media

        m = self._media(spark)
        with pytest.raises(Exception, match="no adapter registered"):
            decode_media(m, kernel="native").collect()

    def test_bad_kernel_rejected(self, spark):
        from pulsar_spark.functions.multimodal import decode_media

        with pytest.raises(ValueError, match="kernel"):
            decode_media(self._media(spark), kernel="gpu")


class TestAdviceHardening:
    """ADVICE r8: codec/ingestion totality + memory-shape fixes."""

    def test_flac_reserved_bits_code_raises_valueerror(self):
        """bits-per-sample code 0b011 is reserved (RFC 9639 §9.1.4) —
        the total-ValueError contract must hold, not leak a KeyError."""
        from pulsar_spark.functions.flac import decode_flac, encode_flac

        good = encode_flac([100, -100, 500, -500] * 16, rate=8000)
        # first frame starts after fLaC + block header + STREAMINFO
        frame_at = 4 + 4 + 34
        raw = bytearray(good)
        # bits-per-sample code lives in frame header byte 3, bits 3..1
        b = raw[frame_at + 3]
        raw[frame_at + 3] = (b & ~0x0E) | (0b011 << 1)
        # recompute the header CRC-8 so the reserved code is reached:
        # 4 fixed bytes + utf8 frame number (1) + 16-bit block size (2)
        from pulsar_spark.functions.flac import _crc8

        raw[frame_at + 7] = _crc8(bytes(raw[frame_at : frame_at + 7]))
        with pytest.raises(ValueError, match="reserved FLAC bits-per-sample"):
            decode_flac(bytes(raw))

    def test_gif_malformed_gce_size_raises(self):
        from pulsar_spark.functions.gif import decode_gif, encode_gif
        import numpy as np

        frame = np.zeros((4, 4, 3), np.uint8)
        good = bytearray(encode_gif([frame], delays_cs=[5]))
        i = good.find(b"\x21\xf9")
        assert i >= 0
        good[i + 2] = 3  # declared GCE size != 4
        with pytest.raises(ValueError, match="GCE"):
            decode_gif(bytes(good))

    def test_warc_streaming_iterator_matches_parse(self):
        from pulsar_spark.sources import encode_warc, iter_warc_records, parse_warc

        recs = [
            {"warc_type": "response", "target_uri": f"http://x/{i}",
             "payload": (b"HTTP/1.1 200 OK\r\n\r\n" + bytes([65 + i % 26]) * (1000 + i))}
            for i in range(50)
        ]
        data = encode_warc(recs, gzip_members=True)
        streamed = list(iter_warc_records(data))
        assert streamed == parse_warc(data)
        assert len(streamed) == 50
        # truncation raises mid-iteration, never silently drops tail
        it = iter_warc_records(data[: len(data) - 40])
        with pytest.raises(ValueError):
            list(it)

    def test_warc_record_spanning_many_chunks(self):
        """A record bigger than the 1 MiB decompress chunk still parses
        (the window accumulates across pulls)."""
        from pulsar_spark.sources import encode_warc, iter_warc_records

        big = b"x" * (3 << 20)
        data = encode_warc(
            [{"warc_type": "resource", "payload": big},
             {"warc_type": "resource", "payload": b"tail"}],
            gzip_members=True,
        )
        got = list(iter_warc_records(data))
        assert got[0]["payload"] == big and got[1]["payload"] == b"tail"

    def test_warc_date_fractional_seconds_survive(self, spark, tmp_path):
        from pulsar_spark.sources import encode_warc, wet_to_documents

        data = encode_warc(
            [{"warc_type": "conversion", "target_uri": "http://a/b",
              "date": "2024-02-01T00:00:05.123Z", "payload": b"hello world"},
             {"warc_type": "conversion", "target_uri": "http://a/c",
              "date": "2024-02-01T00:00:06Z", "payload": b"bye world"}],
            gzip_members=True,
        )
        p = tmp_path / "w.warc.gz"
        p.write_bytes(data)
        rows = {r.url: r.fetch_date for r in
                wet_to_documents(spark, str(p)).collect()}
        assert rows["http://a/b"] is not None
        assert rows["http://a/b"].second == 5
        assert rows["http://a/c"].second == 6
