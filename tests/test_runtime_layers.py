"""Tests: Functions layer, schema registry, transactions, IO registry,
tiered storage, multimodal plumbing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class TestFunctionsLayer:
    def test_exclamation_function(self, spark):
        # ExclamationFunction example: input + "!"
        from pulsar_spark.functions.runtime import map_function

        df = spark.createDataFrame([("hello",), ("world",)], ["val"])
        out = map_function(df, lambda c: F.concat(c, F.lit("!")))
        assert {r["result"] for r in out.collect()} == {"hello!", "world!"}

    def test_row_at_a_time_spi(self, spark):
        from pulsar_spark.functions.runtime import FunctionContext, map_function

        ctx = FunctionContext(user_config={"suffix": "?"})

        def process(value, context):
            context.incr_counter("seen")
            return value + context.get_user_config_value("suffix")

        df = spark.createDataFrame([("a",), ("b",), ("c",)], ["val"])
        out = map_function(df, process, vectorized=False, context=ctx)
        assert {r["result"] for r in out.collect()} == {"a?", "b?", "c?"}
        assert ctx.get_counter("seen") == 3

    def test_flatmap_wordsplit(self, spark):
        from pulsar_spark.functions.runtime import flatmap_function

        df = spark.createDataFrame([("a b",), ("c",)], ["val"])
        out = flatmap_function(df, lambda c: F.split(c, " "))
        assert out.count() == 3

    def test_identity(self, messages):
        from pulsar_spark.functions.runtime import identity_function

        assert identity_function(messages).count() == messages.count()

    def test_side_outputs(self, spark, messages):
        from pulsar_spark.functions.runtime import SideOutputs

        d = tempfile.mkdtemp(prefix="ps_side_")
        try:
            side = SideOutputs()
            side.publish("errors", F.col("event_type") == "error", ["event_id", "val"])
            side.publish("big", F.col("val") > 100)
            written = side.write_all(messages, d)
            assert written["errors"] == messages.where("event_type = 'error'").count()
            got = spark.read.parquet(f"{d}/errors")
            assert got.columns == ["event_id", "val"]
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestSchemaRegistry:
    @pytest.fixture()
    def reg(self):
        from pulsar_spark.schema_registry import SchemaRegistry

        d = tempfile.mkdtemp(prefix="ps_reg_")
        yield SchemaRegistry(d)
        shutil.rmtree(d, ignore_errors=True)

    def test_register_and_versions(self, reg):
        s1 = StructType.fromDDL("a int, b string")
        assert reg.register("t", s1) == 0
        assert reg.register("t", s1) == 0  # idempotent
        s2 = StructType.fromDDL("a int, b string, c double")  # nullable add: FULL ok
        assert reg.register("t", s2) == 1
        assert reg.latest("t")[0] == 1

    def test_backward_rejects_nonnullable_add(self, reg):
        from pyspark.sql.types import IntegerType, StructField

        from pulsar_spark.schema_registry import IncompatibleSchemaError

        s1 = StructType.fromDDL("a int")
        reg.register("t", s1, "BACKWARD")
        s2 = StructType([*s1.fields, StructField("b", IntegerType(), nullable=False)])
        with pytest.raises(IncompatibleSchemaError):
            reg.register("t", s2, "BACKWARD")

    def test_type_change_rejected(self, reg):
        from pulsar_spark.schema_registry import IncompatibleSchemaError

        reg.register("t", StructType.fromDDL("a int"), "FULL")
        with pytest.raises(IncompatibleSchemaError):
            reg.register("t", StructType.fromDDL("a string"), "FULL")

    def test_always_incompatible_freezes(self, reg):
        from pulsar_spark.schema_registry import IncompatibleSchemaError

        reg.register("t", StructType.fromDDL("a int"), "ALWAYS_INCOMPATIBLE")
        with pytest.raises(IncompatibleSchemaError):
            reg.register("t", StructType.fromDDL("a int, b string"), "ALWAYS_INCOMPATIBLE")

    def test_auto_consume_projection(self, reg, spark):
        reg.register("t", StructType.fromDDL("a int, b string, c double"))
        df = spark.createDataFrame([(1, "x")], "a int, b string")
        out = reg.read_with_latest(df, "t")
        assert out.columns == ["a", "b", "c"]
        assert out.head()["c"] is None

    def test_validate_produce(self, reg, spark):
        from pulsar_spark.schema_registry import IncompatibleSchemaError

        reg.register("t", StructType.fromDDL("a int, b string"))
        ok = spark.createDataFrame([(1, "x")], "a int, b string")
        reg.validate_produce("t", ok)  # no raise
        bad = spark.createDataFrame([(1,)], "a int")
        with pytest.raises(IncompatibleSchemaError):
            reg.validate_produce("t", bad)

    def test_produce_enforces_registered_schema(self, reg, spark, tmp_path):
        """AUTO_PRODUCE on the write path: produce(registry=...) refuses
        a mismatched frame before writing anything."""
        from pulsar_spark.schema_registry import IncompatibleSchemaError
        from pulsar_spark.sources.topics import produce

        topic = str(tmp_path / "t")
        reg.register(topic, StructType.fromDDL("a bigint, b string"))
        ok = spark.createDataFrame([(1, "x"), (2, "y")], "a bigint, b string")
        produce(ok, topic, key_col="b", num_partitions=2, registry=reg)
        assert spark.read.parquet(topic).count() == 2

        bad = ok.withColumn("a", ok["a"].cast("string"))
        with pytest.raises(IncompatibleSchemaError):
            produce(bad, topic, key_col="b", num_partitions=2, registry=reg)
        assert spark.read.parquet(topic).count() == 2  # nothing appended


class TestTransactions:
    def test_commit_abort_visibility(self, spark):
        from pulsar_spark.operators.transactions import (
            TransactionCoordinator,
            committed_view,
            produce_transactional,
        )

        d = tempfile.mkdtemp(prefix="ps_txn_")
        try:
            coord = TransactionCoordinator(f"{d}/txn.json")
            topic = f"{d}/topic"
            payload = spark.range(10).select(F.col("id").alias("event_id"))

            t1 = coord.begin()
            t2 = coord.begin()
            produce_transactional(payload, topic, coord, t1, num_partitions=2)
            produce_transactional(payload, topic, coord, t2, num_partitions=2)

            log = spark.read.parquet(topic)
            view0 = committed_view(log, coord.state_df(spark))
            assert view0.count() == 0  # both OPEN -> invisible

            coord.commit(t1)
            coord.abort(t2)
            view1 = committed_view(spark.read.parquet(topic), coord.state_df(spark))
            assert view1.count() == 10
            assert view1.where(F.col("txn_id") == t2).count() == 0

            with pytest.raises(ValueError):
                coord.commit(t2)  # aborted, cannot commit
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_timeout_sweep(self, spark):
        from pulsar_spark.operators.transactions import TransactionCoordinator

        d = tempfile.mkdtemp(prefix="ps_txn2_")
        try:
            coord = TransactionCoordinator(f"{d}/txn.json")
            t = coord.begin(timeout_s=-1)  # already expired
            assert coord.sweep_timeouts() == [t]
            assert coord.status(t) == "ABORTED"
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestIORegistry:
    def test_datagen_deterministic(self, spark):
        from pulsar_spark.sources.io import open_source

        a = open_source("datagen", spark, rows=100).collect()
        b = open_source("datagen", spark, rows=100).collect()
        assert a == b
        assert all(18 <= r["age"] <= 97 for r in a)

    def test_file_roundtrip_via_sinks(self, spark):
        from pulsar_spark.sources.io import open_sink, open_source

        d = tempfile.mkdtemp(prefix="ps_io_")
        try:
            src = open_source("datagen", spark, rows=50)
            open_sink("parquet", path=f"{d}/out", mode="overwrite")(src)
            back = open_source("file", spark, path=f"{d}/out")
            assert back.count() == 50
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_format_connectors_roundtrip(self, spark):
        """csv / jsonl / text named connectors (pulsar-io file family)."""
        from pulsar_spark.sources.io import list_connectors, open_sink, open_source

        reg = list_connectors()
        assert {"csv", "jsonl", "text", "file", "datagen"} <= set(reg["sources"])
        assert {"csv", "jsonl", "kv", "parquet", "topic"} <= set(reg["sinks"])

        d = tempfile.mkdtemp(prefix="ps_iofmt_")
        try:
            src = open_source("datagen", spark, rows=40)
            open_sink("csv", path=f"{d}/c", mode="overwrite")(src)
            back = open_source("csv", spark, path=f"{d}/c", inferSchema="true")
            assert back.count() == 40 and set(back.columns) == set(src.columns)

            open_sink("jsonl", path=f"{d}/j", mode="overwrite")(src)
            assert open_source("jsonl", spark, path=f"{d}/j").count() == 40

            with open(f"{d}/lines.txt", "w") as fh:
                fh.write("alpha\nbeta\ngamma\n")
            lines = open_source("text", spark, path=f"{d}/lines.txt")
            assert {r.line for r in lines.collect()} == {"alpha", "beta", "gamma"}
            assert all(r.file.endswith("lines.txt") for r in lines.collect())
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_kv_sink_upserts_latest_per_key(self, spark):
        """kv sink = the Redis/HBase/JDBC-upsert family: the store holds
        latest-value-per-key across batches, merged on each write."""
        from pulsar_spark.sources.io import open_sink

        d = tempfile.mkdtemp(prefix="ps_iokv_")
        try:
            store = f"{d}/kv"
            sink = open_sink("kv", path=store, key_col="k", order_col="seq")
            b1 = spark.createDataFrame(
                [("a", 1, "v1"), ("b", 1, "w1")], "k string, seq long, v string"
            )
            sink(b1)
            got = {r.k: r.v for r in spark.read.parquet(store).collect()}
            assert got == {"a": "v1", "b": "w1"}

            # second batch: update a, add c; b untouched survives
            b2 = spark.createDataFrame(
                [("a", 2, "v2"), ("c", 1, "x1")], "k string, seq long, v string"
            )
            sink(b2)
            got = {r.k: r.v for r in spark.read.parquet(store).collect()}
            assert got == {"a": "v2", "b": "w1", "c": "x1"}

            # stale replay (seq below stored) does not regress the store
            sink(spark.createDataFrame([("a", 1, "v1")], "k string, seq long, v string"))
            got = {r.k: r.v for r in spark.read.parquet(store).collect()}
            assert got["a"] == "v2"

            # interrupted swap: crash left the store only under __old;
            # the next write recovers it before merging — nothing lost
            import os

            os.rename(store, store + "__old")
            sink(spark.createDataFrame([("d", 1, "y1")], "k string, seq long, v string"))
            got = {r.k: r.v for r in spark.read.parquet(store).collect()}
            assert got == {"a": "v2", "b": "w1", "c": "x1", "d": "y1"}
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_topic_sink_envelopes(self, spark):
        from pulsar_spark.sources.io import open_sink, open_source

        d = tempfile.mkdtemp(prefix="ps_io2_")
        try:
            src = open_source("datagen", spark, rows=50)
            open_sink("topic", topic_path=f"{d}/t", key_col="last_name", num_partitions=2)(src)
            t = spark.read.parquet(f"{d}/t")
            assert t.count() == 50
            assert {"offset", "producer_name", "publish_time", "key"} <= set(t.columns)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_registry_lists(self):
        from pulsar_spark.sources.io import list_connectors

        c = list_connectors()
        assert "datagen" in c["sources"] and "topic" in c["sinks"]

    def test_batch_source_two_cycle_discovery(self, spark):
        # BatchSource.java:62 discover -> read -> commit: trigger 1
        # ingests the files present, trigger 2 is a no-op (all
        # committed), trigger 3 picks up ONLY a file added in between.
        from pulsar_spark.sources.io import file_batch_source, open_sink, open_source

        d = tempfile.mkdtemp(prefix="ps_batchsrc_")
        try:
            open_source("datagen", spark, rows=30).write.parquet(f"{d}/in/f1")
            runner = file_batch_source(
                pattern=f"{d}/in/f*",
                sink=open_sink("parquet", path=f"{d}/out", mode="append"),
                ledger_path=f"{d}/ledger.json",
            )
            r1 = runner.trigger(spark, count_rows=True)
            assert (r1["discovered"], r1["ingested_rows"]) == (1, 30)
            r2 = runner.trigger(spark, count_rows=True)
            assert (r2["discovered"], r2["ingested_rows"]) == (0, 0)
            open_source("datagen", spark, rows=20, seed=7).write.parquet(f"{d}/in/f2")
            r3 = runner.trigger(spark, count_rows=True)
            assert (r3["discovered"], r3["ingested_rows"]) == (1, 20)
            assert spark.read.parquet(f"{d}/out").count() == 50
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestTieredStorage:
    def test_offload_and_readthrough(self, spark, messages):
        from pulsar_spark.sources import write_topic
        from pulsar_spark.sources.tiered import offload_partitions, tiered_view

        d = tempfile.mkdtemp(prefix="ps_tier_")
        try:
            hot, cold = f"{d}/hot", f"{d}/cold"
            write_topic(messages, hot)
            total = messages.count()
            cutoff = "2024-01-15 00:00:00"
            stats = offload_partitions(spark, hot, cold, cutoff)
            assert stats["offloaded"] > 0 and stats["hot"] > 0
            assert stats["offloaded"] + stats["hot"] == total
            # hot tier holds only new rows
            assert spark.read.parquet(hot).where(F.col("publish_time") < cutoff).count() == 0
            # read-through view sees everything
            assert tiered_view(spark, hot, cold).count() == total
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_offload_preserves_topic_sidecar(self, spark, messages):
        """The hot-tier rewrite swap must not destroy _topic.json —
        topic identity (partition count) survives offload."""
        import os

        from pulsar_spark.sources import write_topic
        from pulsar_spark.sources.tiered import offload_partitions
        from pulsar_spark.sources.topics import create_topic, topic_metadata

        d = tempfile.mkdtemp(prefix="ps_tier_meta_")
        try:
            hot, cold = f"{d}/hot", f"{d}/cold"
            create_topic(hot, num_partitions=8, properties={"owner": "t"})
            write_topic(messages, hot, mode="append")
            stats = offload_partitions(spark, hot, cold, "2024-01-15 00:00:00")
            assert stats["offloaded"] > 0
            assert os.path.exists(os.path.join(hot, "_topic.json"))
            meta = topic_metadata(hot)
            assert meta["num_partitions"] == 8
            assert meta["properties"] == {"owner": "t"}
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestMultimodal:
    def test_decode_plumbing(self, spark, documents):
        from pulsar_spark.functions.multimodal import attach_media, decode_media

        media = attach_media(
            documents.withColumn("payload", F.encode("text", "utf-8")),
            "payload",
            "image",
            "fake",
            "doc_id",
        )
        feats = decode_media(media)
        rows = feats.collect()
        assert len(rows) == documents.count()
        assert all(len(r["feature"]) == 16 and r["decode_ok"] for r in rows)
        # deterministic: same payload -> same feature
        again = decode_media(media).collect()
        assert sorted(r["media_id"] for r in rows) == sorted(r["media_id"] for r in again)

    def test_strict_raises(self, spark, documents):
        from pulsar_spark.functions.multimodal import attach_media, decode_media

        media = attach_media(
            documents.limit(1).withColumn("payload", F.encode("text", "utf-8")),
            "payload",
            "image",
            "fake",
            "doc_id",
        )
        with pytest.raises(Exception):
            decode_media(media, strict=True).collect()

    def test_frame_sampling_plan(self, spark):
        from pulsar_spark.functions.multimodal import sample_frames

        media = spark.createDataFrame(
            [(1, "video", 25), (2, "image", 1)], "media_id long, modality string, n_frames int"
        )
        out = sample_frames(media, every_n=10)
        assert [r["frame_idx"] for r in out.orderBy("frame_idx").collect()] == [0, 10, 20]


class TestCli:
    def test_produce_read_stats_roundtrip(self, spark, tmp_path):
        """CLI shim: produce a parquet file into a topic, read and stats
        it back (CmdProduce/CmdRead behavioral analog). Runs main() in
        process against the shared session."""
        import json

        from pulsar_spark.__main__ import main

        src = str(tmp_path / "in.parquet")
        spark.range(50).selectExpr("id", "id % 5 AS k").write.parquet(src)
        topic = str(tmp_path / "topic")

        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["produce", topic, "--input", src, "--key-col", "k",
                  "--num-partitions", "4"])
        assert json.loads(buf.getvalue())["produced"] == 50

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["read", topic, "-n", "5"])
        lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
        assert len(lines) == 5 and "offset" in lines[0]

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["stats", topic])
        stats = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
        assert sum(int(s["msg_count"]) for s in stats) == 50

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["consume", topic, "-n", "2"])
        peeked = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
        from collections import Counter

        per_part = Counter(r["partition"] for r in peeked)
        assert per_part and all(n <= 2 for n in per_part.values())  # n per partition

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["compact", topic])
        assert "compacted_horizon" in json.loads(buf.getvalue())


class TestKeyValueSchema:
    """KEY_VALUE schema (SchemaType.java:120; KeyValueEncodingType
    INLINE/SEPARATED) encode/decode round trips."""

    def _frame(self, spark):
        return spark.createDataFrame(
            [(1, 10, "click", 1.5), (2, 20, "view", -3.25), (3, 10, "click", 0.0)],
            "event_id INT, user_id INT, event_type STRING, amount DOUBLE",
        )

    def test_inline_round_trip(self, spark):
        from pulsar_spark.schema_registry import kv_decode, kv_encode

        df = self._frame(spark)
        enc = kv_encode(df, ["user_id"], ["event_type", "amount"], encoding="INLINE")
        assert set(enc.columns) == {"event_id", "payload"}
        dec = kv_decode(
            enc, "user_id INT", "event_type STRING, amount DOUBLE", encoding="INLINE"
        )
        got = sorted(dec.select(*df.columns).collect())
        assert got == sorted(df.collect())

    def test_separated_round_trip(self, spark):
        from pulsar_spark.schema_registry import kv_decode, kv_encode

        df = self._frame(spark)
        enc = kv_encode(df, ["user_id"], ["event_type", "amount"], encoding="SEPARATED")
        # key record rides its own column, payload holds only the value
        assert set(enc.columns) == {"event_id", "kv_key_json", "payload"}
        assert enc.where("payload LIKE '%user_id%'").count() == 0
        dec = kv_decode(
            enc, "user_id INT", "event_type STRING, amount DOUBLE", encoding="SEPARATED"
        )
        assert sorted(dec.select(*df.columns).collect()) == sorted(df.collect())

    def test_field_collision_raises(self, spark):
        import pytest as _pytest

        from pulsar_spark.schema_registry import kv_decode

        with _pytest.raises(ValueError, match="collision"):
            kv_decode(
                self._frame(spark), "user_id INT", "user_id INT", encoding="INLINE"
            )


class TestInterceptors:
    """Producer beforeSend chain (capi/interceptor/ProducerInterceptor
    .java:83) and consumer beforeConsume chain
    (capi/ConsumerInterceptor.java:118) as plan transformations."""

    def test_producer_chain_applies_in_order(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pulsar_spark.sources.topics import produce, read_topic

        topic = str(tmp_path / "topic")
        payload = spark.createDataFrame([("a",), ("b",)], "body STRING")
        produce(
            payload,
            topic,
            num_partitions=2,
            interceptors=[
                lambda df: df.withColumn("body", F.upper("body")),
                lambda df: df.withColumn("body", F.concat("body", F.lit("!"))),
            ],
        )
        got = sorted(r.body for r in read_topic(spark, topic).collect())
        assert got == ["A!", "B!"]  # upper ran before the append

    def test_consumer_interceptor_filters_delivery(self, spark, tmp_path):
        from pulsar_spark.sources.topics import produce, read_topic

        topic = str(tmp_path / "topic")
        payload = spark.createDataFrame([(i,) for i in range(10)], "v INT")
        produce(payload, topic, num_partitions=2)
        got = read_topic(
            spark, topic, interceptors=[lambda df: df.where("v % 2 = 0")]
        )
        assert sorted(r.v for r in got.collect()) == [0, 2, 4, 6, 8]

    def test_truncate_and_last_subcommands(self, spark, tmp_path):
        import contextlib
        import io as _io
        import json

        from pulsar_spark.__main__ import main

        src = str(tmp_path / "in2.parquet")
        spark.range(30).selectExpr("id", "id % 3 AS k").write.parquet(src)
        topic = str(tmp_path / "topic2")
        with contextlib.redirect_stdout(_io.StringIO()):
            main(["create", topic, "--partitions", "3"])
            main(["produce", topic, "--input", src, "--key-col", "k"])

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["last", topic])
        rows = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
        assert rows and all(int(r["last_offset"]) >= 0 for r in rows)

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["truncate", topic])
        assert json.loads(buf.getvalue()) == {"truncated": topic}
        import os

        assert os.path.exists(os.path.join(topic, "_topic.json"))
        assert not any(n.startswith("partition=") for n in os.listdir(topic))


class TestCliRound3:
    def test_offload_and_skip_subcommands(self, spark, messages, tmp_path):
        import contextlib
        import io as _io
        import json

        from pulsar_spark.__main__ import main
        from pulsar_spark.sources import write_topic

        topic = str(tmp_path / "t")
        write_topic(messages.limit(1000), topic)
        cold = str(tmp_path / "cold")

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["offload", topic, "--cold", cold, "--before", "2024-01-10 00:00:00"])
        stats = json.loads(buf.getvalue())
        assert stats["offloaded"] > 0
        assert stats["offloaded"] + stats["hot"] == 1000
        assert spark.read.parquet(cold).count() == stats["offloaded"]

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["skip", topic, "-n", "3"])
        rows = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
        assert rows and all(int(r["skipped"]) <= 3 for r in rows)
