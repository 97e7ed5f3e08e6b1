"""Subscriptions — durable named cursors as Structured Streaming queries.

Reference semantics: a subscription is a durable cursor over a topic
with an ack-state (SURVEY.md §1.1, §2.9); the four SubscriptionType
disciplines (capi/SubscriptionType.java:33-61) decide consumer fanout
and ordering:

- Exclusive / Failover -> one streaming query; per-partition order
  preserved by the source.
- Shared -> task-level parallelism inside the query (no ordering).
- Key_Shared -> ``repartition(n, sticky_key_hash(key))`` so each task
  owns a key range (per-key order).

The cursor IS the checkpoint: Spark's offset log + commit log give the
same at-least-once/effectively-once semantics as ack + dedup. A
subscription's position survives restarts via ``checkpoint_dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_spark.operators.subscriptions import sticky_key_hash


def subscribe(
    spark: SparkSession,
    topic_path: str,
    subscription_type: str = "exclusive",
    num_consumers: int = 1,
    max_files_per_trigger: int | None = None,
    interceptors=None,
) -> DataFrame:
    """Open a streaming scan of a topic (consumer analog).

    ``max_files_per_trigger`` is the flow-control permit analog
    (ServerCnx.handleFlow — bound work per micro-batch).

    ``interceptors``: ordered ``DataFrame -> DataFrame`` callables
    applied to the stream after dispatch partitioning — the
    ConsumerInterceptor.beforeConsume chain
    (capi/ConsumerInterceptor.java:118), streaming flavor; the same
    chain ``read_topic`` applies in batch mode.
    """
    static = spark.read.parquet(topic_path)  # schema discovery only
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(topic_path)

    if subscription_type == "key_shared":
        # each "consumer" = one shuffle partition owning a hash range
        stream = stream.repartition(num_consumers, sticky_key_hash(F.col("key")))
    for icept in interceptors or []:
        stream = icept(stream)
    return stream


def run_to_end(stream_writer, timeout_s: int = 120):
    """Run a streaming query with Trigger.AvailableNow to the current
    end of the topic and wait (the reference's ``reachedEndOfTopic``
    bounded-consume pattern). Returns the finished query."""
    q = stream_writer.trigger(availableNow=True).start()
    q.awaitTermination(timeout_s)
    return q


def subscribe_multi(
    spark: SparkSession,
    topic_paths: list[str],
    subscription_type: str = "exclusive",
    num_consumers: int = 1,
    max_files_per_trigger: int | None = None,
    interceptors=None,
) -> DataFrame:
    """Multi-topic subscription (client/impl/MultiTopicsConsumerImpl
    .java; topicsPattern/topics list on capi/ConsumerBuilder.java):
    one logical consumer over N topics = streaming UNION ALL of the
    per-topic scans (SURVEY.md §2.7). Each source keeps its own offset
    tracking in the shared checkpoint; per-partition order holds
    within each topic, with no cross-topic order (reference behavior).

    Key_Shared repartitioning and interceptors are applied to the
    UNIONED stream, so key ranges span all topics like a single
    consumer's hash space does.
    """
    if not topic_paths:
        raise ValueError("subscribe_multi needs at least one topic path")
    streams = [
        subscribe(
            spark,
            p,
            subscription_type="exclusive",  # per-topic scan; fanout below
            max_files_per_trigger=max_files_per_trigger,
        )
        for p in topic_paths
    ]
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    if subscription_type == "key_shared":
        out = out.repartition(num_consumers, sticky_key_hash(F.col("key")))
    for icept in interceptors or []:
        out = icept(out)
    return out
