"""Streaming geo-replication — the GeoPersistentReplicator as a
Structured Streaming query.

Reference semantics (pulsar-broker/.../persistent/
GeoPersistentReplicator.java): each cluster's replicator tails its
local topic and re-publishes to the remote cluster, skipping messages
that ORIGINATED at the target (:149 loop avoidance — the batch filter
in operators/replication.py), stamping ``replicated_from`` with the
origin cluster (Message.java:240-248; an already-stamped origin is
PRESERVED, so multi-hop forwarding never loses the true origin), and
relying on broker-side deduplication to make redeliveries harmless.

The dedup rendering here is exactly the reference's
``highestSequencedPushed`` map, keyed by (ORIGIN CLUSTER, source
partition): each epoch fetches the remote topic's per-source high
watermark (one bounded aggregate over three narrow columns) and
forwards only rows past it — a replayed epoch, a replicator restart,
an overlapping second replicator, and a MESH of replicators fanning
into the same remote topic (A->B and C->B share src_partition numbers
but never an origin) all converge instead of duplicating. Forwarded
rows carry ``(replicated_from, src_partition, src_offset)`` so the
watermark is exact, and each micro-batch is forwarded in
``(src_partition, src_offset)`` order so per-source-partition order
survives into the remote log (the reference's per-partition ordering
guarantee; there is no cross-partition order to preserve).

``event_time`` is forwarded, not re-minted: a replicated row must keep
its original event time or every event-time operator at the remote
(windows, watermarks, lateness) would see the replication wall-clock
instead.

Scale shape: the candidate filter and origin stamp ride the stream
scan; the per-epoch cost over the remote log is one narrow grouped
MAX over the forwarded-coordinate columns plus produce's own offset
rebase aggregate — both footer/stat-sized passes, never data-sized
joins; the forward is the ordinary produce path.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: envelope columns the remote produce re-mints — everything else in
#: the consumed envelope is treated as payload and forwarded
_REMINTED = ("topic", "partition", "offset", "publish_time",
             "sequence_id", "producer_name")


def replicated_high_watermarks(spark: SparkSession, dst_topic: str) -> dict[str, int]:
    """Per-(origin cluster, source partition) max forwarded src_offset
    stored at the remote — the replicator's ``highestSequencedPushed``
    map, one bounded grouped aggregate (three narrow columns ride the
    scan). Keys are ``"{origin}|{src_partition}"`` strings. Read with
    mergeSchema: the remote topic legitimately mixes file schemas
    (local-producer files have no src_* columns; sampling one of those
    footers without the merge would silently report an empty map and
    disable dedup under an at-least-once replay)."""
    if not os.path.isdir(dst_topic):
        return {}
    df = spark.read.option("mergeSchema", "true").parquet(dst_topic)
    if "src_partition" not in df.columns or "replicated_from" not in df.columns:
        return {}
    return {
        f"{r.replicated_from}|{int(r.src_partition)}": int(r.mx)
        for r in (
            df.where(
                F.col("src_partition").isNotNull()
                & F.col("replicated_from").isNotNull()
            )
            .groupBy("replicated_from", "src_partition")
            .agg(F.max("src_offset").alias("mx"))
            .collect()
        )
    }


def replicate_batch(
    batch: DataFrame,
    dst_topic: str,
    local_cluster: str,
    target_cluster: str,
    num_partitions: int | None = None,
) -> None:
    """Forward one micro-batch of local envelope rows to the remote
    topic (importable so tests and the foreachBatch closure share one
    implementation). Loop avoidance, origin stamping, watermark dedup,
    and per-source-partition ordering as described in the module
    docstring."""
    from pulsar_spark.envelope import watermark_lookup
    from pulsar_spark.operators.replication import replicate_candidates
    from pulsar_spark.sources.topics import produce

    spark = batch.sparkSession
    # a plain topic (never replicated before) lacks both guard columns
    # replicate_candidates references — add them before the filter
    if "marker_type" not in batch.columns:
        batch = batch.withColumn("marker_type", F.lit(None).cast("int"))
    if "replicated_from" not in batch.columns:
        batch = batch.withColumn("replicated_from", F.lit(None).cast("string"))
    cand = replicate_candidates(batch, target_cluster)
    cand = cand.withColumn(
        "replicated_from",
        F.coalesce(F.col("replicated_from"), F.lit(local_cluster)),
    )
    cand = cand.withColumns(
        {
            "src_partition": F.col("partition").cast("int"),
            "src_offset": F.col("offset").cast("bigint"),
        }
    )
    highs = replicated_high_watermarks(spark, dst_topic)
    if highs:
        key = F.concat(
            F.col("replicated_from"), F.lit("|"), F.col("src_partition").cast("string")
        )
        cand = cand.where(F.col("src_offset") > watermark_lookup(key, highs))
    payload = cand.drop(*[c for c in _REMINTED if c in cand.columns]).orderBy(
        "src_partition", "src_offset"
    )
    # pin the filtered+sorted batch: the emptiness probe and produce's
    # write must not each re-execute the plan
    payload = payload.persist()
    try:
        if payload.isEmpty():
            return
        produce(
            payload,
            dst_topic,
            key_col="key" if "key" in payload.columns else None,
            # forward the ORIGINAL event time — re-minting it would
            # break every event-time operator at the remote
            event_time_col="event_time" if "event_time" in payload.columns else None,
            num_partitions=num_partitions,
            producer_name=f"replicator-{local_cluster}",
        )
    finally:
        payload.unpersist()


def replicate_stream(
    spark: SparkSession,
    src_topic: str,
    dst_topic: str,
    local_cluster: str,
    target_cluster: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Open the replicator over a local topic and return the started
    StreamingQuery (availableNow: drains everything the checkpoint has
    not seen, then stops — call again as traffic arrives; a
    Trigger.ProcessingTime deployment is the same writer without
    availableNow)."""
    from pulsar_spark.streaming.subscribe import subscribe

    stream = subscribe(spark, src_topic, max_files_per_trigger=max_files_per_trigger)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            replicate_batch(
                batch, dst_topic, local_cluster, target_cluster,
                num_partitions=num_partitions,
            )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
