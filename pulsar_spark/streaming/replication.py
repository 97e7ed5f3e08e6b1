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
``highestSequencedPushed`` map, keyed by SOURCE partition: each epoch
fetches the remote topic's per-source-partition high watermark (one
bounded aggregate over two narrow columns) and forwards only rows past
it — a replayed epoch, a replicator restart, or an overlapping second
replicator all converge instead of duplicating. Forwarded rows carry
``(src_partition, src_offset)`` so the watermark is exact, and each
micro-batch is forwarded in ``(src_partition, src_offset)`` order so
per-source-partition order survives into the remote log (the
reference's per-partition ordering guarantee; there is no cross-
partition order to preserve).

Scale shape: the candidate filter and origin stamp ride the stream
scan; the per-epoch watermark fetch is segment-stats-sized, never
data-sized; the forward is the ordinary produce path.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: envelope columns the remote produce re-mints — everything else in
#: the consumed envelope is treated as payload and forwarded
_REMINTED = ("topic", "partition", "offset", "publish_time",
             "sequence_id", "producer_name")


def replicated_high_watermarks(spark: SparkSession, dst_topic: str) -> dict[int, int]:
    """Per-SOURCE-partition max forwarded src_offset stored at the
    remote — the replicator's ``highestSequencedPushed`` map, one
    bounded grouped aggregate (two narrow columns ride the scan)."""
    if not os.path.isdir(dst_topic):
        return {}
    df = spark.read.parquet(dst_topic)
    if "src_partition" not in df.columns:
        return {}
    return {
        int(r.src_partition): int(r.mx)
        for r in (
            df.where(F.col("src_partition").isNotNull())
            .groupBy("src_partition")
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
    from pulsar_spark.operators.replication import replicate_candidates
    from pulsar_spark.sources.topics import produce

    spark = batch.sparkSession
    if "marker_type" not in batch.columns:
        batch = batch.withColumn("marker_type", F.lit(None).cast("int"))
    cand = replicate_candidates(batch, target_cluster)
    cand = cand.withColumn(
        "replicated_from",
        F.coalesce(F.col("replicated_from"), F.lit(local_cluster))
        if "replicated_from" in batch.columns
        else F.lit(local_cluster),
    )
    cand = cand.withColumns(
        {
            "src_partition": F.col("partition").cast("int"),
            "src_offset": F.col("offset").cast("bigint"),
        }
    )
    highs = replicated_high_watermarks(spark, dst_topic)
    if highs:
        hi_map = F.create_map(
            *[
                x
                for p, o in sorted(highs.items())
                for x in (F.lit(int(p)).cast("int"), F.lit(int(o)).cast("bigint"))
            ]
        )
        cand = cand.where(
            F.col("src_offset")
            > F.coalesce(hi_map[F.col("src_partition")], F.lit(-1))
        )
    payload = cand.drop(*[c for c in _REMINTED if c in cand.columns]).orderBy(
        "src_partition", "src_offset"
    )
    if payload.isEmpty():
        return
    produce(
        payload,
        dst_topic,
        key_col="key" if "key" in payload.columns else None,
        num_partitions=num_partitions,
        producer_name=f"replicator-{local_cluster}",
    )


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
