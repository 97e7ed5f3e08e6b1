"""Streaming geo-replication — the GeoPersistentReplicator as a
Structured Streaming query.

Reference semantics (pulsar-broker/.../persistent/
GeoPersistentReplicator.java): each cluster's replicator tails its
local topic and re-publishes to the remote cluster, discarding any
entry that was ALREADY replicated into this region (:207 — strict
one-hop forwarding; loop avoidance falls out as a special case),
honoring per-message ``replicateTo`` lists (:216), stamping
``replicated_from`` with the local cluster unconditionally (:255
``msg.setReplicatedFrom(localCluster)``), and relying on broker-side
deduplication to make redeliveries harmless.

The dedup rendering here is the reference's per-source
``highestSequencedPushed`` idea made replay-exact: forwarded rows
carry ``(replicated_from, src_partition, src_offset)``, and each
epoch anti-joins its candidates against the coordinates ALREADY
PRESENT at the remote, scoped to the batch's own offset window (a
bounded per-key MIN over the micro-batch turns into a literal-map
filter riding the remote scan, so the anti-join's build side is the
replay window, never the remote log). Presence — not a MAX
watermark — is what makes a torn remote produce safe: if a failed
epoch left only the higher offsets of a source partition visible,
the replay still forwards the missing lower ones, where a
``src_offset > max`` filter would skip them forever (the reference
never faces this because the broker persists the replicator's
stream strictly in order).

Each micro-batch is forwarded with per-source-partition ordering
only — ``repartition(src_partition)`` + ``sortWithinPartitions`` —
because that is the reference's guarantee (replication is
per-partition lanes; there is no cross-partition order to preserve).
A global ``orderBy`` here would be a range exchange plus full-batch
sort every epoch, turning a lane-parallel copy into a sort-bound one
at scale.

``event_time`` is forwarded, not re-minted: a replicated row must keep
its original event time or every event-time operator at the remote
(windows, watermarks, lateness) would see the replication wall-clock
instead.

Scale shape: the candidate filter and origin stamp ride the stream
scan; the per-epoch remote-side cost is one narrow three-column pass
bounded by the batch's offset window plus produce's own offset rebase
aggregate — never data-sized joins; the forward is the ordinary
produce path.
"""
from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: envelope columns the remote produce re-mints — everything else in
#: the consumed envelope is treated as payload and forwarded
_REMINTED = ("topic", "partition", "offset", "publish_time",
             "sequence_id", "producer_name")


def _remote_coords(spark: SparkSession, dst_topic: str) -> DataFrame | None:
    """The remote topic's forwarded-coordinate columns
    ``(replicated_from, src_partition, src_offset)``, or None when the
    destination holds no replicated rows yet. Read with mergeSchema:
    the remote topic legitimately mixes file schemas (local-producer
    files have no src_* columns; sampling one of those footers without
    the merge would silently report nothing and disable dedup under an
    at-least-once replay). A destination that exists but has no data
    files yet — pre-created via create_topic, which writes only
    ``_topic.json`` — reads as AnalysisException and means the same
    thing as a missing one."""
    if not os.path.isdir(dst_topic):
        return None
    try:
        df = spark.read.option("mergeSchema", "true").parquet(dst_topic)
    except AnalysisException:
        return None
    if "src_partition" not in df.columns or "replicated_from" not in df.columns:
        return None
    return (
        df.where(
            F.col("src_partition").isNotNull()
            & F.col("replicated_from").isNotNull()
        )
        .select(
            F.col("replicated_from"),
            F.col("src_partition").cast("int").alias("src_partition"),
            F.col("src_offset").cast("bigint").alias("src_offset"),
        )
    )


def replicated_high_watermarks(spark: SparkSession, dst_topic: str) -> dict[str, int]:
    """Per-(origin cluster, source partition) max forwarded src_offset
    stored at the remote — the replicator's ``highestSequencedPushed``
    map as an observability rollup, one bounded grouped aggregate
    (three narrow columns ride the scan). Keys are
    ``"{origin}|{src_partition}"`` strings."""
    coords = _remote_coords(spark, dst_topic)
    if coords is None:
        return {}
    return {
        f"{r.replicated_from}|{int(r.src_partition)}": int(r.mx)
        for r in (
            coords.groupBy("replicated_from", "src_partition")
            .agg(F.max("src_offset").alias("mx"))
            .collect()
        )
    }


def _prepare_payload(
    batch: DataFrame,
    dst_topic: str,
    local_cluster: str,
    target_cluster: str,
    replicated_subscriptions: bool = False,
) -> DataFrame:
    """The forwardable slice of one micro-batch: one-hop candidate
    filter, unconditional origin stamp, source-coordinate columns,
    presence anti-join against the remote's replay window, and the
    per-lane (never global) sort. Pure plan construction except for
    one bounded collect (per-(origin, src_partition) MIN of the batch
    — at most one row per source lane)."""
    from pulsar_spark.envelope import watermark_lookup
    from pulsar_spark.operators.replication import replicate_candidates

    spark = batch.sparkSession
    # a plain topic (never replicated before) lacks both guard columns
    # replicate_candidates references — add them before the filter
    if "marker_type" not in batch.columns:
        batch = batch.withColumn("marker_type", F.lit(None).cast("int"))
    if "replicated_from" not in batch.columns:
        batch = batch.withColumn("replicated_from", F.lit(None).cast("string"))
    cand = replicate_candidates(
        batch, target_cluster,
        replicated_subscription_markers=replicated_subscriptions,
    )
    # one-hop candidates all have a NULL origin; stamp unconditionally
    # like the reference (GeoPersistentReplicator.java:255)
    cand = cand.withColumn("replicated_from", F.lit(local_cluster))
    cand = cand.withColumns(
        {
            "src_partition": F.col("partition").cast("int"),
            "src_offset": F.col("offset").cast("bigint"),
        }
    )
    seen = _remote_coords(spark, dst_topic)
    if seen is not None:
        # the batch's own offset window, one bounded row per lane —
        # keys outside the batch resolve to the huge default and drop
        # out, so the anti-join build side is replay-window-sized
        mins = {
            f"{r.replicated_from}|{int(r.src_partition)}": int(r.mn)
            for r in (
                cand.groupBy("replicated_from", "src_partition")
                .agg(F.min("src_offset").alias("mn"))
                .collect()
            )
        }
        if mins:
            key = F.concat(
                F.col("replicated_from"),
                F.lit("|"),
                F.col("src_partition").cast("string"),
            )
            window = seen.where(
                F.col("src_offset") >= watermark_lookup(key, mins, default=2**62)
            )
            cand = cand.join(
                window,
                ["replicated_from", "src_partition", "src_offset"],
                "left_anti",
            )
    return (
        cand.drop(*[c for c in _REMINTED if c in cand.columns])
        .repartition("src_partition")
        .sortWithinPartitions("src_partition", "src_offset")
    )


def replicate_batch(
    batch: DataFrame,
    dst_topic: str,
    local_cluster: str,
    target_cluster: str,
    num_partitions: int | None = None,
    replicated_subscriptions: bool = False,
) -> None:
    """Forward one micro-batch of local envelope rows to the remote
    topic (importable so tests and the foreachBatch closure share one
    implementation). One-hop filtering, origin stamping, presence
    dedup, and per-source-partition ordering as described in the
    module docstring. ``replicated_subscriptions`` additionally
    forwards the replicated-subscription protocol markers
    (streaming/replicated_subscriptions.py)."""
    from pulsar_spark.sources.topics import produce

    payload = _prepare_payload(
        batch, dst_topic, local_cluster, target_cluster,
        replicated_subscriptions=replicated_subscriptions,
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
    replicated_subscriptions: bool = False,
):
    """Open the replicator over a local topic and return the started
    StreamingQuery (availableNow: drains everything the checkpoint has
    not seen, then stops — call again as traffic arrives; a
    Trigger.ProcessingTime deployment is the same writer without
    availableNow). ``replicated_subscriptions`` is the broker's
    ``isEnableReplicatedSubscriptions``: the stream then also forwards
    the snapshot/update protocol markers
    (streaming/replicated_subscriptions.py)."""
    from pulsar_spark.streaming.subscribe import subscribe

    stream = subscribe(spark, src_topic, max_files_per_trigger=max_files_per_trigger)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            replicate_batch(
                batch, dst_topic, local_cluster, target_cluster,
                num_partitions=num_partitions,
                replicated_subscriptions=replicated_subscriptions,
            )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
