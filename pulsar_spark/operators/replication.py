"""Geo-replication and shadow-topic views.

Reference semantics: each cluster's replicator re-publishes local
messages to remote clusters with ``replicated_from`` set to the origin;
the loop is broken by skipping messages whose origin IS the target
cluster (pulsar-broker/.../persistent/GeoPersistentReplicator.java:40
``replicatedFrom``/:149 skip, Message.java:240-248). A shadow topic is
a read-only replica view of the source topic's data
(pulsar-broker/.../persistent/ShadowReplicator.java).

Spark-first: replication candidates are a filter (no data movement in
the engine — transport is out of scope, SURVEY.md §2.9); a shadow topic
is a renamed projection over the same storage, zero copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replicate_candidates(
    messages: DataFrame,
    target_cluster: str,
    origin_col: str = "replicated_from",
    replicated_subscription_markers: bool = False,
) -> DataFrame:
    """Messages a replicator would forward to ``target_cluster`` —
    strictly ONE-HOP, like the reference:

    - GeoPersistentReplicator.java:207 discards any entry that was
      already replicated into this region (``msg.isReplicated()``),
      which also breaks replication loops as a special case;
    - :216 honors a per-message ``replicateTo`` restriction list when
      the envelope carries a ``replicate_to`` array column (an empty
      or NULL list means "replicate everywhere", matching protobuf
      ``hasReplicateTo()``);
    - internal markers never leave the cluster — EXCEPT, when
      ``replicated_subscription_markers`` is set (the broker's
      ``isEnableReplicatedSubscriptions``), the replicated-subscription
      protocol markers (snapshot request/response, subscription
      update), which must travel through the replication channel for
      the snapshot to be a consistent cut
      (PersistentReplicator.java:864-869).

    In a full mesh (every cluster replicates to every peer directly)
    one-hop forwarding is sufficient AND necessary: a forwarded copy
    arriving via an intermediate would share the origin key with the
    direct path while carrying the intermediate's offset coordinates,
    corrupting the per-source dedup watermarks downstream."""
    marker_ok = F.col("marker_type").isNull()
    if replicated_subscription_markers:
        from pulsar_spark.streaming.replicated_subscriptions import (
            REPLICATED_MARKER_TYPES,
        )

        marker_ok = marker_ok | F.col("marker_type").isin(
            list(REPLICATED_MARKER_TYPES)
        )
    keep = F.col(origin_col).isNull() & marker_ok
    if "replicate_to" in messages.columns:
        keep = keep & (
            F.col("replicate_to").isNull()
            | (F.size("replicate_to") == 0)
            | F.array_contains("replicate_to", target_cluster)
        )
    return messages.where(keep)


def shadow_view(messages: DataFrame, shadow_topic: str) -> DataFrame:
    """Read-only shadow of a topic: same rows/offsets, topic renamed —
    a projection, not a copy (ShadowReplicator semantics)."""
    return messages.withColumn("topic", F.lit(shadow_topic))
