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
) -> DataFrame:
    """Messages a replicator would forward to ``target_cluster``:
    everything except messages that ORIGINATED there (loop avoidance,
    GeoPersistentReplicator.java:149) and internal markers."""
    return messages.where(
        (F.col(origin_col).isNull() | (F.col(origin_col) != target_cluster))
        & F.col("marker_type").isNull()
    )


def shadow_view(messages: DataFrame, shadow_topic: str) -> DataFrame:
    """Read-only shadow of a topic: same rows/offsets, topic renamed —
    a projection, not a copy (ShadowReplicator semantics)."""
    return messages.withColumn("topic", F.lit(shadow_topic))
