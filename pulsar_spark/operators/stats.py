"""Topic / subscription stats rollups.

Reference semantics: ``Topics.getStats`` (pulsar-client-admin-api
admin/Topics.java:1138) reports per-topic message counts, rates,
storage size, backlog. In the engine these are aggregations over the
envelope table — partial-aggregated map-side, one shuffled row per
group, so they cost ~a scan regardless of topic count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_stats(messages: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Per-topic (or custom grouping) counts, time span and producer fanout."""
    group_cols = group_cols or ["topic"]
    return messages.groupBy(*group_cols).agg(
        F.count("*").alias("msg_count"),
        F.min("publish_time").alias("first_publish_time"),
        F.max("publish_time").alias("last_publish_time"),
        F.countDistinct("producer_name").alias("producer_count"),
        F.countDistinct("key").alias("key_count"),
        F.max("offset").alias("max_offset"),
    )


def partitioned_topic_stats(messages: DataFrame) -> DataFrame:
    """Per-partition stats (entries, offsets watermarks) — the
    getInternalStats analog."""
    return messages.groupBy("partition").agg(
        F.count("*").alias("entries"),
        F.min("offset").alias("first_offset"),
        F.max("offset").alias("last_offset"),
        F.max("publish_time").alias("last_publish_time"),
    )
