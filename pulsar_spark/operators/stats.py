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


def subscription_stats(
    messages: DataFrame,
    acked,
    subscription: str = "sub-0",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Subscription-level rollup of cursor state — the SubscriptionStats
    section of ``Topics.getStats`` (admin/Topics.java:1138).

    Two backlog figures, matching the reference's
    ``getNumberOfEntriesInBacklog(precise)`` split:
    - ``msg_backlog``: precise — count of unacked messages;
    - ``backlog_estimate``: range-based — entries between each
      partition's mark-delete position and its last offset, counting
      individually-acked holes (the cheap estimate the broker serves
      by default).

    Two aggregations total (per-partition then rollup); the per-
    partition frame is ~num_partitions rows, so the second agg is free.
    """
    flagged = messages.select(
        partition_col, offset_col, acked.cast("boolean").alias("_acked")
    )
    per = flagged.groupBy(partition_col).agg(
        F.count("*").alias("entries"),
        F.sum((~F.col("_acked")).cast("long")).alias("unacked"),
        F.coalesce(
            F.min(F.when(~F.col("_acked"), F.col(offset_col))) - 1,
            F.max(offset_col),
        ).alias("mark_delete_offset"),
        F.max(offset_col).alias("max_offset"),
    )
    return per.agg(
        F.count("*").alias("partitions"),
        F.sum("entries").alias("msg_in_counter"),
        F.sum("unacked").alias("msg_backlog"),
        F.sum(F.col("max_offset") - F.col("mark_delete_offset")).alias("backlog_estimate"),
    ).select(F.lit(subscription).alias("subscription"), "*")


def key_skew_stats(messages: DataFrame, k: int = 10, key_col: str = "key") -> DataFrame:
    """Hot-key report: top-k keys by message count with their share of
    all keyed messages — the operational pre-check for Key_Shared
    dispatch (a hot key pins its whole range to one consumer —
    StickyKeyConsumerSelector semantics make per-key order a
    serialization point) and for choosing salting/AQE-skew strategies
    on keyed aggregations.

    One partial-aggregated groupBy + a 1-row broadcast total; the top-k
    sort runs on the (num distinct keys) frame, never the log.
    """
    counts = messages.where(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count("*").alias("msg_count")
    )
    total = counts.agg(F.sum("msg_count").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("msg_count") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.desc("msg_count"), key_col)
        .limit(k)
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
