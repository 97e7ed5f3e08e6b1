"""TTL / retention / visibility predicates.

Reference semantics: message expiry drops messages older than the TTL
(pulsar-broker/.../persistent/PersistentMessageExpiryMonitor.java:102
``expireMessages(ttlSeconds)``); delayed delivery hides messages until
``deliver_at_time <= now`` (broker/delayed/InMemoryDelayedDeliveryTracker.java:49);
internal marker messages never reach consumers (PulsarApi.proto:149);
aborted-transaction messages are filtered (TopicTransactionBuffer.java:106).

All of these are plain predicates — at 100 TB they matter because they
push down to the parquet scan (check ``PushedFilters`` in explain) and,
when topics are date-partitioned, prune whole partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ttl_filter(
    messages: DataFrame, ttl_cutoff: Column | str, publish_time_col: str = "publish_time"
) -> DataFrame:
    """Rows surviving TTL expiry: publish_time >= cutoff.

    ``ttl_cutoff`` is a timestamp Column or literal string; computing it
    as ``now - ttl`` is the caller's choice (kept explicit so tests and
    oracles are deterministic).
    """
    cutoff = F.lit(ttl_cutoff).cast("timestamp") if isinstance(ttl_cutoff, str) else ttl_cutoff
    return messages.where(F.col(publish_time_col) >= cutoff)


def visible_messages(
    messages: DataFrame, at: Column | str, deliver_at_col: str = "deliver_at"
) -> DataFrame:
    """Delayed-delivery visibility at logical time ``at``:
    deliver_at IS NULL OR deliver_at <= at."""
    at_ts = F.lit(at).cast("timestamp") if isinstance(at, str) else at
    c = F.col(deliver_at_col)
    return messages.where(c.isNull() | (c <= at_ts))


def user_visible(
    messages: DataFrame,
    marker_col: str = "marker_type",
    txn_aborted: DataFrame | None = None,
    txn_col: str = "txn_id",
) -> DataFrame:
    """What a consumer may see: no internal markers, no aborted-txn rows.

    ``txn_aborted`` is a 1-column DataFrame of aborted txn ids; the
    anti-join broadcasts (aborted set is small — it mirrors the
    reference's in-memory abort snapshot).
    """
    out = messages.where(F.col(marker_col).isNull())
    if txn_aborted is not None:
        out = out.join(
            F.broadcast(txn_aborted.withColumnRenamed(txn_aborted.columns[0], txn_col)),
            on=txn_col,
            how="left_anti",
        )
    return out
