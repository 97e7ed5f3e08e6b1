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

def retention_plan(
    messages: DataFrame,
    time_cutoff: Column | str,
    size_budget_bytes: int,
    size_col: str,
    partition_col: str = "partition",
    offset_col: str = "offset",
    publish_time_col: str = "publish_time",
) -> DataFrame:
    """Mark rows deletable under a RetentionPolicies(time, size) budget
    (pulsar-client-admin-api/.../RetentionPolicies.java:33-34): the
    broker trims the backlog oldest-first once data falls outside the
    time window OR the topic exceeds its size budget.

    Row-level rendering of the ledger-trim rule: a row is retained iff
    it is newer than ``time_cutoff`` AND the cumulative size of it plus
    every newer row in its partition is within the budget; else it is
    ``deletable``. The newest-first running sum is one window over the
    (partition, offset desc) order — same shuffle the compactor already
    uses, no extra pass.
    """
    from pyspark.sql.window import Window

    cutoff = (
        F.lit(time_cutoff).cast("timestamp")
        if isinstance(time_cutoff, str)
        else time_cutoff
    )
    w = Window.partitionBy(partition_col).orderBy(F.col(offset_col).desc())
    cum = F.sum(size_col).over(w)
    return messages.withColumn(
        "deletable",
        (F.col(publish_time_col) < cutoff) | (cum > F.lit(size_budget_bytes)),
    )


def backlog_quota_evict(
    messages: DataFrame,
    cursors: DataFrame,
    limit_rows: int | None = None,
    limit_bytes: int | None = None,
    size_col: str | None = None,
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Backlog-quota enforcement with the ``consumer_backlog_eviction``
    policy (broker/.../BacklogQuotaManager.java dropBacklogForSizeLimit;
    BacklogQuotaImpl retention policies): when a subscription's backlog
    exceeds the quota, the broker advances the slowest cursor past the
    OLDEST backlog entries until the quota holds — consumers lose those
    messages, producers keep writing.

    Per-partition rendering of the topic quota (quotas scale with the
    partition count here, as every other per-partition stat in this
    engine does). Returns one row per partition:
    (partition, cursor_offset, new_cursor_offset, evicted_rows,
    backlog_after). ``new_cursor_offset`` is the advanced mark-delete
    position; equal to ``cursor_offset`` (or -1 for a never-acked
    cursor) when the quota already holds.

    Shape: one broadcast cursor join + one window over each partition's
    backlog ordered newest-first (rank for a row quota, running byte
    sum for a size quota) + one agg — the same per-partition shuffle
    retention_plan uses; nothing global, skew-bounded by the largest
    single partition's backlog.
    """
    if (limit_rows is None) == (limit_bytes is None):
        raise ValueError("pass exactly one of limit_rows / limit_bytes")
    if limit_bytes is not None and size_col is None:
        raise ValueError("limit_bytes needs size_col")
    from pyspark.sql.window import Window

    backlog_rows = messages.join(F.broadcast(cursors), on=partition_col, how="left").where(
        F.col("cursor_offset").isNull() | (F.col(offset_col) > F.col("cursor_offset"))
    )
    w = Window.partitionBy(partition_col).orderBy(F.col(offset_col).desc())
    over = (
        F.row_number().over(w) > limit_rows
        if limit_rows is not None
        else F.sum(size_col).over(w) > limit_bytes
    )
    flagged = backlog_rows.withColumn("_evict", over)
    agg = flagged.groupBy(partition_col).agg(
        F.max(F.when(F.col("_evict"), F.col(offset_col))).alias("_evict_hi"),
        F.sum(F.col("_evict").cast("long")).alias("evicted_rows"),
        F.sum((~F.col("_evict")).cast("long")).alias("backlog_after"),
    )
    # join back onto the topic's full partition set so quota-already-holds
    # partitions (empty backlog past the cursor) still get their row —
    # the documented one-row-per-partition contract a quota poller needs
    parts = (
        messages.select(partition_col)
        .distinct()
        .join(F.broadcast(cursors), on=partition_col, how="left")
    )
    return parts.join(agg, on=partition_col, how="left").select(
        partition_col,
        F.coalesce(F.col("cursor_offset"), F.lit(-1)).cast("bigint").alias("cursor_offset"),
        F.coalesce(F.col("_evict_hi"), F.col("cursor_offset"), F.lit(-1))
        .cast("bigint")
        .alias("new_cursor_offset"),
        F.coalesce(F.col("evicted_rows"), F.lit(0)).cast("bigint").alias("evicted_rows"),
        F.coalesce(F.col("backlog_after"), F.lit(0)).cast("bigint").alias("backlog_after"),
    )


def apply_delivery_delay_policy(
    messages: DataFrame,
    fixed_delay_seconds: float | None = None,
    max_delay_seconds: float | None = None,
    publish_time_col: str = "publish_time",
    deliver_at_col: str = "deliver_at",
) -> DataFrame:
    """Topic-level delayed-delivery policies, with the PIP-437
    precedence (pip/pip-437.md High Level Design):

    1. ``fixed_delay_seconds`` set: the producer's requested deliver_at
       is IGNORED and every message gets
       ``publish_time + fixed_delay`` (max-delay is moot).
    2. else ``max_delay_seconds`` set (PIP-315 maxDeliveryDelayInMillis):
       a requested delay beyond the cap REJECTS the publish — rendered
       here as an eager check that raises before any downstream write.
    3. neither: the client's deliver_at stands.

    Enforcement happens on the publish path in the reference
    (PersistentTopic.publishMessage rewrites MessageMetadata before
    persistence); this operator is that rewrite as a plan step.
    """
    if fixed_delay_seconds is not None:
        return messages.withColumn(
            deliver_at_col,
            F.col(publish_time_col) + F.make_interval(secs=F.lit(float(fixed_delay_seconds))),
        )
    if max_delay_seconds is not None:
        over = messages.where(
            F.col(deliver_at_col).isNotNull()
            & (
                F.col(deliver_at_col)
                > F.col(publish_time_col) + F.make_interval(secs=F.lit(float(max_delay_seconds)))
            )
        ).count()
        if over:
            raise ValueError(
                f"{over} message(s) request delivery beyond maxDeliveryDelay="
                f"{max_delay_seconds}s (PIP-315: the publish is rejected)"
            )
    return messages
