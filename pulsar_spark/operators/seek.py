"""Cursor operations: seek / peek / skip / backlog.

Reference semantics: seek repositions a cursor by MessageId or
timestamp, where timestamp seek binary-searches the ledger for the
first entry with publish_time >= ts
(pulsar-broker/.../persistent/PersistentMessageFinder.java:39,69);
``peekMessages(n)`` returns the first N messages past the cursor and
``skipMessages(n)`` advances it (admin Topics.java:1662, :1543);
backlog = number of rows past the cursor.

Spark-first: all are DataFrame queries over the envelope table keyed by
(partition, offset). Per-partition "first N" uses a window row_number
bounded per partition — at scale this is a per-partition top-N
(Spark pushes the limit into the sort), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def seek_offsets_by_timestamp(
    messages: DataFrame,
    ts: Column | str,
    partition_col: str = "partition",
    offset_col: str = "offset",
    publish_time_col: str = "publish_time",
) -> DataFrame:
    """Per partition, the first offset with publish_time >= ts
    (PersistentMessageFinder analog). Partitions with no such message
    are absent (cursor would go to end-of-topic)."""
    ts_c = F.lit(ts).cast("timestamp") if isinstance(ts, str) else ts
    return (
        messages.where(F.col(publish_time_col) >= ts_c)
        .groupBy(partition_col)
        .agg(F.min(offset_col).alias("seek_offset"))
    )


def peek_messages(
    messages: DataFrame,
    n: int,
    cursors: dict[int, int] | None = None,
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """First ``n`` messages past each partition's cursor, in offset order.

    ``cursors`` maps partition -> last-acked offset (exclusive start);
    missing partitions start at the beginning.
    """
    df = messages
    if cursors:
        cursor_expr = F.coalesce(
            *[
                F.when(F.col(partition_col) == p, F.lit(o))
                for p, o in cursors.items()
            ],
            F.lit(-1),
        )
        df = df.where(F.col(offset_col) > cursor_expr)
    w = Window.partitionBy(partition_col).orderBy(offset_col)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n).drop("_rn")


def skip_cursor(
    messages: DataFrame,
    n: int,
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """New cursor position per partition after skipping ``n`` messages:
    the n-th smallest offset per partition (or max offset if fewer)."""
    w = Window.partitionBy(partition_col).orderBy(offset_col)
    ranked = messages.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.where(F.col("_rn") <= n)
        .groupBy(partition_col)
        .agg(F.max(offset_col).alias("cursor_offset"), F.count("*").alias("skipped"))
    )


def backlog(
    messages: DataFrame,
    cursors: DataFrame,
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Backlog per partition: count of messages with offset > cursor.

    ``cursors`` has columns (partition, cursor_offset); broadcast —
    it is one row per partition.
    """
    return (
        messages.join(F.broadcast(cursors), on=partition_col, how="left")
        .where(
            F.col("cursor_offset").isNull() | (F.col(offset_col) > F.col("cursor_offset"))
        )
        .groupBy(partition_col)
        .agg(F.count("*").alias("backlog"))
    )
