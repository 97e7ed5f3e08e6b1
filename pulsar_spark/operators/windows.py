"""Time windows — the Functions windowing subsystem, batch surface.

Reference semantics: WindowConfig (pulsar-client-admin-api
common/functions/WindowConfig.java:33-51) declares tumbling/sliding
windows by duration or count; WindowFunctionExecutor.java:168-200 wires
trigger x eviction policies; watermark = max event_time - maxLagMs
(WaterMarkEventGenerator.java:84-123); late rows route to
``lateDataTopic`` (WindowFunctionExecutor.java:303-313).

Spark-first: duration windows are ``groupBy(window(event_time, len,
slide))`` — a native hash aggregate (sliding windows expand each row
into len/slide windows JVM-side, no UDF). Count windows have no Spark
built-in; batch count windows are a window-function chunking, streaming
count windows live in pulsar_spark.streaming.count_windows
(applyInPandasWithState).

The window struct is flattened to (window_start, window_end) scalar
columns so results stay oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_window(
    messages: DataFrame,
    length: str,
    aggs: list[Column],
    time_col: str = "event_time",
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling time window aggregation (windowLengthDurationMs)."""
    return sliding_window(messages, length, length, aggs, time_col, extra_group_cols)


def sliding_window(
    messages: DataFrame,
    length: str,
    slide: str,
    aggs: list[Column],
    time_col: str = "event_time",
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding time window aggregation (windowLength x slidingInterval).

    Each row lands in length/slide windows; Spark's ``window()`` expands
    them JVM-side inside whole-stage codegen.
    """
    extra = extra_group_cols or []
    win = F.window(F.col(time_col), length, slide)
    return (
        messages.groupBy(win.alias("_w"), *extra)
        .agg(*aggs)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def tumbling_count_window(
    messages: DataFrame,
    n: int,
    aggs: list[Column],
    partition_col: str = "partition",
    order_col: str = "offset",
) -> DataFrame:
    """Batch tumbling COUNT window (windowLengthCount, no slide):
    consecutive chunks of ``n`` rows per partition in log order
    (CountTriggerPolicy + CountEvictionPolicy with slide == length).

    Adds ``window_seq`` (0-based chunk index per partition). The sort is
    per-partition (window function over the topic partitioning), which
    matches the reference's per-partition ordering guarantee — there is
    no global order to preserve.
    """
    w = Window.partitionBy(partition_col).orderBy(order_col)
    chunked = messages.withColumn(
        "window_seq", F.floor((F.row_number().over(w) - 1) / n)
    )
    return chunked.groupBy(partition_col, "window_seq").agg(*aggs)
