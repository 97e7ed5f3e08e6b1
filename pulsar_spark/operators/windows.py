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


def watermark_count_windows_batch(
    messages: DataFrame,
    length: int,
    slide: int | None = None,
    value_col: str = "val",
    partition_col: str = "partition",
    offset_col: str = "offset",
    event_time_col: str = "event_time",
) -> DataFrame:
    """Deterministic BATCH projection of the watermark-count window
    state machine (streaming/count_windows.py
    ``watermark_count_window_stream``; the reference's
    WatermarkCountTriggerPolicy x WatermarkCountEvictionPolicy cell) at
    watermark -> infinity: every event is eligible, processed per
    partition in ``(event_time, offset)`` order; a window fires every
    ``slide`` events with contents = the last ``length`` events; the
    trailing partial window never fires. Emits the streaming operator's
    exact output schema ``(partition, window_seq, cnt, sum_val,
    first_event_time, last_event_time)`` so the two are row-comparable
    (tests assert that against an independent pure-Python reference).

    Scale shape: one per-partition rank window (the topic's own
    partitioning), then each row explodes into its at most
    ``ceil(length/slide)`` member windows — a bounded expansion
    absorbed by a hash aggregate, never a per-window scan."""
    slide_n = int(slide or length)
    w = Window.partitionBy(partition_col).orderBy(event_time_col, offset_col)
    wn = Window.partitionBy(partition_col)
    r = (
        messages.select(partition_col, offset_col, event_time_col, value_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    # fire index s (1-based) contains row rn iff s*slide - length < rn
    # <= s*slide, and only fires if s*slide <= n
    s_min = F.ceil(F.col("_rn") / F.lit(float(slide_n)))
    s_max = F.least(
        F.floor((F.col("_rn") + F.lit(length) - 1) / F.lit(float(slide_n))),
        F.floor(F.col("_n") / F.lit(float(slide_n))),
    )
    e = r.where(s_max >= s_min).select(
        partition_col,
        event_time_col,
        value_col,
        F.explode(F.sequence(s_min.cast("int"), s_max.cast("int"))).alias("_s"),
    )
    return (
        e.groupBy(partition_col, "_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(value_col).cast("double").alias("sum_val"),
            F.min(event_time_col).alias("first_event_time"),
            F.max(event_time_col).alias("last_event_time"),
        )
        .select(
            partition_col,
            (F.col("_s") - 1).cast("bigint").alias("window_seq"),
            "cnt",
            "sum_val",
            "first_event_time",
            "last_event_time",
        )
    )
