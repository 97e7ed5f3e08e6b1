"""Streaming time windows with watermarks + the late-data side-output.

Reference semantics (SURVEY.md §2.5): WindowConfig declares window
length/slide (duration or count) with ``maxLagMs`` (watermark lag) and
``lateDataTopic``; the watermark is max-event-time - lag
(WaterMarkEventGenerator.java:84-123) and late rows are routed to the
late topic instead of windows (WindowFunctionExecutor.java:303-313).

Spark: ``withWatermark + window()`` is the 1:1 mapping of the
duration-based matrix. Spark drops late rows silently, so the late
side-output is reproduced in ``late_data_split`` with an explicitly
tracked watermark inside foreachBatch — the same "min over sources -
lag" definition the reference uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg_stream(
    messages_stream: DataFrame,
    length: str,
    slide: str | None,
    aggs: list[Column],
    max_lag: str = "5 minutes",
    time_col: str = "event_time",
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """WindowConfig(durationMs, slidingIntervalMs, maxLagMs) -> Spark."""
    extra = extra_group_cols or []
    win = F.window(F.col(time_col), length, slide or length)
    return (
        messages_stream.withWatermark(time_col, max_lag)
        .groupBy(win.alias("_w"), *extra)
        .agg(*aggs)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def late_data_split(max_lag_seconds: int, on_window_batch, on_late_batch, time_col: str = "event_time"):
    """foreachBatch callback splitting each micro-batch into in-time vs
    late rows against a running watermark (max event_time seen so far -
    maxLag), routing late rows to the late-data sink — the
    ``lateDataTopic`` analog.

    The watermark is tracked in a driver-side closure across batches —
    the same place Spark's own watermark lives (driver StreamExecution);
    state is per-query, not per-executor, so this scales with query
    count, not data.
    """
    state = {"max_event_time": None}

    def split(batch_df: DataFrame, batch_id: int) -> None:
        wm = state["max_event_time"]
        if wm is not None:
            cutoff = F.lit(wm).cast("timestamp") - F.expr(f"INTERVAL {max_lag_seconds} SECOND")
            late = batch_df.where(F.col(time_col) < cutoff)
            ontime = batch_df.where(F.col(time_col) >= cutoff)
        else:
            late = batch_df.limit(0)
            ontime = batch_df
        on_window_batch(ontime, batch_id)
        on_late_batch(late, batch_id)
        new_max = batch_df.agg(F.max(time_col)).head()[0]
        if new_max is not None and (wm is None or new_max > wm):
            state["max_event_time"] = new_max

    return split
