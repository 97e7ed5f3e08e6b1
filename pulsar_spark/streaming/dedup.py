"""Streaming deduplication — effectively-once consume.

Reference semantics: MessageDeduplication tracks the highest sequence
per producer with periodic snapshots bounding state
(broker/.../persistent/MessageDeduplication.java:109-125, :279-281).

Spark: ``dropDuplicatesWithinWatermark`` on (producer_name,
sequence_id) — the watermark bounds state exactly like the snapshot
interval bounds the reference's sequence map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    messages_stream: DataFrame,
    watermark_delay: str = "10 minutes",
    time_col: str = "publish_time",
) -> DataFrame:
    return messages_stream.withWatermark(time_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["producer_name", "sequence_id"]
    )
