"""Message deduplication — effectively-once produce.

Reference semantics: the broker tracks the highest sequence id pushed
per producer and rejects any message whose sequence_id is <= that
watermark (pulsar-broker/.../persistent/MessageDeduplication.java:112
``highestSequencedPushed``; decision at :279-281). Net effect on the
log: only the FIRST occurrence of each (producer_name, sequence_id)
survives, in publish order.

Spark-first design (batch): ``min_by`` per (producer, sequence) — a
single partial+final hash aggregate keyed on the dedup pair; at scale
this shuffles one row per distinct (producer, seq) rather than sorting
the log. The window-function formulation (row_number = 1) is equivalent
but sorts every group; we keep the agg form.

Streaming variant: ``dropDuplicatesWithinWatermark([producer, seq])``
(see pulsar_spark.streaming.dedup_stream) — state bounded by the
watermark like the reference's snapshot interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_messages(
    messages: DataFrame,
    producer_col: str = "producer_name",
    seq_col: str = "sequence_id",
    order_col: str = "offset",
) -> DataFrame:
    """Keep the first-appended occurrence per (producer, sequence_id).

    (r11 note: a narrow min-aggregate + semi-join-back variant — shuffle
    3 columns, attach the decision to the log with one equi-join — was
    measured by interleaved A/B and REJECTED: at bench scale the driver
    collect + rebroadcast of the per-key min table costs more than the
    min_by SortAggregate's sort of the log rows, and at corpus scale
    the per-key min table is O(log) so the join degenerates to the same
    full-row shuffle plus a join. The wide-struct min_by stays.)
    """
    cols = messages.columns
    keys = [producer_col, seq_col]
    return (
        messages.groupBy(*keys)
        .agg(F.min_by(F.struct(*[c for c in cols if c not in keys]), F.col(order_col)).alias("_m"))
        .select(*keys, "_m.*")
        .select(*cols)
    )
