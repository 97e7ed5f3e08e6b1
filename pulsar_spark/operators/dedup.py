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
    unique_order: bool = False,
) -> DataFrame:
    """Keep the first-appended occurrence per (producer, sequence_id).

    ``unique_order=True`` asserts ``order_col`` is unique WITHIN each
    (producer, sequence) group (e.g. a globally-unique event id, or
    offset on a single-partition topic) and switches to the two-pass
    plan: a narrow hash aggregate computes each group's min order key
    (3 columns shuffled instead of the full row), then one equi-join
    attaches the decision back to the log — the winning row's columns
    never enter an aggregation buffer, so the wide-struct ``min_by``
    SortAggregate (which must SORT every log row to fold the struct)
    disappears from the plan. Output is identical to the default path
    because a unique order key makes the group minimum a unique row;
    with duplicate order values the join would keep BOTH tied rows,
    which is why the default stays ``min_by``. At scale the join side
    is the distinct-key decision table — AQE broadcasts it when small
    and falls back to a shuffled join otherwise.
    """
    cols = messages.columns
    keys = [producer_col, seq_col]
    if unique_order:
        mins = messages.groupBy(*keys).agg(F.min(order_col).alias(order_col))
        return messages.join(mins, on=[*keys, order_col], how="left_semi").select(*cols)
    return (
        messages.groupBy(*keys)
        .agg(F.min_by(F.struct(*[c for c in cols if c not in keys]), F.col(order_col)).alias("_m"))
        .select(*keys, "_m.*")
        .select(*cols)
    )
