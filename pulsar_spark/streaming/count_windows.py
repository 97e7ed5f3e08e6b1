"""Count-based windows — the custom stateful operator Spark lacks.

Reference semantics: tumbling/sliding COUNT windows
(WindowConfig.windowLengthCount / slidingIntervalCount,
pulsar-client-admin-api/.../WindowConfig.java:33-51) fire on row count
per partition: CountTriggerPolicy fires every `slide` rows and
CountEvictionPolicy keeps the last `length` rows
(fn/instance/.../windowing/triggers/CountTriggerPolicy.java:34,
evictors/CountEvictionPolicy.java:32; executor wiring
WindowFunctionExecutor.java:168-200).

Spark has no built-in count window, so this is an
``applyInPandasWithState`` state machine keyed by topic partition
(SURVEY.md §4 "custom Catalyst work" item 1): state buffers only the
tail of rows a future window can still need (<= length rows), plus the
running counters; each micro-batch appends, emits every fired window,
evicts, and keeps the remainder. Per-partition log order (offset) is
the row order, matching the reference's per-partition delivery order.

Scale: state per key is bounded by window length; the operator shuffles
once on partition (the topic's own key); the Python boundary is
Arrow-batched.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "partition int, window_seq bigint, cnt bigint, sum_val double, "
    "first_offset bigint, last_offset bigint"
)
OUT_COLS = ["partition", "window_seq", "cnt", "sum_val", "first_offset", "last_offset"]


def count_window_stream(
    messages_stream: DataFrame,
    length: int,
    slide: int | None = None,
    value_col: str = "val",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Tumbling (slide None/== length) or sliding count windows.

    Emits one row per fired window: (partition, window_seq, cnt,
    sum_val, first_offset, last_offset). A sliding window fires every
    ``slide`` rows with contents = the last ``length`` rows seen (the
    first windows are partial while the buffer warms, matching the
    reference's CountEviction behavior).
    """
    slide_n = slide or length

    def _append_new(pdfs, buf_offsets, buf_vals):
        import pandas as pd

        new = pd.concat(list(pdfs), ignore_index=True)
        if len(new):
            new = new.sort_values(offset_col)
            buf_offsets.extend(int(o) for o in new[offset_col])
            buf_vals.extend(float(v) for v in new[value_col])
        return len(new)

    def fn_tumbling(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        if state.exists:
            buf_offsets, buf_vals, next_seq = state.get
            buf_offsets, buf_vals = list(buf_offsets), list(buf_vals)
        else:
            buf_offsets, buf_vals, next_seq = [], [], 0
        _append_new(pdfs, buf_offsets, buf_vals)

        outs = []
        while len(buf_offsets) >= length:
            w_off, buf_offsets = buf_offsets[:length], buf_offsets[length:]
            w_val, buf_vals = buf_vals[:length], buf_vals[length:]
            outs.append((int(key[0]), int(next_seq), length, float(sum(w_val)), w_off[0], w_off[-1]))
            next_seq += 1
        state.update((buf_offsets, buf_vals, next_seq))
        if outs:
            yield pd.DataFrame(outs, columns=OUT_COLS)

    def fn_sliding(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        if state.exists:
            buf_offsets, buf_vals, seen, next_seq = state.get
            buf_offsets, buf_vals = list(buf_offsets), list(buf_vals)
        else:
            buf_offsets, buf_vals, seen, next_seq = [], [], 0, 0
        seen += _append_new(pdfs, buf_offsets, buf_vals)

        outs = []
        while seen >= (next_seq + 1) * slide_n:
            fire_at = (next_seq + 1) * slide_n  # global row count at fire point
            buf_start_global = seen - len(buf_offsets)
            end = fire_at - buf_start_global
            start = max(0, end - length)
            w_off, w_val = buf_offsets[start:end], buf_vals[start:end]
            outs.append(
                (int(key[0]), int(next_seq), len(w_off), float(sum(w_val)), w_off[0], w_off[-1])
            )
            next_seq += 1
            # evict rows no future window (fire point (next_seq+1)*slide) needs
            need_from = (next_seq + 1) * slide_n - length
            evict_to = max(0, need_from - buf_start_global)
            buf_offsets = buf_offsets[evict_to:]
            buf_vals = buf_vals[evict_to:]
        state.update((buf_offsets, buf_vals, seen, next_seq))
        if outs:
            yield pd.DataFrame(outs, columns=OUT_COLS)

    grouped = messages_stream.groupBy(partition_col)
    if slide_n == length:
        return grouped.applyInPandasWithState(
            fn_tumbling,
            OUT_SCHEMA,
            "buf_offsets array<bigint>, buf_vals array<double>, next_seq bigint",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    return grouped.applyInPandasWithState(
        fn_sliding,
        OUT_SCHEMA,
        "buf_offsets array<bigint>, buf_vals array<double>, seen bigint, next_seq bigint",
        "append",
        GroupStateTimeout.NoTimeout,
    )


WM_OUT_SCHEMA = (
    "partition int, window_seq bigint, cnt bigint, sum_val double, "
    "first_event_time timestamp, last_event_time timestamp"
)
WM_OUT_COLS = [
    "partition", "window_seq", "cnt", "sum_val", "first_event_time", "last_event_time"
]


def watermark_count_window_stream(
    messages_stream: DataFrame,
    length: int,
    slide: int | None = None,
    max_lag: str = "10 minutes",
    value_col: str = "val",
    partition_col: str = "partition",
    offset_col: str = "offset",
    event_time_col: str = "event_time",
) -> DataFrame:
    """Event-time COUNT windows gated by the watermark — the
    WatermarkCountTriggerPolicy x WatermarkCountEvictionPolicy cell of
    the reference's trigger/eviction matrix
    (fn/instance/.../windowing/triggers/WatermarkCountTriggerPolicy.java,
    evictors/WatermarkCountEvictionPolicy.java; WindowFunctionExecutor
    wires them for event-time count windows).

    Semantics: only events at or below the current watermark
    participate; eligible events are processed in (event_time, offset)
    order, a window fires every ``slide`` eligible events with contents
    = the last ``length`` eligible events. Events still above the
    watermark wait in state (bounded by arrival rate x lag), so
    disorder within ``max_lag`` cannot reorder or split windows —
    exactly the reference's guarantee.

    Emits (partition, window_seq, cnt, sum_val, first_event_time,
    last_event_time) rows.
    """
    slide_n = slide or length

    src = messages_stream.withWatermark(event_time_col, max_lag).select(
        partition_col, offset_col, event_time_col, value_col
    )

    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            (pend_ts, pend_off, pend_val, buf_ts, buf_val, seen, next_seq) = state.get
            pend = [list(pend_ts), list(pend_off), list(pend_val)]
            buf_ts, buf_val = list(buf_ts), list(buf_val)
        else:
            pend = [[], [], []]
            buf_ts, buf_val, seen, next_seq = [], [], 0, 0

        batches = [] if state.hasTimedOut else list(pdfs)
        new = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
        if len(new):
            ts_us = (new[event_time_col].astype("int64") // 1_000).tolist()
            pend[0].extend(int(t) for t in ts_us)
            pend[1].extend(int(o) for o in new[offset_col])
            pend[2].extend(float(v) for v in new[value_col])

        # promote pending -> eligible in (event_time, offset) order
        wm_us = wm_ms * 1_000
        rows = sorted(zip(*pend), key=lambda r: (r[0], r[1]))
        eligible = [r for r in rows if r[0] <= wm_us]
        still = [r for r in rows if r[0] > wm_us]
        pend = [list(c) for c in zip(*still)] if still else [[], [], []]
        for t, _, v in eligible:
            buf_ts.append(t)
            buf_val.append(v)
        seen += len(eligible)

        outs = []
        while seen >= (next_seq + 1) * slide_n:
            fire_at = (next_seq + 1) * slide_n
            buf_start_global = seen - len(buf_ts)
            end = fire_at - buf_start_global
            start = max(0, end - length)
            w_ts, w_val = buf_ts[start:end], buf_val[start:end]
            outs.append(
                (
                    int(key[0]),
                    int(next_seq),
                    len(w_ts),
                    float(sum(w_val)),
                    pd.to_datetime(w_ts[0], unit="us"),
                    pd.to_datetime(w_ts[-1], unit="us"),
                )
            )
            next_seq += 1
            need_from = (next_seq + 1) * slide_n - length
            evict_to = max(0, need_from - buf_start_global)
            buf_ts, buf_val = buf_ts[evict_to:], buf_val[evict_to:]
        state.update((pend[0], pend[1], pend[2], buf_ts, buf_val, seen, next_seq))
        if pend[0]:
            # re-invoke when the watermark reaches the earliest pending
            # event, so watermark advancement alone (a no-data batch)
            # promotes and fires — the WatermarkCountTriggerPolicy
            # "watermark event" behavior
            state.setTimeoutTimestamp(max((min(pend[0]) + 999) // 1_000, wm_ms + 1))
        if outs:
            yield pd.DataFrame(outs, columns=WM_OUT_COLS)

    return src.groupBy(partition_col).applyInPandasWithState(
        fn,
        WM_OUT_SCHEMA,
        (
            "pend_ts array<bigint>, pend_off array<bigint>, pend_val array<double>, "
            "buf_ts array<bigint>, buf_val array<double>, seen bigint, next_seq bigint"
        ),
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
