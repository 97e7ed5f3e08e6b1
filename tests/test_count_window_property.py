"""Property test for the count-window state machine: the emitted
windows must be invariant to HOW rows are split across micro-batches
(the state machine's core correctness claim). Exercises the pure
firing/eviction logic directly (no Spark streaming harness) so
hypothesis can run hundreds of cases."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _simulate(batches: list[list[tuple[int, float]]], length: int, slide: int):
    """Reference re-implementation of fn_sliding's loop over arbitrary
    batch splits: returns fired windows (seq, cnt, sum, first, last)."""
    buf_off: list[int] = []
    buf_val: list[float] = []
    seen = 0
    next_seq = 0
    outs = []
    for batch in batches:
        batch = sorted(batch)
        buf_off.extend(o for o, _ in batch)
        buf_val.extend(v for _, v in batch)
        seen += len(batch)
        while seen >= (next_seq + 1) * slide:
            fire_at = (next_seq + 1) * slide
            start_global = seen - len(buf_off)
            end = fire_at - start_global
            start = max(0, end - length)
            w_off, w_val = buf_off[start:end], buf_val[start:end]
            outs.append((next_seq, len(w_off), round(sum(w_val), 9), w_off[0], w_off[-1]))
            next_seq += 1
            need_from = (next_seq + 1) * slide - length
            evict = max(0, need_from - start_global)
            buf_off, buf_val = buf_off[evict:], buf_val[evict:]
    return outs


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=400),
    length=st.integers(min_value=1, max_value=50),
    slide_frac=st.integers(min_value=1, max_value=50),
    cuts=st.lists(st.integers(min_value=0, max_value=400), max_size=8),
)
def test_windows_invariant_to_batch_splits(n, length, slide_frac, cuts):
    slide = min(slide_frac, length)
    rows = [(i, float(i) * 0.5) for i in range(n)]

    def split(points):
        points = sorted({min(p, n) for p in points})
        out, prev = [], 0
        for p in points + [n]:
            out.append(rows[prev:p])
            prev = p
        return out

    one_shot = _simulate([rows], length, slide)
    chopped = _simulate(split(cuts), length, slide)
    assert one_shot == chopped
    # every fired window ends exactly at its fire point and has
    # min(length, fire_at) rows
    for seq, cnt, _, first, last in one_shot:
        fire_at = (seq + 1) * slide
        assert last == fire_at - 1
        assert cnt == min(length, fire_at)
        assert first == last - cnt + 1


def test_simulation_matches_stream_operator(spark, messages, tmp_path):
    """Anchor the pure simulation to the real applyInPandasWithState
    operator on fixture data (one partition, multi-batch run)."""

    from pulsar_spark.sources import write_topic
    from pulsar_spark.streaming import count_window_stream, run_to_end, subscribe

    d = str(tmp_path / "t")
    part0 = messages.where("partition = 0")
    write_topic(part0, d)
    run_to_end(
        count_window_stream(subscribe(spark, d, max_files_per_trigger=1), 40, slide=25)
        .writeStream.format("memory")
        .queryName("cw_prop")
        .outputMode("append")
    )
    got = [
        (r["window_seq"], r["cnt"], round(r["sum_val"], 9), r["first_offset"], r["last_offset"])
        for r in spark.table("cw_prop").orderBy("window_seq").collect()
    ]
    rows = [
        (r["offset"], r["val"])
        for r in part0.select("offset", "val").orderBy("offset").collect()
    ]
    want = _simulate([rows], 40, 25)
    # stream may leave an unfired tail in state; fired prefix must match
    assert got == want[: len(got)]
    assert len(got) >= len(want) - 1
