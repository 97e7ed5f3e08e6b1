"""Property tests for the individualDeletedMessages analog
(sources/ack_holes.py): the (cursor, hole-ranges) pair must track the
acked SET exactly like the reference's markDeletePosition +
individualDeletedMessages range set (ManagedCursorImpl.java:202) —
under any ack order, any batching, and interleaved cumulative moves."""
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_spark.sources.ack_holes import (
    add_acks,
    cap_ranges,
    fold_cursor,
    merge_ranges,
    reconcile_holes_with_cursor,
)


def canonical(acked: set[int]) -> tuple[int, list[list[int]]]:
    """Ground truth from the acked SET: cursor = first unacked offset,
    holes = maximal runs of acked offsets past it."""
    cursor = 0
    while cursor in acked:
        cursor += 1
    rest = sorted(o for o in acked if o > cursor)
    holes: list[list[int]] = []
    for o in rest:
        if holes and o == holes[-1][1] + 1:
            holes[-1][1] = o
        else:
            holes.append([o, o])
    return cursor, holes


@given(st.lists(st.integers(0, 60), max_size=40), st.data())
@settings(max_examples=200, deadline=None)
def test_batched_acks_match_canonical_set_semantics(offsets, data):
    """Any partition of the ack stream into batches, in any order,
    lands on the canonical (cursor, holes) of the acked set."""
    order = data.draw(st.permutations(offsets))
    cursor, holes = 0, []
    i = 0
    while i < len(order):
        n = data.draw(st.integers(1, max(1, len(order) - i)))
        cursor, holes = add_acks(cursor, holes, order[i : i + n])
        i += n
    assert (cursor, holes) == canonical(set(offsets))


@given(st.lists(st.integers(0, 60), max_size=40))
@settings(max_examples=200, deadline=None)
def test_invariants_sorted_disjoint_past_cursor(offsets):
    cursor, holes = add_acks(0, [], offsets)
    for i, (lo, hi) in enumerate(holes):
        assert cursor < lo <= hi  # strictly past the cursor, never [c,·]
        if i:
            assert lo > holes[i - 1][1] + 1  # disjoint AND non-adjacent


@given(st.lists(st.integers(0, 60), max_size=40))
@settings(max_examples=200, deadline=None)
def test_reack_is_idempotent(offsets):
    cursor, holes = add_acks(0, [], offsets)
    assert add_acks(cursor, holes, offsets) == (cursor, holes)


@given(st.lists(st.integers(0, 60), max_size=40), st.integers(0, 70))
@settings(max_examples=200, deadline=None)
def test_cumulative_advance_matches_set_union(offsets, mark):
    """A cumulative ack to ``mark`` equals acking {0..mark-1}: the
    folded cursor + holes must match the canonical of the union."""
    cursor, holes = add_acks(0, [], offsets)
    new_cursor = max(cursor, mark)
    kept = reconcile_holes_with_cursor(
        {0: cursor}, {0: new_cursor}, {0: holes}
    ).get(0, [])
    folded = fold_cursor(new_cursor, kept)
    assert folded == canonical(set(offsets) | set(range(mark)))


def test_merge_ranges_coalesces_touching():
    assert merge_ranges([[4, 6], [2, 3], [8, 8]]) == [[2, 6], [8, 8]]
    assert merge_ranges([[1, 2], [2, 5]]) == [[1, 5]]
    assert merge_ranges([]) == []


def test_cap_drops_highest_ranges():
    rs = [[2, 2], [4, 5], [7, 7], [9, 12]]
    assert cap_ranges(rs, 2) == [[2, 2], [4, 5]]
    assert cap_ranges(rs, None) == rs
    assert cap_ranges(rs, 10) == rs


def test_rewind_clears_segment_holes():
    out = reconcile_holes_with_cursor(
        {0: 5, 1: 5}, {0: 2, 1: 7}, {0: [[6, 8]], 1: [[6, 6], [9, 9]]}
    )
    # segment 0 rewound -> cleared; segment 1 advanced -> trimmed
    assert out == {1: [[9, 9]]}
