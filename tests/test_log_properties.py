"""Property tests: core log-relational operators vs pure-Python oracles
over hypothesis-generated logs.

The reference's golden tests (CompactionTest, MessageDeduplication
tests, ManagedCursor ack-hole tests — SURVEY.md §5) pin these semantics
with hand-picked cases; here hypothesis sweeps the input space instead:
duplicate keys, all-tombstone keys, duplicate sequence ids, fully- and
never-acked partitions, single-row logs.

Example counts are kept modest because every example runs a real Spark
job; the pure oracles themselves are O(n) dictionaries, not re-
implementations of the operator's plan.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARKY = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (key | None, tombstone, val) — offsets are assigned by enumeration so
# they are unique and dense, like a real topic partition.
log_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5).map(str)),
        st.booleans(),
        st.integers(min_value=-100, max_value=100),
    ),
    max_size=60,
)


def _mk_messages(spark, rows):
    data = [
        (k, i, bool(t), float(v)) for i, (k, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "key string, offset long, tombstone boolean, val double"
    )


class TestCompactionProperties:
    @SPARKY
    @given(rows=log_strategy)
    def test_publish_order_compaction_is_last_writer_wins(self, spark, rows):
        from pulsar_spark.operators import compact_publish_order

        df = _mk_messages(spark, rows)
        got = {
            r["key"]: (r["offset"], r["val"])
            for r in compact_publish_order(df).collect()
        }

        latest: dict[str, tuple] = {}
        for off, (k, t, v) in enumerate(rows):
            if k is not None:
                latest[k] = (off, bool(t), float(v))
        want = {k: (off, v) for k, (off, t, v) in latest.items() if not t}
        assert got == want

    @SPARKY
    @given(rows=log_strategy)
    def test_compaction_is_idempotent(self, spark, rows):
        from pulsar_spark.operators import compact_publish_order

        df = _mk_messages(spark, rows)
        once = compact_publish_order(df)
        twice = compact_publish_order(once)
        a = sorted(map(tuple, once.collect()))
        b = sorted(map(tuple, twice.collect()))
        assert a == b


class TestDedupProperties:
    @SPARKY
    @given(
        seqs=st.lists(st.integers(min_value=0, max_value=8), max_size=60),
        producers=st.integers(min_value=1, max_value=3),
    )
    def test_first_occurrence_per_producer_sequence_wins(self, spark, seqs, producers):
        from pulsar_spark.operators import dedup_messages

        data = [
            (f"p{i % producers}", s, i) for i, s in enumerate(seqs)
        ]
        df = spark.createDataFrame(
            data, "producer_name string, sequence_id long, offset long"
        )
        got = {
            (r["producer_name"], r["sequence_id"]): r["offset"]
            for r in dedup_messages(df).collect()
        }

        want: dict[tuple, int] = {}
        for prod, seq, off in data:
            want.setdefault((prod, seq), off)  # first occurrence
        assert got == want


class TestAckStateProperties:
    @SPARKY
    @given(
        acked_mask=st.lists(st.booleans(), min_size=1, max_size=60),
    )
    def test_mark_delete_and_holes_invariants(self, spark, acked_mask):
        from pulsar_spark.operators import ack_state

        df = spark.createDataFrame(
            [(0, i, a) for i, a in enumerate(acked_mask)],
            "partition int, offset long, acked boolean",
        )
        row = ack_state(df, F.col("acked")).collect()[0]

        unacked = [i for i, a in enumerate(acked_mask) if not a]
        want_md = (unacked[0] - 1) if unacked else len(acked_mask) - 1
        want_holes = sum(
            1 for i, a in enumerate(acked_mask) if a and i > want_md
        )
        assert row["mark_delete_offset"] == want_md
        assert row["individually_acked"] == want_holes
        # invariant: everything at or below mark-delete is acked
        assert all(acked_mask[: want_md + 1])


class TestSamplingProperties:
    """hash_sample vs a pure-python md5 oracle, any id set / fraction."""

    @given(
        ids=st.lists(st.integers(min_value=0, max_value=10**9), unique=True, max_size=40),
        fraction=st.floats(min_value=0.0, max_value=1.0),
        seed=st.integers(min_value=0, max_value=99),
    )
    @SPARKY
    def test_matches_md5_threshold_oracle(self, spark, ids, fraction, seed):
        import hashlib

        from pulsar_spark.functions import hash_sample

        df = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
        got = {r.doc_id for r in hash_sample(df, fraction, seed=seed).collect()}
        want = {
            i
            for i in ids
            if int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) / 2**32
            < fraction
        }
        assert got == want


class TestPackingProperties:
    """pack_sequences vs a pure-python streaming-fill oracle."""

    @given(
        toks=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40),
        seq_len=st.integers(min_value=2, max_value=64),
    )
    @SPARKY
    def test_matches_streaming_fill_oracle(self, spark, toks, seq_len):
        from pulsar_spark.functions import pack_sequences

        rows = [(i, "s", "w " * n) for i, n in enumerate(toks)]  # n tokens each
        df = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")
        got = {
            r.doc_id: (r.n_tokens, r.start_token, r.bin_id)
            for r in pack_sequences(df, seq_len=seq_len).collect()
        }
        start = 0
        want = {}
        for i, n in enumerate(toks):
            want[i] = (n, start, start // seq_len)
            start += n
        assert got == want


class TestContaminationProperties:
    """contamination_check vs a pure-python n-gram overlap oracle."""

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
            ).map(" ".join),
            min_size=1,
            max_size=12,
        ),
        n=st.integers(min_value=2, max_value=4),
    )
    @SPARKY
    def test_matches_python_overlap_oracle(self, spark, texts, n):
        from pulsar_spark.functions import contamination_check

        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        bench_df = df.where("doc_id % 3 = 0")
        corpus_df = df.where("doc_id % 3 != 0")

        def grams(t):
            w = t.split(" ")
            return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]

        bench = {g for i, t in rows if i % 3 == 0 for g in grams(t)}
        want = {
            i: (len(grams(t)), sum(g in bench for g in grams(t)))
            for i, t in rows
            if i % 3 != 0 and len(t.split(" ")) >= n
        }
        got = {
            r.doc_id: (r.n_grams, r.n_hits)
            for r in contamination_check(corpus_df, bench_df, n=n).collect()
        }
        assert got == want


class TestPriorityOrderProperties:
    """priority_dispatch_order invariants for ANY consumer spec
    (capi/ConsumerBuilder.java:545 semantics)."""

    @given(
        st.lists(
            st.tuples(
                st.integers(0, 99),   # consumer index -> name
                st.integers(0, 3),    # priority level
                st.integers(1, 5),    # permits
            ),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_order_invariants(self, spec):
        from pulsar_spark.operators.subscriptions import priority_dispatch_order

        consumers = [(f"c{i}", prio, permits) for i, prio, permits in spec]
        order = priority_dispatch_order(consumers)
        prio_of = {f"c{i}": prio for i, prio, _ in spec}
        permits_of = {f"c{i}": permits for i, _, permits in spec}

        # every permit dispatched exactly once
        assert len(order) == sum(permits_of.values())
        for name, permits in permits_of.items():
            assert order.count(name) == permits

        # a lower-priority consumer never dispatches before a
        # higher-priority one still holding permits: priorities along
        # the order are non-decreasing
        prios = [prio_of[c] for c in order]
        assert prios == sorted(prios)

        # round-robin within a level: a consumer with permits left is
        # not visited twice before every other same-level consumer with
        # permits left has been visited once
        from collections import defaultdict

        for level in sorted(set(prios)):
            seq = [c for c in order if prio_of[c] == level]
            seen = defaultdict(int)
            for c in seq:
                seen[c] += 1
                # no consumer may be 2 full rounds ahead of a peer that
                # still has permits remaining
                for other, p in permits_of.items():
                    if prio_of[other] == level and seen[other] < p:
                        assert seen[c] - seen[other] <= 1
