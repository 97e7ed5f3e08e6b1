"""Subscription disciplines, Key_Shared hashing, DLQ / retry routing.

Reference semantics:
- Key_Shared assigns each key a slot in a 64K hash space and maps hash
  ranges to consumers (broker/service/StickyKeyConsumerSelector.java:38
  DEFAULT_RANGE_SIZE = 2<<15; :82 makeStickyKeyHash;
  HashRangeAutoSplitStickyKeyConsumerSelector.java:59-77 splits the
  largest range on consumer join). Per-key ordering is preserved
  because a key always maps to exactly one consumer.
- Dead-letter policy: after ``maxRedeliverCount`` redeliveries a
  message is routed to the DLQ topic; ``reconsumeLater`` sends to a
  retry topic with a delay (pulsar-client-api DeadLetterPolicy.java:46-64,
  Consumer.java:305-356).

Spark-first: consumer assignment is a partitioning expression —
``repartition(n, slot)`` gives each "consumer" (task) its key range
with per-key order within the partition. DLQ/retry are a split write:
one filter per sink over the same scan (Spark computes the scan once
per sink in batch; in streaming use foreachBatch dual-write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_RANGE_SIZE = 2 << 15  # 65536, StickyKeyConsumerSelector.DEFAULT_RANGE_SIZE


def sticky_key_hash(key: Column, deterministic_mod: bool = False) -> Column:
    """Key -> slot in [0, 65536). Murmur3 (Spark's ``hash`` IS
    Murmur3 x86/32) matching makeStickyKeyHash; ``deterministic_mod``
    switches to a plain modulo on the numeric key for cross-engine
    oracle tests (DuckDB has no Murmur3)."""
    if deterministic_mod:
        # Knuth multiplicative hash — spreads small numeric keys across the
        # range and is expressible identically in any SQL dialect.
        # try_cast + masked crc32 keeps it total over non-numeric keys
        # (a bare cast throws under the ANSI default).
        basis = F.coalesce(
            key.try_cast("bigint"),
            F.crc32(key.cast("string").cast("binary")).bitwiseAND(F.lit(0x7FFFFFFF)),
        )
        return F.pmod(basis * F.lit(2654435761), F.lit(HASH_RANGE_SIZE)).cast("int")
    return F.pmod(F.hash(key), F.lit(HASH_RANGE_SIZE)).cast("int")


def key_shared_assignment(
    messages: DataFrame,
    num_consumers: int,
    key_col: str = "key",
    deterministic_mod: bool = False,
) -> DataFrame:
    """Assign each message to a consumer by equal hash ranges
    (HashRangeAutoSplit steady state with 2^k consumers). Adds
    ``sticky_hash`` and ``consumer_id`` columns."""
    range_per = HASH_RANGE_SIZE // num_consumers
    slot = sticky_key_hash(F.col(key_col), deterministic_mod)
    return messages.withColumn("sticky_hash", slot).withColumn(
        "consumer_id", F.least(F.floor(F.col("sticky_hash") / range_per), F.lit(num_consumers - 1)).cast("int")
    )


def dlq_split(
    messages: DataFrame,
    fail_predicate: Column,
    max_redeliver_count: int,
) -> tuple[DataFrame, DataFrame]:
    """Split into (delivered, dead_letter).

    Rows matching ``fail_predicate`` exhaust ``max_redeliver_count``
    redeliveries and land in the DLQ with the terminal redelivery_count,
    mirroring DeadLetterPolicy; everything else delivers with count 0.
    """
    delivered = messages.where(~fail_predicate)
    dlq = messages.where(fail_predicate).withColumn(
        "redelivery_count", F.lit(max_redeliver_count).cast("int")
    )
    return delivered, dlq


def retry_schedule(
    messages: DataFrame,
    fail_predicate: Column,
    backoff_seconds: int,
    publish_time_col: str = "publish_time",
    backoff_multiplier: float | None = None,
    max_backoff_seconds: int | None = None,
) -> DataFrame:
    """reconsumeLater analog: failed rows scheduled on the retry topic
    with deliver_at = publish_time + backoff.

    With ``backoff_multiplier`` the delay grows exponentially with the
    redelivery count — the MultiplierRedeliveryBackoff contract
    (capi/RedeliveryBackoff.java; client/impl/MultiplierRedeliveryBackoff.java;
    NegativeAcksTracker.java:45): ``delay = min(backoff_seconds *
    multiplier^redelivery_count, max_backoff_seconds)``. A closed-form
    column expression — no state, rides the scan at any scale.
    """
    if backoff_multiplier is None:
        delay = F.lit(backoff_seconds).cast("double")
    else:
        delay = F.lit(float(backoff_seconds)) * F.pow(
            F.lit(float(backoff_multiplier)),
            F.coalesce(F.col("redelivery_count"), F.lit(0)).cast("double"),
        )
        if max_backoff_seconds is not None:
            delay = F.least(delay, F.lit(float(max_backoff_seconds)))
    return (
        messages.where(fail_predicate)
        .withColumn(
            "deliver_at",
            F.col(publish_time_col) + F.make_interval(secs=delay),
        )
        .withColumn("redelivery_count", (F.col("redelivery_count") + 1).cast("int"))
    )


def hash_range_auto_split(num_consumers: int) -> list[tuple[int, int, int]]:
    """Range boundaries from sequential consumer joins, each split
    halving the (first) largest existing range —
    HashRangeAutoSplitStickyKeyConsumerSelector.java:59-77. Returns
    [(start, end_exclusive, consumer_id)] covering [0, 65536)."""
    ranges: list[tuple[int, int, int]] = [(0, HASH_RANGE_SIZE, 0)]
    for c in range(1, num_consumers):
        i = max(range(len(ranges)), key=lambda j: ranges[j][1] - ranges[j][0])
        s, e, owner = ranges[i]
        mid = (s + e) // 2
        ranges[i] = (s, mid, owner)
        ranges.insert(i + 1, (mid, e, c))
    return ranges


def key_shared_assignment_auto_split(
    messages: DataFrame,
    num_consumers: int,
    key_col: str = "key",
    deterministic_mod: bool = False,
) -> DataFrame:
    """Key_Shared assignment under auto-split ranges (exact reference
    boundaries, including non-power-of-two consumer counts where range
    sizes differ 2:1). Adds ``sticky_hash`` and ``consumer_id``."""
    ranges = hash_range_auto_split(num_consumers)
    slot = sticky_key_hash(F.col(key_col), deterministic_mod)
    expr = F.lit(None).cast("int")
    assign = None
    for s, e, owner in ranges:
        cond = (F.col("sticky_hash") >= s) & (F.col("sticky_hash") < e)
        assign = F.when(cond, owner) if assign is None else assign.when(cond, owner)
    return messages.withColumn("sticky_hash", slot).withColumn(
        "consumer_id", assign.cast("int")
    )


def batch_receive(
    messages: DataFrame,
    max_num_messages: int = 10,
    max_num_bytes: int | None = None,
    partition_col: str = "partition",
    offset_col: str = "offset",
    size_col: str | None = None,
) -> DataFrame:
    """Assign consumer receive-batch ids per partition — the
    BatchReceivePolicy analog (capi/BatchReceivePolicy.java:66-69: a
    batch closes on maxNumMessages OR maxNumBytes, whichever first).

    Deterministic windowed formulation: each row gets a count-quota
    bucket ``(row_number-1) // max_num_messages`` and, when byte caps
    are configured, a byte-quota bucket of its *starting* cumulative
    byte ``(cum_bytes - size) // max_num_bytes``; the batch id is the
    dense rank of the (count_bucket, byte_bucket) pair along offset
    order. Every batch holds <= max_num_messages rows and starts
    within one byte quota; like the reference (which always accepts
    the message that crosses the limit), a batch's final message may
    run past the byte cap — by less than one message, never more.

    Scale: window passes over one (partition, offset) sort — a single
    shuffle, no Python, batch ids dense per partition in offset order.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(partition_col).orderBy(offset_col)
    count_bucket = F.floor((F.row_number().over(w) - 1) / max_num_messages)
    df = messages.withColumn("_cb", count_bucket)
    if max_num_bytes is not None and size_col is not None:
        byte_bucket = F.floor(
            (F.sum(size_col).over(w) - F.col(size_col)) / max_num_bytes
        )
        df = (
            df.withColumn("_bb", byte_bucket)
            .withColumn(
                "batch_id",
                (
                    F.dense_rank().over(
                        Window.partitionBy(partition_col).orderBy("_cb", "_bb")
                    )
                    - 1
                ).cast("bigint"),
            )
            .drop("_cb", "_bb")
        )
    else:
        df = df.withColumn("batch_id", F.col("_cb").cast("bigint")).drop("_cb")
    return df


def ack_timeout_redelivery(
    messages: DataFrame,
    acked: Column,
    ack_timeout_seconds: int,
    now: Column | None = None,
    publish_time_col: str = "publish_time",
) -> DataFrame:
    """Ack-timeout redelivery candidates — the UnAckedMessageTracker
    analog (client/impl/UnAckedMessageTracker.java:45: messages not
    acked within ``ackTimeoutMillis`` of delivery are redelivered).
    Distinct from negative acks (NegativeAcksTracker / retry_schedule):
    this path fires on SILENCE, not on an explicit nack.

    Batch form: unacked rows whose delivery (publish) time is older
    than ``now - ack_timeout`` come back with redelivery_count + 1.
    A narrow filter + projection — rides the scan at any scale.
    """
    now = now if now is not None else F.current_timestamp()
    cutoff = now - F.make_interval(secs=F.lit(ack_timeout_seconds))
    return (
        messages.where(~acked.cast("boolean") & (F.col(publish_time_col) < cutoff))
        .withColumn(
            "redelivery_count",
            (F.coalesce(F.col("redelivery_count"), F.lit(0)) + 1).cast("int"),
        )
    )


class BackoffPolicy:
    """Redelivery/reconnect backoff configuration — the
    capi-v5/config/BackoffPolicy.java contract: the base delay for
    attempt ``n`` is ``min(initial * multiplier^(n-1), max)``, with an
    optional symmetric jitter of ±jitter_percent/2 applied to each
    delay.

    The reference's jitter is random; a distributed engine needs the
    same row to get the same delay on every executor, so jitter here is
    DETERMINISTIC: a per-row uniform drawn from a multiplicative hash
    of ``jitter_col`` (pass None — the default — for no jitter, the
    oracle-friendly form).
    """

    def __init__(
        self,
        initial_interval_s: float,
        max_interval_s: float,
        multiplier: float = 2.0,
        jitter_percent: float = 0.0,
    ):
        if multiplier < 1.0:
            raise ValueError("multiplier must be >= 1.0")
        if not 0 <= jitter_percent <= 100:
            raise ValueError("jitterPercent must be in [0, 100]")
        self.initial_interval_s = float(initial_interval_s)
        self.max_interval_s = float(max_interval_s)
        self.multiplier = float(multiplier)
        self.jitter_percent = float(jitter_percent)

    @classmethod
    def fixed(cls, interval_s: float, max_interval_s: float | None = None) -> "BackoffPolicy":
        return cls(interval_s, max_interval_s if max_interval_s is not None else interval_s, 1.0)

    @classmethod
    def exponential(cls, initial_interval_s: float, max_interval_s: float) -> "BackoffPolicy":
        return cls(initial_interval_s, max_interval_s, 2.0)

    def delay_expr(self, attempt: Column, jitter_col: Column | None = None) -> Column:
        """Delay (seconds, double) for 1-based ``attempt``. Closed-form
        column expression — no state, rides the scan."""
        base = F.least(
            F.lit(self.initial_interval_s)
            * F.pow(F.lit(self.multiplier), attempt.cast("double") - 1),
            F.lit(self.max_interval_s),
        )
        if self.jitter_percent and jitter_col is not None:
            # deterministic uniform in [0,1): Knuth multiplicative mix of
            # the jitter column, expressible identically in any dialect
            u = F.pmod(jitter_col.cast("bigint") * F.lit(2654435761), F.lit(10000)) / 10000.0
            base = base * (1 + F.lit(self.jitter_percent / 100.0) * (u - 0.5))
        return base


class ProcessingTimeoutPolicy:
    """Queue-consumer stall safety net —
    capi-v5/config/ProcessingTimeoutPolicy.java:46: if the application
    doesn't ack a delivery within ``timeout``, the client asks the
    broker to redeliver; ``redelivery_backoff`` (a BackoffPolicy, or
    None) controls the cadence of those redeliveries — None means
    "redeliver immediately on the next sweep", the historical default.
    """

    def __init__(self, timeout_s: float, redelivery_backoff: BackoffPolicy | None = None):
        if timeout_s < 0:
            raise ValueError("timeout must not be negative")
        self.timeout_s = float(timeout_s)
        self.redelivery_backoff = redelivery_backoff

    @classmethod
    def of(cls, timeout_s: float) -> "ProcessingTimeoutPolicy":
        return cls(timeout_s, None)


def processing_timeout_redelivery(
    messages: DataFrame,
    acked: Column,
    policy: ProcessingTimeoutPolicy,
    now: Column | None = None,
    publish_time_col: str = "publish_time",
    jitter_col: Column | None = None,
) -> DataFrame:
    """The v5 composition of ack-timeout detection and backoff
    redelivery as ONE operator (ProcessingTimeoutPolicy.java:46 applied
    by the queue consumer's pending-ack sweep): unacked rows whose
    delivery is older than ``now - timeout`` are redelivery candidates;
    each comes back with ``redelivery_count + 1`` and a ``deliver_at``
    of ``now + backoff(redelivery_count + 1)`` (None backoff =
    redeliver immediately: deliver_at = now).

    ``timeout_s == 0`` disables the policy (Duration.ZERO contract):
    returns an empty frame of the same redelivery shape.

    Closed-form filter + projection — no state, pushes into the scan.
    """
    now = now if now is not None else F.current_timestamp()
    attempt = (F.coalesce(F.col("redelivery_count"), F.lit(0)) + 1).cast("int")
    out = (
        messages.where(
            ~acked.cast("boolean")
            & (
                F.col(publish_time_col)
                < now - F.make_interval(secs=F.lit(policy.timeout_s))
            )
        )
        if policy.timeout_s > 0
        else messages.limit(0)
    )
    delay = (
        policy.redelivery_backoff.delay_expr(attempt, jitter_col)
        if policy.redelivery_backoff is not None
        else F.lit(0.0)
    )
    # deliver_at FIRST: both expressions read the ORIGINAL
    # redelivery_count; writing the incremented count before deliver_at
    # would re-resolve `attempt` against the updated column and skip an
    # extra backoff step
    return out.withColumn("deliver_at", now + F.make_interval(secs=delay)).withColumn(
        "redelivery_count", attempt
    )


def priority_dispatch_order(
    consumers: list[tuple[str, int, int]],
) -> list[str]:
    """The Shared-subscription dispatch order for one permit cycle,
    exactly as ConsumerBuilder.priorityLevel documents it
    (capi/ConsumerBuilder.java:545-565): the broker round-robins the
    highest-priority (lowest number) consumers, consuming one permit
    per visit, and only moves to the next priority level when every
    higher-priority consumer is out of permits.

    ``consumers`` is [(consumer_id, priority_level, permits)]. For the
    javadoc's example — C1(0,2) C2(0,1) C3(0,1) C4(1,2) C5(1,1) — this
    returns [C1, C2, C3, C1, C4, C5, C4].
    """
    order: list[str] = []
    by_prio: dict[int, list[list]] = {}
    for cid, prio, permits in consumers:
        by_prio.setdefault(prio, []).append([cid, permits])
    for prio in sorted(by_prio):
        ring = by_prio[prio]
        while any(p > 0 for _, p in ring):
            for entry in ring:
                if entry[1] > 0:
                    order.append(entry[0])
                    entry[1] -= 1
    return order


def priority_shared_assignment(
    messages: DataFrame,
    consumers: list[tuple[str, int, int]],
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Assign each message of a Shared subscription to a consumer under
    priority levels (PersistentDispatcherMultipleConsumersClassic
    .getNextConsumer walks a priority-sorted consumer list;
    capi/ConsumerBuilder.java:545 spells the order out).

    Batch model: the backlog drains in dispatch order per topic
    partition (each partition has its own dispatcher), and permits
    replenish as batches are acked — so the one-cycle dispatch order
    repeats with period sum(permits). The per-partition dispatch rank
    is a windowed row_number (narrow after the topic's own
    partitioning), and the cycle lookup is an array literal index —
    no joins, no extra shuffles at any scale.

    Adds ``consumer_id``.
    """
    from pyspark.sql import Window

    order = priority_dispatch_order(consumers)
    w = Window.partitionBy(partition_col).orderBy(offset_col)
    rank = F.row_number().over(w) - 1
    cycle = F.array(*[F.lit(c) for c in order])
    return messages.withColumn(
        "consumer_id", F.element_at(cycle, (rank % len(order) + 1).cast("int"))
    )


def failover_active_consumers(
    consumers: list[tuple[str, int]],
    num_partitions: int,
) -> dict[int, str]:
    """Failover-subscription active-consumer choice for a partitioned
    topic (capi/ConsumerBuilder.java:566-585): consumers sort by
    priority level then lexicographic name, and partitions are assigned
    evenly across the consumers sharing the HIGHEST priority
    (AbstractDispatcherSingleActiveConsumer picks index
    partition % count within the sorted top-priority group).

    ``consumers`` is [(consumer_name, priority_level)]; returns
    {partition -> active consumer name}.
    """
    top = min(p for _, p in consumers)
    ranked = sorted(name for name, p in consumers if p == top)
    return {part: ranked[part % len(ranked)] for part in range(num_partitions)}


def dispatch_throttle(
    messages: DataFrame,
    rate_msgs: int | None = None,
    rate_bytes: int | None = None,
    drain_start: str = "2024-02-01 00:00:00",
    partition_col: str = "partition",
    offset_col: str = "offset",
    payload_col: str = "val",
) -> DataFrame:
    """Dispatch-rate limiting schedule — the DispatchRateLimiter analog
    (broker/service/persistent/DispatchRateLimiter.java:70-92: a
    per-second token bucket on messages and/or bytes; the dispatcher
    pauses reads when either quota is exhausted and resumes next
    second).

    Batch model (backlog drain, the limiter's defining case): messages
    dispatch in log order per partition; message i's dispatch second is
    the first second whose cumulative quota admits it —
    ``slot = max(rank // rate_msgs, cum_bytes_before // rate_bytes)``.
    Token-bucket burst credit is not modeled: this is the steady drain
    schedule, the bound the limiter enforces over any backlogged
    window.

    Adds ``dispatch_slot`` (seconds since drain start) and
    ``dispatch_at``. Windowed cumsum per topic partition — parallel,
    no global sort.
    """
    from pyspark.sql import Window

    if rate_msgs is None and rate_bytes is None:
        raise ValueError("at least one of rate_msgs / rate_bytes required")
    w = Window.partitionBy(partition_col).orderBy(offset_col)
    slots = []
    if rate_msgs is not None:
        rank = F.row_number().over(w) - 1
        slots.append(F.floor(rank / rate_msgs))
    if rate_bytes is not None:
        nbytes = F.coalesce(F.octet_length(F.col(payload_col).cast("string")), F.lit(0))
        cum_before = F.coalesce(
            F.sum(nbytes).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        )
        slots.append(F.floor(cum_before / rate_bytes))
    slot = slots[0] if len(slots) == 1 else F.greatest(*slots)
    return messages.withColumn("dispatch_slot", slot.cast("bigint")).withColumn(
        "dispatch_at",
        F.lit(drain_start).cast("timestamp")
        + F.make_interval(secs=F.col("dispatch_slot").cast("double")),
    )


def consistent_hash_ring(
    consumers: list[str], points_per_consumer: int = 100
) -> list[tuple[int, str]]:
    """Hash-ring points for the consistent-hashing Key_Shared selector
    (broker/service/ConsistentHashingStickyKeyConsumerSelector.java:
    each consumer owns ``numberOfPoints`` replicas on a ring over the
    64K slot space; a key is served by the first point at or after its
    slot, wrapping to the ring start).

    Point placement here is md5 of ``"{name}:{i}"`` (first 8 hex chars
    mod 65536) instead of the reference's Murmur3-of-String — same
    uniform-spread contract, but reproducible in any engine so the
    DuckDB oracle can rebuild the identical ring from the spec alone.
    Slot collisions resolve to the lexicographically smallest consumer
    (the reference keeps a per-slot list and load-splits it; a
    deterministic winner keeps the operator a pure function).
    """
    import hashlib

    pts: dict[int, str] = {}
    for name in consumers:
        for i in range(points_per_consumer):
            slot = int(hashlib.md5(f"{name}:{i}".encode()).hexdigest()[:8], 16) % HASH_RANGE_SIZE
            if slot not in pts or name < pts[slot]:
                pts[slot] = name
    return sorted(pts.items())


def consistent_hash_assignment(
    messages: DataFrame,
    consumers: list[str],
    points_per_consumer: int = 100,
    key_col: str = "key",
    deterministic_mod: bool = False,
) -> DataFrame:
    """Assign messages to consumers via the consistent-hash ring. Adds
    ``sticky_hash`` and ``consumer_id`` (consumer name) columns.

    The ring is tiny (consumers x points) and driver-resident; the
    per-row ceiling lookup is a filter over a literal sorted-slot array
    plus a literal map — pure codegen'd expressions, no join, no
    shuffle, so assignment rides the scan at any scale (the same reason
    the reference keeps the ring in broker memory).
    """
    ring = consistent_hash_ring(consumers, points_per_consumer)
    slots = [s for s, _ in ring]
    s_col = sticky_key_hash(F.col(key_col), deterministic_mod)
    slot_arr = F.array(*[F.lit(s) for s in slots])
    tmp = messages.withColumn("sticky_hash", s_col)
    # try_element_at: the filter is EMPTY for keys past the last ring
    # point (plain element_at throws on the empty array) — that is the
    # wrap-around to the ring's first point.
    pick = F.coalesce(
        F.try_element_at(F.filter(slot_arr, lambda x: x >= F.col("sticky_hash")), F.lit(1)),
        F.lit(slots[0]),
    )
    name_map = F.create_map(*[F.lit(x) for s, n in ring for x in (s, n)])
    return tmp.withColumn("consumer_id", name_map[pick])
