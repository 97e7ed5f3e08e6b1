"""Topic storage — the partitioned append-only log as a Parquet table.

Reference semantics (SURVEY.md §3.1): a producer routes each message to
a partition (key-hash Murmur3 or round-robin —
pulsar-client/.../impl/RoundRobinPartitionMessageRouterImpl.java:36,
MessageRouterBase.java:31-34), mints envelope metadata (producer_name,
sequence_id, publish_time), and the broker assigns (ledgerId, entryId)
positions — our (partition, offset).

Spark-first layout: one directory per topic, hive-partitioned by
``partition=N`` so partition pruning is free on read; per-partition
offsets are dense and monotonic. Writes repartition by the topic
partition BEFORE ``partitionBy`` so each task writes exactly one
partition directory (avoids the tasks x partitions small-file
explosion — at 1000 executors that is the difference between 8 files
and 8000 per append).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BacklogQuotaExceededError(RuntimeError):
    """ProducerBlockedQuotaExceededException analog: the topic's stored
    backlog is at or over its quota and the policy refuses the send."""


class ProducerBusyError(RuntimeError):
    """ProducerBusyException analog: another producer holds exclusive
    access to the topic (ProducerAccessMode.Exclusive javadoc: 'Fail
    immediately if there's already a producer connected')."""


class ProducerFencedError(RuntimeError):
    """ProducerFencedException analog: this producer's exclusive access
    was taken over by an ExclusiveWithFencing producer ('Any existing
    producer will be removed and invalidated immediately')."""


def _producer_lock_path(topic_path: str) -> str:
    import os

    return os.path.join(topic_path, "_producer_lock.json")


def producer_lock(topic_path: str) -> dict | None:
    """The topic's exclusive-producer registration, or None."""
    import json
    import os

    p = _producer_lock_path(topic_path)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


from contextlib import contextmanager


@contextmanager
def _lock_guard(topic_path: str):
    """Serialize lock-record read-modify-writes across processes: an
    fcntl.flock on a sidecar guard file (two concurrent producers on
    the old bare read-check-write could both pass the owner check and
    both believe they held exclusive access)."""
    import fcntl
    import os

    os.makedirs(topic_path, exist_ok=True)
    guard = _producer_lock_path(topic_path) + ".guard"
    with open(guard, "a+") as g:
        fcntl.flock(g, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(g, fcntl.LOCK_UN)


def _write_producer_lock(topic_path: str, record: dict) -> None:
    import json
    import os

    path = _producer_lock_path(topic_path)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(record, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)  # atomic: readers never see a torn record


def acquire_producer(
    topic_path: str,
    producer_name: str,
    access_mode: str = "exclusive",
    wait_timeout_s: float = 30.0,
    poll_interval_s: float = 0.05,
) -> int:
    """Register exclusive access (capi/ProducerAccessMode.java):

    - ``exclusive``: fail with ProducerBusyError if a DIFFERENT
      producer already holds the topic.
    - ``wait_for_exclusive``: queue for the lock — block (poll under
      the cross-process guard) until the current owner releases, then
      acquire with a bumped epoch; ProducerBusyError after
      ``wait_timeout_s``.
    - ``exclusive_with_fencing``: take over unconditionally; the
      previous owner is fenced and its next produce raises
      ProducerFencedError.

    Returns the topic epoch (bumped on every ownership change — the
    broker's topic-epoch fencing counter). The read-modify-write runs
    under an fcntl guard and the record lands via temp-file +
    atomic-rename, so concurrent producers cannot both acquire.
    """
    import time

    if access_mode not in ("exclusive", "wait_for_exclusive", "exclusive_with_fencing"):
        raise ValueError(f"unknown access mode: {access_mode}")
    deadline = time.monotonic() + wait_timeout_s
    while True:
        with _lock_guard(topic_path):
            lock = producer_lock(topic_path)
            if lock and lock["owner"] == producer_name:
                return lock["epoch"]
            if lock and producer_name in lock.get("fenced", []):
                # a fenced producer stays invalid however it reconnects
                raise ProducerFencedError(
                    f"producer {producer_name} was fenced off {topic_path} "
                    f"(current owner: {lock['owner']})"
                )
            busy = lock is not None and lock["owner"] is not None
            if busy and access_mode == "exclusive":
                raise ProducerBusyError(
                    f"topic {topic_path} exclusively held by {lock['owner']}"
                )
            if not busy or access_mode == "exclusive_with_fencing":
                fenced = list(lock.get("fenced", [])) if lock else []
                if busy:
                    fenced.append(lock["owner"])
                epoch = lock["epoch"] + 1 if lock else 0
                _write_producer_lock(
                    topic_path,
                    {"owner": producer_name, "epoch": epoch, "fenced": fenced},
                )
                return epoch
        # wait_for_exclusive with a live owner: poll until release
        if time.monotonic() >= deadline:
            raise ProducerBusyError(
                f"timed out waiting for exclusive access to {topic_path}"
            )
        time.sleep(poll_interval_s)


def release_producer(topic_path: str, producer_name: str) -> None:
    """Producer.close analog for an exclusive producer: give up
    ownership (only the current owner may). The lock record is KEPT
    with a null owner so the topic epoch stays monotonic (it is the
    fencing counter — a regression would un-detect ownership changes)
    and already-fenced producers remain invalid."""
    with _lock_guard(topic_path):
        lock = producer_lock(topic_path)
        if lock is None:
            return
        if lock["owner"] != producer_name:
            raise ProducerBusyError(
                f"{producer_name} does not hold {topic_path} (owner: {lock['owner']})"
            )
        lock["owner"] = None
        _write_producer_lock(topic_path, lock)


def _keyless_route(num_partitions: int, routing_mode: str, producer_name: str):
    """Partition expression for messages WITHOUT a key, per
    capi/MessageRoutingMode.java:
    - ``round_robin`` (RoundRobinPartition, the default): spread across
      all partitions. The reference's per-producer counter is
      inherently sequential; the distributed analog is a narrow
      interleave over Spark's per-task monotonic id — no shuffle, even
      spread, each task cycles through every partition.
    - ``single`` (SinglePartition): every keyless message from this
      producer lands on ONE partition chosen by hashing the producer
      name (client/impl/SinglePartitionMessageRouterImpl — the impl
      picks a random-but-sticky index; we make it the producer-name
      hash so it is deterministic and stable across appends).
    """
    if routing_mode == "single":
        return F.pmod(F.hash(F.lit(producer_name)), F.lit(num_partitions)).cast("int")
    return F.pmod(F.monotonically_increasing_id(), F.lit(num_partitions)).cast("int")


def route_partition(
    key,
    num_partitions: int,
    routing_mode: str = "round_robin",
    producer_name: str = "producer-0",
):
    """Key -> partition via Murmur3, matching the reference's key-hash
    router (Spark's ``hash`` is Murmur3 x86/32). Keyed messages are
    ALWAYS hash-routed regardless of routing mode
    (client/impl/MessageRouterBase.java:31-34 choosePartition: a
    present key wins over the mode); null keys fall back to the
    mode-specific keyless route."""
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        F.when(key_col.isNotNull(), F.pmod(F.hash(key_col), F.lit(num_partitions)))
        .otherwise(_keyless_route(num_partitions, routing_mode, producer_name))
        .cast("int")
    )


def _sql_over(
    spark: SparkSession, df: DataFrame, prefix: str, suffix: str = ""
) -> DataFrame:
    """Run ``prefix + <temp view of df> + suffix`` WITHOUT PySpark's
    string.Formatter parameterization, so statements built from
    caller-supplied column names survive braces and other
    formatter-significant characters. The view name is spliced between
    the two halves rather than substituted at a marker, so no column
    name or literal — whatever bytes it contains — can ever collide
    with the splice point. Costs the same view register/drop the
    formatter pays internally."""
    import uuid

    view = "_ps_sql_over_" + uuid.uuid4().hex
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(prefix + view + suffix)
    finally:
        spark.catalog.dropTempView(view)


def produce(
    payload: DataFrame,
    topic_path: str,
    key_col: str | None = None,
    num_partitions: int | None = None,
    producer_name: str = "producer-0",
    event_time_col: str | None = None,
    mode: str = "append",
    sequence_col: str | None = None,
    codec: str = "snappy",
    registry=None,
    interceptors=None,
    routing_mode: str = "round_robin",
    message_router=None,
    quota_rows: int | None = None,
    quota_policy: str = "exception",
    access_mode: str = "shared",
    write_tasks: int | None = None,
) -> None:
    """Append payload rows to a topic with full envelope minting.

    ``write_tasks`` caps the offset-window/write stage's task count
    below ``num_partitions`` for SMALL appends: each task then holds
    several WHOLE topic partitions (the window's clustering requirement
    still holds, the on-disk layout is still one file per partition per
    append), but the job pays ``write_tasks`` task commits + schedules
    instead of ``num_partitions`` — the fixed cost that dominates a
    sub-second append. Leave ``None`` (= ``num_partitions``, the
    historical shape) when the batch is big enough to want a writer
    per partition; at cluster scale micro-batches pick e.g.
    ``max(1, min(num_partitions, rows // 12_500))``.

    ``interceptors`` is an ordered list of ``DataFrame -> DataFrame``
    callables applied to the payload before routing/minting — the
    ProducerInterceptor.beforeSend chain
    (capi/interceptor/ProducerInterceptor.java:83); each sees the
    previous one's output. They run as plan transformations, not
    per-row callbacks, so an interceptor that sticks to built-in
    expressions costs nothing extra at scale.

    Offsets continue from the topic's current per-partition high
    watermark (read cheaply from the parquet footer stats of the
    existing table; an 8-row broadcast join).

    Pass ``sequence_col`` to supply caller sequence ids and get
    broker-side effectively-once semantics: rows whose sequence is <=
    the topic's highest stored sequence for this producer are silently
    dropped, and in-batch repeats keep one row
    (MessageDeduplication.java:279-281 isDuplicate).

    Pass ``registry`` (a ``pulsar_spark.schema_registry.SchemaRegistry``)
    to enforce the topic's registered schema on the write path — the
    AUTO_PRODUCE_BYTES analog (Schema.java:450): an append whose frame
    doesn't match the latest registered version raises before any file
    is written.
    """
    # ProducerAccessMode enforcement: an exclusive holder excludes
    # every other producer (shared ones get Busy); a fenced ex-owner
    # gets Fenced (capi/ProducerAccessMode.java).
    if access_mode != "shared":
        acquire_producer(topic_path, producer_name, access_mode)
    else:
        lock = producer_lock(topic_path)
        if lock is not None and lock["owner"] != producer_name:
            if producer_name in lock.get("fenced", []):
                raise ProducerFencedError(
                    f"producer {producer_name} was fenced off {topic_path} "
                    f"(current owner: {lock['owner']})"
                )
            if lock["owner"] is not None:
                raise ProducerBusyError(
                    f"topic {topic_path} exclusively held by {lock['owner']}"
                )
    for icept in interceptors or []:
        payload = icept(payload)
    if registry is not None:
        # the topic directory doubles as its policy dir, so a stored
        # schema_validation_enforced policy gates schema-less appends
        registry.validate_produce(topic_path, payload, policy_dir=topic_path)
    # One read of the stored topic serves the quota check, the dedup
    # high-water map and the offset rebase below — not three separate
    # jobs per append. Presence is decided by the partition= dirs (a
    # metadata check), so a real read error on existing data PROPAGATES
    # instead of being silently treated as an empty topic.
    existing = (
        _read_topic_if_present(payload.sparkSession, topic_path)
        if mode == "append"
        else None
    )
    if quota_rows is not None and mode == "append":
        # Producer-side backlog-quota policies (BacklogQuotaManager:
        # producer_exception raises ProducerBlockedQuotaExceededException,
        # producer_request_hold blocks the send — in a batch engine both
        # refuse the append; consumer_backlog_eviction is the
        # cursor-advance path in operators/retention.backlog_quota_evict).
        # The row count is parquet-footer metadata, not a data scan.
        if quota_policy not in ("exception", "request_hold"):
            raise ValueError(f"unknown quota_policy: {quota_policy}")
        stored = existing.count() if existing is not None else 0
        if stored >= quota_rows:
            raise BacklogQuotaExceededError(
                f"topic {topic_path} holds {stored} rows >= quota {quota_rows} "
                f"(policy {quota_policy}); drain or evict before producing"
            )
    if num_partitions is None:
        # partition count comes from the topic metadata sidecar when the
        # topic was created explicitly (createPartitionedTopic analog);
        # ad-hoc topics default to 8
        meta = topic_metadata(topic_path)
        num_partitions = meta["num_partitions"] if meta else 8
    spark = payload.sparkSession

    def _sq(s: str) -> str:
        # SQL single-quoted string literal
        return "'" + s.replace("'", "''") + "'"

    def _qi(c: str) -> str:
        # SQL backtick-quoted identifier (backticks double to escape) —
        # payload column names are caller data, not trusted SQL
        return "`" + c.replace("`", "``") + "`"

    # Routing mirrors MessageRoutingMode (capi/MessageRoutingMode.java):
    # an explicit ``message_router`` (Column, or callable DataFrame ->
    # Column) is CustomPartition; otherwise keyed rows hash-route and
    # keyless rows follow ``routing_mode`` ("round_robin" | "single").
    #
    # The route — and the whole envelope below — is built as SQL
    # expression STRINGS through selectExpr (ONE py4j round-trip per
    # select): the identical tree built Column-by-Column measured
    # ~120 ms of pure DRIVER time per append (r11, warm), the dominant
    # fixed cost of a sub-second produce and dead weight on a driver
    # pushing micro-batches at cluster scale. Expressions are
    # semantically identical to the former Column forms (hash =
    # Murmur3 x86/32 either way). Envelope columns REPLACE same-named
    # payload columns (as withColumn did), landing at the envelope's
    # position in the output order.
    if routing_mode == "single":
        keyless_sql = f"pmod(hash({_sq(producer_name)}), {int(num_partitions)})"
    else:
        keyless_sql = f"pmod(monotonically_increasing_id(), {int(num_partitions)})"
    if message_router is not None:
        router = message_router(payload) if callable(message_router) else message_router
        payload = payload.withColumn("_route", router.cast("bigint"))
        part_sql = f"CAST(pmod(_route, {int(num_partitions)}) AS INT)"
    elif key_col:
        part_sql = (
            f"CAST(CASE WHEN {_qi(key_col)} IS NOT NULL THEN "
            f"pmod(hash({_qi(key_col)}), {int(num_partitions)}) "
            f"ELSE {keyless_sql} END AS INT)"
        )
    else:
        part_sql = f"CAST({keyless_sql} AS INT)"
    _mint_names = {"partition", "producer_name", "topic", "offset",
                   "publish_time", "event_time", "key", "sequence_id",
                   "_route", "_send_order"}
    # The exclusion must match the SESSION's resolution rule: under the
    # default case-insensitive resolution a payload column "Partition"
    # collides with the minted `partition` in the window's PARTITION BY
    # (AMBIGUOUS_REFERENCE), and the former withColumn path replaced
    # such columns case-insensitively — so fold case before matching.
    # Under spark.sql.caseSensitive=true there is no collision and
    # "Partition" is a DISTINCT user column that must survive, so match
    # exactly there (folding would silently drop it).
    case_insensitive = (
        str(spark.conf.get("spark.sql.caseSensitive", "false")).lower() != "true"
    )
    base_cols = [
        _qi(c)
        for c in payload.columns
        if (c.lower() if case_insensitive else c) not in _mint_names
    ]
    # key/event_time are computed HERE, in the first projection, while
    # every payload column is still in scope (key_col is very often
    # literally named "key" — the second projection below could no
    # longer see it); the final projection only repositions them to the
    # envelope's historical column order.
    ev_sql = _qi(event_time_col) if event_time_col else "current_timestamp()"
    key_sql = f"CAST({_qi(key_col)} AS STRING)" if key_col else "CAST(NULL AS STRING)"

    import os

    topic_name = "persistent://public/default/" + os.path.basename(topic_path.rstrip("/"))
    # Pin the offset-window shuffle to one task per topic partition
    # (or the caller's smaller write_tasks cap — each task then holds
    # several whole partitions). The window's
    # ClusteredDistribution(partition) is satisfied by this explicit
    # hash partitioning, so no second exchange — but unlike the
    # implicit window shuffle, an explicit repartition is exempt from
    # AQE partition coalescing, which on small appends was merging the
    # whole batch into ONE task and serializing the 32-directory write
    # (measured ~40% of B1 wall time). At scale this loses nothing: a
    # row_number window over `partition` can never split a partition
    # across tasks anyway.
    n_tasks = num_partitions if write_tasks is None else max(1, min(
        int(write_tasks), num_partitions))
    # Send order (_send_order) must be captured BEFORE the shuffle: a
    # monotonic id minted below the exchange is stable per input row,
    # while one computed above it would follow shuffle-fetch arrival
    # order — nondeterministic across runs/retries on a real cluster,
    # which would break the offset=publish-order contract that
    # compaction keep-latest and per-key reads rely on. (Catalyst never
    # collapses projections across a non-deterministic expression, so
    # the id stays below the REPARTITION node.)
    env_sel = ", ".join(
        base_cols
        + (["`sequence_id`"] if sequence_col is not None else [])
        + [
            "`partition`",
            "`producer_name`",
            f"{_sq(topic_name)} AS topic",
            "CAST(row_number() OVER (PARTITION BY `partition` "
            "ORDER BY _send_order) - 1 AS BIGINT) AS offset",
            "current_timestamp() AS publish_time",
            "`event_time`",
            "`key`",
        ]
    )

    if sequence_col is not None:
        df = payload.selectExpr(
            *base_cols,
            f"{part_sql} AS partition",
            f"CAST({_qi(sequence_col)} AS BIGINT) AS sequence_id",
            f"{_sq(producer_name)} AS producer_name",
            f"{key_sql} AS key",
            f"{ev_sql} AS event_time",
        )
        # The high-water anti-filter only applies on append: an overwrite
        # discards the stored log (and with it the dedup high-water map),
        # so filtering the new batch against the data it is about to
        # replace would drop every row and write an empty topic.
        high = _existing_sequences(existing)
        if high is not None:
            df = (
                df.join(F.broadcast(high), on="producer_name", how="left")
                .where(F.col("_hiseq").isNull() | (F.col("sequence_id") > F.col("_hiseq")))
                .drop("_hiseq")
            )
        # In-batch duplicate sequences keep the FIRST row in send order —
        # the reference's MessageDeduplication admits the first message
        # with a given sequence and rejects later repeats, so collisions
        # must resolve deterministically across runs, not to an arbitrary
        # survivor. _send_order is monotonic within each input partition
        # in arrival order, giving a stable min_by tiebreak in one
        # aggregation (no extra shuffle beyond the dedup itself).
        seq_cols = [c for c in df.columns]
        df = (
            df.withColumn("_send_order", F.monotonically_increasing_id())
            .groupBy("producer_name", "sequence_id")
            .agg(
                F.min_by(
                    F.struct(*[c for c in seq_cols if c not in ("producer_name", "sequence_id")]),
                    F.col("_send_order"),
                ).alias("_m")
            )
            .select("producer_name", "sequence_id", "_m.*")
            .select(*seq_cols)
        )
        df = df.selectExpr("*", "monotonically_increasing_id() AS _send_order")
        df = df.repartition(n_tasks, "partition")
        df = _sql_over(spark, df, "SELECT " + env_sel + " FROM ")
    else:
        # Hot path: the WHOLE envelope — route, producer stamp, send
        # order, pinned repartition, offset window, sequence mint — as
        # ONE SQL statement, i.e. ONE eager analyzer pass. Classic
        # PySpark analyzes on every transformation, so the former
        # selectExpr/withColumn chain paid 4-5 analyses of a growing
        # tree: ~170 ms of pure driver time per append (measured r11,
        # warm), the dominant fixed cost of a sub-second produce. The
        # fused statement measured ~120 ms build+plan for the same tree.
        mint_sel = ", ".join(
            base_cols
            + [
                f"{part_sql} AS partition",
                f"{_sq(producer_name)} AS producer_name",
                f"{key_sql} AS key",
                f"{ev_sql} AS event_time",
                "monotonically_increasing_id() AS _send_order",
            ]
        )
        win_prefix = (
            "SELECT " + env_sel + " FROM ("
            "SELECT /*+ REPARTITION(" + str(int(n_tasks)) + ", `partition`) */ * "
            "FROM (SELECT " + mint_sel + " FROM "
        )
        win_suffix = "))"
        if existing is None:
            # fresh topic: no offset rebase — fuse the sequence mint too
            df = _sql_over(
                spark,
                payload,
                "SELECT *, CAST(offset * " + str(int(num_partitions))
                + " + `partition` AS BIGINT) AS sequence_id FROM (" + win_prefix,
                win_suffix + ")",
            )
        else:
            df = _sql_over(spark, payload, win_prefix, win_suffix)

    base = _existing_offsets(existing)
    if base is not None:
        df = df.join(F.broadcast(base), on="partition", how="left").withColumn(
            "offset", F.col("offset") + F.coalesce(F.col("_base") + 1, F.lit(0))
        ).drop("_base")

    if sequence_col is None and existing is not None:
        # sequence_id: the dedup contract (MessageDeduplication.java:279-281)
        # only needs strict monotonicity in send order per producer — reject
        # sequence <= highest-seen — not dense numbering. Mint it AFTER
        # offset rebasing as the bijection offset*num_partitions+partition
        # (send order = round-robin interleave across partitions): unique
        # per producer, strictly increasing along every partition's log
        # across appends, and a narrow expression — no extra pass, no
        # single-task global window (a window over producer_name would
        # serialize the whole batch into one task).
        df = df.selectExpr(
            "*",
            f"CAST(offset * {int(num_partitions)} + `partition` AS BIGINT) "
            "AS sequence_id",
        )

    # No repartition here: the offset window already hash-partitioned the
    # data by `partition`, so each task holds whole topic partitions and
    # the dynamic-partition write emits one file per partition per append.
    # Hot-tier appends default to snappy (CompressionType.java:29-43 puts
    # the codec choice on the producer): encode cost sits on the ingest
    # critical path (snappy measured ~20% faster than lz4 end-to-end on
    # the partitioned append), while compaction / tiered offload rewrite
    # cold data to zstd where ratio matters more than speed.
    # An overwrite clears the whole topic directory including the
    # _topic.json metadata sidecar; capture it first and restore after so
    # partition count / properties survive (truncate_topic keeps it too —
    # the sidecar is topic identity, not data).
    preserved_meta = topic_metadata(topic_path) if mode != "append" else None
    # the producer lock is topic identity too — an overwrite clears the
    # directory, so restore the registration afterwards
    preserved_lock = producer_lock(topic_path) if mode != "append" else None
    wrote_ok = False
    # AQE off for THIS write action (r12): the produce plan is scan ->
    # fused mint -> explicit REPARTITION(n, partition) -> offset window
    # -> write. AQE cannot improve that shape — there is no join to
    # re-strategize, skew handling applies only to joins, and the
    # explicit column+count repartition is exempt from partition
    # coalescing — but adaptive execution still materializes the
    # shuffle map stage as its own query-stage job and re-plans at the
    # boundary: measured ~0.07-0.10 s and one whole job of a ~0.5 s
    # append, at every data size (the boundary cost is per-stage fixed
    # overhead). The offset-rebase broadcast join (existing topics)
    # carries an explicit broadcast hint, which the static planner
    # honors identically. Session confs are process-global, so the
    # scope is kept to the single write action and restored in
    # ``finally``; a concurrent query on another thread of the same
    # session during this sub-second window would plan without AQE —
    # correct, just not adaptive.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        (
            df.write.mode("append" if mode == "append" else "overwrite")
            .option("compression", codec)
            .partitionBy("partition")
            .parquet(topic_path)
        )
        wrote_ok = True
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        # Restore the sidecar even if the data write failed partway —
        # topic identity (partition count, properties) must survive a
        # botched overwrite. The restored partition count must describe
        # the data actually ON DISK: after a successful overwrite that
        # is the resolved count the new data was routed over; after a
        # FAILED overwrite (e.g. analysis error before any file was
        # deleted) the old data may be fully intact, so the ORIGINAL
        # count is restored — stamping the caller's new count there
        # would desynchronize routing from storage.
        if preserved_meta is not None:
            create_topic(
                topic_path,
                num_partitions=(
                    num_partitions if wrote_ok else preserved_meta["num_partitions"]
                ),
                properties=preserved_meta.get("properties"),
            )
        if preserved_lock is not None:
            import json as _json

            with open(_producer_lock_path(topic_path), "w") as fh:
                _json.dump(preserved_lock, fh)


def _read_topic_if_present(
    spark: SparkSession, topic_path: str, prefix: str = "partition="
) -> DataFrame | None:
    """The stored topic table, or None when no data has ever been
    written. Presence = ``{prefix}`` subdirectories exist (cheap
    metadata check, mirroring the hive layout the writers produce —
    ``partition=`` for classic topics, ``segment=`` for scalable ones)
    so that an actual read error on present data raises instead of
    masquerading as an empty topic."""
    import os

    if not os.path.isdir(topic_path):
        return None
    if not any(n.startswith(prefix) for n in os.listdir(topic_path)):
        return None
    return spark.read.parquet(topic_path)


def _existing_offsets(existing: DataFrame | None) -> DataFrame | None:
    if existing is None:
        return None
    return existing.groupBy("partition").agg(F.max("offset").alias("_base"))


def _existing_sequences(existing: DataFrame | None) -> DataFrame | None:
    """Highest stored sequence per producer — the dedup high-water map
    (MessageDeduplication.java:112 highestSequencedPushed)."""
    if existing is None:
        return None
    return existing.groupBy("producer_name").agg(F.max("sequence_id").alias("_hiseq"))


def write_topic(
    messages: DataFrame,
    topic_path: str,
    mode: str = "overwrite",
    repartition: bool = True,
    codec: str | None = None,
) -> None:
    """Write an already-enveloped message DataFrame as a topic table.

    ``repartition(partition)`` first: one writer task per topic
    partition, one file per append per partition. Pass
    ``repartition=False`` when the input is already hash-partitioned by
    ``partition`` (e.g. straight out of the envelope window) to skip
    the redundant shuffle.

    ``codec=None`` (default) inherits the session parquet codec (zstd)
    — right for cold rewrites (compaction's ``__compacted`` side table,
    fixtures) where ratio beats encode speed. Pass ``codec='snappy'``
    on the hot ingest path, as ``produce`` does.
    """
    df = messages.repartition("partition") if repartition else messages
    w = df.write.mode(mode)
    if codec is not None:
        w = w.option("compression", codec)
    w.partitionBy("partition").parquet(topic_path)


def read_topic(
    spark: SparkSession,
    topic_path: str,
    start_offset: int | None = None,
    start_time: str | None = None,
    interceptors=None,
    end_offset: int | None = None,
    end_time: str | None = None,
) -> DataFrame:
    """Batch scan of a topic (Reader analog — capi/Reader.java:116-159:
    scan from explicit position or timestamp). Offset/time predicates
    push down to the parquet scan; the partition column prunes
    directories.

    ``end_offset`` / ``end_time`` bound the scan inclusively — the
    startTimestamp/endTimestamp consume window (PIP-435: client CLI
    consumes messages published within [start, end]).

    ``interceptors``: ordered ``DataFrame -> DataFrame`` callables
    applied to the scan before returning — the
    ConsumerInterceptor.beforeConsume chain
    (capi/ConsumerInterceptor.java:118). Interceptors that only add
    filters/projections still push down through them."""
    df = spark.read.parquet(topic_path)
    if start_offset is not None:
        df = df.where(F.col("offset") >= start_offset)
    if start_time is not None:
        df = df.where(F.col("publish_time") >= F.lit(start_time).cast("timestamp"))
    if end_offset is not None:
        df = df.where(F.col("offset") <= end_offset)
    if end_time is not None:
        df = df.where(F.col("publish_time") <= F.lit(end_time).cast("timestamp"))
    # interceptors run after cursor positioning, like beforeConsume
    # fires on messages already selected for delivery
    for icept in interceptors or []:
        df = icept(df)
    return df


def write_topic_bucketed(
    messages: DataFrame,
    table_name: str,
    n_buckets: int = 32,
    key_col: str = "key",
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a topic as a BUCKETED table: rows hash-clustered by key
    into ``n_buckets`` file groups, sorted by key within each bucket.

    This is the at-rest analog of Key_Shared dispatch (SURVEY.md §2.9:
    sticky key-hash ranges) and the scale path for every keyed
    operator: compaction, TableView materialization, and key-grouped
    aggregation read bucket metadata from the catalog and run with NO
    shuffle — at 100 TB that deletes the single biggest cost of a
    latest-per-key rewrite. A join between two topics bucketed the
    same way (same key, same bucket count) is likewise shuffle-free.

    Requires a table catalog (``saveAsTable``); pass ``path`` to keep
    the data external at a chosen location.
    """
    writer = (
        messages.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_topic_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read of a bucketed topic table (bucket metadata intact,
    so Catalyst elides exchanges on the bucket key)."""
    return spark.table(table_name)

def create_topic(
    topic_path: str, num_partitions: int = 8, properties: dict | None = None
) -> None:
    """Create a partitioned topic: record its metadata sidecar
    (``_topic.json``) — the createPartitionedTopic admin analog
    (pulsar-client-admin-api/.../admin/Topics.java createPartitionedTopic).
    ``produce`` reads the partition count from here when the caller
    doesn't pass one, so every writer routes over the same key space.
    """
    import json
    import os

    os.makedirs(topic_path, exist_ok=True)
    meta = {"num_partitions": int(num_partitions), "properties": properties or {}}
    with open(os.path.join(topic_path, "_topic.json"), "w") as fh:
        json.dump(meta, fh)


def update_partitions(topic_path: str, num_partitions: int) -> None:
    """Topics.updatePartitionedTopic analog (pulsar-client-admin-api/
    .../admin/Topics.java updatePartitionedTopic): grow a partitioned
    topic's partition count. The reference broker rejects a decrease
    (new count must exceed the current one) because consumers' hash
    ranges and existing data can't shrink — same rule here.

    Stored data is untouched: hive-partitioned parquet reads the old
    ``partition=N`` directories exactly as before, and the next
    ``produce`` picks up the new count from the sidecar and routes over
    the wider space. Keyed routing consequently remaps keys across the
    boundary — exactly the reference's documented behavior (key->
    partition assignment is only stable for a fixed partition count).
    """
    meta = topic_metadata(topic_path)
    if meta is None:
        raise ValueError(f"not a partitioned topic (no _topic.json): {topic_path}")
    if int(num_partitions) <= int(meta["num_partitions"]):
        raise ValueError(
            f"new partition count {num_partitions} must exceed current "
            f"{meta['num_partitions']} (the reference only grows topics)"
        )
    create_topic(topic_path, num_partitions=int(num_partitions), properties=meta.get("properties"))


def topic_metadata(topic_path: str) -> dict | None:
    """Read the topic's metadata sidecar, or None for an ad-hoc topic."""
    import json
    import os

    f = os.path.join(topic_path, "_topic.json")
    if not os.path.exists(f):
        return None
    with open(f) as fh:
        return json.load(fh)


def truncate_topic(topic_path: str) -> None:
    """Topics.truncate analog (pulsar-client-admin-api/.../admin/
    Topics.java:4435): delete every stored message but keep the topic
    itself — the metadata sidecar (partition count, properties)
    survives, so the next ``produce`` routes over the same key space
    and offsets restart at 0 per partition.

    Implemented as a directory-level delete of the ``partition=*``
    subtrees (no job, no scan): truncation is a metadata operation in
    the reference and stays one here.
    """
    import os
    import shutil

    for name in os.listdir(topic_path):
        p = os.path.join(topic_path, name)
        if name.startswith("partition=") and os.path.isdir(p):
            shutil.rmtree(p)
        elif name.startswith("_SUCCESS") or name.startswith("part-"):
            os.remove(p) if os.path.isfile(p) else shutil.rmtree(p)


def list_topics_by_metadata(
    namespace_dir: str, loader, property_filters: dict | None = None
) -> list[str]:
    """Shared namespace-listing walk (PIP-452 customizable topic
    listing): every directory whose ``loader`` yields a metadata dict,
    optionally filtered to those whose properties contain ALL given
    key/value pairs. ``loader(path) -> dict | None`` abstracts which
    sidecar defines topic-ness (classic ``_topic.json`` vs scalable
    ``_scalable.json``) so both listings share one filter semantic."""
    import os

    out = []
    if not os.path.isdir(namespace_dir):
        return out
    for name in sorted(os.listdir(namespace_dir)):
        p = os.path.join(namespace_dir, name)
        meta = loader(p) if os.path.isdir(p) else None
        if meta is None:
            continue
        if property_filters:
            props = meta.get("properties", {})
            if any(props.get(k) != v for k, v in property_filters.items()):
                continue
        out.append(p)
    return out


def list_topics(namespace_dir: str, property_filters: dict | None = None) -> list[str]:
    """Classic-topic namespace listing with property filters."""
    return list_topics_by_metadata(namespace_dir, topic_metadata, property_filters)


def check_topic_consistency(spark: SparkSession, topic_path: str) -> dict:
    """Topic integrity check (PIP-414 enforce topic consistency): one
    aggregation pass validating the storage invariants the engine
    relies on. Returns a report dict; ``ok`` is True when every
    invariant holds:

    - no duplicate (partition, offset) message ids;
    - offsets CONTIGUOUS per partition (max - min + 1 == count; the
      low end need not be 0 — tiered offload legitimately trims the
      hot tier's oldest offsets away);
    - every stored partition is within the sidecar's declared count
      (routing and storage agree).
    """
    df = _read_topic_if_present(spark, topic_path)
    if df is None:
        return {"ok": True, "partitions": 0, "rows": 0, "problems": []}
    per = (
        df.groupBy("partition")
        .agg(
            F.count("*").alias("rows"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            F.countDistinct("offset").alias("distinct_offsets"),
        )
        .collect()
    )
    problems = []
    for r in per:
        if r.distinct_offsets != r.rows:
            problems.append(f"partition {r.partition}: duplicate offsets")
        if r.max_offset - r.min_offset + 1 != r.rows:
            problems.append(
                f"partition {r.partition}: offsets not contiguous "
                f"(range [{r.min_offset}, {r.max_offset}], rows {r.rows})"
            )
    meta = topic_metadata(topic_path)
    if meta is not None:
        declared = int(meta["num_partitions"])
        stored = {r.partition for r in per}
        extra = {p for p in stored if p >= declared}
        if extra:
            problems.append(
                f"partitions {sorted(extra)} outside declared count {declared}"
            )
    return {
        "ok": not problems,
        "partitions": len(per),
        "rows": sum(r.rows for r in per),
        "problems": problems,
    }
