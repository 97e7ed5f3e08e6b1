"""Streaming curation capstone: the v4 batch recipe driven
incrementally off a live topic — the "crawl keeps arriving" shape that
distinguishes an engine from a batch script.

Per micro-batch (``foreachBatch``):

1. **Incremental exact dedup** against the all-time fingerprint store
   (functions/dedupe.py ``incremental_exact_dedup`` in its two-phase
   exactly-once form: survivors are persisted downstream FIRST, the
   fingerprints committed after, so an epoch replay can only re-append
   store rows — harmless for anti-join semantics — never drop data).
2. **Quality gate** (caller-supplied boolean column, e.g. a Gopher rule
   subset or a trained-classifier score cut).
3. **Sequence packing** (functions/packing.py
   ``materialize_packed_shards``) into trainer-ready shard blobs.
4. **Idempotent append**: each epoch writes its own
   ``batch_id=<epoch>`` directory with mode=overwrite, so a retried
   epoch overwrites its own output instead of duplicating it, and the
   accumulated output reads back as ONE hive-partitioned dataset.

Scale shape: every stage is the batch operator's plan (hash anti-join
against the fingerprint store, narrow gate, per-shard pack windows
bounded by the micro-batch), applied to micro-batch-sized inputs; state
between batches lives only in the fingerprint store (md5 per ever-seen
doc — no historical text is re-read).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def curate_batch(
    docs: DataFrame,
    epoch_id: int,
    fingerprint_store: str,
    output_path: str,
    gate: Column | None = None,
    seq_len: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    near_threshold: float | None = None,
) -> None:
    """One epoch of the streaming curation recipe (importable so tests
    and the foreachBatch closure share one implementation).

    Dedup survivors' fingerprints commit only AFTER the packed output
    write succeeds (two-phase exactly-once), into the epoch's OWN
    ``batch_id=N`` store directory: the anti-join excludes that
    directory, so a replayed epoch — even one whose previous attempt
    already committed — reproduces identical survivors and overwrites
    its own output rather than anti-joining against itself and silently
    emptying it. Gate-failed documents still commit their fingerprints
    — "seen" is a dedup property, independent of quality, so a rejected
    document's later copies do not sneak in through a fresh batch.

    ``near_threshold`` adds the incremental NEAR-dup stage after the
    exact one (functions/dedupe.py ``incremental_near_dedup``): edited
    recrawls that survive the byte-exact anti-join still fall to the
    all-time MinHash band store. Its signature store commits in the
    same two-phase position (after the packed write), into its own
    per-epoch subdirectories under ``<fingerprint_store>_near`` —
    replay idempotence holds for both stores together."""
    from pulsar_spark.functions.dedupe import (
        commit_fingerprints,
        commit_near_fingerprints,
        incremental_exact_dedup,
        incremental_near_dedup,
    )
    from pulsar_spark.functions.packing import materialize_packed_shards

    survivors = incremental_exact_dedup(
        docs, fingerprint_store, text_col=text_col, id_col=id_col,
        update_store=False, epoch=int(epoch_id),
    )
    if near_threshold is not None:
        survivors = incremental_near_dedup(
            survivors, f"{fingerprint_store}_near", threshold=near_threshold,
            text_col=text_col, id_col=id_col,
            update_store=False, epoch=int(epoch_id),
        )
    # the survivors feed two sinks (pack output + fingerprint commit):
    # pin them so the anti-join doesn't recompute against a store the
    # first sink's commit may already have grown
    survivors = survivors.persist()
    try:
        gated = survivors.where(gate) if gate is not None else survivors
        packed = materialize_packed_shards(
            gated, seq_len=seq_len, shard_col=shard_col,
            id_col=id_col, text_col=text_col,
        )
        # idempotent epoch output: a retry overwrites its own directory
        packed.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={int(epoch_id)}"
        )
        commit_fingerprints(
            survivors, fingerprint_store, text_col=text_col, epoch=int(epoch_id)
        )
        if near_threshold is not None:
            commit_near_fingerprints(
                survivors, f"{fingerprint_store}_near",
                text_col=text_col, id_col=id_col, epoch=int(epoch_id),
            )
    finally:
        survivors.unpersist()


def streaming_curate(
    spark: SparkSession,
    topic_path: str,
    fingerprint_store: str,
    output_path: str,
    checkpoint_dir: str,
    payload_cols: list[str] | None = None,
    gate: Column | None = None,
    seq_len: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    near_threshold: float | None = None,
):
    """Open the streaming curation pipeline over a topic and return the
    started StreamingQuery (availableNow trigger: drains everything the
    checkpoint has not seen, then stops — call again after more
    produces arrive; a Trigger.ProcessingTime deployment is the same
    writer without availableNow).

    ``payload_cols`` picks the document columns out of the consumer
    envelope (default: ``id_col, text_col, shard_col``)."""
    from pulsar_spark.streaming.subscribe import subscribe

    cols = payload_cols or [id_col, text_col, shard_col]
    stream = subscribe(
        spark, topic_path, max_files_per_trigger=max_files_per_trigger
    ).select(*cols)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            curate_batch(
                batch, epoch_id, fingerprint_store, output_path,
                gate=gate, seq_len=seq_len, shard_col=shard_col,
                id_col=id_col, text_col=text_col,
                near_threshold=near_threshold,
            )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
