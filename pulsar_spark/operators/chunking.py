"""Message chunking: split oversized payloads, reassemble on read.

Reference: producers split messages larger than the broker frame limit
into sequentially numbered chunks (ProducerImpl.java:633, :793
`canAddToBatch`/chunk path), and consumers buffer + reassemble them by
(producer, uuid, chunk_id) before delivery (ConsumerImpl.java:1466-1663
chunk reassembly). Spark has no row-size cap that forces chunking
(SURVEY.md §2.9), but the operator pair is still useful as a parity
surface and for interop with chunk-encoded logs.

Scale shape: ``split_into_chunks`` is a narrow generator (explode) —
no shuffle; ``assemble_chunks`` is one hash aggregation on the message
id (map-side partial ``collect_list`` per chunk group), the same
shuffle any keyed fold pays. Chunk order is restored by sorting the
collected (chunk_id, chunk) structs INSIDE the aggregated row —
``array_sort`` on a few KB per message — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_into_chunks", "assemble_chunks"]


def split_into_chunks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    chunk_size: int = 4096,
) -> DataFrame:
    """Explode each row's payload into ``chunk_size``-unit chunks.

    Output: one row per chunk with ``(id_col, num_chunks, chunk_id,
    chunk)`` — the `uuid`/`num_chunks_from_msg`/`chunk_id` metadata
    triple of PulsarApi.proto:161-163. ``chunk_id`` is 0-based.
    """
    cs = int(chunk_size)
    nc = F.ceil(F.length(payload_col) / F.lit(cs)).cast("int")
    chunks = F.expr(
        f"transform(sequence(0, num_chunks - 1),"
        f" i -> substring({payload_col}, i * {cs} + 1, {cs}))"
    )
    return (
        df.withColumn("num_chunks", nc)
        .where(F.col("num_chunks") > 0)
        .select(id_col, "num_chunks", F.posexplode(chunks).alias("chunk_id", "chunk"))
    )


def assemble_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    chunk_col: str = "chunk",
    payload_alias: str = "payload",
) -> DataFrame:
    """Reassemble chunk rows into whole payloads (ConsumerImpl analog).

    Tolerates arbitrary chunk-row order/partitioning: collects
    ``(chunk_id, chunk)`` per id, sorts within the row, concatenates.
    Returns ``(id_col, payload, n_chunks)``.
    """
    ordered = F.array_sort(F.collect_list(F.struct(F.col("chunk_id"), F.col(chunk_col))))
    return df.groupBy(id_col).agg(
        F.array_join(
            F.transform(ordered, lambda x: x[chunk_col]), ""
        ).alias(payload_alias),
        F.count("*").cast("int").alias("n_chunks"),
    )
