"""Sequence packing planner for pretraining pipelines.

Training consumes fixed-length token sequences; corpora are
variable-length documents. "Packing" assigns documents to sequence
bins so concatenated shards fill the context window with minimal
padding. The planner here is the standard streaming-fill scheme:
within a shard, documents are laid out in a deterministic order and a
document belongs to the bin where its first token lands
(``floor(cum_tokens_before / seq_len)``) — documents may straddle a
bin boundary, exactly like GPT-style corpus packing with no padding.

Scale shape: the only wide operation is one window cumsum
PARTITIONED BY the shard column — shards pack independently and in
parallel, so there is no global sort and no single-task window. At
100 TB you pick a shard key with enough cardinality (source, or a
hash bucket of doc_id); each shard's docs are ordered by id, so the
plan is reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_spark.functions.text import token_count

__all__ = ["pack_sequences", "packing_stats", "materialize_packed_shards"]


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a (shard, bin_id) packing slot.

    Returns the input plus ``n_tokens``, ``start_token`` (offset of the
    doc's first token within its shard's concatenated stream) and
    ``bin_id`` (= floor(start_token / seq_len)).
    """
    w = Window.partitionBy(shard_col).orderBy(id_col)
    return (
        docs.withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn(
            "start_token",
            F.coalesce(
                F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn(
            "bin_id", F.floor(F.col("start_token") / F.lit(int(seq_len))).cast("bigint")
        )
    )


def packing_stats(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(shard, bin) packing summary: docs placed, tokens whose
    documents START in the bin, and the id range — the manifest a
    downstream tokenizer worker reads to materialize its sequences."""
    packed = pack_sequences(docs, seq_len, shard_col, id_col, text_col)
    return packed.groupBy(shard_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def materialize_packed_shards(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    separator: str = "\n",
) -> DataFrame:
    """Materialize the packing plan into trainer-ready shard blobs:
    one row per (shard, bin) holding the documents that START in that
    bin, concatenated in plan order with ``separator`` (the EOS-token
    analog) between documents.

    This is the step a tokenizer worker runs off the ``pack_sequences``
    manifest — here fused into one job. Shape: the plan's per-shard
    cumsum window, then one agg per (shard, bin) whose build side is
    ``sort_array(collect_list(struct(start, text)))`` — grouped
    arrays bounded by a bin's documents (~seq_len tokens), never a
    whole shard, so no task materializes unbounded state.
    """
    packed = pack_sequences(docs, seq_len, shard_col, id_col, text_col)
    return (
        packed.groupBy(shard_col, "bin_id")
        .agg(
            F.array_join(
                F.transform(
                    # id in the sort struct: zero-token docs share a
                    # start_token, and the plan's order for them is the
                    # id order — without it the tie would break on raw
                    # text bytes.
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "start_token",
                                F.col(id_col).alias("i"),
                                F.col(text_col).alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                separator,
            ).alias("shard_text"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )
