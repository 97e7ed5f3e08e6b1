"""Local Spark-vs-DuckDB parity harness.

Mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): run the
`__spark_entry__.queries()` entry and its `oracle_sql()` side by side
at sf0.001 and compare sorted frames. Covers the query keys that have
no dedicated semantic test elsewhere in the suite, plus the sampling /
chunking / dup-span additions.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_DIR

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# keys checked here because nothing else in tests/ exercises them
KEYS = [
    # round-11 displacement (driver-green r10) + new-query preemptive
    "policy_enforcement",
    "dedup_chain_clusters",
    # round-10 displacements (driver-green r9) + new-query preemptives
    "doc_rag_chunks",
    "embedding_kmeans",
    "doc_bpe_merges",
    "doc_bpe_encode",
    "doc_temperature_mix",
    "embedding_pq",
    "scalable_ack_holes",
    "crypto_failure_actions",
    "doc_langid_trained",
    # round-9 additions (preemptive: keep green when rotated out)
    "scalable_txn_visibility",
    "policy_offload",
    # round-7 additions (preemptive: keep green when rotated out)
    "segment_subscription_lifecycle",
    "media_phash_near_dups",
    "window_count_watermark",
    "doc_contamination_bloom",
    "media_audio_fingerprint",
    "doc_url_dedup",
    "doc_remove_repeated_lines",
    "geo_replication_stream",
    # structural-gap backfill (test_meta_freshness found these
    # driver-checked queries had no local parity regression)
    "doc_bm25",
    "embedding_semantic_dedup",
    "media_decode_real",
    "txn_visibility",
    "media_byte_stats",
    "ack_state",
    "geo_replication",
    "dedup_clusters",
    "dedup_keep_one",
    "peek",
    "doc_fingerprint",
    "doc_quality",
    "doc_token_stats",
    "doc_langid",
    "doc_bpe_tokens",
    "doc_rolling_fingerprint",
    "embedding_knn_all",
    # round-6 additions (preemptive: keep green when rotated out)
    "corpus_report",
    "doc_classifier_pr",
    "subscription_lifecycle",
    "media_decode_progressive",
    "doc_classifier_calibration",
    "doc_remove_dup_spans",
    "doc_mixture_schedule",
    "table_view",
    "ttl_expiry",
    "delayed_visibility",
    # round-5 additions: unit tests cover semantics but only this
    # harness regresses their DuckDB oracle twins locally
    "doc_bpe_encode",
    "doc_temperature_mix",
    "embedding_pq",
    "embedding_pq_knn",
    "doc_gopher_rules",
    "pretraining_pipeline_v4",
    "doc_shuffle_shards",
    "dlq",
    "topic_stats",
    "partition_stats",
    "compact_event_time",
    "backlog_quota",
    "key_shared_consistent",
    "doc_pack_materialize",
    "scalable_split_stats",
    "seek_by_timestamp",
    "delivery_delay_fixed",
    "backlog",
    "doc_perplexity",
    "key_shared_bucket_stats",
    "compaction_trigger",
    "pretraining_pipeline_v3",
    "doc_hash_sample",
    "doc_domain_mix",
    "doc_dup_spans",
    "chunk_reassembly",
    "wordcount",
    "multi_topic_union",
    "scheduled_messages",
    "compact_strategic",
    "schema_json_decode",
    "schema_kv_decode",
    "user_visible",
    "last_message_id",
    "ack_timeout_redelivery",
    "embedding_dedup_keep_one",
    "doc_pii_scrub",
    "doc_pack_sequences",
    "doc_embedding_join",
    "doc_contamination",
    "batch_receive",
    "embedding_cosine_near_dups",
    "key_skew",
    "retention_budget",
    "skip_messages",
    "subscription_stats",
    "tiered_storage",
    "schema_auto_consume",
    "training_set_select",
    "training_set_select_scalable",
    "txn_pending_acks",
    "fn_merge_topic",
    "crypto_roundtrip",
    "embedding_quantize_error",
    "doc_repetition",
    "pretraining_pipeline",
    "pretraining_pipeline_v2",
    "doc_chunk_dedup",
    "doc_source_cap",
    "priority_shared",
    "dispatch_throttle",
    "failover_partitions",
    "fn_consistently_failing",
    "fn_custom_serde",
    "fn_pojo_hierarchy",
    "fn_cursor_management",
    # round-4 additions + rotated out of the prefix in round 4
    "scalable_multi_topic_stats",
    "processing_timeout",
    "examine_message",
    "ngram_jaccard_dedup",
    "message_by_id",
    # rotated out of the driver's 50-entry prefix in round 4
    # (driver-green r03) — kept value-checked here
    "schema_avro_decode",
    "schema_protobuf_decode",
    "retry_schedule_backoff",
    "compact_publish_order",
    "dedup",
    "key_shared",
    "key_shared_auto_split",
    "fn_exclamation",
    "fn_integer_addition",
    "fn_comma_window",
    # rotated out of the driver's 50-entry prefix in round 3
    # (driver-green r01+r02) — kept value-checked here
    "retry_schedule",
    "schema_primitive_roundtrip",
    "window_tumbling_1h",
    "window_sliding_1h_15m",
    "window_count_100",
    "pricing_summary",
    "top_orders",
    "region_revenue",
    "doc_exact_dedup",
    "embedding_knn",
    # round-5 additions (also in the round-5 driver prefix; kept here so
    # future rotations can't orphan them)
    "segment_load_rates",
    "consumer_assignment",
    "consumer_assignment_steps",
    "media_decode_png",
    "media_decode_jpeg",
    "embedding_kmeans",
    "segment_gc",
    "stream_cumulative_ack",
    "doc_rag_chunks",
    "doc_quality_classifier",
    "doc_dsir_select",
    "doc_bpe_merges",
]


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("key", KEYS)
def test_query_matches_oracle(spark, entry, oracle, key):
    qs, osql = entry.queries(), entry.oracle_sql()
    got = _norm(qs[key](spark, SF_DIR).toPandas())
    want = _norm(oracle.sql(osql[key]).df())
    assert got.shape == want.shape, f"{key}: {got.shape} != {want.shape}"
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(
                a.astype(float), b.astype(float), atol=1e-9, equal_nan=True
            ), f"{key}.{c}"
        elif a.dtype.kind == "M" or b.dtype.kind == "M":
            # NaT == NaT is False; compare the null masks, then values
            a2, b2 = a.astype("datetime64[us]"), b.astype("datetime64[us]")
            assert (a2.isna() == b2.isna()).all(), f"{key}.{c} null mask"
            m = ~a2.isna()
            assert (a2[m] == b2[m]).all(), f"{key}.{c}"
        else:
            assert (a.astype(str) == b.astype(str)).all(), f"{key}.{c}"
