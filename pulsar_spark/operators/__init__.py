from pulsar_spark.operators.compaction import (
    compact_topic_storage,
    read_compacted,
    compaction_due,
    compact_publish_order,
    compact_event_time_order,
    compact_strategic,
)
from pulsar_spark.operators.dedup import dedup_messages
from pulsar_spark.operators.retention import ttl_filter, visible_messages, user_visible, retention_plan, backlog_quota_evict, apply_delivery_delay_policy
from pulsar_spark.operators.replication import replicate_candidates, shadow_view
from pulsar_spark.operators.seek import (
    seek_offsets_by_timestamp,
    peek_messages,
    backlog,
    skip_cursor,
    get_message_by_id,
    examine_message,
    ack_state,
)
from pulsar_spark.operators.stats import topic_stats, partitioned_topic_stats, subscription_stats, key_skew_stats
from pulsar_spark.operators.subscriptions import (
    batch_receive,
    sticky_key_hash,
    key_shared_assignment,
    key_shared_assignment_auto_split,
    consistent_hash_ring,
    consistent_hash_assignment,
    hash_range_auto_split,
    ack_timeout_redelivery,
    dlq_split,
    retry_schedule,
)
from pulsar_spark.operators.tableview import table_view
from pulsar_spark.operators.windows import tumbling_window, sliding_window

__all__ = [
    "compact_publish_order",
    "compact_event_time_order",
    "compact_strategic",
    "compact_topic_storage",
    "read_compacted",
    "compaction_due",
    "dedup_messages",
    "ttl_filter",
    "retention_plan",
    "backlog_quota_evict",
    "apply_delivery_delay_policy",
    "visible_messages",
    "user_visible",
    "seek_offsets_by_timestamp",
    "peek_messages",
    "backlog",
    "skip_cursor",
    "get_message_by_id",
    "examine_message",
    "ack_state",
    "replicate_candidates",
    "shadow_view",
    "topic_stats",
    "partitioned_topic_stats",
    "subscription_stats",
    "key_skew_stats",
    "sticky_key_hash",
    "key_shared_assignment",
    "key_shared_assignment_auto_split",
    "consistent_hash_ring",
    "consistent_hash_assignment",
    "hash_range_auto_split",
    "batch_receive",
    "ack_timeout_redelivery",
    "dlq_split",
    "retry_schedule",
    "table_view",
    "tumbling_window",
    "sliding_window",
]
