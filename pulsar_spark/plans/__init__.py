from pulsar_spark.plans.audit import (
    assert_no_exchange,
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    executed_plan,
    formatted_plan,
    partition_filters,
    plan_summary,
    pushed_filters,
)

__all__ = [
    "assert_no_exchange",
    "broadcast_join_count",
    "codegen_span_count",
    "exchange_count",
    "executed_plan",
    "formatted_plan",
    "partition_filters",
    "plan_summary",
    "pushed_filters",
]
