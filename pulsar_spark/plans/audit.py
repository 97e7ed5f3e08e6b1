"""Physical-plan audit helpers.

The reference has no query optimizer (SURVEY.md §4) — our engine leans
on Catalyst instead, and these helpers make Catalyst's choices
*checkable*: tests assert that a bucketed compaction runs with zero
exchanges, that scan predicates actually reached the parquet reader
(``PushedFilters``), that an IVF probe prunes index partitions at the
source (``PartitionFilters``), and that small dimensions broadcast.
``tools/plan_audit.py`` runs the same checks over every registered
query and writes the scorecard to ``PLANS.md``.

All helpers read the *executed* plan (post-AQE) when the DataFrame has
been materialized, falling back to the spark plan otherwise — AQE can
both remove exchanges (coalesce, broadcast conversion) and add them, so
the executed plan is the one that tells the truth about shuffles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string Spark will run (post-AQE final plan if
    the query has executed, the initial physical plan otherwise). The
    echo of the pre-AQE plan that AdaptiveSparkPlan appends under
    ``== Initial Plan ==`` is dropped so nodes aren't counted twice."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def formatted_plan(df: DataFrame) -> str:
    """`.explain("formatted")` as a string (nodes + detail sections)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def exchange_count(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges in the plan. Reused
    exchanges and AQE shuffle-read wrappers are not double-counted;
    broadcast exchanges are excluded (they are the *cheap* kind)."""
    n = 0
    for line in executed_plan(df).splitlines():
        stripped = line.strip(" :|+-*(0123456789)")
        if stripped.startswith("Exchange"):
            n += 1
    return n


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin") + executed_plan(df).count(
        "BroadcastNestedLoopJoin"
    )


def codegen_span_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans (the ``*(n)`` markers
    in the plan tree) — wider/fewer is better; 0 usually means an
    interpreted (UDF/RDD) plan. Materialize the DataFrame (collect)
    first so AQE's final plan is the one inspected."""
    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids.update(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def pushed_filters(df: DataFrame) -> list[str]:
    """The parquet-scan PushedFilters entries (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """The scan's PartitionFilters entries (directory pruning)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def assert_no_exchange(df: DataFrame, what: str = "plan") -> None:
    plan = executed_plan(df)
    if "Exchange" in plan.replace("ReusedExchange", "").replace("BroadcastExchange", ""):
        raise AssertionError(f"{what} must not shuffle; got:\n{plan}")


def plan_summary(df: DataFrame) -> dict:
    """One-line audit record for a query: shuffle/broadcast/codegen
    counts plus whether any scan predicate or partition filter pushed
    down. Used by tools/plan_audit.py for PLANS.md."""
    plan = executed_plan(df)
    return {
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "codegen_spans": codegen_span_count(df),
        "pushed_filters": len(pushed_filters(df)),
        "partition_filters": len(partition_filters(df)),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("BatchEvalPython"),
        "rows_sorted": "Sort " in plan,
    }
