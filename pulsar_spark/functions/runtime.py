"""Functions layer — the reference's serverless compute SPI on Spark.

Reference semantics (SURVEY.md §2.8, §3.3): a Function is user code
``O process(I input, Context ctx)`` (fn/api-java/.../api/Function.java:34)
run per record between an input topic and an output topic; a
WindowFunction processes a Collection per window
(fn/api-java/.../api/WindowFunction.java:32). Context gives user
config, stateful counters, metrics, and mid-stream publish to arbitrary
topics (fn/api-java/.../api/Context.java:97-156, BaseContext.java:115-187).
flatMap-style output = publish several + return null
(fn/java-examples/.../PublishFunction.java); IdentityFunction is
pass-through routing.

Spark-first: a function becomes a *column pipeline* when expressible as
built-in expressions (the fast path — users pass a Column-builder), or
an Arrow-batched ``mapInPandas`` when it is arbitrary Python (the
reference's Python runner python_instance.py:74 is row-at-a-time; ours
is vectorized). Counters are Spark accumulators (batch) or a state
table (streaming); side publish collects into a buffered side-output
written per batch — exactly-once only within foreachBatch, as the
reference's EFFECTIVELY_ONCE demands sequence-id dedup too.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _DictSumParam:
    """AccumulatorParam merging {key: amount} dicts by summing values."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a


class FunctionContext:
    """Context analog: user config, counters, metrics.

    Counters live in ONE dict-merging Spark accumulator created
    driver-side at construction — ``incr_counter`` is callable from
    executor code (inside mapInPandas) where no SparkContext exists,
    exactly like the reference's Context.incrCounter inside process().
    """

    def __init__(self, user_config: dict[str, Any] | None = None):
        self.user_config = user_config or {}
        self.initialized = False
        self._metrics: dict[str, float] = {}
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        self._acc = (
            active.sparkContext.accumulator({}, _DictSumParam()) if active else None
        )

    def initialize(self) -> None:
        """Function.initialize(context) analog (api/Function.java:41 —
        setup before the first record; examples/InitializableFunction
        .java gates process() on it)."""
        self.initialized = True

    def close(self) -> None:
        """Function.close() analog — teardown after the last record."""
        self.initialized = False

    def get_user_config_value(self, key: str, default: Any = None) -> Any:
        return self.user_config.get(key, default)

    def incr_counter(self, key: str, amount: int = 1) -> None:
        if self._acc is not None:
            self._acc.add({key: amount})

    def get_counter(self, key: str) -> int:
        return self._acc.value.get(key, 0) if self._acc is not None else 0

    def record_metric(self, key: str, value: float) -> None:
        """Context.recordMetric analog: an OBSERVATION, not a running
        total — the reference feeds a summary gauge, so repeated calls
        replace rather than add (summing epoch-millis observations, for
        example, would be nonsense). Counters (incr_counter) are the
        additive channel."""
        self._metrics[key] = value

    def get_metric(self, key: str) -> float:
        return self._metrics.get(key, 0)


def identity_function(df: DataFrame) -> DataFrame:
    """IdentityFunction — routing-only pass-through
    (fn/api-java/.../utils/IdentityFunction.java)."""
    return df.select("*")


def map_function(
    df: DataFrame,
    fn: Callable[..., Column] | Callable[[Any, FunctionContext], Any],
    input_col: str = "val",
    output_col: str = "result",
    context: FunctionContext | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Apply a map Function over the payload column.

    - ``vectorized=True`` (fast path): ``fn`` takes a Column (and
      optionally the context) and returns a Column — stays JVM-side.
    - ``vectorized=False``: ``fn(value, context)`` per record, the
      literal Function SPI signature, executed via mapInPandas with
      Arrow batches (still ~10-100x faster than row-at-a-time).
    """
    ctx = context or FunctionContext()
    if vectorized:
        try:
            col = fn(F.col(input_col), ctx)
        except TypeError:
            col = fn(F.col(input_col))
        return df.withColumn(output_col, col)

    from pyspark.sql.types import StringType, StructField, StructType

    # build a fresh StructType — StructType.add mutates the DataFrame's
    # cached schema object in place
    schema = StructType(list(df.schema.fields) + [StructField(output_col, StringType())])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf[output_col] = [fn(v, ctx) for v in pdf[input_col]]
            yield pdf

    return df.mapInPandas(run, schema)


def flatmap_function(
    df: DataFrame,
    fn: Callable[..., Column],
    input_col: str = "val",
    output_col: str = "result",
) -> DataFrame:
    """flatMap Function: ``fn`` returns an array Column; each element
    becomes an output record (the publish-N-and-return-null pattern as
    a declarative explode)."""
    return df.withColumn(output_col, F.explode(fn(F.col(input_col))))


def window_function(
    df: DataFrame,
    agg_fn: Callable[[Column], list[Column]],
    length: str,
    slide: str | None = None,
    time_col: str = "event_time",
    input_col: str = "val",
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """WindowFunction over duration windows: ``agg_fn`` maps the
    collected input column to aggregate Columns (the Window.get()
    analog is `collect_list` if the user needs raw contents)."""
    from pulsar_spark.operators.windows import sliding_window

    return sliding_window(
        df, length, slide or length, agg_fn(F.col(input_col)), time_col, extra_group_cols
    )


@dataclass
class SideOutputs:
    """Context.newOutputMessage(topic, ...) analog for batch pipelines:
    each named side output is a filter+projection over the input,
    written alongside the main output in one pass (Spark computes the
    scan once per sink; wrap in foreachBatch for streaming)."""

    routes: dict[str, tuple[Column, list[str]]] = field(default_factory=dict)

    def publish(self, topic: str, predicate: Column, columns: list[str] | None = None) -> None:
        self.routes[topic] = (predicate, columns or [])

    def write_all(self, df: DataFrame, base_path: str) -> dict[str, int]:
        written = {}
        for topic, (pred, cols) in self.routes.items():
            out = df.where(pred)
            if cols:
                out = out.select(*cols)
            out.write.mode("overwrite").parquet(f"{base_path}/{topic}")
            written[topic] = out.count()
        return written
