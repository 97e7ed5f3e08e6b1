"""Example-catalog conformance — the reference's canonical Function
examples re-expressed on the Spark SPI.

Reference: pulsar-functions/java-examples/src/main/java/org/apache/
pulsar/functions/api/examples/*.java (and python-examples/). Each entry
here matches one example's input->output contract; the runtime
mechanics (Context, counters, windows, side publish) come from
pulsar_spark.functions.runtime. Entries are column pipelines wherever
the example is expressible declaratively (all of them are — the
examples exist to demo the SPI, not to do heavy compute), so every one
rides whole-stage codegen with zero Python in the row path.

Catalog access: ``function_examples()`` returns {name: fn} where
``fn(df, ctx, **kw) -> DataFrame``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_spark.functions.runtime import FunctionContext

_EXAMPLES: dict[str, Callable] = {}


def _example(name: str):
    def deco(fn):
        _EXAMPLES[name] = fn
        return fn

    return deco


def function_examples() -> dict[str, Callable]:
    return dict(_EXAMPLES)


# ------------------------------------------------------------- map examples


@_example("exclamation")
def exclamation(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """ExclamationFunction.java / JavaNativeExclamationFunction.java:
    String -> input + '!'."""
    return df.withColumn("result", F.concat(F.col(input_col).cast("string"), F.lit("!")))


@_example("integer_addition")
def integer_addition(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """IntegerAdditionFunction.java: Integer -> input + 100."""
    return df.withColumn("result", (F.col(input_col) + 100).cast("int"))


@_example("config_based_append")
def config_based_append(
    df: DataFrame, ctx: FunctionContext | None = None, input_col: str = "val"
) -> DataFrame:
    """ConfigBasedAppendFunction.java: append userConfig['config-key'],
    falling back to '!' when unset."""
    suffix = (ctx.get_user_config_value("config-key") if ctx else None) or "!"
    return df.withColumn(
        "result", F.concat(F.col(input_col).cast("string"), F.lit(suffix))
    )


@_example("user_config")
def user_config(
    df: DataFrame, ctx: FunctionContext | None = None, input_col: str = "val"
) -> DataFrame:
    """UserConfigFunction.java: output IS userConfig['WhatToWrite']
    (input ignored), default 'Not a nice way'."""
    out = (
        ctx.get_user_config_value("WhatToWrite") if ctx else None
    ) or "Not a nice way"
    return df.withColumn("result", F.lit(out))


@_example("instance_id_appender")
def instance_id_appender(
    df: DataFrame, ctx=None, input_col: str = "val"
) -> DataFrame:
    """InstanceIdAppenderFunction.java: input + instanceId. The task
    partition id is the instance id analog (one function instance per
    parallel slot)."""
    return df.withColumn(
        "result", F.concat(F.col(input_col).cast("string"), F.spark_partition_id())
    )


@_example("logging")
def logging_fn(
    df: DataFrame, ctx: FunctionContext | None = None, input_col: str = "val"
) -> DataFrame:
    """LoggingFunction.java: log input + '-log', return input + '!'.
    The log line becomes a counter increment (observable side channel);
    the data path is the exclamation transform."""
    if ctx is not None:
        ctx.incr_counter("log_lines", df.count())
    return df.withColumn("result", F.concat(F.col(input_col).cast("string"), F.lit("!")))


@_example("user_metric")
def user_metric(
    df: DataFrame, ctx: FunctionContext | None = None, input_col: str = "val"
) -> DataFrame:
    """UserMetricFunction.java: recordMetric('LetterCount', len(input))
    per record, Void return -> no output messages (empty frame)."""
    if ctx is not None:
        total = df.select(
            F.sum(F.length(F.col(input_col).cast("string"))).alias("n")
        ).collect()[0]["n"]
        ctx.record_metric("LetterCount", int(total or 0))
    return df.where(F.lit(False))


@_example("void")
def void_fn(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """VoidFunction.java: Void return — consumes input, publishes
    nothing."""
    return df.where(F.lit(False))


@_example("record_function")
def record_function(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    topic_col: str = "topic",
) -> DataFrame:
    """RecordFunction.java: input + '!', destination topic from
    userConfig['publish-topic'] (default 'publishtopic'), properties
    carry the input topic under 'input_topic'."""
    publish_topic = (
        ctx.get_user_config_value("publish-topic") if ctx else None
    ) or "publishtopic"
    return df.select(
        F.concat(F.col(input_col).cast("string"), F.lit("!")).alias("result"),
        F.lit(publish_topic).alias("destination_topic"),
        F.col(topic_col).alias("prop_input_topic"),
    )


@_example("merge_topic")
def merge_topic(
    dfs: list[DataFrame] | DataFrame, ctx=None, payload_col: str = "val"
) -> DataFrame:
    """MergeTopicFunction.java: merge records from several topics into
    one output, stamping origin metadata as properties
    (__original_topic, __publish_time, __sequence_id,
    __producer_name); key and event_time pass through."""
    frames = dfs if isinstance(dfs, list) else [dfs]
    out = None
    for f in frames:
        part = f.select(
            F.col(payload_col).alias("value"),
            "key",
            "event_time",
            F.col("topic").alias("__original_topic"),
            # String.valueOf(msg.getPublishTime()) — epoch MILLIS string
            F.unix_millis(F.col("publish_time")).cast("string").alias("__publish_time"),
            F.col("sequence_id").cast("string").alias("__sequence_id"),
            F.col("producer_name").alias("__producer_name"),
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------- window examples


@_example("add_window")
def add_window(
    df: DataFrame, ctx=None, input_col: str = "val", window_size: int = 10
) -> DataFrame:
    """AddWindowFunction.java: sum of each count-window's integers
    (WindowConfig windowLengthCount analog; windows chunk per topic
    partition in offset order, the runtime's ordering guarantee)."""
    from pulsar_spark.operators.windows import tumbling_count_window

    return tumbling_count_window(
        df, window_size, [F.sum(input_col).cast("bigint").alias("result")]
    )


@_example("comma_window")
def comma_window(
    df: DataFrame, ctx=None, input_col: str = "val", window_size: int = 10
) -> DataFrame:
    """CommaWindowFunction.java: String.join(',', window contents) in
    arrival (offset) order — collect as (offset, value) structs, sort,
    then join; the sort is per-window, never global."""
    from pulsar_spark.operators.windows import tumbling_count_window

    return tumbling_count_window(
        df,
        window_size,
        [
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("offset"), F.col(input_col).cast("string").alias("_v"))
                        )
                    ),
                    lambda s: s.getField("_v"),
                ),
            ).alias("result")
        ],
    )


@_example("word_count")
def word_count(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """WordCountFunction.java: split on '.' (sic — the reference splits
    sentences) and increment a counter per word; the counter table IS
    the output here (counters are data on Spark, not hidden state)."""
    return (
        df.select(F.explode(F.split(F.col(input_col).cast("string"), r"\.")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "counter")
    )


@_example("publish")
def publish_fn(
    df: DataFrame, ctx: FunctionContext | None = None, input_col: str = "val"
) -> "tuple[DataFrame, object]":
    """PublishFunction.java: Void return, but input + '!' is published
    to userConfig['publish-topic'] (default 'publishtopic') as a side
    output. Returns (main_output_empty, SideOutputs) — call
    ``side.write_all(df, base)`` to materialize, the batch analog of
    newOutputMessage().sendAsync()."""
    from pulsar_spark.functions.runtime import SideOutputs

    topic = (
        ctx.get_user_config_value("publish-topic") if ctx else None
    ) or "publishtopic"
    side = SideOutputs()
    side.publish(topic, F.lit(True), None)
    transformed = df.withColumn(
        "result", F.concat(F.col(input_col).cast("string"), F.lit("!"))
    )
    return transformed.where(F.lit(False)), side


@_example("user_publish")
def user_publish(
    df: DataFrame, ctx: FunctionContext | None = None, input_col: str = "val"
) -> "tuple[DataFrame, object]":
    """UserPublishFunction.java: publish the raw input to
    userConfig['topic'] when configured; publish nothing otherwise."""
    from pulsar_spark.functions.runtime import SideOutputs

    side = SideOutputs()
    topic = ctx.get_user_config_value("topic") if ctx else None
    if topic:
        side.publish(topic, F.lit(True), None)
    return df.where(F.lit(False)), side


@_example("context_function")
def context_function(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    function_name: str = "fn",
) -> DataFrame:
    """ContextFunction.java: Void return; logs arrivals and bumps the
    per-function received-messages metric — observable through the
    Context counter table."""
    if ctx is not None:
        ctx.record_metric(f"function-{function_name}-messages-received", df.count())
    return df.where(F.lit(False))


@_example("auto_schema")
def auto_schema(
    df: DataFrame, ctx=None, value_field: str = "val"
) -> DataFrame:
    """AutoSchemaFunction.java: consume GenericRecord (schema-on-read
    struct), emit 'value-' + record.getField('value') — generic field
    access is just a column reference once the payload is typed."""
    return df.withColumn(
        "result", F.concat(F.lit("value-"), F.col(value_field).cast("string"))
    )


@_example("custom_object")
def custom_object(
    df: DataFrame, ctx=None, struct_col: str = "obj"
) -> DataFrame:
    """CustomObjectFunction.java: POJO -> POJO (value + 100). Typed
    objects are struct columns; the POJO transform is a struct rebuild."""
    return df.withColumn(
        struct_col,
        F.struct((F.col(f"{struct_col}.value") + 100).alias("value")),
    )


@_example("window_duration")
def window_duration(
    df: DataFrame,
    ctx=None,
    input_col: str = "val",
    length: str = "1 hour",
    time_col: str = "event_time",
) -> DataFrame:
    """WindowDurationFunction.java: join each DURATION window's contents
    with ',' (the reference appends wall-clock millis; here the window
    end is the deterministic equivalent of 'when this window fired')."""
    win = F.window(F.col(time_col), length)
    return (
        df.groupBy(win.alias("_w"))
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(time_col), F.col(input_col).cast("string").alias("_v"))
                        )
                    ),
                    lambda s: s.getField("_v"),
                ),
            ).alias("joined")
        )
        .select(
            F.col("_w.end").alias("window_end"),
            F.concat(
                F.col("joined"), F.lit(":"), F.unix_millis(F.col("_w.end")).cast("string")
            ).alias("result"),
        )
    )


@_example("thumbnailer")
def thumbnailer(df: DataFrame, ctx=None, media_col: str = "media_bytes") -> DataFrame:
    """python-examples/thumbnailer.py: decode image bytes, thumbnail to
    128x128, re-emit bytes. Runs on the multimodal plumbing — the
    decode/resize kernel is the documented stub (no image libs in this
    container); schema, batching, and partitioning are real."""
    from pulsar_spark.functions.multimodal import decode_media

    prepared = df.withColumnRenamed(media_col, "payload")
    if "modality" not in prepared.columns:
        prepared = prepared.withColumn("modality", F.lit("image"))
    if "media_id" not in prepared.columns:
        prepared = prepared.withColumn(
            "media_id", F.monotonically_increasing_id()
        )
    return decode_media(prepared)
