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

import pandas as pd
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
            F.unix_millis(F.col("publish_time").cast("timestamp")).cast("string").alias("__publish_time"),
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
                F.col("joined"), F.lit(":"), F.unix_millis(F.col("_w.end").cast("timestamp")).cast("string")
            ).alias("result"),
        )
    )


@_example("consistently_failing")
def consistently_failing(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """ConsistentlyFailingFunction.java: input == 'FAIL' throws, else
    'SUCCESS'. A thrown record in the reference is nacked and
    redelivered; on Spark the failure is DATA — rows carry either
    ``result`` or ``error``, and the error side feeds the existing
    nack/retry/DLQ operators (subscriptions.retry_schedule consumes
    ``error is not null``). A NULL input also fails (the reference
    NPEs on input.equals — same redelivery path), so every row lands
    on exactly one side."""
    v = F.col(input_col).cast("string")
    is_fail = v.isNull() | (v == "FAIL")
    return df.select(
        "*",
        F.when(~is_fail, F.lit("SUCCESS")).alias("result"),
        F.when(is_fail, F.lit("Failed")).alias("error"),
    )


@_example("user_exception")
def user_exception(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """UserExceptionFunction.java: every record throws 'This wont work'
    — no successful output, every input routed to the error side."""
    return df.select(
        "*",
        F.lit(None).cast("string").alias("result"),
        F.lit("This wont work").alias("error"),
    )


@_example("user_exception_window")
def user_exception_window(
    df: DataFrame, ctx=None, input_col: str = "val", window_size: int = 10
) -> DataFrame:
    """window/UserExceptionWindowFunction.java: the whole WINDOW fails —
    one error row per window (redelivery is window-granular)."""
    from pulsar_spark.operators.windows import tumbling_count_window

    return tumbling_count_window(
        df, window_size, [F.count("*").alias("n_records")]
    ).select("*", F.lit("This wont work").alias("error"))


@_example("host_appender")
def host_appender(df: DataFrame, ctx=None, input_col: str = "val") -> DataFrame:
    """HostAppenderFunction.java: input + InetAddress.getLocalHost()
    .getHostName(). The hostname must be the EXECUTOR's (that's the
    example's point — observing where the instance runs), so it is read
    inside an Arrow-batched UDF, once per batch, not on the driver."""

    @F.pandas_udf("string")
    def _host(s: pd.Series) -> pd.Series:
        import socket

        return s.astype("string") + socket.gethostname()

    return df.withColumn("result", _host(F.col(input_col).cast("string")))


@_example("typed_message_builder_publish")
def typed_message_builder_publish(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    topic_col: str = "topic",
) -> "tuple[DataFrame, object]":
    """TypedMessageBuilderPublish.java: Void main output; side-publishes
    input + '!' to userConfig['publish-topic'] (default 'publishtopic')
    carrying the key, an 'input_topic' property, the record's existing
    properties, and a fresh eventTime. The typed builder's fields map to
    envelope columns on the published frame."""
    from pulsar_spark.functions.runtime import SideOutputs

    topic = (
        ctx.get_user_config_value("publish-topic") if ctx else None
    ) or "publishtopic"
    props = F.lit(None).cast("map<string,string>")
    if "properties" in df.columns:
        props = F.col("properties")
    props = F.coalesce(props, F.create_map().cast("map<string,string>"))
    # Java order: properties.put("input_topic", topic) THEN
    # putAll(record.getProperties()) — a record's own 'input_topic'
    # property overwrites the stamped one. map_concat would throw
    # DUPLICATED_MAP_KEY on that collision (Spark's default dedup
    # policy), so only stamp the key when the record doesn't carry it.
    merged = F.when(F.map_contains_key(props, "input_topic"), props).otherwise(
        F.map_concat(
            F.create_map(F.lit("input_topic"), F.col(topic_col).cast("string")), props
        )
    )
    out = df.select(
        F.concat(F.col(input_col).cast("string"), F.lit("!")).alias("result"),
        *([F.col("key")] if "key" in df.columns else [F.lit(None).cast("string").alias("key")]),
        merged.alias("properties"),
        F.current_timestamp().alias("event_time"),
    )
    side = SideOutputs()
    side.publish(topic, F.lit(True), None)
    return df.where(F.lit(False)), (out, side)


@_example("initializable")
def initializable(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    topic_col: str = "topic",
):
    """InitializableFunction.java: process() throws unless initialize()
    ran; close() tears down. The lifecycle bit lives on the Context —
    call ``ctx.initialize()`` first or get the reference's 'function not
    initialized' error."""
    if ctx is None or not getattr(ctx, "initialized", False):
        raise RuntimeError("function not initialized")
    return typed_message_builder_publish(df, ctx, input_col, topic_col)


@_example("async_context")
def async_context(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    function_name: str = "fn",
) -> DataFrame:
    """AsyncContextFunction.java: sleep-then-log off-thread, bump the
    messages-received metric, complete with null. Asynchrony is the
    execution model on Spark (tasks already overlap); the observable
    contract — metric bump, no output — is what's kept."""
    if ctx is not None:
        ctx.record_metric(f"function-{function_name}-messages-received", df.count())
    return df.where(F.lit(False))


@_example("cursor_management")
def cursor_management(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    topic_col: str = "topic",
    reset_to_millis: int = 1578188166,
) -> DataFrame:
    """CursorManagementFunction.java: resetCursor(topic, subscription,
    ts) through the admin client, answer 'reset cursor successfully'.
    The admin action is emitted as DATA — one (topic, subscription,
    reset_to, result) row per input topic; feeding it to
    operators.seek.reset_cursor applies the actual cursor move."""
    sub = "public/default/" + (
        (ctx.get_user_config_value("function-name") if ctx else None) or "fn"
    )
    return (
        df.select(F.col(topic_col).cast("string").alias("topic"))
        .distinct()
        .select(
            "topic",
            F.lit(sub).alias("subscription"),
            F.timestamp_millis(F.lit(reset_to_millis)).alias("reset_to"),
            F.lit("reset cursor successfully").alias("result"),
        )
    )


@_example("avro_schema_test")
def avro_schema_test(df: DataFrame, ctx=None, payload_col: str = "payload") -> DataFrame:
    """AvroSchemaTestFunction.java: AvroTestObject(baseValue int,
    objectValue string) in, baseValue += 10, AvroTestObject out — a full
    Avro wire round-trip through the engine's binary codec
    (pojo/AvroTestObject.java)."""
    from pulsar_spark.schema_codecs import avro_decode, avro_encode, struct_to_avro_schema
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    st = StructType(
        [
            StructField("baseValue", IntegerType(), True),
            StructField("objectValue", StringType(), True),
        ]
    )
    schema = struct_to_avro_schema(st, name="AvroTestObject")
    decoded = avro_decode(df, schema, payload_col=payload_col)
    bumped = decoded.withColumn("baseValue", (F.col("baseValue") + 10).cast("int"))
    return avro_encode(
        bumped, ["baseValue", "objectValue"], payload_col=payload_col,
        record_name="AvroTestObject",
    )


@_example("custom_base_to_base")
def custom_base_to_base(df: DataFrame, ctx=None, struct_col: str = "obj") -> DataFrame:
    """CustomBaseToBaseFunction.java: CustomBaseObject(baseValue + 100)."""
    return df.withColumn(
        struct_col,
        F.struct((F.col(f"{struct_col}.baseValue") + 100).alias("baseValue")),
    )


@_example("custom_base_to_derived")
def custom_base_to_derived(df: DataFrame, ctx=None, struct_col: str = "obj") -> DataFrame:
    """CustomBaseToDerivedFunction.java: CustomDerivedObject(
    baseValue + 100, (int) baseValue + 50) — the subtype gains a field,
    which on Spark is a wider struct."""
    return df.withColumn(
        struct_col,
        F.struct(
            (F.col(f"{struct_col}.baseValue") + 100).alias("baseValue"),
            (F.col(f"{struct_col}.baseValue") + 50).cast("int").alias("derivedValue"),
        ),
    )


@_example("custom_derived_to_base")
def custom_derived_to_base(df: DataFrame, ctx=None, struct_col: str = "obj") -> DataFrame:
    """CustomDerivedToBaseFunction.java: CustomBaseObject(baseValue +
    101) — upcast narrows the struct (derivedValue dropped)."""
    return df.withColumn(
        struct_col,
        F.struct((F.col(f"{struct_col}.baseValue") + 101).alias("baseValue")),
    )


@_example("custom_derived_to_derived")
def custom_derived_to_derived(df: DataFrame, ctx=None, struct_col: str = "obj") -> DataFrame:
    """CustomDerivedToDerivedFunction.java: CustomDerivedObject(
    baseValue + 101, derivedValue + 150)."""
    return df.withColumn(
        struct_col,
        F.struct(
            (F.col(f"{struct_col}.baseValue") + 101).alias("baseValue"),
            (F.col(f"{struct_col}.derivedValue") + 150).cast("int").alias("derivedValue"),
        ),
    )


_I64_MAX = 9223372036854775807


def _u64() -> "F.Column":
    # 2^64 exceeds a JVM long literal, so it crosses py4j as a decimal
    # string (and must build lazily — literals need a live session).
    return F.lit("18446744073709551616").cast("decimal(21,0)")


def custom_object_serialize(value: "F.Column") -> "F.Column":
    """serde/CustomObjectSerde.java serialize(): the long value as 8
    big-endian bytes (ByteBuffer.putLong). hex() prints the two's-
    complement big-endian digits; lpad to 16 nibbles = 8 bytes."""
    return F.to_binary(F.lpad(F.hex(value.cast("bigint")), 16, "0"), F.lit("hex"))


def custom_object_deserialize(payload: "F.Column") -> "F.Column":
    """serde/CustomObjectSerde.java deserialize(): ByteBuffer.getLong —
    8 big-endian bytes back to a signed long. conv() reads the digits
    as UNSIGNED 64-bit, so re-wrap values past int64 max into the
    negative range (two's complement)."""
    u = F.conv(F.hex(payload), 16, 10).cast("decimal(20,0)")
    return (
        F.when(u > _I64_MAX, (u - _u64()).cast("bigint")).otherwise(u.cast("bigint"))
    )


@_example("custom_object_serde")
def custom_object_serde(df: DataFrame, ctx=None, struct_col: str = "obj") -> DataFrame:
    """ByteBufferSerDe.java + serde/CustomObjectSerde.java:
    CustomObject{value long} round-trips through an 8-byte big-endian
    payload, then the CustomObjectFunction transform (value + 100)
    applies on the deserialized side — the SPI's custom-SerDe consume
    path, all JVM-side expressions."""
    encoded = df.withColumn("payload", custom_object_serialize(F.col(f"{struct_col}.value")))
    return encoded.withColumn(
        struct_col,
        F.struct((custom_object_deserialize(F.col("payload")) + 100).alias("value")),
    ).drop("payload")


@_example("context_window")
def context_window(
    df: DataFrame, ctx=None, input_col: str = "val", window_size: int = 10
) -> DataFrame:
    """window/ContextWindowFunction.java: sum of each window's integers
    (same fold as add_window; registered under the window-package name
    for 1:1 catalog parity)."""
    return add_window(df, ctx, input_col, window_size)


@_example("logging_window")
def logging_window(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    window_size: int = 10,
) -> DataFrame:
    """window/LoggingWindowFunction.java: log each record + '-window-log',
    Void output. Log volume lands on a counter; no data output."""
    if ctx is not None:
        ctx.incr_counter("window_log_lines", df.count())
    return df.where(F.lit(False))


@_example("user_config_window")
def user_config_window(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    window_size: int = 10,
) -> DataFrame:
    """window/UserConfigWindowFunction.java: one output per window —
    userConfig['WhatToWrite'] (default 'Not a nice way'), input
    ignored."""
    from pulsar_spark.operators.windows import tumbling_count_window

    out = (
        ctx.get_user_config_value("WhatToWrite") if ctx else None
    ) or "Not a nice way"
    return tumbling_count_window(df, window_size, [F.count("*").alias("_n")]).select(
        "partition", "window_seq", F.lit(out).alias("result")
    )


@_example("user_metric_window")
def user_metric_window(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    time_col: str = "event_time",
    window_size: int = 10,
) -> DataFrame:
    """window/UserMetricWindowFunction.java: recordMetric(
    'MessageEventTime', eventTime) per record that has one; Void
    output. The metric keeps the LAST recorded value, matching the
    reference's overwrite-style recordMetric."""
    if ctx is not None:
        last = (
            df.where(F.col(time_col).isNotNull())
            .select(F.max(F.unix_millis(F.col(time_col).cast("timestamp"))).alias("t"))
            .collect()[0]["t"]
        )
        if last is not None:
            ctx.record_metric("MessageEventTime", float(last))
    return df.where(F.lit(False))


@_example("publish_window")
def publish_window(
    df: DataFrame,
    ctx: FunctionContext | None = None,
    input_col: str = "val",
    window_size: int = 10,
) -> "tuple[DataFrame, object]":
    """window/PublishWindowFunction.java: per window, publish
    '<window contents>!' to userConfig['publish-topic'] (default
    'publishtopic'); Void main output."""
    from pulsar_spark.functions.runtime import SideOutputs
    from pulsar_spark.operators.windows import tumbling_count_window

    topic = (
        ctx.get_user_config_value("publish-topic") if ctx else None
    ) or "publishtopic"
    windows = tumbling_count_window(
        df,
        window_size,
        [
            F.concat(
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
                ),
                F.lit("!"),
            ).alias("result")
        ],
    )
    side = SideOutputs()
    side.publish(topic, F.lit(True), None)
    return df.where(F.lit(False)), (windows, side)


@_example("word_count_window")
def word_count_window(
    df: DataFrame, ctx=None, input_col: str = "val", window_size: int = 10
) -> DataFrame:
    """window/WordCountWindowFunction.java: split each window record on
    '.', incrCounter(word) — the counter table is the output, counted
    over the whole frame (counters are global across windows in the
    reference too)."""
    return word_count(df, ctx, input_col)


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
