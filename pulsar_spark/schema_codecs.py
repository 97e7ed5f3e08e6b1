"""AVRO and PROTOBUF payload codecs for the schema layer.

Reference semantics: Pulsar's most-used typed schemas are Avro
(pulsar-client-api/.../api/Schema.java:346, SchemaType.java:61) and
Protobuf (Schema.java:303, SchemaType.java:56 PROTOBUF /
SchemaType.java:145 PROTOBUF_NATIVE). A producer serializes a typed
record to the payload bytes; a consumer decodes schema-on-read with the
registered (versioned) schema. SchemaTest.java's encode/decode
round-trips are the conformance spec.

Spark mapping: the natural wiring would be ``from_avro``/``to_avro``
(and ``from_protobuf`` on Spark 3.4+), but those live in the external
``spark-avro`` / ``spark-protobuf`` modules which are NOT on this
container's classpath — so the codecs here are self-contained
implementations of the PUBLIC wire formats (Avro 1.x binary encoding
spec; protobuf wire format: varint/zigzag/length-delimited), run as
Arrow-batched pandas UDFs. Per-row Python work is confined to the
serialize/deserialize boundary exactly like the JVM codec would be;
everything around it (projection, filters, aggregation) stays JVM-side.
When the spark-avro jar IS present, swap ``avro_decode``'s body for
``from_avro`` — the schema model and registry integration stay the same.

Schema registry integration: :func:`register_avro` converts the Avro
record schema to a StructType and reuses the existing
BACKWARD/FORWARD/FULL rules in ``schema_registry.SchemaRegistry`` —
mirroring how the reference applies one SchemaCompatibilityStrategy
across schema types (SchemaCompatibilityStrategy.java:34-71).
"""

from __future__ import annotations

import json
import struct as _struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ------------------------------------------------------------- Avro schema

_PRIMITIVE_TO_SPARK: dict[str, DataType] = {
    "null": StringType(),  # placeholder; bare null only appears in unions
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}

_SPARK_TO_PRIMITIVE = {
    "boolean": "boolean",
    "int": "int",
    "integer": "int",
    "smallint": "int",
    "tinyint": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def struct_to_avro_schema(st: StructType, name: str = "Record") -> dict:
    """StructType -> Avro record schema (nullable fields become
    ``["null", T]`` unions, Avro's idiom for optional)."""

    def conv(dt: DataType, nullable: bool, field_name: str):
        s = dt.simpleString()
        if isinstance(dt, StructType):
            t = struct_to_avro_schema(dt, name=field_name.capitalize())
        elif isinstance(dt, ArrayType):
            t = {"type": "array", "items": conv(dt.elementType, False, field_name)}
        elif isinstance(dt, MapType):
            t = {"type": "map", "values": conv(dt.valueType, False, field_name)}
        elif s in _SPARK_TO_PRIMITIVE:
            t = _SPARK_TO_PRIMITIVE[s]
        elif s == "timestamp":
            # SchemaType.TIMESTAMP / INSTANT (SchemaType.java:115, :125)
            t = {"type": "long", "logicalType": "timestamp-micros"}
        elif s == "date":
            t = {"type": "int", "logicalType": "date"}
        elif s.startswith("decimal("):
            # Avro decimal logical type: two's-complement big-endian
            # unscaled integer in a bytes field (the mapping Pulsar's
            # Avro schemas use for BigDecimal POJO fields)
            from pyspark.sql.types import DecimalType

            assert isinstance(dt, DecimalType)
            t = {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        else:
            raise ValueError(f"no Avro mapping for Spark type {s}")
        return ["null", t] if nullable else t

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, f.name)}
            for f in st.fields
        ],
    }


def avro_to_struct_schema(schema: dict | str) -> StructType:
    """Avro record schema -> StructType (``["null", T]`` -> nullable)."""
    if isinstance(schema, str):
        schema = json.loads(schema)

    def conv(t) -> tuple[DataType, bool]:
        if isinstance(t, list):  # union
            non_null = [x for x in t if x != "null"]
            if len(non_null) != 1:
                raise ValueError(f"only [null, T] unions supported, got {t}")
            inner, _ = conv(non_null[0])
            return inner, True
        if isinstance(t, dict):
            kind = t["type"]
            if kind == "record":
                fields = []
                for f in t["fields"]:
                    dt, nullable = conv(f["type"])
                    fields.append(StructField(f["name"], dt, nullable))
                return StructType(fields), False
            if kind == "array":
                inner, _ = conv(t["items"])
                return ArrayType(inner), False
            if kind == "map":
                inner, _ = conv(t["values"])
                return MapType(StringType(), inner), False
            if kind == "enum":
                return StringType(), False
            if kind == "fixed":
                return BinaryType(), False
            lt = t.get("logicalType")
            if lt in ("timestamp-micros", "timestamp-millis"):
                from pyspark.sql.types import TimestampType

                return TimestampType(), False
            if lt == "date":
                from pyspark.sql.types import DateType

                return DateType(), False
            if lt == "decimal":
                from pyspark.sql.types import DecimalType

                return DecimalType(t.get("precision", 10), t.get("scale", 0)), False
            return conv(kind)  # plain {"type": "long"} wrapper
        if t in _PRIMITIVE_TO_SPARK:
            return _PRIMITIVE_TO_SPARK[t], False
        raise ValueError(f"unsupported Avro type {t}")

    st, _ = conv(schema)
    if not isinstance(st, StructType):
        raise ValueError("top-level Avro schema must be a record")
    return st


def _is_na(v) -> bool:
    """True for None / float NaN / pandas NaT scalars only (array cells
    are values; NaT is how a null timestamp reaches the pandas UDF)."""
    if v is None:
        return True
    if isinstance(v, float) and v != v:
        return True
    return v.__class__.__name__ == "NaTType"


# ------------------------------------------------------- Avro binary codec
#
# Implements the Avro 1.x binary encoding spec (public): zigzag varint
# longs, little-endian IEEE float/double, length-prefixed strings/bytes,
# records as field concatenation, [null, T] unions as index + value,
# arrays/maps as counted blocks with 0 terminator.


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _AvroWriter:
    def __init__(self, schema: dict):
        self.schema = schema

    def encode(self, value) -> bytes:
        out = bytearray()
        self._write(self.schema, value, out)
        return bytes(out)

    def _write(self, t, v, out: bytearray) -> None:
        if isinstance(t, list):  # union: index then value
            if v is None and "null" in t:
                out += _zigzag_encode(t.index("null"))
                return
            idx = next(i for i, x in enumerate(t) if x != "null")
            out += _zigzag_encode(idx)
            self._write(t[idx], v, out)
            return
        if isinstance(t, dict):
            kind = t["type"]
            if kind == "record":
                for f in t["fields"]:
                    self._write(f["type"], None if v is None else v.get(f["name"]), out)
                return
            if kind == "array":
                # len() not truthiness: array cells arrive as numpy
                # arrays through Arrow, which refuse bool()
                if v is not None and len(v) > 0:
                    out += _zigzag_encode(len(v))
                    for item in v:
                        self._write(t["items"], item, out)
                out += _zigzag_encode(0)
                return
            if kind == "map":
                if v is not None and len(v) > 0:
                    out += _zigzag_encode(len(v))
                    for k, item in v.items():
                        self._write("string", k, out)
                        self._write(t["values"], item, out)
                out += _zigzag_encode(0)
                return
            if kind == "enum":
                out += _zigzag_encode(t["symbols"].index(v))
                return
            if kind == "fixed":
                out += bytes(v)
                return
            lt = t.get("logicalType")
            if lt in ("timestamp-micros", "timestamp-millis"):
                import datetime as _dt

                if isinstance(v, _dt.datetime):
                    # UTC-anchored: tz-aware values convert to UTC; naive
                    # values are interpreted AS UTC (the engine pins
                    # spark.sql.session.timeZone=UTC, so that is what a
                    # pandas UDF receives). Integer timedelta arithmetic
                    # keeps exact microseconds (float .timestamp() would
                    # round).
                    if v.tzinfo is None:
                        v = v.replace(tzinfo=_dt.timezone.utc)
                    d = v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                    us = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
                    v = us if lt == "timestamp-micros" else us // 1000
                self._write(kind, int(v), out)
                return
            if lt == "date":
                import datetime as _dt

                if isinstance(v, _dt.date):
                    v = (v - _dt.date(1970, 1, 1)).days
                self._write(kind, int(v), out)
                return
            if lt == "decimal":
                import decimal as _decimal

                scale = int(t.get("scale", 0))
                # The reference Avro conversions REJECT inexact rounding
                # (Conversions.DecimalConversion enforces the schema
                # scale) — quantize in a context that raises Inexact
                # rather than silently truncating 1.0005 at scale 3, and
                # validate the declared precision before encoding.
                dec = _decimal.Decimal(str(v))
                try:
                    q = dec.quantize(
                        _decimal.Decimal(1).scaleb(-scale),
                        context=_decimal.Context(prec=99, traps=[_decimal.Inexact]),
                    )
                except _decimal.Inexact:
                    raise ValueError(
                        f"decimal {v} does not fit scale {scale} exactly"
                    ) from None
                unscaled = int(q.scaleb(scale))
                precision = t.get("precision")
                if precision is not None and len(str(abs(unscaled))) > int(precision):
                    raise ValueError(
                        f"decimal {v} exceeds declared precision {precision}"
                    )
                # minimal two's-complement big-endian length
                nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                self._write(
                    kind, unscaled.to_bytes(nbytes, "big", signed=True), out
                )
                return
            self._write(kind, v, out)
            return
        if t in ("int", "long"):
            out += _zigzag_encode(int(v))
        elif t == "string":
            b = str(v).encode("utf-8")
            out += _zigzag_encode(len(b)) + b
        elif t == "bytes":
            b = bytes(v)
            out += _zigzag_encode(len(b)) + b
        elif t == "double":
            out += _struct.pack("<d", float(v))
        elif t == "float":
            out += _struct.pack("<f", float(v))
        elif t == "boolean":
            out.append(1 if v else 0)
        elif t == "null":
            pass
        else:
            raise ValueError(f"unsupported Avro type {t}")


class _AvroReader:
    def __init__(self, schema: dict):
        self.schema = schema

    def decode(self, data: bytes):
        self.buf = memoryview(data)
        self.pos = 0
        return self._read(self.schema)

    def _varint(self) -> int:
        shift = u = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)  # zigzag decode

    def _read(self, t):
        if isinstance(t, list):
            return self._read(t[self._varint()])
        if isinstance(t, dict):
            kind = t["type"]
            if kind == "record":
                return {f["name"]: self._read(f["type"]) for f in t["fields"]}
            if kind == "array":
                out = []
                while (n := self._varint()) != 0:
                    if n < 0:  # block with byte-size prefix
                        self._varint()
                        n = -n
                    out.extend(self._read(t["items"]) for _ in range(n))
                return out
            if kind == "map":
                out = {}
                while (n := self._varint()) != 0:
                    if n < 0:
                        self._varint()
                        n = -n
                    for _ in range(n):
                        k = self._read("string")
                        out[k] = self._read(t["values"])
                return out
            if kind == "enum":
                return t["symbols"][self._varint()]
            if kind == "fixed":
                v = bytes(self.buf[self.pos : self.pos + t["size"]])
                self.pos += t["size"]
                return v
            lt = t.get("logicalType")
            if lt in ("timestamp-micros", "timestamp-millis"):
                import datetime as _dt

                raw = self._read(kind)
                us = raw if lt == "timestamp-micros" else raw * 1000
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
            if lt == "date":
                import datetime as _dt

                return _dt.date(1970, 1, 1) + _dt.timedelta(days=self._read(kind))
            if lt == "decimal":
                import decimal as _decimal

                unscaled = int.from_bytes(self._read(kind), "big", signed=True)
                return _decimal.Decimal(unscaled).scaleb(-int(t.get("scale", 0)))
            return self._read(kind)
        if t in ("int", "long"):
            return self._varint()
        if t == "string":
            n = self._varint()
            v = bytes(self.buf[self.pos : self.pos + n]).decode("utf-8")
            self.pos += n
            return v
        if t == "bytes":
            n = self._varint()
            v = bytes(self.buf[self.pos : self.pos + n])
            self.pos += n
            return v
        if t == "double":
            v = _struct.unpack_from("<d", self.buf, self.pos)[0]
            self.pos += 8
            return v
        if t == "float":
            v = _struct.unpack_from("<f", self.buf, self.pos)[0]
            self.pos += 4
            return v
        if t == "boolean":
            v = self.buf[self.pos] == 1
            self.pos += 1
            return v
        if t == "null":
            return None
        raise ValueError(f"unsupported Avro type {t}")


def avro_encode(
    df: DataFrame,
    cols: list[str],
    payload_col: str = "payload",
    record_name: str = "Record",
) -> DataFrame:
    """Serialize ``cols`` into one Avro-binary ``payload_col``
    (Schema.AVRO produce path). Remaining columns pass through."""
    sub = StructType([f for f in df.schema.fields if f.name in set(cols)])
    schema = struct_to_avro_schema(sub, name=record_name)
    schema_json = json.dumps(schema)

    @F.pandas_udf(BinaryType())
    def _enc(s):
        import pandas as pd

        w = _AvroWriter(json.loads(schema_json))
        # a struct argument arrives as a pandas DataFrame; scalar NaN ->
        # None (union null branch). Per-cell, because pd.notnull is
        # ambiguous on array-valued cells.
        records = [
            {k: (None if _is_na(v) else v) for k, v in r.items()}
            for r in s.to_dict("records")
        ]
        return pd.Series([w.encode(r) for r in records])

    rest = [c for c in df.columns if c not in set(cols)]
    return df.select(*rest, _enc(F.struct(*cols)).alias(payload_col))


def avro_decode(
    df: DataFrame,
    schema: dict | str,
    payload_col: str = "payload",
    reader_schema: dict | str | None = None,
) -> DataFrame:
    """Deserialize an Avro-binary payload column back into typed
    top-level columns (Schema.AVRO / AUTO_CONSUME consume path).

    ``schema`` is the WRITER schema (what the bytes were produced
    with). Pass ``reader_schema`` to apply Avro schema resolution — the
    AUTO_CONSUME evolution path (SchemaType.java:175 +
    SchemaRegistryServiceImpl versioning): fields are matched by name,
    writer-only fields are decoded and discarded, reader-only fields
    take their declared ``default`` (or null for a nullable union), per
    the public Avro spec's resolution rules.
    """
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    reader_json = (
        None
        if reader_schema is None
        else (reader_schema if isinstance(reader_schema, str) else json.dumps(reader_schema))
    )
    st = avro_to_struct_schema(reader_json or schema_json)

    @F.pandas_udf(st)
    def _dec(s):
        import pandas as pd

        r = _AvroReader(json.loads(schema_json))
        reader = None if reader_json is None else json.loads(reader_json)
        rows = []
        for b in s:
            if b is None:
                rows.append({f.name: None for f in st.fields})
                continue
            rec = r.decode(bytes(b))
            if reader is not None:
                rec = _resolve_record(rec, reader)
            rows.append(rec)
        return pd.DataFrame(rows)

    rest = [c for c in df.columns if c != payload_col]
    return df.select(*rest, _dec(F.col(payload_col)).alias("_rec")).select(
        *rest, "_rec.*"
    )


def _resolve_record(rec: dict, reader: dict) -> dict:
    """Avro schema resolution, record case: project the writer-decoded
    dict onto the reader's field list — match by name, apply reader
    defaults for missing fields (null for [null, T] unions without an
    explicit default), drop writer-only fields."""
    out = {}
    for f in reader["fields"]:
        name = f["name"]
        if name in rec:
            out[name] = rec[name]
        elif "default" in f:
            out[name] = f["default"]
        elif isinstance(f["type"], list) and "null" in f["type"]:
            out[name] = None
        else:
            raise ValueError(
                f"reader field '{name}' absent from writer data and has no default"
            )
    return out


def register_avro(
    registry, topic: str, schema: dict | str, strategy: str = "FULL"
) -> int:
    """Register an Avro record schema for a topic; compatibility is
    checked with the shared StructType rules (BACKWARD = new reads old,
    FORWARD = old reads new, matching SchemaCompatibilityStrategy)."""
    return registry.register(topic, avro_to_struct_schema(schema), strategy)


# ---------------------------------------------------------- Protobuf codec
#
# Public protobuf wire format: key = (field_number << 3) | wire_type;
# wire types 0 = varint (int/sint/bool), 1 = 64-bit (double), 5 = 32-bit
# (float), 2 = length-delimited (string/bytes/message/repeated-packed).
# A descriptor here is {"name": ..., "fields": [{"num", "name", "type",
# "repeated"?}]} with type one of int64|sint64|bool|double|float|string|
# bytes|message (message carries a nested descriptor under "message").

_WIRE_VARINT, _WIRE_64, _WIRE_LEN, _WIRE_32 = 0, 1, 2, 5


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7


class _ProtoCodec:
    def __init__(self, descriptor: dict):
        self.desc = descriptor
        self.by_num = {f["num"]: f for f in descriptor["fields"]}

    # -- encode
    def encode(self, record: dict | None) -> bytes:
        out = bytearray()
        if record is None:
            return bytes(out)
        for f in self.desc["fields"]:
            v = record.get(f["name"])
            if v is None:
                continue  # proto3: absent field == default, not serialized
            values = v if f.get("repeated") else [v]
            for item in values:
                self._field(f, item, out)
        return bytes(out)

    def _field(self, f: dict, v, out: bytearray) -> None:
        num, t = f["num"], f["type"]
        if t in ("int64", "bool"):
            out += _uvarint(num << 3 | _WIRE_VARINT)
            out += _uvarint(int(v) & 0xFFFFFFFFFFFFFFFF)
        elif t == "sint64":
            out += _uvarint(num << 3 | _WIRE_VARINT)
            out += _uvarint(((int(v) << 1) ^ (int(v) >> 63)) & 0xFFFFFFFFFFFFFFFF)
        elif t == "double":
            out += _uvarint(num << 3 | _WIRE_64)
            out += _struct.pack("<d", float(v))
        elif t == "float":
            out += _uvarint(num << 3 | _WIRE_32)
            out += _struct.pack("<f", float(v))
        elif t in ("string", "bytes"):
            b = str(v).encode("utf-8") if t == "string" else bytes(v)
            out += _uvarint(num << 3 | _WIRE_LEN)
            out += _uvarint(len(b)) + b
        elif t == "message":
            b = _ProtoCodec(f["message"]).encode(dict(v))
            out += _uvarint(num << 3 | _WIRE_LEN)
            out += _uvarint(len(b)) + b
        else:
            raise ValueError(f"unsupported proto type {t}")

    # -- decode
    def decode(self, data: bytes) -> dict:
        buf = memoryview(data)
        out: dict = {
            f["name"]: ([] if f.get("repeated") else None)
            for f in self.desc["fields"]
        }
        pos = 0
        while pos < len(buf):
            key, pos = _read_uvarint(buf, pos)
            num, wt = key >> 3, key & 0x7
            f = self.by_num.get(num)
            v, pos = self._value(f, wt, buf, pos)
            if f is not None:
                if f.get("repeated"):
                    out[f["name"]].append(v)
                else:
                    out[f["name"]] = v
        return out

    def _value(self, f, wt: int, buf, pos: int):
        if wt == _WIRE_VARINT:
            u, pos = _read_uvarint(buf, pos)
            if f is None:
                return None, pos
            if f["type"] == "sint64":
                return (u >> 1) ^ -(u & 1), pos
            if f["type"] == "bool":
                return bool(u), pos
            if u >= 1 << 63:  # two's-complement int64
                u -= 1 << 64
            return u, pos
        if wt == _WIRE_64:
            v = _struct.unpack_from("<d", buf, pos)[0]
            return (v if f else None), pos + 8
        if wt == _WIRE_32:
            v = _struct.unpack_from("<f", buf, pos)[0]
            return (v if f else None), pos + 4
        if wt == _WIRE_LEN:
            n, pos = _read_uvarint(buf, pos)
            raw = bytes(buf[pos : pos + n])
            pos += n
            if f is None:
                return None, pos
            if f["type"] == "string":
                return raw.decode("utf-8"), pos
            if f["type"] == "message":
                return _ProtoCodec(f["message"]).decode(raw), pos
            return raw, pos
        raise ValueError(f"unsupported wire type {wt}")


_PROTO_TO_SPARK = {
    "int64": LongType(),
    "sint64": LongType(),
    "bool": BooleanType(),
    "double": DoubleType(),
    "float": FloatType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def proto_struct_schema(descriptor: dict) -> StructType:
    """Descriptor -> StructType (proto3: every field nullable)."""
    fields = []
    for f in descriptor["fields"]:
        dt = (
            proto_struct_schema(f["message"])
            if f["type"] == "message"
            else _PROTO_TO_SPARK[f["type"]]
        )
        if f.get("repeated"):
            dt = ArrayType(dt)
        fields.append(StructField(f["name"], dt, True))
    return StructType(fields)


def proto_encode(
    df: DataFrame, descriptor: dict, cols: list[str], payload_col: str = "payload"
) -> DataFrame:
    """Serialize ``cols`` into a protobuf-wire-format payload column
    (Schema.PROTOBUF_NATIVE produce path)."""
    desc_json = json.dumps(descriptor)

    @F.pandas_udf(BinaryType())
    def _enc(s):
        import pandas as pd

        codec = _ProtoCodec(json.loads(desc_json))
        # struct argument arrives as a pandas DataFrame; scalar NaN ->
        # None so absent proto3 fields are simply not serialized
        records = [
            {k: (None if _is_na(v) else v) for k, v in r.items()}
            for r in s.to_dict("records")
        ]
        return pd.Series([codec.encode(r) for r in records])

    rest = [c for c in df.columns if c not in set(cols)]
    return df.select(*rest, _enc(F.struct(*cols)).alias(payload_col))


def proto_decode(
    df: DataFrame, descriptor: dict, payload_col: str = "payload"
) -> DataFrame:
    """Deserialize a protobuf payload column into typed top-level
    columns (Schema.PROTOBUF consume path)."""
    desc_json = json.dumps(descriptor)
    st = proto_struct_schema(descriptor)

    @F.pandas_udf(st)
    def _dec(s):
        import pandas as pd

        codec = _ProtoCodec(json.loads(desc_json))
        return pd.DataFrame(
            [
                codec.decode(bytes(b))
                if b is not None
                else {f.name: None for f in st.fields}
                for b in s
            ]
        )

    rest = [c for c in df.columns if c != payload_col]
    return df.select(*rest, _dec(F.col(payload_col)).alias("_rec")).select(
        *rest, "_rec.*"
    )


# ------------------------------------------------- Primitive schemas
#
# The reference's primitive payload schemas (Schema.java STRING :105,
# INT8 :130, INT16 :135, INT32 :140, INT64 :145, BOOL :125, FLOAT :150,
# DOUBLE :155, BYTES :91, DATE :160, TIME :165, TIMESTAMP :170,
# INSTANT :180, LOCAL_DATE :185; impls client/impl/schema/*Schema.java)
# use fixed-width big-endian wire formats:
#
#   STRING     UTF-8 bytes                        (StringSchema.java:55)
#   BOOLEAN    1 byte 0/1, decode = byte != 0     (BooleanSchema.java:54-:70)
#   INT8/16/32/64  1/2/4/8-byte big-endian two's complement
#                                                 (LongSchema.java:60-:76)
#   FLOAT/DOUBLE   4/8-byte big-endian IEEE-754 bits
#                                                 (FloatSchema.java:61-:72)
#   DATE/TIME/TIMESTAMP  java.util getTime() epoch-millis as INT64
#                                                 (DateSchema.java:46-:53)
#   INSTANT    8-byte epochSecond + 4-byte nano   (InstantSchema.java:48-:56)
#   LOCAL_DATE 8-byte toEpochDay                  (LocalDateSchema.java)
#   BYTES      identity                           (BytesSchema.java)
#
# Everything except FLOAT/DOUBLE *encode* stays JVM-side (hex/conv/
# substring/bit column expressions — whole-stage-codegen'd, no Python
# boundary); float decode reconstructs the value from its bit pattern
# with exact power-of-two arithmetic, also JVM-side. Only the
# value -> bits direction (no frexp builtin) uses an Arrow-batched
# pandas UDF at the codec boundary.

_INT_WIDTHS = {"INT8": 1, "INT16": 2, "INT32": 4, "INT64": 8}
_INT_SPARK_TYPES = {"INT8": "tinyint", "INT16": "smallint", "INT32": "int", "INT64": "bigint"}


def _int_to_be(col: F.Column, nbytes: int) -> F.Column:
    """Big-endian two's complement bytes of an integral column,
    JVM-side: hex() of a negative bigint is already the 16-digit two's
    complement, so the low ``nbytes`` bytes of the zero-padded hex are
    the wire bytes for every width."""
    full = F.lpad(F.hex(col.cast("bigint")), 16, "0")
    return F.unhex(F.substring(full, 17 - 2 * nbytes, 2 * nbytes))


def _be_to_int(col: F.Column, nbytes: int) -> F.Column:
    """Inverse of :func:`_int_to_be`: conv() reads the hex as an
    unsigned value; values past the sign bit are shifted down by 2^bits
    (through decimal(20,0) for the 64-bit case, where the unsigned
    range exceeds bigint)."""
    u = F.conv(F.hex(col), 16, 10)
    if nbytes == 8:
        d = u.cast("decimal(20,0)")
        half = F.lit("9223372036854775808").cast("decimal(20,0)")
        full = F.lit("18446744073709551616").cast("decimal(21,0)")
        return F.when(d >= half, (d - full).cast("bigint")).otherwise(d.cast("bigint"))
    v = u.cast("bigint")
    return F.when(v >= 2 ** (8 * nbytes - 1), v - F.lit(2 ** (8 * nbytes))).otherwise(v)


def _float_enc_udf(width: str):
    fmt = ">f" if width == "FLOAT" else ">d"

    @F.pandas_udf(BinaryType())
    def _enc(s):
        import pandas as pd

        # NULL rows still reach this UDF (when/otherwise does not mask
        # UDF inputs); their outputs are discarded by the caller's
        # isNull() guard, so they map to None here. NaN is NOT null —
        # a genuine NaN value wire-encodes to its IEEE-754 bit pattern.
        return pd.Series(
            [None if v is None else _struct.pack(fmt, v) for v in s], dtype=object
        )

    return _enc


def _bits_to_float(bits: F.Column, width: str) -> F.Column:
    """Reconstruct the IEEE-754 value from its raw (signed) bit pattern
    with pure column arithmetic — sign * (implicit-one + mantissa) *
    2^(exp - bias), with the subnormal and inf/NaN branches explicit.
    Every product here is an exact power-of-two scaling of a <= 53-bit
    integer, so no rounding occurs. Staying JVM-side (vs a pandas UDF)
    keeps codegen fused AND preserves NaN: Arrow's pandas transfer
    conflates NaN with null on the way back, a UDF cannot return a
    distinguishable NaN."""
    if width == "FLOAT":
        exp_shift, exp_mask, man_bits, sub_exp, bias_off = 23, 0xFF, 23, -149, 150
    else:
        exp_shift, exp_mask, man_bits, sub_exp, bias_off = 52, 0x7FF, 52, -1074, 1075
    sign = F.when(bits < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    be = F.shiftright(bits, exp_shift).bitwiseAND(F.lit(exp_mask))
    man = bits.bitwiseAND(F.lit((1 << man_bits) - 1))
    out = (
        F.when(
            be == exp_mask,
            F.when(man != 0, F.lit(float("nan"))).otherwise(sign * F.lit(float("inf"))),
        )
        .when(be == 0, sign * man.cast("double") * F.pow(F.lit(2.0), F.lit(float(sub_exp))))
        .otherwise(
            sign
            * (man + F.lit(1 << man_bits)).cast("double")
            * F.pow(F.lit(2.0), be.cast("double") - F.lit(float(bias_off)))
        )
    )
    return out.cast("float") if width == "FLOAT" else out


def encode_primitive(col: F.Column, schema_type: str) -> F.Column:
    """Column expression producing the primitive-schema wire bytes of
    ``col`` (the typed produce path: ``Schema.INT64.encode(value)``).
    NULL in -> NULL payload, matching every ``*Schema.encode(null)``."""
    st = schema_type.upper()
    if st == "BYTES":
        return col.cast("binary")
    if st == "STRING":
        return F.encode(col.cast("string"), "UTF-8")
    if st == "BOOLEAN":
        return F.when(col.isNull(), F.lit(None).cast("binary")).otherwise(
            F.when(col.cast("boolean"), F.lit(bytes([1]))).otherwise(F.lit(bytes([0])))
        )
    if st in _INT_WIDTHS:
        return _int_to_be(col, _INT_WIDTHS[st])
    if st in ("FLOAT", "DOUBLE"):
        cast = col.cast("float" if st == "FLOAT" else "double")
        return F.when(cast.isNull(), F.lit(None).cast("binary")).otherwise(
            _float_enc_udf(st)(cast)
        )
    if st in ("DATE", "TIME", "TIMESTAMP"):
        # java.util.Date / sql.Time / sql.Timestamp: getTime() millis
        return _int_to_be(F.unix_millis(col.cast("timestamp")), 8)
    if st == "INSTANT":
        us = F.unix_micros(col.cast("timestamp"))
        sub_us = F.pmod(us, F.lit(1_000_000))  # micros within the second, >= 0
        sec = ((us - sub_us) / F.lit(1_000_000)).cast("bigint")
        return F.concat(_int_to_be(sec, 8), _int_to_be(sub_us * 1000, 4))
    if st == "LOCAL_DATE":
        return _int_to_be(F.datediff(col.cast("date"), F.lit("1970-01-01")), 8)
    raise ValueError(f"unsupported primitive schema type {schema_type}")


def decode_primitive(col: F.Column, schema_type: str) -> F.Column:
    """Inverse of :func:`encode_primitive`: typed value from the wire
    bytes (the consume path). TIME decodes to epoch-millis BIGINT
    (Spark has no time-of-day type); DATE/TIMESTAMP to timestamp;
    INSTANT to timestamp at microsecond precision (Spark's maximum —
    sub-microsecond nanos truncate)."""
    st = schema_type.upper()
    if st == "BYTES":
        return col.cast("binary")
    if st == "STRING":
        return F.decode(col, "UTF-8")
    if st == "BOOLEAN":
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            col.substr(1, 1) != F.lit(bytes([0]))
        )
    if st in _INT_WIDTHS:
        return _be_to_int(col, _INT_WIDTHS[st]).cast(_INT_SPARK_TYPES[st])
    if st in ("FLOAT", "DOUBLE"):
        return _bits_to_float(_be_to_int(col, 4 if st == "FLOAT" else 8), st)
    if st in ("DATE", "TIMESTAMP"):
        return F.timestamp_millis(_be_to_int(col, 8))
    if st == "TIME":
        return _be_to_int(col, 8)
    if st == "INSTANT":
        sec = _be_to_int(col.substr(1, 8), 8)
        nano = _be_to_int(col.substr(9, 4), 4)
        return F.timestamp_micros(sec * 1_000_000 + F.floor(nano / 1000).cast("bigint"))
    if st == "LOCAL_DATE":
        return F.date_add(F.lit("1970-01-01").cast("date"), _be_to_int(col, 8).cast("int"))
    raise ValueError(f"unsupported primitive schema type {schema_type}")
