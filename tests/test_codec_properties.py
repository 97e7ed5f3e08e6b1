"""Property-based round-trip tests for the Avro and protobuf codecs —
the wire formats must survive arbitrary values (64-bit extremes,
unicode, NaN/inf, empty/nested collections), mirroring the reference's
SchemaTest round-trip conformance.

Pure-Python: exercises _AvroWriter/_AvroReader/_ProtoCodec directly,
no SparkSession (the Spark integration is covered in test_round3).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_spark.schema_codecs import _AvroReader, _AvroWriter, _ProtoCodec

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
TEXT = st.text(max_size=80)
DOUBLES = st.floats(allow_nan=False)  # NaN breaks equality, tested separately


AVRO_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
        {
            "name": "nested",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "N",
                    "fields": [{"name": "x", "type": "long"}],
                },
            ],
        },
    ],
}


@settings(max_examples=200, deadline=None)
@given(
    i=I64,
    s=st.one_of(st.none(), TEXT),
    d=DOUBLES,
    b=st.binary(max_size=64),
    arr=st.lists(I64, max_size=8),
    m=st.dictionaries(TEXT.filter(bool), DOUBLES, max_size=5),
    nx=st.one_of(st.none(), I64),
)
def test_avro_round_trip(i, s, d, b, arr, m, nx):
    rec = {
        "i": i,
        "s": s,
        "d": d,
        "b": b,
        "arr": arr,
        "m": m,
        "nested": None if nx is None else {"x": nx},
    }
    w, r = _AvroWriter(AVRO_SCHEMA), _AvroReader(AVRO_SCHEMA)
    assert r.decode(w.encode(rec)) == rec


def test_avro_nan_inf():
    schema = {"type": "record", "name": "F", "fields": [{"name": "d", "type": "double"}]}
    w, r = _AvroWriter(schema), _AvroReader(schema)
    assert math.isnan(r.decode(w.encode({"d": float("nan")}))["d"])
    assert r.decode(w.encode({"d": float("inf")}))["d"] == float("inf")


PROTO_DESC = {
    "name": "P",
    "fields": [
        {"num": 1, "name": "i", "type": "int64"},
        {"num": 2, "name": "si", "type": "sint64"},
        {"num": 3, "name": "s", "type": "string"},
        {"num": 4, "name": "d", "type": "double"},
        {"num": 5, "name": "b", "type": "bytes"},
        {"num": 6, "name": "flag", "type": "bool"},
        {"num": 7, "name": "rep", "type": "int64", "repeated": True},
        {
            "num": 8,
            "name": "msg",
            "type": "message",
            "message": {
                "name": "N",
                "fields": [{"num": 1, "name": "x", "type": "sint64"}],
            },
        },
    ],
}


@settings(max_examples=200, deadline=None)
@given(
    i=I64,
    si=I64,
    s=st.one_of(st.none(), TEXT),
    d=DOUBLES,
    b=st.binary(max_size=64),
    flag=st.booleans(),
    rep=st.lists(I64, max_size=8),
    nx=st.one_of(st.none(), I64),
)
def test_proto_round_trip(i, si, s, d, b, flag, rep, nx):
    rec = {
        "i": i,
        "si": si,
        "s": s,
        "d": d,
        "b": b,
        "flag": flag,
        "rep": rep,
        "msg": None if nx is None else {"x": nx},
    }
    c = _ProtoCodec(PROTO_DESC)
    got = c.decode(c.encode(rec))
    # proto3 semantics: absent (None) scalar fields decode as None;
    # everything set round-trips exactly
    for k, v in rec.items():
        if v is None:
            assert got[k] is None
        elif k == "msg":
            assert got[k] == {"x": nx}
        else:
            assert got[k] == v


def test_proto_field_number_gaps_ignored():
    # unknown field numbers between known ones must be skipped per wire
    # type — encode with the full descriptor, decode with a sparse one
    sparse = {
        "name": "P",
        "fields": [
            {"num": 2, "name": "si", "type": "sint64"},
            {"num": 6, "name": "flag", "type": "bool"},
        ],
    }
    c_full, c_sparse = _ProtoCodec(PROTO_DESC), _ProtoCodec(sparse)
    payload = c_full.encode(
        {"i": 5, "si": -9, "s": "hi", "d": 1.5, "b": b"xy", "flag": True,
         "rep": [1, 2], "msg": {"x": 3}}
    )
    got = c_sparse.decode(payload)
    assert got == {"si": -9, "flag": True}


DECIMAL_SCHEMA = {
    "type": "record",
    "name": "D",
    "fields": [
        {
            "name": "amt",
            "type": [
                "null",
                {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 6},
            ],
        }
    ],
}


@settings(max_examples=200, deadline=None)
@given(
    unscaled=st.one_of(
        st.none(), st.integers(min_value=-(10**20) + 1, max_value=10**20 - 1)
    )
)
def test_avro_decimal_round_trip(unscaled):
    import decimal

    v = None if unscaled is None else decimal.Decimal(unscaled).scaleb(-6)
    rec = {"amt": v}
    out = _AvroReader(DECIMAL_SCHEMA).decode(_AvroWriter(DECIMAL_SCHEMA).encode(rec))
    assert out["amt"] == v
