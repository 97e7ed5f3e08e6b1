"""Schema registry — versioned per-topic schemas with compatibility
checking.

Reference semantics (SURVEY.md §1.3): the broker keeps a versioned
schema per topic (SchemaRegistryServiceImpl) and enforces a
compatibility strategy on upload: ALWAYS_INCOMPATIBLE |
ALWAYS_COMPATIBLE | BACKWARD | FORWARD | FULL | *_TRANSITIVE
(pulsar-client-admin-api/.../SchemaCompatibilityStrategy.java:34-71).
SchemaType maps primitives and record schemas to types
(SchemaType.java:37-180) — on Spark every payload is a StructType, so
the registry stores StructType JSON per version.

Compatibility rules (Avro-style, applied to StructTypes):
- BACKWARD: new schema can read data written with the previous schema
  -> new may drop fields; new added fields must be nullable.
- FORWARD: previous schema can read data written with the new schema
  -> new may add fields; dropped fields must have been nullable.
- FULL: both. *_TRANSITIVE: against all prior versions, not just last.
AUTO_CONSUME == schema-on-read: reader uses the latest registered
StructType; AUTO_PRODUCE validates a writer's frame against the topic
schema before append.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

STRATEGIES = {
    "ALWAYS_INCOMPATIBLE",
    "ALWAYS_COMPATIBLE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
}


class IncompatibleSchemaError(Exception):
    pass


def _fields(s: StructType) -> dict[str, tuple[str, bool]]:
    return {f.name: (f.dataType.simpleString(), f.nullable) for f in s.fields}


def _backward_compatible(new: StructType, old: StructType) -> list[str]:
    """new reads old data: every new field must exist in old with same
    type, or be nullable (reads as null)."""
    problems = []
    old_f = _fields(old)
    for name, (dtype, nullable) in _fields(new).items():
        if name in old_f:
            if old_f[name][0] != dtype:
                problems.append(f"field {name}: type {old_f[name][0]} -> {dtype}")
        elif not nullable:
            problems.append(f"new non-nullable field {name} cannot read old data")
    return problems


def _forward_compatible(new: StructType, old: StructType) -> list[str]:
    """old reads new data: every old field must exist in new with same
    type, or be nullable in old."""
    return _backward_compatible(old, new)


@dataclass
class SchemaRegistry:
    """File-backed registry: {path}/{topic}.json holds the version list."""

    path: str

    def _file(self, topic: str) -> str:
        safe = topic.replace("/", "_").replace(":", "_")
        return os.path.join(self.path, f"{safe}.json")

    def versions(self, topic: str) -> list[StructType]:
        f = self._file(topic)
        if not os.path.exists(f):
            return []
        with open(f) as fh:
            return [StructType.fromJson(j) for j in json.load(fh)]

    def latest(self, topic: str) -> tuple[int, StructType] | None:
        vs = self.versions(topic)
        return (len(vs) - 1, vs[-1]) if vs else None

    def register(
        self, topic: str, schema: StructType, strategy: str = "FULL"
    ) -> int:
        """Register a new schema version after the compatibility check.
        Returns the assigned version. Identical re-registration is a
        no-op returning the existing version (reference behavior)."""
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy {strategy}")
        versions = self.versions(topic)
        for i, v in enumerate(versions):
            if v == schema:
                return i
        check_against = versions if strategy.endswith("_TRANSITIVE") else versions[-1:]
        for prior in check_against:
            problems = self._check(schema, prior, strategy)
            if problems:
                raise IncompatibleSchemaError("; ".join(problems))
        versions.append(schema)
        os.makedirs(self.path, exist_ok=True)
        with open(self._file(topic), "w") as fh:
            json.dump([v.jsonValue() for v in versions], fh)
        return len(versions) - 1

    @staticmethod
    def _check(new: StructType, old: StructType, strategy: str) -> list[str]:
        base = strategy.replace("_TRANSITIVE", "")
        if base == "ALWAYS_COMPATIBLE":
            return []
        if base == "ALWAYS_INCOMPATIBLE":
            return ["ALWAYS_INCOMPATIBLE forbids any new version"]
        problems = []
        if base in ("BACKWARD", "FULL"):
            problems += [f"BACKWARD: {p}" for p in _backward_compatible(new, old)]
        if base in ("FORWARD", "FULL"):
            problems += [f"FORWARD: {p}" for p in _forward_compatible(new, old)]
        return problems

    def validate_produce(self, topic: str, df: DataFrame) -> None:
        """AUTO_PRODUCE analog: refuse an append whose frame does not
        match the topic's latest registered schema."""
        latest = self.latest(topic)
        if latest is None:
            return
        _, schema = latest
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in schema.fields}
        missing = [n for n, t in want.items() for f in [got.get(n)] if f is None or f != t]
        if missing:
            raise IncompatibleSchemaError(
                f"produce frame does not match topic schema; offending fields: {missing}"
            )

    def read_with_latest(self, df: DataFrame, topic: str) -> DataFrame:
        """AUTO_CONSUME analog: project/cast the frame to the latest
        registered schema (missing nullable fields become null)."""
        from pyspark.sql import functions as F

        latest = self.latest(topic)
        if latest is None:
            return df
        _, schema = latest
        cols = []
        have = set(df.columns)
        for f in schema.fields:
            if f.name in have:
                cols.append(F.col(f.name).cast(f.dataType))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)
