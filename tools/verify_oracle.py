"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() side-by-side,
compare row count, column names/dtypes, and values (order-insensitive).

Usage: python tools/verify_oracle.py [--ntz] [sf_dir] [query ...]

``--ntz`` builds the Spark session with
``spark.sql.parquet.inferTimestampNTZ.enabled=true`` — the correctness
driver's session default (Spark 4 reads parquet timestamps as
TIMESTAMP_NTZ), which ``get_spark()`` deliberately pins false for the
streaming-watermark reason documented in session.py. Running the gate
once per round in each mode is what catches NTZ-only failures like the
round-3/4 ``fn_merge_topic`` DATATYPE_MISMATCH before the driver does.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"]
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duck={len(ddf)}")
    s, d = normalize(sdf), normalize(ddf)
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            problems.append(f"dtype[{c}]: spark={s[c].dtype} duck={d[c].dtype}")
    if len(s) == len(d):
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                if a.dtype.kind == "f":
                    eq = ((a - b).abs() < 1e-12) | (a.isna() & b.isna())
                else:
                    eq = (a == b) | (a.isna() & b.isna())
                n_bad = int((~eq).sum())
                if n_bad:
                    idx = (~eq).idxmax()
                    problems.append(f"values[{c}]: {n_bad} mismatches, first at row {idx}: spark={a[idx]!r} duck={b[idx]!r}")
            except Exception as e:  # dtype-incomparable
                problems.append(f"values[{c}]: compare error {e}")
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--ntz"]
    ntz = "--ntz" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry
    from pulsar_spark import get_spark

    extra = {"spark.sql.parquet.inferTimestampNTZ.enabled": "true"} if ntz else None
    spark = get_spark("verify-oracle-ntz" if ntz else "verify-oracle", extra_conf=extra)
    if ntz:
        got = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
        assert got == "true", f"NTZ conf did not apply (getOrCreate reuse?): {got}"
        print("NTZ mode: parquet timestamps read as TIMESTAMP_NTZ (driver mimic)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name} (no oracle, rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            for p in problems[:6]:
                print(f"     {p}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
