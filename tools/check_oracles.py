#!/usr/bin/env python3
"""Simulate the driver's correctness gate: run every ``queries()`` entry on
Spark at sf0.01 and its ``oracle_sql()`` on DuckDB over the same parquet,
compare row count + column names + dtypes + values (order-insensitive).

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c].astype("datetime64[us]").astype(str)
            df[c] = s.where(s != "NaT", None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: None if v is None or v is pd.NaT else str(v))
    return df.sort_values(by=list(df.columns), na_position="first") \
        .reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        issues.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
        return issues
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        if str(s[c].dtype) != str(o[c].dtype):
            issues.append(f"dtype[{c}]: spark={s[c].dtype} oracle={o[c].dtype}")
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = pd.to_numeric(sv, errors="coerce")
            b = pd.to_numeric(ov, errors="coerce")
            bad = ~((a.isna() & b.isna()) | (abs(a - b) <= 1e-9 + 1e-9 * abs(b)))
            if bad.any():
                i = bad.idxmax()
                issues.append(f"value[{c}] row {i}: spark={sv[i]!r} oracle={ov[i]!r} "
                              f"({int(bad.sum())} mismatches)")
            else:
                # the driver hashes raw bytes: ±0.0 (or any last-ulp
                # disagreement inside tolerance) is a driver FAIL even
                # though == passes — mirror that here (the r6 lesson)
                av = a.astype("float64").to_numpy()
                bv = b.astype("float64").to_numpy()
                byte_bad = (av.tobytes() != bv.tobytes())
                if byte_bad:
                    import numpy as np
                    diff = np.where(av.view("int64") != bv.view("int64"))[0]
                    i = int(diff[0]) if len(diff) else -1
                    issues.append(
                        f"byte[{c}] row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                        f" ({len(diff)} byte-level mismatches, == passes"
                        " — would FAIL the driver hash)")
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv == ov))
            if bad.any():
                i = bad.idxmax()
                issues.append(f"value[{c}] row {i}: spark={sv[i]!r} oracle={ov[i]!r} "
                              f"({int(bad.sum())} mismatches)")
    return issues


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # CHECK_SHUFFLE_PARTITIONS / CHECK_AQE: adversarial knobs — a
    # registry result must be IDENTICAL under any partitioning (the r7
    # pack_sequences bug was exactly a partitioning-sensitive
    # nondeterminism); sweep odd values to prove it
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracles")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("CHECK_SHUFFLE_PARTITIONS", "8"))
        .config("spark.sql.adaptive.enabled",
                os.environ.get("CHECK_AQE", "true"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for i in issues[:6]:
                print(f"      - {i}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
