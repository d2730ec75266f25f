"""Sources & sinks: URI resolution, format inference, schema override,
round-trips (reference: blaze/expr/literal.py data(), odo sinks)."""

from __future__ import annotations

import pytest


def test_csv_roundtrip(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t.csv")
    t.into(path, fmt="csv", header="true")
    back = data(path, spark=spark)
    assert back.nrows() == 3
    assert set(back.columns) == {"name", "amount", "id"}
    # inferSchema brings ints back as ints
    assert dict(back.df.dtypes)["amount"] == "int"


def test_csv_schema_override(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t2.csv")
    t.into(path, fmt="csv", header="true")
    back = data(path, spark=spark, schema="name string, amount double, id long")
    assert dict(back.df.dtypes)["amount"] == "double"


def test_json_roundtrip(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t.json")
    t.into(path, fmt="json")
    back = data(path, spark=spark, fmt="json")
    assert back.nrows() == 3


def test_parquet_sink_and_format_inference(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t_out.parquet")
    t.into(path)
    back = data(path, spark=spark)
    assert back.nrows() == 3
    assert back.schema == t.schema


def test_in_memory_rows(spark):
    from blaze_spark import data

    t = data([(1, "a")], spark=spark, schema="x int, s string")
    assert t.nrows() == 1


def test_dataframe_passthrough(spark):
    from blaze_spark import data

    df = spark.range(5)
    t = data(df)
    assert t.nrows() == 5


def test_nanos_parquet_handled(spark, sf_dir):
    from blaze_spark import data

    e = data(f"{sf_dir}/events.parquet", spark=spark)
    assert dict(e.df.dtypes)["ts"] == "timestamp"
    # microsecond content survives
    row = e.sort(e.event_id).head(1).df.collect()[0]
    assert row.ts.microsecond > 0
