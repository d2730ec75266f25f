"""Type-promotion unit tests (reference rules: blaze/expr/arithmetic.py,
blaze/expr/reductions.py — SURVEY.md §1.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from blaze_spark import schema as s
from blaze_spark.core import _parse_dtype


def test_int_widening():
    assert s.max_integral(T.IntegerType(), T.LongType()) == T.LongType()
    assert s.max_integral(T.ByteType(), T.ShortType()) == T.ShortType()


def test_promote_int_float():
    assert s.promote(T.IntegerType(), T.DoubleType()) == T.DoubleType()
    assert s.promote(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert s.promote(T.LongType(), T.IntegerType()) == T.LongType()


def test_promote_rejects_mixed():
    with pytest.raises(TypeError):
        s.promote(T.StringType(), T.IntegerType())


def test_sum_widen():
    assert s.sum_widen(T.IntegerType()) == T.LongType()
    assert s.sum_widen(T.DoubleType()) == T.DoubleType()


def test_check_comparable():
    s.check_comparable(T.StringType(), T.StringType())
    s.check_comparable(T.TimestampType(), T.DateType())
    with pytest.raises(TypeError):
        s.check_comparable(T.StringType(), T.DoubleType())


def test_parse_dtype_datashape_names():
    # datashape-style names resolve (SURVEY.md §1.2 mapping table)
    assert _parse_dtype("int32") == T.IntegerType()
    assert _parse_dtype("?int64") == T.LongType()
    assert _parse_dtype("real") == T.DoubleType()
    assert _parse_dtype("string") == T.StringType()
    # unsigned widen: no unsigned in Spark
    assert _parse_dtype("uint8") == T.ShortType()
    assert _parse_dtype("uint64") == T.DecimalType(20, 0)
    # Spark DDL fallback
    assert _parse_dtype("decimal(10,2)") == T.DecimalType(10, 2)
    assert _parse_dtype("array<float>") == T.ArrayType(T.FloatType())
