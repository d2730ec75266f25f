"""Type system shims: datashape-equivalent mapping & promotion rules.

Reproduces the promotion semantics of the reference expression layer
(reference: blaze/expr/arithmetic.py:117-210, blaze/expr/reductions.py:103-138)
on top of Spark's type lattice.  Spark has no unsigned ints and no
fixed-width strings; we widen / drop per SURVEY.md §1.2.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Integer widening order (reference: maxtype in blaze/expr/arithmetic.py:199-210)
_INT_RANK = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
}

_FLOAT_RANK = {T.FloatType: 1, T.DoubleType: 2}


def is_integral(dt: T.DataType) -> bool:
    return type(dt) in _INT_RANK


def is_floating(dt: T.DataType) -> bool:
    return type(dt) in _FLOAT_RANK


def is_numeric(dt: T.DataType) -> bool:
    return is_integral(dt) or is_floating(dt) or isinstance(dt, T.DecimalType)


def is_boolean(dt: T.DataType) -> bool:
    return isinstance(dt, T.BooleanType)


def is_string(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def is_datetime(dt: T.DataType) -> bool:
    return isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType))


def is_interval(dt: T.DataType) -> bool:
    """timedelta dtype (reference TimeDelta measure,
    blaze/expr/arithmetic.py:166-186: datetime - datetime -> timedelta)."""
    return isinstance(dt, T.DayTimeIntervalType)


def max_integral(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widest of two integer types (reference FloorDiv semantics:
    blaze/expr/arithmetic.py:199-210 — int // int keeps max-width integer)."""
    ra, rb = _INT_RANK[type(a)], _INT_RANK[type(b)]
    return a if ra >= rb else b


def sum_widen(dt: T.DataType) -> T.DataType:
    """``sum`` widens to maxtype — int32 -> int64
    (reference: blaze/expr/reductions.py:111-113)."""
    if is_integral(dt):
        return T.LongType()
    return dt


def promote(a: T.DataType, b: T.DataType) -> T.DataType:
    """Binary-op result type, NumPy-flavored (reference:
    blaze/expr/arithmetic.py:316-331 forces promotion at construction)."""
    if type(a) is type(b):
        return a
    if is_integral(a) and is_integral(b):
        return max_integral(a, b)
    if is_floating(a) and is_floating(b):
        return a if _FLOAT_RANK[type(a)] >= _FLOAT_RANK[type(b)] else b
    if is_floating(a) and is_integral(b):
        return a
    if is_integral(a) and is_floating(b):
        return b
    if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
        return a if isinstance(a, T.DecimalType) else b
    raise TypeError(f"cannot promote {a} with {b}")


def check_comparable(a: T.DataType, b: T.DataType) -> None:
    """Construction-time check mirroring the reference's eager dshape
    validation (blaze/expr/expressions.py:167-180): fail fast on
    obviously-unpromotable operand types."""
    ok = (
        (is_numeric(a) and is_numeric(b))
        or (is_string(a) and is_string(b))
        or (is_datetime(a) and is_datetime(b))
        or (is_boolean(a) and is_boolean(b))
        or type(a) is type(b)
    )
    if not ok:
        raise TypeError(f"incomparable types: {a} vs {b}")
