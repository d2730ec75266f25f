"""Datetime functions — the ``.dt`` accessor (reference:
blaze/expr/datetime.py, 408 LoC; accessor registration datetime.py:287-359).

Semantic shims replicated exactly (SURVEY.md §4.4):

- ``dayofweek``/``weekday`` is **Monday=0** (pandas convention) — the
  reference normalizes Postgres dow the same way
  (blaze/compute/sql.py:1408-1444); Spark F.dayofweek is Sunday=1, so we
  compute ``(F.dayofweek(c)+5) % 7``.
- ``strftime`` translates the C89 %-dialect to Spark's java.time pattern.
- ``truncate(n, unit)`` supports multi-unit truncation via epoch floor
  arithmetic (DateTimeTruncate: blaze/expr/datetime.py:203-254).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT = T.IntegerType()

# C89 strftime -> java.time DateTimeFormatter (for F.date_format)
_STRFTIME_MAP = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%I", "hh"), ("%M", "mm"), ("%S", "ss"),
    ("%f", "SSSSSS"), ("%j", "DDD"), ("%a", "EEE"), ("%A", "EEEE"),
    ("%b", "MMM"), ("%B", "MMMM"), ("%p", "a"), ("%z", "Z"), ("%%", "%"),
]

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def strftime_to_java(fmt: str) -> str:
    for c89, java in _STRFTIME_MAP:
        fmt = fmt.replace(c89, java)
    return fmt


def days_between(end, start):
    """Whole days end-start (timedelta ``.days``; reference accessors at
    blaze/expr/datetime.py:369-383)."""
    return end._make(F.datediff(end.col, start.col), "days_between",
                     T.IntegerType())


def seconds_between(end, start):
    """Seconds end-start (timedelta ``.total_seconds`` composition —
    epoch arithmetic rather than interval casts, identical on any engine)."""
    return end._make(
        (F.unix_timestamp(end.col) - F.unix_timestamp(start.col))
        .cast(T.LongType()),
        "seconds_between", T.LongType())


class DtAccessor:
    """Methods on date/datetime-typed expressions (dtype-gated dispatch, as
    blaze/expr/expressions.py:1026-1039 gates on dshape)."""

    def __init__(self, expr):
        from .. import schema as _s
        if not _s.is_datetime(expr.dtype):
            raise TypeError(f".dt accessor requires date/datetime dtype, got {expr.dtype}")
        self._e = expr

    def _m(self, col, name, dtype=None):
        return self._e._make(col, name, dtype)

    @property
    def _c(self):
        return self._e.col

    # blaze/expr/datetime.py:45-132
    def year(self):
        return self._m(F.year(self._c), "year", _INT)

    def month(self):
        return self._m(F.month(self._c), "month", _INT)

    def day(self):
        return self._m(F.dayofmonth(self._c), "day", _INT)

    def hour(self):
        return self._m(F.hour(self._c), "hour", _INT)

    def minute(self):
        return self._m(F.minute(self._c), "minute", _INT)

    def second(self):
        return self._m(F.second(self._c), "second", _INT)

    def millisecond(self):
        return self._m((F.unix_micros(self._c) % 1_000_000) / 1000,
                       "millisecond", T.DoubleType())

    def microsecond(self):
        return self._m((F.unix_micros(self._c) % 1_000_000).cast(T.LongType()),
                       "microsecond", T.LongType())

    def date(self):
        return self._m(F.to_date(self._c), "date", T.DateType())

    # datetime.py:133-148
    def week(self):
        return self._m(F.weekofyear(self._c), "week", _INT)

    weekofyear = week

    def dayofyear(self):
        return self._m(F.dayofyear(self._c), "dayofyear", _INT)

    def dayofweek(self):
        # Monday=0 (pandas); Spark dayofweek is Sunday=1
        # (normalization mirrors blaze/compute/sql.py:1408-1444)
        return self._m(((F.dayofweek(self._c) + 5) % 7).cast(_INT),
                       "dayofweek", _INT)

    weekday = dayofweek

    def quarter(self):
        return self._m(F.quarter(self._c), "quarter", _INT)

    def daysinmonth(self):
        return self._m(F.dayofmonth(F.last_day(self._c)), "daysinmonth", _INT)

    def weekday_name(self):
        return self._m(F.date_format(self._c, "EEEE"), "weekday_name",
                       T.StringType())

    def is_month_start(self):
        return self._m(F.dayofmonth(self._c) == 1, "is_month_start",
                       T.BooleanType())

    def is_month_end(self):
        return self._m(F.to_date(self._c) == F.last_day(self._c),
                       "is_month_end", T.BooleanType())

    def is_quarter_start(self):
        return self._m(
            (F.dayofmonth(self._c) == 1) & F.month(self._c).isin(1, 4, 7, 10),
            "is_quarter_start", T.BooleanType())

    def is_quarter_end(self):
        return self._m(
            (F.to_date(self._c) == F.last_day(self._c))
            & F.month(self._c).isin(3, 6, 9, 12),
            "is_quarter_end", T.BooleanType())

    def is_year_start(self):
        return self._m((F.dayofyear(self._c) == 1), "is_year_start",
                       T.BooleanType())

    def is_year_end(self):
        return self._m((F.month(self._c) == 12) & (F.dayofmonth(self._c) == 31),
                       "is_year_end", T.BooleanType())

    # strftime (datetime.py:150-152) — dialect translated
    def strftime(self, fmt: str):
        return self._m(F.date_format(self._c, strftime_to_java(fmt)),
                       "strftime", T.StringType())

    # DateTimeTruncate (datetime.py:203-254): measure=1 -> F.date_trunc;
    # general n*unit -> epoch floor arithmetic
    def truncate(self, n: int = 1, unit: str = "day"):
        unit_l = unit.rstrip("s") if unit.endswith("s") else unit
        if n == 1 and unit_l in ("year", "month", "quarter", "week", "day",
                                 "hour", "minute", "second"):
            spark_unit = {"day": "day", "hour": "hour", "minute": "minute",
                          "second": "second", "year": "year", "month": "month",
                          "quarter": "quarter", "week": "week"}[unit_l]
            out = F.date_trunc(spark_unit, self._c)
            if unit_l in ("year", "month", "quarter", "week", "day"):
                # result is a date when unit >= day (reference semantics)
                return self._m(F.to_date(out), "truncate", T.DateType())
            return self._m(out, "truncate", T.TimestampType())
        if unit not in _UNIT_SECONDS and unit_l not in _UNIT_SECONDS:
            raise ValueError(f"cannot truncate by {n} {unit}")
        k = n * _UNIT_SECONDS.get(unit, _UNIT_SECONDS.get(unit_l, 1))
        floored = F.timestamp_seconds(
            F.floor(F.unix_timestamp(self._c) / k) * k)
        if _UNIT_SECONDS.get(unit, _UNIT_SECONDS.get(unit_l)) >= 86400:
            return self._m(F.to_date(floored), "truncate", T.DateType())
        return self._m(floored, "truncate", T.TimestampType())

    # Round/Floor/Ceil(freq) (datetime.py:263-284) — epoch arithmetic
    def floor(self, freq_seconds: int):
        k = freq_seconds
        return self._m(
            F.timestamp_seconds(F.floor(F.unix_timestamp(self._c) / k) * k),
            "floor", T.TimestampType())

    def ceil(self, freq_seconds: int):
        k = freq_seconds
        return self._m(
            F.timestamp_seconds(F.ceil(F.unix_timestamp(self._c) / k) * k),
            "ceil", T.TimestampType())

    def round(self, freq_seconds: int):
        k = freq_seconds
        return self._m(
            F.timestamp_seconds(F.round(F.unix_timestamp(self._c) / k) * k),
            "round", T.TimestampType())

    # UTCFromTimestamp (datetime.py:125-130)
    def utcfromtimestamp(self):
        return self._m(F.timestamp_seconds(self._c), "utcfromtimestamp",
                       T.TimestampType())

    # epoch seconds (used by timedelta total_seconds compositions)
    def epoch_seconds(self):
        return self._m(F.unix_timestamp(self._c), "epoch_seconds", T.LongType())
