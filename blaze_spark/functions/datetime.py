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


from ..core import record_accessor_trees


@record_accessor_trees("dt")
class TimedeltaAccessor:
    """``.dt`` on a timedelta (interval) expression — the reference's
    ``timedelta_ns`` accessor (blaze/expr/datetime.py:369-394: days /
    seconds / nanoseconds / total_seconds, all int64), produced by
    ``datetime - datetime`` (blaze/expr/arithmetic.py:166-186).

    Component semantics are pandas': ``days`` floors (−1h30m → −1 day),
    ``seconds`` is the in-day component in [0, 86399], ``microseconds``
    the in-second component (EXTENSION), ``nanoseconds`` always 0 —
    Spark intervals are microsecond-precision.  All JVM-side: the interval
    decomposes via date_part, components recombine with long arithmetic.
    """

    _US_DAY = 86_400_000_000

    def __init__(self, expr):
        from .. import schema as _s
        if not _s.is_interval(expr.dtype):
            raise TypeError(
                f"timedelta accessor requires interval dtype, got {expr.dtype}")
        self._e = expr

    def _m(self, col, name):
        return self._e._make(col, f"{self._e.name}_{name}", T.LongType())

    def _total_us(self):
        c = self._e.col
        whole = (F.date_part(F.lit("DAY"), c).cast("long") * 86400
                 + F.date_part(F.lit("HOUR"), c).cast("long") * 3600
                 + F.date_part(F.lit("MINUTE"), c).cast("long") * 60)
        # SECOND is a signed decimal(8,6) — scale to µs exactly in decimal
        frac_us = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
        return whole * 1_000_000 + frac_us

    def total_seconds(self):
        """Whole seconds, truncated toward zero (reference dtype int64,
        blaze/expr/datetime.py:372)."""
        return self._m(self._e.col.cast("long"), "total_seconds")

    def total_microseconds(self):
        """EXTENSION: exact total length in µs (Spark's native precision)."""
        return self._m(self._total_us(), "total_microseconds")

    def days(self):
        tus = self._total_us()
        floored = (tus - F.pmod(tus, F.lit(self._US_DAY))) / self._US_DAY
        return self._m(floored.cast("long"), "days")

    def seconds(self):
        tus = self._total_us()
        return self._m((F.pmod(tus, F.lit(self._US_DAY)) / 1_000_000)
                       .cast("long"), "seconds")

    def microseconds(self):
        return self._m(F.pmod(self._total_us(), F.lit(1_000_000))
                       .cast("long"), "microseconds")

    def nanoseconds(self):
        """Always 0: Spark DayTimeIntervalType is µs-precision (the
        reference's pandas backend had ns) — kept for API parity."""
        return self._m(F.lit(0).cast("long"), "nanoseconds")


@record_accessor_trees("dt")
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

    def nanosecond(self):
        """Sub-microsecond nanosecond component, 0-999 (reference
        blaze/expr/datetime.py:133; pandas ``Series.dt.nanosecond``).
        Spark timestamps carry microsecond precision, so this component
        is always 0 — returned as a typed literal for parity rather
        than pretending ns precision exists.  For nanoseconds *within
        the second* use :meth:`nanoseconds_within_second`."""
        return self._m(F.lit(0).cast(T.LongType()), "nanosecond",
                       T.LongType())

    def nanoseconds_within_second(self):
        """Extension (not in the reference): the sub-second part of the
        timestamp expressed in nanoseconds (microsecond remainder
        scaled by 1000, since Spark stores microseconds)."""
        return self._m(((F.unix_micros(self._c) % 1_000_000) * 1000)
                       .cast(T.LongType()), "nanoseconds_within_second",
                       T.LongType())

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
    def truncate(self, n: int = 1, unit: str = "day", **units):
        """``truncate(10, "minutes")`` or the reference's kwargs dialect
        ``truncate(minutes=10)`` (blaze/expr/datetime.py:221-360)."""
        if units:
            if len(units) != 1 or n != 1:
                raise TypeError(
                    "truncate takes either (n, unit) or ONE keyword like "
                    "minutes=10")
            unit, n = next(iter(units.items()))
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
