"""String / datetime / math function tests (SURVEY.md §2.7).

Semantics asserted against Python/pandas ground truth, mirroring the
reference's per-backend operator tests (blaze/compute/tests/)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from blaze_spark.functions import math as M  # noqa: N812


@pytest.fixture(scope="module")
def st(spark):
    from blaze_spark import data

    return data(
        [(" Alice Smith ", "a1b2", "hello world"),
         ("BOB", "123", "Spam And Eggs")],
        spark=spark,
        schema="raw string, code string, phrase string",
        name="st",
    )


@pytest.fixture(scope="module")
def dtt(spark):
    from blaze_spark import data

    return data(
        [(1, dt.datetime(2024, 3, 4, 10, 30, 45)),   # a Monday
         (2, dt.datetime(2024, 12, 31, 23, 59, 59))],
        spark=spark,
        schema="id int, ts timestamp",
        name="dtt",
    )


def one(t, expr, name="r"):
    return t.transform(**{name: expr})[[name]].df.collect()


def col(t, expr):
    return [r[0] for r in one(t, expr)]


# -- strings -------------------------------------------------------------------

def test_str_basics(st):
    assert col(st, st.raw.str.strip()) == ["Alice Smith", "BOB"]
    assert col(st, st.raw.str.len()) == [13, 3]
    assert col(st, st.raw.str.upper()) == [" ALICE SMITH ", "BOB"]
    assert col(st, st.raw.str.lower()) == [" alice smith ", "bob"]
    assert col(st, st.phrase.str.capitalize()) == ["Hello world", "Spam and eggs"]


def test_str_predicates(st):
    assert col(st, st.code.str.isalnum()) == [True, True]
    assert col(st, st.code.str.isdigit()) == [False, True]
    assert col(st, st.phrase.str.istitle()) == [False, True]


def test_str_find(st):
    # 0-based, -1 absent (blaze/compute/sql.py:1324-1327 strpos-1)
    assert col(st, st.phrase.str.find("world")) == [6, -1]


def test_str_replace_pad_slice(st):
    assert col(st, st.phrase.str.replace("o", "0")) == [
        "hell0 w0rld", "Spam And Eggs"]
    assert col(st, st.code.str.pad(6, "left", "0")) == ["00a1b2", "000123"]
    assert col(st, st.phrase.str.slice(0, 5)) == ["hello", "Spam "]
    assert col(st, st.phrase.str[2:4]) == ["ll", "am"]


def test_str_cat_null_propagates(spark):
    from blaze_spark import data

    nt = data([("a", None), ("b", "x")], spark=spark,
              schema="l string, r string", name="nt")
    # reference StrCat propagates null (blaze/expr/strings.py:222-288)
    assert col(nt, nt.l.str.cat(nt.r, sep="-")) == [None, "b-x"]


def test_like_glob(st):
    assert col(st, st.phrase.like("hello*")) == [True, False]


# -- datetime --------------------------------------------------------------------

def test_dt_parts(dtt):
    assert col(dtt, dtt.ts.dt.year()) == [2024, 2024]
    assert col(dtt, dtt.ts.dt.month()) == [3, 12]
    assert col(dtt, dtt.ts.dt.day()) == [4, 31]
    assert col(dtt, dtt.ts.dt.hour()) == [10, 23]
    assert col(dtt, dtt.ts.dt.quarter()) == [1, 4]


def test_dayofweek_monday0(dtt):
    # 2024-03-04 is a Monday -> 0; 2024-12-31 is a Tuesday -> 1
    assert col(dtt, dtt.ts.dt.dayofweek()) == [0, 1]


def test_dt_flags(dtt):
    assert col(dtt, dtt.ts.dt.is_year_end()) == [False, True]
    assert col(dtt, dtt.ts.dt.is_month_start()) == [False, False]
    assert col(dtt, dtt.ts.dt.daysinmonth()) == [31, 31]


def test_strftime(dtt):
    assert col(dtt, dtt.ts.dt.strftime("%Y-%m-%d %H:%M")) == [
        "2024-03-04 10:30", "2024-12-31 23:59"]


def test_truncate_multiunit(dtt):
    got = col(dtt, dtt.ts.dt.truncate(10, "minutes"))
    assert got[0] == dt.datetime(2024, 3, 4, 10, 30)
    assert got[1] == dt.datetime(2024, 12, 31, 23, 50)


def test_truncate_month_returns_date(dtt):
    got = col(dtt, dtt.ts.dt.truncate(1, "month"))
    assert got == [dt.date(2024, 3, 1), dt.date(2024, 12, 1)]


def test_dt_accessor_rejects_nondatetime(dtt):
    with pytest.raises(TypeError):
        dtt.id.dt  # noqa: B018


# -- math -----------------------------------------------------------------------

@pytest.fixture(scope="module")
def mt(spark):
    from blaze_spark import data

    return data([(4.0, -2.5), (9.0, 3.5)], spark=spark,
                schema="x double, y double", name="mt")


def test_math_unary(mt):
    assert col(mt, M.sqrt(mt.x)) == [2.0, 3.0]
    assert col(mt, M.abs_(mt.y)) == [2.5, 3.5]
    got = col(mt, M.log(mt.x))
    assert got[0] == pytest.approx(math.log(4.0))


def test_math_intvalued(mt):
    assert col(mt, M.floor(mt.y)) == [-3, 3]
    assert col(mt, M.ceil(mt.y)) == [-2, 4]
    assert col(mt, M.trunc(mt.y)) == [-2, 3]


def test_math_binary(mt):
    assert col(mt, M.copysign(mt.x, mt.y)) == [-4.0, 9.0]
    assert col(mt, M.hypot(mt.x, mt.y))[1] == pytest.approx(math.hypot(9.0, 3.5))
    assert col(mt, M.ldexp(mt.x, 2)) == [16.0, 36.0]
    assert col(mt, M.greatest(mt.x, mt.y)) == [4.0, 9.0]
    assert col(mt, M.least(mt.x, mt.y)) == [-2.5, 3.5]


def test_truncate_precision(mt):
    # x // p * p (blaze/expr/math.py:123-135)
    assert col(mt, M.truncate(mt.y, 0.5)) == [-2.5, 3.5]
    assert col(mt, M.truncate(mt.x + 0.3, 2)) == [4.0, 8.0]


# -- NaN vs NULL (NumPy-flavored distinction, SURVEY.md §4.4) -------------------

def test_nan_vs_null_distinct(spark):
    from blaze_spark import data

    t = data([(1.0,), (float("nan"),), (None,)], spark=spark,
             schema="x double", name="nn")
    got = [(r.isnan, r.isnull) for r in
           t.transform(isnan=t.x.isnan(), isnull=t.x.isnull())
           .df.orderBy("x").collect()]
    # Spark: isnan(NULL) -> NULL, isnull(NaN) -> false — the two
    # predicates are NOT interchangeable (NumPy-flavored distinction)
    vals = {(bool(a) if a is not None else None, b) for a, b in got}
    assert (True, False) in vals     # the NaN row
    assert (None, True) in vals or (False, True) in vals  # the NULL row


def test_count_skips_null_not_nan(spark):
    from blaze_spark import data

    t = data([(1.0,), (float("nan"),), (None,)], spark=spark,
             schema="x double")
    # SQL count skips NULL but counts NaN (pandas count skips both) —
    # engine follows SQL/Spark here; document the divergence
    assert t.x.count().compute() == 2


def test_slice_replace(st):
    assert col(st, st.phrase.str.slice_replace(0, 5, "howdy")) == [
        "howdy world", "howdyAnd Eggs"]


def test_timedelta_helpers(spark):
    import datetime as _dt

    from blaze_spark import data
    from blaze_spark.functions.datetime import days_between, seconds_between

    t = data([(_dt.datetime(2024, 1, 1, 0, 0, 0),
               _dt.datetime(2024, 1, 3, 1, 0, 30))],
             spark=spark, schema="a timestamp, b timestamp")
    out = t.transform(d=days_between(t.b, t.a), s=seconds_between(t.b, t.a))
    row = out.df.collect()[0]
    assert row.d == 2
    assert row.s == 2 * 86400 + 3630


# -- timedelta surface (blaze/expr/arithmetic.py:166-186, datetime.py:369-394)

@pytest.fixture(scope="module")
def td_table(spark):
    from blaze_spark import data

    return data(
        [(1, "2024-01-01 12:00:00", "2024-01-03 10:30:15.25"),
         (2, "2024-01-01 10:00:00", "2024-01-01 08:30:00"),   # negative delta
         (3, "2024-01-01 00:00:00", "2024-01-01 00:00:00")],  # zero
        spark=spark,
        schema="id int, a string, b string", name="td",
    ).transform(a=F.to_timestamp("a"), b=F.to_timestamp("b"))


def test_ts_sub_ts_is_interval(td_table):
    from pyspark.sql import types as T

    td = td_table.b - td_table.a
    assert isinstance(td.dtype, T.DayTimeIntervalType)


def test_timedelta_accessors_exact(td_table):
    t = td_table
    td = t.b - t.a
    out = t.transform(
        d=td.dt.days(), s=td.dt.seconds(), us=td.dt.microseconds(),
        tot=td.dt.total_seconds(), ns=td.dt.nanoseconds(),
    ).df.collect()
    vals = {r.id: (r.d, r.s, r.us, r.tot, r.ns) for r in out}
    # row 1: +1 day 22:30:15.25 -> floor/day-component semantics
    assert vals[1] == (1, 81015, 250000, 167415, 0)
    # row 2: -1h30m -> pandas floor: -1 day + 81000 s
    assert vals[2] == (-1, 81000, 0, -5400, 0)
    assert vals[3] == (0, 0, 0, 0, 0)


def test_timedelta_matches_pandas_directly(td_table):
    import pandas as pd

    t = td_table
    td = t.b - t.a
    out = {r.id: r for r in t.transform(
        d=td.dt.days(), s=td.dt.seconds(), us=td.dt.microseconds()
    ).df.collect()}
    for r in t.df.collect():
        ptd = pd.Timedelta(r.b - r.a)
        assert out[r.id].d == ptd.days, (r.id, ptd)
        assert out[r.id].s == ptd.seconds
        assert out[r.id].us == ptd.microseconds


def test_ts_plus_interval_is_timestamp(td_table):
    from pyspark.sql import types as T

    t = td_table
    td = t.b - t.a
    back = t.a + td
    assert isinstance(back.dtype, T.TimestampType)
    rows = t.transform(back=back).df.collect()
    for r in rows:
        assert r.back == r.b


def test_dt_accessor_rejects_non_temporal(t):
    with pytest.raises(TypeError):
        t.amount.dt


# -- string parity round 2: count-limited replace, negative slices ----------

@pytest.fixture(scope="module")
def strs(spark):
    from blaze_spark import data

    return data(
        [(1, "aXbXcXd"), (2, "hello world"), (3, "ab"), (4, ""),
         (5, "X.X.X.X"), (6, "no match here")],
        spark=spark, schema="id int, s string", name="strs")


def _one(t, e):
    return {r.id: r.v for r in t.transform(v=e).df.collect()}


def test_replace_max_count(strs):
    got = _one(strs, strs.s.str.replace("X", "-", 2))
    for r in strs.df.collect():
        assert got[r.id] == r.s.replace("X", "-", 2), r.s


def test_replace_max_regex_metachars_are_literal(strs):
    got = _one(strs, strs.s.str.replace(".", "!", 1))
    for r in strs.df.collect():
        assert got[r.id] == r.s.replace(".", "!", 1), r.s


def test_replace_max_zero_and_negative(strs):
    got0 = _one(strs, strs.s.str.replace("X", "-", 0))
    gotn = _one(strs, strs.s.str.replace("X", "-", -1))
    for r in strs.df.collect():
        assert got0[r.id] == r.s
        assert gotn[r.id] == r.s.replace("X", "-")


def test_slice_negative_bounds(strs):
    cases = [(-3, None), (None, -2), (-4, -1), (1, -1), (-100, 2),
             (2, -100), (-1, None), (None, None)]
    for start, stop in cases:
        got = _one(strs, strs.s.str.slice(start, stop))
        for r in strs.df.collect():
            assert got[r.id] == r.s[start:stop], (start, stop, r.s)


def test_slice_getitem_negative(strs):
    got = _one(strs, strs.s.str[-5:-1])
    for r in strs.df.collect():
        assert got[r.id] == r.s[-5:-1]


def test_slice_replace_negative_and_none(strs):
    import pandas as pd

    pdf = strs.df.toPandas().set_index("id")
    for start, stop in [(1, 3), (None, 2), (-2, None), (None, None), (-4, -1)]:
        got = _one(strs, strs.s.str.slice_replace(start, stop, "_"))
        exp = pdf.s.str.slice_replace(start, stop, "_")
        for i, v in exp.items():
            assert got[i] == v, (start, stop, pdf.s[i])


def test_truncate_dtype_dispatch(spark):
    """Expr.truncate dispatches on dtype (reference: numeric
    blaze/expr/math.py:123-135, datetime blaze/expr/datetime.py:221-360 —
    incl. the kwargs dialect truncate(minutes=10))."""
    import datetime as dt

    from blaze_spark import data, greatest, least, truncate

    t = data([(123.0, dt.datetime(2024, 3, 4, 10, 37, 45))],
             spark=spark, schema="x double, ts timestamp")
    assert t.x.truncate(10).compute().iloc[0, 0] == 120
    assert truncate(t.x, 50).compute().iloc[0, 0] == 100
    got = t.ts.truncate(minutes=10).compute().iloc[0, 0]
    assert got.minute == 30 and got.second == 0
    assert t.ts.truncate(minutes=10).compute().equals(
        t.ts.dt.truncate(10, "minutes").compute())
    with pytest.raises(TypeError, match="ONE keyword"):
        t.ts.truncate(minutes=10, hours=1)
    assert greatest(t.x, 200.0).compute().iloc[0, 0] == 200.0
    assert least(t.x, 50.0).compute().iloc[0, 0] == 50.0


def test_dt_nanosecond(spark):
    import datetime as dt

    from blaze_spark import data

    t = data([(dt.datetime(2024, 1, 1, 0, 0, 1, 123456),)],
             spark=spark, schema="ts timestamp")
    # pandas parity: nanosecond is the 0-999 sub-microsecond component,
    # always 0 at Spark's microsecond precision
    assert t.ts.dt.nanosecond().compute().iloc[0, 0] == 0
    assert (t.ts.dt.nanoseconds_within_second().compute().iloc[0, 0]
            == 123456000)
