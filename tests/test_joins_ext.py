"""As-of join and salted-join extension tests."""

from __future__ import annotations

import pytest

from blaze_spark.operators.joins_ext import asof_join, salted_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    from blaze_spark import data

    quotes = data(
        [(1, 10, 100.0), (1, 20, 101.0), (1, 40, 99.0),
         (2, 15, 50.0)],
        spark=spark, schema="sym int, ts long, px double", name="quotes")
    trades = data(
        [(1, 15, 5), (1, 20, 7), (1, 25, 2), (1, 5, 9),
         (2, 14, 1), (2, 30, 4)],
        spark=spark, schema="sym int, ts long, qty int", name="trades")
    return quotes, trades


def test_asof_join_basic(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    got = {(r.sym, r.ts): r.px_right for r in out.df.collect()}
    assert got[(1, 15)] == 100.0   # last quote at ts<=15 is ts=10
    assert got[(1, 20)] == 101.0   # tie: quote at same ts matches (<=)
    assert got[(1, 25)] == 101.0
    assert got[(1, 5)] is None     # no quote yet
    assert got[(2, 14)] is None
    assert got[(2, 30)] == 50.0


def test_asof_preserves_left_rows(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    assert out.nrows() == trades.nrows()


def test_salted_join_matches_plain_join(star):
    from blaze_spark import join

    plain = join(star["orders"], star["customer"], "o_custkey", "c_custkey")
    salted = salted_join(star["orders"], star["customer"],
                         "o_custkey", "c_custkey", salt=4)
    assert salted.nrows() == plain.nrows()
    a = sorted((r.o_orderkey, r.c_name) for r in
               plain[["o_orderkey", "c_name"]].df.collect())
    b = sorted((r.o_orderkey, r.c_name) for r in
               salted[["o_orderkey", "c_name"]].df.collect())
    assert a == b
