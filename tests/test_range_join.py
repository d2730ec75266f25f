"""Range-join and grouped-apply tests."""

from __future__ import annotations

import pytest

from blaze_spark.operators.range_join import bucketed_range_join, range_join


@pytest.fixture(scope="module")
def bands(spark):
    from blaze_spark import data

    return data(
        [("low", 0.0, 150000.0), ("mid", 150000.0, 350000.0),
         ("high", 350000.0, 600000.0)],
        spark=spark, schema="band string, lo double, hi double", name="bands")


def test_range_join_classifies_all(star, bands):
    j = range_join(star["orders"], bands, "o_totalprice", "lo", "hi")
    assert j.nrows() == star["orders"].nrows()  # every order in one band


def test_bucketed_range_join_matches_broadcast(star, bands):
    a = range_join(star["orders"], bands, "o_totalprice", "lo", "hi")
    b = bucketed_range_join(star["orders"], bands, "o_totalprice",
                            "lo", "hi", bucket_width=50000.0)
    ga = sorted((r.o_orderkey, r.band) for r in
                a.df.select("o_orderkey", "band").collect())
    gb = sorted((r.o_orderkey, r.band) for r in
                b.df.select("o_orderkey", "band").collect())
    assert ga == gb


def test_grouped_apply_normalize(t):
    import pandas as pd

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "name": pdf.name,
            "centered": pdf.amount - pdf.amount.mean(),
        })

    out = t.grouped_apply("name", center, "name string, centered double")
    got = sorted((r.name, r.centered) for r in out.df.collect())
    assert got == [("Alice", -25.0), ("Alice", 25.0), ("Bob", 0.0)]
