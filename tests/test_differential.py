"""Property-based differential tests — hypothesis-generated frames, engine
results asserted against pandas/numpy ground truth (the reference's
cross-backend differential scheme, blaze/compute/tests/
test_comprehensive.py:65-153, with pandas as the model backend)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

names = st.sampled_from(["Alice", "Bob", "Carol", "Dan", ""])
amounts = st.integers(min_value=-10**6, max_value=10**6)
ids = st.integers(min_value=1, max_value=100)
rows_strategy = st.lists(st.tuples(names, amounts, ids), min_size=0,
                         max_size=25)

SETTINGS = settings(max_examples=6, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


def _make(spark, rows):
    from blaze_spark import data

    return data(rows, spark=spark, schema="name string, amount long, id long")


@given(rows=rows_strategy)
@SETTINGS
def test_elementwise_matches_pandas(spark, rows):
    t = _make(spark, rows)
    out = t.transform(
        s=t.amount + t.id,
        d=t.amount * 2,
        fd=t.amount // 7,
        md=t.amount % 7,
        neg=-t.amount,
        cmp=(t.amount > t.id).coerce("int32"),
        ln=t.name.str.len(),
        up=t.name.str.upper(),
    ).df.toPandas().sort_values(["id", "amount", "name"]).reset_index(drop=True)

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["name", "amount", "id"]) \
        .sort_values(["id", "amount", "name"]).reset_index(drop=True)
    if len(pdf) == 0:
        assert len(out) == 0
        return
    assert (out.s == pdf.amount + pdf.id).all()
    assert (out.d == pdf.amount * 2).all()
    # Spark floor-div matches python floor division (toward -inf)
    assert (out.fd == pdf.amount // 7).all(), (out.fd, pdf.amount // 7)
    # Spark % sign follows the dividend (C semantics), unlike python
    assert (out.md == np.fmod(pdf.amount, 7)).all()
    assert (out.neg == -pdf.amount).all()
    assert (out.cmp == (pdf.amount > pdf.id).astype(int)).all()
    assert (out.ln == pdf.name.str.len()).all()
    assert (out.up == pdf.name.str.upper()).all()


@given(rows=rows_strategy)
@SETTINGS
def test_reductions_match_numpy(spark, rows):
    t = _make(spark, rows)
    from blaze_spark import summary

    got = summary(
        s=t.amount.sum(), mn=t.amount.min(), mx=t.amount.max(),
        avg=t.amount.mean(), v=t.amount.var(), sd=t.amount.std(),
        n=t.amount.count(), nu=t.amount.nunique(),
    ).df.collect()[0]

    vals = np.array([r[1] for r in rows], dtype=np.float64)
    if len(vals) == 0:
        # SQL semantics: aggregates over empty input are NULL, count 0
        assert got.s is None and got.mn is None and got.avg is None
        assert got.n == 0 and got.nu == 0
        return
    assert got.s == int(vals.sum())
    assert got.mn == int(vals.min()) and got.mx == int(vals.max())
    assert got.avg == pytest.approx(vals.mean())
    assert got.v == pytest.approx(vals.var(), rel=1e-9, abs=1e-9)   # ddof=0
    assert got.sd == pytest.approx(vals.std(), rel=1e-9, abs=1e-9)
    assert got.n == len(vals)
    assert got.nu == len(set(r[1] for r in rows))


@given(rows=rows_strategy)
@SETTINGS
def test_groupby_matches_pandas(spark, rows):
    import pandas as pd

    t = _make(spark, rows)
    from blaze_spark import by

    got = {(r.name): (r.total, r.n) for r in
           by(t.name, total=t.amount.sum(), n=t.amount.count()).df.collect()}

    pdf = pd.DataFrame(rows, columns=["name", "amount", "id"])
    if len(pdf) == 0:
        assert got == {}
        return
    exp = pdf.groupby("name").amount.agg(["sum", "count"])
    assert got == {name: (int(r["sum"]), int(r["count"]))
                   for name, r in exp.iterrows()}


@given(rows=rows_strategy, frac=st.floats(min_value=0.1, max_value=0.9))
@SETTINGS
def test_distinct_and_filter_properties(spark, rows, frac):
    t = _make(spark, rows)
    cutoff = int(np.quantile([r[1] for r in rows], frac)) if rows else 0
    filtered = t[t.amount > cutoff]
    expected = [r for r in rows if r[1] > cutoff]
    assert filtered.nrows() == len(expected)
    assert t[["name"]].distinct().nrows() == len({r[0] for r in rows})
