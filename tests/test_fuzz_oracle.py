"""Fuzz differential: hypothesis-generated filter/group/agg queries over
the real star schema, Spark engine vs in-process DuckDB (the strongest form
of the reference's cross-backend scheme — random queries, two engines)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

NUM_COLS = ["o_totalprice", "o_orderkey", "o_custkey"]
GRP_COLS = ["o_orderstatus", "o_orderpriority"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    return con


@given(
    num_col=st.sampled_from(NUM_COLS),
    grp_col=st.sampled_from(GRP_COLS),
    frac=st.floats(min_value=0.05, max_value=0.95),
    cmp_gt=st.booleans(),
)
@SETTINGS
def test_fuzz_filter_group_agg(spark, sf_dir, duck, num_col, grp_col, frac,
                               cmp_gt):
    from blaze_spark import by, data

    # derive a data-dependent threshold so filters hit varied selectivities
    lo, hi = duck.execute(
        f"SELECT min({num_col}), max({num_col}) FROM orders").fetchone()
    thr = lo + (hi - lo) * frac

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    col = o[num_col]
    pred = (col > thr) if cmp_gt else (col <= thr)
    f = o[pred]
    got = {r[0]: (r[1], r[2]) for r in by(
        [f[grp_col]],
        n=f[num_col].nelements(),
        mx=f[num_col].max(),
    ).df.collect()}

    op = ">" if cmp_gt else "<="
    exp = {r[0]: (r[1], r[2]) for r in duck.execute(
        f"SELECT {grp_col}, count(*), max({num_col}) FROM orders "
        f"WHERE {num_col} {op} {thr!r} GROUP BY {grp_col}").fetchall()}
    assert got == exp


@given(k=st.integers(min_value=1, max_value=50),
       asc=st.booleans())
@SETTINGS
def test_fuzz_topk(spark, sf_dir, duck, k, asc):
    from blaze_spark import data
    from pyspark.sql import functions as F

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    key = F.col("o_totalprice").asc() if asc else F.col("o_totalprice").desc()
    got = [r.o_orderkey for r in
           o.sort(key, F.col("o_orderkey")).head(k)[["o_orderkey"]].df.collect()]
    direction = "ASC" if asc else "DESC"
    exp = [r[0] for r in duck.execute(
        f"SELECT o_orderkey FROM orders ORDER BY o_totalprice {direction}, "
        f"o_orderkey LIMIT {k}").fetchall()]
    assert sorted(got) == sorted(exp)


@given(
    first_set=st.lists(st.sampled_from(GRP_COLS), min_size=1, max_size=2,
                       unique=True),
    with_total=st.booleans(),
)
@SETTINGS
def test_fuzz_grouping_sets(spark, sf_dir, duck, first_set, with_total):
    from blaze_spark import data, grouping_sets

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    sets = [[o[c] for c in first_set], [o[first_set[0]]]]
    if with_total:
        sets.append([])
    out = grouping_sets(sets, n=o.o_orderkey.nelements(),
                        mx=o.o_totalprice.max())
    all_cols = list(dict.fromkeys(first_set))
    got = {tuple(r[c] for c in all_cols): (r.n, r.mx)
           for r in out.df.collect()}

    sql_sets = ", ".join(
        ["(" + ", ".join(first_set) + ")", f"({first_set[0]})"]
        + (["()"] if with_total else []))
    exp = {tuple(r[:len(all_cols)]): (r[-2], r[-1]) for r in duck.execute(
        f"SELECT {', '.join(all_cols)}, count(*), max(o_totalprice) "
        f"FROM orders GROUP BY GROUPING SETS ({sql_sets})").fetchall()}
    assert got == exp
