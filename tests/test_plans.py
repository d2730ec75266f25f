"""Physical-plan hygiene tests — the 100 TB design checks (SURVEY.md §4):
filters reach the parquet scan, projections prune the read schema, small
joins broadcast, aggregations are partial+final, codegen spans exist.

The reference implemented pruning/pushdown itself (blaze/expr/optimize.py,
blaze/compute/csv.py:51-58); here Catalyst does it and these tests pin
that it actually happens through our API surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blaze_spark import by, join
from blaze_spark.plans import (
    codegen_stage_count,
    physical_plan,
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
)


def test_filter_pushdown_reaches_scan(star):
    li = star["lineitem"]
    q = li[li.l_quantity > 40.0][["l_orderkey", "l_quantity"]]
    pf = pushed_filters(q)
    assert "l_quantity" in pf, pf


def test_column_pruning(star):
    li = star["lineitem"]
    q = by(li.l_returnflag, total=li.l_quantity.sum())
    cols = scan_columns(q)
    assert set(cols) == {"l_returnflag", "l_quantity"}, cols


def test_projection_pushdown_through_ops(star):
    o = star["orders"]
    q = o[o.o_totalprice > 100.0][["o_orderkey"]].sort("o_orderkey").head(5)
    cols = scan_columns(q)
    assert set(cols) <= {"o_orderkey", "o_totalprice"}, cols


def test_broadcast_hint_applied(star):
    j = join(star["orders"], star["customer"], "o_custkey", "c_custkey",
             broadcast=True)
    assert uses_broadcast_join(j)


def test_small_dim_autobroadcast(star):
    # Catalyst should pick broadcast for the tiny nation table on its own
    j = join(star["customer"], star["nation"], "c_nationkey", "n_nationkey")
    assert uses_broadcast_join(j)


def test_partial_aggregation_planned(star):
    li = star["lineitem"]
    q = by(li.l_returnflag, total=li.l_quantity.sum())
    plan = physical_plan(q)
    # two HashAggregate nodes: partial (map-side) + final after shuffle —
    # the reference's split() algebra (blaze/expr/split.py) done by Catalyst
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_present(star):
    li = star["lineitem"]
    q = li.transform(x=(li.l_extendedprice * (1 - li.l_discount)))
    assert codegen_stage_count(q) >= 1


def test_topk_is_take_ordered(star):
    o = star["orders"]
    q = o.sort(F.col("o_totalprice").desc()).head(10)
    plan = physical_plan(q)
    # top-k must not materialize a global sort
    assert "TakeOrderedAndProject" in plan, plan
