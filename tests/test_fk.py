"""Foreign-key Map-type auto-join tests (reference: Map measure at
blaze/expr/collections.py:720-721, FK field hop at
blaze/expr/expressions.py:188-193)."""

from __future__ import annotations

import pytest

from blaze_spark import by


def test_auto_join_adds_dim_field(star):
    c = star["customer"].with_fk("c_nationkey", star["nation"], "n_nationkey")
    j = c.auto_join("c_nationkey.n_name")
    assert "n_name" in j.columns
    assert j.nrows() == star["customer"].nrows()


def test_fk_attribute_hop(star):
    c = star["customer"].with_fk("c_nationkey", star["nation"], "n_nationkey")
    nn = c.c_nationkey.n_name  # field access THROUGH the fk column
    out = by(nn, n=nn.nelements())
    got = {r.n_name: r.n for r in out.df.collect()}
    assert sum(got.values()) == star["customer"].nrows()


def test_fk_join_is_broadcast(star):
    from blaze_spark.plans import uses_broadcast_join

    c = star["customer"].with_fk("c_nationkey", star["nation"], "n_nationkey")
    j = c.auto_join("c_nationkey.n_name")
    assert uses_broadcast_join(j)


def test_fk_requires_declaration(star):
    with pytest.raises(KeyError):
        star["customer"].auto_join("c_nationkey.n_name")


def test_fk_bad_columns(star):
    with pytest.raises(KeyError):
        star["customer"].with_fk("nope", star["nation"], "n_nationkey")
    with pytest.raises(KeyError):
        star["customer"].with_fk("c_nationkey", star["nation"], "nope")
