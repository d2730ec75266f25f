"""Interop tests: JSON expression-tree evaluation (server /compute parity)
and the CachedDataset analogue."""

from __future__ import annotations

import pytest

from blaze_spark import by
from blaze_spark.interop import CachedTable, compute_tree, from_tree


def test_tree_selection_projection(t):
    tree = {"op": "projection",
            "args": [{"op": "selection",
                      "args": [{"op": "symbol", "args": ["t"]},
                               {"op": "gt", "args": [
                                   {"op": "field", "args": ["amount"]}, 75]}]},
                     ["name", "amount"]]}
    out = compute_tree(tree, datasets={"t": t})
    assert sorted(out.name) == ["Alice", "Bob"]


def test_tree_by(t):
    tree = {"op": "by",
            "args": [{"op": "symbol", "args": ["t"]},
                     [["name", {"op": "field", "args": ["name"]}]],
                     {"total": {"op": "sum",
                                "args": [{"op": "field", "args": ["amount"]}]}}]}
    out = compute_tree(tree, datasets={"t": t})
    got = dict(zip(out.name, out.total))
    assert got == {"Alice": 150, "Bob": 200}


def test_tree_matches_direct_api(t):
    tree = {"op": "by",
            "args": [{"op": "symbol", "args": ["t"]},
                     [["name", {"op": "field", "args": ["name"]}]],
                     {"mx": {"op": "max",
                             "args": [{"op": "field", "args": ["amount"]}]}}]}
    via_tree = compute_tree(tree, datasets={"t": t}).sort_values("name")
    direct = by(t.name, mx=t.amount.max()).compute().sort_values("name")
    assert via_tree.reset_index(drop=True).equals(direct.reset_index(drop=True))


def test_tree_data_leaf(spark, sf_dir):
    tree = {"op": "head",
            "args": [{"op": "data", "args": [f"{sf_dir}/region.parquet"]}, 3]}
    out = compute_tree(tree, spark=spark)
    assert len(out) == 3


def test_tree_rejects_unknown_ops(t):
    # whitelist hardening: unknown ops never resolve to callables
    with pytest.raises(ValueError):
        from_tree({"op": "__import__", "args": [{"op": "symbol", "args": ["t"]}]},
                  datasets={"t": t})
    with pytest.raises(ValueError):
        from_tree({"op": "selection",
                   "args": [{"op": "symbol", "args": ["t"]},
                            {"op": "eval", "args": ["1"]}]},
                  datasets={"t": t})


def test_tree_unknown_dataset(t):
    with pytest.raises(KeyError):
        from_tree({"op": "symbol", "args": ["nope"]}, datasets={"t": t})


def test_cached_table(t):
    cache = CachedTable()
    a = cache.compute(t[t.amount > 75])
    b = cache.compute(t[t.amount > 75])  # identical plan -> memo hit
    assert len(cache) == 1
    assert a is b
    cache.compute(t[t.amount > 100])
    assert len(cache) == 2


def test_to_tree_roundtrip(spark, sf_dir):
    from blaze_spark import data
    from blaze_spark.interop import from_tree, to_tree

    o = data(f"{sf_dir}/orders.parquet", spark=spark)
    q = o[o.o_totalprice > 400000.0][["o_orderkey", "o_orderstatus"]] \
        .sort("o_orderkey").head(5)
    tree = to_tree(q)
    assert tree["op"] == "head"
    rebuilt = from_tree(tree, spark=spark)
    a = q.compute().reset_index(drop=True)
    b = rebuilt.compute().reset_index(drop=True)
    assert a.equals(b)


def test_to_tree_unserializable_raises(spark, sf_dir):
    from blaze_spark import by, data
    from blaze_spark.interop import to_tree

    o = data(f"{sf_dir}/orders.parquet", spark=spark)
    g = by(o.o_orderstatus, n=o.o_orderkey.nelements())
    with pytest.raises(ValueError):
        to_tree(g)
