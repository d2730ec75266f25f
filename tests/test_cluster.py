"""Connected-components duplicate clustering (beyond-reference LLM-pipeline
surface; the reference's dedup stops at Distinct, blaze/expr/collections.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blaze_spark import Table
from blaze_spark.pipeline import (
    canonical_docs,
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return Table(spark.createDataFrame(pairs, "a long, b long"))


def test_cc_chain_propagates_min_multiple_hops(spark):
    # 1-2-3-4-5 chain: diameter 4 forces >1 iteration of hash-min
    cc = connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r.node: r.comp for r in cc.df.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cc_separate_components_and_orientation(spark):
    # orientation/duplicates must not matter; two components stay apart
    cc = connected_components(
        _edges(spark, [(2, 1), (1, 2), (10, 11), (12, 11)]))
    got = {r.node: r.comp for r in cc.df.collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_cc_star_and_triangle(spark):
    cc = connected_components(
        _edges(spark, [(7, 3), (7, 5), (7, 9), (20, 21), (21, 22), (20, 22)]))
    got = {r.node: r.comp for r in cc.df.collect()}
    assert got == {3: 3, 5: 3, 7: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_cc_max_iter_bounds_work(spark):
    # a long chain with max_iter=1 must NOT fully converge (bound respected)
    edges = _edges(spark, [(i, i + 1) for i in range(1, 12)])
    partial = connected_components(edges, max_iter=1)
    got = {r.node: r.comp for r in partial.df.collect()}
    assert got[12] != 1  # one round of hash-min can't reach 11 hops
    full = connected_components(edges)
    assert {r.comp for r in full.df.collect()} == {1}


def test_dedup_clusters_canonical_flags(spark):
    cl = dedup_clusters(
        Table(spark.createDataFrame([(5, 9), (9, 2), (30, 31)],
                                    "doc_a long, doc_b long")))
    rows = {r.doc_id: (r.cluster_id, r.is_canonical)
            for r in cl.df.collect()}
    assert rows == {2: (2, True), 5: (2, False), 9: (2, False),
                    30: (30, True), 31: (30, False)}


def test_canonical_docs_corpus_wide_keep(spark):
    docs = Table(spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 7)], "doc_id long, text string"))
    pairs = Table(spark.createDataFrame(
        [(1, 3), (3, 4)], "doc_a long, doc_b long"))
    out = canonical_docs(docs, pairs)
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in out.df.collect()}
    # 1-3-4 cluster keeps 1; unpaired docs keep themselves
    assert rows == {1: (1, True), 2: (2, True), 3: (1, False),
                    4: (1, False), 5: (5, True), 6: (6, True)}
    kept = out.df.filter("keep").count()
    assert kept == 4


def test_cc_lineage_is_truncated(spark):
    """localCheckpoint per round: the converged plan must not contain one
    Join per iteration (exponential-plan guard for the iterative loop)."""
    edges = _edges(spark, [(i, i + 1) for i in range(1, 30)])
    cc = connected_components(edges)
    plan = cc.df._jdf.queryExecution().optimizedPlan().toString()
    # checkpointed: the final plan hangs off scan-of-checkpoint, not the
    # full iteration history
    assert plan.count("Join") <= 2
