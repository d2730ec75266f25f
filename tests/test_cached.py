"""Expression-result caching (reference CachedDataset, blaze/cached.py:17-58):
recomputing an equivalent expression returns the memoized concrete result."""

from __future__ import annotations

from blaze_spark import cached


def test_cached_compute_memoizes(t):
    ct = cached(t)
    q1 = ct[ct.amount > 60][["name", "amount"]]
    out1 = q1.compute()
    out2 = q1.compute()
    assert out2 is out1  # same object: no recompute
    assert ct._xcache.hits == 1


def test_cached_hits_equivalent_rebuilt_expression(t):
    """Two independently-built but semantically equal plans share one
    entry (sameSemantics keying — stronger than the reference's expr
    equality)."""
    ct = cached(t)
    out1 = ct[ct.amount > 60][["name", "amount"]].compute()
    out2 = ct[ct.amount > 60][["name", "amount"]].compute()  # rebuilt
    assert out2 is out1


def test_cached_distinguishes_different_expressions(t):
    ct = cached(t)
    a = ct[ct.amount > 60].compute()
    b = ct[ct.amount > 150].compute()
    assert len(a) == 2 and len(b) == 1


def test_cache_shared_across_derived_tables(t):
    ct = cached(t)
    derived = ct[["name", "amount"]]
    assert derived._xcache is ct._xcache  # reference: one data.cache


def test_cached_nrows_and_peek(t):
    ct = cached(t)
    assert ct.nrows() == 3
    assert ct.nrows() == 3
    assert ct._xcache.hits >= 1
    p1 = ct.peek(2)
    p2 = ct.peek(2)
    assert p1 is p2
    assert len(ct.peek(1)) == 1  # different n = different entry


def test_cache_eviction_bounds_memory(t):
    ct = cached(t, maxsize=2)
    ct[ct.amount > 10].compute()
    ct[ct.amount > 20].compute()
    ct[ct.amount > 30].compute()
    assert len(ct._xcache._store) <= 2


def test_shared_explicit_cache_across_roots(t, cities):
    from blaze_spark import ExprCache

    memo = ExprCache()
    ct1 = cached(t, cache=memo)
    ct2 = cached(cities, cache=memo)
    ct1.compute()
    ct2.compute()
    assert memo.misses >= 2 and len(memo) == 2


def test_cached_survives_by_and_join(t, cities):
    """by()/join() construct results through _derived — the CachedTable
    subclass and shared memo must survive (caught by a verify drive:
    grouped queries silently skipped the cache)."""
    from blaze_spark import by, join

    ct = cached(t)
    q1 = by(ct.name, total=ct.amount.sum()).compute()
    q2 = by(ct.name, total=ct.amount.sum()).compute()
    assert q2 is q1
    j = join(ct, cached(t, cache=ct._xcache))
    assert getattr(j, "_xcache", None) is ct._xcache
