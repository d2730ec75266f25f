"""Whole-expression result caching — the reference's ``CachedDataset``
(blaze/cached.py:17-58): computing an expression over a cached dataset
memoizes the concrete result, and re-computing the *same* expression (even
rebuilt from scratch) returns the stored result without touching the
backend.

Spark-first translation: the cache key is the SEMANTIC identity of the
DataFrame's logical plan (``DataFrame.semanticHash`` bucketed, confirmed
with ``DataFrame.sameSemantics`` — both public PySpark API, so this works
on classic and Connect sessions alike).  Two independently-built but
equivalent expression trees share one entry, which is strictly stronger
than the reference's ``expr`` equality keying.

Driver-memory note: entries hold *collected pandas results* (the
reference's concrete types), so this is for interactive/repeated-readout
workloads — the 100 TB path for re-used intermediates is ``Table.persist``
(executor-side blocks), not this cache.  ``maxsize`` evicts FIFO.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

from pyspark.sql import DataFrame

from .core import Table

__all__ = ["CachedTable", "ExprCache", "cached"]


class ExprCache:
    """Semantic-plan-keyed memo with FIFO eviction.

    Buckets by ``semanticHash`` then confirms with ``sameSemantics`` —
    hash collisions can never return a wrong result, only a linear probe.
    """

    def __init__(self, maxsize: int = 64):
        self.maxsize = maxsize
        # (semhash, tag) -> list[(DataFrame, result)]
        self._store: OrderedDict[tuple, list] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def lookup(self, df: DataFrame, tag: str = "") -> Any | None:
        key = (df.semanticHash(), tag)
        for stored_df, result in self._store.get(key, ()):
            if df.sameSemantics(stored_df):
                self.hits += 1
                return result
        self.misses += 1
        return None

    def store(self, df: DataFrame, result: Any, tag: str = "") -> None:
        key = (df.semanticHash(), tag)
        self._store.setdefault(key, []).append((df, result))
        self._store.move_to_end(key)
        while len(self._store) > self.maxsize:
            self._store.popitem(last=False)

    def __len__(self) -> int:
        return sum(len(v) for v in self._store.values())


class CachedTable(Table):
    """A Table whose materializations are memoized in a shared ExprCache.

    Every derived table (projection, filter, join result, ...) inherits
    the same cache object — mirroring the reference where all expressions
    over one ``CachedDataset`` share ``data.cache``.
    """

    _xcache: ExprCache | None = None

    def _new(self, df: DataFrame) -> "CachedTable":
        t = super()._new(df)
        t._xcache = self._xcache
        return t

    def compute(self):
        hit = self._xcache.lookup(self._df)
        if hit is not None:
            return hit
        result = super().compute()
        self._xcache.store(self._df, result)
        return result

    to_pandas = compute

    def peek(self, n: int = 10):
        tag = f"peek:{n}"
        hit = self._xcache.lookup(self._df, tag)
        if hit is not None:
            return hit
        result = super().peek(n)
        self._xcache.store(self._df, result, tag)
        return result

    def nrows(self) -> int:
        hit = self._xcache.lookup(self._df, "nrows")
        if hit is not None:
            return hit
        result = super().nrows()
        self._xcache.store(self._df, result, "nrows")
        return result


def cached(t: Table | DataFrame, cache: ExprCache | None = None,
           maxsize: int = 64) -> CachedTable:
    """Wrap a table so repeated computations of equivalent expressions
    return memoized results (reference ``CachedDataset``).  Pass an
    explicit ``cache`` to share one memo across several root tables."""
    df = t.df if isinstance(t, Table) else t
    name = t._name if isinstance(t, Table) else None
    out = CachedTable(df, name)
    if isinstance(t, Table):
        out._fks = dict(t._fks)
        out._lineage = frozenset(t._lineage) | out._lineage
    out._xcache = cache if cache is not None else ExprCache(maxsize)
    return out
