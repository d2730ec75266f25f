"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force baseline: queries × corpus with the dot
  product as a JVM-side ``aggregate(zip_with(...))`` (no Python in the inner
  loop).  The query side is broadcast — at 100 TB the corpus streams
  partition-local against an in-memory query block, and the global top-k is
  a TakeOrdered-style window per query, never a full sort.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH buckets
  both sides, so each corpus row only scores against queries sharing a
  bucket.  Deterministic hyperplanes from a seeded numpy RNG, shipped as
  literal arrays (no UDF).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..core import Table


def _dot(a, b) -> Column:
    # elementwise in double precision, left-to-right accumulation
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(corpus: Table, queries: Table, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int | None = 4) -> Table:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine) — self-matches excluded, ties
    broken by neighbor id (deterministic).
    """
    q = queries.df.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qv"),
                          _norm(F.col(vec_col)).alias("qn"))
    c = corpus.df.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("cv"),
                         _norm(F.col(vec_col)).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", round_to).alias("cosine")
                if round_to is not None else F.col("cosine"))
    )
    return Table(out, "cosine_topk")


def lsh_cosine_topk(corpus: Table, queries: Table, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, dim: int = 64, seed: int = 42,
                    round_to: int | None = 4) -> Table:
    """Approximate top-k: random-hyperplane signature buckets both sides;
    exact cosine only within matching buckets.  Recall trades off with
    ``n_planes``; at scale this replaces the crossJoin with an equi-join
    keyed by the signature (uniform, shuffle-friendly)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def signature(vec) -> Column:
        bits = [
            (F.aggregate(
                F.zip_with(vec,
                           F.array(*[F.lit(float(x)) for x in planes[i]]),
                           lambda a, b: a.cast("double") * b),
                F.lit(0.0), lambda acc, v: acc + v) > 0).cast("int")
            for i in range(n_planes)
        ]
        sig = None
        for i, b in enumerate(bits):
            term = b * F.lit(1 << i)
            sig = term if sig is None else sig + term
        return sig

    q = queries.df.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qv"),
                          _norm(F.col(vec_col)).alias("qn"),
                          signature(F.col(vec_col)).alias("sig"))
    c = corpus.df.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("cv"),
                         _norm(F.col(vec_col)).alias("cn"),
                         signature(F.col(vec_col)).alias("sig"))
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", round_to).alias("cosine")
                if round_to is not None else F.col("cosine"))
    )
    return Table(out, "lsh_cosine_topk")
